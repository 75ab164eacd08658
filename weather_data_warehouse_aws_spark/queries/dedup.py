"""Deduplication queries over `documents` (north-star: exact, n-gram
Jaccard, MinHash+LSH, SimHash — SURVEY §7 track b).

The synthetic corpus has no natural duplicates (500 distinct texts at
sf0.01), so each query PLANTS duplicates deterministically inside the query
itself — exact copies for doc_id % 100 == 0 (id + 1_000_000) and
appended-trailer near-dups for doc_id % 100 == 1 (id + 2_000_000). The
DuckDB oracle constructs the identical planted corpus, making every planted
pair a ground-truth the differential test must recover.

Shingle width n=5: this corpus has a 31-word vocabulary, so 3-grams collide
by chance (1.27M candidate pairs at sf0.1) while 5-grams are ~unique
(13.5k). Real web corpora tune n the same way — wide enough that chance
collisions don't swamp the candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MINHASH_P, minhash_constants, portable_hash60_sql
from ..operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..sources.tables import load_table

EXACT_OFFSET = 1_000_000
NEAR_OFFSET = 2_000_000
TRAILER = " zq1 zq2 zq3"
SHINGLE_N = 5
# doc-frequency cap for candidate-generating shingles (see
# operators/dedup.cap_hot_shingles): no natural 5-gram reaches it in this
# corpus (planted dups peak at df=3), so the oracle result is unchanged
# while the cap MECHANISM is differential-tested on both engines
MAX_SHINGLE_DF = 50


def planted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select((F.col("doc_id") + EXACT_OFFSET).alias("doc_id"), "text")
    )
    near = (
        docs.filter(F.col("doc_id") % 100 == 1)
        .select(
            (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(TRAILER)).alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(near)


PLANTED_SQL = f"""
planted AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {EXACT_OFFSET}, text FROM documents WHERE doc_id % 100 = 0
    UNION ALL
    SELECT doc_id + {NEAR_OFFSET}, text || '{TRAILER}' FROM documents WHERE doc_id % 100 = 1
)
"""

_SHINGLES_SQL = rf"""
shingles AS (
    SELECT doc_id,
           {portable_hash60_sql('s')} AS sh
    FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - {SHINGLE_N} + 1, 1)),
                   i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), i, i + {SHINGLE_N} - 1), ' ')
               ))) AS s
        FROM planted
    )
)
"""


# ---------------------------------------------------------------------------
# q_exact_dedup
# ---------------------------------------------------------------------------
def q_exact_dedup(
    spark: SparkSession, sf_dir: str, corpus: DataFrame | None = None
) -> DataFrame:
    """Hash-groupBy exact dedup: (keep_id, dup_id) for byte-identical texts.
    `corpus`: optional pre-built planted relation (q_pair_dedup shares ONE
    plan across its five strategies — rebuilding it per strategy is pure
    driver/py4j construction latency)."""
    if corpus is None:
        corpus = planted_documents(spark, sf_dir)
    return exact_duplicates(corpus, "doc_id", "text").orderBy(
        "keep_id", "dup_id"
    )


ORACLE_EXACT_DEDUP = f"""
WITH {PLANTED_SQL.strip()},
planted_hashed AS (
    SELECT doc_id, md5(text) AS h FROM planted
),
keepers AS (
    SELECT h, MIN(doc_id) AS keep_id FROM planted_hashed GROUP BY h
)
SELECT keep_id, doc_id AS dup_id
FROM planted_hashed JOIN keepers USING (h)
WHERE doc_id <> keep_id
ORDER BY keep_id, dup_id
"""


# ---------------------------------------------------------------------------
# q_ngram_jaccard
# ---------------------------------------------------------------------------
def q_ngram_jaccard(
    spark: SparkSession, sf_dir: str, shingles: DataFrame | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard ≥ 0.6 over candidate pairs sharing ≥1
    shingle (hot shingles capped at df ≤ 50 before the self-join). Recovers
    both planted exact pairs (j=1.0) and trailer near-dups (j≈0.8-0.9)."""
    return ngram_jaccard_pairs(
        corpus if corpus is not None else planted_documents(spark, sf_dir),
        "doc_id",
        "text",
        n=SHINGLE_N,
        threshold=0.6,
        max_doc_freq=MAX_SHINGLE_DF,
        shingles=shingles,
    ).orderBy("id_a", "id_b")


ORACLE_NGRAM_JACCARD = f"""
WITH {PLANTED_SQL.strip()},
{_SHINGLES_SQL.strip()},
capped AS (  -- same df ≤ {MAX_SHINGLE_DF} hot-shingle cap as the engine
    SELECT s.doc_id, s.sh
    FROM shingles s
    JOIN (
        SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ) keep USING (sh)
),
sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id
),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.6
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q_minhash_lsh
# ---------------------------------------------------------------------------
_K, _BANDS = 16, 4


def q_minhash_lsh(
    spark: SparkSession,
    sf_dir: str,
    shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """MinHash(16)+LSH(4 bands × 4 rows) candidates with estimated Jaccard
    ≥ 0.5 — the linear-time scale path for near-dup detection."""
    return minhash_lsh_pairs(
        corpus if corpus is not None else planted_documents(spark, sf_dir),
        "doc_id",
        "text",
        k=_K,
        bands=_BANDS,
        shingle_n=SHINGLE_N,
        threshold=0.5,
        shingles=shingles,
        signatures=signatures,
    ).orderBy("id_a", "id_b")


def _oracle_minhash_lsh() -> str:
    consts = minhash_constants(_K)
    r = _K // _BANDS
    mins = ",\n           ".join(
        f"MIN(({a} * (sh % {MINHASH_P}) + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_joins = " OR ".join(
        "("
        + " AND ".join(f"a.mh{band * r + j} = b.mh{band * r + j}" for j in range(r))
        + ")"
        for band in range(_BANDS)
    )
    agreement = " + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(_K))
    return f"""
WITH {PLANTED_SQL.strip()},
{_SHINGLES_SQL.strip()},
sig AS (
    SELECT doc_id,
           {mins}
    FROM shingles
    GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(({agreement}) / {float(_K)}, 6) AS est_jaccard
FROM sig a JOIN sig b
  ON a.doc_id < b.doc_id AND ({band_joins})
WHERE ({agreement}) / {float(_K)} >= 0.5
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q_simhash
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 32


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — a full differential check of the
    sign-aggregated token-hash construction (pairing is covered by
    tests/test_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text", bits=_SIMHASH_BITS).orderBy("doc_id")


def _oracle_simhash() -> str:
    h = portable_hash60_sql("tok")
    sums = ",\n           ".join(
        f"SUM((({h} >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(_SIMHASH_BITS)
    )
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
    FROM documents
),
sums AS (
    SELECT doc_id,
           {sums}
    FROM toks
    GROUP BY doc_id
)
SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash
FROM sums
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_decontamination — cross-corpus n-gram overlap (train/eval hygiene)
# ---------------------------------------------------------------------------
# Benchmark-decontamination is the containment-side twin of dedup: flag eval
# documents sharing any word-n-gram with the training corpus (the method
# popularized by the GPT-2/GPT-3 papers' 8/13-gram overlap filters; n=5 here
# for the same vocabulary-width reason as ngram_jaccard above).
EVAL_EXACT_OFFSET = 3_000_000
EVAL_TRAILER_OFFSET = 4_000_000
EVAL_CLEAN_OFFSET = 5_000_000


def eval_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic eval set with known contamination status: exact copies
    (every 100th doc), trailer-extended copies (every 100th+1 — all original
    shingles retained, so still contaminated), and token-REVERSED texts
    (every 100th+2 — word order destroyed, so shingle-clean)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + EVAL_EXACT_OFFSET).alias("doc_id"), "text"
    )
    trailer = docs.filter(F.col("doc_id") % 100 == 1).select(
        (F.col("doc_id") + EVAL_TRAILER_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(TRAILER)).alias("text"),
    )
    clean = docs.filter(F.col("doc_id") % 100 == 2).select(
        (F.col("doc_id") + EVAL_CLEAN_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split(F.trim(F.col("text")), r"\s+"))).alias("text"),
    )
    return exact.unionByName(trailer).unionByName(clean)


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per contaminated eval doc: how many train docs share a 5-gram and how
    many distinct shingles leak. Plan shape: shingle both corpora (linear),
    Bloom-prune the train side against the (small) eval shingle set at the
    map stage, THEN the doc-frequency cap's groupBy and the contamination
    equi-join — so the only train-side shuffles move ~|eval ∩ train| + FPR
    rows instead of the whole corpus' shingles. Bloom false positives are
    removed by the exact join, so the result — and the oracle — are
    unchanged (the hash gate is what proves `bloom prune → exact join` ≡
    exact join). The df cap commutes with the prune because a shingle's
    doc-frequency only counts its own group, which the prune keeps or
    drops whole."""
    from ..operators.bloom import bloom_prune
    from ..operators.dedup import cap_hot_shingles, shingle_table

    train = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = eval_benchmark(spark, sf_dir)
    # contamination only ever tests shingle EQUALITY (counts of DISTINCT
    # shared shingles), so both sides hash with xxhash64 — same results
    # as the md5-prefix hash the oracle uses (both are injective in
    # practice; 64-bit xxhash collides strictly less often than a 60-bit
    # md5 prefix) at ~1/5 the per-occurrence CPU, and the hash runs once
    # per TRAIN-corpus shingle occurrence, the dominant linear cost here
    eval_sh = (
        shingle_table(ev, "doc_id", "text", SHINGLE_N, hash_fn=F.xxhash64)
        .withColumnRenamed("doc_id", "eval_id")
        .persist()  # reused: bloom build (count + bitmap) and the join probe
    )
    # persisted: cap_hot_shingles consumes this twice (doc-frequency groupBy
    # + the anti-join's probe side) — without the cache the full train-side
    # explode+hash+bloom scan, the dominant linear cost here, runs twice.
    # Post-prune rows number ~|eval ∩ train| + FPs, so the cache is small.
    pruned = bloom_prune(
        shingle_table(
            train, "doc_id", "text", SHINGLE_N, hash_fn=F.xxhash64
        ).withColumnRenamed(
            "doc_id", "train_id"
        ),
        "sh",
        eval_sh,
        "sh",
        fpr=0.01,
    ).persist()
    # hot-shingle cap on the big (train) side: a corpus-wide stop-shingle
    # would otherwise multiply the contamination join by its doc-frequency;
    # stop-shingles are also not contamination evidence
    train_sh = cap_hot_shingles(pruned, MAX_SHINGLE_DF)
    # hits is SMALL by construction (the Bloom prune means it holds the
    # eval∩train overlap plus FPs, never corpus-scale), so BOTH distinct
    # counts ride one aggregate. Spelled as size(collect_set(·)) rather
    # than two count_distinct's: multiple exact COUNT(DISTINCT) in one agg
    # plans Catalyst's Expand (input ×2 per distinct group — the shape
    # tests/test_plans.py bans for this query), while collect_set plans a
    # single-pass ObjectHashAggregate. Set memory is bounded by the same
    # argument that bounds hits itself (eval∩train overlap + Bloom FPs,
    # never corpus-scale). Values are identical: both count distinct
    # non-null keys per group; the cast pins count_distinct's LONG type.
    hits = eval_sh.join(train_sh, "sh").persist()
    stats = hits.groupBy("eval_id").agg(
        F.size(F.collect_set("train_id")).cast("long").alias("n_train_sources"),
        F.size(F.collect_set("sh")).cast("long").alias("n_shared_shingles"),
    )
    # leaked (eval_id, sh) feeds only the span probe now — it reads the
    # hits cache, so it needs no pin of its own
    leaked = hits.select("eval_id", "sh").distinct()
    # span localization (operators/dedup.py::leak_spans): WHERE do the
    # leaked n-grams sit? Positions materialize on the eval side only.
    from ..operators.dedup import leak_spans

    spans = leak_spans(
        ev.withColumnRenamed("doc_id", "eval_id"),
        leaked, SHINGLE_N, id_col="eval_id", hash_fn=F.xxhash64,
    )
    return (
        stats.join(spans, "eval_id")
        .orderBy("eval_id")
    )


def _shingles_over_sql(relation: str, id_alias: str) -> str:
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    return rf"""
    SELECT doc_id AS {id_alias}, {portable_hash60_sql('s')} AS sh
    FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len({toks}) - {SHINGLE_N} + 1, 1)),
                   i -> array_to_string(list_slice({toks}, i, i + {SHINGLE_N} - 1), ' ')
               ))) AS s
        FROM {relation}
    )"""


ORACLE_DECONTAMINATION = rf"""
WITH eval_docs AS (
    SELECT doc_id + {EVAL_EXACT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 100 = 0
    UNION ALL
    SELECT doc_id + {EVAL_TRAILER_OFFSET}, text || '{TRAILER}'
    FROM documents WHERE doc_id % 100 = 1
    UNION ALL
    SELECT doc_id + {EVAL_CLEAN_OFFSET},
           array_to_string(list_reverse(regexp_split_to_array(trim(text), '\s+')), ' ')
    FROM documents WHERE doc_id % 100 = 2
),
train_sh_raw AS ({_shingles_over_sql('documents', 'train_id')}
),
train_sh AS (  -- same df ≤ {MAX_SHINGLE_DF} hot-shingle cap as the engine
    SELECT t.train_id, t.sh
    FROM train_sh_raw t
    JOIN (
        SELECT sh FROM train_sh_raw GROUP BY sh HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ) keep USING (sh)
),
eval_sh AS ({_shingles_over_sql('eval_docs', 'eval_id')}
),
leaked AS (
    SELECT DISTINCT e.eval_id, e.sh
    FROM eval_sh e JOIN train_sh USING (sh)
),
eval_pos AS (
    SELECT eval_id, CAST(i AS INT) AS pos,
           {portable_hash60_sql(f"array_to_string(list_slice(toks, i, i + {SHINGLE_N} - 1), ' ')")} AS sh,
           CAST(len(toks) AS INT) AS n_tok
    FROM (
        SELECT doc_id AS eval_id,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM eval_docs
    ), UNNEST(generate_series(1, greatest(len(toks) - {SHINGLE_N} + 1, 1))) AS g(i)
),
leak_occ AS (
    SELECT p.eval_id, p.pos, p.n_tok
    FROM eval_pos p JOIN leaked l ON l.eval_id = p.eval_id AND l.sh = p.sh
),
spans AS (
    SELECT eval_id, MIN(pos) AS span_start,
           CAST(MAX(LEAST(pos + {SHINGLE_N} - 1, n_tok)) AS INT) AS span_end
    FROM leak_occ GROUP BY eval_id
),
cov AS (
    SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_covered_tokens
    FROM (
        SELECT DISTINCT eval_id, cpos
        FROM leak_occ,
             UNNEST(generate_series(pos, LEAST(pos + {SHINGLE_N} - 1, n_tok))) AS c(cpos)
    ) GROUP BY eval_id
)
SELECT eval_id,
       COUNT(DISTINCT train_id) AS n_train_sources,
       COUNT(DISTINCT sh) AS n_shared_shingles,
       MIN(span_start) AS span_start,
       MIN(span_end) AS span_end,
       MIN(n_covered_tokens) AS n_covered_tokens
FROM eval_sh JOIN train_sh USING (sh)
JOIN spans USING (eval_id) JOIN cov USING (eval_id)
GROUP BY eval_id
ORDER BY eval_id
"""


# ---------------------------------------------------------------------------
# q_pair_dedup — exact + n-gram-Jaccard + MinHash-LSH pairs in one relation
# ---------------------------------------------------------------------------
def q_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-producing dedup strategies over the same planted corpus,
    tagged and unioned so one driver CORRECTNESS row covers every
    candidate-generation plan (digest groupBy / capped shingle self-join /
    banded signature join / signature-store ingest / segment-digest
    self-join). `score` is 1.0 for exact duplicates, exact Jaccard for
    ngram, signature-agreement estimate for minhash, and the distinct
    shared-segment count for segment (Lee et al. 2021's exact-substring
    family at fixed 20-token-segment granularity)."""
    # ONE shingle pass and ONE signature pass serve the ngram, minhash, and
    # incremental branches: the (doc_id, sh) relation is persisted and
    # handed to each strategy, and the k-min signature aggregate over it is
    # computed once and sliced by doc_id range for the batch/store split —
    # exactly how a production ingest slices a shared signature store by
    # batch (signatures, ~100 B/doc, are what you materialize at scale)
    from ..operators.dedup import minhash_signatures, shingle_table

    corpus = planted_documents(spark, sf_dir)
    sh_all = shingle_table(corpus, "doc_id", "text", SHINGLE_N).persist()
    sig_all = minhash_signatures(
        corpus, "doc_id", "text", k=_K, shingle_n=SHINGLE_N, shingles=sh_all
    ).persist()

    exact = q_exact_dedup(spark, sf_dir, corpus=corpus).select(
        F.lit("exact").alias("method"),
        F.col("keep_id").alias("id_a"),
        F.col("dup_id").alias("id_b"),
        F.lit(1.0).alias("score"),
    )
    ngram = q_ngram_jaccard(spark, sf_dir, shingles=sh_all, corpus=corpus).select(
        F.lit("ngram").alias("method"), "id_a", "id_b",
        F.col("jaccard").alias("score"),
    )
    minhash = q_minhash_lsh(
        spark, sf_dir, signatures=sig_all, corpus=corpus
    ).select(
        F.lit("minhash").alias("method"), "id_a", "id_b",
        F.col("est_jaccard").alias("score"),
    )
    # incremental path: signature store built from the originals (< 1M),
    # then one ingest of the planted copies — must emit exactly the pairs
    # touching the new batch (id_b ≥ 1M, since id_a < id_b). Store and
    # batch signatures are doc_id-range slices of the shared relation.
    from ..operators.dedup import incremental_minhash_pairs

    b2 = corpus.filter(F.col("doc_id") >= EXACT_OFFSET)
    store = sig_all.filter(F.col("doc_id") < EXACT_OFFSET)
    incr_pairs, _ = incremental_minhash_pairs(
        store, b2, "doc_id", "text", k=_K, bands=_BANDS, shingle_n=SHINGLE_N,
        threshold=0.5,
        batch_signatures=sig_all.filter(F.col("doc_id") >= EXACT_OFFSET),
    )
    incr = incr_pairs.select(
        F.lit("minhash_incr").alias("method"), "id_a", "id_b",
        F.col("est_jaccard").alias("score"),
    )
    from ..operators.dedup import segment_pairs

    segment = segment_pairs(corpus, "doc_id", "text", seg_tokens=SEG_TOKENS).select(
        F.lit("segment").alias("method"),
        "id_a",
        "id_b",
        F.col("n_shared").cast("double").alias("score"),
    )

    # fuzzy record linkage (operators/linkage.py): customer names with one
    # deterministically planted mid-string typo per %10==0 record must link
    # back to their originals via blocked Levenshtein — entity resolution
    # under the same hash gate as the text-dedup strategies.
    # Bounded corpus (c_custkey < 3000) + max_distance=1: TPC-H names are
    # near-sequential zero-padded IDs — the PATHOLOGICAL case for edit
    # distance, where any two keys differing in one digit are lev-1
    # "matches"; the last-3-digit block key has FIXED cardinality, so an
    # unbounded corpus grows blocks linearly with SF and coincidental
    # pairs quadratically (measured 105k pairs at sf0.1 unbounded). The
    # absolute bound keeps the demonstration constant-sized at every SF
    # while covering all planted typos inside it; real entity data blocks
    # on discriminative fields instead, and the operator's max_block_rows
    # tripwire guards the production path.
    from ..operators.linkage import blocked_fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < FUZZY_MAX_KEY
    ).select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("nm"))
    typos = cust.filter(F.col("rid") % 10 == 0).select(
        (F.col("rid") + FUZZY_OFFSET).alias("rid"),
        F.concat(
            F.expr("substring(nm, 1, CAST(rid % 6 + 10 AS INT) - 1)"),
            F.lit("X"),
            F.expr("substring(nm, CAST(rid % 6 + 10 AS INT) + 1)"),
        ).alias("nm"),
    )
    fuzzy = blocked_fuzzy_pairs(
        cust.unionByName(typos), "rid", "nm", max_distance=1, max_block_rows=None
    ).select(
        F.lit("fuzzy").alias("method"),
        "id_a",
        "id_b",
        F.col("distance").cast("double").alias("score"),
    )
    return (
        exact.unionByName(ngram)
        .unionByName(minhash)
        .unionByName(incr)
        .unionByName(segment)
        .unionByName(fuzzy)
        .orderBy("method", "id_a", "id_b")
    )


SEG_TOKENS = 20
FUZZY_OFFSET = 8_000_000
FUZZY_MAX_KEY = 3_000


def _oracle_segment_pairs() -> str:
    return f"""
WITH {PLANTED_SQL.strip()},
seg_occ AS (
    SELECT DISTINCT doc_id, md5(seg) AS h FROM (
        SELECT doc_id,
               array_to_string(
                   list_slice(tk, u * {SEG_TOKENS} + 1, u * {SEG_TOKENS} + {SEG_TOKENS}),
                   ' '
               ) AS seg
        FROM (
            SELECT doc_id, tk,
                   unnest(generate_series(
                       0,
                       greatest(CAST(ceil(len(tk) / {SEG_TOKENS}.0) AS INT), 1) - 1
                   )) AS u
            FROM (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS tk
                FROM planted
            )
        )
    )
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM seg_occ a JOIN seg_occ b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def _oracle_fuzzy_pairs() -> str:
    return f"""
WITH fuzzy_corpus AS (
    SELECT c_custkey AS rid, c_name AS nm FROM customer WHERE c_custkey < {FUZZY_MAX_KEY}
    UNION ALL
    SELECT c_custkey + {FUZZY_OFFSET},
           substr(c_name, 1, CAST(c_custkey % 6 + 10 AS INT) - 1) || 'X' ||
           substr(c_name, CAST(c_custkey % 6 + 10 AS INT) + 1)
    FROM customer WHERE c_custkey % 10 = 0 AND c_custkey < {FUZZY_MAX_KEY}
),
blocked AS (
    SELECT rid, nm,
           CAST(len(nm) AS VARCHAR) || '|' || substr(nm, len(nm) - 2, 3) AS blk
    FROM fuzzy_corpus
)
SELECT a.rid AS id_a, b.rid AS id_b, levenshtein(a.nm, b.nm) AS distance
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.rid < b.rid
WHERE levenshtein(a.nm, b.nm) <= 1
"""


def _oracle_pair_dedup() -> str:
    return f"""
SELECT 'exact' AS method, keep_id AS id_a, dup_id AS id_b, 1.0::DOUBLE AS score
FROM ({ORACLE_EXACT_DEDUP})
UNION ALL
SELECT 'ngram' AS method, id_a, id_b, jaccard AS score
FROM ({ORACLE_NGRAM_JACCARD})
UNION ALL
SELECT 'minhash' AS method, id_a, id_b, est_jaccard AS score
FROM ({_oracle_minhash_lsh()})
UNION ALL
-- incremental ingest of the copies over a store of the originals emits
-- exactly the full-corpus pairs that touch the new batch (max id ≥ 1M)
SELECT 'minhash_incr' AS method, id_a, id_b, est_jaccard AS score
FROM ({_oracle_minhash_lsh()})
WHERE id_b >= {EXACT_OFFSET}
UNION ALL
SELECT 'segment' AS method, id_a, id_b, CAST(n_shared AS DOUBLE) AS score
FROM ({_oracle_segment_pairs()})
UNION ALL
SELECT 'fuzzy' AS method, id_a, id_b, CAST(distance AS DOUBLE) AS score
FROM ({_oracle_fuzzy_pairs()})
ORDER BY method, id_a, id_b
"""


# ---------------------------------------------------------------------------
# q_dedup_clusters — pairs → connected components → canonical survivors
# ---------------------------------------------------------------------------
# A second exact copy (offset 6M) of every %100==0 doc turns those planted
# groups into 3-cliques, so the component labeling must merge >1 edge per
# cluster; long-chain convergence is covered by tests/test_graph.py.
CLUSTER_OFFSET = 6_000_000

_CLUSTER_PLANTED_SQL = f"""
planted AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {EXACT_OFFSET}, text FROM documents WHERE doc_id % 100 = 0
    UNION ALL
    SELECT doc_id + {NEAR_OFFSET}, text || '{TRAILER}' FROM documents WHERE doc_id % 100 = 1
    UNION ALL
    SELECT doc_id + {CLUSTER_OFFSET}, text FROM documents WHERE doc_id % 100 = 0
)
"""


PAGERANK_ITERS = 4
PAGERANK_SCALE = 10**12


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analysis of the near-dup pair relation, two tagged variants:
    'cluster' — n-gram-Jaccard pairs through distributed connected
    components (operators/graph.py min-label propagation), one row per
    clustered doc with cluster id/size/canonical-survivor flag (the
    keep-one filter is `corpus LEFT ANTI JOIN (this WHERE NOT
    is_canonical)`); 'pagerank' — exact-integer PageRank centrality over
    the same pair graph (which copy is the hub?), rank carried as the
    scaled long so cross-engine hashes are bit-identical. One shared,
    materialized pair pass feeds both."""
    from ..operators.graph import dedup_clusters, pagerank

    docs = planted_documents(spark, sf_dir)
    extra = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 100 == 0)
        .select((F.col("doc_id") + CLUSTER_OFFSET).alias("doc_id"), "text")
    )
    corpus = docs.unionByName(extra)
    # xxhash64 shingle keys: this pass is not shared with MinHash, and
    # Jaccard counts distinct shingle STRINGS (the hash only relabels) —
    # see operators/dedup.shingle_table
    pairs = ngram_jaccard_pairs(
        corpus, "doc_id", "text",
        n=SHINGLE_N, threshold=0.6, max_doc_freq=MAX_SHINGLE_DF,
        hash_fn=F.xxhash64,
    ).localCheckpoint(eager=True)  # shared by both graph consumers
    zero = F.lit(0).cast("long")
    cl = dedup_clusters(pairs).select(
        F.lit("cluster").alias("variant"),
        "doc_id", "cluster_id", "cluster_size", "is_canonical",
        zero.alias("score_scaled"),
    )
    pr = pagerank(
        pairs, iters=PAGERANK_ITERS, scale=PAGERANK_SCALE
    ).select(
        F.lit("pagerank").alias("variant"),
        F.col("node").alias("doc_id"),
        zero.alias("cluster_id"),
        zero.alias("cluster_size"),
        F.lit(False).alias("is_canonical"),
        F.col("rank_scaled").alias("score_scaled"),
    )
    return cl.unionByName(pr).orderBy("variant", "doc_id")


# Oracle: identical pair SQL, then (a) transitive closure via recursive CTE
# — min reachable id per node ≡ the engine's min-label fixpoint — and
# (b) the PageRank power iteration unrolled to PAGERANK_ITERS CTEs; both
# engines do pure 64-bit integer arithmetic, so ranks match bit-for-bit.
def _pagerank_ctes(iters: int, damping: int = 85, scale: int = PAGERANK_SCALE) -> str:
    base = (scale * (100 - damping)) // 100
    ctes = [
        "pr_nodes AS (SELECT DISTINCT node FROM edges)",
        "pr_deg AS (SELECT node AS s, COUNT(*) AS outdeg FROM edges GROUP BY node)",
        f"pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM pr_nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""pr{i} AS (
    SELECT n.node, CAST({base} + COALESCE(f.inflow, 0) AS BIGINT) AS r
    FROM pr_nodes n LEFT JOIN (
        SELECT e.nbr AS node,
               CAST(SUM((r.r * {damping}) // (100 * d.outdeg)) AS BIGINT) AS inflow
        FROM edges e
        JOIN pr{i - 1} r ON r.node = e.node
        JOIN pr_deg d ON d.s = e.node
        GROUP BY e.nbr
    ) f USING (node)
)""")
    return ",\n".join(ctes)


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_CLUSTER_PLANTED_SQL.strip()},
{_SHINGLES_SQL.strip()},
capped AS (
    SELECT s.doc_id, s.sh
    FROM shingles s
    JOIN (
        SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ) keep USING (sh)
),
sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id
),
pairs AS (
    SELECT id_a, id_b
    FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.6
),
edges AS (
    SELECT id_a AS node, id_b AS nbr FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach (node, lbl) AS (
    SELECT node, node FROM (SELECT DISTINCT node FROM edges)
    UNION
    SELECT e.node, r.lbl FROM edges e JOIN reach r ON e.nbr = r.node
),
labels AS (
    SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
{_pagerank_ctes(PAGERANK_ITERS)}
SELECT 'cluster' AS variant, doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical,
       CAST(0 AS BIGINT) AS score_scaled
FROM labels
UNION ALL
SELECT 'pagerank', node, CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE, r
FROM pr{PAGERANK_ITERS}
ORDER BY variant, doc_id
"""


QUERIES = {
    "pair_dedup": q_pair_dedup,
    "dedup_clusters": q_dedup_clusters,
    "decontamination": q_decontamination,
}

ORACLE = {
    "pair_dedup": _oracle_pair_dedup(),
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "decontamination": ORACLE_DECONTAMINATION,
}
