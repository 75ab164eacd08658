"""Embedding similarity-search queries over `embeddings` (north-star: ANN
over array<float>).

Cosines are computed as sequential double folds in Spark and as
``list_cosine_similarity(CAST(… AS DOUBLE[]), …)`` in DuckDB — measured
bit-exact across 9600 pairs, rounded to 6 dp anyway, and ranked on the
rounded value with id tie-breaks so ordering can never drift.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, portable_hash60_sql
from ..operators.similarity import (
    COSINE_SQL,
    DOT_SQL,
    blocked_neardup,
    cosine_topk,
    hyperplanes,
    ivf_topk,
    lsh_topk,
    quantized_topk,
    semantic_cells,
)
from ..operators.similarity import Q8_LEVELS
from ..sources.tables import load_table

TOPK_K = 5
N_QUERIES = 10
NEARDUP_OFFSET = 1_000_000
NEARDUP_THRESHOLD = 0.9
IVF_CELLS = 16
IVF_NPROBE = 4
EMB_DIM = 64  # synthetic embeddings.embedding dimensionality (TESTDATA.md)
LSH_PLANES = 6
LSH_TABLES = 4
LSH_SEED = 42
PQ_M = 4       # subspaces (64-dim → 4×16-dim, 4-byte codes: 64× compression)
PQ_KSUB = 16   # codebook entries per subspace
PQ_RERANK = 6  # exact-rescore pool = PQ_RERANK·k


# ---------------------------------------------------------------------------
# q_embedding_topk — exact brute-force cosine top-k (the baseline)
# ---------------------------------------------------------------------------
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors for the first 10 vectors. The query side broadcasts;
    the corpus streams map-side — linear in corpus size, the exact-rescore
    baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return cosine_topk(queries, emb, k=TOPK_K).orderBy("query_id", "rank")


ORACLE_EMBEDDING_TOPK = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           ROUND({COSINE_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM scored
)
SELECT query_id, rank, neighbor_id, cos
FROM ranked
WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# q_embedding_neardup — cosine near-dup pairs within a blocking key
# ---------------------------------------------------------------------------
SEM_CELLS = 16


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus planted exact copies (vec_id % 100 == 0, id + 1M,
    identical vector ⇒ cos = 1.0) — the recoverable near-dup ground truth;
    random embeddings have cos ≈ N(0, 1/√64)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    planted = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"), "embedding", "label"
    )
    return emb.unionByName(planted)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate detection, three variants under one driver
    row (50-entry consolidation), each a row tagged `variant`:

    * `blocked` — pairs (cos ≥ 0.9) within a CALLER-supplied block (`label`):
      `operators/similarity.blocked_neardup`, quadratic in block size only.
    * `semdedup` — SemDeDup (Abbas et al. 2023): blocks DERIVED from the
      embedding geometry — k-means cells via broadcast nearest-centroid
      assignment (`semantic_cells`, md5-stripe seeded so DuckDB replicates
      centroid choice), then the same within-cell pair join.
    * `census` — the greedy keep-lowest-id survivor census per cell
      (`semantic_dedup_survivors` semantics): id_a = survivor count,
      id_b = SUM of surviving vec_ids — a checksum pinning the exact
      survivor SET, not just its size, under the hash gate.

    Planted identical copies always share a cell (identical vectors score
    identically, ties broken by cent_id), so every planted pair is
    recovered by BOTH variants and every planted copy (higher id) is
    dropped from the census."""
    allv = _planted_corpus(spark, sf_dir)
    blocked = blocked_neardup(allv, threshold=NEARDUP_THRESHOLD).select(
        F.lit("blocked").alias("variant"),
        F.col("label").cast("bigint").alias("block"),
        "id_a",
        "id_b",
        "cos",
    )

    def stripe(ids):
        return F.pmod(portable_hash60(ids.cast("string")), F.lit(SEM_CELLS))

    # persist the assignment: cells feeds the within-cell pair join AND the
    # census below — without the pin the census re-runs the whole
    # centroid-seed + broadcast nearest-centroid pass (a second full
    # corpus × centroids scoring scan, measured as the query's second-
    # largest job). Corpus (id, vec, cell) rows only — small at any SF
    # relative to the pair join it feeds.
    cells = semantic_cells(allv, n_cells=SEM_CELLS, stripe_fn=stripe).persist()
    # pairs feeds the sem branch AND the census's dropped-id set — persist
    # or the quadratic within-cell join runs twice
    pairs = blocked_neardup(
        cells, block_col="cell_id", threshold=NEARDUP_THRESHOLD, max_block_rows=None
    ).persist()
    sem = pairs.select(
        F.lit("semdedup").alias("variant"),
        F.col("cell_id").cast("bigint").alias("block"),
        "id_a",
        "id_b",
        "cos",
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    census = (
        cells.join(F.broadcast(dropped), "vec_id", "left_anti")
        .groupBy("cell_id")
        .agg(F.count("*").alias("id_a"), F.sum("vec_id").alias("id_b"))
        .select(
            F.lit("census").alias("variant"),
            F.col("cell_id").cast("bigint").alias("block"),
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.lit(None).cast("double").alias("cos"),
        )
    )
    return (
        blocked.unionByName(sem)
        .unionByName(census)
        .orderBy("variant", "block", "id_a", "id_b")
    )


_SEM_STRIPE = portable_hash60_sql("CAST(vec_id AS VARCHAR)") + f" % {SEM_CELLS}"

ORACLE_EMBEDDING_NEARDUP = f"""
WITH planted AS (
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + {NEARDUP_OFFSET}, embedding, label
    FROM embeddings WHERE vec_id % 100 = 0
),
blocked_pairs AS (
    SELECT CAST(a.label AS BIGINT) AS block, a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS cos
    FROM planted a
    JOIN planted b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= {NEARDUP_THRESHOLD}
),
striped AS (
    SELECT vec_id, embedding, {_SEM_STRIPE} AS stripe FROM planted
),
centroids AS (
    SELECT stripe AS cent_id, embedding AS cent_vec FROM (
        SELECT stripe, embedding,
               ROW_NUMBER() OVER (PARTITION BY stripe ORDER BY vec_id) AS rn
        FROM striped
    ) WHERE rn = 1
),
cells AS (
    SELECT vec_id, embedding, cent_id AS cell_id FROM (
        SELECT s.vec_id, s.embedding, t.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id
                   ORDER BY ROUND({DOT_SQL.format(a='s.embedding', b='t.cent_vec')}, 9) DESC,
                            t.cent_id
               ) AS r
        FROM striped s CROSS JOIN centroids t
    ) WHERE r = 1
),
sem_pairs AS (
    SELECT CAST(a.cell_id AS BIGINT) AS block, a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS cos
    FROM cells a
    JOIN cells b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    WHERE ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= {NEARDUP_THRESHOLD}
),
census AS (
    SELECT CAST(cell_id AS BIGINT) AS block,
           COUNT(*) AS id_a, CAST(SUM(vec_id) AS BIGINT) AS id_b
    FROM cells
    WHERE vec_id NOT IN (SELECT DISTINCT id_b FROM sem_pairs)
    GROUP BY cell_id
)
SELECT 'blocked' AS variant, block, id_a, id_b, cos FROM blocked_pairs
UNION ALL
SELECT 'semdedup' AS variant, block, id_a, id_b, cos FROM sem_pairs
UNION ALL
SELECT 'census' AS variant, block, id_a, id_b, CAST(NULL AS DOUBLE) AS cos
FROM census
ORDER BY variant, block, id_a, id_b
"""


# ---------------------------------------------------------------------------
# q_ivf_ann — IVF (inverted-file) approximate nearest neighbor, oracle-checked
# ---------------------------------------------------------------------------
def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 10 vectors — the 100 TB scale path for
    similarity search, with the ENTIRE index construction oracle-checked:
    centroid seeding (lowest-id vector per md5-hash stripe), nearest-centroid
    cell assignment (broadcast, map-side), nprobe=4 probing, and exact cosine
    rescoring restricted to probed cells. Rescoring touches ~nprobe/n_cells
    of the corpus instead of all of it; every phase is an equi-join or a
    broadcast, so the plan has no cross product on the corpus side.

    The stripe hash is the md5-portable hash (not xxhash64) precisely so the
    DuckDB oracle replicates centroid selection bit-for-bit — an APPROXIMATE
    algorithm under an EXACT differential test.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    def stripe(ids):
        return F.pmod(portable_hash60(ids.cast("string")), F.lit(IVF_CELLS))

    return ivf_topk(
        queries,
        emb,
        k=TOPK_K,
        n_cells=IVF_CELLS,
        nprobe=IVF_NPROBE,
        stripe_fn=stripe,
    ).orderBy("query_id", "rank")


_HASH_CELL = portable_hash60_sql("CAST(vec_id AS VARCHAR)") + f" % {IVF_CELLS}"

ORACLE_IVF_ANN = f"""
WITH c AS (
    SELECT vec_id AS neighbor_id, embedding AS cv, {_HASH_CELL} AS cell
    FROM embeddings
),
centroids AS (
    SELECT cell AS cent_id, cv AS cent_vec FROM (
        SELECT cell, cv,
               ROW_NUMBER() OVER (PARTITION BY cell ORDER BY neighbor_id) AS rn
        FROM c
    ) WHERE rn = 1
),
corpus_cells AS (
    SELECT neighbor_id, cv, cent_id AS cell_id FROM (
        SELECT s.neighbor_id, s.cv, t.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY s.neighbor_id
                   ORDER BY ROUND({DOT_SQL.format(a='s.cv', b='t.cent_vec')}, 9) DESC,
                            t.cent_id
               ) AS r
        FROM c s CROSS JOIN centroids t
    ) WHERE r = 1
),
query_cells AS (
    SELECT query_id, qv, cell_id FROM (
        SELECT q.neighbor_id AS query_id, q.cv AS qv, t.cent_id AS cell_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.neighbor_id
                   ORDER BY ROUND({DOT_SQL.format(a='q.cv', b='t.cent_vec')}, 9) DESC,
                            t.cent_id
               ) AS r
        FROM c q CROSS JOIN centroids t
        WHERE q.neighbor_id < {N_QUERIES}
    ) WHERE r <= {IVF_NPROBE}
),
cand AS (
    SELECT DISTINCT qc.query_id, qc.qv, cc.neighbor_id, cc.cv
    FROM query_cells qc JOIN corpus_cells cc USING (cell_id)
    WHERE qc.query_id <> cc.neighbor_id
),
scored AS (
    SELECT query_id, neighbor_id,
           ROUND({COSINE_SQL.format(a='qv', b='cv')}, 6) AS cos
    FROM cand
)
SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM scored
) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# q_ivf_ann_refined — IVF with one spherical-k-means (Lloyd) refinement step,
# the ENTIRE iteration replicated in the DuckDB oracle (unrolled, not
# recursive): assign → per-cell element-wise mean → unit-normalize → float
# quantize → re-probe. Float quantization (CAST AS FLOAT/REAL) on centroid
# components absorbs cross-engine summation-order drift in the means; the
# norm is a sequential fold over the d-ordered list on BOTH sides
# (Spark `aggregate(sort_array(...))` ≡ DuckDB `list_dot_product(ms, ms)`).
# ---------------------------------------------------------------------------
def q_ivf_ann_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd-refined IVF ANN: same probe/rescore structure as `ivf_ann` but
    centroids are improved by one k-means iteration first (assignment is a
    broadcast map-side pass; the mean is a posexplode → groupBy(cell, dim)
    shuffle sized |corpus|·dim — the standard distributed-EM shape where the
    DRIVER loops over tiny state and each step is one distributed pass)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    def stripe(ids):
        return F.pmod(portable_hash60(ids.cast("string")), F.lit(IVF_CELLS))

    return ivf_topk(
        queries,
        emb,
        k=TOPK_K,
        n_cells=IVF_CELLS,
        nprobe=IVF_NPROBE,
        lloyd_iterations=1,
        stripe_fn=stripe,
    ).orderBy("query_id", "rank")


ORACLE_IVF_ANN_REFINED = f"""
WITH c AS (
    SELECT vec_id AS neighbor_id, embedding AS cv, {_HASH_CELL} AS cell
    FROM embeddings
),
seed_centroids AS (
    SELECT cell AS cent_id, cv AS cent_vec FROM (
        SELECT cell, cv,
               ROW_NUMBER() OVER (PARTITION BY cell ORDER BY neighbor_id) AS rn
        FROM c
    ) WHERE rn = 1
),
-- one unrolled Lloyd iteration: nearest-seed assignment by raw dot product
lloyd_assign AS (
    SELECT neighbor_id, cv, cell FROM (
        SELECT s.neighbor_id, s.cv, t.cent_id AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY s.neighbor_id
                   ORDER BY {DOT_SQL.format(a='s.cv', b='t.cent_vec')} DESC,
                            t.cent_id
               ) AS r
        FROM c s CROSS JOIN seed_centroids t
    ) WHERE r = 1
),
dims AS (
    SELECT cell, generate_subscripts(cv, 1) AS d, CAST(unnest(cv) AS DOUBLE) AS x
    FROM lloyd_assign
),
means AS (
    SELECT cell, d, AVG(x) AS m FROM dims GROUP BY cell, d
),
mean_lists AS (
    SELECT cell, list(m ORDER BY d) AS ms FROM means GROUP BY cell
),
centroids AS (
    SELECT cell AS cent_id,
           list_transform(ms, m -> CAST(m / sqrt(list_dot_product(ms, ms)) AS REAL)) AS cent_vec
    FROM mean_lists
),
corpus_cells AS (
    SELECT neighbor_id, cv, cent_id AS cell_id FROM (
        SELECT s.neighbor_id, s.cv, t.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY s.neighbor_id
                   ORDER BY ROUND({DOT_SQL.format(a='s.cv', b='t.cent_vec')}, 9) DESC,
                            t.cent_id
               ) AS r
        FROM c s CROSS JOIN centroids t
    ) WHERE r = 1
),
query_cells AS (
    SELECT query_id, qv, cell_id FROM (
        SELECT q.neighbor_id AS query_id, q.cv AS qv, t.cent_id AS cell_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.neighbor_id
                   ORDER BY ROUND({DOT_SQL.format(a='q.cv', b='t.cent_vec')}, 9) DESC,
                            t.cent_id
               ) AS r
        FROM c q CROSS JOIN centroids t
        WHERE q.neighbor_id < {N_QUERIES}
    ) WHERE r <= {IVF_NPROBE}
),
cand AS (
    SELECT DISTINCT qc.query_id, qc.qv, cc.neighbor_id, cc.cv
    FROM query_cells qc JOIN corpus_cells cc USING (cell_id)
    WHERE qc.query_id <> cc.neighbor_id
),
scored AS (
    SELECT query_id, neighbor_id,
           ROUND({COSINE_SQL.format(a='qv', b='cv')}, 6) AS cos
    FROM cand
)
SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM scored
) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# q_ann_methods — brute / IVF / sign-LSH top-k in one driver-visible relation
# ---------------------------------------------------------------------------
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-5: seeded hyperplane sign-bits bucket the corpus,
    candidates come from the bucket equi-join (+ Hamming-1 multiprobe)
    unioned over LSH_TABLES independent tables (OR-amplification), exact
    cosine rescores candidates only. Deterministic planes make the whole
    index SQL-replicable — an approximate algorithm under an exact
    differential test, like `ivf_ann`. Settings chosen from the measured
    recall_lsh branch, not guessed (SCALE.md notes the distribution
    dependence)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return lsh_topk(
        queries, emb, k=TOPK_K, n_planes=LSH_PLANES, n_tables=LSH_TABLES,
        seed=LSH_SEED, dim=EMB_DIM,
    ).orderBy("query_id", "rank")


def _oracle_lsh_topk() -> str:
    def bucket_expr(v: str, planes) -> str:
        terms = []
        for j, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(x) for x in plane) + "]"
            terms.append(
                f"CASE WHEN list_dot_product(CAST({v} AS DOUBLE[]), {arr}) > 0 "
                f"THEN {1 << j} ELSE 0 END"
            )
        return " + ".join(terms)

    shifts = [0] + [1 << j for j in range(LSH_PLANES)]
    per_table = []
    for t in range(LSH_TABLES):
        planes = hyperplanes(EMB_DIM, LSH_PLANES, LSH_SEED + 1009 * t)
        per_table.append(f"""
    SELECT p.query_id, c.neighbor_id
    FROM (
        SELECT query_id, xor(qbucket, s) AS bucket
        FROM (
            SELECT vec_id AS query_id,
                   {bucket_expr('embedding', planes)} AS qbucket
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), UNNEST([{", ".join(map(str, shifts))}]) AS t(s)
    ) p
    JOIN (
        SELECT vec_id AS neighbor_id,
               {bucket_expr('embedding', planes)} AS bucket
        FROM embeddings
    ) c USING (bucket)""")
    tables_sql = "\n    UNION ALL\n".join(per_table)
    return f"""
WITH cand AS (
    SELECT DISTINCT query_id, neighbor_id FROM (
    {tables_sql}
    ) WHERE query_id <> neighbor_id
),
scored AS (
    SELECT cand.query_id, cand.neighbor_id,
           ROUND({COSINE_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos
    FROM cand
    JOIN embeddings q ON q.vec_id = cand.query_id
    JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM scored
) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


Q8_RERANK = 4


def q_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized two-stage ANN (operators/similarity.quantized_topk):
    stage 1 ranks by the exact-integer quantized dot product (4× smaller
    corpus at scale), stage 2 exact-rescores the top rerank·k. The entire
    quantization (scale, floor(+0.5) codes, integer dot, rescoring cut) is
    SQL-replicated in the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return quantized_topk(queries, emb, k=TOPK_K, rerank=Q8_RERANK).orderBy(
        "query_id", "rank"
    )


def _oracle_quantized_ann() -> str:
    return f"""
WITH prepped AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
               / {Q8_LEVELS}.0 AS s
    FROM embeddings
),
qn AS (
    SELECT vec_id, v, s,
           CASE WHEN s = 0 THEN list_transform(v, x -> 0.0)
                ELSE list_transform(v, x -> floor(x / s + 0.5)) END AS q
    FROM prepped
),
approx AS (
    SELECT a.vec_id AS query_id, a.v AS qv, b.vec_id AS neighbor_id, b.v AS cv,
           ROUND(a.s * b.s * list_dot_product(a.q, b.q), 9) AS approx
    FROM qn a JOIN qn b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
),
cand AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY approx DESC, neighbor_id
        ) AS r
        FROM approx
    ) WHERE r <= {Q8_RERANK * TOPK_K}
),
rescored AS (
    SELECT query_id, neighbor_id,
           ROUND({COSINE_SQL.format(a='qv', b='cv')}, 6) AS cos
    FROM cand
)
SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM rescored
) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


PQ_SERVE_CELLS = 8  # coarse cells in the served index; probed in full

# one persisted IVFPQ index per (process, sf_dir, corpus fingerprint):
# training + encoding are BUILD-time costs in the serving architecture,
# amortized across every query against the same corpus — re-training per
# query call (the old in-query pq_topk path) billed the whole build to
# each invocation. The fingerprint (embeddings file listing + mtime +
# size) guards the cache against an in-process REWRITE of the corpus
# under the same path: a changed corpus triggers a rebuild instead of
# silently serving the stale index.
_IVFPQ_SERVE_CACHE: dict[tuple, str] = {}


def _corpus_fingerprint(sf_dir: str) -> tuple:
    """Cheap change detector for the embeddings corpus under `sf_dir`:
    (relpath, mtime_ns, size) per data file. Metadata-only — no scan."""
    root = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    ents = []
    if os.path.isfile(root):
        st = os.stat(root)
        ents.append(("", st.st_mtime_ns, st.st_size))
    elif os.path.isdir(root):
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                fp = os.path.join(dirpath, n)
                st = os.stat(fp)
                ents.append((os.path.relpath(fp, root), st.st_mtime_ns, st.st_size))
    return tuple(ents)


def q_pq_ann(
    spark: SparkSession, sf_dir: str, caches_out: list | None = None
) -> DataFrame:
    """Product-quantization ANN served from the PERSISTED IVFPQ index
    (operators/similarity.build_ivfpq_index / ivfpq_index_topk), probed
    with nprobe = n_cells: full probe is EXACTLY pq_topk over the same
    corpus — same codebook training (seeded + one Lloyd step), same ADC
    shortlist, same exact rescore — asserted in
    tests/test_ivf_index.py::test_ivfpq_full_probe_equals_pq_topk. The
    whole pipeline (training included) stays SQL-replicated in the
    oracle. The index builds once per process per sf_dir — the 100 TB
    serving shape, where codes are encoded at ingest and queries scan
    byte-scale codes. `caches_out` is accepted for API compatibility
    (the index path persists nothing in the session)."""
    from ..operators.similarity import build_ivfpq_index, ivfpq_index_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    key = (os.path.realpath(sf_dir), _corpus_fingerprint(sf_dir))
    path = _IVFPQ_SERVE_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="wdwa_ivfpq_serve_") + "/idx"
        build_ivfpq_index(
            emb, path, n_cells=PQ_SERVE_CELLS, m=PQ_M, ksub=PQ_KSUB,
            dim=EMB_DIM,
        )
        _IVFPQ_SERVE_CACHE[key] = path
    return ivfpq_index_topk(
        spark, queries, path, k=TOPK_K, nprobe=PQ_SERVE_CELLS,
        rerank=PQ_RERANK,
    ).orderBy("query_id", "rank")


def _oracle_pq_ann() -> str:
    dsub = EMB_DIM // PQ_M
    ms = ", ".join(str(i) for i in range(PQ_M))
    dp = DOT_SQL.format
    dist = (
        f"ROUND({dp(a='p.sv', b='p.sv')} + {dp(a='s.cvec', b='s.cvec')}"
        f" - 2 * {dp(a='p.sv', b='s.cvec')}, 9)"
    )
    adc_sum = " + ".join(
        f"MAX(CASE WHEN cd.m = {i} THEN l.pdot END)" for i in range(PQ_M)
    )
    return f"""
WITH ps AS MATERIALIZED (
    SELECT vec_id AS neighbor_id, m,
           list_slice(CAST(embedding AS DOUBLE[]), m * {dsub} + 1,
                      m * {dsub} + {dsub}) AS sv
    FROM embeddings, UNNEST([{ms}]) AS t(m)
),
seeds AS (
    SELECT m, rn - 1 AS cent_id, sv AS cvec FROM (
        SELECT m, sv,
               ROW_NUMBER() OVER (PARTITION BY m ORDER BY neighbor_id) AS rn
        FROM ps
    ) WHERE rn <= {PQ_KSUB}
),
assign0 AS (
    SELECT neighbor_id, m, cell, sv FROM (
        SELECT p.neighbor_id, p.m, s.cent_id AS cell, p.sv,
               ROW_NUMBER() OVER (
                   PARTITION BY p.neighbor_id, p.m
                   ORDER BY {dist} ASC, s.cent_id
               ) AS r
        FROM ps p JOIN seeds s USING (m)
    ) WHERE r = 1
),
means AS (
    SELECT m, cell, d, AVG(x) AS mu FROM (
        SELECT m, cell, generate_subscripts(sv, 1) AS d, unnest(sv) AS x
        FROM assign0
    ) GROUP BY m, cell, d
),
cents AS MATERIALIZED (
    SELECT m, cell AS cent_id,
           list_transform(list(mu ORDER BY d),
                          x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS cvec
    FROM means GROUP BY m, cell
),
codes AS (
    SELECT neighbor_id, m, cell AS code FROM (
        SELECT p.neighbor_id, p.m, s.cent_id AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY p.neighbor_id, p.m
                   ORDER BY {dist} ASC, s.cent_id
               ) AS r
        FROM ps p JOIN cents s USING (m)
    ) WHERE r = 1
),
lut AS (
    SELECT q.neighbor_id AS query_id, q.m, s.cent_id,
           ROUND({dp(a='q.sv', b='s.cvec')}, 9) AS pdot
    FROM ps q JOIN cents s USING (m)
    WHERE q.neighbor_id < {N_QUERIES}
),
adc AS (
    SELECT l.query_id, cd.neighbor_id, ROUND({adc_sum}, 6) AS approx
    FROM codes cd
    JOIN lut l ON l.m = cd.m AND l.cent_id = cd.code
    WHERE l.query_id <> cd.neighbor_id
    GROUP BY l.query_id, cd.neighbor_id
),
shortlist AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY approx DESC, neighbor_id
        ) AS r FROM adc
    ) WHERE r <= {PQ_RERANK * TOPK_K}
),
pq_scored AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND({COSINE_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cos
    FROM shortlist s
    JOIN embeddings q ON q.vec_id = s.query_id
    JOIN embeddings c ON c.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id
    ) AS rank
    FROM pq_scored
) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


def q_ann_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four ANN tiers over the same queries, tagged and unioned so one
    driver CORRECTNESS row covers the exact baseline (`brute`), the
    inverted-file scale path (`ivf`), the hyperplane-LSH scale path
    (`lsh`), and the int8 quantize-then-rescore path (`q8`) — every index
    construction fully SQL-replicated in the oracle.

    `recall_<m>` branches score each approximate tier against the exact
    baseline per query (the measure-don't-guess evaluation a user tunes
    nprobe/planes/rerank against): neighbor_id carries |topk_m ∩
    topk_brute| and cos carries recall@k. Small-int division is IEEE-exact
    and identical cross-engine."""
    # CONSTRUCT + materialize every tier concurrently. Construction is
    # py4j-bound (thousands of driver↔JVM round-trips building the
    # plane/codebook expression trees — measured ~1.3s per heavy tier,
    # pure serial latency at any cluster size) and the socket waits
    # release the GIL, so the five builds pipeline in threads just like
    # the five materializing jobs do; a serial build-then-parallel-count
    # pays the construction SUM first.
    from concurrent.futures import ThreadPoolExecutor

    inner_caches: list = []  # pq_topk's internal caches, released below
    builders = {
        "brute": lambda: q_embedding_topk(spark, sf_dir),
        "ivf": lambda: q_ivf_ann(spark, sf_dir),
        "lsh": lambda: q_lsh_topk(spark, sf_dir),
        "q8": lambda: q_quantized_ann(spark, sf_dir),
        "pq": lambda: q_pq_ann(spark, sf_dir, caches_out=inner_caches),
    }
    built: dict[str, DataFrame] = {}

    def _build(item):
        tag, fn = item
        df = fn().withColumn("method", F.lit(tag)).persist()
        df.count()  # materialize into the cache
        built[tag] = df

    try:
        with ThreadPoolExecutor(max_workers=5) as pool:
            list(pool.map(_build, builders.items()))
        tiers = tuple(built[t] for t in ("brute", "ivf", "lsh", "q8", "pq"))
        return _assemble_ann_methods(tiers, inner_caches)
    except BaseException:
        # the success path releases caches itself; on ANY failure mid-
        # materialization the tier caches must not outlive the call
        # (CacheManager entries are never GC'd)
        for t in (*built.values(), *inner_caches):
            t.unpersist()
        raise


def _assemble_ann_methods(tiers, inner_caches: list) -> DataFrame:
    # tiers arrive persisted AND materialized (q_ann_methods counts each
    # inside its build thread); the assembly below only reads the caches.
    # Each tier is k·|queries| = 50 rows, but the caches hold them at the
    # session's shuffle width (~33-66 near-empty partitions) — without
    # the narrow coalesce the 9-branch union + sort below fans out to
    # ~376 near-empty tasks (measured), pure scheduler overhead. The
    # coalesce reads the SAME cache (no recompute, no shuffle); tier
    # outputs are small BY CONSTRUCTION (k × query batch), independent
    # of corpus size.
    brute, ivf, lsh, q8, pq = (t.coalesce(1) for t in tiers)
    base = brute.select("query_id", "neighbor_id")
    qs = base.select("query_id").distinct()

    def recall(df: DataFrame, tag: str) -> DataFrame:
        hits = (
            df.select("query_id", "neighbor_id")
            .join(base, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        n = F.coalesce(F.col("n_hit"), F.lit(0))
        return qs.join(hits, "query_id", "left").select(
            F.lit(f"recall_{tag}").alias("method"),
            "query_id",
            F.lit(TOPK_K).cast("int").alias("rank"),
            n.cast("long").alias("neighbor_id"),
            (n / TOPK_K).alias("cos"),
        )

    out = (
        brute.unionByName(ivf)
        .unionByName(lsh)
        .unionByName(q8)
        .unionByName(pq)
        .select("method", "query_id", "rank", "neighbor_id", "cos")
        .unionByName(recall(ivf, "ivf"))
        .unionByName(recall(lsh, "lsh"))
        .unionByName(recall(q8, "q8"))
        .unionByName(recall(pq, "pq"))
        # the union is 9 × k·|queries| rows — single-partition it and
        # sort within (== the former global orderBy, minus the range-
        # partitioning exchange the sort would re-fan-out over)
        .repartition(1)
        .sortWithinPartitions("method", "query_id", "rank")
    )
    # materialize the 9-branch union ONCE (each tier computes a single
    # time via its cache), then RELEASE the five tier caches — returning a
    # lazy plan over never-unpersisted caches pinned executor storage for
    # the rest of the session (ADVICE r5); the checkpointed result is
    # k·|queries|·9 rows.
    out = out.localCheckpoint(eager=True)
    # unpersist the ORIGINAL tier frames (the coalesced views above are
    # different plans — unpersisting them would be a no-op)
    for t in (*tiers, *inner_caches):
        t.unpersist()
    return out


def _oracle_ann_methods() -> str:
    recall = "\nUNION ALL\n".join(
        f"""SELECT 'recall_{tag}' AS method, q.query_id,
       CAST({TOPK_K} AS INT) AS rank,
       CAST(COUNT(x.neighbor_id) AS BIGINT) AS neighbor_id,
       COUNT(x.neighbor_id) / CAST({TOPK_K} AS DOUBLE) AS cos
FROM (SELECT DISTINCT query_id FROM brute_t) q
LEFT JOIN (
    SELECT m.query_id, m.neighbor_id
    FROM {tag}_t m JOIN brute_t b
      ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
) x ON x.query_id = q.query_id
GROUP BY q.query_id"""
        for tag in ("ivf", "lsh", "q8", "pq")
    )
    return f"""
WITH brute_t AS MATERIALIZED ({ORACLE_EMBEDDING_TOPK}),
ivf_t AS MATERIALIZED ({ORACLE_IVF_ANN}),
lsh_t AS MATERIALIZED ({_oracle_lsh_topk()}),
q8_t AS MATERIALIZED ({_oracle_quantized_ann()}),
pq_t AS MATERIALIZED ({_oracle_pq_ann()})
SELECT 'brute' AS method, query_id, rank, neighbor_id, cos FROM brute_t
UNION ALL
SELECT 'ivf' AS method, query_id, rank, neighbor_id, cos FROM ivf_t
UNION ALL
SELECT 'lsh' AS method, query_id, rank, neighbor_id, cos FROM lsh_t
UNION ALL
SELECT 'q8' AS method, query_id, rank, neighbor_id, cos FROM q8_t
UNION ALL
SELECT 'pq' AS method, query_id, rank, neighbor_id, cos FROM pq_t
UNION ALL
{recall}
ORDER BY method, query_id, rank
"""


QUERIES = {
    "ann_methods": q_ann_methods,
    "embedding_neardup": q_embedding_neardup,
    "ivf_ann_refined": q_ivf_ann_refined,
}

ORACLE = {
    "ann_methods": _oracle_ann_methods(),
    "embedding_neardup": ORACLE_EMBEDDING_NEARDUP,
    "ivf_ann_refined": ORACLE_IVF_ANN_REFINED,
}
