"""Corpus relevance scoring: TF-IDF and BM25, pure DataFrame plans.

Training-data pipelines rank/filter documents against keyword probes
constantly (quality heuristics, topic filters, retrieval-style audits).
Both scorers here are classic IR statistics (Robertson & Spärck Jones;
BM25 as in Robertson et al., TREC-3 1994) computed with built-in
aggregates only — no Python in the hot path, every intermediate an
equi-keyed aggregate or a broadcast join:

* token table    — one explode; reused by tf, dl, and df.
* tf (doc,term)  — groupBy count; the only |corpus|-sized shuffle.
* dl, avgdl, N   — per-doc count + ONE 1-row global aggregate that
                   broadcast-cross-joins back (never `.collect()`ed).
* df (term)      — groupBy over the tf table (already distinct per doc).
* BM25           — query terms are a literal handful: the term list, the
                   per-term df, and the global stats all BROADCAST, so
                   scoring is a map-side pass over tf.

At 100 TB: tf/dl partition by doc_id (aligned, reused), df by term; the
only data-sized exchange is the initial (doc_id, tok) shuffle. Skewed
stop-tokens inflate a single df key by count, not by pairs — df is a
map-side-combined count, so no quadratic hazard (contrast the dedup
self-join, operators/dedup.py::cap_hot_shingles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, tok) with multiplicity — whitespace tokenization, the same
    convention as functions/text.py (oracle: regexp_split_to_array '\\s+')."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )


def term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, tok, tf)."""
    return (
        token_table(df, id_col, text_col)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, tok, tf, tfidf) with tfidf = tf · ln(N/df_t), full precision
    (callers round at presentation). N and df_t ride broadcast joins."""
    tf = term_freq(df, id_col, text_col)
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))  # 1 row
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .select("doc_id", "tok", "tf", "tfidf")
    )


def bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score, n_hit_terms) — BM25 of each document against a fixed
    term set; only docs containing ≥1 query term appear.

    idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))   (Lucene's nonnegative form)
    score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    """
    spark = df.sparkSession
    # one explode; dl re-aggregates tf (Σ tf per doc ≡ token count) so the
    # corpus is scanned and shuffled once, not twice
    tf = term_freq(df, id_col, text_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )  # 1 row
    # dedupe the term set: a repeated query term would fan out the tf join
    # and double-count df, shrinking that term's idf and skewing every score
    qt = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "tok string"
    )
    dfreq_q = (
        tf.join(F.broadcast(qt), "tok").groupBy("tok").agg(F.count("*").alias("df"))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq_q), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * norm)
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count("*").alias("n_hit_terms"),
        )
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier (fastText-style scoring at scale)
# ---------------------------------------------------------------------------
QLR_BUCKETS = 2003  # feature-hash dimensionality (prime)
QLR_SCALE = 1000  # weights are micro-ints in [-1000, 1000] ⇒ exact sums


def hashed_features(df: DataFrame, id_col: str, text_col: str, *, salt: str = "qlr") -> DataFrame:
    """(doc_id, bucket) rows: word unigrams + bigrams, feature-hashed into
    QLR_BUCKETS buckets (Weinberger et al. 2009 "feature hashing"). All
    JVM-side: split/zip_with build the n-gram arrays, one explode emits the
    feature stream, the md5-portable hash buckets it — the exact pipeline a
    fastText-style classifier scores over, and the only corpus-sized
    exchange downstream is the groupBy(doc_id) that sums weights."""
    from ..functions.text import portable_hash60

    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__t"),
    )
    bigrams = F.expr(
        "zip_with(slice(__t, 1, size(__t) - 1), slice(__t, 2, size(__t) - 1), "
        "(a, b) -> concat(a, '_', b))"
    )
    feats = t.select("doc_id", F.explode(F.concat(F.col("__t"), bigrams)).alias("feat"))
    return feats.select(
        "doc_id",
        F.pmod(
            portable_hash60(F.concat(F.lit(salt + "|"), F.col("feat"))),
            F.lit(QLR_BUCKETS),
        ).alias("bucket"),
    )


def seeded_weights_int(bucket: Column) -> Column:
    """Deterministic stand-in model: micro-int weight in [-QLR_SCALE,
    QLR_SCALE] derived from the bucket id — replace with a TRAINED weight
    relation via the `weights` arg of `quality_scores` in production (the
    quantization to integer micro-weights is itself the production trick
    that makes scores bit-reproducible across engines and re-runs)."""
    from ..functions.text import portable_hash60

    return (
        F.pmod(
            portable_hash60(F.concat(F.lit("w|"), bucket.cast("string"))),
            F.lit(2 * QLR_SCALE + 1),
        )
        - QLR_SCALE
    )


def quality_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    weights: DataFrame | None = None,
    salt: str = "qlr",
) -> DataFrame:
    """Per-document linear quality score over hashed n-gram features.

    margin = Σ w[bucket(f)] / (QLR_SCALE · n_features) — the mean micro-int
    weight, computed as ONE exact integer sum per doc divided by an exact
    integer, so the double is bit-identical in any engine (no float
    accumulation order anywhere). keep = (integer sum > 0).

    `weights`: optional (bucket, weight) relation — a trained, quantized
    model; it is broadcast (QLR_BUCKETS rows) and missing buckets score 0.
    Without it, the seeded stand-in weights are computed map-side (no join
    at all). Shuffle accounting: explode → groupBy(doc_id) is the one
    corpus-sized exchange, same shape as term_freq.
    """
    feats = hashed_features(df, id_col, text_col, salt=salt)
    if weights is not None:
        scored = feats.join(F.broadcast(weights), "bucket", "left").withColumn(
            "w", F.coalesce(F.col("weight"), F.lit(0)).cast("long")
        )
    else:
        scored = feats.withColumn("w", seeded_weights_int(F.col("bucket")).cast("long"))
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_features"), F.sum("w").alias("w_sum")
    )
    margin = (
        F.floor(
            F.col("w_sum").cast("double")
            / (F.lit(float(QLR_SCALE)) * F.col("n_features").cast("double"))
            * F.lit(1000000.0)
        )
        / 1000000.0
    )
    return agg.select(
        "doc_id",
        "n_features",
        margin.alias("margin"),
        (F.col("w_sum") > 0).alias("keep"),
    )
