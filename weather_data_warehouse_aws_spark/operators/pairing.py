"""Deterministic negative-pair sampling for contrastive training data.

North-star: contrastive/embedding training needs "random" negatives per
anchor, but `rand()`-based pairing is irreproducible across engines,
partitionings, and re-runs (the same non-determinism `operators/sampling.py`
exiles from splits). The fix is the same portable-hash trick lifted to
PAIRS: order rows by their md5-prefix hash — a pseudo-random permutation
that every engine computes bit-identically — and pair each row with the
next `k` rows in that order. The permutation is uncorrelated with any data
attribute, so the partners are as-if-random, yet the pairing is a pure
function of the id set.

Plan shape (100 TB): one shuffle to rank within `n_buckets` hash buckets
(window sort per bucket — buckets are hash-balanced by construction), then
a composite-key equi-join (bucket, rank) that AQE plans shuffle-hash; no
cross join, no driver state. Size `n_buckets` ≈ cluster parallelism so
each per-bucket sort fits an executor; pairing quality is unaffected by
the bucket count because the hash order inside any bucket is already
pseudo-random.

The last `k` rows of each bucket get fewer partners (no wraparound — a
wrap would make the pairing depend on the bucket's total count, which
breaks incremental re-runs). With corpus-scale buckets the tail loss is
k·n_buckets rows, negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import portable_hash60, portable_hash60_sql

__all__ = ["negative_pairs", "negative_pairs_ranked_sql"]


def negative_pairs(
    df: DataFrame, id_col: str, *, k: int = 2, n_buckets: int = 64, salt: str = ""
) -> DataFrame:
    """(anchor_id, negative_id, j) with j in 1..k — the j-th pseudo-random
    negative for each anchor. Deterministic for a given id set + salt;
    change `salt` to draw a fresh independent pairing (e.g. per epoch)."""
    h = portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    ranked = (
        df.select(F.col(id_col))
        .withColumn("__h", h)
        .withColumn("__b", F.pmod(F.col("__h"), F.lit(n_buckets)))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__b").orderBy("__h", id_col)),
        )
    )
    anchors = ranked.select(
        F.col(id_col).alias("anchor_id"), "__b", "__rn"
    ).withColumn("j", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)])))
    partners = ranked.select(
        F.col(id_col).alias("negative_id"),
        F.col("__b").alias("__pb"),
        F.col("__rn").alias("__prn"),
    )
    return (
        anchors.join(
            partners,
            (anchors["__b"] == partners["__pb"])
            & ((anchors["__rn"] + anchors["j"]) == partners["__prn"]),
        )
        .select("anchor_id", "negative_id", "j")
    )


def negative_pairs_ranked_sql(relation: str, id_expr: str, *, n_buckets: int = 64, salt: str = "") -> str:
    """DuckDB CTE body computing the identical (id, bucket, rank) ranking —
    the shared constant that keeps engine and oracle in lockstep."""
    h = portable_hash60_sql(f"'{salt}' || CAST({id_expr} AS VARCHAR)")
    return f"""
    SELECT {id_expr} AS pid, __b, ROW_NUMBER() OVER (PARTITION BY __b ORDER BY __h, {id_expr}) AS __rn
    FROM (SELECT {id_expr}, {h} AS __h, ({h}) % {n_buckets} AS __b FROM {relation})
    """


def hard_negatives(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    candidates: int = 20,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor, the
    k most-similar vectors with a DIFFERENT label — the negatives that are
    actually hard, versus `negative_pairs`' uniform pseudo-random draw.

    Plan: exact top-`candidates` neighbors per anchor (broadcast-anchor
    cosine pass — swap in ivf/lsh/q8 from operators/similarity.py when the
    corpus outgrows brute force), label lookup joined on the neighbor id,
    same-label candidates filtered, re-ranked to k. `candidates` > k buys
    headroom so anchors whose nearest neighbors share their label still
    yield k negatives."""
    from .similarity import cosine_topk

    labels = df.select(F.col(id_col).alias("__nid"), F.col(label_col).alias("__nlabel"))
    anchors = df.select(id_col, vec_col)
    topk = cosine_topk(anchors, df, id_col=id_col, vec_col=vec_col, k=candidates)
    a_labels = df.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__alabel")
    )
    cand = (
        topk.join(F.broadcast(a_labels), "query_id")
        .join(
            F.broadcast(labels), F.col("neighbor_id") == F.col("__nid")
        )
        .filter(F.col("__alabel") != F.col("__nlabel"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("query_id").alias("anchor_id"),
            "neg_rank",
            F.col("neighbor_id").alias("negative_id"),
            "cos",
        )
    )
