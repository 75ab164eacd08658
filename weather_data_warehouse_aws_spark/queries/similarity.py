"""Embedding similarity-search queries over `embeddings` (north-star: ANN
over array<float>).

Cosines are computed as sequential double folds in Spark and as
``list_cosine_similarity(CAST(… AS DOUBLE[]), …)`` in DuckDB — measured
bit-exact across 9600 pairs, rounded to 6 dp anyway, and ranked on the
rounded value with id tie-breaks so ordering can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import COSINE_SQL, blocked_neardup, cosine_topk
from ..sources.tables import load_table

TOPK_K = 5
N_QUERIES = 10
NEARDUP_OFFSET = 1_000_000
NEARDUP_THRESHOLD = 0.9


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
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (cos ≥ 0.9) within each `label` block. Random
    embeddings have cos ≈ N(0, 1/√64), so planted copies (vec_id % 100 == 0,
    id + 1M, identical vector ⇒ cos = 1.0) are the recoverable ground truth.
    Blocking makes the join quadratic in block size, not corpus size."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    planted = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"), "embedding", "label"
    )
    return (
        blocked_neardup(
            emb.unionByName(planted), threshold=NEARDUP_THRESHOLD
        )
        .orderBy("id_a", "id_b")
    )


ORACLE_EMBEDDING_NEARDUP = f"""
WITH planted AS (
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + {NEARDUP_OFFSET}, embedding, label
    FROM embeddings WHERE vec_id % 100 = 0
)
SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS cos
FROM planted a
JOIN planted b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= {NEARDUP_THRESHOLD}
ORDER BY id_a, id_b
"""


QUERIES = {
    "embedding_topk": q_embedding_topk,
    "embedding_neardup": q_embedding_neardup,
}

ORACLE = {
    "embedding_topk": ORACLE_EMBEDDING_TOPK,
    "embedding_neardup": ORACLE_EMBEDDING_NEARDUP,
}
