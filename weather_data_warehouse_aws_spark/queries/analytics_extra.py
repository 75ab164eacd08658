"""Analytics extensions: pivot, exact quantiles, and the Arrow-vectorized
scalar-UDF path (additive beyond the reference's surface, standard for any
warehouse user).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# q_pivot — wide event-type counts per user cohort
# ---------------------------------------------------------------------------
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pivot` with an EXPLICIT value list — at scale never omit it: without
    the list Spark runs an extra distinct-values job over the full table
    before it can even plan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("cohort", (F.col("user_id") % 10).cast("int"))
        .groupBy("cohort")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .orderBy("cohort")
    )


ORACLE_PIVOT = """
SELECT
    CAST(user_id % 10 AS INT) AS cohort,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS BIGINT) AS signup,
    CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view
FROM events
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q_exact_quantiles — interpolated median/p90 (exact, not sketched)
# ---------------------------------------------------------------------------
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). At 100 TB the tool is `approx_percentile` (KLL/GK
    sketch, one pass, mergeable) — kept out of the oracle because sketches
    are engine-specific; the exact form is the semantics anchor."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_EXACT_QUANTILES = """
SELECT
    o_orderstatus,
    ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
    ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
    COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# q_vectorized_udf — Arrow scalar pandas_udf (the sanctioned Python path)
# ---------------------------------------------------------------------------
def _engagement_score_udf():
    """Vectorized polynomial score — numpy float64 ops are bit-identical to
    SQL double arithmetic, so the oracle can replicate it exactly. This is
    the template for real Python scoring models (Arrow batches in, Arrow
    batches out, ~10-100× over row-at-a-time UDFs). Built lazily: the
    decorator parses its return type through the active SparkSession."""

    @pandas_udf("double")
    def _engagement_score(value: pd.Series) -> pd.Series:
        v = value.fillna(0.0)
        return (v * v - v) / 10000.0

    return _engagement_score


def q_vectorized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    score = _engagement_score_udf()
    return (
        ev.withColumn("score", score(F.col("value")))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("score"), 4).alias("total_score"),
            F.round(F.max("score"), 6).alias("max_score"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


ORACLE_VECTORIZED_UDF = """
SELECT
    event_type,
    ROUND(SUM((v * v - v) / 10000.0), 4) AS total_score,
    ROUND(MAX((v * v - v) / 10000.0), 6) AS max_score,
    COUNT(*) AS n
FROM (SELECT event_type, COALESCE(value, 0.0) AS v FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q_order_stats — exact quantiles + exact count-distinct spread, one relation
# ---------------------------------------------------------------------------
def q_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`exact_quantiles` (by o_orderstatus) and `distinct_stats` (by
    o_orderpriority) tagged and unioned under one driver row — both are
    per-group spread summaries of `orders` (50-entry-registry
    consolidation; columns absent from a variant are NULL)."""
    from .setops import q_distinct_stats

    quant = q_exact_quantiles(spark, sf_dir).select(
        F.lit("quantiles").alias("variant"),
        F.col("o_orderstatus").alias("group_key"),
        "median_price",
        "p90_price",
        F.lit(None).cast("long").alias("n_customers"),
        F.lit(None).cast("double").alias("price_stddev"),
        "n",
    )
    dist = q_distinct_stats(spark, sf_dir).select(
        F.lit("distincts").alias("variant"),
        F.col("o_orderpriority").alias("group_key"),
        F.lit(None).cast("double").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
        "n_customers",
        "price_stddev",
        F.col("n_orders").alias("n"),
    )
    return quant.unionByName(dist).orderBy("variant", "group_key")


def _oracle_order_stats() -> str:
    from .setops import ORACLE_DISTINCT_STATS

    return f"""
SELECT 'quantiles' AS variant, o_orderstatus AS group_key,
       median_price, p90_price,
       CAST(NULL AS BIGINT) AS n_customers, CAST(NULL AS DOUBLE) AS price_stddev,
       n
FROM ({ORACLE_EXACT_QUANTILES})
UNION ALL
SELECT 'distincts', o_orderpriority,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       n_customers, price_stddev, n_orders
FROM ({ORACLE_DISTINCT_STATS})
ORDER BY variant, group_key
"""


QUERIES = {
    "pivot": q_pivot,
    "order_stats": q_order_stats,
    "vectorized_udf": q_vectorized_udf,
}

ORACLE = {
    "pivot": ORACLE_PIVOT,
    "order_stats": _oracle_order_stats(),
    "vectorized_udf": ORACLE_VECTORIZED_UDF,
}
