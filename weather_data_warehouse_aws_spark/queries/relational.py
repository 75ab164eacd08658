"""Core relational queries (SURVEY.md §2.2/§2.3/§2.4/§2.5/§2.6 on testdata).

Each query re-expresses one operator cluster the reference exercises in its
Athena analytics (`scripts/sql/sample_queries.sql`) and fact views
(`scripts/sql/create_views.sql`) on the generic TPC-H-ish tables, so the
DuckDB oracle can hash-check it. The weather-domain pipeline itself is
exercised by `tests/test_weather_pipeline.py` golden tests.

Scale notes per query are inline. All aggregates are rounded in BOTH engines
so cross-engine float summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_pricing_summary — group-by aggregate suite (A1, A2, F8, F11, O2)
# ---------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary.

    Operator parity: GROUP BY + COUNT(*) (`sample_queries.sql:11`),
    AVG (`sample_queries.sql:12-13`), ROUND (`sample_queries.sql:12`),
    arithmetic (`create_views.sql:80-84`). Extends with SUM/MIN/MAX (additive).

    Scale: single hash aggregation with map-side partial agg; no joins; scan
    prunes to 7 of 11 columns and pushes the shipdate filter to parquet
    row-group stats. This is the shape Spark is best at — linear in input,
    one shuffle sized by group count (6 groups).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.min("l_shipdate").alias("min_shipdate"),
            F.max("l_shipdate").alias("max_shipdate"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT
    l_returnflag,
    l_linestatus,
    ROUND(SUM(l_quantity), 2)                         AS sum_qty,
    ROUND(SUM(l_extendedprice), 2)                    AS sum_base_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
    ROUND(AVG(l_quantity), 4)                         AS avg_qty,
    ROUND(AVG(l_extendedprice), 4)                    AS avg_price,
    ROUND(AVG(l_discount), 4)                         AS avg_disc,
    MIN(l_shipdate)                                   AS min_shipdate,
    MAX(l_shipdate)                                   AS max_shipdate,
    COUNT(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_case_bucket — CASE bucketing + boolean-rate aggregate (P11, A5, F11)
# ---------------------------------------------------------------------------
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-by-horizon-bucket analog (`sample_queries.sql:3-16`).

    The reference buckets `forecast_horizon_hours` with a 4-way CASE, counts,
    and computes a boolean accuracy rate via AVG(CAST(bool AS INT)) * 100.
    Same shape here over `l_quantity` buckets with "was returned" as the
    boolean.

    Scale: CASE evaluates inside whole-stage codegen; grouping on the bucket
    expression shuffles only 4 groups after map-side partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") <= 10, "0-10")
        .when(F.col("l_quantity") <= 25, "11-25")
        .when(F.col("l_quantity") <= 40, "26-40")
        .otherwise("41+")
    )
    return (
        li.withColumn("qty_bucket", bucket)
        .groupBy("qty_bucket")
        .agg(
            F.count("*").alias("total_items"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg((F.col("l_returnflag") == "R").cast("int")) * 100, 1).alias("return_pct"),
        )
        .orderBy("qty_bucket")
    )


ORACLE_CASE_BUCKET = """
SELECT
    CASE
        WHEN l_quantity <= 10 THEN '0-10'
        WHEN l_quantity <= 25 THEN '11-25'
        WHEN l_quantity <= 40 THEN '26-40'
        ELSE '41+'
    END AS qty_bucket,
    COUNT(*) AS total_items,
    ROUND(AVG(l_extendedprice), 2) AS avg_price,
    ROUND(AVG(CAST(l_returnflag = 'R' AS INT)) * 100, 1) AS return_pct
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q_dim_join_ranking — broadcast dim joins + ranking (J1, J5, O1, A2)
# ---------------------------------------------------------------------------
def q_dim_join_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """City-performance-ranking analog (`sample_queries.sql:18-29`).

    The reference joins the accuracy fact to `dim_location` (8 rows) and ranks
    cities by accuracy. Here: customer (fact-side) joined to nation and region
    dims, ranked by average account balance.

    Scale: both dims are tiny → explicit `broadcast()` pins broadcast-hash
    joins (no shuffle of the fact side). At 100 TB the fact side streams
    through map-side joins; the only shuffle is the final 25-group agg.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey, "inner")
        .join(region, nation.n_regionkey == region.r_regionkey, "inner")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("total_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
            F.round(F.avg((F.col("c_acctbal") > 0).cast("int")) * 100, 1).alias("positive_pct"),
        )
        .orderBy(F.col("avg_acctbal").desc(), F.col("n_name"))
    )


ORACLE_DIM_JOIN_RANKING = """
SELECT
    r_name,
    n_name,
    COUNT(*) AS total_customers,
    ROUND(AVG(c_acctbal), 2) AS avg_acctbal,
    ROUND(AVG(CAST(c_acctbal > 0 AS INT)) * 100, 1) AS positive_pct
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY avg_acctbal DESC, n_name
"""


# ---------------------------------------------------------------------------
# q_pct_of_total — unpartitioned aggregate window (A7, W2)
# ---------------------------------------------------------------------------
def q_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality-distribution analog (`sample_queries.sql:45-58`):
    COUNT(*) * 100.0 / SUM(COUNT(*)) OVER ().

    Scale: the empty-partition window runs AFTER aggregation, over one row
    per group (4 segments) — a single-task window over K rows is fine; the
    hazard the reference has (global window over raw rows,
    `create_views.sql:8`) is avoided engine-wide (see operators/keys.py).
    """
    customer = load_table(spark, sf_dir, "customer")
    counts = customer.groupBy("c_mktsegment").agg(F.count("*").alias("segment_count"))
    total_w = Window.partitionBy()
    return (
        counts.withColumn(
            "percentage",
            F.round(F.col("segment_count") * 100.0 / F.sum("segment_count").over(total_w), 1),
        )
        .select("c_mktsegment", "segment_count", "percentage")
        .orderBy("c_mktsegment")
    )


ORACLE_PCT_OF_TOTAL = """
SELECT
    c_mktsegment,
    COUNT(*) AS segment_count,
    ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS percentage
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "case_bucket": q_case_bucket,
    "dim_join_ranking": q_dim_join_ranking,
    "pct_of_total": q_pct_of_total,
}

ORACLE = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "case_bucket": ORACLE_CASE_BUCKET,
    "dim_join_ranking": ORACLE_DIM_JOIN_RANKING,
    "pct_of_total": ORACLE_PCT_OF_TOTAL,
}
