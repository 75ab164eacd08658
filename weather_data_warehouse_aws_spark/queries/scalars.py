"""Scalar-function and access-path differentials closing the last
golden-only rows in COVERAGE.md: array element access (P3), the date-dim
equi-join (J2), and string↔timestamp round-trips (F1/F6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_array_access — element/field access on array columns (P3 analog)
# ---------------------------------------------------------------------------
def q_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`weather[0].main`-style access (`bronze_to_silver.py:70-71`) on the
    embeddings array: first/last elements, length, element-wise slice sum.
    Spark arrays are 0-indexed via getItem, DuckDB lists are 1-indexed —
    the oracle bridges explicitly."""
    emb = load_table(spark, sf_dir, "embeddings")
    first = F.col("embedding").getItem(0).cast("double")
    return emb.select(
        "vec_id",
        (F.floor(first * 10000) / 10000).alias("first_q"),
        (F.floor(F.element_at("embedding", -1).cast("double") * 10000) / 10000).alias("last_q"),
        F.size("embedding").alias("dim"),
        (
            F.floor(
                F.expr(
                    "aggregate(slice(embedding, 1, 8), 0.0D, (a, x) -> a + CAST(x AS DOUBLE))"
                )
                * 10000
            )
            / 10000
        ).alias("head_sum_q"),
    ).orderBy("vec_id")


ORACLE_ARRAY_ACCESS = """
SELECT
    vec_id,
    FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) / 10000 AS first_q,
    FLOOR(CAST(embedding[-1] AS DOUBLE) * 10000) / 10000 AS last_q,
    CAST(len(embedding) AS INT) AS dim,
    FLOOR(list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum') * 10000) / 10000
        AS head_sum_q
FROM embeddings
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# q_date_dim_join — fact ⋈ generated date dim on date equality (J2)
# ---------------------------------------------------------------------------
def q_date_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ the sequence()-generated date spine on CAST(date) equality
    (`create_views.sql:34-35`), aggregated by calendar attributes — the
    reference's dim_date join shape with the dim built, not stored."""
    from ..pipeline.gold import build_dim_date

    orders = load_table(spark, sf_dir, "orders")
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    dd = F.broadcast(build_dim_date(spark, str(lo), str(hi)))
    return (
        orders.join(dd, F.to_date("o_orderdate") == dd.full_date, "inner")
        .groupBy("year", "quarter", "is_weekend")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("year", "quarter", "is_weekend")
    )


ORACLE_DATE_DIM_JOIN = """
WITH bounds AS (
    SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
    FROM orders
),
dd AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS full_date FROM bounds
),
dim AS (
    SELECT full_date,
           CAST(year(full_date) AS INT) AS year,
           CAST(quarter(full_date) AS INT) AS quarter,
           (dayofweek(full_date) + 1) IN (1, 7) AS is_weekend
    FROM dd
)
SELECT year, quarter, is_weekend,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN dim ON CAST(o_orderdate AS DATE) = dim.full_date
GROUP BY year, quarter, is_weekend
ORDER BY year, quarter, is_weekend
"""


# ---------------------------------------------------------------------------
# q_datetime_roundtrip — format → parse → truncate (F1/F2/F6)
# ---------------------------------------------------------------------------
def q_datetime_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String↔timestamp round-trip: format ts to ISO text (`date_format` ≡
    strftime), parse back (`to_timestamp` ≡ strptime — the silver layer's
    extraction_timestamp path, `bronze_to_silver.py:49`), verify epoch
    equality, plus day/hour truncations."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return (
        ev.select(
            "event_id",
            iso.alias("iso_text"),
            F.unix_timestamp(F.to_timestamp(iso)).alias("reparsed_epoch"),
            (F.unix_timestamp(F.to_timestamp(iso)) == F.unix_timestamp("ts")).alias(
                "roundtrip_exact"
            ),
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            F.to_date("ts").alias("day"),
        )
        .orderBy("event_id")
    )


ORACLE_DATETIME_ROUNDTRIP = """
SELECT
    event_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_text,
    CAST(FLOOR(epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'))) AS BIGINT)
        AS reparsed_epoch,
    CAST(FLOOR(epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'))) AS BIGINT)
        = CAST(FLOOR(epoch(ts)) AS BIGINT) AS roundtrip_exact,
    CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
    CAST(ts AS DATE) AS day
FROM events
ORDER BY event_id
"""


QUERIES = {
    "array_access": q_array_access,
    "date_dim_join": q_date_dim_join,
    "datetime_roundtrip": q_datetime_roundtrip,
}

ORACLE = {
    "array_access": ORACLE_ARRAY_ACCESS,
    "date_dim_join": ORACLE_DATE_DIM_JOIN,
    "datetime_roundtrip": ORACLE_DATETIME_ROUNDTRIP,
}
