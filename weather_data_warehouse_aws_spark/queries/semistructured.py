"""Semi-structured + predicate queries rounding out SURVEY §2.2/§2.8:
JSON field extraction (the generic form of the bronze nested-JSON access
P1-P3), membership predicates (P9), date-equality filters (P8), and
null-defaulting (P10) on the generic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_json_extract — JSON string field access (bronze nested-access analog)
# ---------------------------------------------------------------------------
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract `props.k` from the events JSON payload and aggregate on it.

    The weather pipeline reads nested JSON *structurally* (explicit schema,
    dot-paths — pipeline/silver.py); this is the string-typed variant
    (`get_json_object`), the common shape for event streams. At scale:
    prefer `from_json` with a schema once per pipeline, not repeated
    `get_json_object` calls per field.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE_JSON_EXTRACT = """
SELECT
    event_type,
    COUNT(*) AS n,
    ROUND(AVG(k), 4) AS avg_k,
    MIN(k) AS min_k,
    MAX(k) AS max_k
FROM (
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q_predicate_gauntlet — membership + range + date-equality + coalesce
# ---------------------------------------------------------------------------
def q_predicate_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One query exercising the reference's predicate vocabulary together:
    IN-list (P9, `build_dimensions.py:139-142`), BETWEEN range (P5,
    `bronze_to_silver.py:85-86`), date equality (P8,
    `sample_queries.sql:42`), COALESCE default (P10,
    `bronze_to_silver.py:67`), NULL filter (P4). All push down to the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(F.col("o_totalprice").between(1000, 300000))
        .filter(F.col("o_orderdate").isNotNull())
        .withColumn("order_date", F.to_date("o_orderdate"))
        .filter(F.dayofweek("order_date").isin(1, 7))  # weekend orders
        .groupBy("order_date")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("total"),
        )
        .orderBy("order_date")
    )


ORACLE_PREDICATE_GAUNTLET = """
SELECT
    CAST(o_orderdate AS DATE) AS order_date,
    COUNT(*) AS n_orders,
    ROUND(SUM(COALESCE(o_totalprice, 0.0)), 2) AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 1000 AND 300000
  AND o_orderdate IS NOT NULL
  AND (dayofweek(CAST(o_orderdate AS DATE)) + 1) IN (1, 7)
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "json_extract": q_json_extract,
    "predicate_gauntlet": q_predicate_gauntlet,
}

ORACLE = {
    "json_extract": ORACLE_JSON_EXTRACT,
    "predicate_gauntlet": ORACLE_PREDICATE_GAUNTLET,
}
