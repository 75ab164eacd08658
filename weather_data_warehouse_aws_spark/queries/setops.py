"""Set operations + multi-dimensional aggregates (additive beyond the
reference — SURVEY §2.7 notes no set ops and §2.4 no rollup/count-distinct;
a user switching engines still expects them, so they're first-class here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_set_ops — UNION / INTERSECT / EXCEPT in one result
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys of customers vs suppliers: union ∪, intersect ∩, except ∖
    — tagged and unioned into one relation so a single oracle hash covers
    all three operators."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nk")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("nk")).distinct()
    return (
        c.union(s).distinct().withColumn("op", F.lit("union"))
        .unionByName(c.intersect(s).withColumn("op", F.lit("intersect")))
        .unionByName(c.exceptAll(s).withColumn("op", F.lit("except")))
        .orderBy("op", "nk")
    )


ORACLE_SET_OPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT nk, 'union' AS op     FROM (SELECT nk FROM c UNION SELECT nk FROM s)
UNION ALL
SELECT nk, 'intersect' AS op FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
UNION ALL
SELECT nk, 'except' AS op    FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
ORDER BY op, nk
"""


# ---------------------------------------------------------------------------
# q_rollup — hierarchical subtotals
# ---------------------------------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) with GROUPING markers — subtotal rows
    computed in one pass (Catalyst expands to a single Expand + hash agg,
    not three scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


ORACLE_ROLLUP = """
SELECT
    l_returnflag,
    l_linestatus,
    COUNT(*) AS n,
    ROUND(SUM(l_quantity), 2) AS sum_qty,
    CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
    CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_distinct_stats — exact count-distinct + spread statistics
# ---------------------------------------------------------------------------
def q_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) (two-level agg under the hood) + stddev.

    `approx_count_distinct` (HLL) is the 100 TB tool but is
    engine-implementation-specific, so the oracle-checked query uses the
    exact form; stddev_samp matches DuckDB's `stddev` definition.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("price_stddev"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_DISTINCT_STATS = """
SELECT
    o_orderpriority,
    COUNT(DISTINCT o_custkey) AS n_customers,
    COUNT(*) AS n_orders,
    ROUND(stddev_samp(o_totalprice), 4) AS price_stddev
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "set_ops": q_set_ops,
    "rollup": q_rollup,
    "distinct_stats": q_distinct_stats,
}

ORACLE = {
    "set_ops": ORACLE_SET_OPS,
    "rollup": ORACLE_ROLLUP,
    "distinct_stats": ORACLE_DISTINCT_STATS,
}


# ---------------------------------------------------------------------------
# q_cube — full cross-dimensional subtotals
# ---------------------------------------------------------------------------
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(orderstatus, orderpriority): all 4 grouping combinations in one
    Expand+agg pass (rollup's big sibling — same single-scan property)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pr"),
        )
        .orderBy("g_st", "g_pr", "o_orderstatus", "o_orderpriority")
    )


ORACLE_CUBE = """
SELECT
    o_orderstatus,
    o_orderpriority,
    COUNT(*) AS n,
    ROUND(SUM(o_totalprice), 2) AS total,
    CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
    CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority
"""


QUERIES["cube"] = q_cube
ORACLE["cube"] = ORACLE_CUBE
