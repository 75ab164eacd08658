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
    "rollup_cube": None,  # bound below, after q_cube is defined
}

ORACLE = {
    "set_ops": ORACLE_SET_OPS,
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


# ---------------------------------------------------------------------------
# q_rollup_cube — both grouping-set shapes, tagged, in one relation
# ---------------------------------------------------------------------------
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(lineitem) + CUBE(orders) unioned under a generic schema
    (d1, d2, n, total, g1, g2, op) — one driver CORRECTNESS row covers both
    Expand-based grouping-set operators, each still a single-scan pass."""
    r = q_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("op"),
        F.col("l_returnflag").alias("d1"),
        F.col("l_linestatus").alias("d2"),
        "n",
        F.col("sum_qty").alias("total"),
        F.col("g_rf").alias("g1"),
        F.col("g_ls").alias("g2"),
    )
    c = q_cube(spark, sf_dir).select(
        F.lit("cube").alias("op"),
        F.col("o_orderstatus").alias("d1"),
        F.col("o_orderpriority").alias("d2"),
        "n",
        F.col("total"),
        F.col("g_st").alias("g1"),
        F.col("g_pr").alias("g2"),
    )
    return r.unionByName(c).orderBy("op", "g1", "g2", "d1", "d2")


ORACLE_ROLLUP_CUBE = f"""
SELECT 'rollup' AS op, l_returnflag AS d1, l_linestatus AS d2,
       n, sum_qty AS total, g_rf AS g1, g_ls AS g2
FROM ({ORACLE_ROLLUP})
UNION ALL
SELECT 'cube' AS op, o_orderstatus AS d1, o_orderpriority AS d2,
       n, total, g_st AS g1, g_pr AS g2
FROM ({ORACLE_CUBE})
ORDER BY op, g1, g2, d1, d2
"""

QUERIES["rollup_cube"] = q_rollup_cube
ORACLE["rollup_cube"] = ORACLE_ROLLUP_CUBE
