"""Join-shape and window queries (SURVEY §2.3 J1-J5, §2.5 W1, §2.6 O1-O4,
§2.4 A3/A4).

The reference's join surface: composite-key dim joins with residual
`is_current` predicate, role-playing date dims, and dim-lookup joins in
analytics. Re-expressed here on the TPC-H tables, plus the semi/anti shapes
Spark gives for free (noted additive in SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_role_playing_nation — one dim joined in two roles (J3)
# ---------------------------------------------------------------------------
def q_role_playing_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-nation × supplier-nation trade flows: `nation` plays two
    roles via aliased broadcasts, mirroring the reference's dd_created /
    dd_forecast role-playing joins (`create_views.sql:64-67`).

    Scale: the two 25-row nation dims broadcast; lineitem⋈orders and
    lineitem⋈supplier/customer shuffle on their keys with AQE handling
    skew. The final agg is 625 groups max.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation_c = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    nation_s = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation_c, customer.c_nationkey == nation_c.c_nk)
        .join(nation_s, supplier.s_nationkey == nation_s.s_nk)
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("cust_nation", "supp_nation")
    )


ORACLE_ROLE_PLAYING_NATION = """
SELECT
    nc.n_name AS cust_nation,
    ns.n_name AS supp_nation,
    COUNT(*) AS n_items,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY nc.n_name, ns.n_name
ORDER BY cust_nation, supp_nation
"""


# ---------------------------------------------------------------------------
# q_anti_join — customers with no orders
# ---------------------------------------------------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join; Catalyst plans a broadcast/shuffled hash anti-join —
    never the manual `LEFT JOIN … WHERE key IS NULL` workaround."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_ANTI_JOIN = """
SELECT
    c_mktsegment,
    COUNT(*) AS n_customers,
    ROUND(AVG(c_acctbal), 2) AS avg_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q_semi_join — customers having at least one open ('O') order
# ---------------------------------------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_nationkey")
    )


ORACLE_SEMI_JOIN = """
SELECT
    c_nationkey,
    COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q_semi_anti_join — both existence-join plans under one driver row
# ---------------------------------------------------------------------------
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti aggregations, tagged and unioned to one relation
    (same 50-entry-registry consolidation as pair_dedup/ann_methods). The
    group key is stringified to a common column; avg_acctbal only exists on
    the anti side and is NULL for semi rows."""
    anti = q_anti_join(spark, sf_dir).select(
        F.lit("anti").alias("variant"),
        F.col("c_mktsegment").alias("group_key"),
        "n_customers",
        "avg_acctbal",
    )
    semi = q_semi_join(spark, sf_dir).select(
        F.lit("semi").alias("variant"),
        F.col("c_nationkey").cast("string").alias("group_key"),
        "n_customers",
        F.lit(None).cast("double").alias("avg_acctbal"),
    )
    return anti.unionByName(semi).orderBy("variant", "group_key")


ORACLE_SEMI_ANTI_JOIN = f"""
SELECT 'anti' AS variant, c_mktsegment AS group_key, n_customers, avg_acctbal
FROM ({ORACLE_ANTI_JOIN})
UNION ALL
SELECT 'semi', CAST(c_nationkey AS VARCHAR), n_customers, CAST(NULL AS DOUBLE)
FROM ({ORACLE_SEMI_JOIN})
ORDER BY variant, group_key
"""


# ---------------------------------------------------------------------------
# q_dedup_latest — deterministic keyed dedup (A4, scale-safe variant)
# ---------------------------------------------------------------------------
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the LATEST row per (user_id, event_type).

    The reference's `dropDuplicates(keys)` (`bronze_to_silver.py:87`) keeps
    an arbitrary row — fine for its data (duplicates are exact copies), but
    not hash-comparable. The deterministic engine idiom: row_number over a
    total order, keep rank 1. One shuffle on the dedup keys.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.unix_timestamp("ts").alias("latest_epoch"),
            F.round("value", 2).alias("latest_value"),
        )
    )


ORACLE_DEDUP_LATEST = """
SELECT
    user_id,
    event_type,
    event_id AS latest_event_id,
    CAST(FLOOR(epoch(ts)) AS BIGINT) AS latest_epoch,
    ROUND(value, 2) AS latest_value
FROM (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q_window_rank — partitioned ranking window (W1 scale-safe form)
# ---------------------------------------------------------------------------
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand. The reference's ROW_NUMBER
    keys are global (single-task, `create_views.sql:8`); partitioned by
    brand the same window parallelizes across groups — the engine-sanctioned
    form (operators/keys.py documents the policy).
    """
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("p_brand", "price_rank", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"))
        .orderBy("p_brand", "price_rank")
    )


ORACLE_WINDOW_RANK = """
SELECT p_brand, price_rank, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
           ) AS price_rank
    FROM part
)
WHERE price_rank <= 3
ORDER BY p_brand, price_rank
"""


# ---------------------------------------------------------------------------
# q_sort_by_case — custom CASE ordering (O3)
# ---------------------------------------------------------------------------
def q_sort_by_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority distribution sorted by a CASE rank — the reference's
    Excellent<Good<Fair<Poor ordering (`sample_queries.sql:52-58`)."""
    orders = load_table(spark, sf_dir, "orders")
    rank = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
    )
    counts = (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .withColumn(
            "pct",
            F.round(
                F.col("n_orders") * 100.0 / F.sum("n_orders").over(Window.partitionBy()), 1
            ),
        )
    )
    return counts.orderBy(rank).select("o_orderpriority", "n_orders", "pct")


ORACLE_SORT_BY_CASE = """
SELECT o_orderpriority, n_orders, pct
FROM (
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS pct
    FROM orders
    GROUP BY o_orderpriority
)
ORDER BY CASE o_orderpriority
    WHEN '1-URGENT' THEN 1
    WHEN '2-HIGH' THEN 2
    WHEN '3-MEDIUM' THEN 3
    WHEN '4-NOT SPECIFIED' THEN 4
    ELSE 5
END
"""


# ---------------------------------------------------------------------------
# q_distinct_tuples — dedup-all-columns distinct (A3)
# ---------------------------------------------------------------------------
def q_distinct_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select(...).distinct()` parity with the location-dim distinct
    (`build_dimensions.py:30-36`): unique (nationkey, mktsegment) pairs."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


ORACLE_DISTINCT_TUPLES = """
SELECT DISTINCT c_nationkey, c_mktsegment
FROM customer
ORDER BY c_nationkey, c_mktsegment
"""


QUERIES = {
    "role_playing_nation": q_role_playing_nation,
    "semi_anti_join": q_semi_anti_join,
    "dedup_latest": q_dedup_latest,
    "window_rank": q_window_rank,
    "sort_by_case": q_sort_by_case,
    "distinct_tuples": q_distinct_tuples,
}

ORACLE = {
    "role_playing_nation": ORACLE_ROLE_PLAYING_NATION,
    "semi_anti_join": ORACLE_SEMI_ANTI_JOIN,
    "dedup_latest": ORACLE_DEDUP_LATEST,
    "window_rank": ORACLE_WINDOW_RANK,
    "sort_by_case": ORACLE_SORT_BY_CASE,
    "distinct_tuples": ORACLE_DISTINCT_TUPLES,
}
