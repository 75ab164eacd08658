"""Correlated-subquery, window-frame, and multi-join-ordering queries.

These widen the SQL surface beyond the reference's inventory (additive — the
reference has no subqueries, frames, or >3-relation joins) with the shapes a
warehouse user reaches for next: correlated EXISTS / scalar subqueries
(`sample_queries.sql`-style analytics grown one step), explicit window
frames (ROWS/RANGE BETWEEN, ntile/percent_rank/cume_dist), and a TPC-H-Q5
shaped 6-relation join that exercises Catalyst join ordering + broadcast
selection.

Spark-first stance: correlated subqueries are deliberately re-expressed as
their scale-stable algebraic equivalents — a correlated scalar subquery is a
tiny pre-aggregate + broadcast equi-join (NOT a per-row re-scan), EXISTS is a
left-semi join, NOT EXISTS a left-anti join. The DuckDB oracle states the
same semantics with literal correlated subqueries, so the differential test
proves the rewrite is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_subqueries — correlated scalar + EXISTS + NOT EXISTS, algebraically
# ---------------------------------------------------------------------------
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations' counts of "whale" customers: balance above their own nation's
    average (correlated scalar subquery), with at least one URGENT order
    (EXISTS), and no failed order (NOT EXISTS).

    Scale: the nation-average is a 25-row aggregate broadcast back onto
    customer (one shuffle on c_nationkey avoided entirely — the agg output
    is broadcast); EXISTS/NOT EXISTS are semi/anti joins on o_custkey, which
    shuffle orders once each but never multiply rows. No per-row subquery
    re-execution exists anywhere in the plan — this is why the algebraic
    form, not a literal correlated rewrite, is the 100 TB idiom.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    nation_avg = customer.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 4).alias("nation_avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")

    whales = (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg_bal"))
        .join(urgent, customer["c_custkey"] == urgent["o_custkey"], "left_semi")
        .join(failed, customer["c_custkey"] == failed["o_custkey"], "left_anti")
    )
    return (
        whales.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("whale_count"),
            F.round(F.avg("c_acctbal"), 4).alias("whale_avg_bal"),
        )
        .withColumnRenamed("c_nationkey", "nationkey")
        .orderBy("nationkey")
    )


ORACLE_SUBQUERIES = """
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS whale_count,
       ROUND(AVG(c.c_acctbal), 4) AS whale_avg_bal
FROM customer c
WHERE c.c_acctbal > (
        SELECT ROUND(AVG(c2.c_acctbal), 4) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
      )
  AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
      )
GROUP BY c.c_nationkey
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# q_window_frames — explicit ROWS frames + distribution window functions
# ---------------------------------------------------------------------------
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue per market segment with a 3-month moving sum (ROWS
    BETWEEN 2 PRECEDING), running total (UNBOUNDED PRECEDING), revenue
    quartile (ntile), percent_rank/cume_dist, and the segment's first/last
    month revenue (first_value/last_value over the full frame).

    Cross-engine float defense: the base revenue is rounded BEFORE any frame
    runs, so moving sums fold identical inputs in identical (month) order on
    both engines. All windows are partitioned by segment — no global window.

    Scale: one shuffle for the (segment, month) aggregate, one for the
    window partition (segment). Frames stream within each sorted partition —
    months per segment is small and bounded, the partition count carries the
    parallelism.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    monthly = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )

    by_month = Window.partitionBy("segment").orderBy("month")
    mov3 = by_month.rowsBetween(-2, Window.currentRow)
    run = by_month.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = by_month.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # (revenue, month) — month breaks revenue ties so ntile/percent_rank/
    # cume_dist are total-order deterministic across engines
    by_rev = Window.partitionBy("segment").orderBy("revenue", "month")

    return monthly.select(
        "segment",
        "month",
        "revenue",
        F.round(F.sum("revenue").over(mov3), 2).alias("mov_sum_3m"),
        F.round(F.sum("revenue").over(run), 2).alias("running_total"),
        F.ntile(4).over(by_rev).alias("rev_quartile"),
        F.round(F.percent_rank().over(by_rev), 6).alias("rev_pct_rank"),
        F.round(F.cume_dist().over(by_rev), 6).alias("rev_cume_dist"),
        F.first("revenue").over(full).alias("first_month_rev"),
        F.last("revenue").over(full).alias("last_month_rev"),
    ).orderBy("segment", "month")


ORACLE_WINDOW_FRAMES = """
WITH monthly AS (
    SELECT c.c_mktsegment AS segment,
           strftime(o.o_orderdate, '%Y-%m') AS month,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
)
SELECT segment, month, revenue,
       ROUND(SUM(revenue) OVER (
           PARTITION BY segment ORDER BY month
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum_3m,
       ROUND(SUM(revenue) OVER (
           PARTITION BY segment ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       NTILE(4) OVER (PARTITION BY segment ORDER BY revenue, month) AS rev_quartile,
       ROUND(PERCENT_RANK() OVER (PARTITION BY segment ORDER BY revenue, month), 6) AS rev_pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY segment ORDER BY revenue, month), 6) AS rev_cume_dist,
       FIRST_VALUE(revenue) OVER (
           PARTITION BY segment ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_month_rev,
       LAST_VALUE(revenue) OVER (
           PARTITION BY segment ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_month_rev
FROM monthly
ORDER BY segment, month
"""


# ---------------------------------------------------------------------------
# q_regional_volume — TPC-H-Q5-shaped 6-relation join (join-order showcase)
# ---------------------------------------------------------------------------
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where the supplier is in the customer's own nation —
    the classic local-supplier-volume join tree: region → nation → customer →
    orders → lineitem → supplier, with the extra c_nationkey = s_nationkey
    co-location predicate.

    Scale: region (1 row after filter) and nation (25) broadcast; supplier
    broadcasts at test SF and shuffles on s_suppkey beyond the threshold —
    AQE decides. The fact-side joins (orders⋈customer, lineitem⋈orders)
    shuffle on their keys once each; the co-location predicate applies as a
    post-join filter on two already-joined small columns. Catalyst reorders
    freely because every join is declarative equi-join.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("item_count"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


ORACLE_REGIONAL_VOLUME = """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS item_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


QUERIES = {
    "subqueries": q_subqueries,
    "window_frames": q_window_frames,
    "regional_volume": q_regional_volume,
}

ORACLE = {
    "subqueries": ORACLE_SUBQUERIES,
    "regional_volume": ORACLE_REGIONAL_VOLUME,
    "window_frames": ORACLE_WINDOW_FRAMES,
}
