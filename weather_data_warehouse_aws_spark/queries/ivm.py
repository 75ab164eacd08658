"""mv_incremental — the materialized-view maintenance loop, oracle-gated.

The Spark side drives a real txlog table through create → append →
append → DV-delete → update → compact, folding each step into a
materialized aggregate with `mv_refresh` (operators/mv.py). The DuckDB
oracle computes the SAME aggregate directly over the FINAL logical state
— it knows nothing of views, change feeds, signed deltas, or rescans —
so matching hashes prove incremental maintenance ≡ full recompute
cross-engine: CDF update images, the null-safe group merge, the min/max
delete rescan, and the compaction skip all have to be right at once.

A DIAGNOSTIC entry like `tx_roundtrip`: its cost is real filesystem
commits, not query execution, so it registers past the driver's 50-row
cap; tests/test_registry_oracle.py still gates it on every pytest run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain `SELECT status, priority, SUM(custkey), MIN/MAX(orderkey),
    COUNT(*) GROUP BY status, priority` over a mutating orders table using
    only change folding — never a recompute. The mutation script is
    deterministic in the keys, so the final state (and therefore the
    oracle) is plain SQL over the orders view."""
    import shutil
    import tempfile

    from ..operators.mv import mv_create, mv_read, mv_refresh
    from ..operators.txlog import (
        tx_append,
        tx_compact,
        tx_delete_where,
        tx_update_where,
    )

    # a 1/50 key-slice keeps the DIAGNOSTIC cost in fixed commit overhead
    # (the thing being exercised), not data volume — the maintenance
    # logic is data-size-oblivious and fuzz-verified at tests/test_mv.py
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority")
        .coalesce(4)
    )
    tdir = tempfile.mkdtemp(prefix="wdwa_mvq_")
    src, mv = tdir + "/src", tdir + "/mv"
    try:
        # seed: ~6/7 of the slice, then materialize the view once
        tx_append(orders.filter(F.col("o_orderkey") % 7 != 3), src)
        mv_create(
            spark, src, mv,
            group_by=["o_orderstatus", "o_orderpriority"],
            sum_cols=["o_custkey"],
            min_cols=["o_orderkey"], max_cols=["o_orderkey"],
        )
        # late batch, a DV delete (forces the min/max rescan), an update
        # that MOVES rows between groups (pre/post images), and a
        # compaction (must fold as zero rows) — all in ONE refresh
        tx_append(orders.filter(F.col("o_orderkey") % 7 == 3), src)
        tx_delete_where(spark, src, "o_custkey % 10 = 7")
        tx_update_where(
            spark, src, "o_orderkey % 13 = 0", {"o_orderstatus": "'X'"}
        )
        tx_compact(spark, src, target_files=4)
        mv_refresh(spark, mv)
        out = mv_read(spark, mv).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return out.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.col("sum_o_custkey").cast("long").alias("sum_custkey"),
        F.col("min_o_orderkey").cast("long").alias("min_okey"),
        F.col("max_o_orderkey").cast("long").alias("max_okey"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("status", "priority")


ORACLE_MV_INCREMENTAL = """
-- the Spark side reaches this state by incrementally folding an append,
-- a DV delete, a group-moving update, and a compaction into a
-- materialized view; the oracle aggregates the final state directly —
-- equality proves incremental maintenance == full recompute
SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS status,
       o_orderpriority AS priority,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_okey,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_okey,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
WHERE o_orderkey % 50 = 0 AND o_custkey % 10 <> 7
GROUP BY 1, 2
ORDER BY 1, 2
"""
