"""SCD2 differential queries — the X5 merge under the driver's oracle gate.

Two queries:
* `scd2_merge`: one tagged relation covering BOTH merge families —
  variant 'scd2' runs the REAL `operators/scd2.py` initial-load + merge on
  a deterministically perturbed customer snapshot (the expire/insert
  algebra the reference documents but never implemented,
  `build_dimensions.py:96-97`); variant 'merge' runs
  `operators/merge.py::merge_into` — the Delta-style current-state MERGE
  with the full clause matrix exercised (update-all, matched-delete on a
  source predicate, insert, conditional not-matched-by-source delete) —
  against a FULL JOIN + CASE oracle. Every column is deterministic and
  hash-compared.
* `scd2_from_history`: the log-to-dimension construction (effective ranges
  via lead()) on the events change log — the shape used to backfill an SCD2
  dim from history.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.merge import merge_into
from ..operators.scd2 import scd2_initial_load, scd2_merge
from ..sources.tables import load_table

_T0_DATE = dt.date(2024, 1, 1)
_T0 = dt.datetime(2024, 1, 1, 6, 0, 0)
_T1_DATE = dt.date(2024, 2, 1)
_T1 = dt.datetime(2024, 2, 1, 6, 0, 0)
NEW_KEY_OFFSET = 1_000_000

_OUT_COLS = [
    "c_custkey", "cust_key", "version", "is_current",
    "effective_from_date", "effective_to_date",
    "created_timestamp", "updated_timestamp",
    "c_name", "c_mktsegment", "acctbal",
]


def _snapshot_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        # floor-quantize: per-row round() diverges across engines
        (F.floor(F.col("c_acctbal") * 100) / 100).alias("acctbal"),
    )


def _snapshot_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic perturbation: every 10th key changes balance, every
    10th+1 changes segment, every 100th spawns a brand-new key."""
    v1 = _snapshot_v1(spark, sf_dir)
    changed = v1.select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 10 == 1, F.lit("CHANGED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 10 == 0, F.col("acctbal") + 100)
        .otherwise(F.col("acctbal"))
        .alias("acctbal"),
    )
    brand_new = v1.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + NEW_KEY_OFFSET).alias("c_custkey"),
        "c_name",
        "c_mktsegment",
        "acctbal",
    )
    return changed.unionByName(brand_new)


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = scd2_initial_load(
        _snapshot_v1(spark, sf_dir), ["c_custkey"], "cust_key",
        effective_date=_T0_DATE, now=_T0, key_strategy="dense",
    )
    merged = scd2_merge(
        existing,
        _snapshot_v2(spark, sf_dir),
        ["c_custkey"],
        ["c_mktsegment", "acctbal"],
        "cust_key",
        effective_date=_T1_DATE, now=_T1, key_strategy="dense",
    )
    scd2_rows = merged.select(F.lit("scd2").alias("variant"), *_OUT_COLS)

    # current-state MERGE INTO over the same snapshots: every-7th-but-3 key
    # is absent from the source (exercising not-matched-by-source), CHANGED
    # segments are matched-deletes, the rest of the matrix rides along
    tgt = _snapshot_v1(spark, sf_dir)
    src = _snapshot_v2(spark, sf_dir).filter(F.col("c_custkey") % 7 != 3)
    m = merge_into(
        tgt, src, ["c_custkey"],
        when_matched_delete=F.col("__src_c_mktsegment") == "CHANGED",
        when_not_matched_by_source_delete=F.col("c_mktsegment") == "BUILDING",
    )
    # sentinel (not NULL) fillers: a current-state merge has no SCD2
    # bookkeeping, and concrete values keep the cross-engine hash clear of
    # engine-specific null renderings for date/boolean columns
    merge_rows = m.select(
        F.lit("merge").alias("variant"),
        "c_custkey",
        F.lit(0).cast("int").alias("cust_key"),
        F.lit(0).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
        F.lit(dt.date(9999, 12, 31)).alias("effective_from_date"),
        F.lit(dt.date(9999, 12, 31)).alias("effective_to_date"),
        F.lit(dt.datetime(2024, 2, 1, 6, 0, 0)).alias("created_timestamp"),
        F.lit(dt.datetime(2024, 2, 1, 6, 0, 0)).alias("updated_timestamp"),
        "c_name", "c_mktsegment", "acctbal",
    )
    return scd2_rows.unionByName(merge_rows).orderBy(
        "variant", "c_custkey", "version"
    )


ORACLE_SCD2_MERGE = f"""
WITH v1_attrs AS (
    SELECT c_custkey, c_name, c_mktsegment,
           FLOOR(c_acctbal * 100) / 100 AS acctbal
    FROM customer
),
v1 AS (  -- initial load: dense keys by natural-key order
    SELECT *,
           CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS INT) AS cust_key
    FROM v1_attrs
),
v2 AS (  -- perturbed snapshot + brand-new keys
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 10 = 1 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment,
           CASE WHEN c_custkey % 10 = 0 THEN acctbal + 100 ELSE acctbal END AS acctbal
    FROM v1_attrs
    UNION ALL
    SELECT c_custkey + {NEW_KEY_OFFSET}, c_name, c_mktsegment, acctbal
    FROM v1_attrs WHERE c_custkey % 100 = 0
),
matched AS (
    SELECT v1.c_custkey, v1.cust_key, v1.c_name AS name1,
           v1.c_mktsegment AS seg1, v1.acctbal AS bal1,
           v2.c_name AS name2, v2.c_mktsegment AS seg2, v2.acctbal AS bal2,
           (v1.c_mktsegment <> v2.c_mktsegment OR v1.acctbal <> v2.acctbal) AS changed
    FROM v1 JOIN v2 USING (c_custkey)
),
kept AS (  -- unchanged current rows
    SELECT c_custkey, cust_key, 1 AS version, TRUE AS is_current,
           DATE '2024-01-01' AS effective_from_date,
           DATE '9999-12-31' AS effective_to_date,
           TIMESTAMP '2024-01-01 06:00:00' AS created_timestamp,
           TIMESTAMP '2024-01-01 06:00:00' AS updated_timestamp,
           name1 AS c_name, seg1 AS c_mktsegment, bal1 AS acctbal
    FROM matched WHERE NOT changed
),
expired AS (  -- changed: old version closes at the new effective date
    SELECT c_custkey, cust_key, 1 AS version, FALSE AS is_current,
           DATE '2024-01-01' AS effective_from_date,
           DATE '2024-02-01' AS effective_to_date,
           TIMESTAMP '2024-01-01 06:00:00' AS created_timestamp,
           TIMESTAMP '2024-02-01 06:00:00' AS updated_timestamp,
           name1 AS c_name, seg1 AS c_mktsegment, bal1 AS acctbal
    FROM matched WHERE changed
),
insert_src AS (  -- new versions for changed keys + v1 inserts for new keys
    SELECT c_custkey, name2 AS c_name, seg2 AS c_mktsegment, bal2 AS acctbal,
           2 AS version
    FROM matched WHERE changed
    UNION ALL
    SELECT v2.c_custkey, v2.c_name, v2.c_mktsegment, v2.acctbal, 1 AS version
    FROM v2 LEFT JOIN v1 USING (c_custkey) WHERE v1.c_custkey IS NULL
),
inserted AS (  -- dense keys continue from the existing max, natural-key order
    SELECT c_custkey,
           CAST((SELECT MAX(cust_key) FROM v1)
                + ROW_NUMBER() OVER (ORDER BY c_custkey) AS INT) AS cust_key,
           version, TRUE AS is_current,
           DATE '2024-02-01' AS effective_from_date,
           DATE '9999-12-31' AS effective_to_date,
           TIMESTAMP '2024-02-01 06:00:00' AS created_timestamp,
           TIMESTAMP '2024-02-01 06:00:00' AS updated_timestamp,
           c_name, c_mktsegment, acctbal
    FROM insert_src
),
mrg_src AS (SELECT * FROM v2 WHERE c_custkey % 7 <> 3),
mrg AS (  -- merge_into clause matrix as FULL JOIN + CASE
    SELECT
        COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.acctbal ELSE t.acctbal END AS acctbal
    FROM v1_attrs t FULL JOIN mrg_src s ON t.c_custkey = s.c_custkey
    WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
               AND s.c_mktsegment = 'CHANGED')          -- matched delete
      AND NOT (s.c_custkey IS NULL
               AND t.c_mktsegment = 'BUILDING')         -- by-source delete
)
SELECT 'scd2' AS variant, c_custkey, cust_key, version, is_current,
       effective_from_date, effective_to_date, created_timestamp,
       updated_timestamp, c_name, c_mktsegment, acctbal
FROM (
    SELECT * FROM kept
    UNION ALL SELECT * FROM expired
    UNION ALL SELECT c_custkey, cust_key, version, is_current,
           effective_from_date, effective_to_date, created_timestamp,
           updated_timestamp, c_name, c_mktsegment, acctbal FROM inserted
)
UNION ALL
SELECT 'merge' AS variant, c_custkey, CAST(0 AS INT), CAST(0 AS INT),
       TRUE, DATE '9999-12-31', DATE '9999-12-31',
       TIMESTAMP '2024-02-01 06:00:00', TIMESTAMP '2024-02-01 06:00:00',
       c_name, c_mktsegment, acctbal
FROM mrg
ORDER BY variant, c_custkey, version
"""


def q_scd2_from_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill an effective-dated dimension from a change log: each user's
    event stream becomes versioned state rows with [from, to) ranges via
    lead() — one window pass, shuffle on the natural key only."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("version", F.row_number().over(w))
        .withColumn("effective_from_epoch", F.unix_timestamp("ts"))
        .withColumn("effective_to_epoch", F.unix_timestamp(F.lead("ts").over(w)))
        .withColumn("is_current", F.lead("ts").over(w).isNull())
        .select(
            "user_id", "version", F.col("event_type").alias("state"),
            "effective_from_epoch", "effective_to_epoch", "is_current",
        )
        .orderBy("user_id", "version")
    )


ORACLE_SCD2_FROM_HISTORY = """
SELECT
    user_id,
    CAST(ROW_NUMBER() OVER w AS INT) AS version,
    event_type AS state,
    CAST(FLOOR(epoch(ts)) AS BIGINT) AS effective_from_epoch,
    CAST(FLOOR(epoch(LEAD(ts) OVER w)) AS BIGINT) AS effective_to_epoch,
    LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


QUERIES = {
    "scd2_merge": q_scd2_merge,
    "scd2_from_history": q_scd2_from_history,
}

ORACLE = {
    "scd2_merge": ORACLE_SCD2_MERGE,
    "scd2_from_history": ORACLE_SCD2_FROM_HISTORY,
}
