"""End-to-end pipeline driver (replaces Lambda→Glue→Glue chaining, M3).

The reference chains jobs via a fire-and-forget Glue trigger
(`weather_extractor_lambda.py:82-90,132-133`); here one function runs the
stages in order against a local warehouse directory:

    bronze JSON  →  silver parquet (partitioned)  →  gold dims  →  fact views

Gold tables (dims + the materialized accuracy fact) live on the
TRANSACTION LOG (`operators/txlog.py`): every refresh is one atomic
commit, concurrent readers keep their snapshot through a mid-refresh
crash or race, the pre-refresh state stays time-travelable
(`tx_read(..., version=v)`), and a bad load rolls back with `tx_restore`.
This makes the reference's M4 class of bug (non-idempotent re-runs,
`bronze_to_silver.py:114-117`) impossible by construction for gold — the
silver layer keeps hive-partitioned parquet (dynamic-partition overwrite
is its idempotence story AND its date-pruning layout; the log adds
nothing to a partition-replace that the date columns don't already give).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.txlog import tx_exists, tx_overwrite, tx_read
from ..session import ensure_session_conf
from .gold import build_dim_date, build_dim_location
from .silver import build_silver_current, build_silver_forecast, read_bronze, write_silver
from .views import register_fact_views


def run_pipeline(
    spark: SparkSession,
    bronze_dir: str,
    warehouse_dir: str,
    *,
    effective_date: _dt.date | None = None,
    now: _dt.datetime | None = None,
    dim_date_range: tuple[str, str] = ("2024-01-01", "2026-12-31"),
) -> dict[str, DataFrame]:
    """Run bronze→silver→gold→views; returns all layer DataFrames."""
    ensure_session_conf(spark)

    silver_current = build_silver_current(read_bronze(spark, bronze_dir, "current"))
    silver_forecast = build_silver_forecast(read_bronze(spark, bronze_dir, "forecast"))

    cur_path = os.path.join(warehouse_dir, "silver", "current_weather")
    fc_path = os.path.join(warehouse_dir, "silver", "forecast_weather")
    # idempotent by construction (M4 fix): re-running a day replaces that day
    # compact=True: one file per date partition instead of one per task —
    # a day of this domain is KBs, and 10× fewer files is measurably
    # faster to commit AND to re-scan (silver is read back immediately)
    write_silver(
        silver_current, cur_path, "observation_date",
        mode="overwrite_partitions", compact=True,
    )
    write_silver(
        silver_forecast, fc_path, "forecast_created_date",
        mode="overwrite_partitions", compact=True,
    )
    silver_current = spark.read.parquet(cur_path)
    silver_forecast = spark.read.parquet(fc_path)

    dim_location_path = os.path.join(warehouse_dir, "gold", "dim_location")
    # no-log-yet → first run → initial load (reference build_dimensions.py:
    # 52-58). The SCD2 merge READS the existing dim while tx_overwrite
    # WRITES its replacement — safe without any stage/swap dance because
    # data files are immutable: the new files land beside the old ones and
    # one commit swaps the live set (the old stage-then-double-write path
    # this replaces cost an extra full write per refresh)
    existing = (
        tx_read(spark, dim_location_path) if tx_exists(dim_location_path) else None
    )
    dim_location = build_dim_location(
        silver_current, existing, effective_date=effective_date, now=now
    )
    tx_overwrite(dim_location, dim_location_path)
    dim_location = tx_read(spark, dim_location_path)

    dim_date = build_dim_date(spark, *dim_date_range)
    dim_date_path = os.path.join(warehouse_dir, "gold", "dim_date")
    tx_overwrite(dim_date, dim_date_path)
    dim_date = tx_read(spark, dim_date_path)

    facts = register_fact_views(spark, silver_current, silver_forecast, dim_location, dim_date)
    # materialize the accuracy fact — the reference recomputes its band join
    # inside every query (views inlined by Athena); we pay it once per load.
    # `forecast_for_date` rides along so incremental maintenance
    # (pipeline/incremental.py::rebuild_accuracy_tx) can replace affected
    # date ranges with tx_replace_where instead of full recomputes.
    acc_path = os.path.join(warehouse_dir, "gold", "fact_forecast_accuracy")
    # hive-partitioned ON the log: the log-relative paths carry the date,
    # so incremental range maintenance (tx_replace_where) and date-sliced
    # reads prune files EXACTLY — at 100 TB the difference between a
    # full-fact scan and opening the affected days
    tx_overwrite(
        facts["fact_forecast_accuracy"].withColumn(
            "forecast_for_date", F.to_date("forecast_for_time")
        ),
        acc_path,
        partition_by=["forecast_for_date"],
    )
    facts["fact_forecast_accuracy"] = tx_read(spark, acc_path)
    facts["fact_forecast_accuracy"].createOrReplaceTempView("fact_forecast_accuracy")

    return {
        "silver_current": silver_current,
        "silver_forecast": silver_forecast,
        "dim_location": dim_location,
        "dim_date": dim_date,
        **facts,
    }
