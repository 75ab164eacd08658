"""End-to-end pipeline driver (replaces Lambda→Glue→Glue chaining, M3).

The reference chains jobs via a fire-and-forget Glue trigger
(`weather_extractor_lambda.py:82-90,132-133`); here one function runs the
stages in order against a local warehouse directory:

    bronze JSON  →  silver parquet (partitioned)  →  gold dims  →  fact views
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_conf
from ..sources.tables import read_parquet_if_exists
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
    # path-missing → first run → initial load (reference build_dimensions.py:
    # 52-58); any OTHER read failure re-raises — falling through to the
    # initial-load overwrite on a transient error would destroy SCD2 history
    existing = read_parquet_if_exists(spark, dim_location_path)
    dim_location = build_dim_location(
        silver_current, existing, effective_date=effective_date, now=now
    )
    if existing is None:
        # first run: nothing being read from the target — write directly
        dim_location.write.mode("overwrite").parquet(dim_location_path)
    else:
        # merge reads the existing dim: stage, swap, clean (no
        # overwrite-while-reading, no leftover staging dir)
        import shutil

        tmp = dim_location_path + "__new"
        dim_location.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(dim_location_path)
        shutil.rmtree(tmp, ignore_errors=True)
    dim_location = spark.read.parquet(dim_location_path)

    dim_date = build_dim_date(spark, *dim_date_range)
    dim_date_path = os.path.join(warehouse_dir, "gold", "dim_date")
    dim_date.write.mode("overwrite").parquet(dim_date_path)
    dim_date = spark.read.parquet(dim_date_path)

    facts = register_fact_views(spark, silver_current, silver_forecast, dim_location, dim_date)
    # materialize the accuracy fact — the reference recomputes its band join
    # inside every query (views inlined by Athena); we pay it once per load
    acc_path = os.path.join(warehouse_dir, "gold", "fact_forecast_accuracy")
    facts["fact_forecast_accuracy"].write.mode("overwrite").parquet(acc_path)
    facts["fact_forecast_accuracy"] = spark.read.parquet(acc_path)
    facts["fact_forecast_accuracy"].createOrReplaceTempView("fact_forecast_accuracy")

    return {
        "silver_current": silver_current,
        "silver_forecast": silver_forecast,
        "dim_location": dim_location,
        "dim_date": dim_date,
        **facts,
    }
