"""End-to-end pipeline driver (replaces Lambda→Glue→Glue chaining, M3).

The reference chains jobs via a fire-and-forget Glue trigger
(`weather_extractor_lambda.py:82-90,132-133`); here one function runs the
stages in order against a local warehouse directory:

    bronze JSON  →  silver parquet (partitioned)  →  gold dims  →  fact views

Silver AND gold tables live on the TRANSACTION LOG
(`operators/txlog.py`): every refresh/ingest is one atomic commit,
concurrent readers keep their snapshot through a mid-write crash or
race, the pre-refresh state stays time-travelable
(`tx_read(..., version=v)`), and a bad load rolls back with `tx_restore`.
This makes the reference's M4 class of bug (non-idempotent re-runs,
`bronze_to_silver.py:114-117`) impossible by construction across the
whole warehouse: silver re-ingest is a `tx_replace_where` swap of
exactly the batch's dates (hive layout and date pruning unchanged —
the log records `col=value/` relpaths), gold refresh is `tx_overwrite`.

Cross-table consistency: the gold tables commit to SEPARATE logs, so a
reader arriving between commits could join the new `dim_location` to the
pre-refresh fact. `run_pipeline` therefore publishes a snapshot manifest
(atomic PUT through the table format's DataStore seam — rename on
POSIX, per-key atomic PUT on an object store) recording every table's
committed version AFTER the last commit, and `read_gold_snapshot` pins
all reads `as_of` those versions — one coherent generation, always, on
whatever storage the tables live on.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.txlog import get_data_store, tx_exists, tx_overwrite, tx_read
from ..session import ensure_session_conf
from .gold import build_dim_date, build_dim_location
from .silver import build_silver_current, build_silver_forecast, read_bronze, write_silver_tx
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
    # idempotent AND atomic by construction (M4 fix): re-running a day
    # swaps that day's rows in one commit; a crash mid-write leaves the
    # previous version live (see write_silver_tx)
    versions: dict[str, int] = {}
    versions["silver_current"] = write_silver_tx(
        silver_current, cur_path, "observation_date"
    )["version"]
    versions["silver_forecast"] = write_silver_tx(
        silver_forecast, fc_path, "forecast_created_date"
    )["version"]
    silver_current = tx_read(spark, cur_path)
    silver_forecast = tx_read(spark, fc_path)

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
    versions["dim_location"] = tx_overwrite(dim_location, dim_location_path)
    dim_location = tx_read(spark, dim_location_path)

    dim_date = build_dim_date(spark, *dim_date_range)
    dim_date_path = os.path.join(warehouse_dir, "gold", "dim_date")
    versions["dim_date"] = tx_overwrite(dim_date, dim_date_path)
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
    versions["fact_forecast_accuracy"] = tx_overwrite(
        facts["fact_forecast_accuracy"].withColumn(
            "forecast_for_date", F.to_date("forecast_for_time")
        ),
        acc_path,
        partition_by=["forecast_for_date"],
    )
    facts["fact_forecast_accuracy"] = tx_read(spark, acc_path)
    facts["fact_forecast_accuracy"].createOrReplaceTempView("fact_forecast_accuracy")

    # publish the generation: THIS run's committed versions (never
    # re-read from the logs — a concurrent run's later commit would leak
    # in as a mixed generation), swapped in atomically AFTER the last
    # commit — read_gold_snapshot pins to this
    _publish_snapshot_manifest(warehouse_dir, versions)

    return {
        "silver_current": silver_current,
        "silver_forecast": silver_forecast,
        "dim_location": dim_location,
        "dim_date": dim_date,
        **facts,
    }


SNAPSHOT_TABLES = {
    "silver_current": ("silver", "current_weather"),
    "silver_forecast": ("silver", "forecast_weather"),
    "dim_location": ("gold", "dim_location"),
    "dim_date": ("gold", "dim_date"),
    "fact_forecast_accuracy": ("gold", "fact_forecast_accuracy"),
}


_SNAPSHOT_REL = "_snapshot.json"


def _manifest_root(warehouse_dir: str) -> str:
    """The manifest's storage root (the gold layer dir) — resolved through
    the same DataStore routing as the tables it points at, so on an
    object-store deployment the cross-table consistency point lives in
    the bucket alongside the gold tx tables, not on driver-local POSIX."""
    return os.path.join(warehouse_dir, "gold")


def _publish_snapshot_manifest(
    warehouse_dir: str, versions: dict[str, int]
) -> dict[str, int]:
    """Record {table: committed version} for one pipeline run and swap it
    in with one atomic PUT through the DataStore seam (`put_atomic` —
    rename on POSIX, per-key atomic PUT on an object store) — the
    cross-table read-consistency point. Published only after EVERY
    table's commit, and only with the versions THE CALLER committed
    (re-reading the logs here would race a concurrent run and publish a
    mixed generation)."""
    versions = {n: v for n, v in versions.items() if v is not None}
    root = _manifest_root(warehouse_dir)
    get_data_store(root).put_atomic(root, _SNAPSHOT_REL, json.dumps(versions))
    return versions


def read_gold_snapshot(
    spark: SparkSession, warehouse_dir: str
) -> dict[str, DataFrame]:
    """Read ONE coherent warehouse generation: every table pinned `as_of`
    the version the last completed `run_pipeline` published in the
    snapshot manifest. A reader holding these DataFrames through a
    concurrent refresh can never join the new `dim_location` to the
    pre-refresh fact (or vice versa) — the mixed-generation anomaly that
    separate per-table logs (and the reference's separate Glue jobs)
    otherwise allow. Returns the tables plus a `"versions"` dict entry."""
    root = _manifest_root(warehouse_dir)
    with get_data_store(root).open_input(root, _SNAPSHOT_REL) as fh:
        versions: dict[str, int] = json.load(fh)
    out: dict = {
        name: tx_read(
            spark,
            os.path.join(warehouse_dir, *SNAPSHOT_TABLES[name]),
            version=v,
        )
        for name, v in versions.items()
    }
    out["versions"] = versions
    return out
