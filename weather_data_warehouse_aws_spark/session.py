"""SparkSession factory with scale-sane defaults.

The reference delegates all physical execution to Glue 4.0 (Spark 3.3) and
Athena; the only knobs it turns are partition layout and columnar format
(reference ``README.md:295-301``). Here we pin the configs that matter for a
local[32] run that must *model* a 1000-executor run:

* AQE on (coalesce + skew-join): runtime re-planning replaces hand-tuning.
* ``spark.sql.session.timeZone=UTC``: Athena/Presto evaluates ``TO_UNIXTIME``
  in UTC (reference ``create_views.sql:112-114``); we match, and it also makes
  parquet NTZ-vs-LTZ timestamp reads agree with the DuckDB oracle.
* shuffle partitions sized for the test scale; AQE coalesces the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "weather_data_warehouse_aws_spark") -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size post-shuffle partitions by BYTES (advisory target), not by
        # core count: parallelismFirst=true (Spark's compat default)
        # pins small stages at defaultParallelism — 32 near-empty tasks
        # per stage at test scale, and partition counts coupled to the
        # local core count instead of the data at any scale. false is
        # the setting Spark's own tuning docs recommend; the advisory
        # size stays env-tunable for cluster deployments.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PART", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs we rely on to a session we didn't build.

    The correctness driver constructs its own SparkSession; semantics that
    depend on session conf (``from_unixtime``, ``to_date`` on timestamps,
    parquet NTZ reads) must not silently drift, so every public query entry
    point routes through here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # see get_spark: byte-sized post-shuffle partitions (runtime-settable)
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    # the synthetic `events` table carries TIMESTAMP(NANOS) parquet columns,
    # which vanilla Spark refuses to read; read them as long and convert in
    # the loader (sources/tables.py) — values are micro-precision in practice
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
