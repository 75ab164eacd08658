"""Incremental bronze→silver ingestion as a file-source stream.

The reference's daily Glue job re-reads the ENTIRE bronze glob and appends
to silver — duplicating silver on every run (SURVEY §2.11 M4). The batch
fix is dynamic partition overwrite (pipeline/silver.py); the *architectural*
fix is this: bronze is a file-arrival stream, and Structured Streaming's
checkpoint tracks exactly which files have been processed. Re-running the
job is a no-op; a new day's files are picked up incrementally; a crashed run
resumes where it stopped. Exactly-once into the parquet sink.

At scale this replaces the reference's EventBridge+full-rescan with a
long-running (or availableNow-cron) incremental job whose per-run cost is
O(new data), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.schemas import BRONZE_CURRENT_SCHEMA
from ..pipeline.silver import build_silver_current
from ..session import ensure_session_conf


def stream_bronze_current(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """File stream over the bronze landing zone (same glob as the batch
    reader, `bronze_to_silver.py:27`)."""
    ensure_session_conf(spark)
    return (
        spark.readStream.schema(BRONZE_CURRENT_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 8)
        .json(f"{bronze_dir}/raw/current/*/*/*/*/*.json")
    )


def run_silver_ingest(
    spark: SparkSession,
    bronze_dir: str,
    silver_path: str,
    checkpoint_path: str,
    *,
    timeout_sec: int = 180,
) -> None:
    """Drain all currently-available bronze files into silver parquet.

    The checkpoint makes this idempotent across invocations: files already
    committed are never re-read. The silver transformation is the SAME
    function the batch path uses — one definition, two execution modes.
    """
    bronze = stream_bronze_current(spark, bronze_dir)
    silver = build_silver_current(bronze)
    q = (
        silver.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("observation_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def stream_bronze_forecast(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """File stream over the forecast bronze zone — the `explode(list)`
    flattening (X1) runs statelessly inside the stream."""
    from ..pipeline.schemas import BRONZE_FORECAST_SCHEMA

    ensure_session_conf(spark)
    return (
        spark.readStream.schema(BRONZE_FORECAST_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 8)
        .json(f"{bronze_dir}/raw/forecast/*/*/*/*/*.json")
    )


def run_forecast_ingest(
    spark: SparkSession,
    bronze_dir: str,
    silver_path: str,
    checkpoint_path: str,
    *,
    timeout_sec: int = 180,
) -> None:
    """Forecast twin of run_silver_ingest: 40-point explode + flatten +
    horizon math per micro-batch, checkpointed exactly-once into
    partitioned parquet. Same transformation function as the batch path."""
    from ..pipeline.silver import build_silver_forecast

    bronze = stream_bronze_forecast(spark, bronze_dir)
    silver = build_silver_forecast(bronze)
    q = (
        silver.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("forecast_created_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
