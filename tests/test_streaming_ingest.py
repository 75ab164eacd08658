"""Checkpointed incremental ingest: re-runs are no-ops, new bronze days are
picked up incrementally, and the result matches the batch pipeline."""

from __future__ import annotations

import datetime as dt

from weather_data_warehouse_aws_spark.pipeline.generate import generate_bronze
from weather_data_warehouse_aws_spark.pipeline.silver import (
    build_silver_current,
    read_bronze,
)
from weather_data_warehouse_aws_spark.streaming.ingest import run_silver_ingest


def test_incremental_ingest_is_idempotent_and_incremental(spark, tmp_path_factory):
    bronze = str(tmp_path_factory.mktemp("bronze_stream"))
    silver = str(tmp_path_factory.mktemp("silver_stream")) + "/out"
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    generate_bronze(bronze, start=dt.date(2024, 1, 1), days=2, seed=42)
    run_silver_ingest(spark, bronze, silver, ckpt)
    n1 = spark.read.parquet(silver).count()
    assert n1 == 2 * 8

    # re-run with NOTHING new: checkpoint makes it a no-op (the reference
    # would have doubled silver here - M4)
    run_silver_ingest(spark, bronze, silver, ckpt)
    assert spark.read.parquet(silver).count() == n1

    # land a new day -> only it is processed
    generate_bronze(bronze, start=dt.date(2024, 1, 3), days=1, seed=43)
    run_silver_ingest(spark, bronze, silver, ckpt)
    got = spark.read.parquet(silver)
    assert got.count() == 3 * 8

    # the streamed silver matches the batch transformation bit-for-bit
    # (same build_silver_current), modulo the audit timestamp
    batch = build_silver_current(read_bronze(spark, bronze, "current"))
    cols = [c for c in batch.columns if c != "processed_timestamp"]
    got_rows = sorted(map(str, got.select(cols).collect()))
    want_rows = sorted(map(str, batch.select(cols).collect()))
    assert got_rows == want_rows


def test_forecast_ingest_with_streaming_explode(spark, tmp_path_factory):
    """The forecast path explodes 40 points per city inside the stream;
    totals and horizon math must match the batch transformation."""
    from weather_data_warehouse_aws_spark.pipeline.silver import build_silver_forecast
    from weather_data_warehouse_aws_spark.streaming.ingest import run_forecast_ingest

    bronze = str(tmp_path_factory.mktemp("bronze_fc"))
    silver = str(tmp_path_factory.mktemp("silver_fc")) + "/out"
    ckpt = str(tmp_path_factory.mktemp("ckpt_fc"))
    generate_bronze(bronze, start=dt.date(2024, 2, 1), days=2, seed=9)

    run_forecast_ingest(spark, bronze, silver, ckpt)
    got = spark.read.parquet(silver)
    assert got.count() == 2 * 8 * 40
    # idempotent re-run
    run_forecast_ingest(spark, bronze, silver, ckpt)
    assert spark.read.parquet(silver).count() == 2 * 8 * 40

    batch = build_silver_forecast(read_bronze(spark, bronze, "forecast"))
    cols = [c for c in batch.columns if c != "processed_timestamp"]
    assert sorted(map(str, got.select(cols).collect())) == sorted(
        map(str, batch.select(cols).collect())
    )
