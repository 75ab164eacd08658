"""Checkpointed incremental ingest: re-runs are no-ops, new bronze days are
picked up incrementally, landing is ATOMIC (transaction-log table, one
commit per micro-batch), and the result matches the batch pipeline."""

from __future__ import annotations

import datetime as dt

from weather_data_warehouse_aws_spark.operators.txlog import tx_read, tx_snapshot
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
    n1 = tx_read(spark, silver).count()
    assert n1 == 2 * 8
    v1 = tx_snapshot(silver)["version"]

    # re-run with NOTHING new: checkpoint makes it a no-op (the reference
    # would have doubled silver here - M4) — and the LOG is untouched too
    run_silver_ingest(spark, bronze, silver, ckpt)
    assert tx_read(spark, silver).count() == n1
    assert tx_snapshot(silver)["version"] == v1

    # land a new day -> only it is processed, as new commits on the log
    generate_bronze(bronze, start=dt.date(2024, 1, 3), days=1, seed=43)
    run_silver_ingest(spark, bronze, silver, ckpt)
    got = tx_read(spark, silver)
    assert got.count() == 3 * 8
    assert tx_snapshot(silver)["version"] > v1
    # the pre-ingest state stays time-travelable
    assert tx_read(spark, silver, version=v1).count() == n1

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
    got = tx_read(spark, silver)
    assert got.count() == 2 * 8 * 40
    # idempotent re-run
    run_forecast_ingest(spark, bronze, silver, ckpt)
    assert tx_read(spark, silver).count() == 2 * 8 * 40

    batch = build_silver_forecast(read_bronze(spark, bronze, "forecast"))
    cols = [c for c in batch.columns if c != "processed_timestamp"]
    assert sorted(map(str, got.select(cols).collect())) == sorted(
        map(str, batch.select(cols).collect())
    )
