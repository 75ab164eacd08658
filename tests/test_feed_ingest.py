"""The `weatherfeed` DataSource consumed BY the pipeline (S7 end-to-end):
feed → bronze JSON landing → silver, in batch and checkpointed-stream
modes.

Value-level parity with `generate_bronze` is impossible BY DESIGN: the
file generator keeps the reference Lambda's sequential single-RNG draw
order (which cannot be distributed), while the pluggable source re-seeds
per extraction batch so partitions are independent
(`sources/feed_source.py` docstring). What must hold instead — and is
asserted here — is (a) envelope/layout/schema parity: feed-landed bronze
reads through the SAME `read_bronze → build_silver_current` path into the
same silver schema, and (b) byte-parity between the source's own batch
and streaming modes at the same seed, including across a checkpointed
restart."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.pipeline.feed_ingest import (
    feed_batch_to_bronze,
    feed_stream_to_bronze,
)
from weather_data_warehouse_aws_spark.pipeline.generate import CITIES, generate_bronze
from weather_data_warehouse_aws_spark.pipeline.silver import (
    build_silver_current,
    read_bronze,
)


def _bronze_files(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".json"):
                full = os.path.join(dirpath, n)
                out[os.path.relpath(full, root)] = open(full, "rb").read()
    return out


def test_feed_batch_lands_and_builds_silver(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    n = feed_batch_to_bronze(
        spark, bronze, start="2024-01-01", days=2, extractions_per_day=2, seed=7
    )
    assert n == {"current": 4, "forecast": 4}  # one file per batch per type
    silver = build_silver_current(read_bronze(spark, bronze, "current"))
    # all feed rows are clean (the DQ-violation injection is the file
    # generator's job): every (batch, city) row survives the gate
    assert silver.count() == 4 * len(CITIES)
    # same silver schema as the generate_bronze path produces
    gen_bronze = str(tmp_path / "bronze_gen")
    generate_bronze(gen_bronze, days=1, seed=7)
    gen_silver = build_silver_current(read_bronze(spark, gen_bronze, "current"))
    assert dict(silver.dtypes) == dict(gen_silver.dtypes)
    # value domains hold through the projection
    assert silver.filter(
        (F.col("temperature_celsius") < -50) | (F.col("temperature_celsius") > 60)
    ).count() == 0
    assert silver.filter(F.col("visibility_meters").isNull()).count() == 0


def test_feed_stream_matches_batch_bytes_and_resumes(spark, tmp_path):
    """Streaming landing ≡ batch landing byte-for-byte at the same seed,
    and the checkpoint makes a second invocation RESUME (land the next
    batches) instead of re-landing or skipping."""
    b_batch = str(tmp_path / "b_batch")
    b_stream = str(tmp_path / "b_stream")
    ckpt = str(tmp_path / "ckpt")

    feed_batch_to_bronze(
        spark, b_batch, start="2024-01-01", days=2, extractions_per_day=2, seed=42
    )
    # first run: two micro-batches (= first two extraction batches)
    n1 = feed_stream_to_bronze(
        spark, b_stream, ckpt, n_triggers=2, start="2024-01-01",
        extractions_per_day=2, seed=42,
    )
    # restart with the same checkpoint: lands batches 2 and 3, not 0 and 1
    n2 = feed_stream_to_bronze(
        spark, b_stream, ckpt, n_triggers=2, start="2024-01-01",
        extractions_per_day=2, seed=42,
    )
    assert n1 == n2 == 4  # 2 triggers x (current + forecast)
    batch_files = _bronze_files(b_batch)
    stream_files = _bronze_files(b_stream)
    assert batch_files.keys() == stream_files.keys()
    for rel, body in batch_files.items():
        assert stream_files[rel] == body, f"stream/batch drift in {rel}"


def test_run_pipeline_from_weatherfeed(spark, tmp_path):
    """The full batch pipeline over FEED-landed bronze — the S7 edge all
    the way to the gold accuracy fact (`pipeline --source weatherfeed`
    path). Gold lands on the transaction log like any other run."""
    from weather_data_warehouse_aws_spark.operators.txlog import tx_exists
    from weather_data_warehouse_aws_spark.pipeline.run import run_pipeline

    bronze = str(tmp_path / "bronze")
    feed_stream_to_bronze(
        spark, bronze, str(tmp_path / "ckpt"), n_triggers=3,
        start="2024-01-01", extractions_per_day=1, seed=11,
    )
    layers = run_pipeline(spark, bronze, str(tmp_path / "wh"))
    assert layers["silver_current"].count() == 3 * len(CITIES)
    assert layers["silver_forecast"].count() == 3 * len(CITIES) * 40
    assert layers["fact_forecast_accuracy"].count() > 0
    assert tx_exists(str(tmp_path / "wh" / "gold" / "fact_forecast_accuracy"))
