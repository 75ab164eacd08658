"""`weatherfeed` Python DataSource (sources/feed_source.py): registration,
determinism, partition fan-out, option handling, and value-domain parity
with the bronze generator's synthesis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.sources.feed_source import (
    FEED_SCHEMA,
    WeatherFeedDataSource,
    register_feed_source,
)


@pytest.fixture(scope="module")
def feed(spark):
    register_feed_source(spark)
    return (
        spark.read.format("weatherfeed")
        .option("start", "2024-01-01")
        .option("days", 3)
        .option("extractions_per_day", 2)
        .load()
    )


def test_schema_and_row_count(spark, feed):
    assert feed.schema == spark.createDataFrame([], FEED_SCHEMA).schema
    # 3 days x 2 extractions x 8 cities
    assert feed.count() == 3 * 2 * 8


def test_one_partition_per_extraction_batch(feed):
    """The scan must fan out one task per batch — the property that makes
    the source edge distributable instead of a driver loop."""
    parts = feed.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 6
    per_batch = feed.groupBy("batch_id").count().collect()
    assert len(per_batch) == 6 and all(r["count"] == 8 for r in per_batch)


def test_deterministic_across_reads(spark):
    register_feed_source(spark)
    rd = lambda: (  # noqa: E731
        spark.read.format("weatherfeed").option("days", 2).load()
    )
    a = sorted(map(tuple, rd().collect()), key=str)
    b = sorted(map(tuple, rd().collect()), key=str)
    assert a == b


def test_seed_option_changes_values_not_shape(spark):
    register_feed_source(spark)
    base = spark.read.format("weatherfeed").option("days", 1).load()
    other = (
        spark.read.format("weatherfeed")
        .option("days", 1)
        .option("seed", 7)
        .load()
    )
    assert base.count() == other.count() == 8
    assert sorted(r.city_name for r in base.collect()) == sorted(
        r.city_name for r in other.collect()
    )
    assert {r.temp for r in base.collect()} != {r.temp for r in other.collect()}


def test_gust_is_per_batch_all_or_none(feed):
    """include_gust is a BATCH-level draw (the X4 optional-field semantics):
    within one batch_id, wind_gust is either present for all 8 cities or
    null for all 8."""
    per = (
        feed.groupBy("batch_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("wind_gust").isNotNull().cast("int")).alias("with_gust"),
        )
        .collect()
    )
    assert all(r.with_gust in (0, r.n) for r in per)


def test_value_domains_match_generator(feed):
    """Same synthesis as pipeline/generate.py: temps inside base±diurnal±4,
    humidity/pressure in the generator's ranges, conditions from its list."""
    from weather_data_warehouse_aws_spark.pipeline.generate import (
        CONDITIONS,
        _BASE_TEMP,
    )

    rows = feed.collect()
    for r in rows:
        assert abs(r.temp - _BASE_TEMP[r.city_name]) <= 5 + 4 + 1e-9
        assert 20 <= r.humidity <= 100
        assert 990 <= r.pressure <= 1035
        assert r.condition in CONDITIONS


def test_bad_options_raise(spark):
    register_feed_source(spark)
    import py4j.protocol
    from pyspark.errors import PySparkException

    with pytest.raises((ValueError, PySparkException, py4j.protocol.Py4JJavaError, Exception)):
        spark.read.format("weatherfeed").option("extractions_per_day", 0).load().collect()


def test_silver_projection_consumes_the_feed(feed):
    """The flat feed supports the silver-shaped derivation directly —
    the point of shedding the JSON nesting at the source boundary."""
    silver = feed.select(
        "city_name",
        "batch_id",
        F.col("temp"),
        (F.col("temp_max") - F.col("temp_min")).alias("temp_range"),
        F.to_date("extraction_timestamp").alias("obs_date"),
    )
    got = silver.filter(F.col("temp_range") < 0).count()
    assert got == 0 and silver.count() == 48


def test_stream_reader_one_batch_per_trigger_and_resume(spark, tmp_path_factory):
    """Streaming edge: each trigger ingests exactly one extraction batch,
    and a RESTART from the checkpoint resumes at the next offset — the
    EventBridge-schedule semantics, owned by the engine's own offset log."""
    register_feed_source(spark)
    ckpt = str(tmp_path_factory.mktemp("feed_ckpt"))
    out = str(tmp_path_factory.mktemp("feed_out")) + "/t"

    def run_once():
        q = (
            spark.readStream.format("weatherfeed")
            .option("extractions_per_day", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 8
    ids1 = {r.batch_id for r in first.select("batch_id").distinct().collect()}
    assert len(ids1) == 1

    run_once()
    both = spark.read.parquet(out)
    assert both.count() == 16
    ids2 = {r.batch_id for r in both.select("batch_id").distinct().collect()}
    assert len(ids2) == 2 and ids1 < ids2


def test_zero_days_is_an_empty_feed(spark):
    """days=0 declares an empty scan — Spark still probes read() with a
    None partition; the source must answer with zero rows, not a crash."""
    register_feed_source(spark)
    df = spark.read.format("weatherfeed").option("days", 0).load()
    assert df.count() == 0
    assert len(df.schema) == 20
