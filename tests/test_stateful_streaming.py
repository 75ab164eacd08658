"""applyInPandasWithState: per-user running state must match the batch
ground truth once the stream drains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.sources.tables import load_table
from weather_data_warehouse_aws_spark.streaming.jobs import read_events_stream
from weather_data_warehouse_aws_spark.streaming.stateful import running_user_stats


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stateful"))
    load_table(spark, sf_smoke_dir, "events").repartition(6).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_running_state_matches_batch_totals(spark, events_dir, tmp_path_factory):
    stream = read_events_stream(spark, events_dir)
    out_q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out_q.awaitTermination(180)
    result = spark.table("user_stats")

    # the stream ran in multiple micro-batches (maxFilesPerTrigger=4 over 6
    # files) → state really crossed batch boundaries; take the final row per
    # user (max total_events) as the converged value
    final = (
        result.groupBy("user_id")
        .agg(
            F.max("total_events").alias("total_events"),
            F.max("total_value").alias("total_value"),
            F.sum("batch_events").alias("sum_batch_events"),
        )
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("total"),
        )
    )
    got = {r.user_id: (r.total_events, r.sum_batch_events) for r in final.collect()}
    want = {r.user_id: r.n for r in batch.collect()}
    assert {u: v[0] for u, v in got.items()} == want
    # per-batch deltas must also sum to the total — state emitted every batch
    assert {u: v[1] for u, v in got.items()} == want
    # at least one user saw more than one micro-batch
    multi = result.groupBy("user_id").count().filter(F.col("count") > 1)
    assert multi.count() > 0
