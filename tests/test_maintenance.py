"""Compaction: file counts drop, rows and values don't change."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.maintenance import (
    compact_partitions,
    list_partitions,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


def test_compaction_preserves_data(spark, sf_smoke_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact")) + "/events"
    ev = load_table(spark, sf_smoke_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    # simulate many small appended files per partition
    ev.repartition(12).write.partitionBy("day").mode("overwrite").parquet(out)

    before_rows = spark.read.parquet(out).count()
    before_sum = spark.read.parquet(out).agg(F.sum("value")).collect()[0][0]
    parts = list_partitions(out)
    assert parts, "expected hive partitions"
    files_before = {
        p: len([f for f in os.listdir(os.path.join(out, p)) if f.endswith(".parquet")])
        for p in parts
    }
    assert max(files_before.values()) > 1

    results = compact_partitions(spark, out, target_files=1)
    assert results, "nothing compacted"
    for p, (b, a) in results.items():
        assert a == 1 and b > 1, (p, b, a)

    after = spark.read.parquet(out)
    assert after.count() == before_rows
    assert abs(after.agg(F.sum("value")).collect()[0][0] - before_sum) < 1e-6
    # partition layout intact → pruning still works
    one_day = parts[0].split("=", 1)[1]
    pruned = after.filter(F.col("day") == one_day)
    assert pruned.count() > 0
