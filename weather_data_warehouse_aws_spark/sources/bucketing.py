"""Bucketed tables — shuffle-free co-located joins (SURVEY §4, brief:
"repartition/bucketing for co-located joins").

For a fact⋈fact join that repeats across a workload (lineitem⋈orders at
every scale factor of TPC-H, silver-forecast⋈silver-actual daily here),
paying the shuffle once at WRITE time and never again is the single biggest
recurring saving at 100 TB: both tables hash-`bucketBy` on the join key, and
Spark's scan reports the bucketing as its output partitioning, so the join
plans with NO Exchange on either side.

Requires `saveAsTable` (bucket metadata lives in the session catalog);
`spark.sql.sources.bucketing.enabled` is on by default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    location: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table.

    Sorting within buckets additionally removes the per-task Sort from
    sort-merge joins and enables faster range scans.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket spec the plan has
    zero Exchange operators (verified by tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
