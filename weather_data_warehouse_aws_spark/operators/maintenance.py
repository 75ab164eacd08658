"""Table maintenance: small-file compaction.

Daily partitioned appends (the reference's silver pattern) accumulate
small files — each extraction lands 8-city micro-files, and at 100 TB a
few-KB-per-file layout murders scan throughput (one task + one S3 GET per
file; parquet footers dominate I/O). Compaction rewrites each partition to
a target file count while preserving the partition layout, so downstream
pruning is unaffected.

Idempotent and crash-safe per partition: rewrites go to a sibling temp
directory first, then swap — a failed run leaves the original partition
intact.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def list_partitions(path: str) -> list[str]:
    """Immediate hive-style partition directories (`col=value`)."""
    return sorted(
        d for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 1,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite every partition having more than `min_files` data files down
    to `target_files`. Returns {partition: (files_before, files_after)}.

    Runs partition-at-a-time so peak temp space is one partition, and a
    crash can only affect the partition mid-swap (whose original is still
    on disk until the final rename).
    """
    results: dict[str, tuple[int, int]] = {}
    for part in list_partitions(path):
        part_dir = os.path.join(path, part)
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) < max(min_files, target_files + 1):
            continue
        tmp_dir = part_dir + "__compact"
        (
            spark.read.parquet(part_dir)
            .repartition(target_files)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        old_dir = part_dir + "__old"
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        results[part] = (len(files), after)
    return results
