#!/usr/bin/env python
"""Per-query Spark JOB attribution: run a registry query (or bench pipeline)
with the UI enabled and dump every job's description, duration, and task
count — the measurement tool behind the job-count claims in
OPTIMIZATION_r*.md (guide §1: measure first; at sf0.1 the suite is
job-overhead-bound, so job COUNTS are the load-independent evidence).

Usage: python tools/profile_jobs.py <query> [iters]
The first iteration warms codegen/broadcast caches; jobs are counted on
the LAST iteration only (group boundaries via job-group tags).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from weather_data_warehouse_aws_spark.session import get_spark

    # same confs as get_spark, but with the UI on for the REST job dump
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.appName("wdwa-profile")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PART", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    from weather_data_warehouse_aws_spark.session import ensure_session_conf

    ensure_session_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    fn = queries[name]

    t_last = None
    for it in range(iters):
        spark.sparkContext.setJobGroup(f"iter{it}", name)
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        t_last = time.perf_counter() - t0
        spark.catalog.clearCache()
    print(f"# {name}: last iter {t_last:.3f}s ({n} rows)", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4099/api/v1/applications/{app_id}/jobs?status=succeeded"
    jobs = json.loads(urllib.request.urlopen(url).read())
    last = [j for j in jobs if j.get("jobGroup") == f"iter{iters - 1}"]
    last.sort(key=lambda j: j["jobId"])
    total_ms = 0.0
    for j in last:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        t0 = datetime.strptime(j["submissionTime"], fmt)
        t1 = datetime.strptime(j["completionTime"], fmt)
        ms = (t1 - t0).total_seconds() * 1000
        total_ms += ms
        desc = (j.get("name") or j.get("description") or "")[:100]
        print(f"job {j['jobId']:>4} {ms:8.0f}ms tasks={j['numTasks']:>4} {desc}")
    print(f"# {len(last)} jobs in final iter, sum(job wall)={total_ms:.0f}ms, "
          f"iter wall={t_last:.3f}s")


if __name__ == "__main__":
    main()
