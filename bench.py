#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a cheap count-style action (noop write would add
I/O variance); timings include plan + execution, excluding session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_data_warehouse_aws_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# iterations per query; >1 reports the best run (steady-state timing with
# JIT/codegen caches warm — use for optimization work, driver uses default 1)
ITERS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "1")))


def main() -> None:
    spark = get_spark("wdwa-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not first-touch costs
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        best, n = None, 0
        for _ in range(ITERS):
            start = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            n = df.count()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
            # queries may persist internal intermediates (e.g. minhash
            # signatures); drop them so queries are timed independently
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # end-to-end weather pipeline (bronze JSON → silver → gold/SCD2 → band-
    # join accuracy fact): the reference's entire workload, vs its "<5 min
    # per Glue job" budget (BASELINE.md). 30 days × 2 extractions × 8 cities.
    import shutil
    import tempfile

    from weather_data_warehouse_aws_spark.pipeline.generate import generate_bronze
    from weather_data_warehouse_aws_spark.pipeline.run import run_pipeline

    tmp = tempfile.mkdtemp(prefix="wdwa_bench_")
    try:
        bronze = os.path.join(tmp, "bronze")
        generate_bronze(bronze, days=30, extractions_per_day=2, seed=42)
        start = time.perf_counter()
        layers = run_pipeline(spark, bronze, os.path.join(tmp, "wh"))
        n_acc = layers["fact_forecast_accuracy"].count()
        timings["weather_pipeline"] = round(time.perf_counter() - start, 3)
        print(
            f"# weather_pipeline: {timings['weather_pipeline']:.3f}s "
            f"({n_acc} accuracy rows)",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.clearCache()

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "wdwa_spark_query_suite",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
