#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<round>/
(round via $SPARK_GRAFT_PLAN_ROUND, default r11).

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/<round>/<name>_<suffix>.txt for each named query (default: a
fixed heavy-entry list). Diagnostic entries that run real filesystem
commits (mv_incremental, tx_roundtrip) return localCheckpoint()ed
results whose plans are opaque; they are captured anyway for the record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_warehouse_aws_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

HEAVY = [
    "decontamination", "dedup_clusters", "pair_dedup", "token_topk",
    "embedding_neardup", "interval_join", "ivf_ann_refined", "set_ops",
    "text_relevance", "doc_profile", "corpus_sampling", "band_joins",
    "scd2_merge", "role_playing_nation", "regional_volume", "events_rollup",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEAVY
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11"))
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("wdwa-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython, "
              f"{plan.count('ArrowEvalPython')} ArrowEvalPython)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
