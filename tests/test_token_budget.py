"""token_budget_sample (operators/sampling.py): the two-phase prefix-sum
quota cut must be row-identical to the naive one-window-per-group
formulation, at every bucket count, including degenerate budgets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.sampling import (
    hash_bucket,
    token_budget_sample,
)


def _corpus(spark, n=400, groups=3):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias("grp"),
            ((F.col("id") * 37 % 19) + 1).alias("tokens"),
        )
    )


def _naive(df, budgets):
    w = (
        Window.partitionBy("grp")
        .orderBy(hash_bucket(F.col("doc_id")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", F.sum("tokens").over(w))
        .join(budgets, "grp")
        .filter(F.col("__cum") <= F.col("budget"))
        .select("doc_id", "grp", "tokens", "budget")
    )


@pytest.mark.parametrize("n_buckets", [2, 10, 50])
def test_two_phase_equals_naive_window(spark, n_buckets):
    df = _corpus(spark)
    budgets = spark.createDataFrame(
        [("g0", 500), ("g1", 123), ("g2", 1)], "grp string, budget long"
    )
    got = sorted(
        (r["doc_id"], r["grp"])
        for r in token_budget_sample(
            df, "grp", "doc_id", "tokens", budgets, n_buckets=n_buckets
        ).collect()
    )
    want = sorted((r["doc_id"], r["grp"]) for r in _naive(df, budgets).collect())
    assert got == want and len(got) > 0


def test_budget_zero_and_oversized(spark):
    df = _corpus(spark, n=60)
    totals = {
        r["grp"]: r["t"]
        for r in df.groupBy("grp").agg(F.sum("tokens").alias("t")).collect()
    }
    budgets = spark.createDataFrame(
        [("g0", 0), ("g1", totals["g1"]), ("g2", 10**9)], "grp string, budget long"
    )
    out = token_budget_sample(df, "grp", "doc_id", "tokens", budgets).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert "g0" not in by_grp  # zero budget keeps nothing
    # exact-total budget keeps the whole group; oversized likewise
    assert len(by_grp["g1"]) == 20 and len(by_grp["g2"]) == 20
    assert sum(r["tokens"] for r in by_grp["g1"]) == totals["g1"]


def test_budget_cut_is_prefix_of_hash_order(spark):
    """Kept set must be a prefix of the (hash, id) order — no cherry-picking."""
    df = _corpus(spark, n=90, groups=1)
    budgets = spark.createDataFrame([("g0", 300)], "grp string, budget long")
    kept = {
        r["doc_id"]
        for r in token_budget_sample(df, "grp", "doc_id", "tokens", budgets).collect()
    }
    ordered = [
        r["doc_id"]
        for r in df.withColumn("__h", hash_bucket(F.col("doc_id")))
        .orderBy("__h", "doc_id")
        .collect()
    ]
    prefix = set(ordered[: len(kept)])
    assert kept == prefix
