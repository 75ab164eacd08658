"""Broadcast Bloom-filter pruning: superset semantics, FPR, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.functions.text import portable_hash60
from weather_data_warehouse_aws_spark.operators.bloom import (
    bloom_params,
    bloom_prune,
    build_bloom,
    might_contain,
)


def _hashed_range(spark, n: int):
    return spark.range(n).select(
        F.col("id"), portable_hash60(F.col("id").cast("string")).alias("h")
    )


def test_no_false_negatives(spark):
    """Every build-side key must survive the prune — the property that makes
    `bloom prune → exact join` result-identical to the exact join."""
    df = _hashed_range(spark, 20_000)
    build = df.filter(F.col("id") % 37 == 0)
    pruned = bloom_prune(df, "h", build, "h", fpr=0.01)
    assert build.join(pruned, "h", "left_anti").count() == 0


def test_false_positive_rate_bounded(spark):
    """Observed FPR stays within a loose multiple of the nominal rate (the
    classic formula is asymptotic; small-m rounding costs a small factor)."""
    n = 20_000
    df = _hashed_range(spark, n)
    build = df.filter(F.col("id") % 50 == 0)
    n_true = build.count()
    kept = bloom_prune(df, "h", build, "h", fpr=0.01).count()
    observed_fpr = (kept - n_true) / (n - n_true)
    assert observed_fpr < 0.05


def test_join_after_prune_identical(spark):
    """The composed prune+join equals the plain join row-for-row."""
    df = _hashed_range(spark, 5_000)
    build = df.filter(F.col("id") % 13 == 0).select(F.col("h").alias("bh"))
    plain = df.join(build, df.h == build.bh).select("id")
    pruned = bloom_prune(df, "h", build, "bh", fpr=0.02).join(
        build, F.col("h") == F.col("bh")
    ).select("id")
    assert sorted(r.id for r in plain.collect()) == sorted(r.id for r in pruned.collect())


def test_probe_is_jvm_only_and_shuffle_free(spark):
    """The probe side gains a Filter inside WholeStageCodegen — no exchange,
    no Python eval — which is what makes it free at the scan at 100 TB."""
    df = _hashed_range(spark, 5_000)
    build = df.filter(F.col("id") % 100 == 0)
    pruned = bloom_prune(df, "h", build, "h", fpr=0.01)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
    assert "Filter" in plan


def test_bitmap_matches_probe_formula(spark):
    """build_bloom and might_contain agree bit-for-bit: members always test
    true against the assembled literal bitmap."""
    keys = _hashed_range(spark, 500).select("h")
    n_bits, n_hashes = bloom_params(500, 0.01)
    bitmap = build_bloom(keys, "h", n_bits, n_hashes)
    assert len(bitmap) == n_bits // 64
    misses = keys.filter(~might_contain(bitmap, F.col("h"), n_bits, n_hashes)).count()
    assert misses == 0


def test_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ≈9.6 bits/key at 1% FPR
    assert 5 <= k <= 10
    # degenerate inputs stay sane
    m0, k0 = bloom_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1
