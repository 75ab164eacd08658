"""Pipeline-op variants: the applyInPandas demo must equal the window data
path, and the HLL profile must approximate the exact one."""

from __future__ import annotations

from weather_data_warehouse_aws_spark.queries.pipeline_ops import (
    grouped_zscore_pandas_demo,
    profile_approx,
    q_grouped_zscore,
    q_profile,
)


def test_grouped_zscore_pandas_demo_matches_window(spark, sf_dir):
    """Same outliers, same rounded z-scores: the escape hatch and the
    scale path are the same operator."""
    window_rows = [tuple(r) for r in q_grouped_zscore(spark, sf_dir).collect()]
    pandas_rows = [tuple(r) for r in grouped_zscore_pandas_demo(spark, sf_dir).collect()]
    assert window_rows == pandas_rows and len(window_rows) > 0


def test_profile_approx_bounds_exact(spark, sf_dir):
    """approx_count_distinct must land within its documented ~5% default
    relative error of the exact distinct counts; all non-sketch columns are
    identical."""
    # q_profile also carries the `skew:` diagnostic branch (r5); the
    # sketch comparison is about the per-column stats rows only
    exact = {
        r.column_name: r
        for r in q_profile(spark, sf_dir).collect()
        if not r.column_name.startswith("skew:")
    }
    approx = {r.column_name: r for r in profile_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_val, a.max_val, a.avg_val) == (
            e.n_rows, e.n_nulls, e.min_val, e.max_val, e.avg_val
        )
        assert abs(a.n_distinct - e.n_distinct) <= max(0.1 * e.n_distinct, 2), c
