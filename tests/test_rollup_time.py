"""Cascading rollup invariants: re-aggregating partials must equal direct
aggregation from raw at every grain (operators/rollup_time.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.rollup_time import (
    cascade_rollup,
    tagged_union,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


def _direct(ev, grain):
    return ev.groupBy(
        F.date_trunc(grain, "ts").alias("grain_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.count("user_id").alias("n_user_id"),
    )


def test_cascade_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    grains = cascade_rollup(
        ev, ts_col="ts", keys=["event_type"],
        sum_cols=["value"], count_cols=["user_id"],
        grains=("hour", "day", "month"),
    )
    for g, rolled in grains.items():
        got = {
            (r.grain_start, r.event_type): (r.n_rows, round(r.sum_value, 6), r.n_user_id)
            for r in rolled.collect()
        }
        want = {
            (r.grain_start, r.event_type): (r.n_rows, round(r.sum_value, 6), r.n_user_id)
            for r in _direct(ev, g).collect()
        }
        assert got == want, f"cascade != direct at grain {g}"


def test_tagged_union_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    grains = cascade_rollup(
        ev, ts_col="ts", keys=["event_type"], sum_cols=["value"],
        grains=("day", "month"),
    )
    u = tagged_union(grains)
    per = {r["grain"]: r["n"] for r in u.groupBy("grain").agg(F.count("*").alias("n")).collect()}
    assert per["day"] == grains["day"].count()
    assert per["month"] == grains["month"].count()
    assert per["month"] <= per["day"]


def test_week_month_cascade_rejected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="straddle"):
        cascade_rollup(ev, "ts", ["event_type"], grains=("week", "month"))


def test_distinct_rollup_cascade_equals_direct_and_bounds_error(spark, sf_dir):
    """HLL distinct rollup: (a) the cascaded coarse-grain estimate must
    EQUAL the single-pass estimate (register union is lossless), and
    (b) every grain's estimate must sit within HLL error of the exact
    distinct count."""
    from weather_data_warehouse_aws_spark.operators.rollup_time import (
        distinct_rollup,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    grains = distinct_rollup(
        ev, ts_col="ts", keys=["event_type"], distinct_col="user_id"
    )

    # (a) cascade ≡ direct single-pass sketch at the day grain
    direct = (
        ev.selectExpr("date_trunc('day', ts) AS grain_start", "event_type", "user_id")
        .groupBy("grain_start", "event_type")
        .agg(F.expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id, 12)) AS LONG) AS est"))
    )
    got = {(r.grain_start, r.event_type): r.n_distinct_est for r in grains["day"].collect()}
    want = {(r.grain_start, r.event_type): r.est for r in direct.collect()}
    assert got == want

    # (b) error band vs exact at every grain (lg_k=12 ⇒ ~1.6% rel. std err)
    for g, df in grains.items():
        exact = {
            (r.grain_start, r.event_type): r.n
            for r in ev.selectExpr(f"date_trunc('{g}', ts) AS grain_start", "event_type", "user_id")
            .groupBy("grain_start", "event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for k, est in {(r.grain_start, r.event_type): r.n_distinct_est for r in df.collect()}.items():
            assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), (g, k, est, exact[k])


def test_quantile_rollup_cascade_tracks_exact(spark, sf_dir):
    """KLL cascade: day/month quantiles merged from hourly sketches must
    track the exact percentiles within the k=200 rank-error band at every
    grain (rank error ~1.65% ⇒ compare against the exact values at
    quantile ± 0.05 rank slack)."""
    from weather_data_warehouse_aws_spark.operators.rollup_time import quantile_rollup
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    grains = quantile_rollup(
        ev, ts_col="ts", keys=["event_type"], value_col="value",
        quantiles=(0.5, 0.95),
    )
    def rank_bounds(vals, q, slack=0.06):
        # exact order statistics at rank q ± slack (KLL's guarantee is on
        # RANK error, and its inclusive-rank convention differs from
        # interpolating percentile() — so compare in rank space)
        n = len(vals)
        lo = vals[max(0, int((q - slack) * n) - 1)]
        hi = vals[min(n - 1, int((q + slack) * n))]
        return lo, hi

    for g, df in grains.items():
        rows = df.collect()
        assert rows
        exact = {
            (r.grain_start, r.event_type): r.vals
            for r in ev.selectExpr(
                f"date_trunc('{g}', ts) AS grain_start", "event_type",
                "CAST(value AS DOUBLE) AS v",
            )
            .groupBy("grain_start", "event_type")
            .agg(F.expr("sort_array(collect_list(v)) AS vals"))
            .collect()
        }
        for r in rows:
            vals = exact[(r.grain_start, r.event_type)]
            for q, got in ((0.5, r.p50), (0.95, r.p95)):
                lo, hi = rank_bounds(vals, q)
                assert lo <= got <= hi, (g, r.grain_start, r.event_type, q, got, lo, hi)


def test_quantile_rollup_exact_under_capacity(spark):
    """n ≤ k ⇒ the sketch retains every value and quantiles are exact
    order statistics, cascaded or not."""
    from weather_data_warehouse_aws_spark.operators.rollup_time import quantile_rollup

    rows = [
        (f"2024-01-01 {h:02d}:{m:02d}:00", float(h * 60 + m))
        for h in range(3)
        for m in range(0, 60, 5)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"]).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    out = quantile_rollup(
        df, ts_col="ts", keys=[], value_col="v", grains=("hour", "day"),
        quantiles=(0.5,),
    )
    vals = sorted(v for _, v in rows)
    day = out["day"].collect()
    assert len(day) == 1
    # KLL inclusive-rank median of an even n lands on one of the two
    # middle order statistics
    assert day[0].p50 in (vals[len(vals) // 2 - 1], vals[len(vals) // 2])


def test_retention_overlap_exact_small(spark):
    """Under the Theta nominal capacity every estimate is exact: planted
    weekly audiences with known retained/new/churned counts."""
    from weather_data_warehouse_aws_spark.operators.rollup_time import retention_overlap

    def week(day: str, users: range):
        return [(f"2024-01-{day} 12:00:00", u) for u in users]

    rows = week("01", range(0, 100)) + week("08", range(50, 130)) + week("15", range(120, 140))
    df = spark.createDataFrame(rows, ["ts", "user_id"]).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    out = {r.grain_start.day: r for r in retention_overlap(
        df, ts_col="ts", id_col="user_id", grain="week"
    ).collect()}
    assert len(out) == 3
    first, second, third = (out[k] for k in sorted(out))
    assert (first.n_cur, first.n_prev, first.n_retained) == (100, None, None)
    # first period: no prior audience, so every current user is NEW (a
    # naive theta_difference against the null lag would report null here)
    assert first.n_new == 100 and first.n_churned is None
    assert (second.n_prev, second.n_cur) == (100, 80)
    assert (second.n_retained, second.n_new, second.n_churned) == (50, 30, 50)
    assert (third.n_retained, third.n_new, third.n_churned) == (10, 10, 70)


def test_quantile_labels_preserve_tail_decimals(spark):
    """p99.5 and p99.9 must not both collapse to 'p100'."""
    import datetime as dt

    from weather_data_warehouse_aws_spark.operators.rollup_time import quantile_rollup

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h), float(h)) for h in range(10)],
        "ts timestamp, v double",
    )
    out = quantile_rollup(
        df, ts_col="ts", keys=[], value_col="v", grains=("day",),
        quantiles=(0.5, 0.995, 0.999),
    )["day"]
    assert {"p50", "p99_5", "p99_9"} <= set(out.columns)
