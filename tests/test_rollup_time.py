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
