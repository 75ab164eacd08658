"""Behavioral analytics operators: ordered funnel + cohort retention."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t) for i, (d, h, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_strict_ordering(spark):
    """A user whose purchase precedes their click must NOT count as step 3;
    step counts are monotonically non-increasing."""
    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
        # user 2: purchase BEFORE click -> reaches step 2 only
        (2, 1, 2, "view"), (2, 2, 2, "purchase"), (2, 3, 2, "click"),
        # user 3: view only
        (3, 1, 3, "view"),
        # user 4: click with no view -> reaches nothing
        (4, 1, 4, "click"),
    ]
    got = {
        r.step: (r.n_users, r.pct_of_first)
        for r in funnel_steps(_ev(spark, rows), ("view", "click", "purchase")).collect()
    }
    assert got["view"] == (3, 1.0)
    assert got["click"][0] == 2
    assert got["purchase"][0] == 1
    ns = [got[s][0] for s in ("view", "click", "purchase")]
    assert ns == sorted(ns, reverse=True)


def test_funnel_same_timestamp_not_counted(spark):
    """Strictly-after semantics: a click at exactly the view's timestamp
    does not advance the funnel."""
    rows = [(1, 1, 1, "view"), (1, 1, 1, "click")]
    got = {r.step: r.n_users for r in funnel_steps(_ev(spark, rows), ("view", "click")).collect()}
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_triangle(spark):
    """offset 0 = cohort size and retention 1.0; a user active in a later
    week appears at the right offset; retention ≤ 1 everywhere."""
    rows = [
        (1, 1, 1, "view"),   # u1 cohort week of Jan 1
        (8, 1, 1, "view"),   # u1 active next week  -> offset 1
        (1, 2, 2, "view"),   # u2 same cohort, never returns
        (9, 1, 3, "view"),   # u3 cohort week of Jan 8
    ]
    got = {
        (r.cohort_start.date(), r.offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(_ev(spark, rows), grain="week").collect()
    }
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert got[(w1, 0)] == (2, 2, 1.0)
    assert got[(w1, 1)] == (1, 2, 0.5)
    assert got[(w2, 0)] == (1, 1, 1.0)
    assert all(r[2] <= 1.0 for r in got.values())


def test_cohort_retention_month_grain_and_grain_validation(spark):
    """Month grain must produce calendar-month offsets (Jan->Mar = 2 even
    across 28/31-day months), and unknown grains raise instead of silently
    producing day-count offsets."""
    import datetime as dt

    import pytest

    from weather_data_warehouse_aws_spark.operators.behavior import cohort_retention

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 15)),
            (1, dt.datetime(2024, 2, 1)),
            (1, dt.datetime(2024, 3, 28)),
            (2, dt.datetime(2024, 1, 2)),
        ],
        "user_id long, ts timestamp",
    )
    rows = {
        (r.cohort_start.month, r.offset): r.n_active
        for r in cohort_retention(ev, grain="month").collect()
    }
    assert rows == {(1, 0): 2, (1, 1): 1, (1, 2): 1}

    with pytest.raises(ValueError, match="grain"):
        cohort_retention(ev, grain="quarter")
