"""Behavioral analytics: ordered funnels and cohort retention — the two
query shapes every event warehouse grows next to its rollups (product
analytics siblings of the gaps-and-islands sessionization in
queries/temporal.py).

Scale shapes:
* funnel — one filtered aggregate per step, each keyed on user_id, chained
  by user-keyed joins with a strict ts ordering predicate. All shuffles on
  the same high-cardinality key (co-partitioned chain, AQE-friendly);
  step relations shrink monotonically, so later joins broadcast.
* cohort retention — one aggregate for first-activity (cohort), one
  distinct pass over (user, activity-week), one join on user_id, one final
  group. Nothing holds more than (users × active weeks) rows — already
  the product analytics industry's standard materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step i+1 only with an event
    of that type STRICTLY AFTER their step-i time (first-touch semantics:
    each step's time is the user's earliest qualifying event). Returns one
    row per step: (step_index, step, n_users, pct_of_first) with
    pct floor-quantized to 4dp for engine-stable comparison."""
    reached: list[DataFrame] = []
    prev = None
    for step in steps:
        evs = events.filter(F.col(type_col) == step)
        if prev is not None:
            evs = evs.join(prev, user_col).filter(F.col(ts_col) > F.col("__t"))
        cur = evs.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        reached.append(cur)
        prev = cur
    counts = None
    for i, (step, df) in enumerate(zip(steps, reached)):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("step_index"), F.lit(step).alias("step"), "n_users"
        )
        counts = row if counts is None else counts.unionByName(row)
    base = counts.filter(F.col("step_index") == 1).select(
        F.col("n_users").alias("__base")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "step_index",
        "step",
        "n_users",
        (F.floor(F.col("n_users") / F.col("__base") * 10000) / 10000).alias(
            "pct_of_first"
        ),
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Classic retention triangle: cohort = the `grain` period of a user's
    FIRST event; a user is retained at offset k if active in cohort+k.
    Returns (cohort_start, offset, n_active, cohort_size, retention) with
    retention floor-quantized to 4dp. offset 0 is the cohort size by
    construction (every user is active in their first period).

    `grain` ∈ {'day', 'week', 'month'} — anything else raises (date_trunc
    would happily accept e.g. 'quarter' while the day-based offset silently
    produced day counts instead of period offsets). Month offsets use
    calendar month arithmetic, not day division."""
    if grain not in ("day", "week", "month"):
        raise ValueError(
            f"cohort_retention: unsupported grain {grain!r} "
            "(use 'day', 'week', or 'month')"
        )
    firsts = events.groupBy(user_col).agg(
        F.date_trunc(grain, F.min(ts_col)).alias("cohort_start")
    )
    active = events.select(
        user_col, F.date_trunc(grain, F.col(ts_col)).alias("__p")
    ).distinct()
    if grain == "month":
        # both sides are month-truncated, so the calendar month delta is an
        # exact integer — no day counting across unequal month lengths
        offset = (
            (F.year("__p") - F.year("cohort_start")) * 12
            + (F.month("__p") - F.month("cohort_start"))
        ).cast("int")
    else:
        offset = (
            F.datediff(F.col("__p"), F.col("cohort_start"))
            / (7 if grain == "week" else 1)
        ).cast("int")
    per = (
        active.join(firsts, user_col)
        .select("cohort_start", offset.alias("offset"))
        .groupBy("cohort_start", "offset")
        .agg(F.count("*").alias("n_active"))
    )
    size = per.filter(F.col("offset") == 0).select(
        "cohort_start", F.col("n_active").alias("cohort_size")
    )
    return per.join(F.broadcast(size), "cohort_start").select(
        "cohort_start",
        "offset",
        "n_active",
        "cohort_size",
        (F.floor(F.col("n_active") / F.col("cohort_size") * 10000) / 10000).alias(
            "retention"
        ),
    )
