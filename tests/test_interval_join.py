"""Interval-join boundary + equivalence tests (generalized J4 — the
asymmetric point-in-range form; operator in operators/interval_join.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.interval_join import (
    interval_join,
    interval_overlap_join,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _sec(s: float) -> dt.datetime:
    return BASE + dt.timedelta(seconds=s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, _sec(-1), "before"),
            (1, _sec(0), "at_start"),
            (1, _sec(500), "inside"),
            (1, _sec(3599), "last_in"),
            (1, _sec(3600), "at_end"),
            (1, _sec(4000), "after"),
            (2, _sec(500), "wrong_key"),
        ],
        "k bigint, pts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, _sec(0), _sec(3600), "iv1")],
        "k bigint, ivs timestamp, ive timestamp, iv string",
    )
    return points, intervals


def test_half_open_boundaries(spark):
    """start inclusive, end exclusive, equi-key respected — at every
    bucket width, including widths that split the interval."""
    points, intervals = _frames(spark)
    for b in (100, 3600, 7200, 86400):
        out = interval_join(
            points, intervals, on=["k"], point_ts="pts",
            start_ts="ivs", end_ts="ive", bucket_sec=b,
        )
        tags = sorted(r.tag for r in out.collect())
        assert tags == ["at_start", "inside", "last_in"], f"bucket_sec={b}"


def test_no_dup_when_interval_spans_buckets(spark):
    """An interval covering many buckets must still match each point exactly
    once (the pair meets only at the point's own bucket)."""
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, on=["k"], point_ts="pts",
        start_ts="ivs", end_ts="ive", bucket_sec=10,
    )
    rows = out.collect()
    assert len(rows) == len({r.tag for r in rows}) == 3


def test_left_outer_preserves_points(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, on=["k"], point_ts="pts",
        start_ts="ivs", end_ts="ive", bucket_sec=3600, how="left",
    )
    rows = {r.tag: r.iv for r in out.collect()}
    assert len(rows) == 7  # every point survives exactly once
    assert {t for t, iv in rows.items() if iv is not None} == {
        "at_start", "inside", "last_in",
    }


def test_overlapping_intervals_many_to_many(spark):
    """A point inside two overlapping intervals matches both."""
    points = spark.createDataFrame(
        [(1, _sec(100), "p")], "k bigint, pts timestamp, tag string"
    )
    intervals = spark.createDataFrame(
        [(1, _sec(0), _sec(3600), "a"), (1, _sec(50), _sec(200), "b")],
        "k bigint, ivs timestamp, ive timestamp, iv string",
    )
    out = interval_join(
        points, intervals, on=["k"], point_ts="pts",
        start_ts="ivs", end_ts="ive", bucket_sec=60,
    )
    assert sorted(r.iv for r in out.collect()) == ["a", "b"]


def test_bucketed_equals_naive(spark, sf_dir):
    """Rewrite ≡ literal inequality join on real event data."""
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    fast = interval_join(
        clicks, windows, on=["user_id"], point_ts="click_ts",
        start_ts="win_start", end_ts="win_end", bucket_sec=1800,
    ).select("purchase_id", "click_id")
    naive = clicks.alias("c").join(
        windows.alias("w"),
        (F.col("c.user_id") == F.col("w.user_id"))
        & (F.col("c.click_ts") >= F.col("w.win_start"))
        & (F.col("c.click_ts") < F.col("w.win_end")),
    ).select("purchase_id", "click_id")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_right_outer_preserves_intervals(spark):
    """how='right': windows that contain no point survive exactly once,
    point columns null — including an interval spanning many buckets
    (explosion must not duplicate the null-extension)."""
    import datetime as dt

    BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
    points = spark.createDataFrame(
        [(1, BASE + dt.timedelta(seconds=30), 100)], "k bigint, pts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [
            (1, BASE, BASE + dt.timedelta(seconds=60), "hit"),
            (1, BASE + dt.timedelta(seconds=300), BASE + dt.timedelta(seconds=3600), "miss_long"),
            (2, BASE, BASE + dt.timedelta(seconds=60), "offkey"),
        ],
        "k bigint, ivs timestamp, ive timestamp, iv string",
    )
    out = interval_join(
        points, intervals, on=["k"], point_ts="pts",
        start_ts="ivs", end_ts="ive", bucket_sec=60, how="right",
    ).collect()
    by_iv = {}
    for r in out:
        by_iv.setdefault(r.iv, []).append(r)
    assert {t: len(v) for t, v in by_iv.items()} == {
        "hit": 1, "miss_long": 1, "offkey": 1,
    }
    assert by_iv["hit"][0].pid == 100
    assert by_iv["miss_long"][0].pid is None
    assert by_iv["offkey"][0].pid is None


def test_full_outer_interval(spark):
    """how='full': uncovered points AND empty windows each null-extend once;
    matched pairs once."""
    import datetime as dt

    BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
    points = spark.createDataFrame(
        [
            (1, BASE + dt.timedelta(seconds=30), 100),
            (1, BASE + dt.timedelta(seconds=7200), 101),  # covered by nothing
        ],
        "k bigint, pts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [
            (1, BASE, BASE + dt.timedelta(seconds=60), "hit"),
            (1, BASE + dt.timedelta(seconds=300), BASE + dt.timedelta(seconds=600), "miss"),
        ],
        "k bigint, ivs timestamp, ive timestamp, iv string",
    )
    out = interval_join(
        points, intervals, on=["k"], point_ts="pts",
        start_ts="ivs", end_ts="ive", bucket_sec=60, how="full",
    ).collect()
    assert len(out) == 3
    assert {(r.pid, r.iv) for r in out} == {(100, "hit"), (101, None), (None, "miss")}


def test_right_full_equal_naive(spark, sf_smoke_dir):
    """Rewrite ≡ literal inequality outer joins on real event data."""
    from pyspark.sql import functions as F

    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("w_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    naive_cond = (
        (F.col("user_id") == F.col("w_user"))
        & (F.col("click_ts") >= F.col("win_start"))
        & (F.col("click_ts") < F.col("win_end"))
    )
    for how in ("right", "full"):
        fast = interval_join(
            clicks, windows.withColumnRenamed("w_user", "user_id"),
            on=["user_id"], point_ts="click_ts",
            start_ts="win_start", end_ts="win_end", bucket_sec=1800, how=how,
        ).select("purchase_id", "click_id")
        naive = clicks.join(windows, naive_cond, how).select("purchase_id", "click_id")
        from collections import Counter

        assert Counter(map(tuple, fast.collect())) == Counter(
            map(tuple, naive.collect())
        ), how


# ---------------------------------------------------------------------------
# interval_overlap_join — range-meets-range general form
# ---------------------------------------------------------------------------
def _ov_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _sec(0), _sec(100), "La"),       # overlaps Ra, touches Rb
            (1, _sec(100), _sec(200), "Lb"),     # overlaps Rb only
            (1, _sec(500), _sec(10000), "Lc"),   # long: spans many buckets, overlaps Rc
            (1, _sec(20000), _sec(20010), "Ld"), # tiny, strictly inside Rc
            (2, _sec(0), _sec(100), "Le"),       # wrong key for Ra
        ],
        "k bigint, ls timestamp, le timestamp, lid string",
    )
    right = spark.createDataFrame(
        [
            (1, _sec(50), _sec(100), "Ra"),
            (1, _sec(100), _sec(150), "Rb"),      # touches La at 100 -> NOT overlap
            (1, _sec(9000), _sec(30000), "Rc"),   # long; overlaps Lc AND Ld
            (1, _sec(40000), _sec(40100), "Rd"),  # overlaps nothing
        ],
        "k bigint, rs timestamp, re timestamp, rid string",
    )
    return left, right


def test_overlap_semantics_and_claim_no_dup(spark):
    """Half-open overlap (endpoint touch excluded), each pair exactly once
    even when both intervals span many shared buckets, at several widths."""
    left, right = _ov_frames(spark)
    for b in (10, 60, 3600, 86400):
        out = interval_overlap_join(
            left, right, on=["k"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_sec=b,
        ).collect()
        pairs = sorted((r.lid, r.rid) for r in out)
        assert pairs == [
            ("La", "Ra"), ("Lb", "Rb"), ("Lc", "Rc"), ("Ld", "Rc"),
        ], f"bucket_sec={b}"


def test_overlap_outer_variants(spark):
    left, right = _ov_frames(spark)
    out = interval_overlap_join(
        left, right, on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_sec=60, how="full",
    ).collect()
    pairs = {(r.lid, r.rid) for r in out}
    # 4 matches + unmatched Le (left-preserved) + unmatched Rd (right-preserved)
    assert pairs == {
        ("La", "Ra"), ("Lb", "Rb"), ("Lc", "Rc"), ("Ld", "Rc"),
        ("Le", None), (None, "Rd"),
    }
    assert len(out) == 6
    left_only = interval_overlap_join(
        left, right, on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_sec=60, how="left",
    ).collect()
    assert {(r.lid, r.rid) for r in left_only} == pairs - {(None, "Rd")}
    right_only = interval_overlap_join(
        left, right, on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_sec=60, how="right",
    ).collect()
    assert {(r.lid, r.rid) for r in right_only} == pairs - {("Le", None)}


def test_overlap_equals_naive(spark, sf_smoke_dir):
    """Claim-bucket rewrite ≡ literal overlap inequality join on real
    events, all four join types."""
    from collections import Counter

    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    browsing = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("br_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("br_end"),
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("w_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    naive_cond = (
        (F.col("user_id") == F.col("w_user"))
        & (F.col("br_start") < F.col("win_end"))
        & (F.col("win_start") < F.col("br_end"))
    )
    for how in ("inner", "left", "right", "full"):
        fast = interval_overlap_join(
            browsing, windows.withColumnRenamed("w_user", "user_id"),
            on=["user_id"], left_start="br_start", left_end="br_end",
            right_start="win_start", right_end="win_end",
            bucket_sec=1800, how=how,
        ).select("purchase_id", "click_id")
        naive = browsing.join(windows, naive_cond, how).select(
            "purchase_id", "click_id"
        )
        assert Counter(map(tuple, fast.collect())) == Counter(
            map(tuple, naive.collect())
        ), how
