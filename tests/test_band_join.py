"""Band-join boundary + equivalence tests (FIXTURES.md F8, SURVEY §2.3 J4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.band_join import band_join

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, BASE, "dt0"),
            (1, BASE + dt.timedelta(seconds=3599), "dt3599"),
            (1, BASE + dt.timedelta(seconds=3600), "dt3600"),
            (1, BASE + dt.timedelta(seconds=3601), "dt3601"),
            (1, BASE - dt.timedelta(seconds=3599), "dt-3599"),
            (1, BASE - dt.timedelta(seconds=3600), "dt-3600"),
            (2, BASE, "otherkey"),
        ],
        "k bigint, lts timestamp, tag string",
    )
    right = spark.createDataFrame([(1, BASE)], "k bigint, rts timestamp")
    return left, right


def test_strict_inequality_boundary(spark):
    """|Δt| < 3600 strictly — 3599 matches, 3600/3601 don't
    (reference create_views.sql:112-115)."""
    left, right = _frames(spark)
    out = band_join(left, right, on=["k"], left_ts="lts", right_ts="rts", tolerance_sec=3600)
    tags = sorted(r.tag for r in out.collect())
    assert tags == ["dt-3599", "dt0", "dt3599", "otherkey"] or tags == [
        "dt-3599", "dt0", "dt3599",
    ]
    # key 2 must only match when the right side has key 2 — it doesn't here
    assert "otherkey" not in tags


def test_left_band_join_boundary_and_unmatched(spark):
    """how='left': 3599 matches, 3600/3601 keep the row with null right;
    exactly one null-extended row per unmatched left (no bucket-explosion
    duplicates); off-key left rows survive too."""
    left, right = _frames(spark)
    out = band_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        tolerance_sec=3600, how="left",
    )
    rows = out.collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r.tag, []).append(r)
    # every left row appears exactly once (single right row, many-to-one)
    assert {t: len(v) for t, v in by_tag.items()} == {
        "dt0": 1, "dt3599": 1, "dt3600": 1, "dt3601": 1,
        "dt-3599": 1, "dt-3600": 1, "otherkey": 1,
    }
    matched = {t for t, v in by_tag.items() if v[0].rts is not None}
    assert matched == {"dt0", "dt3599", "dt-3599"}  # strict |Δt| < 3600
    assert by_tag["dt3600"][0].rts is None and by_tag["otherkey"][0].rts is None


def test_left_band_join_equals_naive_left(spark, sf_smoke_dir):
    """Bucketed left rewrite ≡ naive left theta-join on real data."""
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("lts"), F.col("event_id").alias("l_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("rts"),
        F.col("event_id").alias("r_id"),
    )
    fast = band_join(
        views, purchases.withColumnRenamed("r_user", "user_id"),
        on=["user_id"], left_ts="lts", right_ts="rts",
        tolerance_sec=3600, how="left",
    )
    naive = views.join(
        purchases,
        (F.col("user_id") == F.col("r_user"))
        & (F.abs(F.unix_timestamp("lts") - F.unix_timestamp("rts")) < 3600),
        "left",
    )
    fast_pairs = sorted((r.l_id, r.r_id) for r in fast.select("l_id", "r_id").collect())
    naive_pairs = sorted((r.l_id, r.r_id) for r in naive.select("l_id", "r_id").collect())
    assert fast_pairs == naive_pairs
    assert any(b is None for _, b in fast_pairs)  # unmatched views exist
    assert any(b is not None for _, b in fast_pairs)


def test_many_to_many(spark):
    left = spark.createDataFrame(
        [(1, BASE), (1, BASE + dt.timedelta(seconds=10))], "k bigint, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, BASE + dt.timedelta(seconds=5)), (1, BASE + dt.timedelta(seconds=6))],
        "k bigint, rts timestamp",
    )
    out = band_join(left, right, on=["k"], left_ts="lts", right_ts="rts", tolerance_sec=60)
    assert out.count() == 4  # full many-to-many within the band


def test_bucketed_equals_naive(spark, sf_smoke_dir):
    """The bucketed rewrite must produce the identical pair set as the naive
    equi+theta condition on real data (events, sf0.001)."""
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("lts"), F.col("event_id").alias("l_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("r_id")
    )
    fast = band_join(
        views, purchases, on=["user_id"], left_ts="lts", right_ts="rts", tolerance_sec=3600
    )
    naive = views.join(purchases, "user_id").filter(
        F.abs(F.unix_timestamp("lts") - F.unix_timestamp("rts")) < 3600
    )
    fast_pairs = {(r.l_id, r.r_id) for r in fast.select("l_id", "r_id").collect()}
    naive_pairs = {(r.l_id, r.r_id) for r in naive.select("l_id", "r_id").collect()}
    assert fast_pairs == naive_pairs
    assert len(fast_pairs) > 0


def test_accuracy_category_boundaries(spark):
    """Categories flip at exactly 1/3/5 °C (create_views.sql:98-102) and
    is_accurate at ≤3 AND condition match (:103-108)."""
    from weather_data_warehouse_aws_spark.pipeline.views import fact_forecast_accuracy

    def mk_forecast(temp, cond, t):
        return (1, 20240101, 20240101, 3.0, temp, 50, 5.0, cond, BASE, t)

    cases = [0.9, 1.0, 1.1, 2.9, 3.0, 3.1, 4.9, 5.0, 5.1]
    f = spark.createDataFrame(
        [mk_forecast(20.0 + e, "Clear", BASE + dt.timedelta(seconds=i)) for i, e in enumerate(cases)]
        + [mk_forecast(20.0, "Rain", BASE + dt.timedelta(seconds=100))],
        "location_key bigint, forecast_created_date_key int, forecast_for_date_key int, "
        "forecast_horizon_hours double, temperature_celsius_forecast double, "
        "humidity_percent_forecast bigint, wind_speed_mps_forecast double, "
        "weather_condition_forecast string, forecast_created_time timestamp, "
        "forecast_for_time timestamp",
    )
    a = spark.createDataFrame(
        [(1, 20.0, 55, 4.0, "Clear", BASE)],
        "location_key bigint, temperature_celsius double, humidity_percent bigint, "
        "wind_speed_mps double, weather_condition string, observation_time timestamp",
    )
    acc = fact_forecast_accuracy(f, a)
    rows = {
        round(r.temp_absolute_error, 1): r
        for r in acc.filter(F.col("weather_condition_forecast") == "Clear").collect()
    }
    assert rows[0.9].temp_accuracy_category == "Excellent"
    assert rows[1.0].temp_accuracy_category == "Excellent"  # <= 1 inclusive
    assert rows[1.1].temp_accuracy_category == "Good"
    assert rows[3.0].temp_accuracy_category == "Good"
    assert rows[3.1].temp_accuracy_category == "Fair"
    assert rows[5.0].temp_accuracy_category == "Fair"
    assert rows[5.1].temp_accuracy_category == "Poor"
    assert rows[3.0].is_accurate_forecast and not rows[3.1].is_accurate_forecast
    # condition mismatch → not accurate even at zero error
    mismatch = acc.filter(F.col("weather_condition_forecast") == "Rain").collect()[0]
    assert mismatch.temp_absolute_error == 0.0 and not mismatch.is_accurate_forecast


def test_asof_tolerance_nulls_stale_matches(spark):
    """tolerance_sec: a predecessor older than the window keeps the row but
    nulls the match (left-join semantics preserved)."""
    from weather_data_warehouse_aws_spark.operators.asof_join import asof_join

    left = spark.createDataFrame(
        [(1, BASE + dt.timedelta(seconds=100), "fresh"),
         (1, BASE + dt.timedelta(seconds=5000), "stale")],
        "k bigint, lts timestamp, tag string",
    )
    right = spark.createDataFrame([(1, BASE, 99)], "k bigint, rts timestamp, rid bigint")
    out = {r.tag: r.rid for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", tolerance_sec=600
    ).collect()}
    assert out == {"fresh": 99, "stale": None}


def test_dense_key_guard(spark):
    from weather_data_warehouse_aws_spark.operators.keys import dense_key

    df = spark.range(100).withColumnRenamed("id", "k")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one task"):
        dense_key(df, "key", ["k"], max_rows=10)
    ok = dense_key(df, "key", ["k"], max_rows=1000)
    keys = sorted(r.key for r in ok.collect())
    assert keys == list(range(1, 101))


def test_scd2_hash_key_strategy(spark):
    import datetime as _dt

    from weather_data_warehouse_aws_spark.operators.scd2 import (
        scd2_initial_load,
        scd2_merge,
    )

    base = spark.createDataFrame([("a", "x"), ("b", "y")], "nk string, attr string")
    dim = scd2_initial_load(
        base, ["nk"], "key", key_strategy="hash",
        effective_date=_dt.date(2024, 1, 1), now=_dt.datetime(2024, 1, 1),
    )
    keys1 = {r.nk: r.key for r in dim.collect()}
    # deterministic across invocations
    keys2 = {
        r.nk: r.key
        for r in scd2_initial_load(
            base, ["nk"], "key", key_strategy="hash",
            effective_date=_dt.date(2024, 1, 1), now=_dt.datetime(2024, 1, 1),
        ).collect()
    }
    assert keys1 == keys2 and len(set(keys1.values())) == 2
    updates = spark.createDataFrame([("a", "x2"), ("b", "y")], "nk string, attr string")
    merged = scd2_merge(
        dim, updates, ["nk"], ["attr"], "key", key_strategy="hash",
        effective_date=_dt.date(2024, 2, 1), now=_dt.datetime(2024, 2, 1),
    )
    a_rows = {r.version: r.key for r in merged.filter("nk = 'a'").collect()}
    assert set(a_rows) == {1, 2} and a_rows[1] != a_rows[2]  # new version, new key


def test_right_band_join_boundary_and_unmatched(spark):
    """how='right': mirror of left — preserved right rows null-extend once;
    Δt=3599 matches, 3600 doesn't (strict). Here right has rows the left
    never reaches (key 3) plus the matched key-1 row."""
    left, right = _frames(spark)
    right2 = right.unionByName(
        spark.createDataFrame([(3, BASE)], "k bigint, rts timestamp")
    )
    out = band_join(
        left, right2, on=["k"], left_ts="lts", right_ts="rts",
        tolerance_sec=3600, how="right",
    )
    rows = out.collect()
    # key 3 preserved exactly once, null-extended on left columns
    k3 = [r for r in rows if r.k == 3]
    assert len(k3) == 1 and k3[0].tag is None and k3[0].lts is None
    # key 1: one row per left match, strict boundary
    k1_tags = sorted(r.tag for r in rows if r.k == 1)
    assert k1_tags == ["dt-3599", "dt0", "dt3599"]


def test_full_band_join_matrix(spark):
    """how='full': matched pairs once, unmatched LEFT rows once
    (right-null), unmatched RIGHT rows once (left-null)."""
    left, right = _frames(spark)
    right2 = right.unionByName(
        spark.createDataFrame([(3, BASE)], "k bigint, rts timestamp")
    )
    out = band_join(
        left, right2, on=["k"], left_ts="lts", right_ts="rts",
        tolerance_sec=3600, how="full",
    )
    rows = out.collect()
    matched = sorted(r.tag for r in rows if r.rts is not None and r.tag is not None)
    unmatched_left = sorted(r.tag for r in rows if r.rts is None)
    unmatched_right = [r for r in rows if r.tag is None]
    assert matched == ["dt-3599", "dt0", "dt3599"]
    assert unmatched_left == ["dt-3600", "dt3600", "dt3601", "otherkey"]
    assert len(unmatched_right) == 1 and unmatched_right[0].k == 3
    assert len(rows) == len(matched) + len(unmatched_left) + 1


def test_right_full_band_equal_naive(spark, sf_smoke_dir):
    """Bucketed right/full rewrites ≡ naive theta outer joins on real data."""
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("lts"), F.col("event_id").alias("l_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("rts"),
        F.col("event_id").alias("r_id"),
    )
    naive_cond = (F.col("user_id") == F.col("r_user")) & (
        F.abs(F.unix_timestamp("lts") - F.unix_timestamp("rts")) < 3600
    )
    for how in ("right", "full"):
        fast = band_join(
            views, purchases.withColumnRenamed("r_user", "user_id"),
            on=["user_id"], left_ts="lts", right_ts="rts",
            tolerance_sec=3600, how=how,
        )
        naive = views.join(purchases, naive_cond, how)
        from collections import Counter

        fast_pairs = Counter(
            (r.l_id, r.r_id) for r in fast.select("l_id", "r_id").collect()
        )
        naive_pairs = Counter(
            (r.l_id, r.r_id) for r in naive.select("l_id", "r_id").collect()
        )
        assert fast_pairs == naive_pairs, how
        assert any(a is None for a, _ in fast_pairs), how  # unmatched purchases
