"""Late-arriving dimension handling: inferred members + correction merge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.scd2 import (
    inferred_members,
    scd2_initial_load,
    scd2_merge,
)


def _dim(spark):
    updates = spark.createDataFrame(
        [("paris", "FR", 48.85), ("tokyo", "JP", 35.68)],
        ["city", "country", "lat"],
    )
    return scd2_initial_load(
        updates, ["city"], "city_key",
        effective_date=dt.date(2024, 1, 1), now=dt.datetime(2024, 1, 1),
        key_strategy="hash",
    ).withColumn("is_inferred", F.lit(False))


def test_inferred_member_created_for_unknown_fact_key(spark):
    dim = _dim(spark)
    facts = spark.createDataFrame(
        [("paris", 1.0), ("lagos", 2.0), ("lagos", 3.0)], ["city", "v"]
    )
    out = inferred_members(
        facts, dim, ["city"], "city_key",
        effective_date=dt.date(2024, 1, 5), now=dt.datetime(2024, 1, 5),
    ).cache()
    assert out.count() == 3  # two real + one placeholder
    lagos = out.filter(F.col("city") == "lagos").collect()[0]
    assert lagos.is_inferred and lagos.is_current and lagos.version == 1
    assert lagos.country is None and lagos.lat is None
    # every fact row now joins a current dim row
    joined = facts.join(
        out.filter(F.col("is_current")).select("city", "city_key"), "city", "left"
    )
    assert joined.filter(F.col("city_key").isNull()).count() == 0
    # idempotent: running again adds nothing
    again = inferred_members(
        facts, out, ["city"], "city_key",
        effective_date=dt.date(2024, 1, 6), now=dt.datetime(2024, 1, 6),
    )
    assert again.count() == 3
    out.unpersist()


def test_real_snapshot_corrects_inferred_member_with_history(spark):
    """The next attribute snapshot flows through the ORDINARY scd2_merge:
    the placeholder expires, version 2 carries real attributes, and the
    inferred flag survives as history."""
    dim = _dim(spark)
    facts = spark.createDataFrame([("lagos", 2.0)], ["city", "v"])
    with_ph = inferred_members(
        facts, dim, ["city"], "city_key",
        effective_date=dt.date(2024, 1, 5), now=dt.datetime(2024, 1, 5),
    )
    snapshot = spark.createDataFrame(
        [
            ("paris", "FR", 48.85, False),
            ("tokyo", "JP", 35.68, False),
            ("lagos", "NG", 6.52, False),
        ],
        ["city", "country", "lat", "is_inferred"],
    )
    merged = scd2_merge(
        with_ph, snapshot, ["city"], ["country", "lat"], "city_key",
        effective_date=dt.date(2024, 2, 1), now=dt.datetime(2024, 2, 1),
        key_strategy="hash",
    ).cache()
    lagos = {r.version: r for r in merged.filter(F.col("city") == "lagos").collect()}
    assert set(lagos) == {1, 2}
    assert lagos[1].is_inferred and not lagos[1].is_current
    assert str(lagos[1].effective_to_date) == "2024-02-01"
    assert not lagos[2].is_inferred and lagos[2].is_current
    assert lagos[2].country == "NG" and abs(lagos[2].lat - 6.52) < 1e-9
    # untouched real members stay single-version current
    assert merged.filter(F.col("city") == "paris").count() == 1
    merged.unpersist()


def test_dim_as_of_time_travel(spark):
    """After a merge creates v1(expired)+v2(current), as-of queries return
    exactly one row per key with the attributes that were true on that
    date; boundary day belongs to the NEW version (half-open)."""
    import datetime as dt2

    from weather_data_warehouse_aws_spark.operators.scd2 import dim_as_of

    dim = _dim(spark)
    snapshot = spark.createDataFrame(
        [("paris", "FR", 48.86, False), ("tokyo", "JP", 35.68, False)],
        ["city", "country", "lat", "is_inferred"],
    )
    merged = scd2_merge(
        dim, snapshot, ["city"], ["country", "lat"], "city_key",
        effective_date=dt2.date(2024, 2, 1), now=dt2.datetime(2024, 2, 1),
        key_strategy="hash",
    )
    before = {r.city: r.lat for r in dim_as_of(merged, dt2.date(2024, 1, 15)).collect()}
    after = {r.city: r.lat for r in dim_as_of(merged, dt2.date(2024, 2, 1)).collect()}
    assert abs(before["paris"] - 48.85) < 1e-9   # old attribute mid-January
    assert abs(after["paris"] - 48.86) < 1e-9    # boundary day -> new version
    assert len(before) == 2 and len(after) == 2  # exactly one row per key
    # every as-of snapshot is unique per key across the whole history range
    for day in (dt2.date(2024, 1, 1), dt2.date(2024, 3, 1)):
        per_key = dim_as_of(merged, day).groupBy("city").count().collect()
        assert all(r["count"] == 1 for r in per_key)


def test_inferred_members_null_keys_never_inserted(spark):
    """NULL natural keys have no identity: no placeholder, and repeated
    runs stay idempotent (anti-join NULL=NULL would re-insert forever)."""
    from weather_data_warehouse_aws_spark.operators.scd2 import inferred_members

    dim = spark.createDataFrame(
        [(1, "K1", "attr", __import__("datetime").date(2024, 1, 1),
          __import__("datetime").date(9999, 12, 31), True, 1,
          __import__("datetime").datetime(2024, 1, 1),
          __import__("datetime").datetime(2024, 1, 1))],
        "location_key bigint, station string, name string, "
        "effective_from_date date, effective_to_date date, is_current boolean, "
        "version int, created_timestamp timestamp, updated_timestamp timestamp",
    )
    facts = spark.createDataFrame(
        [("K1",), ("K2",), (None,)], "station string"
    )
    once = inferred_members(facts, dim, ["station"])
    assert once.filter(F.col("station").isNull()).count() == 0
    assert once.filter(F.col("station") == "K2").count() == 1
    twice = inferred_members(facts, once, ["station"])
    assert twice.count() == once.count()  # idempotent re-run


def test_scd2_merge_rejects_duplicate_snapshot_keys(spark):
    import datetime as dt

    import pytest

    from weather_data_warehouse_aws_spark.operators.scd2 import (
        scd2_initial_load,
        scd2_merge,
    )

    v1 = spark.createDataFrame([("K1", "a")], "station string, name string")
    existing = scd2_initial_load(
        v1, ["station"], "location_key",
        effective_date=dt.date(2024, 1, 1), now=dt.datetime(2024, 1, 1),
        key_strategy="dense",
    )
    dup = spark.createDataFrame(
        [("K1", "b"), ("K1", "c")], "station string, name string"
    )
    with pytest.raises(Exception, match="duplicate"):
        scd2_merge(
            existing, dup, ["station"], ["name"], "location_key",
            effective_date=dt.date(2024, 2, 1), now=dt.datetime(2024, 2, 1),
            key_strategy="hash",
        ).collect()
