"""Units for the consolidated weather_enrich branches (P6/P7/F2/X4).

The registry differential (test_registry_oracle) proves cross-engine hash
equality; these pin the SEMANTICS the branches exist to witness — e.g. that
the fixture actually plants observations exactly ON sunrise/sunset, so the
inclusive-both-ends BETWEEN (`bronze_to_silver.py:94-100`) is genuinely
exercised rather than vacuously green.
"""

from __future__ import annotations

import pytest

from weather_data_warehouse_aws_spark.queries.weather_enrich import q_weather_enrich


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    out = q_weather_enrich(spark, sf_dir).collect()
    return {(r["variant"], r["group_key"]): (r["n"], r["checksum"]) for r in out}


def test_boundary_hits_exist_and_are_daytime(rows):
    # slots 6 and 18 of a 0..24 hour sweep land exactly on sunrise/sunset;
    # inclusive BETWEEN must classify both as daytime=true
    assert ("daytime_boundary", "at_sunrise/true") in rows
    assert ("daytime_boundary", "at_sunset/true") in rows
    # and the exclusive sides must never be daytime
    assert not any(
        k[1].startswith(("before/true", "after/true"))
        for k in rows
        if k[0] == "daytime_boundary"
    )


def test_boundary_partition_is_exhaustive(rows):
    n_events = sum(n for (v, _), (n, _) in rows.items() if v == "daytime_boundary")
    n_enrich = sum(n for (v, _), (n, _) in rows.items() if v == "enrich")
    assert n_events == n_enrich  # same relation, both partitions total


def test_current_filter_is_latest_per_user(rows, spark, sf_dir):
    from pyspark.sql import functions as F

    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_current = sum(n for (v, _), (n, _) in rows.items() if v == "current_filter")
    # ties on max(ts) within a user can only add rows, never drop below 1/user
    assert n_current >= n_users


def test_epoch_roundtrip_all_exact(rows):
    keys = [k for k in rows if k[0] == "epoch_seconds"]
    assert keys == [("epoch_seconds", "roundtrip=true")]


def test_optional_default_covers_every_row(rows):
    n_events = sum(n for (v, _), (n, _) in rows.items() if v == "enrich")
    assert rows[("optional_default", "gust_default")][0] == n_events
