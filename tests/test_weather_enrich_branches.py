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


def test_pseudo_branch_groups_match_raw_user_grouping(rows, spark, sf_dir):
    """The top-20-by-token grouping must be exactly the top-20-by-raw-user
    grouping with user_id swapped for its token: same (n, checksum)
    multiset, all group keys 64-hex, no raw user_id leaking through."""
    import re

    from pyspark.sql import functions as F

    from weather_data_warehouse_aws_spark.sources.tables import load_table

    from weather_data_warehouse_aws_spark.operators.privacy import (
        pseudonym_token,
    )
    from weather_data_warehouse_aws_spark.queries.weather_enrich import (
        PSEUDO_SECRET,
    )

    got = {k[1]: v for k, v in rows.items() if k[0] == "pseudo"}
    assert len(got) == 20
    assert all(re.fullmatch(r"[0-9a-f]{64}", t) for t in got)
    ev = load_table(spark, sf_dir, "events")
    # aggregate by RAW user first, tokenize AFTER, apply the query's own
    # (n desc, token) order — grouping by token must be indistinguishable
    # from grouping by user then mapping user -> token (injectivity in
    # practice; an n-tie at the cut is broken by token on both paths)
    raw = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("checksum"))
        .select(
            pseudonym_token(
                F.col("user_id"), secret=PSEUDO_SECRET, domain="user_id"
            ).alias("token"),
            "n",
            "checksum",
        )
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
        .collect()
    )
    assert {r.token: (r.n, r.checksum) for r in raw} == got
