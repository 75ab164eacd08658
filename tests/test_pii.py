"""PII detection/redaction: Spark↔DuckDB span parity on adversarial
samples, plus redaction idempotence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.functions.text import (
    PII_PATTERNS,
    pii_count,
    pii_count_sql,
    redact_pii,
    redact_pii_sql,
)

SAMPLES = [
    "mail me at a.b+c%d@sub.example.co or x@y.io thanks",
    "call 555-014-2222 or 555 123 4567 now",
    "server at 10.0.42.7 and 255.255.255.0 up",
    "mixed: u1@ex.com 10.1.2.3 555-000-1111 u1@ex.com",
    "none here just words 1234 12.34",
    "edge: version 1.2.3 is not an ip, 1.2.3.4 is",
    "tight:10.0.0.1,punct. a@b.cc; done",
    "",
]


@pytest.fixture(scope="module")
def pii_df(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "id int, t string"
    )
    cols = [pii_count(F.col("t"), k).alias(f"n_{k}") for k in PII_PATTERNS]
    return (
        df.select("id", *cols, redact_pii(F.col("t")).alias("redacted"))
        .orderBy("id")
        .collect()
    )


def test_counts_and_redaction_match_duckdb(pii_df):
    con = duckdb.connect()
    for r in pii_df:
        lit = "'" + SAMPLES[r.id].replace("'", "''") + "'"
        counts = ", ".join(pii_count_sql(lit, k) for k in PII_PATTERNS)
        got = con.execute(f"SELECT {counts}, {redact_pii_sql(lit)}").fetchone()
        want = tuple(r[f"n_{k}"] for k in PII_PATTERNS) + (r.redacted,)
        assert got == want, (SAMPLES[r.id], got, want)


def test_expected_spans(pii_df):
    by_id = {r.id: r for r in pii_df}
    assert by_id[0].n_email == 2 and "<EMAIL>" in by_id[0].redacted
    assert by_id[1].n_phone == 2
    assert by_id[2].n_ipv4 == 2
    assert (by_id[3].n_email, by_id[3].n_ipv4, by_id[3].n_phone) == (2, 1, 1)
    assert (by_id[4].n_email, by_id[4].n_ipv4, by_id[4].n_phone) == (0, 0, 0)
    # dotted version strings: 3 octets no, 4 octets yes
    assert by_id[5].n_ipv4 == 1
    assert by_id[6].redacted == "tight:<IPV4>,punct. <EMAIL>; done"


def test_redaction_idempotent(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, t string")
    once = df.select("id", redact_pii(F.col("t")).alias("r"))
    twice = once.select("id", redact_pii(F.col("r")).alias("r"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
