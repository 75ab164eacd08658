"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values — so oracle
drift is caught in pytest before the driver's CORRECTNESS gate sees it.
"""

from __future__ import annotations

import math

import duckdb

from weather_data_warehouse_aws_spark.sources.tables import TABLES


def run_oracle_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def run_oracle(sql: str, sf_dir: str):
    return run_oracle_connection(sf_dir).execute(sql).df()


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"  # pandas renders SQL NULL as NaN for numerics
        if v == int(v):
            return str(int(v))  # 5.0 (float64) == 5 (int64) across engines
        # driver hashes exact values; we allow last-ulp float drift locally
        return f"{round(v, 9):.9f}"
    s = str(v)
    # pandas renders SQL DATE as midnight Timestamp; strip the zero time so
    # date columns compare equal across engines (arrow sees date32 on both)
    if s.endswith(" 00:00:00"):
        return s[: -len(" 00:00:00")]
    return s


def assert_query_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    actual = spark_df.toPandas()
    expected = run_oracle(oracle_sql, sf_dir)

    assert sorted(actual.columns) == sorted(
        expected.columns
    ), f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    assert len(actual) == len(expected), f"row count: spark={len(actual)} oracle={len(expected)}"

    cols = sorted(actual.columns)
    a_rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in actual[cols].itertuples(index=False, name=None)
    )
    e_rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in expected[cols].itertuples(index=False, name=None)
    )
    mismatches = [(i, a, e) for i, (a, e) in enumerate(zip(a_rows, e_rows)) if a != e]
    assert not mismatches, f"value mismatch (first 5 of {len(mismatches)}): {mismatches[:5]}"
