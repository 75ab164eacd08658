"""Full weather-pipeline differential against DuckDB.

The strongest parity check available: run the ENTIRE pipeline (synthetic
bronze → silver parquet → gold dims → fact views), hand the materialized
silver/gold parquet to DuckDB, execute the reference's Athena SQL there
(Presto dialect mapped: TO_UNIXTIME→epoch, DATE()→CAST AS DATE), and demand
the same analytics results Spark produces. Two independent engines, the
reference's own query text, real pipeline output files.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from weather_data_warehouse_aws_spark.pipeline import analytics
from weather_data_warehouse_aws_spark.pipeline.generate import generate_bronze
from weather_data_warehouse_aws_spark.pipeline.run import run_pipeline

EFFECTIVE = dt.date(2024, 1, 4)
NOW = dt.datetime(2024, 1, 4, 7, 0, 0)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    bronze = str(tmp_path_factory.mktemp("bronze_ddb"))
    generate_bronze(bronze, days=4, extractions_per_day=2, seed=21)
    wh = str(tmp_path_factory.mktemp("wh_ddb"))
    layers = run_pipeline(spark, bronze, wh, effective_date=EFFECTIVE, now=NOW)
    # a SECOND run creates real log history (dead silver/gold files on
    # disk) — the external reader below must still see one generation
    layers = run_pipeline(spark, bronze, wh, effective_date=EFFECTIVE, now=NOW)
    return wh, layers


@pytest.fixture(scope="module")
def ddb(warehouse):
    """DuckDB reads the warehouse THE EXTERNAL-ENGINE WAY: through each
    tx table's exported manifest (tx_write_manifest), never a directory
    glob — the fixture's double pipeline run leaves dead files a glob
    would read as duplicates."""
    from weather_data_warehouse_aws_spark.operators.txlog import (
        tx_write_manifest,
    )

    wh, _ = warehouse
    con = duckdb.connect()
    for name, rel in [
        ("current_weather", "silver/current_weather"),
        ("forecast_weather", "silver/forecast_weather"),
        ("dim_location", "gold/dim_location"),
        ("dim_date", "gold/dim_date"),
    ]:
        path = os.path.join(wh, rel)
        manifest = tx_write_manifest(path)
        files = [ln.strip() for ln in open(manifest) if ln.strip()]
        quoted = ", ".join(f"'{f}'" for f in files)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet("
            f"[{quoted}], hive_partitioning=1)"
        )
    # the reference's fact views (create_views.sql), Presto→DuckDB dialect:
    # TO_UNIXTIME(x) → epoch(x); ROW_NUMBER keys and audit timestamps are
    # not part of the analytics outputs compared below
    con.execute(
        """
CREATE VIEW fact_weather_actual AS
SELECT dl.location_key, dd.date_key, cw.*
FROM current_weather cw
JOIN dim_location dl
  ON cw.location_name = dl.location_name
 AND cw.country_code = dl.country_code AND dl.is_current = true
JOIN dim_date dd ON CAST(cw.observation_date AS DATE) = dd.full_date
"""
    )
    con.execute(
        """
CREATE VIEW fact_weather_forecast AS
SELECT dl.location_key,
       dd_created.date_key AS forecast_created_date_key,
       dd_forecast.date_key AS forecast_for_date_key,
       fw.*
FROM forecast_weather fw
JOIN dim_location dl
  ON fw.location_name = dl.location_name
 AND fw.country_code = dl.country_code AND dl.is_current = true
JOIN dim_date dd_created
  ON CAST(fw.forecast_created_date AS DATE) = dd_created.full_date
JOIN dim_date dd_forecast
  ON CAST(fw.forecast_for_date AS DATE) = dd_forecast.full_date
"""
    )
    con.execute(
        """
CREATE VIEW fact_forecast_accuracy AS
SELECT
    f.location_key,
    f.forecast_horizon_hours,
    f.temperature_celsius_forecast,
    a.temperature_celsius AS temperature_celsius_actual,
    ABS(f.temperature_celsius_forecast - a.temperature_celsius) AS temp_absolute_error,
    f.weather_condition_forecast,
    a.weather_condition AS weather_condition_actual,
    CASE
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 1 THEN 'Excellent'
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3 THEN 'Good'
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 5 THEN 'Fair'
        ELSE 'Poor'
    END AS temp_accuracy_category,
    CASE
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3
             AND f.weather_condition_forecast = a.weather_condition
        THEN true ELSE false
    END AS is_accurate_forecast
FROM fact_weather_forecast f
JOIN fact_weather_actual a
  ON f.location_key = a.location_key
 AND ABS(CAST(FLOOR(epoch(f.forecast_for_time)) AS BIGINT) -
         CAST(FLOOR(epoch(a.observation_time)) AS BIGINT)) < 3600
"""
    )
    yield con
    con.close()


def _spark_rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def _duck_rows(con, sql, n_cols):
    return sorted(tuple(row) for row in con.execute(sql).fetchall())


def _assert_rows_close(a_rows, b_rows, *, tol=0.011):
    """Exact on strings/ints; |Δ| ≤ tol on floats. The analytics keep the
    reference's ROUND(avg, 2), which can land exactly on a .005 boundary
    where two engines' (or two runs') summation orders legally disagree by
    one cent — semantics identical, last-place rounding free."""
    assert len(a_rows) == len(b_rows)
    for a, b in zip(a_rows, b_rows):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                assert abs(float(x) - float(y)) <= tol, (a, b)
            else:
                assert str(x) == str(y), (a, b)


def test_fact_grains_match(warehouse, ddb):
    _, layers = warehouse
    for view, key in [
        ("fact_weather_actual", "fact_weather_actual"),
        ("fact_weather_forecast", "fact_weather_forecast"),
        ("fact_forecast_accuracy", "fact_forecast_accuracy"),
    ]:
        n_duck = ddb.execute(f"SELECT COUNT(*) FROM {view}").fetchone()[0]
        assert n_duck == layers[key].count(), view


def test_accuracy_by_horizon_matches(warehouse, ddb):
    _, layers = warehouse
    spark_res = analytics.accuracy_by_horizon(layers["fact_forecast_accuracy"])
    duck = _duck_rows(
        ddb,
        """
SELECT CASE
        WHEN forecast_horizon_hours <= 24 THEN '0-24 hours'
        WHEN forecast_horizon_hours <= 48 THEN '24-48 hours'
        WHEN forecast_horizon_hours <= 72 THEN '48-72 hours'
        ELSE '72+ hours' END AS horizon_bucket,
       COUNT(*) AS total_forecasts,
       ROUND(AVG(temp_absolute_error), 2) AS avg_error_celsius,
       ROUND(AVG(CAST(is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
FROM fact_forecast_accuracy GROUP BY 1 ORDER BY 1
""",
        4,
    )
    cols = ["horizon_bucket", "total_forecasts", "avg_error_celsius", "accuracy_pct"]
    _assert_rows_close(_spark_rows(spark_res, cols), duck)


def test_city_ranking_matches(warehouse, ddb):
    _, layers = warehouse
    spark_res = analytics.city_performance_ranking(
        layers["fact_forecast_accuracy"], layers["dim_location"]
    )
    duck = _duck_rows(
        ddb,
        """
SELECT dl.location_name, dl.country_code,
       COUNT(*) AS total_forecasts,
       ROUND(AVG(fa.temp_absolute_error), 2) AS avg_error,
       ROUND(AVG(CAST(fa.is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
FROM fact_forecast_accuracy fa
JOIN dim_location dl ON fa.location_key = dl.location_key
WHERE dl.is_current = true
GROUP BY dl.location_name, dl.country_code
""",
        5,
    )
    cols = ["location_name", "country_code", "total_forecasts", "avg_error", "accuracy_pct"]
    _assert_rows_close(_spark_rows(spark_res, cols), duck)


def test_quality_distribution_matches(warehouse, ddb):
    _, layers = warehouse
    spark_res = analytics.quality_distribution(layers["fact_forecast_accuracy"])
    duck = _duck_rows(
        ddb,
        """
SELECT temp_accuracy_category, COUNT(*) AS forecast_count,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS percentage
FROM fact_forecast_accuracy GROUP BY temp_accuracy_category
""",
        3,
    )
    cols = ["temp_accuracy_category", "forecast_count", "percentage"]
    _assert_rows_close(_spark_rows(spark_res, cols), duck)


def test_scd2_dim_readable_by_duckdb(ddb):
    rows = ddb.execute(
        "SELECT COUNT(*), COUNT(DISTINCT location_key), "
        "SUM(CASE WHEN is_current THEN 1 ELSE 0 END) FROM dim_location"
    ).fetchone()
    assert rows == (8, 8, 8)
    hi = ddb.execute(
        "SELECT COUNT(*) FROM dim_location WHERE effective_to_date = DATE '9999-12-31'"
    ).fetchone()[0]
    assert hi == 8
