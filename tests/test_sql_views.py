"""SQL-surface parity: the reference's literal SQL (Spark dialect) must
produce the same analytics results as the DataFrame builders — view text and
DataFrame plans are two spellings of the same semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_data_warehouse_aws_spark.pipeline import analytics
from weather_data_warehouse_aws_spark.pipeline.generate import generate_bronze
from weather_data_warehouse_aws_spark.pipeline.run import run_pipeline
from weather_data_warehouse_aws_spark.pipeline.sql_views import (
    register_sql_views,
    run_sample_query,
)


@pytest.fixture(scope="module")
def layers(spark, tmp_path_factory):
    bronze = str(tmp_path_factory.mktemp("bronze_sql"))
    generate_bronze(bronze, days=3, seed=7)
    wh = str(tmp_path_factory.mktemp("warehouse_sql"))
    out = run_pipeline(
        spark, bronze, wh,
        effective_date=dt.date(2024, 1, 3), now=dt.datetime(2024, 1, 3, 7),
    )
    register_sql_views(
        spark, out["silver_current"], out["silver_forecast"],
        out["dim_location"], out["dim_date"],
    )
    return out


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_accuracy_by_horizon_matches_dataframe(spark, layers):
    sql_res = run_sample_query(spark, "accuracy_by_horizon")
    df_res = analytics.accuracy_by_horizon(layers["fact_forecast_accuracy"])
    cols = ["horizon_bucket", "total_forecasts", "avg_error_celsius", "accuracy_pct"]
    assert _rows(sql_res, cols) == _rows(df_res, cols)


def test_sql_city_ranking_matches_dataframe(spark, layers):
    sql_res = run_sample_query(spark, "city_ranking")
    df_res = analytics.city_performance_ranking(
        layers["fact_forecast_accuracy"], layers["dim_location"]
    )
    cols = ["location_name", "country_code", "total_forecasts", "avg_error", "accuracy_pct"]
    assert _rows(sql_res, cols) == _rows(df_res, cols)


def test_sql_quality_distribution_matches_dataframe(spark, layers):
    sql_res = run_sample_query(spark, "quality_distribution")
    df_res = analytics.quality_distribution(layers["fact_forecast_accuracy"])
    cols = ["temp_accuracy_category", "forecast_count", "percentage"]
    assert _rows(sql_res, cols) == _rows(df_res, cols)


def test_sql_current_summary_pinned_date(spark, layers):
    sql_res = run_sample_query(spark, "current_summary", as_of="2024-01-02")
    assert sql_res.count() == 8
    df_res = analytics.current_weather_summary(
        layers["fact_weather_actual"], layers["dim_location"], as_of=dt.date(2024, 1, 2)
    )
    cols = ["location_name", "temperature_celsius", "weather_condition"]
    assert _rows(sql_res, cols) == _rows(df_res, cols)


def test_sql_views_row_counts(spark, layers):
    """Virtual SQL facts and materialized DataFrame facts agree on grain."""
    for view, df_key in [
        ("fact_weather_actual", "fact_weather_actual"),
        ("fact_weather_forecast", "fact_weather_forecast"),
        ("fact_forecast_accuracy", "fact_forecast_accuracy"),
    ]:
        assert spark.table(view).count() == layers[df_key].count()


def test_sql_band_join_strictness(spark, layers):
    viol = spark.sql(
        """
        SELECT count(*) AS n FROM fact_forecast_accuracy
        WHERE ABS(unix_timestamp(forecast_for_time) -
                  unix_timestamp(actual_observation_time)) >= 3600
        """
    ).collect()[0].n
    assert viol == 0


def test_condition_distribution_and_trend(spark, layers):
    """New dashboard-panel analytics: per-city percentages sum to 100 and
    the trend window matches a hand-rolled SQL equivalent."""
    from weather_data_warehouse_aws_spark.pipeline.analytics import (
        condition_distribution,
        daily_temperature_trend,
    )

    dist = condition_distribution(
        layers["fact_weather_actual"], layers["dim_location"]
    )
    sums = (
        dist.groupBy("location_name")
        .sum("pct_of_city")
        .collect()
    )
    assert all(abs(r[1] - 100.0) < 0.5 for r in sums)

    trend = daily_temperature_trend(
        layers["fact_weather_actual"], layers["dim_location"], window_days=5
    )
    trend.createOrReplaceTempView("trend_df")
    rows = trend.collect()
    assert len(rows) > 0
    sql = spark.sql(
        """
        WITH daily AS (
            SELECT dl.location_name, to_date(fa.observation_time) AS day,
                   ROUND(AVG(fa.temperature_celsius), 2) AS avg_temp
            FROM fact_weather_actual fa
            JOIN dim_location dl ON fa.location_key = dl.location_key AND dl.is_current
            GROUP BY 1, 2
        )
        SELECT location_name, day,
               ROUND(AVG(avg_temp) OVER (
                   PARTITION BY location_name ORDER BY day
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ), 2) AS trend_temp
        FROM daily
        """
    )
    want = {(r.location_name, str(r.day)): r.trend_temp for r in sql.collect()}
    got = {(r.location_name, str(r.day)): r.trend_temp for r in rows}
    assert got == want
