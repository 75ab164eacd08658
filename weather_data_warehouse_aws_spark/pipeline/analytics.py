"""The reference's analytics queries (`scripts/sql/sample_queries.sql`) as
DataFrame builders over the fact views. Query-for-query parity:

  1 accuracy by horizon bucket   (:3-16)
  2 city performance ranking     (:18-29)
  3 current weather summary      (:31-43)
  4 forecast quality distribution (:45-58)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def accuracy_by_horizon(fact_forecast_accuracy: DataFrame) -> DataFrame:
    """Query 1 — CASE horizon buckets + boolean-rate accuracy."""
    bucket = (
        F.when(F.col("forecast_horizon_hours") <= 24, "0-24 hours")
        .when(F.col("forecast_horizon_hours") <= 48, "24-48 hours")
        .when(F.col("forecast_horizon_hours") <= 72, "48-72 hours")
        .otherwise("72+ hours")
    )
    return (
        fact_forecast_accuracy.withColumn("horizon_bucket", bucket)
        .groupBy("horizon_bucket")
        .agg(
            F.count("*").alias("total_forecasts"),
            F.round(F.avg("temp_absolute_error"), 2).alias("avg_error_celsius"),
            F.round(F.avg(F.col("is_accurate_forecast").cast("int")) * 100, 1).alias(
                "accuracy_pct"
            ),
        )
        .orderBy("horizon_bucket")
    )


def city_performance_ranking(
    fact_forecast_accuracy: DataFrame, dim_location: DataFrame
) -> DataFrame:
    """Query 2 — accuracy fact ⋈ dim_location (broadcast), ranked."""
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select(
            "location_key", "location_name", "country_code"
        )
    )
    return (
        fact_forecast_accuracy.join(dl, "location_key", "inner")
        .groupBy("location_name", "country_code")
        .agg(
            F.count("*").alias("total_forecasts"),
            F.round(F.avg("temp_absolute_error"), 2).alias("avg_error"),
            F.round(F.avg(F.col("is_accurate_forecast").cast("int")) * 100, 1).alias(
                "accuracy_pct"
            ),
        )
        .orderBy(F.col("accuracy_pct").desc())
    )


def current_weather_summary(
    fact_weather_actual: DataFrame,
    dim_location: DataFrame,
    as_of: _dt.date | None = None,
) -> DataFrame:
    """Query 3 — today's observations per city.

    `as_of` pins CURRENT_DATE for deterministic tests (the reference uses the
    wall clock, `sample_queries.sql:42`).
    """
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select("location_key", "location_name")
    )
    the_date = F.lit(as_of) if as_of else F.current_date()
    return (
        fact_weather_actual.join(dl, "location_key", "inner")
        .filter(F.to_date("observation_time") == the_date)
        .select(
            "location_name",
            "observation_time",
            "temperature_celsius",
            "weather_condition",
            "humidity_percent",
            "wind_speed_mps",
        )
        .orderBy("location_name")
    )


def quality_distribution(fact_forecast_accuracy: DataFrame) -> DataFrame:
    """Query 4 — category counts + percent-of-total window, custom order."""
    counts = fact_forecast_accuracy.groupBy("temp_accuracy_category").agg(
        F.count("*").alias("forecast_count")
    )
    total_w = Window.partitionBy()
    order_rank = (
        F.when(F.col("temp_accuracy_category") == "Excellent", 1)
        .when(F.col("temp_accuracy_category") == "Good", 2)
        .when(F.col("temp_accuracy_category") == "Fair", 3)
        .when(F.col("temp_accuracy_category") == "Poor", 4)
    )
    return (
        counts.withColumn(
            "percentage",
            F.round(
                F.col("forecast_count") * 100.0 / F.sum("forecast_count").over(total_w), 1
            ),
        )
        .orderBy(order_rank)
        .select("temp_accuracy_category", "forecast_count", "percentage")
    )


def condition_distribution(fact_weather_actual: DataFrame, dim_location: DataFrame) -> DataFrame:
    """Dashboard panel: weather-condition mix per city (the reference's
    QuickSight condition-distribution chart, `dashboards/images/*.jpg`)."""
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select("location_key", "location_name")
    )
    counts = (
        fact_weather_actual.join(dl, "location_key", "inner")
        .groupBy("location_name", "weather_condition")
        .agg(F.count("*").alias("n_observations"))
    )
    per_city = Window.partitionBy("location_name")
    return (
        counts.withColumn(
            "pct_of_city",
            F.round(F.col("n_observations") * 100.0 / F.sum("n_observations").over(per_city), 1),
        )
        .orderBy("location_name", F.col("n_observations").desc(), "weather_condition")
    )


def daily_temperature_trend(
    fact_weather_actual: DataFrame, dim_location: DataFrame, *, window_days: int = 5
) -> DataFrame:
    """Dashboard panel: daily average temperature per city with a trailing
    N-day moving average (the 'last 5 days' trend line the reference draws
    in QuickSight — SURVEY §2.5 notes it's built outside SQL there)."""
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select("location_key", "location_name")
    )
    daily = (
        fact_weather_actual.join(dl, "location_key", "inner")
        .groupBy("location_name", F.to_date("observation_time").alias("day"))
        .agg(
            F.round(F.avg("temperature_celsius"), 2).alias("avg_temp"),
            F.count("*").alias("n_obs"),
        )
    )
    w = (
        Window.partitionBy("location_name")
        .orderBy("day")
        .rowsBetween(-(window_days - 1), Window.currentRow)
    )
    return (
        daily.withColumn("trend_temp", F.round(F.avg("avg_temp").over(w), 2))
        .orderBy("location_name", "day")
    )
