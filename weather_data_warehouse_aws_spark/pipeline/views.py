"""Fact views (reference `scripts/sql/create_views.sql`) as DataFrame builders.

The reference leaves facts virtual (Athena views), so every analytics query
re-runs the dim joins AND the band join (`create_views.sql:71-115` inlined
per query). Engine decision (SURVEY §4): build facts once per load and
either register as temp views or materialize to parquet — at 100 TB you do
not want the accuracy band join recomputed by each of ~200 queries/month.

Key strategy: the reference mints fact keys with a global
``ROW_NUMBER() OVER (ORDER BY …)`` (`create_views.sql:8,41,73`) — a
single-task bottleneck at scale. Facts here use ``xxhash64`` of the natural
grain (deterministic, map-side); see `operators/keys.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.band_join import band_join

ACCURACY_TOLERANCE_SEC = 3600  # strict <, reference create_views.sql:112-115


def fact_weather_actual(
    silver_current: DataFrame, dim_location: DataFrame, dim_date: DataFrame
) -> DataFrame:
    """`create_views.sql:6-35` — current obs ⋈ dim_location ⋈ dim_date.

    Dims are broadcast: the fact side streams map-side, zero shuffle.
    """
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select(
            "location_key", "location_name", "country_code"
        )
    )
    dd = F.broadcast(dim_date.select("date_key", "full_date"))
    cw = silver_current
    return (
        cw.join(dl, ["location_name", "country_code"], "inner")
        .join(dd, cw.observation_date == dd.full_date, "inner")
        .select(
            F.xxhash64("location_key", "observation_time").alias("actual_weather_key"),
            "location_key",
            "date_key",
            "observation_time",
            "temperature_celsius",
            "feels_like_celsius",
            "temp_min_celsius",
            "temp_max_celsius",
            "humidity_percent",
            "pressure_hpa",
            "wind_speed_mps",
            "wind_direction_deg",
            "wind_gust_mps",
            "cloud_cover_percent",
            "visibility_meters",
            "weather_condition",
            "weather_description",
            "is_daytime",
            "heat_index_category",
            "batch_id",
            "processed_timestamp",
        )
    )


def fact_weather_forecast(
    silver_forecast: DataFrame, dim_location: DataFrame, dim_date: DataFrame
) -> DataFrame:
    """`create_views.sql:39-67` — forecast ⋈ dim_location ⋈ dim_date ×2.

    dim_date plays two roles (created / for) via aliased broadcast joins —
    the role-playing-dimension pattern (SURVEY §2.3 J3).
    """
    dl = F.broadcast(
        dim_location.filter(F.col("is_current")).select(
            "location_key", "location_name", "country_code"
        )
    )
    dd_created = F.broadcast(
        dim_date.select(
            F.col("date_key").alias("forecast_created_date_key"),
            F.col("full_date").alias("_created_full_date"),
        )
    )
    dd_forecast = F.broadcast(
        dim_date.select(
            F.col("date_key").alias("forecast_for_date_key"),
            F.col("full_date").alias("_for_full_date"),
        )
    )
    fw = silver_forecast
    return (
        fw.join(dl, ["location_name", "country_code"], "inner")
        .join(dd_created, fw.forecast_created_date == F.col("_created_full_date"), "inner")
        .join(dd_forecast, fw.forecast_for_date == F.col("_for_full_date"), "inner")
        .select(
            F.xxhash64(
                "location_key", "forecast_created_time", "forecast_for_time"
            ).alias("forecast_key"),
            "location_key",
            "forecast_created_date_key",
            "forecast_for_date_key",
            "forecast_created_time",
            "forecast_for_time",
            "forecast_horizon_hours",
            "temperature_celsius_forecast",
            "feels_like_celsius_forecast",
            "humidity_percent_forecast",
            "pressure_hpa_forecast",
            "wind_speed_mps_forecast",
            "wind_direction_deg_forecast",
            "cloud_cover_percent_forecast",
            "precipitation_probability",
            "weather_condition_forecast",
            "batch_id",
            "processed_timestamp",
        )
    )


def fact_forecast_accuracy(
    fact_forecast: DataFrame, fact_actual: DataFrame
) -> DataFrame:
    """`create_views.sql:71-115` — forecast↔actual time-proximity band join.

    Exact reference semantics: same location_key, strict
    |Δt| < 3600 s, many-to-many. Executed as the bucketed equi-join from
    `operators/band_join.py` so the 8-distinct-key join cannot degenerate
    into per-key cross products at scale.
    """
    f = fact_forecast.select(
        "location_key",
        "forecast_created_date_key",
        "forecast_for_date_key",
        "forecast_horizon_hours",
        "temperature_celsius_forecast",
        "humidity_percent_forecast",
        "wind_speed_mps_forecast",
        "weather_condition_forecast",
        "forecast_created_time",
        "forecast_for_time",
    )
    a = fact_actual.select(
        "location_key",
        F.col("temperature_celsius").alias("temperature_celsius_actual"),
        F.col("humidity_percent").alias("humidity_percent_actual"),
        F.col("wind_speed_mps").alias("wind_speed_mps_actual"),
        F.col("weather_condition").alias("weather_condition_actual"),
        F.col("observation_time").alias("actual_observation_time"),
    )
    joined = band_join(
        f,
        a,
        on=["location_key"],
        left_ts="forecast_for_time",
        right_ts="actual_observation_time",
        tolerance_sec=ACCURACY_TOLERANCE_SEC,
    )
    err = F.col("temperature_celsius_forecast") - F.col("temperature_celsius_actual")
    abs_err = F.abs(err)
    return joined.select(
        F.xxhash64(
            "location_key", "forecast_created_time", "forecast_for_time",
            "actual_observation_time",
        ).alias("accuracy_key"),
        "location_key",
        "forecast_created_date_key",
        "forecast_for_date_key",
        "forecast_horizon_hours",
        "temperature_celsius_forecast",
        "temperature_celsius_actual",
        err.alias("temp_error_celsius"),
        abs_err.alias("temp_absolute_error"),
        "humidity_percent_forecast",
        "humidity_percent_actual",
        (F.col("humidity_percent_forecast") - F.col("humidity_percent_actual")).alias(
            "humidity_error_percent"
        ),
        "wind_speed_mps_forecast",
        "wind_speed_mps_actual",
        "weather_condition_forecast",
        "weather_condition_actual",
        (
            F.col("weather_condition_forecast") == F.col("weather_condition_actual")
        ).alias("condition_match"),
        "forecast_created_time",
        "forecast_for_time",
        "actual_observation_time",
        F.current_timestamp().alias("created_timestamp"),
        F.when(abs_err <= 1, "Excellent")
        .when(abs_err <= 3, "Good")
        .when(abs_err <= 5, "Fair")
        .otherwise("Poor")
        .alias("temp_accuracy_category"),
        (
            (abs_err <= 3)
            & (F.col("weather_condition_forecast") == F.col("weather_condition_actual"))
        ).alias("is_accurate_forecast"),
    )


def register_fact_views(
    spark: SparkSession,
    silver_current: DataFrame,
    silver_forecast: DataFrame,
    dim_location: DataFrame,
    dim_date: DataFrame,
) -> dict[str, DataFrame]:
    """Build all three facts and register them as temp views (S9/S10)."""
    actual = fact_weather_actual(silver_current, dim_location, dim_date)
    forecast = fact_weather_forecast(silver_forecast, dim_location, dim_date)
    accuracy = fact_forecast_accuracy(forecast, actual)
    facts = {
        "fact_weather_actual": actual,
        "fact_weather_forecast": forecast,
        "fact_forecast_accuracy": accuracy,
    }
    dim_location.createOrReplaceTempView("dim_location")
    dim_date.createOrReplaceTempView("dim_date")
    for name, df in facts.items():
        df.createOrReplaceTempView(name)
    return facts
