"""End-to-end weather-semantics differential (the flagship query).

The weather pipeline's core semantics — the strict |Δt|<3600 band join,
temp-error math, Excellent/Good/Fair/Poor category boundaries,
is_accurate_forecast, horizon bucketing, and boolean-rate aggregation
(`create_views.sql:71-115` + `sample_queries.sql:3-16`) — exercised through
the REAL pipeline code (`pipeline/views.fact_forecast_accuracy`, which runs
`operators/band_join`) on data both engines synthesize identically from the
`events` table:

    purchases → forecasts   (8 location keys = user_id % 8, horizon from
                             event_id, temp offset k = event_id % 7 − 3)
    views     → actuals

The additive offset k survives the floor-quantization exactly, so temp_absolute_error
lands EXACTLY ON the 1/3/5 °C category boundaries — pinning the boundary
semantics cross-engine, not just near them. 8 distinct join keys over the
full table is precisely the key-skew regime the bucketed band join exists
for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.views import fact_forecast_accuracy
from ..sources.tables import load_table

_CONDITION = "CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'Clear' WHEN 1 THEN 'Rain' ELSE 'Clouds' END"


def q_weather_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch_day = (F.unix_timestamp("ts") / F.lit(86400)).cast("long")

    forecasts = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).alias("location_key"),
        epoch_day.cast("int").alias("forecast_created_date_key"),
        epoch_day.cast("int").alias("forecast_for_date_key"),
        ((F.col("event_id") % 5 + 1) * 24.0).alias("forecast_horizon_hours"),
        (F.floor(F.col("value") * 10) / 100 + (F.col("event_id") % 7 - 3)).alias(
            "temperature_celsius_forecast"
        ),
        (F.col("event_id") % 100).alias("humidity_percent_forecast"),
        (F.floor(F.col("value") * 5) / 100).alias("wind_speed_mps_forecast"),
        F.expr(_CONDITION).alias("weather_condition_forecast"),
        F.col("ts").alias("forecast_created_time"),
        F.col("ts").alias("forecast_for_time"),
    )
    actuals = ev.filter(F.col("event_type") == "view").select(
        (F.col("user_id") % 8).alias("location_key"),
        (F.floor(F.col("value") * 10) / 100).alias("temperature_celsius"),
        (F.col("event_id") % 100).alias("humidity_percent"),
        (F.floor(F.col("value") * 5) / 100).alias("wind_speed_mps"),
        F.expr(_CONDITION).alias("weather_condition"),
        F.col("ts").alias("observation_time"),
    )

    acc = fact_forecast_accuracy(forecasts, actuals)

    bucket = (
        F.when(F.col("forecast_horizon_hours") <= 24, "0-24 hours")
        .when(F.col("forecast_horizon_hours") <= 48, "24-48 hours")
        .when(F.col("forecast_horizon_hours") <= 72, "48-72 hours")
        .otherwise("72+ hours")
    )
    return (
        acc.withColumn("horizon_bucket", bucket)
        .groupBy("horizon_bucket", "temp_accuracy_category")
        .agg(
            F.count("*").alias("total_forecasts"),
            # round 4, not 2: the per-row errors are integers ± 1 ulp (additive
            # offset through round(x,2)), so a 2dp average can sit exactly on a
            # .005 boundary where cross-engine summation order flips the hash
            F.round(F.avg("temp_absolute_error"), 4).alias("avg_error_celsius"),
            F.round(F.avg(F.col("is_accurate_forecast").cast("int")) * 100, 1).alias(
                "accuracy_pct"
            ),
            F.round(F.avg(F.col("condition_match").cast("int")) * 100, 1).alias(
                "condition_match_pct"
            ),
        )
        .orderBy("horizon_bucket", "temp_accuracy_category")
    )


ORACLE_WEATHER_E2E = f"""
WITH forecasts AS (
    SELECT
        user_id % 8 AS location_key,
        (event_id % 5 + 1) * 24.0 AS forecast_horizon_hours,
        FLOOR(value * 10) / 100 + (event_id % 7 - 3) AS temperature_celsius_forecast,
        {_CONDITION} AS weather_condition_forecast,
        ts AS forecast_for_time
    FROM events WHERE event_type = 'purchase'
),
actuals AS (
    SELECT
        user_id % 8 AS location_key,
        FLOOR(value * 10) / 100 AS temperature_celsius,
        {_CONDITION} AS weather_condition,
        ts AS observation_time
    FROM events WHERE event_type = 'view'
),
acc AS (
    SELECT
        f.forecast_horizon_hours,
        ABS(f.temperature_celsius_forecast - a.temperature_celsius) AS temp_absolute_error,
        CASE
            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 1 THEN 'Excellent'
            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3 THEN 'Good'
            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 5 THEN 'Fair'
            ELSE 'Poor'
        END AS temp_accuracy_category,
        CASE
            WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3
                 AND f.weather_condition_forecast = a.weather_condition
            THEN 1 ELSE 0
        END AS is_accurate_forecast,
        CASE WHEN f.weather_condition_forecast = a.weather_condition THEN 1 ELSE 0 END
            AS condition_match
    FROM forecasts f
    INNER JOIN actuals a
        ON f.location_key = a.location_key
        AND ABS(CAST(FLOOR(epoch(f.forecast_for_time)) AS BIGINT) -
                CAST(FLOOR(epoch(a.observation_time)) AS BIGINT)) < 3600
)
SELECT
    CASE
        WHEN forecast_horizon_hours <= 24 THEN '0-24 hours'
        WHEN forecast_horizon_hours <= 48 THEN '24-48 hours'
        WHEN forecast_horizon_hours <= 72 THEN '48-72 hours'
        ELSE '72+ hours'
    END AS horizon_bucket,
    temp_accuracy_category,
    COUNT(*) AS total_forecasts,
    ROUND(AVG(temp_absolute_error), 4) AS avg_error_celsius,
    ROUND(AVG(CAST(is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct,
    ROUND(AVG(CAST(condition_match AS INT)) * 100, 1) AS condition_match_pct
FROM acc
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {"weather_e2e": q_weather_e2e}
ORACLE = {"weather_e2e": ORACLE_WEATHER_E2E}
