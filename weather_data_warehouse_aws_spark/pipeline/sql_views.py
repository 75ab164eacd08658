"""The reference's Athena SQL surface, as executable Spark SQL.

A user of the reference interacts through SQL: three `CREATE OR REPLACE
VIEW` statements (`scripts/sql/create_views.sql`) and ad-hoc analytics
(`scripts/sql/sample_queries.sql`). This module carries the same statements
in Spark dialect (`TO_UNIXTIME(x)` → `unix_timestamp(x)`, `DATE(x)` →
`to_date(x)`; everything else is ANSI and unchanged), registered as temp
views over the silver/gold layers — so every query they run today runs here.

Note the VIEW semantics match Athena's: facts stay virtual and re-derive on
each query (view text inlined by the analyzer). `pipeline/run.py` offers the
materialized alternative for the expensive accuracy band join; both paths
produce identical rows.

The fact-key difference vs pipeline/views.py: these SQL views keep the
reference's literal `ROW_NUMBER() OVER (ORDER BY …)` keys for textual
parity — correct but single-task at scale (see operators/keys.py for the
engine's stance). The DataFrame builders are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# `create_views.sql:6-35`, Spark dialect
CREATE_FACT_WEATHER_ACTUAL = """
CREATE OR REPLACE TEMP VIEW fact_weather_actual AS
SELECT
    ROW_NUMBER() OVER (ORDER BY cw.observation_time) AS actual_weather_key,
    dl.location_key,
    dd.date_key,
    cw.observation_time,
    cw.temperature_celsius,
    cw.feels_like_celsius,
    cw.temp_min_celsius,
    cw.temp_max_celsius,
    cw.humidity_percent,
    cw.pressure_hpa,
    cw.wind_speed_mps,
    cw.wind_direction_deg,
    cw.wind_gust_mps,
    cw.cloud_cover_percent,
    cw.visibility_meters,
    cw.weather_condition,
    cw.weather_description,
    cw.is_daytime,
    cw.heat_index_category,
    cw.batch_id,
    cw.processed_timestamp
FROM current_weather cw
INNER JOIN dim_location dl
    ON cw.location_name = dl.location_name
    AND cw.country_code = dl.country_code
    AND dl.is_current = true
INNER JOIN dim_date dd
    ON CAST(cw.observation_date AS DATE) = dd.full_date
"""

# `create_views.sql:39-67`
CREATE_FACT_WEATHER_FORECAST = """
CREATE OR REPLACE TEMP VIEW fact_weather_forecast AS
SELECT
    ROW_NUMBER() OVER (ORDER BY fw.forecast_created_time, fw.forecast_for_time) AS forecast_key,
    dl.location_key,
    dd_created.date_key AS forecast_created_date_key,
    dd_forecast.date_key AS forecast_for_date_key,
    fw.forecast_created_time,
    fw.forecast_for_time,
    fw.forecast_horizon_hours,
    fw.temperature_celsius_forecast,
    fw.feels_like_celsius_forecast,
    fw.humidity_percent_forecast,
    fw.pressure_hpa_forecast,
    fw.wind_speed_mps_forecast,
    fw.wind_direction_deg_forecast,
    fw.cloud_cover_percent_forecast,
    fw.precipitation_probability,
    fw.weather_condition_forecast,
    fw.batch_id,
    fw.processed_timestamp
FROM forecast_weather fw
INNER JOIN dim_location dl
    ON fw.location_name = dl.location_name
    AND fw.country_code = dl.country_code
    AND dl.is_current = true
INNER JOIN dim_date dd_created
    ON CAST(fw.forecast_created_date AS DATE) = dd_created.full_date
INNER JOIN dim_date dd_forecast
    ON CAST(fw.forecast_for_date AS DATE) = dd_forecast.full_date
"""

# `create_views.sql:71-115`; TO_UNIXTIME → unix_timestamp
CREATE_FACT_FORECAST_ACCURACY = """
CREATE OR REPLACE TEMP VIEW fact_forecast_accuracy AS
SELECT
    ROW_NUMBER() OVER (ORDER BY f.forecast_created_time, f.forecast_for_time) AS accuracy_key,
    f.location_key,
    f.forecast_created_date_key,
    f.forecast_for_date_key,
    f.forecast_horizon_hours,
    f.temperature_celsius_forecast,
    a.temperature_celsius AS temperature_celsius_actual,
    (f.temperature_celsius_forecast - a.temperature_celsius) AS temp_error_celsius,
    ABS(f.temperature_celsius_forecast - a.temperature_celsius) AS temp_absolute_error,
    f.humidity_percent_forecast,
    a.humidity_percent AS humidity_percent_actual,
    (f.humidity_percent_forecast - a.humidity_percent) AS humidity_error_percent,
    f.wind_speed_mps_forecast,
    a.wind_speed_mps AS wind_speed_mps_actual,
    f.weather_condition_forecast,
    a.weather_condition AS weather_condition_actual,
    CASE
        WHEN f.weather_condition_forecast = a.weather_condition THEN true
        ELSE false
    END AS condition_match,
    f.forecast_created_time,
    f.forecast_for_time,
    a.observation_time AS actual_observation_time,
    CAST(CURRENT_TIMESTAMP AS TIMESTAMP) AS created_timestamp,
    CASE
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 1 THEN 'Excellent'
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3 THEN 'Good'
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 5 THEN 'Fair'
        ELSE 'Poor'
    END AS temp_accuracy_category,
    CASE
        WHEN ABS(f.temperature_celsius_forecast - a.temperature_celsius) <= 3
             AND f.weather_condition_forecast = a.weather_condition
        THEN true
        ELSE false
    END AS is_accurate_forecast
FROM fact_weather_forecast f
INNER JOIN fact_weather_actual a
    ON f.location_key = a.location_key
    AND ABS(
        unix_timestamp(CAST(f.forecast_for_time AS TIMESTAMP)) -
        unix_timestamp(CAST(a.observation_time AS TIMESTAMP))
    ) < 3600
"""

# `sample_queries.sql` 1-4, Spark dialect (DATE() → to_date())
SAMPLE_QUERIES = {
    "accuracy_by_horizon": """
SELECT
    CASE
        WHEN forecast_horizon_hours <= 24 THEN '0-24 hours'
        WHEN forecast_horizon_hours <= 48 THEN '24-48 hours'
        WHEN forecast_horizon_hours <= 72 THEN '48-72 hours'
        ELSE '72+ hours'
    END AS horizon_bucket,
    COUNT(*) AS total_forecasts,
    ROUND(AVG(temp_absolute_error), 2) AS avg_error_celsius,
    ROUND(AVG(CAST(is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
FROM fact_forecast_accuracy
GROUP BY 1
ORDER BY 1
""",
    "city_ranking": """
SELECT
    dl.location_name,
    dl.country_code,
    COUNT(*) AS total_forecasts,
    ROUND(AVG(fa.temp_absolute_error), 2) AS avg_error,
    ROUND(AVG(CAST(fa.is_accurate_forecast AS INT)) * 100, 1) AS accuracy_pct
FROM fact_forecast_accuracy fa
JOIN dim_location dl ON fa.location_key = dl.location_key
WHERE dl.is_current = true
GROUP BY dl.location_name, dl.country_code
ORDER BY accuracy_pct DESC
""",
    "current_summary": """
SELECT
    dl.location_name,
    fa.observation_time,
    fa.temperature_celsius,
    fa.weather_condition,
    fa.humidity_percent,
    fa.wind_speed_mps
FROM fact_weather_actual fa
JOIN dim_location dl ON fa.location_key = dl.location_key
WHERE dl.is_current = true
  AND to_date(fa.observation_time) = {as_of}
ORDER BY dl.location_name
""",
    "quality_distribution": """
SELECT
    temp_accuracy_category,
    COUNT(*) AS forecast_count,
    ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 1) AS percentage
FROM fact_forecast_accuracy
GROUP BY temp_accuracy_category
ORDER BY
    CASE temp_accuracy_category
        WHEN 'Excellent' THEN 1
        WHEN 'Good' THEN 2
        WHEN 'Fair' THEN 3
        WHEN 'Poor' THEN 4
    END
""",
}


def register_sql_views(
    spark: SparkSession,
    silver_current: DataFrame,
    silver_forecast: DataFrame,
    dim_location: DataFrame,
    dim_date: DataFrame,
) -> None:
    """Register base tables + the three fact views via SQL DDL (S9/S10)."""
    silver_current.createOrReplaceTempView("current_weather")
    silver_forecast.createOrReplaceTempView("forecast_weather")
    dim_location.createOrReplaceTempView("dim_location")
    dim_date.createOrReplaceTempView("dim_date")
    spark.sql(CREATE_FACT_WEATHER_ACTUAL)
    spark.sql(CREATE_FACT_WEATHER_FORECAST)
    spark.sql(CREATE_FACT_FORECAST_ACCURACY)


def run_sample_query(spark: SparkSession, name: str, *, as_of: str = "CURRENT_DATE") -> DataFrame:
    sql = SAMPLE_QUERIES[name]
    if name == "current_summary":
        as_of_expr = "CURRENT_DATE" if as_of == "CURRENT_DATE" else f"DATE'{as_of}'"
        sql = sql.format(as_of=as_of_expr)
    return spark.sql(sql)
