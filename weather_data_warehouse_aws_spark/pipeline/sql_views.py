"""The reference's Athena SQL surface, rebuilt as generated Spark SQL.

A user of the reference interacts through SQL: three `CREATE OR REPLACE
VIEW` statements (`scripts/sql/create_views.sql`) and ad-hoc analytics
(`scripts/sql/sample_queries.sql`). This module reproduces that surface
with the SAME semantics in Spark dialect — Presto's ``TO_UNIXTIME(x)``
becomes ``unix_timestamp(x)``, ``DATE(x)`` becomes ``to_date(x)`` — but the
statements are assembled from structured column specs rather than carried
as literal text; `tests/test_sql_views.py` proves the SQL surface and the
DataFrame builders (pipeline/views.py) return identical analytics results.

Semantics preserved exactly (citations per element below): virtual facts
re-derived per query; ROW_NUMBER fact keys (single-task at scale — the
DataFrame builders' hash keys are the scale path, operators/keys.py);
`is_current` residual predicates; role-playing date dims; the strict
|Δt| < 3600 s accuracy band join; 1/3/5 °C categories; ≤3 °C AND
condition-match accuracy flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ERR = "f.temperature_celsius_forecast - a.temperature_celsius"

# measure columns carried through fact_weather_actual (create_views.sql:11-28)
_ACTUAL_MEASURES = [
    "observation_time", "temperature_celsius", "feels_like_celsius",
    "temp_min_celsius", "temp_max_celsius", "humidity_percent", "pressure_hpa",
    "wind_speed_mps", "wind_direction_deg", "wind_gust_mps",
    "cloud_cover_percent", "visibility_meters", "weather_condition",
    "weather_description", "is_daytime", "heat_index_category", "batch_id",
    "processed_timestamp",
]

# measure columns carried through fact_weather_forecast (create_views.sql:45-58)
_FORECAST_MEASURES = [
    "forecast_created_time", "forecast_for_time", "forecast_horizon_hours",
    "temperature_celsius_forecast", "feels_like_celsius_forecast",
    "humidity_percent_forecast", "pressure_hpa_forecast",
    "wind_speed_mps_forecast", "wind_direction_deg_forecast",
    "cloud_cover_percent_forecast", "precipitation_probability",
    "weather_condition_forecast", "batch_id", "processed_timestamp",
]

# accuracy-view output expressions (create_views.sql:73-108)
_ACCURACY_EXPRS = [
    ("f.location_key", "location_key"),
    ("f.forecast_created_date_key", None),
    ("f.forecast_for_date_key", None),
    ("f.forecast_horizon_hours", None),
    ("f.temperature_celsius_forecast", None),
    ("a.temperature_celsius", "temperature_celsius_actual"),
    (f"({_ERR})", "temp_error_celsius"),
    (f"ABS({_ERR})", "temp_absolute_error"),
    ("f.humidity_percent_forecast", None),
    ("a.humidity_percent", "humidity_percent_actual"),
    ("(f.humidity_percent_forecast - a.humidity_percent)", "humidity_error_percent"),
    ("f.wind_speed_mps_forecast", None),
    ("a.wind_speed_mps", "wind_speed_mps_actual"),
    ("f.weather_condition_forecast", None),
    ("a.weather_condition", "weather_condition_actual"),
    (
        "CASE WHEN f.weather_condition_forecast = a.weather_condition"
        " THEN true ELSE false END",
        "condition_match",
    ),
    ("f.forecast_created_time", None),
    ("f.forecast_for_time", None),
    ("a.observation_time", "actual_observation_time"),
    ("CAST(CURRENT_TIMESTAMP AS TIMESTAMP)", "created_timestamp"),
    (
        f"CASE WHEN ABS({_ERR}) <= 1 THEN 'Excellent'"
        f" WHEN ABS({_ERR}) <= 3 THEN 'Good'"
        f" WHEN ABS({_ERR}) <= 5 THEN 'Fair'"
        " ELSE 'Poor' END",
        "temp_accuracy_category",
    ),
    (
        f"CASE WHEN ABS({_ERR}) <= 3"
        " AND f.weather_condition_forecast = a.weather_condition"
        " THEN true ELSE false END",
        "is_accurate_forecast",
    ),
]


def _select_list(items) -> str:
    parts = []
    for expr, alias in items:
        parts.append(f"{expr} AS {alias}" if alias else expr)
    return ",\n    ".join(parts)


def _location_join(alias: str) -> str:
    # composite natural key + is_current residual (create_views.sql:30-33)
    return (
        f"INNER JOIN dim_location dl ON {alias}.location_name = dl.location_name "
        f"AND {alias}.country_code = dl.country_code AND dl.is_current = true"
    )


def _date_join(date_alias: str, src_expr: str) -> str:
    return (
        f"INNER JOIN dim_date {date_alias} "
        f"ON CAST({src_expr} AS DATE) = {date_alias}.full_date"
    )


def create_fact_weather_actual_sql() -> str:
    """create_views.sql:6-35 — obs ⋈ dim_location ⋈ dim_date."""
    cols = [
        ("ROW_NUMBER() OVER (ORDER BY cw.observation_time)", "actual_weather_key"),
        ("dl.location_key", None),
        ("dd.date_key", None),
        *[(f"cw.{c}", None) for c in _ACTUAL_MEASURES],
    ]
    return (
        "CREATE OR REPLACE TEMP VIEW fact_weather_actual AS\n"
        f"SELECT\n    {_select_list(cols)}\n"
        "FROM current_weather cw\n"
        f"{_location_join('cw')}\n"
        f"{_date_join('dd', 'cw.observation_date')}"
    )


def create_fact_weather_forecast_sql() -> str:
    """create_views.sql:39-67 — forecast ⋈ dim_location ⋈ dim_date ×2
    (role-playing created/for dates)."""
    cols = [
        (
            "ROW_NUMBER() OVER (ORDER BY fw.forecast_created_time, fw.forecast_for_time)",
            "forecast_key",
        ),
        ("dl.location_key", None),
        ("dd_created.date_key", "forecast_created_date_key"),
        ("dd_forecast.date_key", "forecast_for_date_key"),
        *[(f"fw.{c}", None) for c in _FORECAST_MEASURES],
    ]
    return (
        "CREATE OR REPLACE TEMP VIEW fact_weather_forecast AS\n"
        f"SELECT\n    {_select_list(cols)}\n"
        "FROM forecast_weather fw\n"
        f"{_location_join('fw')}\n"
        f"{_date_join('dd_created', 'fw.forecast_created_date')}\n"
        f"{_date_join('dd_forecast', 'fw.forecast_for_date')}"
    )


def create_fact_forecast_accuracy_sql() -> str:
    """create_views.sql:71-115 — the |Δt| < 3600 strict band join
    (TO_UNIXTIME → unix_timestamp) + error/category expressions."""
    cols = [
        (
            "ROW_NUMBER() OVER (ORDER BY f.forecast_created_time, f.forecast_for_time)",
            "accuracy_key",
        ),
        *_ACCURACY_EXPRS,
    ]
    band = (
        "ON f.location_key = a.location_key AND ABS("
        "unix_timestamp(CAST(f.forecast_for_time AS TIMESTAMP)) - "
        "unix_timestamp(CAST(a.observation_time AS TIMESTAMP))) < 3600"
    )
    return (
        "CREATE OR REPLACE TEMP VIEW fact_forecast_accuracy AS\n"
        f"SELECT\n    {_select_list(cols)}\n"
        "FROM fact_weather_forecast f\n"
        f"INNER JOIN fact_weather_actual a\n    {band}"
    )


def _horizon_bucket(col: str) -> str:
    return (
        f"CASE WHEN {col} <= 24 THEN '0-24 hours'"
        f" WHEN {col} <= 48 THEN '24-48 hours'"
        f" WHEN {col} <= 72 THEN '48-72 hours'"
        " ELSE '72+ hours' END"
    )


def _rate_pct(col: str) -> str:
    return f"ROUND(AVG(CAST({col} AS INT)) * 100, 1)"


# sample_queries.sql 1-4, Spark dialect, assembled from shared fragments
SAMPLE_QUERIES = {
    "accuracy_by_horizon": f"""
SELECT
    {_horizon_bucket('forecast_horizon_hours')} AS horizon_bucket,
    COUNT(*) AS total_forecasts,
    ROUND(AVG(temp_absolute_error), 2) AS avg_error_celsius,
    {_rate_pct('is_accurate_forecast')} AS accuracy_pct
FROM fact_forecast_accuracy
GROUP BY 1
ORDER BY 1
""",
    "city_ranking": f"""
SELECT
    dl.location_name,
    dl.country_code,
    COUNT(*) AS total_forecasts,
    ROUND(AVG(fa.temp_absolute_error), 2) AS avg_error,
    {_rate_pct('fa.is_accurate_forecast')} AS accuracy_pct
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
    spark.sql(create_fact_weather_actual_sql())
    spark.sql(create_fact_weather_forecast_sql())
    spark.sql(create_fact_forecast_accuracy_sql())


def run_sample_query(spark: SparkSession, name: str, *, as_of: str = "CURRENT_DATE") -> DataFrame:
    sql = SAMPLE_QUERIES[name]
    if name == "current_summary":
        as_of_expr = "CURRENT_DATE" if as_of == "CURRENT_DATE" else f"DATE'{as_of}'"
        sql = sql.format(as_of=as_of_expr)
    return spark.sql(sql)
