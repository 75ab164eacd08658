"""Silver-derivation differential: the heat-index CASE and is_daytime
BETWEEN expressions — THE actual column objects the silver pipeline uses
(functions/weather.py) — applied to observations both engines synthesize
identically from `events`, with the oracle built from the same SQL template
constants. Closes the cross-engine loop on P6/P11 that weather_e2e's
accuracy stack doesn't touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.weather import (
    HEAT_INDEX_SQL,
    IS_DAYTIME_SQL,
    heat_index_category,
    is_daytime,
)
from ..sources.tables import load_table


def q_weather_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event becomes an observation: feels_like sweeps the full CASE
    range (value ∈ [0,100] → [-10, 50] hits every heat band incl. the exact
    >10/>26/>32/>40 boundaries via integer quantization), and sunrise/sunset
    bracket a deterministic subset of timestamps."""
    ev = load_table(spark, sf_dir, "events")
    feels_like = (F.floor(F.col("value") * 10) / 100 * 6 - 10).alias("feels_like")
    day_start = F.date_trunc("day", F.col("ts"))
    sunrise = day_start + F.expr("INTERVAL 6 HOURS")
    sunset = day_start + F.expr("INTERVAL 18 HOURS")
    enriched = ev.select(
        "event_id",
        feels_like,
        F.col("ts").alias("observation_time"),
        sunrise.alias("sunrise_time"),
        sunset.alias("sunset_time"),
    ).select(
        "event_id",
        heat_index_category(F.col("feels_like")).alias("heat_index_category"),
        is_daytime(
            F.col("observation_time"), F.col("sunrise_time"), F.col("sunset_time")
        ).alias("is_daytime"),
    )
    return (
        enriched.groupBy("heat_index_category", "is_daytime")
        .agg(F.count("*").alias("n"))
        .orderBy("heat_index_category", "is_daytime")
    )


_HEAT = HEAT_INDEX_SQL.format(c="feels_like")
_DAY = IS_DAYTIME_SQL.format(o="observation_time", r="sunrise_time", s="sunset_time")

ORACLE_WEATHER_ENRICH = f"""
WITH obs AS (
    SELECT
        event_id,
        FLOOR(value * 10) / 100 * 6 - 10 AS feels_like,
        ts AS observation_time,
        date_trunc('day', ts) + INTERVAL 6 HOUR AS sunrise_time,
        date_trunc('day', ts) + INTERVAL 18 HOUR AS sunset_time
    FROM events
),
enriched AS (
    SELECT
        event_id,
        {_HEAT} AS heat_index_category,
        {_DAY} AS is_daytime
    FROM obs
)
SELECT heat_index_category, is_daytime, COUNT(*) AS n
FROM enriched
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {"weather_enrich": q_weather_enrich}
ORACLE = {"weather_enrich": ORACLE_WEATHER_ENRICH}
