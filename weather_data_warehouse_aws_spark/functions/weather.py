"""Weather-domain derivation expressions, factored so the silver pipeline
and the cross-engine differential query share ONE definition.

Semantics are reference-exact:
* heat-index 5-way CASE with strict `>` boundaries (`bronze_to_silver.py:101-108`)
* is_daytime = observation BETWEEN sunrise AND sunset, inclusive both ends
  (`bronze_to_silver.py:94-100`)
* timezone-name 8-way CASE lives in pipeline/gold.py (dim-side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def heat_index_category(feels_like: Column) -> Column:
    return (
        F.when(feels_like > 40, "Extreme Heat")
        .when(feels_like > 32, "High Heat")
        .when(feels_like > 26, "Moderate")
        .when(feels_like > 10, "Comfortable")
        .otherwise("Cold")
    )


HEAT_INDEX_SQL = """CASE
    WHEN {c} > 40 THEN 'Extreme Heat'
    WHEN {c} > 32 THEN 'High Heat'
    WHEN {c} > 26 THEN 'Moderate'
    WHEN {c} > 10 THEN 'Comfortable'
    ELSE 'Cold'
END"""


def is_daytime(observation: Column, sunrise: Column, sunset: Column) -> Column:
    return F.when(observation.between(sunrise, sunset), True).otherwise(False)


IS_DAYTIME_SQL = "({o} >= {r} AND {o} <= {s})"
