"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``weather_data_warehouse_aws_spark/``; this file
only adapts them to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any cwd; the package lives next to it
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from weather_data_warehouse_aws_spark import queries as _registry  # noqa: E402

_QUERIES, _ORACLE = _registry.collect()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    weather_e2e drives the reference's whole semantic core in one plan:
    the bucketed band join, error/category/accuracy expressions, horizon
    bucketing, and boolean-rate aggregation (see queries/weather_e2e.py).
    """
    return _QUERIES["weather_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted ⇒ rows-only check)."""
    return dict(_ORACLE)
