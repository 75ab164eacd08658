"""Physical-plan inspection helpers — the ".explain() and iterate" loop as
code (SURVEY §4; the brief's own acceptance test: pushed filters, pruned
schemas, broadcast joins, codegen spans, no accidental cartesian products).

Used by tests/test_plans.py to pin plan SHAPE, not just results: a
regression that silently turns a broadcast join into a cross product still
passes value checks at sf0.01 — and melts down at 100 TB. These assertions
are the guardrail.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    spark = df.sparkSession
    return jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def executed_plan(df: DataFrame) -> str:
    """Post-AQE final plan — run the query, then read the adaptive result."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(plan: str) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def count_op(plan: str, op: str) -> int:
    return len(re.findall(rf"\b{re.escape(op)}\b", plan))


def has_cartesian(plan: str) -> bool:
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def scan_columns(plan: str) -> set[str]:
    """All column names appearing in parquet ReadSchemas."""
    cols: set[str] = set()
    for schema in read_schemas(plan):
        for field in schema.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols
