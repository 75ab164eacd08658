"""Arrow-level type-class parity for every query/oracle pair.

The driver's CORRECTNESS gate compares schemas as well as values; value
equality with a type mismatch (e.g. DuckDB SUM(int) → HUGEINT/decimal128 vs
Spark's int64) would still fail it. This test keeps the whole registry
type-aligned as queries are added.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import run_oracle_connection

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def _coarse(t: str) -> str:
    t = str(t).lower()
    if "int" in t:
        return "int"
    if "float" in t or "double" in t or "decimal" in t:
        return "float"
    if "timestamp" in t:
        return "ts"
    if t.startswith("date32") or t == "date":
        return "date"
    if "bool" in t:
        return "bool"
    if "string" in t or "utf8" in t or "varchar" in t:
        return "str"
    return t


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = run_oracle_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(n for n in _QUERIES if n in _ORACLE))
def test_schema_type_classes_match(spark, sf_dir, duck, name):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_types = {f.name: _coarse(f.dataType.simpleString()) for f in sdf.schema.fields}
    arrow = duck.execute(_ORACLE[name]).arrow().schema
    duck_types = {f.name: _coarse(f.type) for f in arrow}
    assert spark_types == duck_types
    spark.catalog.clearCache()
