"""Differential test: every registered query vs its DuckDB oracle at sf0.01.

This replicates the driver's CORRECTNESS gate locally (tests/oracle.py), so
a failing oracle never reaches the driver unseen. Queries without oracle SQL
get a rows-only check, mirroring the driver's weaker path.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_query_matches_oracle

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    if name in _ORACLE:
        assert_query_matches_oracle(df, _ORACLE[name], sf_dir)
    else:
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
