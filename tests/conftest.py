"""Shared fixtures.

SUITE-ORDER NOTE: the SparkSession is session-scoped, so parallelism,
codegen caches, and shuffle-partition state carry across modules — a
test that passes alone can fail in full-suite order if it assumes a
file LAYOUT (how many part-files a write produced, which file is
`files[0]`). Pin layouts explicitly (`coalesce(1)` / `repartition(1)`)
or assert over the union of files, never over an index into a listing;
round 8's only red test was exactly this class of assumption. Before
committing, new tests should be run as part of their full module, not
only in isolation.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_warehouse_aws_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("wdwa-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECTNESS


@pytest.fixture(scope="session")
def sf_smoke_dir():
    return SF_SMOKE
