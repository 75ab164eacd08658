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
