"""Shared Spark session + the reference suite's canonical fixtures.

Fixture values are the exact literals from the reference tests (see
FIXTURES.md; reference ``tests/test_stats.py:20-81``), so golden values are
directly comparable.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("alphastats-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        # keep saveAsTable tests from dropping spark-warehouse/ in the repo
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="as_wh_"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


SIMPLE_RETURNS = [0.01, -0.02, 0.03, -0.01, 0.02]
ASSET_B = [0.02, -0.01, 0.01, 0.03, -0.02]
BENCHMARK = [0.005, -0.01, 0.015, -0.005, 0.01]
DATES_5 = [dt.date(2023, 1, i) for i in range(1, 6)]


@pytest.fixture
def simple_returns_series():
    return pd.Series(SIMPLE_RETURNS, name="returns")


@pytest.fixture
def simple_returns_df(spark):
    return spark.createDataFrame(
        list(zip(DATES_5, SIMPLE_RETURNS, ASSET_B)), "date date, asset_a double, asset_b double"
    )


@pytest.fixture
def simple_benchmark_series():
    return pd.Series(BENCHMARK, name="_benchmark_returns")


@pytest.fixture
def simple_benchmark_df(spark):
    return spark.createDataFrame(
        list(zip(DATES_5, BENCHMARK)), "date date, _benchmark_returns double"
    )


@pytest.fixture
def benchmark_different_dates(spark):
    dates = [dt.date(2023, 1, i) for i in range(1, 8)]
    vals = [0.005, -0.01, 0.015, -0.005, 0.01, 0.008, -0.003]
    return spark.createDataFrame(
        list(zip(dates, vals)), "date date, _benchmark_returns double"
    )


@pytest.fixture
def returns_with_nulls():
    return pd.Series([0.01, None, 0.03, -0.01, None], name="returns", dtype="float64")


@pytest.fixture
def extreme_returns():
    return pd.Series([0.5, -0.8, 1.2, -0.9, 0.3], name="returns")
