"""Shared fixtures: one SparkSession + one DuckDB oracle connection."""

from __future__ import annotations

import os

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.catalog import TABLES
from ex9_big_data_gal_drimer_spark.session import get_spark

#: Tests verify correctness at the smallest scale; the bench covers speed.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ex9-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
