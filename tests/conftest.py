"""Shared fixtures: one local SparkSession per test run, a DuckDB
connection with the testdata tables registered, and the differential
oracle helper (the rebuild analog of the reference's
dplyr-as-oracle pattern, SURVEY §5.1)."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from cuplyr_spark.session import get_session

SF_DIR = os.environ.get("CUPLYR_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="cuplyr_spark_tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
