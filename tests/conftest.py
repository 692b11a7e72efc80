"""Shared fixtures: one SparkSession per test session, one DuckDB
connection with the testdata tables registered as views (mirroring the
driver's oracle setup)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cnpjs_spark.catalog import TESTDATA_TABLES, table_path  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl-cnpjs-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
