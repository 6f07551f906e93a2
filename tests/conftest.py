"""Shared fixtures: one warmed SparkSession + one DuckDB connection per
pytest session (session startup is ~10 s — amortized per SURVEY.md §4.3)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from highspeedrailwaybigdatasystem_spark.session import build_session

    s = build_session("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from highspeedrailwaybigdatasystem_spark.schemas import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
