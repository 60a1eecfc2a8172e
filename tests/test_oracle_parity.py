"""Differential test: every oracle-declared query must match DuckDB on the
same parquet tables — the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_conn


def _battery():
    from py_gtfs_duckdb_spark.plans import ORACLE, QUERIES

    return QUERIES, ORACLE


QUERIES, ORACLE = _battery()


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, conn, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, conn, ORACLE[name], name)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns
