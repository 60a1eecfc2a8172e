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


def test_harness_catches_hugeint_dtype_skew(spark, conn):
    """A value-equal but dtype-skewed oracle (DuckDB HUGEINT -> float64 vs
    Spark bigint -> int64) must FAIL locally, mirroring the driver's
    dtype-sensitive hash (the r2 q_pivot failure mode)."""
    df = spark.range(3).selectExpr("CAST(id AS BIGINT) AS id", "CAST(1 AS BIGINT) AS n")
    # SUM over BIGINT yields HUGEINT in DuckDB -> float64 via pandas.
    sql = "SELECT range AS id, SUM(CAST(1 AS BIGINT)) AS n FROM range(3) GROUP BY range"
    ok, msg = compare(df, conn, sql, "hugeint_skew_probe")
    assert not ok and "dtype skew" in msg, msg


def test_harness_accepts_int_width_skew(spark, conn):
    """int32 vs int64 is NOT a skew: both hash as integral values."""
    df = spark.range(3).selectExpr("CAST(id AS INT) AS id")
    sql = "SELECT CAST(range AS BIGINT) AS id FROM range(3)"
    ok, msg = compare(df, conn, sql, "int_width_probe")
    assert ok, msg
