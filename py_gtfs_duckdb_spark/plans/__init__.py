"""Declared query battery.

Every operator from SURVEY.md §2 (plus the scale-path extensions) is
registered here as a named query: a callable ``(spark, sf_dir) -> DataFrame``
plus, where SQL-expressible, a DuckDB-oracle SQL string over the same parquet
tables. The driver (and ``tests/test_oracle_parity.py``) runs both sides and
compares row count + schema + order-insensitive value hash.

Conventions that make the hash comparison work (see repo contract):
- every computed column is aliased identically in Spark and SQL;
- computed integers are BIGINT on both sides, computed floats are
  ``round(x, N)`` on both sides, raw passthrough columns are untouched;
- queries with LIMIT order on a unique key first (deterministic subset);
- no UDFs in oracle-checked queries (only in rows-only extension ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Importing the modules populates the registry.
from py_gtfs_duckdb_spark.plans import relational  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import functions_battery  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import windows_battery  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import extensions  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import flagship  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
