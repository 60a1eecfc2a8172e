"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the full declared battery from
``py_gtfs_duckdb_spark.plans`` (SURVEY.md §2 operator inventory + the
phase-5 extensions). ``entry`` runs the flagship query (the reference's
``fetch_nominal_operation_day_trips`` shape, ddb.py:177-202) at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from py_gtfs_duckdb_spark.plans import QUERIES

    return QUERIES["q_flagship_nominal_trips"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from py_gtfs_duckdb_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    from py_gtfs_duckdb_spark.plans import ORACLE

    return dict(ORACLE)
