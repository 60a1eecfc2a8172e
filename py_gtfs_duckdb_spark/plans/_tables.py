"""Lazy per-table readers for the driver testdata lake.

Every declared battery query reads tables through :func:`t`, so this module
is the one place that must make the battery self-sufficient on ANY
SparkSession — including a vanilla ``SparkSession.builder.getOrCreate()``
with none of the ``session.get_spark()`` factory confs. Two confs are
load-bearing for correctness and both are runtime-settable:

- ``spark.sql.legacy.parquet.nanosAsLong``: events.parquet is physically
  INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
  (PARQUET_TYPE_ILLEGAL) unless told to surface it as a LONG.
- ``spark.sql.session.timeZone=UTC``: the DuckDB oracle is UTC-naive; any
  timestamp→string formatting or epoch extraction must agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_battery_confs(spark: SparkSession) -> None:
    """Set the session confs the battery depends on (idempotent, runtime-safe).

    Called from :func:`t` so battery queries never rely on the factory
    session; a bare ``SparkSession.builder.getOrCreate()`` works too.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_battery_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is physically TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as epoch-nanos LONG. Convert via integer division (DIV keeps 64-bit
    # integer math — a double roundtrip would lose sub-ms precision).
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df
