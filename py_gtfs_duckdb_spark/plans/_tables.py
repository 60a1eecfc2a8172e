"""Lazy per-table readers for the driver testdata lake.

Every declared battery query reads tables through :func:`t`, so this module
is the one place that must make the battery self-sufficient on ANY
SparkSession — including a vanilla ``SparkSession.builder.getOrCreate()``
with none of the ``session.get_spark()`` factory confs. Two confs are
load-bearing for correctness and both are runtime-settable:

- ``spark.sql.legacy.parquet.nanosAsLong``: events.parquet is physically
  INT64 TIMESTAMP(NANOS). Depending on the Spark version that surfaces
  three ways — epoch-nanos LONG (with this legacy conf), TIMESTAMP_NTZ
  (Spark 4.1+ native nanos read, micros-truncated), or plain TIMESTAMP —
  and :func:`t` normalizes all three to TIMESTAMP (LTZ).
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
    return normalize_event_ts(df, "ts")


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a physically-TIMESTAMP(NANOS) column to TIMESTAMP (LTZ).

    Depending on the Spark version/confs a nanos timestamp surfaces as
    epoch-nanos LONG (legacy nanosAsLong), TIMESTAMP_NTZ (Spark 4.1+
    native nanos read, micros-truncated), or already TIMESTAMP. With the
    UTC session timezone set, the NTZ→LTZ cast and the integer
    nanos→micros division land on the same instant the DuckDB oracle
    sees. Shared by the battery reader :func:`t` and the events CLI verb
    (which takes arbitrary parquet paths)."""
    for field in df.schema.fields:
        if field.name != ts_col:
            continue
        if isinstance(field.dataType, T.LongType):
            # DIV keeps 64-bit integer math — a double roundtrip would
            # lose sub-ms precision. DIV truncates toward zero while the
            # native NTZ read floor-truncates, so pre-epoch (negative)
            # nanos need the remainder adjustment to land on the same
            # microsecond.
            df = df.withColumn(
                ts_col,
                F.expr(
                    f"timestamp_micros(`{ts_col}` DIV 1000 - "
                    f"CASE WHEN `{ts_col}` % 1000 < 0 THEN 1 ELSE 0 END)"
                ),
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast(T.TimestampType()))
    return df
