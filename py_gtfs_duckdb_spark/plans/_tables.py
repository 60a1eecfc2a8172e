"""Lazy per-table readers for the driver testdata lake."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is physically TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as epoch-nanos LONG. Convert via integer division (DIV keeps 64-bit
    # integer math — a double roundtrip would lose sub-ms precision).
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df
