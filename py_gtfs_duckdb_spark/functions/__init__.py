"""Engine-portable scalar helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, digits: int = 4) -> Column:
    """Portable rounding: ``floor(x * 10^d + 0.5) / 10^d``.

    Spark's ``round()`` converts the double to its shortest decimal string
    (Java BigDecimal) before rounding, while DuckDB rounds the raw double —
    at exact .5 boundaries of rational results (e.g. 0.37625 stored as
    0.3762499999…) the two disagree. This idiom is pure IEEE-double
    arithmetic, so any engine evaluating the same expression tree gets the
    same bits. The SQL-oracle equivalent is
    ``floor(x * 10000 + 0.5) / 10000.0``.
    """
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def pround_sql(expr: str, digits: int = 4) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def fan_out(df, min_ratio: float = 0.5):
    """Ensure a CPU-dense narrow stage actually parallelizes.

    Small single-file Parquet inputs (one row group) arrive as ONE
    partition, which serializes embarrassingly-parallel per-row work
    (hashing, shingling, vector math) onto one core. If the frame has
    fewer partitions than ``min_ratio ×`` the cluster's default
    parallelism, repartition up to default parallelism — the shuffle moves
    only the (small, by construction) input. At real scale inputs span
    many splits and this is a NO-OP, so the guard never shuffles big data.
    """
    from pyspark.sql import DataFrame  # local: avoid cycle at import time

    assert isinstance(df, DataFrame)
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df
