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


def salted_collect_list(
    df,
    keys,
    value_col: str,
    n_salt: int = 16,
    out_col: str | None = None,
):
    """Skew-safe ``groupBy(keys).agg(sort_array(collect_list(value)))``.

    Algebraic aggregates (sum/count/min) are skew-immune — map-side partial
    aggregation collapses each key to one row per partition before the
    shuffle. Holistic aggregates like ``collect_list`` are NOT: every value
    of a hot key lands on one reducer, and at corpus scale a single viral
    key can hold gigabytes. AQE's skew-join splitting doesn't apply to
    aggregations, so this is the one place manual salting still earns its
    keep.

    Two phases: (1) group by (keys, salt) where salt =
    ``pmod(xxhash64(value), n_salt)`` — deterministic, so retries are
    idempotent — collecting per-salt partial lists; (2) group by keys,
    flatten the ≤ n_salt partials. The hot key's work now spreads over
    n_salt reducers; phase 2 touches only n_salt rows per key. Output is
    ``sort_array``-ed: order-canonical, engine-portable.
    """
    from pyspark.sql import DataFrame  # local: avoid cycle at import time

    assert isinstance(df, DataFrame)
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{value_col}s"
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salt)).alias("__salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sort_array(F.flatten(F.collect_list("__part"))).alias(out_col))
    )


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
