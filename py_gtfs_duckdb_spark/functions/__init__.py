"""Engine-portable scalar helpers."""

from __future__ import annotations

import os

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


_WIDE_PLAN_NODES = {
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "Repartition",
    "RepartitionByExpression",
    "Deduplicate",
    "Intersect",
    "Except",
}


def _plan_has_wide_op(jplan) -> bool:
    """True if any logical-plan node class is a shuffle-introducing
    operator (recursive walk over the py4j plan tree)."""
    if jplan.getClass().getSimpleName() in _WIDE_PLAN_NODES:
        return True
    children = jplan.children()
    return any(
        _plan_has_wide_op(children.apply(i)) for i in range(children.size())
    )


def _parse_byte_conf(value: str) -> int:
    """Parse Spark byte-size conf strings ('134217728b', '128m', '1g')."""
    v = value.strip().lower()
    units = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if v and v[-1] in units:
        return int(float(v[:-1]) * units[v[-1]])
    return int(v)


def fan_out(df, min_ratio: float = 0.5):
    """Ensure a CPU-dense narrow stage actually parallelizes.

    Small single-file Parquet inputs (one row group) arrive as ONE
    partition, which serializes embarrassingly-parallel per-row work
    (hashing, shingling, vector math) onto one core. The split count is
    estimated from the scan's file index only (``df.inputFiles()`` +
    ``spark.sql.files.maxPartitionBytes``) — metadata already cached by
    the relation, no plan-time RDD materialization. If the estimate falls
    below ``min_ratio ×`` default parallelism, repartition up to default
    parallelism — the shuffle moves only the (small, by construction)
    input. At real scale inputs span many files/splits, the estimate
    clears the bar, and this is a NO-OP that never shuffles big data.
    Non-file frames (in-memory relations, post-shuffle stages) pass
    through untouched.
    """
    from pyspark.sql import DataFrame  # local: avoid cycle at import time

    assert isinstance(df, DataFrame)
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    # inputFiles() sees through to leaf scans, so a derived frame whose
    # plan already shuffles (agg/join/window/...) would re-shuffle here for
    # nothing. Walk the analyzed logical plan's NODE CLASSES (computed
    # lazily once and cached by the session — no optimization or physical
    # planning) and pass such frames through. Exact class names, not a
    # rendered-string search: a file path like /data/Sorted/ or a column
    # alias WindowStart must not disable the guard.
    try:
        if _plan_has_wide_op(df._jdf.queryExecution().analyzed()):
            return df
    except Exception:
        pass  # non-classic backends: fall through to the file heuristic
    splits = len(files)
    if splits < max(1, int(target * min_ratio)):
        # count real split potential: local files split at maxPartitionBytes
        try:
            max_pb = _parse_byte_conf(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            )
            total = sum(
                os.path.getsize(f[len("file:") :] if f.startswith("file:") else f)
                for f in files
                if not f.startswith(("hdfs:", "s3", "abfs", "gs:", "wasb"))
            )
            splits = max(splits, -(-total // max_pb))
        except OSError:
            pass  # remote/unstattable paths: fall back to the file count
    if splits < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df
