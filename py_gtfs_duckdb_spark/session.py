"""SparkSession factory tuned for this engine.

Local test topology is ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen to also hold on a multi-executor cluster:

- AQE on (runtime join-strategy switch, partition coalescing, skew-join
  splitting) so plans self-correct at 100 TB where static estimates fail.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (DuckDB timestamps are UTC-naive).
- Arrow enabled for the pandas-UDF slow path (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "py-gtfs-duckdb-spark"


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert (lossless — data is µs-grained).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Small-dim broadcast: all GTFS dimension tables (routes/stops/agency/
        # calendar*) and TPC-H dims comfortably fit; raise threshold a bit.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True):
    """Read the driver testdata parquet tables; optionally register temp views.

    Returns dict name -> DataFrame. Reads are lazy; Catalyst prunes
    columns/predicates per consuming query.
    """
    out = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
