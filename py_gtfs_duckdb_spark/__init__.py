"""py_gtfs_duckdb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference ``sebastianknopf/py-gtfs-duckdb``
(studied read-only; see SURVEY.md), re-expressed Spark-first:

- Parquet lake + StructType catalog instead of an embedded DuckDB file DB
  (reference ``src/gtfsduckdb/ddb.py:20,55-64``).
- Lazy DataFrame plans optimized by Catalyst instead of DuckDB relational
  expressions (reference ``ddb.py:177-258``).
- Set-based upsert/anti-join mutation instead of row-wise DML
  (reference ``ddb.py:296-348``, ``strategy/match_stop_id.py``).
- Structured Streaming ``foreachBatch`` keyed merge instead of
  queue + 15 s repeating timer (reference ``realtime.py:42,120``,
  ``ddb.py:282-332``).

Plus scale-path extension operators (dedup, similarity search, multimodal
columns, text analysis) the reference does not have.
"""

from py_gtfs_duckdb_spark.session import get_spark


def __getattr__(name: str):
    # Lazy re-exports: importing the package must not drag the whole engine
    # (and a JVM) in; the submodules import pyspark.sql.functions eagerly.
    lazy = {
        "GtfsLake": ("py_gtfs_duckdb_spark.lake", "GtfsLake"),
        "GtfsQueries": ("py_gtfs_duckdb_spark.queries", "GtfsQueries"),
        "RealtimeMerger": ("py_gtfs_duckdb_spark.streaming.merge", "RealtimeMerger"),
        "load_config": ("py_gtfs_duckdb_spark.config", "load_config"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["get_spark", "GtfsLake", "GtfsQueries", "RealtimeMerger", "load_config"]
__version__ = "0.1.0"
