"""Sources & sinks: GTFS ZIP/CSV ingest, CSV/ZIP export, side inputs.

SURVEY.md §2.1 rows S1-S6, S13; streaming sources live in
``py_gtfs_duckdb_spark.streaming``.
"""

from py_gtfs_duckdb_spark.sources.gtfs import (
    export_static,
    export_static_zip,
    load_csv_file,
    load_static_dir,
    load_static_zip,
    project_to_schema,
)
from py_gtfs_duckdb_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)
from py_gtfs_duckdb_spark.sources.mapping import load_mapping_csv, map_id_column

__all__ = [
    "export_static",
    "export_static_zip",
    "load_csv_file",
    "load_static_dir",
    "load_static_zip",
    "project_to_schema",
    "load_mapping_csv",
    "map_id_column",
    "read_documents_jsonl",
    "write_documents_jsonl",
]
