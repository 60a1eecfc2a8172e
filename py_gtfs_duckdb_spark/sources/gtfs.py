"""GTFS static feed ingest & export (reference: ddb.py:66-126,350-385).

Ingest contract (mirrors ``GtfsDuckDB.load_static`` / ``_load_txt_file``):

- a GTFS ZIP's member ``<table>.txt`` files route to same-named tables
  (ddb.py:68-73); unknown members are skipped;
- the CSV header is projected onto the declared schema: file columns absent
  from the table are dropped, table columns absent from the file become
  NULL (ddb.py:362-368,380);
- all values are read as strings and cast to the declared types
  (ddb.py:370-380) — Spark's PERMISSIVE mode nulls uncastable cells the way
  DuckDB's loose TEXT→typed insert casts do;
- primary keys are enforced by dedup at write time (DuckDB raises on PK
  violation, ddb.py:379-384; Spark has no constraints — SURVEY §7 hard
  part 3).

Scale note: a ZIP is not splittable, so members are extracted driver-side
once and each member is then read by the distributed CSV reader — the
reference's 1M-row batch buffering (ddb.py:22,377-384) is obsolete because
executors partition the file natively. On a cluster the extract lands on
shared storage instead of a local tempdir; the per-member read plan is
identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.schemas import PRIMARY_KEYS, STATIC_SCHEMAS


def project_to_schema(df: DataFrame, table: str) -> DataFrame:
    """Header projection (ddb.py:362-368): keep file columns declared for
    ``table`` (casting each to its declared type), add missing declared
    columns as typed NULLs. Column order = declaration order."""
    schema = STATIC_SCHEMAS[table]
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def load_csv_file(
    spark: SparkSession, table: str, path: str, sep: str = ","
) -> DataFrame:
    """One GTFS member file → schema-projected DataFrame (ddb.py:350-380).

    The raw read is header-driven and untyped (every value a string, as the
    reference accumulates rows); typing happens in the projection so that a
    malformed cell nulls out instead of poisoning the whole row."""
    raw = spark.read.csv(path, header=True, sep=sep, mode="PERMISSIVE")
    return project_to_schema(raw, table)


def _member_table(name: str) -> str | None:
    base = os.path.basename(name)
    if not base.endswith(".txt"):
        return None
    table = base[: -len(".txt")]
    return table if table in STATIC_SCHEMAS else None


def load_static_dir(lake: GtfsLake, directory: str, append: bool = False) -> list[str]:
    """Load every recognized ``<table>.txt`` in ``directory`` into the lake.
    Returns the tables loaded. ``append=True`` unions onto existing data
    (feed merge); default replaces, both with PK dedup."""
    loaded = []
    for entry in sorted(os.listdir(directory)):
        table = _member_table(entry)
        if table is None:
            continue
        df = load_csv_file(lake.spark, table, os.path.join(directory, entry))
        if append:
            lake.append(table, df)
        else:
            lake.write(table, df)
        loaded.append(table)
    return loaded


def load_static_zip(lake: GtfsLake, zip_path: str, append: bool = False) -> list[str]:
    """≙ ``GtfsDuckDB.load_static`` (ddb.py:66-73): extract members once
    (driver-side — ZIP isn't splittable), then distributed per-member CSV
    reads."""
    tmp = tempfile.mkdtemp(prefix="gtfs_zip_")
    try:
        with zipfile.ZipFile(zip_path) as zf:
            members = [m for m in zf.namelist() if _member_table(m)]
            for m in members:
                target = os.path.join(tmp, os.path.basename(m))
                with zf.open(m) as src, open(target, "wb") as dst:
                    shutil.copyfileobj(src, dst)
        return load_static_dir(lake, tmp, append=append)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_single_csv(df: DataFrame, dest_txt: str) -> None:
    """GTFS requires ONE ``<table>.txt`` per table, so the export edge
    coalesces to a single writer task (ddb.py:100-103 writes one CSV per
    table the same way). Only the export edge pays this; analytical outputs
    stay partitioned."""
    tmp = dest_txt + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").csv(tmp, header=True)
    part = next(
        os.path.join(tmp, f) for f in os.listdir(tmp) if f.startswith("part-")
    )
    shutil.move(part, dest_txt)
    shutil.rmtree(tmp, ignore_errors=True)


def export_static(lake: GtfsLake, out_dir: str, tables: list[str] | None = None) -> list[str]:
    """≙ ``export_static(directory)`` (ddb.py:100-103): per table
    ``<out_dir>/<table>.txt``. Empty tables export headers only."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for table in tables or list(STATIC_SCHEMAS):
        if tables is None and not lake.exists(table):
            continue
        _write_single_csv(lake.table(table), os.path.join(out_dir, f"{table}.txt"))
        written.append(table)
    return written


def export_static_zip(lake: GtfsLake, zip_path: str, tables: list[str] | None = None) -> list[str]:
    """≙ ``export_static_zip`` (ddb.py:105-126): temp CSVs → DEFLATE ZIP.
    (The reference's temp-file cleanup iterates the wrong collection,
    ddb.py:124-126, leaving temp files behind — fixed here by removing the
    whole temp dir.)"""
    tmp = tempfile.mkdtemp(prefix="gtfs_export_")
    try:
        written = export_static(lake, tmp, tables=tables)
        with zipfile.ZipFile(zip_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for table in written:
                zf.write(os.path.join(tmp, f"{table}.txt"), arcname=f"{table}.txt")
        return written
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_report(lake: GtfsLake) -> dict[str, int]:
    """PK-uniqueness validator (SURVEY §7 hard part 3): rows per table whose
    primary key occurs more than once. All zeros on a healthy lake."""
    out = {}
    for table, pk in PRIMARY_KEYS.items():
        if not lake.exists(table):
            continue
        df = lake.table(table)
        dupes = (
            df.groupBy(*pk)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("total"))
            .first()["total"]
        )
        out[table] = int(dupes)
    return out
