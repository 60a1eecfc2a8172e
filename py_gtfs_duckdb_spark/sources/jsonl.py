"""JSONL corpus source/sink — the arrival format of most web-scale text
corpora (one JSON object per line, usually gzip-shared). The GTFS side of
this engine ingests the reference's CSV formats (sources/gtfs.py,
reference csvddb.py); this is the extension-pipeline sibling for the
``documents`` table family.

Scale shape: ``spark.read.json`` with an EXPLICIT schema — never schema
inference, which costs a full extra pass over 100 TB and can widen types
differently per run. Malformed lines are retained by Spark's PERMISSIVE
mode in a corrupt-record column so ingest can COUNT and quarantine them
instead of silently dropping (FAILFAST would kill a 100 TB job for one
bad line; DROPMALFORMED hides data loss). Compression (.gz/.zst per
file) is handled by the codec layer transparently; a gzipped file is one
non-splittable partition, which is exactly how these corpora shard in
practice (many ~100 MB files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table arrival schema (doc_id may be absent upstream —
# see read_documents_jsonl(assign_ids=True))
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    assign_ids: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): parse a JSONL path (file, dir, or glob)
    against the EXPLICIT schema. ``clean`` carries rows that parsed and
    have non-null ``text``; ``quarantine`` carries the raw line of every
    malformed/structurally-empty record for audit (count it, sample it,
    file it next to the lake — never silently drop). ``assign_ids=True``
    fills missing ``doc_id`` deterministically from a line hash
    (xxhash64 of text+source — stable across runs and engines, unlike
    monotonically_increasing_id which depends on partitioning).

    Both returns are lazy single-scan plans over the same read; Spark's
    PERMISSIVE parser marks a bad line by nulling all data columns and
    filling the corrupt-record column, which is the split condition."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad = raw.filter(
        F.col(_CORRUPT).isNotNull() | F.col("text").isNull()
    ).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*schema.names))).alias(
            "raw_line"
        )
    )
    clean = raw.filter(
        F.col(_CORRUPT).isNull() & F.col("text").isNotNull()
    ).drop(_CORRUPT)
    if assign_ids:
        clean = clean.withColumn(
            "doc_id",
            F.coalesce(
                F.col("doc_id"),
                F.xxhash64(F.col("text"), F.coalesce(F.col("source"), F.lit(""))),
            ),
        )
    if "n_chars" in schema.names:
        clean = clean.withColumn(
            "n_chars",
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
        )
    return clean, bad


def write_documents_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write a documents frame back out as JSONL (optionally gzip per
    file) — the handoff format for downstream trainers that don't read
    parquet. One file per partition; size output files by repartitioning
    upstream (the export_shards convention)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
