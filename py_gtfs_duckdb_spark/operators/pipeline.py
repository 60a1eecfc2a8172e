"""Training-data pipeline composition operators: deterministic sampling,
benchmark decontamination, and sequence packing.

These are the corpus-curation steps between "raw documents" and "training
mix" that a 100 TB pipeline runs after dedup/quality/lang-id (all in
operators/text.py, operators/dedup.py):

- **stratified hash sampling** — reproducible per-stratum keep rates
  (e.g. re-weight languages in the mix). The keep decision is a pure
  column expression on an md5-derived unit hash, so it is deterministic
  across runs AND across engines (the DuckDB oracle computes the same
  bytes), shuffles nothing, and scans each row once. No RNG state, no
  sample() nondeterminism.
- **decontamination** — drop/flag corpus documents sharing winnowed
  fingerprints (operators/text.py:winnow_fingerprints) with a held-out
  benchmark set. The benchmark side is tiny by construction, so the
  fingerprint join broadcasts; the corpus side stays partition-local.
- **sequence packing** — assign documents to fixed-token-budget bins for
  training batch assembly. Policy: budget-boundary packing — documents
  are laid out in a deterministic order within hash shards, and a bin is
  every contiguous ``budget``-token slice of the running total
  (documents are never split; a document straddling a boundary belongs
  to the bin its first token falls in). One window shuffle per shard,
  no driver-side state; shards keep window partitions bounded at any
  corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators.text import token_count, winnow_fingerprints


def unit_hash(col: Column, mod: int = 10_000) -> Column:
    """Deterministic uniform int in [0, mod) from md5 — engine-portable
    (DuckDB: ``('0x' || substr(md5(x), 1, 8))::BIGINT % mod``)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % mod
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by
    ``unit_hash(key)`` — reproducible, join-free, single scan."""
    threshold = F.lit(int(default_rate * 10_000))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 10_000))
        ).otherwise(threshold)
    return df.where(unit_hash(F.col(key_col)) < threshold)


def decontaminate(
    docs: DataFrame,
    benchmark_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shared): corpus documents sharing >= 1 winnowed
    fingerprint with the benchmark partition (``benchmark_pred`` selects
    benchmark rows). Callers anti-join the result against the corpus to
    drop contaminated documents; returning the overlap count keeps the
    evidence auditable. The benchmark fingerprint set is broadcast."""
    # Winnowing is per-document, so each side fingerprints only ITS OWN
    # partition of the corpus: the tiny benchmark side never triggers a
    # full-corpus winnow pass, and no fps↔membership join is needed.
    bench_fps = (
        winnow_fingerprints(docs.where(benchmark_pred), text_col, id_col)
        .select("fp")
        .distinct()
    )
    corpus_fps = winnow_fingerprints(docs.where(~benchmark_pred), text_col, id_col)
    return (
        corpus_fps.join(F.broadcast(bench_fps), "fp")
        .groupBy("id")
        .agg(F.count_distinct("fp").cast("bigint").alias("n_shared"))
        .select(F.col("id").alias("doc_id"), "n_shared")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, n_tokens, bin): budget-boundary packing. Documents
    order by id within ``id % n_shards`` shards; bin = floor(exclusive
    running token total / budget). Deterministic, windowable in any SQL
    engine, and shard-parallel — the window never sees more than one
    shard, so partitions stay bounded as the corpus grows."""
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return tk.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(float(budget)))
        .cast("bigint")
        .alias("bin"),
    )
