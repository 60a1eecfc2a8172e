"""Streaming histogram stats recorder: lossless per-batch count
segments, idempotent redelivery, and drift-from-persisted-counts equal
to the direct corpus computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.operators.pipeline import (
    histogram_counts,
    histogram_drift,
)
from py_gtfs_duckdb_spark.streaming.stats import HistogramStatsRecorder


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


B1 = [(1, "a", 5), (2, "a", 9), (3, "b", 120), (4, "b", 118)]
B2 = [(5, "a", 7), (6, "b", 125), (7, "c", 60), (8, "c", 64)]


def _recorder(spark, tmp_path, name="lake", **kw):
    lake = GtfsLake(spark, str(tmp_path / name))
    return HistogramStatsRecorder(
        lake, value_col="n_tokens", by="source", n_bins=32, lo=0.0, hi=128.0,
        **kw,
    )


def test_recorder_counts_merge_losslessly(spark, tmp_path):
    """Folded union of per-batch segments == one-shot histogram of the
    concatenated corpus — the fixed-grid mergeability contract."""
    rec = _recorder(spark, tmp_path)
    rec.process_batch(_batch(spark, B1), 0)
    rec.process_batch(_batch(spark, B2), 1)
    got = {
        (r["source"], r["bin"]): r["cnt"]
        for r in rec.counts()
        .groupBy("source", "bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .collect()
    }
    want = {
        (r["source"], r["bin"]): r["cnt"]
        for r in histogram_counts(
            _batch(spark, B1 + B2), "n_tokens", "source",
            n_bins=32, lo=0.0, hi=128.0,
        ).collect()
    }
    assert got == want


def test_recorder_drift_equals_direct(spark, tmp_path):
    """drift() from persisted counts == histogram_drift straight over the
    concatenated corpus — no document is rescanned to get it."""
    rec = _recorder(spark, tmp_path)
    rec.process_batch(_batch(spark, B1), 0)
    rec.process_batch(_batch(spark, B2), 1)
    got = {r["source"]: (r["n"], r["ks"], r["psi"]) for r in rec.drift().collect()}
    want = {
        r["source"]: (r["n"], r["ks"], r["psi"])
        for r in histogram_drift(
            _batch(spark, B1 + B2), "n_tokens", "source",
            n_bins=32, lo=0.0, hi=128.0,
        ).collect()
    }
    assert got == want
    # the planted shape: 'a' (low bins) drifts hard vs b+c (high bins)
    assert got["a"][1] > 0.9


def test_recorder_redelivery_and_stale_checkpoint(spark, tmp_path):
    import pytest

    rec = _recorder(spark, tmp_path)
    b = _batch(spark, B1)
    rec.process_batch(b, 0)
    rec.process_batch(b, 0)  # redelivery: no double counts
    total = rec.counts().agg(F.sum("cnt")).first()[0]
    assert total == len(B1)
    with pytest.raises(ValueError, match="different stream checkpoint"):
        rec.process_batch(_batch(spark, B2), -1)
    # empty batches are a no-op
    rec.process_batch(_batch(spark, []), 5)
    assert rec.counts().agg(F.sum("cnt")).first()[0] == len(B1)


def test_recorder_fold_bounds_segments(spark, tmp_path):
    rec = _recorder(spark, tmp_path, fold_every=2)
    for i, rows in enumerate((B1, B2, B1, B2)):
        rec.process_batch(_batch(spark, [(r[0] + 100 * i,) + r[1:] for r in rows]), i)
    # after folding, counts still correct
    total = rec.counts().agg(F.sum("cnt")).first()[0]
    assert total == 2 * (len(B1) + len(B2))


def test_recorder_quantiles_equal_direct(spark, tmp_path):
    from py_gtfs_duckdb_spark.operators.pipeline import histogram_quantiles

    rec = _recorder(spark, tmp_path)
    rec.process_batch(_batch(spark, B1), 0)
    rec.process_batch(_batch(spark, B2), 1)
    got = {
        r["source"]: (r["n"], r["p25"], r["p50"], r["p75"], r["p95"])
        for r in rec.quantiles().collect()
    }
    want = {
        r["source"]: (r["n"], r["p25"], r["p50"], r["p75"], r["p95"])
        for r in histogram_quantiles(
            _batch(spark, B1 + B2), "n_tokens", "source",
            n_bins=32, lo=0.0, hi=128.0,
        ).collect()
    }
    assert got == want
