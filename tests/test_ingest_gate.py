"""Streaming near-dup ingest gate: batch-internal burst collapse,
cross-batch rejection against the accepted corpus, artifact persistence,
and the real readStream → foreachBatch wiring."""

from __future__ import annotations

import json
import os

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.streaming.ingest import (
    NearDupIngestGate,
    run_ingest_stream,
)

BASE = " ".join(f"tok{i}" for i in range(40))
OTHER = " ".join(f"other{i}" for i in range(40))
FRESH = " ".join(f"fresh{i}" for i in range(40))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gate_rejects_cross_batch_near_dups(spark, tmp_path):
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)

    gate.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert accepted == {1, 2}

    # batch 2: a near-dup of doc 1, and a genuinely new doc
    gate.process_batch(_docs(spark, [(10, BASE + " tail"), (11, FRESH)]), 1)
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert accepted == {1, 2, 11}, "near-dup of accepted corpus rejected"
    # artifacts track accepted docs only
    assert {r["id"] for r in lake.table("corpus_docs_sigs").collect()} == {1, 2, 11}
    bands = lake.table("corpus_docs_bands")
    assert {r["id"] for r in bands.collect()} == {1, 2, 11}


def test_gate_collapses_batch_internal_burst(spark, tmp_path):
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    # three near-identical docs arrive in ONE batch: smallest id survives
    gate.process_batch(
        _docs(spark, [(5, BASE), (6, BASE + " x"), (7, BASE + " y"), (8, OTHER)]),
        0,
    )
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert accepted == {5, 8}


def test_run_ingest_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b1.json", "w") as fh:
        for i, text in [(1, BASE), (2, OTHER)]:
            fh.write(json.dumps({"doc_id": i, "text": text}) + "\n")

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest_stream(
        spark, gate, str(src), "doc_id long, text string", checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    assert {r["doc_id"] for r in lake.table("corpus_docs").collect()} == {1, 2}

    # second file lands; the SAME checkpoint processes only the new file
    with open(src / "b2.json", "w") as fh:
        for i, text in [(20, BASE + " more"), (21, FRESH)]:
            fh.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    q2 = run_ingest_stream(
        spark, gate, str(src), "doc_id long, text string", checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    assert {r["doc_id"] for r in lake.table("corpus_docs").collect()} == {1, 2, 21}


def test_gate_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME batch (e.g.
    after a crash between the three table appends) must not duplicate
    rows in any table."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    batch = _docs(spark, [(1, BASE), (2, OTHER)])
    gate.process_batch(batch, 0)
    gate.process_batch(batch, 0)  # redelivery
    assert lake.table("corpus_docs").count() == 2
    assert lake.table("corpus_docs_sigs").count() == 2
    assert sorted(r["doc_id"] for r in lake.table("corpus_docs").collect()) == [1, 2]
    # bands: LSH_BANDS rows per doc, not doubled
    from py_gtfs_duckdb_spark.operators.dedup import LSH_BANDS

    assert lake.table("corpus_docs_bands").count() == 2 * LSH_BANDS


def test_gate_corpus_check_runs_before_burst_collapse(spark, tmp_path):
    """Near-dup is not transitive: batch doc B whose only near-dup is a
    batch-mate A that the CORPUS check rejects must still be accepted.
    Collapsing the batch first would lose B forever."""
    P = [f"p{i}" for i in range(92)]
    U = [f"u{i}" for i in range(10)]
    V = [f"v{i}" for i in range(10)]
    W = [f"w{i}" for i in range(13)]
    x_text = " ".join(P + U)
    a_text = " ".join(P + V)            # jaccard(A, X) = 0.818 -> rejected
    b_text = " ".join(P[:75] + V + W)   # 0.704 to A, 0.594 to X -> accepted

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, x_text)]), 0)
    gate.process_batch(_docs(spark, [(10, a_text), (11, b_text)]), 1)
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert 10 not in accepted, "A near-dups the corpus"
    assert 11 in accepted, "B's only near-dup was itself rejected"


def test_gate_empty_batch_is_a_noop(spark, tmp_path):
    """A zero-row micro-batch (common between triggers) must not run jobs
    or publish new table versions — the isEmpty guard, not the dead
    'no columns' check the review caught."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, BASE)]), 0)
    v_docs = lake.current_version("corpus_docs")
    v_bands = lake.current_version("corpus_docs_bands")
    empty = spark.createDataFrame([], "doc_id long, text string")
    gate.process_batch(empty, 1)
    assert lake.current_version("corpus_docs") == v_docs
    assert lake.current_version("corpus_docs_bands") == v_bands
