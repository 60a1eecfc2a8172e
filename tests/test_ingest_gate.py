"""Streaming near-dup ingest gate: batch-internal burst collapse,
cross-batch rejection against the accepted corpus, artifact persistence,
and the real readStream → foreachBatch wiring."""

from __future__ import annotations

import json
import pytest
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
    or commit new segments — the isEmpty guard, not the dead
    'no columns' check the review caught."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, BASE)]), 0)
    m_docs = lake.segment_manifest("corpus_docs")
    m_bands = lake.segment_manifest("corpus_docs_bands")
    assert m_docs is not None and m_bands is not None
    empty = spark.createDataFrame([], "doc_id long, text string")
    gate.process_batch(empty, 1)
    assert lake.segment_manifest("corpus_docs") == m_docs
    assert lake.segment_manifest("corpus_docs_bands") == m_bands


def test_gate_append_path_never_scans_corpus_keys(spark, tmp_path):
    """VERDICT r4 Next #2: with a real batch id, the append path must not
    read the corpus docs table at all (it used to anti-join every table's
    FULL key column per batch for idempotency), and the stored sigs/bands
    may be read only once each — by the LSH probe, which is the index's
    job. Each append commits an O(batch) segment, not a table rewrite."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)

    reads: list[str] = []
    orig = GtfsLake.table

    def spy(self, table):
        reads.append(table)
        return orig(self, table)

    try:
        GtfsLake.table = spy
        gate.process_batch(_docs(spark, [(30, FRESH)]), 1)
    finally:
        GtfsLake.table = orig
    assert "corpus_docs" not in reads, "docs table scanned on append path"
    assert reads.count("corpus_docs_sigs") == 1, reads
    assert reads.count("corpus_docs_bands") == 1, reads
    # the new segment holds ONLY the new batch's row — O(batch) append
    m = lake.segment_manifest("corpus_docs")
    assert len(m["segments"]) == 2
    import os as _os

    last_seg = _os.path.join(str(tmp_path / "lake"), "corpus_docs", m["segments"][-1])
    seg_rows = spark.read.parquet(last_seg).collect()
    assert [r["doc_id"] for r in seg_rows] == [30]
    assert m["meta"]["ingest_batch_id"] == 1


def test_gate_mid_batch_crash_redelivery_completes_remaining_tables(spark, tmp_path):
    """Crash between the three appends: docs committed for batch N, sigs/
    bands not. Redelivery must skip the docs append (batch id recorded in
    its manifest) and complete sigs/bands exactly once."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, BASE)]), 0)

    # simulate the crash: batch 1 commits docs, then dies
    committed = {"n": 0}
    orig = GtfsLake.append_segment

    def dying(self, table, df, meta=None):
        orig(self, table, df, meta=meta)
        committed["n"] += 1
        if committed["n"] == 1:
            raise RuntimeError("simulated crash after first table commit")

    batch = _docs(spark, [(40, FRESH)])
    try:
        GtfsLake.append_segment = dying
        try:
            gate.process_batch(batch, 1)
        except RuntimeError:
            pass
    finally:
        GtfsLake.append_segment = orig
    assert lake.segment_meta("corpus_docs").get("ingest_batch_id") == 1
    assert lake.segment_meta("corpus_docs_sigs").get("ingest_batch_id") == 0

    gate.process_batch(batch, 1)  # redelivery
    assert sorted(r["doc_id"] for r in lake.table("corpus_docs").collect()) == [1, 40]
    assert sorted(r["id"] for r in lake.table("corpus_docs_sigs").collect()) == [1, 40]
    from py_gtfs_duckdb_spark.operators.dedup import LSH_BANDS

    assert lake.table("corpus_docs_bands").count() == 2 * LSH_BANDS
    # docs table: still only the two segments (batch 1 not re-appended)
    assert len(lake.segment_manifest("corpus_docs")["segments"]) == 2


def test_gate_auto_fold_bounds_segment_count(spark, tmp_path):
    """fold_every=2: after batches 0,1 the tables hold ONE folded segment
    each (plus later appends), rows and batch-id bookkeeping intact."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake, fold_every=2)
    gate.process_batch(_docs(spark, [(1, BASE)]), 0)
    gate.process_batch(_docs(spark, [(2, OTHER)]), 1)   # fold fires here
    assert len(lake.segment_manifest("corpus_docs")["segments"]) == 1
    assert lake.segment_meta("corpus_docs")["ingest_batch_id"] == 1
    gate.process_batch(_docs(spark, [(3, FRESH)]), 2)   # appends after fold
    assert len(lake.segment_manifest("corpus_docs")["segments"]) == 2
    assert sorted(r["doc_id"] for r in lake.table("corpus_docs").collect()) == [1, 2, 3]
    # dedup still works across the folded history
    gate.process_batch(_docs(spark, [(9, BASE + " tail")]), 3)  # near-dup of 1; folds
    assert sorted(r["doc_id"] for r in lake.table("corpus_docs").collect()) == [1, 2, 3]


def test_gate_fresh_checkpoint_against_old_tables_fails_loudly(spark, tmp_path):
    """Epoch ids restart at 0 under a new checkpoint; against tables
    recorded at a higher batch id that must be a hard error, not a silent
    skip of every batch until the counter catches up."""
    import pytest as _pytest

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    gate.process_batch(_docs(spark, [(1, BASE)]), 5)
    with _pytest.raises(ValueError, match="different stream checkpoint"):
        gate.process_batch(_docs(spark, [(2, OTHER)]), 0)
    # redelivery of the SAME id stays a clean no-op
    gate.process_batch(_docs(spark, [(1, BASE)]), 5)
    assert lake.table("corpus_docs").count() == 1


def test_gate_cache_empty_between_micro_batches(spark, tmp_path):
    """The scoped-persist invariant extended to the streaming path: each
    process_batch releases its own persists (signature pass + survivor
    set) on exit, so the CacheManager is empty BETWEEN micro-batches —
    including after the batch-id-mismatch error path, which used to skip
    the manual unpersists."""
    import pytest

    from py_gtfs_duckdb_spark.operators._scope import _SHARED

    def cache_empty() -> bool:
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )

    spark.catalog.clearCache()
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake)
    before = len(_SHARED)
    gate.process_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    assert cache_empty() and len(_SHARED) == before
    gate.process_batch(_docs(spark, [(10, BASE + " tail"), (11, FRESH)]), 1)
    assert cache_empty() and len(_SHARED) == before
    # error path: a smaller batch id (fresh checkpoint against old
    # tables) raises — the scope must still release everything
    with pytest.raises(ValueError, match="different stream checkpoint"):
        gate.process_batch(_docs(spark, [(20, FRESH + " x")]), 0)
    assert cache_empty() and len(_SHARED) == before


HOST = (
    " ".join(f"pre{i}" for i in range(30))
    + " " + BASE + " "
    + " ".join(f"post{i}" for i in range(30))
)


def test_gate_containment_tier_rejects_quotes(spark, tmp_path):
    """With containment_threshold set, a new doc quoted wholesale inside
    an accepted corpus doc is rejected even though its Jaccard vs the
    host is far below the near-dup threshold; unrelated docs pass."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake, containment_threshold=0.9)

    gate.process_batch(_docs(spark, [(1, HOST), (2, OTHER)]), 0)
    assert {r["doc_id"] for r in lake.table("corpus_docs").collect()} == {1, 2}

    # batch 2: doc 10 is the verbatim quote inside accepted doc 1 (low
    # Jaccard: |quote| << |host|), doc 11 is fresh
    gate.process_batch(_docs(spark, [(10, BASE), (11, FRESH)]), 1)
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert accepted == {1, 2, 11}, "quoted subset rejected by containment"
    # the Jaccard-only gate would have ACCEPTED the quote
    lake2 = GtfsLake(spark, str(tmp_path / "lake2"))
    gate2 = NearDupIngestGate(lake2)
    gate2.process_batch(_docs(spark, [(1, HOST), (2, OTHER)]), 0)
    gate2.process_batch(_docs(spark, [(10, BASE), (11, FRESH)]), 1)
    assert {r["doc_id"] for r in lake2.table("corpus_docs").collect()} == {
        1, 2, 10, 11,
    }


def test_gate_containment_tier_batch_internal_policy(spark, tmp_path):
    """One batch carries a host and its quote: the CONTAINED doc goes,
    the container survives regardless of id order. A mutual (near-equal)
    pair keeps the smaller id."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake, containment_threshold=0.9)
    # quote has the SMALLER id — min-id alone would keep the quote and
    # drop the host's superset content; the containment policy keeps the
    # host
    gate.process_batch(_docs(spark, [(3, BASE), (4, HOST), (5, OTHER)]), 0)
    assert {r["doc_id"] for r in lake.table("corpus_docs").collect()} == {4, 5}

    lake2 = GtfsLake(spark, str(tmp_path / "lake2"))
    gate2 = NearDupIngestGate(lake2, containment_threshold=0.8)
    # mutual containment (shared core, one extra word each side at the
    # SAME position so 3-shingles stay mutual): smaller id survives
    gate2.process_batch(
        _docs(spark, [(7, BASE + " xa"), (8, BASE + " xb"), (9, OTHER)]), 0
    )
    assert {r["doc_id"] for r in lake2.table("corpus_docs").collect()} == {7, 9}


def test_gate_containment_tier_redelivery_is_idempotent(spark, tmp_path):
    """Redelivering a committed batch must not self-reject accepted docs
    via their own stored artifacts (containment 1.0 against itself)."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake, containment_threshold=0.9)
    batch = _docs(spark, [(1, HOST), (2, OTHER)])
    gate.process_batch(batch, 0)
    gate.process_batch(batch, 0)  # redelivery
    docs = [r["doc_id"] for r in lake.table("corpus_docs").collect()]
    assert sorted(docs) == [1, 2], "no duplicates, no self-rejection"


def test_containment_policy_cycle_keeps_min_id():
    """A one-way containment cycle (a⊂b, b⊂c, c⊂a — possible at
    thresholds < 1) must keep exactly one member, not reject all three
    (ADVICE r10: the old pairwise join formulation lost the content)."""
    from py_gtfs_duckdb_spark.streaming.ingest import (
        _containment_policy_rejects,
    )

    assert _containment_policy_rejects([(1, 2), (2, 3), (3, 1)]) == {2, 3}
    # chain: only the doc with a SURVIVING container goes; the head of
    # the chain is re-admitted because its sole container was rejected
    assert _containment_policy_rejects([(1, 2), (2, 3)]) == {2}
    # simple quote→host: contained goes
    assert _containment_policy_rejects([(1, 2)]) == {1}
    # mutual (near-identical): min id survives
    assert _containment_policy_rejects([(1, 2), (2, 1)]) == {2}
    # diamond with a direct edge: 1⊂2⊂3 and 1⊂3 — 3 survives, both
    # others have a surviving container
    assert _containment_policy_rejects([(1, 2), (2, 3), (1, 3)]) == {1, 2}
    # two independent components resolve independently
    assert _containment_policy_rejects(
        [(1, 2), (10, 11), (11, 10)]
    ) == {1, 11}
    assert _containment_policy_rejects([]) == set()


def test_gate_containment_chain_readmits_head(spark, tmp_path):
    """a⊂b and b⊂c but a⊄c in ONE batch: c survives (sink), b goes
    (container c survives), and a is RE-ADMITTED — its only container b
    was rejected, so dropping a would lose its content (the 10% of a
    that never made it into c)."""
    p_blk = " ".join(f"p{i}" for i in range(50))
    q_blk = " ".join(f"q{i}" for i in range(12))
    q_head = " ".join(f"q{i}" for i in range(4))
    r_blk = " ".join(f"r{i}" for i in range(100))
    s_blk = " ".join(f"s{i}" for i in range(80))
    doc_a = f"{p_blk} {q_blk}"
    doc_b = f"{p_blk} {q_blk} {r_blk}"
    doc_c = f"{p_blk} {q_head} {r_blk} {s_blk}"

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    gate = NearDupIngestGate(lake, containment_threshold=0.9)
    gate.process_batch(_docs(spark, [(1, doc_a), (2, doc_b), (3, doc_c)]), 0)
    accepted = {r["doc_id"] for r in lake.table("corpus_docs").collect()}
    assert accepted == {1, 3}, "chain head re-admitted, middle rejected"


def test_containment_policy_properties():
    """Property check over random digraphs (no Spark): the resolved
    policy must never lose a weakly-connected component entirely (the
    r10 cycle bug), must reject a doc only when it has a surviving
    container or loses a kept-SCC min-id tie, and must keep every doc
    with no container at all."""
    import random

    from py_gtfs_duckdb_spark.streaming.ingest import (
        _containment_policy_rejects,
    )

    for seed in range(200):
        rng = random.Random(seed)
        n = rng.randint(2, 12)
        nodes = list(range(n))
        edges = []
        for _ in range(rng.randint(1, n * 2)):
            a, b = rng.sample(nodes, 2)
            edges.append((a, b))
        edges = sorted(set(edges))
        rejects = _containment_policy_rejects(edges)
        touched = {x for e in edges for x in e}
        kept = touched - rejects
        assert rejects <= touched, "policy must only judge docs in pairs"

        # per weakly-connected component: at least one survivor
        parent = {x: x for x in touched}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comps = {}
        for x in touched:
            comps.setdefault(find(x), set()).add(x)
        for comp in comps.values():
            assert comp & kept, f"component fully rejected: {comp} (seed {seed})"

        containers = {}
        for a, b in edges:
            containers.setdefault(a, set()).add(b)
        # a doc with no container is always kept
        for x in touched:
            if x not in containers:
                assert x in kept, (seed, x)
        # every rejected doc either has a kept container, or sits in a
        # cycle with a kept (smaller-id) member reachable through
        # rejected containers — i.e. content is preserved transitively
        for x in rejects:
            frontier, seen, ok = list(containers.get(x, ())), set(), False
            while frontier:
                c = frontier.pop()
                if c in seen:
                    continue
                seen.add(c)
                if c in kept:
                    ok = True
                    break
                frontier.extend(containers.get(c, ()))
            assert ok, f"rejected {x} has no kept transitive container (seed {seed})"


def test_distributed_policy_matches_driver_on_fuzz(spark):
    """VERDICT r11 Next #3 gate: the distributed SCC/DAG resolution
    (operators/graph.containment_rejects) must produce IDENTICAL rejects
    to the driver-side Tarjan policy on the same 200-random-digraph fuzz.
    All 200 graphs ride in ONE edge frame (node ids offset per seed —
    disjoint components resolve independently), so the distributed path
    is exercised once with trims, peels, cycles and chains all present,
    instead of 200 slow separate fixpoints."""
    import random

    from py_gtfs_duckdb_spark.streaming.ingest import (
        _containment_policy_rejects,
        containment_policy_rejects_frame,
    )

    all_edges: list[tuple[int, int]] = []
    want_rejects: set[int] = set()
    for seed in range(200):
        rng = random.Random(seed)
        n = rng.randint(2, 12)
        nodes = list(range(n))
        edges = []
        for _ in range(rng.randint(1, n * 2)):
            a, b = rng.sample(nodes, 2)
            edges.append((a, b))
        edges = sorted(set(edges))
        off = seed * 1000
        all_edges.extend((a + off, b + off) for a, b in edges)
        want_rejects.update(x + off for x in _containment_policy_rejects(edges))

    cpairs = spark.createDataFrame(all_edges, "id_a long, id_b long")
    # max_driver_pairs=0 forces the distributed path through the same
    # dispatch the CLI and the gate use
    got = {
        r["id"]
        for r in containment_policy_rejects_frame(
            cpairs, max_driver_pairs=0
        ).collect()
    }
    assert got == want_rejects


def test_policy_dispatch_driver_path_is_broadcast_anti_join(spark):
    """Below the cap the rejects come back as a broadcast-hinted frame and
    apply as a left_anti join — the plan must contain no IN-list (the
    r11 anti-pattern: ~F.col(id).isin(huge python list))."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.streaming.ingest import (
        containment_policy_rejects_frame,
    )

    cpairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (7, 8)], "id_a long, id_b long"
    )
    rejects = containment_policy_rejects_frame(cpairs)  # driver path
    assert {r["id"] for r in rejects.collect()} == {2, 3, 7}
    docs = spark.range(0, 20).select(F.col("id"))
    survivors = docs.join(rejects, "id", "left_anti")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        survivors.explain("formatted")
    plan = buf.getvalue()
    assert " IN " not in plan and "isin" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert survivors.count() == 17


def test_policy_dispatch_empty_pairs(spark):
    from py_gtfs_duckdb_spark.streaming.ingest import (
        containment_policy_rejects_frame,
    )

    cpairs = spark.createDataFrame([], "id_a long, id_b long")
    assert containment_policy_rejects_frame(cpairs).count() == 0
    assert (
        containment_policy_rejects_frame(cpairs, max_driver_pairs=0).count()
        == 0
    )


@pytest.mark.slow
def test_distributed_policy_matches_driver_on_one_big_digraph(spark):
    """One connected-ish 250-node digraph with planted cycles of length
    2/3/5 and random chains — unlike the combined small-graph fuzz, min-
    label propagation here needs multiple rounds and the peel loop runs
    more than once (nested cycles whose f-label is owned by another
    SCC)."""
    import random

    from py_gtfs_duckdb_spark.streaming.ingest import (
        _containment_policy_rejects,
        containment_policy_rejects_frame,
    )

    rng = random.Random(99)
    n = 250
    edges = set()
    # random chains
    for _ in range(500):
        a, b = rng.sample(range(n), 2)
        edges.add((a, b))
    # planted cycles (some sharing nodes with the chains)
    for ln in (2, 3, 5):
        for _ in range(15):
            cyc = rng.sample(range(n), ln)
            for i in range(ln):
                edges.add((cyc[i], cyc[(i + 1) % ln]))
    edges = sorted(edges)
    want = _containment_policy_rejects(list(edges))
    cpairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]
        for r in containment_policy_rejects_frame(
            cpairs, max_driver_pairs=0
        ).collect()
    }
    assert got == want
