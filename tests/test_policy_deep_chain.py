"""Deep-chain guard for the q_dedup_policy oracle (VERDICT r12 Next #6).

The DuckDB oracle (`plans/extensions.py:_containment_policy_oracle_sql`)
unrolls the sinks-first keep/reject determination a FIXED ``levels=8``
deep and documents that a deeper containment chain "mismatches loudly".
This file proves that claim with a synthetic corpus whose condensed
containment DAG is a pure chain of depth 19 (each unrolled oracle level
determines one reject + one keep, i.e. TWO chain positions, so levels=8
fully determines chains up to depth ~17 — the break point is deeper than
the nominal 8):

- doc_i occupies a contiguous interval of a globally-unique word stream,
  sized so containment(doc_i in doc_{i+1}) is EXACTLY the 0.6 threshold
  (boundary-exact, also exercising the size-scaled slacked ceil), the
  reverse direction is 0.4, and doc_i shares nothing with doc_{i+2} —
  so the edge set is exactly the chain: no shortcuts, no cycles.
- The keep-policy then alternates from the sink: d19 kept, d18
  rejected, d17 kept, ... — 10 rejected docs needing 10 unroll levels.

Assertions: (1) the Spark side (containment_pairs + the distributed
cap=0 policy) resolves the true fixpoint; (2) the oracle at levels=8
DISAGREES on this corpus (it finds only the 8 rejects its unroll
reaches) — the promised loud mismatch, so a silent truncation can never
masquerade as parity; (3) the same oracle unrolled to levels=12 agrees
exactly — the disagreement is the unroll bound, not some other defect.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

N_DOCS = 20  # chain depth 19: needs 10 unroll levels > the oracle's 8


def _chain_intervals():
    """Shingle-space intervals [start, start+size) per doc: size grows
    1.5x, consecutive overlap = ceil(0.6*size_i) — the smallest integer
    overlap satisfying the engines' o >= ceil(0.6*sz_a - slack) predicate
    (boundary-minimal) — while the reverse fraction stays ~0.4 and
    non-consecutive overlaps are <= 2 shingles (far below any edge)."""
    sizes, starts = [], []
    size, start = 10, 0
    for _ in range(N_DOCS):
        sizes.append(size)
        starts.append(start)
        overlap = -((-6 * size) // 10)  # ceil(0.6 * size)
        start = start + size - overlap
        size = size * 3 // 2
    return starts, sizes


def _docs():
    """(doc_id, text) rows: doc_i = words[start_i : start_i + size_i + 2]
    of a globally-unique word stream, so its 3-shingle set is exactly the
    shingle interval [start_i, start_i + size_i)."""
    starts, sizes = _chain_intervals()
    n_words = starts[-1] + sizes[-1] + 2
    words = [f"w{t:05d}" for t in range(n_words)]
    return [
        (i, " ".join(words[starts[i] : starts[i] + sizes[i] + 2]))
        for i in range(N_DOCS)
    ]


def _expected_edges():
    """Exact containment-pair prediction from interval arithmetic."""
    starts, sizes = _chain_intervals()
    edges = set()
    for a in range(N_DOCS):
        for b in range(N_DOCS):
            if a == b:
                continue
            lo = max(starts[a], starts[b])
            hi = min(starts[a] + sizes[a], starts[b] + sizes[b])
            if max(0, hi - lo) * 10 >= 6 * sizes[a]:  # o >= 0.6*sz_a exact
                edges.add((a, b))
    return edges


def _fixpoint_rejects(edges):
    """Independent sinks-first resolution (reverse-topological fixpoint;
    the chain is a DAG so no SCC machinery needed)."""
    containers = {}
    for a, b in edges:
        containers.setdefault(a, set()).add(b)
    kept: dict[int, bool] = {}

    def survive(v):
        if v not in kept:
            kept[v] = not any(survive(u) for u in containers.get(v, ()))
        return kept[v]

    return {v for v in range(N_DOCS) if not survive(v)}


def test_chain_construction_is_exactly_the_chain():
    edges = _expected_edges()
    assert edges == {(i, i + 1) for i in range(N_DOCS - 1)}
    # alternating keep from the sink: d19 kept, d18 rejected, ...
    assert _fixpoint_rejects(edges) == {
        N_DOCS - 2 - 2 * k for k in range(N_DOCS // 2)
    }


@pytest.mark.slow
def test_oracle_unroll_bound_mismatches_loudly_on_deep_chain(spark):
    from py_gtfs_duckdb_spark.operators.dedup import containment_pairs
    from py_gtfs_duckdb_spark.plans.extensions import (
        _containment_policy_oracle_sql,
    )
    from py_gtfs_duckdb_spark.streaming.ingest import (
        containment_policy_rejects_frame,
    )

    docs = spark.createDataFrame(_docs(), "doc_id long, text string")

    # 1) the Spark pair join reproduces the predicted chain exactly
    pairs = containment_pairs(docs, "text", "doc_id", k=3, threshold=0.6)
    got_edges = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_edges == _expected_edges()

    # 2) the distributed (cap=0) policy resolves the true 19-round fixpoint
    rejects = containment_policy_rejects_frame(pairs, max_driver_pairs=0)
    got_rejects = {r["id"] for r in rejects.collect()}
    want_rejects = _fixpoint_rejects(got_edges)
    assert got_rejects == want_rejects

    # ... and so does the driver (Tarjan) path — both sides of the cap
    rejects_drv = containment_policy_rejects_frame(
        pairs, max_driver_pairs=10**9
    )
    assert {r["id"] for r in rejects_drv.collect()} == want_rejects

    # 3) the shipped oracle (levels=8) DISAGREES on depth 19 — loudly
    con = duckdb.connect()
    con.register(
        "documents",
        spark.createDataFrame(_docs(), "doc_id long, text string").toPandas(),
    )
    oracle8 = {
        r[0] for r in con.execute(_containment_policy_oracle_sql()).fetchall()
    }
    assert oracle8 != want_rejects, (
        "levels=8 oracle silently agreed on a depth-19 chain — the "
        "documented mismatch guard is broken"
    )
    # the truncation shape is exactly "the rejects the unroll reached":
    # a strict subset, short by the chain positions past level 8
    assert oracle8 < want_rejects and len(oracle8) == 8

    # 4) unrolled far enough (>= 10 levels for 10 rejects) it agrees — the
    # disagreement above is the unroll bound and nothing else
    oracle12 = {
        r[0]
        for r in con.execute(
            _containment_policy_oracle_sql(levels=12)
        ).fetchall()
    }
    assert oracle12 == want_rejects


@pytest.mark.slow
def test_oracle_sf_chain_depth_stays_inside_the_unroll(spark):
    """The invariant that keeps q_dedup_policy green at the driver SFs:
    the real testdata's containment DAG peels in <= 8 rounds (measured
    <=4; the oracle unrolls 8). If the generator ever changes shape this
    fails BEFORE the driver sees a hash mismatch."""
    from py_gtfs_duckdb_spark.operators.dedup import containment_pairs
    from py_gtfs_duckdb_spark.plans._tables import t

    d = t(spark, "/root/testdata/sf0.001", "documents")
    pairs = containment_pairs(d, "text", "doc_id", k=3, threshold=0.6)
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    depth = _condensed_peel_depth(edges)
    assert depth <= 8, f"sf0.001 containment DAG peels in {depth} > 8 rounds"


def _condensed_peel_depth(edges) -> int:
    """SCC-condense (iterative Tarjan, same shape as the policy's driver
    path) then count sink-peel rounds — the number of unrolled levels the
    oracle needs to fully determine the graph."""
    graph: dict = {}
    nodes: set = set()
    for a, b in edges:
        graph.setdefault(a, set()).add(b)
        nodes.update((a, b))
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    counter = [0]
    comp_of: dict = {}
    n_comp = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, iter(sorted(graph.get(root, ()))))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for nxt in it:
                if nxt not in index:
                    index[nxt] = low[nxt] = counter[0]
                    counter[0] += 1
                    stack.append(nxt)
                    on_stack.add(nxt)
                    work.append((nxt, iter(sorted(graph.get(nxt, ())))))
                    advanced = True
                    break
                if nxt in on_stack:
                    low[node] = min(low[node], index[nxt])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp_of[w] = n_comp[0]
                    if w == node:
                        break
                n_comp[0] += 1
    cedges = {
        (comp_of[a], comp_of[b]) for a, b in edges if comp_of[a] != comp_of[b]
    }
    cnodes = set(comp_of.values())
    depth = 0
    while cnodes:
        outs = {u for u, _ in cedges}
        sinks = cnodes - outs
        assert sinks, "condensation is not a DAG — Tarjan bug"
        cnodes -= sinks
        cedges = {(u, v) for u, v in cedges if u not in sinks and v not in sinks}
        depth += 1
    return depth
