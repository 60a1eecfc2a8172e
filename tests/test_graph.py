"""Connected components: planted topologies + fixpoint behavior."""

from __future__ import annotations

from py_gtfs_duckdb_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4 -> one component labeled 1 (diameter > 1: needs rounds)
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(5, 6), (10, 11), (11, 12), (2, 7)])
    assert got == {5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 2: 2, 7: 2}


def test_long_chain_diameter(spark):
    # chain of 12 nodes exercises multi-round convergence + lineage truncation
    edges = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 12


def test_string_ids_supported(spark):
    df = spark.createDataFrame(
        [("doc_a", "doc_b"), ("doc_b", "doc_c"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a", "x": "x", "y": "x",
    }


def test_path_graph_converges_in_log_rounds(spark):
    """Adversarial high-diameter input: a 10k-node path. Min-label
    propagation needs O(n) rounds here; large-star/small-star must
    converge in O(log n) with identical components (Kiveris et al.)."""
    import math

    from py_gtfs_duckdb_spark.operators.graph import (
        _canon_edges,
        _star_components,
    )

    n = 10_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    e = _canon_edges(edges, "id_a", "id_b").localCheckpoint()
    labels, rounds = _star_components(e, e.count(), 50)
    comps = {r["id"]: r["component"] for r in labels.collect()}
    assert len(comps) == n
    assert set(comps.values()) == {0}
    assert rounds <= 2 * math.ceil(math.log2(n)), f"rounds={rounds}"


def test_star_raises_on_exhausted_iterations(spark):
    """A non-converged star edge set would emit conflicting labels for
    one node; the operator must fail loudly instead."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # threshold 0 forces the distributed star path (the union-find
        # short-circuit would otherwise resolve this tiny graph directly)
        connected_components(edges, max_iter=1, small_graph_threshold=0)


def test_star_matches_label_propagation_on_random_graphs(spark):
    """Differential test: both algorithms produce identical (id,
    component) maps on random multi-component graphs (self-loops and
    duplicate/reversed edges included)."""
    import random

    rng = random.Random(20260814)
    for _ in range(3):
        nodes = 150
        edges = [
            (rng.randrange(nodes), rng.randrange(nodes)) for _ in range(170)
        ]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        star = {
            r["id"]: r["component"]
            for r in connected_components(
                df, algorithm="star", small_graph_threshold=0
            ).collect()
        }
        label = {
            r["id"]: r["component"]
            for r in connected_components(df, algorithm="label").collect()
        }
        # default path (driver union-find for graphs this small) must be
        # indistinguishable from the distributed star result
        uf = {
            r["id"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert uf == star
        # label propagation keeps self-loop-only nodes; star's canonical
        # edge form drops self-loops, so compare on star's node set plus
        # assert the difference is exactly self-loop-only singletons
        only_label = set(label) - set(star)
        assert all(label[i] == i for i in only_label)
        assert {i: c for i, c in label.items() if i in star} == star


def test_scc_hand_cases(spark):
    """Trim-only (DAG), pure cycle, cycle+tail, two components."""
    from py_gtfs_duckdb_spark.operators.graph import (
        strongly_connected_components,
    )

    def scc(edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        rows = strongly_connected_components(df).collect()
        out = {}
        for r in rows:
            out.setdefault(r["scc"], set()).add(r["id"])
        assert sorted(x for s in out.values() for x in s) == sorted(
            {n for e in edges for n in e}
        ), "every node labeled exactly once"
        return set(frozenset(s) for s in out.values())

    # DAG chain: all singletons (settled by trimming alone)
    assert scc([(1, 2), (2, 3)]) == {
        frozenset({1}), frozenset({2}), frozenset({3})
    }
    # 3-cycle
    assert scc([(1, 2), (2, 3), (3, 1)]) == {frozenset({1, 2, 3})}
    # cycle with a tail in and a tail out
    assert scc([(0, 1), (1, 2), (2, 3), (3, 1), (3, 4)]) == {
        frozenset({0}), frozenset({1, 2, 3}), frozenset({4})
    }
    # two cycles sharing nothing + a bridge edge (still two SCCs)
    assert scc([(1, 2), (2, 1), (5, 6), (6, 5), (2, 5)]) == {
        frozenset({1, 2}), frozenset({5, 6})
    }
    # decreasing-id chain: the adversarial trim case (no node settles
    # via the peel's pivot in round one except by trimming)
    assert scc([(5, 4), (4, 3), (3, 2), (2, 1)]) == {
        frozenset({n}) for n in (1, 2, 3, 4, 5)
    }


def test_scc_nested_cycles_need_multiple_peels(spark):
    """Two cycles where the smaller-id cycle's F-label is owned by the
    OTHER cycle: {10,11} points into {1,2}, so f(10)=f(11)=1 but 1 never
    reaches them — they must wait for the second peel."""
    from py_gtfs_duckdb_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = [(1, 2), (2, 1), (10, 11), (11, 10), (10, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = strongly_connected_components(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["scc"], set()).add(r["id"])
    assert got == {1: {1, 2}, 10: {10, 11}}
