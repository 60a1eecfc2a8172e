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
