"""Connected components over near-duplicate pair edges.

Dedup pipelines emit PAIRS (MinHash/SimHash/embedding candidates), but the
action taken is per-CLUSTER: group transitively-linked documents and keep
one canonical representative. The reference has no graph operator (its
dedup surface is this repo's extension mandate).

Default algorithm: the two-phase **large-star / small-star** formulation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), expressed as DataFrame joins. Each round rewires edges toward
the component minimum:

    large-star(u): emit (v, m) for v ∈ Γ(u), v > u, with m = min(Γ⁺(u))
    small-star(u): emit (v, m) for v ∈ Γ(u) ∪ {u}, with m = min(Γ⁺(u)),
                   over edges directed larger→smaller

Alternating the two halves the distance-to-minimum geometrically, so
rounds are O(log n) even on adversarial high-diameter graphs (chains of
templated near-dup web text), where plain min-label propagation needs
O(diameter) = O(n) rounds. At convergence the edge set IS the star
(v → component-min for every non-min v), so labels fall out without a
driver-side graph. ``localCheckpoint`` truncates lineage each round so
the job does not recompile an ever-growing DAG (swap for a reliable
``checkpoint`` dir on a real cluster).

The previous O(diameter) min-label propagation is kept as
``algorithm="label"`` — it is simpler to audit and equally fast on the
shallow clique-like clusters LSH buckets produce — and doubles as the
differential-testing reference for the star implementation
(tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    algorithm: str = "star",
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable (ids keep their native orderable type — numeric or string).
    Nodes without edges don't appear (callers decide whether singletons
    form their own clusters).

    SMALL-GRAPH SHORT-CIRCUIT: near-dup pair graphs are usually tiny
    relative to the corpus (LSH estimate-pruning keeps only confirmed
    pairs — sf0.1 yields ~256 edges from 5k docs), yet the star fixpoint
    pays several eagerly-materialized Spark jobs regardless. When the
    deduped edge count is at most ``small_graph_threshold``, components
    are resolved with a driver-side union-find instead — one collect of
    (u, v) id pairs (bounded: ~threshold small rows, NOT document data)
    and one createDataFrame, identical output contract. Pass
    ``small_graph_threshold=0`` to force the distributed path; the
    threshold only bounds driver memory, never correctness (differential
    test vs both distributed algorithms in tests/test_graph.py)."""
    if algorithm == "star":
        e = _canon_edges(edges, src, dst).localCheckpoint()
        n_edges = e.count()
        if 0 < n_edges <= small_graph_threshold:
            return _driver_union_find(e)
        labels, _ = _star_components(e, n_edges, max_iter)
        return labels
    if algorithm == "label":
        return _label_propagation(edges, src, dst, max_iter)
    raise ValueError(f"unknown connected-components algorithm {algorithm!r}")


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Union-find over a collected small edge set; union-by-min keeps the
    invariant root = min id of the merged components, so the final labels
    match the distributed algorithms exactly."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in e.collect():
        u, v = r.u, r.v
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)

    id_type = e.schema["u"].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("component", id_type),
        ]
    )
    rows = sorted((x, find(x)) for x in parent)
    return e.sparkSession.createDataFrame(rows, schema)


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Each input pair directed larger→smaller, nulls and self-loops
    dropped, deduped."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).na.drop()
    return (
        e.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Γ over the symmetrized edges; every neighbor strictly larger than u
    rewires to u's neighborhood minimum. Output is strictly
    larger→smaller (m ≤ u < v), so no self-loops can appear."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Over larger→smaller edges: u's smaller neighbors (and u itself)
    all rewire to the smallest of them."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))  # m < u by direction
    return (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .distinct()
    )


def _star_components(
    e: DataFrame, n_prev: int, max_iter: int
) -> tuple[DataFrame, int]:
    """Returns (labels, rounds) over pre-canonicalized checkpointed edges
    ``e`` with ``n_prev`` rows. Converged when a large-star + small-star
    round leaves the edge set unchanged — at that point every edge is
    (node, component-min)."""
    rounds = 0
    converged = n_prev == 0
    for _ in range(max_iter):
        rounds += 1
        new = _small_star(_large_star(e)).localCheckpoint()
        n_new = new.count()
        if n_new == n_prev and new.exceptAll(e).limit(1).count() == 0:
            e = new
            converged = True
            break
        e, n_prev = new, n_new
    if not converged:
        # a non-star edge set would emit CONFLICTING (id, component) rows
        # for the same node — silently corrupt clusters downstream. The
        # O(log n) bound makes this unreachable at default max_iter; an
        # explicit failure beats a silent wrong answer if a caller lowers it.
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} rounds"
        )
    labels = e.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    ).unionByName(
        e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    ).distinct()
    return labels, rounds


def _label_propagation(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """O(diameter)-round min-label propagation:
    label(v) := min(label(v), min over neighbors label(u)) to fixpoint."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select("u").distinct().withColumn("l", F.col("u"))
    for _ in range(max_iter):
        nbr = und.join(
            labels.select(F.col("u").alias("v"), "l"), "v"
        ).select("u", "l")
        new = (
            labels.unionByName(nbr).groupBy("u").agg(F.min("l").alias("l"))
        ).localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.l") != F.col("o.l"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("u").alias("id"), F.col("l").alias("component"))
