"""Connected components over near-duplicate pair edges.

Dedup pipelines emit PAIRS (MinHash/SimHash/embedding candidates), but the
action taken is per-CLUSTER: group transitively-linked documents and keep
one canonical representative. The reference has no graph operator (its
dedup surface is this repo's extension mandate); this is the standard
iterative min-label propagation, expressed as DataFrame joins:

    label(v) := min(label(v), min over neighbors label(u))

repeated to fixpoint. Rounds = cluster diameter — near-dup clusters are
shallow (most are cliques from a shared bucket), so 3-5 rounds is typical.
Each round is two shuffles (neighbor join + min-aggregate), and
``localCheckpoint`` truncates the plan lineage each round so the job does
not recompile an ever-growing DAG (swap for a reliable ``checkpoint`` dir
on a real cluster). For adversarial high-diameter graphs the
large-star/small-star formulation (Kiveris et al., "Connected Components
in MapReduce and Beyond") is the drop-in upgrade — same edge-list
interface, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable (ids keep their native orderable type — numeric or string).
    Nodes without edges don't appear (callers decide whether singletons
    form their own clusters)."""
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
