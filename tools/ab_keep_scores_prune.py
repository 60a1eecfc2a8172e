#!/usr/bin/env python3
"""Same-host interleaved A/B for the r14 keep-action score-prune: the
dedup actions (keep_canonical / keep_top_k) LEFT-join the cluster
membership (tiny — only docs in near-dup pairs) against a score table
computed over the WHOLE corpus. The optimizer cannot broadcast the
small LEFT side of a left-outer join (BuildLeft is unsupported for
BroadcastHashJoin LeftOuter), so at corpus scale the full score table
— and the regex quality expression that produces it — is evaluated and
shuffled for clusters that reference a sliver of it.

The r14 form semi-joins the score table down to cluster members FIRST:
Catalyst pushes the left-semi below the quality projection (the join
key is the id, not the computed score), so the quality regexes run
ONLY on cluster members and the left join sees two small sides.
Identical result set: a left join reads exactly the matching score
rows either way.

Usage: python tools/ab_keep_scores_prune.py [n_samples] [k]
  k=1 exercises keep_canonical's shape, k>=2 keep_top_k's (default 2).
One JSON line to stdout; narrative to stderr. Value identity checked
via exceptAll both ways (0 rows) or the A/B is void.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators import dedup as D
    from py_gtfs_duckdb_spark.operators import graph as G
    from py_gtfs_duckdb_spark.operators import text as X
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-keep-scores-prune")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    # fixed upstream state (not part of the A/B): pairs -> clusters,
    # materialized once so the A/B isolates the keep stage
    pairs = D.minhash_lsh_dedup(docs, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    clusters = (
        cc.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
        )
        .localCheckpoint(eager=True)
    )
    from py_gtfs_duckdb_spark.operators._scope import release_shared

    release_shared()
    spark.catalog.clearCache()
    print(f"# clusters: {clusters.count()} member rows", file=sys.stderr)

    def keep(pruned: bool):
        scores = X.quality_score(docs)
        if pruned:
            scores = scores.join(
                clusters.select("doc_id"), "doc_id", "left_semi"
            )
        j = clusters.join(scores, "doc_id", "left")
        key = D._rank_key(j, "quality", "doc_id")
        member = F.struct(
            key.getField("u").alias("u"),
            key.getField("nn").alias("nn"),
            key.getField("nq").alias("nq"),
            key.getField("i").alias("i"),
            F.col("quality").alias("s"),
        )
        salted = j.select(
            "cluster_id",
            member.alias("__m"),
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64)).alias("__salt"),
        )
        part = salted.groupBy("cluster_id", "__salt").agg(
            F.slice(F.array_sort(F.collect_list("__m")), 1, k).alias("__cand"),
            F.count(F.lit(1)).cast("bigint").alias("__cnt"),
        )
        top = part.groupBy("cluster_id").agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("__cand"))), 1, k
            ).alias("__top"),
            F.sum("__cnt").cast("bigint").alias("n_members"),
        )
        return top.select(
            "cluster_id", "n_members", F.posexplode("__top")
        ).select(
            "cluster_id",
            F.col("col.i").alias("doc_id"),
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            "n_members",
            F.col("col.s").alias("score"),
        )

    a, b = keep(False), keep(True)
    mism = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"# value check: {mism} mismatching rows", file=sys.stderr)
    assert mism == 0, "forms disagree — A/B void"

    def run(pruned: bool) -> float:
        start = time.perf_counter()
        keep(pruned).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    run(False), run(True)  # warmup

    old_t, new_t = [], []
    for i in range(n_samples):
        old_t.append(run(False))
        new_t.append(run(True))
        print(
            f"# pass {i}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s",
            file=sys.stderr,
        )

    out = {
        "metric": "ab_keep_scores_prune",
        "n_samples": n_samples,
        "k": k,
        "value_mismatches": mism,
        "old": {
            "median": round(statistics.median(old_t), 3),
            "min": round(min(old_t), 3),
            "samples": [round(v, 4) for v in old_t],
        },
        "new": {
            "median": round(statistics.median(new_t), 3),
            "min": round(min(new_t), 3),
            "samples": [round(v, 4) for v in new_t],
        },
        "median_ratio_new_over_old": round(
            statistics.median(new_t) / statistics.median(old_t), 3
        ),
        "min_ratio_new_over_old": round(min(new_t) / min(old_t), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
