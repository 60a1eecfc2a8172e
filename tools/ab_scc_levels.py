#!/usr/bin/env python3
"""Same-host interleaved A/B for the SCC/DAG level-unroll (r13
optimization): does applying SPARK_GRAFT_SCC_LEVELS_PER_JOB=2 dependency
levels per scheduled job cut q_dedup_policy's fixed scheduler cost, and
does the result stay identical?

Design: the policy resolution (containment pairs -> SCC condensation ->
sinks-first DAG determination) runs INTERLEAVED with levels_per_job=1
(the level-exact r12 shape) and =2, sample i of each form back to back,
so ambient drift hits both forms equally. The containment pair frame is
computed ONCE and localCheckpointed so the A/B isolates the iterative
resolution (the unroll's target), not the shared prefix join. Reject
sets are asserted identical every sample.

Usage: python tools/ab_scc_levels.py [n_samples]   (default 6)
Writes one JSON line to stdout; narrative to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from py_gtfs_duckdb_spark.operators import graph as G
    from py_gtfs_duckdb_spark.operators.dedup import containment_pairs
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-scc-levels")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    # shared front-end, materialized once: the unroll targets the
    # iterative resolution only
    pairs = (
        containment_pairs(docs, "text", "doc_id", k=3, threshold=0.6)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_pairs = pairs.count()

    def run_form(lv: int) -> tuple[float, frozenset, dict]:
        start = time.perf_counter()
        rejects = frozenset(
            r["id"]
            for r in G.containment_rejects(
                pairs, levels_per_job=lv
            ).collect()
        )
        elapsed = time.perf_counter() - start
        stats = dict(G.SCC_LAST_RUN_STATS)
        stats["dag_rounds"] = G.LAST_RUN_STATS.get("dag_rounds")
        return elapsed, rejects, stats

    # warmup pass of each form (codegen), uncounted
    _, ref_rejects, stats1 = run_form(1)
    _, r2, stats2 = run_form(2)
    assert r2 == ref_rejects, "reject sets differ between unroll forms"

    t1: list[float] = []
    t2: list[float] = []
    for i in range(n_samples):
        e1, ra, _ = run_form(1)
        e2, rb, _ = run_form(2)
        assert ra == ref_rejects and rb == ref_rejects
        t1.append(e1)
        t2.append(e2)
        print(
            f"# sample {i}: lv1 {e1:.3f}s  lv2 {e2:.3f}s",
            file=sys.stderr,
        )

    med1, med2 = statistics.median(t1), statistics.median(t2)
    out = {
        "n_samples": n_samples,
        "n_pairs": n_pairs,
        "n_rejects": len(ref_rejects),
        "lv1_median_s": round(med1, 3),
        "lv2_median_s": round(med2, 3),
        "lv2_over_lv1": round(med2 / med1, 3),
        "lv1_min_s": round(min(t1), 3),
        "lv2_min_s": round(min(t2), 3),
        "stats_lv1": stats1,
        "stats_lv2": stats2,
        "samples_lv1": [round(v, 3) for v in t1],
        "samples_lv2": [round(v, 3) for v in t2],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
