#!/usr/bin/env python3
"""Same-host interleaved A/B for the r14 containment-join restructure:
does collapsing duplicate candidate pairs BEFORE the verify joins beat
the r13 shape (duplicates ride through both array-carrying verify joins
and each one pays its own array_intersect, collapsing only at the END)?

Why the hypothesis: the containment candidate join emits one row per
SHARED A-prefix hash (the B side is the full inverted index — no
positional upper bound like the symmetric Jaccard join's prefix×prefix
form), so a true pair at threshold 0.6 can surface ~0.4·|A| duplicate
times; the Jaccard join's measured ~4% dupes justified late dedup
there, but containment's dup factor is structurally larger. Each
duplicate re-joins hs_a/hs_b (KB-sized arrays) and re-runs the
intersection.

Design (ab_banded_minhash.py / SCALING §17 pattern): both forms run
INTERLEAVED in one process, sample i of OLD immediately followed by
sample i of NEW. Each sample computes the full q_dedup_containment
result (threshold 0.6) and its row count; counts must match or the A/B
is void. Also prints the candidate-duplication factor once (pairs
before vs after dedup) so the shape claim is a number, not a guess.

Usage: python tools/ab_containment_dedup.py [n_samples]   (default 8)
One JSON line to stdout; narrative to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.6


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.functions import pround
    from py_gtfs_duckdb_spark.operators._scope import release_shared, shared
    from py_gtfs_duckdb_spark.operators.dedup import (
        _containment_candidates,
        shingle_sets,
        slacked_ceil,
    )
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-containment-dedup")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    def verify(pairs, sets_a, sets_b):
        sa = sets_a.select(
            F.col("id").alias("id_a"),
            F.col("hs").alias("hs_a"),
            F.col("sz").alias("sz_a"),
        )
        sb = sets_b.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
        n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
        return (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                n_inter.cast("bigint")
                >= slacked_ceil(F.col("sz_a") * THRESHOLD, F.col("sz_a"))
            )
            .select(
                "id_a",
                "id_b",
                pround(n_inter.cast("double") / F.col("sz_a"), 4).alias(
                    "containment"
                ),
            )
        )

    def run_form(new: bool) -> tuple[float, int]:
        start = time.perf_counter()
        sets = shared(shingle_sets(docs, "text", "doc_id", 3))
        cand = _containment_candidates(sets, sets, THRESHOLD, True)
        if new:
            out = verify(
                cand.dropDuplicates(["id_a", "id_b"]), sets, sets
            )
        else:
            out = verify(cand, sets, sets).dropDuplicates(["id_a", "id_b"])
        n = out.count()
        elapsed = time.perf_counter() - start
        release_shared()
        spark.catalog.clearCache()
        return elapsed, n

    # candidate duplication factor (once, uncounted): the shape evidence
    sets0 = shared(shingle_sets(docs, "text", "doc_id", 3))
    cand0 = _containment_candidates(sets0, sets0, THRESHOLD, True)
    n_raw = cand0.count()
    n_dedup = cand0.dropDuplicates(["id_a", "id_b"]).count()
    release_shared()
    spark.catalog.clearCache()
    print(
        f"# candidate rows raw={n_raw} deduped={n_dedup} "
        f"dup_factor={n_raw / max(n_dedup, 1):.2f}",
        file=sys.stderr,
    )

    run_form(False), run_form(True)  # warmup pass per form

    old_t, new_t = [], []
    old_n = new_n = None
    for i in range(n_samples):
        e, old_n = run_form(False)
        old_t.append(e)
        e, new_n = run_form(True)
        new_t.append(e)
        print(
            f"# pass {i}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s",
            file=sys.stderr,
        )

    out = {
        "metric": "ab_containment_dedup",
        "n_samples": n_samples,
        "cand_rows_raw": n_raw,
        "cand_rows_dedup": n_dedup,
        "old": {
            "median": round(statistics.median(old_t), 3),
            "min": round(min(old_t), 3),
            "samples": [round(v, 4) for v in old_t],
            "rows": old_n,
        },
        "new": {
            "median": round(statistics.median(new_t), 3),
            "min": round(min(new_t), 3),
            "samples": [round(v, 4) for v in new_t],
            "rows": new_n,
        },
        "rows_match": old_n == new_n,
        "median_ratio_new_over_old": round(
            statistics.median(new_t) / statistics.median(old_t), 3
        ),
        "min_ratio_new_over_old": round(min(new_t) / min(old_t), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
