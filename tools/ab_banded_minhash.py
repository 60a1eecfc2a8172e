#!/usr/bin/env python3
"""Same-host A/B adjudication for the r13 banded_pair_nmatch change
(commit ece0c26): does carrying minhash signatures through the LSH band
join (n_match computed map-side on the band-join output) beat the
two-stage form it replaced (raw candidate flood re-joined twice against
the signature table), once ambient drift is controlled for?

Design (the ab_ngram_jaccard.py / SCALING §17 pattern): both candidate
stages run INTERLEAVED in one process — sample i of the OLD form
immediately followed by sample i of the NEW form — so ambient load
drift hits both equally. Each sample computes the FULL
q_dedup_minhash_lsh result (candidates → estimate prune → dedup →
exact-Jaccard verify ≥ 0.7) and its row count; the counts must be
identical or the A/B is void.

Usage: python tools/ab_banded_minhash.py [n_samples]   (default 8)
Writes one JSON line to stdout; narrative to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.7


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators._scope import release_shared, shared
    from py_gtfs_duckdb_spark.operators.dedup import (
        EST_MIN_MATCHES,
        banded_pair_nmatch,
        estimate_filter_pairs,
        exact_jaccard,
        lsh_candidate_pairs,
        shingle_signatures,
    )
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-banded-minhash")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    def run_form(new: bool) -> tuple[float, int]:
        start = time.perf_counter()
        sets = shared(shingle_signatures(docs, "text", "doc_id", 3))
        if new:
            pruned = (
                banded_pair_nmatch(sets)
                .filter(F.col("n_match") >= EST_MIN_MATCHES)
                .select("id_a", "id_b")
                .dropDuplicates(["id_a", "id_b"])
            )
        else:
            pruned = estimate_filter_pairs(
                lsh_candidate_pairs(sets), sets
            ).dropDuplicates(["id_a", "id_b"])
        n = (
            exact_jaccard(pruned, sets)
            .filter(F.col("jaccard") >= THRESHOLD)
            .count()
        )
        elapsed = time.perf_counter() - start
        release_shared()
        spark.catalog.clearCache()
        return elapsed, n

    # one uncounted warmup pass per form
    run_form(False), run_form(True)

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
        "metric": "ab_banded_minhash",
        "n_samples": n_samples,
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
