#!/usr/bin/env python3
"""Same-host A/B adjudication for q_dedup_ngram_jaccard (VERDICT r11
Next #1): is the r11 slacked prefix ceil (commit 40340a7) responsible
for the 2.22x bench reading, or was it ambient host drift?

Design: both ceil forms run INTERLEAVED in one process (sample i of form
A immediately followed by sample i of form B), so ambient load drift
hits both forms equally instead of whichever form ran during a busy
window. Also counts candidate pairs (post-join, pre-dedup), distinct
candidates, and verified output rows for each form — if the slacked
ceil admitted materially more candidates (> ~5%), the regression is
real; if candidate counts match and timings interleave within noise,
the 2.22x was ambient.

Usage: python tools/ab_ngram_jaccard.py [n_samples]   (default 8)
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
        _prefix_filter_candidates,
        exact_jaccard,
        shingle_sets,
    )
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-ngram")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    def run_form(prefix_slack: float | None) -> tuple[float, int]:
        start = time.perf_counter()
        sets = shared(shingle_sets(docs, "text", "doc_id", 3))
        pairs = _prefix_filter_candidates(sets, THRESHOLD, prefix_slack)
        n = (
            exact_jaccard(pairs, sets, min_threshold=THRESHOLD)
            .dropDuplicates(["id_a", "id_b"])
            .count()
        )
        elapsed = time.perf_counter() - start
        release_shared()
        spark.catalog.clearCache()
        return elapsed, n

    def counters(prefix_slack: float | None) -> dict:
        sets = shared(shingle_sets(docs, "text", "doc_id", 3))
        pairs = _prefix_filter_candidates(sets, THRESHOLD, prefix_slack)
        raw = pairs.count()
        distinct = pairs.dropDuplicates(["id_a", "id_b"]).count()
        verified = (
            exact_jaccard(pairs, sets, min_threshold=THRESHOLD)
            .dropDuplicates(["id_a", "id_b"])
            .count()
        )
        release_shared()
        spark.catalog.clearCache()
        return {
            "candidates_raw": raw,
            "candidates_distinct": distinct,
            "verified_pairs": verified,
        }

    # candidate counters, once per form
    counts = {
        "slacked": counters(None),  # production size-scaled slack
        "unslacked": counters(0.0),
    }
    print(f"# counters: {json.dumps(counts)}", file=sys.stderr)

    # warmup both forms (codegen)
    run_form(None)
    run_form(0.0)

    samples = {"slacked": [], "unslacked": []}
    for i in range(n_samples):
        for label, slack in (("slacked", None), ("unslacked", 0.0)):
            elapsed, n = run_form(slack)
            samples[label].append(elapsed)
            print(
                f"# pass {i} {label}: {elapsed:.3f}s ({n} pairs)",
                file=sys.stderr,
            )

    out = {"sf_dir": sf_dir, "n_samples": n_samples, "counts": counts}
    for label in ("slacked", "unslacked"):
        vals = samples[label]
        out[label] = {
            "median": round(statistics.median(vals), 3),
            "min": round(min(vals), 3),
            "samples": [round(v, 4) for v in vals],
        }
    out["median_ratio_slacked_over_unslacked"] = round(
        out["slacked"]["median"] / out["unslacked"]["median"], 4
    )
    out["min_ratio_slacked_over_unslacked"] = round(
        out["slacked"]["min"] / out["unslacked"]["min"], 4
    )
    out["candidate_delta_pct"] = round(
        100.0
        * (
            counts["slacked"]["candidates_raw"]
            - counts["unslacked"]["candidates_raw"]
        )
        / max(counts["unslacked"]["candidates_raw"], 1),
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
