#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across the headline set (excluding Spark
session startup — that cost is amortized away on a long-lived cluster).
Each query is forced with a count()-style action over its full result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_flagship_nominal_trips",
    "q_join_chain_left",
    "q_filter_isin",
    "q_agg_collect_list",
    "q_set_union_except",
    "q_match_trip_candidates",
    "q_topk_per_group",
    "q_window_tumbling",
    "q_window_session",
    "q_stream_dedup_latest",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_embedding",
    "q_text_stats",
    "q_lang_id",
    "q_knn_cosine",
    "q_agg_collect_list_salted",
    "q_doc_winnow",
    "q_ann_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from py_gtfs_duckdb_spark.plans import QUERIES
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("bench")

    # Warm the JVM/codegen path and the input tables once (not counted):
    # long-lived clusters pay footer reads/class-loading once, not per
    # query, so steady-state is the honest per-query figure.
    spark.range(1000).count()
    from py_gtfs_duckdb_spark.session import load_tables

    for df in load_tables(spark, sf_dir, register_views=False).values():
        df.count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        # Median of 3 runs: steady-state throughput (per-query-shape
        # codegen/compile happens once on a long-lived cluster, and this
        # machine's background load adds ±50% noise to single shots).
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            n = fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - start)
            spark.catalog.clearCache()  # operators may persist() internally
        elapsed = sorted(runs)[1]
        timings[name] = round(elapsed, 3)
        total += elapsed
        print(f"# {name}: {elapsed:.3f}s median of {[round(r, 3) for r in runs]} ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_batch_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
