#!/usr/bin/env python3
"""Generate EXPLAIN.md: formatted physical plans of the headline queries
with the scale-relevant properties called out.

Usage: python tools/explain_audit.py [sf_dir]   (default /root/testdata/sf0.01)

The written artifact is a review aid; the enforced version of every claim
lives in tests/test_plan_shapes.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    (
        "q_flagship_nominal_trips",
        "Calendar resolution + semi-join + 3-way join + sort. Dims broadcast;"
        " the only shuffles are the service-id distinct and the final sort.",
    ),
    (
        "q_join_chain_left",
        "5-table chain with one LEFT: routes/stops broadcast, fact side"
        " streams through a single shuffle stage.",
    ),
    (
        "q_filter_range",
        "Range+flag predicate: every conjunct reaches the Parquet scan"
        " (PushedFilters), scan reads only referenced columns (ReadSchema).",
    ),
    (
        "q_topk_per_group",
        "Window row_number over (group, order): one hash-partition shuffle,"
        " rank filter applied before any wide materialization.",
    ),
    (
        "q_dedup_minhash_lsh",
        "Shingle+signature stages are shuffle-free narrow projections; the"
        " only exchanges are the band-bucket self-join and the bounded"
        " verify joins.",
    ),
    (
        "q_dedup_ngram_jaccard",
        "Exact prefix-filter join: candidate exchange is bounded by prefix"
        " length; length+positional filters run inside the join.",
    ),
    (
        "q_knn_cosine",
        "Brute-force top-k: tiny query side broadcast (nested-loop by"
        " design), scores reduced per query via window top-k.",
    ),
    (
        "q_dedup_embedding",
        "Per-cell applyInPandas: ONE corpus-linear shuffle of (id, vector)"
        " rows by cell; the quadratic upper-triangle pairing happens in"
        " memory, so pair rows with duplicated vectors never hit a"
        " shuffle.",
    ),
    (
        "q_ann_ivf",
        "IVF: centroid matrix ships in the task closure, so cell"
        " assignment is one narrow vectorized Arrow pass (no shuffle);"
        " probes broadcast; only (id, id, score) rows reach the top-k"
        " shuffle.",
    ),
    (
        "q_doc_winnow",
        "Winnowing fingerprints, relational form: posexplode tokens, lead()"
        " rolling hash + window-frame min over ONE doc-id shuffle (array-"
        "lambda forms measured 100-1000x slower — interpreted HOFs).\n\n"
        "**r2 bench move root-caused (r3):** 0.802→1.423 s happened with"
        " zero code change. Re-profiled at sf0.1, 8 samples, one session:"
        " warm median 0.887 s (0.756–1.216 after a cold outlier), within"
        " r1's 0.802 ±20%, control query stable alongside — while the same"
        " session's full bench ran ~1.4× slower across EVERY query under"
        " ambient load. Cause: sample variance, not a plan change.",
    ),
    (
        "q_match_trip_candidates",
        "First-candidate pick as min(struct): map-side partial aggregation"
        " ships one row per (event, partition), not the candidate list.",
    ),
    (
        "q_sample_stratified",
        "Deterministic hash sampling is a codegen'd filter: zero"
        " exchanges, scan pruned to the referenced columns.",
    ),
    (
        "q_pack_sequences",
        "Budget-boundary packing: exactly one hash exchange (the shard"
        " window); the shuffle carries token counts, never document"
        " text.",
    ),
    (
        "q_decontaminate",
        "Winnow-fingerprint overlap: the benchmark fingerprint set"
        " (tiny by construction) BROADCASTs; corpus bodies never shuffle"
        " against each other — the only all-corpus exchange carries"
        " (doc_id, fp) pairs.",
    ),
    (
        "q_dedup_keep_canonical",
        "Dedup action: pairs → star-CC → one representative per cluster."
        " Representative selection adds ONE exchange on the cluster id,"
        " shared by both window functions (rank + member count stack over"
        " a single sort+exchange).",
    ),
    (
        "q_join_asof",
        "As-of join as union-sort: NO join operator exists in the plan at"
        " all — one hash exchange of probe+build on the key, a per-key"
        " sort, and a running-frame window carry. Both scans push their"
        " event_type filters. The naive inequality-join formulation"
        " (BroadcastNestedLoopJoin + O(|probe|x|build|) pairs per key) is"
        " the shape test_plan_shapes.py forbids.",
    ),
    (
        "q_range_join",
        "Binned range join: intervals explode to overlapped bins (~2 rows"
        " each at bin_width ≈ interval length), then an ordinary shuffled"
        " EQUI-join on (bin, user_id) with the residual range filter on"
        " top. No nested loop, no cartesian; AQE handles bin skew.",
    ),
    (
        "q_dedup_incremental",
        "Ingest-time near-dup: NEW-batch band rows join CORPUS band rows"
        " — the corpus is never self-joined, so an ingest batch costs"
        " O(B + N) band rows and bucket-local probes.",
    ),
    (
        "q_export_shards",
        "Deterministic training order: one exchange on the shard key,"
        " writer-local rank; n_shards bounds every sort partition at any"
        " corpus size.",
    ),
    (
        "q_ann_pq",
        "PQ serving: codes scan (8 bytes/vector) with per-query ADC"
        " lookup tables in the task closure → window shortlist →"
        " broadcast-join the tiny shortlist back to full vectors for"
        " exact re-rank. The full-precision corpus is touched only via"
        " the shortlist semi-join — the big scan reads 32x less data"
        " than the float corpus.",
    ),
    (
        "q_dedup_spans",
        "Line-level boilerplate removal: unit explode → (unit, doc)"
        " distinct agg builds the blocklist (small by nature — spans"
        " common to many docs), which joins back as a BROADCAST"
        " anti-join; reassembly is one groupBy ordered by unit index."
        " The corpus is never shuffled by span text, no self-join.",
    ),
    (
        "q_rollup_tokens",
        "Grouping-sets aggregation: one pass, partial aggregation at"
        " every rollup level, no per-level re-scan.",
    ),
    (
        "q_bm25_topk",
        "Inverted-index BM25: token stream filtered to the query terms"
        " before any shuffle, conditional-agg tf pivot (map-side"
        " combined, skew-immune), one-row corpus stats broadcast,"
        " fixed-order float scoring, TakeOrderedAndProject top-k (no"
        " global rank window).",
    ),
    (
        "q_source_overlap",
        "Cross-source n-gram contamination matrix: winnow rolling-hash"
        " window (one doc-keyed shuffle), per-source distinct over"
        " 8-byte gram hashes, hash-keyed self-join bounded by sources²"
        " per gram, totals broadcast back — gram STRINGS never shuffle.",
    ),
    (
        "q_unigram_nll",
        "Unigram-LM perplexity proxy: two map-side-combined token"
        " aggregations, one word-keyed join (AQE broadcast while the"
        " vocab fits), per-doc BIGINT sums of integer micro-nat"
        " log-counts — the float work is one fixed-order scalar"
        " epilogue, so no order-dependent double summation anywhere.",
    ),
    (
        "q_mix_sources",
        "Token-budgeted domain mixing as a distributed prefix sum: the"
        " per-source running total splits into a tiny per-(source,"
        " bucket) offset table (map-side-combined agg + small window,"
        " broadcast back) and intra-bucket windows partitioned by"
        " (source, bucket) — no one-fat-partition-per-source window on"
        " the corpus side.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from py_gtfs_duckdb_spark.plans import QUERIES
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("explain-audit")
    out = [
        "# EXPLAIN audit — headline physical plans",
        "",
        f"Generated by `tools/explain_audit.py` at `{sf_dir}`. The plan",
        "properties described here are ENFORCED by `tests/test_plan_shapes.py`;",
        "regenerate after plan-affecting changes.",
        "",
    ]
    for name, why in AUDITED:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", why, "", "```", buf.getvalue().rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
