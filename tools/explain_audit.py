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
        "q_decontaminate_semantic",
        "Embedding-tier decontamination: benchmark side BroadcastExchange"
        " (benchmark-sized by definition), corpus scanned once and never"
        " shuffled before scoring; the single hash Exchange carries only"
        " the above-threshold (id, id, cosine) rows into the combinable"
        " per-doc argmax.",
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
        " Representative selection is ONE map-side-combinable aggregation"
        " (min_by on the rank-key struct + count in a single groupBy) —"
        " no rank window, so a boilerplate mega-cluster never lands in"
        " one unsplittable sorted partition; partial aggregation reduces"
        " each map task's slice of a hot cluster to one candidate before"
        " the shuffle.",
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
        "Cross-source n-gram contamination matrix, join-free shape: ONE"
        " winnow rolling-hash pass, one gh-keyed aggregation collapsing"
        " each gram to its sorted source set (persisted — feeds totals"
        " AND pairs), pairs expanded ARRAY-LOCALLY as C(s,2) structs per"
        " gram (bounded by sources², no self-join, the gram set crosses"
        " the wire once), totals broadcast back — gram STRINGS never"
        " shuffle.",
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
    (
        "q_ngram_novelty",
        "Per-document duplicated-n-gram fraction (memorization audit):"
        " ONE token explode + rolling-hash window pass builds the"
        " distinct (doc, gram-hash) frame, a gh-keyed window marks"
        " corpus document-frequency in place, and a single per-doc hash"
        " aggregation rolls up both counters — no dup-set join, no"
        " second gram pass, only (id, 8-byte hash) pairs in any"
        " Exchange.",
    ),
    (
        "q_dsir_weights",
        "DSIR importance weights: the bigram-bucket explode collapses"
        " immediately into a persisted per-(doc, is_target, bucket)"
        " count table; the 2x64-row model counts derive from that table"
        " (tiny agg) and broadcast back for the per-doc log-ratio sum."
        " The explode — the dominant cost — runs once; integer"
        " micro-nat quantization keeps every aggregation an exact"
        " BIGINT sum.",
    ),
    (
        "q_split_leakage",
        "Cross-split n-gram leakage: same join-free machinery as"
        " q_source_overlap keyed on the computed split — one corpus"
        " token explode, one gh-keyed source-set aggregation"
        " (persisted), array-local pair expansion, broadcast totals.",
    ),
    (
        "q_split_rescue",
        "Contamination-aware split repair: the rolling-hash gram frame"
        " builds ONCE (persisted; the split label attaches as a narrow"
        " md5 expression, no join) and feeds both the train-side"
        " distinct hash set and the eval-side probe. The semi-join is"
        " hash-keyed — AQE broadcasts at bench scale, degrades to a"
        " shuffle join at corpus scale (no forced broadcast: the train"
        " gram set grows with the corpus).",
    ),
    (
        "q_ivf_cell_profile",
        "IVF index-quality profile: one narrow mapInPandas assignment"
        " pass over the quantized vectors emits at most n_centroids"
        " partial (cell, count, inertia) rows per Arrow batch, combined"
        " by a groupBy over tiny rows; the all-cells frame left-joins"
        " without touching the corpus again. Exact BIGINT inertia"
        " end-to-end, so the whole audit replays in the SQL oracle.",
    ),
    (
        "q_minhash_calibration",
        "MinHash estimator calibration curve: identical spine to"
        " q_dedup_minhash_lsh — one narrow Arrow pass builds the"
        " per-doc shingle-set + signature row (persisted), bucket-local"
        " band self-join for candidates, hash-keyed joins for signature"
        " agreement and exact Jaccard — closed by a <= K+1-row"
        " aggregation. Exact Jaccard quantizes to basis-point BIGINTs"
        " before the sum, so the averages are aggregation-order-free.",
    ),
    (
        "q_length_buckets",
        "Padding-waste audit: one narrow projection (token count +"
        " chained CASE, whole-stage codegen) and one tiny hash"
        " aggregation — map-side combine reduces every partition to"
        " <= len(caps) rows before the only Exchange.",
    ),
    (
        "q_embedding_audit",
        "Per-dimension embedding moments: quantize + posexplode in one"
        " codegen'd pass, then a single hash aggregation keyed by dim —"
        " partial aggregation collapses each partition to `dim` rows"
        " before the only Exchange. All moment accumulators are exact"
        " BIGINT sums; floats appear only in the fixed-order epilogue"
        " per output row.",
    ),
    (
        "q_doc_scorecard",
        "Per-document scorecard: a doc_id join tree over the four audit"
        " outputs, each keeping its proven single-pass shape. AQE"
        " broadcasts the per-doc audit sides at bench scale; at corpus"
        " scale they degrade to sort-merge joins that share the doc_id"
        " partitioning, so each join exchanges only its new side. The"
        " oracle is composed from the four registered audit oracles as"
        " subqueries — zero duplicated SQL to drift.",
    ),
    (
        "q_dedup_keep_topk",
        "Top-k cluster retention: the minhash/CC spine is the audited"
        " q_dedup_keep_canonical shape; the action itself is the salted"
        " two-phase top-k — per-(cluster, salt) sorted-slice partials"
        " (each buffer ≤ |cluster|/n_salts rows, truncated to k), then a"
        " bounded ≤ n_salts×k merge per cluster. No rank window, so hot"
        " clusters split across salts instead of one sorted partition.",
    ),
    (
        "q_stream_dedup_latest",
        "Latest state per key as ONE combinable max_by aggregation (no"
        " row_number window since round 9): partial aggregation reduces a"
        " firehose key's map-side slice to one candidate before the"
        " shuffle.",
    ),
    (
        "q_window_session_chunked",
        "Chunked-carry sessionization: local lag-gap windows keyed"
        " (user, 6h-chunk) — partitions bounded by time, not entity heat;"
        " boundary stitch windows run over the per-(user, chunk) SUMMARY"
        " aggregate; final combinable re-aggregation merges boundary"
        " spans. Same rows as q_window_session (shared oracle).",
    ),
    (
        "q_join_asof_chunked",
        "Chunked-carry as-of join: (user, chunk)-bounded local carry"
        " window, WINDOW-FREE max_by chunk-final payloads, cross-chunk"
        " handoff over the per-chunk summary. Same rows as q_join_asof"
        " (shared oracle).",
    ),
    (
        "q_bpe_tokenize_large",
        "Production-depth BPE: 384-merge table auto-dispatches past the"
        " Catalyst expression cliff into ONE Arrow-batched mapInPandas"
        " pass (memoized greedy kernel), no shuffle before the narrow"
        " projection; hash-checked against a staged DuckDB replay.",
    ),
    (
        "q_window_trailing",
        "Per-event trailing RANGE frame (1h count/mean), integer-micros"
        " frame math; ONE user_id shuffle serving both window functions.",
    ),
    (
        "q_window_trailing_chunked",
        "Shifted-copy bounded trailing window: <= lookback/chunk extra"
        " rows via union, RANGE frame keyed (user, chunk), home-row"
        " filter after the window. Same rows as q_window_trailing"
        " (shared oracle).",
    ),
    (
        "q_interval_join",
        "Binned interval-overlap join: both interval sets explode into"
        " touched bins, co-partitioned (bin, user) hash join — on the"
        " explicitly renamed (user_id, __rby) pair, two distinct"
        " attributes by construction — with the overlap predicate and"
        " canonical-bin exactly-once guard inside; no dedup shuffle, no"
        " per-key cross product.",
    ),
    (
        "q_histogram_quantiles",
        "Bounded-state quantiles: (group, bin) combinable count -> bounded"
        " per-group bin array -> per-prob expression folds. Two shuffles"
        " carrying counts; per-group state is n_bins at ANY group"
        " cardinality (the exact-percentile entry buffers whole groups).",
    ),
    (
        "q_weighted_sample",
        "Deterministic E-S weighted sampling: md5-derived keys, salted"
        " two-phase bounded top-k (the keep_top_k shape) — per-task memory"
        " k, shuffle rows groups x salts, no rank window.",
    ),
    (
        "q_kmv_distinct",
        "KMV distinct sketch over staged Horner gram hashes: per-row array"
        " math to the grams, ONE (group, hash) distinct aggregation, then"
        " the bounded k-smallest merge. The oracle replays sketch AND"
        " estimator bit-for-bit (HLL's registers can only be"
        " tolerance-checked).",
    ),
    (
        "q_cube_chars",
        "CUBE over (source, lang-bucket): ONE Expand (4x group rows, never"
        " the corpus) feeding a single map-side-combinable aggregation —"
        " the reshaping family's closing entry next to rollup/pivot/"
        " unpivot.",
    ),
    (
        "q_fuzzy_pairs",
        "Length-band blocked Levenshtein join: left dictionary hashes to"
        " ONE band, right replicates into <= 3 — a plain shuffle hash"
        " equi-join on the band id (never BroadcastNestedLoopJoin; the"
        " oracle brute-forces the cross product to prove the blocking"
        " lossless).",
    ),
    (
        "q_tfidf_keywords",
        "Integer-exact tf-idf: (doc, term) combinable count, vocab-sized"
        " df table broadcast back as micro-nat q_idf, top-k per doc inside"
        " a doc-bounded sorted-array slice — no rank window over corpus"
        " rows.",
    ),
    (
        "q_dist_drift",
        "Histogram KS + PSI: (group, bin) combinable count, n_bins-row"
        " global table broadcast, groups x bins comparison grid, one"
        " n_bins-sized fold per group — BIGINT cumulatives, quantized PSI"
        " terms, no window over data rows.",
    ),
    (
        "q_dedup_containment",
        "Asymmetric containment join: A-side prefix explode, B-side FULL"
        " hash-only inverted index (no container length bound exists),"
        " exact size + positional prunes inside the join, bounded per-pair"
        " array verify. The brute-force oracle fails loudly on any lossy"
        " prune.",
    ),
    (
        "q_dedup_containment_inc",
        "Ingest-gate containment: only the NEW batch's prefixes explode,"
        " the corpus contributes the inverted index — new x corpus"
        " probes only, the corpus is never self-joined (O(B + N), the"
        " Jaccard-incremental complexity contract).",
    ),
    (
        "q_ann_recall_curve",
        "IVF tuning curve: ONE scoped-persisted brute-force ground truth"
        " feeds three nprobe settings; each comparison is a semi-join +"
        " combinable count over k x |queries| rows — the corpus scans"
        " live in the compared pipelines, not the recall math.",
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
    audited = dict(AUDITED)
    missing = set(audited) - set(QUERIES)
    assert not missing, f"AUDITED names not in the battery: {sorted(missing)}"

    # Full-battery coverage table first: EVERY registered query gets a
    # recorded plan audit (exchanges, window keys, join operators, Python
    # stages, scan pushdown) even when it has no narrative entry below —
    # so a new battery query is never absent from this doc.
    from tests.test_window_allowlist import window_partition_keys

    def plan_of(name):
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().rstrip()

    plans = {name: plan_of(name) for name in QUERIES}
    out += [
        "## Coverage table — every registered battery query",
        "",
        "| query | shuffles | window keys | joins | python stages |"
        " pushed scan filters |",
        "|---|---|---|---|---|---|",
    ]
    join_ops = (
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    )
    for name, plan in plans.items():
        wkeys = sorted(
            "(" + ", ".join(tup) + ")" for tup in window_partition_keys(plan)
        )
        joins = sorted(
            {op for op in join_ops if op in plan},
            key=join_ops.index,
        )
        pythonic = sorted(
            op for op in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas")
            if op in plan
        )
        pushed = any(
            "PushedFilters:" in line and "[]" not in line
            for line in plan.splitlines()
        )
        import re

        # count each Exchange once via its numbered detail entry — the
        # formatted plan prints every node twice (tree + details)
        n_exch = len(re.findall(r"\(\d+\) Exchange", plan))
        out.append(
            f"| {name}{' *' if name in audited else ''} "
            f"| {n_exch} "
            f"| {'; '.join(wkeys) or '—'} "
            f"| {', '.join(j.removesuffix('Join').removeprefix('Broadcast') or j for j in joins) or '—'} "
            f"| {', '.join(pythonic) or '—'} "
            f"| {'yes' if pushed else '—'} |"
        )
    out += [
        "",
        "`*` = narrative audit below. `shuffles` counts shuffle Exchange",
        "nodes only (BroadcastExchange excluded — broadcasts don't move the",
        "fact side). Window keys must match",
        "`plans.WINDOW_PARTITION_ALLOWLIST` (enforced by",
        "`tests/test_window_allowlist.py`); exchange counts are from the",
        "formatted plan string and include reused exchanges.",
        "",
    ]

    for name, why in AUDITED:
        out += [f"## {name}", "", why, "", "```", plans[name], "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
