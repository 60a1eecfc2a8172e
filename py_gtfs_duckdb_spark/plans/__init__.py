"""Declared query battery.

Every operator from SURVEY.md §2 (plus the scale-path extensions) is
registered here as a named query: a callable ``(spark, sf_dir) -> DataFrame``
plus, where SQL-expressible, a DuckDB-oracle SQL string over the same parquet
tables. The driver (and ``tests/test_oracle_parity.py``) runs both sides and
compares row count + schema + order-insensitive value hash.

Conventions that make the hash comparison work (see repo contract):
- every computed column is aliased identically in Spark and SQL;
- computed integers are BIGINT on both sides, computed floats are
  ``round(x, N)`` on both sides, raw passthrough columns are untouched;
- queries with LIMIT order on a unique key first (deterministic subset);
- no UDFs in oracle-checked queries (only in rows-only extension ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle=None`` → rows-only check.

    The registered callable releases the PREVIOUS query's scoped persists
    on entry (operators/_scope.py): the driver, the replica, and bench all
    run the battery sequentially in one shared session, so by the time
    query N+1 starts building its plan, query N's consumers have
    materialized and its shared frames are safe to free — and MUST be
    freed, or a later same-shaped ``persist()`` hits the CacheManager's
    "already cached" collision and silently recomputes its corpus explode
    per consumer (the round-6 doubled-Generate bug)."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from py_gtfs_duckdb_spark.operators._scope import release_shared

            release_shared()
            return fn(spark, sf_dir)

        QUERIES[name] = scoped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Importing the modules populates the registry.
from py_gtfs_duckdb_spark.plans import relational  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import functions_battery  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import windows_battery  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import extensions  # noqa: E402,F401
from py_gtfs_duckdb_spark.plans import flagship  # noqa: E402,F401

# Declared-battery priority order. The driver checks the battery in dict
# order with a bounded budget (the first 50 names each round), so the
# 50-slot window carries the queries whose driver evidence matters most.
#
# Rotation ledger (latest driver evidence per group, entering round 13 —
# 143 registered queries; CORRECTNESS_r12 was 50/50 green, zero err,
# zero hash-fail; distribution after r12: 50@r12 / 50@r11 / 41@r10 +
# the two never-driver-checked r12 codec registrations). This window
# pays the full r13 debt the r12 ledger promised:
#   slots 1-2 ........ q_image_resize_png / q_audio_g711 — registered in
#                      r12 past the boundary; zero driver evidence until
#                      this round (VERDICT r12 watch item #1).
#   r10 block ........ ALL 41 remaining r10-evidence queries — the oldest
#                      cohort, owed by the <=2-round staleness invariant
#                      (VERDICT r12 Next #1).
#   7 builder picks .. modules changed in r12/r13 (see inline comments).
# After this window lands, no registered query's driver evidence will be
# older than round 11 (= 2 rounds), for the eighth consecutive round.
# Round-14 owes, in order: the 11 round-13 registrations (never
# driver-checked — q_event_funnel, q_cohort_retention,
# q_resample_gapfill, q_heavy_hitters, q_decontaminate_bloom,
# q_image_resize_gif, q_image_resize_bmp, q_pmi_bigrams,
# q_event_funnel_window, q_event_transitions, q_bigram_nll — slots
# 1-11), then the 47 r11-evidence queries listed first past the
# boundary.
_PRIORITY = [
    # --- round-13 window (50 slots) ---
    # Slots 1-2: the round-12 codec additions, registered past the
    # boundary last round — their ONLY evidence so far is builder-local
    # parity (VERDICT r12 watch item #1); first driver check here.
    "q_image_resize_png",
    "q_audio_g711",
    # Slots 3-43: the full r10-evidence cohort (41 queries), owed by the
    # <=2-round staleness invariant (VERDICT r12 Next #1).
    "q_source_overlap",
    "q_histogram_quantiles",
    "q_weighted_sample",
    "q_kmv_distinct",
    "q_doc_chunks",
    "q_fuzzy_pairs",
    "q_tfidf_keywords",
    "q_dist_drift",
    "q_mix_temperature",
    "q_profile_table",
    "q_skew_report",
    "q_interval_join",
    "q_window_trailing_chunked",
    "q_bpe_tokenize_large",
    "q_bpe_encode",
    "q_bpe_fertility",
    "q_scan_star",
    "q_scan_csv_projection",
    "q_sql_passthrough",
    "q_project_cols",
    "q_filter_eq",
    "q_filter_like",
    "q_agg_distinct",
    "q_agg_min",
    "q_agg_count",
    "q_sort_concat",
    "q_limit",
    "q_fn_dateformat",
    "q_sample_stratified",
    "q_pack_sequences",
    "q_repetition_stats",
    "q_quality_rules",
    "q_pii_scrub",
    "q_split_assign",
    "q_token_histogram",
    "q_source_report",
    "q_join_asof",
    "q_join_asof_tol",
    "q_range_join",
    "q_export_shards",
    "q_unigram_nll",
    # Slots 44-50: builder picks — modules changed in r12/r13.
    # q_dedup_ngram_jaccard + q_dedup_minhash_lsh: the shared
    # exact-Jaccard integer predicate gained a size-scaled slack this
    # round (ADVICE r12 #1). q_dedup_incremental + q_dedup_policy: the
    # distributed SCC keep-policy gained the deep-chain oracle guard and
    # sf1 probe this round. q_doc_winnow: perf adjudication (VERDICT
    # Next #4). q_image_resize + q_audio_features: their decode path
    # now dispatches through the pluggable codec registry (Next #2).
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_incremental",
    "q_dedup_policy",
    "q_doc_winnow",
    "q_image_resize",
    "q_audio_features",
    # --- window boundary: 50 entries above this line ---
    # r11-evidence cohort (47 after picks) — owed to the round-14 window
    # by the staleness invariant; listed first past the boundary.
    "q_profile_dates",
    "q_decontaminate_semantic",
    "q_dedup_containment",
    "q_dedup_containment_inc",
    "q_ann_recall_curve",
    "q_ann_recall_lsh",
    "q_doc_scorecard",
    "q_quantile_tokens",
    "q_semantic_dedup",
    "q_dedup_cluster_sizes",
    "q_dedup_simhash",
    "q_embed_project",
    "q_multimodal_frames",
    "q_dedup_clusters",
    "q_text_top_tokens",
    "q_dedup_spans",
    "q_bm25_topk",
    "q_video_frames",
    "q_rollup_tokens",
    "q_pivot",
    "q_window_tumbling",
    "q_window_session",
    "q_text_quality",
    "q_knn_cosine",
    "q_ann_ivf",
    "q_multimodal_bytes",
    "q_mix_sources",
    "q_ann_lsh",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_ann_ivf_lloyd",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_corpus_diff",
    "q_vocab_spectrum",
    "q_ivf_cell_profile",
    "q_length_buckets",
    "q_embedding_audit",
    "q_window_sliding",
    "q_agg_approx_distinct",
    "q_fn_json",
    "q_text_stats",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_embed_norm",
    "q_join_chain_left",
    "q_match_trip_candidates",
    # r12-evidence cohort (46 after picks) — fresh, owed round 15.
    "q_ann_recall_pq",
    "q_stream_dedup_latest",
    "q_dedup_keep_canonical",
    "q_dedup_keep_topk",
    "q_curate_pipeline",
    "q_curate_rules",
    "q_bpe_vocab",
    "q_window_session_chunked",
    "q_join_asof_chunked",
    "q_window_trailing",
    "q_cube_chars",
    "q_project_derived",
    "q_filter_range",
    "q_filter_isin",
    "q_filter_first_stop",
    "q_map_id_regex",
    "q_join_inner",
    "q_join_anti",
    "q_join_semi",
    "q_upsert_stops",
    "q_agg_collect_list",
    "q_agg_collect_list_salted",
    "q_set_union_except",
    "q_sort_multikey",
    "q_sort_by_min_desc",
    "q_fn_totimestamp",
    "q_fn_interval",
    "q_fn_epoch",
    "q_fn_concat_format",
    "q_fn_case_enum",
    "q_fn_sha256",
    "q_ngram_novelty",
    "q_dsir_weights",
    "q_split_leakage",
    "q_split_rescue",
    "q_minhash_calibration",
    "q_ttl_retention",
    "q_topk_per_group",
    "q_agg_count_distinct",
    "q_unpivot",
    "q_dedup_exact",
    "q_dedup_bow",
    "q_dedup_embedding",
    "q_flagship_nominal_trips",
    "q_decontaminate",
    "q_golden_records",
    # NEW in round 13, registered past the window (owed to the r14
    # rotation): bigram-LM NLL, the perplexity-filter score one model
    # order above q_unigram_nll; sf0.001+sf0.01 parity-tested locally
    # at registration.
    "q_bigram_nll",
    # NEW in round 13 (same past-the-window convention): the event-
    # analytics trio (ordered funnel / cohort retention / gap-filled
    # resample, operators/analytics.py) and the exact frequent-items
    # sketch (operators/pipeline.py:heavy_hitters); sf0.001+sf0.01
    # parity-tested locally at registration.
    "q_event_funnel",
    "q_cohort_retention",
    "q_resample_gapfill",
    "q_heavy_hitters",
    # NEW in round 13: bloom-prefilter decontamination tier (shares
    # q_decontaminate's oracle — identical rows by construction)
    "q_decontaminate_bloom",
    # NEW in round 13: GIF (LZW) codec face — third compression family
    # after DEFLATE (PNG) and Huffman+DCT (JPEG); same analytic oracle
    # as the PPM/PNG twins
    "q_image_resize_gif",
    # NEW in round 13: BMP (RLE8 run-length) codec face — fourth
    # compression family, same analytic oracle
    "q_image_resize_bmp",
    # NEW in round 13: PMI collocations (micro-nat integer top-k),
    # windowed funnel, and the Markov transition matrix
    "q_pmi_bigrams",
    "q_event_funnel_window",
    "q_event_transitions",
    # NEW in round 13: median time-to-convert per funnel stage
    "q_funnel_time_to_convert",
    # NEW in round 13: rolling 7-day distinct actives (WAU curve)
    "q_rolling_distinct",
]

# Window-partition allowlist — the systematic form of the per-query
# no-window plan guards. A window function sorts its ENTIRE partition in
# one task (AQE cannot split a window), so every windowspecdefinition in
# any battery plan must key on columns with a documented boundedness
# argument. `tests/test_window_allowlist.py` sweeps all registered plans:
# a query absent from this dict must contain NO window at all; a listed
# query may only use the exact partition-key tuples recorded here.
#
# Boundedness arguments per key:
#   shard ............ explicit hash shard, n_shards a tuning knob sized
#                      to the cluster (pack_sequences/export_shards);
#                      partition ≈ corpus/n_shards by construction
#   o_custkey ........ per-customer order history — entity-bounded (a
#                      customer places thousands of orders, not billions)
#   user_id .......... per-user event stream (as-of carry, session gaps)
#                      — entity-bounded activity
#   (user_id, __chunk) chunked-carry sessionization: partition holds at
#                      most chunk_ms of ONE user's events — bounded by
#                      time, independent of entity heat
#   user_id (q_window_session_chunked's second window) runs over the
#                      AGGREGATED per-(user, chunk) summary (rows per
#                      user = active chunks = range/chunk_ms), the same
#                      aggregated-table argument as mix_sources
#
# "Entity-bounded" is a DATA CONTRACT, not a theorem: a 100 TB event log
# has bot/firehose entities whose row counts look like cluster_id skew.
# When that contract breaks for a deployment:
#   - an order-free "latest per key" query must become a combinable
#     max_by (q_stream_dedup_latest was rewritten exactly so in round 9
#     and left the allowlist — the template to copy);
#   - a genuinely order-dependent window (as-of carry, session gaps)
#     cannot drop the sort, so split the entity by a bounded sub-key the
#     semantics already respect — (user_id, day) for sessions whose gap
#     threshold never spans a day boundary, or chunked carry: window per
#     (user_id, time_chunk), then a second pass joins each chunk's last
#     state to the next chunk (two bounded shuffles instead of one
#     unbounded sort). What breaks if ignored: the hot entity's window
#     sorts in ONE task — AQE cannot split a window partition — and the
#     stage runs at the speed of its biggest bot.
#   query_id ......... ANN shortlist AFTER candidate pruning: ≤ probe
#                      lists × per-list matches, k-bounded by the prune
#   source / (source, bkt) mixing runs its cumsum window over the
#                      AGGREGATED per-(source, bucket) offset table
#                      (n_sources × n_buckets rows), and the corpus-side
#                      window keys on (source, bkt) — bucket count scales
#                      with corpus size, bounding each partition
#   ()  .............. GLOBAL window — allowed ONLY over a post-limit
#                      frame (BM25 ranks the k rows TakeOrderedAndProject
#                      already reduced; lexical.py:108-126)
#
# The dedup-action keys (cluster_id) are deliberately ABSENT: a
# boilerplate mega-cluster is one CC component, so anything keyed on it
# inherits unbounded skew (operators/dedup.py keep_canonical/keep_top_k
# are window-free by design; see SCALING.md §6).
WINDOW_PARTITION_ALLOWLIST: dict[str, set[tuple[str, ...]]] = {
    "q_topk_per_group": {("o_custkey",)},
    "q_pack_sequences": {("shard",)},
    "q_export_shards": {("shard",)},
    "q_join_asof": {("user_id",)},
    "q_join_asof_tol": {("user_id",)},
    "q_window_session": {("user_id",)},
    "q_window_session_chunked": {("user_id", "__chunk"), ("user_id",)},
    "q_window_trailing": {("user_id",)},
    "q_window_trailing_chunked": {("user_id", "__chunk")},
    "q_join_asof_chunked": {("user_id", "__chunk"), ("user_id",)},
    "q_knn_cosine": {("query_id",)},
    "q_ann_ivf": {("query_id",)},
    "q_ann_lsh": {("query_id",)},
    "q_ann_pq": {("query_id",)},
    "q_ann_ivfpq": {("query_id",)},
    "q_ann_ivf_lloyd": {("query_id",)},
    # recall curve composes cosine_topk + ivf_topk: same post-prune
    # k-bounded query_id shortlists as the entries above; the recall
    # math itself is window-free (semi-join + combinable count)
    "q_ann_recall_curve": {("query_id",)},
    "q_ann_recall_lsh": {("query_id",)},
    "q_ann_recall_pq": {("query_id",)},
    "q_bm25_topk": {()},
    # skew_report ranks the top_n rows TakeOrderedAndProject already
    # reduced — the same post-limit global-window argument as bm25
    "q_skew_report": {()},
    "q_mix_sources": {("source",), ("source", "bkt")},
    # forward-fill carry over the per-user day spine: partition = one
    # user's day range (bounded by the calendar span, not event volume
    # — the daily pre-aggregation collapses raw events before the
    # window sees them), frame = O(1) running last(ignorenulls)
    "q_resample_gapfill": {("user_id",)},
    # LEAD adjacency over one user's event sequence: entity-bounded
    # partition, O(1) frame; the downstream count aggregates the
    # types-squared matrix, not the stream
    "q_event_transitions": {("user_id",)},
}

_missing = set(QUERIES) - set(_PRIORITY)
_unknown = set(_PRIORITY) - set(QUERIES)
assert not _missing and not _unknown, (
    f"battery order out of sync: missing={sorted(_missing)} unknown={sorted(_unknown)}"
)
QUERIES = {name: QUERIES[name] for name in _PRIORITY}
ORACLE = {name: ORACLE[name] for name in _PRIORITY if name in ORACLE}

__all__ = ["QUERIES", "ORACLE", "WINDOW_PARTITION_ALLOWLIST", "query"]
