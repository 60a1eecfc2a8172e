from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Verify-window budget (VERDICT r13 Next #1): the "not slow" suite outgrew
# the driver's test window (VERIFY_r13 tests_ok=false was a TIMEOUT at ~68%
# with zero failures, not a red test). The r14 fix is measurement-driven:
# every test whose call time exceeded ~20 s in the r14 full-suite timing
# run (tests/ -m "not slow" --durations, this tree) is deferred to the
# `slow` tier — these are the long differential/fuzz/soak replicas whose
# VALUE coverage the (kept-default) 156-query oracle-parity battery, the
# plan-shape guards, and the cheap hand-computed unit tests already carry.
# The full tier still runs with `-m "slow or not slow"`, with
# SPARK_GRAFT_FULL_TESTS=1, or under the plain no-marker invocation the
# repo contract uses (`python -m pytest tests/ -x -q` runs EVERYTHING and
# must stay green — deferral never excuses a red).
#
# Two deliberate keeps (measured heavy but gate-critical, stay default):
#   - test_battery_outputs_are_scalar_typed (driver constraint: complex-
#     typed battery outputs hard-fail the driver's canonicalizer);
#   - test_mqtt_to_http_realtime_loop (the one end-to-end realtime pass).
_SLOW_BY_MEASUREMENT = {
    # >100 s (loaded host, ambient ~2.3x)
    "test_driver_window_shared_session_no_cache_interference",
    "test_stateful_latest_per_key_stream",
    "test_merger_cache_empty_between_micro_batches",
    "test_ngram_novelty_matches_python_model",
    # 40-100 s
    "test_train_distributed_fast_strategy_same_compression",
    "test_lsh_recall_on_clustered_data",
    "test_bm25_matches_python_model",
    "test_gate_rejects_cross_batch_near_dups",
    "test_feed_message_trip_updates_children",
    "test_gate_containment_chain_readmits_head",
    "test_bytes_to_spool_to_merge_to_serve_roundtrip",
    "test_interval_join_fuzz_python_reference",
    "test_containment_incremental_flags_only_new_vs_corpus",
    "test_gate_containment_tier_rejects_quotes",
    "test_sessionize_chunked_fuzz_python_reference",
    "test_randomized_ops_match_dict_model",
    "test_late_data_beyond_watermark_dropped_across_restart",
    "test_zip_roundtrip_is_fixpoint",
    "test_tombstone_removes_parent_and_children",
    "test_star_matches_label_propagation_on_random_graphs",
    "test_golden_records_matches_python_model",
    "test_streaming_exact_dedup_within_watermark",
    # 20-40 s
    "test_streaming_agg_matches_batch_on_closed_windows",
    "test_cascade_matches_reference_deletes",
    "test_length_buckets_matches_python_model",
    "test_dedup_spans_matches_python_model",
    "test_pq_roundtrip_and_recall_on_clustered_data",
    "test_incremental_dedup_flags_only_new_vs_corpus",
    "test_cli_corpus_verbs_accept_jsonl",
    "test_rss_and_html_render",
    "test_funnel_conversion_window",
    "test_distributed_policy_matches_driver_on_fuzz",
    "test_gate_auto_fold_bounds_segment_count",
    "test_containment_catches_quote_inclusion_jaccard_misses",
    "test_ttl_expires_trips_not_alerts",
    "test_train_distributed_batched_matches_sequential",
    "test_funnel_strict_order_and_ties",
    "test_containment_freq_order_variant_equals_default",
    "test_monitor_join_realtime_flag",
    "test_candidate_pairs_identical",
    "test_streaming_session_windows_merge_and_finalize",
    "test_cascade_clean_closure",
    "test_pmi_bigrams_hand_computed",
    "test_asof_join_matches_pandas_merge_asof",
    "test_bloom_mask_autosizing_bounds_fpp",
    "test_source_ngram_overlap_planted_topology",
    "test_feed_message_alerts_tree_and_sorting",
    "test_translation_pick_de_else_first",
    "test_recorder_drift_equals_direct",
    # heavy per-test lake-fixture setups (50-90 s each, measured as
    # fixture 'setup' time rather than call time)
    "test_spool_clean_source_deletes_processed_files",
    "test_nominal_index_cache_rollover",
    "test_pbf_feed_roundtrips",
    "test_nominal_trips_first_stop_and_full",
}
# single heavy parametrizations (the sibling params stay default)
_SLOW_PARAMS = {
    "test_containment_join_equals_brute_force[33-0.8]",
    "test_window_partitions_are_allowlisted[q_dedup_policy]",
}
# whole modules whose per-test lake fixtures dominate (every test pays a
# 60-120 s setup; the surface they guard is stable and fully re-checked
# by the full tier)
_SLOW_MODULES = ("test_serving_plan_surface.py",)


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    for item in items:
        fn = item.name.split("[")[0]
        if (
            fn in _SLOW_BY_MEASUREMENT
            or item.name in _SLOW_PARAMS
            or any(m in item.nodeid for m in _SLOW_MODULES)
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from py_gtfs_duckdb_spark.session import get_spark

    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def plan_str(spark, sf_dir: str, name: str) -> str:
    """Formatted physical plan of a registered battery query — the shared
    capture helper for every plan-shape/cache-scope assertion."""
    import contextlib
    import io

    from py_gtfs_duckdb_spark.plans import QUERIES

    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(autouse=True)
def _release_scoped_persists():
    """Free any operator-scoped persists after each test: tests that call
    operators DIRECTLY (not through the battery's release-on-entry
    wrapper) must not leak cache entries into the next test — the
    round-6 ordering bug (q_doc_scorecard parity run leaking its cached
    frames into test_dsir_single_explode's plan)."""
    yield
    from py_gtfs_duckdb_spark.operators._scope import release_shared

    release_shared()
