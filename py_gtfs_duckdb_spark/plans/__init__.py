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
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
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
# order with a bounded budget (rounds 1-3 covered exactly the first 50
# names), so the first 50 slots carry the queries whose oracle evidence
# matters most. Round-4 rotation (VERDICT r3 Next #1): the 12 oracle-
# bearing queries that sat past the 50-slot cap in round 3 (windows,
# top-k, approx/count-distinct, salted collect, json/sha256, unpivot,
# clusters, top-tokens) are rotated into the window this round so they
# earn driver hash-parity evidence; 12 singletons that are already
# driver-green in rounds 1+2+3 (q_scan_star, q_limit, q_agg_count, ...)
# sit out for one round in the tail. Restore the canonical §2 order in
# round 5. The true tail holds late-oracled / lower-priority variants
# and the rows-only queries (no SQL-expressible oracle).
_PRIORITY = [
    # flagship first — the reference's headline path (ddb.py:177-202)
    "q_flagship_nominal_trips",
    # SURVEY §2 battery rows not yet triple-evidenced
    "q_project_derived",
    "q_filter_range",
    "q_filter_isin",
    "q_filter_first_stop",
    "q_map_id_regex",
    "q_join_inner",
    "q_join_chain_left",
    "q_join_anti",
    "q_join_semi",
    "q_upsert_stops",
    "q_match_trip_candidates",
    "q_agg_collect_list",
    "q_set_union_except",
    "q_sort_multikey",
    "q_sort_by_min_desc",
    "q_fn_totimestamp",
    "q_fn_interval",
    "q_fn_epoch",
    "q_fn_concat_format",
    "q_fn_case_enum",
    "q_stream_dedup_latest",
    "q_ttl_retention",
    "q_pivot",
    # rotated in this round (r3 tail; driver evidence wanted)
    "q_window_tumbling",
    "q_window_sliding",
    "q_window_session",
    "q_topk_per_group",
    "q_agg_count_distinct",
    "q_agg_approx_distinct",
    "q_agg_collect_list_salted",
    "q_fn_json",
    "q_fn_sha256",
    "q_unpivot",
    "q_dedup_clusters",
    "q_text_top_tokens",
    # extension pillars: dedup
    "q_dedup_exact",
    "q_dedup_bow",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_embedding",
    # text analysis
    "q_text_stats",
    "q_text_quality",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_doc_winnow",
    # similarity search
    "q_knn_cosine",
    "q_ann_ivf",
    "q_embed_norm",
    # multimodal plumbing (oracle-checkable tier)
    "q_multimodal_bytes",
    # --- sitting out for round 4: triple-green (r1+r2+r3) singletons ---
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
    # --- tail: new round-4 pipeline ops (rotate into the window next
    # round for driver evidence; locally oracle-checked meanwhile) ---
    "q_sample_stratified",
    "q_decontaminate",
    "q_pack_sequences",
    "q_dedup_keep_canonical",
    "q_repetition_stats",
    "q_quality_rules",
    "q_pii_scrub",
    "q_split_assign",
    "q_token_histogram",
    "q_source_report",
    "q_join_asof",
    "q_join_asof_tol",
    "q_range_join",
    "q_dedup_incremental",
    "q_export_shards",
    "q_quantile_tokens",
    "q_semantic_dedup",
    "q_dedup_cluster_sizes",
    # --- tail: rows-only queries (no SQL-expressible oracle) plus the
    # late-oracled multimodal variants ---
    "q_dedup_simhash",
    "q_ann_lsh",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_curate_pipeline",
    "q_bpe_tokens",
    "q_embed_project",
    "q_ann_ivf_lloyd",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_multimodal_resize",
]

_missing = set(QUERIES) - set(_PRIORITY)
_unknown = set(_PRIORITY) - set(QUERIES)
assert not _missing and not _unknown, (
    f"battery order out of sync: missing={sorted(_missing)} unknown={sorted(_unknown)}"
)
QUERIES = {name: QUERIES[name] for name in _PRIORITY}
ORACLE = {name: ORACLE[name] for name in _PRIORITY if name in ORACLE}

__all__ = ["QUERIES", "ORACLE", "query"]
