"""The flat public API namespace: importable, complete, callable."""

from __future__ import annotations

import inspect


def test_api_surface_imports_and_is_flat():
    from py_gtfs_duckdb_spark import api

    names = [
        n
        for n in dir(api)
        if not n.startswith("_")
        and (inspect.isfunction(getattr(api, n)) or inspect.isclass(getattr(api, n)))
    ]
    # the headline operators a switching user reaches for first
    for must in (
        "GtfsLake",
        "GtfsQueries",
        "minhash_lsh_dedup",
        "minhash_lsh_dedup_incremental",
        "keep_canonical",
        "connected_components",
        "cosine_topk",
        "pq_train",
        "ivfpq_topk",
        "asof_join",
        "asof_join_chunked",
        "sessionize_chunked",
        "interval_join_binned",
        "range_join_binned",
        "curate_corpus",
        "export_shards",
        "bpe_train",
        "pii_scrub",
        "quality_rules",
        "NearDupIngestGate",
        "exact_dedup_stream",
        "dedup_spans",
        "bm25_topk",
        "tfidf_keywords",
        "fuzzy_join_blocked",
        "fuzzy_pairs",
        "histogram_drift",
        # the cache-lifecycle contract for long-lived loop callers
        "release_shared",
        "shared_scope",
    ):
        assert must in names, must
    assert len(names) >= 50
