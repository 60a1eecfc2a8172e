"""The public API in one flat namespace.

``from py_gtfs_duckdb_spark.api import ...`` gives a user every
operator the engine supports without memorizing module layout. Grouped
the way the README presents the surface; everything here is covered by
the oracle battery and/or the test suite.
"""

from __future__ import annotations

# GTFS engine surface
from py_gtfs_duckdb_spark.lake import GtfsLake  # noqa: F401
from py_gtfs_duckdb_spark.queries import GtfsQueries  # noqa: F401
from py_gtfs_duckdb_spark.session import get_spark, load_tables  # noqa: F401

# cache-lifecycle contract for long-lived callers: operators that persist
# a shared frame register it here; wrap each loop iteration in
# shared_scope(spark) (or call release_shared once per iteration) so
# persists never accumulate across iterations
from py_gtfs_duckdb_spark.operators._scope import (  # noqa: F401
    release_shared,
    shared_scope,
)

# dedup
from py_gtfs_duckdb_spark.operators.dedup import (  # noqa: F401
    containment_pairs,
    containment_pairs_incremental,
    exact_jaccard,
    golden_records,
    keep_canonical,
    keep_top_k,
    lsh_bands,
    minhash_calibration,
    minhash_lsh_dedup,
    minhash_lsh_dedup_incremental,
    embedding_neardup_pairs,
    ngram_jaccard_pairs,
    shingle_sets,
    shingle_signatures,
    semantic_dedup,
    simhash_near_pairs,
    simhash_signatures,
)
from py_gtfs_duckdb_spark.operators.graph import (  # noqa: F401
    connected_components,
    containment_rejects,
    strongly_connected_components,
)
from py_gtfs_duckdb_spark.streaming.ingest import (  # noqa: F401
    containment_policy_rejects_frame,
)
from py_gtfs_duckdb_spark.sources.jsonl import (  # noqa: F401
    read_documents_jsonl,
    write_documents_jsonl,
)

# similarity / ANN — float production tier ...
from py_gtfs_duckdb_spark.operators.similarity import (  # noqa: F401
    ann_recall,
    cosine_topk,
    ivf_cells,
    ivf_centroids,
    ivf_topk,
    ivf_train_lloyd,
    ivfpq_topk,
    lsh_bucketed_topk,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    pq_train,
    random_projection,
    semantic_decontaminate,
)

# ... and the quantized verification tier (integer-exact, SQL-replayable
# index builds — see operators/annq.py)
from py_gtfs_duckdb_spark.operators.annq import (  # noqa: F401
    embedding_audit,
    ivf_cell_profile,
    ivf_lloyd_topk_q,
    ivf_train_lloyd_q,
    ivfpq_topk_q,
    lsh_topk_q,
    pq_encode_q,
    pq_topk_rerank_q,
    pq_train_q,
)

# text analysis
from py_gtfs_duckdb_spark.operators.text import (  # noqa: F401
    compression_stats,
    dedup_spans,
    doc_ngram_hashes,
    fingerprint,
    language_id,
    ngram_novelty,
    pii_scrub,
    quality_rules,
    quality_score,
    repetition_stats,
    source_ngram_overlap,
    split_units,
    text_stats,
    token_count,
    winnow_fingerprints,
)

# lexical search
from py_gtfs_duckdb_spark.operators.lexical import (  # noqa: F401
    bigram_nll,
    bm25_topk,
    dsir_weights,
    pmi_bigrams,
    tfidf_keywords,
    unigram_model,
    unigram_nll,
    vocab_spectrum,
)

# fuzzy record linkage (blocked edit-distance joins)
from py_gtfs_duckdb_spark.operators.linkage import (  # noqa: F401
    fuzzy_join_blocked,
    fuzzy_pairs,
)
from py_gtfs_duckdb_spark.operators.bpe import (  # noqa: F401
    FIXED_MERGES_V1,
    bpe_encode_stats,
    bpe_tokenize,
    bpe_train,
    bpe_train_distributed,
    bpe_vocab_spectrum,
    wide_vocab_corpus,
)

# temporal joins and sessionization (the *_chunked forms trade one
# bounded extra stage for window partitions that never scale with a
# single entity's activity — see SCALING.md §12)
from py_gtfs_duckdb_spark.operators.temporal import (  # noqa: F401
    asof_join,
    asof_join_chunked,
    interval_join_binned,
    lookback_chunks,
    range_join_binned,
    sessionize_chunked,
)

# pipeline composition
from py_gtfs_duckdb_spark.operators.pipeline import (  # noqa: F401
    audit_scorecard,
    bloom_decontaminate,
    corpus_diff,
    chunk_documents,
    curate_corpus,
    decontaminate,
    export_shards,
    histogram_counts,
    histogram_drift,
    histogram_drift_from_counts,
    histogram_quantiles,
    heavy_hitters,
    histogram_quantiles_from_counts,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
    mix_sources,
    length_buckets,
    pack_sequences,
    profile_table,
    rescue_leaked_eval,
    skew_report,
    source_report,
    split_assign,
    split_leakage,
    stratified_sample,
    temperature_budgets,
    temperature_weights,
    token_histogram,
    weighted_sample,
    write_shards,
)

# event-sequence analytics
from py_gtfs_duckdb_spark.operators.analytics import (  # noqa: F401
    cohort_retention,
    funnel,
    funnel_times,
    resample_gapfill,
    rolling_distinct,
    transition_matrix,
)

# multimodal
from py_gtfs_duckdb_spark.operators.codecs import (  # noqa: F401
    decode_avi_mjpeg,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    encode_bmp,
    encode_gif,
    encode_avi_mjpeg,
    encode_jpeg,
    encode_png,
    encode_wav_g711,
    parse_wav,
)
from py_gtfs_duckdb_spark.operators.media_registry import (  # noqa: F401
    DecoderEntry,
    register_decoder,
    registered_names,
    unregister_decoder,
)
from py_gtfs_duckdb_spark.operators.multimodal import (  # noqa: F401
    audio_features,
    decode_image,
    decode_video,
    decode_ppm,
    decode_wav,
    decode_y4m,
    extract_features,
    resize_images,
    resize_media,
    sample_frames,
    video_frame_features,
)

# ANN index lifecycle over the lake
from py_gtfs_duckdb_spark.operators.ann_index import (  # noqa: F401
    ann_query,
    build_ann_index,
    load_ann_models,
)

# streaming
from py_gtfs_duckdb_spark.streaming.ingest import (  # noqa: F401
    NearDupIngestGate,
    run_ingest_stream,
)
from py_gtfs_duckdb_spark.streaming.stats import (  # noqa: F401
    HistogramStatsRecorder,
)
from py_gtfs_duckdb_spark.streaming.stateful import (  # noqa: F401
    exact_dedup_stream,
    funnel_stream,
    transition_stream,
)
