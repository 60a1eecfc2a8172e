#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
 "samples": {...}, "iqr": {...}, "n_samples": N}

value = sum of per-query medians across the headline set (excluding Spark
session startup — that cost is amortized away on a long-lived cluster).

Variance design (VERDICT r3 "What's wrong" #1: median-of-3 cannot support
a 2x gate in a +-50%-noise sandbox): one uncounted warmup pass over the
whole set, then N_SAMPLES measured passes taken ROUND-ROBIN (pass 1 runs
every query once, then pass 2, ...) so ambient load drift spreads across
all queries instead of correlating with whichever query was running when
the sandbox got busy. Per-query medians + IQRs + raw sample arrays are all
persisted so a future round can distinguish noise from regression.
"""

from __future__ import annotations

import json
import os
import statistics
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

N_SAMPLES = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "8"))

# Frozen per-query anchors from BENCH_r01.json (the BASELINE.md reference
# run: sf0.1, local[32], median of 3). The §16 bench-reading rule
# (SCALING.md): judge a regression on per-query MIN vs anchor, because
# medians on this host carry ±13-30% ambient drift that moves ALL queries
# together — vs_baseline_min_ratio and ambient_factor below make that
# reading mechanical instead of a by-hand reconstruction from BENCH_FULL.
BASELINE_ANCHORS = {
    "q_flagship_nominal_trips": 1.209,
    "q_join_chain_left": 1.238,
    "q_filter_isin": 0.403,
    "q_agg_collect_list": 0.54,
    "q_set_union_except": 0.591,
    "q_match_trip_candidates": 0.633,
    "q_topk_per_group": 0.482,
    "q_window_tumbling": 0.31,
    "q_window_session": 0.494,
    "q_stream_dedup_latest": 0.387,
    "q_dedup_exact": 0.245,
    "q_dedup_minhash_lsh": 1.946,
    "q_dedup_ngram_jaccard": 1.173,
    "q_dedup_embedding": 0.571,
    "q_text_stats": 0.192,
    "q_lang_id": 0.202,
    "q_knn_cosine": 0.919,
    "q_agg_collect_list_salted": 0.421,
    "q_doc_winnow": 0.802,
    "q_ann_ivf": 0.766,
}

# Round-4 operators, timed separately so the headline total stays
# comparable across rounds/baseline. Fewer samples: these inform, they
# don't gate.
EXTRA = [
    "q_join_asof",
    "q_join_asof_tol",
    "q_range_join",
    "q_repetition_stats",
    "q_quality_rules",
    "q_pii_scrub",
    "q_source_report",
    "q_split_assign",
    "q_token_histogram",
    "q_ann_pq",
    "q_pack_sequences",
    "q_export_shards",
    "q_dedup_spans",
    "q_bm25_topk",
    "q_audio_features",
    "q_image_resize",
    "q_video_frames",
    "q_mix_sources",
    "q_unigram_nll",
    "q_source_overlap",
    "q_corpus_diff",
    "q_vocab_spectrum",
    "q_ngram_novelty",
    "q_dsir_weights",
    "q_split_leakage",
    "q_ivf_cell_profile",
    "q_ann_lsh",
    "q_ann_ivf_lloyd",
    "q_ann_ivfpq",
    "q_minhash_calibration",
    "q_length_buckets",
    "q_embedding_audit",
    "q_split_rescue",
    "q_doc_scorecard",
    "q_dedup_keep_topk",
    "q_bpe_encode",
    "q_bpe_vocab",
    "q_bpe_fertility",
    # round-9 additions: the deep-table Arrow path and the bounded
    # chunked-carry forms, benched next to their unbounded siblings
    "q_bpe_tokenize_large",
    "q_window_session_chunked",
    "q_join_asof_chunked",
    "q_window_trailing",
    "q_window_trailing_chunked",
    "q_interval_join",
    # round-10 additions: bounded-state per-group quantiles,
    # deterministic weighted sampling, mergeable KMV distinct sketch
    "q_histogram_quantiles",
    "q_weighted_sample",
    "q_kmv_distinct",
    "q_doc_chunks",
    # late-round-10 additions: blocked fuzzy linkage, integer-exact
    # tf-idf keywords, histogram drift (KS + PSI)
    "q_fuzzy_pairs",
    "q_tfidf_keywords",
    "q_dist_drift",
    "q_dedup_containment",
    "q_dedup_containment_inc",
    # round-11 addition: embedding-tier benchmark decontamination
    "q_decontaminate_semantic",
    # round-12 addition: distributed containment keep-policy (cap=0 —
    # dominated by fixed SCC/DAG scheduler rounds at this scale, which
    # is the point: rounds track chain depth, not corpus size)
    "q_dedup_policy",
    "q_ann_recall_curve",
    "q_mix_temperature",
    "q_profile_table",
    "q_skew_report",
    "q_ann_recall_lsh",
    "q_ann_recall_pq",
    "q_golden_records",
    # round-13 addition: bigram-LM NLL (perplexity-filter score)
    "q_bigram_nll",
    # round-13 additions: event-sequence analytics trio + exact
    # frequent-items sketch (two corpus passes by design — candidates
    # map-side, then recount of candidates only)
    "q_event_funnel",
    "q_cohort_retention",
    "q_resample_gapfill",
    "q_heavy_hitters",
    # round-13 addition: bloom-prefilter decontamination tier
    "q_decontaminate_bloom",
    # round-13 additions: GIF (LZW) and BMP (RLE8) codec faces
    "q_image_resize_gif",
    "q_image_resize_bmp",
    # round-13 additions: PMI collocations, windowed funnel, Markov
    # transition matrix
    "q_pmi_bigrams",
    "q_event_funnel_window",
    "q_event_transitions",
    "q_funnel_time_to_convert",
    "q_rolling_distinct",
]
N_EXTRA_SAMPLES = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_SAMPLES", "3"))

# Extras whose median exceeds this get promoted to the full N_SAMPLES
# regime (median+IQR): below it, run-to-run sandbox noise dominates any
# regression a tighter estimate could expose.
HEAVY_THRESHOLD_S = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_S", "1.0"))

# The curate compositions are the heaviest single entries (~half the
# headline total each as ONE query), so they get their own round-robin
# sampling with per-sample arrays + IQR — separately from the headline
# total to keep it comparable across rounds/baseline (VERDICT r5 Next
# #5). Benching BOTH rules-off and rules-on makes the quality-rule cost
# separable from the shared dedup/CC/redaction spine. N >= 12: at n=8
# the pair's 0.7-0.9 s IQRs were too wide to distinguish a +6-9% drift
# from sandbox noise (VERDICT r9 hygiene note) — the wider sample
# settles it.
CURATE = ["q_curate_pipeline", "q_curate_rules"]
N_CURATE_SAMPLES = int(
    os.environ.get(
        "SPARK_GRAFT_BENCH_CURATE_SAMPLES",
        # quick runs (SPARK_GRAFT_BENCH_SAMPLES <= 3) stay quick
        str(max(N_SAMPLES, 12) if N_SAMPLES >= 4 else N_SAMPLES),
    )
)


def _python_probe_ms() -> float:
    """Fixed pure-Python + numpy microprobe, min of 3 (ms). Why (r14):
    ambient_factor is computed from JVM-query medians, but the host can
    drift on the PYTHON-WORKER side independently — r14 measured
    mapInPandas-heavy extras ~2x slower across two windows whose
    ambient_factor moved only 0.74 -> 0.76 (proven code-independent by
    re-running the untouched r13 tree on the same host). This probe
    pins that axis: read media/gram extras against python_probe_ms the
    way JVM queries are read against ambient_factor. The workload
    mirrors the hot Python-stage mix (md5 over short strings + int64
    numpy vector math); fixed sizes so the number is comparable
    across rounds (anchor on this host, calm: ~35-55 ms)."""
    import hashlib

    import numpy as np

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(20_000):
            acc ^= hashlib.md5(str(i).encode("utf-8")).digest()[0]
        a = np.arange(400_000, dtype=np.int64)
        for _ in range(20):
            a = (a * 2_654_435_761) % 2_147_483_647
        acc ^= int(a[acc % len(a)])
        best = min(best, (time.perf_counter() - t0) * 1000)
    return round(best, 1)


def _codec_throughput() -> dict:
    """Per-codec decode throughput (VERDICT r12 Next #3): the pure-
    Python/numpy codecs are the one hot path battery timings hide (they
    run inside mapInPandas task time), so a 10x parsing regression would
    otherwise be invisible. Fixed synthetic fixtures, single-threaded
    driver-side decode loop repeated to >=0.4 s, payload MB/s.

    Anchors measured at r13 on this sandbox (ambient ~1.0) — a future
    round reading BENCH_r{N}.ops.codec_throughput compares against:
      ppm ~2900 MB/s and wav-pcm ~3700 (memcpy-bound), y4m ~2000,
      wav-g711 ~150 (table lookup), png ~105 (zlib-bound after the r13
      all-filter-0 vectorized fast path; ~47 with per-row unfiltering),
      bmp-rle8 ~5 (per-escape Python loop over vectorized run fills),
      gif ~1.3 (LZW — a per-symbol Python loop, same entropy-tier
      boundary as jpeg; the pluggable registry is the full-corpus path),
      jpeg ~1.0 and avi-mjpeg ~1.05 (entropy decode — r13 rework:
      unstuffed segments + 10-bit prefix LUT + one 32-bit peek per
      coefficient + batched IDCT took it from 0.22; still the slow tier
      the plugin registry's libjpeg-turbo escape hatch is for).
    """
    import numpy as np

    from py_gtfs_duckdb_spark.operators import codecs as C
    from py_gtfs_duckdb_spark.operators import multimodal as M

    rng_imgs = [M._synth_gradient(s, 64, 48) for s in range(6)]
    i = np.arange(8000, dtype=np.int64)
    pcm16 = (((i * 2_654_435_761) % 65536) - 32768).astype("<i2")
    fixtures = {
        "ppm": ([M.synth_ppm(s, 64, 48) for s in range(6)], M.decode_ppm),
        "png": ([M.synth_png(s, 64, 48) for s in range(6)], C.decode_png),
        # GIF is palette-bound (<=256 colors): quantize the gradient to
        # 8 levels/channel (<=64 colors) before encoding
        "gif": (
            [
                C.encode_gif(M._synth_gradient(s, 64, 48) // 32 * 32)
                for s in range(6)
            ],
            C.decode_gif,
        ),
        "bmp-rle8": (
            [
                C.encode_bmp(M._synth_gradient(s, 64, 48) // 32 * 32, "rle8")
                for s in range(6)
            ],
            C.decode_bmp,
        ),
        "jpeg": (
            [C.encode_jpeg(im, quality=90) for im in rng_imgs],
            C.decode_jpeg,
        ),
        "wav-pcm": ([M.synth_wav(s, 8000, 8000) for s in range(4)], C.parse_wav),
        "wav-g711": (
            [C.encode_wav_g711(pcm16, 8000, law) for law in ("ulaw", "alaw")],
            C.parse_wav,
        ),
        "y4m": ([M.synth_y4m(s, 64, 48) for s in range(4)], M.decode_y4m),
        "avi-mjpeg": ([C.encode_avi_mjpeg(rng_imgs[:3])], C.decode_avi_mjpeg),
    }
    out: dict[str, dict] = {}
    for name, (payloads, decode) in fixtures.items():
        total_b = sum(len(p) for p in payloads)
        reps = 0
        t0 = time.perf_counter()
        while True:
            for p in payloads:
                decode(p)
            reps += 1
            elapsed = time.perf_counter() - t0
            if elapsed >= 0.4 or reps >= 400:
                break
        mb_s = total_b * reps / elapsed / 1e6
        out[name] = {
            "payload_bytes": total_b,
            "reps": reps,
            "sec": round(elapsed, 3),
            "mb_per_s": round(mb_s, 2),
        }
        print(
            f"# codec {name}: {mb_s:.2f} MB/s "
            f"({total_b} B x {reps} reps in {elapsed:.3f}s)",
            file=sys.stderr,
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from py_gtfs_duckdb_spark.plans import QUERIES
    from py_gtfs_duckdb_spark.session import get_spark, load_tables

    spark = get_spark("bench")

    # Effective-topology evidence (VERDICT r13 Next #2): the scaling
    # contract runs this bench at two core counts, but the JSON only
    # echoed the requested env — emit what the JVM actually got so
    # `suspect_cpus_ignored` can be cleared (or confirmed) by evidence.
    master = spark.sparkContext.master
    parallelism = spark.sparkContext.defaultParallelism
    python_probe = _python_probe_ms()
    print(
        f"# topology: master={master} defaultParallelism={parallelism} "
        f"python_probe_ms={python_probe}",
        file=sys.stderr,
    )

    # Warm the JVM/codegen path and the input tables once (not counted):
    # long-lived clusters pay footer reads/class-loading once, not per
    # query, so steady-state is the honest per-query figure.
    spark.range(1000).count()
    for df in load_tables(spark, sf_dir, register_views=False).values():
        df.count()

    def run_once(name: str) -> tuple[float, int]:
        start = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        elapsed = time.perf_counter() - start
        spark.catalog.clearCache()  # operators may persist() internally
        return elapsed, n

    # Extras get N_EXTRA_SAMPLES measured runs each; any extra whose
    # median lands above HEAVY_THRESHOLD_S is promoted to the full
    # N_SAMPLES regime on the spot (VERDICT r6 Next #5: a 2x blip on a
    # single-sample entry like the r6 q_join_asof_tol one is
    # undiagnosable), and per-sample arrays + IQR are persisted for every
    # extra so next round can separate noise from regression.
    extra: dict[str, float] = {}
    extra_samples: dict[str, list[float]] = {}
    extra_iqr: dict[str, float] = {}

    def run_extras() -> None:
        for name in EXTRA if N_EXTRA_SAMPLES > 0 else []:
            runs = []
            for i in range(N_EXTRA_SAMPLES + 1):
                elapsed, n = run_once(name)
                if i > 0:  # first run is warmup (codegen / codebook training)
                    runs.append(elapsed)
            # decide promotion ONCE on the initial sample — re-checking
            # each iteration would let a near-threshold entry stop early
            # with a small mixed sample, the exact undiagnosable-blip
            # problem the promotion exists to fix
            if statistics.median(runs) > HEAVY_THRESHOLD_S:
                while len(runs) < N_SAMPLES:
                    elapsed, n = run_once(name)
                    runs.append(elapsed)
            extra[name] = round(statistics.median(runs), 3)
            extra_samples[name] = [round(r, 4) for r in runs]
            if len(runs) >= 2:
                quartiles = statistics.quantiles(runs, n=4)
                extra_iqr[name] = round(quartiles[2] - quartiles[0], 3)
            else:
                extra_iqr[name] = 0.0
            print(
                f"# extra {name}: {extra[name]:.3f}s median, IQR "
                f"{extra_iqr[name]:.3f}s over {[round(r, 3) for r in runs]} "
                f"({n} rows)",
                file=sys.stderr,
            )

    # Ordering experiment knob (VERDICT r10 Next #1): the default keeps
    # the headline battery FIRST in the process (extras can't pollute the
    # JVM/page cache before it); EXTRAS_FIRST=1 deliberately reverses the
    # order so the contamination hypothesis is testable — SCALING.md §16
    # records both orderings measured back-to-back at sf0.1.
    extras_first = os.environ.get("SPARK_GRAFT_BENCH_EXTRAS_FIRST") == "1"
    if extras_first:
        run_extras()

    # Warmup passes: per-query-shape codegen/compile happens once on a
    # long-lived cluster, and the JVM's C2 JIT needs a few thousand
    # invocations to reach steady state — one pass is not enough (measured:
    # the first post-warmup pass still ran ~2x slow), so warm twice.
    rowcounts: dict[str, int] = {}
    for _ in range(2):
        for name in HEADLINE:
            _, rowcounts[name] = run_once(name)

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(N_SAMPLES):
        for name in HEADLINE:
            elapsed, _ = run_once(name)
            samples[name].append(elapsed)

    timings: dict[str, float] = {}
    iqr: dict[str, float] = {}
    mins: dict[str, float] = {}
    min_ratio: dict[str, float] = {}
    ambient_ratios: list[float] = []
    total = 0.0
    for name in HEADLINE:
        med = statistics.median(samples[name])
        if len(samples[name]) >= 2:
            quartiles = statistics.quantiles(samples[name], n=4)
            q1, q3 = quartiles[0], quartiles[2]
        else:  # SPARK_GRAFT_BENCH_SAMPLES=1 quick runs: no spread to report
            q1 = q3 = med
        timings[name] = round(med, 3)
        iqr[name] = round(q3 - q1, 3)
        mins[name] = round(min(samples[name]), 3)
        anchor = BASELINE_ANCHORS.get(name)
        if anchor:
            min_ratio[name] = round(mins[name] / anchor, 3)
            ambient_ratios.append(med / anchor)
        total += med
        print(
            f"# {name}: {med:.3f}s median, IQR {q3 - q1:.3f}s over "
            f"{[round(r, 3) for r in samples[name]]} ({rowcounts[name]} rows)",
            file=sys.stderr,
        )
    # run-level ambient-load estimate: the median of per-query
    # median/anchor ratios. When ALL queries move together this tracks
    # host slowness, not code — a single query whose min_ratio exceeds
    # both the 2x bar AND ambient_factor is the real regression signal.
    ambient_factor = (
        round(statistics.median(ambient_ratios), 3) if ambient_ratios else None
    )

    # curate pair: warmup once each, then N_CURATE_SAMPLES round-robin passes
    for name in CURATE:
        run_once(name)
    curate_samples: dict[str, list[float]] = {name: [] for name in CURATE}
    curate_rows: dict[str, int] = {}
    for _ in range(N_CURATE_SAMPLES):
        for name in CURATE:
            elapsed, curate_rows[name] = run_once(name)
            curate_samples[name].append(elapsed)
    curate: dict[str, dict] = {}
    for name in CURATE:
        vals = curate_samples[name]
        med = statistics.median(vals)
        if len(vals) >= 2:
            quartiles = statistics.quantiles(vals, n=4)
            q1, q3 = quartiles[0], quartiles[2]
        else:
            q1 = q3 = med
        curate[name] = {
            "median": round(med, 3),
            "iqr": round(q3 - q1, 3),
            "samples": [round(v, 4) for v in vals],
        }
        print(
            f"# curate {name}: {med:.3f}s median, IQR {q3 - q1:.3f}s over "
            f"{[round(v, 3) for v in vals]} ({curate_rows[name]} rows)",
            file=sys.stderr,
        )
    rules_delta = round(
        curate["q_curate_rules"]["median"] - curate["q_curate_pipeline"]["median"], 3
    )
    print(f"# curate rules-on delta: {rules_delta:.3f}s", file=sys.stderr)

    if not extras_first:
        run_extras()

    # Non-battery operator benchmarks: training jobs whose output is a
    # model dict, not a DataFrame (no oracle — the battery can't carry
    # them), timed as single runs because each IS a multi-job loop that
    # amortizes its own codegen. bpe_train_distributed at the asked-for
    # n_merges=200 budget hits the corpus's 106-merge fixpoint and stops
    # there (the generator vocabulary is closed) — the measured figure is
    # the full corpus-pass + ~106 iterations of pair-count/argmax/rewrite
    # (see SCALING.md for the cost model).
    ops: dict[str, dict] = {}
    if N_EXTRA_SAMPLES > 0:
        from py_gtfs_duckdb_spark.operators.bpe import bpe_train_distributed
        from py_gtfs_duckdb_spark.plans._tables import t as _t

        start = time.perf_counter()
        model = bpe_train_distributed(_t(spark, sf_dir, "documents"), n_merges=200)
        ops["bpe_train_distributed"] = {
            "sec": round(time.perf_counter() - start, 3),
            "n_merges_learned": len(model["merges"]),
        }
        spark.catalog.clearCache()
        print(
            f"# op bpe_train_distributed: {ops['bpe_train_distributed']['sec']:.3f}s "
            f"({ops['bpe_train_distributed']['n_merges_learned']} merges learned)",
            file=sys.stderr,
        )

        # deep-vocabulary scale line (VERDICT r10 Next #3): 1000 merges on
        # the wide-vocab stress corpus with fast batching — the 32k-vocab
        # path. Reference points at sf0.1 (SCALING.md §13): sequential
        # 122 ms/merge, fast k=32 ≈ 21 ms/merge (84 rounds), compression
        # delta vs sequential 0.00% at this depth.
        import pyspark.sql.functions as _F

        from py_gtfs_duckdb_spark.operators.bpe import (
            bpe_tokenize,
            wide_vocab_corpus,
        )

        wide = (
            wide_vocab_corpus(_t(spark, sf_dir, "documents"))
            .withColumn("doc_id", _F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        start = time.perf_counter()
        model = bpe_train_distributed(
            wide, n_merges=1000, min_pair_freq=1,
            batch_merges=32, strategy="fast",
        )
        train_sec = time.perf_counter() - start
        n_tok = (
            bpe_tokenize(wide, model, id_col="doc_id")
            .agg(_F.sum("n_bpe_tokens"))
            .collect()[0][0]
        )
        ops["bpe_train_1k_fast"] = {
            "sec": round(train_sec, 3),
            "n_merges_learned": len(model["merges"]),
            "n_rounds": len(model["rounds"]),
            "ms_per_merge": round(
                train_sec / max(len(model["merges"]), 1) * 1000, 1
            ),
            "corpus_tokens_after": int(n_tok),
        }
        spark.catalog.clearCache()
        print(
            f"# op bpe_train_1k_fast: {train_sec:.3f}s "
            f"({len(model['merges'])} merges / {len(model['rounds'])} rounds, "
            f"{ops['bpe_train_1k_fast']['ms_per_merge']} ms/merge, "
            f"{n_tok} corpus tokens after)",
            file=sys.stderr,
        )

    if N_EXTRA_SAMPLES > 0:
        ops["codec_throughput"] = _codec_throughput()

    full = {
        "metric": "headline_batch_total",
        "value": round(total, 3),
        "unit": "sec",
        "master": master,
        "parallelism": parallelism,
        "python_probe_ms": python_probe,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_samples": N_SAMPLES,
        "iqr": iqr,
        "min": mins,
        "vs_baseline_min_ratio": min_ratio,
        "ambient_factor": ambient_factor,
        "samples": {k: [round(v, 4) for v in vs] for k, vs in samples.items()},
        # environment-noise evidence: if some PASSES are uniformly
        # slow across all queries, the drift is ambient load, not a
        # query regression. noise_ratio = slowest/fastest pass total;
        # sum_of_mins approximates the unpolluted steady state.
        "pass_totals": [
            round(sum(samples[k][i] for k in HEADLINE), 3)
            for i in range(N_SAMPLES)
        ],
        "extra_queries": extra,
        "extra_samples": extra_samples,
        "extra_iqr": extra_iqr,
        "curate": curate,
        "curate_rules_delta": rules_delta,
        "ops": ops,
        "sum_of_mins": round(sum(min(v) for v in samples.values()), 3),
        "noise_ratio": round(
            max(sum(samples[k][i] for k in HEADLINE) for i in range(N_SAMPLES))
            / max(
                1e-9,
                min(
                    sum(samples[k][i] for k in HEADLINE)
                    for i in range(N_SAMPLES)
                ),
            ),
            3,
        ),
    }

    # The harness that records this run keeps only the TAIL of stdout
    # (~2000 chars) and parses the last JSON line it finds — the full
    # payload outgrew that budget once per-sample arrays landed, so the
    # recorded line failed to parse for three rounds straight. stdout now
    # carries a compact line guaranteed to fit (headline medians + the
    # aggregate evidence); everything else (sample arrays, IQRs, extras)
    # goes to BENCH_FULL.json beside this script.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)
    compact = {
        k: full[k]
        for k in (
            "metric",
            "value",
            "unit",
            "master",
            "parallelism",
            "python_probe_ms",
            "queries",
            "sf",
            "n_samples",
            "sum_of_mins",
            "noise_ratio",
            "curate_rules_delta",
            "vs_baseline_min_ratio",
            "ambient_factor",
        )
    }
    compact["curate"] = {n: curate[n]["median"] for n in CURATE}
    # one-number extras trend (per-extra medians live in the detail file)
    compact["extra_total"] = round(sum(extra.values()), 3)
    compact["n_extras"] = len(extra)
    compact["detail"] = "BENCH_FULL.json"
    line = json.dumps(compact)
    if len(line) > 1900:  # never regress past the recorder's tail budget
        # medians drop first: the min-ratio dict is the §16 decision
        # input, the medians are reconstructable from BENCH_FULL.json
        del compact["queries"]
        line = json.dumps(compact)
    if len(line) > 1900:
        del compact["vs_baseline_min_ratio"]
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
