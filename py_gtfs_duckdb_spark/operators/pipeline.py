"""Training-data pipeline composition operators: deterministic sampling,
benchmark decontamination, and sequence packing.

These are the corpus-curation steps between "raw documents" and "training
mix" that a 100 TB pipeline runs after dedup/quality/lang-id (all in
operators/text.py, operators/dedup.py):

- **stratified hash sampling** — reproducible per-stratum keep rates
  (e.g. re-weight languages in the mix). The keep decision is a pure
  column expression on an md5-derived unit hash, so it is deterministic
  across runs AND across engines (the DuckDB oracle computes the same
  bytes), shuffles nothing, and scans each row once. No RNG state, no
  sample() nondeterminism.
- **decontamination** — drop/flag corpus documents sharing winnowed
  fingerprints (operators/text.py:winnow_fingerprints) with a held-out
  benchmark set. The benchmark side is tiny by construction, so the
  fingerprint join broadcasts; the corpus side stays partition-local.
- **sequence packing** — assign documents to fixed-token-budget bins for
  training batch assembly. Policy: budget-boundary packing — documents
  are laid out in a deterministic order within hash shards, and a bin is
  every contiguous ``budget``-token slice of the running total
  (documents are never split; a document straddling a boundary belongs
  to the bin its first token falls in). One window shuffle per shard,
  no driver-side state; shards keep window partitions bounded at any
  corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.functions import pround
from py_gtfs_duckdb_spark.operators._scope import shared
from py_gtfs_duckdb_spark.operators.text import token_count, winnow_fingerprints


def unit_hash(col: Column, mod: int = 10_000) -> Column:
    """Deterministic uniform int in [0, mod) from md5 — engine-portable
    (DuckDB: ``('0x' || substr(md5(x), 1, 8))::BIGINT % mod``)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % mod
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by
    ``unit_hash(key)`` — reproducible, join-free, single scan."""
    threshold = F.lit(int(default_rate * 10_000))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 10_000))
        ).otherwise(threshold)
    return df.where(unit_hash(F.col(key_col)) < threshold)


def decontaminate(
    docs: DataFrame,
    benchmark_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shared): corpus documents sharing >= 1 winnowed
    fingerprint with the benchmark partition (``benchmark_pred`` selects
    benchmark rows). Callers anti-join the result against the corpus to
    drop contaminated documents; returning the overlap count keeps the
    evidence auditable. The benchmark fingerprint set is broadcast."""
    # Winnowing is per-document, so each side fingerprints only ITS OWN
    # partition of the corpus: the tiny benchmark side never triggers a
    # full-corpus winnow pass, and no fps↔membership join is needed.
    bench_fps = (
        winnow_fingerprints(docs.where(benchmark_pred), text_col, id_col)
        .select("fp")
        .distinct()
    )
    corpus_fps = winnow_fingerprints(docs.where(~benchmark_pred), text_col, id_col)
    return (
        corpus_fps.join(F.broadcast(bench_fps), "fp")
        .groupBy("id")
        .agg(F.count_distinct("fp").cast("bigint").alias("n_shared"))
        .select(F.col("id").alias("doc_id"), "n_shared")
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int | None = None,
    n_hashes: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """:func:`decontaminate` semantics — (doc_id, n_shared) winnowed-
    fingerprint overlap with the benchmark partition — through a BLOOM
    PREFILTER: the tier for when the benchmark fingerprint set is too
    big to broadcast as an exact hash set but its bitmask still fits.

    The benchmark fps fold into an ``n_bits`` Bloom bitmask built
    DISTRIBUTEDLY (each fp explodes to its ``n_hashes`` bit positions;
    only the DISTINCT SET BITS — bounded by ``n_bits/8`` bytes, never by
    benchmark size — reach the driver), broadcast once, and probed by an
    Arrow-vectorized pandas_udf over the corpus fingerprints. Bloom
    membership has NO false negatives, so filtering to probe-positives
    loses no true overlap; the surviving trickle (true hits + ~fpp of
    the corpus) then verifies through the EXACT join against the
    benchmark set, which removes every false positive — the result is
    bit-identical to :func:`decontaminate` (pinned by test and by
    sharing its DuckDB oracle). The exchange before that verify join
    carries probe-positive fps only, not the corpus fingerprint stream —
    at 100 TB that is the difference between shuffling ~0.1% and 100%
    of the corpus winnow output.

    ``n_bits=None`` (the default) SIZES THE MASK TO THE BENCHMARK: the
    next power of two >= 16 bits per distinct benchmark fp (~0.24% fpp
    at 4 probes; fpp = (1-e^(-kn/m))^k), floor 2^16, cap 2^30 (128 MiB
    — still broadcastable). A fixed mask is the failure mode the sf1
    probe caught at baking time: 10x the benchmark into a saturating
    mask lifted fpp from ~0.1% to ~50% and the verify-join shuffle went
    68x for 10x input — auto-sizing restores ~linear scaling, and the
    count() that pays for it is one cheap action on the already-persisted
    benchmark frame.

    Probe positions use double hashing over the fp (already a uniform
    31-bit winnow hash): pos_j = (fp·A + j·(fp·B mod P') + j²) mod
    n_bits with fixed odd constants — deterministic, engine-portable,
    int64-safe (fp < 2^31, A,B < 2^31 → products < 2^62)."""
    _A, _B, _P = 2654435761, 2246822519, 2147483647

    def _positions_cols(fp: Column) -> list[Column]:
        h1 = F.pmod(fp * F.lit(_A), F.lit(_P))
        h2 = F.pmod(fp * F.lit(_B), F.lit(_P))
        return [
            F.pmod(h1 + F.lit(j) * h2 + F.lit(j * j), F.lit(n_bits)).cast("long")
            for j in range(n_hashes)
        ]

    bench_fps = shared(
        winnow_fingerprints(docs.where(benchmark_pred), text_col, id_col)
        .select("fp")
        .distinct()
    )
    if n_bits is None:
        n_fps = bench_fps.count()
        n_bits = 1 << max(16, min(30, (16 * max(n_fps, 1) - 1).bit_length()))
    set_bits = [
        r["pos"]
        for r in bench_fps.select(
            F.explode(F.array(*_positions_cols(F.col("fp")))).alias("pos")
        )
        .distinct()
        .collect()  # bounded by n_bits by construction, not by |benchmark|
    ]
    import numpy as np

    mask = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
    if set_bits:
        pos = np.asarray(set_bits, dtype=np.int64)
        np.bitwise_or.at(mask, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(mask)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _bloom_probe(fp_s):
        import numpy as np
        import pandas as pd

        m = bc.value
        fp = fp_s.to_numpy(dtype=np.int64)
        h1 = (fp * _A) % _P
        h2 = (fp * _B) % _P
        hit = np.ones(len(fp), dtype=bool)
        for j in range(n_hashes):
            p = (h1 + j * h2 + j * j) % n_bits
            hit &= (m[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit)

    corpus_fps = winnow_fingerprints(docs.where(~benchmark_pred), text_col, id_col)
    positives = corpus_fps.filter(_bloom_probe(F.col("fp")))
    if stats is not None:
        # diagnostic hook (tests, tuning): one extra pass over the
        # corpus fingerprints — never taken on the production path
        stats["n_bits"] = n_bits
        stats["n_set_bits"] = len(set_bits)
        stats["n_positives"] = positives.count()
    return (
        positives.join(bench_fps, "fp")  # exact verify kills false positives
        .groupBy("id")
        .agg(F.count_distinct("fp").cast("bigint").alias("n_shared"))
        .select(F.col("id").alias("doc_id"), "n_shared")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, n_tokens, bin): budget-boundary packing. Documents
    order by id within ``unit_hash(id) % n_shards`` shards; bin =
    floor(exclusive running token total / budget). Deterministic,
    windowable in any SQL engine, and shard-parallel — the window never
    sees more than one shard, so partitions stay bounded as the corpus
    grows. Sharding by the md5 unit hash (not a raw ``id % n``) keeps the
    shards uniform for STRING ids too — a raw modulo on a string id is
    NULL in Spark, which would silently collapse every document into one
    shard and make the window a single global partition."""
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        unit_hash(F.col(id_col), n_shards).alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return tk.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(float(budget)))
        .cast("bigint")
        .alias("bin"),
    )


# Split fractions in basis points of the unit hash (train gets the rest).
SPLIT_VAL_BP = 100  # 1%
SPLIT_TEST_BP = 100  # 1%


def split_col(key: Column) -> Column:
    """Deterministic train/val/test assignment from the md5 unit hash of
    the row key — the standard leakage-safe split: membership is a pure
    function of the key, so re-runs, backfills, and late-arriving shards
    land in the same split on any engine."""
    h = unit_hash(key)
    return (
        F.when(h < F.lit(10_000 - SPLIT_VAL_BP - SPLIT_TEST_BP), F.lit("train"))
        .when(h < F.lit(10_000 - SPLIT_TEST_BP), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_assign(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-split accounting: (split, n_docs, total_chars, total_tokens).
    The assignment itself is a narrow expression; the roll-up is a
    3-group aggregation with full map-side partial aggregation — shuffle
    volume is O(partitions), not O(rows), at any corpus size."""
    return (
        df.select(
            split_col(F.col(key_col)).alias("split"),
            F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


def mix_sources(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(doc_id, source, n_tokens): token-budgeted domain mixing — the
    "data mixture" step of a training pipeline. Each source keeps its
    documents in deterministic md5-unit-hash order until the running
    token total reaches ``weights[source] * token_budget`` (the document
    that crosses the budget is kept; sources without a weight are
    dropped).

    Scale shape — a distributed prefix sum, not one fat window: a raw
    per-source running total would put each source in ONE window
    partition (a handful of partitions for a 100 TB corpus). Instead the
    per-source order is (bucket, hash, id) with ``bucket = unit_hash %
    n_buckets``, so the running total splits into (a) a per-(source,
    bucket) token-sum aggregate — map-side combined, O(sources ×
    n_buckets) rows out, (b) a window over that tiny table for each
    bucket's starting offset, broadcast back, and (c) an intra-bucket
    running total whose window partitions number sources × n_buckets and
    shrink 1/n_buckets — raise ``n_buckets`` as the corpus grows. The
    slim (id, source, n_tokens, hash) projection is scanned twice (once
    for bucket sums, once for the main pass); if ``docs`` already
    carries an ``n_tokens`` column (curate_corpus annotates one) it is
    reused and the text column is never read."""
    n_tokens = (
        F.col("n_tokens").cast("bigint")
        if "n_tokens" in docs.columns
        else token_count(F.col(text_col))
    )
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        n_tokens.alias("n_tokens"),
        unit_hash(F.col(id_col)).alias("h"),
    ).withColumn("bkt", F.col("h") % n_buckets)

    budget = F.lit(0).cast("bigint")
    for source, wgt in sorted(weights.items()):
        budget = F.when(
            F.col("source") == source, F.lit(int(wgt * token_budget)).cast("bigint")
        ).otherwise(budget)

    wb = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        tk.groupBy("source", "bkt")
        .agg(F.sum("n_tokens").alias("btok"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("boff"),
        )
    )

    wi = (
        Window.partitionBy("source", "bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tk.join(F.broadcast(boff), ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (
                F.col("boff") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0))
            ).alias("cum_before"),
            budget.alias("budget"),
        )
        .where(F.col("cum_before") < F.col("budget"))
        .select("doc_id", "source", "n_tokens")
    )


def token_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two token-length histogram: bucket = floor(log2(tokens)),
    computed portably as ``length(bin(n)) - 1`` (binary digit count —
    exact integer math, no floating log2 edge cases at powers of two).
    Drives sequence-packing budget decisions and truncation accounting.
    Narrow expression + tiny aggregation: map-side combine reduces each
    partition to <= ~40 bucket rows before the shuffle."""
    nt = token_count(F.col(text_col))
    bucket = (F.length(F.bin(F.greatest(nt, F.lit(1)))) - 1).cast("bigint")
    return (
        df.select(bucket.alias("bucket"), nt.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )


def source_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus curation report: document count, exact-dup rate
    (via the normalized-content fingerprint), token volume, and mean
    quality. The quality mean is computed from an INTEGER sum of the
    4-decimal-fixed-point per-row scores, so it is independent of
    aggregation order — float SUM order differs between engines and
    executors, fixed-point does not. One hash aggregation keyed by
    source; near-constant output size regardless of corpus size."""
    from py_gtfs_duckdb_spark.operators.text import fingerprint, quality_col

    c = F.col(text_col)
    per_doc = df.select(
        F.col("source"),
        fingerprint(c).alias("fp"),
        token_count(c).alias("n_tokens"),
        # floor(x + 0.5), not CAST: double→int CAST truncates in Spark but
        # rounds in DuckDB — floor is exact IEEE arithmetic in both.
        F.floor(quality_col(c) * 10_000 + F.lit(0.5)).cast("bigint").alias("q_bp"),
    )
    n_docs = F.count(F.lit(1)).cast("bigint")
    n_uniq = F.count_distinct(F.col("fp")).cast("bigint")
    return (
        per_doc.groupBy("source")
        .agg(
            n_docs.alias("n_docs"),
            n_uniq.alias("n_unique"),
            F.floor(
                (F.lit(1.0) - n_uniq.cast("double") / n_docs.cast("double"))
                * 10000.0
                + F.lit(0.5)
            ).cast("double").alias("_dup_bp"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.floor(
                F.sum("q_bp").cast("double") / n_docs.cast("double") + F.lit(0.5)
            ).alias("_q_bp"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("_dup_bp") / 10000.0).alias("exact_dup_frac"),
            "total_tokens",
            (F.col("_q_bp").cast("double") / 10000.0).alias("mean_quality"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.7,
    apply_quality_rules: bool = True,
    nll_band: tuple[float, float] | None = None,
    max_shared_frac: float | None = None,
    with_report: bool = True,
) -> tuple[DataFrame, dict]:
    """The whole corpus-curation pipeline as ONE composition — the
    end-to-end path a training-data team runs nightly, built from the
    already-tested stages:

    1. exact dedup on the normalized-content fingerprint (min id kept);
    2. near-dup dedup: MinHash+LSH pairs → connected components →
       highest-quality representative per cluster (keep_canonical);
    3. Gopher-style boolean quality rules (optional — ``pass_all``),
       then an optional unigram-LM NLL band filter (``nll_band=(lo,
       hi)`` keeps docs whose mean NLL lies inside the band), then an
       optional residual-duplication cap (``max_shared_frac`` drops
       docs whose duplicated-n-gram fraction exceeds it — partial
       copies below the LSH threshold);
    4. PII redaction (emails / IPv4 / NANP phones → typed placeholders);
    5. annotation: detected language, leakage-safe train/val/test split,
       token count.

    Returns ``(curated_df, report)``: the curated frame has the redacted
    text plus (pred_lang, split, n_tokens), and the report dict carries
    per-stage survivor counts and total PII redactions — the audit trail.
    ``with_report=False`` skips every audit action (the per-stage counts
    and the PII sum) and returns an empty report — the mode for callers
    that only want the curated corpus (the nightly audit run keeps the
    default). Note the near-dup stage still runs its own jobs either
    way: connected components is an iterative fixpoint that materializes
    eagerly (operators/graph.py); only the AUDIT actions are optional.

    Caching contract: the multi-consumer stage frames (d1/d2/d3, scrub)
    persist via the scoped registry in BOTH report modes (with the audit
    on they are additionally freed eagerly after each stage count).
    Long-lived audit-off callers outside the battery/bench must wrap
    each call in ``api.shared_scope(spark)`` (or call
    ``api.release_shared`` after consuming the result) so the cached
    frames are freed — see operators/_scope.py (ADVICE r13).

    Scale shape: every stage is one of the audited plans (digest groupBy,
    LSH bucket join + star-CC, scan-speed rules, regexp scrub, narrow
    annotations); with the report on, stage counts are COUNT(*) actions
    on cached frames, so the chain is evaluated once per stage boundary,
    not re-derived."""
    from py_gtfs_duckdb_spark.operators.dedup import (
        keep_canonical,
        minhash_lsh_dedup,
    )
    from py_gtfs_duckdb_spark.operators.graph import connected_components
    from py_gtfs_duckdb_spark.operators.text import (
        fingerprint,
        language_col,
        pii_scrub,
        quality_rules,
        quality_score,
    )

    report: dict = {}
    if with_report:
        report["input_docs"] = docs.count()

    # 1 — exact dedup (digest groupBy: shuffles 16-byte hashes, not text)
    keep_exact = (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    # d1 feeds THREE consumers (the MinHash pass, quality_score, and the
    # near-dup anti-join) in BOTH report modes, so it persists
    # unconditionally — with_report=False used to re-derive the full-text
    # regex fingerprint + groupBy + semi-join chain once per consumer
    # (r13: the audit-off curate bench entries paid ~30% for skipping
    # the audit's caches). The with_report path still frees each stage
    # eagerly after its count; audit-off frames release via the scoped
    # registry when the owning query/scope ends.
    d1 = shared(docs.join(keep_exact, id_col, "left_semi"))
    if with_report:
        report["after_exact_dedup"] = d1.count()

    # 2 — near-dup canonicalization
    pairs = minhash_lsh_dedup(d1, text_col, id_col, k=3, threshold=near_dup_threshold)
    cc = connected_components(pairs, "id_a", "id_b")
    clusters = cc.select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )
    kept = keep_canonical(
        clusters, quality_score(d1, text_col, id_col), id_col=id_col
    )
    dropped = clusters.join(
        kept.select(F.col("kept_doc_id").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    # d2 is read by quality_rules AND the d3 chain (or, rules-off, IS d3
    # with its two consumers below) — persist in both report modes.
    d2 = shared(d1.join(dropped, id_col, "left_anti"))
    if with_report:
        report["after_near_dedup"] = d2.count()
        d1.unpersist()

    # 3 — rule-based quality filter
    if apply_quality_rules:
        passing = quality_rules(d2, text_col, id_col).filter("pass_all").select(id_col)
        # d3 feeds pii_scrub AND the d4 re-join — two consumers either way
        d3 = shared(d2.join(passing, id_col, "left_semi"))
    else:
        d3 = d2
    if with_report:
        report["after_quality_rules"] = d3.count()
        if d3 is not d2:
            d2.unpersist()  # d3 is materialized; d2's cache has served its use

    # 3b — optional statistical filter: keep docs whose unigram-LM mean
    # NLL falls inside the band (CCNet-style; low = boilerplate, high =
    # rare-token soup). The LM trains on the survivors so far — the same
    # frame being filtered — matching the usual self-scored setup; pass
    # an external model by pre-filtering instead if needed.
    if nll_band is not None:
        from py_gtfs_duckdb_spark.operators.lexical import unigram_nll

        lo, hi = nll_band
        in_band = (
            unigram_nll(d3, text_col=text_col, id_col=id_col)
            .where(F.col("nll").between(float(lo), float(hi)))
            .select(id_col)
        )
        pre_nll = d3  # still persisted (step 3's cache)
        d3 = shared(d3.join(in_band, id_col, "left_semi"))
        if with_report:
            report["after_nll_filter"] = d3.count()
            # mirror the d1/d2 handling: the pre-filter cache has served
            # its use once the post-filter frame is materialized
            pre_nll.unpersist()

    # 3c — optional residual-duplication filter: drop documents whose
    # duplicated-n-gram fraction (vs the survivors so far) exceeds the
    # cap — the memorization-risk cleanup for near-dup text the
    # doc-level tiers missed (partial copies below the LSH threshold).
    if max_shared_frac is not None:
        from py_gtfs_duckdb_spark.operators.text import ngram_novelty

        fresh = (
            ngram_novelty(d3, text_col=text_col, id_col=id_col)
            .where(F.col("shared_frac") <= float(max_shared_frac))
            .select(id_col)
        )
        pre_nov = d3
        d3 = shared(d3.join(fresh, id_col, "left_semi"))
        if with_report:
            report["after_novelty_filter"] = d3.count()
            if pre_nov is not d2:
                pre_nov.unpersist()

    # 4 — PII redaction (counts on original text, then text := redacted)
    scrub = pii_scrub(d3, text_col, id_col)
    if with_report:
        # the audit aggregate AND the d4 join both read scrub — persist so
        # the three PII regex passes run once, not twice
        scrub = shared(scrub)
        pii = scrub.agg(
            F.sum(F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")).alias("n")
        ).first()
        report["pii_redactions"] = int(pii["n"] or 0)
    d4 = d3.drop(text_col).join(
        scrub.select(F.col(id_col), F.col("redacted").alias(text_col)), id_col
    )

    # 5 — annotation
    out = d4.select(
        "*",
        language_col(F.col(text_col)).alias("pred_lang"),
        split_col(F.col(id_col)).alias("split"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    if with_report:
        report["output_docs"] = report.get(
            "after_novelty_filter",
            report.get("after_nll_filter", report["after_quality_rules"]),
        )
    return out, report


def export_shards(
    docs: DataFrame, n_shards: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard, pos): the deterministic global training order —
    shard = md5-hash of the id mod n_shards, pos = rank within the shard
    by (md5(id), id). Equivalent to a uniform global shuffle of the
    corpus, but reproducible across runs and engines FOR A GIVEN CORPUS
    SNAPSHOT: the same input set always yields the same (shard, pos) map.
    Stability contract across backfills: a row's SHARD never changes (it
    is a pure function of the id), but ``pos`` is a rank — a late-arriving
    row whose md5 sorts before existing rows shifts every subsequent
    position in its shard by one. Version the exported order per corpus
    snapshot (write_shards overwrites atomically); do NOT resume a
    training job across snapshots expecting identical positions. One hash
    exchange on the shard key; shard count bounds each sort partition at
    any corpus size."""
    h = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).alias("shard")
    out = docs.select(F.col(id_col), shard, h.alias("__h"))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return out.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> None:
    """Materialize the training order: join the (shard, pos) assignment
    back to the payload and write parquet partitioned by shard, each
    shard's file sorted by pos (sortWithinPartitions after a shard
    repartition — one shuffle, writer-local sort)."""
    assign = export_shards(docs, n_shards, id_col)
    (
        docs.join(assign, id_col)
        .repartition("shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, status): snapshot diff between two corpus versions —
    ``added`` (id only in new), ``removed`` (id only in old),
    ``modified`` (id in both, normalized-content fingerprint differs).
    Unchanged documents emit no row, so the result is change-sized, not
    corpus-sized. The audit a data team runs between lake versions
    before re-triggering downstream dedup/packing (pairs naturally with
    GtfsLake's per-table version history: read two versions, diff).

    Scale shape: each side reduces to (id, 16-byte fingerprint) at the
    scan — text never shuffles — then ONE full-outer hash join keyed on
    the id decides all three statuses in a single pass; the change
    filter runs join-side, so only changed rows survive to the output.
    No windows, no skew exposure beyond the id key itself."""
    from py_gtfs_duckdb_spark.operators.text import fingerprint

    of = old.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(text_col)).alias("__fp_old"),
    )
    nf = new.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(text_col)).alias("__fp_new"),
    )
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("modified"))
    )
    return (
        of.join(nf, "doc_id", "full_outer")
        .select("doc_id", status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def split_leakage(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(split_a, split_b, n_shared, n_a, n_b, jaccard): cross-SPLIT
    n-gram contamination — the train/test leakage audit run after
    ``split_col`` assignment, before any eval score is trusted. A split
    boundary drawn per-document still leaks when near-identical text
    lands on both sides (the reason eval decontamination exists); this
    surfaces exactly how much. Reuses the cross-source overlap machinery
    (operators/text.py:source_ngram_overlap) keyed on the computed split
    instead of the source column — same scale shape: only (split,
    8-byte hash) pairs shuffle, pair rows bounded by splits²."""
    from py_gtfs_duckdb_spark.operators.text import source_ngram_overlap

    with_split = docs.select(
        F.col(id_col),
        F.col(text_col),
        split_col(F.col(id_col)).alias("__split"),
    )
    out = source_ngram_overlap(
        with_split, n=n, text_col=text_col, id_col=id_col, source_col="__split"
    )
    return out.select(
        F.col("source_a").alias("split_a"),
        F.col("source_b").alias("split_b"),
        "n_shared",
        "n_a",
        "n_b",
        "jaccard",
    )


#: default sequence-length tiers: powers of two from a short-text floor
#: to a typical context budget. Docs longer than the top cap are
#: TRUNCATED to it (standard training behavior), and the audit reports
#: how many tokens truncation throws away.
LENGTH_CAPS = (32, 64, 128, 256, 512, 1024, 2048, 4096)


def length_buckets(
    df: DataFrame,
    caps: tuple[int, ...] = LENGTH_CAPS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(cap, n_docs, token_mass, pad_waste, waste_frac, n_truncated,
    trunc_tokens): padding-waste audit for length-bucketed batching —
    every doc lands in the smallest cap >= its token count (top cap
    truncates), and the bucket's pad_waste = cap * n_docs - token_mass is
    exactly the compute a naive fixed-length batcher burns on padding.
    The audit that justifies (or kills) a bucketed-batching stage: if
    waste_frac is small at a single cap, bucketing buys nothing.

    Scale shape: one narrow projection (token count + a chained CASE) and
    one tiny hash aggregation — map-side combine reduces every partition
    to <= len(caps) rows before the only shuffle. Empty buckets are
    absent (the histogram contract)."""
    from py_gtfs_duckdb_spark.functions import pround

    caps = tuple(sorted(caps))
    top = caps[-1]
    nt = token_count(F.col(text_col))
    cap = F.lit(top)
    for c in reversed(caps[:-1]):
        cap = F.when(nt <= c, F.lit(c)).otherwise(cap)
    kept = F.least(nt, F.lit(top))
    return (
        df.select(
            cap.cast("bigint").alias("cap"),
            kept.alias("kept"),
            F.when(nt > top, F.lit(1)).otherwise(F.lit(0)).alias("tr"),
            F.greatest(nt - top, F.lit(0)).alias("lost"),
        )
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("token_mass"),
            (F.first("cap") * F.count(F.lit(1)) - F.sum("kept"))
            .cast("bigint")
            .alias("pad_waste"),
            pround(
                (F.first("cap") * F.count(F.lit(1)) - F.sum("kept"))
                / (F.first("cap") * F.count(F.lit(1))),
                4,
            ).alias("waste_frac"),
            F.sum("tr").cast("bigint").alias("n_truncated"),
            F.sum("lost").cast("bigint").alias("trunc_tokens"),
        )
    )


def rescue_leaked_eval(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split, final_split, n_leaked): contamination-aware split
    repair — the step after :func:`split_leakage` says the boundary
    leaks. Every val/test document sharing at least one distinct word
    n-gram with the TRAIN slice is demoted to train (``final_split =
    'train'``), because an eval example the model may have seen verbatim
    measures memorization, not generalization; train documents pass
    through. Demotion (not deletion) keeps the tokens for training while
    restoring the eval set's integrity — the standard clean-test-set
    construction.

    Scale shape: the rolling-hash gram frame builds ONCE (persisted; the
    split label is a pure function of the id, so it attaches as a narrow
    expression — no join); the train-side distinct hash set probes via a
    hash-keyed semi-join (never broadcast — the train gram set scales
    with the corpus); one per-doc roll-up. Only (id/split, 8-byte hash)
    pairs shuffle."""
    from py_gtfs_duckdb_spark.operators.text import doc_ngram_hashes

    grams = shared(
        doc_ngram_hashes(docs, n, text_col, id_col)
        .select("id", "gh", split_col(F.col("id")).alias("split"))
    )
    train_gh = grams.filter(F.col("split") == "train").select("gh").distinct()
    leaked = (
        grams.filter(F.col("split") != "train")
        .join(train_gh, "gh", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked"))
    )
    split = split_col(F.col(id_col))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(leaked, "id", "left")
        .select(
            F.col("id").alias(id_col),
            split_col(F.col("id")).alias("split"),
            F.when(
                (split_col(F.col("id")) != "train")
                & (F.coalesce("n_leaked", F.lit(0)) > 0),
                F.lit("train"),
            )
            .otherwise(split_col(F.col("id")))
            .alias("final_split"),
            F.coalesce("n_leaked", F.lit(0).cast("bigint")).alias("n_leaked"),
        )
    )


def audit_scorecard(docs: DataFrame, ngram: int = 8) -> DataFrame:
    """The audit CLI's per-document card (the plan behind
    ``python -m py_gtfs_duckdb_spark audit``): regex token count,
    heuristic quality, duplicated-``ngram`` fraction, and BPE subword
    count in one row per document — the battery scorecard's sibling with
    the tokenizer-native count in place of NLL/DSIR.

    Same scale shape as q_doc_scorecard (plans/extensions.py): each
    audit branch is scan -> per-row array math -> combinable
    aggregation, stitched by doc_id joins; no window, no token-level
    shuffle, no self-join. Public (instead of inlined in __main__) so
    the serving-surface plan sweep covers the CLI's composition too."""
    from py_gtfs_duckdb_spark.operators.bpe import bpe_encode_stats
    from py_gtfs_duckdb_spark.operators.text import (
        ngram_novelty,
        quality_score,
        token_count,
    )

    base = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return (
        base.join(quality_score(docs), "doc_id")
        .join(
            ngram_novelty(docs, n=ngram).select("doc_id", "shared_frac"),
            "doc_id",
        )
        .join(
            bpe_encode_stats(docs).select("doc_id", "n_bpe_tokens"),
            "doc_id",
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    by: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 256.0,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a fixed-width histogram — the
    quantile that survives unbounded group cardinality. Spark's exact
    ``percentile`` (and the q_quantile_tokens battery entry) collects
    each group's values into one aggregation buffer: fine for bounded
    groups, a straggler-then-OOM at a 100 TB group. This operator's
    state is ``n_bins`` counts per group NO MATTER the group size, built
    by one map-side-combinable (group, bin) count; the estimate
    linearly interpolates within the winning bin, so its error is
    bounded by the bin width — the knob you buy accuracy with, priced
    in counts, not in memory.

    Definition (deterministic, shared bit-for-bit with the DuckDB
    oracle): values clamp into ``n_bins`` equal bins over [lo, hi);
    the value at integer rank r (1-indexed) is
    ``lo + w * (bin + (r - cum_before) / cnt)`` for the first bin whose
    cumulative count reaches r; quantile(p) interpolates ranks
    ``target = 1 + p*(N-1)`` as ``v(k) + frac*(v(k+1) - v(k))``
    (quantile_cont's rank convention). Nulls are excluded; returns one
    row per group with ``n`` and a ``p<int(100p)>`` column per prob.

    Scale shape: corpus pass -> (group, bin) combinable count
    (<= groups × n_bins rows shuffled) -> per-group sorted bin array
    (bounded collect_list) -> per-prob expression folds. No window over
    data rows, no per-group value buffers."""
    counts = histogram_counts(df, value_col, by, n_bins=n_bins, lo=lo, hi=hi)
    return histogram_quantiles_from_counts(
        counts, by, probs=probs, n_bins=n_bins, lo=lo, hi=hi
    )


def histogram_quantiles_from_counts(
    counts: DataFrame,
    by: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 256.0,
) -> DataFrame:
    """:func:`histogram_quantiles` starting from a PRE-AGGREGATED
    (by, bin, cnt) table — the persisted-artifact path (the streaming
    stats recorder's lake table; see histogram_drift_from_counts).
    Raw segment concatenation is accepted: duplicate (by, bin) rows
    collapse in one tiny re-aggregation."""
    w = (hi - lo) / n_bins
    binned = (
        counts.select(
            F.col(by),
            F.col("bin").cast("bigint").alias("__bin"),
            F.col("cnt").cast("bigint").alias("__cnt"),
        )
        .groupBy(by, "__bin")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    g = binned.groupBy(by).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin").alias("bin"),
                                    F.col("__cnt").alias("cnt")))
        ).alias("__h"),
        F.sum("__cnt").cast("bigint").alias("n"),
    )

    def rank_value(r_expr: str) -> str:
        # value at integer rank r: fold the (bin, cnt) array carrying the
        # running cumulative; emit on the first bin whose cum reaches r
        return (
            "aggregate(__h, named_struct('cum', CAST(0 AS BIGINT), "
            "'res', CAST(NULL AS DOUBLE)), "
            "(acc, x) -> named_struct('cum', acc.cum + x.cnt, "
            "'res', CASE WHEN acc.res IS NULL AND acc.cum + x.cnt >= "
            f"({r_expr}) THEN {lo!r}D + {w!r}D * (CAST(x.bin AS DOUBLE) + "
            f"CAST(({r_expr}) - acc.cum AS DOUBLE) / CAST(x.cnt AS DOUBLE)) "
            "ELSE acc.res END), acc -> acc.res)"
        )

    cols = [F.col(by), F.col("n")]
    for p in probs:
        tgt = f"(1.0D + {p!r}D * (CAST(n - 1 AS DOUBLE)))"
        k = f"CAST(FLOOR({tgt}) AS BIGINT)"
        frac = f"({tgt} - CAST({k} AS DOUBLE))"
        vk = rank_value(k)
        vk1 = rank_value(f"{k} + 1")
        cols.append(
            F.expr(
                f"CASE WHEN {frac} = 0.0D THEN {vk} "
                f"ELSE {vk} + {frac} * (({vk1}) - ({vk})) END"
            ).alias(f"p{int(round(p * 100))}")
        )
    return g.select(*cols)


def skew_report(
    df: DataFrame, keys: str | list[str], top_n: int = 10
) -> DataFrame:
    """(keys..., cnt, frac, rank): the ``top_n`` heaviest key groups —
    the pre-join diagnostic this repo's own skew playbook starts from
    (SCALING.md §6): before shuffling a 100 TB join on ``keys``, read
    the head of its key distribution; a top key holding >1% of rows is
    the salting/AQE-skew-join trigger.

    Windowless top-k: one map-side-combinable key count, then
    ``orderBy(cnt desc, keys).limit`` — TakeOrderedAndProject merges
    k-sized per-partition heaps, no global sort; the rank window runs
    over the already-limited top_n rows (the bm25 post-limit pattern).
    Ties break on the key columns, so the report is engine-exact."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    total = per.agg(F.sum("cnt").cast("bigint").alias("__total"))
    top = (
        per.crossJoin(F.broadcast(total))
        .orderBy(F.desc("cnt"), *[F.col(k) for k in keys])
        .limit(int(top_n))
    )
    from pyspark.sql import Window

    rank = (
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), *[F.col(k) for k in keys]))
        .cast("bigint")
    )
    return top.select(
        *keys,
        "cnt",
        pround(F.col("cnt").cast("double") / F.col("__total"), 6).alias(
            "frac"
        ),
        rank.alias("rank"),
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, kind, n_rows, n_nulls, n_distinct, min_int, max_int,
    min_num, max_num, min_str, max_str): one audit row per column — the
    DuckDB-``SUMMARIZE`` equivalent, restricted to DETERMINISTIC
    statistics so the oracle replays every cell bit-for-bit: counts and
    exact distincts (BIGINT), min/max for integers (exact), timestamps
    (epoch millis — engine-portable integers), dates (epoch days), floats
    (comparison only, no summation) and strings (lexicographic). A float MEAN is
    deliberately absent: a distributed double sum is
    partition-order-dependent, the one statistic class this repo's
    determinism contract excludes (quantize-to-integer first if you need
    it — the unigram_nll recipe).

    Scale shape: ONE corpus scan computes every statistic as a single
    wide aggregation (Spark plans multi-distinct via Expand — rows
    multiply by the number of DISTINCT columns profiled, the price of
    exactness; profile a column subset via ``cols`` or swap in
    kmv_sketch estimates when exact distincts stop paying at 100 TB).
    The per-column explode happens on the ONE aggregated row."""
    fields = [f for f in df.schema.fields if cols is None or f.name in cols]
    if not fields:
        raise ValueError("profile_table: no columns to profile")

    def kind_of(dt) -> str:
        s = dt.simpleString()
        if s in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if s in ("float", "double") or s.startswith("decimal"):
            return "float"
        if s == "string":
            return "string"
        if s.startswith("timestamp"):
            return "timestamp"
        if s == "date":
            return "date"
        return "other"

    aggs = [F.count(F.lit(1)).cast("bigint").alias("__nr")]
    entries = []
    for i, f in enumerate(fields):
        c = F.col(f.name)
        kind = kind_of(f.dataType)
        aggs.append(
            F.sum(c.isNull().cast("bigint")).cast("bigint").alias(f"__nn_{i}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__nd_{i}"))
        null_i = F.lit(None).cast("bigint")
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        mn_i = mx_i = null_i
        mn_d = mx_d = null_d
        mn_s = mx_s = null_s
        if kind == "int":
            aggs += [
                F.min(c).cast("bigint").alias(f"__mni_{i}"),
                F.max(c).cast("bigint").alias(f"__mxi_{i}"),
            ]
            mn_i, mx_i = F.col(f"__mni_{i}"), F.col(f"__mxi_{i}")
        elif kind == "timestamp":
            # NTZ columns (the t() loader's type) cast to TIMESTAMP in the
            # UTC session first — a wall-clock reinterpretation that makes
            # unix_millis agree with the oracle's naive epoch_ms
            aggs += [
                F.unix_millis(F.min(c).cast("timestamp"))
                .cast("bigint")
                .alias(f"__mni_{i}"),
                F.unix_millis(F.max(c).cast("timestamp"))
                .cast("bigint")
                .alias(f"__mxi_{i}"),
            ]
            mn_i, mx_i = F.col(f"__mni_{i}"), F.col(f"__mxi_{i}")
        elif kind == "date":
            # epoch DAYS — the date sibling of the timestamp epoch-millis
            # convention (engine-portable integers, no calendar strings)
            epoch = F.lit("1970-01-01").cast("date")
            aggs += [
                F.datediff(F.min(c), epoch).cast("bigint").alias(f"__mni_{i}"),
                F.datediff(F.max(c), epoch).cast("bigint").alias(f"__mxi_{i}"),
            ]
            mn_i, mx_i = F.col(f"__mni_{i}"), F.col(f"__mxi_{i}")
        elif kind == "float":
            aggs += [
                F.min(c).cast("double").alias(f"__mnd_{i}"),
                F.max(c).cast("double").alias(f"__mxd_{i}"),
            ]
            mn_d, mx_d = F.col(f"__mnd_{i}"), F.col(f"__mxd_{i}")
        elif kind == "string":
            aggs += [
                F.min(c).alias(f"__mns_{i}"),
                F.max(c).alias(f"__mxs_{i}"),
            ]
            mn_s, mx_s = F.col(f"__mns_{i}"), F.col(f"__mxs_{i}")
        entries.append(
            F.struct(
                F.lit(f.name).alias("col_name"),
                F.lit(kind).alias("kind"),
                F.col("__nr").alias("n_rows"),
                F.col(f"__nn_{i}").alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                mn_i.alias("min_int"),
                mx_i.alias("max_int"),
                mn_d.alias("min_num"),
                mx_d.alias("max_num"),
                mn_s.alias("min_str"),
                mx_s.alias("max_str"),
            )
        )
    row = df.agg(*aggs)
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def temperature_budgets(
    docs: DataFrame,
    alpha: float = 0.5,
    token_budget: int | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, src_tokens, weight, [budget_tokens]): temperature-scaled
    mixture weights — weight_i ∝ (token share_i)^alpha — the standard
    up-weighting of low-resource sources in a multilingual/multi-domain
    training mix (alpha=1 keeps natural proportions, alpha=0 flattens to
    uniform; published multilingual-LM recipes use 0.3–0.7). With
    ``token_budget`` set, each source also gets its integer token
    allocation — the dict form (:func:`temperature_weights`) feeds
    :func:`mix_sources` directly.

    Determinism: each source's scaled share is quantized to integer
    micro-units ONCE (``q_i = floor(share_i^alpha · 10^6 + 0.5)``), the
    normalizer is their BIGINT sum (order-independent), weights are the
    q_i/Q ratio (fixed-order display rounding) and budgets the EXACT
    integer ``token_budget·q_i div Q`` — so Spark and the DuckDB oracle
    agree bit-for-bit (libm pow caveat shared with unigram_nll's ln).

    Scale: one corpus pass → per-source combinable token sum (sources
    rows out), a one-row total broadcast back — nothing else touches the
    corpus; the output is sources-sized."""
    n_tokens = (
        F.col("n_tokens").cast("bigint")
        if "n_tokens" in docs.columns
        else token_count(F.col(text_col))
    )
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(n_tokens).cast("bigint").alias("src_tokens")
    )
    tot = per.agg(F.sum("src_tokens").cast("bigint").alias("total_tokens"))
    q = F.floor(
        F.pow(
            F.col("src_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            F.lit(float(alpha)),
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    scaled = per.crossJoin(F.broadcast(tot)).select(
        "source", "src_tokens", q.alias("__q")
    )
    qsum = scaled.agg(F.sum("__q").cast("bigint").alias("__qsum"))
    out = scaled.crossJoin(F.broadcast(qsum)).select(
        "source",
        "src_tokens",
        pround(F.col("__q").cast("double") / F.col("__qsum"), 6).alias(
            "weight"
        ),
        *(
            [
                F.expr(f"CAST({int(token_budget)} AS BIGINT) * __q div __qsum")
                .cast("bigint")
                .alias("budget_tokens")
            ]
            if token_budget is not None
            else []
        ),
    )
    return out


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> dict[str, float]:
    """The dict form of :func:`temperature_budgets` for
    :func:`mix_sources`: {source: weight}. One bounded collect of the
    sources-sized weight table (the centroid-collect class: explicit,
    tiny, documented)."""
    return {
        r["source"]: float(r["weight"])
        for r in temperature_budgets(
            docs, alpha, None, source_col, text_col
        ).collect()
    }


def histogram_drift(
    df: DataFrame,
    value_col: str,
    by: str,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 256.0,
    smooth: float = 0.5,
) -> DataFrame:
    """(group, n, ks, psi): each group's value distribution compared to
    the REST of the corpus over a fixed-bin histogram — the per-source
    drift monitor a curation pipeline runs before mixing ("did src7's
    length profile shift this crawl?"). Two standard statistics from one
    pass: the two-sample Kolmogorov–Smirnov distance (max ECDF gap,
    sensitive to location shifts) and the Population Stability Index
    (Σ (p_g − p_r)·ln(p_g/p_r) with add-``smooth`` smoothing, the
    industry drift score — <0.1 stable, >0.25 action).

    Exactness contract: both statistics are computed on the BINNED
    distribution, so they are exact for the histogram and bin-width-
    bounded estimates for the underlying values (the histogram_quantiles
    trade). Bins empty across the WHOLE corpus are excluded from the PSI
    sum (they carry no evidence, only smoothing noise); the fixed bin
    grid is what makes per-shard histograms mergeable, so a persisted
    per-day (group, bin) count table answers any day-range drift
    question without rescanning the corpus.

    Determinism: bin counts and their cumulative sums are BIGINT (the
    KS fold walks bins in sorted order); the ECDF deviation compares
    ``|cum_g·n_r − cum_r·n_g|`` computed in DOUBLE (overflow-safe past
    the 3·10^9-row point where the integer product would wrap — both
    engines evaluate the identical expression tree, so the bits agree);
    each PSI term is quantized to integer micro-nats and summed as
    BIGINT (order-independent; same LIBM caveat as unigram_nll).

    Scale shape: one corpus pass → (group, bin) combinable count; the
    global per-bin table is ≤ n_bins rows (broadcast); the comparison
    grid is groups × n_bins rows; per-group state in the final
    aggregation is the n_bins-sized sorted (bin, cg, cr) array. No
    window over data rows, no per-group value buffers, no driver state."""
    counts = histogram_counts(df, value_col, by, n_bins=n_bins, lo=lo, hi=hi)
    return histogram_drift_from_counts(
        counts, by, n_bins=n_bins, smooth=smooth
    )


def histogram_counts(
    df: DataFrame,
    value_col: str,
    by: str,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 256.0,
) -> DataFrame:
    """(by, bin, cnt): the fixed-grid histogram — the MERGEABLE
    monitoring artifact behind :func:`histogram_drift` and the streaming
    stats recorder: because the bin grid is fixed, per-shard/per-day
    count tables union and re-aggregate LOSSLESSLY (sum of counts ==
    counts of union — the KMV property for distributions), so a lake of
    per-batch histograms answers any time-range drift or quantile
    question from bin-count sums without rescanning the corpus. One
    map-side-combinable count; nulls excluded; out-of-range values clamp
    to the edge bins."""
    w = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull())
        .select(
            F.col(by),
            F.least(
                F.greatest(
                    F.floor((v - F.lit(lo)) / F.lit(w)).cast("bigint"),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).alias("bin"),
        )
        .groupBy(by, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_drift_from_counts(
    counts: DataFrame,
    by: str,
    n_bins: int = 32,
    smooth: float = 0.5,
) -> DataFrame:
    """:func:`histogram_drift` starting from a PRE-AGGREGATED (by, bin,
    cnt) table — the persisted-artifact path: feed it the folded union
    of per-batch :func:`histogram_counts` segments (the streaming
    recorder's lake table) and get the identical statistics without
    touching a single corpus row. Duplicate (by, bin) rows (unioned
    shards) collapse in one tiny re-aggregation first, so the input may
    be raw segment concatenation."""
    binned = (
        counts.select(
            F.col(by),
            F.col("bin").cast("bigint").alias("__bin"),
            F.col("cnt").cast("bigint").alias("__cg"),
        )
        .groupBy(by, "__bin")
        .agg(F.sum("__cg").cast("bigint").alias("__cg"))
    )
    binned = shared(binned)
    gtot = binned.groupBy(by).agg(F.sum("__cg").cast("bigint").alias("n_g"))
    btot = binned.groupBy("__bin").agg(
        F.sum("__cg").cast("bigint").alias("__cb")
    )
    ntot = binned.agg(F.sum("__cg").cast("bigint").alias("n_all"))
    grid = (
        gtot.crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(ntot))
        .join(binned, [by, "__bin"], "left")
        .select(
            F.col(by),
            F.col("__bin"),
            F.col("n_g"),
            (F.col("n_all") - F.col("n_g")).alias("n_r"),
            F.coalesce("__cg", F.lit(0).cast("bigint")).alias("cg"),
            (F.col("__cb") - F.coalesce("__cg", F.lit(0).cast("bigint"))).alias(
                "cr"
            ),
        )
    )
    s = float(smooth)
    denom_pad = s * n_bins
    p_g = (F.col("cg").cast("double") + F.lit(s)) / (
        F.col("n_g").cast("double") + F.lit(denom_pad)
    )
    p_r = (F.col("cr").cast("double") + F.lit(s)) / (
        F.col("n_r").cast("double") + F.lit(denom_pad)
    )
    q_term = F.floor((p_g - p_r) * F.log(p_g / p_r) * F.lit(1e6) + F.lit(0.5)).cast(
        "bigint"
    )
    agg = grid.groupBy(by, "n_g", "n_r").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__bin").alias("bin"),
                    F.col("cg").alias("cg"),
                    F.col("cr").alias("cr"),
                )
            )
        ).alias("__h"),
        F.sum(q_term).cast("bigint").alias("__psi_q"),
    )
    # bounded fold over the n_bins-sized array: exact integer cumulatives,
    # double deviation (identical expression tree to the DuckDB oracle)
    ks_md = (
        "aggregate(__h, named_struct("
        "'cg', CAST(0 AS BIGINT), 'cr', CAST(0 AS BIGINT), "
        "'md', CAST(0.0 AS DOUBLE)), "
        "(acc, x) -> named_struct("
        "'cg', acc.cg + x.cg, 'cr', acc.cr + x.cr, "
        "'md', GREATEST(acc.md, ABS("
        "CAST(acc.cg + x.cg AS DOUBLE) * CAST(n_r AS DOUBLE) "
        "- CAST(acc.cr + x.cr AS DOUBLE) * CAST(n_g AS DOUBLE)))), "
        "acc -> acc.md)"
    )
    ks = F.when(
        F.col("n_r") > 0,
        pround(
            F.expr(ks_md)
            / (F.col("n_g").cast("double") * F.col("n_r").cast("double")),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(by),
        F.col("n_g").alias("n"),
        ks.alias("ks"),
        pround(F.col("__psi_q") / F.lit(1e6), 4).alias("psi"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
    n_salts: int = 64,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (per group, or
    global with ``by=None``): keep ``k`` rows where each row's inclusion
    probability is proportional to its weight — the Efraimidis–Spirakis
    exponential race, with the "randomness" derived from a 48-bit md5 of
    the row id so two runs (and two engines) draw the SAME sample. The
    training-data use: sample documents proportional to token count or
    quality for a budgeted pilot corpus, reproducibly.

    Key: ``u = (md5_48(id) + 1) / 2^48`` ∈ (0, 1], rank by ``ln(u)/w``
    DESCENDING (≡ u^(1/w) descending — the E-S order statistic); ties
    break on the id. Rows with null/zero/negative/NaN weight are
    excluded (weight 0 = never sampled). LIBM CAVEAT (same as
    unigram_nll): bit-identical choice across engines assumes both
    ``ln`` implementations agree on these arguments — true on this
    platform; a cross-libm deployment could in principle flip a
    selection whose two keys sit within 1 ulp.

    Scale shape: the same salted two-phase bounded top-k as
    dedup.keep_top_k — NO rank window (a hot group would sort in one
    task). Phase 1 keeps k candidates per (group, salt) inside a
    sorted-array slice; phase 2 merges ≤ n_salts×k survivors. Per-task
    memory ∝ k; shuffle rows ∝ groups × salts, never corpus rows."""
    w = F.col(weight_col).cast("double")
    u48 = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        + 1
    )
    # key <= 0, LARGER wins; negate so ascending struct order ranks it
    key = F.log(u48.cast("double") / F.lit(float(1 << 48))) / w
    cand = df.filter(w.isNotNull() & (w > 0) & ~F.isnan(w)).select(
        *([F.col(by)] if by else []),
        F.struct(
            (-key).alias("nk"),
            F.col(id_col).alias("i"),
            w.alias("wt"),
        ).alias("__m"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts)).alias(
            "__salt"
        ),
    )
    part = cand.groupBy(*([by, "__salt"] if by else ["__salt"])).agg(
        F.slice(F.array_sort(F.collect_list("__m")), 1, k).alias("__c")
    )
    top = part.groupBy(*([by] if by else [])).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__c"))), 1, k).alias(
            "__t"
        )
    )
    return top.select(
        *([F.col(by)] if by else []), F.posexplode("__t")
    ).select(
        *([F.col(by)] if by else []),
        F.col("col.i").alias(id_col),
        (F.col("pos") + 1).cast("bigint").alias("rank"),
        F.col("col.wt").alias("weight"),
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    by: str,
    k: int = 64,
    n_salts: int = 16,
    prehashed: bool = False,
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the k smallest
    DISTINCT 48-bit md5 hashes of ``value_col``, as one bounded
    ``array<bigint>`` row per group — the DETERMINISTIC portable
    cousin of HLL (q_agg_approx_distinct): two engines, two runs, or two
    shards always build the SAME sketch, so estimates are reproducible
    and oracle-checkable bit-for-bit, and sketches MERGE losslessly
    (:func:`kmv_merge`: union-distinct-reslice) — persist per-shard/
    per-day sketches in the lake and answer any rollup's distinct
    estimate from k-sized arrays instead of re-scanning the corpus.

    Scale shape: one (group, hash) DISTINCT aggregation (map-side
    partial dedup — the shuffle carries distinct hashes per partition,
    the same cost exact count-distinct pays once), then the salted
    bounded k-smallest merge (state per (group, salt) buffer is the
    distinct-hash count in that salt slice before the slice truncates —
    ``n_salts`` is the memory knob, same contract as keep_top_k).
    Estimator: :func:`kmv_estimate` (pass the matching ``universe``).

    ``prehashed=True`` treats ``value_col`` as an ALREADY-uniform bigint
    hash (e.g. the staged Horner n-gram hashes of text.ngram_hash_col —
    far cheaper than md5-ing reassembled gram strings) and skips the
    md5; pair it with ``kmv_estimate(..., universe=<that hash's
    modulus>)``."""
    h = (
        F.col(value_col).cast("bigint")
        if prehashed
        else F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10
        ).cast("bigint")
    )
    dist = df.select(F.col(by), h.alias("__h")).distinct()
    part = (
        dist.withColumn("__salt", F.pmod(F.col("__h"), F.lit(n_salts)))
        .groupBy(by, "__salt")
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__c"))
    )
    return part.groupBy(by).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__c"))), 1, k
        ).alias("sketch")
    )


def kmv_merge(sketches: Column, k: int = 64) -> Column:
    """Merge an array of KMV sketches (e.g. ``collect_list(sketch)``
    across shards/days): union, dedup, keep the k smallest — the merged
    sketch is IDENTICAL to the sketch of the unioned data, which is the
    property that makes per-shard sketches a lossless lake artifact."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(sketches))), 1, k
    )


def kmv_estimate(
    sketch: Column, k: int = 64, universe: float = float(1 << 48)
) -> Column:
    """Distinct-count estimate from a KMV sketch: EXACT (= array size)
    while fewer than k distinct values were seen; otherwise the standard
    (k-1)/U_(k) order-statistic estimator with U_(k) = kth smallest
    hash / ``universe`` (2^48 for the built-in md5 hash; pass the hash's
    own modulus for ``prehashed`` sketches). Deterministic double
    arithmetic — the DuckDB oracle replays it bit-for-bit."""
    kth = F.element_at(sketch, k).cast("double")
    return F.when(F.size(sketch) < k, F.size(sketch).cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(universe)) / kth
    )


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    m: int = 700,
) -> DataFrame:
    """EXACT frequent-items above the 1/m frequency share, found with the
    two-pass candidates-then-recount pattern — the scalable alternative
    to a full ``groupBy(item).count()`` when the item universe is huge
    (n-grams, URLs, shingles) but the answer set is small.

    Pass 1 (map-side only, no shuffle of the stream): each PARTITION
    counts its own items in an Arrow-batched pandas pass and emits the
    ones exceeding the local 1/m share plus its local stream length.
    Pigeonhole guarantee — if an item's global count satisfies
    ``freq * m > N``, then on at least one partition its local count
    satisfies ``cnt_p * m > n_p`` (otherwise summing the per-partition
    inequalities bounds ``freq * m <= N``) — so the union of local
    candidates is a SUPERSET of every true heavy hitter, whatever the
    partitioning. Pass 2 recounts ONLY candidate items exactly (a
    broadcast semi-filter prunes the stream before the shuffle, so the
    exchange carries candidate occurrences, never the full universe) and
    applies the global threshold with the cross-multiplied INTEGER
    predicate ``freq * m > N`` — no float division anywhere, so the
    DuckDB oracle replays the result set exactly.

    The tiny pass-1 output frame (candidates + per-partition lengths) is
    ``shared()``-persisted — the item stream itself is NOT: at corpus
    scale re-deriving a narrow explode twice is far cheaper than
    caching it.

    Returns one row per heavy hitter: ``item_col``, ``freq`` (BIGINT).
    """
    stream = items.select(F.col(item_col).alias("__item"))

    def _local_candidates(batches):
        import pandas as pd

        counts: dict = {}
        n_p = 0
        for pdf in batches:
            vc = pdf["__item"].value_counts()
            n_p += int(vc.sum())
            for k, v in vc.items():
                counts[k] = counts.get(k, 0) + int(v)
        cand = [k for k, v in counts.items() if v * m > n_p]
        yield pd.DataFrame(
            {
                "__item": pd.Series(cand + [None], dtype="object"),
                "__np": pd.Series([None] * len(cand) + [n_p], dtype="Int64"),
            }
        )

    local = shared(
        stream.mapInPandas(_local_candidates, schema="__item string, __np long")
    )
    cand = local.filter(F.col("__item").isNotNull()).select("__item").distinct()
    tot = local.agg(F.sum("__np").alias("__n"))
    return (
        stream.join(F.broadcast(cand), "__item")
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("freq") * m > F.col("__n"))
        .select(F.col("__item").alias(item_col), F.col("freq"))
    )


def chunk_documents(
    df: DataFrame,
    max_words: int = 512,
    overlap_words: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into overlapping word-window chunks —
    (doc_id, chunk_idx, chunk_text, n_chunk_words) — the preprocessing
    step that fits documents into a training context window without
    losing cross-boundary phrases (each consecutive pair of chunks
    shares ``overlap_words`` words).

    Chunk starts are ``1, 1+step, ...`` with ``step = max_words -
    overlap_words``, up to ``greatest(n - overlap_words, 1)`` — a rule
    with two provable properties: the chunks cover every word, and
    every chunk contributes at least one word no earlier chunk had (no
    fully-redundant trailing chunk). A document shorter than one window
    yields itself as chunk 0; an empty document yields one empty chunk
    (every doc_id survives — chunking must never silently drop rows).

    Scale shape: pure per-row array math over a STAGED words column
    (the one-hop staging every gram operator uses — see
    text.ngram_hash_col's CollapseProject note) followed by ONE
    posexplode; no shuffle at all. Output rows ≈ corpus_words / step."""
    if overlap_words < 0 or max_words <= overlap_words:
        raise ValueError(
            f"need 0 <= overlap_words < max_words, got "
            f"overlap={overlap_words} max={max_words}"
        )
    step = max_words - overlap_words
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    staged = df.select(F.col(id_col).alias(id_col), words.alias("__ws"))
    ws = F.col("__ws")
    n = F.size(ws)
    chunks = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(n - F.lit(overlap_words), F.lit(1)),
            F.lit(step),
        ),
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(ws, s, max_words)).alias("t"),
            F.least(F.lit(max_words), n - s + 1).alias("nw"),
        ),
    )
    return staged.select(id_col, F.posexplode(chunks)).select(
        id_col,
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.col("col.t").alias("chunk_text"),
        F.greatest(F.col("col.nw"), F.lit(0)).cast("bigint").alias(
            "n_chunk_words"
        ),
    )
