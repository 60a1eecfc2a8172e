"""Lexical (term-based) relevance search: Okapi BM25 top-k.

The lexical complement to the embedding ANN stack (operators/similarity):
a corpus-analysis team asks "which documents are most about X" without an
embedding model in the loop. Robertson/Spärck Jones probabilistic
relevance framework; the standard tuning k1=1.2, b=0.75.

Scale shape (the inverted-index plan, relationally):

- the token stream is filtered to the QUERY terms at the scan (an
  ``isin`` over a literal list — predicate pushdown territory), so the
  heavy explode→aggregate path touches only matching tokens, a vanishing
  fraction of a 100 TB corpus;
- per-document term frequencies pivot to ONE row per matching document
  via conditional aggregation (map-side combined integer sums — no
  holistic aggregate, no skew exposure: the hottest term spreads over
  all partitions);
- corpus statistics (N, avgdl, per-term document frequencies) are
  one-row aggregates cross-joined back as broadcasts — never collected
  to the driver;
- the score is a FIXED-ORDER arithmetic expression over the pivoted
  columns (one term per query word, summed in query order), so the
  float result is bit-reproducible across engines and partitionings —
  no order-dependent double summation;
- top-k is a single ROW_NUMBER window over the (tiny) scored set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.functions import pround
from py_gtfs_duckdb_spark.operators._scope import shared

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score, rank): top-k documents by Okapi BM25 for a bag of
    query ``terms``. Scores are ``pround``-ed to 4 digits BEFORE ranking
    (ties broken by doc_id) so the ordering is engine-portable.

    idf uses the standard non-negative variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.
    """
    terms = list(dict.fromkeys(terms))  # dedup, keep query order
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")

    # doc stats over the WHOLE corpus: dl narrow, avgdl/N one-row agg
    docs = df.select(
        F.col(id_col), F.size(words).cast("bigint").alias("dl")
    )
    corpus = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # token stream restricted to query terms before any shuffle
    toks = df.select(
        F.col(id_col), F.explode(words).alias("w")
    ).filter(F.col("w").isin(terms))
    tf = toks.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("w") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    dfreq = tf.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ]
    )

    scored = (
        tf.join(docs, id_col)
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(dfreq))
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf_i = F.col(f"tf_{i}").cast("double")
        denom = tf_i + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf_i * F.lit(k1 + 1.0) / denom
    # TakeOrderedAndProject: every partition computes its local top-k,
    # the driver merges k-sized heaps — no single-partition global window
    # over the full scored set. The rank window then runs over k rows.
    top = (
        scored.select(F.col(id_col), pround(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(int(k))
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.col(id_col)))
        .cast("bigint"),
    )


# ln quantization scale for the unigram LM: micro-nats. Integer sums of
# quantized per-word log-counts are order-independent (BIGINT addition is
# associative), so per-doc scores are bit-identical across engines and
# partitionings — the one float aggregation a naive NLL would need is
# replaced by integer aggregation plus a fixed-order scalar epilogue.
_NLL_SCALE = 1_000_000.0


def _words(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def unigram_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(w, c): corpus unigram counts — the "language model" of the
    CCNet-style statistical quality filter. One explode + one hash
    aggregation with map-side combine: the hottest token partially
    aggregates on every executor, so shuffle volume is O(distinct words
    per partition), not O(tokens)."""
    return (
        df.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def unigram_nll(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dl, nll): mean negative log-probability of each document
    under a unigram LM — the statistical complement to the boolean
    quality rules (CCNet scores web text under a clean-corpus LM; high
    nll = gibberish/rare-token soup, unusually low nll = repetitive
    boilerplate). ``model`` is a (w, c) frame from ``unigram_model``
    (defaults to training on ``df`` itself); out-of-vocabulary tokens
    score as count 1 (ln 1 = 0 — add-one-style floor).

    Determinism: each word's ln(count) is quantized to integer
    micro-nats, the per-doc total is a BIGINT sum (order-independent),
    and the only float math is a fixed-order scalar epilogue
    ``(dl·ln(total) − Σ tf·q) / dl`` rounded to 4 digits — so Spark and
    the DuckDB oracle agree bit-for-bit. LIBM CAVEAT: that bit-exactness
    assumes both engines' ``ln`` return the same double for the same
    integer argument — true on this platform (both bind glibc libm) and
    for every count observed in the fixtures, but IEEE 754 does not
    require correctly-rounded ``ln``, so a cross-libm deployment could in
    principle flip a quantization boundary. If that ever bites, derive q
    from integer-only math (fixed-point log via bit_length + a small
    table — the winnow-hash approach). Scale: the token stream aggregates
    DIRECTLY — no per-(doc, word) intermediate exists at all. The model
    is ``tokens.groupBy(w).count()`` (map-side combined; shuffle volume
    O(distinct words per partition)) and the per-doc sums come from one
    token→qw join followed by ``groupBy(doc)`` (map-side combined;
    shuffle O(docs per partition)), so the big (doc, word)-keyed shuffle
    the round-7 shape paid — and then persisted a corpus-cardinality
    frame to avoid repaying — is gone on both counts. Only the
    VOCAB-SIZED trained model persists (two consumers: total + qw; its
    cache is negligible at any corpus scale). Measured at sf0.1,
    min/median of 6 warm runs: this shape 0.49/0.54 s vs 0.96/1.55 s for
    the round-7 corpus-persist — the same re-scan-beats-caching finding
    the scorecard's fused-variant measurements documented. The qw join
    broadcasts while the vocabulary fits (AQE falls back to sort-merge
    beyond — at extreme vocab sizes pre-aggregating tokens per (doc, w)
    before the join would shrink the join input again; deliberately not
    done, the battery's vocabularies broadcast); no windows, no
    driver-side state."""
    toks = df.select(F.col(id_col), F.explode(_words(text_col)).alias("w"))
    if model is None:
        # the trained LM is vocab-sized (distinct words), so its cache is
        # negligible at any corpus scale; with a caller-supplied model
        # nothing persists at all
        model = shared(
            toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    total = model.agg(F.sum("c").cast("bigint").alias("total"))
    qw = model.select(
        "w",
        F.floor(F.log("c") * F.lit(_NLL_SCALE) + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    sums = (
        toks.join(qw, "w", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("q"), F.lit(0))).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("dl"),
        )
    )
    q_total = F.floor(F.log("total") * F.lit(_NLL_SCALE) + F.lit(0.5)).cast(
        "bigint"
    )
    return sums.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("dl"),
        pround(
            (F.col("dl") * q_total - F.col("s"))
            / F.lit(_NLL_SCALE)
            / F.col("dl"),
            4,
        ).alias("nll"),
    )


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dl2, nll): mean negative log-probability of each
    document's word BIGRAMS under the corpus bigram LM — the next model
    order up from :func:`unigram_nll` (perplexity-style filtering uses
    exactly this score: a doc whose word transitions are improbable
    under the corpus is gibberish even when its unigram mix looks fine;
    a doc with unusually probable transitions is boilerplate).
    NLL per bigram occurrence = ln c(w1 .) - ln c(w1 w2), with c(w1 .)
    the CONTEXT count (bigrams starting with w1), so the per-position
    conditionals P(w2|w1) normalize exactly. Documents with fewer than
    two words have no bigram and emit no row.

    Determinism: the same integer micro-nat scheme as unigram_nll —
    both logs quantize to BIGINT micro-nats, the model frame carries
    dq = q_ctx - q_bigram per bigram TYPE, and the per-doc aggregation
    is a BIGINT sum; the only float math is the fixed-order epilogue
    (pround to 4 digits), so the DuckDB oracle replays bit-for-bit
    (same libm caveat as unigram_nll).

    Scale: the bigram stream is a narrow per-row array transform (NO
    token shuffle to form pairs — adjacency is resolved inside the
    staged words array, the ngram_hash_col pattern); the model is two
    map-side-combined groupBys (bigram types, context types) joined
    once into a single (b, dq) frame, vocab-sized, broadcast while it
    fits (AQE falls back beyond); per-doc sums are one groupBy(doc).
    No windows, no driver state."""
    arr_col = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    staged = df.select(F.col(id_col), arr_col.alias("ws"))
    n = F.size(F.col("ws"))
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(F.col("ws"), i).alias("w1"),
            F.concat_ws(
                " ",
                F.element_at(F.col("ws"), i),
                F.element_at(F.col("ws"), i + 1),
            ).alias("b"),
        ),
    )
    toks = (
        staged.where(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.b").alias("b"))
    )
    # c2 (the trained bigram LM) is referenced twice — the context
    # marginal below and the model join — but is deliberately NOT
    # persisted: both references sit in ONE action, so ReuseExchange
    # already shares the aggregation's exchange, and an explicit persist
    # only adds a materialization barrier (measured interleaved r13:
    # persist 1.91s vs 1.64s median at sf0.1 — the unigram_nll
    # re-scan-beats-caching finding, one level up).
    c2 = toks.groupBy("b", "w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    q = lambda col: F.floor(F.log(col) * F.lit(_NLL_SCALE) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    model = c2.join(c1, "w1").select(
        "b", (q(F.col("c1")) - q(F.col("c2"))).alias("dq")
    )
    return (
        toks.join(model, "b")
        .groupBy(id_col)
        .agg(
            F.sum("dq").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("dl2"),
        )
        .select(
            F.col(id_col),
            F.col("dl2"),
            pround(
                F.col("s") / F.lit(_NLL_SCALE) / F.col("dl2"), 4
            ).alias("nll"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tf, score, rank): each document's top-k terms by
    tf–idf — the classic keyword-extraction / document-signature
    operator (what "this doc is about X" reduces to without a model).
    ``idf = ln((N+1)/(df+1)) + 1`` (smoothed, non-negative; N counts ALL
    corpus documents), ``score = tf · idf``.

    Determinism (the unigram_nll recipe): idf is quantized to integer
    micro-nats ONCE PER TERM (plus an exact 10^6 for the "+1"), the
    per-(doc, term) score is the BIGINT product ``tf · q_idf`` — ranking
    compares integers, so ties and order are engine-exact — and the only
    float math is the final ``score_q / 10^6`` display epilogue, rounded
    to 4 digits. Rank ties break on the term string.

    Scale shape: one explode → (doc, term) combinable count (map-side
    combine collapses repeats before the shuffle); document frequencies
    derive from that table by a second combinable count (vocab-sized);
    the vocab-sized q_idf table broadcasts back. Top-k per document is a
    bounded sorted-array slice inside ONE aggregation — per-group state
    is the document's distinct-term set (doc-length-bounded by the same
    contract as the collect_list battery entries), never a rank window
    over the corpus. No driver state; nothing corpus-sized persists."""
    toks = df.select(F.col(id_col), F.explode(_words(text_col)).alias("w"))
    tf = toks.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("dfw"))
    q_idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "w",
        (
            F.floor(
                F.log(
                    (F.col("n_docs") + F.lit(1)).cast("double")
                    / (F.col("dfw") + F.lit(1)).cast("double")
                )
                * F.lit(_NLL_SCALE)
                + F.lit(0.5)
            ).cast("bigint")
            + F.lit(1_000_000)
        ).alias("q"),
    )
    scored = tf.join(F.broadcast(q_idf), "w").select(
        F.col(id_col),
        F.struct(
            (-(F.col("tf") * F.col("q"))).alias("ns"),
            F.col("w").alias("term"),
            F.col("tf").alias("tf"),
        ).alias("__m"),
    )
    top = scored.groupBy(id_col).agg(
        F.slice(F.array_sort(F.collect_list("__m")), 1, int(k)).alias("__t")
    )
    return top.select(F.col(id_col), F.posexplode("__t")).select(
        F.col(id_col),
        F.col("col.term").alias("term"),
        F.col("col.tf").alias("tf"),
        pround((-F.col("col.ns")) / F.lit(_NLL_SCALE), 4).alias("score"),
        (F.col("pos") + 1).cast("bigint").alias("rank"),
    )


def vocab_spectrum(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(band, n_types, token_mass): the corpus frequency spectrum —
    word types bucketed by power-of-two frequency band (band =
    bit_length(count) − 1, exact integer math), with how many distinct
    types land in the band and how much token mass they carry. The Zipf
    audit behind tokenizer vocabulary sizing: the high bands show how
    much mass a small vocab already covers, the band-0 row counts
    hapax legomena.

    Scale: two hash aggregations, both map-side combined (token → type
    counts, then type → band roll-up); shuffle volume is O(distinct
    words per partition) then O(bands). No windows, no global rank —
    the coverage question "mass of types with count ≥ 2^k" reads off
    the band partial sums without ever ordering the vocabulary."""
    counts = unigram_model(df, text_col, id_col)
    band = (F.length(F.bin(F.col("c"))) - F.lit(1)).cast("bigint")
    return (
        counts.select(band.alias("band"), F.col("c"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("c").cast("bigint").alias("token_mass"),
        )
    )


# DSIR hashed-feature defaults: word-bigram features hashed into K
# buckets. K is deliberately small for the fixture so every bucket is
# populated (the published method uses 10^4-10^6 buckets at corpus
# scale — the plan shape is identical, only the broadcast table grows).
DSIR_BUCKETS = 64


def _bigram_buckets(text_col: str, n_buckets: int):
    """array<bigint> of hashed word-bigram feature buckets, md5-derived
    so the DuckDB oracle reproduces every bucket id bit-for-bit. Guard
    n<2: sequence(1, 0) is DESCENDING in Spark (the split_units
    pitfall), which would index element 0/out-of-bounds."""
    words = _words(text_col)
    buckets = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", F.element_at(words, i), F.element_at(words, i + 1)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(n_buckets),
    )
    return F.when(F.size(words) >= 2, buckets).otherwise(
        F.array().cast("array<bigint>")
    )


def dsir_weights(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, dsir): per-document importance weight for
    Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) —
    the standard recipe for skewing a raw crawl toward a target domain
    without training a classifier. Each document scores the mean
    log-likelihood ratio of its hashed word-bigram features under two
    bag-of-features models: one fit on the TARGET slice (rows matching
    ``target_pred``, a boolean Column) and one on the rest. Positive =
    target-like, sample it preferentially.

    Determinism (the unigram_nll recipe): both models' smoothed log
    probabilities ``ln((c_b + 1) / (C + K))`` are quantized to integer
    micro-nats, the per-doc feature sum is a BIGINT aggregation
    (order-independent, engine-exact), and the only float math is the
    fixed-order epilogue ``(s / 10^6) / n_feats`` rounded to 4 digits.
    Documents with fewer than two words survive with (0, 0.0).

    Scale shape: the explode of the bigram stream (the dominant cost)
    runs ONCE — it collapses immediately into the persisted per-(doc,
    bucket) count table, from which both the 2K-row model counts and the
    per-doc sums derive. The model table broadcasts back; no windows, no
    driver state; the feature table stays K rows however large the
    corpus."""
    is_target = F.when(target_pred, F.lit(1)).otherwise(F.lit(0))
    feats = df.select(
        F.col(id_col),
        is_target.alias("is_t"),
        F.explode(_bigram_buckets(text_col, n_buckets)).alias("bucket"),
    )
    # is_t is functionally dependent on the doc id, so grouping by it too
    # costs nothing and lets the model counts derive from `per` instead
    # of re-exploding the corpus.
    per = shared(
        feats.groupBy(id_col, "is_t", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    counts = per.groupBy("bucket").agg(
        F.sum(F.col("tf") * F.col("is_t")).cast("bigint").alias("ct"),
        F.sum(F.col("tf") * (F.lit(1) - F.col("is_t"))).cast("bigint").alias("cr"),
    )
    # distinct names (t_total vs ct): Spark resolves case-insensitively,
    # so a "Ct" total column would collide with the per-bucket "ct"
    totals = counts.agg(
        F.sum("ct").cast("bigint").alias("t_total"),
        F.sum("cr").cast("bigint").alias("r_total"),
    )
    k = F.lit(n_buckets)
    model = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.floor(
                F.log((F.col("ct") + 1) / (F.col("t_total") + k))
                * F.lit(_NLL_SCALE)
                + F.lit(0.5)
            ).cast("bigint")
            - F.floor(
                F.log((F.col("cr") + 1) / (F.col("r_total") + k))
                * F.lit(_NLL_SCALE)
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("q"),
    )
    sums = (
        per.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("q")).cast("bigint").alias("s"),
            F.sum("tf").cast("bigint").alias("n_feats"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(sums, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0).cast("bigint")).alias("n_feats"),
            F.when(
                F.coalesce("n_feats", F.lit(0)) > 0,
                pround(F.col("s") / F.lit(_NLL_SCALE) / F.col("n_feats"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("dsir"),
        )
    )


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bigram, c12, pmi): the k strongest word collocations by pointwise
    mutual information — PMI(w1,w2) = ln(c12·N / (c1·c2)) with c1/c2 the
    bigram-position marginals — above a count floor (PMI is unstable on
    rare pairs; the floor is the standard fix). The collocation-mining
    face of the bigram LM: :func:`bigram_nll` scores documents under the
    transition model, this ranks the transitions themselves.

    Determinism: all four log terms quantize to BIGINT micro-nats per
    TYPE (the unigram_nll scheme), pmi_q stays integer, and the top-k
    orders by (pmi_q DESC, bigram) — exact ties, so the DuckDB oracle
    replays the LIMIT subset bit-for-bit.

    Scale: the bigram stream is the same narrow per-row array transform
    as bigram_nll (adjacency resolved inside the staged words array, no
    token shuffle); marginals are map-side-combined groupBys over the
    bigram TYPE table (vocab-sized, not corpus-sized); the global top-k
    is TakeOrderedAndProject over that type table — no window, no full
    sort."""
    arr_col = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    staged = df.select(F.col(id_col), arr_col.alias("ws"))
    n_words = F.size(F.col("ws"))
    pairs = F.transform(
        F.sequence(F.lit(1), n_words - 1),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("ws"), i),
            F.element_at(F.col("ws"), i + 1),
        ),
    )
    toks = staged.filter(n_words >= 2).select(F.explode(pairs).alias("b"))
    # c2 (the bigram TYPE table) has four references — both marginals,
    # the total, and the scored join — but is deliberately NOT persisted:
    # all four sit in ONE action, ReuseExchange shares the aggregation's
    # exchange across them, and an explicit persist only adds a
    # materialization barrier (measured interleaved r13: persist 1.46s
    # vs 1.14s median at sf0.1).
    c2 = (
        toks.groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .select(
            "b",
            F.split_part(F.col("b"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("b"), F.lit(" "), F.lit(2)).alias("w2"),
            "c12",
        )
    )
    lc = c2.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    rc = c2.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("c2n"))
    tot = c2.agg(F.sum("c12").cast("bigint").alias("n"))

    def q(col):
        return F.floor(
            F.log(col.cast("double")) * 1000000.0 + F.lit(0.5)
        ).cast("bigint")

    scored = (
        c2.join(lc, "w1")
        .join(rc, "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c12") >= min_count)
        .select(
            F.col("b").alias("bigram"),
            "c12",
            (
                q(F.col("c12")) + q(F.col("n"))
                - q(F.col("c1")) - q(F.col("c2n"))
            ).alias("__pmi_q"),
        )
    )
    return (
        scored.orderBy(F.col("__pmi_q").desc(), "bigram")
        .limit(k)
        .select(
            "bigram",
            "c12",
            (
                F.floor(F.col("__pmi_q") / 1000000.0 * 10000.0 + F.lit(0.5))
                / 10000.0
            ).alias("pmi"),
        )
    )
