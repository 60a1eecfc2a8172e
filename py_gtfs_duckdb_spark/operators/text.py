"""Text-analysis operators over document tables.

All pure built-in column expressions (JVM-side, whole-stage codegen, no
UDFs), so they run at full scan speed over a 100 TB corpus and are
oracle-comparable bit-for-bit. Narrow transforms — zero shuffles. One
deliberate exception: :func:`compression_stats` needs DEFLATE, which
has no Spark built-in or DuckDB twin, so it runs as an Arrow-batched
mapInPandas over stdlib zlib (still narrow, still zero shuffle) and is
tested by hand-computed cases instead of an oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.functions import fan_out, pround
from py_gtfs_duckdb_spark.operators._scope import shared

TOKEN_RE = r"\w+|[^\w\s]"  # BPE-ish: words plus standalone punctuation
WORD_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"

# Tiny per-language stopword seeds for the n-gram/stopword language ID.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "que"],
}


def token_count(col) -> Column:
    """Whitespace+punctuation token count (regex tokenizer)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)).cast("bigint")


def word_count(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(WORD_RE), 0)).cast("bigint")


def punct_count(col) -> Column:
    # count-of-class via translate: length(c) - length(c minus the class
    # characters) — a codegen'd char-map pass; the regexp_replace form
    # this replaces ran the regex engine over every char and
    # materialized the filtered copy just to take its length (r14,
    # guide §1.2 per-task work; identical count for any input)
    return (
        F.length(col) - F.length(F.translate(col, ".,;:!?", ""))
    ).cast("bigint")


def stopword_hits(col, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 0)).cast("bigint")


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (reference has no analogue; standard near-exact dedup key)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


# Winnowing (MOSS-style) parameters: polynomial rolling hash over word
# hashes, then the minimum of each sliding window of W hashes. Constants
# shared with the SQL oracle.
WINNOW_P = 2_147_483_647  # 2^31-1
WINNOW_B = 69_069  # classic LCG multiplier; B*P < 2^63 so products fit bigint
WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # winnow window (guarantee: any match >= K+W-1 words shares a print)


# Non-string key for the memo's cold generation: document words are
# strings, so a tuple key can never collide with a cached word.
_CACHE_OLD_GEN = ("__winnow_old_gen__",)


def _winnow_hash_words(texts, cache: dict):
    """Per-document np.int64 arrays of md5-derived word hashes mod
    WINNOW_P — the Python twin of :func:`word_hash_col` (first 12 md5 hex
    digits as an integer, i.e. the first 6 digest bytes, mod P: value-
    identical by construction). ``cache`` memoizes word→hash across the
    whole task (Zipfian vocab: most lookups hit). Memory bound: a
    two-generation swap — on overflow the live entries become the cold
    generation (hits promote back into the hot dict) instead of a full
    clear, which would discard the Zipf-head words along with the tail
    (ADVICE r13). Eviction never changes a value, only recompute cost."""
    import hashlib

    import numpy as np

    md5 = hashlib.md5
    out = []
    for text in texts:
        words = [w for w in (text or "").split(" ") if w]
        hs = np.empty(len(words), dtype=np.int64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                old = cache.get(_CACHE_OLD_GEN)
                h = old.get(w) if old is not None else None
                if h is None:
                    h = (
                        int.from_bytes(
                            md5(w.encode("utf-8")).digest()[:6], "big"
                        )
                        % WINNOW_P
                    )
                if len(cache) > 1_000_000:  # ~same total bound as the old
                    old = dict(cache)       # 2M single-generation clear
                    old.pop(_CACHE_OLD_GEN, None)
                    cache.clear()
                    cache[_CACHE_OLD_GEN] = old
                cache[w] = h
            hs[i] = h
        out.append(hs)
    return out


def _winnow_horner(h, n: int):
    """Vectorized Horner rolling n-gram hash over one word-hash array —
    the numpy twin of :func:`ngram_hash_col` (value-identical: h < P and
    B·P < 2^63, so every intermediate fits int64)."""
    m = len(h) - (n - 1)
    if m <= 0:
        return h[:0]
    kh = h[:m].copy()
    for j in range(1, n):
        kh *= WINNOW_B
        kh %= WINNOW_P
        kh += h[j : j + m]
        kh %= WINNOW_P
    return kh


def gram_hash_rows(
    df: DataFrame, key_col: str, text_col: str, n: int
) -> DataFrame:
    """(k, gh): one row per word-n-gram POSITION (non-distinct), gh = the
    winnow rolling hash — the fused Arrow front-end of the n-gram audits.

    One mapInPandas pass replaces the staged
    ``word_hash_col → ngram_hash_col → explode`` column form: those
    higher-order functions are interpreted (CodegenFallback) and box a
    JVM object per word per reference, and the resulting allocation storm
    made the gram-heavy audits GC-bimodal under bench load (r13:
    q_source_overlap samples spread 1.6–8.0 s run-to-run; the Arrow pass
    pins them at the floor). Inside the batch loop everything is numpy
    except one cached md5 per DISTINCT word per task (guide §4.2/4.5:
    vectorized native work + per-task memoized state). Values are
    bit-identical to the column form (same md5-derived word hash, same
    Horner chain mod P), which tests/test_text_gram_parity.py asserts."""
    src = fan_out(df).select(
        F.col(key_col).alias("k"), F.col(text_col).alias("__t")
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", src.schema["k"].dataType),
            T.StructField("gh", T.LongType()),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            keys, ghs = [], []
            for kv, hs in zip(pdf["k"], _winnow_hash_words(pdf["__t"], cache)):
                kh = _winnow_horner(hs, n)
                if len(kh) == 0:
                    continue
                keys.extend([kv] * len(kh))
                ghs.append(kh)
            yield pd.DataFrame(
                {
                    "k": pd.Series(keys, dtype=pdf["k"].dtype),
                    "gh": np.concatenate(ghs)
                    if ghs
                    else np.empty(0, np.int64),
                }
            )

    return src.mapInPandas(run, schema=schema)


def word_hash_col(words: Column) -> Column:
    """array<bigint> of per-word hashes mod WINNOW_P (md5-derived so the
    DuckDB oracle reproduces every value bit-for-bit) — the shared
    front-end of every rolling-hash n-gram operator."""
    return F.transform(
        words,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint"),
            F.lit(WINNOW_P),
        ),
    )


def ngram_hash_col(h_arr: Column, n: int) -> Column:
    """array<bigint> of Horner rolling n-gram hashes
    (``((h_i*B + h_{i+1}) mod P)*B + ...``) over a word-hash array —
    empty when the doc is shorter than one n-gram. Pure per-row array
    math: NO shuffle, NO sort, where the window formulation
    (posexplode → lead() → rolling hash) pays a full token shuffle hash-
    partitioned by doc id before a single gram exists.

    ``h_arr`` MUST be a STAGED named column (built by a prior
    ``select(word_hash_col(words).alias(...))``), never an inline
    expression: the lambda references the array ~n times per element,
    and CollapseProject would inline a non-attribute producer into every
    reference, re-evaluating the md5 transform per gram (the measured
    100-1000x blow-up that first pushed these operators onto windows).
    Catalyst keeps the two projections separate exactly because the
    staged alias is non-cheap and multiply-referenced, so the word-hash
    array materializes once per row."""

    def gram(i: Column) -> Column:
        kh = F.element_at(h_arr, i)
        for j in range(1, n):
            kh = F.pmod(
                kh * F.lit(WINNOW_B) + F.element_at(h_arr, i + j),
                F.lit(WINNOW_P),
            )
        return kh

    return F.when(
        F.size(h_arr) >= n,
        F.transform(F.sequence(F.lit(1), F.size(h_arr) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp) — the document's winnowing fingerprint set: rolling
    polynomial hash over each k-word window, then per sliding window of W
    k-gram hashes keep only the minimum. Standard local fingerprinting
    (Schleimer/Wilkerson/Aiken winnowing): any shared run of at least
    K+W-1 words between two documents shares at least one fingerprint, at
    ~1/W the volume of full k-gram shingling.

    Entirely narrow per-row array math (split → staged word hashes →
    staged rolling k-gram hashes via :func:`ngram_hash_col` → sliding
    array_min → per-row array_distinct → explode) — ZERO shuffle. A doc
    is one row, so deduping the fingerprint array per row IS the
    distinct-(id, fp) set; the global ``.distinct()`` this replaces
    shuffled every exploded pair to dedup what was already locally
    distinct (r13 interleaved A/B at sf0.1: 0.95 s → 0.70 s min, the
    whole q_doc_winnow drift since r9). Requires ``id_col`` to be unique
    per row — the documents-table contract every caller has. The
    posexplode + lead()/window-frame formulation both replace paid a
    full token shuffle + sort before a single fingerprint existed. Word
    hash is md5-derived so the DuckDB oracle reproduces it bit-for-bit.

    r13: the whole chain (word hashes → Horner k-grams → sliding-window
    minima → per-doc distinct) runs as ONE fused Arrow pass — the staged
    column form used interpreted higher-order functions whose per-element
    boxing made the stage GC-bound (measured interleaved at sf0.1:
    0.62–1.13 s → 0.38–0.46 s, identical rows). Inside the batch loop it
    is numpy end-to-end (sliding_window_view min + np.unique) plus one
    cached md5 per distinct word per task; values are bit-identical to
    the column form (tests/test_text_gram_parity.py,
    tests/test_winnow_reference.py).
    """
    src = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [src.schema["id"], T.StructField("fp", T.LongType())]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        cache: dict = {}
        sw = np.lib.stride_tricks.sliding_window_view
        for pdf in batches:
            ids, fps = [], []
            for did, hs in zip(pdf["id"], _winnow_hash_words(pdf["__t"], cache)):
                kh = _winnow_horner(hs, WINNOW_K)
                n_kg = len(kh)
                if n_kg == 0:
                    # zero k-grams -> no rows (same policy as the column form)
                    continue
                if n_kg <= WINNOW_W:
                    # 1..W k-grams: the single (possibly truncated) window
                    u = np.unique(kh.min(keepdims=True))
                else:
                    u = np.unique(sw(kh, WINNOW_W).min(axis=1))
                ids.extend([did] * len(u))
                fps.append(u)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "fp": np.concatenate(fps)
                    if fps
                    else np.empty(0, np.int64),
                }
            )

    return src.mapInPandas(run, schema=schema)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, words, tokens, punctuation, avg word
    length, punctuation ratio."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("bigint")
    n_words = word_count(c)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        token_count(c).alias("n_tokens"),
        punct_count(c).alias("n_punct"),
        pround(
            F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0), 4
        ).alias("chars_per_word"),
        pround(
            F.when(n_chars > 0, punct_count(c).cast("double") / n_chars).otherwise(
                0.0
            ),
            4,
        ).alias("punct_ratio"),
    )


def compression_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, z_bytes, bits_per_byte): per-document zlib
    compression ratio — the RefinedWeb/FineWeb-family quality signal the
    boolean rules and LM scores miss from a different angle: extremely
    LOW bits/byte flags templated/repeated boilerplate (compresses away)
    and near-8.0 flags binary junk or high-entropy gibberish, while
    normal prose sits ~2-4. Deterministic for a fixed zlib level (6) and
    strategy, so thresholds are portable across runs; there is no SQL
    oracle (DuckDB exposes no DEFLATE), so this ships as an operator
    with hand-computed tests rather than a battery query.

    Scale: one mapInPandas pass, payload-bounded Arrow batches, zero
    shuffle — the same embarrassingly-parallel shape as the codec tier.
    Empty documents emit n_bytes=0 with NULL bits_per_byte (no 0/0)."""
    schema = (
        f"{id_col} long, n_bytes long, z_bytes long, bits_per_byte double"
    )

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                raw = (txt or "").encode("utf-8")
                z = len(zlib.compress(raw, 6))
                rows.append(
                    (
                        int(did),
                        len(raw),
                        z,
                        round(8.0 * z / len(raw), 4) if raw else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "z_bytes", "bits_per_byte"],
            )

    # fan_out: per-doc zlib deflate is the CPU cost here; a single-split
    # scan would run it on one core (guide §2/§4). No-op at real scale.
    return fan_out(df).select(id_col, text_col).mapInPandas(run, schema=schema)


def quality_col(c: Column) -> Column:
    """The heuristic quality score in [0,1] as a single column expression
    (length band + stopword presence − punctuation excess), so consumers
    that need it per-row inside a wider plan (e.g. the per-source corpus
    report) reuse the ONE formula instead of joining ``quality_score``."""
    n_chars = F.length(c).cast("double")
    n_words = word_count(c).cast("double")
    sw = stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
    len_score = F.least(n_chars / 200.0, F.lit(1.0))
    sw_score = F.least(
        F.when(n_words > 0, sw / n_words).otherwise(0.0) * 5.0, F.lit(1.0)
    )
    punct_pen = F.least(
        F.when(n_chars > 0, punct_count(c).cast("double") / n_chars).otherwise(0.0)
        * 5.0,
        F.lit(1.0),
    )
    return F.greatest(
        F.least(
            pround(0.5 * len_score + 0.5 * sw_score - 0.25 * punct_pen, 4),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence −
    punctuation excess. The standard cheap pre-filter before expensive
    pipeline stages."""
    return df.select(F.col(id_col), quality_col(F.col(text_col)).alias("quality"))


def _lang_pred(en: Column, de: Column, fr: Column, es: Column) -> Column:
    """The vote resolution, from already-built hit expressions — shared
    so language_id reuses ITS hit columns instead of authoring the four
    regex scans a second time."""
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def language_col(c: Column) -> Column:
    """The stopword-vote language prediction as a single column expression
    (see ``language_id``), reusable inside wider per-row plans (e.g. the
    per-source corpus report) without a join."""
    hits = {lang: stopword_hits(c, ws) for lang, ws in LANG_STOPWORDS.items()}
    return _lang_pred(hits["en"], hits["de"], hits["fr"], hits["es"])


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es}, 'und' (undetermined)
    when no list scores. Deterministic tie-break by fixed language order."""
    c = F.col(text_col)
    hits = {lang: stopword_hits(c, ws) for lang, ws in LANG_STOPWORDS.items()}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    pred = _lang_pred(en, de, fr, es)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        en.alias("hits_en"),
        de.alias("hits_de"),
        fr.alias("hits_fr"),
        es.alias("hits_es"),
    )


# ---------------------------------------------------------------------------
# Repetition, rule-based quality filtering, PII scrubbing (Gopher-style
# corpus curation; the reference has no analogue — extension mandate)
# ---------------------------------------------------------------------------

REP_NGRAMS = (2, 3, 5)  # word n-gram orders scored by repetition_stats


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition-filter
    family, adapted to word n-grams): duplicate-word fraction, the
    fraction of n-gram occurrences claimed by the single most frequent
    n-gram (n=2,3), and the fraction of 5-gram occurrences that belong to
    a 5-gram seen more than once.

    Shape at scale: the whole-array metrics (word count, duplicate-word
    fraction) are narrow per-row expressions; the n-gram strings build as
    per-row array transforms over a STAGED words column (no token
    shuffle, no window — the posexplode + lead() formulation this
    replaced sorted every token by doc id before a single gram existed),
    then ONE explode feeds a (id, n, gram) count and two further
    aggregations on the same id-prefixed key, so partial aggregation
    absorbs the fan-out and nothing is quadratic. Documents shorter than
    n words contribute no grams; their fractions coalesce to 0.0.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, " "), lambda w: w != "")
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(words).cast("bigint").alias("n_words"),
        pround(
            F.when(
                F.size(words) > 0,
                (F.size(words) - F.size(F.array_distinct(words))).cast("double")
                / F.size(words),
            ).otherwise(0.0),
            4,
        ).alias("dup_word_frac"),
    )

    staged = df.select(F.col(id_col).alias("id"), words.alias("ws"))

    def gram_arr(n: int):
        # all n-grams of the doc as one per-row array; `ws` is a staged
        # attribute, so the n element_at references per gram read the
        # materialized array instead of re-splitting the text (see
        # ngram_hash_col's CollapseProject note)
        ws = F.col("ws")
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ws, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    stacked = staged.select(
        "id",
        F.stack(
            F.lit(len(REP_NGRAMS)),
            *[x for n in REP_NGRAMS for x in (F.lit(n), gram_arr(n))],
        ).alias("n", "garr"),
    ).select("id", "n", F.explode("garr").alias("gram"))
    counts = stacked.groupBy("id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_n = counts.groupBy("id", "n").agg(
        F.max("c").alias("top"),
        F.sum("c").alias("total"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias("dup"),
    )

    def _frac(n: int, num: str) -> Column:
        v = F.max(
            F.when(
                F.col("n") == n,
                F.col(num).cast("double") / F.col("total").cast("double"),
            )
        )
        return pround(F.coalesce(v, F.lit(0.0)), 4)

    gm = per_n.groupBy("id").agg(
        _frac(2, "top").alias("top_2gram_frac"),
        _frac(3, "top").alias("top_3gram_frac"),
        _frac(5, "dup").alias("dup_5gram_frac"),
    )
    out = base.join(gm, "id", "left").select(
        F.col("id").alias(id_col),
        "n_words",
        "dup_word_frac",
        F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
        F.coalesce("top_3gram_frac", F.lit(0.0)).alias("top_3gram_frac"),
        F.coalesce("dup_5gram_frac", F.lit(0.0)).alias("dup_5gram_frac"),
    )
    return out


# Rule thresholds (Gopher-flavoured, tuned to be non-degenerate on the
# word-soup test corpus). Shared with the SQL oracle.
RULE_MIN_WORDS = 30
RULE_MAX_WORDS = 100_000
RULE_MIN_MEAN_WORD_LEN = 2.0
RULE_MAX_MEAN_WORD_LEN = 12.0
RULE_MAX_SYMBOL_RATIO = 0.1
RULE_MAX_DUP_WORD_FRAC = 0.75
RULE_MIN_DISTINCT_STOPWORDS = 2


def quality_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style boolean quality rules, one flag per rule plus the
    conjunction. Pure built-in column expressions — zero shuffle, zero
    UDF, runs at scan speed over any corpus size. Rules:

    - ``r_word_count``    word count within [min, max]
    - ``r_mean_word_len`` mean alphanumeric word length within band
    - ``r_symbol_ratio``  '#'/'…' symbols per word below cap
    - ``r_dup_words``     duplicate-word fraction below cap
    - ``r_stopwords``     at least K distinct English stopwords present
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, " "), lambda w: w != "")
    n_words = word_count(c)
    # count-of-class via translate (see punct_count): identical counts,
    # char-map pass instead of a regex scan + filtered-copy per rule
    # (r14 interleaved A/B at sf0.1: 0.79x for the whole projection,
    # tools/ab_quality_exprs.py, 0 value mismatches on the full corpus)
    alnum = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    )
    alpha_chars = (
        F.length(c) - F.length(F.translate(c, alnum, ""))
    ).cast("double")
    mean_wl = F.when(n_words > 0, alpha_chars / n_words).otherwise(F.lit(0.0))
    symbols = (F.length(c) - F.length(F.translate(c, "#…", ""))).cast(
        "double"
    )
    symbol_ratio = F.when(n_words > 0, symbols / n_words).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.size(words) > 0,
        (F.size(words) - F.size(F.array_distinct(words))).cast("double")
        / F.size(words),
    ).otherwise(F.lit(0.0))
    # distinct stopwords PRESENT, in ONE regex pass: the per-stopword
    # rlike form ran |stopwords| separate full-text regex scans per row
    # (r13, guide §1.2 per-task work); one alternation extract + per-row
    # array_distinct counts the same membership set — \b anchors make the
    # leftmost-first alternation match exactly whole stopwords, so
    # "distinct matches" == "stopwords whose \b-anchored pattern occurs",
    # the oracle's sum-of-presence-flags semantics (_sw_distinct_sql).
    sw_pat = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
    # coalesce: NULL text must count 0 stopwords (r_stopwords false, like
    # the per-stopword rlike-sum form this replaced), not null-propagate
    # into a tri-state pass_all (ADVICE r13)
    sw_distinct = F.coalesce(
        F.size(
            F.array_distinct(
                F.regexp_extract_all(F.lower(c), F.lit(sw_pat), 0)
            )
        ),
        F.lit(0),
    ).cast("bigint")

    r_word_count = (n_words >= RULE_MIN_WORDS) & (n_words <= RULE_MAX_WORDS)
    r_mean_word_len = (mean_wl >= RULE_MIN_MEAN_WORD_LEN) & (
        mean_wl <= RULE_MAX_MEAN_WORD_LEN
    )
    r_symbol_ratio = symbol_ratio <= RULE_MAX_SYMBOL_RATIO
    r_dup_words = dup_frac <= RULE_MAX_DUP_WORD_FRAC
    r_stopwords = sw_distinct >= RULE_MIN_DISTINCT_STOPWORDS
    return df.select(
        F.col(id_col),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_dup_words.alias("r_dup_words"),
        r_stopwords.alias("r_stopwords"),
        (
            r_word_count & r_mean_word_len & r_symbol_ratio & r_dup_words & r_stopwords
        ).alias("pass_all"),
    )


# PII patterns restricted to the regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# quantifiers, \b, alternation of fixed shapes — no backreferences, no
# lookaround. Phone deliberately matches only the two rigid NANP layouts
# (parity-safe); a production scrubber would widen this list.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and redact emails / IPv4 addresses / NANP phone numbers.
    Counts are taken on the ORIGINAL text; redaction applies the three
    patterns sequentially (email → ip → phone) with typed placeholders,
    the same order the oracle uses. Pure regexp column expressions —
    scan-speed, shuffle-free, trivially parallel at 100 TB."""
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_IPV4_RE), 0))
        .cast("bigint")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
        redacted.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# sub-document (line / span) deduplication — CCNet-style boilerplate removal
# ---------------------------------------------------------------------------


def split_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit_words: int | None = None,
) -> DataFrame:
    """(id, idx, unit): segment each document into dedup units.

    ``unit_words=None`` splits on newlines (the CCNet/RefinedWeb line
    segmenter for real web text); an integer chunks the word stream into
    consecutive ``unit_words``-word spans (the fallback for text with no
    line structure). Narrow per-row array math + one posexplode — no
    shuffle; the consumer aggregates.
    """
    c = F.col(text_col)
    if unit_words is None:
        units = F.filter(
            F.transform(F.split(c, "\n"), lambda s: F.trim(s)),
            lambda s: s != "",
        )
    else:
        words = F.filter(F.split(c, " "), lambda w: w != "")
        n = F.size(words)
        w = int(unit_words)
        # guard n=0: sequence(0, -1) is DESCENDING in Spark ([0, -1]),
        # which would fabricate two empty units for an empty document
        units = F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), F.ceil(n / F.lit(w)).cast("int") - 1),
                lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(units).alias("idx", "unit")
    )


def common_units(units: DataFrame, min_df: int) -> DataFrame:
    """(unit,) — units appearing in >= min_df DISTINCT documents: the
    boilerplate blocklist. Two-level aggregation (dedup (unit, id) map-
    side, then count per unit) — shuffles only distinct pairs; the result
    is small by nature (boilerplate is frequent but low-cardinality), so
    the caller can broadcast it."""
    return (
        units.select("unit", "id")
        .distinct()
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= int(min_df))
        .select("unit")
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit_words: int | None = None,
    min_df: int = 3,
) -> DataFrame:
    """(doc_id, clean_text, n_units, n_dropped): remove sub-document
    spans shared across >= min_df documents — line-level dedup in the
    CCNet / RefinedWeb sense (strip boilerplate headers, footers, nav
    chrome that exact/near doc-level dedup cannot see, because every
    document differs in its payload).

    Two passes, both scale-shaped: (1) build the blocklist of common
    units — an aggregation over (unit, doc) pairs with map-side combine;
    (2) re-segment and anti-join against the BROADCAST blocklist (at any
    corpus size the blocklist stays small: it is the set of spans common
    to many documents), then reassemble per-document text with one
    groupBy ordered by unit index. No self-join, no all-pairs anywhere.
    Every document survives (empty clean_text when fully boilerplate) —
    dropping is the caller's policy decision.
    """
    units = split_units(df, text_col, id_col, unit_words)
    block = common_units(units, min_df)
    kept = units.join(F.broadcast(block), "unit", "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "unit"))),
                lambda s: s["unit"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    # totals anchor on df, not the exploded units frame: a document whose
    # text is empty/whitespace yields ZERO units and would otherwise
    # vanish from the output, breaking the every-document-survives
    # contract (advisor finding, round 5)
    totals = (
        df.select(F.col(id_col).alias("id"))
        .join(
            units.groupBy("id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_units")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("n_units", F.lit(0).cast("bigint")).alias("n_units"))
    )
    return (
        totals.join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_units",
            (F.col("n_units") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


def source_ngram_overlap(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared, n_a, n_b, jaccard): cross-source
    n-gram contamination matrix — for every pair of sources, how many
    distinct word n-grams they share and the Jaccard of their n-gram
    sets. The audit a mixture designer runs before trusting per-source
    token budgets: a high-overlap pair means two "domains" are partly
    the same text and their budgets double-count.

    Only source pairs with at least one shared n-gram appear
    (source_a < source_b).

    Scale shape: n-grams are the winnow rolling hash (md5 word hash +
    Horner chain) built as pure per-row array math (:func:`ngram_hash_col`
    over a staged word-hash column — no token shuffle, no window), so
    the ONLY corpus-sized shuffle is (source, 8-byte hash) pairs, never
    gram strings. There is NO self-join: one gh-keyed aggregation
    collapses each gram to its sorted source set (bounded by the source
    count), pairs expand LOCALLY from that array (C(s,2) rows per gram),
    and totals derive from the same persisted per-gram frame — the gram
    set crosses the wire once, however large the corpus. Totals are a
    sources-sized table, broadcast back twice.
    """
    grams = gram_hash_rows(df, source_col, text_col, n).withColumnRenamed(
        "k", "source"
    )
    # one gh-keyed aggregation replaces both the distinct AND the pair
    # self-join: each gram collapses to its sorted source set (bounded by
    # the source count), and the persisted per-gram frame feeds totals
    # and the local pair expansion — the gram set shuffles exactly once.
    by_gram = shared(
        grams.groupBy("gh")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    totals = (
        by_gram.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"))
    )
    # C(s,2) ordered pairs per gram, expanded array-locally (no join):
    # for each element x at position i, pair it with every later element.
    pair_structs = F.flatten(
        F.transform(
            F.col("srcs"),
            lambda x, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    pairs = (
        by_gram.select(F.explode(pair_structs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    from py_gtfs_duckdb_spark.functions import pround

    return (
        pairs.join(
            F.broadcast(totals.select(F.col("source").alias("source_a"),
                                      F.col("n_grams").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("source_b"),
                                      F.col("n_grams").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            pround(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
    )


def doc_ngram_hashes(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, gh): DISTINCT winnow rolling-hash word n-grams per document —
    the shared front-end of the n-gram audits (novelty, split leakage).
    Same hash chain as :func:`source_ngram_overlap` (md5 word hash +
    Horner mod 2^31-1), so 8-byte hashes shuffle, never gram strings.

    Array-form (:func:`ngram_hash_col` over a staged word-hash column):
    the rolling hashes are pure per-row math, so the FIRST shuffle in
    the plan is the (id, gh) distinct — the posexplode + lead() window
    formulation this replaces paid an extra full token shuffle + sort
    just to build the grams, value-identical output."""
    return (
        gram_hash_rows(df, id_col, text_col, n)
        .withColumnRenamed("k", "id")
        .distinct()
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, n_shared, shared_frac): per-document duplicated
    n-gram fraction — the memorization-risk audit of Lee et al.
    ("Deduplicating Training Data Makes Language Models Better"): a
    document most of whose n-grams recur elsewhere in the corpus is
    near-duplicate text the doc-level dedup tier missed, and a direct
    driver of verbatim memorization. ``n_grams`` counts the document's
    DISTINCT n-grams, ``n_shared`` those with corpus document-frequency
    >= 2; docs too short for one n-gram survive as (id, 0, 0, 0.0).

    Scale shape: the rolling hashes are per-row array math — no window,
    no token shuffle (the gram frame persists, so its three consumers
    below share it) — then corpus document-frequency comes from a
    map-side-combinable
    ``groupBy("gh").count()`` — NOT a gh-keyed window: a window forces
    every row of one gram hash into a single sorted partition, and a
    boilerplate gram present in a large fraction of documents (the exact
    thing this audit exists to find) becomes one straggler partition at
    scale, whereas the groupBy reduces a hot key to ~num_partitions
    partial rows. Duplicated grams (df >= 2) then mark documents via a
    gh-keyed LEFT SEMI join — skew there is AQE-splittable, which a
    window never is. Only (id, 8-byte hash) pairs shuffle; no self-join,
    no gram strings in any shuffle."""
    grams = shared(doc_ngram_hashes(df, n, text_col, id_col))
    dup_gh = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") >= 2)
        .select("gh")
    )
    n_tot = grams.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    n_sh = (
        grams.join(dup_gh, "gh", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    per = n_tot.join(n_sh, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                pround(
                    F.coalesce("n_shared", F.lit(0).cast("bigint"))
                    / F.col("n_grams"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("shared_frac"),
        )
    )
