"""Text-analysis operators over document tables.

All pure built-in column expressions (JVM-side, whole-stage codegen, no
UDFs), so they run at full scan speed over a 100 TB corpus and are
oracle-comparable bit-for-bit. Narrow transforms — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.functions import pround

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
    return F.length(
        F.regexp_replace(col, f"[^{PUNCT_RE[1:-1]}]", "")
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


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp) — the document's winnowing fingerprint set: rolling
    polynomial hash over each k-word window, then per sliding window of W
    k-gram hashes keep only the minimum. Standard local fingerprinting
    (Schleimer/Wilkerson/Aiken winnowing): any shared run of at least
    K+W-1 words between two documents shares at least one fingerprint, at
    ~1/W the volume of full k-gram shingling.

    Entirely narrow per-row array math (split → word hashes → rolling
    hash via transform/sequence → windowed array_min → array_distinct →
    explode) — no shuffle until the consumer aggregates. Word hash is
    md5-derived so the DuckDB oracle reproduces it bit-for-bit.

    Formulated RELATIONALLY (posexplode → lead() rolling hash → window-
    frame min), not as per-row array lambdas: higher-order functions are
    interpreted (CodegenFallback, no subexpression elimination), so any
    formulation that references the word-hash array more than once pays a
    full re-evaluation per reference — measured at 100-1000x slower. The
    window form is all codegen-able JVM operators and costs exactly one
    shuffle (tokens hash-partitioned by doc id), linear at corpus scale.
    """
    from pyspark.sql.window import Window

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    wh = F.transform(
        words,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint"),
            F.lit(WINNOW_P),
        ),
    )
    tok = df.select(
        F.col(id_col).alias("id"), F.posexplode(wh).alias("pos", "h")
    )
    w_ord = Window.partitionBy("id").orderBy("pos")
    # Horner rolling hash over the next K-1 tokens; null past the tail,
    # which drops the last K-1 positions (no k-gram starts there).
    kh = F.col("h")
    for j in range(1, WINNOW_K):
        kh = F.pmod(
            kh * F.lit(WINNOW_B) + F.lead("h", j).over(w_ord), F.lit(WINNOW_P)
        )
    kg = tok.select("id", "pos", kh.alias("kh")).filter(F.col("kh").isNotNull())
    # Winnow: min over the window of W consecutive k-grams (ROWS frame —
    # k-gram rows are contiguous per doc). Only full windows (plus the
    # single truncated one when a doc has < W k-grams) produce prints.
    w_frame = Window.partitionBy("id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    n_kg = F.count(F.lit(1)).over(Window.partitionBy("id"))
    win = kg.select(
        "id",
        "pos",
        F.min("kh").over(w_frame).alias("fp"),
        n_kg.alias("n_kg"),
    )
    return (
        win.filter(F.col("pos") <= F.greatest(F.col("n_kg") - WINNOW_W, F.lit(0)))
        .select("id", "fp")
        .distinct()
    )


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


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence −
    punctuation excess. The standard cheap pre-filter before expensive
    pipeline stages."""
    c = F.col(text_col)
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
    score = F.greatest(
        F.least(
            pround(0.5 * len_score + 0.5 * sw_score - 0.25 * punct_pen, 4),
            F.lit(1.0),
        ),
        F.lit(0.0),
    )
    return df.select(F.col(id_col), score.alias("quality"))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es}, 'und' (undetermined)
    when no list scores. Deterministic tie-break by fixed language order."""
    c = F.col(text_col)
    hits = {lang: stopword_hits(c, ws) for lang, ws in LANG_STOPWORDS.items()}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        en.alias("hits_en"),
        de.alias("hits_de"),
        fr.alias("hits_fr"),
        es.alias("hits_es"),
    )
