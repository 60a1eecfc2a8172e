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
