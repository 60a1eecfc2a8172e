#!/usr/bin/env python3
"""Same-host interleaved A/B for the r14 character-counting rewrite in
the text-rule expressions: counting a fixed character CLASS by
``length(regexp_replace(c, "[^...]", ""))`` materializes a filtered copy
of every document through the regex engine, while
``length(c) - length(translate(c, "...", ""))`` is a codegen'd char-map
pass with no regex and no allocation proportional to matches. Exact
same count for any input (translate removes exactly the class members).

Three rewrite sites, A/B'd as the full quality_rules projection (the
shape q_quality_rules and the curate rules stage run):

- alpha_chars: regexp_replace(c, "[^A-Za-z0-9]", "") -> translate over
  the 62 alphanumerics;
- symbols:     regexp_replace(c, "[^#…]", "")        -> translate("#…");
- (quality_col's punct_count has the same form — measured separately by
  the quality_col variant below.)

Usage: python tools/ab_quality_exprs.py [n_samples] [which]
  which: rules (default) | quality
One JSON line to stdout; narrative to stderr. Both forms must agree on
a full-corpus value check first (0 mismatches) or the A/B is void.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALNUM = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = sys.argv[2] if len(sys.argv) > 2 else "rules"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.text import (
        LANG_STOPWORDS,
        RULE_MAX_DUP_WORD_FRAC,
        RULE_MAX_MEAN_WORD_LEN,
        RULE_MAX_SYMBOL_RATIO,
        RULE_MAX_WORDS,
        RULE_MIN_DISTINCT_STOPWORDS,
        RULE_MIN_MEAN_WORD_LEN,
        RULE_MIN_WORDS,
        word_count,
    )
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-quality-exprs")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    def rules_proj(translate_form: bool):
        c = F.col("text")
        words = F.filter(F.split(c, " "), lambda w: w != "")
        n_words = word_count(c)
        if translate_form:
            alpha_chars = (
                F.length(c) - F.length(F.translate(c, ALNUM, ""))
            ).cast("double")
            symbols = (
                F.length(c) - F.length(F.translate(c, "#…", ""))
            ).cast("double")
        else:
            alpha_chars = F.length(
                F.regexp_replace(c, "[^A-Za-z0-9]", "")
            ).cast("double")
            symbols = F.length(F.regexp_replace(c, "[^#…]", "")).cast(
                "double"
            )
        mean_wl = F.when(n_words > 0, alpha_chars / n_words).otherwise(
            F.lit(0.0)
        )
        symbol_ratio = F.when(n_words > 0, symbols / n_words).otherwise(
            F.lit(0.0)
        )
        dup_frac = F.when(
            F.size(words) > 0,
            (F.size(words) - F.size(F.array_distinct(words))).cast("double")
            / F.size(words),
        ).otherwise(F.lit(0.0))
        sw_pat = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
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
        return docs.select(
            F.col("doc_id"),
            r_word_count.alias("r_word_count"),
            r_mean_word_len.alias("r_mean_word_len"),
            r_symbol_ratio.alias("r_symbol_ratio"),
            r_dup_words.alias("r_dup_words"),
            r_stopwords.alias("r_stopwords"),
            (
                r_word_count
                & r_mean_word_len
                & r_symbol_ratio
                & r_dup_words
                & r_stopwords
            ).alias("pass_all"),
        )

    def quality_proj(translate_form: bool):
        from py_gtfs_duckdb_spark.functions import pround
        from py_gtfs_duckdb_spark.operators.text import (
            PUNCT_RE,
            stopword_hits,
        )

        c = F.col("text")
        n_chars = F.length(c).cast("double")
        n_words = word_count(c).cast("double")
        sw = stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
        if translate_form:
            punct = (
                F.length(c) - F.length(F.translate(c, ".,;:!?", ""))
            ).cast("bigint")
        else:
            punct = F.length(
                F.regexp_replace(c, f"[^{PUNCT_RE[1:-1]}]", "")
            ).cast("bigint")
        len_score = F.least(n_chars / 200.0, F.lit(1.0))
        sw_score = F.least(
            F.when(n_words > 0, sw / n_words).otherwise(0.0) * 5.0, F.lit(1.0)
        )
        punct_pen = F.least(
            F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
            * 5.0,
            F.lit(1.0),
        )
        q = F.greatest(
            F.least(
                pround(
                    0.5 * len_score + 0.5 * sw_score - 0.25 * punct_pen, 4
                ),
                F.lit(1.0),
            ),
            F.lit(0.0),
        )
        return docs.select(F.col("doc_id"), q.alias("quality"))

    proj = rules_proj if which == "rules" else quality_proj

    # full-corpus value-identity check (void otherwise)
    mism = (
        proj(False)
        .exceptAll(proj(True))
        .count()
    )
    print(f"# value check: {mism} mismatching rows", file=sys.stderr)
    assert mism == 0, "forms disagree — A/B void"

    def run_form(new: bool) -> tuple[float, int]:
        start = time.perf_counter()
        df = proj(new)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - start
        return elapsed, df.columns.__len__()

    run_form(False), run_form(True)  # warmup

    old_t, new_t = [], []
    for i in range(n_samples):
        e, _ = run_form(False)
        old_t.append(e)
        e, _ = run_form(True)
        new_t.append(e)
        print(
            f"# pass {i}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s",
            file=sys.stderr,
        )

    out = {
        "metric": f"ab_quality_exprs_{which}",
        "n_samples": n_samples,
        "value_mismatches": mism,
        "old": {
            "median": round(statistics.median(old_t), 3),
            "min": round(min(old_t), 3),
            "samples": [round(v, 4) for v in old_t],
        },
        "new": {
            "median": round(statistics.median(new_t), 3),
            "min": round(min(new_t), 3),
            "samples": [round(v, 4) for v in new_t],
        },
        "median_ratio_new_over_old": round(
            statistics.median(new_t) / statistics.median(old_t), 3
        ),
        "min_ratio_new_over_old": round(min(new_t) / min(old_t), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
