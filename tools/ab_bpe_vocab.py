#!/usr/bin/env python3
"""Same-host interleaved A/B for the r14 bpe_vocab_spectrum /
bpe_encode_stats dispatch question: for SHALLOW merge tables the
operators use the nested-replace EXPRESSION encoder inside an array
``transform`` — but higher-order functions are interpreted
(CodegenFallback), so every word occurrence pays len(merges)
interpreted Replace evaluations, while the Arrow kernel memoizes the
greedy encode PER DISTINCT WORD per task (this corpus has a closed
~31-word vocabulary — the memo hit rate is ~100%).

Forms (identical values — ordered-replace ≡ greedy is pinned for every
frozen table on this corpus by tests/test_bpe.py, and the battery
oracle hash-checks the output):

- old: bpe_vocab_spectrum expression branch (FIXED_MERGES_V1, 24
  nested replaces per word inside transform);
- new: the Arrow branch (bpe_tokenize kernel + explode), forced by
  calling the same code the >MAX_EXPR_MERGES dispatch takes.

Usage: python tools/ab_bpe_vocab.py [n_samples] [which]
  which: vocab (default) | stats   (stats A/Bs bpe_encode_stats)
One JSON line to stdout; narrative to stderr. Row/value identity
checked first (exceptAll both ways == 0) or the A/B is void.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = sys.argv[2] if len(sys.argv) > 2 else "vocab"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators import bpe as B
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-bpe-vocab")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    merges = B.FIXED_MERGES_V1

    def vocab_expr():
        """The r13 shallow-table expression branch, verbatim."""
        words = F.filter(
            F.split(F.replace(F.col("text"), F.lit(B.SEP)), " "),
            lambda w: w != "",
        )
        staged = docs.select(
            F.col("doc_id").alias("id"),
            F.concat_ws(
                "",
                F.transform(
                    words, lambda w: B.bpe_encode_word_expr(w, merges)
                ),
            ).alias("enc"),
        )
        toks = staged.select(
            "id",
            F.explode(
                F.filter(F.split(F.col("enc"), B.SEP), lambda t: t != "")
            ).alias("token"),
        )
        return (
            toks.groupBy("token")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                F.countDistinct("id").cast("bigint").alias("n_docs"),
            )
            .orderBy(F.desc("n_occurrences"), "token")
            .limit(50)
        )

    def stats_expr():
        """The r13 shallow-table expression stats, via the live dispatch
        (default use_arrow=None keeps the expression branch)."""
        return B.bpe_encode_stats(docs, merges)

    if which == "vocab":
        old_df = vocab_expr
        new_df = lambda: B.bpe_vocab_spectrum(docs, merges)  # noqa: E731
    else:
        old_df = stats_expr
        new_df = lambda: B._bpe_stats_arrow(  # noqa: E731
            docs, merges, "text", "doc_id", ()
        )

    a, b = old_df(), new_df()
    mism = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"# value check: {mism} mismatching rows", file=sys.stderr)
    assert mism == 0, "forms disagree — A/B void"

    def run(fn) -> float:
        start = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    run(old_df), run(new_df)  # warmup

    old_t, new_t = [], []
    for i in range(n_samples):
        old_t.append(run(old_df))
        new_t.append(run(new_df))
        print(
            f"# pass {i}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s",
            file=sys.stderr,
        )

    out = {
        "metric": f"ab_bpe_{which}",
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
