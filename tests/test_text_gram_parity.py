"""Value parity of the r13 fused Arrow gram/winnow passes against the
staged-column (interpreted HOF) forms they replaced.

The optimization (guide §4.2: vectorized native work inside mapInPandas
instead of interpreted per-element JVM lambdas) must be value-invisible:
every downstream oracle hashes these values, so a single differing hash
is a correctness failure, not a perf trade. The old column forms stay in
the module (word_hash_col / ngram_hash_col — still the SQL-oracle
documentation of the hash chain), which lets this test replay both paths
over the same frames, including the degenerate shapes: empty text,
all-separator text, fewer words than one n-gram, exactly one window,
repeated words (cache-hit path), and multi-space runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators import text as X


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "", "a"),
        (3, "   ", "a"),
        (4, "one two", "b"),  # < one 3-gram
        (5, "one two three", "b"),  # exactly one 3-gram
        (6, "one two three four five six", "b"),  # exactly one winnow window
        (7, "w w w w w w w w w w", "c"),  # repeated word (cache hits)
        (8, "a  b   c    d e f g h i j k", "c"),  # multi-space runs
        (9, "the quick brown fox jumps over the lazy dog again and again", "c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def _column_grams(df, key_col, text_col, n):
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    staged = df.select(
        F.col(key_col).alias("k"), X.word_hash_col(words).alias("h_arr")
    )
    return staged.select(
        "k", F.explode(X.ngram_hash_col(F.col("h_arr"), n)).alias("gh")
    )


def test_gram_hash_rows_matches_column_form(spark, sf_dir):
    for df in (_docs(spark),):
        for n in (3, 5):
            cur = _column_grams(df, "doc_id", "text", n)
            new = X.gram_hash_rows(df, "doc_id", "text", n)
            assert cur.exceptAll(new).count() == 0
            assert new.exceptAll(cur).count() == 0


def test_gram_hash_rows_matches_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = _column_grams(docs, "source", "text", 5)
    new = X.gram_hash_rows(docs, "source", "text", 5)
    assert cur.exceptAll(new).count() == 0
    assert new.exceptAll(cur).count() == 0


def _column_winnow(df, text_col, id_col):
    """The pre-r13 staged-column winnow chain, verbatim."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    staged = df.select(
        F.col(id_col).alias("id"), X.word_hash_col(words).alias("h_arr")
    )
    kg = staged.select(
        "id", X.ngram_hash_col(F.col("h_arr"), X.WINNOW_K).alias("kh_arr")
    )
    n_kg = F.size(F.col("kh_arr"))
    fps = F.transform(
        F.sequence(F.lit(1), F.greatest(n_kg - (X.WINNOW_W - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("kh_arr"), i, X.WINNOW_W)),
    )
    return kg.select(
        "id",
        F.explode(
            F.when(n_kg >= 1, F.array_distinct(fps)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("fp"),
    )


def test_winnow_fingerprints_matches_column_form(spark, sf_dir):
    df = _docs(spark)
    cur = _column_winnow(df, "text", "doc_id")
    new = X.winnow_fingerprints(df, "text", "doc_id")
    assert cur.exceptAll(new).count() == 0
    assert new.exceptAll(cur).count() == 0


def test_winnow_fingerprints_matches_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = _column_winnow(docs, "text", "doc_id")
    new = X.winnow_fingerprints(docs, "text", "doc_id")
    assert cur.exceptAll(new).count() == 0
    assert new.exceptAll(cur).count() == 0
