"""Training-data pipeline composition ops (operators/pipeline.py):
planted-topology behavior beyond the DuckDB-oracle battery checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators import pipeline as P


def test_stratified_sample_is_deterministic_and_rate_shaped(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    once = P.stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, key_col="doc_id")
    twice = P.stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, key_col="doc_id")
    a = sorted(r["doc_id"] for r in once.collect())
    assert a == sorted(r["doc_id"] for r in twice.collect()), "reproducible"
    by_lang = {
        r["lang"]: r["n"]
        for r in once.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per stratum; md5 unit hash is uniform — allow wide slack
    assert 400 <= by_lang.get("en", 0) <= 600
    assert 40 <= by_lang.get("de", 0) <= 180
    # zero default rate drops unknown strata entirely
    extra = spark.createDataFrame([(99991, "xx")], "doc_id long, lang string")
    assert P.stratified_sample(extra, "lang", {"en": 1.0}).count() == 0


def test_decontaminate_flags_planted_overlap(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, f"benchmark text {shared} end"),          # benchmark (0 % 97 == 0)
            (1, f"corpus copy {shared} trailing words"),  # contaminated
            (2, "completely different words nothing in common here at all ok"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in P.decontaminate(docs, F.col("doc_id") == 0).collect()
    }
    assert 1 in got and got[1] >= 1, "planted overlap flagged"
    assert 2 not in got, "clean document untouched"


def test_pack_sequences_budget_boundary_policy(spark):
    # one shard (ids all ≡ 0 mod 32), token counts 3 each, budget 5:
    # exclusive cumsums 0,3,6,9 -> bins 0,0,1,1
    docs = spark.createDataFrame(
        [(0, "a b c"), (32, "d e f"), (64, "g h i"), (96, "j k l")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["bin"])
        for r in P.pack_sequences(docs, budget=5, n_shards=32).collect()
    }
    assert rows == {
        0: (0, 3, 0),
        32: (0, 3, 0),
        64: (0, 3, 1),
        96: (0, 3, 1),
    }


def test_keep_canonical_picks_best_quality_then_min_id(spark):
    from py_gtfs_duckdb_spark.operators.dedup import keep_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.5)],
        "doc_id long, quality double",
    )
    got = {
        r["cluster_id"]: (r["kept_doc_id"], r["n_members"], r["kept_quality"])
        for r in keep_canonical(clusters, scores).collect()
    }
    # cluster 1: quality tie 2 vs 3 -> smaller id wins; cluster 10: tie -> 10
    assert got == {1: (2, 3, 0.9), 10: (10, 2, 0.5)}


def test_keep_canonical_tolerates_partial_scores(spark):
    """Members missing from a partial score table still count and can
    still be kept (null scores rank last); a fully-unscored cluster keeps
    its smallest id instead of vanishing — an inner join here would
    silently delete whole clusters under the documented anti-join usage."""
    from py_gtfs_duckdb_spark.operators.dedup import keep_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (20, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame([(2, 0.4)], "doc_id long, quality double")
    got = {
        r["cluster_id"]: (r["kept_doc_id"], r["n_members"], r["kept_quality"])
        for r in keep_canonical(clusters, scores).collect()
    }
    assert got == {1: (2, 2, 0.4), 20: (20, 2, None)}
