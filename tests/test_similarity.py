"""Recall of the approximate ANN paths against the exact brute force.

Approximate search has no value-equality oracle; its contract is recall.
Both scale paths (LSH multiprobe buckets, IVF nprobe cells) must recover
most of the true top-k on the driver testdata embeddings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    from py_gtfs_duckdb_spark.plans._tables import t

    return t(spark, sf_dir, "embeddings")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx, exact) -> float:
    hits = total = 0
    for qid, want in exact.items():
        got = approx.get(qid, set())
        hits += len(got & want)
        total += len(want)
    return hits / max(1, total)


@pytest.fixture(scope="module")
def exact_top5(spark, embeddings):
    from py_gtfs_duckdb_spark.operators.similarity import cosine_topk

    q = embeddings.filter(F.col("vec_id") < 10)
    return _topk_sets(cosine_topk(embeddings, q, k=5))


def _clustered_vectors(spark, n_clusters=20, per_cluster=25, dim=64, noise=0.25):
    """Deterministic planted clusters: members of a cluster have cosine
    ~0.9 to each other — the regime LSH is FOR. (The driver's synthetic
    embeddings are near-orthogonal, top-1 cosine ~0.35; no sub-linear
    method can retrieve those, so recall is asserted here instead.)"""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    rows = []
    vid = 0
    for ci in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[ci] + noise * rng.randn(dim)
            rows.append((vid, ci, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, cluster int, embedding array<float>"
    )


def test_lsh_recall_on_clustered_data(spark):
    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
    )

    vecs = _clustered_vectors(spark)
    q = vecs.filter(F.col("vec_id") < 10)
    exact = _topk_sets(cosine_topk(vecs, q, k=5))
    approx = _topk_sets(lsh_bucketed_topk(vecs, q, k=5))
    assert _recall(approx, exact) >= 0.8


def test_lsh_returns_candidates_on_testdata(spark, embeddings):
    """On the (near-orthogonal) driver embeddings LSH cannot promise
    recall, but the plumbing must still produce ranked candidates for
    every query that collides at all."""
    from py_gtfs_duckdb_spark.operators.similarity import lsh_bucketed_topk

    q = embeddings.filter(F.col("vec_id") < 10)
    rows = lsh_bucketed_topk(embeddings, q, k=5).collect()
    assert rows
    assert all(1 <= r["rank"] <= 5 for r in rows)


def test_ivf_recall(spark, embeddings, exact_top5):
    from py_gtfs_duckdb_spark.operators.similarity import ivf_topk

    q = embeddings.filter(F.col("vec_id") < 10)
    approx = _topk_sets(ivf_topk(embeddings, q, k=5, nprobe=4))
    assert _recall(approx, exact_top5) >= 0.5


def test_ivf_full_probe_equals_exact(spark, embeddings, exact_top5):
    """With nprobe == n_centroids every cell is searched — IVF must then
    equal brute force exactly (same rounding, same tie-breaks)."""
    from py_gtfs_duckdb_spark.operators.similarity import ivf_topk

    q = embeddings.filter(F.col("vec_id") < 10)
    full = _topk_sets(ivf_topk(embeddings, q, k=5, n_centroids=16, nprobe=16))
    assert full == exact_top5


def test_lloyd_training_improves_or_holds_recall(spark):
    """Lloyd iterations must not hurt recall on clustered data — with
    20 true clusters and 16 cells, refined centroids should track the
    planted structure at least as well as the raw md5 seed sample."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
        ivf_train_lloyd,
    )

    vecs = _clustered_vectors(spark)
    q = vecs.filter(F.col("vec_id") < 10)
    exact = _topk_sets(cosine_topk(vecs, q, k=5))
    seeds = ivf_centroids(vecs, 16)
    trained = ivf_train_lloyd(vecs, 16, n_iter=2, seed_centroids=seeds)
    seed_recall = _recall(
        _topk_sets(ivf_topk(vecs, q, k=5, nprobe=4, centroids=seeds)), exact
    )
    lloyd_recall = _recall(
        _topk_sets(ivf_topk(vecs, q, k=5, nprobe=4, centroids=trained)), exact
    )
    assert lloyd_recall >= seed_recall - 1e-9
    assert lloyd_recall >= 0.5


def test_lloyd_centroids_move_toward_cluster_means(spark):
    """After 2 iterations each centroid is the mean of its cell — verify
    the fixed-shape contract (cid stable, dim preserved, finite norms)."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        ivf_centroids,
        ivf_train_lloyd,
    )

    vecs = _clustered_vectors(spark, n_clusters=4, per_cluster=10)
    seeds = ivf_centroids(vecs, 4)
    trained = ivf_train_lloyd(vecs, 4, n_iter=2, seed_centroids=seeds)
    assert [c.cid for c in trained] == [c.cid for c in seeds]
    assert all(len(c.cv) == 64 and c.cnrm > 0 for c in trained)


def test_lloyd_driver_bound_guard():
    """The per-iteration driver-side collect is n_centroids*dim rows; the
    guard names that bound loudly instead of letting a million-centroid
    caller discover it as an OOM. Raises before any Spark work."""
    from collections import namedtuple

    from py_gtfs_duckdb_spark.operators.similarity import ivf_train_lloyd

    Cent = namedtuple("Cent", ["cid", "cv", "cnrm"])
    seeds = [Cent(i, [0.0] * 4, 0.0) for i in range(2)]  # 2*4 = 8 elems
    with pytest.raises(ValueError, match="driver-side aggregation bound"):
        ivf_train_lloyd(None, 2, seed_centroids=seeds, max_driver_elems=7)


def test_pq_roundtrip_and_recall_on_clustered_data(spark):
    """PQ codes + ADC search recover most of the exact top-5 on clustered
    vectors, deterministically. 64-dim -> m=8 codes (32x compression)."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_topk_rerank,
        pq_train,
    )

    vecs = _clustered_vectors(spark, n_clusters=8, per_cluster=20)
    cb = pq_train(vecs, m=8, ksub=16, sample_size=160)
    assert cb["dsub"] == 8 and len(cb["codebooks"]) == 8
    codes = pq_encode(vecs, cb)
    rows = codes.collect()
    assert len(rows) == 160
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])

    q = vecs.filter(F.col("vec_id") < 8)
    exact = _topk_sets(cosine_topk(vecs, q, k=5))
    # pure ADC ranking: quantization error dominates INSIDE a tight
    # cluster, so top-5 order is fuzzy — but it must still beat chance
    # (random 5-of-159 ~ 0.16) and its top-25 shortlist must capture the
    # true neighborhood (that is PQ's actual job: candidate generation).
    approx = _topk_sets(pq_topk(codes, q, cb, k=5))
    assert _recall(approx, exact) >= 0.3
    shortlist = _topk_sets(pq_topk(codes, q, cb, k=25))
    assert _recall(shortlist, exact) >= 0.8
    # ADC shortlist + exact re-rank: the production serving shape
    reranked = _topk_sets(pq_topk_rerank(codes, vecs, q, cb, k=5))
    assert _recall(reranked, exact) >= 0.8
    # determinism: retrain + re-encode + re-search reproduces exactly
    cb2 = pq_train(vecs, m=8, ksub=16, sample_size=160)
    assert cb2 == cb
    approx2 = _topk_sets(pq_topk(pq_encode(vecs, cb2), q, cb2, k=5))
    assert approx2 == approx


def test_pq_exact_when_corpus_is_codebook(spark):
    """Vectors that coincide with sub-centroids reconstruct losslessly, so
    ADC distance == true distance and PQ ranking == exact ranking."""
    import numpy as np

    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    # 16 distinct normalized vectors; train on exactly these, so every
    # subvector is its own centroid (k-means fixed point at n == ksub).
    rng = np.random.RandomState(3)
    mat = rng.randn(16, 64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(16)],
        "vec_id bigint, embedding array<float>",
    )
    cb = pq_train(vecs, m=8, ksub=16, sample_size=16, n_iter=1)
    codes = pq_encode(vecs, cb)
    q = vecs.filter(F.col("vec_id") < 4)
    exact = _topk_sets(cosine_topk(vecs, q, k=3))
    approx = _topk_sets(pq_topk(codes, q, cb, k=3))
    assert _recall(approx, exact) == 1.0


def test_pq_rejects_indivisible_dim(spark):
    from py_gtfs_duckdb_spark.operators.similarity import pq_train

    vecs = spark.createDataFrame(
        [(0, [0.0] * 10), (1, [1.0] * 10)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(vecs, m=3, ksub=2, sample_size=2)


def test_ivfpq_composes_cell_restriction_with_adc(spark):
    """IVF+PQ: candidates come only from probed cells, distances from ADC
    codes; with generous nprobe the recall approaches plain PQ."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_cells,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )

    vecs = _clustered_vectors(spark, n_clusters=8, per_cluster=20)
    cb = pq_train(vecs, m=8, ksub=16, sample_size=160)
    codes = pq_encode(vecs, cb)
    cents = ivf_centroids(vecs, 8)
    cells = ivf_cells(vecs, cents)
    assert cells.count() == 160

    q = vecs.filter(F.col("vec_id") < 8)
    exact = _topk_sets(cosine_topk(vecs, q, k=5))
    # shortlist recall: the top-25 ADC candidates from probed cells must
    # capture the true top-5 neighborhood (clustered data -> the query's
    # own cluster maps to few cells, well inside nprobe=4)
    shortlist = _topk_sets(ivfpq_topk(codes, cells, q, cb, cents, k=25, nprobe=4))
    assert _recall(shortlist, exact) >= 0.7
    # determinism
    again = _topk_sets(ivfpq_topk(codes, cells, q, cb, cents, k=25, nprobe=4))
    assert again == shortlist


def test_ann_index_lifecycle_over_lake(spark, tmp_path, sf_dir):
    """build -> persisted artifacts -> query-by-name equals the direct
    in-memory IVFPQ result; rebuild publishes a new version atomically."""
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.operators.ann_index import (
        ann_query,
        build_ann_index,
        load_ann_models,
    )
    from py_gtfs_duckdb_spark.operators.similarity import (
        ivf_cells,
        ivf_centroids,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )
    from py_gtfs_duckdb_spark.plans._tables import t

    e = t(spark, sf_dir, "embeddings")
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    build_ann_index(lake, e, name="emb")
    for table in ("emb_codes", "emb_cells", "emb_meta"):
        assert lake.exists(table), table
    cb, cents = load_ann_models(lake, "emb")
    assert cb["m"] == 8 and len(cents) == 16

    q = e.filter(e.vec_id < 5)
    served = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ann_query(lake, q, name="emb", k=3).collect()
    }
    direct_cb = pq_train(e, m=8, ksub=16)
    direct_cents = ivf_centroids(e, 16)
    direct = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivfpq_topk(
            pq_encode(e, direct_cb), ivf_cells(e, direct_cents), q,
            direct_cb, direct_cents, k=3,
        ).collect()
    }
    assert served == direct, "persisted round-trip changes nothing"

    v0 = lake.current_version("emb_codes")
    build_ann_index(lake, e, name="emb")  # rebuild: new version, same answers
    assert lake.current_version("emb_codes") > v0
    again = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ann_query(lake, q, name="emb", k=3).collect()
    }
    assert again == served


def test_ann_query_memoizes_model_load_per_version(spark, tmp_path, sf_dir):
    """VERDICT r4 Next #8: a serving loop issuing repeated ann_query calls
    must hit the lake meta table ONCE per index version — the version
    probe is a pointer-file read, not a Spark job — and a rebuild (new
    version) must invalidate the cache."""
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.operators import ann_index as A
    from py_gtfs_duckdb_spark.plans._tables import t

    e = t(spark, sf_dir, "embeddings")
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    build_kwargs = dict(name="memo")
    A.build_ann_index(lake, e, **build_kwargs)

    meta_reads = {"n": 0}
    orig = GtfsLake.table

    def spy(self, table):
        if table == "memo_meta":
            meta_reads["n"] += 1
        return orig(self, table)

    q = e.filter(e.vec_id < 3)
    try:
        GtfsLake.table = spy
        A._MODEL_CACHE.clear()
        for _ in range(3):
            A.ann_query(lake, q, name="memo", k=2).collect()
        assert meta_reads["n"] == 1, "meta table must be read once, not per call"
        A.build_ann_index(lake, e, **build_kwargs)  # version bump
        A.ann_query(lake, q, name="memo", k=2).collect()
        assert meta_reads["n"] == 2, "rebuild must invalidate the cache"
    finally:
        GtfsLake.table = orig
        A._MODEL_CACHE.clear()


def test_random_projection_preserves_neighborhoods(spark):
    """JL projection 64->16: deterministic across runs, and brute-force
    top-5 in the projected space recovers most of the true top-5 on
    clustered vectors."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        cosine_topk,
        random_projection,
    )

    vecs = _clustered_vectors(spark, n_clusters=8, per_cluster=20)
    proj = random_projection(vecs, out_dim=16)
    rows = proj.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    again = random_projection(vecs, out_dim=16).collect()
    assert {r["vec_id"]: r["embedding"] for r in rows} == {
        r["vec_id"]: r["embedding"] for r in again
    }

    q_ids = 8
    exact = _topk_sets(cosine_topk(vecs, vecs.filter(F.col("vec_id") < q_ids), k=5))
    # like PQ, 16 dims blur fine intra-cluster ranking: the projected
    # space is a candidate generator — top-5 beats chance, top-15
    # captures the true neighborhood
    approx = _topk_sets(
        cosine_topk(proj, proj.filter(F.col("vec_id") < q_ids), k=5)
    )
    assert _recall(approx, exact) >= 0.3
    shortlist = _topk_sets(
        cosine_topk(proj, proj.filter(F.col("vec_id") < q_ids), k=15)
    )
    assert _recall(shortlist, exact) >= 0.8


def test_ann_model_cache_invalidated_by_drop_and_rebuild(spark, tmp_path, sf_dir):
    """Advisor finding (round 5): lake.drop() deletes the version pointer,
    so a rebuild restarts at version 1 — a cache keyed on the bare version
    would serve the OLD codebook against the NEW codes/cells tables. The
    cache key now includes the pointer mtime, so a drop+rebuild with
    different training parameters must surface the fresh model."""
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.operators.ann_index import (
        build_ann_index,
        load_ann_models,
    )
    from py_gtfs_duckdb_spark.plans._tables import t

    e = t(spark, sf_dir, "embeddings")
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    build_ann_index(lake, e, name="emb", n_centroids=16)
    cb0, cents0 = load_ann_models(lake, "emb")
    assert len(cents0) == 16
    v0 = lake.current_version("emb_meta")

    for table in ("emb_codes", "emb_cells", "emb_meta"):
        lake.drop(table)
    build_ann_index(lake, e, name="emb", n_centroids=8)
    assert lake.current_version("emb_meta") == v0, (
        "precondition: rebuild after drop reuses the version number — "
        "exactly the collision the content token exists for"
    )
    cb1, cents1 = load_ann_models(lake, "emb")
    assert len(cents1) == 8, "stale cached centroids served after rebuild"


def test_ann_recall_report_matches_python_and_is_monotone(spark, embeddings):
    """ann_recall must equal the sequential overlap computation per
    query, give every exact-side query a row (0 hits included), score
    exact-vs-exact at 1.0, and produce a non-decreasing mean recall as
    nprobe grows (more cells searched can only add candidates)."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
    )

    q = embeddings.filter(F.col("vec_id") < 10)
    exact_df = cosine_topk(embeddings, q, k=5)
    exact = _topk_sets(exact_df)

    means = []
    for nprobe in (1, 2, 4):
        approx_df = ivf_topk(embeddings, q, k=5, nprobe=nprobe)
        approx = _topk_sets(approx_df)
        rows = {r["query_id"]: r for r in ann_recall(approx_df, exact_df, 5).collect()}
        assert set(rows) == set(exact), "every exact query gets a row"
        for qid, want in exact.items():
            n = len(approx.get(qid, set()) & want)
            assert rows[qid]["n_hits"] == n
            assert abs(rows[qid]["recall"] - n / 5) < 1e-9
        means.append(sum(r["recall"] for r in rows.values()) / len(rows))
    assert means == sorted(means), f"recall not monotone in nprobe: {means}"

    self_rows = ann_recall(exact_df, exact_df, 5).collect()
    assert all(r["recall"] == 1.0 and r["n_hits"] == 5 for r in self_rows)


def test_ann_recall_small_corpus_denominator(spark):
    """A query whose ground truth holds FEWER than k rows (corpus smaller
    than k+1 after self-exclusion) must be able to reach recall 1.0: the
    denominator is the per-query exact row count, not the fixed k
    (ADVICE r10)."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
    )

    rows = [(i, [float(i + 1), 1.0, 0.5]) for i in range(4)]  # corpus of 4
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2)
    exact = cosine_topk(emb, q, k=5)  # only 3 neighbors exist per query
    got = {r["query_id"]: r for r in ann_recall(exact, exact, 5).collect()}
    assert set(got) == {0, 1}
    for r in got.values():
        assert r["n_hits"] == 3
        assert r["recall"] == 1.0, "perfect index must score 1.0, not 3/5"


@pytest.mark.slow
def test_ann_recall_floors_per_family(spark):
    """Regression floors for the three compressed-domain index families
    (VERDICT r10 Next #5): the recall harness RECORDS curves, but nothing
    failed if an index regressed to garbage. Floors are ~70-75% of the
    values measured on the sf0.1 embeddings at recall@10 over 20 queries
    (IVF nprobe=4: 0.54, LSH 6 planes: 0.24, PQ-ADC+rerank: 0.43 —
    SCALING.md §14), far enough below to absorb query-set sensitivity,
    high enough that a broken cell assignment / bucket probe / codebook
    trips them."""
    from py_gtfs_duckdb_spark.operators import annq as AQ
    from py_gtfs_duckdb_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
    )
    from py_gtfs_duckdb_spark.plans._tables import t

    e = t(spark, "/root/testdata/sf0.1", "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = cosine_topk(e, q, k=10).persist()
    exact.count()
    try:
        def mean_recall(approx):
            return ann_recall(approx, exact, 10).agg(
                F.avg("recall").alias("m")
            ).collect()[0]["m"]

        ivf = mean_recall(ivf_topk(e, q, k=10, nprobe=4))
        assert ivf >= 0.40, f"IVF nprobe=4 recall@10 collapsed: {ivf}"
        lsh = mean_recall(AQ.lsh_topk_q(e, q, k=10, n_planes=6))
        assert lsh >= 0.15, f"LSH recall@10 collapsed: {lsh}"
        cb = AQ.pq_train_q(e, m=8, ksub=16, n_iter=2)
        pq = mean_recall(AQ.pq_topk_rerank_q(AQ.pq_encode_q(e, cb), e, q, cb, k=10))
        assert pq >= 0.30, f"PQ recall@10 collapsed: {pq}"
    finally:
        exact.unpersist()


def test_semantic_decontaminate_exact_matches_reference(spark):
    """Exact mode equals the sequential numpy reference: every corpus
    vector within threshold of any benchmark vector is flagged exactly
    once, with its max-cosine benchmark (ties to smaller bench_id), and
    nothing else is flagged."""
    import math
    import random

    from py_gtfs_duckdb_spark.operators.similarity import (
        semantic_decontaminate,
    )

    rng = random.Random(11)
    dim = 8
    bench = [(100 + i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(4)]
    corpus = []
    for i in range(40):
        if i % 5 == 0:  # contaminated: near-copy of a benchmark vector
            src = bench[i % len(bench)][1]
            v = [x + rng.gauss(0, 0.01) for x in src]
        else:
            v = [rng.gauss(0, 1) for _ in range(dim)]
        corpus.append((i, v))
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(bench, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["bench_id"], r["cosine"])
        for r in semantic_decontaminate(cdf, bdf, threshold=0.9).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        n = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return math.floor(d / n * 10000.0 + 0.5) / 10000.0

    want = {}
    for cid, cv in corpus:
        scored = sorted(
            ((cos(cv, bv), bid) for bid, bv in bench),
            key=lambda t: (-t[0], t[1]),
        )
        top_cos, top_id = scored[0]
        if top_cos >= 0.9:
            want[cid] = (top_id, top_cos)
    assert set(got) == set(want) == {i for i in range(40) if i % 5 == 0}
    for cid, (bid, c) in want.items():
        assert got[cid][0] == bid
        assert abs(got[cid][1] - c) < 1e-9


def test_semantic_decontaminate_blocked_recalls_planted_dups(spark, embeddings):
    """blocked=True (IVF-cell co-assignment) must still flag planted
    exact duplicates: a benchmark built by COPYING corpus vectors lands
    in the same cell as its source (identical vector, identical
    assignment), so recall on exact contamination is 1.0 even though
    cross-cell near-misses may drop — the documented IVF trade."""
    from py_gtfs_duckdb_spark.operators.similarity import (
        semantic_decontaminate,
    )

    bench = (
        embeddings.filter(F.col("vec_id") % 25 == 0)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    corpus = embeddings
    flagged = {
        r["vec_id"]
        for r in semantic_decontaminate(
            corpus, bench, threshold=0.999, blocked=True
        ).collect()
    }
    planted = {
        r["vec_id"] for r in embeddings.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert planted <= flagged, planted - flagged
