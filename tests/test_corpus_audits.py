"""Round-6 corpus-audit operators: n-gram novelty (memorization risk),
DSIR importance weights, split leakage, IVF cell profile — planted-
topology behavior beyond the DuckDB-oracle battery checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators.annq import (
    ivf_cell_profile,
    ivf_train_lloyd_q,
)
from py_gtfs_duckdb_spark.operators.lexical import dsir_weights
from py_gtfs_duckdb_spark.operators.pipeline import split_leakage
from py_gtfs_duckdb_spark.operators.text import ngram_novelty


def test_ngram_novelty_flags_planted_duplicates(spark):
    """Two verbatim copies + one unique doc: the copies' n-grams all
    recur (shared_frac 1.0), the unique doc's never do, and a doc too
    short for one n-gram survives as (0, 0, 0.0)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared),
            (3, "one unique sentence with entirely different words here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["shared_frac"])
        for r in ngram_novelty(docs, n=5).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 4 and got[1][1] == 4 and got[1][2] == 1.0
    assert got[2] == got[1]
    assert got[3][1] == 0 and got[3][2] == 0.0
    assert got[4] == (0, 0, 0.0)


def test_dsir_weights_prefer_target_vocabulary(spark):
    """Docs written in the target slice's vocabulary must score a higher
    mean log-ratio than docs in the raw slice's vocabulary, and a
    held-out doc using target vocabulary scores target-like."""
    t_text = "quantum flux resonance entangle qubit decohere"
    r_text = "market price revenue margin profit ledger"
    rows = [(i, "target", t_text) for i in range(10)]
    rows += [(i + 10, "raw", r_text) for i in range(10)]
    rows += [(99, "raw", t_text)]  # held-out: target vocab, raw slice
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r["dsir"]
        for r in dsir_weights(docs, F.col("source") == "target").collect()
    }
    assert got[0] > 0 > got[10], (got[0], got[10])
    # the held-out doc shares the target vocabulary, so it scores like
    # the target docs despite sitting in the raw slice
    assert got[99] > 0


def test_dsir_short_docs_survive(spark):
    docs = spark.createDataFrame(
        [(1, "a", "word"), (2, "b", "two words here")],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir"])
        for r in dsir_weights(docs, F.col("source") == "a").collect()
    }
    assert got[1] == (0, 0.0)  # single word -> no bigram features
    assert got[2][0] == 2


def test_split_leakage_detects_cross_split_duplicates(spark):
    """A corpus of identical documents leaks fully: every split pair
    shares every n-gram (jaccard 1.0)."""
    text = "the same boilerplate sentence repeated in every document"
    docs = spark.createDataFrame(
        [(i, text) for i in range(3000)], "doc_id long, text string"
    )
    rows = split_leakage(docs, n=3).collect()
    pairs = {(r["split_a"], r["split_b"]): r["jaccard"] for r in rows}
    assert set(pairs) == {
        ("test", "train"), ("test", "val"), ("train", "val"),
    }
    assert all(j == 1.0 for j in pairs.values())


def test_ivf_cell_profile_accounts_for_every_vector(spark, sf_dir):
    """Occupancies sum to the corpus size, every centroid appears, and
    inertia is non-negative with at least one non-trivial cell."""
    from py_gtfs_duckdb_spark.plans._tables import t

    e = t(spark, sf_dir, "embeddings")
    cents = ivf_train_lloyd_q(e, 16, n_iter=2)
    prof = ivf_cell_profile(e, cents).collect()
    assert len(prof) == 16
    assert sum(r["n_vectors"] for r in prof) == e.count()
    assert all(r["inertia"] >= 0 for r in prof)
    assert any(r["inertia"] > 0 for r in prof)


def test_minhash_calibration_planted_topology(spark):
    """Verbatim copies land at full signature agreement with exact
    Jaccard 1.0; unrelated docs either produce no candidate pair or land
    in low-agreement buckets with low exact Jaccard."""
    from py_gtfs_duckdb_spark.operators.dedup import (
        MINHASH_K,
        minhash_calibration,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, dup), (2, dup), (3, dup)]
    rows += [
        (10 + i, f"unique document number {i} with its own distinct words w{i}")
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curve = {
        r["n_match"]: (r["n_pairs"], r["avg_jaccard"])
        for r in minhash_calibration(docs).collect()
    }
    # the three copies form C(3,2)=3 pairs at perfect agreement
    assert curve[MINHASH_K][0] >= 3
    assert curve[MINHASH_K][1] == 1.0
    # any other bucket must average strictly below the perfect pairs
    for m, (_, j) in curve.items():
        if m != MINHASH_K:
            assert j < 1.0


def test_length_buckets_caps_and_truncation(spark):
    from py_gtfs_duckdb_spark.operators.pipeline import length_buckets

    docs = spark.createDataFrame(
        [
            (1, "one two three"),          # 3 tokens  -> cap 4
            (2, "a b c d e"),              # 5 tokens  -> cap 8
            (3, " ".join(["w"] * 20)),     # 20 tokens -> truncated to 16
        ],
        "doc_id long, text string",
    )
    got = {
        r["cap"]: r
        for r in length_buckets(docs, caps=(4, 8, 16)).collect()
    }
    assert got[4]["n_docs"] == 1 and got[4]["token_mass"] == 3
    assert got[4]["pad_waste"] == 1 and got[4]["waste_frac"] == 0.25
    assert got[8]["pad_waste"] == 3
    assert got[16]["n_truncated"] == 1 and got[16]["trunc_tokens"] == 4
    assert got[16]["token_mass"] == 16 and got[16]["pad_waste"] == 0


def test_embedding_audit_moments(spark):
    from py_gtfs_duckdb_spark.operators.annq import embedding_audit

    vecs = spark.createDataFrame(
        [
            (1, [0.1, 0.5]),
            (2, [0.3, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["dim"]: r for r in embedding_audit(vecs).collect()}
    assert got[0]["mean"] == 0.2 and abs(got[0]["var"] - 0.01) < 1e-9
    assert got[1]["var"] == 0.0 and got[1]["min_val"] == 0.5
    assert got[0]["n_vecs"] == 2


def test_rescue_leaked_eval_demotes_contaminated(spark):
    """With a corpus of identical docs, every val/test doc shares all its
    3-grams with train and demotes; train docs never move. A corpus of
    all-unique docs rescues nothing."""
    from py_gtfs_duckdb_spark.operators.pipeline import rescue_leaked_eval

    same = "the same boilerplate sentence repeated in every document body"
    docs = spark.createDataFrame(
        [(i, same) for i in range(3000)], "doc_id long, text string"
    )
    rows = rescue_leaked_eval(docs, n=3).collect()
    assert len(rows) == 3000
    for r in rows:
        if r["split"] == "train":
            assert r["final_split"] == "train"
        else:
            assert r["final_split"] == "train" and r["n_leaked"] > 0

    # every word is doc-unique, so no 3-gram can cross a split boundary
    uniq = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(3000)],
        "doc_id long, text string",
    )
    rows = rescue_leaked_eval(uniq, n=3).collect()
    assert all(r["split"] == r["final_split"] for r in rows)
    assert all(r["n_leaked"] == 0 for r in rows if r["split"] != "train")


# ---------------------------------------------------------------------------
# differential property tests: round-6 audits vs pure-Python models
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

import pytest  # noqa: E402

# tiny vocabulary -> frequent cross-doc n-gram collisions
_texts = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=10).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


def _novelty_model(texts: list[str], n: int):
    from collections import Counter

    grams_by_doc = []
    for t in texts:
        ws = [x for x in t.split(" ") if x]
        grams_by_doc.append(
            {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}
        )
    df = Counter(g for grams in grams_by_doc for g in grams)
    out = {}
    for doc_id, grams in enumerate(grams_by_doc):
        shared = sum(1 for g in grams if df[g] >= 2)
        frac = (
            __import__("math").floor(shared / len(grams) * 10000 + 0.5) / 10000
            if grams
            else 0.0
        )
        out[doc_id] = (len(grams), shared, frac)
    return out


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, n=st.integers(min_value=2, max_value=3))
def test_ngram_novelty_matches_python_model(spark, texts, n):
    """The window/aggregation plan must agree with the obvious
    sequential model on random small corpora — including empty docs,
    docs shorter than one n-gram, and within-doc repeated grams (which
    must count once: the gram frame is DISTINCT per doc)."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["shared_frac"])
        for r in ngram_novelty(docs, n=n).collect()
    }
    assert got == _novelty_model(texts, n)


def _length_model(texts: list[str], caps: tuple):
    import math
    import re
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, kept, tr, lost
    top = caps[-1]
    for t in texts:
        nt = len(re.findall(r"\w+|[^\w\s]", t))
        cap = next((c for c in caps if nt <= c), top)
        a = agg[cap]
        a[0] += 1
        a[1] += min(nt, top)
        a[2] += 1 if nt > top else 0
        a[3] += max(nt - top, 0)
    out = {}
    for cap, (n, kept, tr, lost) in agg.items():
        waste = cap * n - kept
        out[cap] = (
            n, kept, waste,
            math.floor(waste / (cap * n) * 10000 + 0.5) / 10000,
            tr, lost,
        )
    return out


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["word", "x", "yz"]), max_size=20).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_length_buckets_matches_python_model(spark, texts):
    from py_gtfs_duckdb_spark.operators.pipeline import length_buckets

    caps = (2, 4, 8)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["cap"]: (
            r["n_docs"], r["token_mass"], r["pad_waste"], r["waste_frac"],
            r["n_truncated"], r["trunc_tokens"],
        )
        for r in length_buckets(docs, caps=caps).collect()
    }
    assert got == _length_model(texts, caps)


def test_keep_top_k_caps_cluster_retention(spark):
    """k=2 keeps the two best-scored members per cluster (ties to the
    smaller id), singleton clusters keep their only member, and a member
    missing from the score table still counts and can still be kept."""
    from py_gtfs_duckdb_spark.operators.dedup import keep_top_k

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 30), (6, 30)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.1), (5, 0.3)],  # 6 unscored
        "doc_id long, quality double",
    )
    rows = keep_top_k(clusters, scores, k=2).collect()
    got = {(r["cluster_id"], r["doc_id"]): (r["rank"], r["n_members"]) for r in rows}
    assert got == {
        (10, 2): (1, 3),  # best quality
        (10, 3): (2, 3),  # second best; doc 1 dropped
        (20, 4): (1, 1),
        (30, 5): (1, 2),  # scored beats unscored
        (30, 6): (2, 2),  # unscored member still kept within k
    }
