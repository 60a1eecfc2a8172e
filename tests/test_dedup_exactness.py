"""Exactness guard for the prefix-filter similarity join.

ngram_jaccard_pairs claims EXACTNESS (unlike MinHash-LSH): every pair with
Jaccard >= t must survive the prefix, length, and positional prunes. That
claim is easy to break with an off-by-one in prefix length or a too-tight
positional bound, so it is checked here against an unpruned brute-force
all-pairs join over generated corpora with planted near-duplicates —
mutation rates straddle the threshold so borderline pairs exist on both
sides of it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _corpus(seed: int, n_docs: int = 80) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(20, 60))]
        docs.append((f"d{i:03d}", " ".join(words)))
    # planted near-dups at varying mutation rates (some above, some below
    # the 0.7 threshold after 3-shingling)
    for j in range(20):
        base_id, base_text = docs[rng.randrange(n_docs)]
        words = base_text.split()
        n_mut = rng.randint(0, max(1, len(words) // 4))
        for _ in range(n_mut):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((f"m{j:03d}_{base_id}", " ".join(words)))
    return docs


def _brute_force(spark, docs_df, threshold: float):
    from py_gtfs_duckdb_spark.operators.dedup import exact_jaccard, shingle_sets

    sets = shingle_sets(docs_df, "text", "doc_id")
    a = sets.select(F.col("id").alias("id_a"))
    b = sets.select(F.col("id").alias("id_b"))
    all_pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # same exact integer predicate as the pruned join's verify — the
    # differential test pins the TRUE J >= t membership, not the
    # display-rounded one
    return exact_jaccard(all_pairs, sets, min_threshold=threshold)


@pytest.mark.parametrize(
    ("seed", "threshold"),
    # 0.55 / 0.67 / 0.81 are IEEE boundary thresholds: sz*t rounds up past
    # an exact integer at many set sizes, so an unslacked ceil in the
    # prefix length silently drops a true boundary pair (ADVICE r10)
    [(7, 0.7), (21, 0.7), (1999, 0.7), (7, 0.55), (21, 0.67), (1999, 0.81)],
)
def test_prefix_filter_join_equals_brute_force(spark, seed, threshold):
    from py_gtfs_duckdb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(_corpus(seed), "doc_id string, text string")
    got = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=threshold
        ).collect()
    )
    want = sorted(tuple(r) for r in _brute_force(spark, docs, threshold).collect())
    assert got == want
    assert want, "corpus must actually contain near-duplicate pairs"


def test_verify_integer_predicate_at_rounding_boundary(spark):
    """ADVICE r11: verification must decide J >= t on the exact integer
    predicate n_inter >= ceil(t*(|A|+|B|)/(1+t)), not on the 4-digit
    display rounding. A pair with true J = 13999/20000 = 0.69995 < 0.7
    ROUNDS to 0.7000 — under the old rounded-value filter its membership
    depended on whether the prunes emitted it; now it is always excluded.
    A pair at exactly J = 14000/20000 = 0.7 is always included."""
    from pyspark.sql import types as T

    from py_gtfs_duckdb_spark.operators.dedup import exact_jaccard

    a = list(range(17000))                      # |A| = 17000
    b_under = list(range(13999)) + list(range(100000, 103000))  # |B|=16999
    # inter=13999, union=20000 -> J=0.69995 (rounds to 0.7, truly < 0.7)
    c = list(range(14000)) + list(range(100000, 103000))        # |C|=17000
    # A∩C=14000, union=20000 -> J=0.7 exactly
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("sz", T.LongType()),
        ]
    )
    sets = spark.createDataFrame(
        [("A", a, len(a)), ("B", b_under, len(b_under)), ("C", c, len(c))],
        schema,
    )
    pairs = spark.createDataFrame(
        [("A", "B"), ("A", "C")], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard(pairs, sets, min_threshold=0.7).collect()
    }
    assert ("A", "B") not in got, "0.69995 rounds to 0.7 but is below t"
    assert got[("A", "C")] == 0.7, "exact-boundary pair included"
    # without the predicate both pairs survive a rounded->=t filter
    rounded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard(pairs, sets).collect()
    }
    assert rounded[("A", "B")] == 0.7, "display rounding masks the band"


def test_freq_order_variant_equals_default(spark):
    from py_gtfs_duckdb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(_corpus(42), "doc_id string, text string")
    default = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, "text", "doc_id").collect()
    )
    freq = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", freq_order=True
        ).collect()
    )
    assert default == freq


def test_embedding_neardup_fat_cell_chunking(spark):
    """One synthetic fat cell (all rows share one quantization cell) must
    produce identical pairs whether the upper triangle is scored in one
    block or in many small chunks — and the chunked path is what bounds
    executor memory when a cell is pathologically skewed."""
    import numpy as np

    from py_gtfs_duckdb_spark.operators.dedup import embedding_neardup_pairs

    rng = random.Random(7)
    dim, n = 16, 120
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = []
    for i in range(n):
        if i % 3 == 0:  # near-dup of base -> pairs above threshold exist
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, "fat", v))
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")

    whole = embedding_neardup_pairs(
        df, "embedding", "vec_id", "label", 0.35, pair_chunk_rows=10**6
    ).collect()
    chunked = embedding_neardup_pairs(
        df, "embedding", "vec_id", "label", 0.35, pair_chunk_rows=7
    ).collect()

    key = lambda r: (r.id_a, r.id_b)
    assert sorted(key(r) for r in whole) == sorted(key(r) for r in chunked)
    assert len(whole) >= (n // 3) * (n // 3 - 1) // 2  # near-dup clique found
    w = {key(r): r.cosine for r in whole}
    c = {key(r): r.cosine for r in chunked}
    assert w == c  # bit-identical cosines: chunking never changes FP order


def test_incremental_dedup_flags_only_new_vs_corpus(spark):
    """A new doc near-duplicating a corpus doc is flagged; near-dups
    WITHIN the corpus (or within the batch) are not the incremental
    check's business and must not appear."""
    from py_gtfs_duckdb_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_lsh_dedup_incremental,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),          # corpus-internal near-dup of 1
            (3, " ".join(f"other{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base + " extra"),        # near-dup of corpus 1 and 2
            (101, " ".join(f"fresh{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup_incremental(
            new, corpus, "text", "doc_id"
        ).collect()
    }
    assert (100, 1) in got and (100, 2) in got
    assert all(a == 100 for a, _ in got), "only new-batch ids on the left"
    assert (1, 2) not in got and (2, 1) not in got, "corpus pairs excluded"
    # and the flagged pairs agree with what full dedup would find
    full = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_dedup(
            corpus.unionByName(new), "text", "doc_id"
        ).collect()
    }
    assert {(1, 100), (2, 100)} <= full


def _containment_corpus(seed: int, n_docs: int = 60) -> list[tuple[str, str]]:
    """Background docs + planted QUOTE-INCLUSION cases: short docs pasted
    verbatim (or with a few mutations) inside longer hosts — high
    containment, low Jaccard — at rates straddling the threshold."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(15, 50))]
        docs.append((f"d{i:03d}", " ".join(words)))
    for j in range(15):
        src_id, src_text = docs[rng.randrange(n_docs)]
        quoted = src_text.split()
        n_mut = rng.randint(0, max(1, len(quoted) // 3))
        for _ in range(n_mut):
            quoted[rng.randrange(len(quoted))] = rng.choice(vocab)
        host = [rng.choice(vocab) for _ in range(rng.randint(40, 90))]
        cut = rng.randrange(len(host) + 1)
        docs.append(
            (f"h{j:03d}_{src_id}", " ".join(host[:cut] + quoted + host[cut:]))
        )
    return docs


def _brute_force_containment(spark, docs_df, threshold: float):
    from py_gtfs_duckdb_spark.functions import pround
    from py_gtfs_duckdb_spark.operators.dedup import shingle_sets, slacked_ceil

    sets = shingle_sets(docs_df, "text", "doc_id")
    sa = sets.select(
        F.col("id").alias("id_a"), F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    return (
        sa.crossJoin(sb)
        .filter(F.col("id_a") != F.col("id_b"))
        # integer-overlap predicate — the same one _containment_join's
        # prunes AND verify enforce, so the reference is exact, not
        # rounded-ratio-approximate
        .filter(
            n_inter.cast("bigint")
            >= slacked_ceil(F.col("sz_a") * threshold, F.col("sz_a"))
        )
        .select(
            "id_a",
            "id_b",
            pround(n_inter.cast("double") / F.col("sz_a"), 4).alias(
                "containment"
            ),
        )
    )


@pytest.mark.parametrize(
    ("seed", "threshold"),
    # boundary thresholds 0.55/0.67/0.81 exercise the slacked prefix ceil
    [(5, 0.8), (33, 0.8), (2024, 0.8), (5, 0.55), (33, 0.67), (2024, 0.81)],
)
def test_containment_join_equals_brute_force(spark, seed, threshold):
    """The A-prefix/B-full-index candidate generation (and the size +
    positional prunes) must be LOSSLESS for containment — checked against
    an unpruned all-ordered-pairs join on corpora with planted quote
    inclusions straddling the threshold."""
    from py_gtfs_duckdb_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        _containment_corpus(seed), "doc_id string, text string"
    )
    got = sorted(
        tuple(r)
        for r in containment_pairs(
            docs, "text", "doc_id", threshold=threshold
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _brute_force_containment(spark, docs, threshold).collect()
    )
    assert got == want
    assert want, "corpus must actually contain containment pairs"


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """The defining asymmetry: a 20-word doc quoted verbatim inside a
    120-word host has containment 1.0 in the quote→host direction ONLY,
    while Jaccard (both the exact join and its length filter) never
    surfaces the pair."""
    from py_gtfs_duckdb_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(300)]
    quote = [rng.choice(vocab) for _ in range(20)]
    host = [rng.choice(vocab) for _ in range(60)] + quote + [
        rng.choice(vocab) for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [("quote", " ".join(quote)), ("host", " ".join(host))],
        "doc_id string, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            docs, "text", "doc_id", threshold=0.9
        ).collect()
    }
    assert ("quote", "host") in cont and cont[("quote", "host")] == 1.0
    assert ("host", "quote") not in cont, "containment is directional"
    jac = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7).collect()
    assert jac == [], "Jaccard structurally misses quote inclusion"


def test_containment_freq_order_variant_equals_default(spark):
    from py_gtfs_duckdb_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        _containment_corpus(42), "doc_id string, text string"
    )
    default = sorted(
        tuple(r)
        for r in containment_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    )
    freq = sorted(
        tuple(r)
        for r in containment_pairs(
            docs, "text", "doc_id", threshold=0.8, freq_order=True
        ).collect()
    )
    assert default == freq


def test_containment_incremental_flags_only_new_vs_corpus(spark):
    """The ingest direction: every flagged pair is (new doc, corpus doc);
    results equal the self-join battery form restricted to that
    direction (same core join, disjoint id frames)."""
    from py_gtfs_duckdb_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_incremental,
    )

    docs = spark.createDataFrame(
        _containment_corpus(7), "doc_id string, text string"
    )
    # the short base docs are the "new batch": the planted hosts already
    # in the corpus quote them, so the gate direction (new contained in
    # corpus) fires
    new = docs.filter(F.substring("doc_id", 1, 1) == "d")
    corpus = docs.filter(F.substring("doc_id", 1, 1) != "d")
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    inc = containment_pairs_incremental(
        new, corpus, "text", "doc_id", threshold=0.8
    ).collect()
    assert inc, "planted hosts must contain new docs' shingles"
    for r in inc:
        assert r["id_a"] in new_ids and r["id_b"] not in new_ids
    full = containment_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    want = sorted(
        (r["id_a"], r["id_b"], r["containment"])
        for r in full
        if r["id_a"] in new_ids and r["id_b"] not in new_ids
    )
    got = sorted((r["id_a"], r["id_b"], r["containment"]) for r in inc)
    assert got == want


def test_golden_records_field_level_survivorship(spark):
    """The merged record may combine fields from DIFFERENT members
    (longest text from one row, max score from another); null fields
    never win 'longest'; min/max rules apply; unknown rules raise."""
    from py_gtfs_duckdb_spark.operators.dedup import golden_records

    rows = spark.createDataFrame(
        [
            # cluster 1: longest text on id 11, max score on id 12,
            # min id 10; id 13 has a NULL text that must not win
            (10, "short", 5, "src_b"),
            (11, "the longest text of all", 1, "src_c"),
            (12, "mid length", 9, "src_a"),
            (13, None, 7, "src_d"),
            # cluster 2: tie on text length -> larger id wins 'longest'
            (20, "aaaa", 2, "s"),
            (21, "bbbb", 2, "s"),
            # not clustered: must not appear
            (99, "zz", 0, "x"),
        ],
        "doc_id long, text string, score long, source string",
    )
    clusters = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (13, 1), (20, 2), (21, 2)],
        "id long, cluster_id long",
    )
    got = {
        r["cluster_id"]: r
        for r in golden_records(
            rows, clusters, "doc_id",
            rules={"text": "longest", "score": "max", "source": "min"},
        ).collect()
    }
    assert set(got) == {1, 2}
    c1 = got[1]
    assert (c1["n_members"], c1["canonical_id"]) == (4, 10)
    assert c1["text"] == "the longest text of all"
    assert c1["score"] == 9 and c1["source"] == "src_a"
    c2 = got[2]
    assert c2["text"] == "bbbb", "length tie breaks to the larger id"

    # all-null field stays null; 'shortest' picks the other extreme
    rows2 = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    cl2 = spark.createDataFrame([(1, 7), (2, 7)], "id long, cluster_id long")
    out = golden_records(rows2, cl2, "doc_id", rules={"text": "longest"}).collect()
    assert out[0]["text"] is None

    import pytest

    with pytest.raises(ValueError, match="unknown rule"):
        golden_records(rows, clusters, "doc_id", rules={"text": "median"})

    short = golden_records(
        rows, clusters, "doc_id", rules={"text": "shortest"}
    ).collect()
    by_c = {r["cluster_id"]: r["text"] for r in short}
    assert by_c[1] == "short" and by_c[2] == "aaaa"


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        members=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # cluster
                st.one_of(st.none(), st.text(alphabet="ab", max_size=5)),
                st.integers(min_value=-5, max_value=5),
            ),
            min_size=1,
            max_size=16,
        )
    )
    def test_golden_records_matches_python_model(spark, members):
        """Distributed survivorship == sequential reference on random
        clusters with null texts, ties, and negative scores."""
        from py_gtfs_duckdb_spark.operators.dedup import golden_records

        rows = [
            (i, c, t, s) for i, (c, t, s) in enumerate(members)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, cl long, text string, score long"
        )
        clusters = spark.createDataFrame(
            [(i, c) for i, (c, _, _) in enumerate(members)],
            "id long, cluster_id long",
        )
        got = {
            r["cluster_id"]: (
                r["n_members"], r["canonical_id"], r["text"], r["score"]
            )
            for r in golden_records(
                df, clusters, "doc_id",
                rules={"text": "longest", "score": "min"},
            ).collect()
        }
        want = {}
        for cid in {c for c, _, _ in members}:
            ms = [(i, t, s) for i, (c, t, s) in enumerate(members) if c == cid]
            texts = [(len(t), i, t) for i, t, _ in ms if t is not None]
            longest = max(texts)[2] if texts else None
            want[cid] = (
                len(ms),
                min(i for i, _, _ in ms),
                longest,
                min(s for _, _, s in ms),
            )
        assert got == want


def _py_slacked_ceil(value: float, size: int) -> int:
    """Python twin of operators.dedup.slacked_ceil (same constants)."""
    import math

    from py_gtfs_duckdb_spark.operators.dedup import SLACK_ABS, SLACK_PER_UNIT

    return math.ceil(value - (SLACK_PER_UNIT * size + SLACK_ABS))


def test_integer_predicate_equals_fraction_arithmetic(spark):
    """Hypothesis-style property (deterministic examples drawn wide): the
    float form of the verify predicate n >= slacked_ceil(t*(sa+sb)/(1+t))
    must agree with exact Fraction arithmetic n/(sa+sb-n) >= t for every
    reachable (n, sa, sb, t) — the size-scaled slack may never flip a
    decision at representable thresholds, INCLUDING combined sizes in the
    tens of millions where double rounding error (~2e-16 * size) exceeds
    the old fixed 1e-9 slack (ADVICE r12)."""
    import random
    from fractions import Fraction

    rng = random.Random(1234)
    thresholds = [
        Fraction(7, 10), Fraction(6, 10), Fraction(1, 2), Fraction(55, 100),
        Fraction(67, 100), Fraction(81, 100), Fraction(9, 10), Fraction(1, 3),
    ]
    checked = 0
    for t_frac in thresholds:
        t = float(t_frac.numerator) / float(t_frac.denominator)
        for _ in range(4000):
            sa = rng.randint(1, 100_000)
            sb = rng.randint(max(1, int(sa * t) - 2), int(sa / t) + 2)
            n = rng.randint(0, min(sa, sb))
            want = Fraction(n, sa + sb - n) >= t_frac if sa + sb - n else True
            got = n >= _py_slacked_ceil(t / (1 + t) * (sa + sb), sa + sb)
            assert got == want, (n, sa, sb, t_frac)
            checked += 1
    # boundary-exact cases: n exactly at the integer threshold, sweeping
    # BOTH small sizes and the large-size regime where fixed slack fails
    for t_frac in thresholds:
        t = float(t_frac.numerator) / float(t_frac.denominator)
        sizes = list(range(2, 4000)) + [
            rng.randint(1_000_000, 50_000_000) for _ in range(400)
        ]
        for s in sizes:
            # exact minimal n for J >= t at sa+sb = s: ceil(t*s/(1+t))
            exact = Fraction(t_frac * s, 1 + t_frac)
            n_exact = -(-exact.numerator // exact.denominator)
            for n in (n_exact - 1, n_exact):
                if not 0 <= n <= s:
                    continue
                want = Fraction(n, s - n) >= t_frac if s - n else True
                got = n >= _py_slacked_ceil(t / (1 + t) * s, s)
                assert got == want, (n, s, t_frac)
                checked += 1
    assert checked > 40_000


def test_scaled_slack_fixes_large_size_boundary_flip():
    """Pinned witness for ADVICE r12: at t=0.67, sa+sb=41,825,985 the
    exact boundary overlap n=16,780,485 satisfies J >= t by Fraction
    arithmetic, the OLD fixed-1e-9 form excludes it (double rounding
    error ~ 2e-16 * 4.2e7 > 1e-9 crosses the ceil), and the size-scaled
    form admits it. Found by sweeping exact-integer boundaries s = k *
    denominator(t/(1+t)) over s <= 6e7."""
    import math
    from fractions import Fraction

    t = 0.67
    s, n = 41_825_985, 16_780_485
    assert Fraction(n, s - n) >= Fraction(67, 100)
    old = n >= math.ceil(t / (1 + t) * s - 1e-9)
    new = n >= _py_slacked_ceil(t / (1 + t) * s, s)
    assert not old  # the bug this guards against
    assert new

    # the containment form (n >= ceil(sz_a * t)) at the same scale:
    # exact-integer boundary sz_a for t=0.67 are multiples of 100
    for sz_a in (41_825_900, 17_000_000, 4_000_000):
        m = sz_a * 67 // 100
        want = Fraction(m, sz_a) >= Fraction(67, 100)
        got = m >= _py_slacked_ceil(t * sz_a, sz_a)
        assert got == want, (sz_a, m)
