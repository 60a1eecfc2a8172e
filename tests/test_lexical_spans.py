"""Round-5 corpus ops: sub-document span dedup (operators/text.py) and
BM25 lexical top-k (operators/lexical.py) — planted-topology behavior
beyond the DuckDB-oracle battery checks."""

from __future__ import annotations

import math

from py_gtfs_duckdb_spark.operators.lexical import bm25_topk
from py_gtfs_duckdb_spark.operators.text import dedup_spans, split_units


def test_dedup_spans_strips_planted_newline_boilerplate(spark):
    """The real-web mode: newline-delimited lines, a nav header and a
    footer shared by 3 of 4 docs get stripped; unique payloads survive
    in order; a doc that is ALL boilerplate survives with empty text."""
    header = "home about contact"
    footer = "copyright example"
    docs = spark.createDataFrame(
        [
            (1, f"{header}\npayload one alpha\n{footer}"),
            (2, f"{header}\npayload two beta\n{footer}"),
            (3, f"{header}\npayload three gamma\n{footer}"),
            (4, "completely standalone document"),
            (5, f"{header}\n{footer}\n{header}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_units"], r["n_dropped"])
        for r in dedup_spans(docs, unit_words=None, min_df=3).collect()
    }
    assert got[1] == ("payload one alpha", 3, 2)
    assert got[2] == ("payload two beta", 3, 2)
    assert got[3] == ("payload three gamma", 3, 2)
    assert got[4] == ("completely standalone document", 1, 0)
    assert got[5] == ("", 3, 3), "all-boilerplate doc survives, empty"


def test_dedup_spans_reassembles_in_original_order(spark):
    """Word-chunk mode: kept units must reappear in document order even
    when a dropped unit sits between them."""
    common = "x y z"
    docs = spark.createDataFrame(
        [
            (1, f"a b c {common} d e f"),
            (2, f"{common} k l m"),
            (3, f"n o p {common}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_spans(docs, unit_words=3, min_df=3).collect()
    }
    assert got[1] == "a b c d e f"
    assert got[2] == "k l m"
    assert got[3] == "n o p"


def test_split_units_line_mode_trims_and_drops_blanks(spark):
    docs = spark.createDataFrame(
        [(1, "  first line \n\n second \n")], "doc_id long, text string"
    )
    rows = sorted(
        (r["idx"], r["unit"]) for r in split_units(docs, unit_words=None).collect()
    )
    assert rows == [(0, "first line"), (1, "second")]


def test_bm25_ranks_term_dense_short_docs_first(spark):
    """A doc saturated with the query term outranks one mentioning it
    once; docs without any query term never appear; rank is dense 1..k;
    the top score matches the hand-computed Okapi formula."""
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark"),            # dense + short
            (2, "spark alpha beta gamma delta epsilon zeta eta"),
            (3, "alpha beta gamma delta"),              # no query term
            (4, "spark spark other words here"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(bm25_topk(docs, ["spark"], k=10).collect(), key=lambda r: r["rank"])
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids
    assert ids[0] == 1, "term-dense short doc wins"
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # hand-check doc 1: N=4, df=3, dl=4, avgdl=(4+8+4+5)/4=5.25, tf=4
    idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    denom = 4 + 1.2 * (0.25 + 0.75 * 4 / 5.25)
    expect = math.floor(idf * 4 * 2.2 / denom * 10000.0 + 0.5) / 10000.0
    assert abs(rows[0]["score"] - expect) < 1e-9


def test_bm25_multi_term_sums_and_breaks_ties_by_id(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat dog"), (3, "cat cat"), (4, "fish")],
        "doc_id long, text string",
    )
    rows = sorted(bm25_topk(docs, ["cat", "dog"], k=2).collect(), key=lambda r: r["rank"])
    # docs 1 and 2 are identical (both terms once): tie -> lower id first
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# differential property test: dedup_spans vs a pure-Python model
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

import pytest  # noqa: E402

# tiny vocabulary -> frequent cross-doc span collisions
_doc_texts = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


def _model(texts: list[str], w: int, min_df: int):
    units_by_doc = []
    for t in texts:
        words = [x for x in t.split(" ") if x]
        units_by_doc.append(
            [" ".join(words[i : i + w]) for i in range(0, len(words), w)]
        )
    from collections import Counter

    df = Counter()
    for units in units_by_doc:
        for u in set(units):
            df[u] += 1
    block = {u for u, n in df.items() if n >= min_df}
    out = {}
    for doc_id, units in enumerate(units_by_doc):
        kept = [u for u in units if u not in block]
        out[doc_id] = (" ".join(kept), len(units), len(units) - len(kept))
    return out


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_doc_texts, min_df=st.integers(min_value=2, max_value=3))
def test_dedup_spans_matches_python_model(spark, texts, min_df):
    """The distributed blocklist/reassembly plan must agree with the
    obvious sequential implementation on random small corpora — including
    empty docs, docs shorter than one unit, and fully-blocked docs."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_units"], r["n_dropped"])
        for r in dedup_spans(docs, unit_words=2, min_df=min_df).collect()
    }
    want = _model(texts, 2, min_df)
    # round 6 (advisor fix): docs with zero units (empty text) SURVIVE as
    # (doc_id, '', 0, 0) — totals anchor on the input frame
    assert got == want


def _bm25_model(texts, terms, k1=1.2, b=0.75):
    """Sequential reference scorer with the exact same float op order the
    Spark expression uses."""
    import math

    toks = [[w for w in t.split(" ") if w] for t in texts]
    n = len(toks)
    dls = [len(ws) for ws in toks]
    avgdl = sum(dls) / n
    dfs = [sum(1 for ws in toks if term in ws) for term in terms]
    out = {}
    for doc_id, ws in enumerate(toks):
        score = 0.0
        for i, term in enumerate(terms):
            tf = float(ws.count(term))
            if tf == 0 and dfs[i] == 0:
                pass  # idf defined but tf=0 contributes 0 anyway
            idf = math.log(1.0 + (n - dfs[i] + 0.5) / (dfs[i] + 0.5))
            denom = tf + k1 * ((1.0 - b) + b * dls[doc_id] / avgdl)
            score = score + idf * tf * (k1 + 1.0) / denom
        if any(term in ws for term in terms):
            out[doc_id] = math.floor(score * 10000.0 + 0.5) / 10000.0
    return out


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["cat", "dog", "fish", "bird", "x", "y"]),
            min_size=1,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    terms=st.lists(
        st.sampled_from(["cat", "dog", "fish"]), min_size=1, max_size=3, unique=True
    ),
)
def test_bm25_matches_python_model(spark, texts, terms):
    """The distributed conditional-agg pivot must agree with a sequential
    scorer on random small corpora — scores to 4 rounded digits, ranking
    by (score desc, doc_id) — including all-docs-match, no-doc-match, and
    zero-df terms."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, list(terms), k=100).collect()
    }
    want = _bm25_model(texts, list(terms))
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 2e-4, (d, got[d], want[d])
    # ranking follows (score desc, id asc)
    rows = sorted(
        bm25_topk(docs, list(terms), k=100).collect(), key=lambda r: r["rank"]
    )
    resorted = sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in resorted]


def test_bm25_empty_terms_fails_loudly(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="at least one query term"):
        bm25_topk(docs, [])


def test_unigram_nll_hand_computed(spark):
    """Corpus: 'a a a b'. ln-counts: a→ln3, b→ln1=0; total=4.
    doc1 = 'a a a': nll = (3·ln4 − 3·ln3)/3 = ln(4/3) ≈ 0.2877
    doc2 = 'b':     nll = (1·ln4 − 0)/1     = ln 4    ≈ 1.3863"""
    from py_gtfs_duckdb_spark.operators.lexical import unigram_nll

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["dl"], r["nll"]) for r in unigram_nll(docs).collect()}
    assert got[1] == (3, round(math.log(4 / 3), 4) + 0)  # 0.2877
    assert got[2] == (1, 1.3863)
    # the rare-token doc scores strictly higher (more surprising)
    assert got[2][1] > got[1][1]


def test_unigram_nll_external_model_and_oov(spark):
    """Scoring against a separately trained model: OOV tokens take
    q=0 (count-1 floor), so an all-OOV doc scores exactly ln(total)."""
    from py_gtfs_duckdb_spark.operators.lexical import unigram_model, unigram_nll

    ref = spark.createDataFrame(
        [(1, "x x x x x x x y y z")], "doc_id long, text string"
    )
    model = unigram_model(ref)  # total=10: x→7, y→2, z→1
    target = spark.createDataFrame(
        [(10, "x x"), (11, "unseen tokens here")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["nll"] for r in unigram_nll(target, model=model).collect()}
    assert got[10] == round(math.log(10 / 7), 4)  # common token, low surprise
    assert got[11] == round(math.log(10), 4), "all-OOV = ln(total)"
    assert got[11] > got[10]


def test_unigram_nll_empty_docs_absent(spark):
    from py_gtfs_duckdb_spark.operators.lexical import unigram_nll

    docs = spark.createDataFrame(
        [(1, "w w"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = unigram_nll(docs).collect()
    assert [r["doc_id"] for r in out] == [1], "token-less docs emit no row"


def test_source_ngram_overlap_planted_topology(spark):
    """Sources A and B share exactly one 5-gram (a 6-word common span =
    two 5-grams? no: 'c1..c5' planted once each plus distinct tails);
    source C is disjoint and must not appear in any pair."""
    from py_gtfs_duckdb_spark.operators.text import source_ngram_overlap

    common = "one two three four five"  # exactly one shared 5-gram
    docs = spark.createDataFrame(
        [
            (1, "A", f"{common} tailA wordsA hereA extraA"),
            (2, "B", f"{common} tailB wordsB hereB extraB"),
            (3, "C", "totally different words with no five gram overlap"),
        ],
        "doc_id long, source string, text string",
    )
    out = source_ngram_overlap(docs, n=5).collect()
    assert len(out) == 1
    r = out[0]
    # each doc has 9 words -> 5 distinct 5-grams; exactly 1 shared
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 5, 5)
    assert r["jaccard"] == round(1 / 9, 4)


def test_vocab_spectrum_hand_computed(spark):
    """'a'×5, 'b'×2, 'c'×1, 'd'×1 → band 2: {a} mass 5; band 1: {b}
    mass 2; band 0: {c, d} (the hapax row) mass 2."""
    from py_gtfs_duckdb_spark.operators.lexical import vocab_spectrum

    docs = spark.createDataFrame(
        [(1, "a a a b c"), (2, "a a b d")], "doc_id long, text string"
    )
    got = {
        r["band"]: (r["n_types"], r["token_mass"])
        for r in vocab_spectrum(docs).collect()
    }
    assert got == {2: (1, 5), 1: (1, 2), 0: (2, 2)}


def test_dedup_spans_keeps_zero_unit_documents(spark):
    """Advisor finding (round 5): a document whose text is empty or
    whitespace-only yields ZERO units and must still appear in the output
    as (doc_id, '', 0, 0) — totals anchor on the input frame, not the
    exploded units frame."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_units"], r["n_dropped"])
        for r in dedup_spans(df, unit_words=3, min_df=2).collect()
    }
    assert set(got) == {1, 2, 3}, "every input document survives"
    assert got[2] == ("", 0, 0)
    assert got[3] == ("", 0, 0)
    assert got[1] == ("alpha beta gamma", 1, 0)


def test_bigram_nll_hand_computed(spark):
    """Corpus bigrams: doc1 'a b a b' -> (a b), (b a), (a b);
    doc2 'a b c' -> (a b), (b c).
    Counts: c2(a b)=3, c2(b a)=1, c2(b c)=1; contexts: c1(a)=3, c1(b)=2.
    Per-occurrence NLL = ln c1(w1) - ln c2(w1 w2):
      (a b): ln3 - ln3 = 0          (the only continuation of a)
      (b a): ln2 - 0   = ln2
      (b c): ln2 - 0   = ln2
    doc1: (0 + ln2 + 0)/3 = 0.2310;  doc2: (0 + ln2)/2 = 0.3466."""
    from py_gtfs_duckdb_spark.operators.lexical import bigram_nll

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["dl2"], r["nll"]) for r in bigram_nll(docs).collect()}
    assert got[1] == (3, round(math.log(2) / 3, 4))
    assert got[2] == (2, round(math.log(2) / 2, 4))


def test_bigram_nll_short_docs_absent_and_repetition_scores_low(spark):
    """Docs with <2 words emit no row; a doc repeating the corpus's
    dominant transition scores strictly lower (more probable) than one
    whose transitions each occur once out of a shared context.
    Counts: c2(x a)=3, c2(a x)=2, c2(x b)=c2(x c)=c2(x d)=1,
    c2(b x)=c2(c x)=1; contexts c1(x)=6, c1(a)=2, c1(b)=c1(c)=1.
    doc1 = [3·(ln6−ln3) + 2·0]/5 = 3·ln2/5; doc2 = 3·ln6/5."""
    from py_gtfs_duckdb_spark.operators.lexical import bigram_nll

    docs = spark.createDataFrame(
        [
            (1, "x a x a x a"),
            (2, "x b x c x d"),
            (3, "single"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["nll"] for r in bigram_nll(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1] == round(3 * math.log(2) / 5, 4)
    assert got[2] == round(3 * math.log(6) / 5, 4)
    assert got[1] < got[2]
