"""Late-round-10 operators beyond the DuckDB-oracle battery checks:
blocked fuzzy linkage (operators/linkage.py), tf-idf keyword extraction
(operators/lexical.py), and histogram drift statistics
(operators/pipeline.py) — differential-tested against obvious sequential
references on planted and random inputs."""

from __future__ import annotations

import math

import pytest

from py_gtfs_duckdb_spark.operators.linkage import (
    fuzzy_join_blocked,
    fuzzy_pairs,
)
from py_gtfs_duckdb_spark.operators.lexical import tfidf_keywords
from py_gtfs_duckdb_spark.operators.pipeline import histogram_drift

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


# ---------------------------------------------------------------------------
# fuzzy linkage
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    """Classic unit-cost DP — the ground truth both engines implement."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_pairs(names, k):
    uniq = sorted(set(n for n in names if n is not None))
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) <= k
    }


def test_fuzzy_pairs_planted(spark):
    """Typo variants within 2 edits pair up; unrelated names don't; a
    value repeated in the input emits no echo pair (distinct-first)."""
    df = spark.createDataFrame(
        [("red widget",), ("red widgit",), ("red widgets",),
         ("blue bolt",), ("blue bolt",), ("green lace",)],
        "name string",
    )
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(df, "name", max_dist=2).collect()
    }
    # name_a < name_b lexically ("red widgets" < "red widgit": 'e' < 'i')
    assert got == {
        ("red widgets", "red widgit", 2),
        ("red widget", "red widgets", 1),
        ("red widget", "red widgit", 1),
    }


def test_fuzzy_join_blocked_never_nested_loop(spark):
    """The blocking argument in plan form: the physical plan joins on the
    band id (hash join), never a BroadcastNestedLoopJoin or cartesian."""
    left = spark.createDataFrame([("abc",), ("abcd",)], "x string")
    right = spark.createDataFrame([("abce",), ("zzz",)], "y string")
    joined = fuzzy_join_blocked(left, right, "x", "y", max_dist=2)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_blocked_nulls_and_zero_dist(spark):
    """Nulls never match; max_dist=0 degenerates to an exact equi-match
    across sides (still via the band join)."""
    left = spark.createDataFrame([("abc",), (None,), ("",)], "x string")
    right = spark.createDataFrame([("abc",), (None,), ("",)], "y string")
    got = {
        (r["x"], r["y"], r["dist"])
        for r in fuzzy_join_blocked(left, right, "x", "y", 0).collect()
    }
    assert got == {("abc", "abc", 0), ("", "", 0)}


def test_fuzzy_join_rejects_same_column_name(spark):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError):
        fuzzy_join_blocked(df, df, "x", "x", 1)


if HAVE_HYPOTHESIS:
    _name_st = st.text(alphabet="abc", min_size=0, max_size=7)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        names=st.lists(_name_st, min_size=1, max_size=12),
        k=st.integers(min_value=0, max_value=3),
    )
    def test_fuzzy_pairs_matches_brute_force(spark, names, k):
        """Length-band blocking must be LOSSLESS (distance >= length gap)
        and emit each qualifying pair exactly once — checked against the
        O(n^2) reference on random short strings, including empty strings
        (negative band ids) and whole-input duplicates."""
        df = spark.createDataFrame([(n,) for n in names], "name string")
        rows = fuzzy_pairs(df, "name", max_dist=k).collect()
        got = [(r["name_a"], r["name_b"], r["dist"]) for r in rows]
        assert len(got) == len(set(got)), "pair emitted more than once"
        assert set(got) == _brute_pairs(names, k)


# ---------------------------------------------------------------------------
# tf-idf keywords
# ---------------------------------------------------------------------------


def _tfidf_model(texts, k):
    """Sequential reference with the operator's exact quantized math."""
    toks = [[w for w in t.split(" ") if w] for t in texts]
    n = len(toks)
    dfw: dict[str, int] = {}
    for ws in toks:
        for w in set(ws):
            dfw[w] = dfw.get(w, 0) + 1
    out = {}
    for doc_id, ws in enumerate(toks):
        scored = []
        for w in set(ws):
            q = math.floor(
                math.log((n + 1) / (dfw[w] + 1)) * 1e6 + 0.5
            ) + 1_000_000
            tf = ws.count(w)
            scored.append((-(tf * q), w, tf))
        scored.sort()
        for rank, (ns, w, tf) in enumerate(scored[:k], 1):
            score = math.floor((-ns) / 1e6 * 10000.0 + 0.5) / 10000.0
            out[(doc_id, rank)] = (w, tf, score)
    return out


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc beats a corpus-wide term at equal tf; the
    integer tie-break is the term string ascending."""
    docs = spark.createDataFrame(
        [
            (0, "common rare"),
            (1, "common common common"),
            (2, "common zebra"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    assert sorted(by_doc[0])[0] == (1, "rare")
    assert sorted(by_doc[2])[0] == (1, "zebra")
    # doc 1 has only one distinct term: exactly one row, rank 1
    assert sorted(by_doc[1]) == [(1, "common")]


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["cat", "dog", "fish", "x", "y", "zz"]),
                min_size=0,
                max_size=8,
            ).map(" ".join),
            min_size=1,
            max_size=8,
        ),
        k=st.integers(min_value=1, max_value=4),
    )
    def test_tfidf_matches_python_model(spark, texts, k):
        """Distributed integer-exact ranking == sequential reference,
        including empty docs (no rows), all-same-word corpora, and
        k larger than the distinct-term count."""
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
            for r in tfidf_keywords(docs, k=k).collect()
        }
        assert got == _tfidf_model(texts, k)


# ---------------------------------------------------------------------------
# histogram drift
# ---------------------------------------------------------------------------


def _drift_model(values_by_group, n_bins, lo, hi, smooth):
    """Sequential reference with the operator's exact arithmetic."""
    w = (hi - lo) / n_bins
    binned: dict[tuple[str, int], int] = {}
    for g, vals in values_by_group.items():
        for v in vals:
            b = min(max(math.floor((float(v) - lo) / w), 0), n_bins - 1)
            binned[(g, b)] = binned.get((g, b), 0) + 1
    groups = sorted(values_by_group)
    bins = sorted({b for (_, b) in binned})
    n_g = {g: sum(c for (gg, _), c in binned.items() if gg == g) for g in groups}
    n_all = sum(n_g.values())
    cb = {b: sum(c for (_, bb), c in binned.items() if bb == b) for b in bins}
    pad = smooth * n_bins
    out = {}
    for g in groups:
        nr = n_all - n_g[g]
        ccg = ccr = 0
        md = 0.0
        psi_q = 0
        for b in bins:
            cg = binned.get((g, b), 0)
            cr = cb[b] - cg
            ccg += cg
            ccr += cr
            md = max(md, abs(float(ccg) * float(nr) - float(ccr) * float(n_g[g])))
            pg = (cg + smooth) / (n_g[g] + pad)
            pr = (cr + smooth) / (nr + pad)
            psi_q += math.floor((pg - pr) * math.log(pg / pr) * 1e6 + 0.5)
        ks = (
            math.floor(md / (float(n_g[g]) * float(nr)) * 10000.0 + 0.5) / 10000.0
            if nr > 0
            else 0.0
        )
        psi = math.floor(psi_q / 1e6 * 10000.0 + 0.5) / 10000.0
        out[g] = (n_g[g], ks, psi)
    return out


def test_drift_identical_and_shifted_groups(spark):
    """A group drawn from the same bins as the rest scores near zero on
    both statistics; a group concentrated in a disjoint bin range scores
    KS near 1 and a large PSI."""
    rows = (
        [("same", v) for v in (1, 5, 9, 13)]
        + [("rest1", v) for v in (1, 5, 9, 13)]
        + [("shift", v) for v in (101, 105, 109, 113)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["ks"], r["psi"])
        for r in histogram_drift(
            df, "v", "g", n_bins=32, lo=0.0, hi=128.0
        ).collect()
    }
    want = _drift_model(
        {
            "same": [1, 5, 9, 13],
            "rest1": [1, 5, 9, 13],
            "shift": [101, 105, 109, 113],
        },
        32,
        0.0,
        128.0,
        0.5,
    )
    assert got == want
    assert got["shift"][1] > 0.9
    assert got["same"][1] < got["shift"][1]


def test_drift_single_group_rest_empty(spark):
    """With one group the 'rest' is empty: KS pins to 0.0 by definition
    (no comparison population) instead of dividing by zero."""
    df = spark.createDataFrame([("only", 3), ("only", 7)], "g string, v long")
    rows = histogram_drift(df, "v", "g", n_bins=8, lo=0.0, hi=16.0).collect()
    assert len(rows) == 1
    assert rows[0]["ks"] == 0.0


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.lists(st.integers(min_value=-5, max_value=140), min_size=1,
                     max_size=15),
            min_size=1,
            max_size=3,
        )
    )
    def test_drift_matches_python_model(spark, data):
        """Distributed fold == sequential reference on random groups,
        including out-of-range values (clamped to edge bins) and
        single-group inputs."""
        rows = [(g, v) for g, vals in data.items() for v in vals]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r["g"]: (r["n"], r["ks"], r["psi"])
            for r in histogram_drift(
                df, "v", "g", n_bins=16, lo=0.0, hi=128.0
            ).collect()
        }
        want = _drift_model(data, 16, 0.0, 128.0, 0.5)
        assert set(got) == set(want)
        for g in want:
            assert got[g][0] == want[g][0]
            assert abs(got[g][1] - want[g][1]) < 1e-9, (g, got[g], want[g])
            assert abs(got[g][2] - want[g][2]) < 1e-9, (g, got[g], want[g])
            assert 0.0 <= got[g][1] <= 1.0
