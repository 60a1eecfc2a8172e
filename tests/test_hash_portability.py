"""Property-based guards for the Python-side hash kernels.

The fused Arrow-batched dedup stages (dedup._shingle_doc, the minhash
permutations) must produce EXACTLY the values the DuckDB oracle SQL
computes — the fixed-corpus parity tests check one corpus; these check the
contract itself on adversarial inputs (unicode, repeated separators, empty
and sub-k documents). No SparkSession needed: the kernels are plain
functions, and that is the point — the portable value contract lives
below the engines.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from py_gtfs_duckdb_spark.operators.dedup import (
    MINHASH_P,
    MINHASH_PERMS,
    _shingle_doc,
)

# The exact shingle CTE from the n-gram/minhash oracle SQL (k=3). The
# coalesce matters: DuckDB's array_to_string over an empty slice is NULL
# (Spark's concat_ws is ''), so without it a wordless document diverges —
# found by the property test below, fixed in both oracle strings.
SHINGLE_SQL = """
WITH w AS (
    SELECT list_filter(string_split(?, ' '), x -> x <> '') AS ws
), sh AS (
    SELECT ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
    FROM (
        SELECT DISTINCT
               unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                       for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
        FROM w
    )
)
SELECT coalesce(list_sort(list(h)), []) FROM sh
"""


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(texts)
@settings(max_examples=150, deadline=None)
def test_shingle_doc_matches_duckdb(text):
    con = duckdb.connect()
    try:
        (want,) = con.execute(SHINGLE_SQL, [text]).fetchone()
        assert _shingle_doc(text, 3) == sorted(want)
    finally:
        con.close()


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 48) - 1), min_size=1, max_size=64
    )
)
@settings(max_examples=150, deadline=None)
def test_minhash_perm_math_is_exact(hs):
    """numpy int64 permutation mins == arbitrary-precision Python ints —
    i.e. no silent overflow anywhere in (h % P) * a + b over 48-bit h."""
    h = np.asarray(sorted(set(hs)), dtype=np.int64) % MINHASH_P
    a_vec = np.asarray([a for a, _ in MINHASH_PERMS], dtype=np.int64)
    b_vec = np.asarray([b for _, b in MINHASH_PERMS], dtype=np.int64)
    got = ((h[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P).min(axis=0)
    for i, (a, b) in enumerate(MINHASH_PERMS):
        want = min(((x % MINHASH_P) * a + b) % MINHASH_P for x in set(hs))
        assert int(got[i]) == want


def test_shingle_doc_edge_cases():
    # empty and whitespace-only docs produce the single empty-string shingle
    assert _shingle_doc(None, 3) == _shingle_doc("", 3) == _shingle_doc("   ", 3)
    assert len(_shingle_doc("", 3)) == 1
    # sub-k documents hash the whole text as one shingle
    assert len(_shingle_doc("one two", 3)) == 1
