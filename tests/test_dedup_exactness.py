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
    return exact_jaccard(all_pairs, sets).filter(F.col("jaccard") >= threshold)


@pytest.mark.parametrize("seed", [7, 21, 1999])
def test_prefix_filter_join_equals_brute_force(spark, seed):
    from py_gtfs_duckdb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(_corpus(seed), "doc_id string, text string")
    threshold = 0.7
    got = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, "text", "doc_id").collect()
    )
    want = sorted(tuple(r) for r in _brute_force(spark, docs, threshold).collect())
    assert got == want
    assert want, "corpus must actually contain near-duplicate pairs"


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
