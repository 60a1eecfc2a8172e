"""Differential test of winnow_fingerprints against an independent
pure-Python winnow (Schleimer/Wilkerson/Aiken local fingerprinting,
re-implemented from the definition rather than from the operator's code):
random word-soup docs including every boundary length, plus the winnowing
guarantee on a planted shared run.
"""

from __future__ import annotations

import hashlib
import random

from py_gtfs_duckdb_spark.operators.text import (
    WINNOW_B,
    WINNOW_K,
    WINNOW_P,
    WINNOW_W,
    winnow_fingerprints,
)

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value", "a"]


def _py_winnow(text: str) -> set[int]:
    words = [w for w in text.split(" ") if w]
    hs = [
        int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % WINNOW_P
        for w in words
    ]
    kgrams = []
    for i in range(len(hs) - WINNOW_K + 1):
        kh = hs[i]
        for j in range(1, WINNOW_K):
            kh = (kh * WINNOW_B + hs[i + j]) % WINNOW_P
        kgrams.append(kh)
    if not kgrams:
        return set()
    # min of each sliding window of W k-grams; a doc with < W k-grams
    # contributes the single truncated window
    return {
        min(kgrams[s : s + WINNOW_W])
        for s in range(max(len(kgrams) - WINNOW_W + 1, 1))
    }


def test_matches_python_reference_on_random_docs(spark):
    rng = random.Random(0x51A)
    docs = []
    # every boundary length: 0 words, < K words, exactly K (one k-gram),
    # K..K+W-2 (truncated window), K+W-1 (first full window), and longer
    for i, n in enumerate(
        [0, 1, WINNOW_K - 1, WINNOW_K, WINNOW_K + 1, WINNOW_K + WINNOW_W - 2,
         WINNOW_K + WINNOW_W - 1]
        + [rng.randint(0, 120) for _ in range(60)]
    ):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _py_winnow(text), (doc_id, text)


def test_winnowing_guarantee_on_planted_run(spark):
    """Any shared run of >= K+W-1 words must share at least one
    fingerprint — the property that makes winnowed decontamination sound."""
    rng = random.Random(0xC0DE)
    run = " ".join(rng.choice(VOCAB) for _ in range(WINNOW_K + WINNOW_W - 1))
    noise_a = " ".join(rng.choice(VOCAB) for _ in range(30))
    noise_b = " ".join(rng.choice(VOCAB) for _ in range(25))
    df = spark.createDataFrame(
        [(1, f"{noise_a} {run}"), (2, f"{run} {noise_b}")],
        "doc_id long, text string",
    )
    fps: dict[int, set[int]] = {1: set(), 2: set()}
    for r in winnow_fingerprints(df).collect():
        fps[r["id"]].add(r["fp"])
    assert fps[1] & fps[2], "planted shared run produced no shared fingerprint"
