"""Pure-Python kernel profile of the dedup shingle front-end (no Spark):
times _shingle_doc as shipped vs a per-task-memoized variant on the real
sf0.1 documents corpus, and the per-doc minhash matmul vs a batched
reduceat formulation. Value-identity is asserted on every row. Guides the
§4.2 per-task-work decision before any operator edit."""

import hashlib
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_gtfs_duckdb_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    MINHASH_PERMS,
    _shingle_doc,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shingle_doc_memo(text, k, cache):
    md5 = hashlib.md5
    words = [w for w in (text or "").split(" ") if w]
    n = max(len(words) - (k - 1), 1)
    out = set()
    for i in range(n):
        s = " ".join(words[i : i + k])
        h = cache.get(s)
        if h is None:
            h = int.from_bytes(md5(s.encode("utf-8")).digest()[:6], "big")
            cache[s] = h
        out.add(h)
    return sorted(out)


def main() -> None:
    texts = (
        pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["text"])
        .column("text")
        .to_pylist()
    )
    print(f"{len(texts)} docs")

    # A: shipped form
    t0 = time.perf_counter()
    ref = [_shingle_doc(t, 3) for t in texts]
    t1 = time.perf_counter()
    # B: memoized form
    cache: dict = {}
    t2 = time.perf_counter()
    got = [shingle_doc_memo(t, 3, cache) for t in texts]
    t3 = time.perf_counter()
    assert got == ref, "memoized shingle values diverge"
    n_shingles = sum(len(r) for r in ref)
    print(
        f"shingle: shipped {t1 - t0:.3f}s  memo {t3 - t2:.3f}s "
        f"ratio {(t3 - t2) / (t1 - t0):.3f}  distinct-shingle cache={len(cache)} "
        f"total shingle occurrences~{n_shingles}"
    )

    # minhash: per-doc matmul vs batched reduceat
    a_vec = np.asarray([a for a, _ in MINHASH_PERMS], dtype=np.int64)
    b_vec = np.asarray([b for _, b in MINHASH_PERMS], dtype=np.int64)

    t0 = time.perf_counter()
    per_doc = []
    for hs in ref:
        h = np.asarray(hs, dtype=np.int64) % MINHASH_P
        mins = ((h[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P).min(axis=0)
        per_doc.append(mins)
    t1 = time.perf_counter()

    t2 = time.perf_counter()
    lens = np.fromiter((len(hs) for hs in ref), dtype=np.int64, count=len(ref))
    h_all = np.concatenate([np.asarray(hs, dtype=np.int64) for hs in ref]) % MINHASH_P
    mat = (h_all[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P
    starts = np.zeros(len(ref), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    batched = np.minimum.reduceat(mat, starts, axis=0)
    t3 = time.perf_counter()
    assert all((a == b).all() for a, b in zip(per_doc, batched)), "minhash diverges"
    print(
        f"minhash: per-doc {t1 - t0:.3f}s  reduceat {t3 - t2:.3f}s "
        f"ratio {(t3 - t2) / (t1 - t0):.3f}"
    )


if __name__ == "__main__":
    main()
