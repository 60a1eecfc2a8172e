"""Quantized, differentially-checkable ANN variants.

The float ANN tier (``operators/similarity.py``) is the production
default; this module is the VERIFICATION tier: every index-construction
step — LSH bucketing, Lloyd k-means training, PQ codebook training,
encoding, ADC scoring — runs in exact 64-bit INTEGER arithmetic over
vectors quantized to ``round(x * 10^4)``. Integer sums are associative
and engine-portable, so the entire index build replays bit-for-bit in a
DuckDB SQL oracle (``plans/ann_oracles.py`` generates the replay), which
is what lets the driver hash-check approximate indexes end-to-end —
normally the un-checkable part of an ANN stack.

What quantization changes: centroids/codes derive from 4-decimal
versions of the vectors, a perturbation far below the noise floor of
k-means seeding; recall contracts (tests/test_similarity.py) hold for
these variants exactly as for the float tier. What it does NOT change:
the final candidate scoring is the same exact-cosine path every other
similarity operator uses (``batch_cosine_scores`` — dimension-sequential
FP, proven parity-stable since round 3).

Scale shapes match the float tier one-for-one: corpus scanned once and
never shuffled (assignment/encode are narrow Arrow passes with the
codebook in the task closure), integer partial sums are map-side
combinable (k-means update is a groupBy over n_centroids x dim tiny
rows), and only (id, id, score) rows shuffle for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from py_gtfs_duckdb_spark.operators.similarity import (
    _topk,
    _vstack64,
    batch_cosine_scores,
    ivf_topk,
)

#: fixed-point scale: 4 decimals — matches the battery's pround contract
Q_SCALE = 10_000


def quantize_mat(mat):
    """float64 (n, dim) -> int64 via floor(x*10^4 + 0.5) — the exact IEEE
    op sequence of SQL ``CAST(floor(x * 10000.0 + 0.5) AS BIGINT)``."""
    import numpy as np

    return np.floor(mat * float(Q_SCALE) + 0.5).astype(np.int64)


def seq_normalize(mat):
    """Row-normalize with DIMENSION-SEQUENTIAL norm accumulation so the
    norms are bit-identical to SQL ``sqrt(list_dot_product(v, v))``
    (np.linalg.norm uses BLAS, which reassociates). Zero rows pass
    through unscaled."""
    import numpy as np

    n, dim = mat.shape
    acc = np.zeros(n)
    for i in range(dim):
        x = mat[:, i]
        acc = acc + x * x
    nrm = np.sqrt(acc)
    nrm[nrm == 0.0] = 1.0
    return mat / nrm[:, None]


# ---------------------------------------------------------------------------
# LSH with integer hyperplanes
# ---------------------------------------------------------------------------

LSH_SEED = 42
LSH_PLANE_LO, LSH_PLANE_HI = -4, 5  # randint range [lo, hi)


def lsh_planes(n_planes: int, dim: int, seed: int = LSH_SEED):
    """Deterministic small-integer hyperplanes (entries in [-4, 4]): the
    sign of an integer dot product against a quantized vector is exact on
    every engine, unlike a float projection whose sign can flip with
    summation order. The matrix is tiny reference data — shipped in task
    closures AND embedded as literals in the SQL oracle."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(LSH_PLANE_LO, LSH_PLANE_HI, size=(n_planes, dim)).astype(
        np.int64
    )


def add_lsh_bucket_q(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int,
) -> DataFrame:
    """Append an integer LSH bucket id = sign pattern of the n_planes
    integer-plane projections of the QUANTIZED vector. Narrow Arrow pass;
    exact integer math (|dot| <= dim * |q| * 4 << 2^63)."""
    import pandas as pd

    planes = lsh_planes(n_planes, dim)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bucket int"

    def assign(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=pd.Series([], dtype="int32"))
                continue
            q = quantize_mat(_vstack64(pdf[vec_col]))
            signs = (q @ planes.T) > 0
            bucket = np.zeros(len(pdf), dtype="int64")
            for i in range(n_planes):
                bucket |= signs[:, i].astype("int64") << i
            yield pdf.assign(bucket=bucket.astype("int32"))

    return df.mapInPandas(assign, schema=out_schema)


def lsh_topk_q(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate top-k, fully oracle-replayable: integer
    buckets (exact), multiprobe at Hamming distance <= 1, exact-cosine
    scoring inside matching buckets only. Same plan shape as the float
    ``lsh_bucketed_topk``: corpus scanned once, probe set broadcast, only
    (id, id, score) rows shuffle."""
    c = add_lsh_bucket_q(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        dim,
        n_planes,
    )
    q = add_lsh_bucket_q(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
        dim,
        n_planes,
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
            for i in range(n_planes)
        ],
    )
    q = q.select("query_id", "q_vec", F.explode(probes).alias("bucket"))
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = batch_cosine_scores(
        pairs, "q_vec", "c_vec", ["query_id", "vec_id"]
    ).dropDuplicates(["query_id", "vec_id"])
    return _topk(scored, k)


# ---------------------------------------------------------------------------
# Lloyd-refined IVF on quantized vectors
# ---------------------------------------------------------------------------


def _quantized_src(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, qv array<bigint>) — per-dim fixed-point quantization as a
    relational expression (whole-stage codegen, no Python)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(float(Q_SCALE)) + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )


def ivf_train_lloyd_q(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Lloyd k-means over QUANTIZED vectors — every step exact integer
    arithmetic, so training replays bit-for-bit in SQL:

    - seeds: the md5-ordered first ``n_centroids`` quantized vectors;
    - assign: argmin integer squared distance, ties to the smaller cid;
    - update: per-dim ``floor(sum / count)`` (sum is an exact BIGINT
      aggregation — order-independent, unlike a float mean);
    - empty cells keep their previous centroid.

    Returns (cid, cv double list, cnrm) rows for :func:`similarity.ivf_topk`
    with ``cv = c / 10^4`` and the norm accumulated dimension-sequentially
    (matching SQL ``sqrt(list_dot_product(cv, cv))``).

    Scale shape per iteration: one narrow assignment pass (integer
    centroid matrix in the closure), then an exact-integer groupBy over
    n_centroids x dim (cell, pos, sum) rows — map-side combined, corpus
    never shuffled. The driver-side collect is n_centroids x dim rows,
    independent of corpus size."""
    from collections import namedtuple

    import numpy as np

    # cq = the exact integer centroid (the training-domain artifact);
    # cv/cnrm = its float serving form for similarity._assign_cells.
    Cent = namedtuple("Cent", ["cid", "cv", "cnrm", "cq"])

    src = _quantized_src(corpus, id_col, vec_col).cache()
    try:
        seed_rows = (
            src.orderBy(F.md5(F.col("_id").cast("string")), "_id")
            .limit(n_centroids)
            .collect()
        )
        cids = [int(r._id) for r in seed_rows]
        cent = {int(r._id): np.asarray(r.qv, dtype=np.int64) for r in seed_rows}
        dim = len(seed_rows[0].qv)

        for _ in range(n_iter):
            order = sorted(cids)
            cmat = np.stack([cent[c] for c in order])  # (m, dim) int64
            cid_arr = np.asarray(order, dtype=np.int64)

            def assign(batches, cmat=cmat, cid_arr=cid_arr):
                import pandas as pd

                for pdf in batches:
                    if len(pdf) == 0:
                        yield pd.DataFrame({"cell": [], "pos": [], "s": [], "n": []})
                        continue
                    q = np.stack(
                        pdf["qv"].map(lambda v: np.asarray(v, dtype=np.int64))
                    )  # (n, dim)
                    # exact integer squared distance; argmin first
                    # occurrence == smallest cid (cmat rows cid-ascending)
                    d2 = (
                        (q[:, None, :].astype(np.int64) - cmat[None, :, :]) ** 2
                    ).sum(axis=2)
                    cells = cid_arr[np.argmin(d2, axis=1)]
                    # per-partition partial integer sums per (cell, pos)
                    out = {}
                    for cell in np.unique(cells):
                        mask = cells == cell
                        s = q[mask].sum(axis=0)
                        out[int(cell)] = (int(mask.sum()), s)
                    rows = [
                        (cell, pos, int(s[pos]), cnt)
                        for cell, (cnt, s) in out.items()
                        for pos in range(q.shape[1])
                    ]
                    yield pd.DataFrame(
                        rows, columns=["cell", "pos", "s", "n"]
                    )

            partial_schema = "cell long, pos long, s long, n long"
            combined = (
                src.mapInPandas(assign, schema=partial_schema)
                .groupBy("cell", "pos")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            sums: dict[int, np.ndarray] = {}
            counts: dict[int, int] = {}
            for r in combined:
                arr = sums.setdefault(int(r.cell), np.zeros(dim, dtype=np.int64))
                arr[int(r.pos)] = int(r.s)
                counts[int(r.cell)] = int(r.n)
            for cid in cids:
                if cid in sums and counts[cid] > 0:
                    # floor(s / n) via double division: exact for
                    # |s| < 2^53 and bit-identical to SQL floor(s / n)
                    cent[cid] = np.floor(
                        sums[cid] / float(counts[cid])
                    ).astype(np.int64)
    finally:
        src.unpersist()

    out = []
    for cid in cids:
        cv = [float(x) / Q_SCALE for x in cent[cid]]
        acc = 0.0
        for x in cv:  # sequential — mirrors SQL list_dot_product
            acc += x * x
        out.append(Cent(cid, cv, acc**0.5, [int(x) for x in cent[cid]]))
    return out


def ivf_lloyd_topk_q(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_iter: int = 2,
    nprobe: int = 4,
    centroids: list | None = None,
) -> DataFrame:
    """IVF serving over quantized-Lloyd centroids — the exact serving plan
    of :func:`similarity.ivf_topk`, with a differentially-checkable train
    step in front."""
    cent = centroids if centroids is not None else ivf_train_lloyd_q(
        corpus, n_centroids, n_iter
    )
    return ivf_topk(corpus, queries, k=k, nprobe=nprobe, centroids=cent)


# ---------------------------------------------------------------------------
# Product quantization on quantized vectors
# ---------------------------------------------------------------------------


def pq_train_q(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
) -> dict:
    """PQ codebook over NORMALIZED-then-QUANTIZED vectors, trained with
    integer-exact k-means (same rules as :func:`ivf_train_lloyd_q`:
    argmin ties to the smaller centroid index, floor-div means, empty
    cells keep their centroid). Training reads the md5-ordered
    ``sample_size`` sample to the driver — standard PQ practice (FAISS
    trains on a sample), bounded and corpus-size-independent. Returns
    {"m", "dsub", "ksub", "codebooks": (m, ksub, dsub) int lists}."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(sample_size)
        .collect()
    )
    mat = np.asarray([r.v for r in rows], dtype=np.float64)
    qmat = quantize_mat(seq_normalize(mat))  # (n, dim) int64
    n, dim = qmat.shape
    if dim % m != 0:
        raise ValueError(f"pq_train_q: dim {dim} not divisible by m {m}")
    dsub = dim // m
    if n < ksub:
        raise ValueError(f"pq_train_q: sample {n} smaller than ksub {ksub}")
    codebooks = []
    for s in range(m):
        sub = qmat[:, s * dsub : (s + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> smaller index
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = np.floor(
                        sub[mask].sum(axis=0) / float(mask.sum())
                    ).astype(np.int64)
        codebooks.append([[int(x) for x in row] for row in cent])
    return {"m": m, "dsub": dsub, "ksub": ksub, "codebooks": codebooks}


def pq_encode_q(
    corpus: DataFrame,
    codebook: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<smallint>) — integer-exact nearest sub-centroid
    per subspace over the normalized-quantized vector. One narrow Arrow
    pass; the corpus is scanned once and never shuffled."""
    import numpy as np

    cb = np.asarray(codebook["codebooks"], dtype=np.int64)  # (m, ksub, dsub)
    m, _ksub, dsub = cb.shape
    schema = T.StructType(
        [
            corpus.select(F.col(id_col).alias("vec_id")).schema["vec_id"],
            T.StructField("codes", T.ArrayType(T.ShortType())),
        ]
    )
    src = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "codes": []})
                continue
            qmat = quantize_mat(seq_normalize(_vstack64(pdf["v"])))
            codes = np.empty((len(pdf), m), dtype=np.int16)
            for s in range(m):
                sub = qmat[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.tolist())}
            )

    return src.mapInPandas(run, schema=schema)


def _query_luts(queries: DataFrame, codebook: dict, id_col: str, vec_col: str):
    """{query_id: (m, ksub) int64 LUT of exact integer partial squared
    distances} — per query, m x ksub ints, rides in the task closure."""
    import numpy as np

    cb = np.asarray(codebook["codebooks"], dtype=np.int64)
    m, _ksub, dsub = cb.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).collect()
    qids = [r.query_id for r in q_rows]
    qmat = quantize_mat(
        seq_normalize(np.asarray([r.v for r in q_rows], dtype=np.float64))
    )
    luts = np.empty((len(qids), m, cb.shape[1]), dtype=np.int64)
    for s in range(m):
        qsub = qmat[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = ((qsub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
    return {qid: luts[i] for i, qid in enumerate(qids)}, qids


def pq_adc_shortlist_q(
    codes_df: DataFrame,
    queries: DataFrame,
    codebook: dict,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, dist bigint, rank) — ADC over PQ codes with
    EXACT integer distances (sum of m integer LUT lookups; ties by
    vec_id). The compressed-domain scan: corpus vectors untouched."""
    import numpy as np

    lut_by_qid, qids = _query_luts(queries, codebook, id_col, vec_col)
    m = codebook["m"]
    qid_arr = np.asarray(qids)

    src = codes_df.select("vec_id", "codes")
    schema = T.StructType(
        [
            src.schema["vec_id"],
            T.StructField("query_id", src.schema["vec_id"].dataType),
            T.StructField("dist", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        luts = np.stack([lut_by_qid[q] for q in qids])  # (nq, m, ksub)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "query_id": [], "dist": []})
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            n = len(pdf)
            dists = np.zeros((n, len(qids)), dtype=np.int64)
            for s in range(m):
                dists += luts[:, s, :][:, codes[:, s]].T
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), len(qids)),
                    "query_id": np.tile(qid_arr, n),
                    "dist": dists.ravel(),
                }
            )

    scored = src.mapInPandas(run, schema=schema).filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = W.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "dist", F.col("rank").cast("bigint").alias("rank")
        )
    )


def pq_topk_rerank_q(
    codes_df: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebook: dict,
    k: int = 5,
    shortlist_mult: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production PQ serving with a checkable index: integer-exact ADC
    shortlist (k * mult candidates), exact-cosine re-rank of the
    shortlist only. Returns (query_id, vec_id, cosine, rank)."""
    shortlist = pq_adc_shortlist_q(
        codes_df, queries, codebook, k=k * shortlist_mult, id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "vec_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    pairs = shortlist.join(F.broadcast(q), "query_id").join(c, "vec_id")
    scored = batch_cosine_scores(pairs, "q_vec", "c_vec", ["query_id", "vec_id"])
    return _topk(scored, k)


def ivfpq_topk_q(
    codes_df: DataFrame,
    cells_df: DataFrame,
    queries: DataFrame,
    codebook: dict,
    centroids: list,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ with integer-exact ADC: the coarse IVF quantizer (rounded-
    cosine probes, same as similarity.ivfpq_topk) restricts each query to
    nprobe cells; candidates inside are scored by exact integer ADC.
    Returns (query_id, vec_id, dist bigint, rank) ascending."""
    import numpy as np

    from py_gtfs_duckdb_spark.operators.similarity import _assign_cells

    lut_by_qid, _qids = _query_luts(queries, codebook, id_col, vec_col)
    m = codebook["m"]

    probes = _assign_cells(
        queries, centroids, id_col, vec_col, "query_id", "__qv", nprobe
    ).select("query_id", "cell")
    cand = (
        codes_df.join(cells_df, "vec_id")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "codes")
    )
    schema = T.StructType(
        [
            cand.schema["query_id"],
            cand.schema["vec_id"],
            T.StructField("dist", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": [], "vec_id": [], "dist": []})
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            dists = np.empty(len(pdf), dtype=np.int64)
            for qid in pdf["query_id"].unique():
                idx = np.flatnonzero((pdf["query_id"] == qid).to_numpy())
                lut = lut_by_qid[qid]
                sub = codes[idx]
                acc = np.zeros(len(idx), dtype=np.int64)
                for s in range(m):
                    acc += lut[s, sub[:, s]]
                dists[idx] = acc
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "vec_id": pdf["vec_id"],
                    "dist": dists,
                }
            )

    scored = cand.mapInPandas(run, schema=schema)
    w = W.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "dist", F.col("rank").cast("bigint").alias("rank")
        )
    )


def ivf_cell_profile(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, n_vectors, inertia): per-cell occupancy and EXACT integer
    inertia (sum of squared quantized distances to the cell centroid) —
    the index-quality audit behind retrain/re-shard decisions: a cell
    with outsized occupancy is a probe-time hotspot, rising inertia
    means the centroids have drifted off the corpus distribution.
    ``centroids`` must come from :func:`ivf_train_lloyd_q` (the ``cq``
    integer form is the distance domain). Empty cells surface with
    (0, 0) — an empty cell is exactly what the audit must show.

    Scale shape: one narrow assignment pass (integer centroid matrix in
    the closure) emitting per-BATCH partial (cell, count, inertia) rows
    — at most n_centroids per batch — combined by a groupBy over tiny
    rows. Exact BIGINT throughout, so the whole audit replays in the SQL
    oracle."""
    import numpy as np

    order = sorted(int(c.cid) for c in centroids)
    by_cid = {int(c.cid): c for c in centroids}
    cmat = np.stack(
        [np.asarray(by_cid[c].cq, dtype=np.int64) for c in order]
    )
    cid_arr = np.asarray(order, dtype=np.int64)

    src = _quantized_src(corpus, id_col, vec_col)

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"cid": [], "n": [], "inertia": []})
                continue
            q = np.stack(pdf["qv"].map(lambda v: np.asarray(v, dtype=np.int64)))
            d2 = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d2, axis=1)  # ties -> smaller cid (cid-sorted)
            rows = []
            for k in np.unique(best):
                mask = best == k
                rows.append(
                    (int(cid_arr[k]), int(mask.sum()), int(d2[mask, k].sum()))
                )
            yield pd.DataFrame(rows, columns=["cid", "n", "inertia"])

    combined = (
        src.mapInPandas(partials, schema="cid long, n long, inertia long")
        .groupBy("cid")
        .agg(
            F.sum("n").cast("bigint").alias("n_vectors"),
            F.sum("inertia").cast("bigint").alias("inertia"),
        )
    )
    spark = corpus.sparkSession
    all_cells = spark.createDataFrame([(c,) for c in order], "cid long")
    return (
        all_cells.join(combined, "cid", "left")
        .select(
            "cid",
            F.coalesce("n_vectors", F.lit(0).cast("bigint")).alias("n_vectors"),
            F.coalesce("inertia", F.lit(0).cast("bigint")).alias("inertia"),
        )
    )


def embedding_audit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(dim, n_vecs, mean, var, min_val, max_val): per-dimension moment
    audit of an embedding column — the pre-index sanity check an ANN
    build should gate on: a dead dimension (var ~ 0) wastes index
    capacity, a runaway one (|mean| or var off-scale) dominates every
    distance and usually means a bad normalization upstream.

    Determinism: moments accumulate over the fixed-point quantized values
    (exact BIGINT sums — order-independent, engine-portable; sum-of-
    squares stays in int64 for |x| <= 0.5-ish embeddings up to ~10^11
    rows); the only float math is one fixed-order epilogue per output
    row. min/max are order-free by definition.

    Scale shape: one narrow quantize + posexplode pass, then a single
    hash aggregation keyed by dim — map-side combine reduces every
    partition to `dim` rows before the only shuffle."""
    from py_gtfs_duckdb_spark.functions import pround

    cells = _quantized_src(corpus, id_col, vec_col).select(
        F.posexplode("qv").alias("dim", "q")
    )
    s = F.sum("q").cast("bigint")
    ss = F.sum(F.col("q") * F.col("q")).cast("bigint")
    n = F.count(F.lit(1)).cast("bigint")
    scale = F.lit(float(Q_SCALE))
    return cells.groupBy("dim").agg(
        n.alias("n_vecs"),
        pround(s / (n * scale), 6).alias("mean"),
        pround(
            (ss / n - (s / n) * (s / n)) / (scale * scale), 6
        ).alias("var"),
        pround(F.min("q") / scale, 4).alias("min_val"),
        pround(F.max("q") / scale, 4).alias("max_val"),
    )
