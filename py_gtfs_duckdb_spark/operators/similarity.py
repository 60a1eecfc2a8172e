"""Similarity search over embedding columns (``array<float>``).

Three tiers, same contract (query_id, vec_id, cosine, rank):

- ``cosine_topk`` — brute force: broadcast the (small) query set, scan the
  corpus once, score pairs vectorized. Exact; the right shape whenever
  |queries| * |corpus| work fits the cluster (corpus is scanned once, never
  shuffled — only the tiny (query, candidate) pairs shuffle for top-k).
- ``ivf_topk`` — IVF cells from deterministic seed centroids; queries probe
  only their nearest cells. The corpus pass is narrow (no shuffle).
- ``lsh_bucketed_topk`` — random-hyperplane LSH buckets, exact cosine only
  within matching buckets (multi-probe at Hamming distance ≤ 1).
  Approximate; recall tested against brute force in tests/test_similarity.py.

Dense vector math runs VECTORIZED over Arrow batches (mapInPandas + numpy)
— the sanctioned Python path for linear algebra. Three formulations were
measured on the way here:

- higher-order functions (``zip_with``+``aggregate``): interpreted
  (CodegenFallback, no CSE) — per-element lambda allocation on every row;
- unrolled per-element expressions (64-term ``get()`` chains): thousands of
  py4j calls at plan-build (10+ s driver time) or, as one big ``F.expr``,
  seconds of analyzer/codegen time per query — fixed costs that scale with
  dim, not rows;
- numpy over Arrow batches: microseconds per thousand rows, constant plan
  size. This is the only shape that survives both a 64-dim toy and a
  100 TB corpus.

ORACLE-EXACT FLOATING POINT: every accumulation below iterates the vector
DIMENSION sequentially (``acc = acc + x_i * y_i``), so each element sees
exactly the IEEE op sequence of SQL's left-fold ``list_dot_product`` /
``aggregate`` — one rounded multiply, one rounded add per step, in index
order — making results bit-identical to the DuckDB oracle. Do NOT replace
the loops with ``np.dot``/``@`` (BLAS reassociates the sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from py_gtfs_duckdb_spark.functions import pround


def _dot(a, b):
    """Dot product of two array columns, double math, relational form
    (interpreted HOF — fine off the hot path; hot paths use the batch
    scorer below)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    """L2 norm of an array column, double math, relational form."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(a, b):
    """Cosine similarity between two array<float> columns, double math."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _seq_cosine(qm, cm, scale: float | None = 1e4):
    """Rounded cosine rows for two (n, dim) float64 matrices with the
    oracle's exact IEEE op order (see module docstring). ``scale=None``
    skips rounding."""
    import numpy as np

    n, dim = qm.shape
    dot = np.zeros(n)
    qn = np.zeros(n)
    cn = np.zeros(n)
    for i in range(dim):
        qi = qm[:, i]
        ci = cm[:, i]
        dot = dot + qi * ci
        qn = qn + qi * qi
        cn = cn + ci * ci
    cos = dot / (np.sqrt(qn) * np.sqrt(cn))
    if scale is None:
        return cos
    return np.floor(cos * scale + 0.5) / scale


def _vstack64(series):
    import numpy as np

    return np.vstack(series.map(lambda v: np.asarray(v, dtype=np.float64)))


def batch_cosine_scores(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    keep_cols: list[str],
    round_digits: int = 4,
    out_col: str = "cosine",
) -> DataFrame:
    """(keep_cols..., cosine) from a DataFrame of vector pairs — the
    vectorized scoring kernel shared by every similarity operator. Narrow
    (mapInPandas, no shuffle); emits only ids + score, so whatever shuffle
    follows (top-k, threshold filter) moves no vectors."""
    fields = [pairs.schema[c] for c in keep_cols]
    schema = T.StructType(fields + [T.StructField(out_col, T.DoubleType())])
    scale = float(10**round_digits)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[keep_cols].assign(**{out_col: pd.Series([], dtype="float64")})
                continue
            cos = _seq_cosine(_vstack64(pdf[a_col]), _vstack64(pdf[b_col]), scale)
            yield pdf[keep_cols].assign(**{out_col: cos})

    return pairs.mapInPandas(run, schema=schema)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self-matches).

    Returns (query_id, vec_id, cosine, rank). Ties broken by vec_id so the
    result is deterministic and oracle-comparable. Plan shape: broadcast
    the query side, scan the corpus once (never shuffled), batch-score the
    pairs, shuffle only (query_id, vec_id, cosine) for the windowed top-k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.join(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = batch_cosine_scores(
        pairs, "q_vec", "c_vec", ["query_id", "vec_id"], round_digits
    )
    return _topk(scored, k)


# -- IVF (inverted-file) path ------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Collect the deterministic seed centroid rows (cid, cv, cnrm) —
    the 'train' step. Centroids are reference data: compute once per
    corpus version, reuse across every query batch (callers pass the
    result to :func:`ivf_topk` via ``centroids=``)."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(n_centroids)
        # norm AFTER the limit: n_centroids rows pay the interpreted HOF,
        # not the whole corpus.
        .select("cid", "cv", _norm(F.col("cv")).alias("cnrm"))
        .collect()
    )


def ivf_train_lloyd(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_centroids: list | None = None,
    max_driver_elems: int = 1 << 22,
) -> list:
    """Lloyd-iterated IVF centroids: refine the deterministic seeds with
    ``n_iter`` k-means steps (assign → per-cell mean). Returns centroid
    rows in the same (cid, cv, cnrm) shape :func:`ivf_topk` consumes, so
    training composes with serving: ``ivf_topk(..., centroids=trained)``.

    Scale shape per iteration: ONE narrow assignment pass (centroid matrix
    in the closure, same kernel as serving), then per-PARTITION partial
    (cell, count, component-sums) rows — at most n_centroids rows per
    partition regardless of corpus size — combined by a groupBy over
    n_centroids*dim tiny rows. The corpus is never shuffled and the full
    (row, component) explode never materializes; this is the treeAggregate
    shape expressed relationally. Empty cells keep their previous
    centroid. Deterministic (no RNG; seeds are the md5-ordered sample).

    DRIVER-SIDE BOUND: each iteration ``.collect()``s the combined
    n_centroids × dim (cell, pos, sum, count) rows — independent of corpus
    size, so fine at any realistic IVF shape (4096 cells × 1024 dims = 4M
    rows), but NOT a path for million-centroid codebooks. The guard below
    makes that bound explicit instead of letting a future caller discover
    it as an OOM; raise ``max_driver_elems`` deliberately if you mean it.
    """
    from collections import namedtuple

    import numpy as np

    Cent = namedtuple("Cent", ["cid", "cv", "cnrm"])

    def _check_bound(n_cent: int, d: int) -> None:
        if n_cent * d > max_driver_elems:
            raise ValueError(
                f"ivf_train_lloyd: n_centroids*dim = {n_cent}*{d} = "
                f"{n_cent * d} exceeds the driver-side aggregation bound "
                f"({max_driver_elems}); this trainer collects one row per "
                "(cell, component) per iteration — use fewer/coarser "
                "centroids or raise max_driver_elems explicitly"
            )

    if seed_centroids is None:
        # probe dim BEFORE seeding: ivf_centroids itself collects all
        # n_centroids vectors to the driver, i.e. the very OOM this guard
        # exists to pre-empt
        dim = len(corpus.select(vec_col).first()[0])
        _check_bound(n_centroids, dim)
        cent = list(ivf_centroids(corpus, n_centroids, id_col, vec_col))
    else:
        cent = list(seed_centroids)
    dim = len(cent[0].cv)
    _check_bound(len(cent), dim)

    partial_schema = T.StructType(
        [
            T.StructField("cell", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
        ]
    )

    for _ in range(n_iter):
        assigned = _assign_cells(corpus, cent, id_col, vec_col, "_id", "_v", 1)

        def partials(batches):
            import pandas as pd

            acc: dict[int, tuple[int, object]] = {}
            for pdf in batches:
                for cell, vec in zip(pdf["cell"], pdf["_v"]):
                    v = np.asarray(vec, dtype=np.float64)
                    if cell in acc:
                        cnt, s = acc[cell]
                        acc[cell] = (cnt + 1, s + v)
                    else:
                        acc[cell] = (1, v.copy())
            yield pd.DataFrame(
                {
                    "cell": list(acc.keys()),
                    "cnt": [c for c, _ in acc.values()],
                    "sums": [list(s) for _, s in acc.values()],
                }
            )

        combined = (
            assigned.mapInPandas(partials, schema=partial_schema)
            .select("cell", "cnt", F.posexplode("sums").alias("pos", "s"))
            .groupBy("cell", "pos")
            .agg(F.sum("s").alias("s"), F.sum("cnt").alias("n"))
            .collect()
        )
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in combined:
            arr = sums.setdefault(int(r.cell), np.zeros(dim))
            arr[int(r.pos)] = float(r.s)
            counts[int(r.cell)] = int(r.n)
        new_cent = []
        for c in cent:
            cid = int(c.cid)
            if cid in sums and counts[cid] > 0:
                mean = sums[cid] / counts[cid]
                acc2 = 0.0
                for x in mean:  # sequential — mirrors _norm's fold
                    acc2 += float(x) * float(x)
                new_cent.append(Cent(cid, [float(x) for x in mean], acc2**0.5))
            else:
                new_cent.append(Cent(int(c.cid), list(c.cv), float(c.cnrm)))
        cent = new_cent
    return cent


def _assign_cells(
    df: DataFrame,
    cent_rows: list,
    id_col: str,
    vec_col: str,
    out_id: str,
    out_vec: str,
    nprobe: int,
) -> DataFrame:
    """(out_id, out_vec, cell) with ``nprobe`` rows per input vector — its
    nearest seed cells by rounded cosine, ties to the smaller cid. One
    narrow Arrow-batched pass; with nprobe=1 this is the corpus-side cell
    assignment, with nprobe>1 the query-side probe expansion."""
    import numpy as np

    # Columns ordered by ascending cid so ties resolve to the smaller cid
    # via stable selection below — mirroring the oracle's ORDER BY cos
    # DESC, cid.
    cent = sorted(cent_rows, key=lambda r: int(r.cid))
    cmat = np.asarray([r.cv for r in cent], dtype=np.float64)  # (m, dim)
    cnrm = np.asarray([float(r.cnrm) for r in cent])
    cids = np.asarray([int(r.cid) for r in cent], dtype=np.int64)
    m, dim = cmat.shape

    src = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec))
    schema = T.StructType(
        [src.schema[out_id], src.schema[out_vec], T.StructField("cell", T.LongType())]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cell=pd.Series([], dtype="int64"))
                continue
            vm = _vstack64(pdf[out_vec])
            n = len(pdf)
            dots = np.zeros((n, m))
            nacc = np.zeros(n)
            # dimension-sequential: each (row, centroid) entry accumulates
            # in index order — the oracle's exact FP op sequence.
            for i in range(dim):
                vi = vm[:, i]
                nacc = nacc + vi * vi
                dots = dots + vi[:, None] * cmat[None, :, i]
            cos = dots / (np.sqrt(nacc)[:, None] * cnrm[None, :])
            cos = np.floor(cos * 1e4 + 0.5) / 1e4
            # stable argsort on -cos keeps ascending-cid order among ties
            order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
            rep = pdf.iloc[np.repeat(np.arange(n), order.shape[1])].reset_index(
                drop=True
            )
            yield rep.assign(cell=cids[order.ravel()])

    return src.mapInPandas(run, schema=schema)


def ivf_corpus_cells(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, c_vec, cell): the corpus-side IVF cell assignment WITH
    the vector carried — one narrow Arrow pass, nprobe-independent.
    Exposed so probe sweeps (:func:`ivf_topk` ``corpus_cells=``) compute
    it once per corpus+centroid version instead of once per setting.
    (Distinct from :func:`ivf_cells`, the vectorless persisted index
    artifact.)"""
    return _assign_cells(corpus, centroids, id_col, vec_col, "vec_id", "c_vec", 1)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into
    ``n_centroids`` cells (nearest seed centroid by cosine), then search
    each query only in its ``nprobe`` nearest cells.

    Seed centroids are picked deterministically — the ``n_centroids``
    corpus vectors with the smallest ``md5(vec_id)`` (an engine-portable
    pseudo-random sample; a production pipeline would Lloyd-iterate, which
    changes recall, not the dataflow shape). Centroids are collect()ed and
    shipped in the task closure, so cell assignment is one narrow
    vectorized pass: the corpus is NEVER shuffled for assignment, the
    probe join broadcasts the (tiny) query-probe set, and the only shuffle
    in the whole plan is the final per-query top-k over (id, id, score)
    rows. That is the IVF scale contract: a 100 TB corpus is scanned once,
    narrow, and only candidates move.

    Deterministic and oracle-checkable end-to-end (rounded cosines, ties
    broken by centroid id / vec_id). Returns (query_id, vec_id, cosine,
    rank).

    ``corpus_cells`` accepts a precomputed :func:`ivf_corpus_cells`
    frame for the SAME corpus+centroids: the corpus-side assignment is
    nprobe-independent, so a caller sweeping probe settings (the recall
    curve) persists it once instead of paying one full corpus pass per
    setting. Identical results either way.
    """
    cent_rows = centroids if centroids is not None else ivf_centroids(
        corpus, n_centroids, id_col, vec_col
    )
    cells = (
        corpus_cells
        if corpus_cells is not None
        else ivf_corpus_cells(corpus, cent_rows, id_col, vec_col)
    )
    probes = _assign_cells(
        queries, cent_rows, id_col, vec_col, "query_id", "q_vec", nprobe
    )
    pairs = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = batch_cosine_scores(pairs, "q_vec", "c_vec", ["query_id", "vec_id"])
    return _topk(scored, k)


def ann_recall(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """(query_id, n_hits, recall): per-query overlap@k between an
    approximate neighbor table and the exact one — THE tuning metric of
    every ANN index (sweep nprobe/planes/code size, read recall, pick the
    cheapest setting above the target). Both inputs are (query_id,
    vec_id, ...) result tables (:func:`ivf_topk`, :func:`lsh_bucketed_topk`,
    :func:`pq_topk`, ... vs :func:`cosine_topk` ground truth); every
    query in ``exact`` gets a row (0 hits when the index missed
    entirely).

    Determinism: membership is compared on ids (both pipelines rank on
    4-digit-rounded cosine with vec_id tie-break, so their top-k SETS are
    engine-exact); n_hits is a BIGINT count, recall its fixed-order
    display ratio. The denominator is each query's ACTUAL exact row count
    (== k whenever the corpus holds ≥ k+1 vectors, but a small or
    filtered corpus yields fewer ground-truth rows, and dividing by a
    fixed k would cap such a query's recall below 1.0 forever — ADVICE
    r10). ``k`` is kept as the declared @k of the metric and validated
    as an upper bound. Scale: the tables are k×|queries| rows — the
    sampled-query tuning shape; one semi-join + one combinable count,
    both sides tiny relative to the corpus scan that produced them."""
    hits = approx.select("query_id", "vec_id").join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    per = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    base = exact.groupBy("query_id").agg(
        F.least(F.count(F.lit(1)), F.lit(int(k))).cast("bigint").alias("n_exact")
    )
    return base.join(per, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0).cast("bigint")).alias("n_hits"),
        pround(
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_exact").cast("double"),
            4,
        ).alias("recall"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocked: bool = False,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Embedding-level benchmark decontamination: corpus rows whose vector
    is ≥ ``threshold`` cosine to ANY benchmark vector — the semantic
    sibling of the n-gram tier (operators/text.py decontaminate /
    q_decontaminate), catching paraphrased or re-templated eval items
    that share no 8-gram with the benchmark. Returns one row per
    contaminated corpus doc: (vec_id, bench_id, cosine) with its
    highest-cosine benchmark match (ties to the smaller bench_id) —
    the evidence row an auditor reads before dropping the doc.

    Plan shape (exact mode): the benchmark side is benchmark-sized by
    definition (eval suites are thousands of rows, not billions) →
    broadcast; the corpus is scanned ONCE, never shuffled; scoring is the
    shared vectorized kernel (:func:`batch_cosine_scores`, narrow); only
    rows that clear the threshold — contamination is rare by construction
    — reach the per-doc max aggregation, which is combinable (min of
    (-cosine, bench_id) structs). At 100 TB the cost is one corpus pass
    of m·n dot products per executor, embarrassingly parallel.

    ``blocked=True`` is the scale path when the benchmark itself is too
    big to cross every corpus row (multi-million-item benchmark unions):
    both sides assign to the same seeded IVF cells (:func:`ivf_centroids`
    / :func:`_assign_cells`, corpus 1 cell, benchmark ``nprobe`` cells)
    and only same-cell pairs score — the q_ann_ivf contract: approximate
    (a cross-cell pair is missed), recall-tested on planted duplicates
    rather than oracle-replayed."""
    b = benchmark.select(
        F.col(id_col).alias("bench_id"), F.col(vec_col).alias("b_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    if blocked:
        cent = ivf_centroids(corpus, n_centroids, id_col, vec_col)
        cells = _assign_cells(corpus, cent, id_col, vec_col, "vec_id", "c_vec", 1)
        probes = _assign_cells(
            benchmark, cent, id_col, vec_col, "bench_id", "b_vec", nprobe
        )
        pairs = cells.join(F.broadcast(probes), "cell").select(
            "vec_id", "c_vec", "bench_id", "b_vec"
        )
    else:
        pairs = c.join(F.broadcast(b))
    scored = batch_cosine_scores(pairs, "b_vec", "c_vec", ["vec_id", "bench_id"])
    hits = scored.filter(F.col("cosine") >= threshold)
    best = F.min(
        F.struct(
            (-F.col("cosine")).alias("neg_cos"), F.col("bench_id").alias("b")
        )
    ).alias("best")
    return (
        hits.groupBy("vec_id")
        .agg(best)
        .select(
            "vec_id",
            F.col("best.b").alias("bench_id"),
            (-F.col("best.neg_cos")).alias("cosine"),
        )
    )


# -- approximate path --------------------------------------------------------

N_PLANES = 12  # 4096 buckets


def _planes(dim: int, n_planes: int = N_PLANES):
    import numpy as np

    rng = np.random.RandomState(42)
    return rng.randn(n_planes, dim).astype("float64")


def planes_for(n_vectors: int, bucket_target: int = 32) -> int:
    """Size the hyperplane count so the EXPECTED bucket occupancy is
    ``bucket_target``: n_planes = log2(n / bucket_target). Too many planes
    (buckets >> corpus) strands every vector alone and recall collapses;
    too few makes buckets so fat the probe join stops being sub-linear.
    Scales as log2 — a 100 TB corpus of 10^10 vectors wants ~28 planes."""
    import math

    return max(2, min(28, int(math.log2(max(2, n_vectors / bucket_target)))))


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Append an integer LSH bucket id: sign pattern of n_planes random
    hyperplane projections. Vectorized numpy over Arrow batches —
    mapInPandas, the sanctioned slow path for linear algebra."""
    import pandas as pd

    planes = _planes(dim, n_planes)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bucket int"

    def assign(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=pd.Series([], dtype="int32"))
                continue
            mat = np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype="float64")))
            signs = (mat @ planes.T) > 0
            bucket = np.zeros(len(pdf), dtype="int64")
            for i in range(n_planes):
                bucket |= signs[:, i].astype("int64") << i
            yield pdf.assign(bucket=bucket.astype("int32"))

    return df.mapInPandas(assign, schema=out_schema)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    multiprobe: bool = True,
    n_planes: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine computed only inside matching LSH
    buckets. With multiprobe, each query also probes the n_planes buckets at
    Hamming distance 1 (sign flips), trading k*(n_planes+1) probe joins'
    worth of candidates for much better recall. ``n_planes`` defaults to
    :func:`planes_for` of the corpus size (one cheap count()); pass it
    explicitly when the cardinality is already known."""
    if n_planes is None:
        n_planes = planes_for(corpus.count())
    c = add_lsh_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        dim,
        n_planes,
    )
    q = add_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
        dim,
        n_planes,
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
                for i in range(n_planes)
            ],
        )
        q = q.select("query_id", "q_vec", F.explode(probes).alias("bucket"))
    pairs = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = batch_cosine_scores(
        pairs, "q_vec", "c_vec", ["query_id", "vec_id"]
    ).dropDuplicates(["query_id", "vec_id"])
    return _topk(scored, k)


# -- product quantization (PQ) ----------------------------------------------
#
# The compression tier for corpus-scale vector search: each vector is cut
# into M subvectors and every subvector is replaced by the id of its
# nearest sub-centroid (a "code"). With M=8 subspaces and 256 centroids a
# 64-dim float32 vector (256 B) becomes 8 bytes — 32x less to scan, which
# is the difference between "fits in page cache" and "rescans disk" at
# 100 TB. Search runs in the compressed domain via ADC (asymmetric
# distance computation): per query, one (M x ksub) lookup table of partial
# squared distances, then each candidate's distance is M table lookups —
# no decompression, no per-pair float math.


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    normalize: bool = True,
) -> dict:
    """Train a PQ codebook: per-subspace k-means over a deterministic
    md5-ordered corpus sample. Returns {"m", "dsub", "ksub", "normalize",
    "codebooks": (m, ksub, dsub) nested lists} — plain data, shippable in
    task closures.

    Scale notes: training reads ``sample_size`` vectors to the driver
    (standard PQ practice — FAISS trains on a sample too); the bound is
    explicit and independent of corpus size. Everything downstream
    (encode, search) is distributed. Deterministic: sample order is
    md5(id), seeds are the first ``ksub`` sample rows per subspace, Lloyd
    iterations have no RNG."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(sample_size)
        .collect()
    )
    mat = np.asarray([r.v for r in rows], dtype=np.float64)
    if normalize:
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        mat = mat / nrm
    n, dim = mat.shape
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    if n < ksub:
        raise ValueError(f"pq_train: sample {n} smaller than ksub {ksub}")
    codebooks = []
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(n_iter):
            # (n, ksub) squared L2; argmin ties -> smaller centroid id
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        codebooks.append([[float(x) for x in row] for row in cent])
    return {
        "m": m,
        "dsub": dsub,
        "ksub": ksub,
        "normalize": normalize,
        "codebooks": codebooks,
    }


def pq_encode(
    corpus: DataFrame,
    codebook: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<smallint>): replace each subvector with its
    nearest sub-centroid id. One narrow Arrow-batched pass — the corpus is
    scanned once and never shuffled; output rows are ~m bytes of codes per
    vector, the format a 100 TB deployment persists and re-scans."""
    import numpy as np

    cb = np.asarray(codebook["codebooks"], dtype=np.float64)  # (m, ksub, dsub)
    m, _ksub, dsub = cb.shape
    normalize = bool(codebook["normalize"])
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
            mat = _vstack64(pdf["v"])
            if normalize:
                nrm = np.linalg.norm(mat, axis=1, keepdims=True)
                nrm[nrm == 0.0] = 1.0
                mat = mat / nrm
            codes = np.empty((len(pdf), m), dtype=np.int16)
            for s in range(m):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.tolist())}
            )

    return src.mapInPandas(run, schema=schema)


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebook: dict,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via ADC over PQ codes: per query, an (m, ksub)
    table of partial squared distances to every sub-centroid; each
    candidate's distance is m table lookups summed. Returns (query_id,
    vec_id, dist, rank) — rank 1 = nearest. With normalized vectors,
    ascending L2 equals descending cosine, so recall is measured directly
    against :func:`cosine_topk` (tests/test_similarity.py).

    Plan shape: query LUTs ride in the task closure (|Q| x m x ksub
    doubles — tiny), the codes table is scanned once, narrow; the only
    shuffle is the final top-k over (query_id, vec_id, dist) rows. The
    corpus vectors themselves are not touched at all — that is the point."""
    import numpy as np

    cb = np.asarray(codebook["codebooks"], dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = cb.shape
    normalize = bool(codebook["normalize"])
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).collect()
    qids = [r.query_id for r in q_rows]
    qmat = np.asarray([r.v for r in q_rows], dtype=np.float64)
    if normalize:
        nrm = np.linalg.norm(qmat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        qmat = qmat / nrm
    # LUT[q, s, c] = || query_sub(q,s) - centroid(s,c) ||^2
    luts = np.empty((len(qids), m, ksub), dtype=np.float64)
    for s in range(m):
        qsub = qmat[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = ((qsub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
    qid_arr = np.asarray(qids)

    src = codes_df.select("vec_id", "codes")
    schema = T.StructType(
        [
            src.schema["vec_id"],
            T.StructField("query_id", src.schema["vec_id"].dataType),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "query_id": [], "dist": []})
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            n = len(pdf)
            # dists[n, q]: sum over subspaces of LUT lookups
            dists = np.zeros((n, len(qid_arr)), dtype=np.float64)
            for s in range(m):
                dists += luts[:, s, :][:, codes[:, s]].T  # (n, q)
            rep = np.repeat(pdf["vec_id"].to_numpy(), len(qid_arr))
            yield pd.DataFrame(
                {
                    "vec_id": rep,
                    "query_id": np.tile(qid_arr, n),
                    "dist": np.floor(dists.ravel() * 1e6 + 0.5) / 1e6,
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


def pq_topk_rerank(
    codes_df: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebook: dict,
    k: int = 5,
    shortlist_mult: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ serving shape: ADC over codes produces a
    ``k * shortlist_mult`` candidate shortlist per query (compressed-domain
    scan, cheap), then ONLY the shortlist is re-scored with exact cosine
    against the true vectors and re-ranked. Quantization error decides
    what enters the shortlist, never the final order — recall approaches
    exact search while the full-precision corpus is touched for just
    |Q| x k x mult rows (a semi-join, not a scan). Returns (query_id,
    vec_id, cosine, rank)."""
    shortlist = pq_topk(
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


def ivfpq_topk(
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
    """IVF+PQ — the canonical corpus-scale ANN index (FAISS IVFPQ): the
    IVF coarse quantizer restricts each query to its ``nprobe`` nearest
    cells, and within those cells candidates are scored by ADC over PQ
    codes. Both reductions compose: the scan touches ~nprobe/n_cells of
    the corpus AND reads m-byte codes instead of float vectors.

    Inputs are the two persisted artifacts a deployment maintains per
    corpus version: ``codes_df`` (vec_id, codes) from :func:`pq_encode`
    and ``cells_df`` (vec_id, cell) from the IVF assignment — pass
    ``ivf_cells()`` output. Returns (query_id, vec_id, dist, rank),
    ascending ADC distance. Plan: codes⋈cells is an equi-join on vec_id
    (co-partitioned artifacts in production — zero shuffle with
    bucketing), the probe set broadcasts, and the ADC pass is narrow with
    every query's LUT in the task closure."""
    import numpy as np

    cb = np.asarray(codebook["codebooks"], dtype=np.float64)
    m, ksub, dsub = cb.shape
    normalize = bool(codebook["normalize"])
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).collect()
    qids = [r.query_id for r in q_rows]
    qmat = np.asarray([r.v for r in q_rows], dtype=np.float64)
    if normalize:
        nrm = np.linalg.norm(qmat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        qmat = qmat / nrm
    luts = np.empty((len(qids), m, ksub), dtype=np.float64)
    for s in range(m):
        qsub = qmat[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = ((qsub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
    lut_by_qid = {qid: luts[i] for i, qid in enumerate(qids)}

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
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": [], "vec_id": [], "dist": []})
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            dists = np.empty(len(pdf), dtype=np.float64)
            for qid, idx in _group_indices(pdf["query_id"]).items():
                lut = lut_by_qid[qid]
                sub = codes[idx]
                acc = np.zeros(len(idx), dtype=np.float64)
                for s in range(m):
                    acc += lut[s, sub[:, s]]
                dists[idx] = acc
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "vec_id": pdf["vec_id"],
                    "dist": np.floor(dists * 1e6 + 0.5) / 1e6,
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


def _group_indices(series) -> dict:
    """{value: np.ndarray of positional indices} for a pandas Series."""
    import numpy as np

    out: dict = {}
    for pos, v in enumerate(series):
        out.setdefault(v, []).append(pos)
    return {k: np.asarray(v, dtype=np.int64) for k, v in out.items()}


def ivf_cells(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): the persisted IVF assignment artifact — one narrow
    pass (centroid matrix in the closure), written next to the PQ codes
    at index-build time."""
    return _assign_cells(
        corpus, centroids, id_col, vec_col, "vec_id", "__v", 1
    ).select("vec_id", "cell")


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    vector through a seeded Gaussian matrix scaled by 1/sqrt(out_dim).
    Deterministic (fixed seed -> same matrix on every executor, every
    run), narrow Arrow-batched pass, no shuffle. The cheap front-end for
    brute-force scoring when PQ's codebook lifecycle is overkill: a
    64->16 projection cuts the scan and the pair math 4x while
    approximately preserving cosines (distortion ~ 1/sqrt(out_dim),
    recall asserted in tests/test_similarity.py)."""
    import numpy as np

    src = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"))
    schema = T.StructType(
        [
            src.schema["vec_id"],
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
        ]
    )
    state: dict = {}

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], vec_col: []})
                continue
            mat = _vstack64(pdf["__v"])
            if "R" not in state:
                rng = np.random.RandomState(seed)
                state["R"] = rng.randn(mat.shape[1], out_dim) / np.sqrt(out_dim)
            proj = mat @ state["R"]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    vec_col: [
                        [float(x) for x in row] for row in proj.astype("float32")
                    ],
                }
            )

    return src.mapInPandas(run, schema=schema)
