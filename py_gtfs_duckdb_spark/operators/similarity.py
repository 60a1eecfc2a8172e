"""Similarity search over embedding columns (``array<float>``).

Two tiers, same contract (query_id, vec_id, cosine, rank):

- ``cosine_topk`` — brute force: broadcast the (small) query set, scan the
  corpus once, per-query top-k via window. Exact; the right shape whenever
  |queries| * |corpus| work fits the cluster (corpus is scanned once, never
  shuffled — only the tiny (query, candidate) pairs shuffle for top-k).
- ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  computed vectorized (numpy via mapInPandas over Arrow batches), then
  exact cosine only within matching buckets (multi-probe over all hyper-
  plane sign-flips at Hamming distance ≤ 1). Approximate; recall is
  tested against the brute-force oracle in tests/test_similarity.py.

Dot products stay JVM-side via ``F.zip_with`` + ``F.aggregate`` (no UDF in
the exact path); all floats are computed in double and rounded for
engine-portable comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from py_gtfs_duckdb_spark.functions import pround


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
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
    result is deterministic and oracle-comparable.
    """
    # Norms are per-vector, not per-pair: compute each side's norm once
    # before the |Q|x|C| pair blow-up (|C| norm evals instead of |Q|x|C|).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            pround(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


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
            _norm(F.col(vec_col)).alias("cnrm"),
        )
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(n_centroids)
        .collect()
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into
    ``n_centroids`` cells (nearest seed centroid by cosine), then search
    each query only in its ``nprobe`` nearest cells.

    Seed centroids are picked deterministically — the ``n_centroids``
    corpus vectors with the smallest ``md5(vec_id)`` (an engine-portable
    pseudo-random sample; a production pipeline would Lloyd-iterate, which
    changes recall, not the dataflow shape). Centroids are collect()ed and
    embedded as LITERAL arrays, so cell assignment is pure per-row column
    math: the corpus is NEVER shuffled for assignment, and the probe join
    broadcasts the (tiny) query-probe set — the only shuffle in the whole
    plan is the final per-query top-k. That is the IVF scale contract: a
    100 TB corpus is scanned once, narrow, and only candidates move.

    Deterministic and oracle-checkable end-to-end (ties broken by centroid
    id / vec_id on pround()ed cosines). Returns
    (query_id, vec_id, cosine, rank).
    """
    cent_rows = centroids if centroids is not None else ivf_centroids(
        corpus, n_centroids, id_col, vec_col
    )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(r.cid).cast("bigint").alias("cid"),
                F.array(*[F.lit(float(x)) for x in r.cv]).alias("cv"),
                F.lit(float(r.cnrm)).alias("cnrm"),
            )
            for r in cent_rows
        ]
    )

    def cell_scores(vec, nrm):
        # (rounded cosine, cid) per centroid — rounded so near-tie ordering
        # collapses to the deterministic cid tie-break on BOTH engines.
        return F.transform(
            cent_arr,
            lambda c: F.struct(
                pround(_dot(vec, c["cv"]) / (nrm * c["cnrm"]), 4).alias("cos"),
                c["cid"].alias("cid"),
            ),
        )

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    # argmax cell: lexicographic max of (cos, -cid) == highest cosine,
    # smallest cid on ties. Narrow — no shuffle.
    best = F.array_max(
        F.transform(
            cell_scores(F.col("c_vec"), F.col("c_norm")),
            lambda s: F.struct(
                s["cos"].alias("cos"), (-s["cid"]).alias("ncid")
            ),
        )
    )
    cells = c.withColumn("cell", -best["ncid"])

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    # nprobe nearest cells per query: sort ascending by (-cos, cid), take
    # the head. Still narrow; the explode multiplies only the query set.
    probe_order = F.transform(
        cell_scores(F.col("q_vec"), F.col("q_norm")),
        lambda s: F.struct((-s["cos"]).alias("ncos"), s["cid"].alias("cid")),
    )
    probes = q.select(
        "query_id",
        "q_vec",
        "q_norm",
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_order), 1, nprobe), lambda s: s["cid"]
            )
        ).alias("cell"),
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            pround(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                4,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank")
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
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            pround(cosine_similarity_col(F.col("q_vec"), F.col("c_vec")), 4).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )
