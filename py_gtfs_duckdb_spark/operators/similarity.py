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


# -- approximate path --------------------------------------------------------

N_PLANES = 12  # 4096 buckets


def _planes(dim: int):
    import numpy as np

    rng = np.random.RandomState(42)
    return rng.randn(N_PLANES, dim).astype("float64")


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Append an integer LSH bucket id: sign pattern of N_PLANES random
    hyperplane projections. Vectorized numpy over Arrow batches —
    mapInPandas, the sanctioned slow path for linear algebra."""
    import pandas as pd

    planes = _planes(dim)
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
            for i in range(N_PLANES):
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
) -> DataFrame:
    """Approximate top-k: exact cosine computed only inside matching LSH
    buckets. With multiprobe, each query also probes the N_PLANES buckets at
    Hamming distance 1 (sign flips), trading k*(N_PLANES+1) probe joins'
    worth of candidates for much better recall."""
    c = add_lsh_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        dim,
    )
    q = add_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
        dim,
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
                for i in range(N_PLANES)
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
