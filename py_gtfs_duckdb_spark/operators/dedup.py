"""Deduplication operators for large-scale text corpora.

Scale shapes (the point of each design):

- exact dedup: hash-groupBy on a digest — one shuffle on the digest, never
  on the document body.
- MinHash+LSH: shingle → 48-bit shingle hash → K permuted min-hashes →
  band buckets → candidate pairs only within equal buckets → exact Jaccard
  verify on candidates. The candidate join is the only quadratic-risk step
  and it is bounded per bucket; everything stays JVM-side (no UDFs).
- SimHash: 64-bit signature per document via a vectorized pandas UDF
  (numpy bit-twiddling is the fast path for per-token bit spreads);
  near-dups = signatures at small Hamming distance, banded the same way.
- n-gram Jaccard: the exact verifier, also usable standalone on a
  pre-bucketed corpus.

All hash math uses md5-derived integers so results are engine-portable
(the DuckDB oracle reproduces them bit-for-bit — no reliance on
Spark-internal hash functions).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.functions import pround

# Deterministic permutation constants for MinHash: h_i(x) = (a_i*x + b_i) mod P.
# P = 2^31-1 (Mersenne prime); a,b fixed so Spark and the SQL oracle agree.
MINHASH_P = 2_147_483_647
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_203_077_353, 528_734_183),
    (1_674_523_601, 1_092_384_721),
    (947_310_257, 1_823_449_019),
    (2_034_875_621, 412_097_509),
    (1_559_203_387, 1_948_560_143),
    (733_420_151, 87_206_329),
    (1_111_111_121, 1_350_294_467),
    (1_877_756_239, 665_902_813),
    (599_148_487, 1_730_044_973),
    (1_421_857_907, 241_598_651),
    (841_623_119, 1_987_356_401),
    (1_734_209_803, 903_457_687),
    (1_029_384_757, 1_569_234_521),
    (1_938_475_663, 350_927_161),
    (678_904_231, 1_204_583_909),
    (1_564_738_291, 789_456_127),
]
MINHASH_K = len(MINHASH_PERMS)  # 16 hashes
LSH_BANDS = 4  # 4 bands x 4 rows -> s-curve threshold ~ (1/4)^(1/4) ~ 0.71


def shingle_hashes(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle_hash) — distinct k-character shingles per document,
    hashed to a 48-bit integer via md5 (engine-portable). One narrow pass:
    sequence → transform → array_distinct → explode."""
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
            lambda i: F.substr(F.col(text_col), i, F.lit(k)),
        )
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(shingles).alias("shingle")
    )
    return exploded.select(
        "id",
        (F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("bigint"))
        .alias("h"),
    ).dropDuplicates(["id", "h"])


def minhash_signature(shingled: DataFrame) -> DataFrame:
    """Wide signature (id, mh_0..mh_{K-1}): ONE groupBy over the shingle set
    with K min-aggregates. The naive formulation (cross-join the K
    permutation constants, then group by (id, perm)) multiplies the shuffle
    K-fold; K parallel aggregates over one shuffle produce identical values
    ~K× cheaper — the shape that matters at corpus scale."""
    h = F.col("h") % MINHASH_P
    aggs = [
        F.min((h * a + b) % MINHASH_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return shingled.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing at least one LSH band bucket.

    Band key = md5 of the ordered minhash values in the band (4 bands from
    the wide signature row — a narrow explode, no extra shuffle). The
    self-join happens on (band_idx, band_key) — i.e. only within buckets —
    which is what keeps this sub-quadratic at corpus scale.
    """
    rows_per_band = MINHASH_K // LSH_BANDS
    band_structs = []
    for bi in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{bi * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.md5(F.concat_ws(",", *cols)).alias("band_key"),
            )
        )
    banded = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


# Candidate pairs whose signature-estimated Jaccard (matching minhash
# fraction) falls below EST_MIN_MATCHES/K are pruned before exact
# verification. 7/16 ≈ 0.44 keeps ~97% recall at true J=0.7 while killing
# the flood of sub-threshold candidates a low-selectivity corpus produces.
EST_MIN_MATCHES = 7


def estimate_filter_pairs(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Keep candidate pairs with >= EST_MIN_MATCHES matching minhash
    positions. One narrow broadcast join per side + a codegen'd sum of K
    column equalities — orders of magnitude cheaper than exact verification,
    which is why it goes first."""
    sig_a = signatures.select(
        F.col("id").alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(MINHASH_K)]
    )
    sig_b = signatures.select(
        F.col("id").alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(MINHASH_K)]
    )
    n_match = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    return (
        pairs.join(F.broadcast(sig_a), "id_a")
        .join(F.broadcast(sig_b), "id_b")
        .withColumn("__n_match", n_match)
        .filter(F.col("__n_match") >= EST_MIN_MATCHES)
        .select("id_a", "id_b")
    )


def exact_jaccard(pairs: DataFrame, shingled: DataFrame) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard:
    |A∩B| / (|A|+|B|-|A∩B|), computed as array_intersect over each
    document's sorted shingle-hash array. Set-per-row beats an exploded
    shingle equi-join by ~|shingles| in shuffle volume once the pair list
    is bounded (post estimate_filter_pairs)."""
    sets = shingled.groupBy("id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("sz"),
    )
    sa = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b"))
    n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            pround(
                n_inter.cast("double")
                / (F.col("sz_a") + F.col("sz_b") - n_inter),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH band buckets →
    signature-estimate prune → exact Jaccard verify ≥ threshold.
    Returns (id_a, id_b, jaccard).

    The estimate prune makes the pipeline robust to low-selectivity corpora
    (when most documents hover near the band threshold, bucket joins alone
    admit O(n²) candidates — observed 3.3M pairs on 5k synthetic docs).
    The shingle set feeds multiple consumers — persist it once instead of
    re-running the substring+md5 scan per consumer."""
    sh = shingle_hashes(df, text_col, id_col, k).persist()
    sig = minhash_signature(sh).persist()
    cand = lsh_candidate_pairs(sig)
    pruned = estimate_filter_pairs(cand, sig)
    return exact_jaccard(pruned, sh).filter(F.col("jaccard") >= threshold)


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document via a vectorized pandas UDF (Arrow batch
    in, numpy bit math inside — the sanctioned slow path; per-row Python
    would be ~100x slower). Deterministic: token hash = first 8 bytes of
    md5."""
    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            if not text:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in set(text.lower().split()):
                h = np.uint64(
                    int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big", signed=False
                    )
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            sig = 0
            for b in np.nonzero(acc > 0)[0]:
                sig |= 1 << int(b)
            out[i] = np.int64(np.uint64(sig).astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, banded on
    16-bit chunks (a pair within distance 3 must agree on ≥1 of 4 chunks —
    pigeonhole), so the join is bucket-local, not all-pairs."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i)
        .bitwiseAND(F.lit(0xFFFF).cast("bigint"))
        .alias(f"c{i}")
        for i in range(4)
    ]
    banded = signatures.select("id", "simhash", *chunks)
    pieces = []
    for i in range(4):
        a = banded.alias("a")
        b = banded.alias("b")
        pieces.append(
            a.join(
                b,
                (F.col(f"a.c{i}") == F.col(f"b.c{i}")) & (F.col("a.id") < F.col("b.id")),
            ).select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
