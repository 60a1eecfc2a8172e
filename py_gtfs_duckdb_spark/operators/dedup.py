"""Deduplication operators for large-scale text corpora.

Scale shapes (the point of each design):

- exact dedup: hash-groupBy on a digest — one shuffle on the digest, never
  on the document body.
- MinHash+LSH: shingle → 48-bit shingle hash → K permuted min-hashes →
  band buckets → candidate pairs only within equal buckets → exact Jaccard
  verify on candidates. The candidate join is the only quadratic-risk step
  and it is bounded per bucket. The per-document stage (shingling +
  signatures) is ONE Arrow-batched pass (hashlib/numpy beat interpreted
  higher-order-function columns ~2x end-to-end); joins and set
  intersection stay JVM-side.
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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_gtfs_duckdb_spark.functions import fan_out, pround
from py_gtfs_duckdb_spark.operators._scope import shared

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


def shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, hs: array<bigint>, sz) — each document's distinct k-WORD
    shingles hashed to 48-bit integers via md5 (engine-portable), kept as a
    per-row sorted array. One narrow Arrow-batched pass (mapInPandas) —
    ZERO shuffles, no explode, no groupBy. At corpus scale this is the
    whole per-document cost and it is embarrassingly parallel.

    hashlib.md5 over C strings replaces the earlier
    ``transform(..., md5 ∘ concat_ws)`` column form: higher-order
    functions are interpreted (CodegenFallback), so the per-shingle lambda
    overhead dominated the dedup pipelines. The hash VALUES are identical
    (md5 of the same utf-8 bytes, first 12 hex digits as the 48-bit int),
    so the DuckDB oracle and every downstream stage see the same sets.

    Word shingles, not character shingles: on natural text the background
    (non-duplicate) character-trigram Jaccard is ~0.3-0.5, which floods LSH
    buckets with candidate pairs; word k-gram background similarity is
    ~0.001, so band buckets stay selective and the verify stage stays
    near-linear."""
    df = fan_out(df)  # md5-dense narrow stage: see functions.fan_out
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    schema = T.StructType(
        [
            src.schema["id"],
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("sz", T.LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            hss, szs = [], []
            for text in pdf["__text"]:
                hs = _shingle_doc(text, k, cache)
                hss.append(hs)
                szs.append(len(hs))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "hs": hss,
                    "sz": pd.Series(szs, dtype="int64"),
                }
            )

    return src.mapInPandas(run, schema=schema)


# Non-string key for the shingle memo's cold generation (the
# _winnow_hash_words pattern, text.py): shingles are strings, so a tuple
# key can never collide with a cached shingle.
_SHINGLE_OLD_GEN = ("__shingle_old_gen__",)


def _shingle_doc(text: str | None, k: int, cache: dict | None = None) -> list[int]:
    """Sorted distinct 48-bit shingle hashes of one document — the exact
    value contract of :func:`shingle_sets`, shared with the fused
    shingle+signature pass.

    ``cache`` memoizes shingle-string → 48-bit hash across a task (r14,
    guide §1.2 per-task work): word k-grams are Zipf-distributed, so most
    lookups hit — measured 2.06× on the shingle kernel with an identical
    output (tools/profile_shingle_kernel.py). The memory bound is the
    two-generation swap from text._winnow_hash_words (hits promote back;
    eviction never changes a value). ``int.from_bytes(digest[:6])`` is
    the first 12 hex digits of the md5 as an integer — the same 48-bit
    value the hexdigest parse produced, without the hex round-trip."""
    import hashlib

    md5 = hashlib.md5
    words = [w for w in (text or "").split(" ") if w]
    n = max(len(words) - (k - 1), 1)
    if cache is None:
        return sorted(
            {
                int.from_bytes(
                    md5(" ".join(words[i : i + k]).encode("utf-8")).digest()[:6],
                    "big",
                )
                for i in range(n)
            }
        )
    out = set()
    for i in range(n):
        s = " ".join(words[i : i + k])
        h = cache.get(s)
        if h is None:
            old = cache.get(_SHINGLE_OLD_GEN)
            h = old.get(s) if old is not None else None
            if h is None:
                h = int.from_bytes(md5(s.encode("utf-8")).digest()[:6], "big")
            if len(cache) > 1_000_000:
                old = dict(cache)
                old.pop(_SHINGLE_OLD_GEN, None)
                cache.clear()
                cache[_SHINGLE_OLD_GEN] = old
            cache[s] = h
        out.add(h)
    return sorted(out)


def shingle_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, hs, sz, mh_0..mh_{K-1}) in ONE Arrow-batched pass — the fused
    per-document stage of the MinHash pipeline. Fusing matters: shingle
    sets and signatures as separate mapInPandas stages would ship every
    shingle array to a Python worker twice; fused, the document text goes
    out once and only the (id, hs, signature) row comes back."""
    import numpy as np

    src = fan_out(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    schema = T.StructType(
        [
            src.schema["id"],
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("sz", T.LongType()),
        ]
        + [T.StructField(f"mh_{i}", T.LongType()) for i in range(MINHASH_K)]
    )
    a_vec = np.asarray([a for a, _ in MINHASH_PERMS], dtype=np.int64)
    b_vec = np.asarray([b for _, b in MINHASH_PERMS], dtype=np.int64)

    def run(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            hss, szs = [], []
            mh_cols = [[] for _ in range(MINHASH_K)]
            for text in pdf["__text"]:
                hs = _shingle_doc(text, k, cache)
                hss.append(hs)
                szs.append(len(hs))
                h = np.asarray(hs, dtype=np.int64) % MINHASH_P
                mins = (
                    (h[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P
                ).min(axis=0)
                for i in range(MINHASH_K):
                    mh_cols[i].append(int(mins[i]))
            out = {
                "id": pdf["id"],
                "hs": hss,
                "sz": pd.Series(szs, dtype="int64"),
            }
            for i in range(MINHASH_K):
                out[f"mh_{i}"] = pd.Series(mh_cols[i], dtype="int64")
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)


def shingle_hashes(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Exploded (id, h) view of :func:`shingle_sets` for set-oriented
    consumers (e.g. a posting-list join formulation)."""
    return shingle_sets(df, text_col, id_col, k).select(
        "id", F.explode("hs").alias("h")
    )


def minhash_signature(sets: DataFrame) -> DataFrame:
    """Wide signature (id, mh_0..mh_{K-1}) from (id, hs): each minhash is
    the min of an affine permutation of the shingle hashes — a narrow
    Arrow-batched pass, NO shuffle. (The classic formulations — cross-join
    K permutation constants, or K min-aggregates over an exploded shingle
    table — each cost a full shuffle of the shingle set.) numpy int64
    replaces the earlier ``array_min(transform(...))`` columns: HOFs are
    interpreted, and K x |shingles| interpreted lambda evals per document
    dominated the pipeline. Integer math is exact, so signatures are
    bit-identical to the SQL-oracle formulation. (h % P < 2^31 and
    a < 2^31, so h*a + b < 2^63 — no int64 overflow.)"""
    src = sets.select("id", "hs")
    schema = T.StructType(
        [src.schema["id"]]
        + [T.StructField(f"mh_{i}", T.LongType()) for i in range(MINHASH_K)]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        a_vec = np.asarray([a for a, _ in MINHASH_PERMS], dtype=np.int64)
        b_vec = np.asarray([b for _, b in MINHASH_PERMS], dtype=np.int64)
        for pdf in batches:
            cols = [[] for _ in range(MINHASH_K)]
            for hs in pdf["hs"]:
                h = np.asarray(hs, dtype=np.int64) % MINHASH_P
                # (|hs|, K) affine permutations, column-min per perm
                mins = ((h[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P).min(
                    axis=0
                )
                for i in range(MINHASH_K):
                    cols[i].append(int(mins[i]))
            out = {"id": pdf["id"]}
            for i in range(MINHASH_K):
                out[f"mh_{i}"] = pd.Series(cols[i], dtype="int64")
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)


def lsh_bands(signatures: DataFrame) -> DataFrame:
    """(id, bk): one row per LSH band bucket key per document. Band key =
    md5 over (band index, ordered minhash values of the band) — LSH_BANDS
    keys per doc from the wide signature row, a narrow explode with no
    extra shuffle. Baking the band index INTO the single hashed key (vs a
    two-column (band_idx, band_key) join) keeps the shuffle row narrow and
    the join a one-column equi-join — measured ~25% faster with an
    identical candidate set."""
    rows_per_band = MINHASH_K // LSH_BANDS
    band_keys = []
    for bi in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{bi * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ]
        band_keys.append(F.md5(F.concat_ws(",", F.lit(str(bi)), *cols)))
    return signatures.select("id", F.explode(F.array(*band_keys)).alias("bk"))


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing at least one LSH band bucket.
    The self-join runs only within buckets, which is what keeps this
    sub-quadratic at corpus scale.
    """
    banded = lsh_bands(signatures)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # NOTE: duplicates (pairs sharing >1 band) are NOT dropped here: a
        # dropDuplicates on the raw candidate set would be its only
        # shuffle. Downstream prune stages are narrow (broadcast joins),
        # so duplicates ride along cheaply and collapse AFTER pruning.
    )


# Candidate pairs whose signature-estimated Jaccard (matching minhash
# fraction) falls below EST_MIN_MATCHES/K are pruned before exact
# verification. 7/16 ≈ 0.44 keeps ~97% recall at true J=0.7 while killing
# the flood of sub-threshold candidates a low-selectivity corpus produces.
EST_MIN_MATCHES = 7


def banded_pair_nmatch(sets: DataFrame) -> DataFrame:
    """(id_a, id_b, n_match): LSH candidate pairs WITH their signature-
    agreement count, band-duplicated (pairs sharing >1 band repeat — same
    non-dedup contract as :func:`lsh_candidate_pairs`).

    The r13 restructure of candidate generation + estimate: the full
    minhash signature rides THROUGH the band explode (16 narrow int64
    columns per banded row) so ``n_match`` is a codegen'd column sum
    evaluated map-side ON the band-join output — the candidate flood is
    pruned (or, for the calibration curve, annotated) before it reaches
    ANY further exchange. The shape this replaces joined the raw
    candidate flood back against the signature table twice
    (:func:`estimate_filter_pairs`), which at corpus scale re-shuffles
    every unpruned candidate by id; here the only widening is the banded
    rows themselves (~128 B/row of minhashes), and the band key shrinks
    from a 32-char md5 hex string to its 16-byte ``unhex`` twin (a
    bijection — identical bucket membership, half the key bytes).
    Measured r13 (sf0.1, interleaved): end-to-end minhash_lsh_dedup
    1.03 s -> 0.92 s with an identical pair set."""
    rows_per_band = MINHASH_K // LSH_BANDS
    band_keys = []
    for bi in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{bi * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ]
        band_keys.append(
            F.unhex(F.md5(F.concat_ws(",", F.lit(str(bi)), *cols)))
        )
    banded = sets.select(
        "id",
        *[F.col(f"mh_{i}") for i in range(MINHASH_K)],
        F.explode(F.array(*band_keys)).alias("bk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    n_match = sum(
        F.when(F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            n_match.cast("bigint").alias("n_match"),
        )
    )


def estimate_filter_pairs(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Keep candidate pairs with >= EST_MIN_MATCHES matching minhash
    positions. One narrow join per side + a codegen'd sum of K column
    equalities — orders of magnitude cheaper than exact verification, which
    is why it goes first. Join strategy is left to AQE: the signature side
    broadcasts while it fits and degrades to a shuffle hash join at corpus
    scale (a forced broadcast hint would OOM there)."""
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
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("__n_match", n_match)
        .filter(F.col("__n_match") >= EST_MIN_MATCHES)
        .select("id_a", "id_b")
    )


# Exactness slack for the integer threshold predicates (exact Jaccard /
# containment verify and their prefix prunes). ceil(x - slack) where x is
# t*size arithmetic in doubles: rounding error in x grows like
# 2^-52 * size (~2.2e-16*size), so a FIXED 1e-9 slack stops dominating it
# once combined set sizes pass ~5e6 shingles (ADVICE r12) — a boundary
# decision could then flip at 100 TB document sizes the small-SF tests
# never reach. The per-unit term keeps the slack ~4 orders of magnitude
# above IEEE rounding error at every size, while staying far below the
# 1/(p+q) fractional quantum of any rational threshold p/q with q <= 1e4
# for sizes < ~1e8 — so the slack can only ADMIT a borderline candidate
# for exact verification (prunes) or admit the exact boundary itself
# (verify), never exclude a true pair or flip a representable decision.
# tests/test_dedup_exactness.py proves predicate == Fraction arithmetic
# across sizes up to 5e7. The DuckDB oracles embed the same form via
# sql_slacked_ceil().
SLACK_ABS = 1e-9
SLACK_PER_UNIT = 1e-12


def slacked_ceil(value: Column, size: Column) -> Column:
    """``ceil(value - (SLACK_PER_UNIT*size + SLACK_ABS))`` — the one
    definition of the exactness-slacked integer threshold used by every
    Jaccard/containment prune AND verify site, so prune and verify can
    never disagree at a boundary."""
    return F.ceil(value - (F.lit(SLACK_PER_UNIT) * size + F.lit(SLACK_ABS)))


def sql_slacked_ceil(value_sql: str, size_sql: str) -> str:
    """SQL twin of :func:`slacked_ceil` for the DuckDB oracles."""
    return f"ceil({value_sql} - (1e-12 * ({size_sql}) + 1e-9))"


def exact_jaccard(
    pairs: DataFrame, sets: DataFrame, min_threshold: float | None = None
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard:
    |A∩B| / (|A|+|B|-|A∩B|), computed as array_intersect over each
    document's sorted shingle-hash array (from :func:`shingle_sets`).
    Set-per-row beats an exploded shingle equi-join by ~|shingles| in
    shuffle volume once the pair list is bounded (post
    estimate_filter_pairs). Join strategy left to AQE (see
    estimate_filter_pairs).

    ``min_threshold`` applies the EXACT integer threshold predicate
    J ≥ t ⟺ n_inter·(1+t) ≥ t·(|A|+|B|) ⟺ n_inter ≥
    ⌈t·(|A|+|B|)/(1+t)⌉ (size-scaled slack via :func:`slacked_ceil` so
    float rounding never excludes a true pair at ANY set size) — NOT a
    filter on the display-rounded ``jaccard`` column,
    whose 4-digit rounding would admit pairs with true J ∈ [t−5e-5, t)
    only when the caller's prunes happened to emit them (ADVICE r11:
    prune-dependent boundary membership). The rounded ``jaccard`` stays
    in the output as a display column."""
    sa = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b"))
    n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    if min_threshold is not None:
        o_min = slacked_ceil(
            F.lit(min_threshold)
            / (1 + min_threshold)
            * (F.col("sz_a") + F.col("sz_b")),
            F.col("sz_a") + F.col("sz_b"),
        )
        joined = joined.filter(n_inter >= o_min)
    return joined.select(
        "id_a",
        "id_b",
        pround(
            n_inter.cast("double")
            / (F.col("sz_a") + F.col("sz_b") - n_inter),
            4,
        ).alias("jaccard"),
    )


def minhash_lsh_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Full near-dup pipeline: shingle sets → minhash → LSH band buckets →
    signature-estimate prune → exact Jaccard verify ≥ threshold.
    Returns (id_a, id_b, jaccard).

    Shape at scale: ONE narrow pass builds per-doc shingle arrays +
    signatures (no shuffle at all); the only shuffles are the band-bucket
    self-join (bucket-local, sub-quadratic) and the two verify joins on the
    surviving pair list. The estimate prune keeps the pipeline robust to
    low-selectivity corpora, where bucket joins alone would admit O(n²)
    candidates. The fused per-doc row feeds three consumers — persist it
    once; every stage below selects the columns it needs from it."""
    sets = shared(shingle_signatures(df, text_col, id_col, k))
    # band join with carried signatures: the estimate prune is a map-side
    # filter on the join output, THEN band-duplicates collapse — the
    # dedup shuffle moves only the pruned survivors, not the raw flood,
    # and the flood never re-joins the signature table (banded_pair_nmatch).
    pruned = (
        banded_pair_nmatch(sets)
        .filter(F.col("n_match") >= EST_MIN_MATCHES)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return exact_jaccard(pruned, sets).filter(F.col("jaccard") >= threshold)


def minhash_lsh_dedup_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Ingest-time near-dup check: (id_a = NEW doc, id_b = CORPUS doc,
    jaccard) for each new document's near-duplicates in the existing
    corpus. The band join is new x corpus only — the corpus is never
    self-joined, so a batch of B new docs against an N-doc corpus costs
    O(B + N) band rows and bucket-local probes, not the O(N^2) of
    re-running full dedup per ingest. Callers drop (or canonical-merge)
    the flagged new docs before appending; composes with the
    watermark-bounded STREAMING exact dedup (streaming/dedup.py) as the
    fuzzy tier of the same ingest gate.

    Ids must be unique ACROSS both frames (one id space — the ingest
    reality); estimate-prune and exact-verify reuse the batch stages over
    the unioned per-doc rows.

    Caching contract (same as minhash_lsh_dedup): both signature frames
    persist via the scoped registry (operators/_scope.py) for the
    consumer's action — one-shot callers (battery, bench with its
    per-query clearCache) are fine; a long-lived loop MUST bound the
    registry by wrapping each iteration in ``api.shared_scope(spark)``
    (or calling ``api.release_shared`` after consuming each batch), the
    way streaming/ingest.NearDupIngestGate scopes its persists per
    batch."""
    new_sets = shared(shingle_signatures(new_docs, text_col, id_col, k))
    corpus_sets = shared(shingle_signatures(corpus_docs, text_col, id_col, k))
    cand = (
        lsh_bands(new_sets)
        .select(F.col("id").alias("id_a"), "bk")
        .join(
            lsh_bands(corpus_sets).select(F.col("id").alias("id_b"), "bk"), "bk"
        )
        .select("id_a", "id_b")
    )
    both = new_sets.unionByName(corpus_sets)
    pruned = estimate_filter_pairs(cand, both).dropDuplicates(["id_a", "id_b"])
    return exact_jaccard(pruned, both).filter(F.col("jaccard") >= threshold)


def frequency_ordered_sets(sets: DataFrame) -> DataFrame:
    """Reorder each document's shingle array by ascending GLOBAL document
    frequency (ties broken by hash). Prefix filtering stays exact under any
    one consistent global total order — rarest-first is the canonical
    choice (PPJoin literature) because it makes prefixes maximally
    selective: common phrases ("of the", boilerplate) land at the tail and
    never enter the candidate join, so bucket sizes track rarity, not
    popularity. Costs one linear shuffle of the exploded shingle table —
    the right trade at corpus scale, where candidate generation is the
    only quadratic risk."""
    ex = sets.select("id", F.explode("hs").alias("h"))
    dfreq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(dfreq, "h")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("s"))
        .select(
            "id",
            F.transform("s", lambda x: x["h"]).alias("hs"),
            F.size("s").cast("bigint").alias("sz"),
        )
    )


def _prefix_filter_candidates(
    sets: DataFrame, threshold: float, prefix_slack: float | None = None
) -> DataFrame:
    """Candidate (id_a, id_b) pairs for the symmetric Jaccard join via
    prefix filtering over a (id, hs, sz) sets frame — the candidate stage
    of :func:`ngram_jaccard_pairs`, factored out so the A/B bench
    harness can count candidates per prune form.

    ``prefix_slack`` is the exactness slack on the prefix ceil: an
    unslacked ceil(sz*t) can round up past an exact integer and shorten
    the prefix by one element, silently dropping a true pair whose only
    shared prefix shingle sits at the boundary position (same fix as
    _containment_join). The default ``None`` uses the production
    size-scaled slack (:func:`slacked_ceil`); a float pins a FIXED slack
    for A/B instrumentation (``0.0`` reproduces the pre-r11 unslacked
    form) — never correct for production use at integer-boundary
    thresholds."""
    if prefix_slack is None:
        prefix_ceil = slacked_ceil(F.col("sz") * threshold, F.col("sz"))
    else:
        # A/B instrumentation: pin ONLY the prefix ceil's slack; o_min and
        # the ratio prunes below always use the production form so the
        # experiment isolates the prefix-length decision.
        prefix_ceil = F.ceil(F.col("sz") * threshold - F.lit(prefix_slack))
    prefix_len = (F.col("sz") - prefix_ceil + 1).cast("int")
    prefixes = sets.select(
        "id",
        "sz",
        F.posexplode(F.slice(F.col("hs"), F.lit(1), prefix_len)).alias("pos", "h"),
    )
    a = prefixes.alias("a")
    b = prefixes.alias("b")
    # Minimum overlap for J >= t, with the size-scaled slack so float
    # rounding can only ADMIT a borderline candidate (verified exactly
    # later), never prune a true pair at any set size.
    o_min = slacked_ceil(
        F.lit(threshold)
        / (1 + threshold)
        * (F.col("a.sz") + F.col("b.sz")),
        F.col("a.sz") + F.col("b.sz"),
    )
    overlap_ub = 1 + F.least(
        F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
    )
    return a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            F.col("a.sz")
            >= F.col("b.sz") * threshold
            - (F.lit(SLACK_PER_UNIT) * F.col("b.sz") + F.lit(SLACK_ABS))
        )
        & (
            F.col("b.sz")
            >= F.col("a.sz") * threshold
            - (F.lit(SLACK_PER_UNIT) * F.col("a.sz") + F.lit(SLACK_ABS))
        )
        & (overlap_ub >= o_min),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.7,
    freq_order: bool = False,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join via prefix filtering (the
    PPJoin-family pruning, public similarity-join literature): a pair with
    J ≥ t must share an element within each side's prefix of the
    (sz − ⌈t·sz⌉ + 1) globally-smallest shingle hashes — so the candidate
    join explodes ONLY prefixes, not whole shingle sets, and is exact (no
    LSH false negatives). Two further exact prunes run INSIDE the join
    (before the dedup shuffle ever sees a pair):

    - length filter: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t;
    - positional filter: a match at prefix positions (pa, pb) bounds the
      overlap by 1 + min(|A|−pa−1, |B|−pb−1), which must reach
      ⌈t·(|A|+|B|)/(1+t)⌉ — kills matches that occur too deep in either
      prefix to ever satisfy the threshold.

    Verification reuses the per-row array intersection. Returns
    (id_a, id_b, jaccard ≥ threshold).

    ``freq_order=True`` reorders shingles rarest-first
    (:func:`frequency_ordered_sets`) before slicing prefixes: the right
    call on real Zipf-distributed corpora (boilerplate phrases never enter
    the candidate join) at the cost of one linear shuffle; on the flat
    synthetic bench corpus the shuffle costs more than the ~40% candidate
    reduction saves, so it defaults off.

    Scale shape: prefix explode is ~(1−t)·|shingles| rows; the equi-join on
    the hash is the only shuffle and it is bounded by prefix length."""
    sets = shingle_sets(df, text_col, id_col, k)
    if freq_order:
        sets = frequency_ordered_sets(sets)
    sets = shared(sets)
    pairs = _prefix_filter_candidates(sets, threshold)
    # Duplicate candidates (pairs sharing several prefix tokens, ~4% on
    # this corpus) are collapsed AFTER verification: the verify joins are
    # broadcast (sets is small relative to executors) so dupes only add
    # narrow work, and dropping duplicates early would shuffle the whole
    # candidate set just to save it. Jaccard is identical per pair, so
    # late dedup changes nothing. Verification is the exact INTEGER
    # predicate (min_threshold) — the module's exactness contract holds
    # at the boundary, independent of which prunes emitted the pair.
    return exact_jaccard(pairs, sets, min_threshold=threshold).dropDuplicates(
        ["id_a", "id_b"]
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
    freq_order: bool = False,
) -> DataFrame:
    """EXACT n-gram containment join: ordered pairs (id_a, id_b) where at
    least ``threshold`` of A's distinct k-shingles also appear in B —
    ``C(A→B) = |A∩B| / |A|``. The ASYMMETRIC sibling of
    :func:`ngram_jaccard_pairs`: a short document quoted wholesale inside
    a long one has high containment but low Jaccard (the length-ratio
    filter J ≥ t forces |B| ≤ |A|/t, so the symmetric join structurally
    cannot see quote-inclusion — and MinHash-LSH, tuned for Jaccard,
    misses it too). This is the dedup tier that catches aggregator pages,
    quote farms, and copy-with-commentary.

    Exactness: if C(A→B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so A∩B cannot fit in
    A's suffix of ⌈t·|A|⌉ − 1 elements — A's PREFIX of the
    (|A| − ⌈t·|A|⌉ + 1) globally-smallest shingles must intersect B.
    Hence the candidate join explodes only A-side prefixes, but — unlike
    the Jaccard join — the B side is the FULL inverted index (no upper
    bound on |B| exists for containment, the defining asymmetry of
    set-containment joins). Two exact prunes run inside the join:

    - size filter: |B| ≥ ⌈t·|A|⌉ (B must hold the whole overlap);
    - positional filter: a match at positions (pa, pb) of the sorted
      arrays bounds the overlap by 1 + min(|A|−pa−1, |B|−pb−1) ≥ ⌈t·|A|⌉.

    Scale shape: the B-side index shuffles 8-byte hashes (the
    source_ngram_overlap argument — never text); A-side explode is
    ~(1−t)·|shingles| rows. Candidate volume concentrates on SHARED
    hashes, so the hot-shingle (boilerplate gram) bucket is the residual
    skew shape — ``freq_order=True`` reorders shingles rarest-first
    (:func:`frequency_ordered_sets`), keeping boilerplate grams out of
    every A-prefix, the same Zipf argument as the Jaccard join (defaults
    off: the flat synthetic corpus doesn't repay the reorder shuffle).
    Verification is one per-row array intersection over the bounded pair
    list. Returns (id_a, id_b, containment ≥ threshold), both directions
    of an exact-duplicate pair."""
    sets = shingle_sets(df, text_col, id_col, k)
    if freq_order:
        sets = frequency_ordered_sets(sets)
    sets = shared(sets)
    return _containment_join(sets, sets, threshold, exclude_same_id=True)


def containment_pairs_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Ingest-time containment check: (id_a = NEW doc, id_b = CORPUS doc,
    containment) for each new document mostly-contained in an existing
    corpus document — the asymmetric tier of the same ingest gate
    :func:`minhash_lsh_dedup_incremental` serves for Jaccard ("this
    'new' page is an aggregator quoting what we already have"). Only the
    new batch's prefixes explode; the corpus side is the full hash-only
    inverted index, probed new×corpus ONLY — the corpus is never
    self-joined, so a B-doc batch against an N-doc corpus costs
    O(B_prefixes + N_shingles) index rows, not O(N²). Ids must be unique
    across both frames (one id space — the ingest reality). Same caching
    contract as the Jaccard incremental (scoped persists; long-lived
    loops wrap iterations in ``api.shared_scope``)."""
    new_sets = shared(shingle_sets(new_docs, text_col, id_col, k))
    corpus_sets = shared(shingle_sets(corpus_docs, text_col, id_col, k))
    return _containment_join(
        new_sets, corpus_sets, threshold, exclude_same_id=False
    )


def _containment_candidates(
    sets_a: DataFrame,
    sets_b: DataFrame,
    threshold: float,
    exclude_same_id: bool,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs of the containment join — the
    A-prefix × B-full-index stage of :func:`_containment_join`, factored
    out so the A/B harness can count candidates per form. Emits one row
    per SHARED prefix hash (band-duplicated, like the LSH candidate
    stage): the caller collapses duplicates."""
    # size-scaled slack so float rounding can only ADMIT a borderline
    # candidate (verified exactly later), never prune a true pair. The
    # prefix length must use the SAME slacked ceil as o_min: when sz*t
    # rounds up past an exact integer in IEEE doubles (t=0.55, 0.67,
    # 0.81, ... at many sizes) an unslacked ceil shortens the prefix by
    # one and a true pair whose first shared shingle sits at the boundary
    # position is dropped.
    o_min_a = slacked_ceil(F.col("a.sz") * threshold, F.col("a.sz"))
    prefix_len = (
        F.col("sz") - slacked_ceil(F.col("sz") * threshold, F.col("sz")) + 1
    ).cast("int")
    a = sets_a.select(
        "id",
        "sz",
        F.posexplode(F.slice(F.col("hs"), F.lit(1), prefix_len)).alias(
            "pos", "h"
        ),
    ).alias("a")
    b = sets_b.select(
        "id", "sz", F.posexplode(F.col("hs")).alias("pos", "h")
    ).alias("b")
    overlap_ub = 1 + F.least(
        F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
    )
    cond = (
        (F.col("a.h") == F.col("b.h"))
        & (F.col("b.sz") >= o_min_a)
        & (overlap_ub >= o_min_a)
    )
    if exclude_same_id:
        cond = cond & (F.col("a.id") != F.col("b.id"))
    return a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
    )


def _containment_join(
    sets_a: DataFrame,
    sets_b: DataFrame,
    threshold: float,
    exclude_same_id: bool,
) -> DataFrame:
    """Core A-prefix × B-full-index containment join over two (id, hs,
    sz) frames — the ONE definition behind :func:`containment_pairs`
    (sets_a is sets_b, same-id pairs excluded) and
    :func:`containment_pairs_incremental` (disjoint id spaces)."""
    pairs = _containment_candidates(
        sets_a, sets_b, threshold, exclude_same_id
    )
    sa = sets_a.select(
        F.col("id").alias("id_a"), F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets_b.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    # verify on the INTEGER overlap (n_inter >= ceil(sz_a*t - slack)) — the
    # same predicate the candidate prunes enforce — so prune and verify
    # cannot disagree; pround is display-only. Filtering on the rounded
    # ratio instead would pass pairs whose true ratio sits in [t-5e-5, t)
    # at large sz_a, pairs the prunes may already have dropped.
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            n_inter.cast("bigint")
            >= slacked_ceil(F.col("sz_a") * threshold, F.col("sz_a"))
        )
        .select(
            "id_a",
            "id_b",
            pround(n_inter.cast("double") / F.col("sz_a"), 4).alias(
                "containment"
            ),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    threshold: float = 0.35,
    pair_chunk_rows: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with coarse-cell blocking: the pair
    join runs only WITHIN a quantization cell (here the precomputed
    ``cell_col``; in a full pipeline the IVF/k-means assignment), which is
    what keeps an all-pairs cosine join sub-quadratic at corpus scale.
    Shape: ONE linear shuffle of (id, vector) rows by cell
    (``applyInPandas``), then the quadratic pairing happens in memory per
    cell over the upper triangle — pair rows with duplicated vectors are
    never materialized, so shuffle volume is corpus-linear instead of
    candidate-quadratic. FP accumulation is dimension-sequential
    (oracle-exact; see similarity module docstring). A pathologically fat
    cell is handled by blocking the upper triangle into fixed-size row
    chunks (scratch memory O(chunk·n) instead of O(n²)); per-pair FP order
    is unchanged, so chunked and unchunked results are bit-identical.
    Returns (id_a, id_b, cosine ≥ threshold), deterministic and
    oracle-checkable."""
    import numpy as np

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score_cell(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=pdf["id"].dtype),
                    "id_b": pd.Series([], dtype=pdf["id"].dtype),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.vstack(
            pdf["v"].iloc[order].map(lambda x: np.asarray(x, dtype=np.float64))
        )
        sq = np.zeros(n)
        for d in range(M.shape[1]):  # dimension-sequential: oracle FP order
            col = M[:, d]
            sq = sq + col * col
        nrm = np.sqrt(sq)
        # Block the upper triangle: row chunk [s, e) pairs against all
        # j > i. Scratch per chunk is O(chunk·n) — a fat cell degrades to
        # more iterations, never to O(n²) memory. Per-pair accumulation
        # stays dimension-sequential, so chunking never changes a value.
        chunk = max(1, pair_chunk_rows)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype=ids.dtype),
                "id_b": pd.Series(dtype=ids.dtype),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        frames = [empty]  # single-row cells: no pairs, concat stays valid
        for s in range(0, n - 1, chunk):
            e = min(s + chunk, n - 1)
            counts = n - 1 - np.arange(s, e)
            iu = np.repeat(np.arange(s, e), counts)
            jv = np.concatenate([np.arange(i + 1, n) for i in range(s, e)])
            dot = np.zeros(len(iu))
            for d in range(M.shape[1]):
                col = M[:, d]
                dot = dot + col[iu] * col[jv]
            cos = np.floor(dot / (nrm[iu] * nrm[jv]) * 1e4 + 0.5) / 1e4
            keep = cos >= threshold
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": ids[iu[keep]],
                        "id_b": ids[jv[keep]],
                        "cosine": cos[keep],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    v = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("v"),
    )
    return v.groupBy("cell").applyInPandas(score_cell, schema=out_schema)


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

    return fan_out(df).select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash")
    )


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


def golden_records(
    rows: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """(cluster_id, n_members, canonical_id, <field per rule>): the
    FIELD-LEVEL survivorship merge of entity resolution — after fuzzy
    matching (:func:`containment_pairs`, linkage.fuzzy_pairs, MinHash)
    and :func:`~py_gtfs_duckdb_spark.operators.graph.connected_components`
    resolve which rows are one entity, the "golden record" takes each
    FIELD from the best row FOR THAT FIELD (the MDM survivorship step):
    unlike :func:`keep_canonical`, which keeps one whole row, the merged
    record may combine fields from different members.

    ``rules`` maps field → one of:

    - ``min`` / ``max``: plain extremum (ids, timestamps, counters);
    - ``longest`` / ``shortest``: the value from the member whose FIELD
      string is longest/shortest — "most complete value wins", the
      standard completeness rule; ties break on the member id, null
      fields never win (an all-null field stays null).

    Every rule is a COMBINABLE aggregation (min/max/max_by with a
    (length, id) struct key), so per-cluster state is one candidate per
    field regardless of cluster size — the boilerplate mega-cluster that
    bans cluster-keyed windows (SCALING.md §6) costs nothing here.
    ``clusters`` is the (id, cluster_id) frame from connected
    components; ``canonical_id`` (min member id) and ``n_members`` are
    always emitted."""
    rules = rules or {}
    j = rows.join(
        clusters.select(F.col("id").alias(id_col), "cluster_id"), id_col
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min(id_col).alias("canonical_id"),
    ]
    for field, how in rules.items():
        c = F.col(field)
        if how == "min":
            aggs.append(F.min(c).alias(field))
        elif how == "max":
            aggs.append(F.max(c).alias(field))
        elif how in ("longest", "shortest"):
            # null-keyed rows are ignored by max_by/min_by, so a null
            # field never outranks a present one
            key = F.when(
                c.isNotNull(),
                F.struct(
                    F.length(c.cast("string")).alias("l"),
                    F.col(id_col).alias("i"),
                ),
            )
            agg = F.max_by(c, key) if how == "longest" else F.min_by(c, key)
            aggs.append(agg.alias(field))
        else:
            raise ValueError(
                f"golden_records: unknown rule {how!r} for field {field!r}"
            )
    return j.groupBy("cluster_id").agg(*aggs)


_INTEGRAL_TYPES = {"boolean", "tinyint", "smallint", "int", "bigint"}


def _rank_key(j: DataFrame, score_col: str, id_col: str) -> Column:
    """The dedup-action ranking (``quality DESC NULLS LAST, id ASC``)
    encoded as an ASCENDING-sortable struct, so argmin machinery
    (``min_by``, ``array_sort``) reproduces exactly the order a rank
    window over ``desc_nulls_last(score), asc(id)`` would produce:

    - ``u``: 0 for scored members, 1 for unscored — NULLS LAST;
    - ``nn``: 0 for NaN float/double scores, 1 otherwise — NaN FIRST
      among scored members, exactly where the rank window put it
      (Spark's total order treats NaN as greater than any number, so
      ``desc_nulls_last`` ranked NaN above +Infinity; naive negation
      would have silently flipped NaN to LAST). Constant 1 for
      non-floating types, which have no NaN.
    - ``nq``: the order-reversed score — higher quality sorts first.
      Integral types (and boolean) reverse via ``bitwise_not`` on a
      BIGINT cast: exact at full 64-bit range, no ``-Long.MinValue``
      overflow, no silent 2^53 double-precision collapse. Date and
      timestamp scores (the keep-NEWEST-member policy) reverse the same
      way over their exact integer encodings: ``unix_date`` for dates,
      ``unix_micros`` for instants, and for ``timestamp_ntz`` a
      session-timezone-FREE (day, microsecond-of-day) decomposition —
      casting NTZ through ``timestamp`` would interpret the wall clock
      in the session zone, which is non-injective across a DST
      fall-back (two distinct NTZ values, one instant) and would let
      the tie fall through to smallest id instead of the true NTZ
      descending order. Fractional and decimal types negate NATIVELY
      (exact; ``-0.0`` vs ``0.0`` agrees with Spark's descending double
      order; NaN is pinned by ``nn`` above). Any other score type
      raises: an un-negatable type would otherwise rank garbage
      silently, where the old rank window ordered it natively.
    - ``i``: the member id — deterministic tie-break, and unique per
      cluster member, so comparisons never fall through past it."""
    dt = dict(j.dtypes).get(score_col)
    c = F.col(score_col)
    nn = F.lit(1)
    if dt in _INTEGRAL_TYPES:
        nq = F.bitwise_not(F.coalesce(c.cast("bigint"), F.lit(0)))
    elif dt == "date":
        nq = F.bitwise_not(F.coalesce(F.unix_date(c), F.lit(0)))
    elif dt == "timestamp":
        nq = F.bitwise_not(F.coalesce(F.unix_micros(c), F.lit(0)))
    elif dt == "timestamp_ntz":
        # timezone-independent exact micros since epoch of the WALL
        # CLOCK: days (NTZ→date keeps the wall-clock date) plus
        # microsecond-of-day from the time fields. date_part('SECOND')
        # carries the fractional seconds at micro precision.
        micros = F.unix_date(c.cast("date")).cast("bigint") * F.lit(
            86_400_000_000
        ) + (
            (
                F.hour(c).cast("bigint") * 3600
                + F.minute(c).cast("bigint") * 60
            )
            * 1_000_000
            + (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("bigint")
        )
        nq = F.bitwise_not(F.coalesce(micros, F.lit(0)))
    elif dt in ("float", "double"):
        cc = F.coalesce(c, F.lit(0).cast(dt))
        nn = F.when(F.isnan(cc), F.lit(0)).otherwise(F.lit(1))
        nq = F.when(F.isnan(cc), F.lit(0).cast(dt)).otherwise(-cc)
    elif (dt or "").startswith("decimal"):
        nq = -F.coalesce(c, F.lit(0).cast(dt))
    else:
        raise TypeError(
            f"score column {score_col!r} has non-numeric type {dt!r}: the "
            "dedup actions rank by an order-reversed score and cannot "
            "reverse this type exactly — cast it to a numeric rank first"
        )
    return F.struct(
        c.isNull().cast("int").alias("u"),
        nn.alias("nn"),
        nq.alias("nq"),
        F.col(id_col).alias("i"),
    )


def keep_canonical(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """The dedup ACTION: one representative per near-dup cluster —
    highest score wins, ties to the smallest id (deterministic). Returns
    (cluster_col, kept_doc_id, n_members, kept_quality); callers
    anti-join the non-kept members out of the corpus.

    ``scores`` joins LEFT: a member missing from a partial score table
    (e.g. quality computed after a language filter) still counts in
    n_members and can still be kept (unscored members rank below any
    scored one, ties to smallest id; kept_quality is then null). An inner
    join here would silently delete entire clusters whose members all
    lack scores — fatal under the documented anti-join usage.

    Scale shape: ONE map-side-combinable aggregation — ``min_by`` on the
    :func:`_rank_key` struct picks the representative and ``count``
    sizes the cluster in the same ``groupBy``. No rank window: a
    boilerplate mega-cluster (millions of near-identical pages, the
    normal case in web-scale dedup, one connected component after CC)
    would put ALL its members into a single unsplittable sorted window
    partition; partial aggregation reduces each map task's slice of a
    hot cluster to one candidate before the shuffle, so skew costs
    nothing (guarded by ``test_plan_shapes.py`` and the mega-cluster
    fixture in ``test_scale_helpers.py``)."""
    j = clusters.join(scores, id_col, "left")
    best = F.min_by(
        F.struct(F.col(id_col).alias("i"), F.col(score_col).alias("s")),
        _rank_key(j, score_col, id_col),
    )
    return (
        j.groupBy(cluster_col)
        .agg(
            best.alias("__best"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
        .select(
            cluster_col,
            F.col("__best.i").alias("kept_doc_id"),
            "n_members",
            F.col("__best.s").alias("kept_quality"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al., "SemDeDup", 2023 — public arXiv:2303.09540): documents
    whose embeddings sit within ``threshold`` cosine of each other inside
    the same coarse cluster cell are semantic duplicates; keep ONE
    representative per transitive group. Composition of existing scale
    paths — no new shuffle shapes:

      cell-blocked cosine pairs (embedding_neardup_pairs: linear shuffle,
      per-cell in-memory upper triangle) → connected components
      (large-star/small-star, O(log n) rounds) → min-id representative.

    Returns (cluster_id, kept_vec_id, n_members); callers anti-join the
    non-kept members away. The representative is the smallest id (the
    SemDeDup paper keeps e.g. lowest-perplexity; with no score column on
    an embedding table, min id is the deterministic stand-in — callers
    with a score should use ``keep_canonical`` instead)."""
    from py_gtfs_duckdb_spark.operators.graph import connected_components

    pairs = embedding_neardup_pairs(df, vec_col, id_col, cell_col, threshold)
    cc = connected_components(pairs, "id_a", "id_b")
    return cc.groupBy(F.col("component").alias("cluster_id")).agg(
        F.min("id").alias("kept_vec_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )


def minhash_calibration(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(n_match, n_pairs, avg_jaccard): calibration curve of the MinHash
    estimator over the LSH candidate pairs — for each signature-agreement
    level (0..MINHASH_K matching positions), how many candidate pairs land
    there and what their EXACT shingle Jaccard averages. The audit that
    justifies EST_MIN_MATCHES: if the curve shows true Jaccard ~0.7 pairs
    spread below the prune line, the threshold is eating recall; if mass
    far below it survives to exact verification, the prune is too lax.

    Determinism: the exact Jaccard is quantized per-pair to basis points
    (floor(j * 10^4 + 0.5), integer) before the BIGINT sum, so the average
    is order-independent; the only float ops are one fixed-order division
    per output row.

    Shape at scale: identical to minhash_lsh_dedup (one narrow signature
    pass persisted, bucket-local band self-join, two hash-keyed joins on
    the deduped candidate list) plus a <= MINHASH_K+1-row aggregation."""
    sets = shared(shingle_signatures(df, text_col, id_col, k))
    # n_match comes straight off the band join (banded_pair_nmatch): the
    # candidate flood is annotated map-side and never re-joins the
    # signature table; band-duplicates carry identical n_match, so the
    # (id_a, id_b) collapse keeps any one of them.
    matched = banded_pair_nmatch(sets).dropDuplicates(["id_a", "id_b"])
    sa = sets.select(
        F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")
    )
    sb = sets.select(
        F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")
    )
    n_inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    j_bp = F.floor(
        n_inter.cast("double")
        / (F.col("sz_a") + F.col("sz_b") - n_inter)
        * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        matched.join(sa, "id_a")
        .join(sb, "id_b")
        .select("n_match", j_bp.alias("j_bp"))
        .groupBy("n_match")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            pround(
                F.sum("j_bp") / (F.count(F.lit(1)) * F.lit(10000.0)), 4
            ).alias("avg_jaccard"),
        )
    )


def keep_top_k(
    clusters: DataFrame,
    scores: DataFrame,
    k: int = 2,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
    n_salts: int = 64,
) -> DataFrame:
    """Generalized dedup action: keep the top-``k`` members per near-dup
    cluster instead of one — the retention knob real pipelines tune
    (duplicates are not worthless, they up-weight; capping the count per
    cluster bounds the up-weighting without deleting diversity).
    ``k=1`` degenerates to :func:`keep_canonical`'s choice. Returns
    (cluster_col, doc_id, rank, n_members, score) for the KEPT members;
    callers anti-join the rest out of the corpus.

    Same contracts as keep_canonical: scores join LEFT (unscored members
    rank below any scored one, ties to the smallest id — a missing score
    must never delete a cluster).

    Scale shape: salted two-phase top-k, NO rank window (a window keyed
    on the cluster id puts a boilerplate mega-cluster into one
    unsplittable sorted partition — the classic web-dedup skew). Phase 1
    groups by (cluster, salt): each of the ``n_salts`` sub-groups keeps
    only its best ``k`` members via sorted-array slice on the
    :func:`_rank_key` encoding, so a hot cluster's members split across
    salts and each aggregation buffer holds at most |cluster|/n_salts
    rows before truncating to k. Phase 2 merges the ≤ n_salts×k
    survivors per cluster (a bounded array) and re-slices to the global
    top-k; member counts sum from phase-1 partials. Raise ``n_salts``
    for hotter clusters — memory per task scales 1/n_salts."""
    j = clusters.join(scores, id_col, "left")
    # the member struct leads with :func:`_rank_key`'s fields — extracted
    # from the one shared definition (SimplifyExtractValueOps collapses
    # getField-over-struct to the underlying children) but laid out FLAT:
    # array_sort over a nested struct measured ~20% slower than the flat
    # encoding at sf0.1. The key ends in the unique id, so ordering
    # matches keep_canonical's argmin and never reaches the score payload.
    key = _rank_key(j, score_col, id_col)
    member = F.struct(
        key.getField("u").alias("u"),
        key.getField("nn").alias("nn"),
        key.getField("nq").alias("nq"),
        key.getField("i").alias("i"),
        F.col(score_col).alias("s"),
    )
    salted = j.select(
        cluster_col,
        member.alias("__m"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("__salt"),
    )
    part = salted.groupBy(cluster_col, "__salt").agg(
        F.slice(F.array_sort(F.collect_list("__m")), 1, k).alias("__cand"),
        F.count(F.lit(1)).cast("bigint").alias("__cnt"),
    )
    top = part.groupBy(cluster_col).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__cand"))), 1, k).alias(
            "__top"
        ),
        F.sum("__cnt").cast("bigint").alias("n_members"),
    )
    return top.select(cluster_col, "n_members", F.posexplode("__top")).select(
        cluster_col,
        F.col("col.i").alias(id_col),
        (F.col("pos") + 1).cast("bigint").alias("rank"),
        "n_members",
        F.col("col.s").alias("score"),
    )
