"""Extension battery: dedup, similarity search, multimodal, text analysis
(SURVEY.md §7 phase 5 — the LLM-data-pipeline operators, designed for
100 TB).

MinHash parity note: both sides derive shingle hashes from md5 hex (no
engine-private hash functions), so the whole MinHash+LSH pipeline is
bit-for-bit reproducible in the DuckDB oracle — the SQL below is generated
from the same permutation constants the Spark operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators import dedup as D
from py_gtfs_duckdb_spark.operators import graph as G
from py_gtfs_duckdb_spark.operators import multimodal as M
from py_gtfs_duckdb_spark.operators import similarity as S
from py_gtfs_duckdb_spark.operators import text as X
from py_gtfs_duckdb_spark.plans import query
from py_gtfs_duckdb_spark.plans._tables import t

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content digest; keeper = min id.
    Shuffles 16-byte digests, never document bodies."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


@query(
    "q_dedup_bow",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
               regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS bow_hash,
           MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q_dedup_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: documents with identical distinct-token sets
    collapse (order/word-frequency insensitive near-exact dedup)."""
    d = t(spark, sf_dir, "documents")
    bow = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
                )
            ),
            " ",
        )
    )
    return (
        d.select(bow.alias("bow_hash"), "doc_id")
        .groupBy("bow_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _minhash_ctes(
    pair_pred: str = "a.id < b.id",
    base: str = "documents",
) -> str:
    """The shared MinHash CTE chain ``w → sh → perms → sig → bands →
    cand → sets`` (shingles, signatures, LSH candidates, exact shingle
    sets) — composed by the dedup oracle and the calibration oracle.
    Must follow a ``WITH``."""
    perms_values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(D.MINHASH_PERMS)
    )
    rows_per_band = D.MINHASH_K // D.LSH_BANDS
    return f"""w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM {base}
    ), sh AS (
        SELECT id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
        FROM (
            SELECT DISTINCT id,
                   unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                           for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
            FROM w
        )
    ), perms AS (
        SELECT * FROM (VALUES {perms_values}) t(perm_idx, a, b)
    ), sig AS (
        SELECT id, perm_idx,
               MIN(((h % {D.MINHASH_P}) * a + b) % {D.MINHASH_P}) AS minhash
        FROM sh CROSS JOIN perms GROUP BY id, perm_idx
    ), bands AS (
        SELECT id, perm_idx // {rows_per_band} AS band_idx,
               md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm_idx))
                   AS band_key
        FROM sig GROUP BY id, perm_idx // {rows_per_band}
    ), cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND {pair_pred}
    ), sets AS (
        SELECT id, list_sort(list(h)) AS hs, COUNT(*) AS sz FROM sh GROUP BY id
    )"""


def _minhash_oracle_sql(
    threshold: float = 0.7,
    pair_pred: str = "a.id < b.id",
    base: str = "documents",
) -> str:
    return f"""
    WITH {_minhash_ctes(pair_pred, base)}, est AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sig sa ON sa.id = c.id_a
        JOIN sig sb ON sb.id = c.id_b AND sb.perm_idx = sa.perm_idx
        GROUP BY c.id_a, c.id_b
        HAVING SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                   >= {D.EST_MIN_MATCHES}
    )
    SELECT e.id_a, e.id_b,
           floor((CAST(len(list_intersect(za.hs, zb.hs)) AS DOUBLE)
                  / (za.sz + zb.sz - len(list_intersect(za.hs, zb.hs))))
                 * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM est e
    JOIN sets za ON za.id = e.id_a
    JOIN sets zb ON zb.id = e.id_b
    WHERE floor((CAST(len(list_intersect(za.hs, zb.hs)) AS DOUBLE)
                 / (za.sz + zb.sz - len(list_intersect(za.hs, zb.hs))))
                * 10000.0 + 0.5) / 10000.0 >= {threshold}
    """


@query("q_dedup_minhash_lsh", oracle=_minhash_oracle_sql())
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification
    (shingle→minhash→band→bucket-join; see operators/dedup.py)."""
    d = t(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)


def _closure_ctes(pairs_sql: str, out_id: str = "doc_id") -> str:
    """CTE chain ``pairs → und → reach → clusters`` ending in
    (out_id, cluster_id) — the ONE definition of the transitive-closure
    oracle (recursive-CTE reachability over any (id_a, id_b) pair set).
    Must follow a ``WITH RECURSIVE``."""
    return f"""pairs AS ({pairs_sql}),
    und AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM und) nodes
        UNION
        SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.u
    ),
    clusters AS (
        SELECT CAST(u AS BIGINT) AS {out_id}, CAST(MIN(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY u
    )"""


def _clusters_oracle_ctes() -> str:
    """The MinHash instantiation of ``_closure_ctes`` — shared by
    q_dedup_clusters and q_dedup_keep_canonical."""
    return _closure_ctes(_minhash_oracle_sql())


@query(
    "q_dedup_clusters",
    # Transitive closure of the near-dup pairs: cluster = min reachable
    # doc id. The oracle runs the SAME pairs SQL, then a recursive CTE for
    # reachability — an end-to-end check of the iterative Spark algorithm.
    oracle=f"""
    WITH RECURSIVE {_clusters_oracle_ctes()}
    SELECT doc_id, cluster_id FROM clusters
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair → cluster resolution: connected components over the MinHash
    near-dup pairs (operators/graph.py min-label propagation); cluster id =
    the canonical (minimum) doc id, i.e. the representative a dedup
    pipeline keeps."""
    d = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _ngram_jaccard_oracle_sql(threshold: float = 0.7) -> str:
    return f"""
    WITH w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
        FROM (
            SELECT DISTINCT id,
                   unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                           for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
            FROM w
        )
    ), sets AS (
        SELECT id, list_sort(list(h)) AS hs, COUNT(*) AS sz FROM sh GROUP BY id
    ), prefixes AS (
        SELECT id, unnest(list_slice(hs, 1,
                   CAST(sz - {D.sql_slacked_ceil(f"sz * {threshold}", "sz")}
                        + 1 AS INT))) AS h
        FROM sets
    ), cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM prefixes a JOIN prefixes b ON a.h = b.h AND a.id < b.id
    )
    SELECT c.id_a, c.id_b,
           floor((CAST(len(list_intersect(za.hs, zb.hs)) AS DOUBLE)
                  / (za.sz + zb.sz - len(list_intersect(za.hs, zb.hs))))
                 * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM cand c
    JOIN sets za ON za.id = c.id_a
    JOIN sets zb ON zb.id = c.id_b
    -- exact integer threshold predicate: J >= t iff
    -- n_inter >= ceil(t*(|A|+|B|)/(1+t)); jaccard above is display-only
    -- (a rounded-value filter would make boundary membership depend on
    -- which prunes emitted the candidate — ADVICE r11)
    WHERE len(list_intersect(za.hs, zb.hs))
          >= {D.sql_slacked_ceil(
              f"{threshold} / (1 + {threshold}) * (za.sz + zb.sz)",
              "za.sz + zb.sz",
          )}
    """


@query("q_dedup_ngram_jaccard", oracle=_ngram_jaccard_oracle_sql())
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join (prefix filtering — no LSH
    false negatives; see operators/dedup.py:ngram_jaccard_pairs)."""
    d = t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.7)


def _embedding_pairs_oracle_sql(threshold: float) -> str:
    """Cell-blocked cosine near-dup pair SQL over ``embeddings`` — the ONE
    definition, shared by q_dedup_embedding and q_semantic_dedup."""
    return f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_dot_product(a.v, b.v) / (a.nrm * b.nrm))
                 * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE floor((list_dot_product(a.v, b.v) / (a.nrm * b.nrm))
                * 10000.0 + 0.5) / 10000.0 >= {threshold}
    """


@query(
    "q_dedup_embedding",
    oracle=_embedding_pairs_oracle_sql(0.35),
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by the coarse cell (label ≙
    IVF centroid assignment) so the pair join never goes all-pairs."""
    e = t(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(e, "embedding", "vec_id", "label", 0.35)


@query(
    "q_dedup_simhash",
    # The oracle recomputes the md5-derived 64-bit SimHash bit-for-bit in
    # SQL (distinct whitespace tokens -> per-bit +/-1 majority -> two's
    # complement) and takes ALL pairs at Hamming <= 3; the Spark side's
    # 16-bit-chunk banding is exact for <= 3 by pigeonhole, so the result
    # sets must be identical.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(list_distinct(regexp_split_to_array(lower(text), '\s+')),
                         t -> t <> '') AS ts
      FROM documents
    ),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 16))::UBIGINT AS hv
      FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) t
    ),
    acc AS (
      SELECT doc_id, j.j,
             SUM(CASE WHEN (hv >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS a
      FROM h, (SELECT unnest(generate_series(0, 63)) AS j) j
      GROUP BY doc_id, j.j
    ),
    sig AS (
      SELECT doc_id,
             COALESCE(SUM(CASE WHEN a > 0 THEN (1::UBIGINT << j)::HUGEINT
                           ELSE 0 END), 0) AS u
      FROM acc GROUP BY doc_id
    ),
    s AS (
      SELECT t.doc_id AS id,
             CAST(CASE WHEN s.u >= 9223372036854775808
                       THEN s.u - 18446744073709551616
                       ELSE COALESCE(s.u, 0) END AS BIGINT) AS simhash
      FROM toks t LEFT JOIN sig s USING (doc_id)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM s a, s b
    WHERE a.id < b.id AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) — banded signature join;
    property-tested in tests/test_dedup.py and oracle-checked against a
    bit-exact SQL recomputation."""
    d = t(spark, sf_dir, "documents")
    sig = D.simhash_signatures(d, "text", "doc_id")
    pairs = D.simhash_near_pairs(sig, max_hamming=3)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "q_text_top_tokens",
    oracle=r"""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    )
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 100
    """,
)
def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy-hitters: top-100 lowercase tokens by
    frequency (tie-break token asc, deterministic LIMIT). Scale shape:
    explode is narrow, the count groupBy partial-aggregates map-side, and
    only per-partition token partials reach the shuffle — the standard
    vocab-stats pass of a training-data pipeline."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(100)
    )


@query(
    "q_text_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
               AS n_punct,
           floor((CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) > 0
                      THEN CAST(length(text) AS DOUBLE)
                           / len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                      ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS chars_per_word,
           floor((CASE WHEN length(text) > 0
                      THEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                           AS DOUBLE) / length(text)
                      ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS punct_ratio
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats — pure codegen'd column expressions."""
    return X.text_stats(t(spark, sf_dir, "documents"))


def _quality_oracle_sql() -> str:
    """(doc_id, quality) — the ONE definition of the heuristic quality
    oracle, shared by q_text_quality and q_dedup_keep_canonical so the
    formula can never drift between copies."""
    return r"""
    WITH s AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE)
                   AS n_words,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(the|and|of|to|in|is|a)\b')) AS DOUBLE) AS sw,
               CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                   AS n_punct
        FROM documents
    )
    SELECT doc_id,
           GREATEST(LEAST(floor((
               0.5 * LEAST(n_chars / 200.0, 1.0)
             + 0.5 * LEAST(CASE WHEN n_words > 0 THEN sw / n_words ELSE 0.0 END
                           * 5.0, 1.0)
             - 0.25 * LEAST(CASE WHEN n_chars > 0 THEN n_punct / n_chars
                            ELSE 0.0 END * 5.0, 1.0)) * 10000.0 + 0.5) / 10000.0,
             1.0), 0.0) AS quality
    FROM s
    """


@query("q_text_quality", oracle=_quality_oracle_sql())
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length/stopword/punctuation bands)."""
    return X.quality_score(t(spark, sf_dir, "documents"))


@query(
    "q_lang_id",
    oracle=r"""
    WITH h AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(the|and|of|to|in|is|a)\b')) AS BIGINT) AS hits_en,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(der|die|das|und|ist|ein|nicht)\b')) AS BIGINT) AS hits_de,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(le|la|les|et|est|une|pas)\b')) AS BIGINT) AS hits_fr,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(el|la|los|y|es|una|que)\b')) AS BIGINT) AS hits_es
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr
                     AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
                WHEN hits_de >= hits_fr AND hits_de >= hits_es
                     AND hits_de > 0 THEN 'de'
                WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
                WHEN hits_es > 0 THEN 'es'
                ELSE 'und' END AS pred_lang,
           hits_en, hits_de, hits_fr, hits_es
    FROM h
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (n-gram heuristic class)."""
    return X.language_id(t(spark, sf_dir, "documents"))


@query(
    "q_doc_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint + BPE-ish token count."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fingerprint"),
        X.token_count(F.col("text")).alias("n_tokens"),
    )


@query(
    "q_doc_winnow",
    oracle="""
    WITH w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT id,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS n
        FROM w
    ), kg AS (
        SELECT id,
               [((hs[i] * 69069 + hs[i+1]) % 2147483647 * 69069 + hs[i+2])
                 % 2147483647
                for i in range(1, n - 2 + 1)] AS kh
        FROM wh WHERE n >= 3
    ), fp AS (
        SELECT id,
               list_distinct([list_min(kh[i : i + 3])
                              for i in range(1, greatest(len(kh) - 3, 1) + 1)])
                   AS fps
        FROM kg
    )
    SELECT id, unnest(fps) AS fp FROM fp
    """,
)
def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint sets: k-gram polynomial
    rolling hash, sliding-window minima (MOSS-style local fingerprinting;
    see operators/text.py:winnow_fingerprints). Any shared run of
    K+W-1 words between two documents shares a fingerprint."""
    d = t(spark, sf_dir, "documents")
    return X.winnow_fingerprints(d, "text", "doc_id")


# ---------------------------------------------------------------------------
# similarity search

_IVF_CENTROIDS: dict[str, list] = {}  # per-corpus trained centroids (see q_ann_ivf)
# ---------------------------------------------------------------------------


@query(
    "q_knn_cosine",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               floor((
                   list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))))
                   * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors: broadcast queries,
    one corpus scan, pairs scored by the vectorized Arrow kernel with
    oracle-exact FP order (similarity.batch_cosine_scores)."""
    e = t(spark, sf_dir, "embeddings")
    return S.cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)


from py_gtfs_duckdb_spark.operators import annq as AQ  # noqa: E402
from py_gtfs_duckdb_spark.plans import ann_oracles as AO  # noqa: E402


@query("q_ann_lsh", oracle=AO.lsh_oracle_sql(n_planes=6))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5, HASH-CHECKED end-to-end (round 6,
    was rows-only): integer-plane sign buckets over fixed-point quantized
    vectors are exact on both engines, multiprobe at Hamming distance 1,
    exact rounded cosine inside matching buckets
    (operators/annq.py:lsh_topk_q; the float production variant
    similarity.lsh_bucketed_topk keeps its recall contract in
    tests/test_similarity.py)."""
    e = t(spark, sf_dir, "embeddings")
    return AQ.lsh_topk_q(e, e.filter(F.col("vec_id") < 10), k=5, n_planes=6)


@query(
    "q_ann_ivf",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cnrm
        FROM vecs ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), assign AS (
        SELECT vec_id, v, nrm, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id
                   ORDER BY floor((list_dot_product(v, cv) / (nrm * cnrm))
                                  * 10000.0 + 0.5) / 10000.0 DESC, cid
               ) AS rn
        FROM vecs CROSS JOIN cent
    ), cells AS (
        SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid
        FROM assign WHERE vec_id < 10 AND rn <= 4
    ), cand AS (
        SELECT p.query_id, c.vec_id,
               floor((list_dot_product(p.qv, c.v) / (p.qn * c.nrm))
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM probes p JOIN cells c ON c.cid = p.cid AND c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS BIGINT) AS rank
        FROM cand
    ) WHERE rank <= 5
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: deterministic seed centroids, zero-shuffle
    cell assignment (centroid matrix in the task closure, one vectorized
    Arrow pass), nprobe=4 probe join with the query side broadcast. Fully
    oracle-checked — the cell partition, probe choice, and final ranking
    all replay exactly in SQL (dimension-sequential FP accumulation).

    Centroids are cached per corpus dir (train once, serve many — the
    IVF operating model; same pattern as the daily nominal-index
    rollover)."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = S.ivf_centroids(e, 16)
    return S.ivf_topk(
        e, e.filter(F.col("vec_id") < 10), k=5, centroids=_IVF_CENTROIDS[sf_dir]
    )


_IVF_LLOYD: dict[str, list] = {}


@query("q_ann_ivf_lloyd", oracle=AO.ivf_lloyd_oracle_sql(n_centroids=16, n_iter=2))
def q_ann_ivf_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with Lloyd-refined centroids, HASH-CHECKED end-to-end (round
    6, was rows-only): k-means runs over fixed-point QUANTIZED vectors so
    every training step — integer squared-distance assignment, exact
    BIGINT per-dim sums, floor-div means — is order-independent and
    replays bit-for-bit in the SQL oracle (2 unrolled iterations). Same
    serving plan as q_ann_ivf; only the 'train' step deepens
    (operators/annq.py:ivf_train_lloyd_q; the float trainer
    similarity.ivf_train_lloyd keeps its recall contract in
    tests/test_similarity.py)."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_LLOYD:
        _IVF_LLOYD[sf_dir] = AQ.ivf_train_lloyd_q(e, 16, n_iter=2)
    return S.ivf_topk(
        e, e.filter(F.col("vec_id") < 10), k=5, centroids=_IVF_LLOYD[sf_dir]
    )


@query(
    "q_embed_norm",
    oracle="""
    SELECT vec_id,
           floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))
                 * 10000.0 + 0.5) / 10000.0 AS l2_norm,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector L2 norms + dimension check — the cheap full-scan vector
    profile."""
    e = t(spark, sf_dir, "embeddings")
    from py_gtfs_duckdb_spark.operators.similarity import _norm

    from py_gtfs_duckdb_spark.functions import pround

    return e.select(
        "vec_id",
        pround(_norm(F.col("embedding")), 4).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@query(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT)
               AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload byte length + digest (the
    always-available face of the multimodal table)."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    docs = t(spark, sf_dir, "documents").select("doc_id", F.sha2("text", 256).alias("payload_sha"))
    return (
        media.select("media_id", F.octet_length("payload").cast("bigint").alias("n_bytes"))
        .join(docs, media.media_id == docs.doc_id)
        .select("media_id", "n_bytes", "payload_sha")
    )


# The documents table is ASCII (verified across SFs), so the deterministic
# fake-decode semantics (byte histogram / byte slices) are exactly
# SQL-expressible over the text column: char positions == byte offsets and
# ord(char) == byte value. That turns the mapInPandas plumbing into a real
# differential check (Arrow batch shape, dtype handling, null handling).
_FEATURE_HIST_SQL = """
    WITH codes AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             list_transform(range(1, length(text) + 1),
                            i -> ord(substring(text, i, 1))) AS cs
      FROM documents
    )
"""
_HIST_CELLS = ",\n        ".join(
    f"CAST(len(list_filter(cs, c -> c // 32 = {k})) AS DOUBLE)" for k in range(8)
)


@query(
    "q_multimodal_features",
    # SCALARIZED (round 6): the driver's pandas canonicalizer cannot hash
    # ArrayType cells (r5 red), so the feature vector is exploded to one
    # (media_id, feat_idx, feat_value) row per cell — the row-explosion
    # shape q_video_frames already passed with.
    oracle=_FEATURE_HIST_SQL
    + f"""
    , f AS (
      SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
             list_value(
        {_HIST_CELLS}
             ) AS features
      FROM codes
    )
    SELECT media_id, n_bytes,
           CAST(generate_subscripts(features, 1) - 1 AS INT) AS feat_idx,
           unnest(features) AS feat_value
    FROM f
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract plumbing over binary payloads (deterministic
    fake decoder — real decode stubbed per environment constraints).
    Output is scalar rows: one (feat_idx, feat_value) per feature cell."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    return M.extract_features(media, fake=True).select(
        "media_id",
        "n_bytes",
        F.posexplode("features").alias("feat_idx", "feat_value"),
    )


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(f.i AS INTEGER) AS frame_idx,
           CAST(LEAST(64, octet_length(encode(text)) - f.i * 64) AS BIGINT)
               AS frame_len,
           md5(substring(text, CAST(f.i * 64 + 1 AS BIGINT), 64)) AS frame_md5
    FROM documents, (SELECT unnest(generate_series(0, 3)) AS i) f
    WHERE f.i * 64 < octet_length(encode(text))
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling row-explosion shape over payload bytes; the md5 of
    each frame checks slice CONTENT, not just length."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    return M.sample_frames(media).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


@query(
    "q_multimodal_resize",
    # SCALARIZED (round 6): one (cell_idx, cell_value) row per resized
    # cell — the driver cannot hash ArrayType cells (r5 red).
    oracle=_FEATURE_HIST_SQL
    + f"""
    , h AS (
      SELECT doc_id,
             list_value(
        {_HIST_CELLS}
             ) AS px
      FROM codes
    ), r AS (
      SELECT doc_id AS media_id, 'image' AS kind,
             CAST(4 AS INTEGER) AS width, CAST(1 AS INTEGER) AS height,
             list_value((px[1] + px[2]) / 2, (px[3] + px[4]) / 2,
                        (px[5] + px[6]) / 2, (px[7] + px[8]) / 2) AS resized
      FROM h
    )
    SELECT media_id, kind, width, height,
           CAST(generate_subscripts(resized, 1) - 1 AS INT) AS cell_idx,
           unnest(resized) AS cell_value
    FROM r
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: decode → avg-pool to fixed width → metadata
    rewrite, Arrow-batched (operators/multimodal.py:resize_media). Output
    is scalar rows: one (cell_idx, cell_value) per resized cell."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    return M.resize_media(media, out_w=4).select(
        "media_id",
        "kind",
        "width",
        "height",
        F.posexplode("resized").alias("cell_idx", "cell_value"),
    )


# ---------------------------------------------------------------------------
# training-data pipeline composition (operators/pipeline.py)
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators import pipeline as P  # noqa: E402

# keep-rate per detected language for the sampling demo (per-ten-thousand)
_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25}
_SAMPLE_DEFAULT = 0.1

# the lang-id hits/CASE below mirror q_lang_id's oracle verbatim (kept
# inline there — it is driver-green and stays byte-identical)
def _lang_pred_sql(base: str = "documents") -> str:
    """(doc_id, pred_lang) — the ONE definition of the language-ID
    oracle, parameterized over the source relation so the curate
    composition can run it on redacted survivors."""
    return r"""
        SELECT doc_id,
               CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr
                         AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
                    WHEN hits_de >= hits_fr AND hits_de >= hits_es
                         AND hits_de > 0 THEN 'de'
                    WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
                    WHEN hits_es > 0 THEN 'es'
                    ELSE 'und' END AS pred_lang
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                       '\b(the|and|of|to|in|is|a)\b')) AS BIGINT) AS hits_en,
                   CAST(len(regexp_extract_all(lower(text),
                       '\b(der|die|das|und|ist|ein|nicht)\b')) AS BIGINT) AS hits_de,
                   CAST(len(regexp_extract_all(lower(text),
                       '\b(le|la|les|et|est|une|pas)\b')) AS BIGINT) AS hits_fr,
                   CAST(len(regexp_extract_all(lower(text),
                       '\b(el|la|los|y|es|una|que)\b')) AS BIGINT) AS hits_es
            FROM """ + base + r"""
        )
"""


_LANG_PRED_SQL = _lang_pred_sql()


@query(
    "q_sample_stratified",
    oracle=f"""
    WITH lang AS ({_LANG_PRED_SQL})
    SELECT doc_id, pred_lang
    FROM lang
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
          < CASE pred_lang
                WHEN 'en' THEN {int(_SAMPLE_RATES["en"] * 10000)}
                WHEN 'de' THEN {int(_SAMPLE_RATES["de"] * 10000)}
                WHEN 'fr' THEN {int(_SAMPLE_RATES["fr"] * 10000)}
                WHEN 'es' THEN {int(_SAMPLE_RATES["es"] * 10000)}
                ELSE {int(_SAMPLE_DEFAULT * 10000)} END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling for training-mix re-weighting:
    keep-rate by detected language, decided by an md5-derived unit hash
    of the doc id. Reproducible across runs and engines (no RNG, no
    sample() nondeterminism), join-free, single scan — the 100 TB shape
    is one codegen'd filter."""
    d = X.language_id(t(spark, sf_dir, "documents"))
    return P.stratified_sample(
        d.select("doc_id", "pred_lang"),
        "pred_lang",
        _SAMPLE_RATES,
        default_rate=_SAMPLE_DEFAULT,
    )


# Shared by q_decontaminate (exact broadcast tier) and
# q_decontaminate_bloom (bloom-prefilter tier): the two plans must return
# IDENTICAL rows — bloom membership has no false negatives and the exact
# verify join removes every false positive — so both hash against the
# same oracle. Winnow CTEs mirror q_doc_winnow's oracle verbatim.
_DECON_WINNOW_ORACLE = """
    WITH w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT id,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS n
        FROM w
    ), kg AS (
        SELECT id,
               [((hs[i] * 69069 + hs[i+1]) % 2147483647 * 69069 + hs[i+2])
                 % 2147483647
                for i in range(1, n - 2 + 1)] AS kh
        FROM wh WHERE n >= 3
    ), fpl AS (
        SELECT id,
               list_distinct([list_min(kh[i : i + 3])
                              for i in range(1, greatest(len(kh) - 3, 1) + 1)])
                   AS fps
        FROM kg
    ), fps2 AS (
        SELECT id, unnest(fps) AS fp FROM fpl
    ), bench AS (
        SELECT DISTINCT fp FROM fps2 WHERE id % 97 = 0
    )
    SELECT f.id AS doc_id, CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS n_shared
    FROM fps2 f JOIN bench b USING (fp)
    WHERE f.id % 97 <> 0
    GROUP BY f.id
    """


@query("q_decontaminate", oracle=_DECON_WINNOW_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing winnowed
    fingerprints with a held-out benchmark partition (here: doc_id % 97),
    with the shared-fingerprint count as audit evidence. The benchmark
    fingerprint set broadcasts (tiny by construction); the corpus side
    never reshuffles beyond the winnow window."""
    d = t(spark, sf_dir, "documents")
    return P.decontaminate(d, F.col("doc_id") % 97 == 0)


@query("q_decontaminate_bloom", oracle=_DECON_WINNOW_ORACLE)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME decontamination result through the Bloom-prefilter tier
    (operators/pipeline.py:bloom_decontaminate) — for when the benchmark
    fingerprint set outgrows an exact broadcast but its bitmask still
    fits: benchmark fps fold distributedly into a broadcast 1 Mi-bit
    mask (only DISTINCT SET BITS reach the driver — bounded by the mask
    size, never benchmark size), an Arrow pandas_udf probes the corpus
    fingerprints, and only probe-positives (true hits + ~fpp noise)
    shuffle into the exact verify join. No false negatives by
    construction, false positives killed by the verify — hash-identical
    to q_decontaminate, so it shares that oracle."""
    d = t(spark, sf_dir, "documents")
    return P.bloom_decontaminate(d, F.col("doc_id") % 97 == 0)


@query(
    "q_decontaminate_semantic",
    # brute-force replay: corpus x benchmark rounded cosines, threshold,
    # then the per-doc argmax with the (cosine DESC, bench_id ASC)
    # tie-break the Spark aggregation encodes as min((-cos, bench_id))
    oracle=f"""
    WITH {AO._VECS_CTE},
    bench AS (
        SELECT vec_id AS bench_id, v, nrm FROM vecs WHERE vec_id % 50 = 0
    ),
    corp AS (
        SELECT vec_id, v, nrm FROM vecs WHERE vec_id % 50 <> 0
    ),
    hits AS (
        SELECT c.vec_id, b.bench_id,
               floor((list_dot_product(c.v, b.v) / (c.nrm * b.nrm))
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM corp c CROSS JOIN bench b
    )
    SELECT vec_id, bench_id, cosine FROM (
        SELECT vec_id, bench_id, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY cosine DESC, bench_id ASC
               ) AS rn
        FROM hits WHERE cosine >= 0.35
    ) WHERE rn = 1
    """,
)
def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination
    (operators/similarity.py:semantic_decontaminate): corpus vectors
    within 0.35 cosine of any held-out 'benchmark' vector (vec_id % 50),
    each with its best-matching benchmark id as audit evidence — the
    semantic tier the n-gram q_decontaminate misses (paraphrased or
    re-templated eval items share no 8-gram). Benchmark broadcast,
    corpus scanned once, only above-threshold rows reach the combinable
    per-doc argmax."""
    e = t(spark, sf_dir, "embeddings")
    return S.semantic_decontaminate(
        e.filter(F.col("vec_id") % 50 != 0),
        e.filter(F.col("vec_id") % 50 == 0),
        threshold=0.35,
    )


@query(
    "q_pack_sequences",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
                   AS shard,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2048.0) AS BIGINT) AS bin
    FROM tk
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batch assembly: budget-boundary bins
    (2048 tokens) over a deterministic order within hash shards. One
    window shuffle; shards bound the window partition size at any corpus
    scale (operators/pipeline.py:pack_sequences)."""
    return P.pack_sequences(t(spark, sf_dir, "documents"), budget=2048, n_shards=32)


@query(
    "q_dedup_keep_canonical",
    # composes the SAME clusters CTEs and quality SQL as q_dedup_clusters
    # and q_text_quality — one definition each, no copies to drift
    oracle=f"""
    WITH RECURSIVE {_clusters_oracle_ctes()},
    q AS ({_quality_oracle_sql()}),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS nm
        FROM clusters c JOIN q ON q.doc_id = c.doc_id
    )
    SELECT cluster_id, doc_id AS kept_doc_id,
           CAST(nm AS BIGINT) AS n_members, quality AS kept_quality
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup ACTION: near-dup pairs -> connected components ->
    keep the highest-quality member per cluster (ties to smallest id).
    The complement of kept_doc_id over cluster members is the drop list a
    training pipeline applies (operators/dedup.py:keep_canonical)."""
    d = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    clusters = cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return D.keep_canonical(clusters, X.quality_score(d))


# ---------------------------------------------------------------------------
# corpus curation: repetition filters, rule-based quality, PII scrubbing,
# split accounting, per-source reporting (operators/text.py,
# operators/pipeline.py — extension mandate; the reference has no analogue)
# ---------------------------------------------------------------------------

_TOKEN_RE_SQL = r"\w+|[^\w\s]"


@query(
    "q_repetition_stats",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), base AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
               floor((CASE WHEN len(ws) > 0
                      THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
                           / len(ws)
                      ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS dup_word_frac
        FROM w
    ), g AS (
        SELECT doc_id, 2 AS n,
               unnest([array_to_string(ws[i : i + 1], ' ')
                       for i in range(1, len(ws) - 1 + 1)]) AS gram
        FROM w WHERE len(ws) >= 2
        UNION ALL
        SELECT doc_id, 3 AS n,
               unnest([array_to_string(ws[i : i + 2], ' ')
                       for i in range(1, len(ws) - 2 + 1)]) AS gram
        FROM w WHERE len(ws) >= 3
        UNION ALL
        SELECT doc_id, 5 AS n,
               unnest([array_to_string(ws[i : i + 4], ' ')
                       for i in range(1, len(ws) - 4 + 1)]) AS gram
        FROM w WHERE len(ws) >= 5
    ), counts AS (
        SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY doc_id, n, gram
    ), per_n AS (
        SELECT doc_id, n, MAX(c) AS top, SUM(c) AS total,
               COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS dup
        FROM counts GROUP BY doc_id, n
    ), gm AS (
        SELECT doc_id,
               floor(COALESCE(MAX(CASE WHEN n = 2
                          THEN CAST(top AS DOUBLE) / CAST(total AS DOUBLE) END),
                          0.0) * 10000.0 + 0.5) / 10000.0 AS top_2gram_frac,
               floor(COALESCE(MAX(CASE WHEN n = 3
                          THEN CAST(top AS DOUBLE) / CAST(total AS DOUBLE) END),
                          0.0) * 10000.0 + 0.5) / 10000.0 AS top_3gram_frac,
               floor(COALESCE(MAX(CASE WHEN n = 5
                          THEN CAST(dup AS DOUBLE) / CAST(total AS DOUBLE) END),
                          0.0) * 10000.0 + 0.5) / 10000.0 AS dup_5gram_frac
        FROM per_n GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words, b.dup_word_frac,
           COALESCE(gm.top_2gram_frac, 0.0) AS top_2gram_frac,
           COALESCE(gm.top_3gram_frac, 0.0) AS top_3gram_frac,
           COALESCE(gm.dup_5gram_frac, 0.0) AS dup_5gram_frac
    FROM base b LEFT JOIN gm USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition signals per document: duplicate-word
    fraction, top-{2,3}-gram occupancy, duplicated-5-gram mass — the
    repetition side of rule-based corpus filtering
    (operators/text.py:repetition_stats). One posexplode + lead() pass,
    id-keyed partial aggregation; nothing quadratic."""
    return X.repetition_stats(t(spark, sf_dir, "documents"))


def _sw_distinct_sql() -> str:
    """SUM of per-stopword presence flags — generated from the SAME
    LANG_STOPWORDS['en'] list the Spark operator uses."""
    cases = "\n            + ".join(
        f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b')"
        " THEN 1 ELSE 0 END)"
        for w in X.LANG_STOPWORDS["en"]
    )
    return f"CAST({cases} AS BIGINT)"


def _rules_flags_sql(base: str = "documents") -> str:
    """Per-rule boolean flags + conjunction — the ONE definition of the
    quality-rules oracle, parameterized over the source relation so the
    curate composition can apply it to dedup survivors."""
    return f"""
    WITH s AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
                   AS n_words,
               CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                   AS DOUBLE) AS alpha_chars,
               CAST(length(regexp_replace(text, '[^#…]', '', 'g')) AS DOUBLE)
                   AS symbols,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws,
               {_sw_distinct_sql()} AS sw_distinct
        FROM {base}
    ), r AS (
        SELECT doc_id,
               (n_words >= {X.RULE_MIN_WORDS}
                AND n_words <= {X.RULE_MAX_WORDS}) AS r_word_count,
               ((CASE WHEN n_words > 0 THEN alpha_chars / n_words ELSE 0.0 END)
                    >= {X.RULE_MIN_MEAN_WORD_LEN}
                AND (CASE WHEN n_words > 0 THEN alpha_chars / n_words
                     ELSE 0.0 END) <= {X.RULE_MAX_MEAN_WORD_LEN})
                   AS r_mean_word_len,
               ((CASE WHEN n_words > 0 THEN symbols / n_words ELSE 0.0 END)
                    <= {X.RULE_MAX_SYMBOL_RATIO}) AS r_symbol_ratio,
               ((CASE WHEN len(ws) > 0
                 THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
                 ELSE 0.0 END) <= {X.RULE_MAX_DUP_WORD_FRAC}) AS r_dup_words,
               (sw_distinct >= {X.RULE_MIN_DISTINCT_STOPWORDS}) AS r_stopwords
        FROM s
    )
    SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio, r_dup_words,
           r_stopwords,
           (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_dup_words
            AND r_stopwords) AS pass_all
    FROM r
    """


@query(
    "q_quality_rules",
    oracle=_rules_flags_sql(),
)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style boolean quality rules (word-count band, mean word
    length, symbol ratio, duplicate-word cap, stopword presence) plus the
    conjunction — pure codegen'd column expressions, scan-speed at any
    corpus size (operators/text.py:quality_rules)."""
    return X.quality_rules(t(spark, sf_dir, "documents"))


# Deterministic PII injection for the scrub demo: the synthetic documents
# corpus contains no digits at all, so scrubbing it raw would be a
# vacuously-green check (0 matches, redacted == text). Both sides append
# the SAME id-derived email / IPv4 / NANP-phone strings to a varying
# subset of rows, so match counts AND replacement content are genuinely
# exercised and oracle-compared.
_PII_AUG_SQL = """
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 2 = 0
                  THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                  THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                       || CAST(doc_id % 100 AS VARCHAR)
                  ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                  THEN ' call (' || CAST(200 + doc_id % 700 AS VARCHAR)
                       || ') 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS text
        FROM documents
"""


@query(
    "q_pii_scrub",
    oracle=(
        "    WITH aug AS (" + _PII_AUG_SQL + "    )\n"
        "    SELECT doc_id,\n"
        f"           CAST(len(regexp_extract_all(text, '{X.PII_EMAIL_RE}'))"
        " AS BIGINT) AS n_emails,\n"
        f"           CAST(len(regexp_extract_all(text, '{X.PII_IPV4_RE}'))"
        " AS BIGINT) AS n_ipv4,\n"
        f"           CAST(len(regexp_extract_all(text, '{X.PII_PHONE_RE}'))"
        " AS BIGINT) AS n_phones,\n"
        "           regexp_replace(regexp_replace(regexp_replace(text,\n"
        f"               '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),\n"
        f"               '{X.PII_IPV4_RE}', '<IP>', 'g'),\n"
        f"               '{X.PII_PHONE_RE}', '<PHONE>', 'g') AS redacted\n"
        "    FROM aug"
    ),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails / IPv4 / NANP phones) over
    deterministically PII-augmented documents — counts on the original
    text, typed-placeholder redaction, sequential pattern order shared
    with the oracle (operators/text.py:pii_scrub). Pure regexp column
    expressions: scan-speed, shuffle-free."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" mail user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call ("),
                (did % 700 + 200).cast("string"),
                F.lit(") 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return X.pii_scrub(d.select("doc_id", aug.alias("text")))


@query(
    "q_split_assign",
    oracle=r"""
    WITH s AS (
        SELECT CASE WHEN h < 9800 THEN 'train'
                    WHEN h < 9900 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_tokens
        FROM (
            SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000 AS h,
                   text
            FROM documents
        )
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split accounting: membership is a pure
    md5-hash function of the doc id (98/1/1), so re-runs and late shards
    land identically on any engine; roll-up is a 3-group aggregation with
    map-side combine (operators/pipeline.py:split_assign)."""
    return P.split_assign(t(spark, sf_dir, "documents"))


@query(
    "q_token_histogram",
    oracle=r"""
    WITH tk AS (
        SELECT CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT CAST(length(bin(greatest(n_tokens, 1))) - 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM tk GROUP BY 1
    """,
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram (bucket = binary digit count −
    1 — exact integer math, no float log2 edge cases). Drives packing
    budgets and truncation accounting
    (operators/pipeline.py:token_histogram)."""
    return P.token_histogram(t(spark, sf_dir, "documents"))


@query(
    "q_source_report",
    oracle=f"""
    WITH q AS ({_quality_oracle_sql()}),
    per AS (
        SELECT d.source,
               md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g')))) AS fp,
               CAST(len(regexp_extract_all(d.text, '{_TOKEN_RE_SQL}'))
                   AS BIGINT) AS n_tokens,
               CAST(floor(q.quality * 10000.0 + 0.5) AS BIGINT) AS q_bp
        FROM documents d JOIN q ON q.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
           floor((1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5)
               / 10000.0 AS exact_dup_frac,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           floor(CAST(SUM(q_bp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
               / 10000.0 AS mean_quality
    FROM per GROUP BY source
    """,
)
def q_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation report: doc count, exact-dup rate via
    the normalized fingerprint, token volume, fixed-point mean quality
    (integer sums — aggregation-order-independent across engines and
    executors). One hash aggregation keyed by source
    (operators/pipeline.py:source_report)."""
    return P.source_report(t(spark, sf_dir, "documents"))


# Domain-mix weights for q_mix_sources: four weighted sources (each budget
# below its corpus token total at every SF, so the boundary cut is always
# exercised), the other sixteen sources dropped by the zero default.
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_BUDGET = 2000
_MIX_CASE_SQL = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {int(w * _MIX_BUDGET)}"
    for s, w in sorted(_MIX_WEIGHTS.items())
) + " ELSE 0 END"


@query(
    "q_mix_sources",
    oracle=f"""
    WITH tk AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))
                   AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000 AS h
        FROM documents
    ), o AS (
        SELECT doc_id, source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY h % 64, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM tk
    )
    SELECT doc_id, source, n_tokens FROM o
    WHERE cum_before < {_MIX_CASE_SQL}
    """,
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted domain mixing: per-source document prefixes in
    deterministic unit-hash order until each source's share of the token
    budget is spent. The oracle is the naive one-window running total;
    the Spark side is the distributed prefix sum (per-bucket offsets +
    intra-bucket windows) that avoids one-fat-partition-per-source at
    100 TB (operators/pipeline.py:mix_sources)."""
    return P.mix_sources(
        t(spark, sf_dir, "documents"), _MIX_WEIGHTS, _MIX_BUDGET
    )


@query(
    "q_corpus_diff",
    # new := documents minus ids %97, texts %89 mutated, ids %101 cloned
    # as +1_000_000 — every status path exercised deterministically.
    oracle=r"""
    WITH newv AS (
        SELECT doc_id,
               CASE WHEN doc_id % 89 = 0 THEN text || ' changed'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 101 = 0
    ), of AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fo
        FROM documents
    ), nf AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fn
        FROM newv
    )
    SELECT doc_id,
           CASE WHEN fo IS NULL THEN 'added'
                WHEN fn IS NULL THEN 'removed'
                WHEN fo <> fn THEN 'modified' END AS status
    FROM of FULL OUTER JOIN nf USING (doc_id)
    WHERE (CASE WHEN fo IS NULL THEN 'added'
                WHEN fn IS NULL THEN 'removed'
                WHEN fo <> fn THEN 'modified' END) IS NOT NULL
    """,
)
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions (added / removed /
    modified by normalized-content fingerprint; unchanged docs absent).
    The new version is derived from the fixture with deterministic
    removals (%97), text mutations (%89), and cloned additions (%101),
    so all three paths carry hash evidence. One full-outer join over
    (id, 16-byte fingerprint) — text never shuffles
    (operators/pipeline.py:corpus_diff)."""
    old = t(spark, sf_dir, "documents").select("doc_id", "text")
    base = old.where(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 89 == 0, F.concat(F.col("text"), F.lit(" changed"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = old.where(F.col("doc_id") % 101 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return P.corpus_diff(old, base.unionByName(added))


def _horner_sql(k: int) -> str:
    """K-gram Horner rolling hash over 1-indexed hs[] — matches the Spark
    chain in operators/text.py (pmod each step) with explicit parens."""
    e = "hs[i]"
    for j in range(1, k):
        e = f"(({e} * 69069 + hs[i+{j}]) % 2147483647)"
    return e


@query(
    "q_source_overlap",
    oracle=f"""
    WITH w AS (
        SELECT source,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT source,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS nw
        FROM w
    ), kg AS (
        SELECT source,
               unnest([{_horner_sql(5)}
                       for i in range(1, nw - 5 + 2)]) AS gh
        FROM wh WHERE nw >= 5
    ), grams AS (
        SELECT DISTINCT source, gh FROM kg
    ), totals AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM grams GROUP BY source
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM grams a JOIN grams b USING (gh)
        WHERE a.source < b.source GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared, ta.n AS n_a, tb.n AS n_b,
           floor((n_shared / CAST(ta.n + tb.n - n_shared AS DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM pairs
    JOIN totals ta ON ta.source = pairs.source_a
    JOIN totals tb ON tb.source = pairs.source_b
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 5-gram contamination matrix: shared distinct n-grams
    and n-gram-set Jaccard per source pair — the audit that tells a
    mixture designer when two "domains" are partly the same text. Winnow
    rolling-hash machinery, so only (source, 8-byte hash) pairs shuffle
    (operators/text.py:source_ngram_overlap)."""
    return X.source_ngram_overlap(t(spark, sf_dir, "documents"))


@query(
    "q_vocab_spectrum",
    oracle="""
    WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS w
        FROM documents
    ), freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    )
    SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS token_mass
    FROM freq GROUP BY 1
    """,
)
def q_vocab_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequency spectrum: word types per power-of-two frequency
    band with per-band token mass — the Zipf audit behind tokenizer
    vocabulary sizing (hapax count at band 0, coverage-by-threshold from
    band partial sums). Two map-side-combined hash aggregations, no
    global rank over the vocabulary
    (operators/lexical.py:vocab_spectrum)."""
    return L.vocab_spectrum(t(spark, sf_dir, "documents"))


@query(
    "q_unigram_nll",
    # Integer micro-nat quantization makes the per-doc sum exact BIGINT
    # aggregation; only the epilogue is float (fixed order, 4-digit pround).
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
    ), freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq
    ), qw AS (
        SELECT w, CAST(floor(ln(c) * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM freq
    ), per AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, w
    ), sums AS (
        SELECT doc_id,
               CAST(SUM(tf * q) AS BIGINT) AS s,
               CAST(SUM(tf) AS BIGINT) AS dl
        FROM per JOIN qw USING (w) GROUP BY doc_id
    )
    SELECT doc_id, dl,
           floor(((dl * CAST(floor(ln(total) * 1000000.0 + 0.5) AS BIGINT)
                   - s) / 1000000.0 / dl) * 10000.0 + 0.5) / 10000.0 AS nll
    FROM sums, tot
    """,
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability per document under the corpus
    unigram LM — the CCNet-style statistical quality score (high = rare-
    token soup, low = repetitive boilerplate). Per-word ln(count) is
    quantized to integer micro-nats so the per-doc aggregation stays in
    BIGINT (order-independent, engine-exact); only the final scalar is
    float (operators/lexical.py:unigram_nll)."""
    return L.unigram_nll(t(spark, sf_dir, "documents"))


@query(
    "q_bigram_nll",
    # Same integer micro-nat scheme as q_unigram_nll, one model order up:
    # per-occurrence NLL = ln c(w1 .) - ln c(w1 w2) with context counts as
    # the denominator, quantized per TYPE, summed in BIGINT per doc.
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), toks AS (
        SELECT doc_id,
               unnest([ws[i] || ' ' || ws[i+1]
                       for i in range(1, len(ws))]) AS b
        FROM w WHERE len(ws) >= 2
    ), c2 AS (
        SELECT b, split_part(b, ' ', 1) AS w1, CAST(COUNT(*) AS BIGINT) AS c2
        FROM toks GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
    ), model AS (
        SELECT b,
               CAST(floor(ln(c1) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(c2) * 1000000.0 + 0.5) AS BIGINT) AS dq
        FROM c2 JOIN c1 USING (w1)
    ), sums AS (
        SELECT doc_id, CAST(SUM(dq) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS dl2
        FROM toks JOIN model USING (b) GROUP BY doc_id
    )
    SELECT doc_id, dl2,
           floor((s / 1000000.0 / dl2) * 10000.0 + 0.5) / 10000.0 AS nll
    FROM sums
    """,
)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram negative log-probability per document — the
    perplexity-filter score one model order above q_unigram_nll: a doc
    whose word TRANSITIONS are improbable under the corpus is gibberish
    even when its unigram mix looks normal, and an unusually probable
    one is boilerplate (operators/lexical.py:bigram_nll; adjacency
    resolved inside the staged words array, no token shuffle to form
    pairs)."""
    return L.bigram_nll(t(spark, sf_dir, "documents"))


@query(
    "q_pmi_bigrams",
    # same micro-nat quantization as the bigram-NLL model; integer pmi_q
    # makes the (pmi DESC, bigram) top-20 tie-exact on both engines
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), toks AS (
        SELECT unnest([ws[i] || ' ' || ws[i+1]
                       for i in range(1, len(ws))]) AS b
        FROM w WHERE len(ws) >= 2
    ), c2 AS (
        SELECT b, split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
               CAST(COUNT(*) AS BIGINT) AS c12
        FROM toks GROUP BY 1, 2, 3
    ), lc AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
    rc AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2n FROM c2 GROUP BY w2),
    tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM c2),
    scored AS (
        SELECT b AS bigram, c12,
               CAST(floor(ln(c12) * 1000000.0 + 0.5) AS BIGINT)
               + CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(c1) * 1000000.0 + 0.5) AS BIGINT)
               - CAST(floor(ln(c2n) * 1000000.0 + 0.5) AS BIGINT) AS pmi_q
        FROM c2 JOIN lc USING (w1) JOIN rc USING (w2), tot
        WHERE c12 >= 5
    )
    SELECT bigram, c12,
           floor(pmi_q / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS pmi
    FROM scored
    ORDER BY pmi_q DESC, bigram
    LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word collocations by pointwise mutual information with a
    count floor (operators/lexical.py:pmi_bigrams) — the collocation-
    mining face of the bigram LM (q_bigram_nll scores documents under
    the transition model; this ranks the transitions). Marginals are
    map-side-combined groupBys over the bigram TYPE table; the global
    top-k is TakeOrderedAndProject — no window, no full sort."""
    return L.pmi_bigrams(t(spark, sf_dir, "documents"))


_PQ_CB: dict[str, dict] = {}


@query("q_ann_pq", oracle=AO.pq_oracle_sql(m=8, ksub=16, n_iter=2))
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, HASH-CHECKED end-to-end (round 6, was
    rows-only): 64-dim vectors -> 8 one-byte codes (32x compression), ADC
    shortlist over the compressed corpus, exact cosine re-rank of the
    shortlist only. The codebook trains with integer-exact k-means over
    normalized fixed-point vectors, so training + encode + ADC all replay
    in the SQL oracle (operators/annq.py:pq_train_q/pq_encode_q/
    pq_topk_rerank_q; the float tier similarity.pq_train keeps its recall
    contract in tests/test_similarity.py). Codebook trains once per
    corpus dir and is reused (the IVF pattern)."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_CB:
        _PQ_CB[sf_dir] = AQ.pq_train_q(e, m=8, ksub=16, n_iter=2)
    cb = _PQ_CB[sf_dir]
    codes = AQ.pq_encode_q(e, cb)
    return AQ.pq_topk_rerank_q(codes, e, e.filter(F.col("vec_id") < 10), cb, k=5)


# ---------------------------------------------------------------------------
# temporal joins (operators/temporal.py — as-of join, binned range join;
# Spark has no native operator for either)
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators import temporal as TJ  # noqa: E402


# Shared by q_join_asof (union-sort single window) and
# q_join_asof_chunked (bounded chunked-carry): identical rows, one oracle.
_ASOF_ORACLE = """
    WITH probe AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ), cand AS (
        SELECT p.event_id,
               b.event_id AS event_id_matched, b.ts AS ts_matched,
               b.value AS value_matched,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                   ORDER BY b.ts DESC, b.event_id DESC) AS rn
        FROM probe p JOIN b ON b.user_id = p.user_id AND b.ts <= p.ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id_matched, c.ts_matched, c.value_matched
    FROM probe p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        USING (event_id)
    """


@query("q_join_asof", oracle=_ASOF_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event picks the latest view event
    by the same user at or before it (ties: largest event id), null when
    none precedes. Union-sort shape — one shuffle on user_id, no
    pair-explosion (operators/temporal.py:asof_join; DuckDB expresses the
    same thing with ASOF JOIN / a windowed inequality join)."""
    e = t(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    return TJ.asof_join(
        probe, build, on="ts", by="user_id", build_cols=["event_id", "ts", "value"]
    )


@query("q_join_asof_chunked", oracle=_ASOF_ORACLE)
def q_join_asof_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME backward as-of join as q_join_asof, computed with the
    chunked-carry plan (operators/temporal.py:asof_join_chunked): local
    carry windows bounded by (user_id, 6h-chunk), chunk-final payloads
    via a combinable max_by (no window), cross-chunk handoff over the
    per-chunk summary — the bounded form for firehose keys, hash-checked
    against the single-window oracle."""
    e = t(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    build = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    return TJ.asof_join_chunked(
        probe, build, on="ts", by="user_id",
        build_cols=["event_id", "ts", "value"], chunk_ms=21_600_000,
    )


@query(
    "q_join_asof_tol",
    oracle="""
    WITH probe AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), cand AS (
        SELECT p.event_id,
               b.event_id AS event_id_matched, b.ts AS ts_matched,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                   ORDER BY b.ts ASC, b.event_id ASC) AS rn
        FROM probe p
        JOIN b ON b.user_id = p.user_id AND b.ts >= p.ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts_matched <= p.ts + INTERVAL 600 SECOND
                THEN c.event_id_matched END AS event_id_matched,
           CASE WHEN c.ts_matched <= p.ts + INTERVAL 600 SECOND
                THEN c.ts_matched END AS ts_matched
    FROM probe p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        USING (event_id)
    """,
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each error event picks the NEXT
    click by the same user within 10 minutes (ties: smallest event id).
    The nearest-first-then-tolerance semantics match pandas merge_asof;
    boundary math is integer microseconds on both engines."""
    e = t(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    build = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return TJ.asof_join(
        probe,
        build,
        on="ts",
        by="user_id",
        build_cols=["event_id", "ts"],
        direction="forward",
        tolerance_seconds=600.0,
    )


@query(
    "q_interval_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id,
               epoch_us(ts) // 1000000 AS c_start,
               epoch_us(ts) // 1000000 + 1800 AS c_end
        FROM events WHERE event_type = 'click'
    ), v AS (
        SELECT event_id AS view_id, user_id,
               epoch_us(ts) // 1000000 AS v_start,
               epoch_us(ts) // 1000000 + 600 AS v_end
        FROM events WHERE event_type = 'view'
    )
    SELECT c.click_id, v.view_id,
           CAST(least(c_end, v_end) - greatest(c_start, v_start) AS BIGINT)
               AS overlap_s
    FROM c JOIN v USING (user_id)
    WHERE c_start < v_end AND v_start < c_end
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators/temporal.py:interval_join_binned):
    every click's 30-minute attention window × every view's 10-minute
    window of the same user that intersect it, with the overlap length —
    campaigns × sessions shape. The binned plan explodes each interval
    into the fixed-width bins it touches and meets pairs in a
    co-partitioned (bin, key) hash join with the overlap predicate
    inside; the canonical-bin guard (the bin holding
    greatest(start, start)) emits each pair exactly once with NO dedup
    shuffle. Interval endpoints are exact integer seconds on both
    engines (unix_micros//1e6 vs epoch_us//1e6) so the boundary
    comparisons can never drift; the oracle is the naive inequality
    join."""
    e = t(spark, sf_dir, "events")
    sec = F.floor(F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("bigint")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        sec.alias("c_start"),
        (sec + 1800).alias("c_end"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        sec.alias("v_start"),
        (sec + 600).alias("v_end"),
    )
    j = TJ.interval_join_binned(
        clicks, views, "c_start", "c_end", "v_start", "v_end",
        by="user_id", bin_width=1800.0,
    )
    return j.select(
        "click_id",
        "view_id",
        (
            F.least("c_end", "v_end") - F.greatest("c_start", "v_start")
        ).cast("bigint").alias("overlap_s"),
    )


@query(
    "q_range_join",
    oracle="""
    WITH iv AS (
        SELECT event_id AS interval_id, user_id, ts AS start_ts,
               ts + INTERVAL 30 MINUTE AS end_ts
        FROM events WHERE event_type = 'purchase'
    ), pt AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, i.interval_id
    FROM pt p JOIN iv i
      ON i.user_id = p.user_id AND p.ts >= i.start_ts AND p.ts < i.end_ts
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: view events landing inside the
    30-minute window after each purchase by the same user. Binned
    equi-join + residual filter — a hash shuffle, not the
    broadcast-nested-loop Spark plans for raw inequality joins
    (operators/temporal.py:range_join_binned)."""
    e = t(spark, sf_dir, "events")
    iv = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("interval_id"),
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    pt = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return TJ.range_join_binned(
        pt, iv, "ts", "start_ts", "end_ts", by="user_id", bin_width=1800.0
    ).select("event_id", "user_id", "interval_id")


def _curate_oracle_sql(rules_on: bool) -> str:
    """The WHOLE curate_corpus composition as one DuckDB statement, built
    from the same single-definition stage oracles the battery already
    checks individually (exact-dedup keep, MinHash pairs -> recursive-CTE
    closure -> quality-ranked canonical keep, optional quality rules, PII
    redaction, then lang/split/token annotation over the REDACTED text —
    the exact stage order of operators/pipeline.py:curate_corpus)."""
    rules_join = ""
    if rules_on:
        rules_join = f"""
    JOIN (SELECT doc_id FROM ({_rules_flags_sql(base="d2")}) WHERE pass_all) rp
      USING (doc_id)"""
    train_bp = 10_000 - P.SPLIT_VAL_BP - P.SPLIT_TEST_BP
    val_bp = 10_000 - P.SPLIT_TEST_BP
    return f"""
    WITH RECURSIVE d1 AS (
        SELECT d.* FROM documents d
        JOIN (SELECT MIN(doc_id) AS doc_id FROM documents
              GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) k
          USING (doc_id)
    ),
    {_closure_ctes(_minhash_oracle_sql(base="d1"))},
    q AS ({_quality_oracle_sql()}),
    ranked AS (
        SELECT c.cluster_id, c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality DESC, c.doc_id ASC) AS rn
        FROM clusters c JOIN q ON q.doc_id = c.doc_id
    ),
    d2 AS (
        SELECT d1.* FROM d1
        LEFT JOIN (SELECT doc_id FROM ranked WHERE rn > 1) dr USING (doc_id)
        WHERE dr.doc_id IS NULL
    ),
    d3 AS (
        SELECT d2.* FROM d2{rules_join}
    ),
    red AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{X.PII_IPV4_RE}', '<IP>', 'g'),
                   '{X.PII_PHONE_RE}', '<PHONE>', 'g') AS text
        FROM d3
    ),
    lang AS ({_lang_pred_sql(base="red")})
    SELECT r.doc_id, l.pred_lang,
           CASE WHEN ('0x' || substr(md5(CAST(r.doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 10000 < {train_bp} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(r.doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 10000 < {val_bp} THEN 'val'
                ELSE 'test' END AS split,
           CAST(len(regexp_extract_all(r.text, '\\w+|[^\\w\\s]')) AS BIGINT)
               AS n_tokens
    FROM red r JOIN lang l USING (doc_id)
    """


@query("q_curate_pipeline", oracle=_curate_oracle_sql(rules_on=False))
def q_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline in one plan (exact dedup -> near-dup
    canonicalization -> PII redaction -> lang/split/token annotation;
    operators/pipeline.py:curate_corpus with quality rules off). Every
    stage is oracle-checked on its own AND the whole composition is
    hash-checked against _curate_oracle_sql — the same stage oracles
    chained into one DuckDB statement. The CLI e2e lives in
    tests/test_cli.py::test_cli_curate_end_to_end."""
    out, _report = P.curate_corpus(
        t(spark, sf_dir, "documents"), apply_quality_rules=False,
        with_report=False,
    )
    return out.select("doc_id", "pred_lang", "split", "n_tokens")


@query("q_curate_rules", oracle=_curate_oracle_sql(rules_on=True))
def q_curate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline with the Gopher-style quality rules ON — the
    branch q_curate_pipeline skips. The rule thresholds are tuned to be
    non-degenerate on the synthetic corpus (~60% of docs pass the
    stopword/word-count rules at every SF), so this surface exercises a
    genuine pass/fail split end-to-end: dedup survivors that fail a rule
    are dropped here and kept there (non-trivial split asserted by
    tests/test_pipeline_ops.py::test_curate_rules_on_nontrivial_split),
    and the composition is hash-checked against the rules-on oracle
    (operators/pipeline.py:curate_corpus step 3)."""
    out, _report = P.curate_corpus(
        t(spark, sf_dir, "documents"), apply_quality_rules=True,
        with_report=False,
    )
    return out.select("doc_id", "pred_lang", "split", "n_tokens")


@query("q_ann_ivfpq", oracle=AO.ivfpq_oracle_sql(m=8, ksub=16, n_iter=2))
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ (FAISS-style composed index), HASH-CHECKED end-to-end
    (round 6, was rows-only): coarse cells restrict the scan to
    nprobe/n_cells of the corpus, exact-integer ADC over 8-byte codes
    scores candidates without touching float vectors. Both reductions —
    the rounded-cosine coarse quantizer AND the integer PQ
    train/encode/ADC — replay in the SQL oracle. The two persisted
    artifacts (codes, cell assignment) build once per corpus version
    (operators/annq.py:ivfpq_topk_q; float tier similarity.ivfpq_topk
    keeps its recall contract in tests/test_similarity.py)."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_CB:
        _PQ_CB[sf_dir] = AQ.pq_train_q(e, m=8, ksub=16, n_iter=2)
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = S.ivf_centroids(e, 16)
    cb, cents = _PQ_CB[sf_dir], _IVF_CENTROIDS[sf_dir]
    codes = AQ.pq_encode_q(e, cb)
    cells = S.ivf_cells(e, cents)
    return AQ.ivfpq_topk_q(
        codes, cells, e.filter(F.col("vec_id") < 10), cb, cents, k=5, nprobe=4
    )


@query(
    "q_dedup_incremental",
    # same CTE chain as q_dedup_minhash_lsh; only the candidate predicate
    # changes: new-batch docs (id % 7 = 0) probe corpus docs, never
    # corpus x corpus
    oracle=_minhash_oracle_sql(pair_pred="a.id % 7 = 0 AND b.id % 7 <> 0"),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental near-dup check: each 'new batch' document
    (doc_id % 7 = 0 stands in for the batch) against the existing corpus
    via a new x corpus band join — O(B + N), the corpus is never
    self-joined (operators/dedup.py:minhash_lsh_dedup_incremental)."""
    d = t(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup_incremental(
        d.filter(F.col("doc_id") % 7 == 0),
        d.filter(F.col("doc_id") % 7 != 0),
        "text",
        "doc_id",
        k=3,
        threshold=0.7,
    )


@query(
    "q_export_shards",
    oracle="""
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
                   AS shard
        FROM documents
    )
    """,
)
def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: hash-shard + in-shard rank by
    md5 — a reproducible uniform shuffle (same (shard, pos) on re-runs
    and across engines), one exchange on the shard key
    (operators/pipeline.py:export_shards)."""
    return P.export_shards(t(spark, sf_dir, "documents"))


from py_gtfs_duckdb_spark.operators import bpe as B  # noqa: E402

_BPE_MODEL: dict[str, dict] = {}


# DEREGISTERED from the declared battery (round 6): the driver refuses
# oracle-less entries (r5 `err: no_oracle`), and a learned BPE merge table
# is data-dependent so it cannot be replayed in a static SQL string. The
# operator remains a first-class API (py_gtfs_duckdb_spark.api) with its
# determinism/reconstruction contracts pinned in tests/test_bpe.py and a
# battery-shaped smoke run in tests/test_oracle_parity.py.
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token counts from the from-scratch BPE tokenizer (train
    merges once per corpus on an md5-ordered sample, tokenize in a narrow
    Arrow pass — operators/bpe.py). The model-native counterpart of the
    regex token count; merge table determinism and the reconstruction
    property are pinned in tests/test_bpe.py."""
    d = t(spark, sf_dir, "documents")
    if sf_dir not in _BPE_MODEL:
        _BPE_MODEL[sf_dir] = B.bpe_train(d, n_merges=200, sample_size=500)
    return B.bpe_tokenize(d, _BPE_MODEL[sf_dir]).select("id", "n_bpe_tokens")


def _bpe_enc_sql() -> str:
    """The DuckDB replay of bpe_encode_word_expr under the FROZEN merge
    table (operators/bpe.py:FIXED_MERGES_V1): the identical rewriting
    system — wrap chars as SEP+c+SEP, append the wrapped end-of-word
    marker, fold every merge in learned order into a nested literal
    replace() — so the encoding is bit-for-bit reproducible, the same
    fixed-constants trick that oracled the ANN tier
    (plans/ann_oracles.py). Shared by both BPE oracles."""
    from py_gtfs_duckdb_spark.operators.bpe import EOW, FIXED_MERGES_V1

    s = "chr(31)"  # the symbol-boundary separator, SEP = 0x1f
    enc = rf"regexp_replace(w, '(.)', {s} || '\1' || {s}, 'g') || {s} || '{EOW}' || {s}"
    for left, right in FIXED_MERGES_V1:
        enc = (
            f"replace({enc},"
            f" {s}||'{left}'||{s}||{s}||'{right}'||{s},"
            f" {s}||'{left}{right}'||{s})"
        )
    return enc


def _bpe_large_oracle() -> str:
    """DuckDB replay of the DEEP frozen table (operators/bpe.py:
    FIXED_MERGES_LARGE, 384 merges). One nested expression would trip
    DuckDB's binder recursion ceiling (128) exactly like Catalyst's
    expression cliff trips Spark — so the replaces are STAGED: chained
    CTEs, each applying ≤90 merges per word via ``list_transform`` over
    the word list (per-word lambdas keep the rewriting word-local, the
    same scoping as the Spark/greedy side — no cross-word matches to
    reason about). The final stage concatenates and counts separators.
    Replaying ALL 384 merges — the 278 digit-led pads included — makes
    the pads' no-op property part of the hash check."""
    from py_gtfs_duckdb_spark.functions import pround_sql
    from py_gtfs_duckdb_spark.operators.bpe import EOW, FIXED_MERGES_LARGE

    s = "chr(31)"
    wrap = (
        rf"regexp_replace(x, '(.)', {s} || '\1' || {s}, 'g')"
        rf" || {s} || '{EOW}' || {s}"
    )
    chunk = 90
    stages = [
        FIXED_MERGES_LARGE[i : i + chunk]
        for i in range(0, len(FIXED_MERGES_LARGE), chunk)
    ]
    ctes = [
        """s AS (
        SELECT doc_id, replace(text, chr(31), '') AS text FROM documents
    )""",
        """w0 AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS words,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
        FROM s
    )""",
    ]
    prev, prev_col = "w0", "words"
    for k, merges in enumerate(stages):
        body = wrap if k == 0 else "x"
        for left, right in merges:
            body = (
                f"replace({body},"
                f" {s}||'{left}'||{s}||{s}||'{right}'||{s},"
                f" {s}||'{left}{right}'||{s})"
            )
        ctes.append(
            f"""e{k} AS (
        SELECT doc_id, words, n_chars,
               list_transform({prev_col}, x -> {body}) AS lst
        FROM {prev}
    )"""
        )
        prev, prev_col = f"e{k}", "lst"
    n_tok = "(length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2"
    return f"""
    WITH {', '.join(ctes)}, fin AS (
        SELECT doc_id, words, n_chars,
               array_to_string(lst, '') AS encdoc
        FROM {prev}
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           n_chars,
           CAST({n_tok} AS BIGINT) AS n_bpe_tokens,
           CASE WHEN {n_tok} > 0
                THEN {pround_sql(f"n_chars / ({n_tok})")}
           END AS chars_per_token
    FROM fin
    """


def _bpe_encode_oracle() -> str:
    from py_gtfs_duckdb_spark.functions import pround_sql

    enc = _bpe_enc_sql()
    return f"""
    WITH s AS (
        -- sanitize the SEP byte (0x1f) exactly like bpe_encode_stats
        SELECT doc_id, replace(text, chr(31), '') AS text FROM documents
    ), e AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS words,
               array_to_string(
                   list_transform(list_filter(string_split(text, ' '),
                                              w -> w <> ''),
                                  w -> {enc}), '') AS encdoc,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
        FROM s
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           n_chars,
           CAST((length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2
                AS BIGINT) AS n_bpe_tokens,
           CASE WHEN (length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2 > 0
                THEN {pround_sql("n_chars / ((length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2)")}
           END AS chars_per_token
    FROM e
    """


@query("q_bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token budget under the FROZEN BPE merge table
    (operators/bpe.py:FIXED_MERGES_V1, trained once and pasted as
    literals): per-document word / char / BPE-token counts and the
    chars-per-token compression ratio. Encoding is pure column math —
    one narrow projection, ~25 string ops per word inside a single array
    transform, no explode, no shuffle, no UDF — and the in-order replace
    chain provably matches the greedy tokenizer on this corpus
    (tests/test_bpe.py). Training itself stays API-only: a learned merge
    table is data-dependent state static SQL cannot replay, which is
    exactly why the battery entry fixes the table."""
    return B.bpe_encode_stats(t(spark, sf_dir, "documents"))


def _bpe_vocab_oracle() -> str:
    enc = _bpe_enc_sql()
    return f"""
    WITH s AS (
        -- sanitize the SEP byte (0x1f) exactly like bpe_vocab_spectrum
        SELECT doc_id, replace(text, chr(31), '') AS text FROM documents
    ), e AS (
        SELECT doc_id,
               array_to_string(
                   list_transform(list_filter(string_split(text, ' '),
                                              w -> w <> ''),
                                  w -> {enc}), '') AS encdoc
        FROM s
    ), tk AS (
        SELECT doc_id, unnest(string_split(encdoc, chr(31))) AS token FROM e
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tk WHERE token <> ''
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """


def _bpe_fertility_oracle() -> str:
    from py_gtfs_duckdb_spark.functions import pround_sql

    enc = _bpe_enc_sql()
    return f"""
    WITH s AS (
        -- sanitize the SEP byte (0x1f) exactly like bpe_encode_stats
        SELECT source, replace(text, chr(31), '') AS text FROM documents
    ), e AS (
        SELECT source,
               CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                    AS BIGINT) AS n_words,
               array_to_string(
                   list_transform(list_filter(string_split(text, ' '),
                                              w -> w <> ''),
                                  w -> {enc}), '') AS encdoc
        FROM s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM((length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2)
                AS BIGINT) AS n_bpe_tokens,
           CASE WHEN SUM(n_words) > 0
                THEN {pround_sql(
                    "SUM((length(encdoc) - length(replace(encdoc, chr(31), ''))) / 2)"
                    " / SUM(n_words)"
                )}
           END AS fertility
    FROM e GROUP BY source
    """


@query("q_bpe_fertility", oracle=_bpe_fertility_oracle())
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility (subword tokens per word) under the
    frozen merge table — the mixture-design signal that says which
    sources are expensive to train on in the model's own units (a source
    whose fertility is high pays more sequence length per word). Same
    narrow per-doc encode as q_bpe_encode with the source column carried
    through, then a sources-bounded aggregation; no explode, no window.
    """
    from py_gtfs_duckdb_spark.functions import pround

    # use_arrow: this consumer always aggregates the counts, so the
    # encode always executes — the memoized Arrow kernel is ~5x cheaper
    # per executed row than the interpreted replace-chain HOF (r14,
    # tools/ab_bpe_vocab.py stats mode), and no pruning is forfeited
    s = B.bpe_encode_stats(
        t(spark, sf_dir, "documents"), keep_cols=("source",), use_arrow=True
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.when(
                F.col("n_words") > 0,
                pround(F.col("n_bpe_tokens") / F.col("n_words"), 4),
            ),
        )
    )


@query("q_bpe_tokenize_large", oracle=_bpe_large_oracle())
def q_bpe_tokenize_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-DEPTH tokenizer path: the same per-document budget
    as q_bpe_encode but under the 384-merge frozen table
    (operators/bpe.py:FIXED_MERGES_LARGE) — past MAX_EXPR_MERGES, so
    bpe_encode_stats auto-dispatches to the Arrow-batched greedy kernel
    (the bpe_tokenize path a real 32k-merge vocabulary takes; round-8
    VERDICT's 'smallest genuine gap'). The oracle replays all 384 merges
    in DuckDB as staged per-word replaces (DuckDB's binder has its own
    128-deep expression ceiling — see _bpe_large_oracle), so driver hash
    parity covers the Arrow kernel, the dispatch, AND the no-op property
    of the padding merges end-to-end."""
    return B.bpe_encode_stats(
        t(spark, sf_dir, "documents"), merges=B.FIXED_MERGES_LARGE
    )


@query("q_bpe_vocab", oracle=_bpe_vocab_oracle())
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 subword tokens under the frozen merge table — the
    tokenizer-native vocabulary audit (operators/bpe.py:
    bpe_vocab_spectrum): which merges pay for themselves on this corpus.
    One explode into a vocabulary-bounded map-side-combinable count;
    top-k is TakeOrderedAndProject, never a global sort."""
    return B.bpe_vocab_spectrum(t(spark, sf_dir, "documents"))


@query(
    "q_quantile_tokens",
    oracle=r"""
    WITH tk AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT source,
           quantile_cont(n_tokens, 0.25) AS p25,
           quantile_cont(n_tokens, 0.50) AS p50,
           quantile_cont(n_tokens, 0.75) AS p75,
           quantile_cont(n_tokens, 0.95) AS p95
    FROM tk GROUP BY source
    """,
)
def q_quantile_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length quantiles (exact linear-interpolated
    percentiles — Spark ``percentile`` and DuckDB ``quantile_cont``
    share the definition, so values match bit-for-bit). Exact percentile
    holds each group's values; per-source groups are bounded, and the
    unbounded-cardinality variant of this query is ``approx_percentile``
    (t-digest, mergeable map-side) — same plan, sketch aggregate."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(X.TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return tk.groupBy("source").agg(
        *[
            F.expr(f"percentile(n_tokens, {p})").alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ]
    )


@query(
    "q_histogram_quantiles",
    # identical deterministic arithmetic to the Spark operator: same
    # binning (clamp to [0, 31], w = 4.0), same rank convention
    # (target = 1 + p*(N-1)), same within-bin interpolation
    # lo + w*(bin + (r - cum_before)/cnt), same vk + frac*(vk1 - vk)
    # blend — every float literal CAST to DOUBLE (DuckDB parses bare
    # decimals as DECIMAL, whose arithmetic would drift from IEEE).
    oracle=r"""
    WITH tk AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS v
        FROM documents
    ),
    b AS (
        SELECT source,
               LEAST(GREATEST(CAST(FLOOR((CAST(v AS DOUBLE)
                   - CAST(0.0 AS DOUBLE)) / CAST(4.0 AS DOUBLE)) AS BIGINT),
                   0), 31) AS bin
        FROM tk WHERE v IS NOT NULL
    ),
    c AS (SELECT source, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    cum AS (
        SELECT source, bin, cnt,
               SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum
        FROM c
    ),
    ns AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
    ranks AS (
        SELECT s.source, s.n, p.p,
               CAST(FLOOR(CAST(1.0 AS DOUBLE) + p.p
                   * CAST(s.n - 1 AS DOUBLE)) AS BIGINT) AS k,
               (CAST(1.0 AS DOUBLE) + p.p * CAST(s.n - 1 AS DOUBLE))
                   - CAST(CAST(FLOOR(CAST(1.0 AS DOUBLE) + p.p
                       * CAST(s.n - 1 AS DOUBLE)) AS BIGINT) AS DOUBLE)
                   AS frac
        FROM ns s CROSS JOIN (
            SELECT UNNEST([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                           CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p
        ) p
    ),
    vals AS (
        SELECT r.source, r.p, r.frac,
               MIN_BY(CAST(0.0 AS DOUBLE) + CAST(4.0 AS DOUBLE)
                   * (CAST(cum.bin AS DOUBLE)
                      + CAST(r.k - (cum.cum - cum.cnt) AS DOUBLE)
                        / CAST(cum.cnt AS DOUBLE)), cum.bin)
                   FILTER (WHERE cum.cum >= r.k) AS vk,
               MIN_BY(CAST(0.0 AS DOUBLE) + CAST(4.0 AS DOUBLE)
                   * (CAST(cum.bin AS DOUBLE)
                      + CAST(r.k + 1 - (cum.cum - cum.cnt) AS DOUBLE)
                        / CAST(cum.cnt AS DOUBLE)), cum.bin)
                   FILTER (WHERE cum.cum >= r.k + 1) AS vk1
        FROM ranks r JOIN cum ON cum.source = r.source
        GROUP BY 1, 2, 3
    ),
    q AS (
        SELECT source, p,
               CASE WHEN frac = CAST(0.0 AS DOUBLE) THEN vk
                    ELSE vk + frac * (vk1 - vk) END AS q
        FROM vals
    )
    SELECT q.source, ANY_VALUE(ns.n) AS n,
           MAX(CASE WHEN p = CAST(0.25 AS DOUBLE) THEN q END) AS p25,
           MAX(CASE WHEN p = CAST(0.5 AS DOUBLE) THEN q END) AS p50,
           MAX(CASE WHEN p = CAST(0.75 AS DOUBLE) THEN q END) AS p75,
           MAX(CASE WHEN p = CAST(0.95 AS DOUBLE) THEN q END) AS p95
    FROM q JOIN ns ON ns.source = q.source
    GROUP BY 1
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length quantiles from a FIXED-BIN histogram
    (operators/pipeline.py:histogram_quantiles) — the unbounded-
    cardinality sibling of q_quantile_tokens: exact ``percentile``
    buffers each group's values (fine for bounded groups, a straggler-
    then-OOM at a 100 TB group); this plan's per-group state is 32 bin
    counts no matter the group size, built by one map-side-combinable
    (source, bin) count. Estimate error is bounded by the bin width
    (w=4 tokens here); the estimator is deterministic binned
    interpolation, so the DuckDB oracle replays it bit-for-bit."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(X.TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return P.histogram_quantiles(
        tk, "n_tokens", "source", probs=(0.25, 0.5, 0.75, 0.95),
        n_bins=32, lo=0.0, hi=128.0,
    )


@query(
    "q_doc_chunks",
    # same rule in SQL: starts 1, 1+step, ... up to greatest(n-ov, 1)
    # (DuckDB range() is stop-EXCLUSIVE, hence the +1), chunk_idx
    # recovered as (s-1)/step, list_slice is inclusive-end and clips at
    # the tail exactly like Spark's slice(.., start, length).
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    c AS (
        SELECT doc_id, ws, s
        FROM w, UNNEST(range(1, GREATEST(len(ws) - 8, 1) + 1, 32)) AS t(s)
    )
    SELECT doc_id,
           CAST((s - 1) // 32 AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(ws, s, s + 39), ' ') AS chunk_text,
           CAST(GREATEST(LEAST(40, len(ws) - s + 1), 0) AS BIGINT)
               AS n_chunk_words
    FROM c
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking
    (operators/pipeline.py:chunk_documents): documents split into
    40-word chunks overlapping by 8 — the long-document preprocessing
    step before sequence packing. Pure per-row array math over a staged
    words column + one posexplode, zero shuffles; every chunk provably
    adds a word no earlier chunk had, and every doc_id survives (short
    docs become their own chunk 0, empty docs one empty chunk)."""
    d = t(spark, sf_dir, "documents")
    return P.chunk_documents(d, max_words=40, overlap_words=8)


@query(
    "q_kmv_distinct",
    # identical pipeline in SQL: same staged word hashes (md5 48-bit mod
    # P) and Horner 3-gram rolling hashes as every winnow oracle,
    # ROW_NUMBER picks the k smallest distinct hashes (the oracle may
    # window - it is the single-node reference), same estimator
    # arithmetic (63 * P / h_k) in the same operation order.
    oracle=r"""
    WITH w AS (
        SELECT source,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT source,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS n
        FROM w
    ), kg AS (
        SELECT source,
               unnest([((hs[i] * 69069 + hs[i+1]) % 2147483647 * 69069
                        + hs[i+2]) % 2147483647
                       for i in range(1, n - 2 + 1)]) AS h
        FROM wh WHERE n >= 3
    ),
    d AS (SELECT DISTINCT source, h FROM kg),
    r AS (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM d
    )
    SELECT source,
           CAST(SUM(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sketch,
           CASE WHEN SUM(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) < 64
                THEN CAST(SUM(CASE WHEN rn <= 64 THEN 1 ELSE 0 END)
                          AS DOUBLE)
                ELSE CAST(63.0 AS DOUBLE) * CAST(2147483647.0 AS DOUBLE)
                     / CAST(MAX(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
           END AS est_distinct
    FROM r GROUP BY 1
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic approximate distinct via a K-minimum-values sketch
    (operators/pipeline.py:kmv_sketch): distinct word-3-gram count per
    source, estimated from the 64 smallest distinct gram hashes - the
    portable, MERGEABLE sibling of HLL (q_agg_approx_distinct): where
    HLL's registers are engine-internal (its battery oracle can only
    tolerance-check), KMV is plain integer order statistics, so the
    DuckDB oracle replays the sketch AND the (k-1)/U_(k) estimator
    bit-for-bit - and per-shard sketches union losslessly
    (kmv_merge == sketch-of-union, pinned in tests), which is what makes
    a persisted per-day sketch answer any date-range distinct estimate
    from k-sized arrays. Gram hashing reuses the STAGED word-hash +
    Horner rolling-hash front-end every winnow audit uses (per-row array
    math; the naive md5-of-reassembled-gram-strings transform measured
    ~4x slower - the round-7 interpreted-HOF lesson)."""
    d = t(spark, sf_dir, "documents")
    # reuse the audits' shared gram front-end with source as the id —
    # it stages the word-hash array ONE projection below the explode,
    # which is the exact shape that keeps the inferred Generate filter
    # referencing attributes instead of inlining the whole hash chain
    # (a two-stage staging here measured 100x slower: the pushed-down
    # size()>0 filter re-evaluated the word-hash transform per
    # element_at — see ngram_hash_col's CollapseProject note)
    grams = X.doc_ngram_hashes(d, n=3, text_col="text", id_col="source")
    sk = P.kmv_sketch(
        grams.select(F.col("id").alias("source"), "gh"),
        "gh", "source", k=64, prehashed=True,
    )
    return sk.select(
        "source",
        F.size("sketch").cast("bigint").alias("n_sketch"),
        P.kmv_estimate(
            F.col("sketch"), 64, universe=2147483647.0
        ).alias("est_distinct"),
    )


@query(
    "q_heavy_hitters",
    # The oracle is the definition itself: every bigram type whose count
    # clears the cross-multiplied integer share predicate freq*m > N.
    # The Spark plan gets the SAME exact set through the two-pass
    # candidates-then-recount sketch (pigeonhole superset, then exact
    # recount of candidates only) — the integer predicate keeps both
    # sides float-free.
    oracle="""
    WITH w AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), toks AS (
        SELECT unnest([ws[i] || ' ' || ws[i+1]
                       for i in range(1, len(ws))]) AS bigram
        FROM w WHERE len(ws) >= 2
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks
    ), c AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS freq
        FROM toks GROUP BY bigram
    )
    SELECT bigram, freq FROM c, tot WHERE freq * 850 > n
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent bigrams above a 1/850 corpus share, EXACTLY, via the
    two-pass frequent-items sketch (operators/pipeline.py:heavy_hitters):
    pass 1 finds per-partition candidates map-side (a provable superset
    of every true heavy hitter — no shuffle of the bigram stream), pass
    2 recounts only the candidates behind a broadcast semi-filter. The
    scalable shape when the item universe (n-gram types) dwarfs the
    answer set: the exchange carries candidate occurrences, never the
    full vocabulary — where q_text_top_tokens's exact groupBy shuffles
    every distinct type."""
    d = t(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    staged = d.select(ws.alias("__ws")).filter(F.size("__ws") >= 2)
    bigrams = staged.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__ws") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("__ws"), i),
                    F.element_at(F.col("__ws"), i + 1),
                ),
            )
        ).alias("bigram")
    )
    return P.heavy_hitters(bigrams, "bigram", m=850)


@query(
    "q_weighted_sample",
    # ROW_NUMBER is fine in the ORACLE (DuckDB is the single-node
    # reference); the Spark plan is the salted two-phase bounded top-k.
    # Same E-S key arithmetic in the same order: u = (md5_48(id)+1)/2^48,
    # key = ln(u)/w, DESC, tie on doc_id.
    oracle=r"""
    WITH tk AS (
        SELECT source, doc_id,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS DOUBLE)
                   AS w,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                   AS h48
        FROM documents
    ),
    keyed AS (
        SELECT source, doc_id, w,
               LN(CAST(h48 + 1 AS DOUBLE)
                  / CAST(281474976710656 AS DOUBLE)) / w AS key
        FROM tk WHERE w > 0
    ),
    ranked AS (
        SELECT source, doc_id, w,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY key DESC, doc_id ASC) AS rn
        FROM keyed
    )
    SELECT source, doc_id, CAST(rn AS BIGINT) AS rank, w AS weight
    FROM ranked WHERE rn <= 5
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/pipeline.py:weighted_sample): 5 documents per source with
    inclusion probability proportional to TOKEN COUNT — the reproducible
    pilot-corpus draw (longer docs proportionally likelier, same sample
    on every run and every engine). Spark plan is the salted two-phase
    bounded top-k (no rank window — a firehose source never sorts in one
    task); the oracle ranks the identical Efraimidis–Spirakis key with a
    plain window, which is exactly what the distributed form must
    reproduce."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source",
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(X.TOKEN_RE), 0))
        .cast("double")
        .alias("w"),
    )
    return P.weighted_sample(tk, k=5, weight_col="w", id_col="doc_id",
                             by="source")



@query(
    "q_semantic_dedup",
    # embedding pair SQL + the same recursive-closure CTEs as the text
    # clusters oracle, instantiated over vec ids
    oracle=f"""
    WITH RECURSIVE {_closure_ctes(_embedding_pairs_oracle_sql(0.35), out_id="vec_id")}
    SELECT cluster_id, CAST(MIN(vec_id) AS BIGINT) AS kept_vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM clusters GROUP BY cluster_id
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (arXiv:2303.09540): cell-blocked
    cosine pairs → connected components → min-id representative per
    semantic cluster (operators/dedup.py:semantic_dedup)."""
    e = t(spark, sf_dir, "embeddings")
    out = D.semantic_dedup(e, "embedding", "vec_id", "label", 0.35)
    return out.select(
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.col("kept_vec_id").cast("bigint").alias("kept_vec_id"),
        "n_members",
    )


@query(
    "q_dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE {_clusters_oracle_ctes()},
    sizes AS (
        SELECT cluster_id, COUNT(*) AS n FROM clusters GROUP BY cluster_id
    )
    SELECT CAST(n AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY n
    """,
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the audit metric that tells a
    curation run whether duplication is pairwise noise or viral
    template families (heavy tail => templated content). Two cheap
    aggregations over the already-audited pairs→CC plan."""
    d = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    return sizes.groupBy(F.col("n").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


@query(
    "q_embed_project",
    # The projected VALUES are float32 matmul (not FP-replayable in SQL;
    # recall-tested instead), but the surface this query returns — one
    # row per corpus vector with the projected dimensionality — is
    # exactly oracle-able, so the driver verifies coverage and that the
    # projection pass executed (the audio-features pattern).
    oracle="SELECT vec_id, CAST(16 AS BIGINT) AS dim FROM embeddings",
)
def q_embed_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64->16 (seeded Gaussian,
    deterministic across runs/executors) — the cheap embedding
    compression when PQ's codebook lifecycle is overkill
    (operators/similarity.py:random_projection; neighborhood recall
    asserted in tests/test_similarity.py; projected values are
    recall-tested, the coverage surface is hash-checked)."""
    e = t(spark, sf_dir, "embeddings")
    out = S.random_projection(e, out_dim=16)
    return out.select(
        "vec_id", F.size("embedding").cast("bigint").alias("dim")
    )


@query(
    "q_dedup_spans",
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), u AS (
        SELECT doc_id,
               [array_to_string(ws[(i-1)*3+1 : (i-1)*3+3], ' ')
                for i in range(1, CAST(ceil(len(ws)/3.0) AS BIGINT) + 1)] AS units
        FROM w
    ), e AS (
        SELECT doc_id, generate_subscripts(units, 1) - 1 AS idx,
               unnest(units) AS unit
        FROM u
    ), block AS (
        SELECT unit FROM (SELECT DISTINCT unit, doc_id FROM e)
        GROUP BY unit HAVING COUNT(*) >= 3
    ), kept AS (
        SELECT e.doc_id, e.idx, e.unit FROM e LEFT JOIN block b USING (unit)
        WHERE b.unit IS NULL
    ), r AS (
        SELECT doc_id, string_agg(unit, ' ' ORDER BY idx) AS clean_text,
               COUNT(*) AS n_kept FROM kept GROUP BY doc_id
    ), tt AS (
        -- anchored on documents so zero-unit (empty-text) docs survive,
        -- mirroring the operator's every-document-survives contract
        SELECT d.doc_id, COALESCE(c.n_units, 0) AS n_units
        FROM documents d LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n_units FROM e GROUP BY doc_id
        ) c USING (doc_id)
    )
    SELECT tt.doc_id, COALESCE(r.clean_text, '') AS clean_text,
           CAST(tt.n_units AS BIGINT) AS n_units,
           CAST(tt.n_units - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
    FROM tt LEFT JOIN r USING (doc_id)
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document span dedup (CCNet/RefinedWeb-style line-level
    boilerplate removal): spans shared across >= 3 documents are
    stripped, text reassembled in order. Doc-level dedup cannot see
    boilerplate wrapped around distinct payloads; this is the standard
    pre-pass. Blocklist is broadcast (common spans are few by nature);
    no self-join (operators/text.py:dedup_spans). The fixture has no
    line structure, so the 3-word-chunk segmenter stands in for the
    newline segmenter (unit-tested separately)."""
    return X.dedup_spans(
        t(spark, sf_dir, "documents"), unit_words=3, min_df=3
    )


from py_gtfs_duckdb_spark.operators import lexical as L  # noqa: E402

_BM25_TERMS = ["table", "scan", "merge"]


@query(
    "q_bm25_topk",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS BIGINT) AS dl
        FROM documents
    ), corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM docs
    ), toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
    ), tf AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN w = 'table' THEN 1 ELSE 0 END) AS BIGINT) AS tf_0,
               CAST(SUM(CASE WHEN w = 'scan'  THEN 1 ELSE 0 END) AS BIGINT) AS tf_1,
               CAST(SUM(CASE WHEN w = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_2
        FROM toks WHERE w IN ('table', 'scan', 'merge') GROUP BY doc_id
    ), dfreq AS (
        SELECT CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
               CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
               CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
        FROM tf
    ), scored AS (
        SELECT tf.doc_id,
               floor((0.0
                 + ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
                   * tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
                   * tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
                   * tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ) * 10000.0 + 0.5) / 10000.0 AS score
        FROM tf JOIN docs USING (doc_id), corpus, dfreq
    )
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical top-10 for a 3-term query — the term-based
    relevance search a corpus team runs without an embedding model.
    Inverted-index plan: token stream filtered to the query terms before
    any shuffle, conditional-aggregation tf pivot (map-side combined),
    corpus stats broadcast, fixed-order float scoring (engine-
    portable), TakeOrderedAndProject top-k
    (operators/lexical.py:bm25_topk)."""
    return L.bm25_topk(t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@query(
    "q_audio_features",
    # The integer columns are decode-verified: they only come out right if
    # the RIFF container round-trip (synth executor-side -> parse header ->
    # count PCM frames) actually happened. Float features (rms/zcr/peak)
    # are numpy-derived and checked analytically in tests/test_multimodal.py
    # instead of hash-compared (libm sin() is not bit-portable to DuckDB).
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(800 AS BIGINT) AS n_samples,
           CAST(100 AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: per-doc WAV payloads synthesized
    executor-side (real RIFF containers, 16-bit PCM sine), then stdlib
    wave + numpy decode and feature extraction via mapInPandas — the one
    multimodal mode this container can run without stubs
    (operators/multimodal.py:audio_features)."""
    media = M.documents_as_audio(t(spark, sf_dir, "documents"))
    return M.audio_features(media).select(
        "media_id", "sample_rate", "n_samples", "duration_ms"
    )


def _image_resize_oracle_sql() -> str:
    """Analytic oracle for the REAL PPM decode->block-average resize: the
    synthesized gradient makes every output cell a rational constant plus
    a doc_id-dependent blue term — cell(i,j) = (SR_j + SG_i + 4*b) / 12
    with SR/SG the per-block channel sums (integers precomputed here) and
    b = doc_id % 256. Any decode/pool/indexing mistake shifts the
    integers and breaks the hash. pround-stable: cell*10^4 is always an
    exact integer or an exact third, never near a rounding boundary."""
    w, h, out_w, out_h = 16, 12, 4, 3
    bw, bh = w // out_w, h // out_h
    sr = [sum(x * 255 // (w - 1) for x in range(j * bw, (j + 1) * bw))
          for j in range(out_w)]
    sg = [sum(y * 255 // (h - 1) for y in range(i * bh, (i + 1) * bh))
          for i in range(out_h)]
    cells = ",\n               ".join(
        f"floor((({sr[j]} + {sg[i]} + 4 * (doc_id % 256)) / 12.0)"
        " * 10000.0 + 0.5) / 10000.0"
        for i in range(out_h)
        for j in range(out_w)
    )
    # SCALARIZED (round 6): one (px_idx, px_value) row per output cell —
    # the driver's canonicalizer cannot hash ArrayType cells (r5 red).
    return f"""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
             list_value(
                 {cells}
             ) AS pixels
      FROM documents
    )
    SELECT media_id, width, height,
           CAST(generate_subscripts(pixels, 1) - 1 AS INT) AS px_idx,
           unnest(pixels) AS px_value
    FROM p
    """


@query("q_image_resize", oracle=_image_resize_oracle_sql())
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + resize end-to-end: P6 PPM payloads synthesized
    executor-side (seeded RGB gradient), numpy header/raw-RGB decode,
    2-D block-average down to 4x3 — every output cell hash-checked
    against the analytic value of the gradient
    (operators/multimodal.py:decode_ppm/resize_images). Output is scalar
    rows: one (px_idx, px_value) per resized cell."""
    from py_gtfs_duckdb_spark.functions import pround

    media = M.documents_as_images(t(spark, sf_dir, "documents"))
    out = M.resize_images(media, out_w=4, out_h=3)
    return out.select(
        "media_id",
        "width",
        "height",
        F.posexplode("pixels").alias("px_idx", "px_raw"),
    ).select(
        "media_id",
        "width",
        "height",
        "px_idx",
        pround(F.col("px_raw"), 4).alias("px_value"),
    )


def _g711_oracle_sql() -> str:
    """Replays the deterministic code stream (doc_id*31 + i*7 mod 256)
    through the µ-law expansion table embedded as a 256-element SQL list
    — the decode path itself (RIFF parse + table lookup) is what the
    Spark side adds on top, so a mismatch isolates the codec. The table
    literal is generated from the SAME published g711.c formula the
    codec uses AND pinned to the published anchors by
    tests/test_codecs.py (bit-exact vs javax.sound), so oracle and
    engine cannot drift together unnoticed."""
    table = "[-32124,-31100,-30076,-29052,-28028,-27004,-25980,-24956,-23932,-22908,-21884,-20860,-19836,-18812,-17788,-16764,-15996,-15484,-14972,-14460,-13948,-13436,-12924,-12412,-11900,-11388,-10876,-10364,-9852,-9340,-8828,-8316,-7932,-7676,-7420,-7164,-6908,-6652,-6396,-6140,-5884,-5628,-5372,-5116,-4860,-4604,-4348,-4092,-3900,-3772,-3644,-3516,-3388,-3260,-3132,-3004,-2876,-2748,-2620,-2492,-2364,-2236,-2108,-1980,-1884,-1820,-1756,-1692,-1628,-1564,-1500,-1436,-1372,-1308,-1244,-1180,-1116,-1052,-988,-924,-876,-844,-812,-780,-748,-716,-684,-652,-620,-588,-556,-524,-492,-460,-428,-396,-372,-356,-340,-324,-308,-292,-276,-260,-244,-228,-212,-196,-180,-164,-148,-132,-120,-112,-104,-96,-88,-80,-72,-64,-56,-48,-40,-32,-24,-16,-8,0,32124,31100,30076,29052,28028,27004,25980,24956,23932,22908,21884,20860,19836,18812,17788,16764,15996,15484,14972,14460,13948,13436,12924,12412,11900,11388,10876,10364,9852,9340,8828,8316,7932,7676,7420,7164,6908,6652,6396,6140,5884,5628,5372,5116,4860,4604,4348,4092,3900,3772,3644,3516,3388,3260,3132,3004,2876,2748,2620,2492,2364,2236,2108,1980,1884,1820,1756,1692,1628,1564,1500,1436,1372,1308,1244,1180,1116,1052,988,924,876,844,812,780,748,716,684,652,620,588,556,524,492,460,428,396,372,356,340,324,308,292,276,260,244,228,212,196,180,164,148,132,120,112,104,96,88,80,72,64,56,48,40,32,24,16,8,0]"
    return f"""
    WITH idx AS (SELECT unnest(range(400)) AS i),
    pcm AS (
        SELECT d.doc_id AS media_id,
               list_extract({table}, ((d.doc_id * 31 + idx.i * 7) % 256) + 1)
                   AS v
        FROM documents d, idx
    )
    SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_pcm,
           CAST(MIN(v) AS BIGINT) AS min_pcm,
           CAST(MAX(v) AS BIGINT) AS max_pcm
    FROM pcm GROUP BY media_id
    """


@query("q_audio_g711", oracle=_g711_oracle_sql())
def q_audio_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-audio decode end-to-end: µ-law WAV payloads with a
    doc_id-deterministic code stream, decoded by the real RIFF + G.711
    expansion path (operators/codecs.py:parse_wav — bit-exact against
    javax.sound.sampled), reduced to integer-exact PCM statistics the
    SQL oracle replays by table lookup."""
    media = M.documents_as_g711(t(spark, sf_dir, "documents"))
    return M.g711_pcm_stats(media)


@query("q_image_resize_png", oracle=_image_resize_oracle_sql())
def q_image_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_image_resize pipeline over a COMPRESSED container: the same
    seeded gradient wrapped as real PNG (DEFLATE over filtered
    scanlines, operators/codecs.py), decoded by the pure stdlib+numpy
    PNG decoder and block-average resized. Pixels are identical to the
    PPM twin by construction, so the SAME analytic oracle replays both —
    a hash mismatch here is a PNG codec bug, isolated from the resize
    math the PPM query already pins."""
    from py_gtfs_duckdb_spark.functions import pround

    media = M.documents_as_images(
        t(spark, sf_dir, "documents"), container="png"
    )
    out = M.resize_images(media, out_w=4, out_h=3)
    return out.select(
        "media_id",
        "width",
        "height",
        F.posexplode("pixels").alias("px_idx", "px_raw"),
    ).select(
        "media_id",
        "width",
        "height",
        "px_idx",
        pround(F.col("px_raw"), 4).alias("px_value"),
    )


@query("q_image_resize_gif", oracle=_image_resize_oracle_sql())
def q_image_resize_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_image_resize pipeline over the LZW-compressed container:
    the same seeded gradient wrapped as single-frame GIF89a (palette +
    variable-width LZW, operators/codecs.py:encode_gif/decode_gif,
    javax.imageio-cross-validated both directions) and block-average
    resized. Pixels are identical to the PPM/PNG twins by construction,
    so the SAME analytic oracle replays all three — a hash mismatch here
    is a GIF codec bug, isolated from the resize math."""
    from py_gtfs_duckdb_spark.functions import pround

    media = M.documents_as_images(
        t(spark, sf_dir, "documents"), container="gif"
    )
    out = M.resize_images(media, out_w=4, out_h=3)
    return out.select(
        "media_id",
        "width",
        "height",
        F.posexplode("pixels").alias("px_idx", "px_raw"),
    ).select(
        "media_id",
        "width",
        "height",
        "px_idx",
        pround(F.col("px_raw"), 4).alias("px_value"),
    )


@query("q_image_resize_bmp", oracle=_image_resize_oracle_sql())
def q_image_resize_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_image_resize pipeline over the RUN-LENGTH-compressed
    container: the seeded gradient as RLE8 BMP (palette + run-length
    escapes, operators/codecs.py:encode_bmp/decode_bmp, javax.imageio-
    cross-validated both directions). Fourth codec face of the same
    analytic oracle (PPM raw / PNG DEFLATE / GIF LZW / BMP RLE) — a
    hash mismatch isolates a BMP codec bug from the shared resize
    math."""
    from py_gtfs_duckdb_spark.functions import pround

    media = M.documents_as_images(
        t(spark, sf_dir, "documents"), container="bmp"
    )
    out = M.resize_images(media, out_w=4, out_h=3)
    return out.select(
        "media_id",
        "width",
        "height",
        F.posexplode("pixels").alias("px_idx", "px_raw"),
    ).select(
        "media_id",
        "width",
        "height",
        "px_idx",
        pround(F.col("px_raw"), 4).alias("px_value"),
    )


@query(
    "q_video_frames",
    # Every row is decode-verified integer arithmetic: frame count =
    # 3 + doc_id % 3 (container must yield exactly that many FRAME
    # markers) and mean luma of the synthesized gradient = 60 + 4*f +
    # doc_id % 64 (exact — sums of small ints, division by w*h exact).
    oracle="""
    SELECT doc_id AS media_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           CAST(60 + 4 * f + doc_id % 64 AS BIGINT) AS mean_luma
    FROM (SELECT doc_id, unnest(range(0, 3 + doc_id % 3)) AS f FROM documents)
    """,
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling end-to-end: per-doc Y4M clips
    synthesized executor-side (real YUV4MPEG2 containers, variable frame
    count), numpy container parsing, one row per frame with its mean
    luma — the row-explosion shape of video frame extraction with an
    actual decoder in the body
    (operators/multimodal.py:decode_y4m/video_frame_features)."""
    media = M.documents_as_videos(t(spark, sf_dir, "documents"))
    return M.video_frame_features(media)


@query(
    "q_rollup_tokens",
    oracle=r"""
    SELECT COALESCE(source, 'ALL') AS source,
           COALESCE(lang, 'ALL') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT)
               AS total_tokens
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """,
)
def q_rollup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical OLAP rollup — per (source, lang), per source, and
    grand-total token accounting in ONE aggregation pass (Spark
    ``rollup`` ≡ SQL GROUP BY ROLLUP): the mix-report shape a corpus
    team refreshes after every curation run. Partial aggregation is
    map-side combined at every grouping level; NULL level markers are
    coalesced to 'ALL' on both sides so the hash compare is
    unambiguous (the synthetic dims are never null)."""
    from py_gtfs_duckdb_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    return (
        d.select("source", "lang", token_count(F.col("text")).alias("tk"))
        .rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tk").cast("bigint").alias("total_tokens"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_tokens",
        )
    )


@query(
    "q_cube_chars",
    oracle="""
    SELECT COALESCE(source, 'ALL') AS source,
           COALESCE(lang, 'ALL') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE (source, lang)
    """,
)
def q_cube_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — every subset of (source, lang): the grouping
    class ROLLUP (q_rollup_tokens) doesn't produce (the lang-only
    marginals), i.e. the full cross-tab a mixture dashboard pivots on.
    Spark ``cube`` ≡ SQL GROUP BY CUBE: one Expand + one combinable
    aggregation — at 100 TB the Expand multiplies rows by the 4 grouping
    sets BEFORE the map-side partial combine, so the shuffle still
    carries only group aggregates (4 × |source×lang| rows), never the
    corpus. NULL level markers coalesce to 'ALL' on both sides (the
    synthetic dims are never null, so the marker is unambiguous)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("source", "lang", "n_chars")
        .cube("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )


# ---------------------------------------------------------------------------
# round-6 additions: memorization audit, DSIR selection weights, split
# leakage, IVF index-quality profile
# ---------------------------------------------------------------------------


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT doc_id,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS nw
        FROM w
    ), kg AS (
        SELECT doc_id,
               unnest([{_horner_sql(5)}
                       for i in range(1, nw - 5 + 2)]) AS gh
        FROM wh WHERE nw >= 5
    ), grams AS (
        SELECT DISTINCT doc_id, gh FROM kg
    ), dup AS (
        SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2
    ), per AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM grams GROUP BY doc_id
    ), shr AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM grams JOIN dup USING (gh) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
           CASE WHEN COALESCE(p.n_grams, 0) > 0
                THEN floor((COALESCE(s.n_shared, 0)
                            / CAST(p.n_grams AS DOUBLE)) * 10000.0 + 0.5)
                     / 10000.0
                ELSE 0.0 END AS shared_frac
    FROM documents d
    LEFT JOIN per p USING (doc_id)
    LEFT JOIN shr s USING (doc_id)
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-n-gram fraction — the memorization-risk
    audit (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): documents whose distinct 5-grams mostly recur
    elsewhere are residual near-dup text and verbatim-memorization
    drivers. Winnow rolling-hash machinery, two hash aggregations over
    (id, 8-byte hash) pairs (operators/text.py:ngram_novelty)."""
    return X.ngram_novelty(t(spark, sf_dir, "documents"))


# DSIR target slice for the battery: three sources stand in for the
# "target domain" corpus (e.g. wiki+books in the published recipe).
_DSIR_TARGET = ("src0", "src1", "src2")


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               CASE WHEN source IN {_DSIR_TARGET!r} THEN 1 ELSE 0 END AS is_t,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), f AS (
        SELECT doc_id, is_t,
               unnest([('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 8))::BIGINT
                       % 64 for i in range(1, len(ws))]) AS bucket
        FROM w
    ), counts AS (
        SELECT bucket,
               CAST(SUM(is_t) AS BIGINT) AS ct,
               CAST(SUM(1 - is_t) AS BIGINT) AS cr
        FROM f GROUP BY bucket
    ), tot AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS t_total,
               CAST(SUM(cr) AS BIGINT) AS r_total
        FROM counts
    ), model AS (
        SELECT bucket,
               CAST(floor(ln((ct + 1) / CAST(t_total + 64 AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT)
             - CAST(floor(ln((cr + 1) / CAST(r_total + 64 AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM counts, tot
    ), per AS (
        SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
        FROM f GROUP BY doc_id, bucket
    ), sums AS (
        SELECT doc_id,
               CAST(SUM(tf * q) AS BIGINT) AS s,
               CAST(SUM(tf) AS BIGINT) AS n_feats
        FROM per JOIN model USING (bucket) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_feats, 0) AS BIGINT) AS n_feats,
           CASE WHEN COALESCE(n_feats, 0) > 0
                THEN floor(((s / 1000000.0) / n_feats) * 10000.0 + 0.5)
                     / 10000.0
                ELSE 0.0 END AS dsir
    FROM documents d LEFT JOIN sums USING (doc_id)
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023): per-doc mean
    log-likelihood ratio of hashed word-bigram features under a
    target-slice vs rest bag-of-features model — the standard recipe for
    skewing a raw crawl toward a target domain without a trained
    classifier. Integer micro-nat quantization makes the per-doc sum an
    exact BIGINT aggregation (the unigram_nll trick); the 2x64-bucket
    model table broadcasts (operators/lexical.py:dsir_weights)."""
    return L.dsir_weights(
        t(spark, sf_dir, "documents"), F.col("source").isin(*_DSIR_TARGET)
    )


def _split_case_sql() -> str:
    train_bp = 10_000 - P.SPLIT_VAL_BP - P.SPLIT_TEST_BP
    val_bp = 10_000 - P.SPLIT_TEST_BP
    return f"""CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 10000 < {train_bp} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 10000 < {val_bp} THEN 'val'
                ELSE 'test' END"""


@query(
    "q_split_leakage",
    oracle=f"""
    WITH w AS (
        SELECT {_split_case_sql()} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT split,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS nw
        FROM w
    ), kg AS (
        SELECT split,
               unnest([{_horner_sql(3)}
                       for i in range(1, nw - 3 + 2)]) AS gh
        FROM wh WHERE nw >= 3
    ), grams AS (
        SELECT DISTINCT split, gh FROM kg
    ), totals AS (
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n
        FROM grams GROUP BY split
    ), pairs AS (
        SELECT a.split AS split_a, b.split AS split_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM grams a JOIN grams b USING (gh)
        WHERE a.split < b.split GROUP BY 1, 2
    )
    SELECT split_a, split_b, n_shared, ta.n AS n_a, tb.n AS n_b,
           floor((n_shared / CAST(ta.n + tb.n - n_shared AS DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM pairs
    JOIN totals ta ON ta.split = pairs.split_a
    JOIN totals tb ON tb.split = pairs.split_b
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test n-gram leakage matrix: shared distinct 3-grams and
    Jaccard across the computed split boundaries — the audit run before
    any eval score is trusted (per-document splits still leak when
    near-identical text lands on both sides). n=3 keeps the overlap
    non-degenerate on the synthetic fixture (5-grams barely cross the
    1% val/test slices), so every split pair carries hash evidence.
    Reuses the cross-source overlap machinery keyed on split_col
    (operators/pipeline.py:split_leakage)."""
    return P.split_leakage(t(spark, sf_dir, "documents"), n=3)


@query("q_ivf_cell_profile", oracle=AO.ivf_cell_profile_oracle_sql())
def q_ivf_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-quality profile: per-cell occupancy + EXACT integer
    inertia over the quantized-Lloyd centroids — the audit behind
    retrain/re-shard decisions (fat cells are probe-time hotspots,
    rising inertia means centroid drift). The whole training + profile
    chain replays in the SQL oracle; empty cells surface as (0, 0)
    (operators/annq.py:ivf_cell_profile)."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_LLOYD:
        _IVF_LLOYD[sf_dir] = AQ.ivf_train_lloyd_q(e, 16, n_iter=2)
    return AQ.ivf_cell_profile(e, _IVF_LLOYD[sf_dir])


# ---------------------------------------------------------------------------
# round-6 second wave: MinHash calibration, padding-waste audit,
# embedding-moment audit
# ---------------------------------------------------------------------------


@query(
    "q_minhash_calibration",
    oracle=f"""
    WITH {_minhash_ctes()},
    nm AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match
        FROM cand c
        JOIN sig sa ON sa.id = c.id_a
        JOIN sig sb ON sb.id = c.id_b AND sb.perm_idx = sa.perm_idx
        GROUP BY c.id_a, c.id_b
    ),
    jq AS (
        SELECT n.n_match,
               CAST(floor((CAST(len(list_intersect(za.hs, zb.hs)) AS DOUBLE)
                           / (za.sz + zb.sz
                              - len(list_intersect(za.hs, zb.hs))))
                          * 10000.0 + 0.5) AS BIGINT) AS j_bp
        FROM nm n
        JOIN sets za ON za.id = n.id_a
        JOIN sets zb ON zb.id = n.id_b
    )
    SELECT n_match,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           floor((SUM(j_bp) / (COUNT(*) * 10000.0)) * 10000.0 + 0.5)
               / 10000.0 AS avg_jaccard
    FROM jq GROUP BY n_match
    """,
)
def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration curve: for each signature-agreement
    level over the LSH candidate pairs, the pair count and average EXACT
    shingle Jaccard — the audit that justifies (or retunes) the
    EST_MIN_MATCHES prune line. Exact Jaccard quantized to basis points
    before the BIGINT sum, so the average is aggregation-order-free
    (operators/dedup.py:minhash_calibration)."""
    return D.minhash_calibration(t(spark, sf_dir, "documents"), "text", "doc_id", k=3)


def _length_buckets_case_sql(caps) -> str:
    caps = tuple(sorted(caps))
    whens = " ".join(f"WHEN n_tokens <= {c} THEN {c}" for c in caps[:-1])
    return f"CASE {whens} ELSE {caps[-1]} END"


@query(
    "q_length_buckets",
    oracle=rf"""
    WITH tk AS (
        SELECT CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), b AS (
        SELECT CAST({_length_buckets_case_sql(P.LENGTH_CAPS)} AS BIGINT) AS cap,
               least(n_tokens, {P.LENGTH_CAPS[-1]}) AS kept,
               CASE WHEN n_tokens > {P.LENGTH_CAPS[-1]} THEN 1 ELSE 0 END AS tr,
               greatest(n_tokens - {P.LENGTH_CAPS[-1]}, 0) AS lost
        FROM tk
    )
    SELECT cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS token_mass,
           CAST(cap * COUNT(*) - SUM(kept) AS BIGINT) AS pad_waste,
           floor((CAST(cap * COUNT(*) - SUM(kept) AS DOUBLE)
                  / (cap * COUNT(*))) * 10000.0 + 0.5) / 10000.0 AS waste_frac,
           CAST(SUM(tr) AS BIGINT) AS n_truncated,
           CAST(SUM(lost) AS BIGINT) AS trunc_tokens
    FROM b GROUP BY cap
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching: every doc lands
    in the smallest power-of-two cap >= its token count (top cap
    truncates); per bucket, the padding a fixed-length batcher would burn
    and the tokens truncation throws away. One narrow projection + one
    tiny map-side-combined aggregation
    (operators/pipeline.py:length_buckets)."""
    return P.length_buckets(t(spark, sf_dir, "documents"))


@query(
    "q_embedding_audit",
    oracle="""
    WITH cells AS (
        SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0 + 0.5)
                    AS BIGINT) AS q
        FROM embeddings
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           floor((SUM(q) / (COUNT(*) * 10000.0)) * 1000000.0 + 0.5)
               / 1000000.0 AS mean,
           floor(((SUM(q * q) / COUNT(*)
                   - (SUM(q) / COUNT(*)) * (SUM(q) / COUNT(*)))
                  / 100000000.0) * 1000000.0 + 0.5) / 1000000.0 AS var,
           floor((MIN(q) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS min_val,
           floor((MAX(q) / 10000.0) * 10000.0 + 0.5) / 10000.0 AS max_val
    FROM cells GROUP BY dim
    """,
)
def q_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding moment audit (mean/var/min/max over the
    fixed-point quantized values — exact BIGINT sums, one fixed-order
    float epilogue per row): the pre-index sanity gate for the ANN tier —
    dead dimensions waste index capacity, runaway ones dominate every
    distance (operators/annq.py:embedding_audit)."""
    return AQ.embedding_audit(t(spark, sf_dir, "embeddings"))


@query(
    "q_split_rescue",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_split_case_sql()} AS split,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), wh AS (
        SELECT doc_id, split,
               [('0x' || substr(md5(x), 1, 12))::BIGINT % 2147483647
                for x in ws] AS hs,
               len(ws) AS nw
        FROM w
    ), kg AS (
        SELECT doc_id, split,
               unnest([{_horner_sql(3)}
                       for i in range(1, nw - 3 + 2)]) AS gh
        FROM wh WHERE nw >= 3
    ), grams AS (
        SELECT DISTINCT doc_id, split, gh FROM kg
    ), tg AS (
        SELECT DISTINCT gh FROM grams WHERE split = 'train'
    ), lk AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_leaked
        FROM (SELECT doc_id, gh FROM grams WHERE split <> 'train') e
        JOIN tg USING (gh) GROUP BY doc_id
    )
    SELECT d.doc_id,
           {_split_case_sql()} AS split,
           CASE WHEN {_split_case_sql()} <> 'train'
                     AND COALESCE(n_leaked, 0) > 0
                THEN 'train' ELSE {_split_case_sql()} END AS final_split,
           CAST(COALESCE(n_leaked, 0) AS BIGINT) AS n_leaked
    FROM documents d LEFT JOIN lk USING (doc_id)
    """,
)
def q_split_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware split repair: val/test documents sharing any
    distinct 3-gram with the train slice demote to train (an eval example
    the model may have seen measures memorization, not generalization);
    n_leaked carries the evidence. One persisted gram pass, hash-keyed
    semi-join against the train gram set — never broadcast, it scales
    with the corpus (operators/pipeline.py:rescue_leaked_eval)."""
    return P.rescue_leaked_eval(t(spark, sf_dir, "documents"), n=3)


# ---------------------------------------------------------------------------
# the per-document scorecard: one curation record joining four audits
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.plans import ORACLE as _REG  # noqa: E402


def _scorecard_oracle_sql() -> str:
    """Compose the four per-document audit oracles as subqueries joined
    on doc_id — each is a standalone SELECT over the same views, so the
    composition is mechanical and stays in lockstep with the originals
    (they are read from the registry, not duplicated)."""
    return rf"""
    SELECT b.doc_id,
           CAST(len(regexp_extract_all(b.text, '\w+|[^\w\s]')) AS BIGINT)
               AS n_tokens,
           q.quality, nov.shared_frac, nl.nll, ds.dsir
    FROM documents b
    JOIN ({_REG["q_text_quality"]}) q USING (doc_id)
    JOIN ({_REG["q_ngram_novelty"]}) nov USING (doc_id)
    JOIN ({_REG["q_unigram_nll"]}) nl USING (doc_id)
    JOIN ({_REG["q_dsir_weights"]}) ds USING (doc_id)
    """


@query("q_doc_scorecard", oracle=_scorecard_oracle_sql())
def q_doc_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document curation record: token count, heuristic quality,
    duplicated-n-gram fraction, unigram-LM NLL, and DSIR target-domain
    weight in ONE row per document — the table a mixture designer
    actually filters/sorts on. Each audit keeps its standalone shape and
    the scorecard is the final doc_id join tree; since the array-form
    gram refactor (text.ngram_hash_col) none of the audits contains a
    window or a token shuffle, so each branch is scan → per-row array
    math → map-side-combinable aggregation.

    Deliberately NOT a shared-cache "single corpus pass": two fused
    variants were built and measured at sf0.1 — (a) a persisted
    token-level spine (one explode of arrays_zip(words, gram_hashes,
    buckets)) and (b) a persisted doc-level (id, quality, n_tokens,
    words) stage with streaming per-audit explodes. Both were 1.5-2x
    SLOWER warm than this composed form (2.2-3.0 s vs 1.4 s): caching
    array<string> rows costs more to serialize + re-read than re-running
    the columnar parquet scan + split, and at 100 TB variant (a) spills
    a multiple-of-corpus-size cache while the scans it saves are cheap,
    embarrassingly parallel IO. Per-token intermediates should stream;
    the plan guard pins the no-window, no-text-shuffle shape instead.
    The oracle composes the four registered audit oracles as subqueries,
    so the composed arithmetic is hash-checked every round."""
    from py_gtfs_duckdb_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    q = X.quality_score(d)
    nov = X.ngram_novelty(d).select("doc_id", "shared_frac")
    nll = L.unigram_nll(d).select("doc_id", "nll")
    ds = L.dsir_weights(d, F.col("source").isin(*_DSIR_TARGET)).select(
        "doc_id", "dsir"
    )
    return (
        base.join(q, "doc_id")
        .join(nov, "doc_id")
        .join(nll, "doc_id")
        .join(ds, "doc_id")
    )


@query(
    "q_dedup_keep_topk",
    # same composed CTEs as q_dedup_keep_canonical with rn <= k
    oracle=f"""
    WITH RECURSIVE {_clusters_oracle_ctes()},
    q AS ({_quality_oracle_sql()}),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS nm
        FROM clusters c JOIN q ON q.doc_id = c.doc_id
    )
    SELECT cluster_id, doc_id, CAST(rn AS BIGINT) AS rank,
           CAST(nm AS BIGINT) AS n_members, quality AS score
    FROM ranked WHERE rn <= 2
    """,
)
def q_dedup_keep_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tunable dedup action: keep the top-2 highest-quality members
    per near-dup cluster — duplicates up-weight rather than disappear,
    capped per cluster (operators/dedup.py:keep_top_k; k=1 degenerates
    to keep_canonical)."""
    d = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    clusters = cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return D.keep_top_k(clusters, X.quality_score(d), k=2)


# ---------------------------------------------------------------------------
# round 10 additions: fuzzy linkage, tf-idf keywords, distribution drift
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators import linkage as K  # noqa: E402


@query(
    "q_fuzzy_pairs",
    # the oracle verifies the BLOCKING is lossless: it computes the full
    # O(n^2) cross product over the distinct-name dictionary (fine for a
    # single-node reference), so any pair the length-band join missed
    # would surface as a row-count/hash mismatch. Same unit-cost
    # Levenshtein DP in both engines.
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a, n b
    WHERE a.p_name < b.p_name
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over the part-name dictionary
    (operators/linkage.py:fuzzy_pairs): distinct name pairs within 2
    edits, found by a length-band BLOCKED join (each left name hashes to
    one band, each right name replicates into <= 3) — never the
    cross product the oracle brute-forces. The training-metadata use:
    collapsing typo-variant source/entity labels before joins."""
    p = t(spark, sf_dir, "part")
    return K.fuzzy_pairs(p, "p_name", max_dist=2)


@query(
    "q_tfidf_keywords",
    # identical integer arithmetic: idf quantized to micro-nats per term
    # (plus an exact 10^6 for the smoothing "+1"), score ranked as the
    # BIGINT product tf*q, ties on the term string; the only float math
    # is the shared display epilogue. The oracle may window (single-node
    # reference); the Spark side ranks inside a bounded sorted-array
    # slice per document.
    oracle="""
    WITH w AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS w
        FROM documents
    ),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM w GROUP BY 1, 2
    ),
    dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS dfw FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    qi AS (
        SELECT w,
               CAST(FLOOR(LN(CAST(n_docs + 1 AS DOUBLE)
                             / CAST(dfw + 1 AS DOUBLE))
                          * CAST(1000000.0 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE)) AS BIGINT)
                   + 1000000 AS q
        FROM dfq CROSS JOIN nd
    ),
    sc AS (
        SELECT tf.doc_id, tf.w, tf.tf, tf.tf * qi.q AS sq
        FROM tf JOIN qi USING (w)
    ),
    r AS (
        SELECT doc_id, w, tf, sq,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY sq DESC, w ASC) AS rn
        FROM sc
    )
    SELECT doc_id, w AS term, tf,
           FLOOR(CAST(sq AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
                 * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / CAST(10000.0 AS DOUBLE) AS score,
           CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 3
    """,
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document
    (operators/lexical.py:tfidf_keywords) — the model-free document
    signature. Integer-exact ranking (BIGINT tf x micro-nat idf), vocab
    table broadcasts, top-k per doc is a doc-length-bounded array slice
    (no corpus rank window)."""
    d = t(spark, sf_dir, "documents")
    return L.tfidf_keywords(d, k=3)


@query(
    "q_dist_drift",
    # same fixed-bin grid as the q_histogram_quantiles oracle, then:
    # KS from BIGINT bin cumulatives compared in DOUBLE (identical
    # expression tree), PSI from per-bin micro-nat-quantized terms
    # summed as BIGINT (order-independent). The oracle may window for
    # the cumulative; the Spark side folds the n_bins-sized array.
    oracle=r"""
    WITH tk AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS v
        FROM documents
    ),
    b AS (
        SELECT source,
               LEAST(GREATEST(CAST(FLOOR((CAST(v AS DOUBLE)
                   - CAST(0.0 AS DOUBLE)) / CAST(4.0 AS DOUBLE)) AS BIGINT),
                   0), 31) AS bin
        FROM tk WHERE v IS NOT NULL
    ),
    c AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS cg
          FROM b GROUP BY 1, 2),
    gt AS (SELECT source, CAST(SUM(cg) AS BIGINT) AS n_g FROM c GROUP BY 1),
    bt AS (SELECT bin, CAST(SUM(cg) AS BIGINT) AS cb FROM c GROUP BY 1),
    tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS n_all FROM c),
    grid AS (
        SELECT gt.source, gt.n_g, tot.n_all - gt.n_g AS n_r, bt.bin,
               COALESCE(c.cg, 0) AS cg,
               bt.cb - COALESCE(c.cg, 0) AS cr
        FROM gt CROSS JOIN bt CROSS JOIN tot
        LEFT JOIN c ON c.source = gt.source AND c.bin = bt.bin
    ),
    cum AS (
        SELECT source, n_g, n_r, cg, cr,
               SUM(cg) OVER (PARTITION BY source ORDER BY bin) AS ccg,
               SUM(cr) OVER (PARTITION BY source ORDER BY bin) AS ccr,
               CAST(FLOOR(
                   ((CAST(cg AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(n_g AS DOUBLE) + CAST(16.0 AS DOUBLE))
                    - (CAST(cr AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(n_r AS DOUBLE) + CAST(16.0 AS DOUBLE)))
                   * LN(((CAST(cg AS DOUBLE) + CAST(0.5 AS DOUBLE))
                         / (CAST(n_g AS DOUBLE) + CAST(16.0 AS DOUBLE)))
                        / ((CAST(cr AS DOUBLE) + CAST(0.5 AS DOUBLE))
                           / (CAST(n_r AS DOUBLE) + CAST(16.0 AS DOUBLE))))
                   * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   AS BIGINT) AS qterm
        FROM grid
    ),
    dev AS (
        SELECT source, n_g, n_r, qterm,
               ABS(CAST(ccg AS DOUBLE) * CAST(n_r AS DOUBLE)
                   - CAST(ccr AS DOUBLE) * CAST(n_g AS DOUBLE)) AS d
        FROM cum
    )
    SELECT source, n_g AS n,
           CASE WHEN n_r > 0 THEN
               FLOOR(MAX(d) / (CAST(n_g AS DOUBLE) * CAST(n_r AS DOUBLE))
                     * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / CAST(10000.0 AS DOUBLE)
           ELSE CAST(0.0 AS DOUBLE) END AS ks,
           FLOOR(CAST(SUM(qterm) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
                 * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / CAST(10000.0 AS DOUBLE) AS psi
    FROM dev
    GROUP BY source, n_g, n_r
    """,
)
def q_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift vs the rest of the corpus
    (operators/pipeline.py:histogram_drift): two-sample KS distance and
    PSI over the token-count histogram — the pre-mixing drift monitor.
    Bounded state everywhere: (source, bin) combinable counts, a
    broadcast n_bins-row global table, one n_bins-sized fold per source."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(X.TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return P.histogram_drift(
        tk, "n_tokens", "source", n_bins=32, lo=0.0, hi=128.0, smooth=0.5
    )


@query(
    "q_dedup_containment",
    # brute-force oracle — STRONGER than replaying the prefix filter: it
    # joins the full exploded shingle tables, so a lossy change to the
    # Spark side's candidate generation (prefix slice, size filter,
    # positional filter) surfaces as a missing-row hash mismatch, not a
    # silently-agreeing replay. Same md5-48 shingle front-end as every
    # dedup oracle.
    oracle=f"""
    WITH w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
        FROM (
            SELECT DISTINCT id,
                   unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                           for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
            FROM w
        )
    ), sets AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS o
        FROM sh a JOIN sh b ON a.h = b.h AND a.id <> b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor((CAST(o AS DOUBLE) / za.sz) * 10000.0 + 0.5) / 10000.0
               AS containment
    FROM inter JOIN sets za ON za.id = inter.id_a
    WHERE o >= {D.sql_slacked_ceil("za.sz * 0.6", "za.sz")}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment join
    (operators/dedup.py:containment_pairs): ordered pairs where >= 60%
    of A's distinct 3-shingles appear in B — the quote-inclusion dedup
    tier Jaccard structurally misses (J's length filter caps |B| at
    |A|/t; containment has no upper bound on the container). A-side
    prefix explode, B-side full hash-only inverted index, exact size +
    positional prunes inside the join."""
    d = t(spark, sf_dir, "documents")
    return D.containment_pairs(d, "text", "doc_id", k=3, threshold=0.6)


def _containment_policy_oracle_sql(threshold: float = 0.6, levels: int = 8) -> str:
    """Independent SQL resolution of the containment keep-policy over the
    brute-force pair list: transitive closure via a recursive CTE →
    SCC labels (mutual reachability, min-id representative) → sinks-first
    keep/reject unrolled ``levels`` deep over the condensed DAG. Each
    unrolled level determines one reject AND one keep (two chain
    positions), so ``levels=8`` fully determines chains up to ~17 deep
    (measured peel depth ≤4 at both oracle SFs, guarded by
    tests/test_policy_deep_chain.py) — a deeper graph leaves late-chain
    SCCs out of ``r{levels}`` and surfaces as a loud hash mismatch,
    never a silent agreement, because the Spark side iterates to the
    true fixpoint (proven on a depth-19 synthetic chain in the same test
    file: levels=8 yields a strict subset of the rejects, levels=12
    exact).

    The multi-referenced CTEs are MATERIALIZED: without the hint DuckDB
    re-inlines the brute-force shingle self-join into every unrolled
    level and the recursive closure (measured 149 s → 0.2 s at sf0.01)."""
    base = f"""
    WITH RECURSIVE w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
        FROM (
            SELECT DISTINCT id,
                   unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                           for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
            FROM w
        )
    ), zsets AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY id),
    inter AS MATERIALIZED (
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS o
        FROM sh a JOIN sh b ON a.h = b.h AND a.id <> b.id
        GROUP BY 1, 2
    ), cpairs AS MATERIALIZED (
        SELECT id_a, id_b
        FROM inter JOIN zsets za ON za.id = inter.id_a
        WHERE o >= {D.sql_slacked_ceil(f"za.sz * {threshold}", "za.sz")}
    ), pnodes AS (
        SELECT DISTINCT id_a AS n FROM cpairs
        UNION SELECT DISTINCT id_b FROM cpairs
    ), reach(a, b) AS (
        SELECT id_a, id_b FROM cpairs
        UNION
        SELECT r.a, p.id_b FROM reach r JOIN cpairs p ON p.id_a = r.b
    ), sccl AS MATERIALIZED (
        SELECT n.n AS id,
               least(
                   n.n,
                   coalesce(
                       (SELECT min(r1.b) FROM reach r1
                        JOIN reach r2 ON r2.a = r1.b AND r2.b = n.n
                        WHERE r1.a = n.n),
                       n.n
                   )
               ) AS scc
        FROM pnodes n
    ), cedges AS MATERIALIZED (
        SELECT DISTINCT sa.scc AS cu, sb.scc AS cv
        FROM cpairs p
        JOIN sccl sa ON sa.id = p.id_a
        JOIN sccl sb ON sb.id = p.id_b
        WHERE sa.scc <> sb.scc
    ), sccs AS MATERIALIZED (SELECT DISTINCT scc AS c FROM sccl
    ), k0 AS (SELECT c FROM sccs WHERE c NOT IN (SELECT cu FROM cedges))"""
    lv = ""
    for i in range(1, levels + 1):
        prev_k = f"k{i - 1}"
        lv += f""",
    r{i} AS (
        SELECT DISTINCT cu AS c FROM cedges
        WHERE cv IN (SELECT c FROM {prev_k})
    ), k{i} AS (
        SELECT c FROM sccs WHERE c NOT IN (
            SELECT cu FROM cedges
            WHERE cv NOT IN (SELECT c FROM r{i})
        )
    )"""
    final = f"""
    SELECT s.id AS doc_id FROM sccl s
    WHERE s.scc IN (SELECT c FROM r{levels})
    UNION
    SELECT s.id FROM sccl s
    WHERE s.id <> s.scc AND s.scc IN (SELECT c FROM k{levels})
    """
    return base + lv + final


@query("q_dedup_policy", oracle=_containment_policy_oracle_sql())
def q_dedup_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment keep-policy rejects over the q_dedup_containment pair
    list, resolved through the DISTRIBUTED path (cap=0 forces the SCC
    condensation + sinks-first DAG rounds of operators/graph.py, never a
    driver collect) — the driver-checked face of VERDICT r11 Next #3.
    Output: the doc_ids the policy rejects (every one has a surviving
    container, or loses a kept-SCC min-id tie)."""
    from py_gtfs_duckdb_spark.streaming.ingest import (
        containment_policy_rejects_frame,
    )

    d = t(spark, sf_dir, "documents")
    pairs = D.containment_pairs(d, "text", "doc_id", k=3, threshold=0.6)
    rejects = containment_policy_rejects_frame(pairs, max_driver_pairs=0)
    return rejects.select(F.col("id").alias("doc_id"))


@query(
    "q_dedup_containment_inc",
    # the q_dedup_containment brute-force oracle restricted to the
    # new-batch x corpus direction (doc_id % 7 = 0 stands in for the
    # batch, as in q_dedup_incremental)
    oracle=f"""
    WITH w AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
        FROM (
            SELECT DISTINCT id,
                   unnest([coalesce(array_to_string(ws[i : i + 2], ' '), '')
                           for i in range(1, greatest(len(ws) - 2, 1) + 1)]) AS s
            FROM w
        )
    ), sets AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS o
        FROM sh a JOIN sh b ON a.h = b.h
        WHERE a.id % 7 = 0 AND b.id % 7 <> 0
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor((CAST(o AS DOUBLE) / za.sz) * 10000.0 + 0.5) / 10000.0
               AS containment
    FROM inter JOIN sets za ON za.id = inter.id_a
    WHERE o >= {D.sql_slacked_ceil("za.sz * 0.6", "za.sz")}
    """,
)
def q_dedup_containment_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time containment check
    (operators/dedup.py:containment_pairs_incremental): each 'new batch'
    document (doc_id % 7 = 0) probed for mostly-contained-in-corpus —
    only batch prefixes explode, the corpus contributes the hash-only
    inverted index, never a corpus self-join."""
    d = t(spark, sf_dir, "documents")
    return D.containment_pairs_incremental(
        d.filter(F.col("doc_id") % 7 == 0),
        d.filter(F.col("doc_id") % 7 != 0),
        "text",
        "doc_id",
        k=3,
        threshold=0.6,
    )


def _ann_recall_oracle_sql(nprobes=(1, 2, 4), k=5) -> str:
    """Composed oracle: the q_ann_ivf front-end CTEs (seed centroids,
    cell assignment) + the q_knn_cosine brute-force ground truth + one
    approx branch per nprobe — recall read off a (nprobe, query) grid so
    zero-hit queries keep their row."""
    per_np = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({np} AS BIGINT) AS nprobe, query_id, vec_id FROM (
            SELECT p.query_id, c.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY floor((list_dot_product(p.qv, c.v)
                                       / (p.qn * c.nrm))
                                      * 10000.0 + 0.5) / 10000.0 DESC,
                                c.vec_id
                   ) AS rnk
            FROM (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid
                  FROM assign WHERE vec_id < 10 AND rn <= {np}) p
            JOIN cells c ON c.cid = p.cid AND c.vec_id <> p.query_id
        ) WHERE rnk <= {k}"""
        for np in nprobes
    )
    np_list = ", ".join(f"CAST({np} AS BIGINT)" for np in nprobes)
    return f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cnrm
        FROM vecs ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), assign AS (
        SELECT vec_id, v, nrm, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id
                   ORDER BY floor((list_dot_product(v, cv) / (nrm * cnrm))
                                  * 10000.0 + 0.5) / 10000.0 DESC, cid
               ) AS rn
        FROM vecs CROSS JOIN cent
    ), cells AS (
        SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1
    ), exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY floor((list_dot_product(q.v, e.v)
                                       / (q.nrm * e.nrm))
                                      * 10000.0 + 0.5) / 10000.0 DESC,
                                e.vec_id
                   ) AS rn
            FROM vecs e CROSS JOIN (SELECT * FROM vecs WHERE vec_id < 10) q
            WHERE e.vec_id <> q.vec_id
        ) WHERE rn <= {k}
    ), approx AS ({per_np}
    ), hits AS (
        SELECT a.nprobe, a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM approx a
        JOIN exact e ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        GROUP BY 1, 2
    ), ex_n AS (
        SELECT query_id,
               CAST(LEAST(COUNT(*), {k}) AS BIGINT) AS n_exact
        FROM exact GROUP BY 1
    ), grid AS (
        SELECT np.nprobe, x.query_id, x.n_exact
        FROM ex_n x
        CROSS JOIN (SELECT UNNEST([{np_list}]) AS nprobe) np
    )
    SELECT g.nprobe, g.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           floor((CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                  / CAST(g.n_exact AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
               AS recall
    FROM grid g
    LEFT JOIN hits h ON h.nprobe = g.nprobe AND h.query_id = g.query_id
    """


@query("q_ann_recall_curve", oracle=_ann_recall_oracle_sql())
def q_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN tuning loop as one query
    (operators/similarity.py:ann_recall): recall@5 of seeded IVF vs the
    brute-force ground truth at nprobe 1/2/4 — the curve an operator
    reads to pick the cheapest probe setting above the recall target.
    The exact table computes ONCE (scoped persist) and feeds all three
    comparisons; each comparison is a semi-join + combinable count over
    k x |queries| rows. The IVF side likewise trains its seed centroids
    once and persists the nprobe-INDEPENDENT corpus cell assignment, so
    the sweep pays one corpus scan, not one per probe setting —
    identical results, two fewer full passes (r13)."""
    from py_gtfs_duckdb_spark.operators._scope import shared

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = shared(S.cosine_topk(e, q, k=5))
    cent = S.ivf_centroids(e, 16)
    cells = shared(S.ivf_corpus_cells(e, cent))
    parts = []
    for np_ in (1, 2, 4):
        approx = S.ivf_topk(
            e, q, k=5, nprobe=np_, centroids=cent, corpus_cells=cells
        )
        parts.append(
            S.ann_recall(approx, exact, 5).select(
                F.lit(np_).cast("bigint").alias("nprobe"),
                "query_id",
                "n_hits",
                "recall",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q_mix_temperature",
    # identical integer pipeline: per-source token sums, share^alpha
    # quantized to micro-units, BIGINT normalizer, q/Q display ratio,
    # EXACT integer budget split (BIGINT div — no float in the
    # allocation). POW carries the same libm caveat as LN (both engines
    # bind glibc here).
    oracle=r"""
    WITH tk AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                   AS n
        FROM documents
    ),
    per AS (SELECT source, CAST(SUM(n) AS BIGINT) AS src_tokens
            FROM tk GROUP BY 1),
    tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens FROM per),
    q AS (
        SELECT source, src_tokens,
               CAST(FLOOR(POW(CAST(src_tokens AS DOUBLE)
                              / CAST(total_tokens AS DOUBLE),
                              CAST(0.5 AS DOUBLE))
                          * CAST(1000000.0 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qv
        FROM per CROSS JOIN tot
    ),
    qs AS (SELECT CAST(SUM(qv) AS BIGINT) AS qsum FROM q)
    SELECT source, src_tokens,
           floor((CAST(qv AS DOUBLE) / qsum) * 1000000.0 + 0.5) / 1000000.0
               AS weight,
           CAST(CAST(50000 AS BIGINT) * qv // qsum AS BIGINT)
               AS budget_tokens
    FROM q CROSS JOIN qs
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture budgets
    (operators/pipeline.py:temperature_budgets): weight ∝ token-share^0.5
    per source with an exact integer split of a 50k-token budget — the
    low-resource up-weighting step ahead of mix_sources. One corpus
    pass, sources-sized everything after."""
    d = t(spark, sf_dir, "documents")
    return P.temperature_budgets(d, alpha=0.5, token_budget=50_000)


def _profile_col_sql(name: str, kind: str, from_sql: str = "orders") -> str:
    mn_i = mx_i = "CAST(NULL AS BIGINT)"
    mn_d = mx_d = "CAST(NULL AS DOUBLE)"
    mn_s = mx_s = "CAST(NULL AS VARCHAR)"
    if kind == "int":
        mn_i, mx_i = f"CAST(MIN({name}) AS BIGINT)", f"CAST(MAX({name}) AS BIGINT)"
    elif kind == "timestamp":
        mn_i, mx_i = (
            f"CAST(epoch_ms(MIN({name})) AS BIGINT)",
            f"CAST(epoch_ms(MAX({name})) AS BIGINT)",
        )
    elif kind == "date":
        # epoch days, matching profile_table's date branch
        mn_i, mx_i = (
            f"CAST(MIN({name}) - DATE '1970-01-01' AS BIGINT)",
            f"CAST(MAX({name}) - DATE '1970-01-01' AS BIGINT)",
        )
    elif kind == "float":
        mn_d, mx_d = f"CAST(MIN({name}) AS DOUBLE)", f"CAST(MAX({name}) AS DOUBLE)"
    elif kind == "string":
        mn_s, mx_s = f"MIN({name})", f"MAX({name})"
    return f"""
    SELECT '{name}' AS col_name, '{kind}' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {mn_i} AS min_int, {mx_i} AS max_int,
           {mn_d} AS min_num, {mx_d} AS max_num,
           {mn_s} AS min_str, {mx_s} AS max_str
    FROM {from_sql}"""


_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "float"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]


@query(
    "q_profile_table",
    # one UNION ALL branch per column, each computing the same exact
    # statistics the Spark single-pass wide aggregation emits
    oracle="\n    UNION ALL\n".join(
        _profile_col_sql(n, k) for n, k in _PROFILE_COLS
    ),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profile (operators/pipeline.py:profile_table) — the
    deterministic DuckDB-SUMMARIZE equivalent over ``orders``: counts,
    exact distincts, and type-appropriate min/max (epoch millis for
    timestamps, no float mean — a distributed double sum is
    order-dependent, excluded by the determinism contract). ONE corpus
    scan for all six columns."""
    o = t(spark, sf_dir, "orders")
    return P.profile_table(o)


_PROFILE_DATES_FROM = (
    "(SELECT CAST(o_orderdate AS DATE) AS o_date, o_orderkey FROM orders)"
)


@query(
    "q_profile_dates",
    # the DATE branch of the profiler, oracle-replayed as epoch days
    oracle="\n    UNION ALL\n".join(
        _profile_col_sql(n, k, from_sql=_PROFILE_DATES_FROM)
        for n, k in [("o_date", "date"), ("o_orderkey", "int")]
    ),
)
def q_profile_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile_table's DATE branch (ADVICE r10: date columns used to be
    labeled kind=date but emit all-null min/max): min/max as epoch DAYS —
    the date sibling of the timestamp epoch-millis convention — over
    ``orders`` with o_orderdate cast to DATE."""
    o = t(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderdate").cast("date").alias("o_date"), "o_orderkey"
    )
    return P.profile_table(d)


@query(
    "q_skew_report",
    # the oracle may window over the full key table (single-node
    # reference); the Spark side is TakeOrderedAndProject + a post-limit
    # rank window over top_n rows
    oracle="""
    WITH per AS (
        SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM per),
    r AS (
        SELECT l_suppkey, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey)
                    AS BIGINT) AS rank
        FROM per
    )
    SELECT l_suppkey, cnt,
           floor(CAST(cnt AS DOUBLE) / total * 1000000.0 + 0.5) / 1000000.0
               AS frac,
           rank
    FROM r CROSS JOIN tot WHERE rank <= 10
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (operators/pipeline.py:skew_report): the
    10 heaviest l_suppkey groups of lineitem with their row fractions —
    what an operator reads before shuffling a big join on that key
    (SCALING.md par.6's playbook trigger). Combinable count +
    TakeOrderedAndProject; the only window runs over the 10 surviving
    rows."""
    li = t(spark, sf_dir, "lineitem")
    return P.skew_report(li, "l_suppkey", top_n=10)


def _lsh_recall_oracle_sql(n_planes: int = 6, dim: int = 64, k: int = 5) -> str:
    """Recall of the quantized-LSH family vs brute force — reuses the
    ann_oracles shared head and the SAME seeded hyperplane constants the
    Spark operator ships (shared reference data, not duplicated logic)."""
    planes = AO.annq.lsh_planes(n_planes, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> qv[i] * {AO._plane_literal(planes[p])}[i])) > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    flips = ", ".join(str(1 << p) for p in range(n_planes))
    return f"""
    WITH {AO._VECS_CTE},
    b AS (
        SELECT vec_id, v, nrm, ({bucket_terms}) AS bucket FROM vecs
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qf, nrm AS qn,
               xor(bucket, flip) AS bucket
        FROM b, (SELECT unnest(list_value(0, {flips})) AS flip) f
        WHERE vec_id < 10
    ),
    approx AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id
                   ) AS rnk
            FROM (
                SELECT DISTINCT p.query_id, c.vec_id,
                       floor((list_dot_product(p.qf, c.v) / (p.qn * c.nrm))
                             * 10000.0 + 0.5) / 10000.0 AS cosine
                FROM probes p JOIN b c ON c.bucket = p.bucket
                                      AND c.vec_id <> p.query_id
            )
        ) WHERE rnk <= {k}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY floor((list_dot_product(q.v, e.v)
                                       / (q.nrm * e.nrm))
                                      * 10000.0 + 0.5) / 10000.0 DESC,
                                e.vec_id
                   ) AS rn
            FROM vecs e CROSS JOIN (SELECT * FROM vecs WHERE vec_id < 10) q
            WHERE e.vec_id <> q.vec_id
        ) WHERE rn <= {k}
    ),
    hits AS (
        SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM approx a
        JOIN exact e ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        GROUP BY 1
    )
    SELECT x.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           floor((CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                  / CAST(x.n_exact AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
               AS recall
    FROM (SELECT query_id, CAST(LEAST(COUNT(*), {k}) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1) x
    LEFT JOIN hits h ON h.query_id = x.query_id
    """


@query("q_ann_recall_lsh", oracle=_lsh_recall_oracle_sql())
def q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall harness generalized to a second index family
    (operators/similarity.py:ann_recall over annq.lsh_topk_q):
    recall@5 of the quantized multiprobe-LSH index vs brute force, per
    query — same semi-join + combinable-count recall math, different
    approximate pipeline plugged in."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    approx = AQ.lsh_topk_q(e, q, k=5, n_planes=6)
    return S.ann_recall(approx, S.cosine_topk(e, q, k=5), 5)


def _pq_recall_oracle_sql(
    m: int = 8, ksub: int = 16, n_iter: int = 2, k: int = 5,
    shortlist_mult: int = 5,
) -> str:
    """Recall of the PQ-ADC family vs brute force — composes the shared
    pq training/encode CTEs (ann_oracles._pq_train_encode_ctes) with the
    brute-force ground truth and the per-query recall grid."""
    train, _cb = AO._pq_train_encode_ctes(m, ksub, n_iter, 2048, 64)
    return f"""
    WITH {AO._VECS_CTE},{train},
    adc AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.ld) AS BIGINT) AS dist
        FROM enc e JOIN lut l ON l.s = e.s AND l.cidx = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY l.query_id, e.vec_id
    ),
    short AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY dist ASC, vec_id ASC
                   ) AS rn
            FROM adc
        ) WHERE rn <= {k * shortlist_mult}
    ),
    approx AS (
        SELECT query_id, vec_id FROM (
            SELECT s.query_id, s.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.query_id
                       ORDER BY floor((list_dot_product(q.v, c.v)
                                       / (q.nrm * c.nrm))
                                      * 10000.0 + 0.5) / 10000.0 DESC,
                                s.vec_id
                   ) AS rnk
            FROM short s
            JOIN vecs q ON q.vec_id = s.query_id
            JOIN vecs c ON c.vec_id = s.vec_id
        ) WHERE rnk <= {k}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY floor((list_dot_product(q.v, e.v)
                                       / (q.nrm * e.nrm))
                                      * 10000.0 + 0.5) / 10000.0 DESC,
                                e.vec_id
                   ) AS rn
            FROM vecs e CROSS JOIN (SELECT * FROM vecs WHERE vec_id < 10) q
            WHERE e.vec_id <> q.vec_id
        ) WHERE rn <= {k}
    ),
    hits AS (
        SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM approx a
        JOIN exact e ON e.query_id = a.query_id AND e.vec_id = a.vec_id
        GROUP BY 1
    )
    SELECT x.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           floor((CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
                  / CAST(x.n_exact AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
               AS recall
    FROM (SELECT query_id, CAST(LEAST(COUNT(*), {k}) AS BIGINT) AS n_exact
          FROM exact GROUP BY 1) x
    LEFT JOIN hits h ON h.query_id = x.query_id
    """


@query("q_ann_recall_pq", oracle=_pq_recall_oracle_sql())
def q_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall harness over the third index family: recall@5 of the
    PQ-ADC + exact-re-rank pipeline (annq.pq_topk_rerank_q, cached
    codebook) vs brute force — IVF curve, LSH instance, and PQ instance
    now cover every compressed-domain family the repo ships."""
    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_CB:
        _PQ_CB[sf_dir] = AQ.pq_train_q(e, m=8, ksub=16, n_iter=2)
    cb = _PQ_CB[sf_dir]
    codes = AQ.pq_encode_q(e, cb)
    q = e.filter(F.col("vec_id") < 10)
    approx = AQ.pq_topk_rerank_q(codes, e, q, cb, k=5)
    return S.ann_recall(approx, S.cosine_topk(e, q, k=5), 5)


@query(
    "q_golden_records",
    # same recursive-closure cluster CTEs as q_dedup_clusters; the
    # field-level survivorship replays with arg_max over a fixed-width
    # printf-encoded (length, id) key — lexicographic == numeric for
    # the non-negative components, and the id component makes the key
    # unique, so arg_max is deterministic on both engines
    oracle=f"""
    WITH RECURSIVE {_clusters_oracle_ctes()}
    SELECT c.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id,
           arg_max(d.text, printf('%020d', length(d.text))
                           || printf('%020d', d.doc_id)) AS text,
           MIN(d.source) AS source,
           CAST(MAX(d.n_chars) AS BIGINT) AS n_chars
    FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY 1
    """,
)
def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level survivorship merge
    (operators/dedup.py:golden_records): each MinHash near-dup cluster
    collapses to ONE merged record taking the LONGEST text (most
    complete content), the minimum source label, and the maximum
    n_chars — fields may come from different members, the step
    keep_canonical's whole-row pick cannot express. Every rule is a
    combinable aggregation: the mega-cluster costs one candidate per
    field per partition, never a sort."""
    d = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(d, "text", "doc_id", k=3, threshold=0.7)
    cc = G.connected_components(pairs, "id_a", "id_b")
    clusters = cc.select("id", F.col("component").alias("cluster_id"))
    return D.golden_records(
        d, clusters, "doc_id",
        rules={"text": "longest", "source": "min", "n_chars": "max"},
    )
