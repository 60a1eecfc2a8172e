"""DuckDB oracle SQL generators for the quantized ANN tier.

Each generator emits a single SQL statement that REPLAYS the full index
lifecycle of the matching ``operators/annq.py`` operator — LSH bucketing,
Lloyd k-means training, PQ codebook training, encoding, ADC — in exact
integer arithmetic over fixed-point quantized vectors (``round(x*10^4)``
BIGINT), so every intermediate agrees bit-for-bit with the Spark side and
the driver's value-hash check covers the whole approximate index, not
just a recall bound. The only float steps are the ones already proven
engine-portable since round 3: ``sqrt(list_dot_product(v, v))`` norms and
the rounded dimension-sequential cosine (the q_knn_cosine contract).

The LSH hyperplane literals are generated from the SAME seeded constants
the Spark operator ships in its task closure (annq.lsh_planes) — shared
reference data, not duplicated logic.
"""

from __future__ import annotations

from py_gtfs_duckdb_spark.operators import annq

# (vec_id, v DOUBLE[], nrm, qv BIGINT[]) over the embeddings table —
# the shared head of every ANN oracle.
_VECS_CTE = """
    vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 10000.0 + 0.5) AS BIGINT))
                   AS qv
        FROM embeddings
    )"""


def _plane_literal(plane) -> str:
    return "list_value(" + ", ".join(str(int(x)) for x in plane) + ")"


def lsh_oracle_sql(n_planes: int = 6, dim: int = 64, k: int = 5) -> str:
    """Replay annq.lsh_topk_q: integer sign-pattern buckets from the
    shared seeded integer hyperplanes, multiprobe at Hamming distance
    <= 1, exact rounded cosine inside matching buckets, top-k."""
    planes = annq.lsh_planes(n_planes, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> qv[i] * {_plane_literal(planes[p])}[i])) > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    flips = ", ".join(str(1 << p) for p in range(n_planes))
    return f"""
    WITH {_VECS_CTE},
    b AS (
        SELECT vec_id, v, nrm, ({bucket_terms}) AS bucket FROM vecs
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qf, nrm AS qn,
               xor(bucket, flip) AS bucket
        FROM b, (SELECT unnest(list_value(0, {flips})) AS flip) f
        WHERE vec_id < 10
    ),
    cand AS (
        SELECT DISTINCT p.query_id, c.vec_id,
               floor((list_dot_product(p.qf, c.v) / (p.qn * c.nrm))
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM probes p JOIN b c ON c.bucket = p.bucket
                              AND c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS BIGINT) AS rank
        FROM cand
    ) WHERE rank <= {k}
    """


def _lloyd_iter_ctes(prev: str, out: str, tag: str, dim: int) -> str:
    """One integer-exact Lloyd iteration: assign every quantized vector
    to its nearest (integer squared distance, ties -> smaller cid)
    centroid in ``prev``, then per-dim floor(sum/count) means; empty
    cells keep their previous centroid."""
    return f"""
    a{tag} AS (
        SELECT vec_id, qv, cid FROM (
            SELECT v.vec_id, v.qv, s.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                       list_sum(list_transform(range(1, {dim + 1}),
                           i -> (v.qv[i] - s.c[i]) * (v.qv[i] - s.c[i]))) ASC,
                       s.cid ASC) AS rn
            FROM vecs v CROSS JOIN {prev} s
        ) WHERE rn = 1
    ),
    m{tag} AS (
        SELECT cid, pos,
               CAST(floor(SUM(val) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cd
        FROM (SELECT cid, generate_subscripts(qv, 1) AS pos,
                     unnest(qv) AS val
              FROM a{tag})
        GROUP BY cid, pos
    ),
    u{tag} AS (SELECT cid, list(cd ORDER BY pos) AS c FROM m{tag} GROUP BY cid),
    {out} AS (
        SELECT s.cid, COALESCE(u.c, s.c) AS c
        FROM {prev} s LEFT JOIN u{tag} u USING (cid)
    )"""


def ivf_lloyd_oracle_sql(
    n_centroids: int = 16,
    n_iter: int = 2,
    nprobe: int = 4,
    k: int = 5,
    dim: int = 64,
) -> str:
    """Replay annq.ivf_train_lloyd_q + similarity.ivf_topk serving: md5
    seed selection, ``n_iter`` unrolled integer Lloyd iterations, then
    the rounded-cosine cell/probe assignment and top-k of q_ann_ivf."""
    iters = []
    prev = "c0"
    for it in range(1, n_iter + 1):
        out = f"c{it}"
        iters.append(_lloyd_iter_ctes(prev, out, str(it), dim))
        prev = out
    iter_sql = ",".join(iters)
    return f"""
    WITH {_VECS_CTE},
    c0 AS (
        SELECT vec_id AS cid, qv AS c FROM vecs
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}
    ),{iter_sql},
    cent AS (
        SELECT cid, list_transform(c, x -> x / 10000.0) AS cv FROM {prev}
    ),
    centn AS (
        SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM cent
    ),
    assign AS (
        SELECT v.vec_id, v.v, v.nrm, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY floor((list_dot_product(v.v, s.cv)
                                   / (v.nrm * s.cnrm)) * 10000.0 + 0.5)
                            / 10000.0 DESC, s.cid
               ) AS rn
        FROM vecs v CROSS JOIN centn s
    ),
    cells AS (SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, v AS qf, nrm AS qn, cid
        FROM assign WHERE vec_id < 10 AND rn <= {nprobe}
    ),
    cand AS (
        SELECT p.query_id, c.vec_id,
               floor((list_dot_product(p.qf, c.v) / (p.qn * c.nrm))
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM probes p JOIN cells c ON c.cid = p.cid AND c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS BIGINT) AS rank
        FROM cand
    ) WHERE rank <= {k}
    """


# (vec_id, qv BIGINT[]) of the NORMALIZED quantized vectors + per-subspace
# slices — the shared head of the PQ oracles. Normalization order matches
# annq.seq_normalize + quantize_mat exactly: divide by the sequential
# norm, THEN scale/round.
def _pq_head_ctes(m: int, dsub: int, sample_size: int, ksub: int) -> str:
    return f"""
    nq AS (
        SELECT vec_id,
               list_transform(v, x ->
                   CAST(floor((x / CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)
                              * 10000.0 + 0.5) AS BIGINT)) AS qv
        FROM vecs
    ),
    samp AS (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS rnk
        FROM nq QUALIFY rnk <= {sample_size}
    ),
    subs AS (
        SELECT rnk, sx.s,
               list_slice(qv, sx.s * {dsub} + 1, sx.s * {dsub} + {dsub}) AS sub
        FROM samp, (SELECT unnest(range(0, {m})) AS s) sx
    ),
    cb0 AS (SELECT s, rnk - 1 AS cidx, sub AS c FROM subs WHERE rnk <= {ksub})"""


def _pq_iter_ctes(prev: str, out: str, tag: str, dsub: int) -> str:
    """One integer-exact k-means iteration over ALL subspaces at once
    (subspace id is data, so the m-way loop collapses into one CTE)."""
    return f"""
    pa{tag} AS (
        SELECT rnk, s, sub, cidx FROM (
            SELECT t.rnk, t.s, t.sub, c.cidx,
                   ROW_NUMBER() OVER (PARTITION BY t.rnk, t.s ORDER BY
                       list_sum(list_transform(range(1, {dsub + 1}),
                           i -> (t.sub[i] - c.c[i]) * (t.sub[i] - c.c[i]))) ASC,
                       c.cidx ASC) AS rn
            FROM subs t JOIN {prev} c ON c.s = t.s
        ) WHERE rn = 1
    ),
    pm{tag} AS (
        SELECT s, cidx, pos,
               CAST(floor(SUM(val) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cd
        FROM (SELECT s, cidx, generate_subscripts(sub, 1) AS pos,
                     unnest(sub) AS val
              FROM pa{tag})
        GROUP BY s, cidx, pos
    ),
    pu{tag} AS (
        SELECT s, cidx, list(cd ORDER BY pos) AS c
        FROM pm{tag} GROUP BY s, cidx
    ),
    {out} AS (
        SELECT b.s, b.cidx, COALESCE(u.c, b.c) AS c
        FROM {prev} b LEFT JOIN pu{tag} u ON u.s = b.s AND u.cidx = b.cidx
    )"""


def _pq_train_encode_ctes(
    m: int, ksub: int, n_iter: int, sample_size: int, dim: int
) -> tuple[str, str]:
    """(ctes, final_codebook_name): quantize+sample+train+encode+LUT CTEs
    shared by the PQ and IVF+PQ oracles. Emits ``enc`` (vec_id, s, code)
    for the whole corpus and ``lut`` (query_id, s, cidx, ld)."""
    dsub = dim // m
    iters = []
    prev = "cb0"
    for it in range(1, n_iter + 1):
        out = f"cb{it}"
        iters.append(_pq_iter_ctes(prev, out, str(it), dsub))
        prev = out
    ctes = f"""{_pq_head_ctes(m, dsub, sample_size, ksub)},{",".join(iters)},
    csubs AS (
        SELECT vec_id, sx.s,
               list_slice(qv, sx.s * {dsub} + 1, sx.s * {dsub} + {dsub}) AS sub
        FROM nq, (SELECT unnest(range(0, {m})) AS s) sx
    ),
    enc AS (
        SELECT vec_id, s, cidx AS code FROM (
            SELECT t.vec_id, t.s, c.cidx,
                   ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.s ORDER BY
                       list_sum(list_transform(range(1, {dsub + 1}),
                           i -> (t.sub[i] - c.c[i]) * (t.sub[i] - c.c[i]))) ASC,
                       c.cidx ASC) AS rn
            FROM csubs t JOIN {prev} c ON c.s = t.s
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT t.vec_id AS query_id, t.s, c.cidx,
               list_sum(list_transform(range(1, {dsub + 1}),
                   i -> (t.sub[i] - c.c[i]) * (t.sub[i] - c.c[i]))) AS ld
        FROM csubs t JOIN {prev} c ON c.s = t.s
        WHERE t.vec_id < 10
    )"""
    return ctes, prev


def pq_oracle_sql(
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    sample_size: int = 2048,
    k: int = 5,
    shortlist_mult: int = 5,
    dim: int = 64,
) -> str:
    """Replay annq.pq_train_q + pq_encode_q + pq_topk_rerank_q: integer
    codebook training, integer encode, exact-integer ADC shortlist, exact
    rounded-cosine re-rank of the shortlist only."""
    train, _cb = _pq_train_encode_ctes(m, ksub, n_iter, sample_size, dim)
    return f"""
    WITH {_VECS_CTE},{train},
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
    re AS (
        SELECT s.query_id, s.vec_id,
               floor((list_dot_product(q.v, c.v) / (q.nrm * c.nrm))
                     * 10000.0 + 0.5) / 10000.0 AS cosine
        FROM short s
        JOIN vecs q ON q.vec_id = s.query_id
        JOIN vecs c ON c.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id
               ) AS BIGINT) AS rank
        FROM re
    ) WHERE rank <= {k}
    """


def ivfpq_oracle_sql(
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    sample_size: int = 2048,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    dim: int = 64,
) -> str:
    """Replay annq.ivfpq_topk_q: the q_ann_ivf coarse quantizer (md5 seed
    centroids, rounded-cosine cells/probes) restricts candidates, exact-
    integer ADC over the PQ codes scores them. Output (query_id, vec_id,
    dist BIGINT, rank) ascending."""
    train, _cb = _pq_train_encode_ctes(m, ksub, n_iter, sample_size, dim)
    return f"""
    WITH {_VECS_CTE},{train},
    coarse AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}
    ),
    cassign AS (
        SELECT v.vec_id, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY floor((list_dot_product(v.v, s.cv)
                                   / (v.nrm * s.cnrm)) * 10000.0 + 0.5)
                            / 10000.0 DESC, s.cid
               ) AS rn
        FROM vecs v CROSS JOIN coarse s
    ),
    cells AS (SELECT vec_id, cid FROM cassign WHERE rn = 1),
    probes AS (
        SELECT vec_id AS query_id, cid
        FROM cassign WHERE vec_id < 10 AND rn <= {nprobe}
    ),
    cand AS (
        SELECT p.query_id, ce.vec_id
        FROM probes p JOIN cells ce ON ce.cid = p.cid
                                   AND ce.vec_id <> p.query_id
    ),
    adc AS (
        SELECT cd.query_id, cd.vec_id, CAST(SUM(l.ld) AS BIGINT) AS dist
        FROM cand cd
        JOIN enc e ON e.vec_id = cd.vec_id
        JOIN lut l ON l.query_id = cd.query_id
                  AND l.s = e.s AND l.cidx = e.code
        GROUP BY cd.query_id, cd.vec_id
    )
    SELECT query_id, vec_id, dist, rank FROM (
        SELECT query_id, vec_id, dist,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY dist ASC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM adc
    ) WHERE rank <= {k}
    """


def ivf_cell_profile_oracle_sql(
    n_centroids: int = 16, n_iter: int = 2, dim: int = 64
) -> str:
    """Replay annq.ivf_train_lloyd_q + ivf_cell_profile: the trained
    integer centroids, one integer-distance assignment pass carrying its
    own d², then per-cell occupancy + exact inertia (empty cells emit
    (0, 0))."""
    iters = []
    prev = "c0"
    for it in range(1, n_iter + 1):
        out = f"c{it}"
        iters.append(_lloyd_iter_ctes(prev, out, str(it), dim))
        prev = out
    iter_sql = ",".join(iters)
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        " i -> (v.qv[i] - s.c[i]) * (v.qv[i] - s.c[i])))"
    )
    return f"""
    WITH {_VECS_CTE},
    c0 AS (
        SELECT vec_id AS cid, qv AS c FROM vecs
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}
    ),{iter_sql},
    ap AS (
        SELECT vec_id, cid, d2 FROM (
            SELECT v.vec_id, s.cid, {d2} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {d2} ASC, s.cid ASC) AS rn
            FROM vecs v CROSS JOIN {prev} s
        ) WHERE rn = 1
    )
    SELECT s.cid,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_vectors,
           CAST(COALESCE(p.si, 0) AS BIGINT) AS inertia
    FROM {prev} s LEFT JOIN (
        SELECT cid, COUNT(*) AS n, SUM(d2) AS si FROM ap GROUP BY cid
    ) p USING (cid)
    """
