"""Scale-path helpers: bucketed co-located joins and salted holistic aggs.

These verify the SHAPE of the physical plan, not just values — at 100 TB
the plan is the product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based joins so Exchange presence/absence is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    from py_gtfs_duckdb_spark.lake import GtfsLake

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    trips = spark.createDataFrame(
        [(f"t{i}", f"r{i % 7}", f"s{i % 3}") for i in range(500)],
        "trip_id string, route_id string, service_id string",
    )
    stop_times = spark.createDataFrame(
        [(f"t{i % 500}", j, f"stop{j}") for i in range(2000) for j in range(3)],
        "trip_id string, stop_sequence int, stop_id string",
    )
    lake.write("trips", trips)
    lake.write("stop_times", stop_times)
    lake.write_bucketed("trips", keys=["trip_id"], num_buckets=8)
    lake.write_bucketed("stop_times", keys=["trip_id"], num_buckets=8)

    bt = lake.bucketed_table("trips")
    bs = lake.bucketed_table("stop_times")
    joined = bt.join(bs, "trip_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # same join over the unbucketed lake tables DOES shuffle
    plain = lake.table("trips").join(lake.table("stop_times"), "trip_id")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan
    # and values are identical (lake.write dedups stop_times on its
    # (trip_id, stop_sequence) PK: 500 trips x 3 sequences survive)
    assert joined.count() == plain.count() == 1500


def test_salted_collect_list_matches_plain(spark):
    from py_gtfs_duckdb_spark.functions import salted_collect_list

    # Heavy skew: one key holds 90% of rows.
    rows = [("hot", f"v{i:04d}") for i in range(900)] + [
        (f"k{i % 10}", f"w{i:03d}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        r["k"]: r["vs"]
        for r in salted_collect_list(df, "k", "v", n_salt=8).collect()
    }
    want = {
        r["k"]: r["vs"]
        for r in df.groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
        .collect()
    }
    assert got == want
    assert len(got["hot"]) == 900


def test_salted_collect_list_spreads_hot_key(spark):
    """Phase-1 output must contain multiple rows for the hot key — the
    skew actually spreads across reducers."""
    from py_gtfs_duckdb_spark.functions import salted_collect_list  # noqa: F401

    df = spark.createDataFrame(
        [("hot", f"v{i}") for i in range(200)], "k string, v string"
    )
    salt = F.pmod(F.xxhash64(F.col("v")), F.lit(8))
    n_partials = (
        df.select("k", salt.alias("__salt")).distinct().count()
    )
    assert n_partials > 1


# ---------------------------------------------------------------------------
# Mega-cluster stress: the boilerplate case. One near-dup cluster holds ~30%
# of all documents (a template shared by millions of pages collapses into ONE
# connected component after CC resolution). The dedup ACTION must survive it:
# no cluster-keyed window (one unsplittable sorted partition), output exact.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mega_cluster(spark):
    """20k docs; cluster 0 holds 6k members (30%); the rest sit in 2-member
    clusters. Scores are a deterministic residue with heavy ties; every
    17th member is unscored (exercises the LEFT-join null ranking)."""
    n_mega, n_docs = 6_000, 20_000
    rows = []
    for i in range(n_docs):
        cid = 0 if i < n_mega else 1 + (i - n_mega) // 2
        rows.append((i, cid))
    clusters = spark.createDataFrame(rows, "doc_id bigint, cluster_id bigint")
    srows = [
        (i, float((i * 37) % 101) / 100.0)
        for i in range(n_docs)
        if i % 17 != 0  # partial score table
    ]
    scores = spark.createDataFrame(srows, "doc_id bigint, quality double")
    return clusters, scores, n_mega, n_docs


def _expected_order(n_mega):
    """The contract order: quality DESC NULLS LAST, doc_id ASC."""
    members = []
    for i in range(n_mega):
        q = None if i % 17 == 0 else float((i * 37) % 101) / 100.0
        members.append((i, q))
    return sorted(members, key=lambda m: (m[1] is None, -(m[1] or 0.0), m[0]))


def test_keep_canonical_mega_cluster_exact_no_window(spark, mega_cluster):
    from py_gtfs_duckdb_spark.operators.dedup import keep_canonical

    clusters, scores, n_mega, n_docs = mega_cluster
    out = keep_canonical(clusters, scores)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan, plan[:500]
    got = {r["cluster_id"]: r for r in out.collect()}
    want_id, want_q = _expected_order(n_mega)[0]
    assert got[0]["kept_doc_id"] == want_id
    assert got[0]["kept_quality"] == want_q
    assert got[0]["n_members"] == n_mega
    # a small cluster: both members present, min id wins on tie-by-quality
    assert len(got) == 1 + (n_docs - n_mega) // 2


def test_keep_top_k_mega_cluster_exact_no_window(spark, mega_cluster):
    from py_gtfs_duckdb_spark.operators.dedup import keep_top_k

    clusters, scores, n_mega, _ = mega_cluster
    k = 3
    out = keep_top_k(clusters, scores, k=k, n_salts=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan, plan[:500]
    mega = sorted(
        (r for r in out.collect() if r["cluster_id"] == 0),
        key=lambda r: r["rank"],
    )
    want = _expected_order(n_mega)[:k]
    assert [(r["doc_id"], r["score"]) for r in mega] == want
    assert [r["rank"] for r in mega] == [1, 2, 3]
    assert all(r["n_members"] == n_mega for r in mega)


def test_cc_fixpoint_mega_component(spark):
    """Connected components on a 6k-member chain (worst diameter) plus
    disjoint pairs: the large-star/small-star fixpoint must resolve one
    mega component without a cluster-keyed window or cartesian blowup."""
    from py_gtfs_duckdb_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(5_999)]  # one 6k chain
    edges += [(10_000 + 2 * j, 10_001 + 2 * j) for j in range(500)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    cc = connected_components(df, "id_a", "id_b")
    sizes = (
        cc.groupBy("component").count().orderBy(F.desc("count")).limit(2).collect()
    )
    assert sizes[0]["count"] == 6_000
    assert sizes[1]["count"] == 2
    assert cc.count() == 6_000 + 1_000


def _feq(a, b) -> bool:
    """Score equality where NaN == NaN (Python's != would reject it)."""
    import math

    if a is None or b is None:
        return a is b
    return (math.isnan(a) and math.isnan(b)) or a == b


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_dedup_actions_match_window_reference(spark, seed):
    """Differential: the combinable keep_canonical and the salted
    keep_top_k must reproduce the rank-window semantics (quality DESC
    NULLS LAST, id ASC, with Spark's total order — NaN above +inf) on
    adversarial score distributions: exact ties, 0.0 vs -0.0
    boundaries, negatives, ±inf, NaN, and missing scores."""
    import math
    import random

    rng = random.Random(seed)
    n = 400
    pool = [
        0.0, -0.0, 1.0, -1.0, 0.5, 0.25, None,
        float("nan"), float("inf"), float("-inf"),
    ]
    rows, srows = [], []
    for i in range(n):
        rows.append((i, rng.randrange(12)))
        q = rng.choice(pool)
        if q is not None:
            srows.append((i, q))
    clusters = spark.createDataFrame(rows, "doc_id bigint, cluster_id bigint")
    scores = spark.createDataFrame(srows, "doc_id bigint, quality double")

    # python reference of the contract order per cluster: NULLS LAST,
    # then NaN (Spark's greatest double) first, then score descending,
    # then id ascending
    smap = dict(srows)
    members: dict[int, list[int]] = {}
    for i, c in rows:
        members.setdefault(c, []).append(i)

    def _key(i):
        q = smap.get(i)
        if q is None:
            return (1, 1, 0.0, i)
        if math.isnan(q):
            return (0, 0, 0.0, i)
        return (0, 1, -q, i)

    def order(c):
        return sorted(members[c], key=_key)

    from py_gtfs_duckdb_spark.operators.dedup import keep_canonical, keep_top_k

    got = {r["cluster_id"]: r for r in keep_canonical(clusters, scores).collect()}
    assert set(got) == set(members)
    for c in members:
        want = order(c)[0]
        assert got[c]["kept_doc_id"] == want, c
        assert _feq(got[c]["kept_quality"], smap.get(want)), c
        assert got[c]["n_members"] == len(members[c]), c

    k = 3
    out = keep_top_k(clusters, scores, k=k, n_salts=8).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert set(by_cluster) == set(members)
    for c, rs in by_cluster.items():
        rs.sort(key=lambda r: r["rank"])
        want = order(c)[:k]
        assert [r["doc_id"] for r in rs] == want, c
        assert [r["rank"] for r in rs] == list(range(1, len(want) + 1)), c
        assert all(r["n_members"] == len(members[c]) for r in rs), c
        assert all(
            _feq(r["score"], smap.get(i)) for r, i in zip(rs, want)
        ), c


def test_rank_key_timestamp_ntz_is_timezone_independent(spark):
    """keep-newest over timestamp_ntz scores must follow the NTZ wall
    clock, not the session-zone instant: across a spring-forward gap
    (America/Los_Angeles 2021-03-14, 02:xx doesn't exist) a cast through
    `timestamp` maps the nonexistent 02:30 and the real 03:30 to the
    SAME instant, collapsing the order to the id tie-break — the ADVICE
    r8 finding. The (day, micros-of-day) encoding keeps them distinct."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        from py_gtfs_duckdb_spark.operators.dedup import keep_canonical

        clusters = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1), (4, 1)],
            "doc_id bigint, cluster_id bigint",
        )
        scores = spark.createDataFrame(
            [
                (1, "2021-03-14 02:30:00"),   # nonexistent wall time
                (2, "2021-03-14 03:30:00"),   # real; same instant as 02:30
                (3, "2021-03-14 03:30:00.000001"),  # micro precision kept
                (4, "2021-03-14 03:30:00"),
            ],
            "doc_id bigint, s string",
        ).select("doc_id", F.to_timestamp_ntz("s").alias("quality"))
        got = {
            r["cluster_id"]: r["kept_doc_id"]
            for r in keep_canonical(clusters, scores).collect()
        }
        # newest NTZ wall clock wins: 03:30 > 02:30 even though the
        # session-zone instants coincide; fractional seconds count
        assert got == {0: 2, 1: 3}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


# ---------------------------------------------------------------------------
# Decade-up mega-cluster stress (round 10): 2M members in ONE cluster. The
# assertion is on SHUFFLE ROWS via the SQL status store — not wall time —
# because the scale contract of the window-free dedup actions is "the
# shuffle carries O(clusters) partial rows, never O(members)": partial
# aggregation collapses each map task's slice of the hot cluster to one
# candidate (keep_canonical) or k-per-salt candidates (keep_top_k) BEFORE
# the exchange. Numbers recorded in SCALING.md §13.
# ---------------------------------------------------------------------------


def _execution_shuffle_rows(spark, df) -> list[int]:
    """Run ``df.collect()`` and return every exchange's 'shuffle records
    written' for the triggered SQL execution(s)."""
    return _shuffle_rows_during(spark, df.collect)


def _shuffle_rows_during(spark, action) -> list[int]:
    """Run ``action()`` and return every exchange's 'shuffle records
    written' across ALL SQL executions it triggered, via the same
    SQLAppStatusStore the Spark UI reads. Needed (instead of metering one
    frame's collect) for operators that iterate EAGERLY at build time —
    q_dedup_policy's SCC/DAG rounds run localCheckpoint jobs while the
    plan is being constructed, so metering only the final frame would
    miss nearly all of the work."""
    import time

    def as_list(seq):
        out, it = [], seq.iterator()
        while it.hasNext():
            out.append(it.next())
        return out

    store = spark._jsparkSession.sharedState().statusStore()
    before = {e.executionId() for e in as_list(store.executionsList())}
    action()
    execs = []
    for _ in range(100):  # the status store updates asynchronously
        execs = [
            e
            for e in as_list(store.executionsList())
            if e.executionId() not in before
        ]
        if execs and all(e.completionTime().isDefined() for e in execs):
            break
        time.sleep(0.1)
    vals = []
    for e in execs:
        names = {m.accumulatorId(): m.name() for m in as_list(e.metrics())}
        it = store.executionMetrics(e.executionId()).iterator()
        while it.hasNext():
            kv = it.next()
            if names.get(kv._1()) == "shuffle records written":
                vals.append(int(str(kv._2()).replace(",", "").split()[0]))
    return vals


@pytest.fixture(scope="module")
def giga_cluster(spark):
    """2.1M docs, cluster 0 holding 2M (95%) — one decade up from the
    20k fixture, built JVM-side (spark.range) so the fixture itself
    doesn't serialize 2M driver rows. Same score residue/void pattern as
    the small fixture: quality = ((id*37) % 101)/100, every 17th member
    unscored."""
    n_mega, n_docs = 2_000_000, 2_100_000
    ids = F.col("id")
    clusters = spark.range(n_docs).select(
        ids.alias("doc_id"),
        F.when(ids < n_mega, F.lit(0))
        .otherwise(1 + F.floor((ids - n_mega) / 2))
        .cast("bigint")
        .alias("cluster_id"),
    )
    scores = (
        spark.range(n_docs)
        .filter(ids % 17 != 0)
        .select(
            ids.alias("doc_id"),
            (((ids * 37) % 101) / 100.0).alias("quality"),
        )
    )
    n_clusters = 1 + (n_docs - n_mega) // 2
    return clusters, scores, n_mega, n_docs, n_clusters


def _broadcast_scores(spark):
    """Let the doc_id-keyed score join broadcast so the ONLY exchanges in
    the execution are the aggregation shuffles under test (the join key
    is unskewed — at real scale it shuffles fine; here it would drown the
    O(clusters) signal in O(rows) join traffic)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 << 20))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


@pytest.mark.slow
def test_keep_canonical_2m_cluster_shuffles_o_clusters(spark, giga_cluster):
    from py_gtfs_duckdb_spark.operators.dedup import keep_canonical

    clusters, scores, n_mega, n_docs, n_clusters = giga_cluster
    with _broadcast_scores(spark):
        out = keep_canonical(clusters, scores)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition" not in plan
        rows = _execution_shuffle_rows(spark, out)
    total = sum(rows)
    # O(clusters), never O(members): every exchange carries partial-agg
    # rows — one per (cluster, map task) — so the bound is n_clusters
    # (each small cluster is contiguous in ONE task) plus a tasks-sized
    # sliver for the mega cluster's per-task partials. 2x slack for
    # partial-buffer flushes; the point is total << n_docs.
    n_tasks = int(spark.sparkContext.defaultParallelism)
    assert rows, "no exchange metrics captured"
    assert total <= 2 * (n_clusters + n_tasks), (total, n_clusters)
    assert total < n_docs * 0.1
    # exactness at this scale: the known best scored member of cluster 0
    got = {r["cluster_id"]: r for r in out.collect()}
    want_id = next(
        i for i in range(n_mega) if i % 17 != 0 and (i * 37) % 101 == 100
    )
    assert got[0]["kept_doc_id"] == want_id
    assert got[0]["kept_quality"] == 1.0
    assert got[0]["n_members"] == n_mega
    assert len(got) == n_clusters


@pytest.mark.slow
def test_keep_top_k_2m_cluster_shuffles_o_clusters(spark, giga_cluster):
    from py_gtfs_duckdb_spark.operators.dedup import keep_top_k

    clusters, scores, n_mega, n_docs, n_clusters = giga_cluster
    k, n_salts = 3, 16
    with _broadcast_scores(spark):
        out = keep_top_k(clusters, scores, k=k, n_salts=n_salts)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition" not in plan
        rows = _execution_shuffle_rows(spark, out)
    total = sum(rows)
    n_tasks = int(spark.sparkContext.defaultParallelism)
    # phase 1 shuffles ≤ (salts present per cluster per task) partials:
    # a 2-member cluster contributes ≤ 2 (one per member's salt), the
    # mega cluster ≤ n_tasks × n_salts; phase 2 shuffles the ≤ n_salts
    # groups per cluster. Bound: ~2 rows/cluster/phase + the mega
    # sliver, 2x slack — again total << n_docs.
    bound = 2 * (2 * n_clusters + n_tasks * n_salts)
    assert rows, "no exchange metrics captured"
    assert total <= bound, (total, bound)
    assert total < n_docs * 0.2
    mega = sorted(
        (r for r in out.collect() if r["cluster_id"] == 0),
        key=lambda r: r["rank"],
    )
    want = sorted(
        (i for i in range(n_mega) if i % 17 != 0 and (i * 37) % 101 == 100)
    )[:k]
    assert [r["doc_id"] for r in mega] == want
    assert [r["rank"] for r in mega] == [1, 2, 3]
    assert all(r["n_members"] == n_mega for r in mega)


def test_flagship_join_family_bucketed_drops_exchange(spark, tmp_path, no_broadcast):
    """VERDICT r10 Next #4: the flagship fact⋈fact join (orders⋈lineitem
    on the order key — the trips⋈stop_times shape) must lose BOTH its
    Exchanges on the bucketed layout, and the full flagship plan must
    drop from its unbucketed shuffle count to that count minus the fact
    pair. SCALING.md §2's hash-layout argument, proven on the plan."""
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.plans.flagship import flagship_plan

    sf = "/root/testdata/sf0.001"
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    orders = t(spark, sf, "orders")
    lineitem = t(spark, sf, "lineitem")
    customer = t(spark, sf, "customer")
    lake.write_bucketed("orders", orders, keys=["o_orderkey"], num_buckets=8)
    lake.write_bucketed(
        "lineitem", lineitem, keys=["l_orderkey"], num_buckets=8
    )
    b_orders = lake.bucketed_table("orders")
    b_lineitem = lake.bucketed_table("lineitem")

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("+- Exchange") + plan.count(":- Exchange")

    # bare fact join (q_join_inner shape): 2 Exchanges -> 0
    def fact_join(o, li):
        first = li.filter(F.col("l_linenumber") == 1)
        return o.join(first, first.l_orderkey == o.o_orderkey).select(
            "o_orderkey", "l_quantity"
        )

    plain = fact_join(orders, lineitem)
    bucketed = fact_join(b_orders, b_lineitem)
    assert n_exchanges(plain) == 2, "expected a two-sided shuffle join"
    assert n_exchanges(bucketed) == 0, "bucketed join must be shuffle-free"
    assert plain.count() == bucketed.count() > 0

    # full flagship plan: the fact-pair Exchanges disappear; the id-set
    # resolution (distinct) keeps its small-side shuffles
    full_plain = flagship_plan(orders, lineitem, customer)
    full_bucketed = flagship_plan(b_orders, b_lineitem, customer)
    saved = n_exchanges(full_plain) - n_exchanges(full_bucketed)
    assert saved >= 2, (
        f"flagship on bucketed facts saved {saved} Exchanges "
        f"({n_exchanges(full_plain)} -> {n_exchanges(full_bucketed)})"
    )
    assert (
        sorted(map(tuple, full_plain.collect()))
        == sorted(map(tuple, full_bucketed.collect()))
    )


# -- synthetic sf1 probe (VERDICT r10 Next #8) -------------------------------


@pytest.fixture(scope="module")
def sf1_documents_dir(spark, tmp_path_factory):
    """sf0.1's documents replicated 10x with re-keyed ids — a synthetic
    sf1. Each replica interleaves a replica token every 4th word so
    cross-replica texts stop being near-dups (every 3-shingle window
    within two words of an insertion changes): the corpus grows 10x with
    the SAME within-replica duplicate structure, like a real 10x crawl,
    instead of planting 45 exact copies of every document."""
    from py_gtfs_duckdb_spark.plans._tables import t

    base = t(spark, "/root/testdata/sf0.1", "documents")
    shift = base.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for k in range(10):
        words = F.filter(F.split("text", r"\s+"), lambda w: w != "")
        salted = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    i % 4 == 0, F.concat(F.lit(f"rep{k}x "), w)
                ).otherwise(w),
            ),
            " ",
        )
        reps.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift))
            .withColumn("text", salted)
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    d = tmp_path_factory.mktemp("sf1")
    out.coalesce(8).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    # embeddings replicated 10x with re-keyed vec_ids (vectors unchanged:
    # replication grows every IVF cell / benchmark residue class 10x,
    # which is exactly the load shape the cell-blocked plans must absorb)
    e = t(spark, "/root/testdata/sf0.1", "embeddings")
    eshift = e.agg(F.max("vec_id")).collect()[0][0] + 1
    ereps = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(k * eshift))
        for k in range(10)
    ]
    eout = ereps[0]
    for r in ereps[1:]:
        eout = eout.unionByName(r)
    eout.coalesce(8).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize(
    "qname",
    [
        "q_dedup_minhash_lsh",
        "q_golden_records",
        "q_curate_rules",
        # round-12 additions (VERDICT r11 Next #4): the containment
        # family and the embedding-tier decontamination — new/hot in
        # r11, absent from the probe until now. Measured at baking time:
        # shuffle rows exactly 10.0x for all three at 10x input
        # (SCALING.md §17a); the containment prefix explode dominates
        # shuffle volume, candidates stay within-replica.
        "q_dedup_containment",
        "q_dedup_containment_inc",
        "q_decontaminate_semantic",
        # round-13 addition: the two-pass frequent-items sketch (pass 1
        # is map-side only — shuffle volume is candidates + recount, not
        # the bigram stream). q_decontaminate_bloom is deliberately NOT
        # here: its verify-join shuffle tracks the ANSWER size
        # (probe-positives = true overlap + fpp), and this replica
        # fixture inflates true overlap ~77x at 10x input (measured: a
        # benchmark replica genuinely overlaps its 9 sibling replicas) —
        # the linear-input bound is the wrong null model for an
        # output-proportional operator. Its scale property (fpp stays
        # bounded as the benchmark grows, via mask auto-sizing) is
        # pinned by test_bloom_mask_autosizing_bounds_fpp below.
        "q_heavy_hitters",
    ],
)
def test_sf1_probe_scales_linearly(spark, sf1_documents_dir, qname):
    """The heaviest extension plans at synthetic sf1: runtime and
    shuffle volume must scale ~linearly with the 10x input (pairs-
    quadratic behavior would show ~100x shuffle rows). Ratios get 2-2.5x
    slack for fixed per-job overhead and sandbox noise; the point is
    distinguishing 10x from 100x, not benchmarking."""
    import time as _time

    from py_gtfs_duckdb_spark.plans import QUERIES

    def run(sf_dir):
        df = QUERIES[qname](spark, sf_dir)
        t0 = _time.perf_counter()
        rows = _execution_shuffle_rows(spark, df)
        dt = _time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, sum(rows)

    run("/root/testdata/sf0.1")  # warm codegen/page cache (uncounted)
    t_small, sh_small = run("/root/testdata/sf0.1")
    t_big, sh_big = run(sf1_documents_dir)
    assert sh_small > 0, "probe must observe shuffles at sf0.1"
    assert sh_big <= 20 * sh_small, (
        f"{qname}: shuffle rows {sh_small} -> {sh_big} "
        f"({sh_big / sh_small:.1f}x for 10x input — superlinear)"
    )
    assert t_big <= 25 * max(t_small, 0.2), (
        f"{qname}: runtime {t_small:.2f}s -> {t_big:.2f}s "
        f"({t_big / max(t_small, 1e-9):.1f}x for 10x input)"
    )


@pytest.mark.slow
def test_sf1_policy_rounds_track_chain_depth_not_input(
    spark, sf1_documents_dir
):
    """q_dedup_policy at synthetic sf1 (VERDICT r12 Next #7): the
    distributed keep-policy is ITERATIVE, so on top of the linear-shuffle
    gate it must hold the stronger invariant — DAG peel rounds are
    bounded by containment-chain DEPTH, which 10x replication does not
    deepen (replicas are salted copies with identical internal pair
    structure), never by input size. The shuffle meter wraps the whole
    build+collect because the rounds run eager localCheckpoint jobs at
    plan-build time."""
    import time as _time

    from py_gtfs_duckdb_spark.operators import graph as G
    from py_gtfs_duckdb_spark.plans import QUERIES

    def run(sf_dir):
        t0 = _time.perf_counter()
        rows = _shuffle_rows_during(
            spark, lambda: QUERIES["q_dedup_policy"](spark, sf_dir).collect()
        )
        dt = _time.perf_counter() - t0
        rounds = G.LAST_RUN_STATS.get("dag_rounds")
        spark.catalog.clearCache()
        return dt, sum(rows), rounds

    run("/root/testdata/sf0.1")  # warm (uncounted)
    t_small, sh_small, r_small = run("/root/testdata/sf0.1")
    t_big, sh_big, r_big = run(sf1_documents_dir)
    assert r_small is not None and r_big is not None, (
        "distributed path did not run — cap=0 dispatch broken?"
    )
    # rounds track chain depth: 10x input may not add rounds beyond the
    # salting-induced wobble of +-1; input-driven scaling would read ~10x
    assert r_big <= r_small + 1, (
        f"policy rounds {r_small} -> {r_big} at 10x input — rounds are "
        "scaling with input, not chain depth"
    )
    assert r_big <= 8, f"peel depth {r_big} exceeds the oracle's unroll"
    assert sh_small > 0
    assert sh_big <= 20 * sh_small, (
        f"policy shuffle rows {sh_small} -> {sh_big} "
        f"({sh_big / sh_small:.1f}x for 10x input — superlinear)"
    )
    assert t_big <= 25 * max(t_small, 0.2), (
        f"policy runtime {t_small:.2f}s -> {t_big:.2f}s for 10x input"
    )
