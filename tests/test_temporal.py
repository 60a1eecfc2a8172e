"""As-of join and binned range join: planted-topology semantics
(inclusive ties, deterministic tie-breaks, tolerance nulling, bin-edge
exclusivity) beyond the DuckDB-oracle battery checks."""

from __future__ import annotations

import datetime as dt

import pytest

from py_gtfs_duckdb_spark.operators.temporal import asof_join, range_join_binned


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [
            (100, 1, _ts(50)),   # between builds at 10 and 60
            (101, 1, _ts(60)),   # exactly ON a build ts -> inclusive
            (102, 1, _ts(5)),    # before every build -> backward: null
            (103, 2, _ts(50)),   # key with duplicate-ts builds
            (104, 3, _ts(50)),   # key with no builds at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (1, 1, _ts(10), 1.0),
            (2, 1, _ts(60), 2.0),
            (3, 1, _ts(90), 3.0),
            (4, 2, _ts(40), 4.0),   # same ts as id 5
            (5, 2, _ts(40), 5.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return probe, build


def _rows(df):
    return {r["event_id"]: r.asDict() for r in df.collect()}


def test_asof_backward_semantics(frames):
    probe, build = frames
    got = _rows(
        asof_join(probe, build, "ts", "user_id", ["event_id", "ts", "value"])
    )
    assert got[100]["event_id_matched"] == 1          # latest <= 50
    assert got[101]["event_id_matched"] == 2          # equal ts matches
    assert got[102]["event_id_matched"] is None       # nothing precedes
    assert got[102]["value_matched"] is None
    assert got[103]["event_id_matched"] == 5          # dup ts -> larger seq
    assert got[104]["event_id_matched"] is None       # key absent from build
    assert len(got) == 5                              # left join: all probes


def test_asof_forward_semantics(frames):
    probe, build = frames
    got = _rows(
        asof_join(
            probe, build, "ts", "user_id", ["event_id", "ts"], direction="forward"
        )
    )
    assert got[100]["event_id_matched"] == 2          # earliest >= 50
    assert got[101]["event_id_matched"] == 2          # equal ts matches
    assert got[102]["event_id_matched"] == 1
    assert got[103]["event_id_matched"] is None       # no build at/after 50
    assert got[104]["event_id_matched"] is None


def test_asof_tolerance_nulls_far_matches(frames):
    probe, build = frames
    got = _rows(
        asof_join(
            probe,
            build,
            "ts",
            "user_id",
            ["event_id", "ts", "value"],
            tolerance_seconds=15.0,
        )
    )
    # probe 100 @50: nearest build @10 is 40s away -> outside tolerance
    assert got[100]["event_id_matched"] is None
    # probe 101 @60: build @60 is 0s away -> kept
    assert got[101]["event_id_matched"] == 2
    # probe 103 @50: build @40 is exactly 10s away -> kept (boundary incl.)
    assert got[103]["event_id_matched"] == 5


def test_asof_tolerance_requires_ts_payload(frames):
    probe, build = frames
    with pytest.raises(ValueError, match="tolerance requires"):
        asof_join(
            probe, build, "ts", "user_id", ["event_id"], tolerance_seconds=5.0
        )


def test_asof_null_payload_does_not_mix_rows(spark):
    """A null inside a build payload column must ride with ITS row, not
    get backfilled from an older build row (the struct-carry guarantee)."""
    probe = spark.createDataFrame(
        [(100, 1, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    build = spark.createDataFrame(
        [(1, 1, _ts(10), 7.0), (2, 1, _ts(50), None)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = _rows(asof_join(probe, build, "ts", "user_id", ["event_id", "value"]))
    assert got[100]["event_id_matched"] == 2
    assert got[100]["value_matched"] is None  # NOT 7.0 from build row 1


def test_range_join_bin_edges(spark):
    """Intervals spanning multiple bins match points in every bin; the
    exclusive end does not match; a point on an interval start does."""
    points = spark.createDataFrame(
        [(1, 1, 0.0), (2, 1, 95.0), (3, 1, 200.0), (4, 1, 199.9), (5, 2, 95.0)],
        "point_id long, user_id long, t double",
    )
    intervals = spark.createDataFrame(
        [(10, 1, 0.0, 200.0), (11, 2, 90.0, 96.0)],
        "interval_id long, user_id long, lo double, hi double",
    )
    got = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join_binned(
            points, intervals, "t", "lo", "hi", by="user_id", bin_width=50.0
        ).collect()
    )
    # point 3 at t=200 is ON the exclusive end -> excluded;
    # point 1 at t=0 is ON the inclusive start -> included
    assert got == [(1, 10), (2, 10), (4, 10), (5, 11)]


def test_range_join_end_on_bin_edge_not_exploded(spark):
    """An interval ending exactly on a bin boundary must not be assigned
    to the bin it never reaches (the 'end exclusive' epsilon)."""
    points = spark.createDataFrame(
        [(1, 50.0)], "point_id long, t double"
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 50.0)], "interval_id long, lo double, hi double"
    )
    out = range_join_binned(
        points, intervals, "t", "lo", "hi", bin_width=50.0
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# differential property test: asof_join vs pandas merge_asof
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


_row_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id (few keys)
        st.integers(min_value=0, max_value=20),     # ts (dense -> ties)
    ),
    min_size=0,
    max_size=12,
)


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe_rows=_row_lists, build_rows=_row_lists, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, probe_rows, build_rows, direction):
    """pandas merge_asof IS the as-of semantics spec (inclusive equal-ts,
    last/first match among sorted duplicates); the distributed union-sort
    implementation must agree row-for-row on random small inputs."""
    import pandas as pd

    probe_pd = pd.DataFrame(
        [(i, u, t) for i, (u, t) in enumerate(probe_rows)],
        columns=["event_id", "user_id", "ts"],
        dtype="int64",
    )
    build_pd = pd.DataFrame(
        [(1000 + i, u, t) for i, (u, t) in enumerate(build_rows)],
        columns=["event_id", "user_id", "ts"],
        dtype="int64",
    )
    # pandas requires global sort by the on-key; secondary sort by event_id
    # makes the duplicate-ts pick deterministic: backward takes the LAST
    # matching row (largest id), forward the FIRST (smallest id) — the
    # documented tie-break of asof_join.
    probe_sorted = probe_pd.sort_values(["ts", "event_id"], kind="stable")
    build_sorted = build_pd.sort_values(["ts", "event_id"], kind="stable")
    expect = pd.merge_asof(
        probe_sorted,
        build_sorted.rename(columns={"event_id": "event_id_matched"})[
            ["event_id_matched", "user_id", "ts"]
        ],
        on="ts",
        by="user_id",
        direction=direction,
    )
    want = {
        int(r.event_id): (None if pd.isna(r.event_id_matched) else int(r.event_id_matched))
        for r in expect.itertuples()
    }

    probe = spark.createDataFrame(probe_pd) if len(probe_pd) else spark.createDataFrame([], "event_id long, user_id long, ts long")
    build = spark.createDataFrame(build_pd) if len(build_pd) else spark.createDataFrame([], "event_id long, user_id long, ts long")
    got_rows = asof_join(
        probe, build, "ts", "user_id", ["event_id"], direction=direction
    ).collect()
    got = {r["event_id"]: r["event_id_matched"] for r in got_rows}
    assert got == want


def test_range_join_epoch_scale_edges(spark):
    """Bin math at epoch-seconds magnitude: the exclusive end holds even
    when end sits exactly on a bin edge (where an epsilon below double
    ULP would silently no-op), and inverted/empty intervals neither
    match nor make `sequence` step downward."""
    t0 = 1_700_000_000.0 - (1_700_000_000.0 % 1800.0)  # exact bin edge
    points = spark.createDataFrame(
        [(1, 1, t0 + 1799.0), (2, 1, t0 + 1800.0)],
        "point_id long, user_id long, t double",
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, t0, t0 + 1800.0),        # ends exactly on a bin edge
            (11, 1, t0 + 100.0, t0 + 100.0),  # empty
            (12, 1, t0 + 500.0, t0 - 500.0),  # inverted
        ],
        "interval_id long, user_id long, lo double, hi double",
    )
    got = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join_binned(
            points, intervals, "t", "lo", "hi", by="user_id", bin_width=1800.0
        ).collect()
    )
    assert got == [(1, 10)]


@pytest.mark.parametrize("seed", [3, 41])
@pytest.mark.parametrize("chunk_ms", [1_800_000, 3_600_000, 21_600_000])
def test_sessionize_chunked_matches_single_window(spark, seed, chunk_ms):
    """Differential: the chunked-carry plan must reproduce the plain
    partitionBy(user) window sessionization row-for-row — including
    sessions that chain across MANY chunk boundaries (events every
    gap-1ms for hours), single-event chunks, empty chunks, and exact
    gap-boundary ties (gap == threshold stays in-session; strictly
    greater splits)."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from py_gtfs_duckdb_spark.operators.temporal import sessionize_chunked

    gap_ms = 1_800_000
    rng = random.Random(seed)
    base = 1_700_000_000_000
    rows = []
    eid = 0
    for uid in range(6):
        t = base + rng.randrange(0, 3_600_000)
        # a long chain: 40 events exactly gap-1 apart (spans many chunks)
        for _ in range(40):
            rows.append((uid, t, eid)); eid += 1
            t += gap_ms - 1
        # exact-boundary tie: gap == threshold stays in the session
        rows.append((uid, t + gap_ms, eid)); eid += 1
        t += gap_ms
        # scattered sparse events with big gaps (single-event sessions)
        for _ in range(20):
            t += gap_ms + rng.randrange(1, 10 * gap_ms)
            rows.append((uid, t, eid)); eid += 1
            # occasional same-timestamp pair (order_col tie-break)
            if rng.random() < 0.3:
                rows.append((uid, t, eid)); eid += 1
    df = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows], "user_id bigint, ms bigint, event_id bigint"
    ).select(
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "event_id",
    )

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    plain = (
        df.withColumn(
            "session_idx",
            F.sum(
                F.when(gap > gap_ms, 1)
                .when(F.lag("ts").over(w).isNull(), 1)
                .otherwise(0)
            )
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    chunked = sessionize_chunked(df, gap_ms=gap_ms, chunk_ms=chunk_ms)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, chunked.collect()))
    assert a == b
    # the chain really does span multiple chunks at the small chunk sizes
    if chunk_ms <= 3_600_000:
        n_chunks = (
            df.filter(F.col("user_id") == 0)
            .select(F.floor(F.unix_millis("ts") / chunk_ms))
            .distinct()
            .count()
        )
        assert n_chunks > 3


def test_sessionize_chunked_rejects_short_chunks(spark):
    from py_gtfs_duckdb_spark.operators.temporal import sessionize_chunked

    df = spark.createDataFrame([(1, 1, 1)], "user_id long, ts long, event_id long")
    with pytest.raises(ValueError, match="chunk_ms"):
        sessionize_chunked(df, gap_ms=1000, chunk_ms=999)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("chunk_ms", [1_000, 7_000, 1_000_000])
def test_asof_chunked_matches_unchunked(spark, direction, chunk_ms):
    """Differential: the chunked-carry as-of join must reproduce
    asof_join row-for-row — carries reaching back across MANY chunks
    (keys whose only build row is at the very start), keys with no build
    rows at all, empty chunks between build and probe, same-ts
    tie-breaks, and null payload columns."""
    import random

    from py_gtfs_duckdb_spark.operators.temporal import (
        asof_join,
        asof_join_chunked,
    )

    rng = random.Random(direction.__len__() * 1000 + chunk_ms)
    probe_rows, build_rows = [], []
    eid = 0
    for uid in range(8):
        # key 7 has NO build rows; key 6 has ONE build row at t=0
        n_builds = 0 if uid == 7 else (1 if uid == 6 else rng.randrange(1, 15))
        for _ in range(n_builds):
            t = 0 if uid == 6 else rng.randrange(0, 100_000)
            # null payloads must not mix across rows
            v = None if rng.random() < 0.3 else round(rng.random(), 3)
            build_rows.append((eid, uid, t, v)); eid += 1
        for _ in range(rng.randrange(1, 20)):
            probe_rows.append((eid, uid, rng.randrange(0, 100_000))); eid += 1
    # same-ts collisions between probe and build
    probe_rows.append((eid, 0, build_rows[0][2])); eid += 1

    probe = spark.createDataFrame(
        probe_rows, "event_id bigint, user_id bigint, ts bigint"
    )
    build = spark.createDataFrame(
        build_rows, "event_id bigint, user_id bigint, ts bigint, value double"
    )
    kw = dict(
        on="ts", by="user_id",
        build_cols=["event_id", "ts", "value"], direction=direction,
    )
    a = sorted(map(tuple, asof_join(probe, build, **kw).collect()))
    b = sorted(
        map(tuple, asof_join_chunked(probe, build, chunk_ms=chunk_ms, **kw).collect())
    )
    assert a == b
    # and with tolerance gating
    at = sorted(map(tuple, asof_join(
        probe, build, tolerance_seconds=5_000.0, **kw).collect()))
    bt = sorted(map(tuple, asof_join_chunked(
        probe, build, tolerance_seconds=5_000.0, chunk_ms=chunk_ms, **kw).collect()))
    assert at == bt


@pytest.mark.parametrize("bin_width", [5.0, 50.0, 1000.0])
def test_interval_join_matches_naive_overlap(spark, bin_width):
    """Differential: the binned interval-overlap join must equal the
    naive inequality join exactly — pairs overlapping across MANY bins
    emitted once, bin-edge-aligned starts/ends, touching-but-not-
    overlapping intervals excluded (half-open), empty intervals dropped,
    keys respected."""
    import random

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.temporal import interval_join_binned

    rng = random.Random(int(bin_width))
    lrows, rrows = [], []
    for i in range(120):
        k = rng.randrange(3)
        lo = rng.choice([rng.uniform(0, 500), float(rng.randrange(0, 500, 5))])
        ln = rng.choice([0.0, 2.0, 7.5, 60.0, 400.0])
        lrows.append((i, k, lo, lo + ln))
    for j in range(120):
        k = rng.randrange(3)
        lo = rng.choice([rng.uniform(0, 500), float(rng.randrange(0, 500, 5))])
        ln = rng.choice([0.0, 1.0, 5.0, 90.0, 300.0])
        rrows.append((1000 + j, k, lo, lo + ln))
    left = spark.createDataFrame(
        lrows, "l_id bigint, key bigint, l_lo double, l_hi double"
    )
    right = spark.createDataFrame(
        rrows, "r_id bigint, key bigint, r_lo double, r_hi double"
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_join_binned(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi",
            by="key", bin_width=bin_width,
        ).collect()
    )
    # the naive predicate alone would also 'match' EMPTY [x, x)
    # intervals sitting strictly inside the other side — the operator's
    # half-open contract says an empty interval overlaps nothing, so the
    # reference excludes them too
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in left.join(right, "key")
        .filter(
            (F.col("l_lo") < F.col("r_hi"))
            & (F.col("r_lo") < F.col("l_hi"))
            & (F.col("l_hi") > F.col("l_lo"))
            & (F.col("r_hi") > F.col("r_lo"))
        )
        .collect()
    )
    assert got == naive
    assert len(got) == len(set(got))  # exactly-once, no dup emission
    assert naive, "fixture produced no overlaps — weaken nothing"


def test_interval_join_rejects_column_collisions(spark):
    from py_gtfs_duckdb_spark.operators.temporal import interval_join_binned

    a = spark.createDataFrame([(1, 0.0, 1.0)], "id long, lo double, hi double")
    with pytest.raises(ValueError, match="collision"):
        interval_join_binned(a, a, "lo", "hi", "lo", "hi")


@pytest.mark.parametrize("chunk_mult", [1, 3])
def test_lookback_chunks_trailing_matches_plain(spark, chunk_mult):
    """Differential: a RANGE-frame trailing aggregate over
    lookback_chunks (home rows only) must equal the plain per-key window
    — dense bursts straddling chunk boundaries, events exactly ON
    boundaries, lookback == chunk (tightest legal), duplicate
    timestamps."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from py_gtfs_duckdb_spark.operators.temporal import lookback_chunks

    lb = 1_000_000  # 1s lookback in micros
    chunk = chunk_mult * lb
    rng = random.Random(chunk_mult)
    rows = []
    eid = 0
    for uid in range(5):
        # burst exactly straddling a chunk boundary + boundary-exact ts
        base = 10 * chunk
        for off in (-3, -2, -1, 0, 0, 1, 2):  # includes a duplicate ts
            rows.append((eid, uid, base + off * 100_000)); eid += 1
        # scattered events
        tcur = 0
        for _ in range(40):
            tcur += rng.randrange(1, 3 * lb)
            rows.append((eid, uid, tcur)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, us bigint"
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
             (F.col("us") % 97).cast("double").alias("value"))

    plain_w = (
        W.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-lb, 0)
    )
    plain = df.select(
        "event_id",
        F.count(F.lit(1)).over(plain_w).cast("bigint").alias("n"),
        F.sum("value").over(plain_w).alias("s"),
    )
    u = lookback_chunks(df, "ts", lookback_us=lb, chunk_us=chunk)
    ch_w = (
        W.partitionBy("user_id", "__chunk")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-lb, 0)
    )
    chunked = (
        u.select(
            "event_id",
            "__home",
            F.count(F.lit(1)).over(ch_w).cast("bigint").alias("n"),
            F.sum("value").over(ch_w).alias("s"),
        )
        .filter(F.col("__home"))
        .drop("__home")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, chunked.collect()))
    assert a == b


def test_lookback_chunks_pre_epoch_timestamps(spark):
    """Pre-1970 rows (negative unix_micros) must still spill copies into
    the next chunk: Spark's % follows the dividend's sign, so a plain
    remainder filter silently drops every pre-epoch spill row while
    floor() keeps assigning negative chunk ids — the trailing frame of
    the FOLLOWING chunk's early rows then loses its cross-boundary
    peers. pmod fixes it; this differential straddles the epoch and a
    negative chunk boundary to pin the fix."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from py_gtfs_duckdb_spark.operators.temporal import lookback_chunks

    lb = 1_000_000
    chunk = 2 * lb
    rows = []
    eid = 0
    for uid in range(3):
        # cluster just BEFORE a negative chunk boundary (-10*chunk) so the
        # spill into the next (still negative) chunk is exercised, plus a
        # run straddling the epoch itself, plus post-epoch controls
        for off in (-3, -2, -1, 0, 1):
            rows.append((eid, uid, -10 * chunk + off * 300_000)); eid += 1
        for off in (-4, -2, -1, 0, 1, 3):
            rows.append((eid, uid, off * 400_000)); eid += 1
        for off in (2, 5, 9):
            rows.append((eid, uid, off * lb)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, us bigint"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        F.pmod(F.col("us"), F.lit(97)).cast("double").alias("value"),
    )

    plain_w = (
        W.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-lb, 0)
    )
    plain = df.select(
        "event_id",
        F.count(F.lit(1)).over(plain_w).cast("bigint").alias("n"),
        F.sum("value").over(plain_w).alias("s"),
    )
    u = lookback_chunks(df, "ts", lookback_us=lb, chunk_us=chunk)
    ch_w = (
        W.partitionBy("user_id", "__chunk")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-lb, 0)
    )
    chunked = (
        u.select(
            "event_id",
            "__home",
            F.count(F.lit(1)).over(ch_w).cast("bigint").alias("n"),
            F.sum("value").over(ch_w).alias("s"),
        )
        .filter(F.col("__home"))
        .drop("__home")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, chunked.collect())
    )


def test_lookback_chunks_rejects_short_chunks(spark):
    from py_gtfs_duckdb_spark.operators.temporal import lookback_chunks

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="chunk_us"):
        lookback_chunks(df, "x", lookback_us=10, chunk_us=9)


_event_lists = (
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user (few keys)
            st.integers(min_value=0, max_value=40),  # ts seconds (dense ties)
        ),
        min_size=0,
        max_size=14,
    )
    if HAVE_HYPOTHESIS
    else None
)


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_event_lists, chunk_s=st.sampled_from([10, 17, 1000]))
def test_sessionize_chunked_fuzz_python_reference(spark, rows, chunk_s):
    """Hypothesis fuzz: sessionize_chunked vs a pure-Python reference on
    tiny random event sets (gap 10s, chunk >= gap) — a different angle
    from the seeded large differential."""
    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.temporal import sessionize_chunked

    gap_s = 10
    data = [(i, u, t) for i, (u, t) in enumerate(rows)]
    # python reference: per user in (ts, event_id) order
    want = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, u, t in data:
        by_user.setdefault(u, []).append((t, i))
    for u, evs in by_user.items():
        evs.sort()
        idx, last = 0, None
        for t, _i in evs:
            if last is None or (t - last) > gap_s:
                idx += 1
                want[(u, idx)] = [t, t, 0]
            cur = want[(u, idx)]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            last = t
    df = spark.createDataFrame(
        [(i, u, t * 1000) for i, u, t in data],
        "event_id bigint, user_id bigint, ms bigint",
    ).select("event_id", "user_id", F.timestamp_millis(F.col("ms")).alias("ts"))
    got = {
        (r["user_id"], r["session_idx"]): [
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        ]
        for r in sessionize_chunked(
            df, gap_ms=gap_s * 1000, chunk_ms=chunk_s * 1000
        ).collect()
    }
    assert got == want


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # key
            st.integers(min_value=0, max_value=30),   # lo
            st.integers(min_value=0, max_value=12),   # length (0 = empty)
        ),
        min_size=0,
        max_size=12,
    ),
    bin_width=st.sampled_from([3.0, 7.0, 100.0]),
)
def test_interval_join_fuzz_python_reference(spark, ivals, bin_width):
    """Hypothesis fuzz: interval_join_binned (self-join shape) vs a
    pure-Python O(n^2) overlap reference under half-open semantics."""
    from py_gtfs_duckdb_spark.operators.temporal import interval_join_binned

    data = [(i, k, float(lo), float(lo + ln)) for i, (k, lo, ln) in enumerate(ivals)]
    want = sorted(
        (a[0], 100 + b[0])
        for a in data
        for b in data
        if a[1] == b[1]
        and a[2] < b[3] and b[2] < a[3]
        and a[3] > a[2] and b[3] > b[2]
    )
    left = spark.createDataFrame(
        data, "l_id bigint, key bigint, l_lo double, l_hi double"
    )
    right = spark.createDataFrame(
        [(100 + i, k, lo, hi) for i, k, lo, hi in data],
        "r_id bigint, key bigint, r_lo double, r_hi double",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_join_binned(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi",
            by="key", bin_width=bin_width,
        ).collect()
    )
    assert got == want


@pytest.mark.parametrize("sub_salts", [2, 5])
def test_range_join_sub_salts_row_identical(spark, sub_salts):
    """sub_salts splits each (key, bin) cell's point side by row hash and
    replicates intervals into every sub-cell: the result must be
    row-for-row IDENTICAL to the unsalted join (each pair meets exactly
    once, in the point's sub-cell) and the join must stay an equi-join
    carrying the salt key."""
    import random

    from py_gtfs_duckdb_spark.operators.temporal import range_join_binned

    rng = random.Random(sub_salts)
    points = spark.createDataFrame(
        [(i, i % 3, float(rng.randrange(0, 500))) for i in range(300)],
        "pid bigint, k bigint, t double",
    )
    ivals = spark.createDataFrame(
        [(1000 + i, i % 3, float(s), float(s + rng.randrange(1, 120)))
         for i, s in enumerate(rng.randrange(0, 480) for _ in range(60))],
        "iid bigint, k bigint, lo double, hi double",
    )
    plain = range_join_binned(
        points, ivals.withColumnRenamed("k", "k2").withColumnRenamed(
            "k2", "k"), "t", "lo", "hi", by="k", bin_width=50.0,
    )
    salted = range_join_binned(
        points, ivals, "t", "lo", "hi", by="k", bin_width=50.0,
        sub_salts=sub_salts,
    )
    a = sorted(map(tuple, plain.select("pid", "iid").collect()))
    b = sorted(map(tuple, salted.select("pid", "iid").collect()))
    assert a == b and a
    assert "__ssalt" not in salted.columns


@pytest.mark.parametrize("sub_salts", [2, 4])
def test_interval_join_sub_salts_row_identical(spark, sub_salts):
    from py_gtfs_duckdb_spark.operators.temporal import interval_join_binned
    import random

    rng = random.Random(sub_salts)
    lf = spark.createDataFrame(
        [(i, i % 2, float(s), float(s + rng.randrange(1, 90)))
         for i, s in enumerate(rng.randrange(0, 400) for _ in range(120))],
        "lid bigint, u bigint, ls double, le double",
    )
    rf = spark.createDataFrame(
        [(500 + i, i % 2, float(s), float(s + rng.randrange(1, 60)))
         for i, s in enumerate(rng.randrange(0, 400) for _ in range(80))],
        "rid bigint, u bigint, rs double, re double",
    )
    plain = interval_join_binned(
        lf, rf, "ls", "le", "rs", "re", by="u", bin_width=60.0
    )
    salted = interval_join_binned(
        lf, rf, "ls", "le", "rs", "re", by="u", bin_width=60.0,
        sub_salts=sub_salts,
    )
    a = sorted(map(tuple, plain.select("lid", "rid").collect()))
    b = sorted(map(tuple, salted.select("lid", "rid").collect()))
    assert a == b and a
    assert "__ssalt" not in salted.columns and "__rssalt" not in salted.columns
