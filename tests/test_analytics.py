"""Event-sequence analytics (operators/analytics.py) and the exact
frequent-items sketch (operators/pipeline.py:heavy_hitters):
hand-computed planted topologies beyond the DuckDB-oracle battery checks
— the ordering edge cases (equal timestamps, out-of-order steps) and the
partition-independence guarantee the oracles can't probe."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators import analytics as AN
from py_gtfs_duckdb_spark.operators import pipeline as P


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


_EVENT_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string"


def test_funnel_strict_order_and_ties(spark):
    events = spark.createDataFrame(
        [
            # user 1: clean full conversion a(1:00) -> b(2:00) -> c(3:00)
            (1, 1, _ts(1), "a"),
            (2, 1, _ts(2), "b"),
            (3, 1, _ts(3), "c"),
            # user 2: b BEFORE a only -> stops at step a
            (4, 2, _ts(1), "b"),
            (5, 2, _ts(2), "a"),
            # user 3: b at EXACTLY a's time -> tie does not qualify
            (6, 3, _ts(1), "a"),
            (7, 3, _ts(1), "b"),
            # user 4: reaches b via his SECOND a? No — reach time is the
            # EARLIEST a (1:00), so the 1:30 b counts even though an
            # earlier a at 0:30 would too
            (8, 4, _ts(1), "a"),
            (9, 4, _ts(1, 30), "b"),
            # user 5: never does step a at all
            (10, 5, _ts(1), "c"),
        ],
        _EVENT_SCHEMA,
    )
    rows = {
        r["event_type"]: (r["step"], r["users"])
        for r in AN.funnel(events, ["a", "b", "c"]).collect()
    }
    assert rows == {"a": (0, 4), "b": (1, 2), "c": (2, 1)}


def test_funnel_single_step_degenerates_to_distinct_users(spark):
    events = spark.createDataFrame(
        [(1, 1, _ts(1), "a"), (2, 1, _ts(2), "a"), (3, 2, _ts(1), "a")],
        _EVENT_SCHEMA,
    )
    [row] = AN.funnel(events, ["a"]).collect()
    assert (row["step"], row["event_type"], row["users"]) == (0, "a", 2)


def test_cohort_retention_hand_matrix(spark):
    # weeks: Mon 2024-01-01, Mon 2024-01-08, Mon 2024-01-15
    events = spark.createDataFrame(
        [
            # user 1: first in wk0, active wk0 + wk1
            (1, 1, dt.datetime(2024, 1, 2, 9), "x"),
            (2, 1, dt.datetime(2024, 1, 10, 9), "x"),
            # user 2: first in wk0 (Sunday), active wk2 only after
            (3, 2, dt.datetime(2024, 1, 7, 23), "x"),
            (4, 2, dt.datetime(2024, 1, 16, 1), "x"),
            # user 3: first in wk1
            (5, 3, dt.datetime(2024, 1, 8, 0), "x"),
        ],
        _EVENT_SCHEMA,
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["users"]
        for r in AN.cohort_retention(events).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1+2 in their cohort week
        ("2024-01-01", 1): 1,  # user 1 returns week 1
        ("2024-01-01", 2): 1,  # user 2 returns week 2
        ("2024-01-08", 0): 1,  # user 3 cohort week
    }


def test_resample_gapfill_fills_and_leads_null(spark):
    events = spark.createDataFrame(
        [
            # global range: Jan 1 .. Jan 4 (user 2 sets the max)
            (1, 1, dt.datetime(2024, 1, 1, 5), "x", 1.5),
            (2, 1, dt.datetime(2024, 1, 1, 6), "x", 2.25),  # same day: sums
            (3, 1, dt.datetime(2024, 1, 3, 1), "x", 10.0),
            (4, 2, dt.datetime(2024, 1, 2, 1), "x", 7.0),
            (5, 2, dt.datetime(2024, 1, 4, 1), "x", 1.0),
        ],
        _EVENT_SCHEMA + ", value double",
    )
    got = {
        (r["user_id"], str(r["day"])): r["value_ffill"]
        for r in AN.resample_gapfill(events).collect()
    }
    assert got == {
        (1, "2024-01-01"): 3.75,  # 1.5 + 2.25 summed
        (1, "2024-01-02"): 3.75,  # gap -> carried forward
        (1, "2024-01-03"): 10.0,
        (1, "2024-01-04"): 10.0,  # trailing gap carries too
        (2, "2024-01-01"): None,  # before user 2's first active day
        (2, "2024-01-02"): 7.0,
        (2, "2024-01-03"): 7.0,
        (2, "2024-01-04"): 1.0,
    }


def test_heavy_hitters_exact_vs_groupby_any_partitioning(spark):
    # 10 'hot' (50%), 6 'warm' (30%), 4 singletons: with m=4 the
    # threshold is freq*4 > 20 <=> freq > 5 -> {hot, warm} exactly;
    # 'warm' at freq*m == N-2 clears, a freq-5 item would tie at 20
    # and be EXCLUDED (strict >)
    data = ["hot"] * 10 + ["warm"] * 6 + ["a", "b", "c", "d"]
    expected = {("hot", 10), ("warm", 6)}
    for n_parts in (1, 3, 7):
        items = spark.createDataFrame(
            [(v,) for v in data], "item string"
        ).repartition(n_parts)
        got = {
            (r["item"], r["freq"])
            for r in P.heavy_hitters(items, "item", m=4).collect()
        }
        assert got == expected, f"partitioning {n_parts} changed the answer"


def test_heavy_hitters_strict_threshold_boundary(spark):
    # N=20, m=4: freq=5 sits exactly at freq*m == N -> excluded
    data = ["x"] * 5 + ["y"] * 5 + ["z"] * 5 + ["w"] * 5
    items = spark.createDataFrame([(v,) for v in data], "item string")
    assert P.heavy_hitters(items, "item", m=4).collect() == []


def test_funnel_plan_has_no_window_or_cartesian(spark):
    events = spark.createDataFrame(
        [(1, 1, _ts(1), "a"), (2, 1, _ts(2), "b")], _EVENT_SCHEMA
    )
    plan = AN.funnel(events, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_funnel_conversion_window(spark):
    events = spark.createDataFrame(
        [
            # user 1: b 30 min after a -> inside a 1h window
            (1, 1, _ts(1), "a"),
            (2, 1, _ts(1, 30), "b"),
            # user 2: b exactly 1h after a -> inclusive boundary, counts
            (3, 2, _ts(1), "a"),
            (4, 2, _ts(2), "b"),
            # user 3: b 1h1s after a -> outside
            (5, 3, _ts(1), "a"),
            (6, 3, _ts(2, 0, 1), "b"),
        ],
        _EVENT_SCHEMA,
    )
    rows = {
        r["event_type"]: r["users"]
        for r in AN.funnel(events, ["a", "b"], within_seconds=3600).collect()
    }
    assert rows == {"a": 3, "b": 2}
    # without the window user 3 converts too
    rows2 = {
        r["event_type"]: r["users"]
        for r in AN.funnel(events, ["a", "b"]).collect()
    }
    assert rows2 == {"a": 3, "b": 3}


def test_transition_matrix_hand_counts(spark):
    events = spark.createDataFrame(
        [
            # user 1 sequence: a -> b -> b -> c   (ties broken by event_id)
            (1, 1, _ts(1), "a"),
            (2, 1, _ts(2), "b"),
            (3, 1, _ts(3), "b"),
            (4, 1, _ts(4), "c"),
            # user 2 sequence: a -> c; same-ts tie ordered by event_id
            (5, 2, _ts(1), "a"),
            (6, 2, _ts(1), "c"),
            # user 3: single event -> no transition
            (7, 3, _ts(1), "a"),
        ],
        _EVENT_SCHEMA,
    )
    got = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in AN.transition_matrix(events).collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


def test_pmi_bigrams_hand_computed(spark):
    import math

    from py_gtfs_duckdb_spark.operators.lexical import pmi_bigrams

    # corpus bigrams: "x y" x4, "y x" x3, "x x" x1  (doc "x y x y x y x y x"
    # gives x-y alternation; second doc adds "x x")
    docs = spark.createDataFrame(
        [(1, "x y x y x y x y"), (2, "y x y x x")],
        "doc_id long, text string",
    )
    rows = {
        r["bigram"]: (r["c12"], r["pmi"])
        for r in pmi_bigrams(docs, min_count=1, k=10).collect()
    }
    # totals: doc1 -> x y,y x,x y,y x,x y,y x,x y ; doc2 -> y x,x y,y x,x x
    # c12: "x y"=5, "y x"=5, "x x"=1 ; N=11
    # marginals: c1(x)=6, c1(y)=5, c2(y)=5, c2(x)=6
    def q(v):
        return math.floor(math.log(v) * 1e6 + 0.5)

    def pmi(c12, c1, c2n, n=11):
        pq = q(c12) + q(n) - q(c1) - q(c2n)
        return math.floor(pq / 1e6 * 1e4 + 0.5) / 1e4

    assert rows == {
        "x y": (5, pmi(5, 6, 5)),
        "y x": (5, pmi(5, 5, 6)),
        "x x": (1, pmi(1, 6, 6)),
    }
    # count floor prunes the singleton
    assert {
        r["bigram"] for r in pmi_bigrams(docs, min_count=2, k=10).collect()
    } == {"x y", "y x"}


def _ref_funnel(rows, steps, within_s=None):
    """Sequential per-user reference model of the funnel spec."""
    by_user: dict = {}
    for _eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, et))
    counts = [0] * len(steps)
    stages = {}
    for uid, evs in by_user.items():
        reach = None
        stage = -1
        for i, step in enumerate(steps):
            cand = [
                ts
                for ts, et in evs
                if et == step
                and (i == 0 or ts > reach)
                and (
                    i == 0
                    or within_s is None
                    or (ts - reach).total_seconds() <= within_s
                )
            ]
            if not cand:
                break
            reach = min(cand)
            stage = i
            counts[i] += 1
        stages[uid] = stage
    return counts, stages


def test_funnel_differential_fuzz(spark):
    import random

    rng = random.Random(1234)
    steps = ["s0", "s1", "s2"]
    for trial in range(6):
        within = rng.choice([None, 1800, 7200])
        rows = []
        eid = 0
        for uid in range(40):
            for _ in range(rng.randint(0, 12)):
                eid += 1
                # coarse timestamps force plenty of exact ties
                ts = dt.datetime(2024, 1, 1) + dt.timedelta(
                    seconds=1800 * rng.randint(0, 11)
                )
                rows.append((eid, uid, ts, rng.choice(steps + ["noise"])))
        if not rows:
            continue
        events = spark.createDataFrame(rows, _EVENT_SCHEMA)
        got = {
            r["step"]: r["users"]
            for r in AN.funnel(events, steps, within_seconds=within).collect()
        }
        want, _ = _ref_funnel(rows, steps, within)
        assert [got[i] for i in range(3)] == want, (trial, within)


def test_transition_matrix_differential_fuzz(spark):
    import random
    from collections import Counter

    rng = random.Random(99)
    rows = []
    eid = 0
    for uid in range(30):
        for _ in range(rng.randint(0, 15)):
            eid += 1
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=3600 * rng.randint(0, 5)  # tie-heavy
            )
            rows.append((eid, uid, ts, rng.choice("abcd")))
    events = spark.createDataFrame(rows, _EVENT_SCHEMA)
    got = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in AN.transition_matrix(events).collect()
    }
    ref: Counter = Counter()
    by_user: dict = {}
    for eid_, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid_, et))
    for seq in by_user.values():
        seq.sort()  # (ts, event_id) — the operator's declared order
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            ref[(a, b)] += 1
    assert got == dict(ref)


def test_funnel_times_hand_computed(spark):
    events = spark.createDataFrame(
        [
            # user 1: a@1:00 -> b@1:30 (1800s); user 2: a@1:00 -> b@2:00
            # (3600s); user 3: a only. median gap = (1800+3600)/2 = 2700
            (1, 1, _ts(1), "a"),
            (2, 1, _ts(1, 30), "b"),
            (3, 2, _ts(1), "a"),
            (4, 2, _ts(2), "b"),
            (5, 3, _ts(1), "a"),
        ],
        _EVENT_SCHEMA,
    )
    [row] = AN.funnel_times(events, ["a", "b"]).collect()
    assert (row["step"], row["event_type"], row["users"]) == (1, "b", 2)
    assert row["median_gap_s"] == 2700.0


def test_rolling_distinct_hand_computed(spark):
    events = spark.createDataFrame(
        [
            # range Jan 1..5; window 3 days
            (1, 1, dt.datetime(2024, 1, 1, 5), "x"),
            (2, 2, dt.datetime(2024, 1, 2, 5), "x"),
            (3, 1, dt.datetime(2024, 1, 2, 6), "x"),   # same user again
            (4, 3, dt.datetime(2024, 1, 5, 5), "x"),
        ],
        _EVENT_SCHEMA,
    )
    got = {
        r["day"]: r["wau"]
        for r in AN.rolling_distinct(events, window_days=3).collect()
    }
    assert got == {
        "2024-01-01": 1,  # u1
        "2024-01-02": 2,  # u1, u2
        "2024-01-03": 2,  # u1, u2 (within 3-day lookback)
        "2024-01-04": 2,  # u1@Jan2, u2@Jan2
        "2024-01-05": 1,  # u3 only (Jan2 actives aged out)
    }
