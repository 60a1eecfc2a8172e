"""Trip-candidate matcher truth table (SURVEY §5 item 5) over the three
config flags (reference: adapter/gtfsrt.py:202-257, config.py:31-35)."""

from __future__ import annotations

import pytest

from py_gtfs_duckdb_spark.streaming.matching import match_trip_updates

# Nominal: route r1 has two trips departing 08:00 (t_a before t_b in
# trip_id order) and one at 09:00. t_a stops: s1,s2,s3; t_b stops: s9,s2,s3.
TRIPS = [("r1", "t_a"), ("r1", "t_b"), ("r1", "t_c")]
STOP_TIMES = [
    ("t_a", "08:00:00", "s1", 1), ("t_a", "08:10:00", "s2", 2), ("t_a", "08:20:00", "s3", 3),
    ("t_b", "08:00:00", "s9", 1), ("t_b", "08:10:00", "s2", 2), ("t_b", "08:20:00", "s3", 3),
    ("t_c", "09:00:00", "s1", 1),
]


@pytest.fixture(scope="module")
def nominal(spark):
    trips = spark.createDataFrame(TRIPS, "route_id string, trip_id string")
    stop_times = spark.createDataFrame(
        STOP_TIMES, "trip_id string, departure_time string, stop_id string, stop_sequence int"
    )
    return trips, stop_times


def _parents(spark, rows):
    return spark.createDataFrame(
        rows, "trip_update_id string, trip_id string, trip_route_id string,"
        "trip_start_time string"
    )


def _stus(spark, rows):
    return spark.createDataFrame(
        rows, "trip_update_id string, stop_sequence int, stop_id string"
    )


def run(spark, nominal, parents, stus, **flags):
    trips, stop_times = nominal
    p, s = match_trip_updates(
        _parents(spark, parents), _stus(spark, stus), trips, stop_times, **flags
    )
    return (
        {(r["trip_update_id"], r["trip_id"]) for r in p.collect()},
        {(r["trip_update_id"], r["stop_sequence"], r["stop_id"]) for r in s.collect()},
    )


def test_known_trip_passes_through(spark, nominal):
    p, s = run(
        spark, nominal,
        [("t_a", "t_a", "r1", "08:00:00")],
        [("t_a", 1, "sWRONG")],  # known ids are not verified (gtfsrt.py:198)
    )
    assert p == {("t_a", "t_a")}
    assert s == {("t_a", 1, "sWRONG")}


def test_unknown_matches_first_candidate_in_trip_id_order(spark, nominal):
    # default flags: remove_invalid active -> both candidates verify after
    # dropping mismatches; FIRST in trip_id order (t_a) wins.
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 1, "s1"), ("x1", 2, "s2")],
    )
    assert p == {("t_a", "t_a")}  # entity id rewritten to candidate (gtfsrt.py:215)
    assert s == {("t_a", 1, "s1"), ("t_a", 2, "s2")}


def test_remove_invalid_drops_mismatching_stus(spark, nominal):
    # stop s9 at seq 1 matches t_b, not t_a; default mode keeps BOTH
    # candidates valid (mismatches dropped, not fatal) -> t_a chosen and
    # its mismatching first STU removed.
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 1, "s9"), ("x1", 2, "s2")],
    )
    assert p == {("t_a", "t_a")}  # entity id rewritten to candidate (gtfsrt.py:215)
    assert s == {("t_a", 2, "s2")}


def test_match_against_stop_ids_rejects_to_next_candidate(spark, nominal):
    # strict mode: s9@1 rejects t_a, verifies t_b.
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 1, "s9"), ("x1", 2, "s2")],
        match_against_stop_ids=True,
        remove_invalid_stop_ids=False,
    )
    assert p == {("t_b", "t_b")}
    assert s == {("t_b", 1, "s9"), ("t_b", 2, "s2")}


def test_strict_mode_no_candidate_drops_entity(spark, nominal):
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 2, "sWRONG")],
        match_against_stop_ids=True,
        remove_invalid_stop_ids=False,
    )
    assert p == set() and s == set()


def test_sequence_beyond_nominal_rejects(spark, nominal):
    # t_c has 1 stop; an STU at seq 2 overruns -> no candidate -> dropped.
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "09:00:00")],
        [("x1", 2, "s2")],
    )
    assert p == set() and s == set()


def test_first_stop_only_mode_ignores_later_stops(spark, nominal):
    # pure first-stop mode: non-first STUs never examined, and a first-stop
    # mismatch is NOT fatal (faithful to gtfsrt.py:221-249 where neither
    # mismatch branch fires) -> first candidate t_a wins, STUs kept.
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 1, "s9"), ("x1", 99, "sWRONG")],
        match_against_first_stop_id=True,
        match_against_stop_ids=False,
        remove_invalid_stop_ids=False,
    )
    assert p == {("t_a", "t_a")}  # entity id rewritten to candidate (gtfsrt.py:215)
    assert s == {("t_a", 1, "s9"), ("t_a", 99, "sWRONG")}


def test_all_flags_off_first_candidate_wins_blind(spark, nominal):
    p, s = run(
        spark, nominal,
        [("x1", "ext:1", "r1", "08:00:00")],
        [("x1", 42, "zz")],
        match_against_first_stop_id=False,
        match_against_stop_ids=False,
        remove_invalid_stop_ids=False,
    )
    assert p == {("t_a", "t_a")}  # entity id rewritten to candidate (gtfsrt.py:215)
    assert s == {("t_a", 42, "zz")}


def test_unknown_bucket_or_missing_start_time_drops(spark, nominal):
    p, s = run(
        spark, nominal,
        [
            ("x1", "ext:1", "r1", "23:00:00"),   # no such start_time bucket
            ("x2", "ext:2", "rX", "08:00:00"),   # no such route
            ("x3", "ext:3", "r1", None),          # no start_time at all
        ],
        [],
    )
    assert p == set() and s == set()


def test_config_merge_semantics():
    from py_gtfs_duckdb_spark.config import DEFAULT_CONFIG, merge_config

    cfg = merge_config(
        DEFAULT_CONFIG,
        {"app": {"monitor_enabled": False}, "matching": {"match_against_stop_ids": True}},
    )
    assert cfg["app"]["monitor_enabled"] is False  # explicit falsy wins
    assert cfg["app"]["cors_enabled"] is True  # default preserved
    assert cfg["matching"]["match_against_stop_ids"] is True
    assert cfg["mqtt"]["port"] == 1883
