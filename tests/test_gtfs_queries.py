"""GTFS query API + serving sinks over a synthetic lake: calendar
resolution, flagship trips query, monitor join, FeedMessage/RSS/HTML."""

from __future__ import annotations

import datetime as dt
import json
import time

import pytest
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark import serving
from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.queries import GtfsQueries
from py_gtfs_duckdb_spark.sources.gtfs import load_csv_file, project_to_schema
from py_gtfs_duckdb_spark.streaming import RealtimeMerger, reset_realtime

# Wednesday 2025-06-04: s_week runs (mon-fri), s_weekend doesn't;
# calendar_dates adds s_extra and removes s_week that day.
OPD = dt.date(2025, 6, 4)
NOW = int(time.time())


@pytest.fixture()
def lake(spark, tmp_path):
    lk = GtfsLake(spark, str(tmp_path / "glake"))

    def put(table, rows, cols):
        df = spark.createDataFrame(rows, cols)
        lk.write(table, project_to_schema(df, table))

    put(
        "calendar",
        [
            ("s_week", 1, 1, 1, 1, 1, 0, 0, 20250101, 20251231),
            ("s_weekend", 0, 0, 0, 0, 0, 1, 1, 20250101, 20251231),
            ("s_expired", 1, 1, 1, 1, 1, 1, 1, 20240101, 20241231),
        ],
        "service_id string, monday int, tuesday int, wednesday int, thursday int,"
        "friday int, saturday int, sunday int, start_date int, end_date int",
    )
    put(
        "calendar_dates",
        [("s_extra", 20250604, 1), ("s_week", 20250604, 2)],
        "service_id string, date int, exception_type int",
    )
    put(
        "routes",
        [("a1", "r1", "R1", 3)],
        "agency_id string, route_id string, route_short_name string, route_type int",
    )
    put(
        "trips",
        [
            ("r1", "s_week", "t_week", "Downtown", "0"),
            ("r1", "s_extra", "t_extra", "Airport", "1"),
            ("r1", "s_weekend", "t_weekend", "Beach", "0"),
        ],
        "route_id string, service_id string, trip_id string, trip_headsign string,"
        "direction_id string",
    )
    put(
        "stop_times",
        [
            ("t_extra", "07:00:00", "07:01:00", "st1", 1),
            ("t_extra", "07:30:00", "07:31:00", "st2", 2),
            ("t_week", "08:00:00", "08:01:00", "st1", 1),
            ("t_weekend", "09:00:00", "09:01:00", "st1", 1),
        ],
        "trip_id string, arrival_time string, departure_time string, stop_id string,"
        "stop_sequence int",
    )
    put(
        "stops",
        [("st1", "Main St", 48.1, 9.1), ("st2", "Second St", 48.2, 9.2)],
        "stop_id string, stop_name string, stop_lat double, stop_lon double",
    )
    reset_realtime(lk)
    return lk


@pytest.fixture()
def q(lake):
    return GtfsQueries(lake)


def _alert(eid, start=NOW - 50):
    return {
        "feed_timestamp": NOW,
        "entity": {
            "id": eid,
            "alert": {
                "cause": "STRIKE",
                "effect": "NO_SERVICE",
                "header_text": [{"text": f"Alert {eid}", "language": "de"}],
                "description_text": [{"text": "Details", "language": "de"}],
                "active_period": [{"start": start, "end": start + 1000}],
                "informed_entity": [{"route_id": "r1"}],
            },
        },
    }


def _tu(eid):
    return {
        "feed_timestamp": NOW,
        "entity": {
            "id": eid,
            "trip_update": {
                "trip": {"trip_id": "t_extra", "route_id": "r1",
                         "start_time": "07:01:00", "start_date": "20250604"},
                "timestamp": NOW,
                "stop_time_update": [
                    {"stop_sequence": 1, "stop_id": "st1",
                     "arrival": {"time": NOW, "delay": 120}},
                ],
            },
        },
    }


def _ingest(spark, lake, messages):
    RealtimeMerger(lake).process_batch(
        spark.createDataFrame([(json.dumps(m),) for m in messages], "value string")
    )


def test_active_service_ids_resolution(q):
    # s_week runs Wednesdays but is removed that day; s_extra added;
    # s_weekend wrong weekday; s_expired out of window.
    ids = {r["service_id"] for r in q.active_service_ids(OPD).collect()}
    assert ids == {"s_extra"}


def test_nominal_trips_first_stop_and_full(q):
    first = q.fetch_nominal_operation_day_trips(OPD).collect()
    assert [(r["trip_id"], r["stop_sequence"]) for r in first] == [("t_extra", 1)]
    full = q.fetch_nominal_operation_day_trips(OPD, full_trips=True).collect()
    assert [(r["trip_id"], r["stop_sequence"]) for r in full] == [
        ("t_extra", 1), ("t_extra", 2)
    ]


def test_monitor_join_realtime_flag(spark, lake, q):
    _ingest(spark, lake, [_tu("tu1")])
    rows = q.fetch_realtime_operation_day_monitor_trips(OPD).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["operation_day"] == "20250604"
    assert r["route_short_name"] == "R1"
    assert r["start_stop_name"] == "Main St"
    assert r["start_time"] == "07:01:00"
    assert r["realtime_available"] is True
    assert r["realtime_last_update"] is not None


def test_monitor_join_without_realtime(q):
    r = q.fetch_realtime_operation_day_monitor_trips(OPD).first()
    assert r["realtime_available"] is False
    assert r["realtime_last_update"] is None


def test_feed_message_alerts_tree_and_sorting(spark, lake):
    _ingest(spark, lake, [_alert("a_old", start=NOW - 900),
                          _alert("a_new", start=NOW - 10)])
    feed = serving.feed_message_alerts(lake, timestamp=NOW)
    assert feed["header"]["gtfs_realtime_version"] == "2.0"
    # O4: sorted by earliest active-period start DESC
    assert [e["id"] for e in feed["entity"]] == ["a_new", "a_old"]
    alert = feed["entity"][0]["alert"]
    assert alert["header_text"]["translation"][0]["text"] == "Alert a_new"
    assert alert["active_period"][0]["start"] == NOW - 10
    assert alert["informed_entity"][0]["route_id"] == "r1"
    # NULL pruning (P11): absent fields are dropped, not None
    assert "url" not in alert
    json.dumps(feed)  # serializable (S10 JSON face)


def test_feed_message_trip_updates_children(spark, lake):
    _ingest(spark, lake, [_tu("tu1")])
    feed = serving.feed_message_trip_updates(lake, timestamp=NOW)
    tu = feed["entity"][0]["trip_update"]
    assert tu["trip"]["trip_id"] == "t_extra"
    assert tu["stop_time_update"][0]["arrival"]["delay"] == 120
    assert "departure" not in tu["stop_time_update"][0]  # pruned


def test_rss_and_html_render(spark, lake):
    _ingest(spark, lake, [_alert("a1"), _tu("tu1")])
    rss = serving.alerts_rss(lake)
    assert rss.startswith('<?xml version="1.0"')
    assert "<item>" in rss and "Alert a1" in rss
    page = serving.monitor_html(lake, OPD)
    assert "Alert a1" in page
    assert "t_extra" in page and "green" in page


def test_rss_description_cdata_golden_bytes(spark, lake):
    """Wire parity with the reference's RSS framing (realtime.py:603 +
    dict2xml.py:80-94): the description body rides in a CDATA section —
    markup and ampersands stay RAW bytes, not entity-escaped — and a
    literal ']]>' splits across two sections instead of closing the
    CDATA early (the one case the reference's lxml path can't emit)."""
    import datetime as dt

    alert = _alert("a_cdata")
    alert["entity"]["alert"]["description_text"] = [
        {"text": "Zug fällt aus <b>heute & morgen</b> x]]>y", "language": "de"}
    ]
    _ingest(spark, lake, [alert])
    rss = serving.alerts_rss(lake)
    pub = dt.datetime.fromtimestamp(NOW - 50, tz=dt.timezone.utc).strftime(
        "%a, %d %b %Y %H:%M:%S %z"
    )
    golden_item = (
        "<item>"
        "<guid>a_cdata</guid>"
        "<title>Alert a_cdata</title>"
        "<description><![CDATA[Zug fällt aus <b>heute & morgen</b> "
        "x]]]]><![CDATA[>y]]></description>"
        f"<pubDate>{pub}</pubDate>"
        "</item>"
    )
    assert golden_item in rss, rss
    # well-formed end-to-end despite raw markup in the body
    import xml.etree.ElementTree as ET

    parsed = ET.fromstring(rss)
    desc = parsed.find("./channel/item/description").text
    assert desc == "Zug fällt aus <b>heute & morgen</b> x]]>y"


def test_sql_passthrough_file(q, lake, tmp_path):
    p = tmp_path / "query.sql"
    p.write_text("SELECT COUNT(*) AS n FROM trips")
    assert q.execute_sql_file(str(p)).first()["n"] == 3


def test_nominal_index_cache_rollover(spark, lake):
    """R8: the matcher's nominal slice follows the operation day and is
    rebuilt (not reused) when the day changes."""
    from py_gtfs_duckdb_spark.streaming.matching import NominalIndexCache

    cache = NominalIndexCache(lake)
    cache.matcher(OPD)
    assert {r["trip_id"] for r in cache._trips.collect()} == {"t_extra"}
    day2 = dt.date(2025, 6, 7)  # Saturday: s_weekend runs
    cache.matcher(day2)
    assert {r["trip_id"] for r in cache._trips.collect()} == {"t_weekend"}
    assert cache._day == day2
    # same day again -> no rebuild (same cached object)
    before = cache._trips
    cache.matcher(day2)
    assert cache._trips is before
