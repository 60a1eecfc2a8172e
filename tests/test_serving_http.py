"""HTTP serving edge: live GETs against the stdlib server — protobuf and
debug-JSON feeds rendered from merged lake state, RSS, monitor HTML, 404,
and the response cache's render-once contract."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.serving_http import RealtimeHttpServer
from py_gtfs_duckdb_spark.streaming import RealtimeMerger, gtfsrt_wire, reset_realtime

NOW = int(time.time())


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from py_gtfs_duckdb_spark.streaming.gtfsrt import parse_spool_lines
    from py_gtfs_duckdb_spark.streaming.spool import (
        feed_message_to_spool_dicts,
        spool_write_json,
    )

    tmp = tmp_path_factory.mktemp("http")
    lake = GtfsLake(spark, str(tmp / "lake"))
    reset_realtime(lake)
    feed = {
        "header": {"gtfs_realtime_version": "2.0", "timestamp": NOW},
        "entity": [
            {
                "id": "tu1",
                "trip_update": {
                    "trip": {"trip_id": "t1", "route_id": "r1",
                             "start_time": "08:00:00", "start_date": "20250101"},
                    "timestamp": NOW,
                    "stop_time_update": [
                        {"stop_sequence": 1, "stop_id": "s1",
                         "arrival": {"time": NOW, "delay": 60}}
                    ],
                },
            },
            {
                "id": "al1",
                "alert": {
                    "cause": "STRIKE",
                    "effect": "NO_SERVICE",
                    "header_text": {"translation": [{"text": "Streik", "language": "de"}]},
                    "description_text": {"translation": [{"text": "halt", "language": "de"}]},
                    "active_period": [{"start": NOW - 50, "end": NOW + 50}],
                    "informed_entity": [{"route_id": "r1"}],
                },
            },
            {
                "id": "vp1",
                "vehicle": {
                    "trip": {"trip_id": "t1"},
                    "vehicle": {"id": "bus-1"},
                    "position": {"latitude": 48.7, "longitude": 9.1},
                    "timestamp": NOW,
                },
            },
        ],
    }
    spool = str(tmp / "spool")
    spool_write_json(spool, feed_message_to_spool_dicts(gtfsrt_wire.encode(feed)))
    RealtimeMerger(lake).process_batch(spark.read.text(spool), 0)

    from py_gtfs_duckdb_spark.config import load_config

    cfg = load_config()
    cfg["app"]["caching_enabled"] = True
    cfg["app"]["rss_enabled"] = True
    srv = RealtimeHttpServer(lake, config=cfg)
    srv.start()
    yield srv
    srv.stop()


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_pbf_feed_roundtrips(server):
    status, ctype, body = _get(server, "/gtfs/realtime/trip-updates.pbf")
    assert status == 200 and ctype == "application/octet-stream"
    feed = gtfsrt_wire.decode(body)
    assert feed["entity"][0]["trip_update"]["trip"]["trip_id"] == "t1"
    assert feed["header"]["gtfs_realtime_version"] == "2.0"


def test_debug_json_face(server):
    status, ctype, body = _get(server, "/gtfs/realtime/service-alerts.pbf?debug")
    assert status == 200 and ctype == "application/json"
    feed = json.loads(body)
    alert = feed["entity"][0]["alert"]
    assert alert["cause"] == "STRIKE"
    assert alert["header_text"]["translation"][0]["text"] == "Streik"


def test_vehicle_positions_pbf(server):
    status, _, body = _get(server, "/gtfs/realtime/vehicle-positions.pbf")
    assert status == 200
    veh = gtfsrt_wire.decode(body)["entity"][0]["vehicle"]
    assert veh["vehicle"]["id"] == "bus-1"
    assert abs(veh["position"]["latitude"] - 48.7) < 1e-4


def test_rss_and_monitor_and_404(server):
    status, ctype, body = _get(server, "/gtfs/realtime/rss.xml")
    assert status == 200 and "rss" in ctype and b"Streik" in body
    status, ctype, _ = _get(server, "/monitor")
    assert status == 200 and ctype == "text/html"
    try:
        _get(server, "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_response_cache_renders_once(server):
    """Within the TTL the second GET must come from the cache (reference
    memcached pattern, realtime.py:277-305)."""
    calls = []
    orig = server._feed_response

    def counting(kind, fmt):
        calls.append(kind)
        return orig(kind, fmt)

    server._feed_response = counting
    try:
        _get(server, "/gtfs/realtime/trip-updates.pbf?debug")
        _get(server, "/gtfs/realtime/trip-updates.pbf?debug")
    finally:
        server._feed_response = orig
    assert calls == ["trip_updates"], calls
