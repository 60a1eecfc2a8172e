"""Reference-config conformance (VERDICT r10 Next #7): the reference's
SHIPPED ``gtfsduckdb-realtime.yaml`` (reference repo root), parsed verbatim
through ``config.load_config``, must land every key exactly where the
streaming/serving code reads it — app flags and routing in the HTTP
server, caching TTLs in the cache wiring, matching modes as
match_trip_candidates kwargs, mqtt subscription wiring, RSS fields.
"""

from __future__ import annotations

import inspect
import urllib.error
import urllib.request

import pytest

from py_gtfs_duckdb_spark.config import load_config

REF_YAML = "/root/reference/gtfsduckdb-realtime.yaml"


@pytest.fixture(scope="module")
def cfg():
    return load_config(REF_YAML)


def test_reference_yaml_keys_parse_verbatim(cfg):
    """Every key in the reference's shipped config lands in the merged
    tree with its file value (not a default), and defaults only fill
    keys the file omits."""
    app = cfg["app"]
    assert app["caching_enabled"] is False
    assert app["monitor_enabled"] is True
    assert app["cors_enabled"] is True
    assert app["mqtt_enabled"] is True
    assert app["rss_enabled"] is False
    assert app["data_review_seconds"] == 7200
    assert app["timezone"] == "Europe/Berlin"
    assert app["routing"] == {
        "service_alerts_endpoint": "/gtfs/realtime/service-alerts.pbf",
        "trip_updates_endpoint": "/gtfs/realtime/trip-updates.pbf",
        "vehicle_positions_endpoint": "/gtfs/realtime/vehicle-positions.pbf",
        "rss_endpoint": "/gtfs/realtime/rss.xml",
        "monitor_endpoint": "/monitor",
    }
    assert cfg["caching"] == {
        "caching_server_endpoint": ["MemcachedServerInstance"],
        "caching_service_alerts_ttl_seconds": 60,
        "caching_trip_updates_ttl_seconds": 30,
        "caching_vehicle_positions_ttl_seconds": 15,
    }
    assert cfg["matching"] == {
        "match_against_first_stop_id": True,
        "match_against_stop_ids": False,
        "remove_invalid_stop_ids": True,
    }
    mqtt = cfg["mqtt"]
    assert mqtt["host"] == "test.mosquitto.org"
    assert mqtt["port"] == 1883
    assert mqtt["client"] == "gtfslake-realtime"
    assert mqtt["keepalive"] == 60
    assert mqtt["username"] is None and mqtt["password"] is None
    subs = mqtt["subscriptions"]
    assert [s["type"] for s in subs] == [
        "gtfsrt-service-alerts",
        "gtfsrt-trip-updates",
        "gtfsrt-vehicle-positions",
    ]
    assert subs[0]["topic"] == "realtime/sample/service-alerts/#"
    assert subs[0]["mapping"] == {
        "routes": "./routes_mapping.csv",
        "stops": "./stops_mapping.csv",
    }
    assert "mapping" not in subs[1] and "mapping" not in subs[2]
    assert cfg["rss"] == {
        "title": "Demo Public Transport Alerts",
        "description": "All public transport alerts in realtime as RSS feed.",
        "language": "de-DE",
        "base_url": "https://yourdomain.dev",
        "media_url": "https://yourdomain.dev/image.jpg",
    }


def test_matching_section_is_the_matcher_signature(cfg):
    """The matching block passes straight into match_trip_updates as
    kwargs — the CLI's wiring (__main__.py cmd_realtime) — so every key
    must be a real parameter of the matcher."""
    from py_gtfs_duckdb_spark.streaming.matching import match_trip_updates

    params = set(inspect.signature(match_trip_updates).parameters)
    assert set(cfg["matching"]) <= params, (
        set(cfg["matching"]) - params
    )


def test_reference_config_drives_http_server(spark, tmp_path, cfg):
    """The server constructed with the reference config serves exactly
    what the file says: routed pbf endpoints live, monitor live, RSS
    404s (rss_enabled: false), caching off (no ResponseCache built),
    data_review_seconds reaching the state TTL default."""
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.serving_http import RealtimeHttpServer
    from py_gtfs_duckdb_spark.streaming import reset_realtime

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    reset_realtime(lake)
    srv = RealtimeHttpServer(lake, config=cfg)
    assert srv.cache is None, "caching_enabled: false must not build a cache"
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        routing = cfg["app"]["routing"]
        for key in (
            "service_alerts_endpoint",
            "trip_updates_endpoint",
            "vehicle_positions_endpoint",
        ):
            with urllib.request.urlopen(base + routing[key]) as resp:
                assert resp.status == 200
                assert resp.headers["Content-Type"].startswith(
                    "application/octet-stream"
                )
                # cors_enabled: true
                assert resp.headers["Access-Control-Allow-Origin"] == "*"
        with urllib.request.urlopen(base + routing["monitor_endpoint"]) as resp:
            assert resp.status == 200  # monitor_enabled: true
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + routing["rss_endpoint"])
        assert exc.value.code == 404  # rss_enabled: false
    finally:
        srv.stop()


def test_data_review_seconds_matches_state_ttl_default(cfg):
    """The reference's 7200 s review window is the state-TTL default the
    merge path applies (R3: stale realtime rows expire after 2 h, alerts
    exempt)."""
    from py_gtfs_duckdb_spark.streaming.merge import RealtimeMerger

    assert (
        inspect.signature(RealtimeMerger.__init__)
        .parameters["ttl_seconds"]
        .default
        == cfg["app"]["data_review_seconds"]
    )
