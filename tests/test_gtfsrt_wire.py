"""Vendored GTFS-RT protobuf codec tests.

The golden-bytes test pins the wire format against hand-assembled bytes
(field numbers and wire types from the public gtfs-realtime.proto), so
codec symmetry bugs (same mistake in encode+decode) can't hide. The
end-to-end test drives FeedMessage bytes -> spool -> Structured-Streaming
merge -> serving -> bytes, the full reference realtime loop
(adapter/gtfsrt.py decode ≙ realtime.py:273-481 serve).
"""

from __future__ import annotations

import time

import pytest

from py_gtfs_duckdb_spark.streaming import gtfsrt_wire
from py_gtfs_duckdb_spark.streaming.spool import (
    feed_message_to_spool_dicts,
    spool_write_json,
)

NOW = int(time.time())


def _feed(entities, ts=NOW):
    return {
        "header": {
            "gtfs_realtime_version": "2.0",
            "incrementality": "FULL_DATASET",
            "timestamp": ts,
        },
        "entity": entities,
    }


def test_golden_wire_bytes():
    """Hand-assembled bytes for a minimal FeedMessage:
    header(field 1): version(1)="2.0", incrementality(2)=0, timestamp(3)=100
    entity(field 2): id(1)="e1", trip_update(3): trip(1){trip_id(1)="t1"},
    timestamp(4)=100."""
    header = b"\x0a\x03" + b"2.0" + b"\x10\x00" + b"\x18\x64"
    trip = b"\x0a\x02" + b"t1"
    trip_update = b"\x0a" + bytes([len(trip)]) + trip + b"\x20\x64"
    entity = (
        b"\x0a\x02" + b"e1" + b"\x1a" + bytes([len(trip_update)]) + trip_update
    )
    expected = (
        b"\x0a" + bytes([len(header)]) + header
        + b"\x12" + bytes([len(entity)]) + entity
    )
    feed = {
        "header": {
            "gtfs_realtime_version": "2.0",
            "incrementality": "FULL_DATASET",
            "timestamp": 100,
        },
        "entity": [
            {"id": "e1", "trip_update": {"trip": {"trip_id": "t1"}, "timestamp": 100}}
        ],
    }
    assert gtfsrt_wire.encode(feed) == expected
    decoded = gtfsrt_wire.decode(expected)
    assert decoded["header"]["timestamp"] == 100
    assert decoded["header"]["incrementality"] == "FULL_DATASET"
    assert decoded["entity"][0]["trip_update"]["trip"]["trip_id"] == "t1"


def test_negative_delay_roundtrip():
    """proto int32 negatives ride as 64-bit two's-complement varints."""
    stu = {"arrival": {"delay": -45, "time": NOW}, "stop_sequence": 3}
    data = gtfsrt_wire.encode(stu, "StopTimeUpdate")
    back = gtfsrt_wire.decode(data, "StopTimeUpdate")
    assert back["arrival"]["delay"] == -45
    assert back["arrival"]["time"] == NOW
    assert back["stop_sequence"] == 3


def test_float_position_roundtrip():
    pos = {"latitude": 48.78, "longitude": 9.18, "odometer": 12345.678, "speed": 13.9}
    back = gtfsrt_wire.decode(gtfsrt_wire.encode(pos, "Position"), "Position")
    # latitude/longitude/speed are float32 on the wire; odometer is double
    assert back["latitude"] == pytest.approx(48.78, abs=1e-5)
    assert back["odometer"] == pytest.approx(12345.678, abs=1e-9)


def test_unknown_fields_skipped():
    """Forward compatibility: unknown field numbers are skipped, the rest
    of the message still decodes (proto2 contract)."""
    entity = gtfsrt_wire.encode({"id": "e9"}, "FeedEntity")
    # append unknown field 15 (varint) and unknown field 14 (bytes)
    entity += b"\x78\x2a" + b"\x72\x03abc"
    assert gtfsrt_wire.decode(entity, "FeedEntity") == {"id": "e9"}


def test_enum_names_and_numbers_encode_alike():
    a = gtfsrt_wire.encode({"cause": "STRIKE", "effect": "DETOUR"}, "Alert")
    b = gtfsrt_wire.encode({"cause": 4, "effect": 4}, "Alert")
    assert a == b
    assert gtfsrt_wire.decode(a, "Alert") == {"cause": "STRIKE", "effect": "DETOUR"}


def test_feed_to_spool_dicts_normalization():
    """TranslatedStrings flatten to translation arrays, url is
    translation-picked ('de' else first, adapter/gtfsrt.py:145-153), and
    severity_level defaults to UNKNOWN_SEVERITY (adapter/gtfsrt.py:121)."""
    feed = _feed(
        [
            {
                "id": "a1",
                "alert": {
                    "cause": "CONSTRUCTION",
                    "effect": "DETOUR",
                    "url": {
                        "translation": [
                            {"text": "http://en", "language": "en"},
                            {"text": "http://de", "language": "de"},
                        ]
                    },
                    "header_text": {
                        "translation": [{"text": "Bauarbeiten", "language": "de"}]
                    },
                    "active_period": [{"start": NOW - 10, "end": NOW + 10}],
                    "informed_entity": [{"route_id": "r1", "stop_id": "s1"}],
                },
            }
        ]
    )
    dicts = feed_message_to_spool_dicts(gtfsrt_wire.encode(feed))
    assert len(dicts) == 1
    assert dicts[0]["feed_timestamp"] == NOW
    alert = dicts[0]["entity"]["alert"]
    assert alert["url"] == "http://de"
    assert alert["header_text"] == [{"text": "Bauarbeiten", "language": "de"}]
    assert alert["severity_level"] == "UNKNOWN_SEVERITY"
    assert alert["active_period"] == [{"start": NOW - 10, "end": NOW + 10}]


def test_bytes_to_spool_to_merge_to_serve_roundtrip(spark, tmp_path):
    """Full loop: protobuf bytes -> spool JSON -> typed parse -> keyed
    merge -> serving feed dicts -> protobuf bytes -> decode."""
    from py_gtfs_duckdb_spark import serving
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.streaming import RealtimeMerger, reset_realtime

    feed = _feed(
        [
            {
                "id": "tu1",
                "trip_update": {
                    "trip": {
                        "trip_id": "t1",
                        "route_id": "r1",
                        "start_time": "08:00:00",
                        "start_date": "20250101",
                    },
                    "timestamp": NOW,
                    "stop_time_update": [
                        {
                            "stop_sequence": 1,
                            "stop_id": "s1",
                            "arrival": {"time": NOW, "delay": -30},
                            "departure": {"time": NOW + 60, "delay": 15},
                        }
                    ],
                },
            },
            {
                "id": "vp1",
                "vehicle": {
                    "trip": {"trip_id": "t1", "route_id": "r1"},
                    "vehicle": {"id": "bus-7", "label": "Bus 7"},
                    "position": {"latitude": 48.78, "longitude": 9.18, "speed": 10.0},
                    "current_stop_sequence": 1,
                    "stop_id": "s1",
                    "current_status": "IN_TRANSIT_TO",
                    "timestamp": NOW,
                },
            },
            {
                "id": "al1",
                "alert": {
                    "cause": "STRIKE",
                    "effect": "NO_SERVICE",
                    "header_text": {
                        "translation": [{"text": "Streik", "language": "de"}]
                    },
                    "description_text": {
                        "translation": [{"text": "kein Betrieb", "language": "de"}]
                    },
                    "active_period": [{"start": NOW - 100, "end": NOW + 100}],
                    "informed_entity": [{"route_id": "r1"}],
                },
            },
        ]
    )
    payload = gtfsrt_wire.encode(feed)

    spool_dir = str(tmp_path / "spool")
    spool_write_json(spool_dir, feed_message_to_spool_dicts(payload))

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    reset_realtime(lake)
    RealtimeMerger(lake).process_batch(spark.read.text(spool_dir), 0)

    assert lake.table("realtime_trip_updates").count() == 1
    stu = lake.table("realtime_trip_stop_time_updates").collect()
    assert len(stu) == 1 and stu[0]["arrival_delay"] == -30
    assert lake.table("realtime_vehicle_positions").count() == 1
    assert lake.table("realtime_service_alerts").count() == 1

    out_tu = gtfsrt_wire.decode(
        serving.to_protobuf(serving.feed_message_trip_updates(lake, timestamp=NOW))
    )
    ent = out_tu["entity"][0]
    assert ent["id"] == "tu1"
    assert ent["trip_update"]["trip"]["trip_id"] == "t1"
    assert ent["trip_update"]["stop_time_update"][0]["arrival"]["delay"] == -30

    out_al = gtfsrt_wire.decode(
        serving.to_protobuf(serving.feed_message_alerts(lake, timestamp=NOW))
    )
    alert = out_al["entity"][0]["alert"]
    assert alert["cause"] == "STRIKE"
    assert alert["header_text"]["translation"][0]["text"] == "Streik"
    assert alert["active_period"][0]["start"] == NOW - 100

    out_vp = gtfsrt_wire.decode(
        serving.to_protobuf(
            serving.feed_message_vehicle_positions(lake, timestamp=NOW)
        )
    )
    veh = out_vp["entity"][0]["vehicle"]
    assert veh["vehicle"]["id"] == "bus-7"
    assert veh["position"]["latitude"] == pytest.approx(48.78, abs=1e-5)
    assert veh["current_status"] == "IN_TRANSIT_TO"


def test_wire_type_mismatch_rejected():
    """A KNOWN field on the wrong wire type is a malformed message (the
    real bindings reject it), unlike unknown fields which skip."""
    # FeedEntity.id (field 1) is a string (wire type 2); send it as varint
    bad = b"\x08\x2a"  # tag=(1<<3)|0, value 42
    with pytest.raises(ValueError, match="wire type"):
        gtfsrt_wire.decode(bad, "FeedEntity")


def test_truncated_messages_rejected():
    """Truncation must raise, not silently decode partial values (a cut
    trip_id merging into state would be corrupt data, not missing data)."""
    full = gtfsrt_wire.encode(
        _feed([{"id": "e1", "trip_update": {"trip": {"trip_id": "t1"}}}])
    )
    saw_value_error = 0
    for cut in range(1, len(full)):
        try:
            gtfsrt_wire.decode(full[:cut])
        except ValueError:
            saw_value_error += 1
        except Exception as exc:  # no other exception types allowed
            raise AssertionError(f"cut={cut}: {type(exc).__name__}: {exc}")
        else:
            # a cut that lands exactly on a field boundary decodes the
            # prefix — fine; it must simply never yield corrupt strings
            decoded = gtfsrt_wire.decode(full[:cut])
            for ent in decoded.get("entity", []):
                tid = ent.get("trip_update", {}).get("trip", {}).get("trip_id")
                assert tid in (None, "t1"), f"corrupt trip_id {tid!r} at cut {cut}"
    assert saw_value_error > 0
