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


# -- independent mini-assembler (NOT gtfsrt_wire.encode) -------------------
# Used to author wire bytes the way arbitrary real-world producers do:
# non-canonical field order, duplicated submessage fields, over-long
# varints, unknown fields of every wire type including proto2 groups.
# Our encoder emits none of these, so these tests exercise decode paths
# that encode(decode(x)) self-round-trips can never reach.


def _vi(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _tag(field_no: int, wire_type: int) -> bytes:
    return _vi((field_no << 3) | wire_type)


def _ld(payload: bytes) -> bytes:
    return _vi(len(payload)) + payload


def test_duplicate_submessage_occurrences_merge():
    """proto2: multiple occurrences of a non-repeated embedded message
    merge field-by-field (MergeFrom) — singular scalars take the later
    value, submessages merge recursively, repeated fields concatenate.
    Real producers split messages this way (e.g. framing by concatenating
    two partial serializations of the same entity)."""
    # TripUpdate occurrence A: trip{trip_id="t7"}, timestamp, one STU
    stu_a = _tag(1, 0) + _vi(1) + _tag(2, 2) + _ld(_tag(1, 0) + _vi(10))
    tu_a = (
        _tag(1, 2) + _ld(_tag(1, 2) + _ld(b"t7"))
        + _tag(4, 0) + _vi(1500000000)
        + _tag(2, 2) + _ld(stu_a)
    )
    # TripUpdate occurrence B: trip{route_id="r9"}, another STU
    tu_b = (
        _tag(1, 2) + _ld(_tag(5, 2) + _ld(b"r9"))
        + _tag(2, 2) + _ld(_tag(1, 0) + _vi(2))
    )
    entity = (
        _tag(1, 2) + _ld(b"e-dup")
        + _tag(3, 2) + _ld(tu_a)
        + _tag(3, 2) + _ld(tu_b)
    )
    decoded = gtfsrt_wire.decode(entity, "FeedEntity")
    assert decoded == {
        "id": "e-dup",
        "trip_update": {
            "trip": {"trip_id": "t7", "route_id": "r9"},
            "timestamp": 1500000000,
            "stop_time_update": [
                {"stop_sequence": 1, "arrival": {"delay": 10}},
                {"stop_sequence": 2},
            ],
        },
    }


def test_duplicate_scalar_last_wins():
    """Duplicated non-repeated scalars: the later value wins (proto2)."""
    entity = _tag(1, 2) + _ld(b"first") + _tag(1, 2) + _ld(b"second")
    assert gtfsrt_wire.decode(entity, "FeedEntity") == {"id": "second"}


def test_unknown_group_fields_skipped():
    """Deprecated proto2 groups (wire types 3/4) in unknown fields are
    skipped like any other unknown field — the bindings don't reject a
    technically-valid feed that carries one. Nested groups recurse."""
    group = (
        _tag(99, 3)                       # start group 99
        + _tag(1, 0) + _vi(7)             #   varint member
        + _tag(2, 3) + _tag(2, 4)         #   empty nested group 2
        + _tag(3, 2) + _ld(b"xyz")        #   bytes member
        + _tag(99, 4)                     # end group 99
    )
    entity = group + _tag(1, 2) + _ld(b"e1") + group
    assert gtfsrt_wire.decode(entity, "FeedEntity") == {"id": "e1"}
    # a KNOWN field sent as a group is a wire-type mismatch (same
    # contract as the other wrong-wire-type cases), not a skip
    with pytest.raises(ValueError, match="group wire type"):
        gtfsrt_wire.decode(_tag(1, 3) + _tag(1, 4), "FeedEntity")
    # malformed groups still raise: truncated / mismatched end tag
    with pytest.raises(ValueError):
        gtfsrt_wire.decode(_tag(99, 3) + _tag(1, 0) + _vi(7), "FeedEntity")
    with pytest.raises(ValueError):
        gtfsrt_wire.decode(_tag(99, 3) + _tag(98, 4), "FeedEntity")
    with pytest.raises(ValueError, match="end-group"):
        gtfsrt_wire.decode(_tag(99, 4), "FeedEntity")


def test_producer_style_feed_fixture():
    """A full FeedMessage authored byte-by-byte from the proto2 wire spec,
    independently of the encoder, using encodings real producers emit and
    ours never does: entities BEFORE the header (field order is free in
    protobuf), an over-long (non-minimal) varint, unknown extension-range
    and group fields, an unknown enum number (stays numeric, the
    adapter's lenient posture), and a duplicated trip submessage.

    The container has no protobuf runtime or network access, so bytes
    captured from the official gtfs-realtime-bindings aren't obtainable
    here; this fixture is the strongest available external grounding —
    it shares no code or byte-assembly with the codec under test."""
    import struct

    ts = 1500000000
    # entity 1: duplicated TripUpdate.trip merges
    tu = (
        _tag(1, 2) + _ld(_tag(1, 2) + _ld(b"t7"))            # trip{trip_id}
        + _tag(4, 0) + _vi(ts)                                # timestamp
        + _tag(1, 2) + _ld(_tag(5, 2) + _ld(b"r9"))          # trip{route_id}
    )
    ent1 = _tag(1, 2) + _ld(b"e1") + _tag(3, 2) + _ld(tu)
    # entity 2: vehicle position with oddities
    pos = (
        _tag(1, 5) + struct.pack("<f", 45.0)
        + _tag(2, 5) + struct.pack("<f", -122.5)
    )
    vp = (
        _tag(2, 2) + _ld(pos)
        + _tag(3, 0) + b"\x85\x80\x00"                       # 5, over-long varint
        + _tag(5, 0) + _vi(ts)
        + _tag(6, 0) + _vi(9)                                 # unknown enum number
        + _tag(1001, 2) + _ld(b"ext-data")                    # extension-range unknown
        + _tag(99, 3) + _tag(1, 0) + _vi(7) + _tag(99, 4)     # unknown group
    )
    ent2 = _tag(1, 2) + _ld(b"bus123") + _tag(4, 2) + _ld(vp)
    header = _tag(1, 2) + _ld(b"2.0") + _tag(3, 0) + _vi(ts)
    feed_bytes = (
        _tag(2, 2) + _ld(ent1)
        + _tag(2, 2) + _ld(ent2)
        + _tag(1, 2) + _ld(header)   # header LAST on the wire
    )

    expected = {
        "header": {"gtfs_realtime_version": "2.0", "timestamp": ts},
        "entity": [
            {
                "id": "e1",
                "trip_update": {
                    "trip": {"trip_id": "t7", "route_id": "r9"},
                    "timestamp": ts,
                },
            },
            {
                "id": "bus123",
                "vehicle": {
                    "position": {"latitude": 45.0, "longitude": -122.5},
                    "current_stop_sequence": 5,
                    "timestamp": ts,
                    "congestion_level": 9,
                },
            },
        ],
    }
    decoded = gtfsrt_wire.decode(feed_bytes)
    assert decoded == expected
    # canonical re-encode round-trips the semantics (unknown fields drop,
    # exactly what MessageToDict-then-ParseDict does with the bindings)
    assert gtfsrt_wire.decode(gtfsrt_wire.encode(decoded)) == expected


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
