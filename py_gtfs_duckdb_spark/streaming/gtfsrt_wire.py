"""Vendored GTFS-Realtime protobuf codec (no external dependencies).

The container has neither ``gtfs-realtime-bindings`` nor the Python
``protobuf`` runtime, but the protobuf *wire format* is a tiny public
spec (varints + length-delimited fields) and the GTFS-RT schema is a
public, frozen message catalog (gtfs.org/realtime — gtfs-realtime.proto
v2.0). This module implements both directly:

- minimal proto2 wire primitives (varint / fixed32 / fixed64 / bytes);
- a schema table for the GTFS-RT messages the reference touches
  (``FeedMessage``/``FeedHeader``/``FeedEntity``, ``TripUpdate`` +
  ``StopTimeUpdate`` + ``StopTimeEvent``, ``VehiclePosition`` +
  ``Position``, ``Alert`` + ``TimeRange`` + ``EntitySelector`` +
  ``TranslatedString``, ``TripDescriptor``, ``VehicleDescriptor``);
- ``decode(data, "FeedMessage") -> dict`` producing the same
  snake-case / enum-name dict shape ``MessageToDict(...,
  preserving_proto_field_name=True)`` produces — the spool-line format
  consumed by ``streaming/gtfsrt.py::FEED_ENTITY_SCHEMA``;
- ``encode(feed_dict, "FeedMessage") -> bytes`` for the serving edge
  (≙ reference ``realtime.py:273-481`` ``ParseDict`` +
  ``SerializeToString``).

Round-trip parity with the real bindings holds because proto2 decoding
is defined field-by-field: unknown fields are skipped (forward
compatible with newer GTFS-RT additions — including deprecated
group-typed fields, wire types 3/4), absent optional fields stay
absent (explicit presence), repeated fields accumulate in arrival
order, the last value wins for duplicated scalar fields, and duplicated
non-repeated embedded messages merge field-by-field (``MergeFrom``).

Reference behavior reproduced: ``adapter/gtfsrt.py:28-29``
(``FeedMessage.ParseFromString``) and ``realtime.py:726-737`` (feed
dict → protobuf serialization).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# wire primitives
# --------------------------------------------------------------------------

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_BYTES = 2
_WT_FIXED32 = 5


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        # proto int32/int64 negatives: two's complement over 64 bits
        value &= (1 << 64) - 1
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


# --------------------------------------------------------------------------
# GTFS-RT schema catalog (public gtfs-realtime.proto v2.0 field numbers)
# --------------------------------------------------------------------------

INCREMENTALITY = {"FULL_DATASET": 0, "DIFFERENTIAL": 1}
TRIP_SCHEDULE_RELATIONSHIP = {
    "SCHEDULED": 0,
    "ADDED": 1,
    "UNSCHEDULED": 2,
    "CANCELED": 3,
    "REPLACEMENT": 5,
    "DUPLICATED": 6,
    "DELETED": 7,
}
STU_SCHEDULE_RELATIONSHIP = {
    "SCHEDULED": 0,
    "SKIPPED": 1,
    "NO_DATA": 2,
    "UNSCHEDULED": 3,
}
VEHICLE_STOP_STATUS = {"INCOMING_AT": 0, "STOPPED_AT": 1, "IN_TRANSIT_TO": 2}
CONGESTION_LEVEL = {
    "UNKNOWN_CONGESTION_LEVEL": 0,
    "RUNNING_SMOOTHLY": 1,
    "STOP_AND_GO": 2,
    "CONGESTION": 3,
    "SEVERE_CONGESTION": 4,
}
OCCUPANCY_STATUS = {
    "EMPTY": 0,
    "MANY_SEATS_AVAILABLE": 1,
    "FEW_SEATS_AVAILABLE": 2,
    "STANDING_ROOM_ONLY": 3,
    "CRUSHED_STANDING_ROOM_ONLY": 4,
    "FULL": 5,
    "NOT_ACCEPTING_PASSENGERS": 6,
    "NO_DATA_AVAILABLE": 7,
    "NOT_BOARDABLE": 8,
}
WHEELCHAIR_ACCESSIBLE = {
    "NO_VALUE": 0,
    "UNKNOWN": 1,
    "WHEELCHAIR_ACCESSIBLE": 2,
    "WHEELCHAIR_INACCESSIBLE": 3,
}
ALERT_CAUSE = {
    "UNKNOWN_CAUSE": 1,
    "OTHER_CAUSE": 2,
    "TECHNICAL_PROBLEM": 3,
    "STRIKE": 4,
    "DEMONSTRATION": 5,
    "ACCIDENT": 6,
    "HOLIDAY": 7,
    "WEATHER": 8,
    "MAINTENANCE": 9,
    "CONSTRUCTION": 10,
    "POLICE_ACTIVITY": 11,
    "MEDICAL_EMERGENCY": 12,
}
ALERT_EFFECT = {
    "NO_SERVICE": 1,
    "REDUCED_SERVICE": 2,
    "SIGNIFICANT_DELAYS": 3,
    "DETOUR": 4,
    "ADDITIONAL_SERVICE": 5,
    "MODIFIED_SERVICE": 6,
    "OTHER_EFFECT": 7,
    "UNKNOWN_EFFECT": 8,
    "STOP_MOVED": 9,
    "NO_EFFECT": 10,
    "ACCESSIBILITY_ISSUE": 11,
}
ALERT_SEVERITY = {"UNKNOWN_SEVERITY": 1, "INFO": 2, "WARNING": 3, "SEVERE": 4}

# field_number -> (name, type, repeated); type is a primitive name,
# ("enum", name->number map) or ("msg", MESSAGES key).
MESSAGES: dict[str, dict[int, tuple]] = {
    "FeedMessage": {
        1: ("header", ("msg", "FeedHeader"), False),
        2: ("entity", ("msg", "FeedEntity"), True),
    },
    "FeedHeader": {
        1: ("gtfs_realtime_version", "string", False),
        2: ("incrementality", ("enum", INCREMENTALITY), False),
        3: ("timestamp", "uint64", False),
    },
    "FeedEntity": {
        1: ("id", "string", False),
        2: ("is_deleted", "bool", False),
        3: ("trip_update", ("msg", "TripUpdate"), False),
        4: ("vehicle", ("msg", "VehiclePosition"), False),
        5: ("alert", ("msg", "Alert"), False),
    },
    "TripUpdate": {
        1: ("trip", ("msg", "TripDescriptor"), False),
        2: ("stop_time_update", ("msg", "StopTimeUpdate"), True),
        3: ("vehicle", ("msg", "VehicleDescriptor"), False),
        4: ("timestamp", "uint64", False),
        5: ("delay", "int32", False),
    },
    "StopTimeEvent": {
        1: ("delay", "int32", False),
        2: ("time", "int64", False),
        3: ("uncertainty", "int32", False),
    },
    "StopTimeUpdate": {
        1: ("stop_sequence", "uint32", False),
        2: ("arrival", ("msg", "StopTimeEvent"), False),
        3: ("departure", ("msg", "StopTimeEvent"), False),
        4: ("stop_id", "string", False),
        5: ("schedule_relationship", ("enum", STU_SCHEDULE_RELATIONSHIP), False),
    },
    "TripDescriptor": {
        1: ("trip_id", "string", False),
        2: ("start_time", "string", False),
        3: ("start_date", "string", False),
        4: ("schedule_relationship", ("enum", TRIP_SCHEDULE_RELATIONSHIP), False),
        5: ("route_id", "string", False),
        6: ("direction_id", "uint32", False),
    },
    "VehicleDescriptor": {
        1: ("id", "string", False),
        2: ("label", "string", False),
        3: ("license_plate", "string", False),
        4: ("wheelchair_accessible", ("enum", WHEELCHAIR_ACCESSIBLE), False),
    },
    "VehiclePosition": {
        1: ("trip", ("msg", "TripDescriptor"), False),
        2: ("position", ("msg", "Position"), False),
        3: ("current_stop_sequence", "uint32", False),
        4: ("current_status", ("enum", VEHICLE_STOP_STATUS), False),
        5: ("timestamp", "uint64", False),
        6: ("congestion_level", ("enum", CONGESTION_LEVEL), False),
        7: ("stop_id", "string", False),
        8: ("vehicle", ("msg", "VehicleDescriptor"), False),
        9: ("occupancy_status", ("enum", OCCUPANCY_STATUS), False),
        10: ("occupancy_percentage", "uint32", False),
    },
    "Position": {
        1: ("latitude", "float", False),
        2: ("longitude", "float", False),
        3: ("bearing", "float", False),
        4: ("odometer", "double", False),
        5: ("speed", "float", False),
    },
    "Alert": {
        1: ("active_period", ("msg", "TimeRange"), True),
        5: ("informed_entity", ("msg", "EntitySelector"), True),
        6: ("cause", ("enum", ALERT_CAUSE), False),
        7: ("effect", ("enum", ALERT_EFFECT), False),
        8: ("url", ("msg", "TranslatedString"), False),
        10: ("header_text", ("msg", "TranslatedString"), False),
        11: ("description_text", ("msg", "TranslatedString"), False),
        12: ("tts_header_text", ("msg", "TranslatedString"), False),
        13: ("tts_description_text", ("msg", "TranslatedString"), False),
        14: ("severity_level", ("enum", ALERT_SEVERITY), False),
    },
    "TimeRange": {
        1: ("start", "uint64", False),
        2: ("end", "uint64", False),
    },
    "EntitySelector": {
        1: ("agency_id", "string", False),
        2: ("route_id", "string", False),
        3: ("route_type", "int32", False),
        4: ("trip", ("msg", "TripDescriptor"), False),
        5: ("stop_id", "string", False),
        6: ("direction_id", "uint32", False),
    },
    "TranslatedString": {
        1: ("translation", ("msg", "Translation"), True),
    },
    "Translation": {
        1: ("text", "string", False),
        2: ("language", "string", False),
    },
}

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "bool"}


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _expected_wire_type(ftype) -> int:
    if isinstance(ftype, tuple):
        return _WT_VARINT if ftype[0] == "enum" else _WT_BYTES
    if ftype in _VARINT_TYPES:
        return _WT_VARINT
    if ftype == "string":
        return _WT_BYTES
    if ftype == "float":
        return _WT_FIXED32
    if ftype == "double":
        return _WT_FIXED64
    raise ValueError(f"unhandled field type {ftype!r}")


def _decode_scalar(ftype, wire_type: int, payload):
    if isinstance(ftype, tuple) and ftype[0] == "enum":
        names = {num: name for name, num in ftype[1].items()}
        # unknown enum numbers stay numeric (json_format raises; being
        # lenient here matches the adapter's skip-bad-data posture)
        return names.get(payload, payload)
    if ftype in ("int32", "int64"):
        return _to_signed64(payload)
    if ftype in ("uint32", "uint64"):
        return payload
    if ftype == "bool":
        return bool(payload)
    if ftype == "string":
        return payload.decode("utf-8")
    if ftype == "float":
        return struct.unpack("<f", payload)[0]
    if ftype == "double":
        return struct.unpack("<d", payload)[0]
    raise ValueError(f"unhandled field type {ftype!r}")


_WT_SGROUP = 3  # proto2 group start (deprecated; never in GTFS-RT)
_WT_EGROUP = 4  # proto2 group end


def _skip_group(data: bytes, pos: int, field_no: int) -> int:
    """Skip a (deprecated) proto2 group field: consume until the matching
    end-group tag. GTFS-RT defines no group fields, so any group is by
    definition an unknown field; the real bindings skip it as unknown
    rather than rejecting the message, and so do we. Nested groups recurse.
    """
    while True:
        if pos >= len(data):
            raise ValueError("truncated group field")
        tag, pos = _read_varint(data, pos)
        inner_no, wire_type = tag >> 3, tag & 0x7
        if wire_type == _WT_EGROUP:
            if inner_no != field_no:
                raise ValueError("mismatched end-group tag")
            return pos
        if wire_type == _WT_VARINT:
            _, pos = _read_varint(data, pos)
        elif wire_type == _WT_FIXED64:
            pos += 8
        elif wire_type == _WT_FIXED32:
            pos += 4
        elif wire_type == _WT_BYTES:
            size, pos = _read_varint(data, pos)
            pos += size
        elif wire_type == _WT_SGROUP:
            pos = _skip_group(data, pos, inner_no)
        else:
            raise ValueError(f"unsupported wire type {wire_type} in group")
        if pos > len(data):
            raise ValueError("truncated group field")


def _merge_decoded(old, new):
    """Proto2 duplicate-field semantics for a non-repeated embedded
    message: occurrences MERGE field-by-field (``MergeFrom``), they are
    not replaced wholesale — singular scalars take the later value,
    singular submessages merge recursively, repeated fields concatenate.
    Decoded dicts mirror the schema (msg → dict, repeated → list), so a
    shape-directed merge is exactly the schema-directed one."""
    if isinstance(old, dict) and isinstance(new, dict):
        merged = dict(old)
        for key, value in new.items():
            merged[key] = _merge_decoded(old[key], value) if key in old else value
        return merged
    if isinstance(old, list) and isinstance(new, list):
        return old + new
    return new


def decode(data: bytes, message: str = "FeedMessage") -> dict:
    """Wire bytes → dict with snake_case keys and enum names (the
    ``MessageToDict(preserving_proto_field_name=True)`` shape)."""
    schema = MESSAGES[message]
    out: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field_no, wire_type = tag >> 3, tag & 0x7
        if wire_type == _WT_SGROUP:
            if field_no in schema:
                # same contract as the other wire types: a KNOWN field on
                # the wrong wire type is a malformed message, not a skip
                raise ValueError(
                    f"{message}.{schema[field_no][0]}: group wire type for "
                    "a non-group field"
                )
            pos = _skip_group(data, pos, field_no)
            continue
        if wire_type == _WT_EGROUP:
            raise ValueError("end-group tag without matching start")
        if wire_type == _WT_VARINT:
            raw, pos = _read_varint(data, pos)
        elif wire_type == _WT_FIXED64:
            raw, pos = data[pos : pos + 8], pos + 8
            if len(raw) != 8:
                raise ValueError("truncated fixed64 field")
        elif wire_type == _WT_FIXED32:
            raw, pos = data[pos : pos + 4], pos + 4
            if len(raw) != 4:
                raise ValueError("truncated fixed32 field")
        elif wire_type == _WT_BYTES:
            size, pos = _read_varint(data, pos)
            raw, pos = data[pos : pos + size], pos + size
            if len(raw) != size:
                # a silently-shortened slice would decode to corrupt
                # partial values (e.g. a cut-off trip_id); the real
                # bindings raise on truncation and so do we
                raise ValueError("truncated length-delimited field")
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        spec = schema.get(field_no)
        if spec is None:
            continue  # unknown field: skip (forward compatibility)
        name, ftype, repeated = spec
        expected_wt = _expected_wire_type(ftype)
        if wire_type != expected_wt:
            # a KNOWN field on the wrong wire type is a malformed message,
            # not a forward-compat skip (the real bindings reject it too)
            raise ValueError(
                f"{message}.{name}: wire type {wire_type}, expected {expected_wt}"
            )
        if isinstance(ftype, tuple) and ftype[0] == "msg":
            value = decode(raw, ftype[1])
        else:
            value = _decode_scalar(ftype, wire_type, raw)
        if repeated:
            out.setdefault(name, []).append(value)
        elif (
            name in out
            and isinstance(ftype, tuple)
            and ftype[0] == "msg"
        ):
            out[name] = _merge_decoded(out[name], value)
        else:
            out[name] = value
    return out


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _encode_field(out: bytearray, field_no: int, ftype, value) -> None:
    if isinstance(ftype, tuple) and ftype[0] == "msg":
        payload = encode(value, ftype[1])
        _write_varint(out, (field_no << 3) | _WT_BYTES)
        _write_varint(out, len(payload))
        out.extend(payload)
        return
    if isinstance(ftype, tuple) and ftype[0] == "enum":
        num = ftype[1].get(value, value) if isinstance(value, str) else value
        if not isinstance(num, int):
            raise ValueError(f"unknown enum value {value!r} for field {field_no}")
        _write_varint(out, (field_no << 3) | _WT_VARINT)
        _write_varint(out, num)
        return
    if ftype in _VARINT_TYPES:
        _write_varint(out, (field_no << 3) | _WT_VARINT)
        _write_varint(out, int(value))
        return
    if ftype == "string":
        payload = value.encode("utf-8")
        _write_varint(out, (field_no << 3) | _WT_BYTES)
        _write_varint(out, len(payload))
        out.extend(payload)
        return
    if ftype == "float":
        _write_varint(out, (field_no << 3) | _WT_FIXED32)
        out.extend(struct.pack("<f", float(value)))
        return
    if ftype == "double":
        _write_varint(out, (field_no << 3) | _WT_FIXED64)
        out.extend(struct.pack("<d", float(value)))
        return
    raise ValueError(f"unhandled field type {ftype!r}")


def encode(message_dict: dict, message: str = "FeedMessage") -> bytes:
    """Dict tree → wire bytes. ``None`` values and unknown keys are
    skipped (≙ ``ParseDict(..., ignore_unknown_fields=True)`` on pruned
    dicts); enums accept names or numbers. Fields emit in field-number
    order — the canonical serialization the real bindings produce."""
    schema = MESSAGES[message]
    out = bytearray()
    for field_no in sorted(schema):
        name, ftype, repeated = schema[field_no]
        if name not in message_dict:
            continue
        value = message_dict[name]
        if value is None:
            continue
        if repeated:
            for item in value:
                if item is not None:
                    _encode_field(out, field_no, ftype, item)
        else:
            _encode_field(out, field_no, ftype, value)
    return bytes(out)
