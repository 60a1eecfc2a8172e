"""Property-based round-trip fuzz of the vendored GTFS-RT wire codec:
for any schema-conforming FeedMessage dict, decode(encode(x)) == x.
Catches asymmetric field-number/wire-type bugs the example tests miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from py_gtfs_duckdb_spark.streaming import gtfsrt_wire

# Generators aligned with proto2 ranges. Text avoids surrogates (invalid
# UTF-8); uint64 full range; int32 signed range.
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
_uint64 = st.integers(min_value=0, max_value=2**64 - 1)
_uint32 = st.integers(min_value=0, max_value=2**32 - 1)
_int32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def _enum(names):
    return st.sampled_from(sorted(names))


def _opt(**fields):
    """Struct with every field optional — mirrors proto2 presence."""
    return st.fixed_dictionaries({}, optional=fields)


_trip = _opt(
    trip_id=_text,
    start_time=_text,
    start_date=_text,
    schedule_relationship=_enum(gtfsrt_wire.TRIP_SCHEDULE_RELATIONSHIP),
    route_id=_text,
    direction_id=_uint32,
)
_vehicle_desc = _opt(
    id=_text,
    label=_text,
    license_plate=_text,
    wheelchair_accessible=_enum(gtfsrt_wire.WHEELCHAIR_ACCESSIBLE),
)
_stu_event = _opt(delay=_int32, time=_int64, uncertainty=_int32)
_stu = _opt(
    stop_sequence=_uint32,
    arrival=_stu_event,
    departure=_stu_event,
    stop_id=_text,
    schedule_relationship=_enum(gtfsrt_wire.STU_SCHEDULE_RELATIONSHIP),
)
_trip_update = _opt(
    trip=_trip,
    stop_time_update=st.lists(_stu, max_size=4),
    vehicle=_vehicle_desc,
    timestamp=_uint64,
    delay=_int32,
)
_translated = _opt(
    translation=st.lists(_opt(text=_text, language=_text), max_size=3)
)
_alert = _opt(
    active_period=st.lists(_opt(start=_uint64, end=_uint64), max_size=3),
    informed_entity=st.lists(
        _opt(
            agency_id=_text,
            route_id=_text,
            route_type=_int32,
            trip=_trip,
            stop_id=_text,
            direction_id=_uint32,
        ),
        max_size=3,
    ),
    cause=_enum(gtfsrt_wire.ALERT_CAUSE),
    effect=_enum(gtfsrt_wire.ALERT_EFFECT),
    url=_translated,
    header_text=_translated,
    description_text=_translated,
    tts_header_text=_translated,
    tts_description_text=_translated,
    severity_level=_enum(gtfsrt_wire.ALERT_SEVERITY),
)
_entity = _opt(
    id=_text,
    is_deleted=st.booleans(),
    trip_update=_trip_update,
    alert=_alert,
)
_feed = _opt(
    header=_opt(
        gtfs_realtime_version=_text,
        incrementality=_enum(gtfsrt_wire.INCREMENTALITY),
        timestamp=_uint64,
    ),
    entity=st.lists(_entity, max_size=4),
)


def _strip_empty(v):
    """Empty repeated fields don't exist on the wire (nothing emitted), so
    the round-trip drops them — normalize before comparing."""
    if isinstance(v, dict):
        return {
            k: _strip_empty(x)
            for k, x in v.items()
            if not (isinstance(x, list) and not x)
        }
    if isinstance(v, list):
        return [_strip_empty(x) for x in v]
    return v


@settings(max_examples=300, deadline=None)
@given(_feed)
def test_feed_roundtrip(feed):
    data = gtfsrt_wire.encode(feed, "FeedMessage")
    assert gtfsrt_wire.decode(data, "FeedMessage") == _strip_empty(feed)


@settings(max_examples=300, deadline=None)
@given(
    st.fixed_dictionaries(
        {},
        optional={
            "latitude": st.floats(width=32, allow_nan=False),
            "longitude": st.floats(width=32, allow_nan=False),
            "bearing": st.floats(width=32, allow_nan=False),
            "odometer": st.floats(allow_nan=False),
            "speed": st.floats(width=32, allow_nan=False),
        },
    )
)
def test_position_roundtrip(pos):
    back = gtfsrt_wire.decode(gtfsrt_wire.encode(pos, "Position"), "Position")
    assert back == pos  # float32 fields generated at float32 width: exact
