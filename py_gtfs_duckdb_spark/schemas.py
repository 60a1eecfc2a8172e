"""GTFS table catalog: Spark ``StructType`` schemas for the 10 static and 6
realtime tables the reference declares as DuckDB DDL
(``/root/reference/src/gtfsduckdb/ddbdef.py:1-260``), re-expressed per the
SURVEY §1.3 type mapping: TEXT→string, INTEGER→int (long for epoch
seconds), FLOAT→double, TIMESTAMP→timestamp.

Modeling decisions carried over from the reference (SURVEY §1.2):
- dates are INTEGER ``YYYYMMDD`` (calendar.start_date etc.);
- times-of-day are STRING ``HH:MM:SS`` (>24h values legal in GTFS —
  lexicographic order is relied on, never parse to timestamps);
- epoch timestamps in realtime tables are LONG seconds;
- ``last_updated_timestamp`` (DDL ``DEFAULT current_timestamp``) is added
  at write time by the lake/streaming merge, not stored as a default.

Primary keys are declared here for dedup-on-load + validation jobs (Spark
does not enforce PKs — SURVEY §7 hard part 3).
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPES = {
    "s": T.StringType(),
    "i": T.IntegerType(),
    "l": T.LongType(),
    "d": T.DoubleType(),
    "ts": T.TimestampType(),
}


def _schema(spec: list[tuple[str, str, bool]]) -> T.StructType:
    return T.StructType(
        [T.StructField(name, _TYPES[ty], nullable) for name, ty, nullable in spec]
    )


# --- static GTFS tables (ddbdef.py:2-157) ----------------------------------

STATIC_SCHEMAS: dict[str, T.StructType] = {
    "agency": _schema(
        [
            ("agency_id", "s", False),
            ("agency_name", "s", False),
            ("agency_url", "s", False),
            ("agency_timezone", "s", False),
            ("agency_lang", "s", True),
            ("agency_phone", "s", True),
            ("agency_fare_url", "s", True),
            ("agency_email", "s", True),
        ]
    ),
    "calendar_dates": _schema(
        [
            ("service_id", "s", False),
            ("date", "i", False),
            ("exception_type", "i", False),
        ]
    ),
    "calendar": _schema(
        [
            ("service_id", "s", False),
            ("monday", "i", False),
            ("tuesday", "i", False),
            ("wednesday", "i", False),
            ("thursday", "i", False),
            ("friday", "i", False),
            ("saturday", "i", False),
            ("sunday", "i", False),
            ("start_date", "i", False),
            ("end_date", "i", False),
        ]
    ),
    "feed_info": _schema(
        [
            ("feed_publisher_name", "s", False),
            ("feed_publisher_url", "s", False),
            ("feed_lang", "s", False),
            ("default_lang", "s", True),
            ("feed_start_date", "i", True),
            ("feed_end_date", "i", True),
            ("feed_version", "s", True),
            ("feed_contact_email", "s", True),
            ("feed_contact_url", "s", True),
        ]
    ),
    "routes": _schema(
        [
            ("agency_id", "s", False),
            ("route_id", "s", True),
            ("route_short_name", "s", True),
            ("route_long_name", "s", True),
            ("route_desc", "s", True),
            ("route_type", "i", False),
            ("route_url", "s", True),
            ("route_color", "s", True),
            ("route_text_color", "s", True),
            ("route_sort_order", "i", True),
            ("continuous_pickup", "i", True),
            ("continuous_drop_off", "i", True),
            ("network_id", "s", True),
        ]
    ),
    "shapes": _schema(
        [
            ("shape_id", "s", False),
            ("shape_pt_lat", "d", False),
            ("shape_pt_lon", "d", False),
            ("shape_pt_sequence", "i", False),
            ("shape_dist_traveled", "d", True),
        ]
    ),
    "stop_times": _schema(
        [
            ("trip_id", "s", False),
            ("arrival_time", "s", True),
            ("departure_time", "s", True),
            ("stop_id", "s", True),
            ("location_group_id", "s", True),
            ("location_id", "s", True),
            ("stop_sequence", "i", False),
            ("stop_headsign", "s", True),
            ("start_pickup_drop_off_window", "s", True),
            ("end_pickup_drop_off_window", "s", True),
            ("pickup_type", "s", True),
            ("drop_off_type", "s", True),
            ("continuous_pickup", "i", True),
            ("continuous_drop_off", "i", True),
            ("shape_dist_traveled", "s", True),
            ("timepoint", "i", True),
            ("pickup_booking_rule_id", "i", True),
            ("drop_off_booking_rule_id", "i", True),
        ]
    ),
    "stops": _schema(
        [
            ("stop_id", "s", False),
            ("stop_code", "s", True),
            ("stop_name", "s", True),
            ("tts_stop_name", "s", True),
            ("stop_desc", "s", True),
            ("stop_lat", "d", True),
            ("stop_lon", "d", True),
            ("zone_id", "s", True),
            ("stop_url", "s", True),
            ("location_type", "s", True),
            ("parent_station", "s", True),
            ("stop_timezone", "s", True),
            ("wheelchair_boarding", "s", True),
            ("level_id", "s", True),
            ("platform_code", "s", True),
        ]
    ),
    "transfers": _schema(
        [
            ("from_stop_id", "s", True),
            ("to_stop_id", "s", True),
            ("from_route_id", "s", True),
            ("to_route_id", "s", True),
            ("from_trip_id", "s", True),
            ("to_trip_id", "s", True),
            ("transfer_type", "s", False),
            ("min_transfer_time", "s", True),
        ]
    ),
    "trips": _schema(
        [
            ("route_id", "s", False),
            ("service_id", "s", False),
            ("trip_id", "s", False),
            ("trip_headsign", "s", True),
            ("trip_short_name", "s", True),
            ("direction_id", "s", True),
            ("block_id", "s", True),
            ("shape_id", "s", True),
            ("wheelchair_accessible", "s", True),
            ("bikes_allowed", "s", True),
        ]
    ),
}

# --- realtime state tables (ddbdef.py:158-259) -----------------------------

_TRIP_DESCRIPTOR = [
    ("trip_id", "s", True),
    ("trip_route_id", "s", True),
    ("trip_direction_id", "s", True),
    ("trip_start_time", "s", True),
    ("trip_start_date", "s", True),
    ("trip_schedule_relationship", "s", True),
]
_VEHICLE_DESCRIPTOR = [
    ("vehicle_id", "s", True),
    ("vehicle_label", "s", True),
    ("vehicle_license_plate", "s", True),
    ("vehicle_wheelchair_accessible", "s", True),
]
_LAST_UPDATED = [("last_updated_timestamp", "ts", True)]

REALTIME_SCHEMAS: dict[str, T.StructType] = {
    "realtime_vehicle_positions": _schema(
        [("vehicle_position_id", "s", True)]
        + _TRIP_DESCRIPTOR
        + _VEHICLE_DESCRIPTOR
        + [
            ("position_latitude", "d", False),
            ("position_longitude", "d", False),
            ("position_bearing", "d", True),
            ("position_odometer", "d", True),
            ("position_speed", "d", True),
            ("current_stop_sequence", "i", True),
            ("stop_id", "s", True),
            ("current_status", "s", True),
            ("timestamp", "l", True),
        ]
        + _LAST_UPDATED
    ),
    "realtime_trip_updates": _schema(
        [("trip_update_id", "s", False)]
        + _TRIP_DESCRIPTOR
        + _VEHICLE_DESCRIPTOR
        + [("timestamp", "l", True)]
        + _LAST_UPDATED
    ),
    "realtime_trip_stop_time_updates": _schema(
        [
            ("trip_update_id", "s", False),
            ("stop_sequence", "i", True),
            ("stop_id", "s", True),
            ("arrival_time", "l", True),
            ("arrival_delay", "i", True),
            ("arrival_uncertainty", "i", True),
            ("departure_time", "l", True),
            ("departure_delay", "i", True),
            ("departure_uncertainty", "i", True),
            ("schedule_relationship", "s", True),
        ]
        + _LAST_UPDATED
    ),
    "realtime_service_alerts": _schema(
        [
            ("service_alert_id", "s", False),
            ("cause", "s", True),
            ("effect", "s", True),
            ("url", "s", True),
            ("header_text", "s", False),
            ("description_text", "s", False),
            ("tts_header_text", "s", True),
            ("tts_description_text", "s", True),
            ("severity_level", "s", True),
        ]
        + _LAST_UPDATED
    ),
    "realtime_alert_active_periods": _schema(
        [
            ("service_alert_id", "s", False),
            ("start_timestamp", "l", True),
            ("end_timestamp", "l", True),
        ]
        + _LAST_UPDATED
    ),
    "realtime_alert_informed_entities": _schema(
        [
            ("service_alert_id", "s", False),
            ("agency_id", "s", True),
            ("route_id", "s", True),
            ("route_type", "i", True),
        ]
        + _TRIP_DESCRIPTOR
        + [("stop_id", "s", True)]
        + _LAST_UPDATED
    ),
}

ALL_SCHEMAS: dict[str, T.StructType] = {**STATIC_SCHEMAS, **REALTIME_SCHEMAS}

# Primary keys (ddbdef.py PRIMARY KEY clauses) — dedup keys on load and the
# upsert keys for the streaming merge.
PRIMARY_KEYS: dict[str, list[str]] = {
    "agency": ["agency_id"],
    "calendar_dates": ["service_id", "date"],
    "calendar": ["service_id"],
    "routes": ["route_id"],
    "stop_times": ["trip_id", "stop_id", "stop_sequence"],
    "stops": ["stop_id"],
    "trips": ["trip_id"],
}

# Entity keys for realtime keyed upsert (ddb.py:296-332 delete-then-insert
# groups). Parent key column per table; children share the parent's key.
REALTIME_ENTITY_KEYS: dict[str, str] = {
    "realtime_service_alerts": "service_alert_id",
    "realtime_alert_active_periods": "service_alert_id",
    "realtime_alert_informed_entities": "service_alert_id",
    "realtime_trip_updates": "trip_update_id",
    "realtime_trip_stop_time_updates": "trip_update_id",
    "realtime_vehicle_positions": "vehicle_position_id",
}

STATIC_TABLES = tuple(STATIC_SCHEMAS)
REALTIME_TABLES = tuple(REALTIME_SCHEMAS)
