"""GTFS-RT adapter: spooled FeedEntity JSON → realtime table rows.

Reference: ``adapter/gtfsrt.py`` decodes protobuf ``FeedMessage``s and
flattens entities into flat dicts row-by-row in Python
(gtfsrt.py:109-143 alerts, 169-281 trip updates, 282-311 vehicle
positions). Here the spool carries one FeedEntity per line as JSON (the
shape ``MessageToDict`` produces, so a protobuf ingest edge reduces to the
same format — see streaming/spool.py), and ALL flattening is Catalyst
column expressions over a typed ``from_json`` struct: distributed,
codegen'd, zero Python per row.

Staleness (R2): the reference discards whole messages whose header
timestamp is older than 2 h (gtfsrt.py:32-37,163-168) — a processing-time
comparison, reproduced here as a filter against the batch's processing
time. An event-time watermark is the cluster-scale upgrade but would
change semantics (event-time ordering), so it is offered separately in
``reject_stale(watermark=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One spool line = {"feed_timestamp": long, "entity": FeedEntity-as-JSON}.
# FeedEntity fields follow gtfs-realtime-bindings' MessageToDict naming
# (camelCase preserved from proto JSON would be snake_case here for
# readability; the MQTT spooler normalizes).
_TRIP = T.StructType(
    [
        T.StructField("trip_id", T.StringType()),
        T.StructField("route_id", T.StringType()),
        T.StructField("direction_id", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("start_date", T.StringType()),
        T.StructField("schedule_relationship", T.StringType()),
    ]
)
_VEHICLE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("license_plate", T.StringType()),
        T.StructField("wheelchair_accessible", T.StringType()),
    ]
)
_STU_EVENT = T.StructType(
    [
        T.StructField("time", T.LongType()),
        T.StructField("delay", T.IntegerType()),
        T.StructField("uncertainty", T.IntegerType()),
    ]
)
_TRANSLATION = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("language", T.StringType()),
        ]
    )
)

FEED_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("feed_timestamp", T.LongType()),
        T.StructField(
            "entity",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("is_deleted", T.BooleanType()),
                    T.StructField(
                        "alert",
                        T.StructType(
                            [
                                T.StructField("cause", T.StringType()),
                                T.StructField("effect", T.StringType()),
                                T.StructField("url", T.StringType()),
                                T.StructField("header_text", _TRANSLATION),
                                T.StructField("description_text", _TRANSLATION),
                                T.StructField("tts_header_text", _TRANSLATION),
                                T.StructField("tts_description_text", _TRANSLATION),
                                T.StructField("severity_level", T.StringType()),
                                T.StructField(
                                    "active_period",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("start", T.LongType()),
                                                T.StructField("end", T.LongType()),
                                            ]
                                        )
                                    ),
                                ),
                                T.StructField(
                                    "informed_entity",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("agency_id", T.StringType()),
                                                T.StructField("route_id", T.StringType()),
                                                T.StructField("route_type", T.IntegerType()),
                                                T.StructField("trip", _TRIP),
                                                T.StructField("stop_id", T.StringType()),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                    T.StructField(
                        "trip_update",
                        T.StructType(
                            [
                                T.StructField("trip", _TRIP),
                                T.StructField("vehicle", _VEHICLE),
                                T.StructField("timestamp", T.LongType()),
                                T.StructField(
                                    "stop_time_update",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("stop_sequence", T.IntegerType()),
                                                T.StructField("stop_id", T.StringType()),
                                                T.StructField("arrival", _STU_EVENT),
                                                T.StructField("departure", _STU_EVENT),
                                                T.StructField("schedule_relationship", T.StringType()),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                    T.StructField(
                        "vehicle",
                        T.StructType(
                            [
                                T.StructField("trip", _TRIP),
                                T.StructField("vehicle", _VEHICLE),
                                T.StructField(
                                    "position",
                                    T.StructType(
                                        [
                                            T.StructField("latitude", T.DoubleType()),
                                            T.StructField("longitude", T.DoubleType()),
                                            T.StructField("bearing", T.DoubleType()),
                                            T.StructField("odometer", T.DoubleType()),
                                            T.StructField("speed", T.DoubleType()),
                                        ]
                                    ),
                                ),
                                T.StructField("current_stop_sequence", T.IntegerType()),
                                T.StructField("stop_id", T.StringType()),
                                T.StructField("current_status", T.StringType()),
                                T.StructField("timestamp", T.LongType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def parse_spool_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Typed parse of spool JSON lines; unparseable lines drop out (their
    struct is NULL) the way the reference's try/except skips bad protobufs."""
    parsed = lines.select(
        F.from_json(F.col(value_col), FEED_ENTITY_SCHEMA).alias("m")
    )
    return parsed.select("m.feed_timestamp", "m.entity").where(
        F.col("entity").isNotNull() & F.col("entity.id").isNotNull()
    )


def reject_stale(
    df: DataFrame, max_age_seconds: int = 7200, now: Column | None = None
) -> DataFrame:
    """R2: drop messages whose feed header timestamp lags processing time
    by more than ``max_age_seconds`` (gtfsrt.py:32-37,163-168). Messages
    without a header timestamp pass (the reference only checks when the
    field is present)."""
    now = now if now is not None else F.unix_timestamp(F.current_timestamp())
    return df.where(
        F.col("feed_timestamp").isNull()
        | ((now - F.col("feed_timestamp")) <= max_age_seconds)
    )


def _pick_translation(col: Column) -> Column:
    """Reference translation pick (gtfsrt.py:145-153): first 'de'
    translation, else the first entry, else NULL — as array expressions."""
    de = F.filter(col, lambda tr: tr["language"] == "de")
    # F.get (not [0]) — ANSI mode throws on out-of-bounds array indexes
    return F.coalesce(F.get(de, 0)["text"], F.get(col, 0)["text"])


def _trip_descriptor_cols(trip: Column) -> list[Column]:
    return [
        trip["trip_id"].alias("trip_id"),
        trip["route_id"].alias("trip_route_id"),
        trip["direction_id"].alias("trip_direction_id"),
        trip["start_time"].alias("trip_start_time"),
        trip["start_date"].alias("trip_start_date"),
        trip["schedule_relationship"].alias("trip_schedule_relationship"),
    ]


def _vehicle_descriptor_cols(veh: Column) -> list[Column]:
    return [
        veh["id"].alias("vehicle_id"),
        veh["label"].alias("vehicle_label"),
        veh["license_plate"].alias("vehicle_license_plate"),
        veh["wheelchair_accessible"].alias("vehicle_wheelchair_accessible"),
    ]


def _upserts(df: DataFrame, kind: str) -> DataFrame:
    return df.where(
        F.col(f"entity.{kind}").isNotNull()
        & ~F.coalesce(F.col("entity.is_deleted"), F.lit(False))
    )


def tombstones(df: DataFrame, kind: str) -> DataFrame:
    """R5: entity ids explicitly marked deleted (gtfsrt.py:49-51,193-196,
    259-262) — the delete half of the keyed merge."""
    return (
        df.where(
            F.col(f"entity.{kind}").isNotNull()
            & F.coalesce(F.col("entity.is_deleted"), F.lit(False))
        )
        .select(F.col("entity.id").alias("entity_key"))
        .dropDuplicates(["entity_key"])
    )


def alert_rows(df: DataFrame) -> DataFrame:
    """Parent rows for realtime_service_alerts (gtfsrt.py:109-143)."""
    a = F.col("entity.alert")
    return _upserts(df, "alert").select(
        F.col("entity.id").alias("service_alert_id"),
        a["cause"].alias("cause"),
        a["effect"].alias("effect"),
        a["url"].alias("url"),
        _pick_translation(a["header_text"]).alias("header_text"),
        _pick_translation(a["description_text"]).alias("description_text"),
        _pick_translation(a["tts_header_text"]).alias("tts_header_text"),
        _pick_translation(a["tts_description_text"]).alias("tts_description_text"),
        a["severity_level"].alias("severity_level"),
    )


def alert_active_period_rows(df: DataFrame) -> DataFrame:
    ap = _upserts(df, "alert").select(
        F.col("entity.id").alias("service_alert_id"),
        F.explode_outer(F.col("entity.alert.active_period")).alias("p"),
    )
    return ap.select(
        "service_alert_id",
        F.col("p.start").alias("start_timestamp"),
        F.col("p.end").alias("end_timestamp"),
    ).where(F.col("start_timestamp").isNotNull() | F.col("end_timestamp").isNotNull())


def alert_informed_entity_rows(df: DataFrame) -> DataFrame:
    ie = _upserts(df, "alert").select(
        F.col("entity.id").alias("service_alert_id"),
        F.explode(F.col("entity.alert.informed_entity")).alias("e"),
    )
    return ie.select(
        "service_alert_id",
        F.col("e.agency_id").alias("agency_id"),
        F.col("e.route_id").alias("route_id"),
        F.col("e.route_type").alias("route_type"),
        *_trip_descriptor_cols(F.col("e.trip")),
        F.col("e.stop_id").alias("stop_id"),
    )


def trip_update_rows(df: DataFrame) -> DataFrame:
    tu = F.col("entity.trip_update")
    return _upserts(df, "trip_update").select(
        F.col("entity.id").alias("trip_update_id"),
        *_trip_descriptor_cols(tu["trip"]),
        *_vehicle_descriptor_cols(tu["vehicle"]),
        tu["timestamp"].alias("timestamp"),
    )


def stop_time_update_rows(df: DataFrame) -> DataFrame:
    stu = _upserts(df, "trip_update").select(
        F.col("entity.id").alias("trip_update_id"),
        F.explode(F.col("entity.trip_update.stop_time_update")).alias("u"),
    )
    u = F.col("u")
    return stu.select(
        "trip_update_id",
        u["stop_sequence"].alias("stop_sequence"),
        u["stop_id"].alias("stop_id"),
        u["arrival"]["time"].alias("arrival_time"),
        u["arrival"]["delay"].alias("arrival_delay"),
        u["arrival"]["uncertainty"].alias("arrival_uncertainty"),
        u["departure"]["time"].alias("departure_time"),
        u["departure"]["delay"].alias("departure_delay"),
        u["departure"]["uncertainty"].alias("departure_uncertainty"),
        u["schedule_relationship"].alias("schedule_relationship"),
    )


def vehicle_position_rows(df: DataFrame) -> DataFrame:
    vp = F.col("entity.vehicle")
    return _upserts(df, "vehicle").select(
        F.col("entity.id").alias("vehicle_position_id"),
        *_trip_descriptor_cols(vp["trip"]),
        *_vehicle_descriptor_cols(vp["vehicle"]),
        vp["position"]["latitude"].alias("position_latitude"),
        vp["position"]["longitude"].alias("position_longitude"),
        vp["position"]["bearing"].alias("position_bearing"),
        vp["position"]["odometer"].alias("position_odometer"),
        vp["position"]["speed"].alias("position_speed"),
        vp["current_stop_sequence"].alias("current_stop_sequence"),
        vp["stop_id"].alias("stop_id"),
        vp["current_status"].alias("current_status"),
        vp["timestamp"].alias("timestamp"),
    )
