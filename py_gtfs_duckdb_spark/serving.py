"""Serving-edge sinks: GTFS-RT FeedMessage trees, JSON, RSS, HTML monitor
(SURVEY §2.1 S10-S12).

The reference assembles these per HTTP request with O(parents×children)
row loops over Polars frames (realtime.py:325-379,627-705 — §4 X6). Here
the parent↔child stitching is ONE Spark plan per feed — groupBy parent key
+ ``collect_list(struct(...))`` — and only the finished entity rows cross
to the driver, where the (cheap, edge-local) dict/XML/HTML rendering
happens. Protobuf binary output needs ``gtfs-realtime-bindings`` (absent
in this container) and is gated behind import-try; the dict tree it would
serialize is exactly what :func:`feed_message` returns.

NULL-field pruning (P11): the reference drops None fields when building
descriptors (realtime.py:739-791); ``_prune`` reproduces that on the
collected rows.
"""

from __future__ import annotations

import datetime as dt
import html
import json
import math
import time
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake

# O4 sentinel (realtime.py:711-714): alerts with no active period sort last.
_NO_PERIOD_SENTINEL = 999_999_999_999_999_999


def _prune(obj):
    """Drop None/empty fields recursively (realtime.py:739-791)."""
    if isinstance(obj, dict):
        out = {k: _prune(v) for k, v in obj.items()}
        return {k: v for k, v in out.items() if v not in (None, {}, [])}
    if isinstance(obj, list):
        return [_prune(v) for v in obj]
    return obj


def _trip_descriptor(row) -> dict:
    return {
        "trip_id": row["trip_id"],
        "route_id": row["trip_route_id"],
        "direction_id": row["trip_direction_id"],
        "start_time": row["trip_start_time"],
        "start_date": row["trip_start_date"],
        "schedule_relationship": row["trip_schedule_relationship"],
    }


def _vehicle_descriptor(row) -> dict:
    return {
        "id": row["vehicle_id"],
        "label": row["vehicle_label"],
        "license_plate": row["vehicle_license_plate"],
        "wheelchair_accessible": row["vehicle_wheelchair_accessible"],
    }


# -- set-based parent+children snapshots ------------------------------------


def alerts_with_children(lake: GtfsLake) -> DataFrame:
    """Alerts + nested periods/entities in one plan (replaces the
    per-alert child filters at realtime.py:677-683), sorted by earliest
    active-period start DESC with the no-period sentinel (O4,
    realtime.py:707-724)."""
    alerts = lake.table("realtime_service_alerts")
    periods = (
        lake.table("realtime_alert_active_periods")
        .groupBy("service_alert_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("start_timestamp", "end_timestamp"))
            ).alias("active_periods"),
            F.min("start_timestamp").alias("earliest_start"),
        )
    )
    entities = (
        lake.table("realtime_alert_informed_entities")
        .groupBy("service_alert_id")
        .agg(
            F.collect_list(
                F.struct(
                    "agency_id", "route_id", "route_type", "stop_id",
                    "trip_id", "trip_route_id", "trip_direction_id",
                    "trip_start_time", "trip_start_date",
                    "trip_schedule_relationship",
                )
            ).alias("informed_entities")
        )
    )
    return (
        alerts.join(periods, "service_alert_id", "left")
        .join(entities, "service_alert_id", "left")
        .withColumn(
            "sort_key",
            F.coalesce(F.col("earliest_start"), F.lit(_NO_PERIOD_SENTINEL)),
        )
        .orderBy(F.desc("sort_key"))
    )


def trip_updates_with_children(lake: GtfsLake) -> DataFrame:
    """Trip updates + ordered stop-time updates in one plan (replaces the
    per-trip child filter at realtime.py:340), sorted by the
    ``start_date-start_time`` composite (O3, realtime.py:383-384)."""
    parents = lake.table("realtime_trip_updates")
    children = (
        lake.table("realtime_trip_stop_time_updates")
        .groupBy("trip_update_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "stop_sequence", "stop_id",
                        "arrival_time", "arrival_delay", "arrival_uncertainty",
                        "departure_time", "departure_delay",
                        "departure_uncertainty", "schedule_relationship",
                    )
                )
            ).alias("stop_time_updates")
        )
    )
    return (
        parents.join(children, "trip_update_id", "left")
        .orderBy(F.concat_ws("-", "trip_start_date", "trip_start_time"))
    )


# -- FeedMessage dict trees (realtime.py:726-737) ---------------------------


def _feed_header(timestamp: int | None = None) -> dict:
    return {
        "gtfs_realtime_version": "2.0",
        "incrementality": "FULL_DATASET",
        "timestamp": int(timestamp if timestamp is not None else math.floor(time.time())),
    }


def feed_message_alerts(lake: GtfsLake, timestamp: int | None = None) -> dict:
    entities = []
    for row in alerts_with_children(lake).collect():
        # translations carry language 'de-DE' and url is a TranslatedString,
        # matching the reference serializer exactly (realtime.py:636-672)
        def _ts(text):
            return {"translation": [{"text": text, "language": "de-DE"}]}

        alert = {
            "cause": row["cause"],
            "effect": row["effect"],
            "url": _ts(row["url"]) if row["url"] is not None else None,
            "header_text": _ts(row["header_text"]),
            "description_text": _ts(row["description_text"]),
            "tts_header_text": _ts(row["tts_header_text"])
            if row["tts_header_text"]
            else None,
            "tts_description_text": _ts(row["tts_description_text"])
            if row["tts_description_text"]
            else None,
            "severity_level": row["severity_level"],
            "active_period": [
                {"start": p["start_timestamp"], "end": p["end_timestamp"]}
                for p in (row["active_periods"] or [])
            ],
            "informed_entity": [
                _prune(
                    {
                        "agency_id": e["agency_id"],
                        "route_id": e["route_id"],
                        "route_type": e["route_type"],
                        "stop_id": e["stop_id"],
                        "trip": _trip_descriptor(e),
                    }
                )
                for e in (row["informed_entities"] or [])
            ],
        }
        entities.append(
            _prune({"id": row["service_alert_id"], "alert": alert})
        )
    return {"header": _feed_header(timestamp), "entity": entities}


def feed_message_trip_updates(lake: GtfsLake, timestamp: int | None = None) -> dict:
    entities = []
    for row in trip_updates_with_children(lake).collect():
        stus = [
            _prune(
                {
                    "stop_sequence": u["stop_sequence"],
                    "stop_id": u["stop_id"],
                    "arrival": {
                        "time": u["arrival_time"],
                        "delay": u["arrival_delay"],
                        "uncertainty": u["arrival_uncertainty"],
                    },
                    "departure": {
                        "time": u["departure_time"],
                        "delay": u["departure_delay"],
                        "uncertainty": u["departure_uncertainty"],
                    },
                    "schedule_relationship": u["schedule_relationship"],
                }
            )
            for u in (row["stop_time_updates"] or [])
        ]
        entities.append(
            _prune(
                {
                    "id": row["trip_update_id"],
                    "trip_update": {
                        "trip": _trip_descriptor(row),
                        "vehicle": _vehicle_descriptor(row),
                        "timestamp": row["timestamp"],
                        "stop_time_update": stus,
                    },
                }
            )
        )
    return {"header": _feed_header(timestamp), "entity": entities}


def feed_message_vehicle_positions(lake: GtfsLake, timestamp: int | None = None) -> dict:
    entities = []
    for row in lake.table("realtime_vehicle_positions").collect():
        entities.append(
            _prune(
                {
                    "id": row["vehicle_position_id"],
                    "vehicle": {
                        "trip": _trip_descriptor(row),
                        "vehicle": _vehicle_descriptor(row),
                        "position": {
                            "latitude": row["position_latitude"],
                            "longitude": row["position_longitude"],
                            "bearing": row["position_bearing"],
                            "odometer": row["position_odometer"],
                            "speed": row["position_speed"],
                        },
                        "current_stop_sequence": row["current_stop_sequence"],
                        "stop_id": row["stop_id"],
                        "current_status": row["current_status"],
                        "timestamp": row["timestamp"],
                    },
                }
            )
        )
    return {"header": _feed_header(timestamp), "entity": entities}


# -- output formats ---------------------------------------------------------


def to_json(feed: dict) -> str:
    """S10 JSON face (realtime.py:293 json.dumps)."""
    return json.dumps(feed)


def to_protobuf(feed: dict) -> bytes:
    """S10 binary face: dict tree → FeedMessage wire bytes via the
    vendored GTFS-RT codec (realtime.py:293-303 ``ParseDict`` +
    ``SerializeToString``, minus the external bindings dependency)."""
    from py_gtfs_duckdb_spark.streaming import gtfsrt_wire

    return gtfsrt_wire.encode(feed, "FeedMessage")


def _cdata(text: str) -> str:
    """CDATA framing for RSS description bodies, wire-compatible with the
    reference (realtime.py:603 wraps descriptions in ``<![CDATA[...]]>``;
    dict2xml.py:80-94 emits them as lxml CDATA nodes). A literal ``]]>``
    inside the body would close the section early, so it is split across
    two sections — the standard escape the reference's lxml path does not
    handle (lxml raises on it)."""
    return "<![CDATA[" + text.replace("]]>", "]]]]><![CDATA[>") + "]]>"


def alerts_rss(lake: GtfsLake, base_url: str = "") -> str:
    """S11: service alerts as RSS 2.0 (realtime.py:560-621 + dict2xml.py).
    pubDate = earliest active-period start, RFC822-formatted (F9,
    realtime.py:590-592); description bodies are CDATA-framed like the
    reference, the remaining fields use stdlib escaping."""
    items = []
    for row in alerts_with_children(lake).collect():
        earliest = row["earliest_start"]
        pub = (
            dt.datetime.fromtimestamp(earliest, tz=dt.timezone.utc).strftime(
                "%a, %d %b %Y %H:%M:%S %z"
            )
            if earliest is not None
            else ""
        )
        items.append(
            "<item>"
            f"<guid>{escape(row['service_alert_id'] or '')}</guid>"
            f"<title>{escape(row['header_text'] or '')}</title>"
            f"<description>{_cdata(row['description_text'] or '')}</description>"
            f"<pubDate>{escape(pub)}</pubDate>"
            "</item>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<rss version="2.0"><channel>'
        f"<title>Service Alerts</title><link>{escape(base_url)}</link>"
        "<description>GTFS-RT service alerts</description>"
        + "".join(items)
        + "</channel></rss>"
    )


def monitor_html(lake: GtfsLake, operation_day: dt.date) -> str:
    """S12: the HTML monitor (realtime.py:483-558): alert list + trip table
    with a red/green realtime flag."""
    from py_gtfs_duckdb_spark.queries import GtfsQueries

    q = GtfsQueries(lake)
    alert_rows = "".join(
        f"<li><b>{html.escape(r['header_text'] or '')}</b>: "
        f"{html.escape(r['description_text'] or '')}</li>"
        for r in q.fetch_realtime_monitor_alerts().collect()
    )
    trip_cells = []
    for r in q.fetch_realtime_operation_day_monitor_trips(operation_day).collect():
        color = "green" if r["realtime_available"] else "red"
        trip_cells.append(
            "<tr>"
            f"<td>{html.escape(r['route_short_name'] or '')}</td>"
            f"<td>{html.escape(r['trip_id'] or '')}</td>"
            f"<td>{html.escape(r['trip_headsign'] or '')}</td>"
            f"<td>{html.escape(r['start_stop_name'] or '')}</td>"
            f"<td>{html.escape(r['start_time'] or '')}</td>"
            f'<td style="color:{color}">●</td>'
            "</tr>"
        )
    return (
        "<html><body>"
        f"<h1>Monitor {operation_day.strftime('%Y%m%d')}</h1>"
        f"<h2>Alerts</h2><ul>{alert_rows}</ul>"
        "<h2>Trips</h2><table>"
        "<tr><th>Route</th><th>Trip</th><th>Headsign</th>"
        "<th>First stop</th><th>Departure</th><th>RT</th></tr>"
        + "".join(trip_cells)
        + "</table></body></html>"
    )
