"""Structured Streaming surface: GTFS-RT ingest → keyed-upsert state → snapshot.

Replaces the reference's hand-rolled micro-batch stack (MQTT push →
in-memory queues → 15 s RepeatedTimer flush → DuckDB DML;
realtime.py:42,120,160-199 + ddb.py:282-332) with the engine-native
equivalent: a spool-directory streaming source → ``foreachBatch`` set-based
merge with TTL + tombstones → versioned snapshot tables (SURVEY §2.8
R1-R9).
"""

from py_gtfs_duckdb_spark.streaming.gtfsrt import (
    FEED_ENTITY_SCHEMA,
    alert_rows,
    alert_active_period_rows,
    alert_informed_entity_rows,
    parse_spool_lines,
    reject_stale,
    stop_time_update_rows,
    trip_update_rows,
    vehicle_position_rows,
)
from py_gtfs_duckdb_spark.streaming.merge import (
    RealtimeMerger,
    reset_realtime,
    run_spool_stream,
)
from py_gtfs_duckdb_spark.streaming.spool import MqttSpooler, spool_write_json

__all__ = [
    "FEED_ENTITY_SCHEMA",
    "alert_rows",
    "alert_active_period_rows",
    "alert_informed_entity_rows",
    "parse_spool_lines",
    "reject_stale",
    "stop_time_update_rows",
    "trip_update_rows",
    "vehicle_position_rows",
    "RealtimeMerger",
    "reset_realtime",
    "run_spool_stream",
    "MqttSpooler",
    "spool_write_json",
]
