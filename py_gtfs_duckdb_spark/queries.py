"""User-facing GTFS query API — the reference's ``GtfsDuckDB`` fetch surface
(ddb.py:133-258) over a :class:`~py_gtfs_duckdb_spark.lake.GtfsLake`.

Each method is ONE declarative DataFrame plan. Where the reference
materializes the resolved service-id list into Python and re-embeds it as an
IN-list (ddb.py:187-196 — a plan barrier that becomes a giant literal list
at scale, SURVEY §4 X2), these plans keep the id set as a semi-join so
Catalyst sees the whole query and broadcasts the (small) id set itself.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake


class GtfsQueries:
    def __init__(self, lake: GtfsLake):
        self.lake = lake

    # -- plain scans (ddb.py:133-135,171-175) -------------------------------

    def fetch_agencies(self) -> DataFrame:
        return self.lake.table("agency")

    def fetch_nominal_stops(self) -> DataFrame:
        return self.lake.table("stops")

    def fetch_nominal_routes(self) -> DataFrame:
        return self.lake.table("routes")

    # -- calendar resolution (ddb.py:179-196) --------------------------------

    def active_service_ids(self, operation_day: dt.date) -> DataFrame:
        """Service ids running on ``operation_day``:
        (calendar window+weekday matches ∪ calendar_dates additions)
        ∖ calendar_dates removals — U1 with DuckDB relational semantics
        (``union`` = ALL, ``except_`` = set EXCEPT ⇒ distinct-union then
        subtract, SURVEY §7 hard part 5)."""
        opd = int(operation_day.strftime("%Y%m%d"))
        dayname = operation_day.strftime("%A").lower()
        calendar = self.lake.table("calendar")
        calendar_dates = self.lake.table("calendar_dates")
        ids = calendar.where(
            (F.col("start_date") <= opd)
            & (F.col("end_date") >= opd)
            & (F.col(dayname) == 1)
        ).select("service_id")
        added = calendar_dates.where(
            (F.col("date") == opd) & (F.col("exception_type") == 1)
        ).select("service_id")
        removed = calendar_dates.where(
            (F.col("date") == opd) & (F.col("exception_type") == 2)
        ).select("service_id")
        return ids.union(added).distinct().subtract(removed)

    # -- the flagship query (ddb.py:177-202) ---------------------------------

    def fetch_nominal_operation_day_trips(
        self, operation_day: dt.date, full_trips: bool = False
    ) -> DataFrame:
        """Trips (with their stop_times) running on the operation day;
        ``full_trips=False`` keeps only each trip's first stop
        (``stop_sequence = 1``, ddb.py:199-200). Ordered by
        (trip_id, stop_sequence) (ddb.py:202)."""
        service_ids = self.active_service_ids(operation_day)
        trips = self.lake.table("trips")
        stop_times = self.lake.table("stop_times")
        if not full_trips:
            stop_times = stop_times.where(F.col("stop_sequence") == 1)
        return (
            trips.join(F.broadcast(service_ids), "service_id", "left_semi")
            .join(stop_times, "trip_id")
            .orderBy("trip_id", "stop_sequence")
        )

    # -- realtime monitor surface (ddb.py:204-258) ----------------------------

    def fetch_realtime_monitor_alerts(self) -> DataFrame:
        return self.lake.table("realtime_service_alerts").select(
            "service_alert_id", "cause", "effect", "header_text", "description_text"
        )

    def fetch_realtime_operation_day_monitor_trips(
        self, operation_day: dt.date
    ) -> DataFrame:
        """The 5-table monitor join (J2 + P3, ddb.py:233-258): active trips
        ⋈ routes ⋈ first stop_times ⟕ realtime_trip_updates ⋈ stops, with
        the derived ``realtime_available`` flag, ordered by the TEXT
        departure time (lexicographic, >24h safe — O2).

        routes/stops are dimension-sized → broadcast; the left join against
        the realtime state is on trip_id. The reference materializes this
        per HTTP request; here it is a plan the caller can cache or
        snapshot."""
        opd = operation_day.strftime("%Y%m%d")
        service_ids = self.active_service_ids(operation_day)
        trips = self.lake.table("trips").alias("trips")
        routes = self.lake.table("routes").alias("routes")
        stops = self.lake.table("stops").alias("stops")
        stop_times = (
            self.lake.table("stop_times")
            .where(F.col("stop_sequence") == 1)
            .alias("stop_times")
        )
        rt = self.lake.table("realtime_trip_updates").alias("rt")
        return (
            trips.join(F.broadcast(service_ids), "service_id", "left_semi")
            .join(F.broadcast(routes), F.col("routes.route_id") == F.col("trips.route_id"))
            .join(stop_times, F.col("stop_times.trip_id") == F.col("trips.trip_id"))
            .join(rt, F.col("rt.trip_id") == F.col("trips.trip_id"), "left")
            .join(F.broadcast(stops), F.col("stops.stop_id") == F.col("stop_times.stop_id"))
            .select(
                F.lit(opd).alias("operation_day"),
                F.col("routes.agency_id").alias("agency_id"),
                F.col("trips.route_id").alias("route_id"),
                F.col("routes.route_short_name").alias("route_short_name"),
                F.col("trips.trip_id").alias("trip_id"),
                F.col("trips.trip_headsign").alias("trip_headsign"),
                F.col("trips.direction_id").alias("direction_id"),
                F.col("stop_times.stop_id").alias("start_stop_id"),
                F.col("stops.stop_name").alias("start_stop_name"),
                F.col("stop_times.departure_time").alias("start_time"),
                F.col("rt.trip_id").isNotNull().alias("realtime_available"),
                F.col("rt.last_updated_timestamp").alias("realtime_last_update"),
            )
            .orderBy("start_time")
        )

    # -- SQL passthrough (ddb.py:260-264) -------------------------------------

    def execute_sql_file(self, path: str, tables: list[str] | None = None) -> DataFrame:
        """≙ ``execute_sql`` (ddb.py:260-264): register current table
        versions as temp views, run the file's Spark SQL."""
        from py_gtfs_duckdb_spark.schemas import ALL_SCHEMAS

        for table in tables or list(ALL_SCHEMAS):
            if self.lake.exists(table):
                self.lake.table(table).createOrReplaceTempView(table)
        with open(path) as fh:
            return self.lake.spark.sql(fh.read())
