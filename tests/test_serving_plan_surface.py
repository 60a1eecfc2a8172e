"""Plan-shape sweep for the PUBLIC NON-BATTERY surface: the GTFS query
API (queries.GtfsQueries.fetch_*), the serving feed builders
(serving.alerts_with_children / trip_updates_with_children), and the CLI
audit plan (operators.pipeline.audit_scorecard).

These plans are pytest-correct elsewhere, but until this sweep no guard
would catch a regression that adds an unbounded window or a nested-loop
join to them (VERDICT r8/r9 ask). Same contract as the battery sweeps:

- every plan is window-free unless its partition keys are recorded here
  with a boundedness argument (currently: the whole surface is
  window-free — parent/child nesting is collect_list aggregation, order
  is a global sort, not a window);
- no plan degenerates to CartesianProduct / BroadcastNestedLoopJoin;
- the dimension sides the docstrings promise to broadcast do broadcast.

The registries below carry an EXHAUSTIVENESS check: a new public
DataFrame-returning callable on GtfsQueries or serving that is not
registered here fails the sweep until it is added — the property that
makes this a guard instead of a snapshot.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import inspect
import io
import json
import time

import pytest
from pyspark.sql import DataFrame

from py_gtfs_duckdb_spark import serving
from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.queries import GtfsQueries
from py_gtfs_duckdb_spark.sources.gtfs import project_to_schema
from py_gtfs_duckdb_spark.streaming import RealtimeMerger, reset_realtime
from tests.test_window_allowlist import window_partition_keys

OPD = dt.date(2025, 6, 4)  # Wednesday — see tests/test_gtfs_queries.py
NOW = int(time.time())

# Window-partition allowlist for the serving surface: EMPTY — every plan
# here must be window-free. Parent+child nesting is a combinable
# collect_list aggregation, ordering is a global Sort (TakeOrdered /
# range-partitioned sort, splittable), calendar resolution is
# union/distinct/subtract. If a future fetch_* genuinely needs a window,
# record its key tuple here WITH the boundedness argument, exactly like
# plans.WINDOW_PARTITION_ALLOWLIST.
SERVING_WINDOW_ALLOWLIST: dict[str, set[tuple[str, ...]]] = {}


@pytest.fixture()
def lake(spark, tmp_path):
    lk = GtfsLake(spark, str(tmp_path / "glake"))

    def put(table, rows, cols):
        lk.write(table, project_to_schema(spark.createDataFrame(rows, cols), table))

    put(
        "agency",
        [("a1", "Agency One", "http://example.invalid", "UTC")],
        "agency_id string, agency_name string, agency_url string, agency_timezone string",
    )
    put(
        "calendar",
        [("s_week", 1, 1, 1, 1, 1, 0, 0, 20250101, 20251231)],
        "service_id string, monday int, tuesday int, wednesday int, thursday int,"
        "friday int, saturday int, sunday int, start_date int, end_date int",
    )
    put(
        "calendar_dates",
        [("s_extra", 20250604, 1)],
        "service_id string, date int, exception_type int",
    )
    put(
        "routes",
        [("a1", "r1", "R1", 3)],
        "agency_id string, route_id string, route_short_name string, route_type int",
    )
    put(
        "trips",
        [("r1", "s_week", "t_week", "Downtown", "0")],
        "route_id string, service_id string, trip_id string, trip_headsign string,"
        "direction_id string",
    )
    put(
        "stop_times",
        [("t_week", "08:00:00", "08:01:00", "st1", 1)],
        "trip_id string, arrival_time string, departure_time string, stop_id string,"
        "stop_sequence int",
    )
    put(
        "stops",
        [("st1", "Main St", 48.1, 9.1)],
        "stop_id string, stop_name string, stop_lat double, stop_lon double",
    )
    reset_realtime(lk)
    # one alert + one trip update so the realtime child tables carry the
    # real ingested schema (plan shape is data-independent, but the sweep
    # should run over tables produced by the actual merge path)
    messages = [
        {
            "feed_timestamp": NOW,
            "entity": {
                "id": "al1",
                "alert": {
                    "cause": "STRIKE",
                    "effect": "NO_SERVICE",
                    "header_text": [{"text": "Alert", "language": "de"}],
                    "description_text": [{"text": "Details", "language": "de"}],
                    "active_period": [{"start": NOW - 50, "end": NOW + 950}],
                    "informed_entity": [{"route_id": "r1"}],
                },
            },
        },
        {
            "feed_timestamp": NOW,
            "entity": {
                "id": "tu1",
                "trip_update": {
                    "trip": {"trip_id": "t_week", "route_id": "r1",
                             "start_time": "08:01:00", "start_date": "20250604"},
                    "timestamp": NOW,
                    "stop_time_update": [
                        {"stop_sequence": 1, "stop_id": "st1",
                         "arrival": {"time": NOW, "delay": 120}},
                    ],
                },
            },
        },
    ]
    RealtimeMerger(lk).process_batch(
        spark.createDataFrame([(json.dumps(m),) for m in messages], "value string")
    )
    return lk


def _fmt(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _surface(lake, spark, tmp_path) -> dict[str, DataFrame]:
    """name -> plan for every public DataFrame-returning callable on the
    serving surface. Keep in sync with the exhaustiveness tests below."""
    q = GtfsQueries(lake)
    sql_file = tmp_path / "probe.sql"
    sql_file.write_text(
        "SELECT t.trip_id, s.stop_id FROM trips t "
        "JOIN stop_times s ON s.trip_id = t.trip_id"
    )
    docs = spark.createDataFrame(
        [(f"d{i}", "the quick brown fox jumps over the lazy dog " * 3,
          "web", f"2024-01-0{i % 9 + 1}")
         for i in range(12)],
        "doc_id string, text string, source string, date string",
    )
    from py_gtfs_duckdb_spark.operators.pipeline import audit_scorecard

    return {
        "GtfsQueries.fetch_agencies": q.fetch_agencies(),
        "GtfsQueries.fetch_nominal_stops": q.fetch_nominal_stops(),
        "GtfsQueries.fetch_nominal_routes": q.fetch_nominal_routes(),
        "GtfsQueries.active_service_ids": q.active_service_ids(OPD),
        "GtfsQueries.fetch_nominal_operation_day_trips.first":
            q.fetch_nominal_operation_day_trips(OPD),
        "GtfsQueries.fetch_nominal_operation_day_trips.full":
            q.fetch_nominal_operation_day_trips(OPD, full_trips=True),
        "GtfsQueries.fetch_realtime_monitor_alerts":
            q.fetch_realtime_monitor_alerts(),
        "GtfsQueries.fetch_realtime_operation_day_monitor_trips":
            q.fetch_realtime_operation_day_monitor_trips(OPD),
        "GtfsQueries.execute_sql_file":
            q.execute_sql_file(str(sql_file), tables=["trips", "stop_times"]),
        "serving.alerts_with_children": serving.alerts_with_children(lake),
        "serving.trip_updates_with_children":
            serving.trip_updates_with_children(lake),
        "pipeline.audit_scorecard": audit_scorecard(docs),
    }


def test_gtfs_queries_surface_is_exhaustive(lake):
    """Every public DataFrame-returning method on GtfsQueries must be in
    the sweep registry — adding a fetch_* without sweeping it fails."""
    covered = {
        "fetch_agencies", "fetch_nominal_stops", "fetch_nominal_routes",
        "active_service_ids", "fetch_nominal_operation_day_trips",
        "fetch_realtime_monitor_alerts",
        "fetch_realtime_operation_day_monitor_trips", "execute_sql_file",
    }
    public = {
        name
        for name, fn in inspect.getmembers(GtfsQueries, inspect.isfunction)
        if not name.startswith("_")
    }
    assert public == covered, (
        f"GtfsQueries surface drifted: new={sorted(public - covered)} "
        f"gone={sorted(covered - public)} — update the sweep registry"
    )


def test_serving_module_surface_is_exhaustive():
    """Every public module-level function in serving that returns a
    DataFrame (by annotation) must be in the sweep registry."""
    covered = {"alerts_with_children", "trip_updates_with_children"}
    public = {
        name
        for name, fn in inspect.getmembers(serving, inspect.isfunction)
        if not name.startswith("_")
        and getattr(fn, "__module__", "") == serving.__name__
        and inspect.signature(fn).return_annotation
        in ("DataFrame", DataFrame)
    }
    assert public == covered, (
        f"serving surface drifted: new={sorted(public - covered)} "
        f"gone={sorted(covered - public)} — update the sweep registry"
    )


def test_serving_surface_windows_and_joins(lake, spark, tmp_path):
    """The sweep itself: window-free (or allowlisted) and no degenerate
    join anywhere on the public serving/GTFS/CLI-audit surface."""
    for name, df in _surface(lake, spark, tmp_path).items():
        plan = _fmt(df)
        specs = window_partition_keys(plan)
        allowed = SERVING_WINDOW_ALLOWLIST.get(name, set())
        extra = specs - allowed
        assert not extra, (
            f"{name}: window partition keys {sorted(extra)} — the serving "
            "surface is window-free by contract; justify any new window "
            "in SERVING_WINDOW_ALLOWLIST"
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_monitor_and_flagship_broadcast_dimensions(lake):
    """The plans' own docstrings promise broadcasts: the flagship
    semi-joins the broadcast service-id set; the monitor join broadcasts
    routes and stops. Pin it."""
    q = GtfsQueries(lake)
    flagship = _fmt(q.fetch_nominal_operation_day_trips(OPD))
    assert "BroadcastHashJoin" in flagship
    monitor = _fmt(q.fetch_realtime_operation_day_monitor_trips(OPD))
    assert monitor.count("BroadcastHashJoin") >= 3  # service_ids, routes, stops
