"""GTFS static ETL: ZIP/CSV load with header projection, export round-trip,
cascade deletes, merge upsert (SURVEY §5 test plan items 2-3)."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.schemas import STATIC_SCHEMAS
from py_gtfs_duckdb_spark.sources import (
    export_static,
    export_static_zip,
    load_static_dir,
    load_static_zip,
)
from py_gtfs_duckdb_spark.sources.gtfs import dedup_report
from py_gtfs_duckdb_spark.sources.mapping import map_id_column

FEED = {
    # extra_col must be dropped (header projection, ddb.py:362-368);
    # agency_url missing -> NULL column.
    "agency.txt": (
        "agency_id,agency_name,extra_col\n"
        "a1,Agency One,x\n"
        "a2,Agency Two,y\n"
        "a2,Agency Two Dup,z\n"  # PK dup -> deduped on load
    ),
    "routes.txt": (
        "route_id,agency_id,route_short_name,route_type\n"
        "r1,a1,R1,3\n"
        "r2,a2,R2,3\n"
        "r3,zz,R3,3\n"  # orphan agency -> cascade removes
    ),
    "trips.txt": (
        "route_id,service_id,trip_id\n"
        "r1,s1,t1\n"
        "r2,s1,t2\n"
        "r3,s2,t3\n"
    ),
    "stop_times.txt": (
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence\n"
        "t1,08:00:00,08:00:00,st1,1\n"
        "t1,25:30:00,25:31:00,st2,2\n"  # >24h GTFS time stays TEXT
        "t2,09:00:00,09:00:00,st1,1\n"
        "t3,10:00:00,10:00:00,st3,1\n"
    ),
    "stops.txt": (
        "stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station\n"
        "st1,Stop 1,48.1,9.1,0,hub\n"
        "st2,Stop 2,48.2,9.2,,\n"
        "st3,Stop 3,48.3,9.3,0,\n"
        "hub,Hub,48.1,9.1,1,\n"
        "ghost,Ghost,0.0,0.0,0,\n"  # unreferenced platform -> cascade removes
    ),
    "calendar.txt": (
        "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,"
        "start_date,end_date\n"
        "s1,1,1,1,1,1,0,0,20250101,20251231\n"
        "s2,0,0,0,0,0,1,1,20250101,20251231\n"
    ),
    "ignored_file.csv": "not,a,gtfs\nmember,x,y\n",
}


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    for name, content in FEED.items():
        (d / name).write_text(content)
    return str(d)


@pytest.fixture()
def lake(spark, tmp_path):
    return GtfsLake(spark, str(tmp_path / "lake"))


def test_load_dir_projection_types_and_pk(lake, feed_dir):
    loaded = load_static_dir(lake, feed_dir)
    assert "agency" in loaded and "ignored_file" not in loaded
    agency = lake.table("agency")
    assert agency.columns == [f.name for f in STATIC_SCHEMAS["agency"].fields]
    assert agency.count() == 2  # PK dedup collapsed the a2 duplicate
    assert agency.where(F.col("agency_url").isNotNull()).count() == 0
    st = lake.table("stop_times")
    assert dict(st.dtypes)["stop_sequence"] == "int"
    assert dict(st.dtypes)["departure_time"] == "string"  # >24h text contract
    assert st.where(F.col("departure_time") == "25:31:00").count() == 1


def test_zip_roundtrip_is_fixpoint(lake, feed_dir, spark, tmp_path):
    zip1 = str(tmp_path / "feed.zip")
    with zipfile.ZipFile(zip1, "w") as zf:
        for name in FEED:
            zf.write(os.path.join(feed_dir, name), arcname=name)
    load_static_zip(lake, zip1)
    assert dedup_report(lake)["agency"] == 0

    # export -> re-load -> identical contents (SURVEY §5 item 3)
    zip2 = str(tmp_path / "export.zip")
    export_static_zip(lake, zip2)
    lake2 = GtfsLake(spark, str(tmp_path / "lake2"))
    load_static_zip(lake2, zip2)
    for table in ("agency", "routes", "trips", "stop_times", "stops", "calendar"):
        a = {tuple(r) for r in lake.table(table).collect()}
        b = {tuple(r) for r in lake2.table(table).collect()}
        assert a == b, table


def test_export_dir_single_file_per_table(lake, feed_dir, tmp_path):
    load_static_dir(lake, feed_dir)
    out = str(tmp_path / "out")
    written = export_static(lake, out)
    for table in written:
        assert os.path.isfile(os.path.join(out, f"{table}.txt"))


def test_cascade_clean_closure(lake, feed_dir):
    load_static_dir(lake, feed_dir)
    lake.cascade_clean()
    # r3 survives (agency zz is gone only if removed; cascade starts from
    # agency table as-is: a1, a2 exist, zz does not -> r3 deleted).
    assert {r["route_id"] for r in lake.table("routes").collect()} == {"r1", "r2"}
    assert {r["trip_id"] for r in lake.table("trips").collect()} == {"t1", "t2"}
    assert lake.table("stop_times").where(F.col("trip_id") == "t3").count() == 0
    stops = {r["stop_id"] for r in lake.table("stops").collect()}
    assert "ghost" not in stops  # unreferenced platform removed
    assert "hub" in stops  # station kept: child platform st1 survives
    assert "st3" not in stops  # its only trip t3 is gone
    # calendar: s2 only served t3 -> removed
    assert {r["service_id"] for r in lake.table("calendar").collect()} == {"s1"}


def test_remove_pattern_like(lake, feed_dir):
    load_static_dir(lake, feed_dir)
    lake.remove_pattern("a1%")
    assert {r["agency_id"] for r in lake.table("agency").collect()} == {"a2"}
    assert {r["route_id"] for r in lake.table("routes").collect()} == {"r2"}


def test_merge_upsert_stops(lake, feed_dir, spark):
    load_static_dir(lake, feed_dir)
    updates = spark.createDataFrame(
        [("st1", "Stop 1 Renamed"), ("stNEW", "Brand New")],
        "stop_id string, stop_name string",
    )
    from py_gtfs_duckdb_spark.sources.gtfs import project_to_schema

    lake.upsert("stops", project_to_schema(updates, "stops"), keys=["stop_id"])
    stops = {r["stop_id"]: r["stop_name"] for r in lake.table("stops").collect()}
    assert stops["st1"] == "Stop 1 Renamed"
    assert stops["stNEW"] == "Brand New"
    assert stops["st2"] == "Stop 2"  # untouched rows survive


def test_map_id_column_first_match_wins(spark):
    df = spark.createDataFrame(
        [("de:08111:1",), ("de:08222:9",), ("other",)], "id string"
    )
    mapping = [("de:08111:.*", "stuttgart"), ("de:.*", "bw"), ("de:08111:1", "never")]
    out = {
        r["id"]: r["mapped"]
        for r in df.select(
            "id", map_id_column(F.col("id"), mapping).alias("mapped")
        ).collect()
    }
    assert out == {"de:08111:1": "stuttgart", "de:08222:9": "bw", "other": "other"}
