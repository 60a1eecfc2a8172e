"""cascade_clean vs a DuckDB oracle running the reference's literal DELETEs.

The oracle executes the exact nine statements from the reference's
``_remove_dependent_objects`` (ddb.py:336-348) on identical data; the lake
runs :meth:`GtfsLake.cascade_clean`. Survivor sets must match, including
the gnarly corners:

- stops with location_type NULL / '2' / '3' / '4' are never deleted
  (the reference's predicates are scoped to '0'/''/'1'; NULL ⇒ UNKNOWN);
- the station DELETE's parent_station subquery reads ALL remaining stops,
  and a single NULL parent_station makes NOT IN never-TRUE ⇒ no deletes;
- transfers die when EITHER side (from_/to_ × route/trip) is orphaned;
- partial-column writes are schema-conformed (missing cols → NULL).
"""

from __future__ import annotations

import duckdb
import pytest

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.schemas import ALL_SCHEMAS

REFERENCE_DELETES = [
    "DELETE FROM routes WHERE agency_id NOT IN (SELECT agency_id FROM agency)",
    "DELETE FROM trips WHERE route_id NOT IN (SELECT route_id FROM routes)",
    "DELETE FROM stop_times WHERE trip_id NOT IN (SELECT trip_id FROM trips)",
    "DELETE FROM stops WHERE (location_type = '0' OR location_type = '') "
    "AND stop_id NOT IN (SELECT stop_id FROM stop_times)",
    "DELETE FROM stops WHERE location_type = '1' "
    "AND stop_id NOT IN (SELECT parent_station FROM stops)",
    "DELETE FROM shapes WHERE shape_id NOT IN (SELECT shape_id FROM trips)",
    "DELETE FROM transfers WHERE from_route_id NOT IN (SELECT route_id FROM routes) "
    "OR to_route_id NOT IN (SELECT route_id FROM routes)",
    "DELETE FROM transfers WHERE from_trip_id NOT IN (SELECT trip_id FROM trips) "
    "OR to_trip_id NOT IN (SELECT trip_id FROM trips)",
    "DELETE FROM calendar WHERE service_id NOT IN (SELECT service_id FROM trips)",
    "DELETE FROM calendar_dates WHERE service_id NOT IN (SELECT service_id FROM trips)",
]

# Partial-column row dicts per table; everything else NULL-filled.
DATA = {
    "agency": [
        {"agency_id": "a1", "agency_name": "A1"},
    ],
    "routes": [
        {"route_id": "r1", "agency_id": "a1"},
        {"route_id": "r_orphan", "agency_id": "zz"},  # cascades away
    ],
    "trips": [
        {"route_id": "r1", "service_id": "s1", "trip_id": "t1", "shape_id": "sh1"},
        {"route_id": "r_orphan", "service_id": "s2", "trip_id": "t_dead"},
    ],
    "stop_times": [
        {"trip_id": "t1", "stop_id": "plat1", "stop_sequence": 1},
        {"trip_id": "t_dead", "stop_id": "plat_dead", "stop_sequence": 1},
    ],
    "stops": [
        {"stop_id": "plat1", "location_type": "0", "parent_station": "stn1"},
        {"stop_id": "plat_empty", "location_type": "", "parent_station": None},
        {"stop_id": "plat_dead", "location_type": "0", "parent_station": None},
        {"stop_id": "stn1", "location_type": "1", "parent_station": None},
        {"stop_id": "stn_empty", "location_type": "1", "parent_station": None},
        {"stop_id": "entrance", "location_type": "2", "parent_station": "stn1"},
        {"stop_id": "node", "location_type": "3", "parent_station": "stn1"},
        {"stop_id": "untyped", "location_type": None, "parent_station": None},
    ],
    "shapes": [
        {"shape_id": "sh1", "shape_pt_sequence": 1},
        {"shape_id": "sh_dead", "shape_pt_sequence": 1},
    ],
    "transfers": [
        # survives: all four sides resolve (or are NULL → NOT IN UNKNOWN)
        {"from_route_id": "r1", "to_route_id": "r1", "transfer_type": "0"},
        # to_route orphaned -> deleted (the bug ADVICE flagged)
        {"from_route_id": "r1", "to_route_id": "r_orphan", "transfer_type": "0"},
        # from side fine, to_trip orphaned -> deleted
        {"from_trip_id": "t1", "to_trip_id": "t_dead", "transfer_type": "0"},
        # NULL route/trip ids: every NOT IN term UNKNOWN -> survives
        {"transfer_type": "1"},
    ],
    "calendar": [
        {"service_id": "s1", "monday": "1", "start_date": "20250101", "end_date": "20251231"},
        {"service_id": "s2", "monday": "0", "start_date": "20250101", "end_date": "20251231"},
    ],
    "calendar_dates": [
        {"service_id": "s1", "date": "20250704", "exception_type": "2"},
        {"service_id": "s2", "date": "20250704", "exception_type": "2"},
    ],
}

KEYS = {
    "routes": "route_id",
    "trips": "trip_id",
    "stops": "stop_id",
    "shapes": "shape_id",
    "calendar": "service_id",
    "calendar_dates": "service_id",
}


def _full_rows(table: str) -> list[dict]:
    fields = [f.name for f in ALL_SCHEMAS[table].fields]
    return [{f: row.get(f) for f in fields} for row in DATA[table]]


@pytest.fixture()
def oracle():
    con = duckdb.connect()
    for table in DATA:
        fields = [f.name for f in ALL_SCHEMAS[table].fields]
        cols = ", ".join(f'"{f}" VARCHAR' for f in fields)
        con.execute(f"CREATE TABLE {table} ({cols})")
        for row in _full_rows(table):
            ph = ", ".join("?" for _ in fields)
            con.execute(
                f"INSERT INTO {table} VALUES ({ph})",
                [None if row[f] is None else str(row[f]) for f in fields],
            )
    for stmt in REFERENCE_DELETES:
        con.execute(stmt)
    yield con
    con.close()


def test_cascade_matches_reference_deletes(spark, tmp_path, oracle):
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    for table in DATA:
        fields = [f.name for f in ALL_SCHEMAS[table].fields]
        rows = [tuple(str(r[f]) if r[f] is not None else None for f in fields)
                for r in _full_rows(table)]
        df = spark.createDataFrame(rows, ", ".join(f"{f} string" for f in fields))
        lake.write(table, df, dedup_pk=False)
    lake.cascade_clean()
    for table, key in KEYS.items():
        got = {r[key] for r in lake.table(table).collect()}
        want = {r[0] for r in oracle.execute(f'SELECT "{key}" FROM {table}').fetchall()}
        assert got == want, f"{table}: spark={got} oracle={want}"
    got_tr = {
        tuple(r)
        for r in lake.table("transfers")
        .select("from_route_id", "to_route_id", "from_trip_id", "to_trip_id", "transfer_type")
        .collect()
    }
    want_tr = {
        tuple(r)
        for r in oracle.execute(
            "SELECT from_route_id, to_route_id, from_trip_id, to_trip_id, transfer_type FROM transfers"
        ).fetchall()
    }
    assert got_tr == want_tr


def test_write_conforms_partial_columns(spark, tmp_path):
    """Writing a frame with a column subset must NULL-fill the rest so
    downstream cascade logic can reference any schema column (verify-found
    regression: cascade_clean crashed on trips written without shape_id)."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    trips = spark.createDataFrame(
        [("r1", "s1", "t1")], "route_id string, service_id string, trip_id string"
    )
    lake.write("trips", trips)
    df = lake.table("trips")
    assert "shape_id" in df.columns
    assert df.where(df.shape_id.isNull()).count() == 1
    # extra columns are dropped, reference fixed-DDL style
    stops = spark.createDataFrame([("x", "junk")], "stop_id string, bogus string")
    lake.write("stops", stops)
    assert "bogus" not in lake.table("stops").columns


def test_upsert_partial_columns_full_row_replace(spark, tmp_path):
    """upsert with a column-subset frame = delete-then-insert of the FULL
    row (ddb.py:296-332): unspecified columns become NULL, not an arity
    error (second verify-found regression)."""
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    full = spark.createDataFrame(
        [("s1", "Old Name", "zoneA")], "stop_id string, stop_name string, zone_id string"
    )
    lake.write("stops", full)
    lake.upsert(
        "stops",
        spark.createDataFrame([("s1", "New Name")], "stop_id string, stop_name string"),
        keys=["stop_id"],
    )
    row = lake.table("stops").collect()[0]
    assert row["stop_name"] == "New Name"
    assert row["zone_id"] is None  # full-row replace, not column patch
