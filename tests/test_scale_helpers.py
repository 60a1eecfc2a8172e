"""Scale-path helpers: bucketed co-located joins and salted holistic aggs.

These verify the SHAPE of the physical plan, not just values — at 100 TB
the plan is the product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based joins so Exchange presence/absence is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    from py_gtfs_duckdb_spark.lake import GtfsLake

    lake = GtfsLake(spark, str(tmp_path / "lake"))
    trips = spark.createDataFrame(
        [(f"t{i}", f"r{i % 7}", f"s{i % 3}") for i in range(500)],
        "trip_id string, route_id string, service_id string",
    )
    stop_times = spark.createDataFrame(
        [(f"t{i % 500}", j, f"stop{j}") for i in range(2000) for j in range(3)],
        "trip_id string, stop_sequence int, stop_id string",
    )
    lake.write("trips", trips)
    lake.write("stop_times", stop_times)
    lake.write_bucketed("trips", keys=["trip_id"], num_buckets=8)
    lake.write_bucketed("stop_times", keys=["trip_id"], num_buckets=8)

    bt = lake.bucketed_table("trips")
    bs = lake.bucketed_table("stop_times")
    joined = bt.join(bs, "trip_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # same join over the unbucketed lake tables DOES shuffle
    plain = lake.table("trips").join(lake.table("stop_times"), "trip_id")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan
    # and values are identical (lake.write dedups stop_times on its
    # (trip_id, stop_sequence) PK: 500 trips x 3 sequences survive)
    assert joined.count() == plain.count() == 1500


def test_salted_collect_list_matches_plain(spark):
    from py_gtfs_duckdb_spark.functions import salted_collect_list

    # Heavy skew: one key holds 90% of rows.
    rows = [("hot", f"v{i:04d}") for i in range(900)] + [
        (f"k{i % 10}", f"w{i:03d}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        r["k"]: r["vs"]
        for r in salted_collect_list(df, "k", "v", n_salt=8).collect()
    }
    want = {
        r["k"]: r["vs"]
        for r in df.groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
        .collect()
    }
    assert got == want
    assert len(got["hot"]) == 900


def test_salted_collect_list_spreads_hot_key(spark):
    """Phase-1 output must contain multiple rows for the hot key — the
    skew actually spreads across reducers."""
    from py_gtfs_duckdb_spark.functions import salted_collect_list  # noqa: F401

    df = spark.createDataFrame(
        [("hot", f"v{i}") for i in range(200)], "k string, v string"
    )
    salt = F.pmod(F.xxhash64(F.col("v")), F.lit(8))
    n_partials = (
        df.select("k", salt.alias("__salt")).distinct().count()
    )
    assert n_partials > 1
