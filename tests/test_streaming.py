"""Streaming semantics (SURVEY §5 item 4): scripted FeedEntity sequences
through the foreachBatch merge — upsert, update, tombstone, stale message,
TTL expiry — asserting state table contents per micro-batch
(reference semantics: ddb.py:282-332, adapter/gtfsrt.py:32-37,49-51)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.streaming import (
    RealtimeMerger,
    reset_realtime,
    run_spool_stream,
    spool_write_json,
)

NOW = int(time.time())


def alert(eid, header="Alert!", deleted=False, ts=NOW):
    ent = {"id": eid, "is_deleted": deleted}
    if not deleted:
        ent["alert"] = {
            "cause": "CONSTRUCTION",
            "effect": "DETOUR",
            "header_text": [{"text": header, "language": "de"}],
            "description_text": [{"text": "desc", "language": "en"}],
            "active_period": [{"start": ts - 100, "end": ts + 100}],
            "informed_entity": [{"route_id": "r1"}],
        }
    return {"feed_timestamp": ts, "entity": ent}


def trip_update(eid, delay=60, deleted=False, ts=NOW):
    ent = {"id": eid, "is_deleted": deleted}
    if not deleted:
        ent["trip_update"] = {
            "trip": {"trip_id": eid, "route_id": "r1", "start_time": "08:00:00",
                     "start_date": "20250101"},
            "timestamp": ts,
            "stop_time_update": [
                {"stop_sequence": 1, "stop_id": "st1",
                 "arrival": {"time": ts, "delay": delay},
                 "departure": {"time": ts + 30, "delay": delay}},
                {"stop_sequence": 2, "stop_id": "st2",
                 "arrival": {"time": ts + 600, "delay": delay}},
            ],
        }
    return {"feed_timestamp": ts, "entity": ent}


def vehicle(eid, lat=48.7, ts=NOW):
    return {
        "feed_timestamp": ts,
        "entity": {
            "id": eid,
            "vehicle": {
                "trip": {"trip_id": "t1", "route_id": "r1"},
                "vehicle": {"id": f"bus-{eid}", "label": "Bus"},
                "position": {"latitude": lat, "longitude": 9.1, "speed": 12.5},
                "current_stop_sequence": 1,
                "current_status": "IN_TRANSIT_TO",
                "timestamp": ts,
            },
        },
    }


@pytest.fixture()
def lake(spark, tmp_path):
    lk = GtfsLake(spark, str(tmp_path / "rt_lake"))
    reset_realtime(lk)
    return lk


@pytest.fixture()
def merger(lake):
    return RealtimeMerger(lake)


def batch(spark, messages):
    import json

    return spark.createDataFrame([(json.dumps(m),) for m in messages], "value string")


def test_upsert_then_update_latest_wins(spark, lake, merger):
    merger.process_batch(batch(spark, [trip_update("tu1", delay=60, ts=NOW - 10),
                                       trip_update("tu1", delay=120, ts=NOW)]))
    tu = lake.table("realtime_trip_updates").collect()
    assert len(tu) == 1  # newest per key wins within the batch (R4)
    stus = lake.table("realtime_trip_stop_time_updates").collect()
    assert len(stus) == 2
    assert {r["arrival_delay"] for r in stus} == {120}

    # second micro-batch replaces parent + children wholesale
    merger.process_batch(batch(spark, [trip_update("tu1", delay=300)]))
    stus = lake.table("realtime_trip_stop_time_updates").collect()
    assert len(stus) == 2
    assert {r["arrival_delay"] for r in stus} == {300}


def test_tombstone_removes_parent_and_children(spark, lake, merger):
    merger.process_batch(batch(spark, [alert("al1"), alert("al2")]))
    assert lake.table("realtime_service_alerts").count() == 2
    assert lake.table("realtime_alert_active_periods").count() == 2
    merger.process_batch(batch(spark, [alert("al1", deleted=True)]))
    alerts = lake.table("realtime_service_alerts").collect()
    assert [r["service_alert_id"] for r in alerts] == ["al2"]
    assert lake.table("realtime_alert_active_periods").count() == 1
    assert lake.table("realtime_alert_informed_entities").count() == 1


def test_translation_pick_de_else_first(spark, lake, merger):
    merger.process_batch(batch(spark, [alert("al1", header="Umleitung")]))
    row = lake.table("realtime_service_alerts").first()
    assert row["header_text"] == "Umleitung"  # de picked
    assert row["description_text"] == "desc"  # no de -> first


def test_stale_message_rejected(spark, lake, merger):
    stale_ts = NOW - 3 * 3600  # older than the 2h cutoff (gtfsrt.py:32-37)
    merger.process_batch(batch(spark, [alert("old", ts=stale_ts), alert("new")]))
    alerts = [r["service_alert_id"] for r in lake.table("realtime_service_alerts").collect()]
    assert alerts == ["new"]


def test_ttl_expires_trips_not_alerts(spark, lake):
    merger = RealtimeMerger(lake, ttl_seconds=3600)
    merger.process_batch(batch(spark, [trip_update("tu1"), alert("al1"), vehicle("v1")]))
    # age the stamps beyond the TTL (alerts exempt, ddb.py:287-288)
    for table in ("realtime_trip_updates", "realtime_trip_stop_time_updates",
                  "realtime_vehicle_positions", "realtime_service_alerts"):
        aged = lake.table(table).withColumn(
            "last_updated_timestamp",
            F.col("last_updated_timestamp") - F.expr("INTERVAL 2 HOURS"),
        )
        lake.write(table, aged, dedup_pk=False)
    merger.process_batch(batch(spark, []))
    assert lake.table("realtime_trip_updates").count() == 0
    assert lake.table("realtime_trip_stop_time_updates").count() == 0
    assert lake.table("realtime_vehicle_positions").count() == 0
    assert lake.table("realtime_service_alerts").count() == 1  # exempt


def test_vehicle_position_flatten(spark, lake, merger):
    merger.process_batch(batch(spark, [vehicle("v1", lat=48.77)]))
    row = lake.table("realtime_vehicle_positions").first()
    assert row["vehicle_position_id"] == "v1"
    assert row["position_latitude"] == 48.77
    assert row["vehicle_id"] == "bus-v1"
    assert row["current_status"] == "IN_TRANSIT_TO"


def test_spool_stream_end_to_end(spark, lake, tmp_path):
    """R1: actual Structured Streaming micro-batch run over the spool dir
    (availableNow drains and stops)."""
    spool = str(tmp_path / "spool")
    # distinct feed timestamps: batch order is defined by the feed header
    # timestamp, not file arrival (a distributed batch has no arrival order)
    spool_write_json(spool, [trip_update("tu1", ts=NOW - 5), alert("al1")])
    spool_write_json(spool, [trip_update("tu1", delay=999), vehicle("v1")])
    q = run_spool_stream(
        spark, lake, spool,
        available_now=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert lake.table("realtime_trip_updates").count() == 1
    stus = lake.table("realtime_trip_stop_time_updates").collect()
    assert {r["arrival_delay"] for r in stus} == {999}
    assert lake.table("realtime_service_alerts").count() == 1
    assert lake.table("realtime_vehicle_positions").count() == 1


def test_reset_realtime_clears_state(spark, lake, merger):
    merger.process_batch(batch(spark, [alert("al1")]))
    reset_realtime(lake)
    assert lake.table("realtime_service_alerts").count() == 0


def test_stateful_latest_per_key_stream(spark, tmp_path):
    """applyInPandasWithState path: last-writer-wins keyed state across
    micro-batches; state survives between batches within the run."""
    import json as _json

    from py_gtfs_duckdb_spark.streaming.stateful import latest_per_key_stream

    spool = tmp_path / "sspool"
    spool.mkdir()
    rows1 = [
        {"key": "k1", "payload": "v1@t1", "ts": 100},
        {"key": "k1", "payload": "v1@t2", "ts": 200},
        {"key": "k2", "payload": "v2@t1", "ts": 150},
    ]
    (spool / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    # second file: older message for k1 must NOT displace newer state
    rows2 = [
        {"key": "k1", "payload": "stale", "ts": 50},
        {"key": "k3", "payload": "v3", "ts": 10},
    ]
    (spool / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))

    stream = spark.readStream.schema("key string, payload string, ts long").json(
        str(spool)
    )
    out = latest_per_key_stream(stream, ttl_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("latest_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT key, last(payload) AS payload, last(ts) AS ts FROM latest_state "
        "GROUP BY key"
    ).collect()
    state = {r["key"]: (r["payload"], r["ts"]) for r in rows}
    assert state["k1"] == ("v1@t2", 200)  # newest wins, stale update ignored
    assert state["k2"] == ("v2@t1", 150)
    assert state["k3"] == ("v3", 10)


def test_spool_clean_source_deletes_processed_files(spark, lake, tmp_path):
    """Spool retention: processed spool files are deleted by the file
    source's cleaner, so a long-running ingest doesn't accumulate files."""
    import os
    import time as _t

    spool = str(tmp_path / "spool")
    first = spool_write_json(spool, [trip_update("tu1")])
    first_name = os.path.basename(first)

    # a counting merger isolates the janitor from merge latency (the file
    # source cleans a completed file when it constructs the NEXT batch)
    class CountingMerger:
        batches = 0

        def process_batch(self, df, batch_id=None):
            df.count()
            CountingMerger.batches += 1

    q = run_spool_stream(
        spark, lake, spool,
        merger=CountingMerger(),
        processing_interval="1 second",
        checkpoint_dir=str(tmp_path / "ckpt"),
        clean_source="delete",
    )
    try:
        deadline = _t.time() + 60
        while _t.time() < deadline and CountingMerger.batches == 0:
            _t.sleep(0.5)
        assert CountingMerger.batches > 0, "first batch never ran"
        spool_write_json(spool, [trip_update("tu2")])
        deadline = _t.time() + 90
        while _t.time() < deadline and first_name in os.listdir(spool):
            _t.sleep(0.5)
        assert first_name not in os.listdir(spool), "processed spool file not cleaned"
    finally:
        q.stop()


def test_merger_cache_empty_between_micro_batches(spark, lake, merger):
    """Per-batch persist scope on the realtime merge path: `latest` (and
    anything else the batch registered) is released when process_batch
    returns, so the CacheManager is empty between micro-batches."""

    def cache_empty() -> bool:
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )

    spark.catalog.clearCache()
    merger.process_batch(batch(spark, [trip_update("tu1"), alert("al1")]))
    assert cache_empty()
    merger.process_batch(batch(spark, [vehicle("v1"), alert("al1", deleted=True)]))
    assert cache_empty()


def test_stateful_funnel_stream(spark, tmp_path):
    """applyInPandasWithState funnel: per-user stage machine across
    micro-batches — advances are monotone, in-batch events replay in
    event-time order, cross-batch stragglers are ignored, and the
    conversion window gates a too-late step."""
    import json as _json

    from py_gtfs_duckdb_spark.streaming.stateful import funnel_stream

    spool = tmp_path / "fspool"
    spool.mkdir()
    # batch 1 (file order != event order inside the batch: replay sorts):
    #   u1 reaches signup@100 then click@200 (arrives first in file)
    #   u2 signup@100 only
    rows1 = [
        {"user_id": "u1", "event_type": "click", "ts": 200},
        {"user_id": "u1", "event_type": "signup", "ts": 100},
        {"user_id": "u2", "event_type": "signup", "ts": 100},
    ]
    (spool / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    # batch 2: u1 purchases@300; u2's straggler click@50 (before its
    # signup reach) is ignored; u3 clicks without ever signing up
    rows2 = [
        {"user_id": "u1", "event_type": "purchase", "ts": 300},
        {"user_id": "u2", "event_type": "click", "ts": 50},
        {"user_id": "u3", "event_type": "click", "ts": 10},
    ]
    (spool / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))

    stream = spark.readStream.schema(
        "user_id string, event_type string, ts long"
    ).option("maxFilesPerTrigger", 1).json(str(spool))
    out = funnel_stream(stream, ["signup", "click", "purchase"])
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user, stage, event_type, reach_ts FROM funnel_state"
    ).collect()
    got = {(r["user"], r["stage"]): (r["event_type"], r["reach_ts"]) for r in rows}
    assert got == {
        ("u1", 0): ("signup", 100),
        ("u1", 1): ("click", 200),
        ("u1", 2): ("purchase", 300),
        ("u2", 0): ("signup", 100),
    }


def test_stateful_funnel_stream_conversion_window(spark, tmp_path):
    import json as _json

    from py_gtfs_duckdb_spark.streaming.stateful import funnel_stream

    spool = tmp_path / "wspool"
    spool.mkdir()
    rows = [
        {"user_id": "u1", "event_type": "signup", "ts": 1000},
        {"user_id": "u1", "event_type": "click", "ts": 3000},  # 2s later
        {"user_id": "u2", "event_type": "signup", "ts": 1000},
        {"user_id": "u2", "event_type": "click", "ts": 2000},  # exactly 1s
    ]
    (spool / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "user_id string, event_type string, ts long"
    ).json(str(spool))
    out = funnel_stream(stream, ["signup", "click"], within_seconds=1)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_window_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user"], r["stage"])
        for r in spark.sql("SELECT * FROM funnel_window_state").collect()
    }
    # u2's click at the inclusive 1s boundary advances; u1's 2s click no
    assert got == {("u1", 0), ("u2", 0), ("u2", 1)}



def test_stateful_transition_stream(spark, tmp_path):
    """applyInPandasWithState adjacency tracker: the tail event carries
    across micro-batches, in-batch events replay in (ts, seq) order, and
    the emitted changelog aggregates to the batch transition matrix."""
    import json as _json

    from py_gtfs_duckdb_spark.streaming.stateful import transition_stream

    spool = tmp_path / "tspool"
    spool.mkdir()
    # batch 1, deliberately out of file order within the batch:
    # u1: a@100 -> b@200 ; u2: a@100
    rows1 = [
        {"user_id": "u1", "event_type": "b", "ts": 200, "event_id": 2},
        {"user_id": "u1", "event_type": "a", "ts": 100, "event_id": 1},
        {"user_id": "u2", "event_type": "a", "ts": 100, "event_id": 3},
    ]
    (spool / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    # batch 2: u1 continues b->c (tail carried), u2's straggler @50 drops
    rows2 = [
        {"user_id": "u1", "event_type": "c", "ts": 300, "event_id": 4},
        {"user_id": "u2", "event_type": "b", "ts": 50, "event_id": 5},
    ]
    (spool / "b2.json").write_text("\n".join(_json.dumps(r) for r in rows2))

    stream = spark.readStream.schema(
        "user_id string, event_type string, ts long, event_id long"
    ).option("maxFilesPerTrigger", 1).json(str(spool))
    out = transition_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("trans_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user"], r["from_type"], r["to_type"], r["ts"])
        for r in spark.sql("SELECT * FROM trans_state").collect()
    }
    assert got == {
        ("u1", "a", "b", 200),
        ("u1", "b", "c", 300),
    }
