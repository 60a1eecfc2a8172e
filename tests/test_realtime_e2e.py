"""The reference's whole realtime program (realtime.py) in one process:
live MQTT broker -> vendored client/spooler -> Structured Streaming merge
(availableNow) -> stdlib HTTP server -> wire-codec decode of the served
protobuf. Each stage is also unit-tested elsewhere; this pins the seams.
"""

from __future__ import annotations

import os
import time
import urllib.request

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.serving_http import RealtimeHttpServer
from py_gtfs_duckdb_spark.streaming import gtfsrt_wire, reset_realtime
from py_gtfs_duckdb_spark.streaming.merge import run_spool_stream
from py_gtfs_duckdb_spark.streaming.spool import MqttSpooler

from tests.test_mqtt import FakeBroker

NOW = int(time.time())


def _feed():
    return {
        "header": {
            "gtfs_realtime_version": "2.0",
            "incrementality": "DIFFERENTIAL",
            "timestamp": NOW,
        },
        "entity": [
            {
                "id": "e2e-tu1",
                "trip_update": {
                    "trip": {
                        "trip_id": "trip-e2e",
                        "route_id": "route-e2e",
                        "start_time": "08:00:00",
                        "start_date": "20250101",
                    },
                    "timestamp": NOW,
                    "stop_time_update": [
                        {
                            "stop_sequence": 1,
                            "stop_id": "s1",
                            "arrival": {"time": NOW, "delay": 77},
                        }
                    ],
                },
            }
        ],
    }


def test_mqtt_to_http_realtime_loop(spark, tmp_path):
    spool = str(tmp_path / "spool")
    lake = GtfsLake(spark, str(tmp_path / "lake"))
    reset_realtime(lake)

    # 1. publish the FeedMessage over a real TCP MQTT connection
    broker = FakeBroker([("gtfsrt/de/trips", gtfsrt_wire.encode(_feed()))])
    broker.start()
    spooler = MqttSpooler(spool, "127.0.0.1", broker.port, topics=["gtfsrt/#"])
    spooler.start()
    deadline = time.time() + 10
    while time.time() < deadline:
        if os.path.isdir(spool) and any(
            not f.startswith(".") for f in os.listdir(spool)
        ):
            break
        time.sleep(0.05)
    spooler.stop()
    assert os.path.isdir(spool) and os.listdir(spool), "message spooled"

    # 2. drain the spool through the actual readStream->foreachBatch wiring
    query = run_spool_stream(
        spark,
        lake,
        spool,
        available_now=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query.awaitTermination(60)
    assert not query.isActive

    # 3. serve over HTTP and decode the bytes with the same wire codec a
    #    downstream consumer (or the reference's bindings) would use
    srv = RealtimeHttpServer(lake)
    srv.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/gtfs/realtime/trip-updates.pbf"
        ) as resp:
            assert resp.status == 200
            body = resp.read()
    finally:
        srv.stop()

    served = gtfsrt_wire.decode(body)
    entities = served.get("entity", [])
    assert len(entities) == 1
    tu = entities[0]["trip_update"]
    assert tu["trip"]["trip_id"] == "trip-e2e"
    assert tu["stop_time_update"][0]["arrival"]["delay"] == 77
