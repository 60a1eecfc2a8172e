"""Spool-directory streaming source + optional MQTT/protobuf edges (S8/S9).

OSS Spark has no MQTT Structured Streaming source, so the push edge is
decoupled exactly the way the reference decouples MQTT from DuckDB with
in-memory queues (realtime.py:160-175 + ddb.py:47-53): a tiny subscriber
appends newline-delimited FeedEntity JSON files to a spool directory, and
Structured Streaming's file source tails the directory. File commit is
atomic (write temp + rename), so the file source never reads partial
batches. At cluster scale the spool directory is object storage or is
replaced by a Kafka topic — the downstream plan (parse → merge) is
unchanged.

The protobuf decode (gtfs-realtime-bindings) and MQTT client (paho) are
OPTIONAL dependencies, gated behind import-try: absent in this container,
the JSON spool path is fully functional and the protobuf/MQTT edges raise
``NotImplementedError`` with instructions.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def spool_write_json(spool_dir: str, messages: list[dict]) -> str:
    """Atomically append one spool file of newline-delimited messages, each
    ``{"feed_timestamp": ..., "entity": {...FeedEntity...}}`` (see
    streaming/gtfsrt.py FEED_ENTITY_SCHEMA)."""
    os.makedirs(spool_dir, exist_ok=True)
    name = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json"
    tmp = os.path.join(spool_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for m in messages:
            fh.write(json.dumps(m) + "\n")
    final = os.path.join(spool_dir, name)
    os.replace(tmp, final)
    return final


def feed_message_to_spool_dicts(payload: bytes) -> list[dict]:
    """Decode a GTFS-RT protobuf ``FeedMessage`` into spool dicts
    (gtfsrt.py:28-29 ``ParseFromString`` + field extraction). Requires
    ``gtfs-realtime-bindings`` (not installed in this container)."""
    try:
        from google.protobuf.json_format import MessageToDict
        from google.transit import gtfs_realtime_pb2
    except ImportError as exc:  # pragma: no cover - optional dependency
        raise NotImplementedError(
            "protobuf decode needs the public 'gtfs-realtime-bindings' "
            "package; spool JSON directly instead (spool_write_json)"
        ) from exc
    feed = gtfs_realtime_pb2.FeedMessage()
    feed.ParseFromString(payload)
    header_ts = feed.header.timestamp if feed.header.HasField("timestamp") else None
    out = []
    for entity in feed.entity:
        d = MessageToDict(entity, preserving_proto_field_name=True)
        out.append({"feed_timestamp": header_ts, "entity": d})
    return out


class MqttSpooler:
    """MQTT subscriber → spool directory (replaces the reference's paho
    ``on_message`` → queue push, realtime.py:60-77,149-199). Requires
    ``paho-mqtt`` (not installed in this container)."""

    def __init__(self, spool_dir: str, host: str, port: int = 1883, topics: list[str] | None = None):
        try:
            import paho.mqtt.client as mqtt
        except ImportError as exc:  # pragma: no cover - optional dependency
            raise NotImplementedError(
                "MQTT ingest needs the public 'paho-mqtt' package; write "
                "spool files directly instead (spool_write_json)"
            ) from exc
        self.spool_dir = spool_dir
        self.topics = topics or ["#"]
        self._client = mqtt.Client()
        self._client.on_message = self._on_message
        self._client.connect(host, port)

    def _on_message(self, client, userdata, message) -> None:  # pragma: no cover
        spool_write_json(self.spool_dir, feed_message_to_spool_dicts(message.payload))

    def start(self) -> None:  # pragma: no cover
        for topic in self.topics:
            self._client.subscribe(topic)
        self._client.loop_start()

    def stop(self) -> None:  # pragma: no cover
        self._client.loop_stop()
        self._client.disconnect()
