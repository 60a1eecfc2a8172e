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

Both edges are dependency-free: the protobuf decode runs on the vendored
wire codec (streaming/gtfsrt_wire.py) and the MQTT subscription on the
vendored MQTT 3.1.1 client (streaming/mqtt.py). Spool files can also be
written directly (spool_write_json) — the downstream plan is identical.
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
    (gtfsrt.py:28-29 ``ParseFromString`` + field extraction) using the
    vendored wire codec (streaming/gtfsrt_wire.py — no external protobuf
    runtime needed). Output matches the ``MessageToDict(...,
    preserving_proto_field_name=True)`` shape FEED_ENTITY_SCHEMA expects."""
    from py_gtfs_duckdb_spark.streaming import gtfsrt_wire

    feed = gtfsrt_wire.decode(payload, "FeedMessage")
    header_ts = feed.get("header", {}).get("timestamp")
    return [
        {"feed_timestamp": header_ts, "entity": _normalize_entity(entity)}
        for entity in feed.get("entity", [])
    ]


def _pick_translation(ts_dict: dict | None, lang: str = "de") -> str | None:
    """≙ adapter/gtfsrt.py:145-153 ``_extract_translation_value``: the
    ``lang`` translation if present, else the first, else None."""
    translations = (ts_dict or {}).get("translation") or []
    for item in translations:
        if item.get("language") == lang:
            return item.get("text")
    return translations[0].get("text") if translations else None


def _normalize_entity(entity: dict) -> dict:
    """Conform a decoded FeedEntity to FEED_ENTITY_SCHEMA (streaming/
    gtfsrt.py): TranslatedString wrappers flatten to their translation
    arrays, ``url`` is translation-picked to a plain string
    (adapter/gtfsrt.py:117), and a missing ``severity_level`` defaults to
    UNKNOWN_SEVERITY (adapter/gtfsrt.py:121)."""
    alert = entity.get("alert")
    if alert is not None:
        alert = dict(alert)
        alert["url"] = _pick_translation(alert.get("url"))
        for field in (
            "header_text",
            "description_text",
            "tts_header_text",
            "tts_description_text",
        ):
            if field in alert:
                alert[field] = (alert[field] or {}).get("translation") or []
        alert.setdefault("severity_level", "UNKNOWN_SEVERITY")
        entity = {**entity, "alert": alert}
    return entity


class MqttSpooler:
    """MQTT subscriber → spool directory (replaces the reference's paho
    ``on_message`` → queue push, realtime.py:60-77,149-199) using the
    vendored MQTT 3.1.1 client (streaming/mqtt.py) — no external package.
    Each received FeedMessage decodes through the vendored protobuf codec
    and lands as one atomic spool file; Structured Streaming tails the
    directory."""

    def __init__(
        self,
        spool_dir: str,
        host: str,
        port: int = 1883,
        topics: list[str] | None = None,
        client_id: str | None = None,
        keepalive: int = 60,
        username: str | None = None,
        password: str | None = None,
    ):
        from py_gtfs_duckdb_spark.streaming.mqtt import MqttClient

        self.spool_dir = spool_dir
        self.topics = topics or ["#"]
        self._client = MqttClient(
            host,
            port,
            client_id=client_id,
            keepalive=keepalive,
            username=username,
            password=password,
        )
        self._client.on_message = self._on_message
        self._client.connect()

    def _on_message(self, topic: str, payload: bytes) -> None:
        try:
            messages = feed_message_to_spool_dicts(payload)
        except Exception:
            return  # skip undecodable payloads (gtfsrt.py try/except posture)
        if messages:
            spool_write_json(self.spool_dir, messages)

    def start(self) -> None:
        self._client.subscribe(self.topics)
        self._client.loop_start()

    def stop(self) -> None:
        self._client.loop_stop()
        self._client.disconnect()
