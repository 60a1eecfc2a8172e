"""Vendored MQTT 3.1.1 client: wire primitives, wildcard matcher, and a
live loopback run against an in-test fake broker socket server (CONNACK +
SUBACK + one PUBLISH), driving the full MQTT -> protobuf decode -> spool
path without Spark."""

from __future__ import annotations

import json
import os
import socket
import threading
import time

import pytest

from py_gtfs_duckdb_spark.streaming import gtfsrt_wire
from py_gtfs_duckdb_spark.streaming.mqtt import (
    MqttClient,
    encode_remaining_length,
    topic_matches,
)
from py_gtfs_duckdb_spark.streaming.spool import MqttSpooler


def test_remaining_length_encoding():
    assert encode_remaining_length(0) == b"\x00"
    assert encode_remaining_length(127) == b"\x7f"
    assert encode_remaining_length(128) == b"\x80\x01"
    assert encode_remaining_length(16383) == b"\xff\x7f"
    assert encode_remaining_length(16384) == b"\x80\x80\x01"


@pytest.mark.parametrize(
    "pattern,topic,match",
    [
        ("gtfsrt/+/alerts", "gtfsrt/de/alerts", True),
        ("gtfsrt/+/alerts", "gtfsrt/de/trips", False),
        ("gtfsrt/#", "gtfsrt/de/trips/t1", True),
        ("#", "anything/at/all", True),
        ("gtfsrt/de", "gtfsrt/de", True),
        ("gtfsrt/de", "gtfsrt/de/x", False),
        ("gtfsrt/+", "gtfsrt/de/x", False),
    ],
)
def test_topic_wildcards(pattern, topic, match):
    assert topic_matches(pattern, topic) is match


class FakeBroker(threading.Thread):
    """Single-connection MQTT 3.1.1 broker slice: CONNACK, SUBACK, then
    publishes the configured (topic, payload) messages."""

    def __init__(self, publishes):
        super().__init__(daemon=True)
        self.publishes = publishes
        self.server = socket.create_server(("127.0.0.1", 0))
        self.port = self.server.getsockname()[1]
        self.subscribed = threading.Event()

    def _recv_packet(self, conn):
        first = conn.recv(1)
        if not first:
            return None, b""
        mult, length = 1, 0
        while True:
            b = conn.recv(1)[0]
            length += (b & 0x7F) * mult
            if not b & 0x80:
                break
            mult *= 128
        body = b""
        while len(body) < length:
            body += conn.recv(length - len(body))
        return first[0], body

    def run(self):
        conn, _ = self.server.accept()
        ptype, _ = self._recv_packet(conn)  # CONNECT
        assert ptype == 0x10
        conn.sendall(b"\x20\x02\x00\x00")  # CONNACK accepted
        ptype, body = self._recv_packet(conn)  # SUBSCRIBE
        assert ptype == 0x82
        packet_id = body[:2]
        conn.sendall(b"\x90\x03" + packet_id + b"\x00")  # SUBACK qos0
        self.subscribed.set()
        for topic, payload in self.publishes:
            t = topic.encode()
            body = len(t).to_bytes(2, "big") + t + payload
            conn.sendall(b"\x30" + encode_remaining_length(len(body)) + body)
        # keep the socket open briefly so the client can read everything
        time.sleep(0.5)
        conn.close()
        self.server.close()


def _feed_bytes(entity_id="e1", trip_id="t1", ts=1700000000):
    return gtfsrt_wire.encode(
        {
            "header": {
                "gtfs_realtime_version": "2.0",
                "incrementality": "DIFFERENTIAL",
                "timestamp": ts,
            },
            "entity": [
                {
                    "id": entity_id,
                    "trip_update": {
                        "trip": {"trip_id": trip_id, "route_id": "r1"},
                        "timestamp": ts,
                        "stop_time_update": [
                            {"stop_sequence": 1, "arrival": {"delay": 42}}
                        ],
                    },
                }
            ],
        }
    )


def test_mqtt_publish_reaches_client():
    broker = FakeBroker([("gtfsrt/de/trips", b"hello")])
    broker.start()
    got = []
    client = MqttClient("127.0.0.1", broker.port, keepalive=5)
    client.on_message = lambda topic, payload: got.append((topic, payload))
    client.connect()
    client.subscribe(["gtfsrt/#"])
    client.loop_start()
    deadline = time.time() + 10
    while not got and time.time() < deadline:
        time.sleep(0.05)
    client.loop_stop()
    client.disconnect()
    assert got == [("gtfsrt/de/trips", b"hello")]


def test_mqtt_spooler_end_to_end(tmp_path):
    """PUBLISH of real FeedMessage bytes -> vendored decode -> spool file
    with the typed JSON-line shape FEED_ENTITY_SCHEMA parses."""
    spool_dir = str(tmp_path / "spool")
    broker = FakeBroker(
        [
            ("gtfsrt/de/trips", _feed_bytes()),
            ("gtfsrt/de/junk", b"\xff\xff\xff"),  # undecodable: skipped
        ]
    )
    broker.start()
    spooler = MqttSpooler(spool_dir, "127.0.0.1", broker.port, topics=["gtfsrt/#"])
    spooler.start()
    deadline = time.time() + 10
    while time.time() < deadline:
        if os.path.isdir(spool_dir) and any(
            not f.startswith(".") for f in os.listdir(spool_dir)
        ):
            break
        time.sleep(0.05)
    spooler.stop()
    files = [f for f in os.listdir(spool_dir) if not f.startswith(".")]
    assert len(files) == 1, "exactly the decodable message spools"
    lines = open(os.path.join(spool_dir, files[0])).read().splitlines()
    msg = json.loads(lines[0])
    assert msg["feed_timestamp"] == 1700000000
    assert msg["entity"]["id"] == "e1"
    assert msg["entity"]["trip_update"]["trip"]["trip_id"] == "t1"
    assert msg["entity"]["trip_update"]["stop_time_update"][0]["arrival"]["delay"] == 42


def test_mqtt_connect_carries_auth():
    """CONNECT with username/password sets flags 0x80|0x40 and appends the
    credential fields after the client id. Parses the CONNECT packet the
    client sends through a stub socket."""
    sent = []

    class Sock:
        def sendall(self, data):
            sent.append(bytes(data))

        def settimeout(self, t):
            pass

        def recv(self, n):
            # feed a CONNACK after the CONNECT is sent
            buf = b"\x20\x02\x00\x00"
            if not hasattr(self, "pos"):
                self.pos = 0
            chunk = buf[self.pos : self.pos + n]
            self.pos += n
            return chunk

    client = MqttClient("x", 1, client_id="cid", username="user", password="pw")
    import socket as socket_mod

    orig = socket_mod.create_connection
    socket_mod.create_connection = lambda *a, **k: Sock()
    try:
        client.connect()
    finally:
        socket_mod.create_connection = orig
    connect = sent[0]
    assert connect[0] == 0x10
    body = connect[2:]  # 1-byte remaining length here (small packet)
    flags = body[7]
    assert flags & 0x80 and flags & 0x40 and flags & 0x02
    assert b"\x00\x03cid\x00\x04user\x00\x02pw" in body
