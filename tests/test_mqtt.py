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


class FlakyBroker(threading.Thread):
    """Two-connection broker: conn 1 publishes ``first`` then dies (either
    an abrupt close or a mid-packet stall, per ``mode``); conn 2 expects a
    fresh CONNECT + re-SUBSCRIBE and publishes ``second``."""

    def __init__(self, first, second, mode="close"):
        super().__init__(daemon=True)
        self.first, self.second, self.mode = first, second, mode
        self.server = socket.create_server(("127.0.0.1", 0))
        self.port = self.server.getsockname()[1]
        self.resubscribed = threading.Event()

    @staticmethod
    def _read_exact(conn, n):
        # recv() may legally return short reads; loop like mqtt._read_exact
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _handshake(self, conn):
        first = self._read_exact(conn, 1)
        assert first[0] == 0x10  # CONNECT
        length = self._read_exact(conn, 1)[0]  # small pkt: 1-byte remaining len
        self._read_exact(conn, length)
        conn.sendall(b"\x20\x02\x00\x00")  # CONNACK
        ptype = self._read_exact(conn, 1)
        assert ptype[0] == 0x82  # SUBSCRIBE
        length = self._read_exact(conn, 1)[0]
        body = self._read_exact(conn, length)
        conn.sendall(b"\x90\x03" + body[:2] + b"\x00")  # SUBACK

    def _publish(self, conn, topic, payload):
        t = topic.encode()
        body = len(t).to_bytes(2, "big") + t + payload
        conn.sendall(b"\x30" + encode_remaining_length(len(body)) + body)

    def run(self):
        conn, _ = self.server.accept()
        self._handshake(conn)
        self._publish(conn, *self.first)
        if self.mode == "stall":
            # start a PUBLISH packet but never finish it: the client's
            # read timeout fires MID-packet, which must be treated as
            # connection-fatal (reconnect), not as thread death
            conn.sendall(b"\x30")
            time.sleep(3.0)
        conn.close()
        conn, _ = self.server.accept()
        self._handshake(conn)
        self.resubscribed.set()
        self._publish(conn, *self.second)
        time.sleep(0.5)
        conn.close()
        self.server.close()


@pytest.mark.parametrize("mode", ["close", "stall"])
def test_mqtt_reconnects_after_connection_loss(mode):
    broker = FlakyBroker(
        ("gtfsrt/de/trips", b"m1"), ("gtfsrt/de/trips", b"m2"), mode=mode
    )
    broker.start()
    got = []
    client = MqttClient(
        "127.0.0.1", broker.port, keepalive=2, reconnect_min=0.1, reconnect_max=0.5
    )
    client.on_message = lambda topic, payload: got.append(payload)
    client.connect()
    client.subscribe(["gtfsrt/#"])
    client.loop_start()
    deadline = time.time() + 15
    while len(got) < 2 and time.time() < deadline:
        time.sleep(0.05)
    client.loop_stop()
    client.disconnect()
    assert got == [b"m1", b"m2"], "message received on both sides of the drop"
    assert broker.resubscribed.is_set(), "client re-SUBSCRIBEd after reconnect"
    assert client.reconnects == 1


def test_mqtt_send_packet_is_serialized():
    """Concurrent sends (reader-thread PINGREQ vs caller-thread SUBSCRIBE)
    never interleave bytes on the wire. The fake socket writes one byte at
    a time with scheduler yields, so without the send lock the two packet
    types would shuffle together."""
    wire = bytearray()

    class Sock:
        def sendall(self, data):
            for b in data:
                wire.append(b)
                time.sleep(0.0002)

    client = MqttClient("x", 1)
    client._sock = Sock()
    threads = [
        threading.Thread(target=client._send_packet, args=(0xC0, b""))
        for _ in range(8)
    ] + [
        threading.Thread(target=client._send_packet, args=(0x82, b"\x00\x01ab"))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the byte stream must parse back into exactly the 16 packets sent
    seen, pos = [], 0
    while pos < len(wire):
        first = wire[pos]
        length = wire[pos + 1]  # all test packets have 1-byte lengths
        seen.append(bytes(wire[pos : pos + 2 + length]))
        pos += 2 + length
    assert sorted(seen) == sorted(
        [b"\xc0\x00"] * 8 + [b"\x82\x04\x00\x01ab"] * 8
    ), "each packet is contiguous on the wire"


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
