"""Minimal MQTT 3.1.1 subscriber (no external dependencies).

The reference ingests GTFS-RT differential feeds over MQTT via paho
(``realtime.py:60-77,149-199``). This container has no MQTT package, but
MQTT 3.1.1 is a tiny public wire protocol (OASIS standard): a handful of
length-prefixed packets over TCP. This module implements exactly the
subscriber slice the reference uses — CONNECT/CONNACK, SUBSCRIBE/SUBACK
(QoS 0), incoming PUBLISH dispatch, PINGREQ keepalive, DISCONNECT — plus
the topic-wildcard matcher the reference builds as a regex lambda
(``realtime.py:66-77``).

QoS 0 only: the reference subscribes at QoS 0 and GTFS-RT feeds are
retained/refreshed continuously, so a dropped message is superseded
seconds later (the same at-most-once posture as the reference).
"""

from __future__ import annotations

import socket
import threading
import time


def encode_remaining_length(n: int) -> bytes:
    """MQTT variable-length remaining-length encoding (7 bits + cont)."""
    out = bytearray()
    while True:
        byte = n % 128
        n //= 128
        out.append(byte | 0x80 if n else byte)
        if not n:
            return bytes(out)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("MQTT socket closed")
        buf += chunk
    return buf


def _read_remaining_length(sock: socket.socket) -> int:
    mult, value = 1, 0
    for _ in range(4):
        b = _read_exact(sock, 1)[0]
        value += (b & 0x7F) * mult
        if not b & 0x80:
            return value
        mult *= 128
    raise ValueError("malformed remaining length")


def _utf8_field(s: str) -> bytes:
    data = s.encode("utf-8")
    return len(data).to_bytes(2, "big") + data


def topic_matches(pattern: str, topic: str) -> bool:
    """MQTT wildcard match: ``+`` one level, ``#`` rest (must be last) —
    ≙ the reference's wildcard→regex dispatch (realtime.py:66-77)."""
    p_parts = pattern.split("/")
    t_parts = topic.split("/")
    for i, p in enumerate(p_parts):
        if p == "#":
            return i == len(p_parts) - 1
        if i >= len(t_parts):
            return False
        if p != "+" and p != t_parts[i]:
            return False
    return len(p_parts) == len(t_parts)


class MqttClient:
    """Blocking-socket MQTT 3.1.1 subscriber with a reader thread.

    ``on_message(topic: str, payload: bytes)`` is invoked from the reader
    thread for every incoming PUBLISH whose topic matches a subscription
    (the broker already filters; the local check guards overlapping
    wildcard subscriptions the way the reference's dispatch does).
    """

    def __init__(
        self,
        host: str,
        port: int = 1883,
        client_id: str | None = None,
        keepalive: int = 60,
        username: str | None = None,
        password: str | None = None,
    ):
        self.host, self.port = host, port
        self.client_id = client_id or f"pygtfs-{int(time.time() * 1000) & 0xFFFF}"
        self.keepalive = keepalive
        self.username, self.password = username, password
        self.on_message = None
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._packet_id = 0
        self._subs: list[str] = []

    # -- packet send helpers -------------------------------------------------

    def _send_packet(self, first_byte: int, body: bytes) -> None:
        assert self._sock is not None
        self._sock.sendall(
            bytes([first_byte]) + encode_remaining_length(len(body)) + body
        )

    def connect(self, timeout: float = 10.0) -> None:
        self._sock = socket.create_connection((self.host, self.port), timeout=timeout)
        # CONNECT: protocol "MQTT", level 4, clean session (+auth), keepalive
        flags = 0x02
        if self.username is not None:
            flags |= 0x80
        if self.password is not None:
            flags |= 0x40
        body = (
            _utf8_field("MQTT")
            + bytes([0x04, flags])
            + self.keepalive.to_bytes(2, "big")
            + _utf8_field(self.client_id)
        )
        if self.username is not None:
            body += _utf8_field(self.username)
        if self.password is not None:
            body += _utf8_field(self.password)
        self._send_packet(0x10, body)
        # await CONNACK
        first = _read_exact(self._sock, 1)[0]
        length = _read_remaining_length(self._sock)
        payload = _read_exact(self._sock, length)
        if first != 0x20 or length != 2 or payload[1] != 0:
            raise ConnectionError(f"MQTT CONNACK refused: {payload!r}")
        self._sock.settimeout(max(1.0, self.keepalive / 2))

    def subscribe(self, topics: list[str]) -> None:
        self._packet_id += 1
        body = self._packet_id.to_bytes(2, "big") + b"".join(
            _utf8_field(t) + b"\x00" for t in topics  # QoS 0
        )
        self._send_packet(0x82, body)
        self._subs.extend(topics)
        # SUBACK arrives on the reader loop (or here if not started yet)

    # -- reader loop ---------------------------------------------------------

    def _maybe_ping(self, last_ping: float) -> float:
        """Keepalive counts CLIENT traffic only — incoming PUBLISHes don't
        reset the broker's 1.5x-keepalive disconnect timer, so the ping
        must fire on schedule even while messages stream in."""
        if time.time() - last_ping > self.keepalive / 2:
            self._send_packet(0xC0, b"")  # PINGREQ
            return time.time()
        return last_ping

    def _loop(self) -> None:
        assert self._sock is not None
        last_ping = time.time()
        while not self._stop.is_set():
            try:
                last_ping = self._maybe_ping(last_ping)
                first = _read_exact(self._sock, 1)[0]
            except socket.timeout:
                continue
            except (ConnectionError, OSError):
                return
            try:
                length = _read_remaining_length(self._sock)
                payload = _read_exact(self._sock, length)
            except (ConnectionError, OSError, ValueError):
                return
            ptype = first >> 4
            if ptype == 3:  # PUBLISH
                # a single malformed packet must not kill the reader
                # thread (silent ingest death); skip it and keep reading
                try:
                    qos = (first >> 1) & 0x3
                    tlen = int.from_bytes(payload[:2], "big")
                    topic = payload[2 : 2 + tlen].decode("utf-8")
                    pos = 2 + tlen + (2 if qos else 0)  # skip pkt id at QoS>0
                    body = payload[pos:]
                    if self.on_message is not None and (
                        not self._subs
                        or any(topic_matches(p, topic) for p in self._subs)
                    ):
                        self.on_message(topic, body)
                except Exception:
                    continue
            # SUBACK (9), PINGRESP (13), others: nothing to do at QoS 0

    def loop_start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def loop_stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    def disconnect(self) -> None:
        if self._sock is not None:
            try:
                self._send_packet(0xE0, b"")  # DISCONNECT
                self._sock.close()
            except OSError:
                pass
            self._sock = None
