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
        reconnect_min: float = 0.5,
        reconnect_max: float = 30.0,
    ):
        self.host, self.port = host, port
        self.client_id = client_id or f"pygtfs-{int(time.time() * 1000) & 0xFFFF}"
        self.keepalive = keepalive
        self.username, self.password = username, password
        self.reconnect_min, self.reconnect_max = reconnect_min, reconnect_max
        self.on_message = None
        self.reconnects = 0  # successful re-connections (observable in tests)
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._send_lock = threading.Lock()
        self._packet_id = 0
        self._subs: list[str] = []

    # -- packet send helpers -------------------------------------------------

    def _send_packet(self, first_byte: int, body: bytes) -> None:
        # The reader thread (PINGREQ) and caller threads (subscribe/
        # disconnect) share this socket; the lock keeps whole packets
        # atomic so a keepalive ping can't interleave bytes mid-SUBSCRIBE.
        sock = self._sock
        if sock is None:
            raise ConnectionError("MQTT not connected")
        data = bytes([first_byte]) + encode_remaining_length(len(body)) + body
        with self._send_lock:
            sock.sendall(data)

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
        # Record first so a reconnect racing this call still re-subscribes.
        self._subs.extend(t for t in topics if t not in self._subs)
        self._send_subscribe(topics)
        # SUBACK arrives on the reader loop (or here if not started yet)

    def _send_subscribe(self, topics: list[str]) -> None:
        self._packet_id += 1
        body = self._packet_id.to_bytes(2, "big") + b"".join(
            _utf8_field(t) + b"\x00" for t in topics  # QoS 0
        )
        self._send_packet(0x82, body)

    # -- reader loop ---------------------------------------------------------

    def _maybe_ping(self, last_ping: float) -> float:
        """Keepalive counts CLIENT traffic only — incoming PUBLISHes don't
        reset the broker's 1.5x-keepalive disconnect timer, so the ping
        must fire on schedule even while messages stream in."""
        if time.time() - last_ping > self.keepalive / 2:
            self._send_packet(0xC0, b"")  # PINGREQ
            return time.time()
        return last_ping

    def _read_connection(self) -> None:
        """Read packets on the current socket until it dies.

        Raises on any connection-fatal condition: broken pipe, broker
        close, a malformed remaining-length (stream desync), or a
        ``socket.timeout`` raised MID-packet — a half-received packet means
        the stream is no longer framable, unlike a timeout while idle
        waiting for the next packet's first byte, which is the normal
        keepalive heartbeat path.
        """
        sock = self._sock
        if sock is None:
            raise ConnectionError("MQTT not connected")
        last_ping = time.time()
        while not self._stop.is_set():
            last_ping = self._maybe_ping(last_ping)
            try:
                first = _read_exact(sock, 1)[0]
            except socket.timeout:
                continue  # idle between packets: keep pinging
            length = _read_remaining_length(sock)
            payload = _read_exact(sock, length)
            ptype = first >> 4
            if ptype == 3:  # PUBLISH
                # a single malformed packet must not kill the connection;
                # skip it and keep reading
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

    def _loop(self) -> None:
        """Reader thread: read until the connection dies, then reconnect
        with exponential backoff and re-subscribe — the paho
        ``loop_start`` auto-reconnect posture the reference relies on for
        long-running ingest (realtime.py:149-199). A transient broker
        hiccup therefore degrades to a gap in the differential feed (QoS-0
        at-most-once, refreshed seconds later) instead of silently killing
        ingest for good."""
        while not self._stop.is_set():
            try:
                self._read_connection()
            except (ConnectionError, OSError, ValueError):
                pass
            if self._stop.is_set():
                return
            self._close_sock()
            backoff = self.reconnect_min
            while not self._stop.is_set():
                if self._stop.wait(backoff):
                    return
                backoff = min(backoff * 2, self.reconnect_max)
                try:
                    self.connect()
                    if self._subs:
                        self._send_subscribe(list(self._subs))
                    self.reconnects += 1
                    break
                except (ConnectionError, OSError):
                    self._close_sock()
            # disconnect() may have run while connect() was in flight (it
            # saw _sock None and had nothing to close) — don't exit the
            # thread leaving a freshly-connected, subscribed socket alive
            if self._stop.is_set():
                self._close_sock()
                return

    def _close_sock(self) -> None:
        sock, self._sock = self._sock, None
        if sock is not None:
            try:
                sock.close()
            except OSError:
                pass

    def loop_start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def loop_stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    def disconnect(self) -> None:
        # Deliberate teardown: stop the reader first so it doesn't treat
        # the closing socket as a failure and start reconnecting.
        self._stop.set()
        if self._sock is not None:
            try:
                self._send_packet(0xE0, b"")  # DISCONNECT
            except OSError:
                pass
            self._close_sock()
