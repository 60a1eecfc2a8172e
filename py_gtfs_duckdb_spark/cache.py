"""Serving-edge response cache (SURVEY §2.1 S14).

The reference memoizes rendered HTTP responses in memcached with
per-endpoint TTLs (realtime.py:104-108,277-305; 60/30/15 s,
config.py:27-29). The cache is a serving concern, not an engine concern,
so the engine-side equivalent is deliberately small: an in-process TTL
cache with the same get-or-render contract. A memcached client drops in
behind the same interface when the (public) ``pymemcache`` package is
available; at cluster scale the snapshot Parquet itself (versioned,
immutable) is the shared cache layer and this only saves re-rendering.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable


class ResponseCache:
    """Thread-safe: the HTTP edge calls this from ThreadingHTTPServer
    handler threads, so expiry of the same key may race — the lock keeps
    the dict consistent (concurrent renders of an expired key are allowed,
    same as the reference's memcached pattern)."""

    def __init__(self, clock: Callable[[], float] = time.monotonic):
        self._clock = clock
        self._store: dict[str, tuple[float, object]] = {}
        self._lock = threading.Lock()

    def get(self, key: str):
        with self._lock:
            hit = self._store.get(key)
            if hit is None:
                return None
            expires, value = hit
            if self._clock() >= expires:
                self._store.pop(key, None)
                return None
            return value

    def set(self, key: str, value, ttl_seconds: float) -> None:
        with self._lock:
            self._store[key] = (self._clock() + ttl_seconds, value)

    def get_or_render(self, key: str, ttl_seconds: float, render: Callable[[], object]):
        """The reference's endpoint pattern (realtime.py:277-305): cached
        response if fresh, else render + store."""
        value = self.get(key)
        if value is None:
            value = render()
            self.set(key, value, ttl_seconds)
        return value
