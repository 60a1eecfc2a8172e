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


class MemcachedResponseCache:
    """The reference's actual S14 backend: rendered responses memoized in
    memcached with per-endpoint TTLs (reference realtime.py:104-108,
    296-303). Same get-or-render contract as :class:`ResponseCache`;
    ``client`` is any object with memcached's ``get(key)`` /
    ``set(key, value, expire=seconds)`` surface — pymemcache's
    ``Client`` (public PyPI package), or a fake in tests. Values are
    (body, content_type) tuples, so a real client needs a pickling
    serde (:func:`make_response_cache` configures one)."""

    def __init__(self, client):
        self._client = client

    def get(self, key: str):
        return self._client.get(key)

    def set(self, key: str, value, ttl_seconds: float) -> None:
        # memcached TTLs are integer seconds; 0 means "never expire",
        # so clamp up to 1s rather than accidentally pinning an entry
        self._client.set(key, value, expire=max(1, int(round(ttl_seconds))))

    def get_or_render(
        self, key: str, ttl_seconds: float, render: Callable[[], object]
    ):
        value = self.get(key)
        if value is None:
            value = render()
            self.set(key, value, ttl_seconds)
        return value


def make_response_cache(config: dict):
    """Cache selection from the reference's own config keys
    (config.py:25-29): a non-empty ``caching.caching_server_endpoint``
    plus an importable ``pymemcache`` yields the memcached-backed cache
    against the first endpoint ("host:port" string or (host, port));
    otherwise the in-process TTL cache — same contract, so serving code
    never branches. Callers gate on ``app.caching_enabled`` themselves
    (the reference's realtime.py:104 does the same)."""
    endpoints = (config.get("caching") or {}).get("caching_server_endpoint") or []
    if endpoints:
        try:
            from pymemcache import serde  # type: ignore[import-not-found]
            from pymemcache.client.base import (  # type: ignore[import-not-found]
                Client,
            )
        except ImportError:
            # Loud, once: an operator who configured memcached would
            # otherwise silently get per-process caching (ADVICE r12) —
            # cache hit rates collapse across workers with no signal.
            import sys

            print(
                "py_gtfs_duckdb_spark: caching_server_endpoint is "
                f"configured ({endpoints!r}) but pymemcache is not "
                "importable — falling back to the in-process TTL cache "
                "(per-process, not shared)",
                file=sys.stderr,
            )
            return ResponseCache()
        ep = endpoints[0] if isinstance(endpoints, (list, tuple)) else endpoints
        if isinstance(ep, str) and ":" in ep:
            host, port = ep.rsplit(":", 1)
            ep = (host, int(port))
        return MemcachedResponseCache(
            Client(ep, serde=serde.pickle_serde)
        )
    return ResponseCache()
