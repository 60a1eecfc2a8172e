"""Merge-strategy registry, response cache, and a REAL event-time
watermarked streaming window (Structured Streaming end-to-end)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.cache import ResponseCache
from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.sources.gtfs import project_to_schema
from py_gtfs_duckdb_spark.strategies import get_strategy, merge_subset


def _mk_lake(spark, root, stops, agencies=None):
    lake = GtfsLake(spark, root)
    df = spark.createDataFrame(stops, "stop_id string, stop_name string")
    lake.write("stops", project_to_schema(df, "stops"))
    if agencies:
        adf = spark.createDataFrame(agencies, "agency_id string, agency_name string")
        lake.write("agency", project_to_schema(adf, "agency"))
    return lake


def test_match_stop_id_strategy_merge(spark, tmp_path):
    main = _mk_lake(
        spark, str(tmp_path / "main"),
        [("s1", "Main One"), ("s2", "Main Two")], [("a1", "Main Agency")],
    )
    _mk_lake(
        spark, str(tmp_path / "sub"),
        [("s2", "Sub Two Renamed"), ("s3", "Sub Three")], [("a2", "Sub Agency")],
    )
    touched = merge_subset(main, str(tmp_path / "sub"))
    assert set(touched) == {"agency", "stops"}
    stops = {r["stop_id"]: r["stop_name"] for r in main.table("stops").collect()}
    # upsert semantics: shared stop replaced, new added, untouched kept
    assert stops == {"s1": "Main One", "s2": "Sub Two Renamed", "s3": "Sub Three"}
    # append semantics for other tables
    assert main.table("agency").count() == 2


def test_unknown_strategy_raises():
    with pytest.raises(KeyError, match="match_stop_id"):
        get_strategy("nope")


def test_response_cache_ttl():
    now = [0.0]
    cache = ResponseCache(clock=lambda: now[0])
    calls = []

    def render():
        calls.append(1)
        return f"payload-{len(calls)}"

    assert cache.get_or_render("alerts", 60, render) == "payload-1"
    assert cache.get_or_render("alerts", 60, render) == "payload-1"  # cached
    now[0] = 61.0
    assert cache.get_or_render("alerts", 60, render) == "payload-2"  # expired
    assert len(calls) == 2


def test_streaming_watermark_tumbling_window(spark, tmp_path):
    """Event-time tumbling count with a watermark over a spooled JSON
    stream — the Structured Streaming surface the reference lacks but the
    engine must offer (SURVEY §2.8 closing note)."""
    spool = tmp_path / "wspool"
    spool.mkdir()
    base = 1_750_000_000  # aligned epoch seconds
    events = [
        {"event_id": 1, "ts": base + 5, "kind": "a"},
        {"event_id": 2, "ts": base + 65, "kind": "a"},
        {"event_id": 3, "ts": base + 70, "kind": "b"},
        {"event_id": 4, "ts": base + 10, "kind": "a"},  # late but within watermark
    ]
    (spool / "batch1.json").write_text("\n".join(json.dumps(e) for e in events))

    stream = (
        spark.readStream.schema("event_id long, ts long, kind string")
        .json(str(spool))
        .withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("event_time", "2 minutes")
        .groupBy(F.window("event_time", "1 minute").alias("w"), "kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("windowed_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # window [base, base+60): kind a has events 1 and 4; [base+60, +120): a=1, b=1
    by_kind_window = sorted(
        (r["w"]["start"], r["kind"], r["n"])
        for r in spark.sql("SELECT * FROM windowed_counts").collect()
    )
    assert [(k, n) for _, k, n in by_kind_window] == [("a", 2), ("a", 1), ("b", 1)]


def test_memcached_cache_contract_with_fake_client():
    """MemcachedResponseCache keeps the exact get-or-render contract over
    a memcached-shaped client (get(key) / set(key, value, expire=s)) —
    the drop-in the reference's S14 uses (realtime.py:104-108)."""
    from py_gtfs_duckdb_spark.cache import MemcachedResponseCache

    class FakeClient:
        def __init__(self):
            self.store = {}
            self.expires = {}

        def get(self, key):
            return self.store.get(key)

        def set(self, key, value, expire=0):
            self.store[key] = value
            self.expires[key] = expire

    client = FakeClient()
    cache = MemcachedResponseCache(client)
    calls = []

    def render():
        calls.append(1)
        return (b"body", "application/x-protobuf")

    assert cache.get_or_render("/tu-pbf", 30, render) == (
        b"body",
        "application/x-protobuf",
    )
    assert cache.get_or_render("/tu-pbf", 30, render)[0] == b"body"
    assert len(calls) == 1, "second hit must come from the client"
    assert client.expires["/tu-pbf"] == 30, "endpoint TTL forwarded"
    # memcached expire=0 means never-expire: sub-second TTLs clamp to 1
    cache.set("/x", 1, 0.2)
    assert client.expires["/x"] == 1


def test_make_response_cache_dispatch():
    """Config-keyed selection: no endpoint (the default config) or a
    missing pymemcache -> in-process cache; the conformance-tested
    config keys are untouched either way."""
    from py_gtfs_duckdb_spark.cache import (
        MemcachedResponseCache,
        ResponseCache,
        make_response_cache,
    )
    from py_gtfs_duckdb_spark.config import load_config

    cfg = load_config()
    assert isinstance(make_response_cache(cfg), ResponseCache)

    cfg_ep = {"caching": {"caching_server_endpoint": ["127.0.0.1:11211"]}}
    # this container has no pymemcache: endpoint set -> graceful fallback
    try:
        import pymemcache  # noqa: F401

        has_pymemcache = True
    except ImportError:
        has_pymemcache = False
    got = make_response_cache(cfg_ep)
    if has_pymemcache:
        assert isinstance(got, MemcachedResponseCache)
    else:
        assert isinstance(got, ResponseCache)

    # simulate an installed pymemcache via a stub module: the factory
    # must build the memcached cache against the parsed (host, port)
    import sys
    import types

    base = types.ModuleType("pymemcache.client.base")
    built = {}

    class Client:
        def __init__(self, server, serde=None):
            built["server"] = server
            built["serde"] = serde

    base.Client = Client
    client_pkg = types.ModuleType("pymemcache.client")
    client_pkg.base = base
    serde_mod = types.ModuleType("pymemcache.serde")
    serde_mod.pickle_serde = object()
    pkg = types.ModuleType("pymemcache")
    pkg.client = client_pkg
    pkg.serde = serde_mod
    saved = {
        k: sys.modules.get(k)
        for k in (
            "pymemcache",
            "pymemcache.client",
            "pymemcache.client.base",
            "pymemcache.serde",
        )
    }
    sys.modules.update(
        {
            "pymemcache": pkg,
            "pymemcache.client": client_pkg,
            "pymemcache.client.base": base,
            "pymemcache.serde": serde_mod,
        }
    )
    try:
        got = make_response_cache(cfg_ep)
        assert isinstance(got, MemcachedResponseCache)
        assert built["server"] == ("127.0.0.1", 11211)
        assert built["serde"] is serde_mod.pickle_serde
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_make_response_cache_warns_on_missing_pymemcache(capsys):
    """ADVICE r12: a configured memcached endpoint with no importable
    pymemcache must fall back to the in-process cache WITH a one-line
    stderr signal, not silently."""
    import sys

    from py_gtfs_duckdb_spark.cache import ResponseCache, make_response_cache

    cfg_ep = {"caching": {"caching_server_endpoint": ["127.0.0.1:11211"]}}
    saved = {
        k: sys.modules.pop(k, None)
        for k in (
            "pymemcache",
            "pymemcache.client",
            "pymemcache.client.base",
            "pymemcache.serde",
        )
    }
    sys.modules["pymemcache"] = None  # forces ImportError on import
    try:
        got = make_response_cache(cfg_ep)
        assert isinstance(got, ResponseCache)
        err = capsys.readouterr().err
        assert "pymemcache is not importable" in err
        assert "in-process" in err
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
