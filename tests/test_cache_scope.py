"""Cross-query cache-scope regressions (the round-6 persist-leak class).

Operators persist shared frames via operators/_scope.shared(); every
battery entry releases the previous query's frames on entry. These tests
pin the two failure modes that slipped through round 6:

1. the exact ordering that broke the round-6 suite — a materialized
   q_doc_scorecard leaking its cached frames into q_dsir_weights' plan,
   doubling the corpus explode;
2. the driver's own execution model — the full 50-query window in ONE
   shared session, in priority order, with no cache entry surviving the
   battery.
"""

from __future__ import annotations

from tests.conftest import plan_str


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _generate_nodes(spark, sf_dir, name: str) -> int:
    plan = plan_str(spark, sf_dir, name)
    return sum(1 for l in plan.splitlines() if ") Generate" in l)


def _gram_passes(spark, sf_dir, name: str) -> int:
    """Corpus gram passes in the plan — since r13 the n-gram front-end is
    the fused Arrow stage (MapInPandas), so the doubled-explode leak
    symptom is now a doubled MapInPandas."""
    plan = plan_str(spark, sf_dir, name)
    return sum(1 for l in plan.splitlines() if ") MapInPandas" in l)


def test_scorecard_then_dsir_single_explode(spark, sf_dir):
    """The round-6 red, verbatim: materialize q_doc_scorecard (which
    composes dsir_weights and persists its helper frames), THEN assert
    q_dsir_weights still plans exactly one corpus explode. Pre-fix, the
    leaked cache entries collided with dsir's own persist ("already
    cached") and the explode doubled."""
    from py_gtfs_duckdb_spark.plans import QUERIES

    assert QUERIES["q_doc_scorecard"](spark, sf_dir).count() > 0
    assert _generate_nodes(spark, sf_dir, "q_dsir_weights") == 1
    assert _generate_nodes(spark, sf_dir, "q_ngram_novelty") == 0
    assert _gram_passes(spark, sf_dir, "q_ngram_novelty") == 1


def test_driver_window_shared_session_no_cache_interference(spark, sf_dir):
    """Replicate the driver's execution model: the first 50 _PRIORITY
    queries run back-to-back in ONE SparkSession, each materialized,
    NO cache clearing between them (the driver does none). Afterwards a
    single release must leave the CacheManager empty — any operator that
    persisted outside the scoped registry (the round-6 leak) survives the
    release and fails here — and the skew-sensitive plans must still
    build with a single corpus explode."""
    from py_gtfs_duckdb_spark.operators._scope import release_shared
    from py_gtfs_duckdb_spark.plans import _PRIORITY, QUERIES

    spark.catalog.clearCache()
    for name in _PRIORITY[:50]:
        assert QUERIES[name](spark, sf_dir).count() >= 0, name
    release_shared()
    assert _cache_manager_empty(spark), (
        "cache entries survived the battery: some operator persisted "
        "outside operators/_scope.shared()"
    )
    # the doubled-explode symptom, probed on the queries that persist
    assert _generate_nodes(spark, sf_dir, "q_dsir_weights") == 1
    for name in ("q_ngram_novelty", "q_split_rescue"):
        assert _generate_nodes(spark, sf_dir, name) == 0, name
        assert _gram_passes(spark, sf_dir, name) == 1, name


def test_release_shared_is_session_keyed(spark):
    """release_shared(spark) must not touch frames owned by ANOTHER live
    session: the registry is keyed by owning SparkSession (ADVICE r7)."""
    from py_gtfs_duckdb_spark.operators._scope import (
        _SHARED,
        release_shared,
        shared,
    )

    release_shared()
    other = spark.newSession()
    mine = shared(spark.range(10).selectExpr("id * 2 AS v"))
    theirs = shared(other.range(5).selectExpr("id + 1 AS w"))
    mine.count(), theirs.count()
    assert mine.storageLevel.useMemory and theirs.storageLevel.useMemory
    released = release_shared(other)
    assert released == 1
    assert mine.storageLevel.useMemory, "foreign-session release hit our frame"
    assert not theirs.storageLevel.useMemory
    assert len(_SHARED) == 1 and _SHARED[0] is mine
    release_shared()
    assert not mine.storageLevel.useMemory and not _SHARED


def test_shared_scope_releases_only_its_block(spark):
    """The public loop-caller contract: shared_scope frees exactly the
    frames its block registered, leaving pre-existing entries alone."""
    from py_gtfs_duckdb_spark.operators._scope import (
        _SHARED,
        release_shared,
        shared,
        shared_scope,
    )

    release_shared()
    outer = shared(spark.range(7).selectExpr("id AS a"))
    outer.count()
    with shared_scope(spark):
        inner = shared(spark.range(3).selectExpr("id AS b"))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    assert _SHARED == [outer]
    release_shared()


def test_release_shared_drops_stopped_session_entries(spark):
    """Entries whose owning session has stopped unregister without an
    unpersist attempt (their cache died with the JVM context) — and a
    registry populated before a session swap never blocks the new one."""
    from py_gtfs_duckdb_spark.operators import _scope

    _scope.release_shared()
    df = spark.range(4).selectExpr("id AS z")
    _scope._SHARED.append(df)

    # simulate a stopped owner without killing the shared test session
    orig = _scope._is_stopped
    _scope._is_stopped = lambda s: True
    try:
        assert _scope.release_shared(spark) == 1
        assert not _scope._SHARED
    finally:
        _scope._is_stopped = orig


def test_release_requeues_failed_unpersist(spark):
    """A frame whose unpersist RAISES on a live session must stay
    registered (retried on the next release), not be counted released
    and discarded — the ADVICE r8 silent-leak path."""
    from py_gtfs_duckdb_spark.operators import _scope

    _scope.release_shared()
    df = _scope.shared(spark.range(4).selectExpr("id AS y"))
    df.count()
    orig = df.unpersist
    calls = {"n": 0}

    def flaky(blocking=False):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient JVM hiccup")
        return orig(blocking)

    df.unpersist = flaky
    try:
        assert _scope.release_shared() == 0  # failed — not counted
        assert _scope._SHARED == [df]  # re-queued, handle kept
        assert _scope.release_shared() == 1  # retry succeeds
        assert not _scope._SHARED
        assert calls["n"] == 2
    finally:
        df.unpersist = orig
        df.unpersist()


def test_shared_during_release_is_never_dropped(spark):
    """Registry register/drain are atomic under the lock: shared() calls
    hammering a concurrent release_shared() loop always land either in
    the drained snapshot or in the registry — none vanish unregistered
    with a live cache entry (the ADVICE r8 race)."""
    import threading

    from py_gtfs_duckdb_spark.operators import _scope

    _scope.release_shared()
    frames = []
    stop = threading.Event()

    def registrar():
        for i in range(40):
            frames.append(_scope.shared(spark.range(2).selectExpr(f"id AS c{i}")))
        stop.set()

    t = threading.Thread(target=registrar)
    t.start()
    while not stop.is_set():
        _scope.release_shared()
    t.join()
    _scope.release_shared()
    assert not _scope._SHARED
    # every frame was actually unpersisted — no silent cache leak
    assert all(not f.storageLevel.useMemory for f in frames)


def test_shared_scope_is_thread_local(spark):
    """Two concurrent foreachBatch streams run their batches on separate
    driver threads; each scope must release exactly its own frames — a
    scope exiting on one thread can never unpersist (or orphan) a frame
    another thread's in-flight scope registered."""
    import threading

    from py_gtfs_duckdb_spark.operators._scope import (
        _SHARED,
        release_shared,
        shared,
        shared_scope,
    )

    release_shared()
    entered = threading.Event()
    release_other = threading.Event()
    state = {}

    def other_stream():
        with shared_scope(spark):
            f = shared(spark.range(5).selectExpr("id AS other"))
            f.count()
            state["frame"] = f
            entered.set()
            release_other.wait(30)
            assert state["frame"].storageLevel.useMemory, (
                "another thread's scope released this stream's live frame"
            )

    worker = threading.Thread(target=other_stream)
    worker.start()
    assert entered.wait(30)
    # this thread's scope opens and closes while the other is mid-batch
    with shared_scope(spark):
        mine = shared(spark.range(3).selectExpr("id AS mine"))
        mine.count()
    assert not mine.storageLevel.useMemory
    release_other.set()
    worker.join(30)
    assert not state["frame"].storageLevel.useMemory  # its own exit freed it
    assert not _SHARED


def test_release_shared_inside_scope_does_not_corrupt_it(spark):
    """Mixing the two documented lifecycles: release_shared() called
    inside a shared_scope drains only the global registry; the scope's
    frames still release on exit."""
    from py_gtfs_duckdb_spark.operators._scope import (
        _SHARED,
        release_shared,
        shared,
        shared_scope,
    )

    release_shared()
    with shared_scope(spark):
        inner = shared(spark.range(6).selectExpr("id AS q"))
        inner.count()
        release_shared()  # global drain mid-block
        assert inner.storageLevel.useMemory  # scope-owned, untouched
    assert not inner.storageLevel.useMemory
    assert not _SHARED
