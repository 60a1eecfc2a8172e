"""Scoped persist registry — the fix for the cross-query cache-leak class.

Operators that build one frame for several consumers (the MinHash
signature pass, ``dsir_weights``'s per-(doc, bucket) table, the trained
unigram LM, ...) must persist it: the returned plan is lazy, so the
operator itself can never know when its consumers have materialized and
an in-function ``unpersist`` would just force a recompute. But a persist
with NO owner is a leak with a sharp edge in a shared ``SparkSession``:
when a LATER query builds the same-shaped frame and calls ``persist()``,
Spark's CacheManager logs "already cached" and keeps the OLD entry — and
the new query's downstream branches are not reliably served from it, so
the corpus explode the design runs once silently runs per consumer (the
round-6 doubled-Generate regression: ``q_dsir_weights`` at driver slot 12
leaked its cache into ``q_doc_scorecard`` at slot 19).

The contract here makes the cache SCOPED to one battery query:

- operators persist shared frames via :func:`shared` (never bare
  ``df.persist()``);
- every registered battery entry calls :func:`release_shared` on entry
  (wired into the ``plans.query`` decorator), so query N+1 frees query
  N's frames AFTER N's consumer has materialized — the sequential
  execution model of the driver, the local replica, and ``bench.py``;
- the registry is keyed by the owning ``SparkSession``:
  ``release_shared(spark)`` frees only that session's frames, so a
  process with several sessions (or a stopped-and-recreated one) never
  unpersists another context's caches. ``release_shared()`` with no
  argument drains everything — the right call in single-session
  harnesses (the battery decorator, conftest, bench);
- LONG-LIVED callers (loops invoking ``minhash_lsh_dedup*``,
  ``unigram_nll``, ``ngram_novelty``, ``source_ngram_overlap``, ... as a
  public API outside the battery) are part of this contract too: wrap
  each iteration in :func:`shared_scope` (or call
  :func:`release_shared` once per iteration after consuming the
  results) — otherwise registered persists accumulate unboundedly.
  ``streaming/ingest.NearDupIngestGate`` does exactly this per batch.

:func:`shared_scope` is THREAD-LOCAL: frames registered inside an active
scope belong to that scope alone (a per-thread stack), so two concurrent
``foreachBatch`` streams in one process — each stream runs its batches
on its own driver thread — release exactly their own batch's persists
and can never free (or orphan) the other stream's in-flight frames, and
a ``release_shared()`` call inside a scope drains only the global
registry without corrupting the scope's bookkeeping.

Double-unpersist is a no-op, so operators that can free a frame early
(``curate_corpus`` drops each stage's cache once the next stage is
counted) still do — the registry is the backstop, not the only owner.
"""

from __future__ import annotations

import contextlib
import logging
import threading
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# process-wide registry for frames registered OUTSIDE any shared_scope
# (the battery path: drained by release_shared in the query decorator).
# Guarded by _SHARED_LOCK: register and drain are each a single locked
# step, so a shared() racing a concurrent release_shared() lands either
# in the drained snapshot or in the registry for the NEXT release —
# never dropped unregistered (an unregistered persist is a silent cache
# leak, the exact class this module exists to kill).
_SHARED: list[DataFrame] = []
_SHARED_LOCK = threading.Lock()

# per-thread stack of active shared_scope frames
_LOCAL = threading.local()

_log = logging.getLogger(__name__)


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = _LOCAL.stack = []
    return stack


def shared(df: DataFrame) -> DataFrame:
    """Persist ``df`` for reuse by multiple consumers within the CURRENT
    query, registering it for release when the next battery query (or the
    surrounding test / the caller's :func:`shared_scope`) begins. Inside
    an active :func:`shared_scope` on this thread, the frame belongs to
    the innermost scope; otherwise to the process-wide registry."""
    df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    else:
        with _SHARED_LOCK:
            _SHARED.append(df)
    return df


def _is_stopped(session: SparkSession) -> bool:
    """True when the session's JVM context is known to be gone — its
    cached frames were freed with it, so there is nothing left to
    unpersist. A session without a local JVM handle (Spark Connect has
    no ``_sc``) is assumed LIVE: unpersist must still be attempted there,
    and its own error handling covers a genuinely dead channel."""
    try:
        return session._sc._jsc is None
    except AttributeError:
        return False  # no classic JVM handle (e.g. Connect) — assume live
    except Exception:
        # Any other introspection failure is READ as "stopped", which can
        # false-positive on a live session mid-teardown elsewhere. The
        # worst case is benign: the frame is unregistered without an
        # unpersist attempt, double-unpersist is a no-op, and a truly
        # live session's cache entry dies with the session anyway — but
        # this is a heuristic, not a proof.
        return True


def _release(frames: list[DataFrame], spark: SparkSession | None, who: str):
    """Unpersist ``frames`` newest-first, honoring the session filter.
    Returns (n_released, kept) where kept preserves registration order.
    A frame whose unpersist RAISES on a live session stays in ``kept``
    (re-queued, retried on the next release) — counting it as released
    would discard the only handle to a still-cached frame, rotting the
    CacheManager-empty invariant silently."""
    kept: list[DataFrame] = []
    n = 0
    for df in reversed(frames):
        try:
            owner = df.sparkSession
        except Exception:
            owner = None
        if owner is not None and not _is_stopped(owner):
            if spark is not None and owner is not spark:
                kept.append(df)
                continue
            try:
                df.unpersist(blocking=False)
            except Exception:
                _log.warning(
                    "%s: unpersist failed — re-queued for retry",
                    who,
                    exc_info=True,
                )
                kept.append(df)
                continue
        # else: session gone — cache already freed, just unregister
        n += 1
    kept.reverse()
    return n, kept


def release_shared(spark: SparkSession | None = None) -> int:
    """Unpersist frames in the PROCESS-WIDE registry (newest first) and
    drop them from it; frames owned by an active :func:`shared_scope`
    are that scope's responsibility and are not touched. With ``spark``
    given, releases ONLY frames owned by that session (plus entries
    whose session has stopped — their caches died with the JVM context);
    with no argument, drains every entry. Returns how many frames were
    released. Safe to call any time the previous query's results are
    materialized. A genuine unpersist failure on a live session is
    logged AND the frame is re-queued for the next release — the
    CacheManager-empty invariant the test suite asserts must not rot
    silently. Snapshot-and-clear happens atomically under the registry
    lock, so a concurrent :func:`shared` is never dropped unregistered;
    the unpersist calls themselves run outside the lock (they can block
    on the JVM)."""
    with _SHARED_LOCK:
        frames = list(_SHARED)
        _SHARED.clear()
    n, kept = _release(frames, spark, "release_shared")
    if kept:
        with _SHARED_LOCK:
            _SHARED.extend(kept)
    return n


@contextlib.contextmanager
def shared_scope(spark: SparkSession | None = None) -> Iterator[None]:
    """Context manager for PUBLIC-API callers running scoped operators in
    a long-lived loop: everything the wrapped block registered via
    :func:`shared` is released on exit (materialize/collect the results
    INSIDE the block — release forces recompute on anything still lazy).
    The scope is thread-local, so concurrent streams release only their
    own frames.

    >>> for batch in batches:
    ...     with shared_scope(spark):
    ...         flagged = minhash_lsh_dedup(batch, "text", "doc_id")
    ...         flagged.write.parquet(...)   # materialized inside
    """
    mine: list[DataFrame] = []
    _scope_stack().append(mine)
    try:
        yield
    finally:
        stack = _scope_stack()
        assert stack and stack[-1] is mine, "shared_scope stack corrupted"
        stack.pop()
        _, kept = _release(mine, spark, "shared_scope")
        # foreign-session and failed-unpersist frames survive the scope;
        # hand them to the enclosing scope (or the global registry)
        # instead of dropping them on the floor
        if kept:
            if stack:
                stack[-1].extend(kept)
            else:
                with _SHARED_LOCK:
                    _SHARED.extend(kept)
