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

Double-unpersist is a no-op, so operators that can free a frame early
(``curate_corpus`` drops each stage's cache once the next stage is
counted) still do — the registry is the backstop, not the only owner.
"""

from __future__ import annotations

import contextlib
import logging
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_SHARED: list[DataFrame] = []

_log = logging.getLogger(__name__)


def shared(df: DataFrame) -> DataFrame:
    """Persist ``df`` for reuse by multiple consumers within the CURRENT
    query, registering it for release when the next battery query (or the
    surrounding test / the caller's :func:`shared_scope`) begins."""
    df.persist()
    _SHARED.append(df)
    return df


def _is_stopped(session: SparkSession) -> bool:
    """True when the session's JVM context is gone — its cached frames
    were freed with it, so there is nothing left to unpersist."""
    try:
        return session._sc._jsc is None
    except Exception:
        return True


def release_shared(spark: SparkSession | None = None) -> int:
    """Unpersist registered frames (newest first) and drop them from the
    registry. With ``spark`` given, releases ONLY frames owned by that
    session (plus entries whose session has stopped — their caches died
    with the JVM context); with no argument, drains every entry. Returns
    how many frames were released. Safe to call any time the previous
    query's results are materialized. A genuine unpersist failure on a
    live session is logged, never swallowed — the CacheManager-empty
    invariant the test suite asserts must not rot silently."""
    kept: list[DataFrame] = []
    n = 0
    while _SHARED:
        df = _SHARED.pop()
        try:
            owner = df.sparkSession
        except Exception:
            owner = None
        if owner is None or _is_stopped(owner):
            n += 1  # session gone — cache already freed, just unregister
            continue
        if spark is not None and owner is not spark:
            kept.append(df)
            continue
        try:
            df.unpersist(blocking=False)
        except Exception:
            _log.warning("release_shared: unpersist failed", exc_info=True)
        n += 1
    kept.reverse()
    _SHARED.extend(kept)
    return n


@contextlib.contextmanager
def shared_scope(spark: SparkSession | None = None) -> Iterator[None]:
    """Context manager for PUBLIC-API callers running scoped operators in
    a long-lived loop: everything the wrapped iteration registered via
    :func:`shared` is released on exit (materialize/collect the results
    INSIDE the block — release forces recompute on anything still lazy).

    >>> for batch in batches:
    ...     with shared_scope(spark):
    ...         flagged = minhash_lsh_dedup(batch, "text", "doc_id")
    ...         flagged.write.parquet(...)   # materialized inside
    """
    before = len(_SHARED)
    try:
        yield
    finally:
        # release only what this block registered (entries past the
        # entry point), newest first, honoring the session filter
        added = _SHARED[before:]
        del _SHARED[before:]
        for df in reversed(added):
            try:
                owner = df.sparkSession
            except Exception:
                owner = None
            if owner is None or _is_stopped(owner):
                continue  # session gone — cache already freed
            if spark is not None and owner is not spark:
                _SHARED.append(df)  # not ours to free
                continue
            try:
                df.unpersist(blocking=False)
            except Exception:
                _log.warning("shared_scope: unpersist failed", exc_info=True)
