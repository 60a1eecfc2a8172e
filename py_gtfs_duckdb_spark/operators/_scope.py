"""Scoped persist registry — the fix for the cross-query cache-leak class.

Operators that build one frame for several consumers (``dsir_weights``'s
per-(doc, bucket) table, the MinHash signature pass, ...) must persist it:
the returned plan is lazy, so the operator itself can never know when its
consumers have materialized and an in-function ``unpersist`` would just
force a recompute. But a persist with NO owner is a leak with a sharp
edge in a shared ``SparkSession``: when a LATER query builds the
same-shaped frame and calls ``persist()``, Spark's CacheManager logs
"already cached" and keeps the OLD entry — and the new query's downstream
branches are not reliably served from it, so the corpus explode the
design runs once silently runs per consumer (the round-6 doubled-Generate
regression: ``q_dsir_weights`` at driver slot 12 leaked its cache into
``q_doc_scorecard`` at slot 19).

The contract here makes the cache SCOPED to one battery query:

- operators persist shared frames via :func:`shared` (never bare
  ``df.persist()``);
- every registered battery entry calls :func:`release_shared` on entry
  (wired into the ``plans.query`` decorator), so query N+1 frees query
  N's frames AFTER N's consumer has materialized — the sequential
  execution model of the driver, the local replica, and ``bench.py``;
- long-lived callers (streaming loops) keep managing their own persist
  lifecycle per batch and do not use this registry.

Double-unpersist is a no-op, so operators that can free a frame early
(``curate_corpus`` drops each stage's cache once the next stage is
counted) still do — the registry is the backstop, not the only owner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SHARED: list[DataFrame] = []


def shared(df: DataFrame) -> DataFrame:
    """Persist ``df`` for reuse by multiple consumers within the CURRENT
    query, registering it for release when the next battery query (or the
    surrounding test) begins."""
    df.persist()
    _SHARED.append(df)
    return df


def release_shared() -> int:
    """Unpersist every registered frame (newest first) and empty the
    registry. Returns how many frames were released. Safe to call any
    time the previous query's results are materialized."""
    n = 0
    while _SHARED:
        df = _SHARED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to free
        n += 1
    return n
