"""Custom stateful streaming operator: keyed latest-value state with TTL
via ``applyInPandasWithState``.

This is the engine-native scale path for the reference's realtime state
semantics (newest message per entity id wins, state expires after
``data_review_seconds`` without refresh — ddb.py:282-332): state lives in
Spark's state store, partitioned by key across executors, instead of in a
single mutable database. The ``foreachBatch`` merge in
``streaming/merge.py`` remains the default because it materializes
queryable snapshot tables (the serving edge needs them); this operator is
the right shape when state is large (millions of keys) and only the
*stream* of changes is needed downstream.

Semantics per key:
- newest row by ``ts`` wins (arrival order within a batch is undefined in
  a distributed stream, so ordering is explicit — same contract as the
  merge);
- state not refreshed within ``ttl_seconds`` times out and is dropped
  (ProcessingTimeTimeout, the processing-time contract the reference's
  TTL delete implements);
- each update emits the winning row downstream, so the output stream is
  the per-key changelog.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Output/state schema: key, latest payload (JSON), its event ts.
_STATE_SCHEMA = "key STRING, payload STRING, ts LONG"
_OUTPUT_SCHEMA = "key STRING, payload STRING, ts LONG"


def _update_latest(ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry (ddb.py:290-293): drop the key, emit nothing.
            state.remove()
            return
        best_ts, best_payload = -1, None
        if state.exists:
            best_payload, best_ts = state.get[1], state.get[2]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf["ts"].idxmax()
            if int(pdf.loc[idx, "ts"]) >= best_ts:
                best_ts = int(pdf.loc[idx, "ts"])
                best_payload = pdf.loc[idx, "payload"]
        state.update((key[0], best_payload, best_ts))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "payload": [best_payload], "ts": [best_ts]})

    return fn


def latest_per_key_stream(
    stream: DataFrame,
    key_col: str = "key",
    payload_col: str = "payload",
    ts_col: str = "ts",
    ttl_seconds: int = 7200,
) -> DataFrame:
    """Keyed last-writer-wins state with TTL over a streaming DataFrame.
    Input needs (key, payload, ts); returns the changelog stream of
    winning rows."""
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(payload_col).cast("string").alias("payload"),
        F.col(ts_col).cast("long").alias("ts"),
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _update_latest(ttl_seconds * 1000),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def exact_dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup for 100 TB ingest: emit ONE row per key,
    suppressing duplicates that arrive within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — engine-managed keyed state,
    partitioned across executors). Which duplicate survives within a
    single micro-batch is batch-internal arrival order, NOT event-time
    order — for content-digest dedup any copy is equivalent, which is the
    intended use; do not rely on the earliest-``ts`` row being kept.

    This is the streaming twin of the batch exact-dedup battery
    (q_dedup_exact): a training-data firehose dedups on content digest AT
    INGEST so duplicates never land in the lake. The watermark is the
    state bound — dedup state older than the horizon is evicted, so state
    size tracks (ingest rate x watermark delay), not stream history. The
    honest consequence, pinned by the test: a duplicate arriving AFTER
    its original has aged past the watermark is re-admitted; the batch
    dedup battery remains the exactness backstop downstream.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_dedup_stream(
    spark,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Parquet-directory stream -> exact_dedup_stream -> parquet sink
    (append; kept rows emit immediately). availableNow drains and stops;
    the checkpoint carries watermark + dedup state across restarts."""
    from py_gtfs_duckdb_spark.streaming.windows import run_parquet_stream

    return run_parquet_stream(
        spark,
        source_dir,
        schema,
        sink_dir,
        checkpoint_dir,
        lambda stream: exact_dedup_stream(
            stream, key_cols, ts_col=ts_col, watermark=watermark
        ),
    )


def _advance_funnel(steps: list, within_ms: int | None):
    n_steps = len(steps)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        stage, reach_ts = (-1, -1)
        if state.exists:
            stage, reach_ts = state.get[1], state.get[2]
        rows = []
        events = []
        for pdf in pdfs:
            for et, ts in zip(pdf["event_type"], pdf["ts"]):
                events.append((int(ts), str(et)))
        # within a batch, replay in event-time order — the one reordering
        # a micro-batch CAN give for free; cross-batch stragglers older
        # than the reached stage are ignored (documented incremental
        # semantics)
        for ts, et in sorted(events):
            # one event advances at most one stage
            if stage + 1 >= n_steps or et != steps[stage + 1]:
                continue
            qualifies = stage < 0 or ts > reach_ts
            if qualifies and within_ms is not None and stage >= 0:
                qualifies = ts <= reach_ts + within_ms
            if qualifies:
                stage += 1
                reach_ts = ts
                rows.append((key[0], stage, steps[stage], ts))
        if stage >= 0:
            state.update((key[0], stage, reach_ts))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user", "stage", "event_type", "reach_ts"]
            )

    return fn


def funnel_stream(
    stream: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming face of operators/analytics.py:funnel — a per-user
    stage machine in ``applyInPandasWithState``: state is (furthest
    stage, its reach epoch-millis), each advance emits one changelog row
    (user, stage, event_type, reach_ts). ``within_seconds`` adds the
    conversion-window rule of the batch operator.

    Semantics: EXACTLY the batch funnel when each user's step events
    arrive in event-time order across micro-batches (within a batch,
    events replay in event-time order regardless of arrival). A
    cross-batch straggler older than the already-reached stage is
    ignored — the standard incremental-funnel caveat, documented rather
    than silently wrong: stage advances are monotone, so the stream
    never needs retractions. State per user is two integers — millions
    of users fit one state store comfortably (contrast the batch form,
    which re-aggregates per step; the stream form pays O(1) per
    event)."""
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(user_col).cast("string").alias("user"),
        F.col(type_col).cast("string").alias("event_type"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("ts")
        if dict(stream.dtypes)[ts_col] == "timestamp"
        else F.col(ts_col).cast("long").alias("ts"),
    )
    within_ms = None if within_seconds is None else within_seconds * 1000
    return normalized.groupBy("user").applyInPandasWithState(
        _advance_funnel(list(steps), within_ms),
        outputStructType="user STRING, stage INT, event_type STRING, reach_ts LONG",
        stateStructType="user STRING, stage INT, reach_ts LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _advance_transitions():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_type, last_ts, last_seq = None, -1, -1
        if state.exists:
            last_type, last_ts, last_seq = (
                state.get[1], state.get[2], state.get[3]
            )
        events = []
        for pdf in pdfs:
            for et, ts, seq in zip(pdf["event_type"], pdf["ts"], pdf["seq"]):
                events.append((int(ts), int(seq), str(et)))
        rows = []
        for ts, seq, et in sorted(events):
            # cross-batch stragglers older than the carried tail are
            # dropped (same incremental caveat as funnel_stream)
            if (ts, seq) <= (last_ts, last_seq) and last_type is not None:
                continue
            if last_type is not None:
                rows.append((key[0], last_type, et, ts))
            last_type, last_ts, last_seq = et, ts, seq
        state.update((key[0], last_type, last_ts, last_seq))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user", "from_type", "to_type", "ts"]
            )

    return fn


def transition_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Streaming face of operators/analytics.py:transition_matrix — a
    per-user adjacency tracker in ``applyInPandasWithState``: state is
    the tail event (type, ts, seq), each arriving event emits one
    (user, from_type, to_type, ts) changelog row, and a streaming
    ``groupBy(from_type, to_type).count()`` downstream maintains the
    live matrix. Within a batch, events replay in (ts, seq) order;
    cross-batch stragglers older than the carried tail are dropped —
    exactly the batch matrix when each user's events arrive in order
    (the funnel_stream contract). State per user is one event —
    O(users), not O(events)."""
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(user_col).cast("string").alias("user"),
        F.col(type_col).cast("string").alias("event_type"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("ts")
        if dict(stream.dtypes)[ts_col] == "timestamp"
        else F.col(ts_col).cast("long").alias("ts"),
        F.col(seq_col).cast("long").alias("seq"),
    )
    return normalized.groupBy("user").applyInPandasWithState(
        _advance_transitions(),
        outputStructType=(
            "user STRING, from_type STRING, to_type STRING, ts LONG"
        ),
        stateStructType="user STRING, last_type STRING, ts LONG, seq LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
