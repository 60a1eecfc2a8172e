"""Event-time windowed aggregations with watermarks (Structured Streaming).

The reference has no event-time windows — its only notion of time is the
processing-time staleness check and TTL (SURVEY §2.8) — but a streaming
engine over event feeds needs the standard trio: tumbling/sliding window
aggregation under a watermark that bounds state and drops late data. The
batch battery (``plans/windows_battery.py``) pins the aggregate semantics
against the DuckDB oracle; this module is the STREAMING face of the same
aggregates: ``readStream → withWatermark → groupBy(window) → writeStream``
in append mode, where a window's row emits exactly once, after the
watermark passes its end.

At scale the watermark is what keeps state bounded: window state older
than (watermark delay + window length) is evicted, so state size tracks
the event-rate × delay product, not the stream's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling (or sliding, with ``slide``) window counts +
    value sums per ``key_col`` — the streaming twin of the batch
    ``q_window_tumbling``/``q_window_sliding`` queries.

    Works on both batch and streaming frames (same plan); on a streaming
    frame in append output mode a result row is FINAL: it emits once the
    watermark passes the window end, and events arriving later than
    ``watermark`` behind the observed max event time are dropped.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked session windows (gap-based, per key) — the streaming
    twin of batch ``q_window_session``. Sessions merge as events arrive
    and finalize once the watermark passes the session end + gap; state
    per key is bounded by the watermark delay."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def run_parquet_stream(
    spark,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    transform,
):
    """Shared runner: parquet-directory stream → ``transform`` → parquet
    sink in append mode (the sink that actually supports checkpoint
    recovery, unlike ``memory``). Returns the StreamingQuery;
    ``availableNow`` drains what's present and stops, and the checkpoint
    carries watermark + operator state across restarts."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        transform(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_windowed_stream(
    spark,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
):
    """Windowed aggregation over a parquet stream (append mode: finalized
    windows only); the checkpoint carries the watermark across restarts —
    the property the late-data test pins."""
    return run_parquet_stream(
        spark,
        source_dir,
        schema,
        sink_dir,
        checkpoint_dir,
        lambda stream: windowed_event_counts(
            stream,
            ts_col=ts_col,
            window_duration=window_duration,
            slide=slide,
            watermark=watermark,
        ),
    )
