"""Event-time windowed aggregation under a watermark: append-mode rows are
final (emitted once the watermark passes the window end), the watermark
survives restarts via the checkpoint, and data later than the watermark is
DROPPED — the semantics the 100 TB streaming path depends on to keep
state bounded."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_gtfs_duckdb_spark.streaming.windows import (
    run_windowed_stream,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = dt.datetime(2025, 1, 1, 0, 0, 0)


def _rows(spec):
    """spec: list of (event_id, type, minutes_offset, value)."""
    return [
        (i, k, BASE + dt.timedelta(minutes=m), float(v)) for i, k, m, v in spec
    ]


def _write(spark, path, spec):
    spark.createDataFrame(_rows(spec), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_append_emits_only_watermark_closed_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    # events spanning 4 hours; watermark 2h behind max(ts)=04:00 → 02:00;
    # only windows ending at or before 02:00 are final
    _write(
        spark,
        src,
        [
            (1, "click", 10, 1.0),
            (2, "click", 70, 2.0),
            (3, "view", 130, 3.0),
            (4, "view", 240, 4.0),  # advances watermark to 02:00
        ],
    )
    sink = str(tmp_path / "sink")
    q = run_windowed_stream(
        spark, src, SCHEMA, sink, str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark="2 hours",
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute + r["window_start"].hour * 60, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(0, "click"): 1, (60, "click"): 1}, got


def test_late_data_beyond_watermark_dropped_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(
        spark,
        src,
        [
            (1, "click", 0, 1.0),
            (2, "click", 30, 1.0),
            (3, "view", 300, 1.0),  # max ts 05:00 → watermark 03:00 after batch 1
        ],
    )
    sink = str(tmp_path / "sink")
    q = run_windowed_stream(spark, src, SCHEMA, sink, ckpt)
    q.awaitTermination(120)
    first = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(sink).collect()
    }
    # the 00:00-01:00 click window closed with BOTH rows
    assert first[(0, "click")] == (2, 2.0)

    # restart with a LATE click at 00:45 (behind the checkpointed 03:00
    # watermark → dropped) and a fresh event at 09:00 that advances the
    # watermark to 07:00, past the buffered 05:00-06:00 view window's end
    _write(spark, src, [(4, "click", 45, 99.0), (5, "view", 540, 1.0)])
    q2 = run_windowed_stream(spark, src, SCHEMA, sink, ckpt)
    q2.awaitTermination(120)
    # rows appended in run 2 = full sink minus run-1 rows
    second = [
        r for r in spark.read.parquet(sink).collect()
        if (r["window_start"].hour, r["event_type"]) not in first
    ]
    for r in second:
        assert not (
            r["window_start"].hour == 0 and r["event_type"] == "click"
        ), f"late row re-opened a closed window: {r}"
    # the buffered 05:00-06:00 view window finalizes with its run-1 row
    # only — the late click never entered it
    hours = {(r["window_start"].hour, r["event_type"]) for r in second}
    assert (5, "view") in hours, hours


def test_streaming_agg_matches_batch_on_closed_windows(spark, tmp_path):
    """Differential: append-mode streaming output == the batch plan over
    the same data restricted to watermark-closed windows."""
    src = str(tmp_path / "src")
    spec = [
        (i, ["click", "view", "purchase"][i % 3], 7 * i, float(i % 5)) for i in range(60)
    ]
    _write(spark, src, spec)
    sink = str(tmp_path / "sink")
    q = run_windowed_stream(
        spark, src, SCHEMA, sink, str(tmp_path / "ckpt"),
        window_duration="30 minutes", watermark="1 hour",
    )
    q.awaitTermination(120)
    batch_df = spark.createDataFrame(_rows(spec), SCHEMA)
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=1)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(
            batch_df, window_duration="30 minutes", watermark="1 hour"
        ).collect()
        if r["window_end"] <= cutoff
    }
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == expected


def test_streaming_session_windows_merge_and_finalize(spark, tmp_path):
    """Session windows: events within the gap merge into one session; the
    session finalizes (append emission) once the watermark passes its end."""
    from py_gtfs_duckdb_spark.streaming.windows import session_window_counts

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    # user 1: events at 00:00, 00:10, 00:40 (gap 30m -> ONE session 00:00-01:10)
    # user 2: single event at 00:05 (session 00:05-00:35)
    # sentinel at 06:00 advances the watermark (2h) to 04:00 -> both finalize
    spec = [
        (1, "click", 0, 1.0),
        (2, "click", 10, 1.0),
        (3, "click", 40, 1.0),
        (4, "view", 5, 1.0),
        (5, "view", 360, 1.0),
    ]
    rows = [
        (i, k, BASE + dt.timedelta(minutes=m), float(v), 1 if k == "click" else 2)
        for i, k, m, v in spec
    ]
    schema = T.StructType(
        SCHEMA.fields + [T.StructField("user_id", T.IntegerType())]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    agg = session_window_counts(
        spark.readStream.schema(schema).parquet(src), gap="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(1, 0): 3, (2, 5): 1}, got


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    """Ingest-time exact dedup: duplicates within the watermark horizon
    are suppressed; a duplicate arriving after its original aged past the
    watermark is re-admitted (state is BOUNDED — the property that makes
    this viable at firehose scale), with the batch dedup battery as the
    downstream exactness backstop."""
    from py_gtfs_duckdb_spark.streaming.stateful import run_dedup_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # run 1: digest d1 twice within the horizon + a watermark-advancing row
    _write(
        spark,
        src,
        [
            (1, "d1", 0, 1.0),
            (2, "d1", 5, 2.0),    # duplicate digest, 5 min later: dropped
            (3, "d2", 10, 3.0),
            (4, "zz", 240, 4.0),  # advances watermark to 02:00
        ],
    )
    q = run_dedup_stream(
        spark, src, SCHEMA, sink, ckpt,
        key_cols=["event_type"], ts_col="ts", watermark="2 hours",
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r["event_type"] for r in rows) == ["d1", "d2", "zz"]
    assert {r["event_id"] for r in rows if r["event_type"] == "d1"} == {1}

    # run 2: d1 again at 05:00 — its original (00:00) aged past the
    # watermark horizon, state evicted, row re-admitted
    _write(spark, src, [(5, "d1", 300, 5.0)])
    q = run_dedup_stream(
        spark, src, SCHEMA, sink, ckpt,
        key_cols=["event_type"], ts_col="ts", watermark="2 hours",
    )
    q.awaitTermination(120)
    d1_rows = [
        r["event_id"]
        for r in spark.read.parquet(sink).collect()
        if r["event_type"] == "d1"
    ]
    assert sorted(d1_rows) == [1, 5], d1_rows
