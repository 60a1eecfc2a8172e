"""Event-table battery: windowed aggregations, sessionization, keyed-state
snapshots, retention — the batch-checkable faces of SURVEY.md §2.8's
streaming semantics, plus pivot/unpivot reshaping.

The reference has NO event-time windows (state is keyed by entity id only);
these are part of the streaming surface a lake engine must offer
(SURVEY §7 phase 5). Batch formulations here are oracle-checked; the live
Structured Streaming forms live in ``streaming/`` with their own tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from py_gtfs_duckdb_spark.plans import query
from py_gtfs_duckdb_spark.plans._tables import t


@query(
    "q_window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (Structured Streaming's
    ``F.window``; epoch-aligned so it equals date_trunc('hour'))."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_window_sliding",
    oracle="""
    WITH b AS (
        SELECT event_id, value, epoch_ms(ts) // 1800000 AS bucket FROM events
    ), assigned AS (
        SELECT make_timestamp(bucket * 1800 * 1000000) AS window_start, value
        FROM b
        UNION ALL
        SELECT make_timestamp((bucket - 1) * 1800 * 1000000) AS window_start, value
        FROM b
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM assigned GROUP BY window_start
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: width 1 h, slide 30 min — every event lands in two
    windows. Spark expresses it natively (``F.window(ts, '1 hour',
    '30 minutes')``); the oracle materializes the same window assignment by
    hand."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# Shared by q_window_trailing (single-window form) and
# q_window_trailing_chunked (lookback-spill bounded form): identical
# rows, one oracle.
_TRAILING_ORACLE = """
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trail_1h,
           floor((AVG(value) OVER w) * 10000.0 + 0.5) / 10000.0
               AS avg_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """


@query("q_window_trailing", oracle=_TRAILING_ORACLE)
def q_window_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour aggregate (count + mean value of the
    same user's events in [ts − 1h, ts]) — the RANGE-frame window class
    the tumbling/sliding/session entries don't cover; the feature a
    rate-limiter or rolling-quality monitor reads per event. Frame math
    is integer MICROseconds on both engines (unix_micros ordering vs
    DuckDB's INTERVAL arithmetic — millisecond ordering would disagree
    with the oracle on sub-ms boundary peers). The window keys on
    user_id under the entity-bounded allowlist contract; when that
    breaks, the shifted-copy chunked form applies (duplicate each event
    into the next chunk when within the lookback of its boundary, window
    per (user, chunk), keep home-chunk rows — same recipe as
    sessionize_chunked, lookback-bounded instead of gap-bounded)."""
    from py_gtfs_duckdb_spark.functions import pround

    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trail_1h"),
        pround(F.avg("value").over(w), 4).alias("avg_value_1h"),
    )


@query("q_window_trailing_chunked", oracle=_TRAILING_ORACLE)
def q_window_trailing_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME trailing aggregate as q_window_trailing, computed with
    the shifted-copy bounded plan (operators/temporal.py:
    lookback_chunks): rows within the 1h lookback of their 6h chunk's
    end are duplicated into the next chunk, the RANGE window partitions
    by (user_id, chunk) — bounded by chunk+lookback worth of ONE user's
    events — and only home rows emit. The third chunked twin (after
    session carry and as-of handoff), hash-checked against the
    single-window oracle."""
    from py_gtfs_duckdb_spark.functions import pround
    from py_gtfs_duckdb_spark.operators.temporal import lookback_chunks

    e = t(spark, sf_dir, "events")
    lb = 3_600_000_000  # 1h in micros
    u = lookback_chunks(e, "ts", lookback_us=lb, chunk_us=6 * lb)
    w = (
        W.partitionBy("user_id", "__chunk")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-lb, 0)
    )
    return (
        u.select(
            "event_id",
            "user_id",
            "ts",
            "__home",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_trail_1h"),
            pround(F.avg("value").over(w), 4).alias("avg_value_1h"),
        )
        .filter(F.col("__home"))
        .drop("__home")
    )


# Shared by q_window_session (single-window form) and
# q_window_session_chunked (bounded chunked-carry form): the two plans
# must produce IDENTICAL rows, so they hash against the same oracle.
_SESSION_ORACLE = """
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id,
               SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM ordered
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_idx
    """


@query("q_window_session", oracle=_SESSION_ORACLE)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag → gap flag →
    running sum = session index → per-session aggregate. One shuffle on
    user_id serves both window and aggregation. (Streaming form:
    ``F.session_window`` — see streaming/.)"""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    is_new = (
        F.when(gap_ms > 1800000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    return (
        e.withColumn("is_new_session", is_new)
        .withColumn(
            "session_idx",
            F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query("q_window_session_chunked", oracle=_SESSION_ORACLE)
def q_window_session_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sessionization as q_window_session, computed with the
    chunked-carry plan (operators/temporal.py:sessionize_chunked): local
    windows bounded by (user_id, 6h-chunk), boundary stitch over the
    per-chunk summary table, combinable re-aggregation — the shape to
    reach for when the entity-bounded window contract breaks (firehose
    users; the allowlist's documented escape hatch, made executable and
    hash-checked against the single-window oracle)."""
    from py_gtfs_duckdb_spark.operators.temporal import sessionize_chunked

    return sessionize_chunked(
        t(spark, sf_dir, "events"), gap_ms=1_800_000, chunk_ms=21_600_000
    )


@query(
    "q_stream_dedup_latest",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 keyed-upsert state, batch view: latest record per key wins
    (reference ddb.py:296-332 delete-then-insert per entity id).

    Scale shape: ONE map-side-combinable ``max_by`` on the (ts, event_id)
    struct — the argmax form of the row_number window this used through
    round 8. The old window keyed on (user_id, event_type), justified as
    "entity-bounded activity", but a 100 TB event log has bot/firehose
    users with billions of rows — the same unsplittable-partition skew
    shape the dedup actions were rebuilt to avoid; partial aggregation
    reduces each map task's slice of a hot key to one candidate before
    the shuffle, so the contract no longer matters here. (The per-batch
    window in streaming/merge.py is bounded by the micro-batch, a
    different regime.) event_id is the deterministic tie-break for equal
    timestamps, matching the oracle's ORDER BY ts DESC, event_id DESC."""
    e = t(spark, sf_dir, "events")
    best = F.max_by(
        F.struct(F.col("event_id").alias("e"), F.col("ts").alias("t"),
                 F.col("value").alias("v")),
        F.struct(F.col("ts"), F.col("event_id")),
    )
    return (
        e.groupBy("user_id", "event_type")
        .agg(best.alias("__b"))
        .select(
            "user_id",
            "event_type",
            F.col("__b.e").alias("event_id"),
            F.col("__b.t").alias("ts"),
            F.col("__b.v").alias("value"),
        )
    )


@query(
    "q_ttl_retention",
    oracle="""
    SELECT event_id, ts FROM events
    WHERE ts > (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
    """,
)
def q_ttl_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 state TTL: drop state older than the review horizon (reference
    ddb.py:282-293, data_review_seconds=7200). Anchored to max(ts) so the
    check is deterministic; the scalar aggregate is broadcast, not
    collected."""
    e = t(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("__cutoff")
    )
    return (
        e.join(F.broadcast(cutoff), how="cross")
        .filter(F.col("ts") > F.col("__cutoff"))
        .select("event_id", "ts")
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT), 0) AS click,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT), 0) AS view,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT), 0) AS purchase,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT), 0) AS signup,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT), 0) AS error
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user over a FIXED value list (unfixed pivot
    needs a pre-pass to enumerate values — an extra job at scale)."""
    e = t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(k) for k in kinds],
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) three measure columns into long form — narrow
    transform, no shuffle."""
    l = t(spark, sf_dir, "lineitem")
    return l.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (metric, val)",
    )


# ---------------------------------------------------------------------------
# event-sequence analytics (operators/analytics.py — funnel, cohort
# retention, gap-filled resample): the classic event-table trio every
# warehouse layer grows; none exist in the reference (its state is keyed
# by entity id only, SURVEY §2.8) and Spark has no built-in for any.
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators import analytics as AN  # noqa: E402


@query(
    "q_event_funnel",
    # step-k CTE chain: each stage is MIN(ts) of that step's events
    # STRICTLY AFTER the user's previous-stage reach time — the same
    # deterministic ordering rule the Spark operator applies.
    oracle="""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND e.ts > s0.t
        GROUP BY e.user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t
        GROUP BY e.user_id
    )
    SELECT CAST(0 AS BIGINT) AS step, 'signup' AS event_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS users
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'click',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: users
    reaching each step strictly after their previous-step reach time
    (operators/analytics.py:funnel). Per-step state is ONE row per user
    — the aggregates bound state before any join, so per-user event
    skew never amplifies; every shuffle keys on user_id and AQE
    broadcasts the shrinking reached-set as the funnel narrows."""
    e = t(spark, sf_dir, "events")
    return AN.funnel(e, ["signup", "click", "purchase"])


@query(
    "q_cohort_retention",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) / 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: distinct users per (first-event
    ISO week, week offset) cell (operators/analytics.py:
    cohort_retention). Two co-partitioned aggregations; the distinct is
    Spark's partial-aggregating two-phase count, so only the small cell
    matrix crosses the final exchange. The DATE week formats to its ISO
    string for the hash (the driver compare's dtype convention)."""
    e = t(spark, sf_dir, "events")
    return AN.cohort_retention(e).withColumn(
        "cohort_week", F.date_format("cohort_week", "yyyy-MM-dd")
    )


@query(
    "q_resample_gapfill",
    # 1e-4 fixed-point quantization BEFORE the daily sum (BIGINT,
    # order-independent) — only the final /10000.0 is float, the same
    # IEEE op both sides. last_value IGNORE NULLS over the per-user
    # day spine = Spark's last(ignorenulls) running window.
    oracle="""
    WITH b AS (
        SELECT CAST(MIN(ts) AS DATE) AS mn, CAST(MAX(ts) AS DATE) AS mx
        FROM events
    ), u AS (
        SELECT DISTINCT user_id FROM events
    ), spine AS (
        SELECT u.user_id,
               CAST(unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM u, b
    ), daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS dv
        FROM events GROUP BY 1, 2
    )
    SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
           last_value(d.dv IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day) / 10000.0
               AS value_ffill
    FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user resample with forward fill over a dense day spine
    (operators/analytics.py:resample_gapfill): the gap-fill shape time-
    series stores call ``time_bucket_gapfill``/``locf``. The spine is
    built distributedly (broadcast 1-row bounds x distinct users,
    explode(sequence)); the fill is a running last(ignorenulls) window
    PARTITIONED BY USER — O(1) frame, partition bounded by one user's
    day range (allowlisted in plans.WINDOW_PARTITION_ALLOWLIST)."""
    e = t(spark, sf_dir, "events")
    return AN.resample_gapfill(e).withColumn(
        "day", F.date_format("day", "yyyy-MM-dd")
    )


@query(
    "q_event_funnel_window",
    # the same step-k CTE chain as q_event_funnel with the conversion
    # window added: each stage must land within 2 days (inclusive) of
    # the previous stage's reach time
    oracle="""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND e.ts > s0.t
          AND e.ts <= s0.t + INTERVAL 2 DAY
        GROUP BY e.user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t
          AND e.ts <= s1.t + INTERVAL 2 DAY
        GROUP BY e.user_id
    )
    SELECT CAST(0 AS BIGINT) AS step, 'signup' AS event_type,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS users
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'click',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
    """,
)
def q_event_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel with a CONVERSION WINDOW — each step must land within
    2 days of the previous step's reach time (the "converted within N
    days" form every funnel tool offers; unlike q_event_funnel, which
    all 150 synthetic users eventually complete, the window makes the
    stages discriminate). Same bounded per-step state shape."""
    e = t(spark, sf_dir, "events")
    return AN.funnel(
        e, ["signup", "click", "purchase"], within_seconds=2 * 86400
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH o AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS transitions
    FROM o WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences (operators/analytics.py:transition_matrix) — the
    journey-map / next-event-prediction aggregate. LEAD window keys on
    user_id (entity-bounded, allowlisted); the count is a map-side-
    combined groupBy over the types-squared matrix."""
    e = t(spark, sf_dir, "events")
    return AN.transition_matrix(e)


@query(
    "q_funnel_time_to_convert",
    # Spark percentile(x, 0.5) interpolates identically to DuckDB
    # quantile_cont (the q_quantile_tokens precedent); gaps stay integer
    # epoch-micros until the shared fixed-order float epilogue
    oracle="""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t, s0.t AS prev_t
        FROM events e JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'click' AND e.ts > s0.t
        GROUP BY e.user_id, s0.t
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t, s1.t AS prev_t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t
        GROUP BY e.user_id, s1.t
    )
    SELECT CAST(1 AS BIGINT) AS step, 'click' AS event_type,
           CAST(COUNT(*) AS BIGINT) AS users,
           floor(quantile_cont(epoch_us(t) - epoch_us(prev_t), 0.5)
                 / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS median_gap_s
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT),
           floor(quantile_cont(epoch_us(t) - epoch_us(prev_t), 0.5)
                 / 1000000.0 * 10000.0 + 0.5) / 10000.0
    FROM s2
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time-to-convert per funnel stage (operators/analytics.py:
    funnel_times) — the stall-diagnosis half of funnel analytics. The
    previous reach time rides through the per-user aggregate, so no
    extra join; the median aggregates one BIGINT gap per converted
    user."""
    e = t(spark, sf_dir, "events")
    return AN.funnel_times(e, ["signup", "click", "purchase"])


@query(
    "q_rolling_distinct",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), expanded AS (
        SELECT user_id,
               CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS wday
        FROM days
    ), b AS (
        SELECT CAST(MIN(ts) AS DATE) AS mn, CAST(MAX(ts) AS DATE) AS mx
        FROM events
    )
    SELECT CAST(wday AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM expanded, b WHERE wday BETWEEN mn AND mx
    GROUP BY wday
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives per day — the WAU curve
    (operators/analytics.py:rolling_distinct). Events collapse to
    distinct (user, day) before anything else, each active-day explodes
    into the 7 window ends it serves, and a two-phase distinct count
    finishes — no window function, exchange bounded by 7x daily
    actives."""
    e = t(spark, sf_dir, "events")
    return AN.rolling_distinct(e, window_days=7)
