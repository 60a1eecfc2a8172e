"""Event-sequence analytics: ordered funnel, cohort retention, and
time-spine gap-fill resampling.

These are the three classic event-table operators every warehouse query
layer grows (Mixpanel/Amplitude-style funnels, weekly retention
matrices, forward-filled daily rollups), expressed in the shapes that
survive 100 TB:

- :func:`funnel` resolves the ordered-step dependency with one
  ``groupBy(user).min`` per step plus a co-partitioned join back —
  NEVER a per-user ``collect_list`` walk. Per-step state is one row per
  user, so a bot user with 10M raw events costs the same as a human
  with 10: the aggregates bound the state before any join happens, and
  every shuffle is on the user key (AQE broadcasts the shrinking
  reached-set as steps progress). Cost: k small hash aggregates over
  the FILTERED step events, not k passes over the raw table — the
  step-type filters prune at the scan.
- :func:`cohort_retention` is two co-partitioned aggregations (first
  event per user, then distinct users per (cohort, offset) cell); the
  distinct is Spark's partial-aggregating two-phase count, so the cell
  matrix — thousands of rows — is the only thing that crosses the
  final exchange.
- :func:`resample_gapfill` builds the dense (user x day) spine from a
  1-row global bounds frame broadcast onto the distinct-user set and
  ``explode(sequence(...))`` — no driver-side date loop — and
  forward-fills with a running ``last(ignorenulls)`` window PARTITIONED
  BY USER: frames are O(1) running accumulators, partitions are
  bounded by one user's day range, never the whole table
  (plans.WINDOW_PARTITION_ALLOWLIST documents the boundedness).

Parity with the DuckDB oracles follows the repo's integer-quantization
convention: summed metrics quantize to BIGINT fixed-point per row
BEFORE aggregation (order-independent, engine-exact); only the final
scalar division back to a float happens on both sides in the same IEEE
operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: how many users reached step i having
    reached steps 0..i-1 first, in strict timestamp order.

    A user "reaches" step 0 at their earliest ``steps[0]`` event, and
    step i>0 at their earliest ``steps[i]`` event STRICTLY AFTER their
    step i-1 reach time (equal timestamps do not qualify — the
    deterministic tie rule the oracle mirrors). With ``within_seconds``
    each step must additionally land within that many seconds of the
    previous step's reach time (inclusive) — the "converted within 7
    days" form every funnel tool offers. Returns one row per step:
    ``step`` (BIGINT ordinal), ``event_type``, ``users`` (BIGINT count
    of users that reached it).
    """
    assert steps, "funnel needs at least one step"
    reached: DataFrame | None = None
    counts: list[DataFrame] = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(user_col, ts_col)
        if reached is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            # reached is one row per user — joins co-partitioned on the
            # user key (or broadcast by AQE as the funnel narrows)
            qualifies = F.col(ts_col) > F.col("__t_prev")
            if within_seconds is not None:
                qualifies = qualifies & (
                    F.col(ts_col)
                    <= F.col("__t_prev")
                    + F.make_interval(secs=F.lit(float(within_seconds)))
                )
            cur = (
                ev.join(reached, user_col)
                .filter(qualifies)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                F.col("users"),
            )
        )
        reached = cur.withColumnRenamed("__t", "__t_prev")
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the ISO week of
    their FIRST event (the cohort), counted distinctly in every later
    week they appear. Returns ``cohort_week`` (DATE, Monday),
    ``week_offset`` (BIGINT, 0 = the cohort week itself), ``users``
    (BIGINT distinct count)."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = first.select(
        user_col,
        F.date_trunc("week", "__first_ts").cast("date").alias("cohort_week"),
    )
    act = events.select(
        user_col, F.date_trunc("week", ts_col).cast("date").alias("__week")
    )
    return (
        act.join(cohort, user_col)
        # datediff between two week-truncated dates is an exact multiple
        # of 7 — the division is lossless before the BIGINT cast
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(__week, cohort_week) / 7 AS BIGINT)"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("users"))
    )


def resample_gapfill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 10000,
) -> DataFrame:
    """Daily resample with forward fill: a dense per-user day spine over
    the table's global date range, each day carrying that user's daily
    value sum, gaps carrying the most recent preceding day's sum (null
    before the user's first active day). Returns ``user_id``, ``day``
    (DATE), ``value_ffill`` (DOUBLE, 4-decimal fixed point).

    The per-row values quantize to BIGINT 1e-4 fixed point before the
    daily sum so aggregation order can never perturb the fill (the
    repo's oracle-exactness convention); the spine is built
    distributedly from a broadcast 1-row bounds frame and
    ``explode(sequence())`` per user row."""
    day = F.to_date(ts_col)
    vq = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    daily = (
        events.select(F.col(user_col), day.alias("day"), vq.alias("__vq"))
        .groupBy(user_col, "day")
        .agg(F.sum("__vq").alias("__dv"))
    )
    bounds = events.agg(
        F.min(day).alias("__mn"), F.max(day).alias("__mx")
    )
    spine = (
        events.select(user_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            user_col, F.explode(F.sequence("__mn", "__mx")).alias("day")
        )
    )
    w = Window.partitionBy(user_col).orderBy("day")
    return spine.join(daily, [user_col, "day"], "left").select(
        user_col,
        "day",
        (F.last("__dv", ignorenulls=True).over(w) / float(scale)).alias(
            "value_ffill"
        ),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: (from_type, to_type, transitions BIGINT) — the
    next-event-prediction / journey-map aggregate. Adjacency is resolved
    with a LEAD window PARTITIONED BY USER ordered by (ts, seq) — the
    entity-bounded allowlist contract: a partition is one user's events,
    the frame is O(1), and the downstream count is a map-side-combined
    groupBy over the types² matrix, never the event stream."""
    w = Window.partitionBy(user_col).orderBy(ts_col, seq_col)
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert per funnel stage: for every step i>0, how many
    users reached it and the MEDIAN seconds between their step i-1 and
    step i reach times — the other half of funnel analytics (the count
    says where users drop off; the gap says where they stall).

    Same bounded per-step state as :func:`funnel` — the reach frame
    carries the previous reach time through the per-user aggregate
    (``groupBy(user, prev)`` is sound because prev is functionally
    dependent on the user within a step), so the gap is available
    without any extra join. The median interpolates identically in
    Spark ``percentile`` and DuckDB ``quantile_cont`` (the
    q_quantile_tokens precedent); gaps stay integer microseconds until
    the single fixed-order float epilogue."""
    assert len(steps) >= 2, "funnel_times needs at least two steps"
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    outs: list[DataFrame] = []
    for i, step in enumerate(steps[1:], start=1):
        ev = events.filter(F.col(type_col) == step).select(user_col, ts_col)
        cur = (
            ev.join(
                reached.select(user_col, F.col("__t").alias("__t_prev")),
                user_col,
            )
            .filter(F.col(ts_col) > F.col("__t_prev"))
            .groupBy(user_col, "__t_prev")
            .agg(F.min(ts_col).alias("__t"))
        )
        gap_us = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__t_prev"))
        outs.append(
            cur.select(gap_us.alias("__gap"))
            .agg(
                F.count(F.lit(1)).alias("users"),
                F.percentile(F.col("__gap"), F.lit(0.5)).alias("__med_us"),
            )
            .select(
                F.lit(i).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                "users",
                (
                    F.floor(
                        F.col("__med_us") / 1000000.0 * 10000.0 + F.lit(0.5)
                    )
                    / 10000.0
                ).alias("median_gap_s"),
            )
        )
        reached = cur.select(user_col, "__t")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def rolling_distinct(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling N-day distinct actives per day (the WAU/MAU curve): for
    every day in the table's range, how many distinct users had at least
    one event in the N-day window ENDING that day. Returns ``day``
    (yyyy-MM-dd string, the hash convention) and ``wau`` (BIGINT).

    Shape: raw events first collapse to DISTINCT (user, day) — the only
    pass over the stream — then each active-day row explodes into the N
    window-end days it contributes to, and a two-phase distinct count
    aggregates per day. The exchange carries N x daily-active rows,
    never events; no window function, so no per-day sort and nothing
    keyed on an unbounded partition."""
    day = F.to_date(ts_col)
    days = events.select(F.col(user_col), day.alias("__day")).distinct()
    bounds = events.agg(F.min(day).alias("__mn"), F.max(day).alias("__mx"))
    expanded = days.select(
        user_col,
        F.explode(
            F.sequence(
                F.col("__day"), F.date_add(F.col("__day"), window_days - 1)
            )
        ).alias("__wday"),
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("__wday").between(F.col("__mn"), F.col("__mx")))
        .groupBy("__wday")
        .agg(F.countDistinct(user_col).alias("wau"))
        .select(F.date_format("__wday", "yyyy-MM-dd").alias("day"), "wau")
    )
