"""Temporal joins Spark lacks as built-ins: as-of join (nearest preceding
/ following event per key) and binned range join.

The as-of join is THE time-series primitive (pandas ``merge_asof``,
DuckDB ``ASOF JOIN``, kdb ``aj``): for every probe row, the single build
row with the largest build.ts <= probe.ts (backward) or smallest
build.ts >= probe.ts (forward) within the same key. Spark has no native
operator; the naive formulation (inequality join + row_number) explodes
to O(probe x build) pairs per key before pruning.

This implementation is the union-sort shape: tag both sides, union,
sort within key by (ts, side, seq), and carry the last (first) non-null
build payload STRUCT across a running window frame. Cost: ONE shuffle of
probe+build rows on the key — no pair materialization, no skew
amplification (a key's cost is |probe|+|build|, not |probe|x|build|),
and the window frame is a running accumulator (O(1) per row). At 100 TB
this is the plan you'd hand-write: co-partition by key, sort-merge
within partition. The payload travels as ONE struct so a null inside a
build column can never mix fields from different build rows.

Deterministic tie-breaks (and the DuckDB oracle mirrors them):
- build rows at exactly probe.ts DO match (inclusive, like merge_asof);
- among build rows sharing the same ts, backward picks the largest
  ``seq`` (latest-written wins), forward the smallest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    by: str,
    build_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: every ``probe`` row, plus ``build_cols`` from its
    nearest ``build`` row in time (null columns when no build row
    qualifies). ``on`` is the ordering (timestamp) column present in both
    sides; ``by`` the equality key; ``build_cols[0]`` must be a unique
    build ordinal (the deterministic tie-break seq).

    ``tolerance_seconds`` additionally requires |probe.ts - build.ts| <=
    tolerance; it needs ``on`` itself in ``build_cols`` so the matched ts
    is available. Since the nearest match is found first, exceeding the
    tolerance means NO match exists, so the payload nulls out — exactly
    pandas ``merge_asof(tolerance=...)``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if tolerance_seconds is not None and on not in build_cols:
        raise ValueError(
            "asof_join: tolerance requires the build ts column in build_cols"
        )
    backward = direction == "backward"
    probe_cols = probe.columns
    u, p_side = _asof_union(probe, build, on, by, build_cols, backward)

    order = [F.col(on).asc(), F.col("__side").asc(), F.col("__seq").asc()]
    if backward:
        w = (
            Window.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__b", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__b", ignorenulls=True).over(w)

    matched = u.select(
        *probe_cols, "__side", carried.alias("__m")
    ).filter(F.col("__side") == p_side)
    return _asof_project(
        matched, probe, on, probe_cols, build_cols, tolerance_seconds, suffix
    )


def _asof_union(probe, build, on, by, build_cols, backward):
    """The tagged union frame both as-of variants sort: probe rows carry a
    null payload; build rows pack ``build_cols`` into ONE struct (so a
    null inside a payload column can never mix fields across build rows).
    Side ordering makes equal-ts build rows fall INSIDE the probe row's
    frame (inclusive semantics) for either direction. Returns (frame,
    probe_side_tag)."""
    seq = build_cols[0]
    probe_cols = probe.columns
    b = build.select(
        F.col(by),
        F.col(on),
        F.struct(*[F.col(c) for c in build_cols]).alias("__b"),
    )
    p_side, b_side = (1, 0) if backward else (0, 1)
    u = probe.select(
        *probe_cols,
        F.lit(p_side).alias("__side"),
        F.lit(None).cast(b.schema["__b"].dataType).alias("__b"),
        F.lit(None).cast(build.schema[seq].dataType).alias("__seq"),
    ).unionByName(
        b.select(
            *[
                F.col(c) if c in (by, on)
                else F.lit(None).cast(probe.schema[c].dataType).alias(c)
                for c in probe_cols
            ],
            F.lit(b_side).alias("__side"),
            F.col("__b"),
            F.col("__b").getField(seq).alias("__seq"),
        )
    )
    return u, p_side


def _asof_project(matched, probe, on, probe_cols, build_cols, tolerance_seconds, suffix):
    """Tolerance gating + payload unpacking shared by both as-of plans."""
    m = F.col("__m")
    if tolerance_seconds is not None:
        # integer-microsecond math for timestamps (exact at the boundary —
        # a double epoch division could round across it); double math for
        # plain numeric ordering columns
        if isinstance(probe.schema[on].dataType, TimestampType):
            gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(m.getField(on)))
            limit = F.lit(int(round(tolerance_seconds * 1_000_000)))
        else:
            gap = F.abs(F.col(on).cast("double") - m.getField(on).cast("double"))
            limit = F.lit(float(tolerance_seconds))
        m = F.when(gap <= limit, F.col("__m"))
    return matched.select(
        *probe_cols,
        *[m.getField(c).alias(f"{c}{suffix}") for c in build_cols],
    )


def asof_join_chunked(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    by: str,
    build_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_matched",
    chunk_ms: int = 21_600_000,
) -> DataFrame:
    """:func:`asof_join` with BOUNDED window partitions — the
    chunked-carry form for when the entity-bounded contract behind
    ``partitionBy(by)`` breaks (a firehose key's union frame would sort
    in one task; see plans/__init__.py's allowlist notes). Same rows,
    same tie-breaks, same tolerance semantics as :func:`asof_join`.

    Shape (backward; forward is the mirror):

    1. LOCAL carry per (key, time-chunk): the running
       ``last(payload, ignorenulls)`` window, partitioned by (by, chunk)
       — each partition holds at most ``chunk_ms`` of ONE key's
       probe+build rows.
    2. Chunk-final payloads WITHOUT a window: ``max_by(payload,
       (ts, seq))`` per (key, chunk) — map-side combinable (probe rows
       carry a null ordering key, which max_by ignores).
    3. Cross-chunk handoff over the per-(key, chunk) SUMMARY (one row
       per active chunk): ``last(final_payload, ignorenulls)`` over
       chunks strictly before c — a lag-window on a TIME-bounded frame.
       Unlike sessionization there is no adjacency condition: an as-of
       carry reaches back arbitrarily far, so the handoff is simply the
       latest non-empty chunk's final payload.
    4. Row result = ``coalesce(local carry, incoming handoff)``, then
       the shared tolerance/unpack projection.

    ``chunk_ms`` is in milliseconds for timestamp ``on`` columns, and in
    the column's own units for plain numeric ordering columns."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join_chunked: unknown direction {direction!r}")
    if tolerance_seconds is not None and on not in build_cols:
        raise ValueError(
            "asof_join_chunked: tolerance requires the build ts column in "
            "build_cols"
        )
    backward = direction == "backward"
    probe_cols = probe.columns
    u, p_side = _asof_union(probe, build, on, by, build_cols, backward)
    if isinstance(probe.schema[on].dataType, TimestampType):
        chunk = F.floor(F.unix_millis(F.col(on)) / F.lit(chunk_ms))
    else:
        chunk = F.floor(F.col(on).cast("double") / F.lit(chunk_ms))
    u = u.withColumn("__chunk", chunk)

    order = [F.col(on).asc(), F.col("__side").asc(), F.col("__seq").asc()]
    ord_key = F.when(
        F.col("__b").isNotNull(),
        F.struct(F.col(on), F.col("__side"), F.col("__seq")),
    )
    w_user = Window.partitionBy(by).orderBy("__chunk")
    if backward:
        w_local = (
            Window.partitionBy(by, "__chunk")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = F.last("__b", ignorenulls=True).over(w_local)
        final = F.max_by("__b", ord_key)
        handoff = F.last("__final", ignorenulls=True).over(
            w_user.rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w_local = (
            Window.partitionBy(by, "__chunk")
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        local = F.first("__b", ignorenulls=True).over(w_local)
        final = F.min_by("__b", ord_key)
        handoff = F.first("__final", ignorenulls=True).over(
            w_user.rowsBetween(1, Window.unboundedFollowing)
        )
    summary = (
        u.groupBy(by, "__chunk")
        .agg(final.alias("__final"))
        .select(by, "__chunk", handoff.alias("__in"))
    )
    matched = (
        u.withColumn("__local", local)
        .join(summary, [by, "__chunk"])
        .select(
            *probe_cols,
            "__side",
            F.coalesce(F.col("__local"), F.col("__in")).alias("__m"),
        )
        .filter(F.col("__side") == p_side)
    )
    return _asof_project(
        matched, probe, on, probe_cols, build_cols, tolerance_seconds, suffix
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bin_width: float = 3600.0,
    sub_salts: int = 1,
) -> DataFrame:
    """Point-in-interval join without the O(points x intervals) nested
    loop Spark's planner produces for raw inequality predicates: both
    sides are assigned to fixed-width bins (intervals explode to every
    bin they overlap via ``sequence``), the join becomes an EQUI-join on
    (bin [, by]) + residual range filter, and the shuffle is hash, not
    broadcast-nested-loop. Interval end is exclusive; ``bin_width`` is in
    the column's native unit (seconds for timestamp casts).

    Scale: cost per bin is |points_in_bin| x |intervals_overlapping_bin|
    — bounded by construction when interval lengths are bounded; pick
    bin_width ~ median interval length. This is the standard distributed
    interval-join shape (bin-and-filter). A firehose (key, bin) cell is
    the residual skew shape: the triage (shrink bin_width → AQE
    skew-join → ``sub_salts``, and what each one does and does NOT fix)
    is SCALING.md §13. ``sub_salts=S`` splits each cell's POINT side S
    ways by row hash and replicates the interval side into every
    sub-cell — total work unchanged, per-task work /S, result row-for-
    row identical (each pair still meets exactly once, in the point's
    sub-cell)."""
    pb = points.withColumn(
        "__bin",
        F.floor(F.col(point_col).cast("double") / F.lit(bin_width)).cast("bigint"),
    )
    # end exclusive: an interval ending exactly on a bin edge does not
    # reach into that bin. Exact edge test, not an epsilon subtraction —
    # at epoch-seconds magnitude (~1.7e9) any epsilon below the double
    # ULP (~2.4e-7) would be a silent no-op.
    e = F.col(end_col).cast("double")
    end_bin_raw = F.floor(e / F.lit(bin_width)).cast("bigint")
    end_bin = end_bin_raw - F.when(
        e == end_bin_raw.cast("double") * F.lit(bin_width), F.lit(1)
    ).otherwise(F.lit(0))
    ib = (
        # empty/inverted intervals match nothing; dropping them also keeps
        # `sequence` from stepping DOWNWARD (sequence(5, 3) yields 5,4,3)
        intervals.filter(F.col(end_col).cast("double") > F.col(start_col).cast("double"))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(
                        F.col(start_col).cast("double") / F.lit(bin_width)
                    ).cast("bigint"),
                    end_bin,
                )
            ),
        )
    )
    keys = ["__bin"] + ([by] if by else [])
    if sub_salts > 1:
        pb = pb.withColumn(
            "__ssalt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in points.columns]),
                F.lit(sub_salts),
            ),
        )
        ib = ib.withColumn(
            "__ssalt", F.explode(F.sequence(F.lit(0), F.lit(sub_salts - 1)))
        )
        keys = keys + ["__ssalt"]
    joined = pb.join(ib, keys).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bin", *(["__ssalt"] if sub_salts > 1 else []))


def sessionize_chunked(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    chunk_ms: int = 21_600_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Inactivity-gap sessionization with BOUNDED window partitions — the
    chunked-carry pattern for when the "entity-bounded activity" contract
    behind a plain ``partitionBy(user)`` window breaks (bot/firehose
    users with billions of rows; see plans/__init__.py's allowlist
    notes). Returns (user_col, session_idx, session_start, session_end,
    n_events) — identical rows to the single-window formulation
    (q_window_session's), with identical 1-based per-user session
    numbering in (ts, order_col) order.

    Three bounded stages instead of one unbounded sort:

    1. LOCAL sessionization per (user, time-chunk): the usual lag-gap →
       running-sum window, but partitioned by (user, chunk) — a
       partition holds at most ``chunk_ms`` worth of ONE user's events,
       so the sort is bounded by time, not by how hot the user is.
       Local sessions aggregate immediately (start/end/count), so only
       per-session rows leave the stage.
    2. BOUNDARY stitch over the per-(user, chunk) SUMMARY table (one row
       per active chunk: first/last event ts, local session count): a
       lag window keyed on user — bounded because its input is the
       aggregated summary (rows per user = active chunks = time range /
       chunk_ms), not the event stream. Chunk c's first local session
       merges into chunk c-1's last iff the chunks are adjacent and the
       boundary gap <= gap_ms; because ``chunk_ms >= gap_ms`` is
       enforced, a session can NEVER bridge non-adjacent chunks (the
       gap across an empty chunk is > chunk_ms >= gap_ms), and merges
       chain correctly through single-session chunks. A running sum of
       (local sessions - merges) over the same summary window converts
       local indices to global ones: global = offset(prior chunks)
       + local_idx - merge_flag(chunk).
    3. Re-aggregate by (user, global_idx): merged boundary pieces
       collapse into one session row (min start / max end / summed
       count).

    Shuffle budget: one shuffle of events on (user, chunk) serving both
    the local window and the local aggregation, one tiny shuffle of the
    summary table on user, one co-keyed join of per-session rows to
    per-chunk offsets, one final combinable aggregation. No partition
    anywhere scales with a single user's total activity."""
    if chunk_ms < gap_ms:
        raise ValueError(
            f"chunk_ms ({chunk_ms}) must be >= gap_ms ({gap_ms}): a "
            "session may bridge at most one chunk boundary only when "
            "chunks are at least one inactivity gap long"
        )
    ts = F.col(ts_col)
    ev = events.select(
        user_col,
        ts_col,
        order_col,
        F.floor(F.unix_millis(ts) / F.lit(chunk_ms)).alias("__chunk"),
    )
    w_local = Window.partitionBy(user_col, "__chunk").orderBy(ts_col, order_col)
    gap_prev = F.unix_millis(ts) - F.unix_millis(F.lag(ts_col).over(w_local))
    is_new = (
        F.when(gap_prev > gap_ms, 1)
        .when(F.lag(ts_col).over(w_local).isNull(), 1)
        .otherwise(0)
    )
    local = ev.withColumn(
        "__lidx",
        F.sum(is_new).over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = local.groupBy(user_col, "__chunk", "__lidx").agg(
        F.min(ts_col).alias("__start"),
        F.max(ts_col).alias("__end"),
        F.count(F.lit(1)).alias("__n"),
    )
    summary = local.groupBy(user_col, "__chunk").agg(
        F.min(ts_col).alias("__first_ts"),
        F.max(ts_col).alias("__last_ts"),
        F.max("__lidx").alias("__n_sessions"),
    )
    w_user = Window.partitionBy(user_col).orderBy("__chunk")
    merge = (
        F.when(
            (F.lag("__chunk").over(w_user) == F.col("__chunk") - 1)
            & (
                F.unix_millis(F.col("__first_ts"))
                - F.unix_millis(F.lag("__last_ts").over(w_user))
                <= gap_ms
            ),
            1,
        )
        .otherwise(0)
        .cast("bigint")
    )
    offsets = summary.withColumn("__m", merge).withColumn(
        "__offset",
        F.coalesce(
            F.sum(F.col("__n_sessions") - F.col("__m")).over(
                w_user.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    glob = sess.join(
        offsets.select(user_col, "__chunk", "__m", "__offset"),
        [user_col, "__chunk"],
    ).withColumn(
        "session_idx",
        (F.col("__offset") + F.col("__lidx") - F.col("__m")).cast("bigint"),
    )
    return glob.groupBy(user_col, "session_idx").agg(
        F.min("__start").alias("session_start"),
        F.max("__end").alias("session_end"),
        F.sum("__n").cast("bigint").alias("n_events"),
    )


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: str | None = None,
    bin_width: float = 3600.0,
    sub_salts: int = 1,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose HALF-OPEN
    intervals [start, end) intersect (``l_start < r_end AND r_start <
    l_end``), optionally within an equality key — campaigns × sessions,
    outages × requests. Spark has no native operator; the naive
    inequality join is a per-key cross product.

    Binned shape (the sibling of :func:`range_join_binned`): both sides
    explode into the fixed-width bins their interval touches, pairs meet
    in a bin-equality (+ key) hash join, the overlap predicate runs
    inside the join — and each qualifying pair is emitted EXACTLY ONCE,
    with no dedup shuffle, by keeping it only in the canonical bin
    containing the overlap's start (``greatest(l_start, r_start)``,
    which every overlapping pair shares in exactly one bin both sides
    exploded into). Cost: |rows| × (interval_len / bin_width) duplicated
    bin rows and a co-partitioned equi-join — tune ``bin_width`` toward
    the typical interval length; per-cell cost is |left-in-bin| ×
    |right-in-bin|, so a firehose (key, bin) is the residual skew shape
    (triage in SCALING.md §13; ``sub_salts=S`` splits each cell's LEFT
    side S ways by row hash and replicates the right side into every
    sub-cell — work unchanged, per-task work /S, rows identical).
    Column names must be disjoint across the two inputs (select/alias
    first); empty or inverted intervals match nothing."""
    overlap = set(left.columns) & set(right.columns)
    overlap -= {by} if by else set()
    if overlap:
        raise ValueError(
            f"interval_join_binned: column collision {sorted(overlap)} — "
            "alias the sides apart first"
        )
    reserved = {"__bin", "__rbin", "__rby", "__ssalt"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"interval_join_binned: reserved column name(s) {sorted(taken)} "
            "present in an input — rename them first"
        )

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        e = F.col(end).cast("double")
        end_bin_raw = F.floor(e / F.lit(bin_width)).cast("bigint")
        # end exclusive: an interval ending exactly on a bin edge does
        # not reach into that bin (same exact-edge test as
        # range_join_binned — no epsilon)
        end_bin = end_bin_raw - F.when(
            e == end_bin_raw.cast("double") * F.lit(bin_width), F.lit(1)
        ).otherwise(F.lit(0))
        return df.filter(
            F.col(end).cast("double") > F.col(start).cast("double")
        ).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start).cast("double") / F.lit(bin_width))
                    .cast("bigint"),
                    end_bin,
                )
            ),
        )

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end).withColumnRenamed("__bin", "__rbin")
    # Rename the right side's key apart BEFORE the join (exactly like
    # __bin/__rbin): when both sides derive from the same DataFrame — a
    # self-join, the common shape — `lb[by] == rb[by]` builds what Spark
    # logs as a "trivially true equals predicate" and leaves correctness
    # to the ambiguous-self-join resolver. Distinct names make the join
    # condition bind two distinct attributes by construction (the plan
    # assert in tests/test_plan_shapes.py pins it) and the equality is
    # restored simply by dropping the renamed right key after the join.
    if by:
        rb = rb.withColumnRenamed(by, "__rby")
    cond = F.col("__bin") == F.col("__rbin")
    if by:
        cond = cond & (F.col(by) == F.col("__rby"))
    if sub_salts > 1:
        lb = lb.withColumn(
            "__ssalt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in left.columns]),
                F.lit(sub_salts),
            ),
        )
        rb = rb.withColumn(
            "__rssalt", F.explode(F.sequence(F.lit(0), F.lit(sub_salts - 1)))
        )
        cond = cond & (F.col("__ssalt") == F.col("__rssalt"))
    ov_start = F.greatest(
        F.col(l_start).cast("double"), F.col(r_start).cast("double")
    )
    joined = lb.join(rb, cond)
    if by:
        joined = joined.drop("__rby")
    joined = (
        joined
        .filter(
            (F.col(l_start).cast("double") < F.col(r_end).cast("double"))
            & (F.col(r_start).cast("double") < F.col(l_end).cast("double"))
            # canonical-bin guard: exactly-once emission
            & (
                F.col("__bin")
                == F.floor(ov_start / F.lit(bin_width)).cast("bigint")
            )
        )
        .drop(
            "__bin",
            "__rbin",
            *(["__ssalt", "__rssalt"] if sub_salts > 1 else []),
        )
    )
    return joined


def lookback_chunks(
    df: DataFrame,
    ts_col: str,
    lookback_us: int,
    chunk_us: int,
) -> DataFrame:
    """The shifted-copy kernel for bounding TRAILING-frame windows (the
    third order-dependent window class, after sessionization's
    chunked-carry and the as-of handoff): every row gets a home chunk
    (``__chunk = floor(micros / chunk_us)``, ``__home = true``), and rows
    within ``lookback_us`` of their chunk's END are DUPLICATED into the
    next chunk (``__home = false``). A window partitioned by
    (key, __chunk) with a ``rangeBetween(-lookback_us, 0)`` frame over
    the result sees, for every home row, exactly the rows its unbounded
    per-key window would have seen: same-chunk rows directly, and every
    prior-chunk row within the lookback via its spill copy (a prior
    event within the lookback of t >= chunk start is necessarily within
    the lookback of the boundary, so it has a copy; ``chunk_us >=
    lookback_us`` guarantees one copy into the NEXT chunk suffices).
    Filter ``__home`` after the window: copies feed frames, they don't
    emit rows. Cost: <= lookback/chunk fraction of rows duplicated —
    the knob that buys a partition bounded by (chunk + lookback) worth
    of ONE key's events instead of the key's whole history."""
    if chunk_us < lookback_us:
        raise ValueError(
            f"chunk_us ({chunk_us}) must be >= lookback_us ({lookback_us}): "
            "one spill copy per row only covers a lookback no longer than "
            "the chunk"
        )
    micros = F.unix_micros(F.col(ts_col))
    home = df.withColumn("__chunk", F.floor(micros / F.lit(chunk_us))).withColumn(
        "__home", F.lit(True)
    )
    spill = (
        # pmod, not %: Spark's % follows the dividend's sign, so for
        # pre-1970 timestamps (negative unix_micros) a plain remainder is
        # <= 0 and the tail rows of a chunk would never spill into the
        # next one — while floor() keeps assigning negative chunks
        # correctly. pmod keeps the offset-within-chunk in [0, chunk_us)
        # for every epoch sign.
        df.filter(
            F.pmod(micros, F.lit(chunk_us)) >= F.lit(chunk_us - lookback_us)
        )
        .withColumn("__chunk", F.floor(micros / F.lit(chunk_us)) + 1)
        .withColumn("__home", F.lit(False))
    )
    return home.unionByName(spill)
