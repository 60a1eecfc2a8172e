"""Trip-candidate matching (J7): RT trip updates with unknown trip ids
matched to nominal trips — set-based.

Reference (adapter/gtfsrt.py:202-257 + index build realtime.py:242-260):
per entity, look up candidates by ``route_id → start_time → [trip_id]``
(dict insertion order = trip_id ascending, inherited from the
``ORDER BY trips.trip_id`` feed query, ddb.py:202), walk candidates in
order, verify stop-time updates per three config flags, take the FIRST
verified candidate, rewrite the entity id + trip id to it; no verified
candidate → drop the entity.

Flag truth table mirrored exactly (gtfsrt.py:221-249):

- all three flags false → no verification at all: first candidate wins;
- ``match_against_first_stop_id`` alone → only the ``stop_sequence == 1``
  update is examined, and the only enforced check is the sequence-bound
  (a first-stop ID mismatch has no consequence in the reference — neither
  of the two mismatch branches fires; reproduced faithfully);
- ``remove_invalid_stop_ids`` → mismatching updates are DROPPED from the
  accepted entity, the candidate still verifies;
- ``match_against_stop_ids`` → any mismatching update rejects the
  candidate;
- any flag set → an update whose ``stop_sequence`` exceeds the candidate's
  nominal stop count rejects the candidate.

Scale shape: ONE plan — candidates come from an equi-join on
``(route_id, start_time)`` against the nominal first-departure index
(dimension-sized → broadcast), verification is a join to per-trip nominal
stop ARRAYS (no per-candidate Python), first-candidate selection is a
``min(cand_rank)`` aggregate, explicitly deterministic (SURVEY §7 hard
part 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class NominalIndexCache:
    """R8 daily rollover (realtime.py:229-265): the matcher's nominal
    inputs are rebuilt when the operation-day string changes, and the
    previous day's cached frames are released (the reference frees its
    source frame after building the dicts for the same reason — its
    ``# performance issues`` comment, §4 X3).

    ``matcher()`` returns a (parents, stus) -> (parents, stus) callable
    bound to today's nominal slice — plug it into
    :class:`~py_gtfs_duckdb_spark.streaming.merge.RealtimeMerger`.
    """

    def __init__(self, lake, **match_flags):
        self.lake = lake
        self.match_flags = match_flags
        self._day = None
        self._trips = None
        self._stop_times = None

    def _refresh(self, day) -> None:
        import datetime as dt  # noqa: F401  (kept local; day is a date)

        from py_gtfs_duckdb_spark.queries import GtfsQueries

        for cached in (self._trips, self._stop_times):
            if cached is not None:
                cached.unpersist()
        service_ids = GtfsQueries(self.lake).active_service_ids(day)
        self._trips = (
            self.lake.table("trips")
            .join(F.broadcast(service_ids), "service_id", "left_semi")
            .persist()
        )
        self._stop_times = (
            self.lake.table("stop_times")
            .join(
                self._trips.select("trip_id").dropDuplicates(["trip_id"]),
                "trip_id",
                "left_semi",
            )
            .persist()
        )
        self._day = day

    def matcher(self, today=None):
        import datetime as dt

        day = today or dt.date.today()
        if day != self._day:
            self._refresh(day)
        trips, stop_times = self._trips, self._stop_times

        def apply(parents: DataFrame, stus: DataFrame):
            return match_trip_updates(
                parents, stus, trips, stop_times, **self.match_flags
            )

        return apply


def nominal_first_departures(trips: DataFrame, stop_times: DataFrame) -> DataFrame:
    """(route_id, start_time, cand_trip_id, cand_rank) — the Spark form of
    the reference's ``route_id → start_time → [trip_id]`` index
    (realtime.py:242-260); ``cand_rank`` pins the dict's insertion order
    (trip_id ascending)."""
    first = stop_times.where(F.col("stop_sequence") == 1).select(
        "trip_id", F.col("departure_time").alias("start_time")
    )
    w = Window.partitionBy("route_id", "start_time").orderBy("cand_trip_id")
    return (
        trips.select("route_id", "trip_id")
        .join(first, "trip_id")
        .select(
            "route_id",
            "start_time",
            F.col("trip_id").alias("cand_trip_id"),
        )
        .withColumn("cand_rank", F.row_number().over(w))
    )


def nominal_stop_arrays(stop_times: DataFrame) -> DataFrame:
    """(cand_trip_id, stops: array<string>, n_stops) — the
    ``trip_id → [stop_id,...]`` index (realtime.py:252-260), order made
    explicit via sort by stop_sequence."""
    return (
        stop_times.groupBy(F.col("trip_id").alias("cand_trip_id"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("stop_sequence", "stop_id"))),
                lambda s: s["stop_id"],
            ).alias("stops")
        )
        .withColumn("n_stops", F.size("stops"))
    )


def match_trip_updates(
    parents: DataFrame,
    stus: DataFrame,
    trips: DataFrame,
    stop_times: DataFrame,
    *,
    match_against_first_stop_id: bool = True,
    match_against_stop_ids: bool = False,
    remove_invalid_stop_ids: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Match/validate a batch of flattened trip updates (rows shaped like
    ``realtime_trip_updates`` / ``realtime_trip_stop_time_updates``)
    against nominal data. Returns the surviving (parents, stus) with
    unknown trip ids rewritten to their matched nominal trip.

    Known trip ids pass through unverified (gtfsrt.py:198-201); unknown
    ones without a start_time, with an unknown (route, start_time) bucket,
    or with no verified candidate are dropped (gtfsrt.py:203-211,255-256).
    """
    verify_any = (
        match_against_first_stop_id
        or match_against_stop_ids
        or remove_invalid_stop_ids
    )
    first_stop_only = match_against_first_stop_id and not (
        match_against_stop_ids or remove_invalid_stop_ids
    )
    nominal_ids = trips.select("trip_id").dropDuplicates(["trip_id"])
    known = parents.join(F.broadcast(nominal_ids), "trip_id", "left_semi")
    unknown = parents.join(F.broadcast(nominal_ids), "trip_id", "left_anti").where(
        F.col("trip_start_time").isNotNull()
    )

    cands = F.broadcast(nominal_first_departures(trips, stop_times))
    cand_pairs = unknown.select("trip_update_id", "trip_route_id", "trip_start_time").join(
        cands,
        (F.col("trip_route_id") == F.col("route_id"))
        & (F.col("trip_start_time") == F.col("start_time")),
    ).select("trip_update_id", "cand_trip_id", "cand_rank")

    if verify_any:
        stops_idx = F.broadcast(nominal_stop_arrays(stop_times))
        applicable = (
            F.lit(True) if not first_stop_only else (F.col("stop_sequence") == 1)
        )
        checked = (
            cand_pairs.join(
                stus.select("trip_update_id", "stop_sequence", "stop_id"),
                "trip_update_id",
                "left",
            )
            .join(stops_idx, "cand_trip_id")
            .withColumn(
                "__len_fail",
                applicable & (F.col("stop_sequence") > F.col("n_stops")),
            )
            .withColumn(
                "__mismatch",
                applicable
                & ~F.col("__len_fail")
                & (
                    F.get(
                        F.col("stops"),
                        F.greatest(F.col("stop_sequence") - 1, F.lit(0)),
                    )
                    != F.col("stop_id")
                ),
            )
        )
        verdicts = checked.groupBy("trip_update_id", "cand_trip_id", "cand_rank").agg(
            F.coalesce(F.bool_or("__len_fail"), F.lit(False)).alias("len_fail"),
            F.coalesce(F.bool_or("__mismatch"), F.lit(False)).alias("any_mismatch"),
        )
        reject = F.col("len_fail")
        if match_against_stop_ids:
            reject = reject | F.col("any_mismatch")
        valid = verdicts.where(~reject)
    else:
        valid = cand_pairs  # no verification: every candidate qualifies

    chosen = (
        valid.groupBy("trip_update_id")
        .agg(F.min_by("cand_trip_id", "cand_rank").alias("matched_trip_id"))
    )

    matched_parents = (
        unknown.join(chosen, "trip_update_id")
        .withColumn("trip_update_id", F.col("matched_trip_id"))
        .withColumn("trip_id", F.col("matched_trip_id"))
        .drop("matched_trip_id")
    )

    # children: rekey to the matched id; optionally drop mismatching STUs
    matched_stus = stus.join(
        chosen, "trip_update_id"
    )
    if remove_invalid_stop_ids:
        stops_idx = F.broadcast(nominal_stop_arrays(stop_times))
        matched_stus = (
            matched_stus.join(
                stops_idx,
                F.col("matched_trip_id") == F.col("cand_trip_id"),
                "left",
            )
            .where(
                (F.col("stop_sequence") <= F.col("n_stops"))
                & (
                    F.get(
                        F.col("stops"),
                        F.greatest(F.col("stop_sequence") - 1, F.lit(0)),
                    )
                    == F.col("stop_id")
                )
            )
            .drop("cand_trip_id", "stops", "n_stops")
        )
    matched_stus = matched_stus.withColumn(
        "trip_update_id", F.col("matched_trip_id")
    ).drop("matched_trip_id")

    known_stus = stus.join(
        known.select("trip_update_id").dropDuplicates(["trip_update_id"]),
        "trip_update_id",
        "left_semi",
    )
    return (
        known.unionByName(matched_parents),
        known_stus.unionByName(matched_stus),
    )
