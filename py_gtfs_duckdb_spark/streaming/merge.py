"""Keyed-upsert micro-batch merge (SURVEY §2.8 R1-R7).

The reference's 15-second flush (``ddb.py:282-332``) does, in order:
TTL deletes on trip updates + vehicle positions (alerts exempt,
ddb.py:287-288) → per-entity delete queues → per-entity upsert queues
(delete parent+children by key, insert fresh rows). ``RealtimeMerger``
reproduces that as three set-based plans per entity family, driven by
Structured Streaming ``foreachBatch`` — the engine-native form of the
reference's ``RepeatedTimer`` micro-batching (R1).

Exactly-once-by-key: the merge is idempotent (same batch re-applied
produces the same state), which is what ``foreachBatch`` needs for
at-least-once delivery to yield effectively-exactly-once state
(SURVEY §7 hard part 4).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.operators._scope import shared, shared_scope
from py_gtfs_duckdb_spark.schemas import REALTIME_SCHEMAS, REALTIME_TABLES
from py_gtfs_duckdb_spark.streaming import gtfsrt

# entity kind -> (parent key, [(table, row-builder)])
_FAMILIES = {
    "alert": (
        "service_alert_id",
        [
            ("realtime_service_alerts", gtfsrt.alert_rows),
            ("realtime_alert_active_periods", gtfsrt.alert_active_period_rows),
            ("realtime_alert_informed_entities", gtfsrt.alert_informed_entity_rows),
        ],
    ),
    "trip_update": (
        "trip_update_id",
        [
            ("realtime_trip_updates", gtfsrt.trip_update_rows),
            ("realtime_trip_stop_time_updates", gtfsrt.stop_time_update_rows),
        ],
    ),
    "vehicle": (
        "vehicle_position_id",
        [("realtime_vehicle_positions", gtfsrt.vehicle_position_rows)],
    ),
}

# TTL applies to trip updates and vehicle positions; service alerts live
# until replaced or tombstoned (ddb.py:287-293).
_TTL_TABLES = (
    "realtime_trip_updates",
    "realtime_trip_stop_time_updates",
    "realtime_vehicle_positions",
)


class RealtimeMerger:
    """foreachBatch target merging spooled FeedEntity JSON into the lake's
    realtime tables."""

    def __init__(
        self,
        lake: GtfsLake,
        ttl_seconds: int = 7200,
        max_age_seconds: int = 7200,
        trip_matcher=None,
        n_buckets: int = 16,
    ):
        self.lake = lake
        self.ttl_seconds = ttl_seconds  # R3 (config.py:22 data_review_seconds)
        self.max_age_seconds = max_age_seconds  # R2 stale-message cutoff
        # hash-bucket count for the keyed state layout; size so one
        # bucket ≈ one executor-comfortable partition at target state size
        self.n_buckets = n_buckets
        # Optional (parents, stus) -> (parents, stus) hook run on the
        # trip-update family before merging — see streaming/matching.py
        # (J7). Unmatched unknown trips drop out of the batch there.
        self.trip_matcher = trip_matcher

    # -- R3: state TTL ------------------------------------------------------

    def expire(self) -> None:
        """Drop realtime rows not refreshed within ``ttl_seconds``
        (ddb.py:282-293; ``<= cutoff`` deletes, so survivors are strictly
        newer). Keyed-state tables prune by bucket min-stamp — only
        buckets that can actually hold expired rows rewrite."""
        import time as _time

        cutoff_epoch = _time.time() - self.ttl_seconds
        for table in _TTL_TABLES:
            if not self.lake.exists(table):
                continue
            if self.lake.keyed_manifest(table) is not None:
                self.lake.expire_keyed(table, cutoff_epoch)
                continue
            df = self.lake.table(table)
            # timestamp_seconds keeps sub-second precision — unix_timestamp
            # truncates and would expire rows up to 1 s fresher than cutoff
            self.lake.write(
                table,
                df.where(
                    F.col("last_updated_timestamp")
                    > F.timestamp_seconds(F.lit(cutoff_epoch))
                ),
                dedup_pk=False,
            )

    # -- R4/R5: keyed upsert + tombstones -----------------------------------

    def merge_entities(self, parsed: DataFrame) -> None:
        """Apply one parsed micro-batch: newest message per entity id wins
        (the reference drains queues in arrival order — the spool's feed
        timestamp makes that order explicit and deterministic), tombstoned
        ids drop, surviving ids replace parent + children.

        A GTFS-RT tombstone carries only ``id`` + ``is_deleted`` — no typed
        payload (the reference knows the family from the MQTT topic,
        realtime.py:185-191). Entity ids are feed-unique, so tombstone keys
        are applied to EVERY family; deleting an absent key is a no-op."""
        # Last-writer-wins inside the batch, keyed by entity id (R4).
        w = Window.partitionBy("entity.id").orderBy(
            F.desc_nulls_last("feed_timestamp")
        )
        latest = (
            parsed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if latest.isEmpty():
            return
        # per-batch persist scope (operators/_scope.py): `latest` feeds
        # every family builder below; released — exception-safe — once the
        # merges have run, so the CacheManager is empty between
        # micro-batches (the NominalIndexCache's daily frames are the one
        # documented cross-batch exception, freed at rollover).
        with shared_scope(latest.sparkSession):
            latest = shared(latest)
            dead = latest.where(
                F.coalesce(F.col("entity.is_deleted"), F.lit(False))
            ).select(F.col("entity.id").alias("entity_key"))
            stamp = F.current_timestamp()
            for kind, (key, tables) in _FAMILIES.items():
                fresh = {table: builder(latest) for table, builder in tables}
                if kind == "trip_update" and self.trip_matcher is not None:
                    parents, stus = self.trip_matcher(
                        fresh["realtime_trip_updates"],
                        fresh["realtime_trip_stop_time_updates"],
                    )
                    fresh["realtime_trip_updates"] = parents
                    fresh["realtime_trip_stop_time_updates"] = stus
                parent_table = tables[0][0]
                # keys from the POST-match parents (matching rewrites ids
                # and drops unmatchable entities) plus tombstones.
                changed_keys = (
                    fresh[parent_table]
                    .select(key)
                    .unionByName(dead.select(F.col("entity_key").alias(key)))
                    .dropDuplicates([key])
                )
                for table, _ in tables:
                    rows = fresh[table].withColumn("last_updated_timestamp", stamp)
                    # delete-then-insert per key (ddb.py:296-332): drop every
                    # row whose entity key appears in this batch (upsert or
                    # tombstone), then add the fresh rows — touching only the
                    # hash buckets that contain changed keys (lake.merge_keyed).
                    self.lake.merge_keyed(
                        table,
                        rows,
                        changed_keys,
                        key=key,
                        n_buckets=self.n_buckets,
                    )

    # -- the foreachBatch entry (R1) ----------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        parsed = gtfsrt.reject_stale(
            gtfsrt.parse_spool_lines(batch_df), self.max_age_seconds
        )
        self.expire()
        self.merge_entities(parsed)


def reset_realtime(lake: GtfsLake) -> None:
    """R6: clear all realtime state at server start (realtime.py:122-125,
    ddb.py:163-169) — retained MQTT messages repopulate."""
    for table in REALTIME_TABLES:
        lake.write(
            table,
            lake.spark.createDataFrame([], REALTIME_SCHEMAS[table]),
            dedup_pk=False,
        )


def run_spool_stream(
    spark: SparkSession,
    lake: GtfsLake,
    spool_dir: str,
    *,
    merger: RealtimeMerger | None = None,
    available_now: bool = False,
    processing_interval: str = "15 seconds",
    checkpoint_dir: str | None = None,
    clean_source: str | None = "delete",
):
    """Wire the spool directory to the merge: ``readStream.text(spool)`` →
    ``foreachBatch(RealtimeMerger)``.

    Default trigger = 15 s processing time, the reference's flush interval
    (realtime.py:42,127). ``available_now=True`` drains the spool and stops
    (used by tests and backfills). Returns the StreamingQuery.

    ``clean_source`` is the spool janitor: the file source's own
    completed-file cleaner (``delete`` default — a spool file is a
    transient envelope, state lives in the lake; ``archive``/``off`` for
    audit trails). Without it a long-running ingest accumulates files
    forever AND the source's file-listing per trigger degrades — the
    retention knob is a scale requirement, not housekeeping.
    """
    merger = merger or RealtimeMerger(lake)
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="gtfsrt_ckpt_")
    os.makedirs(checkpoint, exist_ok=True)
    reader = spark.readStream.format("text")
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
    lines = reader.load(spool_dir)
    writer = (
        lines.writeStream.foreachBatch(merger.process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
