"""GtfsLake — the Parquet-lake replacement for the reference's embedded
DuckDB file database (``GtfsDuckDB``, ddb.py:19-64).

Layout: ``<root>/<table>/v=<N>/part-*.parquet`` with a ``_CURRENT`` pointer
file per table. Every mutation is read → transform → write v=N+1 → atomically
swap the pointer — which gives:

- the reference's writer/reader isolation (its second-connection
  workaround, realtime.py:38-41) for free: readers keep the version they
  opened, the streaming writer publishes new versions;
- idempotent retries (a failed write never corrupts the current version);
- time-travel for debugging (old versions kept until vacuum()).

At cluster scale the same pattern holds on object storage (pointer swap =
one small-object PUT); a transactional table format (Delta/Iceberg) is the
drop-in upgrade, not available in this container (SURVEY §7 hard part 4).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators.mutation import delete_not_in, upsert
from py_gtfs_duckdb_spark.schemas import ALL_SCHEMAS, PRIMARY_KEYS


class GtfsLake:
    """One lake root ≙ one GtfsDuckDB database file (ddb.py:20)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- table registry (≙ CREATE TABLE IF NOT EXISTS, ddb.py:55-64) --------

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_CURRENT")

    def current_version(self, table: str) -> int | None:
        try:
            with open(self._pointer(table)) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def pointer_token(self, table: str) -> tuple[int, int] | None:
        """(version, pointer mtime_ns) — a CONTENT token for caches keyed
        on table identity: the version alone restarts at 1 after
        ``drop()`` + rebuild, so version-keyed caches would serve stale
        state; the mtime distinguishes every pointer swap."""
        v = self.current_version(table)
        if v is None:
            return None
        try:
            return (v, os.stat(self._pointer(table)).st_mtime_ns)
        except FileNotFoundError:
            return None

    def exists(self, table: str) -> bool:
        return (
            self.current_version(table) is not None
            or self.keyed_manifest(table) is not None
            or self.segment_manifest(table) is not None
        )

    def table_path(self, table: str) -> str | None:
        v = self.current_version(table)
        if v is None:
            return None
        return os.path.join(self._tdir(table), f"v={v}")

    def table(self, table: str) -> DataFrame:
        """Read the current version; empty (schema-correct) frame if the
        table was never written — matching the reference's eagerly created
        empty tables. Keyed-state tables (bucket manifest) resolve to the
        current path set across bucket versions; segment tables resolve to
        the committed segment list."""
        manifest = self.keyed_manifest(table)
        if manifest is not None:
            paths = self._keyed_paths(table, manifest)
            if not paths:
                return self._empty(table)
            return self.spark.read.parquet(*paths)
        seg = self.segment_manifest(table)
        if seg is not None:
            if not seg["segments"]:
                return self._empty(table)
            tdir = self._tdir(table)
            return self.spark.read.parquet(
                *[os.path.join(tdir, s) for s in seg["segments"]]
            )
        path = self.table_path(table)
        if path is None:
            return self._empty(table)
        return self.spark.read.parquet(path)

    def _empty(self, table: str) -> DataFrame:
        schema = ALL_SCHEMAS.get(table)
        if schema is None:
            raise KeyError(f"unknown table {table!r}")
        return self.spark.createDataFrame([], schema)

    # -- writes -------------------------------------------------------------

    def _conform(self, table: str, df: DataFrame) -> DataFrame:
        """Align ``df`` to the table's declared schema, the way the
        reference's fixed-DDL INSERT does (ddb.py:55-64): absent optional
        columns become typed NULLs, extras are dropped, order/type follow
        the schema. Tables without a declared schema pass through as-is.
        """
        schema = ALL_SCHEMAS.get(table)
        if schema is None:
            return df
        have = {f.name for f in df.schema.fields}
        cols = [
            (F.col(f.name) if f.name in have else F.lit(None))
            .cast(f.dataType)
            .alias(f.name)
            for f in schema.fields
        ]
        return df.select(*cols)

    def write(self, table: str, df: DataFrame, dedup_pk: bool = True) -> None:
        """Publish ``df`` as the table's next version (atomic pointer swap).

        ``dedup_pk`` enforces the reference's PRIMARY KEYs at write time
        (Spark has no constraint enforcement — SURVEY §7 hard part 3).
        """
        df = self._conform(table, df)
        pk = PRIMARY_KEYS.get(table)
        if dedup_pk and pk:
            df = df.dropDuplicates(pk)
        v = self._next_version(table)
        out = os.path.join(self._tdir(table), f"v={v}")
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._pointer(table))  # atomic on POSIX
        # a full overwrite supersedes any keyed-state or segment layout:
        # drop those manifests so the plain pointer is authoritative
        # again. Order matters for readers — table() prefers the
        # manifests, so removing them only AFTER the pointer swap means a
        # concurrent reader sees either the old layout or the new
        # version, never an empty table.
        if os.path.exists(self._manifest_path(table)):
            os.remove(self._manifest_path(table))
        if os.path.exists(self._segments_path(table)):
            os.remove(self._segments_path(table))

    def _next_version(self, table: str) -> int:
        """Next unused version number across BOTH layouts (plain pointer
        and keyed bucket manifest)."""
        versions = [self.current_version(table) or 0]
        manifest = self.keyed_manifest(table)
        if manifest:
            versions.extend(b["v"] for b in manifest["buckets"].values())
        return max(versions) + 1

    # -- keyed state layout (streaming scale path) ---------------------------
    #
    # A realtime state table at cluster scale is much larger than any one
    # micro-batch, so rewriting the whole table per 15 s flush (the
    # reference's model at reference-sized state) becomes the bottleneck.
    # Keyed layout: rows hash into ``n_buckets`` by entity key; a version
    # dir holds only the buckets its batch touched
    # (``v=<N>/__bucket=<B>/``), and ``_CURRENT.json`` maps every live
    # bucket to the version that last wrote it (plus the bucket's
    # min(last_updated) epoch for TTL pruning). One atomic manifest swap
    # preserves the pointer-swap reader isolation; a merge rewrites ONLY
    # partitions containing changed keys, and TTL expiry rewrites only
    # buckets whose min-stamp proves they can hold expired rows.

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_CURRENT.json")

    def keyed_manifest(self, table: str) -> dict | None:
        try:
            with open(self._manifest_path(table)) as fh:
                return json.load(fh)
        except (FileNotFoundError, ValueError):
            return None

    def _write_manifest(self, table: str, manifest: dict) -> None:
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(table))
        # the manifest supersedes the plain pointer
        if os.path.exists(self._pointer(table)):
            os.remove(self._pointer(table))

    def _keyed_paths(
        self, table: str, manifest: dict, buckets: Sequence[int] | None = None
    ) -> list[str]:
        wanted = None if buckets is None else {str(b) for b in buckets}
        return [
            os.path.join(self._tdir(table), f"v={meta['v']}", f"__bucket={b}")
            for b, meta in sorted(manifest["buckets"].items(), key=lambda kv: int(kv[0]))
            if wanted is None or b in wanted
        ]

    @staticmethod
    def _bucket_expr(key: str, n_buckets: int):
        return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets))

    # -- segment layout (append-only streaming scale path) -------------------
    #
    # A plain ``append`` is union-with-current + full rewrite — O(corpus)
    # I/O per call, fine for reference-sized tables, a non-starter for an
    # append-only corpus fed by a 15 s micro-batch stream. Segment layout:
    # each append writes ONLY its own rows to ``seg=<N>/`` and atomically
    # swaps ``_SEGMENTS.json`` (the committed segment list, mirroring a
    # lakehouse add-files commit). Per-append cost is O(batch) regardless
    # of table size; readers resolve the manifest to a multi-path scan.
    #
    # The manifest also carries writer bookkeeping (``meta``): a streaming
    # writer records its last committed micro-batch id per table, making
    # at-least-once redelivery idempotent WITHOUT scanning any corpus keys
    # — the crash window is covered because the meta rides the same atomic
    # manifest swap as the segment list (a crash before the swap leaves an
    # orphan segment dir that is invisible to readers and GC'd by vacuum).

    def _segments_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_SEGMENTS.json")

    def segment_manifest(self, table: str) -> dict | None:
        try:
            with open(self._segments_path(table)) as fh:
                return json.load(fh)
        except (FileNotFoundError, ValueError):
            return None

    def segment_meta(self, table: str) -> dict:
        """Writer bookkeeping recorded by ``append_segment`` (e.g. the
        last committed ingest micro-batch id). Empty dict if none."""
        m = self.segment_manifest(table)
        return dict(m.get("meta", {})) if m else {}

    def append_segment(
        self, table: str, df: DataFrame, meta: dict | None = None
    ) -> None:
        """Append ``df`` as a new committed segment — O(batch) I/O.

        ``meta`` (if given) is merged into the manifest's ``meta`` dict in
        the SAME atomic swap that commits the segment, so "rows visible"
        and "bookkeeping updated" can never be observed apart. Only valid
        on tables in segment (or no) layout — a plain-pointer or keyed
        table must be migrated explicitly (write() supersedes segments,
        not the reverse)."""
        if self.current_version(table) is not None or self.keyed_manifest(table):
            raise ValueError(
                f"table {table!r} is not in segment layout; use append()/"
                "merge_keyed(), or drop() it first"
            )
        manifest = self.segment_manifest(table) or {"segments": [], "next": 1, "meta": {}}
        seg = f"seg={manifest['next']}"
        os.makedirs(self._tdir(table), exist_ok=True)
        self._conform(table, df).write.mode("overwrite").parquet(
            os.path.join(self._tdir(table), seg)
        )
        manifest["segments"].append(seg)
        manifest["next"] += 1
        if meta:
            manifest.setdefault("meta", {}).update(meta)
        tmp = self._segments_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._segments_path(table))

    def compact_segments(self, table: str, dedup_pk: bool = True) -> None:
        """Fold the segment list into one plain version (small-file
        compaction; write() removes the segment manifest after its pointer
        swap so readers flip atomically), then GC the folded segments.
        End-of-stream form: the table leaves segment layout, so further
        append_segment calls refuse — use fold_segments mid-stream."""
        if self.segment_manifest(table) is None:
            return
        self.write(table, self.table(table), dedup_pk=dedup_pk)
        self.vacuum(table, keep=1)

    def fold_segments(self, table: str) -> None:
        """Mid-stream small-files compaction: rewrite all committed
        segments as ONE new segment and swap the manifest to reference
        only it — the table STAYS in segment layout (appendable, meta
        preserved), unlike compact_segments. Readers flip atomically on
        the manifest swap; superseded segment dirs become orphans for
        vacuum. At 100 TB this is the periodic compaction every
        lakehouse append stream schedules so per-batch files don't
        accumulate into a small-files problem."""
        manifest = self.segment_manifest(table)
        if manifest is None or len(manifest["segments"]) <= 1:
            return
        seg = f"seg={manifest['next']}"
        self.table(table).write.mode("overwrite").parquet(
            os.path.join(self._tdir(table), seg)
        )
        folded = {
            "segments": [seg],
            "next": manifest["next"] + 1,
            "meta": dict(manifest.get("meta", {})),
        }
        tmp = self._segments_path(table) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(folded, fh)
        os.replace(tmp, self._segments_path(table))

    def merge_keyed(
        self,
        table: str,
        fresh: DataFrame,
        changed_keys: DataFrame,
        key: str,
        n_buckets: int = 16,
        stamp_col: str = "last_updated_timestamp",
    ) -> None:
        """Delete-then-insert by entity key (ddb.py:296-332) touching only
        the hash buckets that contain changed keys.

        ``changed_keys`` is a one-column frame of ``key`` values (upserts +
        tombstones); ``fresh`` carries the replacement rows. A plain-layout
        table is migrated into keyed layout on first merge.
        """
        fresh = self._conform(table, fresh)
        manifest = self.keyed_manifest(table)
        v = self._next_version(table)
        bucket = self._bucket_expr(key, n_buckets)
        # Buckets to rewrite derive from changed_keys ∪ fresh keys, so a
        # fresh row whose key is missing from changed_keys still lands in
        # a touched bucket instead of being silently filtered out by the
        # __bucket isin(touched) clause below (contract violation, but a
        # data-dropping one — guard cheaply rather than trust).
        all_keys = changed_keys.select(F.col(key)).unionByName(
            fresh.select(F.col(key))
        )
        key_rows = (
            all_keys.select(bucket.alias("b"), F.col(key).isNull().alias("null_key"))
            .distinct()
            .collect()
        )
        if any(r["null_key"] for r in key_rows):
            # a null entity key can't be matched, deleted, or bucketed —
            # upstream produced garbage; fail loudly instead of dropping
            raise ValueError(
                f"merge_keyed({table!r}): null {key!r} in batch "
                "(changed_keys/fresh rows must carry a non-null entity key)"
            )
        changed_buckets = sorted(r["b"] for r in key_rows)
        if (
            manifest is not None
            and manifest.get("n_buckets") == n_buckets
            and not changed_buckets
        ):
            # no changed keys AND no fresh rows — skip the write jobs
            # entirely (a batch with only one entity family must not pay
            # version bumps for the other five tables)
            return
        if manifest is None or manifest.get("n_buckets") != n_buckets:
            # migration: the whole current table rewrites once into buckets
            base = self.table(table)
            touched = None  # every bucket of the output is (re)written
        else:
            base = (
                self.spark.read.parquet(
                    *self._keyed_paths(table, manifest, changed_buckets)
                )
                if self._keyed_paths(table, manifest, changed_buckets)
                else self._empty(table)
            )
            touched = changed_buckets
        # anti-join against changed_keys ∪ fresh keys (NOT just
        # changed_keys): an out-of-contract fresh row for a PRE-EXISTING
        # key must replace its old row, not duplicate it — its bucket is
        # in `touched`, so the old row would otherwise survive the
        # anti-join and union with the fresh copy
        survivors = base.join(
            all_keys.dropDuplicates([key]), [key], "left_anti"
        )
        out = survivors.unionByName(fresh, allowMissingColumns=False).withColumn(
            "__bucket", bucket
        )
        if touched is not None:
            out = out.where(F.col("__bucket").isin([int(b) for b in touched]))
        out_dir = os.path.join(self._tdir(table), f"v={v}")
        out.write.mode("overwrite").partitionBy("__bucket").parquet(out_dir)
        # stat the buckets this version actually produced (reading back the
        # just-written files: small — changed buckets only)
        new_meta = self._bucket_stats(out_dir, stamp_col)
        buckets = {} if manifest is None else dict(manifest["buckets"])
        # forget the buckets this write set out to rewrite (they may now be
        # empty); a migration (touched None) supersedes every old bucket
        for b in list(buckets) if touched is None else [str(b) for b in touched]:
            buckets.pop(b, None)
        buckets.update(new_meta)
        self._write_manifest(
            table, {"key": key, "n_buckets": n_buckets, "buckets": buckets}
        )

    def _bucket_stats(self, version_dir: str, stamp_col: str) -> dict:
        """Per-bucket {v, min_ts} for the buckets present in a version dir."""
        v = int(os.path.basename(version_dir).split("=", 1)[1])
        present = [
            e.split("=", 1)[1]
            for e in os.listdir(version_dir)
            if e.startswith("__bucket=")
        ]
        if not present:
            return {}
        df = self.spark.read.option("basePath", version_dir).parquet(
            *(os.path.join(version_dir, f"__bucket={b}") for b in present)
        )
        if stamp_col in df.columns:
            # cast-to-double keeps sub-second precision (unix_timestamp
            # truncates; a truncated min would still be CONSERVATIVE for
            # expiry — more rewrites, never missed rows — but exact is free)
            rows = (
                df.groupBy("__bucket")
                .agg(F.min(F.col(stamp_col).cast("double")).alias("m"))
                .collect()
            )
            mins = {str(r["__bucket"]): r["m"] for r in rows}
        else:
            mins = {b: None for b in present}
        return {b: {"v": v, "min_ts": mins.get(b)} for b in present}

    def expire_keyed(
        self,
        table: str,
        cutoff_epoch: float,
        stamp_col: str = "last_updated_timestamp",
    ) -> None:
        """TTL sweep (ddb.py:282-293) that rewrites ONLY buckets whose
        min-stamp shows they can contain rows at or before the cutoff;
        buckets proven fresh are untouched."""
        manifest = self.keyed_manifest(table)
        if manifest is None:
            return
        stale = [
            b
            for b, meta in manifest["buckets"].items()
            if meta.get("min_ts") is None or meta["min_ts"] <= cutoff_epoch
        ]
        if not stale:
            return
        v = self._next_version(table)
        df = self.spark.read.parquet(*self._keyed_paths(table, manifest, stale))
        kept = df.where(
            F.col(stamp_col) > F.timestamp_seconds(F.lit(cutoff_epoch))
        )
        bucket = self._bucket_expr(manifest["key"], manifest["n_buckets"])
        out_dir = os.path.join(self._tdir(table), f"v={v}")
        kept.withColumn("__bucket", bucket).write.mode("overwrite").partitionBy(
            "__bucket"
        ).parquet(out_dir)
        new_meta = self._bucket_stats(out_dir, stamp_col)
        buckets = dict(manifest["buckets"])
        for b in stale:
            buckets.pop(b, None)  # empty-after-expiry buckets disappear
        buckets.update(new_meta)
        self._write_manifest(table, {**manifest, "buckets": buckets})

    def append(self, table: str, df: DataFrame) -> None:
        """≙ batched INSERT (ddb.py:377-384): union with current + publish."""
        if self.exists(table):
            df = self.table(table).unionByName(df, allowMissingColumns=True)
        self.write(table, df)

    def upsert(self, table: str, updates: DataFrame, keys: Sequence[str] | None = None) -> None:
        """Set-based merge (≙ strategy/match_stop_id.py UPDATE-else-INSERT
        and ddb.py:296-332 delete-then-insert)."""
        keys = list(keys or PRIMARY_KEYS[table])
        base = self.table(table)
        # Delete-then-insert replaces the WHOLE row (ddb.py:296-332):
        # conform partial update frames so unspecified columns become NULL
        # rather than a union arity error.
        self.write(table, upsert(base, self._conform(table, updates), keys), dedup_pk=False)

    def delete_where(self, table: str, condition) -> None:
        """≙ DELETE FROM table WHERE cond (pattern deletes ddb.py:76-88)."""
        df = self.table(table)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self.write(table, df.filter(~F.coalesce(cond, F.lit(False))), dedup_pk=False)

    def vacuum(self, table: str | None = None, keep: int = 1) -> None:
        """Drop superseded versions (old readers must be done)."""
        tables = [table] if table else [
            d for d in os.listdir(self.root)
            if os.path.isdir(self._tdir(d))
        ]
        for tb in tables:
            manifest = self.keyed_manifest(tb)
            if manifest is not None:
                # keyed layout: a version dir is live while any bucket
                # references it
                live = {meta["v"] for meta in manifest["buckets"].values()}
                ceiling = (max(live) if live else self._next_version(tb)) - keep
                for entry in os.listdir(self._tdir(tb)):
                    if entry.startswith("v="):
                        v = int(entry.split("=", 1)[1])
                        if v not in live and v <= ceiling:
                            shutil.rmtree(os.path.join(self._tdir(tb), entry))
                continue
            seg = self.segment_manifest(tb)
            if seg is not None:
                # segment layout: GC orphan segment dirs (a crash between
                # the parquet write and the manifest swap leaves one)
                live = set(seg["segments"])
                for entry in os.listdir(self._tdir(tb)):
                    if entry.startswith("seg=") and entry not in live:
                        shutil.rmtree(os.path.join(self._tdir(tb), entry))
                continue
            cur = self.current_version(tb)
            if cur is None:
                continue
            for entry in os.listdir(self._tdir(tb)):
                if entry.startswith("v="):
                    v = int(entry.split("=", 1)[1])
                    if v <= cur - keep:
                        shutil.rmtree(os.path.join(self._tdir(tb), entry))
                # a write() superseded the segment layout: folded segments
                # are dead once the pointer is authoritative
                if entry.startswith("seg="):
                    shutil.rmtree(os.path.join(self._tdir(tb), entry))

    def drop(self, table: str) -> None:
        """≙ DROP TABLE (ddb.py:90-98 drop_static/drop_realtime)."""
        if os.path.isdir(self._tdir(table)):
            shutil.rmtree(self._tdir(table))

    # -- bucketed physical layout (scale path) ------------------------------

    def bucketed_name(self, table: str) -> str:
        return f"bucketed_{table}"

    def write_bucketed(
        self,
        table: str,
        df: DataFrame | None = None,
        keys: Sequence[str] | None = None,
        num_buckets: int = 64,
    ) -> str:
        """Publish a BUCKETED copy of ``table`` into the session catalog
        (``bucketBy(num_buckets, keys) + sortBy(keys)``) and return its
        catalog name.

        This is a derived physical layout for repeated big-big joins, not
        the source of truth (the versioned Parquet dir stays canonical):
        two tables bucketed on their join key with the same bucket count
        join WITHOUT a shuffle — Catalyst sees the co-partitioning and
        drops both Exchanges. At 100 TB this turns every
        stop_times ⋈ trips / fact ⋈ fact plan from a full-table shuffle
        into a bucket-local merge, paid once at write time. Keys default to
        the reference PRIMARY KEY head (the join key in every reference
        query shape).
        """
        if df is None:
            df = self.table(table)
        keys = list(keys or PRIMARY_KEYS[table][:1])
        name = self.bucketed_name(table)
        # External table anchored under the lake root: survives as plain
        # files, and a stale in-memory catalog entry (fresh session, old
        # directory) can't collide the way managed-table locations do.
        path = os.path.join(self.root, "_bucketed", table)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", path)
            .bucketBy(num_buckets, *keys)
            .sortBy(*keys)
            .saveAsTable(name)
        )
        return name

    def bucketed_table(self, table: str) -> DataFrame:
        """Read the bucketed copy (raises if never written)."""
        return self.spark.table(self.bucketed_name(table))

    # -- GTFS-specific mutations -------------------------------------------

    def remove_pattern(self, agency_pattern: str) -> None:
        """≙ ``remove`` CLI (ddb.py:75-88): delete agencies/routes/trips by
        SQL-LIKE pattern, then cascade-clean orphans."""
        self.delete_where("agency", F.col("agency_id").like(agency_pattern))
        self.delete_where("routes", F.col("agency_id").like(agency_pattern))
        # trips whose route is gone are handled by the cascade below; the
        # reference also pattern-deletes trips via their route_id prefix.
        self.cascade_clean()

    def cascade_clean(self) -> None:
        """≙ _clear_database (ddb.py:336-348): 9 NOT-IN cascade deletes with
        exact SQL NULL semantics (delete_not_in — SURVEY §7 hard part 2).

        Order matters (parents first), mirroring the reference sequence:
        routes→agency, trips→routes, stop_times→trips, stops→stop_times
        (platforms) / stops.parent_station (stations), shapes→trips,
        transfers→routes/trips, calendar/calendar_dates→trips.
        """
        agency = self.table("agency")
        self.write(
            "routes",
            delete_not_in(self.table("routes"), agency, "agency_id", "agency_id"),
            dedup_pk=False,
        )
        routes = self.table("routes")
        self.write(
            "trips",
            delete_not_in(self.table("trips"), routes, "route_id", "route_id"),
            dedup_pk=False,
        )
        trips = self.table("trips")
        self.write(
            "stop_times",
            delete_not_in(self.table("stop_times"), trips, "trip_id", "trip_id"),
            dedup_pk=False,
        )
        stop_times = self.table("stop_times")
        # Two sequential conditional DELETEs (ddb.py:340-341), each scoped
        # by a location_type predicate. Stops whose type is neither
        # '0'/'' nor '1' — including NULL-typed ones, where the SQL
        # predicate evaluates UNKNOWN — are never deleted.
        stops = self.table("stops")
        is_platform = F.col("location_type").isin("", "0")  # NULL → not platform
        is_station = F.col("location_type") == "1"
        others = stops.filter(~F.coalesce(is_platform | is_station, F.lit(False)))
        kept_platforms = delete_not_in(
            stops.filter(is_platform), stop_times, "stop_id", "stop_id"
        )
        # The station DELETE's subquery reads stops AFTER the platform
        # delete committed (statement-level snapshot): parent_station of
        # ALL remaining stops, not just platforms. With any NULL
        # parent_station in that set, NOT IN is never TRUE → no deletes —
        # delete_not_in reproduces exactly that.
        stops_after_platforms = kept_platforms.unionByName(
            stops.filter(F.coalesce(is_station, F.lit(False)))
        ).unionByName(others)
        kept_stations = delete_not_in(
            stops.filter(is_station), stops_after_platforms, "stop_id", "parent_station"
        )
        self.write(
            "stops",
            kept_platforms.unionByName(kept_stations).unionByName(others),
            dedup_pk=False,
        )
        self.write(
            "shapes",
            delete_not_in(self.table("shapes"), trips, "shape_id", "shape_id"),
            dedup_pk=False,
        )
        # DELETE ... WHERE a NOT IN (...) OR b NOT IN (...) ≡ chained
        # single-key deletes: a row survives iff no term is TRUE
        # (ddb.py:344-345 — both sides of the transfer, routes then trips).
        transfers = delete_not_in(
            self.table("transfers"), routes, "from_route_id", "route_id"
        )
        transfers = delete_not_in(transfers, routes, "to_route_id", "route_id")
        transfers = delete_not_in(transfers, trips, "from_trip_id", "trip_id")
        transfers = delete_not_in(transfers, trips, "to_trip_id", "trip_id")
        self.write("transfers", transfers, dedup_pk=False)
        self.write(
            "calendar",
            delete_not_in(self.table("calendar"), trips, "service_id", "service_id"),
            dedup_pk=False,
        )
        self.write(
            "calendar_dates",
            delete_not_in(
                self.table("calendar_dates"), trips, "service_id", "service_id"
            ),
            dedup_pk=False,
        )
