"""Keyed (bucket-manifest) state layout: merges rewrite only buckets
containing changed keys, TTL expiry prunes by bucket min-stamp, and
readers always see one consistent manifest snapshot."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.lake import GtfsLake

N_BUCKETS = 8


def _mk_lake(spark, tmp_path):
    return GtfsLake(spark, str(tmp_path / "lake"))


def _vp_rows(spark, ids, ts=None):
    ts = ts or time.time()
    stamp = F.to_timestamp(F.lit(time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(ts))))
    return spark.createDataFrame(
        [(i, float(hash(i) % 90), 9.0) for i in ids],
        "vehicle_position_id string, position_latitude double, position_longitude double",
    ).withColumn("last_updated_timestamp", stamp)


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "vehicle_position_id string")


def test_merge_touches_only_changed_buckets(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = [f"v{i}" for i in range(40)]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    m1 = lake.keyed_manifest(t)
    assert m1 is not None and len(m1["buckets"]) >= 2
    assert lake.table(t).count() == 40

    # update ONE key: only its bucket's version may advance
    lake.merge_keyed(t, _vp_rows(spark, ["v0"]), _keys(spark, ["v0"]), key="vehicle_position_id", n_buckets=N_BUCKETS)
    m2 = lake.keyed_manifest(t)
    changed = [b for b in m2["buckets"] if m2["buckets"][b]["v"] != m1["buckets"].get(b, {}).get("v")]
    assert len(changed) == 1, f"expected exactly 1 rewritten bucket, got {changed}"
    assert lake.table(t).count() == 40  # replaced, not duplicated


def test_tombstone_only_merge_removes_rows(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = [f"v{i}" for i in range(10)]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    empty = _vp_rows(spark, [])
    lake.merge_keyed(t, empty, _keys(spark, ["v3"]), key="vehicle_position_id", n_buckets=N_BUCKETS)
    left = {r["vehicle_position_id"] for r in lake.table(t).collect()}
    assert left == set(ids) - {"v3"}


def test_expire_keyed_prunes_by_bucket_min_stamp(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    old_ids = [f"old{i}" for i in range(6)]
    new_ids = [f"new{i}" for i in range(6)]
    now = time.time()
    lake.merge_keyed(t, _vp_rows(spark, old_ids, ts=now - 9000), _keys(spark, old_ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    lake.merge_keyed(t, _vp_rows(spark, new_ids, ts=now), _keys(spark, new_ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    before = lake.keyed_manifest(t)["buckets"]
    lake.expire_keyed(t, cutoff_epoch=now - 7200)
    left = {r["vehicle_position_id"] for r in lake.table(t).collect()}
    assert left == set(new_ids)
    after = lake.keyed_manifest(t)["buckets"]
    # buckets holding only fresh rows must not have been rewritten
    fresh_only = [
        b for b, meta in before.items()
        if meta["min_ts"] is not None and meta["min_ts"] > now - 7200
    ]
    for b in fresh_only:
        assert after[b]["v"] == before[b]["v"], f"fresh bucket {b} was rewritten"


def test_full_write_supersedes_keyed_layout(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = [f"v{i}" for i in range(5)]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    assert lake.keyed_manifest(t) is not None
    lake.write(t, _vp_rows(spark, ["solo"]), dedup_pk=False)
    assert lake.keyed_manifest(t) is None
    assert lake.table(t).count() == 1


def test_vacuum_keeps_live_keyed_versions(spark, tmp_path):
    import os

    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = [f"v{i}" for i in range(20)]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    for k in ("v0", "v1", "v2"):
        lake.merge_keyed(t, _vp_rows(spark, [k]), _keys(spark, [k]), key="vehicle_position_id", n_buckets=N_BUCKETS)
    lake.vacuum(t, keep=1)
    assert lake.table(t).count() == 20  # every live bucket still readable
    live = {m["v"] for m in lake.keyed_manifest(t)["buckets"].values()}
    on_disk = {
        int(e.split("=", 1)[1])
        for e in os.listdir(lake._tdir(t))
        if e.startswith("v=")
    }
    assert live <= on_disk


def test_empty_merge_is_a_noop(spark, tmp_path):
    """A merge with no changed keys must not bump versions or run write
    jobs (one-family batches shouldn't rewrite the other five tables)."""
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = ["a", "b"]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids), key="vehicle_position_id", n_buckets=N_BUCKETS)
    before = lake.keyed_manifest(t)
    lake.merge_keyed(t, _vp_rows(spark, []), _keys(spark, []), key="vehicle_position_id", n_buckets=N_BUCKETS)
    assert lake.keyed_manifest(t) == before
    assert lake.table(t).count() == 2


def test_randomized_ops_match_dict_model(spark, tmp_path):
    """Model-based check: random interleavings of keyed merges, tombstone
    deletes, and TTL expiry must leave exactly the state a plain
    dict-of-rows model predicts."""
    import random

    t = "realtime_vehicle_positions"
    base_ts = 1_700_000_000.0
    for seed in (7, 23):
        rng = random.Random(seed)
        lake = GtfsLake(spark, str(tmp_path / f"lake{seed}"))
        model: dict[str, float] = {}  # id -> last stamp
        now = base_ts
        for step in range(10):
            now += rng.uniform(10, 500)
            op = rng.choice(["upsert", "tombstone", "expire", "mixed", "fresh_only"])
            if op in ("upsert", "mixed", "fresh_only"):
                ids = [f"k{rng.randrange(12)}" for _ in range(rng.randrange(1, 5))]
                ids = sorted(set(ids))
                dead = (
                    sorted({f"k{rng.randrange(12)}" for _ in range(rng.randrange(0, 3))} - set(ids))
                    if op == "mixed"
                    else []
                )
                # fresh_only violates the merge contract (fresh rows whose
                # keys are absent from changed_keys, including pre-existing
                # keys): semantics must still be replace-not-duplicate
                changed = [] if op == "fresh_only" else ids + dead
                lake.merge_keyed(
                    t,
                    _vp_rows(spark, ids, ts=now),
                    _keys(spark, changed),
                    key="vehicle_position_id",
                    n_buckets=N_BUCKETS,
                )
                for i in ids:
                    # _vp_rows stamps at whole-second granularity
                    model[i] = float(int(now))
                for i in dead:
                    model.pop(i, None)
            elif op == "tombstone":
                dead = sorted({f"k{rng.randrange(12)}" for _ in range(rng.randrange(1, 4))})
                lake.merge_keyed(
                    t,
                    _vp_rows(spark, [], ts=now),
                    _keys(spark, dead),
                    key="vehicle_position_id",
                    n_buckets=N_BUCKETS,
                )
                for i in dead:
                    model.pop(i, None)
            else:  # expire
                cutoff = now - rng.uniform(50, 800)
                lake.expire_keyed(t, cutoff_epoch=cutoff)
                model = {i: ts for i, ts in model.items() if ts > cutoff}
            # a LIST, not a set: one row per entity key is part of the
            # invariant (a set comparison would mask duplicate rows)
            got = sorted(
                r["vehicle_position_id"] for r in lake.table(t).collect()
            )
            assert got == sorted(model), (
                f"seed {seed} step {step} op {op}: lake={got} "
                f"model={sorted(model)}"
            )


def test_bucket_count_migration_mid_stream(spark, tmp_path):
    """Changing n_buckets (16 -> 32) mid-stream triggers a one-time full
    rewrite into the new layout, after which bucket-pruned merges resume.
    Migration is the rarely-run path that corrupts state in production
    systems — pin rows, manifest shape, and post-migration prune behavior.
    """
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    ids = [f"v{i}" for i in range(60)]
    lake.merge_keyed(t, _vp_rows(spark, ids), _keys(spark, ids),
                     key="vehicle_position_id", n_buckets=16)
    m16 = lake.keyed_manifest(t)
    assert m16["n_buckets"] == 16
    assert all(0 <= int(b) < 16 for b in m16["buckets"])

    # same merge API with n_buckets=32: one-time full rewrite
    lake.merge_keyed(t, _vp_rows(spark, ["v0"]), _keys(spark, ["v0"]),
                     key="vehicle_position_id", n_buckets=32)
    m32 = lake.keyed_manifest(t)
    assert m32["n_buckets"] == 32
    assert all(0 <= int(b) < 32 for b in m32["buckets"])
    # every bucket belongs to the migration version (full rewrite, no
    # stale 16-bucket entries survive)
    versions = {meta["v"] for meta in m32["buckets"].values()}
    assert len(versions) == 1
    assert lake.table(t).count() == 60  # no rows lost or duplicated

    # post-migration: bucket-pruned behavior resumes (single-key update
    # advances exactly one bucket version)
    lake.merge_keyed(t, _vp_rows(spark, ["v1"]), _keys(spark, ["v1"]),
                     key="vehicle_position_id", n_buckets=32)
    m_after = lake.keyed_manifest(t)
    changed = [b for b in m_after["buckets"]
               if m_after["buckets"][b]["v"] != m32["buckets"].get(b, {}).get("v")]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    assert lake.table(t).count() == 60


def test_fresh_rows_outside_changed_keys_still_merge(spark, tmp_path):
    """Contract guard: a fresh row whose key is absent from changed_keys
    must still be written (buckets derive from changed_keys ∪ fresh keys),
    not silently filtered by the touched-bucket clause."""
    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    lake.merge_keyed(t, _vp_rows(spark, ["a", "b"]), _keys(spark, ["a", "b"]),
                     key="vehicle_position_id", n_buckets=N_BUCKETS)
    # violate the contract: fresh carries "c", changed_keys is EMPTY
    lake.merge_keyed(t, _vp_rows(spark, ["c"]), _keys(spark, []),
                     key="vehicle_position_id", n_buckets=N_BUCKETS)
    got = {r["vehicle_position_id"] for r in lake.table(t).collect()}
    assert got == {"a", "b", "c"}, "fresh row outside changed_keys was dropped"
    # same violation for a PRE-EXISTING key: must replace, not duplicate
    lake.merge_keyed(t, _vp_rows(spark, ["a"]), _keys(spark, []),
                     key="vehicle_position_id", n_buckets=N_BUCKETS)
    rows = [r["vehicle_position_id"] for r in lake.table(t).collect()]
    assert sorted(rows) == ["a", "b", "c"], f"duplicated entity rows: {sorted(rows)}"


def test_null_key_fresh_rows_fail_loudly(spark, tmp_path):
    """A null entity key can't be matched, deleted, or bucketed — the
    merge raises instead of silently dropping the row."""
    import pytest

    lake = _mk_lake(spark, tmp_path)
    t = "realtime_vehicle_positions"
    bad = spark.createDataFrame(
        [(None, 1.0, 2.0)],
        "vehicle_position_id string, position_latitude double, position_longitude double",
    ).withColumn("last_updated_timestamp", F.current_timestamp())
    with pytest.raises(ValueError, match="null"):
        lake.merge_keyed(t, bad, _keys(spark, []),
                         key="vehicle_position_id", n_buckets=N_BUCKETS)


# -- segment (append-only) layout ----------------------------------------


def _seg_docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "doc_id long, text string"
    )


def test_segment_append_is_batch_sized_and_readable(spark, tmp_path):
    import os

    lake = _mk_lake(spark, tmp_path)
    lake.append_segment("seg_docs", _seg_docs(spark, [1, 2]))
    lake.append_segment("seg_docs", _seg_docs(spark, [3]))
    assert sorted(r["doc_id"] for r in lake.table("seg_docs").collect()) == [1, 2, 3]
    m = lake.segment_manifest("seg_docs")
    assert m["segments"] == ["seg=1", "seg=2"]
    # each segment holds only its own batch — O(batch) I/O per append
    tdir = os.path.join(str(tmp_path / "lake"), "seg_docs")
    assert spark.read.parquet(os.path.join(tdir, "seg=2")).count() == 1


def test_segment_meta_commits_atomically_with_rows(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    lake.append_segment("seg_docs", _seg_docs(spark, [1]), meta={"ingest_batch_id": 0})
    lake.append_segment("seg_docs", _seg_docs(spark, [2]), meta={"ingest_batch_id": 1})
    assert lake.segment_meta("seg_docs") == {"ingest_batch_id": 1}


def test_segment_append_refuses_pointer_layout_tables(spark, tmp_path):
    import pytest

    lake = _mk_lake(spark, tmp_path)
    lake.write("seg_docs", _seg_docs(spark, [1]))
    with pytest.raises(ValueError, match="segment layout"):
        lake.append_segment("seg_docs", _seg_docs(spark, [2]))


def test_full_write_supersedes_segment_layout(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    lake.append_segment("seg_docs", _seg_docs(spark, [1, 2]))
    lake.write("seg_docs", _seg_docs(spark, [9]))
    assert lake.segment_manifest("seg_docs") is None
    assert [r["doc_id"] for r in lake.table("seg_docs").collect()] == [9]


def test_vacuum_gcs_orphan_segments(spark, tmp_path):
    """A crash between the segment parquet write and the manifest swap
    leaves an orphan seg dir: invisible to readers, removed by vacuum."""
    import json as _json
    import os

    lake = _mk_lake(spark, tmp_path)
    lake.append_segment("seg_docs", _seg_docs(spark, [1]))
    lake.append_segment("seg_docs", _seg_docs(spark, [2]))
    # forge the crash: roll the manifest back to only seg=1
    mpath = os.path.join(str(tmp_path / "lake"), "seg_docs", "_SEGMENTS.json")
    with open(mpath) as fh:
        m = _json.load(fh)
    m["segments"] = ["seg=1"]
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    assert [r["doc_id"] for r in lake.table("seg_docs").collect()] == [1]
    lake.vacuum("seg_docs")
    tdir = os.path.join(str(tmp_path / "lake"), "seg_docs")
    assert sorted(e for e in os.listdir(tdir) if e.startswith("seg=")) == ["seg=1"]


def test_compact_segments_folds_then_reads_same(spark, tmp_path):
    import os

    lake = _mk_lake(spark, tmp_path)
    for ids in ([1, 2], [3], [4, 5]):
        lake.append_segment("seg_docs", _seg_docs(spark, ids))
    lake.compact_segments("seg_docs")
    assert lake.segment_manifest("seg_docs") is None
    assert lake.current_version("seg_docs") is not None
    assert sorted(r["doc_id"] for r in lake.table("seg_docs").collect()) == [1, 2, 3, 4, 5]
    tdir = os.path.join(str(tmp_path / "lake"), "seg_docs")
    assert not any(e.startswith("seg=") for e in os.listdir(tdir))


def test_fold_segments_preserves_rows_meta_and_appendability(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path)
    lake.append_segment("seg_docs", _seg_docs(spark, [1, 2]), meta={"ingest_batch_id": 0})
    lake.append_segment("seg_docs", _seg_docs(spark, [3]), meta={"ingest_batch_id": 1})
    lake.fold_segments("seg_docs")
    m = lake.segment_manifest("seg_docs")
    assert len(m["segments"]) == 1 and m["meta"] == {"ingest_batch_id": 1}
    assert sorted(r["doc_id"] for r in lake.table("seg_docs").collect()) == [1, 2, 3]
    # still appendable after the fold (unlike compact_segments)
    lake.append_segment("seg_docs", _seg_docs(spark, [4]), meta={"ingest_batch_id": 2})
    assert sorted(r["doc_id"] for r in lake.table("seg_docs").collect()) == [1, 2, 3, 4]
    lake.vacuum("seg_docs")  # superseded segment dirs are orphans now
    import os

    tdir = os.path.join(str(tmp_path / "lake"), "seg_docs")
    live = set(lake.segment_manifest("seg_docs")["segments"])
    assert {e for e in os.listdir(tdir) if e.startswith("seg=")} == live


def test_segment_randomized_ops_match_list_model(spark, tmp_path):
    """Model-based check for the segment layout: random interleavings of
    appends (with meta), folds, vacuums, and a final compaction must
    always read back exactly the appended multiset of rows, keep the
    latest meta, and never leave the manifest referencing a missing dir."""
    import json
    import os
    import random

    for seed in (3, 41):
        rng = random.Random(seed)
        lake = _mk_lake(spark, tmp_path / f"seg{seed}")
        model_rows: list[int] = []
        model_meta: dict = {}
        next_id = 0
        for step in range(12):
            op = rng.choice(["append", "append", "append", "fold", "vacuum"])
            if op == "append":
                n = rng.randrange(1, 4)
                ids = list(range(next_id, next_id + n))
                next_id += n
                meta = {"ingest_batch_id": step} if rng.random() < 0.7 else None
                lake.append_segment("seg_docs", _seg_docs(spark, ids), meta=meta)
                model_rows.extend(ids)
                if meta:
                    model_meta.update(meta)
            elif op == "fold":
                lake.fold_segments("seg_docs")
            else:
                lake.vacuum("seg_docs")
            if not lake.exists("seg_docs"):
                assert not model_rows
                continue
            got = sorted(r["doc_id"] for r in lake.table("seg_docs").collect())
            assert got == sorted(model_rows), (seed, step, op)
            assert lake.segment_meta("seg_docs") == model_meta, (seed, step, op)
            m = lake.segment_manifest("seg_docs")
            if m is not None:
                tdir = os.path.join(str(tmp_path / f"seg{seed}" / "lake"), "seg_docs")
                for seg in m["segments"]:
                    assert os.path.isdir(os.path.join(tdir, seg)), (seed, step, seg)
                # manifest JSON on disk parses and matches the API view
                with open(os.path.join(tdir, "_SEGMENTS.json")) as fh:
                    assert json.load(fh) == m
        if model_rows:
            lake.compact_segments("seg_docs")
            got = sorted(r["doc_id"] for r in lake.table("seg_docs").collect())
            assert got == sorted(model_rows), seed
