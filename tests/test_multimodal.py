"""Multimodal plumbing: the decode step is a stub, but the Spark-side
contract — schema, Arrow batch shape, metadata rewrite — is exercised for
real, on real DataFrames."""

from __future__ import annotations

import numpy as np
import pytest

from py_gtfs_duckdb_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "abcabc"), (2, ""), (3, "zzzz")],
        "doc_id long, text string",
    )
    return M.documents_as_media(docs)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_media(b"xyz")


def test_resize_avg_pools_the_fake_pixels(spark, media):
    out = {r["media_id"]: r for r in M.resize_media(media, out_w=4).collect()}
    # metadata rewrite: width becomes out_w, height preserved
    assert out[1]["width"] == 4 and out[1]["height"] == 1
    # value check against the fake decoder run locally
    px = M.decode_media(b"abcabc", fake=True)
    want = [float(c.mean()) for c in np.array_split(px, 4)]
    assert out[1]["resized"] == pytest.approx(want)
    # empty payload still yields out_w cells
    assert len(out[2]["resized"]) == 4


def test_features_schema_and_determinism(spark, media):
    rows = M.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[1]["n_bytes"] == 6
    assert len(by_id[1]["features"]) == M.FEATURE_DIM
    # deterministic fake: same payload -> same features
    assert by_id[1]["features"] == M.decode_media(b"abcabc", fake=True).tolist()


def test_sample_frames_bounds(spark, media):
    rows = M.sample_frames(media, every_n_bytes=2, max_frames=2).collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r["media_id"], []).append(r)
    assert all(len(v) <= 2 for v in per_id.values())
