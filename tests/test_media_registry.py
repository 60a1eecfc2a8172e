"""Pluggable media-decoder registry (operators/media_registry.py).

The contract VERDICT r12 Next #2 asked for: a deployment with real codec
libraries can inject a decoder for a format the built-ins reject —
through the same hook the built-ins register through — and the injected
decoder runs end-to-end through the Spark operators, including on
executor workers that never saw the driver-side registration (the
plan-build-time snapshot rides in the serialized closure)."""

from __future__ import annotations

import numpy as np
import pytest

from py_gtfs_duckdb_spark.operators import media_registry as R
from py_gtfs_duckdb_spark.operators import multimodal as M

FAKE_MAGIC = b"FAKEIMG1"


def _fake_matches(p: bytes) -> bool:
    return p.startswith(b"FAKEIMG1")


def _fake_decode(p: bytes):
    # deterministic 2x2 RGB image derived from the byte after the magic
    v = p[8] if len(p) > 8 else 0
    return np.full((2, 2, 3), v, dtype=np.uint8)


@pytest.fixture
def clean_registry():
    """Guarantee no fake entries leak between tests."""
    yield
    for kind in ("image", "audio", "video"):
        for name in list(R.registered_names(kind)):
            if name.startswith("test-"):
                R.unregister_decoder(kind, name)


def test_builtins_registered_via_the_same_hook():
    assert R.registered_names("image") == [
        "ppm-p6", "png", "jpeg", "gif", "bmp",
    ]
    assert R.registered_names("audio") == ["wav-riff"]
    assert R.registered_names("video") == ["y4m", "avi-mjpeg"]


def test_rejection_names_the_hook_and_the_registered_decoders():
    with pytest.raises(NotImplementedError) as exc:
        M.decode_image(b"RIFF0000WEBPVP8 definitely unsupported")
    msg = str(exc.value)
    assert "register_decoder" in msg
    assert "ppm-p6" in msg and "png" in msg and "jpeg" in msg and "gif" in msg
    with pytest.raises(NotImplementedError) as exc:
        M.decode_wav(b"ID3\x03 mp3 frame goes here")
    assert "register_decoder" in str(exc.value)
    with pytest.raises(NotImplementedError) as exc:
        M.decode_video(b"\x00\x00\x00\x18ftypisom h264 mp4")
    assert "register_decoder" in str(exc.value)


def test_injected_decoder_handles_format_builtins_reject(clean_registry):
    payload = FAKE_MAGIC + bytes([200])
    with pytest.raises(NotImplementedError):
        M.decode_image(payload)
    R.register_decoder("image", "test-fake", _fake_matches, _fake_decode)
    try:
        img = M.decode_image(payload)
        assert img.shape == (2, 2, 3) and int(img[0, 0, 0]) == 200
    finally:
        assert R.unregister_decoder("image", "test-fake")
    with pytest.raises(NotImplementedError):
        M.decode_image(payload)


def test_injected_decoder_runs_through_spark_operator(spark, clean_registry):
    """End-to-end: a media table whose payloads ONLY the injected decoder
    understands flows through resize_images (mapInPandas on executor
    workers). Registration happens driver-side only — the plan-build-time
    snapshot must carry the decoder into the workers. The decoder is
    defined LOCALLY (like a notebook/driver-script plug-in) so cloudpickle
    serializes it by value; a decoder from an installed module is pickled
    by reference and ships to executors the normal --py-files way."""
    rows = [(i, FAKE_MAGIC + bytes([i * 10])) for i in range(1, 6)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    def local_decode(p: bytes):
        v = p[8] if len(p) > 8 else 0
        return np.full((2, 2, 3), v, dtype=np.uint8)

    R.register_decoder(
        "image", "test-fake", lambda p: p.startswith(b"FAKEIMG1"), local_decode
    )
    try:
        out = M.resize_images(media, out_w=2, out_h=2)
        got = {r["media_id"]: r["pixels"] for r in out.collect()}
    finally:
        R.unregister_decoder("image", "test-fake")
    assert set(got) == {1, 2, 3, 4, 5}
    for mid, px in got.items():
        assert px == [float(mid * 10)] * 4  # constant image -> constant cells


def test_snapshot_travels_with_the_plan(spark, clean_registry):
    """The registry is captured at PLAN BUILD: unregistering after the
    plan is built must not break execution — the entries ride in the
    serialized closure (the documented executor-side contract)."""
    rows = [(7, FAKE_MAGIC + bytes([70]))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    def local_decode(p: bytes):
        v = p[8] if len(p) > 8 else 0
        return np.full((2, 2, 3), v, dtype=np.uint8)

    R.register_decoder(
        "image", "test-fake", lambda p: p.startswith(b"FAKEIMG1"), local_decode
    )
    plan = M.resize_images(media, out_w=1, out_h=1)
    R.unregister_decoder("image", "test-fake")
    [row] = plan.collect()
    assert row["pixels"] == [70.0]
    # and a FRESH plan built after unregistration rejects again
    with pytest.raises(Exception, match="register_decoder"):
        M.resize_images(media, out_w=1, out_h=1).collect()


def test_prepend_shadows_builtin_and_unregister_restores(clean_registry):
    """An injected library decoder (e.g. libjpeg-turbo) wins over the
    built-in whose matcher also claims the payload; removing it restores
    the built-in — the exact upgrade path a deployment would use."""
    png = M.synth_png(3)
    builtin = M.decode_image(png)
    sentinel = np.zeros((1, 1, 3), dtype=np.uint8)
    R.register_decoder(
        "image", "test-turbo",
        lambda p: p.startswith(b"\x89PNG"), lambda p: sentinel,
    )
    assert M.decode_image(png).shape == (1, 1, 3)
    R.unregister_decoder("image", "test-turbo")
    assert np.array_equal(M.decode_image(png), builtin)


def test_audio_and_video_injection(spark, clean_registry):
    """Same hook works for the other two modalities, end-to-end through
    audio_features / video_frame_features."""
    def audio_decode(p: bytes):
        return 8000, np.full(16, 0.5, dtype=np.float64)

    def video_decode(p: bytes):
        return 4, 2, [np.full((2, 4), 9, dtype=np.uint8)] * 3

    R.register_decoder(
        "audio", "test-mp3", lambda p: p.startswith(b"ID3"), audio_decode
    )
    R.register_decoder(
        "video", "test-h264",
        lambda p: len(p) > 11 and p[4:8] == b"ftyp", video_decode,
    )
    try:
        audio = spark.createDataFrame(
            [(1, b"ID3\x04fake-mp3")], "media_id long, payload binary"
        )
        [arow] = M.audio_features(audio).collect()
        assert arow["sample_rate"] == 8000 and arow["n_samples"] == 16
        assert arow["peak"] == pytest.approx(0.5)

        video = spark.createDataFrame(
            [(2, b"\x00\x00\x00\x18ftypisomfake")],
            "media_id long, payload binary",
        )
        vrows = M.video_frame_features(video).collect()
        assert len(vrows) == 3
        assert all(r["mean_luma"] == 9 and r["width"] == 4 for r in vrows)
    finally:
        R.unregister_decoder("audio", "test-mp3")
        R.unregister_decoder("video", "test-h264")


def test_register_replaces_by_name_and_validates_kind(clean_registry):
    R.register_decoder("image", "test-x", _fake_matches, _fake_decode)
    n = len(R.registered_names("image"))
    R.register_decoder("image", "test-x", _fake_matches, _fake_decode)
    assert len(R.registered_names("image")) == n  # replaced, not duplicated
    R.unregister_decoder("image", "test-x")
    assert not R.unregister_decoder("image", "test-x")  # already gone
    with pytest.raises(ValueError, match="unknown media kind"):
        R.register_decoder("text", "test-y", _fake_matches, _fake_decode)
