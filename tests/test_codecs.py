"""PNG codec (operators/codecs.py): round-trips, every scanline filter
against an independent reference unfilter, container dispatch, and the
explicit-rejection paths (wrong pixels must be impossible — unsupported
shapes error loudly)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from py_gtfs_duckdb_spark.operators.codecs import (
    _PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("shape", [(5, 7), (12, 16, 3), (9, 4, 4), (1, 1), (1, 3, 3)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape and (back == img).all()


def _ref_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Independent scalar re-implementation of PNG unfiltering (spec
    pseudocode, no shared helpers with the codec under test)."""
    out = np.zeros((h, stride), dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        for x in range(stride):
            v = raw[p]
            p += 1
            a = out[y, x - bpp] if x >= bpp else 0
            b = out[y - 1, x] if y > 0 else 0
            c = out[y - 1, x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0:
                r = v
            elif f == 1:
                r = v + a
            elif f == 2:
                r = v + b
            elif f == 3:
                r = v + ((a + b) >> 1)
            else:
                pth = a + b - c
                pa, pb, pc = abs(pth - a), abs(pth - b), abs(pth - c)
                r = v + (a if (pa <= pb and pa <= pc) else (b if pb <= pc else c))
            out[y, x] = r & 0xFF
    return out.astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_all_filters_match_reference(channels):
    """Scanlines cycling filters 0..4 (incl. Paeth on every channel
    count) decode identically to the reference unfilter."""
    rng = np.random.default_rng(channels)
    h, w = 7, 5
    stride = w * channels
    raw = bytearray()
    for y in range(h):
        raw.append(y % 5)
        raw += bytes(rng.integers(0, 256, size=stride, dtype=np.uint8))
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got = decode_png(png)
    want = _ref_unfilter(bytes(raw), h, stride, channels).reshape(h, w, channels)
    if channels == 1:
        want = want[:, :, 0]
    assert (got == want).all()


def test_png_multiple_idat_chunks():
    img = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    whole = encode_png(img)
    # split the single IDAT's compressed stream across two chunks
    body_start = whole.index(b"IDAT") + 4
    (length,) = struct.unpack_from(">I", whole, body_start - 8)
    comp = whole[body_start : body_start + length]
    head = whole[: body_start - 8]
    tail = whole[whole.index(b"IEND") - 4 :]
    split = head + _chunk(b"IDAT", comp[:7]) + _chunk(b"IDAT", comp[7:]) + tail
    assert (decode_png(split) == img).all()


def test_png_rejections():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    w = h = 4
    for ihdr, msg in [
        (struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0), "bit depth 8"),
        (struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0), "color type"),
        (struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1), "interlaced"),
    ]:
        png = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match=msg):
            decode_png(png)
    # raster size mismatch (honest truncation error, not garbage pixels)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="raster size"):
        decode_png(png)
    # unknown critical chunk refuses; unknown ancillary is skipped
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    ok = encode_png(img)
    with_anc = ok[:8] + _chunk(b"tEXt", b"k\x00v") + ok[8:]
    assert (decode_png(with_anc) == img).all()
    with_crit = ok[:8] + _chunk(b"XXXX", b"") + ok[8:]
    with pytest.raises(ValueError, match="critical"):
        decode_png(with_crit)


def test_decode_image_dispatch(spark):
    """decode_image routes PPM and PNG payloads to real decoders and the
    synthesizers produce pixel-identical gradients across containers."""
    from py_gtfs_duckdb_spark.operators.multimodal import (
        decode_image,
        synth_png,
        synth_ppm,
    )

    for seed in (0, 7, 255):
        a = decode_image(synth_ppm(seed))
        b = decode_image(synth_png(seed))
        assert (a == b).all() and a.shape == (12, 16, 3)
    # unknown magic -> honest stub error; malformed KNOWN magic -> the
    # codec's own loud parse error, never silent wrong pixels
    with pytest.raises(NotImplementedError, match="image container"):
        decode_image(b"GIF89a not supported")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated jpeg")


# --- baseline JPEG ---------------------------------------------------------


from py_gtfs_duckdb_spark.operators.codecs import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


@pytest.mark.parametrize(
    ("shape", "quality", "max_err"),
    [
        ((12, 16, 3), 90, 6),
        ((24, 24, 3), 75, 14),
        ((17, 24), 95, 4),    # grayscale, non-multiple-of-8 height
        ((9, 13, 3), 92, 8),  # both dims ragged
        ((8, 8, 3), 50, 24),
    ],
)
def test_jpeg_roundtrip_smooth(shape, quality, max_err):
    """Encode->decode of a smooth gradient stays within the quantization
    error budget for the quality level (JPEG is lossy by design; the
    budget shrinks as quality rises)."""
    from py_gtfs_duckdb_spark.operators.multimodal import _synth_gradient

    if len(shape) == 3:
        img = _synth_gradient(7, shape[1], shape[0])
    else:
        img = np.tile(
            (np.arange(shape[1], dtype=np.uint16) * 255 // (shape[1] - 1)).astype(
                np.uint8
            ),
            (shape[0], 1),
        )
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= max_err, (err.mean(), err.max())


def test_jpeg_restart_intervals():
    """DRI + RSTn markers decode with predictor resets; pixels match the
    no-restart encoding of the same image."""
    from py_gtfs_duckdb_spark.operators.multimodal import _synth_gradient

    img = _synth_gradient(9, 40, 24)
    plain = decode_jpeg(encode_jpeg(img, quality=92))
    with_rst = encode_jpeg(img, quality=92, restart_interval=3)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert (decode_jpeg(with_rst) == plain).all()


def test_jpeg_rejections():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6 1 1 255 ")
    # progressive frame header (SOF2) rejects loudly
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="baseline only"):
        decode_jpeg(sof2)
    # 12-bit precision rejects
    sof12 = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 11)
        + bytes([12]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(sof12)


def test_jpeg_cross_validates_with_javax_imageio(spark):
    """Standard-compliance gate: the JVM's javax.imageio (an independent
    public implementation) must read THIS encoder's output, and this
    decoder must read ImageIO's output (Annex-K Huffman tables + its
    default chroma subsampling) — so a self-consistent-but-non-standard
    bug (e.g. a mirrored zigzag used by both halves) cannot hide."""
    from py_gtfs_duckdb_spark.operators.multimodal import _synth_gradient

    jvm = spark._jvm
    img = _synth_gradient(5, 32, 24)
    h, w = img.shape[:2]

    bais = jvm.java.io.ByteArrayInputStream(
        bytearray(encode_jpeg(img, quality=90))
    )
    bi = jvm.javax.imageio.ImageIO.read(bais)
    assert bi is not None and (bi.getWidth(), bi.getHeight()) == (w, h)
    dec = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            rgb = bi.getRGB(x, y)
            dec[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
    err = np.abs(dec - img.astype(np.int64))
    assert err.max() <= 8, (err.mean(), err.max())

    bi2 = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            bi2.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi2, "jpg", baos)
    back = decode_jpeg(bytes(baos.toByteArray()))
    err2 = np.abs(back.astype(np.int64) - img.astype(np.int64))
    # ImageIO default quality ~0.75 with chroma subsampling: looser budget
    assert back.shape == img.shape and err2.max() <= 32, (
        err2.mean(),
        err2.max(),
    )


def test_decode_image_dispatches_jpeg():
    from py_gtfs_duckdb_spark.operators.multimodal import (
        _synth_gradient,
        decode_image,
    )

    img = _synth_gradient(3, 16, 12)
    got = decode_image(encode_jpeg(img, quality=90))
    assert got.shape == (12, 16, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6
