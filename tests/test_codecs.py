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
        decode_image(b"RIFF0000WEBPVP8 webp needs a library decoder")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated jpeg")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a truncated gif")


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


# --- G.711 audio + MJPEG-AVI video ------------------------------------------


def test_g711_tables_match_published_anchors():
    from py_gtfs_duckdb_spark.operators.codecs import (
        alaw_decode_table,
        ulaw_decode_table,
    )

    u, a = ulaw_decode_table(), alaw_decode_table()
    # published G.711 extremes: µ-law max ±32124, zero codes 0xFF/0x7F;
    # A-law 0x55 = −8 (its defining anchor), max magnitude 32256
    assert u[0xFF] == 0 and u[0x7F] == 0
    assert u[0x80] == 32124 and u[0x00] == -32124
    assert a[0x55] == -8 and a[0xD5] == 8
    assert a[0x2A] == -32256 and a[0xAA] == 32256


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_wav_roundtrip_and_decode_wav(law):
    from py_gtfs_duckdb_spark.operators.codecs import (
        alaw_decode_table,
        encode_wav_g711,
        g711_encode,
        parse_wav,
        ulaw_decode_table,
    )
    from py_gtfs_duckdb_spark.operators.multimodal import decode_wav

    x = (np.sin(np.arange(640) / 9.0) * 15000).astype(np.int16)
    wav = encode_wav_g711(x, 8000, law)
    sr, n_ch, code, samples = parse_wav(wav)
    assert (sr, n_ch, code) == (8000, 1, 7 if law == "ulaw" else 6)
    table = ulaw_decode_table() if law == "ulaw" else alaw_decode_table()
    assert (samples == table[g711_encode(x, law)]).all()
    # companding error is bounded by the top-segment step size
    assert np.abs(samples.astype(int) - x.astype(int)).max() <= 1024
    # the multimodal audio path consumes it transparently
    sr2, f = decode_wav(wav)
    assert sr2 == 8000 and len(f) == len(x) and np.abs(f).max() <= 1.0


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_bit_exact_vs_javax_sound(spark, law):
    """javax.sound.sampled's ULAW/ALAW -> PCM conversion (an independent
    public implementation) must agree SAMPLE-FOR-SAMPLE with the numpy
    expansion tables."""
    from py_gtfs_duckdb_spark.operators.codecs import (
        encode_wav_g711,
        parse_wav,
    )

    jvm = spark._jvm
    x = (np.sin(np.arange(800) / 10.0) * 12000).astype(np.int16)
    wav = encode_wav_g711(x, 8000, law)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(wav))
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bais)
    fmt = ais.getFormat()
    assert str(fmt.getEncoding()) == ("ULAW" if law == "ulaw" else "ALAW")
    pcmfmt = jvm.javax.sound.sampled.AudioFormat(
        fmt.getSampleRate(), 16, 1, True, False
    )
    pcm = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(pcmfmt, ais)
    java = np.frombuffer(bytes(pcm.readAllBytes()), dtype="<i2").astype(int)
    _, _, _, mine = parse_wav(wav)
    n = min(len(java), len(mine))
    assert n == len(x)
    assert (java[:n] == mine[:n].astype(int)).all()


def test_parse_wav_rejections():
    from py_gtfs_duckdb_spark.operators.codecs import parse_wav

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        parse_wav(b"not a wav")
    # ADPCM (format 0x11) rejects loudly
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 1, 4)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="format code 17"):
        parse_wav(wav)


def test_mjpeg_avi_roundtrip_and_frame_features():
    from py_gtfs_duckdb_spark.operators.codecs import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from py_gtfs_duckdb_spark.operators.multimodal import (
        _synth_gradient,
        decode_video,
        decode_y4m,
        synth_y4m,
    )

    frames = [_synth_gradient(s, 16, 12) for s in (1, 2, 3)]
    avi = encode_avi_mjpeg(frames)
    w, h, out = decode_avi_mjpeg(avi)
    assert (w, h, len(out)) == (16, 12, 3)
    for f, o in zip(frames, out):
        assert np.abs(f.astype(int) - o.astype(int)).max() <= 6

    # decode_video dispatch: Y4M still exact; AVI luma close to the
    # frame's analytic luma
    wy, hy, y4m_frames = decode_video(synth_y4m(5))
    assert (wy, hy, len(y4m_frames)) == decode_y4m(synth_y4m(5))[:2] + (
        len(decode_y4m(synth_y4m(5))[2]),
    )
    w2, h2, lumas = decode_video(avi)
    assert (w2, h2) == (16, 12) and len(lumas) == 3
    for f, l in zip(frames, lumas):
        rgb = f.astype(np.float64)
        want = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        assert np.abs(l.astype(float) - want).max() <= 8

    with pytest.raises(NotImplementedError, match="video container"):
        decode_video(b"mkv nope")
    # non-MJPG AVI rejects loudly
    bad = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="MJPG only"):
        decode_avi_mjpeg(bad)


def test_jpeg_header_tolerates_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2-3 (ADVICE r12): any number of 0xFF fill bytes may
    precede a marker, and TEM (0x01) / RSTn (0xD0-0xD7) are standalone
    length-less markers — a conforming stream padded with either must
    decode identically to the clean stream."""
    from py_gtfs_duckdb_spark.operators.codecs import decode_jpeg, encode_jpeg
    from py_gtfs_duckdb_spark.operators.multimodal import _synth_gradient

    img = _synth_gradient(9, 16, 12)
    clean = encode_jpeg(img, quality=90)
    want = decode_jpeg(clean)
    # after SOI: a TEM marker, then two fill bytes glued onto the next
    # segment's own 0xFF (making a run of three)
    padded = clean[:2] + b"\xff\x01" + b"\xff\xff" + clean[2:]
    got = decode_jpeg(padded)
    assert np.array_equal(got, want)
    # an RST marker between header segments is equally standalone
    padded_rst = clean[:2] + b"\xff\xd3" + clean[2:]
    assert np.array_equal(decode_jpeg(padded_rst), want)


def _multi_stream_avi(stream_defs, movi_chunks):
    """Hand-build an AVI with several strl lists (stream_defs: list of
    (fccType, handler)) and an explicit movi chunk sequence (tag, body)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I", 40_000, 0, 0, 0x10, 3, 0, len(stream_defs), 0,
        16, 12, 0, 0, 0, 0,
    )
    strls = b""
    for fcc_type, handler in stream_defs:
        strh = (
            fcc_type + handler
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 3, 0, 0, 0xFFFFFFFF)
            + struct.pack("<4H", 0, 0, 16, 12)
        )
        strf = struct.pack(
            "<IiiHH4sIiiII", 40, 16, 12, 1, 24, handler, 16 * 12 * 3, 0, 0, 0, 0
        )
        strls += lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi = lst(b"movi", b"".join(chunk(t, b) for t, b in movi_chunks))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_avi_multi_stream_selects_the_vids_stream():
    """ADVICE r12: a multi-stream AVI must yield ONLY the first 'vids'
    stream's frames — no interleaving of chunks from other streams."""
    from py_gtfs_duckdb_spark.operators.codecs import (
        decode_avi_mjpeg,
        encode_jpeg,
    )
    from py_gtfs_duckdb_spark.operators.multimodal import _synth_gradient

    good = [encode_jpeg(_synth_gradient(s, 16, 12), quality=92) for s in (1, 2)]
    other = [encode_jpeg(_synth_gradient(s, 16, 12), quality=92) for s in (7, 8)]

    # audio stream first: the vids stream is stream 1, its chunks '01dc'
    avi = _multi_stream_avi(
        [(b"auds", b"\x00\x00\x00\x00"), (b"vids", b"MJPG")],
        [
            (b"00wb", b"\x01\x02\x03\x04"),
            (b"01dc", good[0]),
            (b"00wb", b"\x05\x06\x07\x08"),
            (b"01dc", good[1]),
        ],
    )
    w, h, frames = decode_avi_mjpeg(avi)
    assert (w, h, len(frames)) == (16, 12, 2)

    # TWO video streams interleaved: only stream 0 (the first 'vids')
    # may contribute — the pre-fix decoder returned all four frames
    avi2 = _multi_stream_avi(
        [(b"vids", b"MJPG"), (b"vids", b"MJPG")],
        [
            (b"00dc", good[0]),
            (b"01dc", other[0]),
            (b"00dc", good[1]),
            (b"01dc", other[1]),
        ],
    )
    w2, h2, frames2 = decode_avi_mjpeg(avi2)
    assert (w2, h2, len(frames2)) == (16, 12, 2)
    from py_gtfs_duckdb_spark.operators.codecs import decode_jpeg

    for got, payload in zip(frames2, good):
        assert np.array_equal(got, decode_jpeg(payload))

    # stream headers present but none 'vids' -> loud rejection
    avi3 = _multi_stream_avi(
        [(b"auds", b"\x00\x00\x00\x00")], [(b"00wb", b"\x00\x00")]
    )
    with pytest.raises(ValueError, match="no 'vids' stream"):
        decode_avi_mjpeg(avi3)


@pytest.mark.slow
def test_jpeg_entropy_rework_differential_soak(spark):
    """Randomized differential soak for the r13 entropy-path rework
    (segment unstuffing + prefix-LUT + single-peek coefficient decode +
    batched IDCT): random images across sizes, qualities, and restart
    intervals must decode from THIS encoder's streams within the same
    error budget javax.imageio achieves on them — and javax must accept
    every stream. Catches any decode drift the fixed-case tests miss."""
    from py_gtfs_duckdb_spark.operators.codecs import decode_jpeg, encode_jpeg

    jvm = spark._jvm
    rng = np.random.default_rng(1307)
    for trial in range(12):
        h = int(rng.integers(8, 70))
        w = int(rng.integers(8, 70))
        # mix of smooth gradients (typical photos) and hard noise
        if trial % 2:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 3 + trial * 11) % 256,
                    (yy * 5 + trial * 7) % 256,
                    (xx + yy + trial) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
        q = int(rng.choice([35, 60, 80, 92]))
        ri = int(rng.choice([0, 1, 3]))
        payload = encode_jpeg(img, quality=q, restart_interval=ri)

        ours = decode_jpeg(payload)
        bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        assert bi is not None and (bi.getWidth(), bi.getHeight()) == (w, h)
        theirs = np.zeros((h, w, 3), dtype=np.int64)
        for y in range(h):
            for x in range(w):
                rgb = bi.getRGB(x, y)
                theirs[y, x] = [
                    (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF,
                ]
        # both decoders read the same stream: residual divergence is
        # implementation-defined IDCT/color rounding (T.81 Annex A puts
        # no bit-exact requirement on the inverse transform), which on
        # hard-noise images amplifies at out-of-gamut pixels — so gate
        # the DISTRIBUTION (overwhelmingly <=1), not the worst pixel
        diff = np.abs(ours.astype(np.int64) - theirs)
        assert diff.mean() <= 1.0, (trial, h, w, q, ri, diff.mean())
        assert np.percentile(diff, 99) <= 4, (trial, h, w, q, ri)
        assert diff.max() <= 64, (trial, h, w, q, ri, diff.max())


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators.codecs import (  # noqa: E402
    decode_gif,
    encode_gif,
)


def _palette_img(seed: int, h: int, w: int, n_colors: int = 120):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_lossless(interlace):
    img = _palette_img(3, 24, 31)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


def test_gif_roundtrip_crosses_dictionary_reset():
    # 96x96 random from a 200-color palette pushes the LZW dictionary to
    # the 4096-code cap — the encoder's clear-and-reset and the decoder's
    # 12-bit ceiling + post-clear rewidening all execute
    img = _palette_img(7, 96, 96, n_colors=200)
    enc = encode_gif(img)
    assert np.array_equal(decode_gif(enc), img)


def test_gif_tiny_and_grey_shapes():
    assert np.array_equal(
        decode_gif(encode_gif(np.full((1, 1, 3), 9, np.uint8))),
        np.full((1, 1, 3), 9, np.uint8),
    )
    grey = np.arange(15, dtype=np.uint8).reshape(5, 3)
    assert np.array_equal(
        decode_gif(encode_gif(grey)), np.stack([grey] * 3, axis=-1)
    )


def test_gif_rejects_oversized_palette_and_animation():
    h = w = 32  # 1024 pixels -> can exceed 256 unique colors
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    while len(np.unique(img.reshape(-1, 3), axis=0)) <= 256:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)
    # splice a second image descriptor on -> animated, must reject
    one = encode_gif(_palette_img(1, 4, 4))
    body_start = one.index(b"\x2c")
    frame = one[body_start:-1]  # image block without the trailer
    with pytest.raises(ValueError, match="animated|multi-frame"):
        decode_gif(one[:-1] + frame + b"\x3b")


def test_gif_skips_extension_blocks():
    one = encode_gif(_palette_img(2, 6, 5))
    # inject a Graphic Control Extension (89a) before the image block
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    i = one.index(b"\x2c")
    assert np.array_equal(
        decode_gif(one[:i] + gce + one[i:]), decode_gif(one)
    )


def test_gif_cross_validates_with_javax_imageio(spark):
    """Standard-compliance gate, the PNG/JPEG pattern: javax.imageio (an
    independent public implementation) must read THIS encoder's output
    pixel-exactly (GIF is lossless within a <=256-color palette), and
    this decoder must read ImageIO's writer output — including its own
    LZW dictionary-growth decisions on a 64x64 stream."""
    jvm = spark._jvm

    def javax_read(payload):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        assert bi is not None
        h, w = bi.getHeight(), bi.getWidth()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = bi.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
        return out

    img = _palette_img(11, 24, 31)
    for interlace in (False, True):
        assert np.array_equal(
            javax_read(encode_gif(img, interlace=interlace)), img
        ), f"javax misreads our stream (interlace={interlace})"

    img2 = _palette_img(13, 64, 64)
    h, w = img2.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img2[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    payload = bytes(baos.toByteArray())
    assert np.array_equal(decode_gif(payload), javax_read(payload))
    assert np.array_equal(decode_gif(payload), img2)


def test_decode_image_dispatches_gif():
    from py_gtfs_duckdb_spark.operators.multimodal import (
        _synth_gradient,
        decode_image,
        synth_gif,
    )

    assert np.array_equal(
        decode_image(synth_gif(5)), _synth_gradient(5, 16, 12)
    )


# ---------------------------------------------------------------------------
# BMP (RLE8)
# ---------------------------------------------------------------------------

from py_gtfs_duckdb_spark.operators.codecs import (  # noqa: E402
    decode_bmp,
    encode_bmp,
)


@pytest.mark.parametrize("compression", ["rle8", "rgb24"])
def test_bmp_roundtrip_lossless(compression):
    img = _palette_img(17, 24, 31)
    assert np.array_equal(decode_bmp(encode_bmp(img, compression)), img)


def test_bmp_rle8_runs_and_literals():
    # long runs, isolated literals, and the word-alignment padding path
    img = np.zeros((33, 70, 3), dtype=np.uint8)
    img[:, 10:50] = [200, 30, 40]
    img[5, ::2] = [1, 2, 3]
    enc = encode_bmp(img, "rle8")
    assert np.array_equal(decode_bmp(enc), img)
    # RLE8 compresses the runs well below the uncompressed raster
    assert len(enc) < len(encode_bmp(img, "rgb24"))


def test_bmp_top_down_and_delta_escape():
    # hand-build a top-down 8-bit BMP with a delta escape: 2 pixels of
    # color 1, delta-skip (3 right, 1 down), 1 pixel color 1, EOB —
    # skipped pixels stay palette index 0
    import struct as _s

    pal = bytearray()
    pal += bytes([10, 20, 30, 0])   # index 0 (BGRX)
    pal += bytes([40, 50, 60, 0])   # index 1
    pal += b"\x00" * 4 * 254
    rle = bytes([2, 1, 0, 2, 3, 1, 1, 1, 0, 1])
    bits_off = 14 + 40 + 1024
    info = _s.pack("<IiiHHIIiiII", 40, 6, -2, 1, 8, 1, len(rle), 0, 0, 256, 0)
    hdr = _s.pack("<2sIHHI", b"BM", bits_off + len(rle), 0, 0, bits_off)
    got = decode_bmp(hdr + info + bytes(pal) + rle)
    exp = np.zeros((2, 6, 3), dtype=np.uint8)
    exp[:, :] = [30, 20, 10]             # index 0 everywhere (RGB)
    exp[0, 0:2] = [60, 50, 40]           # the first run (top-down row 0)
    exp[1, 5] = [60, 50, 40]             # after delta (x=2+3, y=0+1)
    assert np.array_equal(got, exp)


def test_bmp_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX nope")
    img = _palette_img(1, 4, 4)
    enc = bytearray(encode_bmp(img, "rgb24"))
    enc[28] = 16  # bpp -> 16
    with pytest.raises(ValueError, match="bpp"):
        decode_bmp(bytes(enc))


def test_bmp_cross_validates_with_javax_imageio(spark):
    """Standard-compliance gate: javax.imageio must read BOTH our RLE8
    and rgb24 streams pixel-exactly, and this decoder must read
    ImageIO's own BMP writer output."""
    jvm = spark._jvm

    def javax_read(payload):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        assert bi is not None
        h, w = bi.getHeight(), bi.getWidth()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = bi.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
        return out

    img = _palette_img(19, 17, 23)
    for compression in ("rle8", "rgb24"):
        assert np.array_equal(javax_read(encode_bmp(img, compression)), img), (
            f"javax misreads our {compression}"
        )
    h, w = 19, 27
    img2 = _palette_img(23, h, w)
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img2[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "bmp", baos)
    assert np.array_equal(decode_bmp(bytes(baos.toByteArray())), img2)


def test_decode_image_dispatches_bmp():
    from py_gtfs_duckdb_spark.operators.multimodal import (
        _synth_gradient,
        decode_image,
        synth_bmp,
    )

    assert np.array_equal(
        decode_image(synth_bmp(5)), _synth_gradient(5, 16, 12)
    )
