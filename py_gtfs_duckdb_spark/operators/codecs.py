"""Pure-stdlib+numpy image codecs for the multimodal decode path.

The container ships no image libraries, so compressed formats sat behind
the ``decode_media`` stub (operators/multimodal.py). PNG, however, needs
nothing beyond ``zlib`` (stdlib) and numpy: the format is DEFLATE over
per-scanline filtered bytes (PNG spec / RFC 2083 — public knowledge), so
this module implements a real encoder/decoder pair for 8-bit
greyscale / RGB / RGBA, non-interlaced — the overwhelmingly common shape
of training-corpus PNGs. Baseline JPEG (ITU T.81) lives here too, same
rationale: Huffman + DCT need only numpy.

Supported on decode: bit depth 8, color types 0 (grey), 2 (RGB),
6 (RGBA), all five scanline filters, multiple IDAT chunks. Rejected with
a clear error (never silently wrong): palette (3), grey+alpha (4),
bit depths != 8, Adam7 interlace. The encoder emits filter-0 scanlines
(simplicity over ratio; callers wanting compression ratio pipe through a
real optimizer offline — the engine's contract is decode).

Scale shape: decode is per-payload by necessity (opaque bytes); callers
wrap it in mapInPandas Arrow batches (operators/multimodal.py), so the
cost is one Python-loop per scanline for the sequential filters — bounded
by image height, vectorized across the row otherwise.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img) -> bytes:
    """8-bit numpy array -> PNG bytes. Accepts (h, w) grey, (h, w, 3) RGB,
    (h, w, 4) RGBA; filter 0 scanlines, one zlib IDAT."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raster = np.concatenate(
        [
            np.zeros((h, 1), dtype=np.uint8),  # filter byte 0 per scanline
            arr.reshape(h, w * channels),
        ],
        axis=1,
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raster.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes):
    """PNG bytes -> uint8 numpy array: (h, w) for greyscale, (h, w, 3) for
    RGB, (h, w, 4) for RGBA. Supports every scanline filter (0-4) and
    concatenated IDAT chunks; rejects palette / 16-bit / interlaced
    images with a clear error instead of wrong pixels."""
    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    color_type = bit_depth = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        elif tag == b"PLTE" or tag[0] & 0x20 == 0:
            # unknown CRITICAL chunk (bit 5 of first byte clear) or a
            # palette we don't consume — refusing beats wrong pixels
            if tag not in (b"PLTE",):
                raise ValueError(f"unsupported critical PNG chunk {tag!r}")
        pos += 12 + length  # length + tag + body + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"only bit depth 8 supported, got {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG color type {color_type} "
            "(palette/grey-alpha need a palette/LA consumer)"
        )
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNGs not supported")
    channels = _CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: got {len(raw)}, "
            f"want {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up — fully vectorized
            line = bytearray(
                (
                    (np.frombuffer(bytes(line), dtype=np.uint8) + prev)
                    & 0xFF
                ).astype(np.uint8).tobytes()
            )
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — left-sequential
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + ((a + int(prev[x])) >> 1)) & 0xFF
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
