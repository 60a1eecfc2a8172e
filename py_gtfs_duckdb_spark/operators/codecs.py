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
    rast = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    if not rast[:, 0].any():
        # every scanline filter 0 (this encoder's output and the most
        # common shape in the wild): unfiltering is one slice — no
        # per-row Python loop
        img = np.ascontiguousarray(rast[:, 1:]).reshape(h, w, channels)
        return img[:, :, 0] if channels == 1 else img
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, public spec; JFIF color model). Pure
# numpy+stdlib: 2-D DCT as an 8x8 orthonormal matrix product, Annex-K
# quantization tables scaled by the IJG quality curve, canonical Huffman
# entropy coding. The DECODER is the engine contract (any baseline
# SOF0 stream: 1 or 3 components, sampling factors 1-2, restart
# intervals, tables read from the stream); the ENCODER exists to
# synthesize deterministic test payloads and emits the simplest valid
# form (4:4:4, fixed-length canonical Huffman tables declared in DHT —
# suboptimal compression, trivially correct). Progressive (SOF2),
# arithmetic coding, 12-bit precision and hierarchical modes reject
# loudly. Cross-validated against the JVM's javax.imageio in
# tests/test_codecs.py (both directions), so self-consistent-but-
# non-standard bugs (e.g. a mirrored zigzag in both paths) cannot hide.
# ---------------------------------------------------------------------------

_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _zigzag_order():
    """The standard zigzag permutation, generated (not transcribed):
    anti-diagonals of the 8x8 grid, alternating direction."""
    order = []
    for d in range(15):
        cells = [(y, d - y) for y in range(max(0, d - 7), min(7, d) + 1)]
        if d % 2 == 0:
            cells.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(cells)
    return [y * 8 + x for y, x in order]


_ZIGZAG = _zigzag_order()
_UNZIGZAG = [0] * 64
for _i, _z in enumerate(_ZIGZAG):
    _UNZIGZAG[_z] = _i


def _dct_matrix():
    import numpy as np

    t = np.zeros((8, 8))
    for u in range(8):
        c = (0.5 / (2**0.5)) if u == 0 else 0.5
        for x in range(8):
            t[u, x] = c * float(
                np.cos((2 * x + 1) * u * np.pi / 16.0)
            )
    return t


def _quality_tables(quality: int):
    import numpy as np

    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        q = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out  # flat, natural (row-major) order


def _canonical_codes(bits: list[int], values: list[int]):
    """(length, code) per symbol from a DHT-style BITS/HUFFVAL pair —
    the canonical assignment of T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# Encoder tables: fixed-length canonical Huffman (all DC codes 4 bits for
# the 12 categories; all AC codes 9 bits for the 162 run/size symbols —
# 162 > 256/2 would make 8 bits leave no slack before the forbidden
# all-ones code, 9 bits leaves plenty). Valid prefix codes, declared in
# DHT, so ANY conformant decoder reads them.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 8 + [162] + [0] * 7
_ENC_AC_VALS = sorted(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        while self.nbits:  # pad the last byte with 1-bits (T.81 F.1.2.3)
            self.write(1, 1)


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(img, quality: int = 90, restart_interval: int = 0) -> bytes:
    """8-bit numpy array -> baseline JFIF bytes. (h, w) grey or
    (h, w, 3) RGB; 4:4:4 (no chroma subsampling), quality 1-100.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (resilience feature real encoders use; also exercises
    the decoder's restart path)."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
        planes = [y, cb, cr]
    elif nc == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")

    qluma, qchroma = _quality_tables(quality)
    qtabs = [qluma] + ([qchroma] if nc == 3 else [])
    tmat = _dct_matrix_cached()
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    bh, bwidth = -(-h // 8), -(-w // 8)
    mcu_count = 0
    for by in range(bh):
        for bx in range(bwidth):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                )
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, plane in enumerate(planes):
                block = np.full((8, 8), float(plane[-1, -1]))
                ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
                block[:ys, :xs] = plane[
                    by * 8 : by * 8 + ys, bx * 8 : bx * 8 + xs
                ]
                # edge replication beats zero-pad ringing
                if ys < 8:
                    block[ys:, :xs] = block[ys - 1, :xs]
                if xs < 8:
                    block[:, xs:] = block[:, xs - 1 : xs]
                coef = tmat @ (block - 128.0) @ tmat.T
                q = qtabs[min(ci, 1)].reshape(8, 8)
                quant = np.round(coef / q).astype(np.int64).reshape(-1)
                zz = [int(quant[_ZIGZAG[i]]) for i in range(64)]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                s = _category(diff)
                length, code = dc_codes[s]
                bw.write(code, length)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = max(
                    (i for i in range(1, 64) if zz[i]), default=0
                )
                for i in range(1, last_nz + 1):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run >= 16:
                        length, code = ac_codes[0xF0]
                        bw.write(code, length)
                        run -= 16
                    s = _category(zz[i])
                    length, code = ac_codes[(run << 4) | s]
                    bw.write(code, length)
                    v = zz[i]
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    length, code = ac_codes[0x00]  # EOB
                    bw.write(code, length)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs):
        zz_q = bytes(int(q[_ZIGZAG[i]]) for i in range(64))
        out += seg(0xDB, bytes([tid]) + zz_q)
    comps = b""
    for ci in range(len(planes)):
        comps += bytes([ci + 1, 0x11, min(ci, 1)])  # h=v=1, qtab id
    out += seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)]) + comps
    )
    for tclass_tid, bits, vals in (
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
        (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
    )[: 4 if len(planes) == 3 else 2]:
        out += seg(0xC4, bytes([tclass_tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    scomps = b""
    for ci in range(len(planes)):
        tid = min(ci, 1)
        scomps += bytes([ci + 1, (tid << 4) | tid])
    out += seg(0xDA, bytes([len(planes)]) + scomps + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_SCAN_CACHE: dict = {}


def _unzigzag_arr():
    """Cached int64 index array: coef[_ZIGZAG[i]] = zz[i] as one numpy
    scatter per block batch."""
    arr = _SCAN_CACHE.get("zz")
    if arr is None:
        import numpy as np

        arr = np.asarray(_ZIGZAG, dtype=np.int64)
        _SCAN_CACHE["zz"] = arr
    return arr


def _dct_matrix_cached():
    mat = _SCAN_CACHE.get("dct")
    if mat is None:
        mat = _dct_matrix()
        _SCAN_CACHE["dct"] = mat
    return mat


def _entropy_segments(data: bytes, start: int) -> list[bytes]:
    """Unstuffed entropy-coded segments of one scan: 0xFF00 stuffing
    removed, split at RSTn markers, terminated by the first real marker
    (EOI / next header). Pre-scanning once replaces per-byte stuffing
    checks in the bit reader's hot path."""
    segs: list[bytes] = []
    cur = bytearray()
    pos, n = start, len(data)
    while pos < n:
        ff = data.find(0xFF, pos)
        if ff < 0:
            cur += data[pos:]
            pos = n
            break
        cur += data[pos:ff]  # bulk copy of the FF-free run
        pos = ff
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
            continue
        break  # real marker: end of scan
    segs.append(bytes(cur))
    return segs


_HUFF_LOOK = 10  # LUT-decoded prefix width; longer codes walk the map

# (bits, vals) -> (map, lut): the same four DHT tables arrive with every
# frame of a same-encoder corpus (and every MJPEG-AVI frame), so the LUT
# expansion is paid once per distinct table, not per image. Bounded.
_HUFF_TABLE_CACHE: dict = {}


def _huff_lut(table: dict[tuple[int, int], int]) -> list:
    """2^_HUFF_LOOK-entry (symbol, length) lookup keyed on the next
    _HUFF_LOOK bits — one peek per symbol for every code that fits
    (virtually all of them in baseline tables), None for longer codes."""
    lut: list = [None] * (1 << _HUFF_LOOK)
    for (ln, code), sym in table.items():
        if ln <= _HUFF_LOOK:
            base = code << (_HUFF_LOOK - ln)
            for i in range(1 << (_HUFF_LOOK - ln)):
                lut[base + i] = (sym, ln)
    return lut


def _rich_entry(sym: int, ln: int, is_dc: bool) -> tuple:
    """(size, run, ln, total_bits, half, mask) — everything the walk's
    per-symbol hot path derives from (symbol, code length), precomputed
    at DHT parse time (r14): DC symbols ARE the size; AC symbols pack
    run/size nibbles. half/mask drive the T.81 F.2.2.1 sign extension
    (value = v if v >= half else v - mask)."""
    size = sym if is_dc else sym & 0xF
    run = 0 if is_dc else sym >> 4
    return (
        size,
        run,
        ln,
        ln + size,
        1 << (size - 1) if size else 0,
        (1 << size) - 1,
    )


def _huff_rich_lut(lut: list, is_dc: bool) -> list:
    """The prefix LUT with :func:`_rich_entry` values (None preserved for
    long codes)."""
    return [
        None if hit is None else _rich_entry(hit[0], hit[1], is_dc)
        for hit in lut
    ]


def _walk_long_code(tmap, w: int) -> tuple[int, int]:
    """(symbol, code length) for Huffman codes LONGER than _HUFF_LOOK
    bits — the rare cold path the prefix LUT cannot resolve; walks the
    (length, code)→symbol map top-down over the same 32-bit window."""
    for ln in range(_HUFF_LOOK + 1, 17):
        sym = tmap.get((ln, w >> (32 - ln)))
        if sym is not None:
            return sym, ln
    raise ValueError("invalid JPEG Huffman code")


# acc mask applied at refill time (nb < 32): keeps the Python-int bit
# accumulator bounded at < 2^64 across refills.
_REFILL_MASK = [(1 << i) - 1 for i in range(33)]


def decode_jpeg(payload: bytes):
    """Baseline JFIF/JPEG bytes -> uint8 numpy array ((h, w) for one
    component, (h, w, 3) RGB otherwise). Supports SOF0 with sampling
    factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT segments,
    restart intervals; rejects progressive/arithmetic/12-bit loudly.

    Entropy decode is structured for pure-Python throughput (r13, ~4-5x
    over the original bit-serial walk, bit-identical by construction and
    still cross-validated against javax.imageio): the scan is unstuffed
    ONCE into per-restart segments (_entropy_segments), each Huffman
    code + value field decodes from a single 32-bit peek through a
    2^10-entry prefix LUT cached per DHT table (_decode_sym_val), and
    dequant+IDCT runs as one broadcast matmul over all blocks of a
    component instead of per-block (8,8) chains."""
    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — consume the run so `marker` is the byte after the
        # LAST 0xFF (ADVICE r12: a padded stream misparsed the length).
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone length-less markers (T.81 B.1.1.3)
            # — legal between segments, nothing to parse.
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec_id = body[i]
                if prec_id >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported")
                qtabs[prec_id & 0xF] = [
                    body[i + 1 + _UNZIGZAG[k]] for k in range(64)
                ]
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                key = (tuple(bits), tuple(vals))
                cached = _HUFF_TABLE_CACHE.get(key)
                if cached is None:
                    codes = _canonical_codes(bits, vals)
                    tmap = {
                        (ln, code): sym for sym, (ln, code) in codes.items()
                    }
                    lut = _huff_lut(tmap)
                    # rich LUTs for BOTH classes: the cache key is the
                    # raw (bits, vals) payload, which a stream may
                    # register under either table class
                    cached = (
                        tmap,
                        lut,
                        _huff_rich_lut(lut, True),
                        _huff_rich_lut(lut, False),
                    )
                    if len(_HUFF_TABLE_CACHE) < 4096:
                        _HUFF_TABLE_CACHE[key] = cached
                htabs[(tc_th >> 4, tc_th & 0xF)] = cached
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type 0xFF{marker:02X} "
                "(progressive/arithmetic/hierarchical — baseline only)"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            segs = _entropy_segments(payload, pos + 2 + length)
            return _decode_scan(
                frame, scan, qtabs, htabs, segs, restart_interval
            )
        pos += 2 + length
    raise ValueError("JPEG stream ended before SOS")


def _decode_scan(frame, scan, qtabs, htabs, segs, restart_interval):
    """Entropy walk + dequant/IDCT of one baseline scan.

    The walk is fully inlined (r14, guide §4.2): the r13 form spent ~95%
    of decode in per-symbol function calls (_SegReader.peek32/.consume +
    _decode_sym_val, ~8k symbols and ~24k calls per bench image, measured
    with cProfile in tools/profile_jpeg_decode.py). Here the bit cursor
    is three locals (acc/nb/pos, 32-bit refills via one unpack_from) and
    each Huffman symbol is one LUT index + a few int ops, bit-identical
    by construction: the window semantics (MSB-first, zero-padded past
    the segment end per T.81 F.2.2.5, over-consume saturates) reproduce
    _SegReader exactly — every window past the real data is all-zero in
    both forms. Nonzero coefficients accumulate as flat
    (block, zigzag-k, value) triples and land in the coefficient matrix
    as ONE numpy scatter per component instead of a [0]*64 list per
    block."""
    import struct

    import numpy as np

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("sampling factors beyond 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    tmat = _dct_matrix()
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    preds = [0] * len(comps)
    # per-component decode tables, hoisted from the per-MCU loop: Huffman
    # (map, lut) pairs, flattened, and the dezigzagged quant matrix
    ctabs = []
    for c in comps:
        tdc, tac = scan[c["id"]]
        dc_tab, ac_tab = htabs[(0, tdc)], htabs[(1, tac)]
        ctabs.append(
            (
                dc_tab[0],
                dc_tab[2],  # rich DC LUT
                ac_tab[0],
                ac_tab[3],  # rich AC LUT
                np.array(qtabs[c["tq"]], dtype=np.float64).reshape(8, 8),
            )
        )
    blk_pos = [[] for _ in comps]  # (y0, x0) per decoded block
    rows = [[] for _ in comps]  # flat block index per nonzero coefficient
    kidx = [[] for _ in comps]  # flat zigzag position per nonzero coefficient
    vals = [[] for _ in comps]  # flat coefficient value
    mcu_count = 0
    seg_idx = 0
    u32 = struct.Struct(">I").unpack_from
    _RM = _REFILL_MASK
    _LSH = 32 - _HUFF_LOOK
    seg = segs[0]
    buf = seg + b"\x00" * 8  # phantom zero bits past the end (T.81 F.2.2.5)
    nlim = len(seg) + 4  # u32 stays in-bounds through pos == nlim
    acc = 0  # bit accumulator: top `nb` bits are the unread stream
    nb = 0
    pos = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError(
                        "expected JPEG restart marker, got end of scan"
                    )
                seg = segs[seg_idx]
                buf = seg + b"\x00" * 8
                nlim = len(seg) + 4
                acc = 0
                nb = 0
                pos = 0
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dcmap, dclut, acmap, aclut, _q = ctabs[ci]
                bpos = blk_pos[ci]
                rws = rows[ci]
                kxs = kidx[ci]
                vls = vals[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bid = len(bpos)
                        bpos.append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
                        # --- DC: symbol IS the size (T.81 F.2.2.1) ---
                        if nb < 32:
                            acc = ((acc & _RM[nb]) << 32) | (
                                u32(buf, pos)[0] if pos <= nlim else 0
                            )
                            pos += 4
                            nb += 32
                        wnd = (acc >> (nb - 32)) & 0xFFFFFFFF
                        hit = dclut[wnd >> _LSH]
                        if hit is None:
                            hit = _rich_entry(
                                *_walk_long_code(dcmap, wnd), True
                            )
                        size, _run, ln, tot, half, mask = hit
                        if size:
                            v = (wnd >> (32 - tot)) & mask
                            nb -= tot
                            preds[ci] += v if v >= half else v - mask
                        else:
                            nb -= ln
                        rws.append(bid)
                        kxs.append(0)
                        vls.append(preds[ci])
                        # --- AC: run/size nibbles until EOB or k = 63 ---
                        k = 1
                        while k < 64:
                            if nb < 32:
                                acc = ((acc & _RM[nb]) << 32) | (
                                    u32(buf, pos)[0] if pos <= nlim else 0
                                )
                                pos += 4
                                nb += 32
                            wnd = (acc >> (nb - 32)) & 0xFFFFFFFF
                            hit = aclut[wnd >> _LSH]
                            if hit is None:
                                hit = _rich_entry(
                                    *_walk_long_code(acmap, wnd), False
                                )
                            size, run, ln, tot, half, mask = hit
                            if size:
                                v = (wnd >> (32 - tot)) & mask
                                nb -= tot
                                k += run
                                if k > 63:
                                    raise ValueError("JPEG AC index overflow")
                                rws.append(bid)
                                kxs.append(k)
                                vls.append(v if v >= half else v - mask)
                                k += 1
                            else:
                                nb -= ln
                                if run == 0:
                                    break
                                if run != 15:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16
            mcu_count += 1
    # dequant + IDCT for ALL blocks of a component in one broadcast
    # matmul — the per-block (8,8)@(8,8)@(8,8) chain was ~40% of decode
    # time in numpy call overhead alone
    unzig = _unzigzag_arr()
    for ci, c in enumerate(comps):
        if not blk_pos[ci]:
            continue
        q = ctabs[ci][4]
        coefs = np.zeros((len(blk_pos[ci]), 64))
        coefs[
            np.asarray(rows[ci], dtype=np.int64),
            unzig[np.asarray(kidx[ci], dtype=np.int64)],
        ] = np.asarray(vals[ci], dtype=np.float64)
        blocks = tmat.T @ (coefs.reshape(-1, 8, 8) * q) @ tmat + 128.0
        plane = planes[ci]
        for (y0, x0), block in zip(blk_pos[ci], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = block
    full = []
    for ci, c in enumerate(comps):
        p = np.repeat(
            np.repeat(planes[ci], vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T G.711, public spec): µ-law and A-law are
# the classic 8-bit-per-sample compressed WAV formats (format codes 7 and
# 6). Decode is a 256-entry table (the public-domain g711.c expansion
# formulas); the encoder quantizes to the nearest decodable level via the
# same table, so fixtures are valid without transcribing the segmented
# compression formula. Known anchors pin the tables in tests
# (µ-law 0xFF→0, 0x80→+32124 after complement; A-law 0x55→−8, max 32256)
# and javax.sound.sampled cross-validates full streams.
# ---------------------------------------------------------------------------


def ulaw_decode_table():
    """int16 linear value for each µ-law code 0..255 (g711.c
    ulaw2linear: complement, expand mantissa with the 0x84 bias,
    shift by segment)."""
    import numpy as np

    codes = np.arange(256, dtype=np.int64)
    u = (~codes) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where((u & 0x80) != 0, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_decode_table():
    """int16 linear value for each A-law code 0..255 (g711.c
    alaw2linear: XOR 0x55, segment 0/1 special cases, sign bit SET means
    positive)."""
    import numpy as np

    codes = np.arange(256, dtype=np.int64)
    a = codes ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, 0))
    big = ((codes ^ 0x55) & 0x0F) * 16 + 0x108
    t = np.where(seg >= 2, big << np.maximum(seg - 1, 0), t)
    return np.where((a & 0x80) != 0, t, -t).astype(np.int16)


def g711_encode(samples_i16, law: str = "ulaw"):
    """Nearest-level quantization onto the decode table — valid G.711
    codes without transcribing the segmented encoder."""
    import numpy as np

    table = ulaw_decode_table() if law == "ulaw" else alaw_decode_table()
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int64)
    s = np.asarray(samples_i16, dtype=np.int64)
    idx = np.searchsorted(levels, s)
    idx = np.clip(idx, 1, len(levels) - 1)
    left = levels[idx - 1]
    right = levels[idx]
    pick = np.where(np.abs(s - left) <= np.abs(s - right), idx - 1, idx)
    return order[pick].astype(np.uint8)


def parse_wav(payload: bytes):
    """RIFF/WAVE parser for the formats a training corpus actually
    carries: (sample_rate, n_channels, format_code, int16 samples).
    Format 1 = PCM16, 6 = A-law, 7 = µ-law (G.711 expanded to linear
    int16); anything else (ADPCM, float, extensible sub-formats beyond
    these) rejects loudly."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            code, n_ch, sr = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            fmt = (code, n_ch, sr, bits)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    code, n_ch, sr, bits = fmt
    if code == 1:
        if bits != 16:
            raise ValueError(f"only 16-bit PCM supported, got {bits}")
        samples = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2"
        ).astype(np.int16)
    elif code in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 must be 8-bit, got {bits}")
        table = alaw_decode_table() if code == 6 else ulaw_decode_table()
        samples = table[np.frombuffer(data, dtype=np.uint8)]
    else:
        raise ValueError(
            f"unsupported WAV format code {code} "
            "(supported: 1=PCM16, 6=A-law, 7=µ-law)"
        )
    return sr, n_ch, code, samples


def encode_wav_g711(samples_i16, sample_rate: int, law: str = "ulaw") -> bytes:
    """Mono int16 samples -> a G.711-compressed WAV (format 7 µ-law or
    6 A-law, 8 bits/sample — half the bytes of PCM16)."""
    codes = g711_encode(samples_i16, law)
    code = 7 if law == "ulaw" else 6
    n = len(codes)
    fmt = struct.pack("<HHIIHH", code, 1, sample_rate, sample_rate, 1, 8)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", n) + bytes(codes)
    if n & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", len(out)) + out


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video (Microsoft RIFF/AVI container, public format): each
# frame is an ordinary baseline JPEG in a '00dc' chunk, so the
# already-cross-validated decode_jpeg carries the whole video path — the
# compressed-video twin of the raw Y4M branch. The encoder writes the
# minimal standard layout (hdrl: avih + one 'vids'/'MJPG' stream; movi:
# one chunk per frame); the decoder walks RIFF LIST nesting linearly and
# tolerates index chunks and padding.
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(frames, fps: int = 25) -> bytes:
    """List of uint8 arrays ((h, w, 3) RGB or (h, w) grey) -> AVI bytes
    with one baseline-JPEG '00dc' chunk per frame."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    payloads = [encode_jpeg(f, quality=92) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes):
    """AVI bytes -> (width, height, [frames]) with each frame decoded by
    decode_jpeg. Only the first 'vids' stream's 'NNdc'/'NNdb' chunks are
    consumed — AVI stream numbers are the 0-based order of 'strh' headers
    in the file, so a multi-stream AVI (video + audio, or two video
    streams) no longer interleaves foreign chunks into the frame sequence
    (ADVICE r12). Non-MJPG video codecs reject loudly (they need external
    libraries)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    strhs: list[tuple[int, bytes, bytes]] = []  # (file_pos, fccType, handler)
    chunks: list[tuple[int, int, bytes]] = []  # (file_pos, stream_no, jpeg)
    stack = [(12, 8 + struct.unpack_from("<I", payload, 4)[0])]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                stack.append((body_start + 4, body_start + size))
            elif tag == b"avih":
                w, h = struct.unpack_from("<II", payload, body_start + 32)
            elif tag == b"strh":
                strhs.append(
                    (
                        pos,
                        payload[body_start : body_start + 4],
                        payload[body_start + 4 : body_start + 8],
                    )
                )
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                chunks.append(
                    (pos, int(tag[:2]), payload[body_start : body_start + size])
                )
            pos = body_start + size + (size & 1)
    if w is None:
        raise ValueError("AVI missing avih header")
    # Stream numbers = 0-based strh order IN THE FILE (the LIST walk above
    # is a stack, so sort by position before counting).
    strhs.sort()
    vids_no = handler = None
    for i, (_, fcc_type, hd) in enumerate(strhs):
        if fcc_type == b"vids":
            vids_no, handler = i, hd
            break
    if strhs and vids_no is None:
        raise ValueError("AVI has stream headers but no 'vids' stream")
    if handler is not None and handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
        raise ValueError(
            f"unsupported AVI video codec {handler!r} (MJPG only — other "
            "codecs need external libraries)"
        )
    # Frames in file order; headerless minimal writers (no strh at all)
    # keep the legacy accept-everything behavior.
    chunks.sort()
    frames = [
        body
        for _, stream_no, body in chunks
        if vids_no is None or stream_no == vids_no
    ]
    decoded = [decode_jpeg(f) for f in frames]
    return int(w), int(h), decoded


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, public spec): LZW dictionary coding — the third
# compression family in this module after DEFLATE (PNG) and Huffman+DCT
# (JPEG). Palette-indexed pixels, variable-width LSB-first LZW codes in
# 255-byte sub-blocks. Decode supports GIF87a and GIF89a, global and
# local color tables, Adam-style 4-pass interlacing, and skips 89a
# extension blocks; animated GIFs (a second image descriptor) reject
# loudly — a partial-patch frame silently decoded as the whole image
# would be wrong pixels. The encoder emits a real growing-dictionary
# LZW stream (clear-and-reset at the 4096-code cap) so decode exercises
# the same code paths javax.imageio's writer produces.
# ---------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# 4-pass interlace layout (GIF spec appendix E): (first row, row step)
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# Per-min_code_size cache of the deterministic code-width schedule for a
# fresh LZW table: the width of code i after a clear depends ONLY on how
# many entries the table holds before reading it (grows 1/code from the
# second code on, saturates at 4096), so the whole schedule is computable
# up front — the key fact that lets code extraction be one vectorized
# gather per segment instead of a per-symbol Python bit loop.
_GIF_WIDTH_SCHEDULES: dict[int, object] = {}


def _gif_width_schedule(min_code_size: int):
    import numpy as np

    sched = _GIF_WIDTH_SCHEDULES.get(min_code_size)
    if sched is None:
        clear = 1 << min_code_size
        T0 = clear + 2
        n = 4096 - T0 + 2  # widths stop changing once the table saturates
        i = np.arange(n, dtype=np.int64)
        tbl_before = T0 + np.minimum(np.maximum(i - 1, 0), 4096 - T0)
        # code_size widens when the table fills the current width, so the
        # width while reading code i is the bit-length of (table size + 1
        # candidates), floored at min+1 and capped at 12
        w = np.maximum(
            min_code_size + 1,
            np.ceil(np.log2(tbl_before + 1)).astype(np.int64),
        )
        sched = _GIF_WIDTH_SCHEDULES[min_code_size] = np.minimum(w, 12)
    return sched


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """Variable-width LSB-first GIF LZW -> index bytes. Stops after
    ``n_pixels`` indices (some writers omit the explicit end code).

    r14 rework (guide §4.2 — vectorize the per-element work): the
    per-symbol Python loop (bit-accumulator + bytes-concat dictionary)
    became three vectorized phases per clear-to-clear segment:

    1. EXTRACTION — code widths after a clear are deterministic (the
       table grows one entry per code), so the bit offsets of every code
       in the segment are known up front (:func:`_gif_width_schedule`)
       and one 3-byte gather + shift decodes them all; the first
       clear/end code found truncates the segment.
    2. TABLE — entry i's parent is the code emitted just before it and
       its appended byte is the first byte (chain root) of the code
       emitted with it, so entry lengths (= chain depth) and roots come
       from O(log n) pointer-doubling passes over two int arrays; no
       byte materialization of the dictionary at all.
    3. EMISSION — every dictionary entry is a CONTIGUOUS slice of the
       segment output (entry = previous emission + first byte of the
       next, and consecutive emissions are adjacent), so each output
       byte's source is an earlier output position: long entries
       (compressible data) resolve with per-emission slice copies
       (memcpy-bound); short entries (high-entropy data) resolve every
       byte to its literal source with O(log n) pointer-doubling
       gathers, with the KwKwK case falling out naturally (its one
       self-overlap byte points at the emission's own first byte).

    Values are bit-identical to the replaced loop (randomized
    differential + javax.imageio cross-validation in tests). Measured
    (single-threaded, bench fixtures / 96x96 random / flat): ~1.5x /
    ~2.6x / ~0.9x the old decoder — the flat-image case is already
    memcpy-bound either way."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    T0 = end + 1  # first dynamic entry index
    d = np.frombuffer(data, np.uint8)
    dp = np.empty(len(d) + 4, np.uint32)
    dp[: len(d)] = d
    dp[len(d):] = 0
    total_bits = len(d) * 8
    schedule = _gif_width_schedule(min_code_size)

    outs: list[np.ndarray] = []
    produced = 0
    bitpos = 0
    saw_end = False

    while produced < n_pixels and not saw_end:
        # ---- one-shot extraction of a clear-to-clear segment ----
        need = n_pixels - produced
        # every code emits >= 1 px (+2 for markers); no more codes can
        # fit in the remaining bits than at the narrowest width
        n_guess = max(
            1,
            min(need + 2, (total_bits - bitpos) // (min_code_size + 1) + 1),
        )
        if n_guess <= len(schedule):
            widths = schedule[:n_guess]
        else:  # width-12 plateau (deferred clear)
            widths = np.full(n_guess, 12, dtype=np.int64)
            widths[: len(schedule)] = schedule
        cumbits = np.concatenate(([0], np.cumsum(widths)))
        n_fit = int(np.searchsorted(cumbits, total_bits - bitpos, "right")) - 1
        if n_fit <= 0:
            raise ValueError("truncated GIF LZW stream")
        widths = widths[:n_fit]
        offs = bitpos + cumbits[:n_fit]
        byte = offs >> 3
        sh = offs & 7
        codes = (
            ((dp[byte] | (dp[byte + 1] << 8) | (dp[byte + 2] << 16)) >> sh)
            & ((np.int64(1) << widths) - 1)
        ).astype(np.int64)
        stop = np.nonzero((codes == clear) | (codes == end))[0]
        seg_end_bit = bitpos + int(cumbits[n_fit])
        if stop.size:
            k = int(stop[0])
            seg_end_bit = bitpos + int(cumbits[k + 1])
            if int(codes[k]) == end:
                saw_end = True
            codes = codes[:k]
        bitpos = seg_end_bit
        if codes.size == 0:
            if stop.size:
                continue  # clear (or end) with no payload codes
            raise ValueError("truncated GIF LZW stream")

        # ---- validate: a code must exist in the table when read (the
        # one-past-the-end code is the KwKwK case); junk bits past an
        # omitted end code are tolerated iff the pixels complete first ----
        n0 = codes.size
        i = np.arange(n0, dtype=np.int64)
        tl_before = T0 + np.minimum(np.maximum(i - 1, 0), 4096 - T0)
        valid = (codes < clear) | ((i >= 1) & (codes <= tl_before))
        bad = np.nonzero(~valid)[0]
        n_codes = n0
        first_bad = -1
        if bad.size:
            first_bad = int(bad[0])
            n_codes = first_bad
            codes = codes[:n_codes]
        if n_codes == 0:
            raise ValueError("GIF LZW: first code not in table")

        # ---- table as parent links; depth/root by pointer doubling ----
        n_appends = min(n_codes - 1, 4096 - T0)
        T = T0 + n_appends
        parent = np.arange(T, dtype=np.int64)
        if n_appends > 0:
            parent[T0:] = codes[:n_appends]
        par = parent.copy()
        dist = (par != np.arange(T)).astype(np.int64)
        for _ in range(max(1, int(np.ceil(np.log2(max(n_appends + 1, 2)))) + 1)):
            dist = dist + dist[par]
            par = par[par]
        root = par
        depth = dist + 1
        ab = np.empty(T, dtype=np.int64)  # per-entry appended byte
        ab[:clear] = np.arange(clear)
        ab[clear:T0] = 0
        if n_appends > 0:
            ab[T0:] = root[codes[1 : n_appends + 1]]

        # ---- pixel cutoff ----
        L = depth[codes]
        cum = np.cumsum(L)
        t_end = int(np.searchsorted(cum, need))
        if t_end < n_codes:
            n_codes = t_end + 1
            codes = codes[:n_codes]
            L = L[:n_codes]
            cum = cum[:n_codes]
        elif first_bad >= 0 and int(cum[-1]) < need:
            raise ValueError(
                f"GIF LZW: code beyond table at position {first_bad}"
            )

        # ---- emission ----
        total = int(cum[-1])
        P = np.concatenate(([0], cum[:-1]))  # emission start positions
        s_out = np.zeros(T, dtype=np.int64)  # entry -> slice start in out
        if n_appends > 0:
            nref = min(n_codes - 1, n_appends)
            s_out[T0 : T0 + nref] = P[:nref]
        s_codes = np.where(codes < clear, P, s_out[codes])
        bm = codes < clear
        if total >= 4 * n_codes:
            # long entries: per-emission slice copies are memcpy-bound
            seg_out = np.empty(total, dtype=np.uint8)
            seg_out[P[bm]] = codes[bm]
            for p0, l0, s0 in zip(P.tolist(), L.tolist(), s_codes.tolist()):
                if s0 == p0:
                    continue  # literal, already placed
                if s0 + l0 <= p0:
                    seg_out[p0 : p0 + l0] = seg_out[s0 : s0 + l0]
                else:  # KwKwK: one byte of self-overlap
                    seg_out[p0 : p0 + l0 - 1] = seg_out[s0 : s0 + l0 - 1]
                    seg_out[p0 + l0 - 1] = seg_out[s0]
        else:
            # short entries: resolve each byte to its literal source
            base = np.repeat(s_codes, L)
            within = np.arange(total, dtype=np.int64) - np.repeat(P, L)
            srcp = base + within
            val = np.zeros(total, dtype=np.uint8)
            val[P[bm]] = codes[bm]
            for _ in range(max(1, int(np.ceil(np.log2(max(n_codes, 2)))) + 1)):
                srcp = srcp[srcp]
            seg_out = val[srcp]
        outs.append(seg_out[:need])
        produced += min(total, need)

    if produced < n_pixels:
        raise ValueError("truncated GIF LZW stream")
    out = np.concatenate(outs) if len(outs) > 1 else outs[0]
    return out[:n_pixels].tobytes()


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Index bytes -> GIF LZW with a real growing dictionary (reset at
    the 4096-code cap), LSB-first variable-width codes."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    if indices:
        run = bytes(indices[:1])
        for b in indices[1:]:
            cand = run + bytes([b])
            if cand in table:
                run = cand
                continue
            emit(table[run], code_size)
            if next_code < 4096:
                table[cand] = next_code
                # the DECODER widens when its table FILLS the current
                # width; mirror that exactly or the streams de-sync
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
                next_code += 1
            else:  # dictionary full: reset, like javax's writer
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
            run = bytes([b])
        emit(table[run], code_size)
    emit(end, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img, interlace: bool = False) -> bytes:
    """(h, w, 3) or (h, w) uint8 numpy array -> single-frame GIF89a.
    Palette = the image's unique colors (<= 256 required — GIF is
    palette-indexed; quantization is a lossy preprocessing choice this
    lossless fixture encoder refuses to make silently)."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} unique colors — GIF needs <= 256 (quantize first)"
        )
    # color-table size = 2^(n+1) >= palette size, minimum 2 entries
    n = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << n, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, n)  # spec: at least 2 even for tiny palettes

    if interlace:
        order = []
        for first, step in _GIF_INTERLACE_PASSES:
            order.extend(range(first, h, step))
        idx_rows = indices.reshape(h, w)[order, :]
    else:
        idx_rows = indices.reshape(h, w)
    lzw = _gif_lzw_encode(min_code_size, bytes(idx_rows.reshape(-1).astype(np.uint8)))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((n - 1) << 4) | (n - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Single-frame GIF bytes -> (h, w, 3) uint8 numpy array. Supports
    87a/89a, global/local color tables, interlacing; skips extension
    blocks; rejects animated GIFs (a second image descriptor) instead of
    returning a partial-patch first frame as if it were the image."""
    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    frame = None
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if frame is not None:
            raise ValueError(
                "animated/multi-frame GIF not supported (frame 2 found) — "
                "register a library decoder via media_registry for animations"
            )
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError(
                "GIF frame does not cover the logical screen — partial "
                "frames are an animation feature"
            )
        ct = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(size, 3)
            pos += size * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            data += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # block terminator
        idx = np.frombuffer(
            _gif_lzw_decode(min_code_size, bytes(data), w * h), np.uint8
        )
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF index beyond color table")
        rows = ct[idx].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: invert the 4-pass row order
            order = []
            for first, step in _GIF_INTERLACE_PASSES:
                order.extend(range(first, h, step))
            out = np.empty_like(rows)
            out[order, :, :] = rows
            rows = out
        frame = rows
    if frame is None:
        raise ValueError("GIF contains no image descriptor")
    return frame


# ---------------------------------------------------------------------------
# BMP (Windows bitmap, public spec): the fourth compression family here —
# RLE8 run-length coding over palette indices — plus uncompressed 24-bit
# BI_RGB. Decode handles BITMAPINFOHEADER (and larger V4/V5 headers whose
# first 40 bytes are layout-compatible), bottom-up and top-down rows,
# 8-bit palette (RLE8 + uncompressed) and 24-bit BGR. RLE8 delta escapes
# leave skipped pixels at palette index 0 (the spec's "undefined" pixels
# — a deterministic choice, documented rather than random memory).
# ---------------------------------------------------------------------------


def encode_bmp(img, compression: str = "rle8") -> bytes:
    """(h, w, 3) or (h, w) uint8 array -> BMP bytes. ``compression``:
    ``"rle8"`` (8-bit palette run-length; <= 256 unique colors required,
    the GIF encoder's lossless-fixture contract) or ``"rgb24"``
    (uncompressed BI_RGB)."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    if compression == "rgb24":
        stride = (w * 3 + 3) & ~3
        raster = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = arr[y, :, ::-1].tobytes()  # BGR
            raster += row + b"\x00" * (stride - len(row))
        bits_off = 14 + 40
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
        )
        hdr = struct.pack("<2sIHHI", b"BM", bits_off + len(raster), 0, 0, bits_off)
        return hdr + info + bytes(raster)
    if compression != "rle8":
        raise ValueError(f"unsupported compression {compression!r}")
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} unique colors — RLE8 needs <= 256 (quantize first)"
        )
    idx = indices.reshape(h, w).astype(np.uint8)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([int(b), int(g), int(r), 0])  # BGRX entries
    pal += b"\x00" * (4 * (256 - len(palette)))
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 2:
                data += bytes([run, int(row[x])])
                x += run
            else:
                # absolute (literal) mode needs >= 3 pixels; below that,
                # emit length-1 encoded runs
                start = x
                while (
                    x < w
                    and (x + 1 >= w or row[x + 1] != row[x])
                    and x - start < 254
                ):
                    x += 1
                n = x - start
                if n >= 3:
                    data += bytes([0, n]) + row[start:x].tobytes()
                    if n % 2:
                        data += b"\x00"  # absolute runs are word-aligned
                else:
                    for i in range(start, x):
                        data += bytes([1, int(row[i])])
        data += b"\x00\x00"  # end of line
    data[-2:] = b"\x00\x01"  # final EOL becomes end-of-bitmap
    bits_off = 14 + 40 + 1024
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", bits_off + len(data), 0, 0, bits_off)
    return hdr + info + bytes(pal) + bytes(data)


def _bmp_rle8_decode(payload, bits_off, idx, w, h, top_down):
    """BI_RLE8 -> palette indices, written into ``idx`` ((h, w) uint8).

    r14 rework (guide §4.2): the escape stream is 2-byte (count, value)
    pairs except for three rare interrupters — delta (0,2,dx,dy),
    absolute runs (0,n,bytes,pad), end-of-bitmap (0,1) — so each SPAN
    between interrupters is parsed as one numpy (n, v) pair view:
    end-of-line escapes partition the span into rows (group = EOL count),
    per-run x offsets come from a group-rebased cumulative sum, and all
    encoded runs scatter in one ``np.repeat`` write. The per-escape
    Python loop this replaces paid ~1 µs per escape; typical RLE content
    (long runs, no literals) is now two numpy passes per image. Values
    and overflow errors are identical (run overflow checks are applied
    vectorized per span before any write)."""
    import numpy as np

    flat = idx.reshape(-1)
    pos = bits_off
    x = 0
    i = 0  # rows filled so far (bottom-up unless top_down)
    data = np.frombuffer(payload, np.uint8)
    while pos + 1 < len(payload):
        # ---- vectorized span of 2-byte escapes ----
        n_pairs = (len(payload) - pos) // 2
        pairs = data[pos : pos + 2 * n_pairs].reshape(-1, 2)
        nn = pairs[:, 0].astype(np.int64)
        vv = pairs[:, 1]
        interrupts = np.nonzero((nn == 0) & (vv != 0))[0]
        span = int(interrupts[0]) if interrupts.size else n_pairs
        if span > 0:
            ns = nn[:span]
            vs = vv[:span]
            eol = ns == 0
            # group = number of EOLs strictly before each escape
            n_eol = int(eol.sum())
            g = np.cumsum(eol) - eol
            cumn = np.cumsum(ns)
            excl = cumn - ns
            bases = np.empty(n_eol + 1, dtype=np.int64)
            bases[0] = -x  # group 0 continues at the current x offset
            if n_eol:
                bases[1:] = cumn[eol]
            x_before = excl - bases[g]
            rows = i + g
            runs = ns > 0
            if runs.any():
                r_rows = rows[runs]
                r_x = x_before[runs]
                r_n = ns[runs]
                if int((r_x + r_n).max()) > w or int(r_rows.max()) >= h:
                    raise ValueError("RLE8 run overflows image")
                y = r_rows if top_down else (h - 1 - r_rows)
                starts = y * w + r_x
                total = int(r_n.sum())
                tgt = np.repeat(starts, r_n) + (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(r_n) - r_n, r_n)
                )
                flat[tgt] = np.repeat(vs[runs], r_n)
            # advance the scalar cursor past the span (bases[0] = -x makes
            # the same rebase formula cover the no-EOL case)
            i += n_eol
            x = int(cumn[-1] - bases[n_eol])
            pos += 2 * span
        if not interrupts.size:
            continue  # ran out of pairs without an interrupter
        # ---- one interrupting escape, scalar ----
        v = int(vv[span])
        pos += 2
        if v == 1:  # end of bitmap
            return
        if v == 2:  # delta: skip right/up (undefined pixels stay 0)
            if pos + 1 >= len(payload):
                raise ValueError("truncated RLE8 delta")
            x += payload[pos]
            i += payload[pos + 1]
            pos += 2
        else:  # absolute run of v literal pixels, word-aligned
            if x + v > w or i >= h or pos + v > len(payload):
                raise ValueError("RLE8 absolute run overflows image")
            y = i if top_down else h - 1 - i
            idx[y, x : x + v] = np.frombuffer(payload, np.uint8, v, pos)
            pos += v + (v % 2)
            x += v
    raise ValueError("RLE8 stream missing end-of-bitmap")


def decode_bmp(payload: bytes):
    """BMP bytes -> (h, w, 3) uint8 array. Supports 24-bit BI_RGB and
    8-bit palette (BI_RGB + BI_RLE8), bottom-up and top-down; rejects
    other depths/compressions loudly."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (bits_off,) = struct.unpack_from("<I", payload, 10)
    (info_size,) = struct.unpack_from("<I", payload, 14)
    if info_size < 40:
        raise ValueError(f"unsupported BMP header size {info_size} (OS/2?)")
    w, h_raw, planes, bpp, comp, _sz = struct.unpack_from("<iiHHII", payload, 18)
    top_down = h_raw < 0
    h = abs(h_raw)
    if planes != 1:
        raise ValueError("BMP planes != 1")
    (n_colors,) = struct.unpack_from("<I", payload, 46)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    if bpp == 24 and comp == 0:
        stride = (w * 3 + 3) & ~3
        for i in range(h):
            y = i if top_down else h - 1 - i
            off = bits_off + i * stride
            if off + w * 3 > len(payload):
                raise ValueError("truncated BMP raster")
            row = np.frombuffer(payload, np.uint8, w * 3, off).reshape(w, 3)
            out[y] = row[:, ::-1]  # BGR -> RGB
        return out
    if bpp != 8:
        raise ValueError(f"unsupported BMP bpp {bpp} (8 or 24 only)")
    n_pal = n_colors or 256
    pal_off = 14 + info_size
    pal = np.frombuffer(payload, np.uint8, n_pal * 4, pal_off).reshape(n_pal, 4)
    rgb = pal[:, [2, 1, 0]]  # BGRX -> RGB
    idx = np.zeros((h, w), dtype=np.uint8)
    if comp == 0:
        stride = (w + 3) & ~3
        for i in range(h):
            y = i if top_down else h - 1 - i
            idx[y] = np.frombuffer(payload, np.uint8, w, bits_off + i * stride)
    elif comp == 1:  # BI_RLE8
        _bmp_rle8_decode(payload, bits_off, idx, w, h, top_down)
    else:
        raise ValueError(f"unsupported BMP compression {comp}")
    if idx.max(initial=0) >= len(rgb):
        raise ValueError("BMP index beyond palette")
    # rgb is uint8, so the fancy-index gather already yields a fresh
    # contiguous uint8 array — the astype(np.uint8) this replaces copied
    # the whole image a second time for nothing
    return rgb[idx]
