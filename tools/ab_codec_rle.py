#!/usr/bin/env python3
"""Interleaved A/B for the r14 GIF-LZW and BMP-RLE8 decode reworks
(guide §4.2): the OLD per-symbol/per-escape loops are reproduced inline
here (byte-for-byte the r13 implementations) and alternated sample-by-
sample with the new vectorized decoders on the exact bench fixtures, so
the comparison is ambient-immune. Values are asserted identical on
every fixture before timing (the full randomized/javax parity lives in
tests/test_codecs.py and the r14 prototype soak).

Usage: python tools/ab_codec_rle.py [n_samples]   (default 7)
One JSON line to stdout; narrative to stderr. No Spark needed.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from py_gtfs_duckdb_spark.operators import codecs as C  # noqa: E402
from py_gtfs_duckdb_spark.operators import multimodal as M  # noqa: E402


def old_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """The r13 per-symbol loop, verbatim."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = bits = pos = 0
    while len(out) < n_pixels:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW: first code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels])


def old_rle8_decode(payload, bits_off, idx, w, h, top_down):
    """The r13 per-escape loop, verbatim."""
    pos = bits_off
    x = 0
    i = 0
    while pos + 1 < len(payload):
        n, v = payload[pos], payload[pos + 1]
        pos += 2
        y = i if top_down else h - 1 - i
        if n > 0:
            if x + n > w or i >= h:
                raise ValueError("RLE8 run overflows image")
            idx[y, x : x + n] = v
            x += n
        elif v == 0:
            x = 0
            i += 1
        elif v == 1:
            return
        elif v == 2:
            if pos + 1 >= len(payload):
                raise ValueError("truncated RLE8 delta")
            x += payload[pos]
            i += payload[pos + 1]
            pos += 2
        else:
            if x + v > w or i >= h or pos + v > len(payload):
                raise ValueError("RLE8 absolute run overflows image")
            idx[y, x : x + v] = np.frombuffer(payload, np.uint8, v, pos)
            pos += v + (v % 2)
            x += v
    raise ValueError("RLE8 stream missing end-of-bitmap")


def _extract_gif_lzw(payload):
    import struct

    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += (2 << (flags & 0x07)) * 3
    while payload[pos] == 0x21:
        pos += 2
        while payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
    assert payload[pos] == 0x2C
    w, h = struct.unpack_from("<HH", payload, pos + 5)
    pos += 10
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        nb = payload[pos]
        data += payload[pos + 1 : pos + 1 + nb]
        pos += 1 + nb
    return mcs, bytes(data), w * h


def _extract_rle8(payload):
    import struct

    (bits_off,) = struct.unpack_from("<I", payload, 10)
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    return bits_off, w, abs(h_raw), h_raw < 0


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    gifs = [
        _extract_gif_lzw(C.encode_gif(M._synth_gradient(s, 64, 48) // 32 * 32))
        for s in range(6)
    ]
    bmps = [
        (C.encode_bmp(M._synth_gradient(s, 64, 48) // 32 * 32, "rle8"))
        for s in range(6)
    ]
    bmp_parts = [_extract_rle8(p) for p in bmps]

    # value identity on the fixtures
    for mcs, data, npx in gifs:
        assert old_lzw_decode(mcs, data, npx) == C._gif_lzw_decode(
            mcs, data, npx
        )
    for p, (off, w, h, td) in zip(bmps, bmp_parts):
        a = np.zeros((h, w), dtype=np.uint8)
        b = np.zeros((h, w), dtype=np.uint8)
        old_rle8_decode(p, off, a, w, h, td)
        C._bmp_rle8_decode(p, off, b, w, h, td)
        assert np.array_equal(a, b)
    print("# fixture value identity ok", file=sys.stderr)

    def time_gif(fn) -> float:
        t0 = time.perf_counter()
        for _ in range(40):
            for mcs, data, npx in gifs:
                fn(mcs, data, npx)
        return time.perf_counter() - t0

    def time_bmp(fn) -> float:
        t0 = time.perf_counter()
        for _ in range(60):
            for p, (off, w, h, td) in zip(bmps, bmp_parts):
                fn(p, off, np.zeros((h, w), dtype=np.uint8), w, h, td)
        return time.perf_counter() - t0

    res = {}
    for name, old_fn, new_fn, timer in (
        ("gif_lzw", old_lzw_decode, C._gif_lzw_decode, time_gif),
        ("bmp_rle8", old_rle8_decode, C._bmp_rle8_decode, time_bmp),
    ):
        timer(old_fn), timer(new_fn)  # warmup
        old_t, new_t = [], []
        for i in range(n_samples):
            old_t.append(timer(old_fn))
            new_t.append(timer(new_fn))
            print(
                f"# {name} pass {i}: old {old_t[-1]:.3f}s new {new_t[-1]:.3f}s",
                file=sys.stderr,
            )
        res[name] = {
            "old_median": round(statistics.median(old_t), 4),
            "new_median": round(statistics.median(new_t), 4),
            "old_min": round(min(old_t), 4),
            "new_min": round(min(new_t), 4),
            "median_speedup_old_over_new": round(
                statistics.median(old_t) / statistics.median(new_t), 3
            ),
            "min_speedup_old_over_new": round(min(old_t) / min(new_t), 3),
        }
    print(json.dumps({"metric": "ab_codec_rle", "n_samples": n_samples, **res}))


if __name__ == "__main__":
    main()
