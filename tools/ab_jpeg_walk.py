#!/usr/bin/env python3
"""Interleaved same-process A/B of the r14 JPEG entropy-walk inlining
(guide §4.2): the r13 walk (bit-cursor object + per-symbol function
calls, snapshotted below verbatim) vs the shipped decode_jpeg. Decoded
arrays are asserted bit-identical on every payload before timing.

Usage: python tools/ab_jpeg_walk.py [seconds_per_arm] [n_rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_gtfs_duckdb_spark.operators import codecs as C  # noqa: E402
from py_gtfs_duckdb_spark.operators.codecs import (  # noqa: E402
    _HUFF_LOOK,
    _dct_matrix,
    _entropy_segments,
    _unzigzag_arr,
)

# --------------------------------------------------------------------------
# r13 entropy walk, snapshotted verbatim (commit d23a1c6 codecs.py) so the
# A/B runs both forms in one process.
# --------------------------------------------------------------------------


class _SegReader:
    __slots__ = ("seg", "pos", "acc", "nbits")

    def __init__(self, seg: bytes) -> None:
        self.seg = seg
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def peek32(self) -> int:
        nbits, pos, seg = self.nbits, self.pos, self.seg
        acc = self.acc
        n = len(seg)
        while nbits < 32 and pos < n:
            acc = (acc << 8) | seg[pos]
            pos += 1
            nbits += 8
        self.acc, self.nbits, self.pos = acc, nbits, pos
        if nbits >= 32:
            return (acc >> (nbits - 32)) & 0xFFFFFFFF
        return (acc << (32 - nbits)) & 0xFFFFFFFF

    def consume(self, k: int) -> None:
        if k > self.nbits:
            k = self.nbits
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1


def _decode_sym_val(r: _SegReader, table):
    w = r.peek32()
    hit = table[1][w >> (32 - _HUFF_LOOK)]
    if hit is not None:
        sym, ln = hit
    else:
        tmap = table[0]
        for ln in range(_HUFF_LOOK + 1, 17):
            sym = tmap.get((ln, w >> (32 - ln)))
            if sym is not None:
                break
        else:
            raise ValueError("invalid JPEG Huffman code")
    size = sym & 0xF
    if size == 0:
        r.consume(ln)
        return sym, 0
    v = (w >> (32 - ln - size)) & ((1 << size) - 1)
    r.consume(ln + size)
    return sym, v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_dc(r: _SegReader, table) -> int:
    w = r.peek32()
    hit = table[1][w >> (32 - _HUFF_LOOK)]
    if hit is not None:
        size, ln = hit
    else:
        tmap = table[0]
        for ln in range(_HUFF_LOOK + 1, 17):
            size = tmap.get((ln, w >> (32 - ln)))
            if size is not None:
                break
        else:
            raise ValueError("invalid JPEG Huffman code")
    if size == 0:
        r.consume(ln)
        return 0
    v = (w >> (32 - ln - size)) & ((1 << size) - 1)
    r.consume(ln + size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_scan_old(frame, scan, qtabs, htabs, segs, restart_interval):
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
    ctabs = []
    for c in comps:
        tdc, tac = scan[c["id"]]
        ctabs.append(
            (
                htabs[(0, tdc)],
                htabs[(1, tac)],
                np.array(qtabs[c["tq"]], dtype=np.float64).reshape(8, 8),
            )
        )
    blk_pos = [[] for _ in comps]
    blk_zz = [[] for _ in comps]
    mcu_count = 0
    seg_idx = 0
    r = _SegReader(segs[0])
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError(
                        "expected JPEG restart marker, got end of scan"
                    )
                r = _SegReader(segs[seg_idx])
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab, ac_tab, q = ctabs[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        preds[ci] += _decode_dc(r, dc_tab)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym, val = _decode_sym_val(r, ac_tab)
                            if sym == 0x00:
                                break
                            if sym & 0xF == 0:
                                if sym != 0xF0:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = val
                            k += 1
                        blk_pos[ci].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
                        blk_zz[ci].append(zz)
            mcu_count += 1
    for ci, c in enumerate(comps):
        if not blk_zz[ci]:
            continue
        q = ctabs[ci][2]
        coefs = np.zeros((len(blk_zz[ci]), 64))
        coefs[:, _unzigzag_arr()] = np.asarray(blk_zz[ci], dtype=np.float64)
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


def decode_jpeg_old(payload: bytes):
    """decode_jpeg with the r13 scan walk (header parse shared with the
    shipped decoder via monkey-substitution of _decode_scan)."""
    shipped = C._decode_scan
    C._decode_scan = _decode_scan_old
    try:
        return C.decode_jpeg(payload)
    finally:
        C._decode_scan = shipped


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    rng = np.random.default_rng(7)
    fixtures = []
    # the bench fixture class (random RGB, q90) + a smooth gradient + a
    # restart-interval stream + grayscale
    for shape in ((52, 52, 3), (96, 96, 3)):
        fixtures.append(C.encode_jpeg(rng.integers(0, 256, size=shape, dtype=np.uint8), quality=90))
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack([(yy * 2) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)
    fixtures.append(C.encode_jpeg(smooth, quality=90))
    fixtures.append(C.encode_jpeg(rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8), quality=90, restart_interval=2))
    fixtures.append(C.encode_jpeg(rng.integers(0, 256, size=(40, 40), dtype=np.uint8), quality=85))

    for p in fixtures:
        a = C.decode_jpeg(p)
        b = decode_jpeg_old(p)
        assert a.shape == b.shape and (a == b).all(), "walk rework changed pixels"
    print(f"# {len(fixtures)} fixtures bit-identical", file=sys.stderr)

    def throughput(fn) -> float:
        t0 = time.perf_counter()
        nbytes = 0
        while time.perf_counter() - t0 < seconds:
            for p in fixtures:
                fn(p)
                nbytes += len(p)
        return nbytes / (time.perf_counter() - t0) / 1e6

    throughput(C.decode_jpeg)  # warm
    throughput(decode_jpeg_old)
    new_s, old_s = [], []
    for i in range(n_rounds):
        new_s.append(throughput(C.decode_jpeg))
        old_s.append(throughput(decode_jpeg_old))
        print(f"# round {i}: new {new_s[-1]:.2f} MB/s  old {old_s[-1]:.2f} MB/s", file=sys.stderr)

    out = {
        "new_mb_s": {"median": round(statistics.median(new_s), 3), "max": round(max(new_s), 3)},
        "old_mb_s": {"median": round(statistics.median(old_s), 3), "max": round(max(old_s), 3)},
        "speedup_median": round(statistics.median(new_s) / statistics.median(old_s), 3),
        "speedup_max": round(max(new_s) / max(old_s), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
