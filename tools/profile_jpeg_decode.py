"""cProfile split of decode_jpeg on the bench codec fixture (guide §1:
measure before touching the entropy walk): where do the ~8 ms/image go —
bit reader, Huffman LUT walk, block bookkeeping, or IDCT?"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_gtfs_duckdb_spark.operators import codecs as C  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(7)
    # same class of fixture as bench._codec_throughput: random RGB content
    # (worst-case AC density) at quality 90
    imgs = [rng.integers(0, 256, size=(52, 52, 3), dtype=np.uint8) for _ in range(4)]
    payloads = [C.encode_jpeg(im, quality=90) for im in imgs]
    print(f"payload bytes: {[len(p) for p in payloads]}")

    # timed loop (what the bench measures)
    for p in payloads:
        C.decode_jpeg(p)  # warm caches
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 1.0:
        for p in payloads:
            C.decode_jpeg(p)
        reps += len(payloads)
    dt = time.perf_counter() - t0
    mb = sum(len(p) for p in payloads) / len(payloads) * reps / 1e6
    print(f"{reps} decodes in {dt:.3f}s -> {mb / dt:.2f} MB/s, {dt / reps * 1e3:.2f} ms/img")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(max(reps // 4, 1)):
        for p in payloads:
            C.decode_jpeg(p)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
