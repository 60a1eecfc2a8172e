#!/usr/bin/env python3
"""Dump .explain("formatted") for the named battery queries into
plans/<round>/<query>_<tag>.txt — the judge-checkable evidence files.

Usage: python tools/dump_plans.py <round> <tag> <query> [query ...]
e.g.:  python tools/dump_plans.py r14 before q_dedup_containment
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from py_gtfs_duckdb_spark.plans import QUERIES
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("dump-plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        from py_gtfs_duckdb_spark.operators._scope import release_shared

        release_shared()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
