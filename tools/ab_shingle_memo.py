#!/usr/bin/env python3
"""Interleaved same-process A/B of the shingle front-end memo (r14,
guide §1.2): times the shingle_sets mapInPandas stage under the noop
sink with the per-task shingle-string→hash memo ON vs OFF (the OFF arm
is the r13 form modulo the hexdigest→from_bytes parse, which favours the
OLD arm — conservative). Values are asserted identical via exceptAll
both ways once per run. Ambient drift hits both arms equally.

Usage: python tools/ab_shingle_memo.py [n_samples]   (default 8)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from py_gtfs_duckdb_spark.functions import fan_out
    from py_gtfs_duckdb_spark.operators.dedup import _shingle_doc
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("ab-shingle-memo")
    docs = t(spark, sf_dir, "documents")
    docs.count()  # warm input

    src = fan_out(docs).select(
        F.col("doc_id").alias("id"), F.col("text").alias("__text")
    )
    schema = T.StructType(
        [
            src.schema["id"],
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("sz", T.LongType()),
        ]
    )

    def make_run(memo: bool):
        def run(batches):
            import pandas as pd

            cache: dict | None = {} if memo else None
            for pdf in batches:
                hss, szs = [], []
                for text in pdf["__text"]:
                    hs = _shingle_doc(text, 3, cache)
                    hss.append(hs)
                    szs.append(len(hs))
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "hs": hss,
                        "sz": pd.Series(szs, dtype="int64"),
                    }
                )

        return run

    frames = {
        "memo": src.mapInPandas(make_run(True), schema=schema),
        "nomemo": src.mapInPandas(make_run(False), schema=schema),
    }

    mism = (
        frames["memo"].exceptAll(frames["nomemo"]).count()
        + frames["nomemo"].exceptAll(frames["memo"]).count()
    )
    print(f"# value mismatches: {mism}", file=sys.stderr)
    assert mism == 0, "memo changed shingle values"

    def run_once(label: str) -> float:
        spark.sparkContext.setJobDescription(f"ab-shingle {label}")
        start = time.perf_counter()
        frames[label].write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    for label in ("memo", "nomemo"):  # warm codegen + workers
        run_once(label)

    samples: dict[str, list[float]] = {"memo": [], "nomemo": []}
    for i in range(n_samples):
        for label in ("memo", "nomemo"):
            el = run_once(label)
            samples[label].append(el)
            print(f"# pass {i} {label}: {el:.3f}s", file=sys.stderr)

    out: dict = {"sf_dir": sf_dir, "n_samples": n_samples, "mismatches": mism}
    for label in ("memo", "nomemo"):
        vals = samples[label]
        out[label] = {
            "median": round(statistics.median(vals), 3),
            "min": round(min(vals), 3),
            "samples": [round(v, 4) for v in vals],
        }
    out["median_ratio_memo_over_nomemo"] = round(
        out["memo"]["median"] / out["nomemo"]["median"], 4
    )
    out["min_ratio_memo_over_nomemo"] = round(
        out["memo"]["min"] / out["nomemo"]["min"], 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
