#!/usr/bin/env python3
"""Stage decomposition for q_heavy_hitters (guide §1: find where the
time goes before changing anything). Times, with the noop sink and
interleaved samples:

  a) the JVM bigram explode alone (the stream both passes consume);
  b) pass 1 alone (explode -> mapInPandas local candidates);
  c) pass 2 alone given a precomputed candidate/total frame
     (explode -> broadcast semi-filter -> exact recount);
  d) the full operator end-to-end.

Usage: python tools/profile_heavy_hitters.py [n_samples]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators import pipeline as P
    from py_gtfs_duckdb_spark.operators._scope import release_shared
    from py_gtfs_duckdb_spark.plans._tables import t
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("profile-heavy-hitters")
    d = t(spark, sf_dir, "documents")
    d.count()

    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    staged = d.select(ws.alias("__ws")).filter(F.size("__ws") >= 2)

    def bigrams():
        return staged.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("__ws"), i),
                        F.element_at(F.col("__ws"), i + 1),
                    ),
                )
            ).alias("bigram")
        )

    m = 850

    def _local_candidates(batches):
        import pandas as pd

        counts: dict = {}
        n_p = 0
        for pdf in batches:
            vc = pdf["__item"].value_counts()
            n_p += int(vc.sum())
            for kk, v in vc.items():
                counts[kk] = counts.get(kk, 0) + int(v)
        cand = [kk for kk, v in counts.items() if v * m > n_p]
        yield pd.DataFrame(
            {
                "__item": pd.Series(cand + [None], dtype="object"),
                "__np": pd.Series([None] * len(cand) + [n_p], dtype="Int64"),
            }
        )

    def stage_a():
        bigrams().write.format("noop").mode("overwrite").save()

    def stage_b():
        (
            bigrams()
            .select(F.col("bigram").alias("__item"))
            .mapInPandas(_local_candidates, schema="__item string, __np long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    # precomputed candidates for the isolated pass-2 timing
    local = (
        bigrams()
        .select(F.col("bigram").alias("__item"))
        .mapInPandas(_local_candidates, schema="__item string, __np long")
        .localCheckpoint(eager=True)
    )
    cand = local.filter(F.col("__item").isNotNull()).select("__item").distinct()
    tot = local.agg(F.sum("__np").alias("__n"))
    print(f"# candidates: {cand.count()}", file=sys.stderr)

    def stage_c():
        (
            bigrams()
            .select(F.col("bigram").alias("__item"))
            .join(F.broadcast(cand), "__item")
            .groupBy("__item")
            .agg(F.count(F.lit(1)).alias("freq"))
            .crossJoin(F.broadcast(tot))
            .filter(F.col("freq") * m > F.col("__n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def stage_d():
        P.heavy_hitters(bigrams(), "bigram", m=m).write.format("noop").mode(
            "overwrite"
        ).save()
        release_shared()
        spark.catalog.clearCache()

    stages = {"a_explode": stage_a, "b_pass1": stage_b, "c_pass2": stage_c,
              "d_full": stage_d}
    for fn in stages.values():
        fn()  # warmup
    samples = {k: [] for k in stages}
    for i in range(n_samples):
        for k, fn in stages.items():
            start = time.perf_counter()
            fn()
            samples[k].append(time.perf_counter() - start)
    out = {
        k: {
            "median": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "samples": [round(x, 4) for x in v],
        }
        for k, v in samples.items()
    }
    print(json.dumps({"metric": "profile_heavy_hitters", **out}))


if __name__ == "__main__":
    main()
