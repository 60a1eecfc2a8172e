"""CLI — command-for-command parity with the reference's click CLI
(``src/gtfsduckdb/__main__.py:1-121``): version / load / remove / drop /
export / sql / show / realtime, plus ``csvload`` (the generic ``csvddb`` loader CLI,
csvddb.py:71-91) and ``vacuum``. The positional ``database`` argument is a
lake root directory instead of a ``.ddb`` file. Corpus verbs beyond the
reference (parquet-in/parquet-out, no lake argument): curate / search /
despan / dedup (single-tier: exact / minhash / ngram / containment / simhash) /
ingest (streaming near-dup gate over a JSONL spool) /
mix (explicit weights or ``--alpha`` temperature) / score / tokenize /
sample / audit / profile / drift / events / frequent — see MIGRATION.md's
CLI table.

Usage: ``python -m py_gtfs_duckdb_spark <command> <lake_root> [options]``
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys
import time


def _read_corpus(spark, path: str):
    """Corpus input dispatch for the parquet-in/parquet-out verbs: a
    ``.jsonl`` / ``.ndjson`` / ``.json`` path (optionally compressed —
    any codec suffix Spark's text reader handles: .gz/.zst/.bz2/...)
    parses through the explicit-schema JSONL source with malformed lines
    counted to stderr and quarantined out (sources/jsonl.py); anything
    else reads as parquet. Missing doc_ids get deterministic text-hash
    ids."""
    base = path.rstrip("/")
    for codec in (".gz", ".zst", ".bz2", ".lz4", ".snappy", ".deflate"):
        base = base.removesuffix(codec)
    if base.endswith((".jsonl", ".ndjson", ".json")):
        from py_gtfs_duckdb_spark.sources.jsonl import read_documents_jsonl

        clean, bad = read_documents_jsonl(spark, path, assign_ids=True)
        n_bad = bad.count()
        if n_bad:
            print(
                f"# quarantined {n_bad} malformed jsonl line(s)",
                file=sys.stderr,
            )
        return clean
    return spark.read.parquet(path)


def _lake(args):
    from py_gtfs_duckdb_spark.lake import GtfsLake
    from py_gtfs_duckdb_spark.session import get_spark

    return GtfsLake(get_spark("gtfs-cli"), args.database)


def cmd_version(args) -> None:
    """≙ ``version`` (reference __main__.py:24-26, printing
    gtfsduckdb.version.__version__); this engine also reports the Spark
    build it runs on. No lake argument and no session spin-up — version
    must answer instantly."""
    import pyspark

    from py_gtfs_duckdb_spark import __version__

    print(f"py_gtfs_duckdb_spark {__version__} (pyspark {pyspark.__version__})")


def cmd_load(args) -> None:
    from py_gtfs_duckdb_spark.sources import load_static_dir, load_static_zip
    import os

    lake = _lake(args)
    if os.path.isdir(args.input):
        loaded = load_static_dir(lake, args.input)
    else:
        loaded = load_static_zip(lake, args.input)
    print(f"loaded tables: {', '.join(loaded)}")


def cmd_remove(args) -> None:
    """≙ ``remove`` (__main__.py:35-53): pattern deletes then one cascade.
    CLI patterns use ``*`` wildcards mapped to SQL LIKE ``%``
    (docs/COMMANDS.md:30-32)."""
    from pyspark.sql import functions as F

    lake = _lake(args)

    def like(col, pattern):
        return F.col(col).like(pattern.replace("*", "%"))

    for pat in args.agencies or []:
        lake.delete_where("agency", like("agency_id", pat))
    for pat in args.routes or []:
        lake.delete_where("routes", like("route_id", pat))
    for pat in args.trips or []:
        lake.delete_where("trips", like("trip_id", pat))
    lake.cascade_clean()
    print("removed; cascade clean done")


def cmd_drop(args) -> None:
    """≙ ``drop`` (__main__.py:55-64): merge subset lakes into the main
    lake with the match_stop_id strategy (stops upsert by stop_id, other
    tables appended — strategy/match_stop_id.py)."""
    from py_gtfs_duckdb_spark.strategies import merge_subset

    lake = _lake(args)
    for subset_root in args.inputs:
        merge_subset(lake, subset_root, strategy=args.strategy)
    print(f"merged {len(args.inputs)} subset(s)")


def cmd_export(args) -> None:
    from py_gtfs_duckdb_spark.sources import export_static, export_static_zip

    lake = _lake(args)
    if args.output.endswith(".zip"):
        written = export_static_zip(lake, args.output)
    else:
        written = export_static(lake, args.output)
    print(f"exported tables: {', '.join(written)}")


def cmd_sql(args) -> None:
    from py_gtfs_duckdb_spark.queries import GtfsQueries

    q = GtfsQueries(_lake(args))
    for path in args.files:
        result = q.execute_sql_file(path)
        result.show(args.num_results, truncate=False)


def cmd_show(args) -> None:
    """≙ ``show`` (__main__.py:85-108) incl. its wall-clock timing."""
    from py_gtfs_duckdb_spark.queries import GtfsQueries

    opd = dt.datetime.strptime(args.date, "%Y%m%d").date()
    q = GtfsQueries(_lake(args))
    start = time.time()
    trips = q.fetch_nominal_operation_day_trips(opd, args.full_trips)
    if args.output:
        from py_gtfs_duckdb_spark.sources.gtfs import _write_single_csv

        _write_single_csv(trips, args.output)
        elapsed = time.time() - start
        print(f"written to {args.output} in {elapsed:.3f} seconds")
    else:
        rows = trips.limit(args.num_results).select(
            "route_id", "trip_id", "direction_id", "trip_headsign",
            "stop_id", "departure_time",
        )
        n = trips.count()
        elapsed = time.time() - start
        print(f"found {n} ({min(n, args.num_results)} shown) results in {elapsed} seconds")
        rows.show(args.num_results, truncate=False)


def cmd_csvload(args) -> None:
    """≙ the generic ``csvddb`` CLI (csvddb.py:71-91): any CSV into any
    declared table with header projection."""
    from py_gtfs_duckdb_spark.sources import load_csv_file

    lake = _lake(args)
    df = load_csv_file(lake.spark, args.table, args.input, sep=args.sep)
    if args.append:
        lake.append(args.table, df)
    else:
        lake.write(args.table, df)
    print(f"loaded {lake.table(args.table).count()} rows into {args.table}")


def cmd_vacuum(args) -> None:
    lake = _lake(args)
    lake.vacuum(keep=args.keep)
    print("vacuumed")


def cmd_realtime(args) -> None:
    """≙ ``realtime`` (__main__.py:110-119): start the spool-driven
    Structured Streaming merge, with the vendored MQTT subscriber feeding
    the spool when the config names a broker (mqtt.host +
    mqtt.subscriptions — realtime.py:149-199), and the stdlib HTTP edge
    (serving_http.py) when ``--http-port`` is given."""
    from py_gtfs_duckdb_spark.config import load_config
    from py_gtfs_duckdb_spark.streaming import (
        RealtimeMerger,
        reset_realtime,
        run_spool_stream,
    )
    from py_gtfs_duckdb_spark.streaming.matching import match_trip_updates

    lake = _lake(args)
    cfg = load_config(args.config)
    reset_realtime(lake)  # R6 startup reset
    mcfg = cfg["matching"]

    spooler = None
    mqtt_cfg = cfg["mqtt"]
    if cfg["app"]["mqtt_enabled"] and mqtt_cfg.get("host"):
        from py_gtfs_duckdb_spark.streaming.spool import MqttSpooler

        spooler = MqttSpooler(
            args.spool,
            mqtt_cfg["host"],
            mqtt_cfg.get("port", 1883),
            topics=list(mqtt_cfg.get("subscriptions") or ["#"]),
            client_id=mqtt_cfg.get("client"),
            keepalive=mqtt_cfg.get("keepalive", 60),
            username=mqtt_cfg.get("username"),
            password=mqtt_cfg.get("password"),
        )
        spooler.start()
        print(f"subscribed to mqtt://{mqtt_cfg['host']}:{mqtt_cfg.get('port', 1883)}")

    http_server = None
    if getattr(args, "http_port", None) is not None:
        from py_gtfs_duckdb_spark.serving_http import RealtimeHttpServer

        http_server = RealtimeHttpServer(
            lake, config=cfg, host="0.0.0.0", port=args.http_port
        )
        http_server.start()
        print(f"serving realtime endpoints on :{http_server.port}")

    def matcher(parents, stus):
        return match_trip_updates(
            parents, stus, lake.table("trips"), lake.table("stop_times"),
            match_against_first_stop_id=mcfg["match_against_first_stop_id"],
            match_against_stop_ids=mcfg["match_against_stop_ids"],
            remove_invalid_stop_ids=mcfg["remove_invalid_stop_ids"],
        )

    merger = RealtimeMerger(
        lake,
        ttl_seconds=cfg["app"]["data_review_seconds"],
        trip_matcher=matcher if lake.exists("trips") else None,
    )
    query = run_spool_stream(lake.spark, lake, args.spool, merger=merger)
    print(f"streaming from spool {args.spool}; Ctrl-C to stop")
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        query.stop()
    finally:
        if spooler is not None:
            spooler.stop()
        if http_server is not None:
            http_server.stop()


def cmd_curate(args) -> None:
    """Corpus curation end-to-end (extension surface, no reference
    analogue): documents parquet -> exact dedup -> near-dup
    canonicalization -> quality rules -> PII redaction -> lang/split
    annotation -> parquet partitioned by split + JSON report."""
    import json
    import os

    from py_gtfs_duckdb_spark.operators.pipeline import curate_corpus
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    curated, report = curate_corpus(
        docs,
        near_dup_threshold=args.near_dup_threshold,
        apply_quality_rules=not args.no_quality_rules,
        nll_band=tuple(args.nll_band) if args.nll_band else None,
    )
    out_data = os.path.join(args.output, "curated")
    curated.write.mode("overwrite").partitionBy("split").parquet(out_data)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


def cmd_dedup(args) -> None:
    """Standalone dedup verb over a documents parquet (extension surface):
    pick a tier (exact digest / MinHash-LSH / exact n-gram Jaccard /
    asymmetric containment / SimHash Hamming bands), write the SURVIVORS (min id per duplicate
    relation, containers win the containment tier) and optionally the
    pair evidence; prints a JSON summary. The curate verb composes the
    exact+minhash tiers into the full pipeline; this verb is the
    single-tier tool an auditor reaches for."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators import dedup as D
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    method, thr = args.method, args.threshold
    if method == "exact":
        # hash-groupBy keeper (min id per content digest): shuffles
        # 16-byte digests, never bodies (the q_dedup_exact shape)
        keep = (
            docs.select(F.md5("text").alias("__h"), "doc_id")
            .groupBy("__h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        survivors = docs.join(keep, "doc_id", "left_semi")
        if args.pairs_out:
            # evidence for the exact tier: one row per duplicated digest
            # (digest -> sorted member ids) — the analogue of the pair
            # list the fuzzy tiers write
            groups = (
                docs.select(F.md5("text").alias("digest"), "doc_id")
                .groupBy("digest")
                .agg(
                    F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
                    F.count(F.lit(1)).alias("n_docs"),
                )
                .filter(F.col("n_docs") >= 2)
            )
            groups.write.mode("overwrite").parquet(args.pairs_out)
    else:
        if method == "minhash":
            pairs = D.minhash_lsh_dedup(docs, "text", "doc_id", threshold=thr)
        elif method == "ngram":
            pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=thr)
        elif method == "containment":
            pairs = D.containment_pairs(docs, "text", "doc_id", threshold=thr)
        elif method == "simhash":
            sig = D.simhash_signatures(docs, "text", "doc_id")
            pairs = D.simhash_near_pairs(sig, max_hamming=args.hamming)
        else:
            raise SystemExit(f"unknown dedup method: {method}")
        if args.pairs_out:
            # the pair list feeds both the evidence write and the
            # survivor resolution — materialize once instead of
            # re-running the similarity join per consumer
            pairs = pairs.localCheckpoint()
        if method == "containment":
            # contained doc goes only when a CONTAINER SURVIVES; mutual/
            # cyclic containment keeps the min id — the ingest gate's
            # exact policy. Pair volume is contamination-rate x corpus,
            # so at corpus scale it can be billions of edges: the
            # dispatch resolves driver-side (Tarjan) only up to
            # --policy-cap pairs and falls back to the distributed SCC
            # condensation above it; rejects always apply as a
            # left_anti join, never an IN-list.
            from py_gtfs_duckdb_spark.streaming.ingest import (
                containment_policy_rejects_frame,
            )

            rejects = containment_policy_rejects_frame(
                pairs, max_driver_pairs=args.policy_cap
            ).withColumnRenamed("id", "doc_id")
            survivors = docs.join(rejects, "doc_id", "left_anti")
        else:
            # symmetric near-dup: min id per pair survives
            drop = pairs.select(
                F.greatest("id_a", "id_b").alias("doc_id")
            ).distinct()
            survivors = docs.join(drop, "doc_id", "left_anti")
        if args.pairs_out:
            pairs.write.mode("overwrite").parquet(args.pairs_out)
    survivors.write.mode("overwrite").parquet(args.output)
    # count the WRITTEN parquet: counting the survivors frame would
    # re-run the whole dedup lineage a second time
    n_in = docs.count()
    n_out = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "method": method,
                "threshold": (
                    None if method in ("exact", "simhash") else thr
                ),
                "hamming": args.hamming if method == "simhash" else None,
                "docs_in": n_in,
                "docs_out": n_out,
                "dropped": n_in - n_out,
            },
            sort_keys=True,
        )
    )


def cmd_ingest(args) -> None:
    """Streaming corpus ingest (extension surface): drive the near-dup
    ingest gate (streaming/ingest.py NearDupIngestGate) over a JSONL
    source directory — each arriving document is checked against the
    ACCEPTED corpus via the persisted MinHash artifacts (plus the
    optional asymmetric containment tier), survivors append as O(batch)
    segments. ``--drain`` (default) processes the files present and
    stops (availableNow) — the batch-replay mode; ``--follow`` keeps the
    stream running for a live spool. The checkpoint directory makes
    redelivery idempotent across restarts; reuse the SAME checkpoint for
    the same gate tables."""
    import json

    from py_gtfs_duckdb_spark.streaming.ingest import (
        NearDupIngestGate,
        run_ingest_stream,
    )

    lake = _lake(args)
    gate = NearDupIngestGate(
        lake,
        table=args.table,
        threshold=args.threshold,
        containment_threshold=args.containment,
        fold_every=args.fold_every,
    )
    q = run_ingest_stream(
        lake.spark,
        gate,
        args.source,
        "doc_id long, text string, lang string, source string, n_chars long",
        available_now=not args.follow,
        checkpoint_dir=args.checkpoint,
    )
    if args.follow:
        print(f"ingest stream running over {args.source}; ctrl-c to stop")
        q.awaitTermination()
        return
    # drain mode: availableNow guarantees the query terminates once the
    # files present at start are processed, so the default waits with NO
    # deadline — a timed wait that expires would print a partial
    # accepted_docs count as if the drain completed, and process exit
    # could kill an in-flight micro-batch (non-idempotent when
    # --checkpoint is unset). But a hung micro-batch (pathological
    # payload, executor stall) must not block silently forever (ADVICE
    # r12): heartbeat progress to stderr every 30 s, and an optional
    # --drain-timeout fails LOUDLY (exit 3, never a partial count).
    import sys
    import time as _time

    start = _time.monotonic()
    while not q.awaitTermination(30):
        waited = _time.monotonic() - start
        lp = q.lastProgress or {}
        print(
            f"# ingest drain in progress after {waited:.0f}s: "
            f"batch={lp.get('batchId')} "
            f"rows/s={lp.get('processedRowsPerSecond')}",
            file=sys.stderr,
        )
        if args.drain_timeout is not None and waited >= args.drain_timeout:
            q.stop()
            print(
                f"ingest drain did NOT finish within --drain-timeout="
                f"{args.drain_timeout}s; no partial count printed "
                "(table state is whatever completed micro-batches "
                "committed)",
                file=sys.stderr,
            )
            raise SystemExit(3)
    n = lake.table(args.table).count() if lake.exists(args.table) else 0
    print(json.dumps({"table": args.table, "accepted_docs": n}, sort_keys=True))


def cmd_search(args) -> None:
    """BM25 lexical top-k over a documents parquet (extension surface):
    prints one JSON line per hit, best first."""
    import json

    from py_gtfs_duckdb_spark.operators.lexical import bm25_topk
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    hits = bm25_topk(docs, args.terms, k=args.k)
    for r in sorted(hits.collect(), key=lambda r: r["rank"]):
        print(json.dumps(
            {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}
        ))


def cmd_despan(args) -> None:
    """Sub-document span dedup (CCNet-style boilerplate removal) over a
    documents parquet: writes cleaned docs, prints a JSON summary."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.text import dedup_spans
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    unit_words = args.unit_words if args.unit_words > 0 else None
    out = dedup_spans(docs, unit_words=unit_words, min_df=args.min_df)
    out.write.mode("overwrite").parquet(args.output)
    # summarize from the written parquet — aggregating the lazy frame
    # would re-run the span-dedup lineage for a second action
    out = spark.read.parquet(args.output)
    summary = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_units").alias("units"),
        F.sum("n_dropped").alias("dropped"),
    ).first()
    print(json.dumps(
        {"docs": summary["docs"], "units": int(summary["units"] or 0),
         "dropped_units": int(summary["dropped"] or 0)},
        sort_keys=True,
    ))


def cmd_score(args) -> None:
    """LM-NLL scoring over a documents parquet: writes (doc_id, dl, nll)
    — unigram by default, bigram with --order 2, plus an optional zlib
    compression column (--compression) — optionally scoring under a
    reference corpus's model (unigram only), and prints distribution
    quartiles as one JSON line."""
    import json

    from py_gtfs_duckdb_spark.operators.lexical import (
        bigram_nll,
        unigram_model,
        unigram_nll,
    )
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    if args.order == 2:
        if args.model:
            raise SystemExit(
                "--model is unigram-only (the bigram LM trains on the "
                "scored corpus itself)"
            )
        out = bigram_nll(docs).withColumnRenamed("dl2", "dl")
    else:
        model = None
        if args.model:
            model = unigram_model(spark.read.parquet(args.model))
        out = unigram_nll(docs, model=model)
    if args.compression:
        from py_gtfs_duckdb_spark.operators.text import compression_stats

        comp = compression_stats(docs).select("doc_id", "bits_per_byte")
        out = out.join(comp, "doc_id", "left")
    out.write.mode("overwrite").parquet(args.output)
    # read the quartiles back from the file just written — the scoring
    # plan runs exactly once whichever model path was taken (recomputing
    # from the lazy `out` would re-run the corpus explode+join for this
    # second action when a caller-supplied model skips the scoped persist)
    exprs = [
        "count(*) AS docs",
        "percentile(nll, array(0.25, 0.5, 0.75)) AS q",
    ]
    if args.compression:
        exprs.append(
            "percentile(bits_per_byte, array(0.25, 0.5, 0.75)) AS bq"
        )
    q = spark.read.parquet(args.output).selectExpr(*exprs).first()
    summary = {
        "docs": q["docs"],
        "order": args.order,
        "nll_quartiles": [round(x, 4) for x in q["q"]],
    }
    if args.compression:
        summary["bits_per_byte_quartiles"] = [round(x, 4) for x in q["bq"]]
    print(json.dumps(summary, sort_keys=True))


def cmd_events(args) -> None:
    """Event-sequence analytics over an events parquet
    (operators/analytics.py): any of --funnel STEP..., --retention,
    --gapfill. Each requested report writes a parquet subdir under
    --output; one JSON summary line prints at the end."""
    import json
    import os as _os

    from py_gtfs_duckdb_spark.operators import analytics as AN
    from py_gtfs_duckdb_spark.plans._tables import (
        ensure_battery_confs,
        normalize_event_ts,
    )
    from py_gtfs_duckdb_spark.session import get_spark

    if not (
        args.funnel or args.retention or args.gapfill or args.transitions
        or args.times
    ):
        raise SystemExit(
            "nothing to do: pass --funnel STEP [STEP ...], --times STEP..., "
            "--retention, --gapfill, and/or --transitions"
        )
    spark = get_spark("gtfs-cli")
    ensure_battery_confs(spark)
    events = normalize_event_ts(
        spark.read.parquet(args.input), args.ts_col
    )
    summary: dict = {}
    if args.funnel:
        out = AN.funnel(
            events, args.funnel, user_col=args.user_col, ts_col=args.ts_col,
            within_seconds=args.within,
        )
        path = _os.path.join(args.output, "funnel")
        out.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).orderBy("step").collect()
        summary["funnel"] = [
            {"step": r["step"], "event_type": r["event_type"], "users": r["users"]}
            for r in rows
        ]
    if args.retention:
        out = AN.cohort_retention(
            events, user_col=args.user_col, ts_col=args.ts_col
        )
        path = _os.path.join(args.output, "retention")
        out.write.mode("overwrite").parquet(path)
        agg = spark.read.parquet(path).selectExpr(
            "count(*) AS cells", "count(DISTINCT cohort_week) AS cohorts"
        ).first()
        summary["retention"] = {"cells": agg["cells"], "cohorts": agg["cohorts"]}
    if args.times:
        out = AN.funnel_times(
            events, args.times, user_col=args.user_col, ts_col=args.ts_col
        )
        path = _os.path.join(args.output, "funnel_times")
        out.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).orderBy("step").collect()
        summary["funnel_times"] = [
            {
                "step": r["step"],
                "event_type": r["event_type"],
                "users": r["users"],
                "median_gap_s": r["median_gap_s"],
            }
            for r in rows
        ]
    if args.transitions:
        out = AN.transition_matrix(
            events, user_col=args.user_col, ts_col=args.ts_col
        )
        path = _os.path.join(args.output, "transitions")
        out.write.mode("overwrite").parquet(path)
        agg = spark.read.parquet(path).selectExpr(
            "count(*) AS cells", "sum(transitions) AS total"
        ).first()
        summary["transitions"] = {"cells": agg["cells"], "total": agg["total"]}
    if args.gapfill:
        out = AN.resample_gapfill(
            events,
            user_col=args.user_col,
            ts_col=args.ts_col,
            value_col=args.value_col,
        )
        path = _os.path.join(args.output, "gapfill")
        out.write.mode("overwrite").parquet(path)
        agg = spark.read.parquet(path).selectExpr(
            "count(*) AS rows",
            "sum(CASE WHEN value_ffill IS NULL THEN 1 ELSE 0 END) AS leading_nulls",
        ).first()
        summary["gapfill"] = {
            "rows": agg["rows"], "leading_nulls": agg["leading_nulls"],
        }
    print(json.dumps(summary, sort_keys=True))


def cmd_frequent(args) -> None:
    """Exact frequent n-grams above a 1/m corpus share
    (operators/pipeline.py:heavy_hitters — two-pass candidates-then-
    recount, exact result): boilerplate-phrase mining over a documents
    parquet. Writes (item, freq) parquet, prints a JSON summary."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.pipeline import heavy_hitters
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    if args.ngram == 1:
        items = docs.select(F.explode(ws).alias("item"))
    else:
        n = args.ngram
        staged = docs.select(ws.alias("__ws")).filter(F.size("__ws") >= n)
        items = staged.select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__ws) - {n - 1}), "
                    f"i -> array_join(slice(__ws, i, {n}), ' '))"
                )
            ).alias("item")
        )
    out = heavy_hitters(items, "item", m=args.share_denominator)
    out.write.mode("overwrite").parquet(args.output)
    back = spark.read.parquet(args.output)
    agg = back.agg(
        F.count(F.lit(1)).alias("n"), F.sum("freq").alias("mass")
    ).first()
    print(
        json.dumps(
            {
                "ngram": args.ngram,
                "share_denominator": args.share_denominator,
                "heavy_hitters": agg["n"],
                "occurrence_mass": agg["mass"],
            },
            sort_keys=True,
        )
    )


def cmd_tokenize(args) -> None:
    """BPE tokenization over a documents parquet (extension surface):
    train a merge table distributedly on the input (batched 'fast'
    rounds — operators/bpe.py:bpe_train_distributed) or load one from a
    --model JSON, write (doc_id, tokens, n_bpe_tokens), optionally save
    the model, and print corpus fertility as one JSON line."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.bpe import (
        bpe_tokenize,
        bpe_train_distributed,
    )
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    if args.model:
        with open(args.model) as fh:
            model = {"merges": [tuple(m) for m in json.load(fh)["merges"]]}
    else:
        model = bpe_train_distributed(
            docs,
            n_merges=args.merges,
            batch_merges=args.batch_merges,
            strategy="fast" if args.batch_merges > 1 else "exact",
        )
    if args.save_model:
        with open(args.save_model, "w") as fh:
            json.dump({"merges": [list(m) for m in model["merges"]]}, fh)
    bpe_tokenize(docs, model).withColumnRenamed("id", "doc_id").write.mode(
        "overwrite"
    ).parquet(args.output)
    back = spark.read.parquet(args.output)
    stats = back.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).first()
    words = docs.select(
        F.sum(
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        ).alias("w")
    ).first()["w"]
    n_tok = int(stats["bpe_tokens"] or 0)
    print(json.dumps(
        {
            "docs": stats["docs"],
            "bpe_tokens": n_tok,
            "words": int(words or 0),
            "fertility": round(n_tok / max(int(words or 0), 1), 4),
            "n_merges": len(model["merges"]),
        },
        sort_keys=True,
    ))


def cmd_mix(args) -> None:
    """Token-budgeted domain mixing over a documents parquet: keep each
    source's hash-ordered prefix until its share of the budget is spent,
    write the mix, print per-source token accounting as one JSON line.
    Weights come from explicit --weights OR from temperature scaling
    (--alpha: weight ∝ token-share^alpha, the low-resource up-weighting
    recipe) — exactly one of the two."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.pipeline import (
        mix_sources,
        temperature_weights,
    )
    from py_gtfs_duckdb_spark.session import get_spark

    if bool(args.weights) == (args.alpha is not None):
        raise SystemExit("pass exactly one of --weights or --alpha")

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    if args.alpha is not None:
        weights = temperature_weights(docs, alpha=args.alpha)
    else:
        weights = {}
        for item in args.weights:
            source, _, w = item.partition("=")
            if not _ or not w:
                raise SystemExit(
                    f"--weights item {item!r} is not source=fraction"
                )
            weights[source] = float(w)
    out = mix_sources(docs, weights, args.token_budget)
    out.write.mode("overwrite").parquet(args.output)
    # account from the written parquet, not the lazy mix plan (the
    # prefix-sum mix would otherwise re-run for the summary action)
    out = spark.read.parquet(args.output)
    per = {
        r["source"]: {"docs": r["docs"], "tokens": int(r["tokens"])}
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens"))
        .collect()
    }
    print(json.dumps({"token_budget": args.token_budget, "sources": per},
                     sort_keys=True))


def cmd_sample(args) -> None:
    """Deterministic weighted sample of a documents parquet: k docs
    (per source with --per-source, else global) with inclusion
    probability proportional to token count — the reproducible
    pilot-corpus draw. Writes the sampled docs, prints a JSON summary."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.pipeline import weighted_sample
    from py_gtfs_duckdb_spark.operators.text import token_count
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    weighted = docs.withColumn(
        "__w", token_count(F.col("text")).cast("double")
    )
    picked = weighted_sample(
        weighted, k=args.k, weight_col="__w", id_col="doc_id",
        by="source" if args.per_source else None,
    )
    out = docs.join(picked.select("doc_id", "rank", "weight"), "doc_id")
    out.write.mode("overwrite").parquet(args.output)
    back = spark.read.parquet(args.output)
    summary = back.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("weight").cast("bigint").alias("tokens"),
    ).first()
    print(json.dumps(
        {"docs": summary["docs"], "sampled_tokens": int(summary["tokens"] or 0),
         "k": args.k, "per_source": bool(args.per_source)},
        sort_keys=True,
    ))


def cmd_audit(args) -> None:
    """Corpus audit over a documents parquet: per-document scorecard
    (tokens, quality, duplicated-n-gram fraction) written to parquet,
    plus split-leakage and padding-waste summaries as one JSON line."""
    import json

    from py_gtfs_duckdb_spark.operators.pipeline import (
        audit_scorecard,
        length_buckets,
        split_leakage,
    )
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    card = audit_scorecard(docs, ngram=args.ngram)
    card.write.mode("overwrite").parquet(args.output)
    # the scorecard summary reads the written parquet (winnow + shingle
    # lineage runs once); leakage/waste are separate small plans
    card = spark.read.parquet(args.output)
    leak = {
        f"{r['split_a']}|{r['split_b']}": r["jaccard"]
        for r in split_leakage(docs, n=args.ngram).collect()
    }
    waste = {
        int(r["cap"]): r["waste_frac"] for r in length_buckets(docs).collect()
    }
    stats = card.selectExpr(
        "count(*) AS docs",
        "floor(avg(shared_frac) * 10000 + 0.5) / 10000 AS mean_shared_frac",
    ).first()
    print(json.dumps(
        {
            "docs": stats["docs"],
            "mean_shared_frac": stats["mean_shared_frac"],
            "split_leakage_jaccard": leak,
            "pad_waste_frac_by_cap": waste,
        },
        sort_keys=True,
    ))


def cmd_profile(args) -> None:
    """Deterministic table profile of any parquet dataset: one JSON line
    with per-column counts, exact distincts, and type-appropriate
    min/max (the SUMMARIZE equivalent; operators/pipeline.py:
    profile_table). The profile is columns-sized — safe to print."""
    import json

    from py_gtfs_duckdb_spark.operators.pipeline import profile_table
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    df = _read_corpus(spark, args.input)
    cols = args.columns if args.columns else None
    out = {}
    for r in profile_table(df, cols=cols).collect():
        d = r.asDict()
        name = d.pop("col_name")
        out[name] = {k: v for k, v in d.items() if v is not None}
    print(json.dumps(out, sort_keys=True))


def cmd_drift(args) -> None:
    """Per-group distribution drift of a documents parquet: token-count
    KS + PSI per group vs the rest (operators/pipeline.py:
    histogram_drift), one JSON line keyed by group — the pre-mixing
    check ("did src7's length profile shift?")."""
    import json

    from pyspark.sql import functions as F

    from py_gtfs_duckdb_spark.operators.pipeline import histogram_drift
    from py_gtfs_duckdb_spark.operators.text import token_count
    from py_gtfs_duckdb_spark.session import get_spark

    spark = get_spark("gtfs-cli")
    docs = _read_corpus(spark, args.input)
    tk = docs.select(
        F.col(args.by),
        token_count(F.col("text")).alias("__v"),
    )
    out = {
        r[args.by]: {"n": r["n"], "ks": r["ks"], "psi": r["psi"]}
        for r in histogram_drift(
            tk, "__v", args.by,
            n_bins=args.bins, lo=0.0, hi=float(args.hi),
        ).collect()
    }
    print(json.dumps(out, sort_keys=True))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="py_gtfs_duckdb_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def cmd(name, fn, **kwargs):
        sp = sub.add_parser(name, **kwargs)
        sp.add_argument("database", help="lake root directory")
        sp.set_defaults(fn=fn)
        return sp

    sp = sub.add_parser(
        "version", help="print package and Spark versions"
    )
    sp.set_defaults(fn=cmd_version)

    sp = cmd("load", cmd_load, help="load a GTFS ZIP or directory")
    sp.add_argument("--input", "-i", required=True)

    sp = cmd("remove", cmd_remove, help="remove agencies/routes/trips by pattern")
    sp.add_argument("--agencies", "-a", action="append")
    sp.add_argument("--routes", "-r", action="append")
    sp.add_argument("--trips", "-t", action="append")

    sp = cmd("drop", cmd_drop, help="merge subset lakes into this lake")
    sp.add_argument("--inputs", "-i", action="append", required=True)
    sp.add_argument("--strategy", "-s", default="match_stop_id")

    sp = cmd("export", cmd_export, help="export GTFS to a directory or ZIP")
    sp.add_argument("--output", "-o", required=True)

    sp = cmd("sql", cmd_sql, help="run SQL files over the lake")
    sp.add_argument("--files", "-f", action="append", required=True)
    sp.add_argument("--num-results", "-n", type=int, default=200)

    sp = cmd("show", cmd_show, help="show nominal trips for an operation day")
    sp.add_argument("--date", "-d", required=True)
    sp.add_argument("--num-results", "-n", type=int, default=200)
    sp.add_argument("--full-trips", "-f", action="store_true")
    sp.add_argument("--output", "-o", default=None)

    sp = cmd("csvload", cmd_csvload, help="load a generic CSV into a table")
    sp.add_argument("--table", "-t", required=True)
    sp.add_argument("--input", "-i", required=True)
    sp.add_argument("--sep", default=",")
    sp.add_argument("--append", action="store_true")

    sp = cmd("vacuum", cmd_vacuum, help="drop superseded table versions")
    sp.add_argument("--keep", type=int, default=1)

    sp = cmd("realtime", cmd_realtime, help="run the realtime merge from a spool dir")
    sp.add_argument("--spool", required=True)
    sp.add_argument("--config", "-c", default=None)
    sp.add_argument(
        "--http-port",
        type=int,
        default=None,
        help="serve the pbf/json/rss/monitor endpoints on this port",
    )

    sp = sub.add_parser(
        "curate", help="run the corpus-curation pipeline over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True, help="output directory")
    sp.add_argument("--near-dup-threshold", type=float, default=0.7)
    sp.add_argument("--no-quality-rules", action="store_true")
    sp.add_argument(
        "--nll-band", type=float, nargs=2, metavar=("LO", "HI"),
        help="keep docs whose unigram-LM mean NLL lies in [LO, HI]",
    )
    sp.set_defaults(fn=cmd_curate)

    sp = sub.add_parser(
        "search", help="BM25 lexical top-k over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--terms", "-t", nargs="+", required=True)
    sp.add_argument("-k", type=int, default=10)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser(
        "despan", help="strip spans shared across many docs (boilerplate)"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument(
        "--unit-words", type=int, default=0,
        help="chunk width in words; 0 = split on newlines",
    )
    sp.add_argument("--min-df", type=int, default=3)
    sp.set_defaults(fn=cmd_despan)

    sp = cmd(
        "ingest", cmd_ingest,
        help="stream a JSONL source dir through the near-dup ingest gate",
    )
    sp.add_argument("--source", required=True, help="JSONL spool directory")
    sp.add_argument("--table", default="corpus_docs")
    sp.add_argument("--threshold", "-t", type=float, default=0.7)
    sp.add_argument(
        "--containment", type=float, default=None,
        help="also reject docs this contained in an accepted doc",
    )
    sp.add_argument("--fold-every", type=int, default=None)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument(
        "--follow", action="store_true",
        help="keep the stream running (default drains existing files and stops)",
    )
    sp.add_argument(
        "--drain-timeout", type=float, default=None,
        help="drain mode only: fail loudly (exit 3, no partial count) if "
        "the drain has not finished after this many seconds; default "
        "waits forever with a progress heartbeat",
    )

    sp = sub.add_parser(
        "dedup", help="single-tier dedup over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True, help="survivors parquet path")
    sp.add_argument(
        "--method", "-m", default="minhash",
        choices=["exact", "minhash", "ngram", "containment", "simhash"],
    )
    sp.add_argument("--threshold", "-t", type=float, default=0.7)
    sp.add_argument(
        "--hamming", type=int, default=3,
        help="max Hamming distance for -m simhash (default 3)",
    )
    sp.add_argument(
        "--pairs-out", default=None,
        help="also write the duplicate-pair evidence parquet",
    )
    sp.add_argument(
        "--policy-cap", type=int, default=2_000_000,
        help="containment keep-policy: max pair count resolved on the "
        "driver (exact Tarjan); above it the policy resolves "
        "distributedly via SCC condensation (0 = always distributed)",
    )
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser(
        "score", help="LM-NLL quality scoring over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument(
        "--model", "-m",
        help="reference documents parquet to train the LM on (default: "
        "input; unigram only)",
    )
    sp.add_argument(
        "--order", type=int, default=1, choices=[1, 2],
        help="LM order: 1 = unigram (default), 2 = bigram transitions",
    )
    sp.add_argument(
        "--compression", action="store_true",
        help="also emit the zlib bits-per-byte column and its quartiles",
    )
    sp.set_defaults(fn=cmd_score)

    sp = sub.add_parser(
        "frequent", help="exact frequent n-grams above a 1/m corpus share"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument("--ngram", "-n", type=int, default=2, choices=[1, 2, 3])
    sp.add_argument(
        "--share-denominator", "-m", type=int, default=850,
        help="report items with freq * m > total (share above 1/m)",
    )
    sp.set_defaults(fn=cmd_frequent)

    sp = sub.add_parser(
        "events", help="event-sequence analytics over an events parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="events parquet path")
    sp.add_argument("--output", "-o", required=True, help="report directory")
    sp.add_argument(
        "--funnel", nargs="+", metavar="STEP",
        help="ordered conversion funnel over these event types",
    )
    sp.add_argument(
        "--retention", action="store_true",
        help="weekly cohort retention matrix",
    )
    sp.add_argument(
        "--gapfill", action="store_true",
        help="forward-filled daily value resample per user",
    )
    sp.add_argument(
        "--transitions", action="store_true",
        help="first-order Markov transition matrix over event sequences",
    )
    sp.add_argument(
        "--times", nargs="+", metavar="STEP",
        help="median time-to-convert per stage over these event types",
    )
    sp.add_argument(
        "--within", type=int, default=None, metavar="SECONDS",
        help="funnel conversion window: each step within this many "
        "seconds of the previous step's reach",
    )
    sp.add_argument("--user-col", default="user_id")
    sp.add_argument("--ts-col", default="ts")
    sp.add_argument("--value-col", default="value")
    sp.set_defaults(fn=cmd_events)

    sp = sub.add_parser(
        "tokenize", help="BPE tokenization over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument(
        "--model", "-m", default=None,
        help="merge-table JSON to apply (default: train on the input)",
    )
    sp.add_argument(
        "--merges", type=int, default=200,
        help="merge budget when training (default 200)",
    )
    sp.add_argument(
        "--batch-merges", type=int, default=32,
        help="merges learned per scheduler round when training "
        "(>1 uses the batched 'fast' strategy; 1 = exact sequential)",
    )
    sp.add_argument(
        "--save-model", default=None,
        help="write the learned merge table as JSON",
    )
    sp.set_defaults(fn=cmd_tokenize)

    sp = sub.add_parser(
        "mix", help="token-budgeted domain mixing over a documents parquet"
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument(
        "--weights", "-w", nargs="+",
        metavar="SOURCE=FRACTION",
        help="per-source budget shares, e.g. web=0.6 wiki=0.4",
    )
    sp.add_argument(
        "--alpha", type=float,
        help="temperature-derive the weights instead: share^alpha "
        "(0=uniform, 1=natural; multilingual recipes use 0.3-0.7)",
    )
    sp.add_argument("--token-budget", "-b", type=int, required=True)
    sp.set_defaults(fn=cmd_mix)

    sp = sub.add_parser(
        "sample",
        help="deterministic weighted sample (by token count) of a documents parquet",
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument("-k", type=int, default=100, help="docs to keep (per group)")
    sp.add_argument(
        "--per-source", action="store_true",
        help="sample k per source instead of k global",
    )
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser(
        "drift",
        help="per-group token-length drift (KS + PSI) of a documents parquet",
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--by", default="source", help="grouping column")
    sp.add_argument("--bins", type=int, default=32)
    sp.add_argument("--hi", type=int, default=256,
                    help="histogram upper bound (token count)")
    sp.set_defaults(fn=cmd_drift)

    sp = sub.add_parser(
        "profile",
        help="deterministic per-column table profile of a parquet dataset",
    )
    sp.add_argument("--input", "-i", required=True, help="parquet path")
    sp.add_argument(
        "--columns", "-c", nargs="+", help="profile only these columns"
    )
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser(
        "audit",
        help="corpus audit: per-doc scorecard parquet + leakage/padding JSON",
    )
    sp.add_argument("--input", "-i", required=True, help="documents parquet path")
    sp.add_argument("--output", "-o", required=True, help="scorecard parquet path")
    sp.add_argument(
        "--ngram", "-n", type=int, default=3,
        help="n-gram size for novelty/leakage (default 3)",
    )
    sp.set_defaults(fn=cmd_audit)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
