"""CLI smoke tests (reference __main__.py parity): load → show → remove →
export → sql → csvload → vacuum through the argparse entry point."""

from __future__ import annotations

import os

import pytest

from py_gtfs_duckdb_spark.__main__ import main
from tests.test_gtfs_etl import FEED


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    for name, content in FEED.items():
        (d / name).write_text(content)
    return str(d)


def test_cli_full_workflow(spark, tmp_path, feed_dir, capsys):
    lake_root = str(tmp_path / "clilake")

    assert main(["load", lake_root, "-i", feed_dir]) == 0
    assert "agency" in capsys.readouterr().out

    # weekday service s1 runs Wed 2025-06-04
    assert main(["show", lake_root, "-d", "20250604", "-n", "10"]) == 0
    out = capsys.readouterr().out
    assert "t1" in out and "results in" in out

    csv_out = str(tmp_path / "trips.csv")
    assert main(["show", lake_root, "-d", "20250604", "-o", csv_out]) == 0
    assert os.path.isfile(csv_out)

    sql_file = tmp_path / "q.sql"
    sql_file.write_text("SELECT COUNT(*) AS n FROM trips")
    assert main(["sql", lake_root, "-f", str(sql_file)]) == 0
    assert "3" in capsys.readouterr().out

    assert main(["remove", lake_root, "-a", "a1*"]) == 0
    assert main(["export", lake_root, "-o", str(tmp_path / "out.zip")]) == 0
    assert os.path.isfile(tmp_path / "out.zip")

    extra = tmp_path / "extra.csv"
    extra.write_text("stop_id,stop_name\nstX,Extra Stop\n")
    assert main(["csvload", lake_root, "-t", "stops", "-i", str(extra), "--append"]) == 0

    assert main(["vacuum", lake_root]) == 0


def test_cli_curate_end_to_end(spark, tmp_path):
    """The curate verb: planted duplicates / near-dups / junk / PII in,
    curated split-partitioned parquet + audit report out."""
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    base = (
        "the quick brown fox jumps over the lazy dog and runs to a river "
        "where it is happy to rest in the shade of an old tree for a while "
        "before it continues on its long journey home through the fields"
    )
    rows = [
        (1, base, "web"),
        (2, base, "web"),                     # exact duplicate of 1
        (3, base + " tail words appended here", "web"),   # near-dup of 1
        (4, "short junk", "web"),             # fails word-count rule
        (
            5,
            base.replace("fox", "wolf") + " contact me at jane@example.com "
            "or (555) 123-4567 for details about the next meeting agenda",
            "web",
        ),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    inp = str(tmp_path / "docs.parquet")
    docs.write.parquet(inp)
    out = str(tmp_path / "out")
    assert main(["curate", "--input", inp, "--output", out]) == 0

    report = json.load(open(f"{out}/report.json"))
    assert report["input_docs"] == 5
    assert report["after_exact_dedup"] == 4          # doc 2 collapsed
    assert report["after_near_dedup"] == 3           # doc 3 (or 1) collapsed
    assert report["after_quality_rules"] == 2        # doc 4 dropped
    assert report["pii_redactions"] == 2             # email + phone
    curated = spark.read.parquet(f"{out}/curated")
    got = {r["doc_id"]: r for r in curated.collect()}
    # the near-dup cluster {1, 3} keeps its HIGHEST-QUALITY member — doc 3
    # (longer text scores higher), not the smallest id
    assert set(got) == {3, 5}
    assert "<EMAIL>" in got[5]["text"] and "<PHONE>" in got[5]["text"]
    assert "jane@example.com" not in got[5]["text"]
    assert got[3]["pred_lang"] == "en"
    assert got[3]["split"] in ("train", "val", "test")
    assert got[3]["n_tokens"] > 30


def test_cli_search_and_despan(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [
            (1, "home nav bar \n spark engine tuning notes \n copyright foot"),
            (2, "home nav bar \n spark spark cluster sizing \n copyright foot"),
            (3, "home nav bar \n cooking rice perfectly \n copyright foot"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    assert main(["search", "-i", src, "-t", "spark", "-k", "2"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["rank"] for l in lines] == [1, 2]
    assert lines[0]["doc_id"] == 2, "doubled term wins"

    out = str(tmp_path / "clean")
    assert main(["despan", "-i", src, "-o", out, "--min-df", "3"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"docs": 3, "units": 9, "dropped_units": 6}
    back = {r["doc_id"]: r["clean_text"] for r in spark.read.parquet(out).collect()}
    assert back[3] == "cooking rice perfectly"


def test_cli_mix_end_to_end(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", "tok " * 10) for i in range(40)],
        "doc_id long, source string, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "mix")
    assert main([
        "mix", "-i", src, "-o", out,
        "-w", "a=0.75", "b=0.25", "-b", "80",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # budget shares: a=60, b=20 tokens; 10-token docs, crossing doc kept
    assert summary["sources"]["a"] == {"docs": 6, "tokens": 60}
    assert summary["sources"]["b"] == {"docs": 2, "tokens": 20}
    back = spark.read.parquet(out)
    assert back.count() == 8 and set(back.columns) == {"doc_id", "source", "n_tokens"}

    import pytest

    with pytest.raises(SystemExit, match="not source=fraction"):
        main(["mix", "-i", src, "-o", out, "-w", "a:0.5", "-b", "10"])


def test_cli_score_self_and_external_model(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "scored")
    assert main(["score", "-i", src, "-o", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 2
    back = {r["doc_id"]: r["nll"] for r in spark.read.parquet(out).collect()}
    assert back == {1: 0.2877, 2: 1.3863}  # hand-computed (ln 4/3, ln 4)

    # external model: all-OOV doc scores ln(total)=ln(4)
    tgt = str(tmp_path / "tgt.parquet")
    spark.createDataFrame([(9, "zz zz")], "doc_id long, text string") \
        .write.parquet(tgt)
    out2 = str(tmp_path / "scored2")
    assert main(["score", "-i", tgt, "-o", out2, "-m", src]) == 0
    back2 = {r["doc_id"]: r["nll"] for r in spark.read.parquet(out2).collect()}
    assert back2 == {9: 1.3863}


def test_cli_audit_end_to_end(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    same = "the same boilerplate sentence repeated in every document body"
    docs = spark.createDataFrame(
        [(i, same) for i in range(200)]
        + [(1000 + i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(10)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "card")
    assert main(["audit", "-i", src, "-o", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 210
    # 200/210 docs are verbatim copies -> mean duplicated-gram fraction high
    assert summary["mean_shared_frac"] > 0.9
    assert all(0.0 <= j <= 1.0 for j in summary["split_leakage_jaccard"].values())
    assert summary["pad_waste_frac_by_cap"]

    back = spark.read.parquet(out)
    assert back.count() == 210
    assert set(back.columns) == {
        "doc_id", "n_tokens", "quality", "shared_frac", "n_bpe_tokens",
    }
    # the frozen-table BPE budget is a real token count: at least one
    # subword per word, at most one per character plus the EOW marker
    r = back.filter("doc_id = 0").first()
    assert 0 < r["n_bpe_tokens"] <= len(same.replace(" ", "")) + len(same.split())


def test_cli_sample_end_to_end(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main
    from py_gtfs_duckdb_spark.operators.pipeline import weighted_sample
    from py_gtfs_duckdb_spark.operators.text import token_count

    docs = spark.createDataFrame(
        [(f"d{i}", "web" if i % 2 else "wiki",
          "token " * (3 + i % 11)) for i in range(60)],
        "doc_id string, source string, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "sampled")
    assert main(["sample", "-i", src, "-o", out, "-k", "5",
                 "--per-source"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 10 and summary["per_source"] is True
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert back.groupBy("source").count().collect()[0]["count"] == 5
    # the CLI draw equals the operator draw — deterministic end to end
    want = {
        (r["source"], r["doc_id"])
        for r in weighted_sample(
            docs.withColumn("__w", token_count(docs.text).cast("double")),
            k=5, weight_col="__w", id_col="doc_id", by="source",
        ).collect()
    }
    got = {(r["source"], r["doc_id"]) for r in back.collect()}
    assert got == want
    # global draw: k rows total
    out2 = str(tmp_path / "sampled_g")
    assert main(["sample", "-i", src, "-o", out2, "-k", "7"]) == 0
    assert spark.read.parquet(out2).count() == 7


def test_cli_mix_alpha_temperature_weights(spark, tmp_path, capsys):
    """mix --alpha derives the weights from token shares (share^alpha):
    the low-resource source gets MORE than its natural share; passing
    both or neither of --weights/--alpha fails loudly."""
    import json

    import pytest

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [(i, "big" if i < 36 else "small", "tok " * 10) for i in range(40)],
        "doc_id long, source string, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "mix")
    assert main(["mix", "-i", src, "-o", out, "--alpha", "0.5",
                 "-b", "100"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    small = summary["sources"]["small"]["tokens"]
    # natural share would give small 10% = 10 tokens; sqrt-temperature
    # lifts it well above
    assert small >= 20, summary

    with pytest.raises(SystemExit, match="exactly one"):
        main(["mix", "-i", src, "-o", out, "-b", "10"])
    with pytest.raises(SystemExit, match="exactly one"):
        main(["mix", "-i", src, "-o", out, "-w", "big=1.0",
              "--alpha", "0.5", "-b", "10"])


def test_cli_profile_end_to_end(spark, tmp_path, capsys):
    """profile prints one JSON object keyed by column with the
    deterministic statistics; --columns restricts it."""
    import datetime as dt
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    df = spark.createDataFrame(
        [
            (1, "x", 1.5, dt.datetime(2024, 1, 1)),
            (2, None, 0.5, dt.datetime(2024, 2, 1)),
            (None, "y", None, None),
        ],
        "k bigint, s string, v double, ts timestamp_ntz",
    )
    src = str(tmp_path / "t.parquet")
    df.write.parquet(src)

    assert main(["profile", "-i", src]) == 0
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(prof) == {"k", "s", "v", "ts"}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_nulls"] == 1
    assert prof["k"]["min_int"] == 1 and prof["k"]["max_int"] == 2
    assert prof["s"]["min_str"] == "x" and prof["s"]["max_str"] == "y"
    assert prof["v"]["min_num"] == 0.5
    assert "min_num" not in prof["k"], "nulls dropped from the JSON"

    assert main(["profile", "-i", src, "-c", "k", "s"]) == 0
    prof2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(prof2) == {"k", "s"}


def test_cli_drift_end_to_end(spark, tmp_path, capsys):
    """drift prints per-group KS/PSI; a group concentrated far from the
    rest scores near the KS ceiling."""
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [(i, "low", "tok " * 5) for i in range(20)]
        + [(100 + i, "high", "tok " * 120) for i in range(20)]
        + [(200 + i, "low2", "tok " * 5) for i in range(20)],
        "doc_id long, source string, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    assert main(["drift", "-i", src, "--hi", "128"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"low", "high", "low2"}
    assert out["high"]["ks"] > 0.9, out
    assert out["high"]["n"] == 20
    assert out["low"]["ks"] < out["high"]["ks"]


def test_cli_version(capsys):
    """``version`` (reference __main__.py:24-26): prints the package
    version plus the Spark build, needs no lake and no session."""
    import pyspark

    from py_gtfs_duckdb_spark import __version__

    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert __version__ in out and pyspark.__version__ in out


def test_cli_dedup_verb(spark, tmp_path, capsys):
    """Single-tier dedup verb: minhash near-dups collapse (min id kept),
    containment drops the quoted subset, exact drops byte-copies; pair
    evidence lands when asked for."""
    import json

    base = " ".join(f"w{i}" for i in range(40))
    host = "pre0 pre1 pre2 " + base + " post0 post1 post2"
    rows = [
        (1, base),                 # near-dup group with 2 (min id kept)
        (2, base + " tail"),
        (3, "x " * 39 + "x"),      # byte-copy pair with 4
        (4, "x " * 39 + "x"),
        (5, "totally different words " * 10),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    out = str(tmp_path / "minhash_out")
    pairs_out = str(tmp_path / "pairs")
    assert main([
        "dedup", "-i", src, "-o", out, "-m", "minhash", "-t", "0.7",
        "--pairs-out", pairs_out,
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 1 in kept and 2 not in kept
    assert summary["docs_in"] == 5 and summary["docs_out"] == len(kept)
    assert spark.read.parquet(pairs_out).count() >= 1

    out2 = str(tmp_path / "exact_out")
    pairs_out2 = str(tmp_path / "exact_groups")
    assert main([
        "dedup", "-i", src, "-o", out2, "-m", "exact",
        "--pairs-out", pairs_out2,
    ]) == 0
    kept2 = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert 3 in kept2 and 4 not in kept2 and {1, 2, 5} <= kept2
    # exact-tier evidence: one group row per duplicated digest
    # (ADVICE r11: --pairs-out used to be silently ignored with -m exact)
    groups = spark.read.parquet(pairs_out2).collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [3, 4]

    src3 = str(tmp_path / "docs3.parquet")
    base2 = " ".join(f"z{i}" for i in range(40))
    spark.createDataFrame(
        [
            (10, base),                      # quoted inside 11
            (11, host),
            (12, "unrelated stuff " * 12),
            (13, base2 + " ya"),             # mutual-containment pair with
            (14, base2 + " yb"),             # 13 at t=0.9: min id survives
        ],
        "doc_id long, text string",
    ).write.parquet(src3)
    out3 = str(tmp_path / "cont_out")
    assert main([
        "dedup", "-i", src3, "-o", out3, "-m", "containment", "-t", "0.9",
    ]) == 0
    kept3 = {r["doc_id"] for r in spark.read.parquet(out3).collect()}
    assert kept3 == {11, 12, 13}, (
        "quoted subset dropped, container kept, mutual pair keeps min id"
    )

    # --policy-cap 0 forces the DISTRIBUTED keep-policy (SCC condensation,
    # no driver collect) through the same verb: identical survivors
    out4 = str(tmp_path / "cont_out_dist")
    assert main([
        "dedup", "-i", src3, "-o", out4, "-m", "containment", "-t", "0.9",
        "--policy-cap", "0",
    ]) == 0
    kept4 = {r["doc_id"] for r in spark.read.parquet(out4).collect()}
    assert kept4 == kept3


def test_cli_ingest_verb(spark, tmp_path, capsys):
    """Streaming gate verb, drain mode: first drain accepts the seed
    docs; after a near-dup and a fresh doc land in the spool, a second
    drain with the SAME checkpoint admits only the fresh one."""
    import json

    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"oth{i}" for i in range(40))
    fresh = " ".join(f"frs{i}" for i in range(40))
    lake_root = str(tmp_path / "ingestlake")
    src = tmp_path / "spool"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    with open(src / "b1.jsonl", "w") as fh:
        for i, text in [(1, base), (2, other)]:
            fh.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    args = ["ingest", lake_root, "--source", str(src), "--checkpoint", ckpt]
    assert main(args) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1 == {"accepted_docs": 2, "table": "corpus_docs"}

    with open(src / "b2.jsonl", "w") as fh:
        for i, text in [(10, base + " tail"), (11, fresh)]:
            fh.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    assert main(args) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["accepted_docs"] == 3, "near-dup rejected, fresh accepted"

    from py_gtfs_duckdb_spark.lake import GtfsLake

    lake = GtfsLake(spark, lake_root)
    assert {r["doc_id"] for r in lake.table("corpus_docs").collect()} == {
        1, 2, 11,
    }


def test_cli_tokenize_verb(spark, tmp_path, capsys):
    """tokenize: train-on-input writes tokenized docs + a model JSON; a
    second run LOADING that model reproduces the same tokenization."""
    import json

    rows = [
        (1, "low lower lowest " * 8),
        (2, "new newer newest " * 8),
        (3, "low new low new " * 8),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    out1 = str(tmp_path / "tok1")
    model_path = str(tmp_path / "model.json")
    assert main([
        "tokenize", "-i", src, "-o", out1,
        "--merges", "20", "--save-model", model_path,
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 3 and summary["bpe_tokens"] > 0
    assert summary["fertility"] > 0 and summary["n_merges"] > 0
    model = json.load(open(model_path))
    assert model["merges"] and all(len(m) == 2 for m in model["merges"])

    out2 = str(tmp_path / "tok2")
    assert main(["tokenize", "-i", src, "-o", out2, "-m", model_path]) == 0
    got1 = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_bpe_tokens"])
        for r in spark.read.parquet(out1).collect()
    )
    got2 = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_bpe_tokens"])
        for r in spark.read.parquet(out2).collect()
    )
    assert got1 == got2, "loaded model must reproduce the training run"


def test_cli_dedup_simhash_tier(spark, tmp_path, capsys):
    """-m simhash: Hamming-banded near-dup pairs drive the symmetric
    min-id-survives rule; --hamming widens/narrows the band."""
    import json

    base = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, base),
        # repeats an existing token: the DISTINCT token set is unchanged,
        # so the signature is identical (Hamming 0) — deterministic hit
        (2, base + " w0"),
        (3, "completely different content " * 10),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "sh_out")
    assert main([
        "dedup", "-i", src, "-o", out, "-m", "simhash", "--hamming", "3",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert summary["threshold"] is None and summary["hamming"] == 3
    assert 3 in kept and 1 in kept and 2 not in kept, kept


def test_cli_score_bigram_and_compression(spark, tmp_path, capsys):
    import json
    import math

    from py_gtfs_duckdb_spark.__main__ import main

    docs = spark.createDataFrame(
        [(1, "x a x a x a"), (2, "x b x c x d")], "doc_id long, text string"
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "scored_bg")
    assert main(
        ["score", "-i", src, "-o", out, "--order", "2", "--compression"]
    ) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["order"] == 2 and summary["docs"] == 2
    assert len(summary["bits_per_byte_quartiles"]) == 3
    back = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    # hand-computed bigram NLLs (see test_lexical_spans)
    assert back[1]["nll"] == round(3 * math.log(2) / 5, 4)
    assert back[2]["nll"] == round(3 * math.log(6) / 5, 4)
    assert back[1]["dl"] == 5  # dl2 renamed to the shared column name
    assert back[1]["bits_per_byte"] is not None

    # --model is rejected for the bigram order, loudly
    import pytest

    with pytest.raises(SystemExit):
        main(["score", "-i", src, "-o", out, "--order", "2", "-m", src])


def test_cli_events_end_to_end(spark, tmp_path, capsys):
    import datetime as dt
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    def ts(day, hour):
        return dt.datetime(2024, 1, day, hour)

    events = spark.createDataFrame(
        [
            # user 1 converts fully; user 2 stops at signup
            (1, 1, ts(1, 1), "signup", 2.0),
            (2, 1, ts(1, 2), "click", 3.0),
            (3, 1, ts(3, 1), "purchase", 5.0),
            (4, 2, ts(2, 1), "signup", 7.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    src = str(tmp_path / "events.parquet")
    events.write.parquet(src)
    out = str(tmp_path / "reports")
    assert main([
        "events", "-i", src, "-o", out,
        "--funnel", "signup", "click", "purchase",
        "--retention", "--gapfill",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["funnel"] == [
        {"step": 0, "event_type": "signup", "users": 2},
        {"step": 1, "event_type": "click", "users": 1},
        {"step": 2, "event_type": "purchase", "users": 1},
    ]
    # both users start in the same ISO week (Mon 2024-01-01)
    assert summary["retention"] == {"cells": 1, "cohorts": 1}
    # 2 users x 3 days (Jan 1..3); user 2 active only from Jan 2
    assert summary["gapfill"] == {"rows": 6, "leading_nulls": 1}
    filled = {
        (r["user_id"], str(r["day"])): r["value_ffill"]
        for r in spark.read.parquet(out + "/gapfill").collect()
    }
    assert filled[(1, "2024-01-02")] == 5.0  # 2+3 carried over the gap
    assert filled[(2, "2024-01-01")] is None


def test_cli_events_requires_a_report(tmp_path):
    import pytest as _pytest

    from py_gtfs_duckdb_spark.__main__ import main

    with _pytest.raises(SystemExit):
        main(["events", "-i", "x.parquet", "-o", str(tmp_path)])


def test_cli_events_transitions_and_within(spark, tmp_path, capsys):
    import datetime as dt
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    events = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1, 1), "signup", 1.0),
            (2, 1, dt.datetime(2024, 1, 1, 2), "click", 1.0),   # 1h later
            (3, 2, dt.datetime(2024, 1, 1, 1), "signup", 1.0),
            (4, 2, dt.datetime(2024, 1, 3, 1), "click", 1.0),   # 2 days later
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    src = str(tmp_path / "events.parquet")
    events.write.parquet(src)
    out = str(tmp_path / "reports")
    assert main([
        "events", "-i", src, "-o", out,
        "--funnel", "signup", "click", "--within", "86400",
        "--transitions",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # only user 1 converts inside the 1-day window
    assert summary["funnel"][1] == {
        "step": 1, "event_type": "click", "users": 1,
    }
    # transitions: signup->click for each user = 1 cell, total 2
    assert summary["transitions"] == {"cells": 1, "total": 2}


def test_cli_frequent_end_to_end(spark, tmp_path, capsys):
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    # 'a b' appears 8 times (4 per doc), everything else once or twice:
    # with m=4 the threshold is freq*4 > N
    docs = spark.createDataFrame(
        [(1, "a b a b a b a b x"), (2, "a b a b a b a b y z")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "freq")
    assert main([
        "frequent", "-i", src, "-o", out, "-n", "2", "-m", "4",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    back = {
        r["item"]: r["freq"] for r in spark.read.parquet(out).collect()
    }
    # bigram totals: doc1 has 8 bigrams, doc2 has 9 -> N=17; 'a b'
    # (freq 8) and 'b a' (freq 6) clear freq*4 > 17, nothing else does
    assert back == {"a b": 8, "b a": 6}
    assert summary["heavy_hitters"] == 2 and summary["occurrence_mass"] == 14


def test_cli_events_times(spark, tmp_path, capsys):
    import datetime as dt
    import json

    from py_gtfs_duckdb_spark.__main__ import main

    events = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1, 1), "signup", 1.0),
            (2, 1, dt.datetime(2024, 1, 1, 2), "click", 1.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    src = str(tmp_path / "events.parquet")
    events.write.parquet(src)
    out = str(tmp_path / "reports")
    assert main([
        "events", "-i", src, "-o", out, "--times", "signup", "click",
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["funnel_times"] == [
        {"step": 1, "event_type": "click", "users": 1, "median_gap_s": 3600.0}
    ]
