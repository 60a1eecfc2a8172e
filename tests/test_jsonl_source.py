"""JSONL corpus source/sink: explicit-schema parse, malformed-line
quarantine (never silent drops), deterministic id assignment, round-trip,
and the CLI corpus-verb dispatch."""

from __future__ import annotations

import gzip
import json

from py_gtfs_duckdb_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "spark table scan", "lang": "en",
     "source": "web", "n_chars": 16},
    {"doc_id": 2, "text": "query window merge", "lang": "en",
     "source": "wiki", "n_chars": 18},
]


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_jsonl_parses_quarantines_and_round_trips(spark, tmp_path):
    lines = [json.dumps(GOOD[0]), "{ this is not json", json.dumps(GOOD[1]),
             json.dumps({"doc_id": 9, "lang": "en"})]  # no text: quarantined
    src = _write_lines(tmp_path / "docs.jsonl", lines)
    clean, bad = read_documents_jsonl(spark, src)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "spark table scan"
    assert rows[1]["n_chars"] == 16
    # quarantine carries BOTH failure classes with their raw evidence
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)

    # round-trip: write as jsonl, read back, same rows
    out = str(tmp_path / "out_jsonl")
    write_documents_jsonl(clean, out)
    back = {r["doc_id"]: r for r in read_documents_jsonl(spark, out)[0].collect()}
    assert {k: v["text"] for k, v in back.items()} == {
        k: v["text"] for k, v in rows.items()
    }


def test_jsonl_assign_ids_is_deterministic(spark, tmp_path):
    """Missing doc_ids fill from a text+source hash — same ids every run
    and independent of partitioning (unlike monotonically_increasing_id);
    n_chars backfills from the text."""
    recs = [
        {"text": "alpha beta", "source": "web"},
        {"text": "gamma delta", "source": "wiki"},
    ]
    src = _write_lines(tmp_path / "noid.jsonl", [json.dumps(r) for r in recs])
    a, _ = read_documents_jsonl(spark, src, assign_ids=True)
    b, _ = read_documents_jsonl(spark, src, assign_ids=True)
    got_a = sorted((r["doc_id"], r["text"], r["n_chars"]) for r in a.collect())
    got_b = sorted((r["doc_id"], r["text"], r["n_chars"]) for r in b.collect())
    assert got_a == got_b
    assert all(i is not None for i, _, _ in got_a)
    assert [n for _, t, n in got_a] == [len(t) for _, t, n in got_a]


def test_jsonl_gzip_input(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as fh:
        for r in GOOD:
            fh.write(json.dumps(r) + "\n")
    clean, bad = read_documents_jsonl(spark, str(p))
    assert clean.count() == 2 and bad.count() == 0


def test_read_corpus_strips_any_codec_suffix(spark, tmp_path):
    """ADVICE r11: a ``file.jsonl.zst`` input used to fall through to
    spark.read.parquet because only ``.gz`` was stripped before the
    extension check. Every known codec suffix must route through the
    JSONL reader; bz2 (pure-Java Hadoop codec, always available) proves
    the read end-to-end."""
    import bz2

    from py_gtfs_duckdb_spark.__main__ import _read_corpus

    p = tmp_path / "docs.jsonl.bz2"
    with bz2.open(p, "wt") as fh:
        for r in GOOD:
            fh.write(json.dumps(r) + "\n")
    assert _read_corpus(spark, str(p)).count() == 2

    # dispatch-only check for the remaining suffixes: the jsonl reader
    # raises Spark's codec error (or reads), never a parquet footer error
    for suffix in ("zst", "lz4"):
        q = tmp_path / f"docs.jsonl.{suffix}"
        q.write_bytes(b"\x00\x01")
        try:
            _read_corpus(spark, str(q)).count()
        except Exception as exc:  # noqa: BLE001 — asserting on the class of error
            assert "parquet" not in str(exc).lower(), (
                f".jsonl.{suffix} fell through to the parquet reader"
            )


def test_cli_corpus_verbs_accept_jsonl(spark, tmp_path, capsys):
    """The parquet-in verbs dispatch .jsonl inputs through the quarantine
    reader: profile and dedup run end-to-end off a jsonl corpus."""
    from py_gtfs_duckdb_spark.__main__ import main

    base = " ".join(f"w{i}" for i in range(30))
    recs = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "web",
         "n_chars": len(base)},
        {"doc_id": 2, "text": base + " tail", "lang": "en", "source": "web",
         "n_chars": len(base) + 5},
        {"doc_id": 3, "text": "something else entirely " * 5, "lang": "en",
         "source": "wiki", "n_chars": 120},
    ]
    src = _write_lines(
        tmp_path / "docs.jsonl", [json.dumps(r) for r in recs] + ["%%bad%%"]
    )
    out = str(tmp_path / "survivors")
    assert main(["dedup", "-i", src, "-o", out, "-m", "minhash"]) == 0
    captured = capsys.readouterr()
    summary = json.loads(captured.out.strip().splitlines()[-1])
    assert summary["docs_in"] == 3, "bad line quarantined before dedup"
    assert summary["docs_out"] == 2, "near-dup pair collapsed"
    assert "quarantined 1 malformed" in captured.err
