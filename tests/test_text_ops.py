

def test_compression_stats_hand_computed(spark):
    """Per-doc zlib ratio matches a driver-side zlib reference exactly
    (same level), boilerplate compresses far below random-ish prose, and
    the empty doc emits NULL bits_per_byte instead of 0/0."""
    import zlib

    from py_gtfs_duckdb_spark.operators.text import compression_stats

    rep = "spam and eggs " * 200
    prose = " ".join(f"w{i * 2654435761 % 99991}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["z_bytes"], r["bits_per_byte"])
        for r in compression_stats(docs).collect()
    }
    for did, txt in ((1, rep), (2, prose)):
        raw = txt.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert got[did] == (len(raw), z, round(8.0 * z / len(raw), 4))
    assert got[1][2] < 0.5 < 2.0 < got[2][2]  # boilerplate vs prose
    assert got[3] == (0, got[3][1], None)
