"""Equivalence of the r13 fused band-join candidate stage
(dedup.banded_pair_nmatch: signatures carried through the band explode,
n_match computed map-side on the join output, 16-byte binary band key)
against the two-stage form it replaced (lsh_candidate_pairs +
estimate_filter_pairs: raw candidate flood re-joined twice against the
signature table). Everything downstream of the candidate stage hashes
into the oracle-checked outputs, so the pair sets must be identical —
not merely the verified survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.operators import dedup as D


def _sets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.shingle_signatures(docs, "text", "doc_id", 3).persist()


def test_candidate_pairs_identical(spark, sf_dir):
    sets = _sets(spark, sf_dir)
    try:
        old = D.lsh_candidate_pairs(sets).dropDuplicates(["id_a", "id_b"])
        new = (
            D.banded_pair_nmatch(sets)
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0
    finally:
        sets.unpersist()


def test_nmatch_matches_estimate_filter(spark, sf_dir):
    """Pairs surviving the estimate prune are the same set, and n_match
    agrees with the signature-join recount pair by pair."""
    sets = _sets(spark, sf_dir)
    try:
        old = D.estimate_filter_pairs(
            D.lsh_candidate_pairs(sets), sets
        ).dropDuplicates(["id_a", "id_b"])
        new = (
            D.banded_pair_nmatch(sets)
            .filter(F.col("n_match") >= D.EST_MIN_MATCHES)
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0

        # n_match recount: join the carried-signature count against an
        # independent recomputation from the signature table
        sig_a = sets.select(
            F.col("id").alias("id_a"),
            *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(D.MINHASH_K)],
        )
        sig_b = sets.select(
            F.col("id").alias("id_b"),
            *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(D.MINHASH_K)],
        )
        recount = sum(
            F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
            for i in range(D.MINHASH_K)
        ).cast("bigint")
        carried = D.banded_pair_nmatch(sets).dropDuplicates(["id_a", "id_b"])
        mismatches = (
            carried.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .filter(F.col("n_match") != recount)
            .count()
        )
        assert mismatches == 0
    finally:
        sets.unpersist()
