"""Differential test: every oracle-declared query must match DuckDB on the
same parquet tables — the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_conn


def _battery():
    from py_gtfs_duckdb_spark.plans import ORACLE, QUERIES

    return QUERIES, ORACLE


QUERIES, ORACLE = _battery()


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, conn, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, conn, ORACLE[name], name)
    assert ok, msg


def test_every_registered_query_has_an_oracle():
    """DRIVER CONSTRAINT (learned from the r5 reds): the driver REFUSES
    queries registered without oracle SQL (`err: no_oracle`) — the
    'rows-only check' does not exist. A battery entry without an oracle
    burns a window slot and produces a red, so registration itself is the
    gate: oracle-or-deregister."""
    missing = sorted(set(QUERIES) - set(ORACLE))
    assert not missing, (
        f"queries registered without oracle SQL (driver would err "
        f"no_oracle): {missing} — give them an oracle or deregister"
    )


def test_driver_window_is_fully_oracled():
    """The driver checks _PRIORITY[:50]; every window entry must carry an
    oracle (hard-fails what the r5 submission only discovered live)."""
    from py_gtfs_duckdb_spark.plans import _PRIORITY

    missing = [n for n in _PRIORITY[:50] if n not in ORACLE]
    assert not missing, f"window entries lacking oracles: {missing}"


def test_deregistered_bpe_still_runs_battery_shaped(spark, sf_dir):
    """q_bpe_tokens left the declared battery (no static SQL oracle can
    replay a data-dependent merge table) but stays a battery-shaped API:
    (spark, sf_dir) -> DataFrame with stable columns."""
    from py_gtfs_duckdb_spark.plans.extensions import q_bpe_tokens

    df = q_bpe_tokens(spark, sf_dir)
    assert df.columns == ["id", "n_bpe_tokens"]
    assert df.count() > 0


def test_harness_catches_hugeint_dtype_skew(spark, conn):
    """A value-equal but dtype-skewed oracle (DuckDB HUGEINT -> float64 vs
    Spark bigint -> int64) must FAIL locally, mirroring the driver's
    dtype-sensitive hash (the r2 q_pivot failure mode)."""
    df = spark.range(3).selectExpr("CAST(id AS BIGINT) AS id", "CAST(1 AS BIGINT) AS n")
    # SUM over BIGINT yields HUGEINT in DuckDB -> float64 via pandas.
    sql = "SELECT range AS id, SUM(CAST(1 AS BIGINT)) AS n FROM range(3) GROUP BY range"
    ok, msg = compare(df, conn, sql, "hugeint_skew_probe")
    assert not ok and "dtype skew" in msg, msg


def test_harness_accepts_int_width_skew(spark, conn):
    """int32 vs int64 is NOT a skew: both hash as integral values."""
    df = spark.range(3).selectExpr("CAST(id AS INT) AS id")
    sql = "SELECT CAST(range AS BIGINT) AS id FROM range(3)"
    ok, msg = compare(df, conn, sql, "int_width_probe")
    assert ok, msg


def test_harness_rejects_complex_output_columns(spark, conn):
    """A value-correct ArrayType output must FAIL locally: the driver's
    pandas canonicalizer crashes on list cells (the r5 q_multimodal_*
    failure mode the old tuple-izing replica waved through)."""
    df = spark.range(2).selectExpr("id", "array(1, 2) AS a")
    sql = "SELECT range AS id, list_value(1, 2) AS a FROM range(2)"
    ok, msg = compare(df, conn, sql, "array_probe")
    assert not ok and "complex-typed" in msg, msg


def test_battery_outputs_are_scalar_typed(spark, sf_dir):
    """Schema-only sweep over the WHOLE battery: no registered query may
    emit ArrayType/MapType/StructType columns (driver constraint #2).
    Cheap — builds each plan, runs nothing."""
    from tests.oracle_harness import complex_output_cols

    offenders = {}
    for name, fn in QUERIES.items():
        bad = complex_output_cols(fn(spark, sf_dir))
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed battery outputs: {offenders}"
