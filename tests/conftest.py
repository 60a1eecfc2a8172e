from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from py_gtfs_duckdb_spark.session import get_spark

    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def plan_str(spark, sf_dir: str, name: str) -> str:
    """Formatted physical plan of a registered battery query — the shared
    capture helper for every plan-shape/cache-scope assertion."""
    import contextlib
    import io

    from py_gtfs_duckdb_spark.plans import QUERIES

    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(autouse=True)
def _release_scoped_persists():
    """Free any operator-scoped persists after each test: tests that call
    operators DIRECTLY (not through the battery's release-on-entry
    wrapper) must not leak cache entries into the next test — the
    round-6 ordering bug (q_doc_scorecard parity run leaking its cached
    frames into test_dsir_single_explode's plan)."""
    yield
    from py_gtfs_duckdb_spark.operators._scope import release_shared

    release_shared()
