"""Regression: the battery must run on a vanilla SparkSession.

Round-1 driver correctness failed 16/50 rows because events.parquet
(INT64 TIMESTAMP(NANOS)) was only readable under ``session.get_spark()``'s
factory confs. ``plans._tables.t`` now sets the load-bearing confs itself
(see ``ensure_battery_confs``); this test proves it by running the FULL
declared battery in a subprocess whose SparkSession is built with
``SparkSession.builder.master("local[4]").getOrCreate()`` and nothing
else — the same shape as the driver harness.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, {repo!r})
from py_gtfs_duckdb_spark.plans import QUERIES

out = {{}}
errs = {{}}
for name in QUERIES:
    try:
        df = QUERIES[name](spark, {sf_dir!r})
        out[name] = df.count()
    except Exception as exc:  # keep going: report every failing query at once
        errs[name] = repr(exc)[:300]
print("BARE_RESULT " + json.dumps({{"counts": out, "errors": errs}}))
"""


@pytest.mark.slow
def test_battery_runs_on_vanilla_session():
    """The FULL declared battery (every registered query) must run green in a
    subprocess whose SparkSession has none of the factory confs — the
    driver-harness shape. Insurance that no future query reintroduces a
    session-conf dependency (the round-1 16/50 failure class)."""
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=3000,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("BARE_RESULT ")), None
    )
    assert line is not None, f"no result line in stdout:\n{proc.stdout[-2000:]}"
    import json

    result = json.loads(line[len("BARE_RESULT ") :])
    assert result["errors"] == {}, f"bare-session failures: {result['errors']}"
    from py_gtfs_duckdb_spark.plans import QUERIES

    assert set(result["counts"]) == set(QUERIES)
    # Events-touching queries must actually produce rows at sf0.001.
    assert result["counts"]["q_project_derived"] > 0
    assert result["counts"]["q_flagship_nominal_trips"] >= 0
