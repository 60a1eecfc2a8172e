"""Regression: the battery must run on a vanilla SparkSession.

Round-1 driver correctness failed 16/50 rows because events.parquet
(INT64 TIMESTAMP(NANOS)) was only readable under ``session.get_spark()``'s
factory confs. ``plans._tables.t`` now sets the load-bearing confs itself
(see ``ensure_battery_confs``); this test proves it by running a sample of
events-touching battery queries in a subprocess whose SparkSession is built
with ``SparkSession.builder.master("local[4]").getOrCreate()`` and nothing
else — the same shape as the driver harness.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# One per former failure family: parquet-nanos read, join chain, function
# battery (timezone-sensitive epoch math), windows battery, flagship.
SAMPLE = [
    "q_project_derived",
    "q_join_chain_left",
    "q_fn_epoch",
    "q_window_tumbling",
    "q_flagship_nominal_trips",
]

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, {repo!r})
from py_gtfs_duckdb_spark.plans import QUERIES

out = {{}}
for name in {sample!r}:
    df = QUERIES[name](spark, {sf_dir!r})
    out[name] = df.count()
print("BARE_RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_battery_runs_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sample=SAMPLE, sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("BARE_RESULT ")), None
    )
    assert line is not None, f"no result line in stdout:\n{proc.stdout[-2000:]}"
    import json

    counts = json.loads(line[len("BARE_RESULT ") :])
    assert set(counts) == set(SAMPLE)
    for name, n in counts.items():
        assert n >= 0, name
    # Events-touching queries must actually produce rows at sf0.001.
    assert counts["q_project_derived"] > 0
    assert counts["q_flagship_nominal_trips"] >= 0
