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
