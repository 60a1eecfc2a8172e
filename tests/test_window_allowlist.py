"""Battery-wide window-partition sweep.

A window function sorts its ENTIRE partition in one task and AQE cannot
split it, so an unbounded partition key is a guaranteed straggler at
100 TB (the mega-cluster case the dedup actions were rebuilt to avoid).
This sweep makes the guard systematic: EVERY registered query's physical
plan is scanned for ``windowspecdefinition``; any window found must key
on a partition-key tuple recorded — with a documented boundedness
argument — in ``plans.WINDOW_PARTITION_ALLOWLIST``. A query not in the
allowlist must be window-free. New queries that add a window fail here
until the key is justified next to the list.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import plan_str as _plan

_SPEC = re.compile(r"windowspecdefinition\((.*?)specifiedwindowframe")
_ATTR_ID = re.compile(r"#\d+L?")


def _split_args(s: str) -> list[str]:
    """Split a windowspecdefinition argument list on TOP-LEVEL commas
    only: a composite partition key like ``substring(k#1, 1, 2)`` is one
    argument, not three garbage fragments (a bare ``split(',')`` would
    shred it and compare nonsense tuples against the allowlist)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail:
        parts.append(tail)
    assert depth >= 0, f"unbalanced parens in windowspecdefinition args: {s!r}"
    return parts


def window_partition_keys(plan: str) -> set[tuple[str, ...]]:
    """Every distinct window partition-key tuple in a formatted plan.

    ``windowspecdefinition(pk1#1, pk2#2L, ord#3 ASC NULLS FIRST, ...,
    specifiedwindowframe(...))`` — partition keys are the leading args
    without a sort direction; attribute ids are stripped so the tuples
    compare by column base name."""
    specs: set[tuple[str, ...]] = set()
    for m in _SPEC.finditer(plan):
        parts = _split_args(m.group(1))
        keys = [p for p in parts if p and " ASC" not in p and " DESC" not in p]
        specs.add(tuple(_ATTR_ID.sub("", k) for k in keys))
    return specs


def test_split_args_is_paren_aware():
    """Unit-pin the splitter on composite keys (the ADVICE r8 finding:
    bare comma-split would shred function-call partition keys)."""
    got = _split_args(
        "substring(k#1, 1, 2), u#2L, CASE WHEN f(a#3, b#4) THEN 1 END, "
        "ts#5 ASC NULLS FIRST,"
    )
    assert got == [
        "substring(k#1, 1, 2)",
        "u#2L",
        "CASE WHEN f(a#3, b#4) THEN 1 END",
        "ts#5 ASC NULLS FIRST",
    ]
    assert window_partition_keys(
        "windowspecdefinition(substring(k#1, 1, 2), ts#5 ASC NULLS FIRST, "
        "specifiedwindowframe(...))"
    ) == {("substring(k, 1, 2)",)}


def _battery_names() -> list[str]:
    from py_gtfs_duckdb_spark.plans import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _battery_names())
def test_window_partitions_are_allowlisted(spark, sf_dir, name):
    from py_gtfs_duckdb_spark.plans import WINDOW_PARTITION_ALLOWLIST

    specs = window_partition_keys(_plan(spark, sf_dir, name))
    allowed = WINDOW_PARTITION_ALLOWLIST.get(name, set())
    extra = specs - allowed
    assert not extra, (
        f"{name}: window partition keys {sorted(extra)} not in the "
        f"allowlist — justify the boundedness in plans/__init__.py or "
        f"rewrite the window as a combinable aggregation"
    )


def test_allowlist_has_no_stale_entries(spark, sf_dir):
    """Every allowlisted query must still USE a window — entries that
    outlive their window rot into permission nobody audits."""
    from py_gtfs_duckdb_spark.plans import WINDOW_PARTITION_ALLOWLIST

    stale = [
        name
        for name in WINDOW_PARTITION_ALLOWLIST
        if not window_partition_keys(_plan(spark, sf_dir, name))
    ]
    assert not stale, f"allowlisted but window-free: {stale}"
