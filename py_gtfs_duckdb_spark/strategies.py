"""Feed-merge strategies (reference: ``strategy/match_stop_id.py`` +
dynamic strategy loading in ``ddb.py`` ``drop_subset``).

A strategy merges a subset lake (one agency's feed) into the main lake.
The reference ships one — ``match_stop_id``: stops are UPSERTED by stop_id
(shared platforms between feeds must not duplicate), every other table is
appended wholesale (``match_stop_id.py:14-42``). Its per-row
SELECT→UPDATE/INSERT loop (§4 X5) becomes one set-based upsert plan here.

Registry keyed by name so the CLI ``drop --strategy`` flag resolves the
same way the reference resolves its strategy module by name.
"""

from __future__ import annotations

from collections.abc import Callable

from py_gtfs_duckdb_spark.lake import GtfsLake
from py_gtfs_duckdb_spark.schemas import STATIC_TABLES

Strategy = Callable[[GtfsLake, GtfsLake], list[str]]

_REGISTRY: dict[str, Strategy] = {}


def register(name: str):
    def deco(fn: Strategy) -> Strategy:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_strategy(name: str) -> Strategy:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown merge strategy {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


@register("match_stop_id")
def match_stop_id(lake: GtfsLake, subset: GtfsLake) -> list[str]:
    """Stops upserted by stop_id; all other present tables appended
    (match_stop_id.py:14-42). Returns tables touched."""
    touched = []
    for table in STATIC_TABLES:
        if not subset.exists(table):
            continue
        if table == "stops":
            lake.upsert("stops", subset.table("stops"), keys=["stop_id"])
        else:
            lake.append(table, subset.table(table))
        touched.append(table)
    return touched


def merge_subset(lake: GtfsLake, subset_root: str, strategy: str = "match_stop_id") -> list[str]:
    """≙ ``drop_subset`` (CLI ``drop``): merge one subset lake by name."""
    subset = GtfsLake(lake.spark, subset_root)
    return get_strategy(strategy)(lake, subset)
