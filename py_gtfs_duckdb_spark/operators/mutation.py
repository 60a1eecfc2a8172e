"""Set-based mutation operators.

The reference mutates its DuckDB tables with row-wise DML: per-row
UPDATE-else-INSERT merge (``strategy/match_stop_id.py:11-36``), keyed
delete-then-insert upsert (``ddb.py:296-332``), and ``NOT IN`` cascade
deletes (``ddb.py:336-348``). On a Parquet lake there is no DML, and at
100 TB there must not be per-row round-trips — every mutation here is a
single distributed plan producing the table's next version
(read → transform → write-new → swap; see ``lake.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows from ``updates`` win; ``base`` rows whose key is absent from
    ``updates`` are kept. Equivalent to the reference's UPDATE-else-INSERT
    loop (``strategy/match_stop_id.py:14-36``) and its realtime
    delete-then-insert upsert (``ddb.py:296-332``), as ONE plan:
    ``updates ∪ (base ⟕anti updates)``.

    Scale: the anti-join shuffles on ``keys`` only; when ``updates`` is a
    micro-batch (small vs base) Catalyst/AQE broadcasts it, so the base
    table is never shuffled.
    """
    keys = list(keys)
    update_keys = updates.select(*keys).dropDuplicates(keys)
    survivors = base.join(update_keys, keys, "left_anti")
    return updates.unionByName(survivors)


def delete_where(df: DataFrame, condition) -> DataFrame:
    """DELETE WHERE cond → keep ¬cond, treating NULL predicate as keep
    (SQL DELETE only removes rows where the predicate is TRUE)."""
    cond = condition if not isinstance(condition, str) else F.expr(condition)
    return df.filter(~F.coalesce(cond, F.lit(False)))


def anti_join_not_in(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """``left`` rows whose key is NOT IN ``right``'s key set, with exact SQL
    ``NOT IN`` NULL semantics — NOT Spark's ``left_anti`` semantics.

    SQL three-valued logic (what DuckDB does for the reference's cascade
    deletes, ``ddb.py:336-348``):

    - the right side produces ANY NULL key → ``x NOT IN (...)`` is never
      TRUE → result is EMPTY;
    - the right side is EMPTY → ``NOT IN ()`` is vacuously TRUE → ALL left
      rows qualify (even NULL-keyed);
    - otherwise a NULL left key never satisfies NOT IN → NULL-keyed left
      rows are dropped (a plain ``left_anti`` would keep them — SURVEY §7
      hard part 2).

    One plan: broadcast the right side's distinct keys plus a 1-row stats
    frame (count, null-count) — no collect().
    """
    right_stats = right.agg(
        F.count(F.lit(1)).alias("__n_right"),
        F.coalesce(
            F.sum(F.col(right_key).isNull().cast("long")), F.lit(0)
        ).alias("__n_null_right"),
    )
    keys = (
        right.select(F.col(right_key).alias(left_key))
        .where(F.col(left_key).isNotNull())
        .dropDuplicates([left_key])
        .withColumn("__matched", F.lit(1))
    )
    return (
        left.join(F.broadcast(right_stats), how="cross")
        .join(F.broadcast(keys), [left_key], "left")
        .where(
            (F.col("__n_null_right") == 0)
            & (
                (F.col("__n_right") == 0)
                | (F.col(left_key).isNotNull() & F.col("__matched").isNull())
            )
        )
        .drop("__n_right", "__n_null_right", "__matched")
    )


def delete_not_in(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """The kept-rows complement of the reference's cascade delete
    ``DELETE FROM child WHERE child_key NOT IN (SELECT parent_key FROM
    parent)`` (``ddb.py:336-348``): returns the rows that SURVIVE.

    SQL three-valued logic, row by row (verified in tests against a DuckDB
    oracle):

    - parent key set contains a NULL → predicate is never TRUE → NOTHING is
      deleted (all child rows survive);
    - parent is EMPTY → ``NOT IN ()`` is vacuously TRUE → EVERY child row is
      deleted (even NULL-keyed ones);
    - otherwise → deleted = non-NULL keys absent from the parent set;
      NULL-keyed child rows survive (predicate UNKNOWN).

    One plan: broadcast the parent's distinct keys plus a 1-row stats frame,
    left-join the marker, filter.
    """
    parent_stats = parent.agg(
        F.count(F.lit(1)).alias("__n_parent"),
        F.coalesce(
            F.sum(F.col(parent_key).isNull().cast("long")), F.lit(0)
        ).alias("__n_null_parent"),
    )
    keys = (
        parent.select(F.col(parent_key).alias(child_key))
        .where(F.col(child_key).isNotNull())
        .dropDuplicates([child_key])
        .withColumn("__matched", F.lit(1))
    )
    return (
        child.join(F.broadcast(parent_stats), how="cross")
        .join(F.broadcast(keys), [child_key], "left")
        .where(
            (F.col("__n_null_parent") > 0)
            | (
                (F.col("__n_parent") > 0)
                & (F.col(child_key).isNull() | (F.col("__matched") == 1))
            )
        )
        .drop("__n_parent", "__n_null_parent", "__matched")
    )
