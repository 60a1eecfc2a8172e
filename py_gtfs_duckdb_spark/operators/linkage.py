"""Fuzzy record linkage: blocked edit-distance joins.

The approximate-string complement to the token-level near-dup stack
(operators/dedup.py): entity resolution asks "which NAMES refer to the
same thing" — catalog titles, author names, station labels — where the
variation is a typo or an OCR slip, not a re-wording. The reference
resolves ids only by exact match or regex mapping (mapping.py:1-24,
strategy/match_stop_id.py); this module adds the fuzzy tier a
training-data pipeline needs for metadata joins across noisy sources.

Scale shape (the anti-cartesian argument):

- a naive edit-distance join is an O(|L|·|R|) nested-loop cross product
  — the one plan shape this repo bans outright. The standard fix is
  BLOCKING: partition both sides by a key that every true match must
  share, join block-locally, and verify only within blocks.
- the blocking key here is the LENGTH BAND: Levenshtein distance is
  bounded below by the length difference, so a pair within ``max_dist``
  edits always lands within ``max_dist`` characters of length. Bands of
  width ``max_dist + 1`` mean each left row carries ONE band id and each
  right row replicates into at most THREE consecutive bands — a bounded
  fan-out, after which the join is a plain hash equi-join on the band id
  (never a BroadcastNestedLoopJoin; pinned in test_plan_shapes).
- every candidate pair meets EXACTLY once (the left side's single band
  is covered by the right side's replicated band range iff the lengths
  are compatible), so no post-join dedup pass is needed.
- the verify step is ``F.levenshtein`` — JVM-side, whole-stage-codegen,
  identical unit-cost DP semantics to DuckDB's ``levenshtein``, so the
  oracle replays the join bit-for-bit.
- residual skew: length-banding is weak when the dictionary's lengths
  concentrate (names generated from one template all share a band). The
  per-band cost is |L_band|·|R_band| — the same hot-bin shape as the
  binned temporal joins, with the same remedies (SCALING.md §13–14:
  a second sound blocking key such as a character-histogram band, AQE
  skew-join splitting, sub-band salting). For dictionary-sized inputs
  (distinct names, not corpus rows) the bands comfortably fit a task.

The practical entity-resolution pipeline runs this over DISTINCT names
(a dictionary orders of magnitude smaller than the corpus), then maps
matches back to rows via an exact equi-join — the same
dictionary-then-broadcast shape as the mapping-CSV side input
(sources/mapping.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
) -> DataFrame:
    """(<left_col>, <right_col>, dist): all cross-side pairs with
    Levenshtein distance ≤ ``max_dist``, via length-band blocking.

    Both inputs are taken AS GIVEN (dedup/select upstream if the columns
    repeat); nulls never match. The two name columns must be named
    differently (rename upstream for a self-join — ``fuzzy_pairs`` does).

    Plan: left rows hash into band ``len // (max_dist+1)``; right rows
    replicate into the ≤ 3 bands covering ``[len-max_dist, len+max_dist]``
    (``sequence`` over band ids — never more than 3 because the band
    width exceeds half the window); one shuffle hash-join on the band id;
    a residual ``|Δlen| ≤ max_dist`` guard (cheap, integer) ahead of the
    Levenshtein verify keeps the DP off provably-impossible pairs.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if left_col == right_col:
        raise ValueError(
            "left_col and right_col must differ (rename one side upstream)"
        )
    bw = max_dist + 1
    ll = F.length(F.col(left_col))
    lr = F.length(F.col(right_col))
    lb = left.filter(F.col(left_col).isNotNull()).select(
        F.col(left_col), F.floor(ll / F.lit(bw)).cast("bigint").alias("__band")
    )
    rb = (
        right.filter(F.col(right_col).isNotNull())
        .select(
            F.col(right_col),
            F.explode(
                F.sequence(
                    F.floor((lr - F.lit(max_dist)) / F.lit(bw)).cast("bigint"),
                    F.floor((lr + F.lit(max_dist)) / F.lit(bw)).cast("bigint"),
                )
            ).alias("__band"),
        )
    )
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        lb.join(rb, "__band")
        .filter(
            (
                F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col)))
                <= F.lit(max_dist)
            )
            & (dist <= F.lit(max_dist))
        )
        .select(
            F.col(left_col),
            F.col(right_col),
            dist.cast("bigint").alias("dist"),
        )
    )


def fuzzy_pairs(
    df: DataFrame, name_col: str, max_dist: int
) -> DataFrame:
    """(name_a, name_b, dist): unordered pairs of DISTINCT values of
    ``name_col`` within ``max_dist`` edits, emitted once with
    ``name_a < name_b`` — the self-join entity-resolution form ("which
    catalog names are typo-variants of each other").

    Distinct-first matters twice: correctness (a value repeated n times
    would otherwise emit n² echo pairs at distance 0) and scale (the
    dictionary of distinct names is what blocks and joins — corpus rows
    never enter the pair join)."""
    names = df.select(F.col(name_col).alias("name_a")).distinct()
    other = df.select(F.col(name_col).alias("name_b")).distinct()
    return fuzzy_join_blocked(names, other, "name_a", "name_b", max_dist).filter(
        F.col("name_a") < F.col("name_b")
    )
