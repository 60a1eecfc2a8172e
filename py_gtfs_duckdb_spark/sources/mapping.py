"""ID-mapping side input (reference: realtime.py:201-209 + mapping.py:3-8).

The reference loads a 2-column ``;``-separated headerless CSV into a dict
and rewrites external IDs by first-matching regex. Spark-side: the mapping
is a tiny side input — read once, collapse to a literal ``when``-chain so
the rewrite runs inside whole-stage codegen on every executor (no UDF, no
join, no Python in the hot path). First-match-wins order is preserved by
chaining in file order.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def load_mapping_csv(spark: SparkSession, path: str, sep: str = ";") -> list[tuple[str, str]]:
    """Read the mapping file (no headers: pattern;replacement) preserving
    file order (realtime.py:201-209)."""
    rows = (
        spark.read.csv(path, sep=sep, header=False)
        .toDF("pattern", "replacement")
        .collect()
    )
    return [(r["pattern"], r["replacement"]) for r in rows]


def map_id_column(col: Column, mapping: list[tuple[str, str]]) -> Column:
    """First ``re.match``-ing pattern wins, else identity (mapping.py:3-8).

    ``re.match`` anchors at the start only, so each pattern is compiled to
    ``^(?:pat)`` for ``rlike``. A when-chain keeps first-match order, which
    a join-based formulation cannot express without a priority sort."""
    out = None
    for pattern, replacement in mapping:
        cond = col.rlike(f"^(?:{pattern})")
        out = F.when(cond, F.lit(replacement)) if out is None else out.when(cond, F.lit(replacement))
    return col if out is None else out.otherwise(col)
