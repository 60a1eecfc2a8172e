"""Local replica of the driver's DuckDB-oracle differential check:
row count + column set + order-insensitive value comparison.

Stricter than a hash: on mismatch it reports WHICH rows differ, so
parity bugs are debuggable before the driver ever runs.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return conn


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    # numpy scalars
    if hasattr(v, "item"):
        return _canon_cell(v.item())
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _dtype_kind_skew(s_pdf, d_pdf):
    """Driver-replica dtype check: the driver hashes pandas-materialized
    values, so a column whose *numpy kind* differs between the two sides
    (e.g. DuckDB HUGEINT -> float64 'f' vs Spark bigint -> int64 'i')
    hash-mismatches even when every value compares equal. Width skew
    (int32 vs int64) is tolerated — same kind, same hashed value.
    """
    skews = []
    for c in sorted(set(s_pdf.columns) & set(d_pdf.columns)):
        sk, dk = s_pdf[c].dtype.kind, d_pdf[c].dtype.kind
        # int-vs-float is only a real skew when one side stayed integral;
        # a nullable int column degrades to float64 on BOTH sides.
        if sk != dk and {sk, dk} != {"i", "u"}:
            skews.append(f"{c}: spark dtype kind '{sk}' vs duckdb '{dk}'")
    return skews


def complex_output_cols(spark_df) -> list[str]:
    """Columns the DRIVER cannot hash: its canonicalizer materializes the
    result to pandas and ``sort_values`` every column, which raises
    ``unhashable type`` on list/dict cells (the r5 q_multimodal_* reds).
    Any ArrayType/MapType/StructType output column is therefore a
    driver-contract violation even though values could be compared
    locally by tuple-izing."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(spark_df, conn, sql: str, name: str = "?", max_report: int = 5):
    """Returns (ok, message). Replicates the driver's check INCLUDING its
    representation constraints: complex-typed output columns fail here
    because they crash the driver's pandas canonicalizer (r5 lesson —
    tuple-izing lists locally overpromised driver green)."""
    bad = complex_output_cols(spark_df)
    if bad:
        return False, (
            f"[{name}] complex-typed output columns {bad}: the driver's "
            "canonicalizer cannot hash list/dict cells — scalarize "
            "(posexplode) the output instead"
        )
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = conn.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    else:
        skews = _dtype_kind_skew(spark_df.toPandas(), conn.sql(sql).df())
        if skews:
            problems.append("dtype skew (driver hash would fail): " + "; ".join(skews))
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        cs = _canon_rows(s_cols, s_rows)
        cd = _canon_rows(d_cols, d_rows)
        if cs != cd:
            diffs = [
                (a, b) for a, b in zip(cs, cd) if a != b
            ][:max_report]
            only_s = [r for r in cs if r not in set(cd)][:max_report]
            only_d = [r for r in cd if r not in set(cs)][:max_report]
            problems.append(
                f"values differ; first aligned diffs={diffs!r}; "
                f"spark-only={only_s!r}; duckdb-only={only_d!r}"
            )
    if problems:
        return False, f"[{name}] " + " | ".join(problems)
    return True, f"[{name}] OK ({len(s_rows)} rows)"
