"""Scalar-function battery — SURVEY.md §2.7.

Every scalar function the reference uses, exercised over the testdata
tables with exact oracle parity (UTC session timezone pins the
timestamp functions; see session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.plans import query
from py_gtfs_duckdb_spark.plans._tables import t


@query(
    "q_fn_dateformat",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m%d') AS yyyymmdd,
           lower(dayname(o_orderdate)) AS weekday
    FROM orders
    """,
)
def q_fn_dateformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 date→YYYYMMDD + weekday-name (reference ddb.py:179-180 picks the
    calendar weekday column via strftime('%A').lower())."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("yyyymmdd"),
        F.lower(F.date_format("o_orderdate", "EEEE")).alias("weekday"),
    )


@query(
    "q_fn_totimestamp",
    oracle="""
    SELECT event_id, ts FROM events
    WHERE ts <= strptime('2024-01-10 12:00:00', '%Y-%m-%d %H:%M:%S')
    """,
)
def q_fn_totimestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 strptime cutoff comparison (reference ddb.py:290-293 TTL delete
    uses last_updated_timestamp <= strptime(?))."""
    return (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts")
            <= F.to_timestamp(F.lit("2024-01-10 12:00:00"), "yyyy-MM-dd HH:mm:ss")
        )
        .select("event_id", "ts")
    )


@query(
    "q_fn_interval",
    oracle="""
    SELECT event_id, ts FROM events
    WHERE ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 7 DAY
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 timestamp arithmetic cutoff (reference ddb.py:284-285:
    now() - timedelta(seconds=review)). Fixed anchor keeps it
    deterministic for the oracle."""
    return (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts")
            >= F.lit("2024-01-31 00:00:00").cast("timestamp")
            - F.expr("INTERVAL 7 DAYS")
        )
        .select("event_id", "ts")
    )


@query(
    "q_fn_epoch",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS epoch_millis,
           make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS ts_roundtrip
    FROM events
    """,
)
def q_fn_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 epoch↔datetime conversions (reference realtime.py:591,727-728:
    datetime.fromtimestamp / .timestamp() + floor for the feed header)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("epoch_millis"),
        F.timestamp_seconds(F.floor(F.unix_millis("ts") / 1000)).alias(
            "ts_roundtrip"
        ),
    )


@query(
    "q_fn_concat_format",
    oracle="""
    SELECT event_id,
           event_type || '/' || CAST(user_id AS VARCHAR) AS entity_key,
           printf('%s=%08d', event_type, user_id) AS padded_key
    FROM events
    """,
)
def q_fn_concat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 string concat + printf-style formatting (reference realtime.py:384
    composite keys; Customer#%09d-style ids)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat_ws(
            "/", F.col("event_type"), F.col("user_id").cast("string")
        ).alias("entity_key"),
        F.format_string("%s=%08d", F.col("event_type"), F.col("user_id")).alias(
            "padded_key"
        ),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column (the reference
    builds JSON only at the serving edge with json.dumps, realtime.py:293;
    a lake engine must also read it)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "q_fn_case_enum",
    oracle="""
    SELECT event_id,
           CASE event_type
               WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
               WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE 0
           END AS event_code
    FROM events
    """,
)
def q_fn_case_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 enum name↔code mapping (reference adapter/gtfsrt.py:115-116
    protobuf enum → name) as a codegen'd CASE chain — no UDF, no broadcast
    needed for a fixed small enum."""
    e = t(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 5)
        .otherwise(0)
    )
    return e.select("event_id", code.cast("int").alias("event_code"))


@query(
    "q_fn_sha256",
    oracle="""
    SELECT doc_id, md5(text) AS doc_md5, sha256(text) AS doc_sha256
    FROM documents
    """,
)
def q_fn_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests used by the dedup/fingerprint suite (exact
    parity between Spark md5/sha2 and DuckDB md5/sha256)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("doc_md5"),
        F.sha2("text", 256).alias("doc_sha256"),
    )
