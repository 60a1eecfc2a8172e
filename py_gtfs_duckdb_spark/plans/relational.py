"""Relational operator battery — SURVEY.md §2.1–§2.6.

Role mapping onto the driver testdata (FIXTURES.md §A): orders ≙ trips,
lineitem ≙ stop_times (l_linenumber ≙ stop_sequence), customer ≙ routes,
supplier ≙ stops, events ≙ realtime updates, nation/region ≙ small dims.

Each query cites the reference behavior it re-expresses (file:line into
/root/reference). Spark-first notes inline: broadcast hints on dimension
sides, semi-joins instead of collected IN-lists, single Catalyst plan per
query (no materialization barriers — contrast reference ddb.py:187-196).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from py_gtfs_duckdb_spark.plans import query
from py_gtfs_duckdb_spark.plans._tables import t

# ---------------------------------------------------------------------------
# §2.1 scans / sources
# ---------------------------------------------------------------------------


@query("q_scan_star", oracle="SELECT * FROM nation")
def q_scan_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/P1 full table scan (reference ddb.py:133-135: table().select(*))."""
    return t(spark, sf_dir, "nation")


@query("q_scan_csv_projection", oracle="SELECT * FROM region")
def q_scan_csv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 CSV scan with header projection (reference ddb.py:350-385).

    The reference reads CSV rows as strings, blacklists header columns not
    present in the declared table schema, and casts on insert. We re-enact
    exactly that: write ``region`` out as CSV with an extra unknown column,
    read it schema-less with header, drop unknown columns, cast to the
    declared types. The result must round-trip to the original table.
    """
    declared = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    # Fixture build is a distributed write (no driver collect — executors
    # write part files in parallel, exactly how a CSV landing zone looks
    # at scale); the declared operator is the schema-less read + projection
    # + cast below.
    tmp = tempfile.mkdtemp(prefix="gtfs_csv_scan_")
    path = os.path.join(tmp, "region_csv")
    (
        t(spark, sf_dir, "region")
        .select("r_regionkey", F.lit("junk").alias("unknown_extra_col"), "r_name")
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )
    raw = spark.read.csv(path, header=True)  # all strings, like the reference
    keep = [f.name for f in declared.fields if f.name in raw.columns]
    projected = raw.select(
        *[F.col(c).cast(declared[c].dataType).alias(c) for c in keep]
    )
    return projected


@query(
    "q_sql_passthrough",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 arbitrary SQL execution over registered views (reference
    ddb.py:260-264, __main__.py:75-83)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters
# ---------------------------------------------------------------------------


@query("q_project_cols", oracle="SELECT o_custkey FROM orders")
def q_project_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 single-column projection (reference ddb.py:183-185). Catalyst
    prunes the parquet scan to one column (ReadSchema)."""
    return t(spark, sf_dir, "orders").select("o_custkey")


@query(
    "q_project_derived",
    oracle="""
    SELECT '20250604' AS operation_day,
           o.o_orderkey AS trip_id,
           c.c_name AS route_name,
           o.o_orderstatus AS status,
           (e.event_id IS NOT NULL) AS realtime_available
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN events e ON e.event_id = o.o_orderkey
    """,
)
def q_project_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+F5: aliased projection with constant + isnotnull-derived flag over
    a left join (reference ddb.py:243-258: monitor projection with
    ConstantExpression(operation_day) and realtime_available =
    isnotnull(trip_update_id))."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    events = t(spark, sf_dir, "events")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(events, events.event_id == orders.o_orderkey, "left")
        .select(
            F.lit("20250604").alias("operation_day"),
            orders.o_orderkey.alias("trip_id"),
            customer.c_name.alias("route_name"),
            orders.o_orderstatus.alias("status"),
            events.event_id.isNotNull().alias("realtime_available"),
        )
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1997-12-31'
      AND o_orderstatus = 'O'
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 range + flag predicate (reference ddb.py:183: start_date <= D AND
    end_date >= D AND <weekday> = '1'). Pushed down to the parquet scan."""
    return t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        & (F.col("o_orderstatus") == "O")
    )


@query(
    "q_filter_eq",
    oracle="SELECT * FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 equality predicates (reference ddb.py:184-185: date = D AND
    exception_type = '1')."""
    return t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    )


@query(
    "q_filter_isin",
    oracle="""
    SELECT * FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 IN-list predicate. The reference collects the id list into Python
    and re-embeds it as literals (ddb.py:187-196 — a plan barrier, SURVEY §4
    X2). Spark-first: left-semi join, one Catalyst plan, broadcastable."""
    orders = t(spark, sf_dir, "orders")
    keys = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders.join(F.broadcast(keys), "o_custkey", "left_semi")


@query("q_filter_first_stop", oracle="SELECT * FROM lineitem WHERE l_linenumber = 1")
def q_filter_first_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 constant predicate = first stop of trip (reference ddb.py:200,236:
    stop_sequence = 1)."""
    return t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)


@query(
    "q_filter_like",
    oracle="SELECT * FROM customer WHERE c_name LIKE 'Customer#00000014%'",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 LIKE pattern predicate (reference ddb.py:76-88: DELETE ... WHERE
    agency_id LIKE ?; the kept-rows complement is the same predicate)."""
    return t(spark, sf_dir, "customer").filter(
        F.col("c_name").like("Customer#00000014%")
    )


@query(
    "q_map_id_regex",
    oracle="""
    SELECT c_custkey,
           CASE WHEN regexp_matches(c_name, '^Customer#0000000')
                THEN 'group-low'
                WHEN regexp_matches(c_name, '^Customer#000001')
                THEN 'group-high'
                ELSE c_name END AS mapped_id
    FROM customer
    """,
)
def q_map_id_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 regex ID mapping: first matching regex key wins, else identity
    (reference mapping.py:3-8, applied adapter/gtfsrt.py:63,72). Expressed as
    a chained ``when`` — stays in whole-stage codegen, no UDF."""
    c = t(spark, sf_dir, "customer")
    mapped = (
        F.when(F.col("c_name").rlike("^Customer#0000000"), F.lit("group-low"))
        .when(F.col("c_name").rlike("^Customer#000001"), F.lit("group-high"))
        .otherwise(F.col("c_name"))
    )
    return c.select("c_custkey", mapped.alias("mapped_id"))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-join trips⋈stop_times (reference ddb.py:202)."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, lineitem.l_orderkey == orders.o_orderkey, "inner"
    ).select("o_orderkey", "o_orderdate", "l_linenumber", "l_quantity")


@query(
    "q_join_chain_left",
    oracle="""
    SELECT o.o_orderkey AS trip_id,
           c.c_name AS route_name,
           l.l_linenumber AS stop_sequence,
           s.s_name AS stop_name,
           (e.event_id IS NOT NULL) AS realtime_available
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    LEFT JOIN events e ON e.event_id = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q_join_chain_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 five-table join chain with one LEFT leg (reference ddb.py:240:
    trips⋈routes⋈stop_times⟕realtime_trip_updates⋈stops). Dimension sides
    (customer≙routes, supplier≙stops) are broadcast; the fact-fact join
    (orders⋈lineitem) shuffles on the key."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    l = t(spark, sf_dir, "lineitem")
    e = t(spark, sf_dir, "events")
    s = t(spark, sf_dir, "supplier")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(e, e.event_id == o.o_orderkey, "left")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(
            o.o_orderkey.alias("trip_id"),
            c.c_name.alias("route_name"),
            l.l_linenumber.alias("stop_sequence"),
            s.s_name.alias("stop_name"),
            e.event_id.isNotNull().alias("realtime_available"),
        )
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 NOT-IN anti-join (reference cascade deletes ddb.py:336-348).

    Uses :func:`anti_join_not_in` which reproduces SQL NOT-IN NULL semantics
    (a NULL anywhere in the subquery empties the result; NULL-keyed left rows
    never qualify) — SURVEY §7 hard part 2."""
    from py_gtfs_duckdb_spark.operators.mutation import anti_join_not_in

    customer = t(spark, sf_dir, "customer")
    parents = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
    )
    return anti_join_not_in(customer, parents, "c_custkey", "o_custkey").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 existence probe as a set-based left-semi join (reference does this
    row-at-a-time: strategy/match_stop_id.py:12 fetchone() per row)."""
    supplier = t(spark, sf_dir, "supplier")
    probes = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return supplier.join(probes, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q_upsert_stops",
    oracle="""
    WITH updates AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal + 10.0 AS s_acctbal
        FROM supplier WHERE s_suppkey % 2 = 0
    )
    SELECT * FROM updates
    UNION ALL
    SELECT b.* FROM supplier b
    WHERE b.s_suppkey NOT IN (SELECT s_suppkey FROM updates)
    """,
)
def q_upsert_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 set-based upsert: updated rows win, untouched base rows kept
    (reference strategy/match_stop_id.py:14-36 does per-row UPDATE-else-
    INSERT; Spark-first = anti-join + unionByName, SURVEY §1.3)."""
    from py_gtfs_duckdb_spark.operators.mutation import upsert

    base = t(spark, sf_dir, "supplier")
    updates = base.filter(F.col("s_suppkey") % 2 == 0).withColumn(
        "s_acctbal", F.col("s_acctbal") + F.lit(10.0)
    )
    return upsert(base, updates, ["s_suppkey"])


@query(
    "q_match_trip_candidates",
    oracle="""
    SELECT event_id, user_id, matched_trip_id FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey AS matched_trip_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate, o.o_orderkey
               ) AS rn
        FROM events e JOIN orders o ON o.o_custkey = e.user_id
    ) WHERE rn = 1
    """,
)
def q_match_trip_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 trip-candidate matching: a realtime record with no trip_id joins to
    nominal candidates on its natural key and takes the FIRST candidate in a
    deterministic order (reference adapter/gtfsrt.py:202-257 takes the first
    verified candidate in index-list order; index built realtime.py:242-260).
    Set-based: join + window row_number()==1 — SURVEY §7 hard part 6."""
    e = t(spark, sf_dir, "events")
    o = t(spark, sf_dir, "orders")
    joined = e.join(o, o.o_custkey == e.user_id).select(
        "event_id", "user_id", "o_orderdate", "o_orderkey"
    )
    # "first candidate in deterministic order" == min of the ordering tuple.
    # An algebraic min(struct) gets map-side partial aggregation — the
    # post-join shuffle carries one row per (event, partition) instead of
    # every candidate, where a window row_number would re-shuffle and sort
    # the full candidate list. (Struct comparison is field-order
    # lexicographic, so min(struct(date, key)) IS the row_number()==1 row;
    # o_orderkey is unique, so no ties.)
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("b"))
        .select(
            "event_id", "user_id", F.col("b.o_orderkey").alias("matched_trip_id")
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query("q_agg_distinct", oracle="SELECT DISTINCT o_custkey FROM orders")
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 DISTINCT (reference realtime.py:240 nominal trip-id index)."""
    return t(spark, sf_dir, "orders").select("o_custkey").distinct()


@query(
    "q_agg_collect_list",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
               AS stops_csv,
           COUNT(*) AS n_stops
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 group-by collect_list with explicit order (reference builds
    trip_id→[stop_id] dicts in a Python loop relying on insertion order,
    realtime.py:242-260; Spark makes the order explicit via sort_array —
    SURVEY §7 hard part 7). Serialized to CSV so the oracle hash is
    array-representation independent."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("stops_csv"),
            F.count(F.lit(1)).alias("n_stops"),
        )
    )


@query(
    "q_agg_collect_list_salted",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
               AS stops_csv,
           COUNT(*) AS n_stops
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_agg_collect_list_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 via the skew-safe two-phase salted aggregation
    (functions.salted_collect_list): identical result to
    q_agg_collect_list — same oracle — but a hot group key spreads over
    n_salt reducers in phase 1, the shape that survives a viral key at
    corpus scale. Holistic aggregates get no map-side combine, so salting
    is the only skew defense here (AQE skew splitting covers joins only)."""
    from py_gtfs_duckdb_spark.functions import salted_collect_list

    li = t(spark, sf_dir, "lineitem")
    return salted_collect_list(li, "l_orderkey", "l_linenumber").select(
        "l_orderkey",
        F.array_join(
            F.transform(F.col("l_linenumbers"), lambda x: x.cast("string")), ","
        ).alias("stops_csv"),
        F.size("l_linenumbers").cast("long").alias("n_stops"),
    )


@query(
    "q_agg_min",
    oracle="""
    SELECT o_custkey, MIN(o_orderdate) AS first_order
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 MIN per group (reference realtime.py:711-714: earliest
    active-period start per alert). Partial aggregation map-side, then one
    shuffle on the group key."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_order"))
    )


@query("q_agg_count", oracle="SELECT COUNT(*) AS cnt FROM lineitem")
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 COUNT(*) (reference csvddb.py:74)."""
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-agg (extension beyond reference's plain COUNT — scale
    building block for the dedup/cardinality suite)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@query(
    "q_agg_approx_distinct",
    oracle="SELECT COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS within_tol FROM lineitem",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct — the 100 TB-scale alternative to exact
    countDistinct (no second shuffle, bounded memory).

    The raw HLL estimate can't hash-match an exact oracle, so the declared
    result is self-attesting: ``within_tol`` asserts the estimate is within
    5% of the exact count (computed here only to make the check oracle-
    expressible; the operator under test is ``approx_count_distinct``).
    A drifting estimate flips the boolean and fails the hash compare.
    """
    agg = t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("n_exact"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("approx_parts") - F.col("n_exact"))
            / F.col("n_exact")
            <= F.lit(0.05)
        ).alias("within_tol"),
    )


# ---------------------------------------------------------------------------
# §2.5 set operations
# ---------------------------------------------------------------------------


@query(
    "q_set_union_except",
    oracle="""
    SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def q_set_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 the GTFS calendar-resolution set algebra (reference ddb.py:187:
    calendar_ids.union(added).except_(removed)). DuckDB relational ``union``
    is ALL and ``except_`` is set EXCEPT — the Spark composition that matches
    is union → distinct → subtract (SURVEY §7 hard part 5)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("id"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("id")
    )
    removed = c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("id"))
    return a.union(b).distinct().subtract(removed)


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "q_sort_multikey",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 multi-key global sort (reference ddb.py:202: ORDER BY trip_id,
    stop_sequence). Global orderBy = range-partitioned shuffle; applied only
    at the serving edge per SURVEY §4."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_sort_concat",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m%d') || '-' || o_orderpriority AS sort_key
    FROM orders ORDER BY sort_key, o_orderkey
    """,
)
def q_sort_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 sort by concatenated composite key (reference realtime.py:384:
    f"{start_date}-{start_time}" sort, issue #17)."""
    o = t(spark, sf_dir, "orders")
    key = F.concat_ws(
        "-", F.date_format("o_orderdate", "yyyyMMdd"), F.col("o_orderpriority")
    ).alias("sort_key")
    return o.select("o_orderkey", key).orderBy("sort_key", "o_orderkey")


@query(
    "q_sort_by_min_desc",
    oracle="""
    SELECT user_id, MIN(ts) AS first_seen FROM events
    GROUP BY user_id ORDER BY first_seen DESC, user_id
    """,
)
def q_sort_by_min_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 sort desc by per-group aggregated MIN (reference realtime.py:707-724
    sorts alerts by earliest active-period start desc, sentinel ≈ nulls
    last)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
        .orderBy(F.desc_nulls_last("first_seen"), "user_id")
    )


@query(
    "q_limit",
    oracle="""
    SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 10
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 a real LIMIT (the reference only caps display rows,
    __main__.py:104). Ordered on the unique key first so the selected subset
    is deterministic."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window — the scale-path form (single shuffle on
    the group key; no global sort). Extension beyond the reference's global
    sorts."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
