"""Flagship query — the reference's headline analytical path
(`fetch_nominal_operation_day_trips`, ddb.py:177-202) re-expressed on the
testdata role mapping as ONE Catalyst plan:

1. calendar resolution: (ids_a ∪ ids_b) \\ ids_removed  (U1, ddb.py:187)
2. semi-join the trips fact on the resolved id set      (P6 — the reference
   collects the ids and re-embeds them as an IN-list, a plan barrier;
   Spark keeps it declarative so the optimizer sees everything)
3. join stop_times pre-filtered to the first stop        (J1 + P7,
   ddb.py:199-202)
4. order by (trip_id, stop_sequence)                     (O1)

Scale shape: the only shuffles are the distinct/subtract on the small id
set (broadcast back for the semi-join) and the orders⋈lineitem join on
orderkey; dimension work never touches the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_gtfs_duckdb_spark.plans import query
from py_gtfs_duckdb_spark.plans._tables import t

FLAGSHIP_ORACLE = """
WITH active_ids AS (
    SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
)
SELECT o.o_orderkey AS trip_id, o.o_custkey AS service_id,
       o.o_orderdate AS trip_date, l.l_linenumber AS stop_sequence,
       l.l_quantity AS qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 1
WHERE o.o_custkey IN (SELECT id FROM active_ids)
ORDER BY trip_id, stop_sequence
"""


@query("q_flagship_nominal_trips", oracle=FLAGSHIP_ORACLE)
def q_flagship_nominal_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline analytical path (ddb.py:177-202,
    fetch_nominal_operation_day_trips) re-expressed as ONE Catalyst plan:
    calendar resolution (range+weekday scan OR exception-add) minus
    exception-removes via broadcast left-anti, then a semi-join into the
    trip/stop fact chain — no collect-and-isin plan barrier."""
    return flagship_plan(
        t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "lineitem"),
        t(spark, sf_dir, "customer"),
    )


def flagship_plan(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> DataFrame:
    """The flagship logical plan over caller-supplied frames — so the same
    plan runs against the raw parquet (the battery) OR the bucketed lake
    layout (tests/test_scale_helpers.py proves the fact⋈fact Exchange pair
    disappears when both facts are bucketed on the order key)."""
    # (ids_a UNION ids_b) == one OR-filtered scan + distinct: same set, one
    # fewer pass over the fact table. EXCEPT == left_anti against the
    # (distinct) left side, with the small removed set broadcast — saves
    # the two-sided shuffle subtract() would plan.
    removed = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("id")
    )
    active = (
        orders.filter(
            (F.col("o_orderstatus") == "O")
            | (F.col("o_orderpriority") == "1-URGENT")
        )
        .select(F.col("o_custkey").alias("id"))
        .distinct()
        .join(F.broadcast(removed), "id", "left_anti")
    )

    first_stops = lineitem.filter(F.col("l_linenumber") == 1)
    return (
        orders.join(
            F.broadcast(active.withColumnRenamed("id", "o_custkey")),
            "o_custkey",
            "left_semi",
        )
        .join(first_stops, first_stops.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderkey").alias("trip_id"),
            F.col("o_custkey").alias("service_id"),
            F.col("o_orderdate").alias("trip_date"),
            F.col("l_linenumber").alias("stop_sequence"),
            F.col("l_quantity").alias("qty"),
        )
        .orderBy("trip_id", "stop_sequence")
    )
