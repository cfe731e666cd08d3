"""Subquery shapes, unpivot, array functions, join-back aggregates, and
the window-function suite — the rest of the delegated SQL surface
(SURVEY.md §2.8: the reference's backends supported all of this; owning
its query layer means owning these too)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..sources.tables import load
from ..functions.rounding import round_half_up


def q41_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer's largest order) —
    planned as one window pass, not N subquery executions."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (orders
            .withColumn("cust_max", F.max("o_totalprice").over(w))
            .filter(F.col("o_totalprice") == F.col("cust_max"))
            .select("o_orderkey", "o_custkey", "o_totalprice"))


_Q41_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


def q42_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack: the pivot-status table back to
    (priority, status, n) rows."""
    orders = load(spark, sf_dir, "orders")
    wide = (orders.groupBy("o_orderpriority")
            .agg(F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
                 F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
                 F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending")))
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', n_open, 'F', n_finished, 'P', n_pending) AS (status, n)")


_Q42_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'O' AS status, n_open AS n FROM wide
UNION ALL SELECT o_orderpriority, 'F', n_finished FROM wide
UNION ALL SELECT o_orderpriority, 'P', n_pending FROM wide
"""


def q43_array_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions: per user, the sorted distinct
    event-type vocabulary and membership/cardinality over it.

    The array itself stays internal: the projection exposes only scalar
    derivations (`types_csv` is the lossless serialization) because the
    external correctness gate canonicalizes results with pandas, which
    can't hash list cells."""
    events = load(spark, sf_dir, "events")
    agg = (events.groupBy("user_id")
           .agg(F.array_sort(F.collect_set("event_type")).alias("types"),
                F.count("*").alias("n_events")))
    return agg.select(
        "user_id", "n_events",
        F.size("types").alias("n_types"),
        F.array_contains("types", "purchase").alias("has_purchase"),
        F.element_at("types", 1).alias("first_type"),
        F.concat_ws(",", "types").alias("types_csv"))


_Q43_SQL = """
WITH agg AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types,
         count(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(types) AS INT) AS n_types,
       list_contains(types, 'purchase') AS has_purchase,
       types[1] AS first_type,
       array_to_string(types, ',') AS types_csv
FROM agg
"""


def q44_joinback_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their group's average, via an
    aggregate-then-join-back (the scalable plan for correlated AVG).
    The average uses decimal-exact arithmetic so both engines draw the
    same below/above boundary."""
    li = load(spark, sf_dir, "lineitem")
    avg_q = (li.groupBy("l_partkey")
             .agg((F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                   / F.count("*")).alias("avg_qty")))
    small = (li.join(avg_q, "l_partkey")
             .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty")))
    return (small.groupBy("l_returnflag")
            .agg(F.count("*").alias("n_small"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                 .cast("double").alias("sum_price")))


_Q44_SQL = """
WITH a AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT l_returnflag, count(*) AS n_small,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem JOIN a USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
GROUP BY l_returnflag
"""


def q45_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/row_number/rank/percent_rank/ntile over one total-ordered
    per-type window (all functions share the sort — one shuffle)."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_id", "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(wv).alias("value_rank"),
        round_half_up(F.percent_rank().over(wv), 6).alias("value_pct_rank"),
        F.ntile(4).over(wv).alias("value_quartile"))


_Q45_SQL = """
SELECT event_id, event_type,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank() OVER wv AS INT) AS value_rank,
       floor(percent_rank() OVER wv * 1000000 + 0.5) / 1000000 AS value_pct_rank,
       CAST(ntile(4) OVER wv AS INT) AS value_quartile
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
       wv AS (PARTITION BY event_type ORDER BY value, event_id)
"""


QUERIES: dict[str, Query] = {
    "q41_correlated_max": Query(q41_correlated_max, _Q41_SQL),
    "q42_unpivot": Query(q42_unpivot, _Q42_SQL),
    "q43_array_aggregation": Query(q43_array_aggregation, _Q43_SQL),
    "q44_joinback_avg": Query(q44_joinback_avg, _Q44_SQL),
    "q45_window_suite": Query(q45_window_suite, _Q45_SQL),
}
