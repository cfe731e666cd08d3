"""Event-stream analytics in batch form (SURVEY.md §2.9).

The reference's incremental load is a hand-rolled streaming pattern;
these queries express the native equivalents — tumbling-window
aggregation and gap-based sessionization — as batch plans whose
streaming twins live in ``streaming/ingest.py`` (same logical shape,
plus watermarks/state)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..sources.tables import load

SESSION_GAP_MIN = 30


def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event type (F.window == the streaming
    operator; batch and stream share this plan)."""
    events = load(spark, sf_dir, "events")
    return (events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events", "sum_value"))


_Q21_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q22_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min silence starts a new session.
    lag + cumulative-sum over one per-user window — single shuffle."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in exact integer microseconds — no float seconds, so both
    # engines split sessions at identical boundaries
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap_us.isNull(), 1)
        .when(gap_us > SESSION_GAP_MIN * 60 * 1_000_000, 1).otherwise(0))
    return (with_flag.groupBy("user_id")
            .agg(F.sum("new_session").alias("n_sessions"),
                 F.count("*").alias("n_events")))


_Q22_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN * 60 * 1_000_000} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM flagged GROUP BY user_id
"""


QUERIES: dict[str, Query] = {
    "q21_tumbling_window": Query(q21_tumbling_window, _Q21_SQL),
    "q22_sessionization": Query(q22_sessionization, _Q22_SQL),
}
