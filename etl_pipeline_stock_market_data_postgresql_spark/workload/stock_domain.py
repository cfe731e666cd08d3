"""Stock-domain derived-table queries: the reference's data model
(OHLCV bars + SMA indicators, SURVEY.md §1) reproduced end-to-end from
a raw event stream — bars are *derived* (the reference can only ingest
pre-aggregated bars) and the SMA is computed natively over them
(the reference can only fetch SMA values from its API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..functions.indicators import sma
from ..sources.tables import load
from ..functions.rounding import round_half_up

_BARS_SQL_CTE = """
b AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, value,
         first_value(value) OVER w AS open_v,
         last_value(value) OVER (
           PARTITION BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
               ORDER BY ts, event_id)
),
bars AS (
  SELECT user_id, day_start,
         min(open_v) AS open_value, max(value) AS high_value,
         min(value) AS low_value, min(close_v) AS close_value,
         count(*) AS volume
  FROM b GROUP BY user_id, day_start
)
"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", F.date_trunc("day", "ts").alias("day_start"),
                  "value", "ts", "event_id"))
    w = Window.partitionBy("user_id", "day_start").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    with_ends = (ev.withColumn("open_v", F.first("value").over(w))
                 .withColumn("close_v", F.last("value").over(w_full)))
    return (with_ends.groupBy("user_id", "day_start")
            .agg(F.min("open_v").alias("open_value"),
                 F.max("value").alias("high_value"),
                 F.min("value").alias("low_value"),
                 F.min("close_v").alias("close_value"),
                 F.count("*").alias("volume")))


def q36_sma_over_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLCV bars derived from raw events — the
    daily_stock_prices grain (symbol→user_id, date→day_start) built by
    the engine instead of fetched pre-aggregated — with the native
    trailing-3 SMA over the derived closes in the same result (the
    sma_indicators table computed, not fetched; SURVEY.md §2.5 A4,
    N=10@daily analog). One vehicle proves both the bar derivation
    (every OHLCV column is in the output) and the indicator over it
    (the bars-only view was q35 until r4's registry consolidation)."""
    bars = _bars(spark, sf_dir)
    out = sma(bars, "close_value", "user_id", "day_start", n=3, out_col="sma_3")
    return out.select("user_id", "day_start", "open_value", "high_value",
                      "low_value", "close_value", "volume",
                      round_half_up(F.col("sma_3"), 4).alias("sma_3"))


_Q36_SQL = f"""
WITH {_BARS_SQL_CTE}
SELECT user_id, day_start, open_value, high_value, low_value, close_value,
       volume,
       floor((CASE WHEN count(*) OVER w2 >= 3
                  THEN avg(close_value) OVER w2 END) * 10000 + 0.5) / 10000 AS sma_3
FROM bars
WINDOW w2 AS (PARTITION BY user_id ORDER BY day_start
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


QUERIES: dict[str, Query] = {
    "q36_sma_over_bars": Query(q36_sma_over_bars, _Q36_SQL),
}
