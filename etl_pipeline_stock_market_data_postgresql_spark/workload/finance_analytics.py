"""Finance-flavored analytics over the event stream — the derived-value
capabilities a stock engine's users actually run (VWAP, realized
volatility, drawdown), plus the engine's pure-SQL surface (the
reference's read path is ad-hoc SQL, README_duckdb.md:74-92).

Variance is computed from decimal-exact power sums
(Σx, Σx² → (Σx² − (Σx)²/n)/(n−1)) rather than stddev_samp: engines
differ in accumulation algorithms (Welford vs power sums) and shuffle
order, while power sums in DECIMAL are bit-stable everywhere.

Partitioning note (q49/q50/q53–q55): every indicator windows over
``user_id`` — the per-series key, mirroring the reference's per-symbol
series. That holds at 100 TB as long as series count scales with data
(many users/symbols); tests/test_plans.py asserts the windows
hash-partition on user_id with no global sort. For the degenerate
shape — ONE symbol's full tick history through a sequential indicator —
no engine parallelizes a true recursive fold; the scale play is the
time-sliced variant used by q63's histogram trick and q35's bars:
pre-aggregate ticks into time buckets (bars) FIRST, then run the
indicator over the bounded per-bucket series (q36 runs SMA over q35's
bars exactly this way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..sources.tables import load, register_views
from ..functions.rounding import round_half_up


def q47_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape issued through the engine's SQL surface
    (spark.sql over registered views): EXISTS decorrelates to a
    semi-join."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
    """)


_Q47_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q48_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per user-day (value = price,
    event_id used as a deterministic stand-in for trade size)."""
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", F.date_trunc("day", "ts").alias("day_start"),
                  "value", (F.col("event_id") % 100 + 1).alias("size")))
    pv = (F.col("value") * F.col("size")).cast("decimal(24,8)")
    return (ev.groupBy("user_id", "day_start")
            .agg((F.sum(pv).cast("double")
                  / F.sum("size").cast("double")).alias("vwap"),
                 F.sum("size").cast("long").alias("total_size"),
                 F.count("*").alias("n_trades")))


_Q48_SQL = """
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       CAST(sum(CAST(value * (event_id % 100 + 1) AS DECIMAL(24,8))) AS DOUBLE)
         / CAST(sum(event_id % 100 + 1) AS DOUBLE) AS vwap,
       CAST(sum(event_id % 100 + 1) AS BIGINT) AS total_size,
       count(*) AS n_trades
FROM events WHERE event_type = 'purchase'
GROUP BY user_id, date_trunc('day', ts)
"""


def q49_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility per user: sample stddev of log returns of
    consecutive purchase values, via decimal-exact power sums."""
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase") & (F.col("value") > 0)))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("prev", F.lag("value").over(w)).filter(F.col("prev").isNotNull())
    lr = F.ln(F.col("value") / F.col("prev"))
    sums = (r.select("user_id", lr.alias("lr"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("lr").cast("decimal(28,14)")).cast("double").alias("s1"),
                 F.sum((F.col("lr") * F.col("lr")).cast("decimal(28,14)"))
                 .cast("double").alias("s2")))
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return (sums.filter(F.col("n") >= 2)
            .select("user_id", "n", round_half_up(F.sqrt(var), 8).alias("volatility")))


_Q49_SQL = """
WITH r AS (
  SELECT user_id, ln(value / lag(value) OVER w) AS lr
  FROM events WHERE event_type = 'purchase' AND value > 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sums AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(lr AS DECIMAL(28,14))) AS DOUBLE) AS s1,
         CAST(sum(CAST(lr * lr AS DECIMAL(28,14))) AS DOUBLE) AS s2
  FROM r WHERE lr IS NOT NULL GROUP BY user_id
)
SELECT user_id, n, floor(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 100000000 + 0.5) / 100000000 AS volatility
FROM sums WHERE n >= 2
"""


def q50_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and max drawdown per user: cumulative max window +
    min ratio — one sorted window pass."""
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase") & (F.col("value") > 0)))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_peak = ev.withColumn("peak", F.max("value").over(w))
    dd = F.col("value") / F.col("peak") - 1.0
    return (with_peak.groupBy("user_id")
            .agg(round_half_up(F.min(dd), 8).alias("max_drawdown"),
                 F.max("peak").alias("peak_value"),
                 F.count("*").alias("n_points")))


_Q50_SQL = """
WITH p AS (
  SELECT user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM events WHERE event_type = 'purchase' AND value > 0
)
SELECT user_id, floor(min(value / peak - 1.0) * 100000000 + 0.5) / 100000000 AS max_drawdown,
       max(peak) AS peak_value, count(*) AS n_points
FROM p GROUP BY user_id
"""


EMA_ALPHA = 0.2
EMA_WINDOW = 10
RSI_WINDOW = 14


def q53_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average over the trailing window: a decayed
    recursive fold, expressed as collect-ordered-frame + left fold —
    identical fold order in both engines (Spark ``aggregate`` == DuckDB
    ``list_reduce``), so results are bit-stable."""
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase") & (F.col("value") > 0)))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(EMA_WINDOW - 1), Window.currentRow))
    arr = F.collect_list("value").over(w)
    ema = F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, x: acc * (1 - EMA_ALPHA) + x * EMA_ALPHA)
    return (ev.select("user_id", "event_id", "ts",
                      round_half_up(ema, 6).alias(f"ema_{EMA_WINDOW}")))


_Q53_SQL = f"""
SELECT user_id, event_id, ts,
       floor(list_reduce(list(value) OVER w,
                         (acc, x) -> acc * {1 - EMA_ALPHA} + x * {EMA_ALPHA})
             * 1000000 + 0.5) / 1000000 AS ema_{EMA_WINDOW}
FROM events WHERE event_type = 'purchase' AND value > 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {EMA_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""


def q54_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (simple average form): conditional gain/
    loss window averages; all-gain periods pin to 100 in both engines."""
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase") & (F.col("value") > 0)))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    diff = F.col("value") - F.lag("value").over(wo)
    d = ev.withColumn("gain", F.when(diff > 0, diff).otherwise(F.lit(0.0))) \
          .withColumn("loss", F.when(diff < 0, -diff).otherwise(F.lit(0.0))) \
          .withColumn("has_prev", F.lag("value").over(wo).isNotNull())
    wf = wo.rowsBetween(-(RSI_WINDOW - 1), Window.currentRow)
    avg_gain = F.sum("gain").over(wf) / F.sum(F.when(F.col("has_prev"), 1).otherwise(0)).over(wf)
    avg_loss = F.sum("loss").over(wf) / F.sum(F.when(F.col("has_prev"), 1).otherwise(0)).over(wf)
    rsi = F.when(avg_loss == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + avg_gain / avg_loss))
    out = d.filter(F.col("has_prev"))
    return out.select("user_id", "event_id", "ts",
                      round_half_up(rsi, 6).alias("rsi"))


_Q54_SQL = f"""
WITH d AS (
  SELECT user_id, event_id, ts,
         CASE WHEN value - lag(value) OVER wo > 0
              THEN value - lag(value) OVER wo ELSE 0.0 END AS gain,
         CASE WHEN value - lag(value) OVER wo < 0
              THEN -(value - lag(value) OVER wo) ELSE 0.0 END AS loss,
         lag(value) OVER wo IS NOT NULL AS has_prev
  FROM events WHERE event_type = 'purchase' AND value > 0
  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts,
       floor((CASE WHEN sum(loss) OVER wf / sum(CASE WHEN has_prev THEN 1 ELSE 0 END) OVER wf = 0
                   THEN 100.0
                   ELSE 100.0 - 100.0 / (1.0 + (sum(gain) OVER wf / sum(CASE WHEN has_prev THEN 1 ELSE 0 END) OVER wf)
                                               / (sum(loss) OVER wf / sum(CASE WHEN has_prev THEN 1 ELSE 0 END) OVER wf))
              END) * 1000000 + 0.5) / 1000000 AS rsi
FROM d WHERE has_prev
WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {RSI_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""


def q55_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: windowed mean ± 2σ with the variance from
    windowed power sums (engine-stable; never stddev_samp)."""
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase") & (F.col("value") > 0)))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-9, Window.currentRow))
    # materialize the window power sums BEFORE filtering: a filter on a
    # window column re-scopes any window expressions computed after it
    p = ev.select(
        "user_id", "event_id", "ts",
        F.count("value").over(w).alias("n"),
        F.sum("value").over(w).alias("s1"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("s2"))
    mean = F.col("s1") / F.col("n")
    var = F.greatest(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1),
        F.lit(0.0))
    sd = F.sqrt(var)
    return (p.filter(F.col("n") >= 2)
            .select("user_id", "event_id", "ts",
                    round_half_up(mean, 6).alias("bb_mid"),
                    round_half_up(mean + 2 * sd, 6).alias("bb_upper"),
                    round_half_up(mean - 2 * sd, 6).alias("bb_lower")))


_Q55_SQL = """
WITH p AS (
  SELECT user_id, event_id, ts,
         count(value) OVER w AS n,
         sum(value) OVER w AS s1,
         sum(value * value) OVER w AS s2
  FROM events WHERE event_type = 'purchase' AND value > 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts,
       floor((s1 / n) * 1000000 + 0.5) / 1000000 AS bb_mid,
       floor((s1 / n + 2 * sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0))) * 1000000 + 0.5) / 1000000 AS bb_upper,
       floor((s1 / n - 2 * sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0))) * 1000000 + 0.5) / 1000000 AS bb_lower
FROM p WHERE n >= 2
"""


# --- q108: time-weighted average price (TWAP) -----------------------------


def q108_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP per user series: each observation weighted by how long it
    remained the latest price (lead-timestamp deltas) — the
    irregular-series companion to q48's VWAP, and the benchmark price
    every execution desk quotes. On an irregular feed a plain AVG
    over-weights bursts; TWAP is the integral of the price step
    function over time.

    Scale shape: ONE shuffle on the high-cardinality series key
    (user_id) serves both the lead() window and the final aggregate
    (Catalyst satisfies the aggregate's distribution from the window's
    exchange). Exactness: prices become 1e-4-unit BIGINTs, durations
    exact micros, and the weighted sum accumulates as DECIMAL(38,0) /
    HUGEINT (both exact ≫ worst case) — the only division is one final
    double op, rounded half-up. Duplicate-timestamp ticks get zero
    weight (dur 0), identically in both engines."""
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "event_id",
                  F.unix_micros("ts").alias("tus"),
                  (F.col("value").cast("decimal(18,4)") * 10_000)
                  .cast("long").alias("pv")))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seg = (ev.withColumn("dur", F.lead("tus").over(w) - F.col("tus"))
           .filter(F.col("dur").isNotNull()))
    wsum = (F.col("pv").cast("decimal(38,0)") * F.col("dur"))
    agg = (seg.groupBy("user_id")
           .agg(F.sum(wsum).alias("s_pvdur"),
                F.sum("dur").alias("span_us"),
                F.count(F.lit(1)).alias("n_intervals")))
    twap = (F.col("s_pvdur").cast("double")
            / (F.col("span_us").cast("double") * 10_000.0))
    return (agg.filter(F.col("span_us") > 0)
            .select("user_id", "n_intervals", "span_us",
                    round_half_up(twap, 6).alias("twap")))


_Q108_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pv
  FROM events WHERE event_type = 'purchase'
),
seg AS (
  SELECT user_id, pv,
         lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus
           AS dur
  FROM ev
),
agg AS (
  SELECT user_id,
         sum(CAST(pv AS HUGEINT) * dur) AS s_pvdur,
         CAST(sum(dur) AS BIGINT) AS span_us,
         count(*) AS n_intervals
  FROM seg WHERE dur IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_intervals, span_us,
       floor(CAST(s_pvdur AS DOUBLE) / (CAST(span_us AS DOUBLE) * 10000.0)
             * 1000000 + 0.5) / 1000000 AS twap
FROM agg WHERE span_us > 0
"""


QUERIES: dict[str, Query] = {
    "q47_sql_exists": Query(q47_sql_exists, _Q47_SQL),
    "q48_vwap": Query(q48_vwap, _Q48_SQL),
    "q49_volatility": Query(q49_volatility, _Q49_SQL),
    "q50_drawdown": Query(q50_drawdown, _Q50_SQL),
    "q53_ema": Query(q53_ema, _Q53_SQL),
    "q54_rsi": Query(q54_rsi, _Q54_SQL),
    "q55_bollinger": Query(q55_bollinger, _Q55_SQL),
    "q108_twap": Query(q108_twap, _Q108_SQL),
}
