"""Reference-parity queries (SURVEY.md §2) mapped onto the driver
testdata. Each query exercises one operator family the reference uses,
re-keyed from (company_symbol, time) to the events table's
(user_id, ts) — same shapes, same semantics.

q01 O1  order-by desc + limit (the repo's only documented analytical query)
q02 A1  grouped MAX watermark read
q03 F2  incremental strictly-newer-than-watermark filter
q04 J1  left-anti set difference (new keys in late batch)
q05 J2  left-semi FK membership
q06 K3  idempotent conflict-ignoring merge (dedup + anti-join + union)
q07 A4  trailing-N moving average (native SMA)
q08 P5  multi-format timestamp parse incl. the HH:mm case
q09 P2/P3 decimal casts + exact aggregation
q10 P7/S3 permissive try_cast quarantine counting + JSON extraction
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import Query
from ..functions.indicators import sma
from ..functions.timeparse import parse_timestamp_multi
from ..operators import upsert
from ..sources.tables import load
from ..functions.rounding import round_half_up

CUTOFF = "2024-01-20"   # early/late split of the events timeline
OVERLAP = "2024-01-15"  # re-fetch window start (duplicates vs target)


def q01_topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY time DESC LIMIT 10 with an equality predicate — the shape
    of the reference's one documented query (README_duckdb.md:78-84).
    Catalyst plans TakeOrderedAndProject: no full sort, no full shuffle."""
    events = load(spark, sf_dir, "events")
    return (events.filter(F.col("event_type") == "click")
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .select("event_id", "ts", "user_id", "value")
            .limit(10))


_Q01_SQL = """
SELECT event_id, ts, user_id, value FROM events
WHERE event_type = 'click'
ORDER BY ts DESC, event_id DESC LIMIT 10
"""


def q02_watermark_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped high-water-mark read: one pass over all keys instead of
    the reference's N point queries (check_last_date, main_parallel.py:206-218)."""
    events = load(spark, sf_dir, "events")
    return upsert.read_watermarks(events, ["user_id"], "ts")


_Q02_SQL = """
SELECT user_id, max(ts) AS high_water_mark FROM events GROUP BY user_id
"""


def q03_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-newer-than-watermark incremental filter (F2): a full
    re-fetch against watermarks from the early period keeps only rows a
    prior load wouldn't have stored."""
    events = load(spark, sf_dir, "events")
    early = events.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))
    wm = upsert.read_watermarks(early, ["user_id"], "ts")
    kept = upsert.filter_newer_than_watermark(events, wm, ["user_id"], "ts")
    return kept.select("event_id", "user_id", "ts")


_Q03_SQL = f"""
WITH wm AS (
  SELECT user_id, max(ts) AS hwm FROM events
  WHERE ts < TIMESTAMP '{CUTOFF}' GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.ts
FROM events e LEFT JOIN wm ON e.user_id = wm.user_id
WHERE wm.hwm IS NULL OR e.ts > wm.hwm
"""


def q04_antijoin_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti set difference (J1): (user, event_type) combinations
    first seen in the late period."""
    events = load(spark, sf_dir, "events")
    late = (events.filter(F.col("ts") >= F.lit(CUTOFF).cast("timestamp"))
            .select("user_id", "event_type").distinct())
    early = (events.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))
             .select("user_id", "event_type").distinct())
    return late.join(early, ["user_id", "event_type"], "left_anti")


_Q04_SQL = f"""
SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
EXCEPT
SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
"""


def q05_semijoin_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi membership (J2 FK containment): customers that have at
    least one order."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (customer.join(orders.select("o_custkey"),
                          customer.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment"))


_Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q06_idempotent_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict-ignoring merge (K3): target holds the early period, the
    batch re-fetches an overlapping window; PK-duplicate rows are ignored,
    and the merged table aggregates identically to a plain full scan of
    distinct keys. Exercises operators.upsert end-to-end."""
    events = load(spark, sf_dir, "events")
    target = events.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp"))
    batch = events.filter(F.col("ts") >= F.lit(OVERLAP).cast("timestamp"))
    # event_id functionally determines ts in this table (one immutable
    # event per id), which is what makes the time-range prune sound here
    delta = upsert.idempotent_append(batch, target, ["event_id"], time_col="ts",
                                     time_determined_by_pk=True)
    merged = target.unionByName(delta)
    return (merged.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value")))


_Q06_SQL = f"""
WITH target AS (SELECT * FROM events WHERE ts < TIMESTAMP '{CUTOFF}'),
batch AS (SELECT * FROM events WHERE ts >= TIMESTAMP '{OVERLAP}'),
delta AS (
  SELECT * FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.event_id = b.event_id)
),
merged AS (SELECT * FROM target UNION ALL SELECT * FROM delta)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM merged GROUP BY event_type
"""


def q07_sma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native trailing-5 moving average per user over purchase values
    (A4) — the analytic the reference outsources to its API."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    out = sma(purchases, "value", "user_id", "ts", n=5,
              out_col="sma_5", tiebreak_cols=["event_id"])
    return out.select("user_id", "event_id", "ts",
                      round_half_up(F.col("sma_5"), 4).alias("sma_5"))


_Q07_SQL = """
SELECT user_id, event_id, ts,
       floor((CASE WHEN count(*) OVER w >= 5 THEN avg(value) OVER w END) * 10000 + 0.5) / 10000 AS sma_5
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q08_multiformat_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format timestamp round-trip (P5): format each ts into one of
    the three observed feed formats (incl. the 'HH:mm' one the reference
    cannot parse) and parse it back NULL-safely."""
    events = load(spark, sf_dir, "events")
    mod = F.col("event_id") % 3
    ts_str = (F.when(mod == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
              .when(mod == 1, F.date_format("ts", "yyyy-MM-dd HH:mm"))
              .otherwise(F.date_format("ts", "yyyy-MM-dd")))
    return (events.select("event_id", ts_str.alias("ts_str"))
            .withColumn("parsed_ts", parse_timestamp_multi(F.col("ts_str"))))


# The parse-back deliberately avoids try_strptime: DuckDB 1.0.0's
# strptime scanner over-reads its input buffer, which segfaults the
# whole process when a prior allocation-heavy query sequence lands a
# ts_str at a page boundary (reproduced 3/4 runs of the r12 oracle
# window; q08 solo never crashes — the over-read usually hits readable
# memory). The native TIMESTAMP cast parses the full and date-only
# formats; the seconds-less middle format (length 16) is normalized by
# appending ':00' — bit-identical to Spark's multi-format
# try_to_timestamp fallback (seconds default to 0). The regexp guard
# pins the oracle's ACCEPTED GRAMMAR to exactly the three shapes the
# Spark side parses: a bare TRY_CAST also admits ISO 'T' separators,
# fractional seconds, and timezone offsets, which Spark's three-format
# fallback rejects — equivalent on the generated fixture, but a latent
# divergence if ts_str shapes ever widen (the r13 advice finding).
_Q08_SQL = """
WITH s AS (
  SELECT event_id,
         CASE event_id % 3
           WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
           WHEN 1 THEN strftime(ts, '%Y-%m-%d %H:%M')
           ELSE strftime(ts, '%Y-%m-%d') END AS ts_str
  FROM events
)
SELECT event_id, ts_str,
       CASE WHEN regexp_matches(ts_str,
              '^[0-9]{4}-[0-9]{2}-[0-9]{2}( [0-9]{2}:[0-9]{2}(:[0-9]{2})?)?$')
            THEN TRY_CAST(CASE WHEN length(ts_str) = 16 THEN ts_str || ':00'
                               ELSE ts_str END AS TIMESTAMP)
            END AS parsed_ts
FROM s
"""


def q09_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(15,4) cast path + exact aggregation (P2/P3, §1.2): sums in
    decimal (order-independent), averages as decimal-sum over count."""
    events = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(15,4)")
    return (events.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(dec).cast("double").alias("sum_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"),
                 (F.sum(dec).cast("double") / F.count("*")).alias("avg_value")))


_Q09_SQL = """
SELECT event_type, count(*) AS n_rows,
       CAST(sum(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS sum_value,
       min(value) AS min_value, max(value) AS max_value,
       CAST(sum(CAST(value AS DECIMAL(15,4))) AS DOUBLE) / count(*) AS avg_value
FROM events GROUP BY event_type
"""


def q10_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive-cast quarantine accounting (P7) + JSON field extraction
    (the source-side semi-structured access, S2): rows with a corrupted
    numeric string cast to NULL and are counted, never dropped silently."""
    events = load(spark, sf_dir, "events")
    dirty = (F.when(F.col("event_id") % 10 == 0,
                    F.concat(F.lit("x"), F.col("event_id").cast("string")))
             .otherwise(F.col("event_id").cast("string")))
    parsed = events.select(
        "event_type",
        dirty.try_cast("long").alias("parsed_id"),
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )
    return (parsed.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.count("parsed_id").alias("n_good"),
                 F.sum(F.when(F.col("parsed_id").isNull(), 1).otherwise(0)).alias("n_quarantined"),
                 F.sum("k").alias("k_sum")))


_Q10_SQL = """
WITH p AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN event_id % 10 = 0
                       THEN 'x' || CAST(event_id AS VARCHAR)
                       ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed_id,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*) AS n_rows, count(parsed_id) AS n_good,
       CAST(sum(CASE WHEN parsed_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
       CAST(sum(k) AS BIGINT) AS k_sum
FROM p GROUP BY event_type
"""


QUERIES: dict[str, Query] = {
    "q01_topk_latest": Query(q01_topk_latest, _Q01_SQL),
    "q02_watermark_read": Query(q02_watermark_read, _Q02_SQL),
    "q03_incremental_filter": Query(q03_incremental_filter, _Q03_SQL),
    "q04_antijoin_new_keys": Query(q04_antijoin_new_keys, _Q04_SQL),
    "q05_semijoin_members": Query(q05_semijoin_members, _Q05_SQL),
    "q06_idempotent_merge": Query(q06_idempotent_merge, _Q06_SQL),
    "q07_sma_trailing": Query(q07_sma_trailing, _Q07_SQL),
    "q08_multiformat_parse": Query(q08_multiformat_parse, _Q08_SQL),
    "q09_decimal_agg": Query(q09_decimal_agg, _Q09_SQL),
    "q10_quarantine_counts": Query(q10_quarantine_counts, _Q10_SQL),
}
