"""Event-stream analytics in batch form (SURVEY.md §2.9).

The reference's incremental load is a hand-rolled streaming pattern;
these queries express the native equivalents — gap-based
sessionization, funnels, sketches — as batch plans whose streaming
twins live in ``streaming/ingest.py`` (same logical shape, plus
watermarks/state). Tumbling-window aggregation lives in
``streaming_exec.q46``, which executes the streaming plan and
hash-matches it against the batch-SQL oracle — one vehicle proving
both the batch and streaming sides since r4's registry
consolidation (it was also q21 in batch form through r3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..sources.tables import load

SESSION_GAP_MIN = 30


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


def q65_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user count via the array-free two-phase
    plan (operators.skew.salted_distinct_count): phase 1 dedups on the
    (event_type, user_id) shuffle key — a hot type's distinct state
    spreads across the whole cluster, no per-task arrays — phase 2 is a
    map-side-combinable count. Identical answer to a direct
    COUNT(DISTINCT), which is the oracle. The few-hot-keys aggregation
    is where a single-shuffle COUNT(DISTINCT) puts one key's whole
    state on one task at 100 TB."""
    from ..operators.skew import salted_distinct_count
    events = load(spark, sf_dir, "events")
    # single-row-group testdata: spread before the compute-heavy agg
    events = events.repartition(
        spark.sparkContext.defaultParallelism, "event_id")
    return salted_distinct_count(
        events.select("event_type", "user_id"),
        ["event_type"], "user_id", factor=16)


_Q65_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


def q66_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean absolute deviation via the SALTED replicate join
    (operators.skew.salted_join): the skewed fact side salts on row
    content, the small dim side replicates across all salts, and the
    join shuffles the hot event_type over 8 partitions instead of one.
    The oracle is the plain join — salting must be result-invisible.

    Exactness: |value_i − mean| would divide decimals (engines disagree
    on result scale), so the deviation is computed as the integer
    |iv·n − s| with iv = value×10⁴ as BIGINT — exact in both engines;
    the only division is one final double op on the aggregate."""
    from ..operators.skew import salted_join
    from ..functions.rounding import round_half_up
    iv = (F.col("value").cast("decimal(18,4)") * 10_000).cast("long")
    events = (load(spark, sf_dir, "events")
              .select("event_id", "event_type", iv.alias("iv")))
    events = events.repartition(
        spark.sparkContext.defaultParallelism, "event_id")
    dim = (events.groupBy("event_type")
           .agg(F.count("*").alias("n"), F.sum("iv").alias("s")))
    joined = salted_join(events, dim, ["event_type"], ["event_id"], factor=8)
    dev = F.abs(F.col("iv").cast("decimal(38,0)") * F.col("n") - F.col("s"))
    agg = (joined.groupBy("event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(dev).alias("_dev"), F.min("n").alias("_n")))
    sum_abs_dev = (F.col("_dev").cast("double")
                   / (F.col("_n") * F.lit(10_000.0)))
    return agg.select(
        "event_type", "n_events",
        round_half_up(sum_abs_dev, 6).alias("sum_abs_dev"),
        round_half_up(sum_abs_dev / F.col("_n"), 6).alias("mad"))


_Q66_SQL = """
WITH iv AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS iv
  FROM events
),
dim AS (
  SELECT event_type, count(*) AS n, sum(iv) AS s FROM iv GROUP BY event_type
),
agg AS (
  SELECT e.event_type, count(*) AS n_events,
         sum(abs(CAST(e.iv AS DECIMAL(38,0)) * d.n - d.s)) AS dev,
         min(d.n) AS n
  FROM iv e JOIN dim d ON e.event_type = d.event_type
  GROUP BY e.event_type
)
SELECT event_type, n_events,
       floor((CAST(dev AS DOUBLE) / (n * 10000.0)) * 1000000 + 0.5) / 1000000 AS sum_abs_dev,
       floor((CAST(dev AS DOUBLE) / (n * 10000.0) / n) * 1000000 + 0.5) / 1000000 AS mad
FROM agg
"""


# --- q77: ordered funnel conversion --------------------------------------

def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts a stage
    only with an event at-or-after their entry into the previous stage
    (min-timestamp chaining — the classic funnel formulation).

    Scale shape: each stage is a map-side-combinable MIN aggregate on
    user_id; the stage joins are equi-joins between per-user aggregates
    (|users| rows, orders of magnitude below |events|), with the stage
    filters pushed into the event scans. One row out. Timestamp ties
    resolve identically in both engines because the comparison is
    ts >= prev_stage_ts on microsecond-exact values."""
    from ..functions.rounding import round_half_up
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") >= F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") >= F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_buy")))
    agg = (v.join(c, "user_id", "left").join(p, "user_id", "left")
           .agg(F.count("*").alias("n_view"),
                F.count("t_click").alias("n_click"),
                F.count("t_buy").alias("n_purchase")))
    rate = lambda num, den: F.when(  # noqa: E731
        den > 0, round_half_up(num.cast("double") / den, 6)).otherwise(0.0)
    return agg.select(
        "n_view", "n_click", "n_purchase",
        rate(F.col("n_click"), F.col("n_view")).alias("view_to_click"),
        rate(F.col("n_purchase"), F.col("n_click")).alias("click_to_purchase"),
        rate(F.col("n_purchase"), F.col("n_view")).alias("overall"))


_Q77_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts >= t_view GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(ts) AS t_buy
  FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts >= t_click GROUP BY e.user_id
),
agg AS (
  SELECT count(*) AS n_view, count(t_click) AS n_click,
         count(t_buy) AS n_purchase
  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT n_view, n_click, n_purchase,
       CASE WHEN n_view > 0 THEN floor(CAST(n_click AS DOUBLE) / n_view
            * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS view_to_click,
       CASE WHEN n_click > 0 THEN floor(CAST(n_purchase AS DOUBLE) / n_click
            * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS click_to_purchase,
       CASE WHEN n_view > 0 THEN floor(CAST(n_purchase AS DOUBLE) / n_view
            * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS overall
FROM agg
"""


# --- q80: sketch-based distinct (HLL) with a tolerance-certified oracle --

HLL_RSD = 0.02       # Spark HLL++ relative standard deviation
HLL_TOL = 0.10       # certified bound: |approx − exact| / exact ≤ 10%


def q80_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via HLL sketches —
    at 100 TB the sketch (constant-size partial state, map-side
    combinable, mergeable across partitions) replaces the exact
    distinct's (key, value) shuffle entirely.

    Cross-engine gate design: Spark's HLL++ and DuckDB's HLL are
    different sketches, so raw estimates can't hash-match. The query
    emits the exact count plus a BOOLEAN certifying the engine's own
    estimate is within 10% of it — both engines assert their own
    sketch's accuracy contract, and those booleans (true at any sane
    cardinality; HLL error here is ≤ a few %) hash-match exactly."""
    ev = load(spark, sf_dir, "events")
    est = F.approx_count_distinct("user_id", HLL_RSD)
    exact = F.countDistinct("user_id")
    agg = (ev.groupBy("event_type")
           .agg(exact.alias("n_exact"), est.alias("_apx")))
    # n_exact = 0 (all user_ids NULL in a group) would divide by zero:
    # Spark doubles give NaN, DuckDB gives NULL — guard in both engines
    # so the certification is vacuously true on the empty edge case.
    ok = F.when(
        F.col("n_exact") > 0,
        (F.abs(F.col("_apx").cast("double") - F.col("n_exact"))
         / F.col("n_exact")) <= HLL_TOL).otherwise(F.lit(True))
    return agg.select("event_type", "n_exact", ok.alias("within_tol"))


_Q80_SQL = f"""
SELECT event_type, count(DISTINCT user_id) AS n_exact,
       CASE WHEN count(DISTINCT user_id) > 0 THEN
         abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
             - count(DISTINCT user_id)) / count(DISTINCT user_id)
           <= {HLL_TOL}
       ELSE TRUE END AS within_tol
FROM events GROUP BY event_type
"""


#: portable-HLL sketch geometry: m = 2^8 registers addressed by the
#: hash's low byte; rho = trailing-zero rank within the next 24 bits.
PHLL_M = 256
PHLL_RHO_MAX = 25  # all-zero 24-bit suffix


def _phll_mix31(x):
    """31-bit xorshift-multiply avalanche (two rounds of the classic
    ``h ^= h>>16; h *= C`` finalizer, masked to 31 bits) — every step
    is overflow-safe signed-64 arithmetic (products < 2^58) and uses
    only operators BOTH engines define identically on non-negative
    longs (%, //-as-shift, xor), so the sketch is portable: Spark here
    and ANSI SQL in the oracle produce the SAME registers bit for bit.
    Built-in hashes can't do this (Spark xxhash64 vs DuckDB murmur)."""
    h = x % 2147483648
    h = ((h.bitwiseXOR(F.shiftright(h, 16))) % 2147483648) * 73244475 \
        % 2147483648
    h = ((h.bitwiseXOR(F.shiftright(h, 16))) % 2147483648) * 73244475 \
        % 2147483648
    return h.bitwiseXOR(F.shiftright(h, 16))


def phll_bucket_rho(x):
    """(register index, trailing-zero rank) for one value — the sketch
    ingestion step, shared by q155 and the property tests."""
    h = _phll_mix31(x)
    s = F.shiftright(h, 8) % 16777216
    t = s.bitwiseAND(-s)
    rho = (F.when(s == 0, F.lit(PHLL_RHO_MAX))
           .otherwise(F.round(F.log2(t.cast("double"))).cast("int") + 1))
    return (h % PHLL_M), rho


def q155_portable_hll_registers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog registers + sketch-union mergeability —
    what q80 deliberately cannot certify: q80 trusts each engine's
    OWN opaque sketch (estimates can't cross-match), so it proves an
    accuracy contract but nothing about the sketch STATE. This query
    builds the sketch from first principles as a DataFrame plan —
    hash each event_id with a portable 31-bit avalanche, route to
    ``m = 256`` registers by the low byte, rank by trailing zeros of
    the next 24 bits (an exact power of two, so ``log2`` is
    boundary-safe in both engines), register = MAX rank — and emits
    integer register checksums per event_type plus the '__merged__'
    row computed by REGISTER-WISE MAX across the groups. A green row
    is the certificate that (a) the distributed register build is
    bit-identical to the oracle's sequential one and (b) sketch union
    = pairwise max — the property that lets 1000 executors (or 30
    days of persisted per-partition sketches in the versioned store)
    merge in O(m) with NO rescan. Estimator accuracy (harmonic-mean
    estimate within tolerance of exact) is pinned in pytest, where a
    float formula belongs.

    Scale shape: one shuffle of (group, 256) partial-aggregated
    registers — constant-size map-side state per task, the entire
    point of sketches at 100 TB; the exact countDistinct alongside is
    the gate's reference and would be dropped in production."""
    ev = (load(spark, sf_dir, "events")
          .select("event_type", F.col("event_id").alias("x")))
    bucket, rho = phll_bucket_rho(F.col("x"))
    regs = (ev.select("event_type", bucket.alias("bucket"),
                      rho.alias("rho"))
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("rho")))

    def summarize(r, scope_col):
        return (r.groupBy(scope_col.alias("scope"))
                .agg(F.count(F.lit(1)).alias("n_registers"),
                     F.sum("rho").alias("rho_sum"),
                     F.sum((F.col("bucket") + 1) * F.col("rho"))
                     .alias("rho_dot")))

    per_group = summarize(regs, F.col("event_type"))
    merged = summarize(
        regs.groupBy("bucket").agg(F.max("rho").alias("rho")),
        F.lit("__merged__"))
    exact = (ev.groupBy(F.col("event_type").alias("scope"))
             .agg(F.countDistinct("x").alias("n_exact"))
             .unionByName(ev.agg(F.countDistinct("x").alias("n_exact"))
                          .select(F.lit("__merged__").alias("scope"),
                                  "n_exact")))
    return (per_group.unionByName(merged)
            .join(exact, "scope")
            .select("scope", "n_registers", "rho_sum", "rho_dot",
                    "n_exact"))


_Q155_SQL = f"""
WITH h0 AS (
  SELECT event_type, event_id AS x, event_id % 2147483648 AS h
  FROM events
),
h1 AS (SELECT event_type, x,
              ((xor(h, h // 65536) % 2147483648) * 73244475)
                % 2147483648 AS h FROM h0),
h2 AS (SELECT event_type, x,
              ((xor(h, h // 65536) % 2147483648) * 73244475)
                % 2147483648 AS h FROM h1),
h3 AS (SELECT event_type, x, xor(h, h // 65536) AS h FROM h2),
r AS (
  SELECT event_type, x, h % {PHLL_M} AS bucket,
         CASE WHEN ((h // 256) % 16777216) = 0 THEN {PHLL_RHO_MAX}
              ELSE CAST(round(log2(((h // 256) % 16777216)
                                   & -((h // 256) % 16777216))) AS INT) + 1
         END AS rho
  FROM h3
),
regs AS (
  SELECT event_type, bucket, max(rho) AS rho
  FROM r GROUP BY event_type, bucket
),
merged AS (SELECT bucket, max(rho) AS rho FROM regs GROUP BY bucket),
summaries AS (
  SELECT event_type AS scope,
         CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(rho) AS BIGINT) AS rho_sum,
         CAST(sum((bucket + 1) * rho) AS BIGINT) AS rho_dot
  FROM regs GROUP BY event_type
  UNION ALL
  SELECT '__merged__',
         CAST(count(*) AS BIGINT),
         CAST(sum(rho) AS BIGINT),
         CAST(sum((bucket + 1) * rho) AS BIGINT)
  FROM merged
),
exact AS (
  SELECT event_type AS scope,
         CAST(count(DISTINCT x) AS BIGINT) AS n_exact
  FROM h0 GROUP BY event_type
  UNION ALL
  SELECT '__merged__', CAST(count(DISTINCT x) AS BIGINT) FROM h0
)
SELECT s.scope, s.n_registers, s.rho_sum, s.rho_dot, e.n_exact
FROM summaries s JOIN exact e ON s.scope = e.scope
"""


#: KMV/theta sketch size: the K smallest distinct hash values
KMV_K = 256


def q156_portable_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE KMV (theta) sketch with SET ALGEBRA — the capability
    HLL (q155) structurally lacks: a KMV sketch is the K smallest
    distinct hash values of a set, and because it is a uniform SAMPLE
    of the set (below the theta threshold), sketches support
    INTERSECTION estimates — `|A∩B| ≈ (union samples in both) / K ×
    |A∪B|_est` — which registers cannot (HLL union is exact-shape,
    but intersection via inclusion-exclusion explodes the error).
    That is how a 100 TB profiler answers "how many users did BOTH"
    without a (key, set) shuffle.

    Two planted overlapping views of the event stream (A = even ids,
    B = ids divisible by 3, so A∩B = divisible-by-6) are sketched with
    the same portable 31-bit avalanche as q155 — a PERMUTATION of
    [0, 2^31), so distinct ids give distinct hashes and the K-smallest
    set is tie-free and engine-deterministic. The gated output carries
    per-scope (A, B, union) sketch state checksums — sample count,
    K-th smallest hash (the theta threshold), exact hash sum — plus,
    on the union row, how many union samples belong to both sets (the
    intersection numerator). A green row certifies the distributed
    sketch build AND the union-merge are bit-identical to the oracle's
    sequential one; estimator accuracy lives in pytest.

    Scale shape: each sketch is ``ORDER BY hash LIMIT K`` —
    TakeOrderedAndProject, i.e. per-partition top-K heaps merged on
    the driver, never a global sort; the union sketch merges the two
    K-row samples (2K rows), never the sets."""
    ev = (load(spark, sf_dir, "events")
          .select(F.col("event_id").alias("x")).distinct())
    h = _phll_mix31(F.col("x"))
    flagged = ev.select(h.alias("h"),
                        (F.col("x") % 2 == 0).alias("in_a"),
                        (F.col("x") % 3 == 0).alias("in_b"))

    def kmv(df):
        return df.orderBy("h").limit(KMV_K)

    a = kmv(flagged.filter("in_a"))
    b = kmv(flagged.filter("in_b"))
    un = kmv(flagged.filter("in_a OR in_b"))

    def summarize(df, scope, with_both):
        agg = [F.count(F.lit(1)).alias("n_kmv"),
               F.max("h").alias("kth_hash"),
               F.sum("h").alias("hash_sum"),
               (F.sum(F.when(F.col("in_a") & F.col("in_b"), 1)
                      .otherwise(0)) if with_both
                else F.lit(None).cast("long")).alias("n_in_both")]
        return df.agg(*agg).select(F.lit(scope).alias("scope"), "n_kmv",
                                   "kth_hash", "hash_sum", "n_in_both")

    exact = flagged.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("A"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).alias("B"),
        F.sum(F.when(F.col("in_a") | F.col("in_b"), 1)
              .otherwise(0)).alias("union"))
    exact_long = (exact.selectExpr(
        "stack(3, 'A', A, 'B', B, 'union', union) as (scope, n_exact)")
        .select("scope", F.col("n_exact").cast("long").alias("n_exact")))
    out = (summarize(a, "A", False)
           .unionByName(summarize(b, "B", False))
           .unionByName(summarize(un, "union", True)))
    return out.join(exact_long, "scope")


_Q156_SQL = f"""
WITH ids AS (SELECT DISTINCT event_id AS x FROM events),
h0 AS (SELECT x, x % 2147483648 AS h FROM ids),
h1 AS (SELECT x, ((xor(h, h // 65536) % 2147483648) * 73244475)
                   % 2147483648 AS h FROM h0),
h2 AS (SELECT x, ((xor(h, h // 65536) % 2147483648) * 73244475)
                   % 2147483648 AS h FROM h1),
flagged AS (
  SELECT xor(h, h // 65536) AS h, x % 2 = 0 AS in_a, x % 3 = 0 AS in_b
  FROM h2
),
a_kmv AS (SELECT * FROM flagged WHERE in_a ORDER BY h LIMIT {KMV_K}),
b_kmv AS (SELECT * FROM flagged WHERE in_b ORDER BY h LIMIT {KMV_K}),
u_kmv AS (SELECT * FROM flagged WHERE in_a OR in_b
          ORDER BY h LIMIT {KMV_K}),
summaries AS (
  SELECT 'A' AS scope, CAST(count(*) AS BIGINT) AS n_kmv,
         CAST(max(h) AS BIGINT) AS kth_hash,
         CAST(sum(h) AS BIGINT) AS hash_sum,
         CAST(NULL AS BIGINT) AS n_in_both
  FROM a_kmv
  UNION ALL
  SELECT 'B', CAST(count(*) AS BIGINT), CAST(max(h) AS BIGINT),
         CAST(sum(h) AS BIGINT), CAST(NULL AS BIGINT)
  FROM b_kmv
  UNION ALL
  SELECT 'union', CAST(count(*) AS BIGINT), CAST(max(h) AS BIGINT),
         CAST(sum(h) AS BIGINT),
         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
  FROM u_kmv
),
exact AS (
  SELECT 'A' AS scope, CAST(count(*) AS BIGINT) AS n_exact
  FROM flagged WHERE in_a
  UNION ALL
  SELECT 'B', CAST(count(*) AS BIGINT) FROM flagged WHERE in_b
  UNION ALL
  SELECT 'union', CAST(count(*) AS BIGINT)
  FROM flagged WHERE in_a OR in_b
)
SELECT s.scope, s.n_kmv, s.kth_hash, s.hash_sum, s.n_in_both, e.n_exact
FROM summaries s JOIN exact e ON s.scope = e.scope
"""


def q85_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week,
    counted in each later week they return, with the retention rate
    against the cohort size — the standard cohort-triangle analysis.

    Scale shape: events collapse to distinct (user, week) FIRST (map-
    side-combinable, |user-weeks| ≪ |events|), so every later join and
    aggregate runs on the user grain; the outer count needs no
    count-distinct because the input is already distinct; cohort sizes
    (≤ |weeks| rows) broadcast back. Both engines truncate weeks to
    Monday and the offset is exact integer day-arithmetic / 7."""
    from ..functions.rounding import round_half_up
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week"))
    user_weeks = ev.distinct()
    cohort = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    act = (user_weeks.join(cohort, "user_id")
           .select("cohort_week",
                   F.floor(F.datediff("week", "cohort_week") / 7)
                   .cast("long").alias("week_offset"))
           .groupBy("cohort_week", "week_offset")
           .agg(F.count("*").alias("n_active")))
    rate = F.col("n_active") / F.col("n_cohort")
    return (act.join(F.broadcast(sizes), "cohort_week")
            .withColumn("retention_rate", round_half_up(rate, 6))
            .select("cohort_week", "week_offset", "n_active", "n_cohort",
                    "retention_rate"))


_Q85_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
coh AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM coh GROUP BY cohort_week),
act AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
         count(*) AS n_active
  FROM uw JOIN coh USING (user_id)
  GROUP BY cohort_week, week_offset
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.n_cohort,
       floor(a.n_active / s.n_cohort * 1000000 + 0.5) / 1000000
         AS retention_rate
FROM act a JOIN sizes s USING (cohort_week)
"""


def q88_sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) time windows: 1-hour windows every 30
    minutes per event_type — the hopping-window aggregation q46's
    tumbling windows can't express (each event lands in length/slide =
    2 windows). Uses the native `window()` generator, so the identical
    groupBy works unchanged under Structured Streaming with a
    watermark.

    Scale shape: the row fanout is the constant length/slide factor
    applied map-side before one hash aggregate; the value sum is exact
    DECIMAL cast back to double (repo determinism convention)."""
    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    val = F.col("value").cast("decimal(18,4)")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(val).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


# each event belongs to exactly two 30-min-aligned hour windows: the one
# starting at its 30-min floor and the one 30 minutes earlier. The floor
# uses a floor-mod (((x % m) + m) % m), not plain %, because DuckDB's %
# rounds toward zero on negatives while Spark's window() floors toward
# -inf — plain % would desync the engines on any pre-1970 timestamp.
_Q88_SQL = """
WITH ev AS (
  SELECT event_type, value,
         epoch_us(ts)
           - ((epoch_us(ts) % 1800000000) + 1800000000) % 1800000000 AS s0_us
  FROM events
),
x AS (
  SELECT event_type, value,
         unnest([make_timestamp(s0_us), make_timestamp(s0_us - 1800000000)])
           AS window_start
  FROM ev
)
SELECT window_start, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM x GROUP BY window_start, event_type
"""


def q90_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (TimescaleDB's time_bucket_gapfill + locf, the op behind continuous
    bar charts over sparse feeds): build the complete hourly grid per
    event_type across the corpus time range, mark empty buckets with
    n_events = 0, and carry the last seen bucket average forward into
    the gaps.

    Scale shape: the heavy aggregate is map-side combinable on
    (type, hour); the grid is |types| x |hours| rows (thousands, not
    corpus-sized) built from a broadcast 1-row bounds aggregate; the
    LOCF window sorts only the tiny grid per type. Averages follow the
    repo determinism convention (exact DECIMAL sum / count, in double)."""
    from ..functions.rounding import round_half_up
    ev = load(spark, sf_dir, "events").select(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("h"),
        "value")
    act = (ev.groupBy("event_type", "h")
           .agg(F.count("*").alias("n_events"),
                (F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                 / F.count("*")).alias("avg_value")))
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = ev.select("event_type").distinct()
    grid = (types.crossJoin(F.broadcast(bounds))
            .select("event_type",
                    F.explode(F.expr(
                        "sequence(h0, h1, interval 1 hour)")).alias("h")))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    j = (grid.join(act, ["event_type", "h"], "left")
         .withColumn("n_events",
                     F.coalesce("n_events", F.lit(0).cast("long"))))
    return (j.withColumn("filled_avg",
                         round_half_up(F.last("avg_value", ignorenulls=True)
                                       .over(w), 6))
            .select("event_type", F.col("h").alias("bucket_start"),
                    "n_events", "filled_avg"))


_Q90_SQL = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events
),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
grid AS (
  SELECT t.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM b) gs
),
act AS (
  SELECT event_type, h, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
           AS avg_value
  FROM ev GROUP BY event_type, h
),
j AS (
  SELECT g.event_type, g.h, coalesce(a.n_events, 0) AS n_events, a.avg_value
  FROM grid g LEFT JOIN act a USING (event_type, h)
)
SELECT event_type, h AS bucket_start, n_events,
       floor(last_value(avg_value IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS UNBOUNDED PRECEDING) * 1000000 + 0.5) / 1000000
         AS filled_avg
FROM j
"""


RANGE_WINDOW_US = 10 * 60 * 1_000_000  # trailing 10 minutes


def q92_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval window frames (RANGE BETWEEN ... PRECEDING): for
    every event, the count and average value of the same user's events
    in the trailing 10 minutes. This is the frame mechanic row-count
    frames (q07/q36/q53-q55) cannot express — on an irregular series,
    "last N rows" and "last N minutes" are different answers, and the
    RANGE frame also pulls in ALL peers at an equal timestamp (both
    engines agree on peer semantics, making duplicate-ts rows
    deterministic with no tiebreak column).

    Scale shape: one shuffle partitioned by user_id (high cardinality
    — per-user series are short, so no giant sorted partition), then a
    single sliding frame pass; sums are exact DECIMAL."""
    from ..functions.rounding import round_half_up
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-RANGE_WINDOW_US, Window.currentRow))
    n = F.count("*").over(w)
    nv = F.count("value").over(w)
    s = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
    return ev.select(
        "event_id", "user_id",
        n.alias("n_in_window"),
        F.when(nv > 0, round_half_up(s / nv, 6)).alias("avg_value_10m"))


_Q92_SQL = f"""
SELECT event_id, user_id,
       count(*) OVER w AS n_in_window,
       CASE WHEN count(value) OVER w > 0 THEN
         floor(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               / count(value) OVER w * 1000000 + 0.5) / 1000000
       END AS avg_value_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {RANGE_WINDOW_US} PRECEDING AND CURRENT ROW)
"""


# --- q95: mergeable quantile sketch with a tolerance-certified oracle --

QSK_QS = (0.5, 0.9, 0.99)
QSK_ACCURACY = 10_000  # percentile_approx: rank error ≤ n/accuracy
QSK_TOL = 0.02         # certified rank-space bound (see docstring)


def q95_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles via a MERGEABLE sketch (Spark's
    ``percentile_approx``, a Greenwald-Khanna-style summary) — the
    single-pass scale path q39's exact ``percentile`` doesn't have: the
    exact operator materializes every group's values to interpolate,
    while the sketch is constant-size partial state, map-side
    combinable, and mergeable across partitions/shards/streams.

    Cross-engine gate design (q80's HLL pattern): Spark's GK summary
    and DuckDB's t-digest (``approx_quantile``) are different sketches,
    so raw estimates can't hash-match. The query emits the exact
    interpolated percentile (q39 proved that hash-matches) plus a
    BOOLEAN certifying the engine's own sketch in RANK space — the
    space sketch guarantees actually live in: with ``frac_le`` /
    ``frac_lt`` the fraction of values ≤ / < the estimate, the
    estimate is a valid q-quantile within tolerance iff
    ``frac_le ≥ q − tol`` and ``frac_lt ≤ q + tol``. (A value-space
    |apx − exact| bound would be wrong: heavy-tailed p99 gaps are
    unbounded even for a perfect sketch.) The verification pass is one
    broadcast of the tiny (group, q, estimate) table back over events
    with a map-side-combinable conditional count — |quantiles|-fold
    map fanout, ≤ |groups|·|quantiles| result cells, no extra shuffle
    of the data. tol = 0.02 covers the discrete-rank granularity 2/n
    at the smallest test groups (n = 200 at sf0.001) with margin; at
    scale the sketch errors (1e-4 GK, ~1e-3 t-digest) are far inside
    it.

    Reference parity note: the reference computes summary stats in
    PostgreSQL over full data; this is the operator a 100 TB engine
    must swap in when a sorted-full-scan percentile stops existing."""
    from ..functions.rounding import round_half_up
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    qlist = ",".join(map(str, QSK_QS))
    agg = (ev.groupBy("event_type")
           .agg(F.count("value").alias("n"),
                F.expr(f"percentile(value, array({qlist}))").alias("ex"),
                F.expr(f"percentile_approx(value, array({qlist}),"
                       f" {QSK_ACCURACY})").alias("ap")))
    # an all-NULL group returns NULL (not arrays) from both percentile
    # functions, and posexplode(NULL) would silently DROP the group while
    # the oracle's UNION-ALL pairs keep it — pin the 3-NULL array shape
    null_arr = "array(" + ", ".join(["CAST(NULL AS DOUBLE)"] * len(QSK_QS)) + ")"
    agg = agg.select("event_type", "n",
                     F.expr(f"coalesce(ex, {null_arr})").alias("ex"),
                     F.expr(f"coalesce(ap, {null_arr})").alias("ap"))
    qarr = F.array(*[F.lit(float(q)) for q in QSK_QS])
    pairs = (agg.select("event_type", "n",
                        F.posexplode(F.arrays_zip("ex", "ap"))
                        .alias("i", "z"))
             .select("event_type", "n",
                     F.element_at(qarr, F.col("i") + 1).alias("q"),
                     F.col("z.ex").alias("exact_raw"),
                     F.col("z.ap").alias("apx")))
    rk = (ev.join(F.broadcast(pairs), "event_type")
          .groupBy("event_type", "q", "n", "exact_raw", "apx")
          .agg(F.sum(F.when(F.col("value") <= F.col("apx"), 1)
                     .otherwise(0)).alias("n_le"),
               F.sum(F.when(F.col("value") < F.col("apx"), 1)
                     .otherwise(0)).alias("n_lt")))
    frac_le = F.col("n_le").cast("double") / F.col("n")
    frac_lt = F.col("n_lt").cast("double") / F.col("n")
    ok = F.when(F.col("n") > 0,
                (frac_le >= F.col("q") - QSK_TOL)
                & (frac_lt <= F.col("q") + QSK_TOL)).otherwise(F.lit(True))
    return rk.select("event_type", "q", "n",
                     round_half_up(F.col("exact_raw"), 6).alias("exact_v"),
                     ok.alias("within_tol"))


_Q95_SQL = f"""
WITH ev AS (SELECT event_type, value FROM events),
st AS (
  SELECT event_type, count(value) AS n,
         quantile_cont(value, 0.5) AS e1, approx_quantile(value, 0.5) AS a1,
         quantile_cont(value, 0.9) AS e2, approx_quantile(value, 0.9) AS a2,
         quantile_cont(value, 0.99) AS e3, approx_quantile(value, 0.99) AS a3
  FROM ev GROUP BY event_type
),
pairs AS (
  SELECT event_type, n, CAST(0.5 AS DOUBLE) AS q, e1 AS exact_raw, a1 AS apx FROM st
  UNION ALL SELECT event_type, n, CAST(0.9 AS DOUBLE), e2, a2 FROM st
  UNION ALL SELECT event_type, n, CAST(0.99 AS DOUBLE), e3, a3 FROM st
),
rk AS (
  SELECT p.event_type, p.q, p.n, p.exact_raw,
         sum(CASE WHEN e.value <= p.apx THEN 1 ELSE 0 END) AS n_le,
         sum(CASE WHEN e.value < p.apx THEN 1 ELSE 0 END) AS n_lt
  FROM pairs p JOIN ev e USING (event_type)
  GROUP BY p.event_type, p.q, p.n, p.exact_raw
)
SELECT event_type, q, CAST(n AS BIGINT) AS n,
       floor(exact_raw * 1000000 + 0.5) / 1000000 AS exact_v,
       CASE WHEN n > 0 THEN
         (CAST(n_le AS DOUBLE) / n >= q - {QSK_TOL})
         AND (CAST(n_lt AS DOUBLE) / n <= q + {QSK_TOL})
       ELSE TRUE END AS within_tol
FROM rk
"""


# --- q99: rolling z-score anomaly detection (exact integer algebra) ----

ZS_WINDOW = 50   # trailing rows per user
ZS_MIN_N = 20    # don't flag until the baseline has this many samples
ZS_Z2 = 9        # |z| > 3  ⇔  z² > 9
ZS_Q = 1_000_000  # micro-unit quantization of `value`


def q99_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral anomaly flags: an event is anomalous when its
    value sits more than 3 trailing standard deviations from the same
    user's last ``ZS_WINDOW`` events. The monitoring primitive every
    ingest pipeline runs beside the load (the reference eyeballs
    outliers in PostgreSQL after the fact; at 100 TB the flag must fall
    out of the same single pass that lands the data).

    Exact cross-engine algebra: z = (x−μ)/σ compares via
    ``(n·x − s)² > z₀²·(n·ss − s²)`` — multiply both sides by n²σ² and
    the test needs only the windowed count/sum/sum-of-squares. Values
    are micro-unit BIGINTs (``floor(value·1e6)``: both engines floor
    the same IEEE product), sums stay integer (Spark DECIMAL(38,0),
    DuckDB HUGEINT — both exact to 1e38 ≫ the ~1e22 worst case), so
    the boolean can never flip on a last-ulp division the way a
    floating z-score could.

    Scale shape: ONE shuffle partitioned by high-cardinality user_id,
    then a single sliding frame pass computing all three moments —
    no second scan, no self-join, no global ordering."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.floor(F.col("value") * ZS_Q).alias("q"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(ZS_WINDOW - 1), Window.currentRow))
    d38 = "decimal(38,0)"
    # count observed samples, not rows: a NULL value contributes no q,
    # and counting it would inflate n in the moment algebra
    n = F.count("q").over(w)
    s = F.sum("q").over(w)
    # cast BEFORE the multiply: q*q in BIGINT wraps past |value|~3038
    ss = F.sum(F.col("q").cast(d38) * F.col("q")).over(w)
    dev = (n * F.col("q") - s).cast(d38)          # fits long pre-cast
    lhs = dev * dev
    rhs = F.lit(ZS_Z2).cast(d38) * (n.cast(d38) * ss
                                    - s.cast(d38) * s.cast(d38))
    # coalesce keeps the flag two-valued: a NULL-valued event with a
    # full window would otherwise yield NULL (true AND NULL), and a
    # tri-state flag silently drops rows from NOT is_anomaly filters
    return (ev.select(
        "event_id", "user_id",
        n.alias("n_win"),
        F.coalesce((n >= ZS_MIN_N) & (lhs > rhs),
                   F.lit(False)).alias("is_anomaly")))


_Q99_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * {ZS_Q}) AS BIGINT) AS q
  FROM events
),
win AS (
  SELECT event_id, user_id, q,
         count(q) OVER w AS n,
         sum(q) OVER w AS s,
         sum(CAST(q AS HUGEINT) * q) OVER w AS ss
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZS_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, CAST(n AS BIGINT) AS n_win,
       coalesce(n >= {ZS_MIN_N}
        AND CAST(n * q - s AS HUGEINT) * CAST(n * q - s AS HUGEINT)
            > {ZS_Z2} * (CAST(n AS HUGEINT) * ss
                         - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)), FALSE)
         AS is_anomaly
FROM win
"""


# --- q105: histogram drift monitor (exact TVD between time slices) ------

DRIFT_BINS = 10
DRIFT_TVD_E6 = 50_000  # flag a type when TVD(early, late) > 5%


def q105_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the total-variation
    distance between the value distribution of the EARLY half of the
    stream and the LATE half — the pre-deploy check every ML feature
    pipeline runs (PSI is the industry habit; TVD carries the same
    signal with NO logarithm, so the statistic is exact integer
    arithmetic end to end and the drift flag can't flip on a last-ulp
    ln()). TVD = ½·Σ|p_i − q_i| over an equi-width histogram whose
    bins and time cutoff both derive from one global bounds row.

    Scale shape: pass 1 is a map-side min/max (4 scalars, broadcast
    back); pass 2 assigns (slice, bin) in pure map arithmetic and
    hash-aggregates into ≤ |types|·2·bins cells — the only shuffle
    carries those tiny partials. Everything after is algebra on the
    cell table. Exactness: values in micro-units, the midpoint test is
    2·t > t0+t1 (no halving round-off), bins are integer div, and the
    TVD in 1e-6 units is (Σ|c1·n2 − c2·n1|·1e6) div (2·n1·n2) — exact
    BIGINT in both engines."""
    # NULL values are excluded up front: binning NULL would land it in
    # the TOP bin (least(k-1, NULL) = k-1 in both engines), silently
    # reading NULL-rate drift as max-value drift — the monitor's
    # contract is drift of the OBSERVED value distribution
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type",
                  F.unix_micros("ts").alias("tus"),
                  F.floor(F.col("value") * 1_000_000).alias("q")))
    b = ev.agg(F.min("tus").alias("t0"), F.max("tus").alias("t1"),
               F.min("q").alias("q0"), F.max("q").alias("q1"))
    j = ev.crossJoin(F.broadcast(b))
    sl = F.when(F.lit(2) * F.col("tus") > F.col("t0") + F.col("t1"), 1) \
          .otherwise(0)
    bin_ = F.least(
        F.lit(DRIFT_BINS - 1),
        F.expr(f"((q - q0) * {DRIFT_BINS}) div (q1 - q0 + 1)")).alias("bin")
    cells = (j.select("event_type", sl.alias("sl"), bin_)
             .groupBy("event_type", "sl", "bin")
             .agg(F.count(F.lit(1)).alias("c")))
    early = F.sum(F.when(F.col("sl") == 0, F.col("c")).otherwise(0))
    late = F.sum(F.when(F.col("sl") == 1, F.col("c")).otherwise(0))
    tot = (cells.groupBy("event_type")
           .agg(early.alias("n_early"), late.alias("n_late")))
    pb = (cells.groupBy("event_type", "bin")
          .agg(early.alias("c1"), late.alias("c2")))
    dev = F.abs(F.col("c1") * F.col("n_late") - F.col("c2") * F.col("n_early"))
    agg = (pb.join(F.broadcast(tot), "event_type")
           .groupBy("event_type", "n_early", "n_late")
           .agg(F.sum(dev).alias("sdev")))
    # DECIMAL(38,0) before the 1e6 scale-up: sdev is bounded by
    # 2*n_early*n_late, so the BIGINT product would wrap past ~4.3M
    # events per half (the oracle runs the same width in HUGEINT)
    tvd = F.expr("(CAST(sdev AS DECIMAL(38,0)) * 1000000)"
                 " div (2 * CAST(n_early AS DECIMAL(38,0)) * n_late)")
    return agg.select(
        "event_type", "n_early", "n_late",
        F.when((F.col("n_early") > 0) & (F.col("n_late") > 0), tvd)
        .alias("tvd_e6"),
        F.coalesce(
            F.when((F.col("n_early") > 0) & (F.col("n_late") > 0),
                   tvd > DRIFT_TVD_E6), F.lit(False)).alias("drifted"))


_Q105_SQL = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) AS tus,
         CAST(floor(value * 1000000) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
),
b AS (SELECT min(tus) AS t0, max(tus) AS t1,
             min(q) AS q0, max(q) AS q1 FROM base),
a AS (
  SELECT event_type,
         CASE WHEN 2 * tus > t0 + t1 THEN 1 ELSE 0 END AS sl,
         least({DRIFT_BINS - 1}, ((q - q0) * {DRIFT_BINS}) // (q1 - q0 + 1))
           AS bin
  FROM base CROSS JOIN b
),
cells AS (
  SELECT event_type, sl, bin, count(*) AS c FROM a GROUP BY 1, 2, 3
),
tot AS (
  SELECT event_type,
         CAST(sum(CASE WHEN sl = 0 THEN c ELSE 0 END) AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN sl = 1 THEN c ELSE 0 END) AS BIGINT) AS n_late
  FROM cells GROUP BY 1
),
pb AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN sl = 0 THEN c ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN sl = 1 THEN c ELSE 0 END) AS BIGINT) AS c2
  FROM cells GROUP BY 1, 2
),
agg AS (
  SELECT p.event_type, n_early, n_late,
         CAST(sum(abs(c1 * n_late - c2 * n_early)) AS BIGINT) AS sdev
  FROM pb p JOIN tot t ON p.event_type = t.event_type
  GROUP BY 1, 2, 3
)
SELECT event_type, n_early, n_late,
       CASE WHEN n_early > 0 AND n_late > 0
            THEN CAST((CAST(sdev AS HUGEINT) * 1000000)
                      // (2 * CAST(n_early AS HUGEINT) * n_late) AS BIGINT)
       END AS tvd_e6,
       coalesce(CASE WHEN n_early > 0 AND n_late > 0
                     THEN (CAST(sdev AS HUGEINT) * 1000000)
                          // (2 * CAST(n_early AS HUGEINT) * n_late)
                          > {DRIFT_TVD_E6} END, FALSE) AS drifted
FROM agg
"""


QUERIES: dict[str, Query] = {
    "q22_sessionization": Query(q22_sessionization, _Q22_SQL),
    "q65_salted_distinct": Query(q65_salted_distinct, _Q65_SQL),
    "q66_salted_join": Query(q66_salted_join, _Q66_SQL),
    "q77_funnel": Query(q77_funnel, _Q77_SQL),
    "q80_hll_distinct": Query(q80_hll_distinct, _Q80_SQL),
    "q85_retention_cohorts": Query(q85_retention_cohorts, _Q85_SQL),
    "q88_sliding_window_stats": Query(q88_sliding_window_stats, _Q88_SQL),
    "q90_gapfill_locf": Query(q90_gapfill_locf, _Q90_SQL),
    "q92_time_range_window": Query(q92_time_range_window, _Q92_SQL),
    "q95_quantile_sketch": Query(q95_quantile_sketch, _Q95_SQL),
    "q99_anomaly_zscore": Query(q99_anomaly_zscore, _Q99_SQL),
    "q105_histogram_drift": Query(q105_histogram_drift, _Q105_SQL),
    "q155_portable_hll_registers": Query(q155_portable_hll_registers,
                                         _Q155_SQL),
    "q156_portable_kmv_theta": Query(q156_portable_kmv_theta, _Q156_SQL),
}
