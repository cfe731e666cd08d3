"""Scale-pattern operators a large training-data pipeline needs beyond
plain SQL (round-2 coverage growth): band-bucketed range join,
hierarchical rollup re-aggregation, deterministic stratified split,
per-stratum hash sampling, and exact distributed centroid statistics.

Each query demonstrates a 100 TB-shaped plan at test scale and carries
an exact DuckDB oracle. Determinism follows the workload-wide rules
(module docstring in ``workload/__init__``); the centroid query pushes
them further: float sums are done in *integer space* (values scaled by
10^9 and floored to BIGINT) so the distributed aggregation is exact and
shuffle-order-independent in both engines with no decimal-cast tie
hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import Query
from ..functions import textstats
from ..functions.hashing import hash32, hash32_sql
from ..functions.rounding import round_half_up, round_half_up_sql
from ..sources.tables import load

# --- q56: range join via band buckets -----------------------------------

RANGE_GAP_US = 60_000_000  # pair events within ±60 s


def q56_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of same-type events within 60 s of each other — a range
    join with NO useful equi-key beyond the type.

    Scale path: band bucketing. Both sides key on (type, 60 s bucket);
    one side explodes to its bucket ±1 (3× fanout on one side only), the
    join is a plain equi-join, and the exact |Δts| predicate filters the
    band. Shuffle ∝ events, worst key ∝ hottest (type, minute) — never
    the quadratic per-type cross product a naive theta-join would run.
    Each qualifying pair surfaces exactly once (the right side keeps its
    single true bucket). Note the OUTPUT itself is quadratic in event
    DENSITY by definition (pairs within a fixed 60 s window), so a
    probe that multiplies density in a fixed time range (BENCH.md
    round-8 sweep: 46.9s at 100x) measures output growth, not a plan
    defect — shuffle stays ∝ events + output."""
    ev = (load(spark, sf_dir, "events")
          .select("event_id", "event_type",
                  F.unix_micros("ts").alias("us")))
    # testdata parquet is a single row-group: without this both join
    # inputs (and the 3× explode) would compute on one core
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "event_id")
    bucket = F.floor(F.col("us") / RANGE_GAP_US)
    a = ev.select(
        F.col("event_type"), F.col("event_id").alias("id_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bucket"))
    b = ev.select(
        F.col("event_type"), F.col("event_id").alias("id_b"),
        F.col("us").alias("us_b"), bucket.alias("bucket"))
    pairs = (a.join(b, ["event_type", "bucket"])
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.abs(F.col("us_a") - F.col("us_b")) <= RANGE_GAP_US)))
    gap = F.abs(F.col("us_a") - F.col("us_b"))
    return (pairs.groupBy("event_type")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(gap).alias("sum_gap_us"))
            .withColumn("avg_gap_us",
                        round_half_up(F.col("sum_gap_us") / F.col("n_pairs"), 6)))


_Q56_SQL = f"""
WITH pairs AS (
  SELECT a.event_type, abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap
  FROM events a JOIN events b
    ON a.event_type = b.event_type
   AND a.event_id < b.event_id
   AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_GAP_US}
)
SELECT event_type, count(*) AS n_pairs,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       {round_half_up_sql('CAST(sum(gap) AS DOUBLE) / count(*)', 6)} AS avg_gap_us
FROM pairs GROUP BY event_type
"""


# --- q57: hierarchical rollup (continuous-aggregate shape) ---------------

def q57_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day rollup where the DAY level re-aggregates the HOURLY
    aggregate, not the raw table — the hypertable/continuous-aggregate
    pattern: at 100 TB the daily pass reads |hours| rows, not |events|.
    Decimal partial sums make the re-aggregation exact."""
    events = load(spark, sf_dir, "events")
    hourly = (events.groupBy(F.date_trunc("hour", "ts").alias("bucket_start"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(F.col("value").cast("decimal(18,4)")).alias("_s")))
    # cache the fine level: it feeds both output branches
    hourly = hourly.persist()
    daily = (hourly.groupBy(F.date_trunc("day", "bucket_start").alias("bucket_start"))
             .agg(F.sum("n_events").alias("n_events"),
                  F.sum("_s").alias("_s")))
    out_cols = ["level", "bucket_start", "n_events",
                F.col("_s").cast("double").alias("sum_value")]
    return (hourly.withColumn("level", F.lit("hour")).select(*out_cols)
            .unionByName(daily.withColumn("level", F.lit("day")).select(*out_cols)))


_Q57_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_start, count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,4))) AS s
  FROM events GROUP BY 1
)
SELECT 'hour' AS level, bucket_start, n_events, CAST(s AS DOUBLE) AS sum_value
FROM hourly
UNION ALL
SELECT 'day', date_trunc('day', bucket_start), CAST(sum(n_events) AS BIGINT),
       CAST(sum(s) AS DOUBLE)
FROM hourly GROUP BY 2
"""


# --- q58: deterministic stratified split ---------------------------------

SPLIT_SEED = "split:"  # hash domain separator


def _split_hash(id_col) -> "F.Column":
    return hash32(F.concat(F.lit(SPLIT_SEED), id_col.cast("string")))


def q58_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 80/10/10 train/val/test assignment per doc —
    content-addressed (stable under reshuffles, reruns, and corpus
    growth; no rand(), no global sort) — with per-(lang, split) stats.
    This is how a 100 TB corpus gets split: a pure map, no coordination."""
    docs = load(spark, sf_dir, "documents")
    split_id = _split_hash(F.col("doc_id")) % 10
    name = (F.when(split_id < 8, "train")
            .when(split_id == 8, "val").otherwise("test"))
    return (docs.withColumn("split", name)
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id"))
            .withColumn("avg_chars",
                        round_half_up(F.col("sum_chars") / F.col("n_docs"), 6)))


_Q58_SQL = f"""
WITH assigned AS (
  SELECT lang, doc_id, n_chars,
         CASE WHEN {hash32_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 < 8 THEN 'train'
              WHEN {hash32_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       {round_half_up_sql('CAST(sum(n_chars) AS DOUBLE) / count(*)', 6)} AS avg_chars
FROM assigned GROUP BY lang, split
"""


# --- q59: per-stratum deterministic sample -------------------------------

SAMPLE_K = 5
SAMPLE_SEED = "sample:"


def q59_stratum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-stratum sample without replacement: order each
    stratum by a content hash and keep the first k. Equivalent to a
    random draw (the hash is uniform) but reproducible and distributed —
    a per-stratum top-k (partial per partition, merged), never a global
    sort. doc_id tiebreak keeps it total-ordered."""
    docs = load(spark, sf_dir, "documents")
    h = hash32(F.concat(F.lit(SAMPLE_SEED), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (docs.select("lang", "doc_id", h.alias("sort_hash"))
            .withColumn("sample_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("sample_rank") <= SAMPLE_K))


_Q59_SQL = f"""
SELECT * FROM (
  SELECT lang, doc_id,
         {hash32_sql("'sample:' || CAST(doc_id AS VARCHAR)")} AS sort_hash,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY {hash32_sql("'sample:' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS INT) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_K}
"""


# --- q60: exact distributed centroid statistics --------------------------

_NORM_SCALE = 1_000_000        # per-vector norms quantized to 1e-6
_ELEM_SCALE = 1_000_000_000    # elements quantized to 1e-9


def q60_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics: mean vector norm and the norm of
    the centroid — the monitoring stage of an embedding pipeline.

    Exactness at scale: doubles summed across a shuffle are
    order-dependent in the low bits. Both aggregations therefore run in
    integer space — values scaled (1e6 for norms, 1e9 for elements) and
    floored to BIGINT, summed exactly, descaled once at the end. The
    squared pos-sums go through DECIMAL(38,0) (≈1e26 < 10^38, exact).
    No decimal-cast-of-double anywhere, so no cross-engine tie hazard.
    The per-row norm fold is left-to-right in both engines
    (``F.aggregate`` / ``list_sum``), bit-identical by construction."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))
    inorm = F.floor(norm * _NORM_SCALE + F.lit(0.5))
    norms = (emb.select("label", inorm.alias("inorm"))
             .groupBy("label")
             .agg(F.count("*").alias("n_vecs"),
                  F.sum("inorm").alias("s_inorm")))

    elem = emb.select("label", F.posexplode(vec).alias("pos", "v"))
    ielem = F.floor(F.col("v") * _ELEM_SCALE + F.lit(0.5))
    pos_sums = (elem.groupBy("label", "pos")
                .agg(F.sum(ielem).alias("s")))
    sq = F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    cent = (pos_sums.groupBy("label")
            .agg(F.sum(sq).alias("ssq")))

    joined = norms.join(cent, "label")
    avg_norm = F.col("s_inorm") / (F.col("n_vecs") * F.lit(float(_NORM_SCALE)))
    cent_norm = (F.sqrt(F.col("ssq").cast("double"))
                 / (F.col("n_vecs") * F.lit(float(_ELEM_SCALE))))
    return joined.select(
        "label", "n_vecs",
        round_half_up(avg_norm, 6).alias("avg_norm"),
        round_half_up(cent_norm, 6).alias("centroid_norm"))


_Q60_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
norms AS (
  SELECT label,
         CAST(floor(sqrt(list_sum(list_transform(v, x -> x * x)))
                    * {_NORM_SCALE} + 0.5) AS BIGINT) AS inorm
  FROM e
),
n_agg AS (
  SELECT label, count(*) AS n_vecs, sum(inorm) AS s_inorm
  FROM norms GROUP BY label
),
exploded AS (
  SELECT label, unnest(v) AS ev, generate_subscripts(v, 1) AS pos FROM e
),
pos_sums AS (
  SELECT label, pos,
         sum(CAST(floor(ev * {_ELEM_SCALE} + 0.5) AS BIGINT)) AS s
  FROM exploded GROUP BY label, pos
),
cent AS (
  SELECT label, sum(s * s) AS ssq FROM pos_sums GROUP BY label
)
SELECT n_agg.label, n_vecs,
       {round_half_up_sql(f'CAST(s_inorm AS DOUBLE) / (n_vecs * {_NORM_SCALE}.0)', 6)} AS avg_norm,
       {round_half_up_sql(f'sqrt(CAST(ssq AS DOUBLE)) / (n_vecs * {_ELEM_SCALE}.0)', 6)} AS centroid_norm
FROM n_agg JOIN cent ON n_agg.label = cent.label
"""


# --- q64: token-budget sequence packing ----------------------------------

PACK_BUDGET = 2048       # subword units per training sequence
PACK_SHARDS = 16         # deterministic packing shards per language
PACK_SEED = "pack:"


def q64_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-budget training sequences (≤2048
    subword units) and report packing efficiency per (lang, shard) —
    the batch-assembly stage between corpus filtering and training.

    Scale design: packing is a running total, which is inherently
    sequential — so it is NEVER run over a whole language. Docs are
    first sharded by a content hash (16 shards/lang here; thousands at
    100 TB), and the cumulative sum runs per (lang, shard): every
    window partition holds corpus/|shards| docs and the shards pack
    independently — exactly how production packers parallelize. A doc
    lands in the sequence its cumulative start offset falls in
    (floor(start/budget)), so oversized docs simply span bins and the
    unit accounting stays exact."""
    docs = load(spark, sf_dir, "documents")
    # subword-unit estimate matching q32: ceil(len/4) per whitespace token
    from ..functions import textstats as tfn
    units = F.aggregate(
        F.transform(tfn.tokens(F.col("text")),
                    lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    shard = hash32(F.concat(F.lit(PACK_SEED),
                            F.col("doc_id").cast("string"))) % PACK_SHARDS
    d = docs.select("lang", "doc_id", units.alias("units"),
                    shard.alias("shard"))
    w = (Window.partitionBy("lang", "shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum("units").over(w) - F.col("units")
    seq = F.floor(start / PACK_BUDGET)
    packed = d.withColumn("seq_id", seq)
    return (packed.groupBy("lang", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("units").alias("total_units"),
                 F.countDistinct("seq_id").alias("n_seqs"))
            .withColumn("avg_fill",
                        round_half_up(F.col("total_units")
                                      / (F.col("n_seqs") * PACK_BUDGET), 6)))


_Q64_SQL = f"""
WITH toks AS (
  SELECT lang, doc_id,
         -- coalesce: DuckDB list_sum of an empty list is NULL (a
         -- token-less doc would also divide-by-zero nothing here, it
         -- just packs 0 units); Spark's F.aggregate returns the 0 seed
         CAST(coalesce(list_sum(list_transform(
           list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),
                       x -> x <> ''),
           x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT) AS units,
         {hash32_sql("'pack:' || CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS} AS shard
  FROM documents
),
packed AS (
  SELECT lang, shard, units,
         floor((sum(units) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - units)
               / {PACK_BUDGET}) AS seq_id
  FROM toks
)
SELECT lang, shard, count(*) AS n_docs,
       CAST(sum(units) AS BIGINT) AS total_units,
       CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
       {round_half_up_sql(
           f'CAST(sum(units) AS DOUBLE) / (count(DISTINCT seq_id) * {PACK_BUDGET})', 6)} AS avg_fill
FROM packed GROUP BY lang, shard
"""


# --- q71: incremental rollup refresh (delta maintenance) ------------------

ROLLUP_CUTOFF = "2024-01-30 12:30:00"  # mid-hour: the 12:00 bucket has
                                       # rows on BOTH sides of the cutoff


def _hourly_partial(df: DataFrame) -> DataFrame:
    return (df.groupBy(F.date_trunc("hour", "ts").alias("bucket_start"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)")).alias("_s")))


def q71_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate REFRESH: merge a stored hourly rollup with
    the rollup of newly-arrived rows, and prove the merged result equals
    a full recompute (the oracle is the plain full rollup).

    This is the maintenance step a 100 TB hypertable runs per refresh
    window: read ONLY the delta (cutoff pushed to the scan) plus the
    small materialized aggregate — never rescan the base table. The
    cutoff lands mid-hour deliberately, so the boundary bucket exists in
    BOTH inputs and the merge must combine partial states: counts add,
    and sums stay exact under re-aggregation because partials are
    DECIMAL (order- and grouping-independent). Here the "stored" side is
    recomputed from the base table so the oracle can verify equality;
    in production it is a parquet/Delta table written by the previous
    refresh, and only the delta branch touches new data."""
    events = load(spark, sf_dir, "events")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")
    mv = _hourly_partial(events.filter(F.col("ts") < cutoff))
    delta = _hourly_partial(events.filter(F.col("ts") >= cutoff))
    merged = (mv.unionByName(delta)
              .groupBy("bucket_start")
              .agg(F.sum("n_events").alias("n_events"),
                   F.sum("_s").alias("_s")))
    return merged.select("bucket_start", "n_events",
                         F.col("_s").cast("double").alias("sum_value"))


# the oracle is the FULL recompute — equality proves the merge correct
_Q71_SQL = """
SELECT date_trunc('hour', ts) AS bucket_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


# --- q72: policy-term redaction (PII-scrub mechanism) ---------------------

REDACT_PATTERN = r"\b(customer|vector)\b"  # stand-in for PII regexes
REDACT_TOKEN = "[REDACTED]"


def q72_policy_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scrubbing: redact policy-listed terms and report the
    redaction footprint per language — mechanically identical to
    PII removal (email/phone/id regexes), which is the form every
    training corpus runs before release; the term list is a stand-in
    because the synthetic corpus contains no PII-shaped strings.

    Scale shape: one pure-map pass (regexp_extract_all + regexp_replace
    under whole-stage codegen — the regex never leaves the JVM), then a
    tiny per-language aggregate. Nothing shuffles but the final
    few-row-per-language partials. The redacted text itself is NOT
    returned here (the demo reports the audit metrics); the production
    writer is the same map with a .write on the redacted column."""
    docs = load(spark, sf_dir, "documents")
    n_matches = F.size(F.regexp_extract_all("text", F.lit(REDACT_PATTERN), F.lit(0)))
    redacted_len = F.length(
        F.regexp_replace("text", REDACT_PATTERN, REDACT_TOKEN))
    d = docs.select(
        "lang",
        n_matches.cast("long").alias("nm"),
        (redacted_len - F.length("text")).cast("long").alias("len_delta"))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("nm") > 0).cast("long")).alias("n_docs_affected"),
                 F.sum("nm").alias("total_redactions"),
                 F.sum("len_delta").alias("chars_delta")))


_Q72_SQL = rf"""
WITH d AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS BIGINT) AS nm,
         CAST(length(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g'))
              - length(text) AS BIGINT) AS len_delta
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN nm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected,
       CAST(sum(nm) AS BIGINT) AS total_redactions,
       CAST(sum(len_delta) AS BIGINT) AS chars_delta
FROM d GROUP BY lang
"""


# --- q78: sliding-window token chunking -----------------------------------

CHUNK_TOKENS = 64   # context-window chunk size
CHUNK_STRIDE = 48   # 16-token overlap between consecutive chunks


def q78_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into 64-token chunks
    with 16-token overlap (stride 48) — the tokenize-and-chunk stage
    that turns a raw corpus into training sequences. Each chunk carries
    an engine-portable content hash of its text so the gate verifies
    the actual token slices, not just the arithmetic.

    Scale shape: pure per-row map — tokenize, compute the chunk count
    in integer arithmetic, explode a bounded sequence, slice. No
    shuffle at all beyond the initial spread; chunk fanout per doc is
    ~n_tokens/stride. Token-less docs produce zero chunks (explode of
    an empty sequence) in both engines."""
    from ..functions import textstats
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = (docs.select("doc_id", textstats.tokens(F.col("text")).alias("tk"))
         .withColumn("n", F.size("tk").cast("long"))
         .filter(F.col("n") > 0))
    # 1 + ceil(max(0, n - CHUNK) / STRIDE), all-integer (`div`, no doubles)
    n_chunks = F.when(
        F.col("n") <= CHUNK_TOKENS, F.lit(1).cast("long")).otherwise(
        F.expr(f"(n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})"
               f" div {CHUNK_STRIDE} + 1"))
    ch = (d.withColumn("chunk_id",
                       F.explode(F.sequence(F.lit(0).cast("long"),
                                            n_chunks - 1)))
          .withColumn("start_tok", F.col("chunk_id") * CHUNK_STRIDE + 1)
          .withColumn("n_tok", F.least(F.lit(CHUNK_TOKENS).cast("long"),
                                       F.col("n") - F.col("start_tok") + 1)))
    chunk_text = F.array_join(
        F.slice("tk", F.col("start_tok").cast("int"),
                F.col("n_tok").cast("int")), " ")
    return ch.select("doc_id", "chunk_id", "start_tok", "n_tok",
                     hash32(chunk_text).alias("chunk_hash"))


_Q78_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),
                     x -> x <> '') AS tk
  FROM documents
),
d AS (
  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM toks WHERE len(tk) > 0
),
ch AS (
  SELECT doc_id, tk, n, CAST(i AS BIGINT) AS chunk_id,
         CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_tok
  FROM d, unnest(range(0,
        CASE WHEN n <= {CHUNK_TOKENS} THEN 1
             ELSE (n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE} + 1
        END)) AS t(i)
)
SELECT doc_id, chunk_id, start_tok,
       least({CHUNK_TOKENS}, n - start_tok + 1) AS n_tok,
       {hash32_sql("array_to_string(tk[start_tok:"
                   f"start_tok + least({CHUNK_TOKENS}, n - start_tok + 1) - 1"
                   "], ' ')")} AS chunk_hash
FROM ch
"""


# --- q79: deterministic training-order shuffle (shard + in-shard order) ---

SHUF_SEED = "shuf:"   # hash domain separator
N_SHARDS = 32


def q79_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle for training order: every doc gets a
    content-addressed order key, a shard (key mod 32), and a position
    within its shard — the standard write-shuffled-shards layout.
    Reading shards in index order then rows in position order is a
    reproducible pseudo-random permutation of the corpus: no rand(),
    re-runs and retries land identical.

    Scale shape: the ONLY global structure is the shard id, so the plan
    is one hash exchange on shard + a per-shard sort — embarrassingly
    parallel, no global sort, no single-partition window. Shard count
    scales with the corpus so each shard stays task-sized."""
    docs = load(spark, sf_dir, "documents")
    key = hash32(F.concat(F.lit(SHUF_SEED), F.col("doc_id").cast("string")))
    d = (docs.select("doc_id", key.alias("order_key"))
         .withColumn("shard", (F.col("order_key") % N_SHARDS).cast("int")))
    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return d.select("doc_id", "shard", "order_key",
                    F.row_number().over(w).cast("long").alias("pos"))


_Q79_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {hash32_sql("'shuf:' || CAST(doc_id AS VARCHAR)")} AS order_key
  FROM documents
)
SELECT doc_id, CAST(order_key % {N_SHARDS} AS INT) AS shard, order_key,
       CAST(row_number() OVER (PARTITION BY order_key % {N_SHARDS}
                               ORDER BY order_key, doc_id) AS BIGINT) AS pos
FROM d
"""


def q91_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge with tombstones — the Delta/Hudi/Iceberg MERGE shape
    the engine's insert-only upserts (K3/K4, q06) never exercise:
    apply a change feed of latest-wins updates AND deletes to a base
    snapshot. The feed is derived deterministically from orders (each
    order is a CDC event on its customer; o_orderkey is the version;
    roughly every fifth key is a tombstone), so both engines construct
    the identical feed.

    Scale shape: latest-wins per key is ONE map-side-combinable
    struct-max aggregate (no sort, no window — version is unique within
    a key's feed), then a single equi-join against the snapshot; delete
    filtering is a map-side predicate. At 100 TB this is the standard
    log-compaction plan: shuffle ∝ |change keys|, never |log|."""
    base = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("balance"))
    ev = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("version"),
        F.when(F.col("o_orderkey") % 10 < 2, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.col("o_totalprice").alias("new_balance"))
    latest = (ev.groupBy("c_custkey")
              .agg(F.max(F.struct("version", "op", "new_balance")).alias("m"))
              .select("c_custkey", F.col("m.op").alias("op"),
                      F.col("m.new_balance").alias("new_balance")))
    merged = base.join(latest, "c_custkey", "left")
    live = merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
    return live.select(
        "c_custkey",
        F.when(F.col("op") == "U", F.col("new_balance"))
        .otherwise(F.col("balance")).alias("balance"),
        F.when(F.col("op") == "U", F.lit("updated"))
        .otherwise(F.lit("base")).alias("src"))


_Q91_SQL = """
WITH ev AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS version,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS new_balance
  FROM orders
),
latest AS (
  SELECT c_custkey, op, new_balance FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey
                                 ORDER BY version DESC) AS rn
    FROM ev)
  WHERE rn = 1
)
SELECT c.c_custkey,
       CASE WHEN l.op = 'U' THEN l.new_balance ELSE c.c_acctbal END AS balance,
       CASE WHEN l.op = 'U' THEN 'updated' ELSE 'base' END AS src
FROM customer c LEFT JOIN latest l USING (c_custkey)
WHERE l.op IS NULL OR l.op <> 'D'
"""


# --- q129: 2-D Pareto frontier (skyline) ----------------------------------

PARETO_SCALE = 1000  # quality axis quantized to permille levels


def q129_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/length Pareto frontier (2-D skyline) of the corpus: the
    (alpha-ratio level, max document length) points not dominated on
    both axes — the diagnostic curation uses to set per-quality length
    caps ("how much length mass does each quality level uniquely
    contribute?"). A point dominates another iff its quality level is
    >= AND its length is >= with one strict; survivors are the maximal
    staircase.

    Scale shape: the skyline problem is quadratic by definition
    (dominance is a theta-self-join), but quantizing the quality axis
    to PARETO_SCALE integer levels makes it one map-side-combinable
    groupBy over a <=1001-key space (one corpus pass, shuffle bounded
    by levels x partitions) followed by a running-max window over the
    <=1001 aggregated rows — the single unpartitioned window is
    level-bounded, never corpus-bounded (lint-allowlisted). The 2-D
    sort-and-scan identity replaces the quadratic dominance join: after
    sorting levels descending, a level survives iff its max length
    strictly exceeds every higher level's max.

    Exactness: alpha_pm = (alpha_chars * 1000) div n_chars in integer
    floor division (both engines floor identically on non-negative
    integers); all outputs are BIGINT counts/maxima — no float anywhere.
    Zero-length docs are excluded definitionally (the ratio is
    undefined); the testdata has none, and the oracle filters
    identically either way."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    lvl = (docs.select(
               (alpha.cast("long") * PARETO_SCALE)
               .alias("a1000"), "n_chars")
           .select(F.expr("a1000 div n_chars").alias("alpha_pm"), "n_chars")
           .groupBy("alpha_pm")
           .agg(F.max("n_chars").alias("max_chars"),
                F.count("*").alias("n_docs")))
    above = Window.orderBy(F.col("alpha_pm").desc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (lvl.withColumn("best_above", F.max("max_chars").over(above))
            .filter(F.col("best_above").isNull()
                    | (F.col("max_chars") > F.col("best_above")))
            .select("alpha_pm", "max_chars", "n_docs"))


_Q129_SQL = f"""
WITH lv AS (
  SELECT (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
          * {PARETO_SCALE}) // n_chars AS alpha_pm,
         max(n_chars) AS max_chars,
         count(*) AS n_docs
  FROM documents WHERE n_chars > 0
  GROUP BY 1
)
SELECT alpha_pm, max_chars, n_docs
FROM (SELECT *,
             max(max_chars) OVER (ORDER BY alpha_pm DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS best_above
      FROM lv)
WHERE best_above IS NULL OR max_chars > best_above
"""


# --- q132: per-domain token-budget prefix fill -----------------------------

TB_BUDGET = 800  # per-source token budget


def q132_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a training mix to EXACT per-domain token budgets: order
    each source's docs by a content hash (reproducible, rerun- and
    growth-stable — the q59 argument) and keep the maximal prefix whose
    running token sum stays within the budget. This is the step that
    turns "mixture weights" into an actual N-token dataset: q69 decides
    the proportions, this query cuts the deterministic prefix that
    realizes them. Output is the per-source fill summary (bounded by
    |sources| at any scale).

    Scale shape: one tokenize pass (map-only), then a per-source window
    cumsum — shuffle ∝ docs keyed on source, one sort per domain. A
    pathologically skewed domain (one source = the whole corpus) turns
    that sort into a single straggler task; the escape hatch is q114's
    terasort shape (sample range boundaries on the hash, per-shard
    partial sums + broadcast offsets), not a different algorithm — at
    the 20-source testdata and any realistically sharded corpus the
    plain window IS the right plan.

    Exactness: token counts and cumulative sums are BIGINTs; the window
    order (hash, doc_id) is total, so every prefix — and therefore the
    budget cut — is bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source",
        textstats.token_count(F.col("text")).cast("long").alias("n_tok"),
        hash32(F.concat(F.lit("tb:"), F.col("doc_id").cast("string")))
        .alias("h"))
    w = (Window.partitionBy("source").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = d.withColumn("cum", F.sum("n_tok").over(w))
    kept = F.col("cum") <= TB_BUDGET
    return (filled.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(kept.cast("long")).alias("n_kept"),
                 F.sum(F.when(kept, F.col("n_tok"))
                       .otherwise(F.lit(0).cast("long")))
                 .alias("tokens_kept")))


_Q132_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         {hash32_sql("'tb:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
c AS (
  SELECT source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN cum <= {TB_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN cum <= {TB_BUDGET} THEN n_tok ELSE 0 END)
            AS BIGINT) AS tokens_kept
FROM c GROUP BY source
"""


QUERIES: dict[str, Query] = {
    "q56_range_join": Query(q56_range_join, _Q56_SQL),
    "q57_hierarchical_rollup": Query(q57_hierarchical_rollup, _Q57_SQL),
    "q58_stratified_split": Query(q58_stratified_split, _Q58_SQL),
    "q59_stratum_sample": Query(q59_stratum_sample, _Q59_SQL),
    "q60_embedding_centroids": Query(q60_embedding_centroids, _Q60_SQL),
    "q64_sequence_packing": Query(q64_sequence_packing, _Q64_SQL),
    "q71_rollup_refresh": Query(q71_rollup_refresh, _Q71_SQL),
    "q72_policy_redaction": Query(q72_policy_redaction, _Q72_SQL),
    "q78_token_chunks": Query(q78_token_chunks, _Q78_SQL),
    "q79_shuffle_shard": Query(q79_shuffle_shard, _Q79_SQL),
    "q91_cdc_apply": Query(q91_cdc_apply, _Q91_SQL),
    "q129_pareto_frontier": Query(q129_pareto_frontier, _Q129_SQL),
    "q132_token_budget_fill": Query(q132_token_budget_fill, _Q132_SQL),
}
