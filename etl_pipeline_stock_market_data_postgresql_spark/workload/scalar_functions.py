"""Scalar-function and grouping-extension coverage: multimodal binary
metadata, CUBE, string functions, exact percentiles, date/time
functions. Rounds out the delegated query surface the reference's
backing databases provided (SURVEY.md §2.8 notes the reference issues
none of these server-side — they are table stakes for owning its query
layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import Query
from ..multimodal import attach_binary_payload, binary_metadata
from ..sources.tables import load
from ..functions.rounding import round_half_up


def q34_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: typed metadata (size, digest,
    magic sniff) over a payload column, all JVM-side expressions."""
    docs = load(spark, sf_dir, "documents")
    out = binary_metadata(attach_binary_payload(docs))
    return out.select("doc_id", "payload_bytes", "payload_sha256", "payload_format")


_Q34_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       sha256(text) AS payload_sha256,
       'unknown' AS payload_format
FROM documents
"""


def q74_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow slow path EXECUTED inside the correctness gate: the
    image-decode ``mapInPandas`` kernel (multimodal.decode_image_stub)
    runs over the binary payload column and its per-dimension histogram
    is hash-checked against the oracle. The stub derives dimensions
    deterministically from the byte length (this container has no media
    libs), which is precisely what makes the Python-side computation
    SQL-expressible — so the gate verifies the Arrow batch plumbing
    (schema, types, batching, partition locality) end to end, not just
    in unit tests. Swap the stub body for PIL and the plan is unchanged.

    Scale shape: decode introduces NO shuffle (batches stay on the
    scan partitions) and the histogram combine runs INSIDE the kernel —
    each Arrow batch returns per-dimension partials, not per-doc rows —
    so the only exchange carries |distinct dims| rows per partition."""
    from ..multimodal.binary_columns import (attach_binary_payload,
                                             decode_image_histogram_stub)

    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    partials = decode_image_histogram_stub(attach_binary_payload(docs))
    return (partials.groupBy("width", "height", "n_channels")
            .agg(F.sum("n_docs").alias("n_docs"),
                 F.min("min_doc_id").alias("min_doc_id")))


_Q74_SQL = """
SELECT CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       3 AS n_channels, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1, 2, 3
"""


def q37_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets."""
    li = load(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                 .cast("double").alias("sum_qty")))


_Q37_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q38_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: case, slice, regexp extraction, replace,
    padding, reversal, concatenation."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("@")).alias("type_masked"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


_Q38_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_name, 1, 5) AS name_prefix,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       replace(p_type, 'a', '@') AS type_masked,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       reverse(p_brand) AS brand_rev,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""


def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    ANSI/DuckDB ``quantile_cont``) — at true scale swap for
    ``percentile_approx`` and accept the sketch error."""
    events = load(spark, sf_dir, "events")
    return (events.groupBy("event_type")
            .agg(round_half_up(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 round_half_up(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
                 round_half_up(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


_Q39_SQL = """
SELECT event_type,
       floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
       floor(quantile_cont(value, 0.9) * 1000000 + 0.5) / 1000000 AS p90,
       floor(quantile_cont(value, 0.99) * 1000000 + 0.5) / 1000000 AS p99,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def q40_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface: field extraction, day arithmetic,
    month-end, day difference."""
    events = load(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return events.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        (F.weekday("ts") + 1).alias("isodow"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("h"),
        F.date_add(d, 7).alias("plus_week"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("days_since_jan1"),
    )


_Q40_SQL = """
SELECT event_id,
       CAST(year(ts) AS INT) AS y,
       CAST(month(ts) AS INT) AS m,
       CAST(day(ts) AS INT) AS d,
       CAST(isodow(ts) AS INT) AS isodow,
       CAST(dayofyear(ts) AS INT) AS doy,
       CAST(hour(ts) AS INT) AS h,
       ts::DATE + 7 AS plus_week,
       last_day(ts::DATE) AS month_end,
       CAST(datediff('day', DATE '2024-01-01', ts::DATE) AS INT) AS days_since_jan1
FROM events
"""


QUERIES: dict[str, Query] = {
    "q34_multimodal_meta": Query(q34_multimodal_meta, _Q34_SQL),
    "q74_multimodal_decode": Query(q74_multimodal_decode, _Q74_SQL),
    "q37_cube": Query(q37_cube, _Q37_SQL),
    "q38_string_funcs": Query(q38_string_funcs, _Q38_SQL),
    "q39_percentiles": Query(q39_percentiles, _Q39_SQL),
    "q40_date_funcs": Query(q40_date_funcs, _Q40_SQL),
}
