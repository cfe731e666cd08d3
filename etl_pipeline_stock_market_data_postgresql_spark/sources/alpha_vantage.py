"""Alpha-Vantage-shaped JSON payload ingestion (SURVEY.md §2.1 S1-S3, §2.3).

The source abstraction is a semi-structured JSON document: a map of
timestamp-string → map of metric-name-string → numeric-string, under a
well-known top-level key (reference ``main_parallel.py:386-394``).

Design: payloads (fetched driver-side or landed as files) become a
DataFrame of ``(company_symbol, payload_json)`` strings; everything after
that is declarative — ``from_json`` to a MapType, ``explode`` the time
map, project/cast the metric columns. All JVM-side, codegen'd, and
parallel over however many payload files exist (at 100 TB of landed
payloads this is an ordinary partitioned scan + narrow transforms; no
driver loops and no Python UDFs).

Error envelopes (``'Error Message'`` / ``'Note'`` keys,
``main_parallel.py:378-384``) are split out as a rejects DataFrame, and
rows that fail projection/cast land in a quarantine DataFrame instead of
being silently skipped (better observability than the reference's log
lines — SURVEY.md §2.3 P7). Casts are ``try_cast`` — permissive NULL on
failure, never an ANSI runtime error from one malformed row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.timeparse import parse_date, parse_timestamp_multi
from ..schemas import PRICE

# Top-level payload keys per endpoint (reference main_parallel.py:387,390,393).
SERIES_KEYS = {
    "daily": "Time Series (Daily)",
    "intraday": "Time Series (5min)",
    "sma": "Technical Analysis: SMA",
}

# payload: {series_key: {time_str: {metric_name: numeric_string}}}
_PAYLOAD_MAP = T.MapType(
    T.StringType(),
    T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
)

_OHLCV_METRICS = [
    ("1. open", "open_price"),
    ("2. high", "high_price"),
    ("3. low", "low_price"),
    ("4. close", "close_price"),
]


def payloads_df(spark: SparkSession, payloads: list[tuple[str, str]]) -> DataFrame:
    """Driver-fetched (symbol, raw_json) pairs → DataFrame. At scale,
    replace with ``spark.read.text`` / ``spark.read.json`` over landed
    payload files — the downstream plan is identical."""
    return spark.createDataFrame(payloads, "company_symbol string, payload_json string")


def split_error_envelopes(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, rejected): payloads whose JSON carries 'Error Message' or
    'Note' are API failures / rate-limit notices (reference S3)."""
    keys = F.map_keys(
        F.from_json("payload_json", T.MapType(T.StringType(), T.StringType()))
    )
    flagged = raw.withColumn(
        "_is_error",
        F.coalesce(
            F.arrays_overlap(keys, F.array(F.lit("Error Message"), F.lit("Note"))),
            F.lit(False),
        ),
    )
    ok = flagged.filter(~F.col("_is_error")).drop("_is_error")
    rejected = flagged.filter(F.col("_is_error")).drop("_is_error")
    return ok, rejected


def _exploded_series(raw: DataFrame, endpoint: str) -> DataFrame:
    """Select the endpoint's time-series subtree and explode the
    time→metrics map into (symbol, time_str, metrics) rows (S2 + P1).
    A missing/empty subtree explodes to zero rows — the reference's
    payload-presence guard (F3) for free."""
    series_key = SERIES_KEYS[endpoint]
    parsed = raw.select(
        "company_symbol",
        F.from_json("payload_json", _PAYLOAD_MAP).alias("doc"),
    )
    return parsed.select(
        "company_symbol",
        F.explode(F.element_at("doc", F.lit(series_key))).alias("time_str", "metrics"),
    )


def _split_quarantine(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Split permissively-cast rows into (good, quarantined): any NULL in
    a required output column means a missing metric key or an
    unparseable numeric/time string (reference KeyError/ValueError skip
    path, ``main_parallel.py:277-278``, ``:352-353``)."""
    null_any = None
    for c in required:
        piece = F.col(c).isNull()
        null_any = piece if null_any is None else (null_any | piece)
    return df.filter(~null_any), df.filter(null_any)


def _ohlcv_rows(raw: DataFrame, endpoint: str, time_expr, time_name: str) -> DataFrame:
    cols = [
        "company_symbol",
        time_expr.alias(time_name),
    ]
    cols += [
        F.element_at("metrics", F.lit(metric)).try_cast(PRICE).alias(out)
        for metric, out in _OHLCV_METRICS
    ]
    cols.append(F.element_at("metrics", F.lit("5. volume")).try_cast("long").alias("volume"))
    return _exploded_series(raw, endpoint).select(*cols)


def parse_daily(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Daily OHLCV payloads → (rows matching schemas.DAILY_STOCK_PRICES,
    quarantine). Metric keys cited at reference ``main_parallel.py:271-275``."""
    rows = _ohlcv_rows(raw, "daily", parse_date(F.col("time_str")), "date")
    return _split_quarantine(rows, ["date", "open_price", "high_price",
                                    "low_price", "close_price", "volume"])


def parse_intraday(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Intraday 5-minute OHLCV payloads (reference ``main_parallel.py:291-325``)."""
    rows = _ohlcv_rows(raw, "intraday", parse_timestamp_multi(F.col("time_str")), "date_time")
    return _split_quarantine(rows, ["date_time", "open_price", "high_price",
                                    "low_price", "close_price", "volume"])


def parse_sma(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """SMA indicator payloads (reference ``main_parallel.py:328-362``),
    including the 'yyyy-MM-dd HH:mm' timestamps the reference cannot parse
    (evidence ``etl_log.log:5136``)."""
    rows = _exploded_series(raw, "sma").select(
        "company_symbol",
        parse_timestamp_multi(F.col("time_str")).alias("date_time"),
        F.element_at("metrics", F.lit("SMA")).try_cast(PRICE).alias("sma_value"),
    )
    return _split_quarantine(rows, ["date_time", "sma_value"])
