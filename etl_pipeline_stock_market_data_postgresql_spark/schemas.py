"""Explicit schemas for the stock star schema.

Mirrors the reference DDL (SURVEY.md §1):
- ``companies``             reference ``main_parallel.py:167-169``, ``create_tables.sql:1-3``
- ``daily_stock_prices``    reference ``main_parallel.py:170-180``, ``create_tables.sql:6-16``
- ``intraday_stock_prices`` reference ``main_parallel.py:181-191``, ``create_tables_duckdb.sql:18-28``
- ``sma_indicators``        reference ``main_parallel.py:192-198``, ``create_tables.sql:18-24``

Deliberate divergences from the reference (documented intent over buggy
letter, SURVEY.md §7.3):
- volume is LongType everywhere (the reference is split INT/BIGINT across
  variants; daily volumes approach INT range).
- prices cast directly from source strings to DECIMAL(15,4) — the
  reference round-trips through Python float (``main_parallel.py:271-274``).

Spark does not enforce PK/FK constraints; ``PRIMARY_KEYS`` drives the
idempotent-append sink (operators.upsert) and ``FOREIGN_KEYS`` drives
post-load validation — same observable semantics as the reference's
``ON CONFLICT DO NOTHING`` + FK (``main_parallel.py:178-179``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PRICE = T.DecimalType(15, 4)

COMPANIES = T.StructType([
    T.StructField("company_symbol", T.StringType(), False),
])

DAILY_STOCK_PRICES = T.StructType([
    T.StructField("company_symbol", T.StringType(), False),
    T.StructField("date", T.DateType(), False),
    T.StructField("open_price", PRICE, False),
    T.StructField("high_price", PRICE, False),
    T.StructField("low_price", PRICE, False),
    T.StructField("close_price", PRICE, False),
    T.StructField("volume", T.LongType(), False),
])

INTRADAY_STOCK_PRICES = T.StructType([
    T.StructField("company_symbol", T.StringType(), False),
    T.StructField("date_time", T.TimestampType(), False),
    T.StructField("open_price", PRICE, False),
    T.StructField("high_price", PRICE, False),
    T.StructField("low_price", PRICE, False),
    T.StructField("close_price", PRICE, False),
    T.StructField("volume", T.LongType(), False),
])

SMA_INDICATORS = T.StructType([
    T.StructField("company_symbol", T.StringType(), False),
    T.StructField("date_time", T.TimestampType(), False),
    T.StructField("sma_value", PRICE, False),
])

TABLES: dict[str, T.StructType] = {
    "companies": COMPANIES,
    "daily_stock_prices": DAILY_STOCK_PRICES,
    "intraday_stock_prices": INTRADAY_STOCK_PRICES,
    "sma_indicators": SMA_INDICATORS,
}

# Composite PKs (symbol, time) — reference main_parallel.py:178,189,196.
PRIMARY_KEYS: dict[str, list[str]] = {
    "companies": ["company_symbol"],
    "daily_stock_prices": ["company_symbol", "date"],
    "intraday_stock_prices": ["company_symbol", "date_time"],
    "sma_indicators": ["company_symbol", "date_time"],
}

# child table -> (fk columns, parent table) — reference main_parallel.py:179.
FOREIGN_KEYS: dict[str, tuple[list[str], str]] = {
    "daily_stock_prices": (["company_symbol"], "companies"),
    "intraday_stock_prices": (["company_symbol"], "companies"),
    "sma_indicators": (["company_symbol"], "companies"),
}

# Time column per fact table (the watermark column, reference
# check_last_date main_parallel.py:206-218).
TIME_COLUMNS: dict[str, str] = {
    "daily_stock_prices": "date",
    "intraday_stock_prices": "date_time",
    "sma_indicators": "date_time",
}


def create_table_if_not_exists(spark, name: str, location: str) -> None:
    """DDL-equivalent of the reference's CREATE TABLE IF NOT EXISTS
    (``main_parallel.py:164-203``): a parquet-backed table, partitioned by
    company_symbol per the reference's access pattern (every read filters
    on symbol — SURVEY.md §4 physical-layout guidance)."""
    schema = TABLES[name]
    ddl_cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    partition = ""
    if name != "companies":
        partition = " PARTITIONED BY (company_symbol)"
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl_cols}) USING parquet"
        f"{partition} LOCATION '{location}'"
    )
