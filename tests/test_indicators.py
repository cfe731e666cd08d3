from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.functions import indicators


def test_sma_trailing_window(spark):
    rows = [("AAPL", dt.date(2025, 12, d), float(d)) for d in range(1, 8)]
    rows += [("MSFT", dt.date(2025, 12, d), 10.0 * d) for d in range(1, 4)]
    df = spark.createDataFrame(rows, "company_symbol string, date date, close_price double")
    out = indicators.sma(df, "close_price", "company_symbol", "date", n=3)
    got = {(r["company_symbol"], r["date"].day): r["sma_value"] for r in out.collect()}
    assert got[("AAPL", 1)] is None and got[("AAPL", 2)] is None  # < N bars
    assert got[("AAPL", 3)] == 2.0
    assert got[("AAPL", 7)] == 6.0
    assert got[("MSFT", 3)] == 20.0


def test_sma_matches_api_rounding(spark):
    # validate the rounded_4dp helper mirrors the API's 4-dp publication
    df = spark.createDataFrame([(278.05324999,)], "x double")
    assert df.select(indicators.rounded_4dp(F.col("x")).alias("r")).first()["r"] == 278.0532
