"""Ingest-path tests with FIXTURES.md §2 payload shapes (evidence-backed
from the reference's shipped run log)."""

from __future__ import annotations

import json
from decimal import Decimal

from etl_pipeline_stock_market_data_postgresql_spark.sources import alpha_vantage as av

DAILY_PAYLOAD = {
    "Time Series (Daily)": {
        "2025-12-09": {"1. open": "278.16", "2. high": "280.03", "3. low": "276.92",
                        "4. close": "277.18", "5. volume": "31753410"},
        "2025-12-08": {"1. open": "278.13", "2. high": "279.6693", "3. low": "276.15",
                        "4. close": "277.89", "5. volume": "36406317"},
    }
}

SMA_PAYLOAD = {
    "Technical Analysis: SMA": {
        "2025-12-09 19:00": {"SMA": "278.0532"},     # HH:mm — reference can't parse this
        "2025-12-09 18:00:00": {"SMA": "278.0205"},  # HH:mm:ss
        "2025-12-07": {"SMA": "277.9000"},           # bare date
        "not-a-time": {"SMA": "1.0"},                # quarantine: bad timestamp
        "2025-12-06": {"SMA": "abc"},                # quarantine: bad numeric
    }
}


def test_daily_parse(spark):
    raw = av.payloads_df(spark, [("AAPL", json.dumps(DAILY_PAYLOAD))])
    good, bad = av.parse_daily(raw)
    rows = {r["date"].isoformat(): r for r in good.collect()}
    assert bad.count() == 0
    assert len(rows) == 2
    r = rows["2025-12-09"]
    assert r["open_price"] == Decimal("278.1600")
    assert r["high_price"] == Decimal("280.0300")
    assert r["close_price"] == Decimal("277.1800")
    assert r["volume"] == 31753410
    # 4-dp exactness preserved through DecimalType (no float detour)
    assert rows["2025-12-08"]["high_price"] == Decimal("279.6693")


def test_sma_multiformat_and_quarantine(spark):
    raw = av.payloads_df(spark, [("AAPL", json.dumps(SMA_PAYLOAD))])
    good, bad = av.parse_sma(raw)
    good_rows = {str(r["date_time"]): r["sma_value"] for r in good.collect()}
    assert good_rows == {
        "2025-12-09 19:00:00": Decimal("278.0532"),
        "2025-12-09 18:00:00": Decimal("278.0205"),
        "2025-12-07 00:00:00": Decimal("277.9000"),
    }
    assert bad.count() == 2  # quarantined, not silently dropped


def test_error_envelopes(spark):
    raw = av.payloads_df(spark, [
        ("AAPL", json.dumps(DAILY_PAYLOAD)),
        ("BAD", json.dumps({"Error Message": "Invalid API call."})),
        ("RATE", json.dumps({"Note": "rate limit"})),
    ])
    ok, rejected = av.split_error_envelopes(raw)
    assert [r["company_symbol"] for r in ok.collect()] == ["AAPL"]
    assert rejected.count() == 2


def test_empty_payload_noop(spark):
    raw = av.payloads_df(spark, [("AAPL", "{}")])
    good, bad = av.parse_daily(raw)
    assert good.count() == 0 and bad.count() == 0
