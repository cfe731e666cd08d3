from __future__ import annotations

import json
import time

from etl_pipeline_stock_market_data_postgresql_spark.sources import fetch


def _fake_transport(symbol, params):
    if symbol == "BOOM":
        raise ConnectionError("socket closed")
    return json.dumps({"symbol": symbol, "function": params["function"]})


def test_fetch_fanout_and_envelopes():
    report = fetch.fetch_all(["AAPL", "BOOM"], ["daily", "sma"], _fake_transport,
                             limiter=fetch.RateLimiter(rate=100, per=1.0))
    assert len(report.results) == 4
    assert len(report.successes) == 2 and len(report.failures) == 2
    pl = report.payloads("daily")
    assert pl == [("AAPL", json.dumps({"symbol": "AAPL",
                                       "function": "TIME_SERIES_DAILY"}))]
    assert all(r.symbol == "BOOM" for r in report.failures)


def test_rate_limiter_enforces_budget():
    limiter = fetch.RateLimiter(rate=3, per=0.5)
    t0 = time.monotonic()
    for _ in range(6):  # 6 calls at 3-per-0.5s -> at least one full window wait
        limiter.acquire()
    assert time.monotonic() - t0 >= 0.45


def test_rate_limiter_thread_safety():
    limiter = fetch.RateLimiter(rate=50, per=0.2)
    report = fetch.fetch_all([f"S{i}" for i in range(10)], ["daily"],
                             _fake_transport, max_workers=8, limiter=limiter)
    assert len(report.successes) == 10


def test_fetch_to_ingest_end_to_end(spark, tmp_path):
    """Reference lifecycle §3.1 stages 5-8: fan-out fetch → parse →
    idempotent load, with one symbol failing at the HTTP layer."""
    from etl_pipeline_stock_market_data_postgresql_spark.pipeline import StockStore

    def transport(symbol, params):
        if symbol == "BOOM":
            raise TimeoutError("30s timeout")
        return json.dumps({"Time Series (Daily)": {
            "2025-12-09": {"1. open": "1", "2. high": "2", "3. low": "0.5",
                            "4. close": "1.5", "5. volume": "10"}}})

    report = fetch.fetch_all(["AAPL", "MSFT", "BOOM"], ["daily"], transport,
                             limiter=fetch.RateLimiter(rate=100, per=1.0))
    store = StockStore(spark, str(tmp_path / "wh"))
    store.ensure_companies(["AAPL", "MSFT", "BOOM"])
    r = store.ingest("daily", report.payloads("daily"))
    assert r.success and r.rows_appended == 2
    assert len(report.failures) == 1
