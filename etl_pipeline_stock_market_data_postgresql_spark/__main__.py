"""Runnable ETL orchestration — ``python -m etl_pipeline_stock_market_data_postgresql_spark``.

The Spark twin of the reference's ``main_parallel.py::main()``
(``main_parallel.py:460-496``): env config → DDL → dimension load →
parallel (symbol × endpoint) fetch → three ingests → post-load
validation → printed per-task + per-table summary.

Transport selection: with ``STOCK_API_KEY`` set *and* the ``requests``
package importable, fetches hit the real Alpha Vantage API under the
reference's 5/min rate limit. Otherwise (this sandbox has no network) a
deterministic offline transport synthesizes well-formed payloads — the
full pipeline downstream of the transport is the production code path
either way, which is the point of the injectable transport seam
(``sources/fetch.py``).
"""

from __future__ import annotations

import json
import logging
import sys

from .pipeline import PipelineConfig, StockStore
from .session import get_spark
from .sources import fetch

logger = logging.getLogger(__name__)

ENDPOINTS = ("daily", "intraday", "sma")


# --- transports ----------------------------------------------------------

def demo_transport(symbol: str, params: dict[str, str]) -> str:
    """Deterministic offline payload generator. Prices are derived from
    a stable hash of (symbol, timestamp) so re-runs produce identical
    payloads — making the CLI's second run a visible idempotency no-op,
    the reference's core guarantee (ON CONFLICT DO NOTHING)."""

    def price(tag: str, base: float) -> str:
        jitter = (hash32_int(f"{symbol}|{tag}") % 1000) / 100.0
        return f"{base + jitter:.4f}"

    def hash32_int(s: str) -> int:
        # stable across processes (hash() is salted); cheap FNV-1a
        h = 2166136261
        for ch in s.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return h

    function = params["function"]
    if function == "TIME_SERIES_DAILY":
        days = [f"2026-08-{d:02d}" for d in range(4, 12)]
        series = {
            day: {
                "1. open": price(day + "o", 100.0),
                "2. high": price(day + "h", 110.0),
                "3. low": price(day + "l", 95.0),
                "4. close": price(day + "c", 105.0),
                "5. volume": str(1_000_000 + hash32_int(day + symbol) % 500_000),
            }
            for day in days
        }
        return json.dumps({"Time Series (Daily)": series})
    if function == "TIME_SERIES_INTRADAY":
        stamps = [f"2026-08-11 {h:02d}:{m:02d}:00"
                  for h in (14, 15) for m in (0, 5, 10, 15)]
        series = {
            ts: {
                "1. open": price(ts + "o", 100.0),
                "2. high": price(ts + "h", 110.0),
                "3. low": price(ts + "l", 95.0),
                "4. close": price(ts + "c", 105.0),
                "5. volume": str(10_000 + hash32_int(ts + symbol) % 5_000),
            }
            for ts in stamps
        }
        return json.dumps({"Time Series (5min)": series})
    if function == "SMA":
        # includes the 'yyyy-MM-dd HH:mm' (no seconds) form the
        # reference failed to parse (etl_log.log:5136) — exercised here
        # on purpose
        stamps = ["2026-08-11 14:00", "2026-08-11 15:00", "2026-08-10 15:00"]
        series = {ts: {"SMA": price(ts, 102.0)} for ts in stamps}
        return json.dumps({"Technical Analysis: SMA": series})
    raise ValueError(f"unknown function {function!r}")


def http_transport(api_key: str) -> fetch.Transport:
    """Real Alpha Vantage GET (reference ``main_parallel.py:230-260``).
    Import-gated: ``requests`` may not exist in this environment."""
    import requests  # noqa: PLC0415 — deliberate late, env-gated import

    def transport(symbol: str, params: dict[str, str]) -> str:
        resp = requests.get(
            "https://www.alphavantage.co/query",
            params={**params, "symbol": symbol, "apikey": api_key},
            timeout=30,
        )
        resp.raise_for_status()
        return resp.text

    return transport


def pick_transport(api_key: str | None) -> tuple[fetch.Transport, str]:
    if api_key:
        try:
            return http_transport(api_key), "alpha-vantage-http"
        except ImportError:
            logger.warning("STOCK_API_KEY set but 'requests' unavailable; "
                           "falling back to offline demo transport")
    return demo_transport, "offline-demo"


# --- orchestration -------------------------------------------------------

def run(config: PipelineConfig | None = None,
        transport: fetch.Transport | None = None,
        max_workers: int = 3) -> dict:
    """Full lifecycle; returns a summary dict (tested surface — the CLI
    ``main`` only adds printing)."""
    import os

    config = config or PipelineConfig.from_env()
    if transport is None:
        transport, mode = pick_transport(os.environ.get("STOCK_API_KEY"))
    else:
        mode = "injected"
    # the 5/min token bucket exists for the real API's free tier; local
    # transports would crawl 27 tasks through it for no reason
    limiter = (fetch.RateLimiter() if mode == "alpha-vantage-http"
               else fetch.RateLimiter(rate=1_000_000))

    spark = get_spark("stock-etl")
    store = StockStore(spark, config.warehouse_dir)

    # dimension first — fact-table FK checks depend on it (reference
    # loads companies before facts for the same reason)
    n_new_companies = store.ensure_companies(list(config.symbols))

    report = fetch.fetch_all(list(config.symbols), list(ENDPOINTS),
                             transport, max_workers=max_workers,
                             limiter=limiter)

    ingests = {}
    for endpoint in ENDPOINTS:
        ingests[endpoint] = store.ingest(endpoint, report.payloads(endpoint))

    validation = store.validate()
    return {
        "mode": mode,
        "new_companies": n_new_companies,
        "fetch_ok": len(report.successes),
        "fetch_failed": len(report.failures),
        "ingests": ingests,
        "validation": validation,
    }


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    summary = run()

    print("\n" + "=" * 64)
    print("ETL SUMMARY  (transport: %s)" % summary["mode"])
    print("=" * 64)
    print(f"companies: +{summary['new_companies']} new | "
          f"fetch: {summary['fetch_ok']} ok / {summary['fetch_failed']} failed")
    for endpoint, rep in summary["ingests"].items():
        status = "SUCCESS" if rep.success else "FAILED"
        print(f"{endpoint:9} | {rep.table:22} | {status:7} | "
              f"in={rep.rows_in:5} appended={rep.rows_appended:5} "
              f"skipped={rep.rows_skipped_existing:5} "
              f"quarantined={rep.rows_quarantined}")
    bad = {k: v for k, v in summary["validation"].items() if v}
    print("validation: " + ("OK (all zero)" if not bad else f"VIOLATIONS {bad}"))
    print("=" * 64)
    return 0 if (not bad and all(r.success for r in summary["ingests"].values())) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
