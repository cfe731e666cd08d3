"""Driver-side fetch layer (SURVEY.md §2.1 S1, §2.11 X1/X2).

The reference fans (symbol × endpoint) tasks over a thread pool
(``run_parallel_etl``, ``main_parallel.py:406-457``) bounded by the
API's 5-requests/minute free tier (``main_parallel.py:469-471``). In
the Spark engine, compute parallelism belongs to Spark; a driver-side
pool remains ONLY for concurrent HTTP — exactly this module. Fetched
payloads land as (symbol, raw_json) pairs and enter the engine via
``alpha_vantage.payloads_df`` / ``pipeline.StockStore.ingest``.

The HTTP transport is injectable (this environment has no network):
production passes a requests-based callable; tests pass fakes. The
rate limiter is a monotonic-clock token bucket shared across workers —
the reference instead hard-codes worker_count=3 and hopes
(``main_parallel.py:469-471``).
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

# endpoint -> request params, mirroring the reference's three endpoints
# (main_parallel.py:230-251, :467)
ENDPOINT_PARAMS: dict[str, dict[str, str]] = {
    "daily": {"function": "TIME_SERIES_DAILY"},
    "intraday": {"function": "TIME_SERIES_INTRADAY", "interval": "5min"},
    "sma": {"function": "SMA", "interval": "60min", "time_period": "200",
            "series_type": "close"},
}

Transport = Callable[[str, dict[str, str]], str]  # (symbol, params) -> raw json


class RateLimiter:
    """Token bucket: at most ``rate`` acquisitions per ``per`` seconds,
    shared across threads."""

    def __init__(self, rate: int = 5, per: float = 60.0):
        self.rate = rate
        self.per = per
        self._lock = threading.Lock()
        self._stamps: list[float] = []

    def acquire(self) -> float:
        """Block until a slot is free; returns seconds waited."""
        waited = 0.0
        while True:
            with self._lock:
                now = time.monotonic()
                self._stamps = [t for t in self._stamps if now - t < self.per]
                if len(self._stamps) < self.rate:
                    self._stamps.append(now)
                    return waited
                sleep_for = self.per - (now - self._stamps[0])
            time.sleep(max(sleep_for, 0.01))
            waited += max(sleep_for, 0.01)


@dataclass
class FetchResult:
    """Per-task envelope (reference X5, ``process_symbol_endpoint``
    result dict, ``main_parallel.py:365-403``)."""
    symbol: str
    endpoint: str
    success: bool
    payload: str | None = None
    error: str | None = None


@dataclass
class FetchReport:
    results: list[FetchResult] = field(default_factory=list)

    @property
    def successes(self) -> list[FetchResult]:
        return [r for r in self.results if r.success]

    @property
    def failures(self) -> list[FetchResult]:
        return [r for r in self.results if not r.success]

    def payloads(self, endpoint: str) -> list[tuple[str, str]]:
        """(symbol, raw_json) pairs ready for StockStore.ingest."""
        return [(r.symbol, r.payload) for r in self.successes
                if r.endpoint == endpoint and r.payload is not None]


def fetch_all(symbols: list[str], endpoints: list[str], transport: Transport,
              max_workers: int = 3, limiter: RateLimiter | None = None) -> FetchReport:
    """Fan (symbol × endpoint) over a bounded thread pool with shared
    rate limiting; exceptions become failure envelopes, never crashes
    (reference error containment X6 without its bare-except bug,
    ``main.py:248-249``)."""
    limiter = limiter or RateLimiter()
    tasks = [(s, ep) for s in symbols for ep in endpoints]
    report = FetchReport()

    def one(symbol: str, endpoint: str) -> FetchResult:
        try:
            limiter.acquire()
            raw = transport(symbol, ENDPOINT_PARAMS[endpoint])
            return FetchResult(symbol, endpoint, True, payload=raw)
        except Exception as ex:  # noqa: BLE001 — envelope, don't crash the run
            logger.warning("fetch failed for %s/%s: %s", symbol, endpoint, ex)
            return FetchResult(symbol, endpoint, False, error=str(ex))

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(one, s, ep) for s, ep in tasks]
        for fut in as_completed(futures):
            report.results.append(fut.result())
    logger.info("fetched %d/%d tasks ok", len(report.successes), len(tasks))
    return report
