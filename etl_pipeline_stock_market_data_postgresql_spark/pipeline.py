"""End-to-end ETL lifecycle — the Spark-native re-expression of the
reference's ``main_parallel.py::main()`` (SURVEY.md §3.1):

reference stage                      → here
1. config from env                   → PipelineConfig.from_env
2. connection pool                   → (none — Spark session)
3. CREATE TABLE IF NOT EXISTS ×4     → StockStore.ensure_tables (parquet dirs)
4. dimension load (companies first)  → ensure_companies (anti-join append)
5-7. per-(symbol,endpoint) fetch →
   parse → watermark-skip → batch
   insert ON CONFLICT DO NOTHING     → ingest(): parse_* → quarantine split
                                        → watermark pre-filter → idempotent
                                        anti-join append (operators.upsert)
8. per-task result envelope + summary→ IngestReport per call

Differences by design (intent over buggy letter, SURVEY.md §7.3): loads
are order-independent (no reliance on API descending order), malformed
rows land in a quarantine table instead of log lines, and the watermark
is read for all symbols in one grouped aggregation.

Storage: one parquet dataset per table, fact tables partitioned by
``company_symbol`` (every reference read filters on symbol — SURVEY §4),
so watermark reads and symbol scans prune to single partitions at any
scale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas
from .operators import upsert
from .sources import alpha_vantage as av

_PARSERS = {
    "daily": (av.parse_daily, "daily_stock_prices"),
    "intraday": (av.parse_intraday, "intraday_stock_prices"),
    "sma": (av.parse_sma, "sma_indicators"),
}


@dataclass
class PipelineConfig:
    """Mirrors the reference's env-driven config (dataclasses at
    ``main_parallel.py:33-73``); DB coordinates are used only by the
    optional JDBC sink."""
    warehouse_dir: str = "./stock_warehouse"
    symbols: tuple[str, ...] = ("AAPL", "IBM", "MSFT", "GOOGL", "AMZN",
                                "TSLA", "NVDA", "NFLX", "INTC")
    jdbc_url: str | None = None

    @classmethod
    def from_env(cls) -> "PipelineConfig":
        return cls(
            warehouse_dir=os.environ.get("STOCK_WAREHOUSE_DIR", "./stock_warehouse"),
            jdbc_url=os.environ.get("STOCK_JDBC_URL") or None,
        )


@dataclass
class IngestReport:
    """Per-ingest result envelope (reference X5, ``main_parallel.py:365-403``)."""
    table: str
    rows_in: int = 0
    rows_appended: int = 0
    rows_quarantined: int = 0
    rows_skipped_existing: int = 0
    rejected_payloads: int = 0
    errors: list[str] = field(default_factory=list)

    @property
    def success(self) -> bool:
        return not self.errors


class StockStore:
    """Parquet-backed managed tables with the reference's PK semantics
    enforced at the sink (idempotent anti-join append)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        # fact tables are partitioned: data files live under
        # company_symbol=<sym>/ subdirectories, so walk recursively
        for _, _, files in os.walk(self.path(table)):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, table: str) -> DataFrame:
        if not self.exists(table):
            return self.spark.createDataFrame([], schemas.TABLES[table])
        return self.spark.read.schema(schemas.TABLES[table]).parquet(self.path(table))

    def append(self, table: str, df: DataFrame) -> None:
        if table != "companies":
            # One shuffle partition per symbol hash, sorted by
            # (symbol, time): the writer finds rows already grouped by
            # its partition column — no writer-side (non-stable!) resort
            # to scramble the time order — and emits one file per symbol
            # per append instead of one per task×symbol. Parquet min/max
            # stats on the time column then make watermark reads and
            # time-range scans metadata-cheap (SURVEY.md §4). If one
            # symbol ever dominates a batch, salt the repartition.
            time_col = schemas.TIME_COLUMNS[table]
            df = (df.repartition("company_symbol")
                  .sortWithinPartitions("company_symbol", time_col))
            df.write.mode("append").partitionBy("company_symbol").parquet(
                self.path(table))
        else:
            df.write.mode("append").parquet(self.path(table))

    # --- lifecycle -------------------------------------------------

    def ensure_companies(self, symbols: list[str]) -> int:
        """Dimension-first upsert (reference K4, ``ensure_company_exists``
        ``main_parallel.py:221-227``): insert unseen symbols only."""
        incoming = self.spark.createDataFrame(
            [(s,) for s in symbols], schemas.COMPANIES)
        delta = upsert.idempotent_append(
            incoming, self.read("companies"), ["company_symbol"])
        n = delta.count()
        if n:
            self.append("companies", delta)
        return n

    def ingest(self, endpoint: str, payloads: list[tuple[str, str]],
               use_watermark: bool = True) -> IngestReport:
        """Full ingest of (symbol, raw_json) payloads for one endpoint."""
        parser, table = _PARSERS[endpoint]
        report = IngestReport(table=table)
        pk = schemas.PRIMARY_KEYS[table]
        time_col = schemas.TIME_COLUMNS[table]

        raw = av.payloads_df(self.spark, payloads)
        ok, rejected = av.split_error_envelopes(raw)
        report.rejected_payloads = rejected.count()

        # persist both parse outputs: every report counter below is an
        # action, and without this each one re-runs the JSON parse DAG
        good, bad = parser(ok)
        good = good.persist()
        bad = bad.persist()
        report.rows_in = good.count()
        report.rows_quarantined = bad.count()

        target = self.read(table)
        batch = good
        if use_watermark:
            wm = upsert.read_watermarks(target, ["company_symbol"], time_col)
            batch = upsert.filter_newer_than_watermark(
                batch, wm, ["company_symbol"], time_col)
        delta = upsert.idempotent_append(batch, target, pk, time_col=time_col)

        # FK check before append (reference loads companies first and
        # relies on the DB FK; we validate explicitly)
        violations = upsert.validate_foreign_key(
            delta, self.read("companies"), ["company_symbol"])
        n_bad_fk = violations.count()
        if n_bad_fk:
            report.errors.append(f"{n_bad_fk} rows violate FK to companies")
            delta = delta.join(self.read("companies").select("company_symbol"),
                               ["company_symbol"], "left_semi")

        appended = delta.persist()
        report.rows_appended = appended.count()
        report.rows_skipped_existing = (
            report.rows_in - report.rows_appended
            - (0 if not n_bad_fk else n_bad_fk))
        if report.rows_appended:
            self.append(table, appended)
        appended.unpersist()
        good.unpersist()
        bad.unpersist()
        return report

    def validate(self) -> dict[str, int]:
        """Post-load integrity: FK containment per fact table (J2) and
        PK uniqueness (must both be zero)."""
        out = {}
        companies = self.read("companies")
        for table, (fk_cols, _) in schemas.FOREIGN_KEYS.items():
            out[f"{table}_fk_violations"] = upsert.validate_foreign_key(
                self.read(table), companies, fk_cols).count()
        for table, pk in schemas.PRIMARY_KEYS.items():
            df = self.read(table)
            out[f"{table}_pk_duplicates"] = (
                df.groupBy(*pk).count().filter(F.col("count") > 1).count())
        return out
