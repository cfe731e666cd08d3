"""Golden semantic tests for the idempotent-append sink and watermark
filter (SURVEY.md §5): in-batch + cross-batch PK dedup, strict-`>`
watermark, idempotent re-run, FK containment."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from etl_pipeline_stock_market_data_postgresql_spark.operators import upsert
from etl_pipeline_stock_market_data_postgresql_spark.schemas import DAILY_STOCK_PRICES

PK = ["company_symbol", "date"]


def _row(sym, day, price=100.0, vol=1000):
    p = Decimal(str(price))
    return (sym, dt.date(2025, 12, day), p, p, p, p, vol)


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [_row("AAPL", 1), _row("AAPL", 2), _row("MSFT", 1)], DAILY_STOCK_PRICES)


def test_antijoin_drops_existing_pks(spark, target):
    batch = spark.createDataFrame(
        [_row("AAPL", 2, 999), _row("AAPL", 3), _row("NVDA", 1)], DAILY_STOCK_PRICES)
    delta = upsert.idempotent_append(batch, target, PK, time_col="date")
    keys = {(r["company_symbol"], r["date"].day) for r in delta.collect()}
    assert keys == {("AAPL", 3), ("NVDA", 1)}  # (AAPL, 2) conflict ignored


def test_inbatch_dedup(spark, target):
    batch = spark.createDataFrame(
        [_row("TSLA", 5, 1), _row("TSLA", 5, 2)], DAILY_STOCK_PRICES)
    delta = upsert.idempotent_append(batch, target, PK)
    assert delta.count() == 1


def test_idempotent_rerun(spark, target):
    batch = spark.createDataFrame([_row("AAPL", 3), _row("AAPL", 4)], DAILY_STOCK_PRICES)
    delta1 = upsert.idempotent_append(batch, target, PK, time_col="date")
    new_target = target.unionByName(delta1)
    # run two: same batch against updated target → empty delta
    delta2 = upsert.idempotent_append(batch, new_target, PK, time_col="date")
    assert delta1.count() == 2
    assert delta2.count() == 0
    assert new_target.count() == 5


def test_watermark_strictly_greater(spark, target):
    wm = upsert.read_watermarks(target, ["company_symbol"], "date")
    got = {r["company_symbol"]: r["high_water_mark"] for r in wm.collect()}
    assert got == {"AAPL": dt.date(2025, 12, 2), "MSFT": dt.date(2025, 12, 1)}

    batch = spark.createDataFrame(
        [_row("AAPL", 2), _row("AAPL", 3), _row("MSFT", 1), ("NEW" , dt.date(2025, 12, 1),
         Decimal("1"), Decimal("1"), Decimal("1"), Decimal("1"), 1)], DAILY_STOCK_PRICES)
    kept = upsert.filter_newer_than_watermark(batch, wm, ["company_symbol"], "date")
    keys = {(r["company_symbol"], r["date"].day) for r in kept.collect()}
    # == watermark is skipped (strict >); unseen key NEW passes through
    assert keys == {("AAPL", 3), ("NEW", 1)}


def test_fk_validation(spark, target):
    companies = spark.createDataFrame([("AAPL",), ("MSFT",)], "company_symbol string")
    facts = target.unionByName(spark.createDataFrame([_row("GHOST", 9)], DAILY_STOCK_PRICES))
    violations = upsert.validate_foreign_key(facts, companies, ["company_symbol"])
    assert [r["company_symbol"] for r in violations.collect()] == ["GHOST"]
