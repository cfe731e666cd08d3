"""JDBC merge logic, exercised without a live database: the target
reader/writer are injected fakes, so the read → anti-join → write
pipeline (sources/jdbc.py idempotent_append) actually executes — the
only parts left untested are the literal spark.read.format("jdbc")
option plumbing (no driver jar in this environment).
"""

from __future__ import annotations

import datetime as dt

import pytest

from etl_pipeline_stock_market_data_postgresql_spark.sources import jdbc

URL = "jdbc:postgresql://example.invalid/db"
PK = ["company_symbol", "date"]

ROWS_TARGET = [
    ("AAPL", dt.date(2024, 1, 1), 100.0),
    ("AAPL", dt.date(2024, 1, 2), 101.0),
    ("MSFT", dt.date(2024, 1, 1), 200.0),
]
ROWS_BATCH = [
    ("AAPL", dt.date(2024, 1, 2), 999.0),   # PK conflict -> dropped
    ("AAPL", dt.date(2024, 1, 3), 102.0),   # new
    ("AAPL", dt.date(2024, 1, 3), 103.0),   # in-batch dup -> one survives
    ("MSFT", dt.date(2024, 1, 2), 201.0),   # new
]
COLS = ["company_symbol", "date", "close_price"]


class FakeDb:
    """Injectable stand-in for the remote table: records the pushdown
    predicate, counts reader calls, accumulates appended rows."""

    def __init__(self, spark, rows):
        self.spark = spark
        self.rows = list(rows)
        self.predicates: list[str | None] = []
        self.appended: list[tuple] = []

    def read(self, predicate):
        self.predicates.append(predicate)
        return self.spark.createDataFrame(self.rows, COLS)

    def write(self, delta):
        self.appended.extend(tuple(r) for r in delta.collect())


def test_idempotent_append_writes_only_new_pks(spark):
    db = FakeDb(spark, ROWS_TARGET)
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    n = jdbc.idempotent_append(
        spark, batch, URL, "daily", PK, time_col="date",
        target_reader=db.read, target_writer=db.write)
    assert n == 2
    keys = sorted((r[0], r[1]) for r in db.appended)
    assert keys == [("AAPL", dt.date(2024, 1, 3)), ("MSFT", dt.date(2024, 1, 2))]
    # the pushdown predicate reached the reader as a typed ANSI literal
    assert db.predicates == ['"date" >= DATE \'2024-01-02\'']


def test_idempotent_append_rerun_is_noop(spark):
    db = FakeDb(spark, ROWS_TARGET)
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    jdbc.idempotent_append(spark, batch, URL, "daily", PK, time_col="date",
                           target_reader=db.read, target_writer=db.write)
    db.rows.extend(db.appended)   # the DB now holds the merged state
    n2 = jdbc.idempotent_append(spark, batch, URL, "daily", PK, time_col="date",
                                target_reader=db.read, target_writer=db.write)
    assert n2 == 2 + len(ROWS_TARGET) - len(db.rows)  # == 0
    assert len(db.appended) == 2


def test_target_scanned_once_despite_two_actions(spark):
    """count() + write are two actions over the delta; the persist in
    idempotent_append must keep the target from being re-scanned (a
    second remote read could see a different table state)."""
    scans = spark.sparkContext.accumulator(0)

    def counting_read(predicate):
        df = spark.createDataFrame(ROWS_TARGET, COLS)

        def tag(it):
            scans.add(1)
            return it
        return spark.createDataFrame(df.rdd.mapPartitions(tag), df.schema)

    db = FakeDb(spark, [])
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    n = jdbc.idempotent_append(
        spark, batch, URL, "daily", PK, time_col="date",
        target_reader=counting_read, target_writer=db.write)
    assert n == 2
    n_parts = spark.createDataFrame(ROWS_TARGET, COLS).rdd.getNumPartitions()
    assert scans.value == n_parts  # one scan's worth of tasks, not two


def test_no_write_call_when_delta_empty(spark):
    db = FakeDb(spark, ROWS_TARGET)
    batch = spark.createDataFrame(ROWS_TARGET, COLS)  # all conflicts

    def forbidden_write(delta):
        raise AssertionError("writer must not run for an empty delta")

    n = jdbc.idempotent_append(spark, batch, URL, "daily", PK, time_col="date",
                               target_reader=db.read, target_writer=forbidden_write)
    assert n == 0


def test_time_prune_requires_time_in_pk(spark):
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    with pytest.raises(ValueError, match="time-range pruning"):
        jdbc.idempotent_append(spark, batch, URL, "daily",
                               ["company_symbol"], time_col="date")


def test_render_bound_literals():
    assert jdbc.render_bound(dt.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert (jdbc.render_bound(dt.datetime(2024, 1, 2, 3, 4, 5, 60000))
            == "TIMESTAMP '2024-01-02 03:04:05.060000'")
    assert jdbc.render_bound(42) == "42"
    assert jdbc.render_bound("o'brien") == "'o''brien'"


def test_render_bound_tz_aware_normalized_to_utc():
    # a naive rendering of 00:30+05:00 would read as 00:30 server-local,
    # potentially ABOVE the true minimum (over-pruning the probe scan)
    est = dt.timezone(dt.timedelta(hours=5))
    v = dt.datetime(2024, 1, 2, 0, 30, 0, tzinfo=est)
    assert (jdbc.render_bound(v)
            == "TIMESTAMP WITH TIME ZONE '2024-01-01 19:30:00.000000+00:00'")


def test_render_bound_bool_not_int():
    # bool is an int subclass; repr() would render True/False which some
    # backends reject as literals
    assert jdbc.render_bound(True) == "TRUE"
    assert jdbc.render_bound(False) == "FALSE"


def test_quote_ident():
    assert jdbc.quote_ident("daily") == '"daily"'
    assert jdbc.quote_ident('we"ird') == '"we""ird"'
