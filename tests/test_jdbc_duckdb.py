"""JDBC merge semantics proven against a second SQL engine, without a
network: DuckDB stands in for the remote database.

tests/test_jdbc.py exercises the read → anti-join → write pipeline with
injected DataFrame fakes; this file closes the remaining gap the fakes
can't — that the SQL text the merge path emits (quoted identifiers +
the typed-literal pushdown predicate from ``jdbc.render_bound``) is
actually executable by a real engine, and that the end state of our
engine-side merge is byte-identical to what the reference's
``INSERT ... ON CONFLICT DO NOTHING`` (``main_parallel.py:127-140``)
produces inside the database — DuckDB's ``INSERT OR IGNORE`` is the
same conflict-ignoring semantics on a declared primary key.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from etl_pipeline_stock_market_data_postgresql_spark.sources import jdbc

PK = ["company_symbol", "date"]
COLS = ["company_symbol", "date", "close_price"]
DDL = """
CREATE TABLE daily (
  company_symbol VARCHAR,
  date DATE,
  close_price DOUBLE,
  PRIMARY KEY (company_symbol, date)
)
"""

ROWS_TARGET = [
    ("AAPL", dt.date(2024, 1, 1), 100.0),
    ("AAPL", dt.date(2024, 1, 2), 101.0),
    ("MSFT", dt.date(2024, 1, 1), 200.0),
]
ROWS_BATCH = [
    ("AAPL", dt.date(2024, 1, 2), 999.0),   # PK conflict -> dropped
    ("AAPL", dt.date(2024, 1, 3), 102.0),   # new
    ("MSFT", dt.date(2024, 1, 2), 201.0),   # new
]


class DuckTarget:
    """The 'remote database' side of idempotent_append, backed by an
    embedded DuckDB with a real PRIMARY KEY. ``read`` executes the
    merge path's pushdown predicate VERBATIM as SQL — if render_bound
    emits a literal a real engine can't parse, this test fails where
    the fakes stayed green."""

    def __init__(self, spark, con):
        self.spark = spark
        self.con = con
        self.predicates: list[str | None] = []

    def read(self, predicate):
        self.predicates.append(predicate)
        sql = "SELECT * FROM daily"
        if predicate:
            sql += f" WHERE {predicate}"
        rows = self.con.execute(sql).fetchall()
        return self.spark.createDataFrame(rows, COLS) if rows else \
            self.spark.createDataFrame([], "company_symbol string, date date, close_price double")

    def write(self, delta):
        self.con.executemany(
            "INSERT INTO daily VALUES (?, ?, ?)",
            [tuple(r) for r in delta.collect()])

    def state(self):
        return sorted(self.con.execute("SELECT * FROM daily").fetchall())


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(DDL)
    c.executemany("INSERT INTO daily VALUES (?, ?, ?)", ROWS_TARGET)
    yield c
    c.close()


def test_merge_matches_native_on_conflict_do_nothing(spark, con):
    """Our engine-side anti-join merge must land the exact final state
    the reference gets from the database's own conflict-ignoring
    insert."""
    target = DuckTarget(spark, con)
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    n = jdbc.idempotent_append(
        spark, batch, "jdbc:duckdb://embedded", "daily", PK,
        time_col="date",
        target_reader=target.read, target_writer=target.write)
    assert n == 2

    # Reference semantics, run natively in a second engine.
    oracle = duckdb.connect()
    oracle.execute(DDL)
    oracle.executemany("INSERT INTO daily VALUES (?, ?, ?)", ROWS_TARGET)
    oracle.executemany(
        "INSERT OR IGNORE INTO daily VALUES (?, ?, ?)", ROWS_BATCH)
    expected = sorted(oracle.execute("SELECT * FROM daily").fetchall())
    oracle.close()

    assert target.state() == expected


def test_pushdown_predicate_executes_and_prunes(spark, con):
    """The min-time pushdown predicate must (a) parse in a real engine
    and (b) prune rows below the batch minimum from the probe scan."""
    target = DuckTarget(spark, con)
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    jdbc.idempotent_append(
        spark, batch, "jdbc:duckdb://embedded", "daily", PK,
        time_col="date",
        target_reader=target.read, target_writer=target.write)
    [pred] = target.predicates
    assert pred is not None and '"date" >= DATE ' in pred
    # Predicate executed against the PRE-write state prunes 2024-01-01
    # (below the batch min) but keeps the conflicting 2024-01-02 row.
    probe = duckdb.connect()
    probe.execute(DDL)
    probe.executemany("INSERT INTO daily VALUES (?, ?, ?)", ROWS_TARGET)
    pruned = probe.execute(f"SELECT * FROM daily WHERE {pred}").fetchall()
    probe.close()
    assert sorted(r[1] for r in pruned) == [dt.date(2024, 1, 2)]


def test_rerun_is_noop_against_live_engine(spark, con):
    """Second application of the same batch writes zero rows — the
    idempotence contract, proven against the engine-held state."""
    target = DuckTarget(spark, con)
    batch = spark.createDataFrame(ROWS_BATCH, COLS)
    n1 = jdbc.idempotent_append(
        spark, batch, "jdbc:duckdb://embedded", "daily", PK,
        time_col="date",
        target_reader=target.read, target_writer=target.write)
    state_after_first = target.state()
    n2 = jdbc.idempotent_append(
        spark, batch, "jdbc:duckdb://embedded", "daily", PK,
        time_col="date",
        target_reader=target.read, target_writer=target.write)
    assert (n1, n2) == (2, 0)
    assert target.state() == state_after_first
