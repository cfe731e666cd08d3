"""JDBC source/sink wrappers (reference-parity with its PostgreSQL
backend — SURVEY.md §2.1 S4, §2.2 K2/K3).

Spark's JDBC writer has no upsert mode; ``append`` re-runs would
violate the reference's PKs. The idempotent path mirrors the parquet
sink: read the target keys (pushing the batch's key-range predicate
down to the database), anti-join, append only the delta — the same
read-modify-write the reference's ``ON CONFLICT DO NOTHING`` performs
inside the DB, done engine-side.

No PostgreSQL server or JDBC driver jar exists in this environment, so
``read_table``/``append`` are thin wrappers exercised via injected
fakes (tests/test_jdbc.py); the merge logic itself
(``idempotent_append``) is fully executed in tests against
DataFrame-backed targets.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import upsert


def quote_ident(name: str) -> str:
    """ANSI-quote an identifier (doubles embedded quotes). Table/column
    names reaching SQL text must never be interpolated raw — config is
    an injection surface like any other input."""
    return '"' + name.replace('"', '""') + '"'


def render_bound(value) -> str:
    """Render a lower-bound value as a standard, unambiguous SQL
    literal. Python ``str()`` of datetime/Decimal is not guaranteed to
    parse in every backend; typed ANSI literals are.

    Soundness notes (this literal PRUNES the probe scan, so rendering a
    value larger than the true minimum re-appends existing PKs):

    - tz-aware datetimes are normalized to UTC and rendered as
      ``TIMESTAMP WITH TIME ZONE ... +00:00`` — dropping tzinfo would
      render a naive literal the server interprets in ITS zone, which
      can exceed the true minimum and over-prune.
    - ``bool`` is an ``int`` subclass: rendered as TRUE/FALSE, not
      repr(), which some backends reject as a literal.
    """
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            utc = value.astimezone(_dt.timezone.utc)
            return ("TIMESTAMP WITH TIME ZONE "
                    f"'{utc.strftime('%Y-%m-%d %H:%M:%S.%f')}+00:00'")
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def read_table(spark: SparkSession, url: str, table: str,
               predicate: str | None = None, **options) -> DataFrame:
    """Scan a JDBC table, pushing ``predicate`` into the remote query so
    the database — not Spark — does the filtering (the JDBC twin of
    parquet min/max pruning)."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", f"(SELECT * FROM {quote_ident(table)}"
                                 + (f" WHERE {predicate}" if predicate else "")
                                 + ") AS t"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def append(df: DataFrame, url: str, table: str, batchsize: int = 10_000,
           **options) -> None:
    """Plain batched append (reference K2 ``execute_batch``,
    ``main_parallel.py:142-161`` — executemany + one commit per batch)."""
    writer = (df.write.format("jdbc").mode("append")
              .option("url", url)
              .option("dbtable", quote_ident(table))
              .option("batchsize", str(batchsize)))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def idempotent_append(spark: SparkSession, batch: DataFrame, url: str,
                      table: str, pk_cols: list[str],
                      time_col: str | None = None,
                      time_determined_by_pk: bool = False,
                      target_reader: Callable[[str | None], DataFrame] | None = None,
                      target_writer: Callable[[DataFrame], None] | None = None,
                      **options) -> int:
    """Conflict-ignoring append to a JDBC table (reference K3). Returns
    rows written.

    ``target_reader(predicate)`` / ``target_writer(delta)`` default to
    the real JDBC scan/append and exist so the read-anti-join-write
    logic is executable (and tested) without a live database.

    The delta is persisted across the count + write actions: without it
    the anti-join would re-read the remote target per action, and the
    two reads could observe different target states under a concurrent
    writer. Note the reference serializes writers per (symbol, endpoint)
    task; under concurrent writers this read-modify-write still has the
    same race its backends avoided via DB constraints — callers needing
    strict safety should keep the DB PK as a backstop."""
    if time_col is not None and time_col not in pk_cols and not time_determined_by_pk:
        raise ValueError(
            f"time-range pruning on {time_col!r} requires it to be part of "
            f"pk_cols {pk_cols}, or time_determined_by_pk=True (see "
            "operators.upsert.antijoin_new_rows)")
    if target_reader is None:
        target_reader = lambda pred: read_table(spark, url, table, pred, **options)
    if target_writer is None:
        target_writer = lambda delta: append(delta, url, table, **options)

    predicate = None
    if time_col is not None:
        bounds = batch.agg({time_col: "min"}).first()
        if bounds and bounds[0] is not None:
            predicate = f"{quote_ident(time_col)} >= {render_bound(bounds[0])}"
    target_keys = target_reader(predicate).select(*pk_cols)
    delta = (upsert.dedup_within_batch(batch, pk_cols)
             .join(target_keys, pk_cols, "left_anti")
             .persist())
    try:
        n = delta.count()
        if n:
            target_writer(delta)
    finally:
        delta.unpersist()
    return n
