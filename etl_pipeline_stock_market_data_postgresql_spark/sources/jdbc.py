"""JDBC source/sink wrappers (reference-parity with its PostgreSQL
backend — SURVEY.md §2.1 S4, §2.2 K2/K3).

Spark's JDBC writer has no upsert mode; ``append`` re-runs would
violate the reference's PKs. The idempotent path mirrors the parquet
sink: read the target keys (pushing the batch's key-range predicate
down to the database), anti-join, append only the delta — the same
read-modify-write the reference's ``ON CONFLICT DO NOTHING`` performs
inside the DB, done engine-side.

No PostgreSQL server or JDBC driver jar exists in this environment, so
these are thin, untested-against-a-live-DB wrappers; the logic they
delegate to (operators.upsert) is fully tested on parquet targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import upsert


def read_table(spark: SparkSession, url: str, table: str,
               predicate: str | None = None, **options) -> DataFrame:
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", f"(SELECT * FROM {table}"
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
              .option("dbtable", table)
              .option("batchsize", str(batchsize)))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def idempotent_append(spark: SparkSession, batch: DataFrame, url: str,
                      table: str, pk_cols: list[str],
                      time_col: str | None = None, **options) -> int:
    """Conflict-ignoring append to a JDBC table (reference K3). Returns
    rows written. Note the reference serializes writers per
    (symbol, endpoint) task; under concurrent writers this
    read-modify-write has the same race its backends avoided via DB
    constraints — callers needing strict safety should keep the DB PK
    as a backstop."""
    predicate = None
    if time_col is not None:
        bounds = batch.agg({time_col: "min"}).first()
        if bounds and bounds[0] is not None:
            predicate = f"{time_col} >= '{bounds[0]}'"
    target_keys = read_table(spark, url, table, predicate, **options).select(*pk_cols)
    delta = upsert.dedup_within_batch(batch, pk_cols).join(
        target_keys, pk_cols, "left_anti")
    n = delta.count()
    if n:
        append(delta, url, table, **options)
    return n
