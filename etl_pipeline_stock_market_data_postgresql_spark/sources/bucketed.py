"""Bucketed-table storage: co-located (shuffle-free) joins.

The single biggest shuffle eliminator Spark offers for repeated big-big
joins: write both fact tables bucketed (and sorted) on the join key
with the same bucket count, and every subsequent equi-join on that key
is planned WITHOUT an Exchange on either side — each task zips bucket i
of the left table with bucket i of the right. At 100 TB this turns the
nightly orders⨝customer from a full-cluster shuffle into a metadata
decision made at write time, amortized over every downstream query.

Reference parity note: the reference delegates storage layout to
PostgreSQL (tables + indexes, schema.sql); bucketing is the
Spark-native equivalent of "the DBA added the right index" —
a write-time layout contract that queries silently exploit.

Plan expectations (asserted in tests/test_bucketed.py):
- scans show ``SelectedBucketsCount`` / ``Bucketed: true``;
- the join has NO ``Exchange`` below it when both sides share the
  bucket spec;
- with ``sort_cols`` == join key and one file per bucket, the
  per-bucket sort is also elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed on ``bucket_cols``.

    ``path`` makes it an external table (required when the session's
    warehouse dir shouldn't own the data — tests use tmp dirs). One
    output file per bucket comes from repartitioning by the bucket
    columns first, which also makes the per-bucket ``sort_cols`` order
    total within each bucket.
    """
    writer = (df.repartition(n_buckets, *bucket_cols)
              .write.mode(mode).format("parquet")
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   left_on: str, right_on: str,
                   how: str = "inner") -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys. When both
    tables were written with the same bucket count, Catalyst plans this
    with zero Exchange operators — verify with
    ``plans.explain_str(df).count("Exchange") == 0``."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_on] == right[right_on], how)
