"""SparkSession factory.

Local testing runs one JVM with ``local[N]`` threads; the configs below
are chosen so the same code scales to a multi-executor cluster:

- AQE on (runtime coalesce + skew-join splitting) so shuffle partition
  counts self-correct at 100 TB without re-tuning.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on
  a real cluster AQE's coalescing makes the initial number mostly moot.
- Session timezone pinned to UTC so results are comparable with the
  DuckDB oracle (UTC-naive timestamps) and stable across clusters.
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl_pipeline_stock_market_data_postgresql_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session. ``SPARK_GRAFT_CPUS`` overrides core count."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in sources.tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
