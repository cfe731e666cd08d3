"""A query that actually EXECUTES through Structured Streaming inside
the driver gate: the events parquet is consumed as a stream
(availableNow micro-batches), aggregated with the streaming tumbling-
window operator in complete output mode, and the materialized result is
returned — hash-matching the same plain-SQL aggregation. Proves the
batch/stream unification claim (SURVEY.md §2.9) with the correctness
gate, not just unit tests."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def q46_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory: stream the sf dir with a
    # glob filter selecting just the events file
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    if dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))

    agg = (stream.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double").alias("sum_value"))
           .select(F.col("w.start").alias("bucket_start"), "event_type",
                   "n_events", "sum_value"))

    name = f"q46_out_{uuid.uuid4().hex[:10]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


_Q46_SQL = """
SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP) AS bucket_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

from . import Query  # noqa: E402

QUERIES: dict[str, Query] = {
    "q46_streaming_tumbling": Query(q46_streaming_tumbling, _Q46_SQL),
}
