"""Streaming ingest smoke: batch fixtures drive the streaming dedup and
bar-derivation plans to completion via the memory sink."""

from __future__ import annotations

import datetime as dt
import uuid

from etl_pipeline_stock_market_data_postgresql_spark.streaming import ingest


def _write_ticks(spark, path):
    base = dt.datetime(2025, 12, 9, 10, 0, 0)
    rows = []
    for i in range(60):
        rows.append(("AAPL", base + dt.timedelta(minutes=i), 100.0 + i))
    # duplicate PK rows (the overlap-refetch case)
    rows += rows[:10]
    df = spark.createDataFrame(rows, "company_symbol string, ts timestamp, price double")
    df.write.mode("overwrite").parquet(path)
    return df.schema


def test_streaming_dedup_and_bars(spark, tmp_path):
    path = str(tmp_path / "ticks")
    schema = _write_ticks(spark, path)
    stream = ingest.read_stream(spark, path, schema)

    name_d = f"dedup_{uuid.uuid4().hex[:8]}"
    q1 = ingest.run_to_memory(
        ingest.dedup_incremental(stream, ["company_symbol", "ts"], "ts"), name_d)
    try:
        assert spark.sql(f"SELECT count(*) AS n FROM {name_d}").first()["n"] == 60
    finally:
        q1.stop()

    name_b = f"bars_{uuid.uuid4().hex[:8]}"
    q2 = ingest.run_to_memory(
        ingest.bars_from_ticks(stream, "company_symbol", "ts", "price"), name_b)
    try:
        bars = spark.sql(
            f"SELECT * FROM {name_b} ORDER BY bar_start").collect()
        # 60 one-minute ticks -> 12 five-minute windows, but append mode
        # emits only watermark-finalized ones: watermark = max(ts) - 10min
        # = 10:49, closing the 9 windows ending at/before 10:45+5min
        assert len(bars) == 9
        assert bars[0]["low_price"] == 100.0 and bars[0]["high_price"] == 104.0
        # first two windows contain the duplicated ticks (no dedup in the
        # bar derivation itself; chain dedup_incremental upstream for that)
        assert [r["n_ticks"] for r in bars] == [10, 10] + [5] * 7
    finally:
        q2.stop()


def test_stateful_hwm_filter_across_batches(spark, tmp_path):
    """Custom stateful operator: rows at/below a key's stored high-water
    mark are dropped in LATER micro-batches; state persists across
    batches via the state store."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "hwm_src")
    base = dt.datetime(2025, 12, 9, 10, 0, 0)

    def write_batch(rows, name):
        df = spark.createDataFrame(
            rows, "company_symbol string, ts timestamp, price double")
        df.coalesce(1).write.mode("append").parquet(src)

    write_batch([("AAPL", base + dt.timedelta(minutes=m), 1.0 + m)
                 for m in range(5)], "b1")

    schema = spark.read.parquet(src).schema
    stream = ingest.read_stream(spark, src, schema)
    filtered = ingest.stateful_hwm_filter(stream, "company_symbol", "ts")
    name = f"hwm_{uuid.uuid4().hex[:8]}"
    q = (filtered.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        q.processAllAvailable()
        n1 = spark.sql(f"SELECT count(*) AS n FROM {name}").first()["n"]
        assert n1 == 5

        # batch 2: 3 overlapping rows (m 2..4) + 2 new (m 5..6)
        write_batch([("AAPL", base + dt.timedelta(minutes=m), 1.0 + m)
                     for m in range(2, 7)], "b2")
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT * FROM {name} ORDER BY ts").collect()
        assert len(rows) == 7  # 5 + only the 2 strictly-newer rows
        assert [r["price"] for r in rows[-2:]] == [6.0, 7.0]
    finally:
        q.stop()


def test_dedup_within_watermark_suppresses_cross_batch_redelivery(spark, tmp_path):
    """q96's operator contract across micro-batch boundaries: a second
    delivery of the same keys in a LATER micro-batch is suppressed, as
    long as it arrives inside the redelivery horizon (the state the
    watermark has not yet evicted)."""
    import pyspark.sql.functions as F  # noqa: F401

    from etl_pipeline_stock_market_data_postgresql_spark.workload.streaming_exec import (
        REDELIVERY_HORIZON, STREAM_SMALL_STATE_PARTITIONS,
        _run_stream_append_to_files)

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=i), i % 3, "view", float(i))
            for i in range(50)]
    schema_str = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
    src = str(tmp_path / "feed")
    delivery = spark.createDataFrame(rows, schema_str).coalesce(1)
    delivery.write.mode("append").parquet(src)   # delivery 1: one file
    delivery.write.mode("append").parquet(src)   # redelivery: one file

    stream = (spark.readStream.schema(delivery.schema)
              .option("maxFilesPerTrigger", 1)   # one delivery per batch
              .parquet(src))
    deduped = (stream.withWatermark("ts", REDELIVERY_HORIZON)
               .dropDuplicatesWithinWatermark(["event_id"]))
    out = _run_stream_append_to_files(deduped, "t96", str(tmp_path),
                                      STREAM_SMALL_STATE_PARTITIONS)
    got = sorted(r["event_id"] for r in out.collect())
    assert got == list(range(50))  # each key exactly once, dups dropped


def test_state_store_env_knob_resolution(monkeypatch):
    from etl_pipeline_stock_market_data_postgresql_spark import session as S

    for v in ("", "default", "heap", "hdfs"):
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", v)
        assert S.state_store_provider_class() is None
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "RocksDB")
    assert S.state_store_provider_class() == S.ROCKSDB_STATE_PROVIDER
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "bogus")
    import pytest
    with pytest.raises(ValueError, match="SPARK_GRAFT_STATE_STORE"):
        S.state_store_provider_class()


def test_streaming_query_green_under_rocksdb_provider(spark, sf_dir):
    """The beyond-heap knob actually works end-to-end: a stateful
    streaming workload query runs green under RocksDB and produces the
    identical result to the default heap provider. providerClass is a
    runtime conf read at streaming-query start, so flipping it on the
    shared session between runs is exactly how the env knob applies."""
    from etl_pipeline_stock_market_data_postgresql_spark.session import ROCKSDB_STATE_PROVIDER
    from etl_pipeline_stock_market_data_postgresql_spark.workload.streaming_exec import (
        q89_streaming_sliding_window)

    key = "spark.sql.streaming.stateStore.providerClass"
    heap_rows = sorted(map(tuple, q89_streaming_sliding_window(
        spark, sf_dir).collect()))
    spark.conf.set(key, ROCKSDB_STATE_PROVIDER)
    try:
        rocks_rows = sorted(map(tuple, q89_streaming_sliding_window(
            spark, sf_dir).collect()))
    finally:
        spark.conf.unset(key)
    assert rocks_rows == heap_rows and len(rocks_rows) > 0
