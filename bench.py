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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    # untimed warmup: JVM/codegen spin-up must not be charged to the
    # alphabetically-first query
    warm = all_queries()["q09_decimal_agg"]
    warm.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    queries = all_queries()
    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "workload_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
