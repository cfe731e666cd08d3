#!/usr/bin/env python
"""Isolated per-query measurement + plan capture (guide §1).

Usage:  python scripts/isolate.py [--plans DIR] [--reps N] q61_dedup_clusters [...]

Fresh JVM per invocation; q09 warmup (same as bench.py); each named
query is timed ``--reps`` times end-to-end (spark_fn + noop sink — the
bench methodology) and its final-DataFrame ``explain('formatted')`` is
written to ``--plans DIR/<name>.txt`` when asked. Prints one JSON line
per query: {"name":..., "times":[...], "best":...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_stock_market_data_postgresql_spark.session import get_spark
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt explain output")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("isolate")
    qs = all_queries()
    try:
        qs["q09_decimal_agg"].spark_fn(spark, args.sf_dir).write.format(
            "noop").mode("overwrite").save()
    except Exception as ex:
        print(f"warmup failed: {ex}", file=sys.stderr)

    for name in args.names:
        q = qs[name]
        times = []
        df = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            df = q.spark_fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        if args.plans and df is not None:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({"name": name, "times": times,
                          "best": min(times)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
