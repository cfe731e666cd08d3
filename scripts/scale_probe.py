#!/usr/bin/env python
"""Scaling probe: time selected workload queries against one or more
data directories (e.g. sf0.1 vs the 10x/100x sets from
make_scale_data.py) and print one JSON line per (query, dir).

Protocol = BENCH.md's: each measurement is the min of two warm runs
(one untimed warmup run first per dir), full materialization via a noop
write, cache cleared between queries so persisted intermediates can't
leak across timings.

Usage:
  python scripts/scale_probe.py q111_semantic_dedup_hier q114_global_sort \
      -- /root/testdata/sf0.1 /tmp/scale10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_stock_market_data_postgresql_spark.session import get_spark  # noqa: E402
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries  # noqa: E402


def main() -> None:
    split = sys.argv.index("--")
    names, dirs = sys.argv[1:split], sys.argv[split + 1:]
    queries = all_queries()
    spark = get_spark("scale-probe")
    for d in dirs:
        for name in names:
            fn = queries[name].spark_fn
            best = None
            for attempt in range(3):  # 1 warmup + 2 timed
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if attempt > 0:
                    best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            print(json.dumps({"query": name, "dir": d,
                              "sec": round(best, 2)}), flush=True)


if __name__ == "__main__":
    main()
