#!/usr/bin/env python
"""Scaling probe: time selected workload queries against one or more
data directories (e.g. sf0.1 vs the 10x/100x sets from
make_scale_data.py) and print one JSON line per (query, dir).

Protocol = BENCH.md's: each measurement is the min of two warm runs
(one untimed warmup run first per dir), full materialization via a noop
write, cache cleared between queries so persisted intermediates can't
leak across timings.

Witness policy (round-7 verdict item 7): some queries exist as EXACT
WITNESSES for a sketch/hierarchical scale path and are deliberately
super-linear — q98's flat broadcast-K argmin witnesses q111, q102's
exact interpolated percentile witnesses q112. Their cost at probe
scale is the cliff their scale-path twin exists to avoid, so probing
them beyond the gate SF measures scaffolding, not the engine. This
harness therefore SKIPS witness queries on any dir whose events
parquet is larger than the gate class unless ``--with-witnesses`` is
given (the skip is printed, never silent).

Usage:
  python scripts/scale_probe.py q111_semantic_dedup_hier q114_global_sort \
      -- /root/testdata/sf0.1 /tmp/scale10
  python scripts/scale_probe.py --all -- /tmp/scale100   # whole registry
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_stock_market_data_postgresql_spark.session import get_spark  # noqa: E402
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries  # noqa: E402


# exact witnesses of a committed scale path: probe at gate SF only
WITNESS_QUERIES = {
    "q98_semantic_dedup": "q111_semantic_dedup_hier",
    "q102_equidepth_histogram": "q112_equidepth_sketch",
    # q29's FIXED 256-bucket sign blocking makes candidate pairs
    # sum(|bucket|^2)/2 ~ n^2/256 — the gate-scale exactness witness of
    # the embedding near-dup family; the corpus-proportional cell path
    # (K ~ n, hierarchical training) is q111, and q28 carries the
    # probed top-k shape (2.8s at 100x)
    "q29_embedding_neardup": "q111_semantic_dedup_hier",
}
_GATE_CLASS_BYTES = 64 * 1024 * 1024  # anything bigger is probe-scale


def _is_probe_scale(d: str) -> bool:
    try:
        return (os.path.getsize(os.path.join(d, "events.parquet"))
                > _GATE_CLASS_BYTES)
    except OSError:
        return False


def _cleanup_between_queries(spark) -> None:
    """Deterministic inter-query state reset. Long-JVM sweeps pollute
    per-query numbers (round-8: q113 43.8s in-sweep vs 14.2s isolated)
    because three things outlive a finished query: cached plans
    (clearCache), streaming state-store providers (unloaded by the
    streaming helpers themselves), and localCheckpoint/broadcast blocks
    whose cleanup is ASYNC — ContextCleaner frees them only after the
    JVM-side RDD is garbage-collected, which needs the Python-side
    reference dropped first. gc.collect() drops the py4j proxies,
    System.gc() lets ContextCleaner see the dead references."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def _run_isolated(name: str, d: str, with_witnesses: bool) -> None:
    """Fresh-JVM-per-query mode: run one (query, dir) in a subprocess —
    the contention-free number, at ~8s JVM startup per query."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), name, "--", d]
    if with_witnesses:
        cmd.insert(2, "--with-witnesses")
    proc = subprocess.run(cmd, capture_output=True, text=True)
    out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not out:
        print(json.dumps({"query": name, "dir": d, "error":
                          (proc.stderr or "no output")[-400:]}), flush=True)
        return
    print(out[-1], flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    with_witnesses = "--with-witnesses" in args
    if with_witnesses:
        args.remove("--with-witnesses")
    isolate = "--isolate" in args
    if isolate:
        args.remove("--isolate")
    split = args.index("--")
    names, dirs = args[:split], args[split + 1:]
    queries = all_queries()
    if "--all" in names:
        if len(names) > 1:
            sys.exit("--all cannot be combined with explicit query names")
        names = list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; see workload.all_queries()")
    if isolate:
        for d in dirs:
            for name in names:
                _run_isolated(name, d, with_witnesses)
        return
    spark = get_spark("scale-probe")
    for d in dirs:
        for name in names:
            if (name in WITNESS_QUERIES and not with_witnesses
                    and _is_probe_scale(d)):
                print(json.dumps({
                    "query": name, "dir": d, "skipped": "witness",
                    "scale_path": WITNESS_QUERIES[name]}), flush=True)
                continue
            fn = queries[name].spark_fn
            best = None
            for attempt in range(3):  # 1 warmup + 2 timed
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if attempt > 0:
                    best = dt if best is None else min(best, dt)
                _cleanup_between_queries(spark)
            print(json.dumps({"query": name, "dir": d,
                              "sec": round(best, 2)}), flush=True)


if __name__ == "__main__":
    main()
