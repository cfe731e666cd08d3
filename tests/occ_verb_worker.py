"""Worker process for the round-14 cross-process OCC races: builds its
OWN SparkSession (a genuinely separate driver JVM), stages at a file
barrier so both workers' commit windows overlap, then runs ONE store
verb. Non-commuting verbs (MoR delete, restore) wrap their attempt in
a re-deriving retry loop and report how many ConcurrentCommitError
losses they absorbed — the test asserts the final store state is
exactly what sequential execution in EITHER order produces (no lost
rows, no resurrections), which is the OCC contract.

Usage: occ_verb_worker.py <store_root> <barrier_path> <idx> <verb>
Verbs: append | mor_delete | restore1 | purge | clone
The worker touches <barrier>.ready.<idx> and waits for <barrier>.go.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    root, barrier, idx, verb = (sys.argv[1], sys.argv[2],
                                int(sys.argv[3]), sys.argv[4])
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[2]")
             .appName(f"occ-verb-{verb}")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "2")
             .getOrCreate())
    from etl_pipeline_stock_market_data_postgresql_spark.sources import (
        versioned_store as vstore)

    def op():
        if verb == "append":
            df = (spark.range(2000, 2025)
                  .select(F.col("id"), F.lit(9).alias("k"),
                          (F.col("id") * 3).alias("x"))
                  .coalesce(1))
            return vstore.commit_append(spark, root, df)
        if verb == "mor_delete":
            # victims confined to the BASE id range, so the final
            # content is order-independent vs the concurrent append
            return vstore.commit_delete_mor(
                spark, root, (F.col("id") < 100) & (F.col("id") % 3 == 0),
                txn=None)
        if verb == "mor_low":
            # victims confined to the LOW id-range file of the
            # 4-file range-clustered base — disjoint from mor_high, so
            # the CAS loser REBASES (file-granularity OCC) instead of
            # restaging; zero absorbed conflicts expected
            return vstore.commit_delete_mor(
                spark, root, (F.col("id") < 40) & (F.col("id") % 2 == 0),
                txn=None)
        if verb == "mor_high":
            return vstore.commit_delete_mor(
                spark, root,
                (F.col("id") >= 160) & (F.col("id") % 2 == 0),
                txn=None)
        if verb == "restore1":
            return vstore.restore(spark, root, 1)
        if verb == "purge":
            return vstore.purge_deletion_vectors(spark, root,
                                                 stats_cols=("id",))
        if verb == "clone":
            return vstore.clone(root, root + "_clone")
        raise ValueError(verb)

    open(f"{barrier}.ready.{idx}", "w").close()
    deadline = time.time() + 240
    while not os.path.exists(f"{barrier}.go"):
        if time.time() > deadline:
            print("barrier timeout", file=sys.stderr)
            return 2
        time.sleep(0.05)

    conflicts = 0
    last = None
    for _ in range(10):
        try:
            op()
            last = None
            break
        except vstore.ConcurrentCommitError as e:
            conflicts += 1  # stale snapshot: re-derive from the new
            last = e        # latest on the next attempt
    if last is not None:
        print(f"worker {idx} gave up after {conflicts} conflicts: {last}",
              file=sys.stderr)
        return 3
    print(f"worker {idx} verb={verb} conflicts={conflicts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
