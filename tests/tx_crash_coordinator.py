"""Coordinator process for the multi-store 2PC crash test: PREPARES an
append into each given store under one transaction, then EXITS WITHOUT
DECIDING — simulating a coordinator crash between phase 1 and the
commit point. The parent test then observes presumed-abort recovery:
the prepared manifests are invisible, the first reader writes the
aborted decision (the coordinator pid embedded in the txid is dead),
and later appends skip the holes.

Usage: tx_crash_coordinator.py <txlog> <root1> <root2>
Prints the txid on stdout so the test can inspect the decision file.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    txlog, roots = sys.argv[1], sys.argv[2:]
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[2]")
             .appName("tx-crash-coordinator")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "2")
             .getOrCreate())
    from etl_pipeline_stock_market_data_postgresql_spark.sources import (
        versioned_store as vstore)

    txid = f"tx-p{os.getpid()}-{next(vstore._COMMIT_SEQ)}"
    print(txid, flush=True)
    df = (spark.range(5000, 5010)
          .select(F.col("id"), F.lit(7).alias("k"),
                  (F.col("id") * 3).alias("x")).coalesce(1))
    for root in roots:  # phase 1 only — then "crash"
        vstore._commit(spark, root, df, carry="prev",
                       stats_cols=("id",),
                       pending_tx=(os.path.abspath(txlog), txid))
    # no decision written: exit hard so the pid dies NOW (spark.stop()
    # plus a clean interpreter exit would also work; os._exit makes the
    # crash unambiguous)
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
