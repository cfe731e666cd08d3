"""Storage-layout queries: the write-time contracts (bucketing) that
queries silently exploit, proven under the correctness gate rather than
only in pytest.

q75 runs the full lifecycle inside one gated query: write both join
sides bucketed on the join key, then answer a revenue rollup through
the co-located join. The oracle is the plain SQL join over the raw
parquet — bucketing must be result-invisible; its entire payoff is the
plan (no Exchange below the join, asserted in tests/test_storage.py).
At 100 TB this is the difference between the nightly orders⨝customer
shuffling the full fact table and a metadata decision made once at
write time, amortized over every downstream query.

Reference parity: the reference delegates storage layout to PostgreSQL
(schema.sql tables + PK indexes); bucketing is the Spark-native
equivalent of "the DBA added the right index".
"""

from __future__ import annotations

import getpass
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import Query
from ..sources.bucketed import colocated_join, write_bucketed
from ..sources.tables import load

Q75_BUCKETS = 8


def _scratch_base(sf_dir: str) -> tuple[str, str]:
    """Deterministic per-SF scratch location for the bucketed copies.

    Overwritten on every run (idempotent); keyed by the sf_dir basename
    so gate (sf0.01) and bench (sf0.1) runs never clobber each other,
    and by user (or an explicit SPARK_GRAFT_SCRATCH root) so concurrent
    runs under different accounts on a shared host neither race on the
    overwrite nor squat each other's predictable /tmp subpath. On a real
    cluster this would be a warehouse path — the layout contract, not
    the tmp location, is what the query demonstrates. Lifecycle: the
    copies persist between runs as a cache; delete the directory to
    reclaim space.
    """
    sf_tag = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    root = os.environ.get("SPARK_GRAFT_SCRATCH")
    if not root:
        try:
            user = getpass.getuser()
        except (KeyError, OSError):  # no passwd entry (containers)
            user = f"uid{os.getuid()}"
        root = os.path.join(tempfile.gettempdir(),
                            f"etl_spark_bucketed_{user}")
    return os.path.join(root, sf_tag), sf_tag


def q75_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders/customer bucketed on custkey, return the co-located
    join. Split out so tests can assert the Exchange-free join subtree
    on exactly what the gated query runs."""
    base, sf_tag = _scratch_base(sf_dir)
    t_orders, t_customer = f"b75_orders_{sf_tag}", f"b75_customer_{sf_tag}"
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    write_bucketed(orders, t_orders, ["o_custkey"], Q75_BUCKETS,
                   sort_cols=["o_custkey"], path=os.path.join(base, "orders"))
    write_bucketed(customer, t_customer, ["c_custkey"], Q75_BUCKETS,
                   sort_cols=["c_custkey"], path=os.path.join(base, "customer"))
    return colocated_join(spark, t_orders, t_customer,
                          "o_custkey", "c_custkey")


def q75_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup per market segment answered through the bucketed
    co-located join (see module docstring). DECIMAL sum for exact,
    order-independent cross-engine aggregation."""
    joined = q75_joined(spark, sf_dir)
    rev = F.col("o_totalprice").cast("decimal(18,2)")
    return (joined.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(rev).cast("double").alias("revenue")))


_Q75_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES: dict[str, Query] = {
    "q75_bucketed_join": Query(q75_bucketed_join, _Q75_SQL),
}
