"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the beyond-reference dedup/similarity/text-analysis workload;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (all queries
are SQL-expressible; none fall back to the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's one documented analytical query,
    README_duckdb.md:78-84 — top-k latest per predicate) on sf0.001."""
    from etl_pipeline_stock_market_data_postgresql_spark.workload.reference_parity import q01_topk_latest

    return q01_topk_latest(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
