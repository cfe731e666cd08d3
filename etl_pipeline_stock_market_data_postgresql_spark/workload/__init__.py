"""Query workload registry.

Each workload module exposes ``QUERIES: dict[str, Query]`` where a
``Query`` bundles the Spark implementation (``(spark, sf_dir) ->
DataFrame``) and, when ANSI-SQL-expressible, the equivalent DuckDB
oracle SQL over the pre-registered testdata views. The driver's
correctness gate runs both sides and hash-compares (CORRECTNESS_r{N});
``tests/test_oracle_parity.py`` runs the same comparison locally.

Determinism rules used throughout (so the order-insensitive value-hash
matches across engines):
- every computed column is aliased identically on both sides;
- double SUMs go through DECIMAL casts (exact, order-independent) and
  are cast back to DOUBLE at the end; AVG = decimal-sum / count in
  double;
- window frames are total-ordered (unique tiebreak column);
- top-k queries break ties on a unique key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check


def all_queries() -> dict[str, Query]:
    from . import (events_analytics, finance_analytics, pipeline_ops,
                   reference_parity, relational, scalar_functions, similarity,
                   stock_domain, streaming_exec, subqueries_windows,
                   text_dedup, textstats)

    out: dict[str, Query] = {}
    for mod in (reference_parity, relational, events_analytics, text_dedup,
                similarity, textstats, stock_domain, scalar_functions,
                subqueries_windows, streaming_exec, finance_analytics,
                pipeline_ops):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
