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


# Evidence-priority ordering. The external driver's correctness gate runs
# the FIRST 50 entries of ``all_queries()`` in insertion order, so ordering
# is evidence routing: queries that have never had (or lost) a driver
# correctness row must come first. CORRECTNESS_SEEN.md tracks which rounds
# proved which queries; re-derive this list each round so the per-round
# union converges to full coverage. Names listed here are moved to the
# front (in this order); everything else follows in module registration
# order. Unknown names are an error (guards against typos going stale).
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # round-4 window. Never driver-proven: q70's r3 row errored on the
    # 9999-12-31 sentinel (fixed this round: NULL effective_to).
    "q70_scd2_history",
    # new in round 4 (no row possible yet)
    "q82_kmeans_lloyd",
    # outputs CHANGED by the r4 registry consolidation (merged vehicles):
    # q28 gained the in_exact_top3 recall column (absorbed q27); q36 now
    # returns bars+SMA in one result (absorbed q35). Their old green rows
    # no longer certify the current code.
    "q28_ivf_topk", "q36_sma_over_bars",
    # stale: r1+r2 double-green but no r3 row (code unchanged since)
    "q14_group_topn", "q15_set_ops", "q16_rollup", "q17_pivot_status",
    "q18_distinct_agg", "q19_having_heavy_customers", "q20_asof_last_click",
    "q22_sessionization", "q23_dedup_exact", "q24_ngram_jaccard",
    "q25_minhash_lsh", "q26_simhash", "q29_embedding_neardup",
    "q30_langid", "q31_quality_score", "q32_token_stats", "q33_fingerprint",
    "q34_multimodal_meta", "q37_cube", "q38_string_funcs", "q39_percentiles",
    "q40_date_funcs", "q41_correlated_max", "q42_unpivot",
    "q43_array_aggregation", "q44_joinback_avg",
)


def all_queries() -> dict[str, Query]:
    from . import (events_analytics, finance_analytics, pipeline_ops,
                   reference_parity, relational, scalar_functions, similarity,
                   stock_domain, storage, streaming_exec, subqueries_windows,
                   text_dedup, textstats, training_ops)

    merged: dict[str, Query] = {}
    for mod in (reference_parity, relational, events_analytics, text_dedup,
                similarity, textstats, stock_domain, scalar_functions,
                subqueries_windows, streaming_exec, finance_analytics,
                pipeline_ops, training_ops, storage):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)

    missing = [name for name in _EVIDENCE_PRIORITY if name not in merged]
    if missing:
        raise ValueError(f"_EVIDENCE_PRIORITY names not registered: {missing}")
    out: dict[str, Query] = {name: merged[name] for name in _EVIDENCE_PRIORITY}
    out.update((name, q) for name, q in merged.items() if name not in out)
    return out
