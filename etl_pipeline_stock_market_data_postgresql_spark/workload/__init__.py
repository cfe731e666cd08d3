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
    # round-7 window. After r6 every registered query has a green
    # driver row on the current testdata (r4∪r5∪r6 union). This round,
    # per the CORRECTNESS_SEEN.md rule: (1) the eight queries whose
    # newest green row is still r4 (deferred from the r6 window);
    "q28_ivf_topk", "q29_embedding_neardup", "q34_multimodal_meta",
    "q37_cube", "q38_string_funcs", "q39_percentiles", "q42_unpivot",
    "q82_kmeans_lloyd",
    # (2) the four queries new in r7 (never proven by the driver) —
    # hierarchical SemDeDup, sketch-fed equi-depth histogram, IVF-PQ
    # with ADC scoring, global range-partitioned sort;
    "q111_semantic_dedup_hier", "q112_equidepth_sketch",
    "q113_ivfpq_adc", "q114_global_sort",
    # (3) 38 of the 49 queries whose newest green row is r5, oldest
    # module-order first (q45–q50, q53–q60, q62–q64, q67–q69,
    # q71–q76, q78/q79/q81, q83–q91). q92 and q01–q10 (r5 rows) plus
    # the 50 re-proven in r6 fall past the cap — they are the most
    # recently proven and stay covered by local parity
    # (tests/test_oracle_parity.py runs the identical comparison on
    # every registered query).
    "q45_window_suite", "q46_streaming_tumbling", "q47_sql_exists",
    "q48_vwap", "q49_volatility", "q50_drawdown",
    "q53_ema", "q54_rsi", "q55_bollinger", "q56_range_join",
    "q57_hierarchical_rollup", "q58_stratified_split",
    "q59_stratum_sample", "q60_embedding_centroids",
    "q62_streaming_session_window", "q63_quality_gate",
    "q64_sequence_packing",
    "q67_tfidf_topterms", "q68_contamination", "q69_domain_mix_sample",
    "q71_rollup_refresh", "q72_policy_redaction",
    "q73_streaming_stream_join", "q74_multimodal_decode",
    "q75_bucketed_join", "q76_repetition_stats",
    "q78_token_chunks", "q79_shuffle_shard", "q81_kmeans_step",
    "q83_duplicate_spans", "q84_heavy_hitters", "q85_retention_cohorts",
    "q86_cluster_purity", "q87_full_outer_reconciliation",
    "q88_sliding_window_stats", "q89_streaming_sliding_window",
    "q90_gapfill_locf", "q91_cdc_apply",
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
