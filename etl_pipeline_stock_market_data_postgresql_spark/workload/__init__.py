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
    # round-12 window, per the CORRECTNESS_SEEN.md rule (50 names
    # listed EXPLICITLY — the gate checks exactly all_queries()[:50]).
    # (1) new this round, no driver row possible yet: the versioned-
    # store copy-on-write delete, the frozen-model drift measure, the
    # retrain->re-encode->rewrite cutover with time travel, the
    # multi-column manifest-stats pruned read, the copy-on-write MERGE
    # (upsert), schema enforcement + evolution, and the manifest-
    # derived change data feed — slots 1-7;
    "q143_ann_versioned_delete", "q144_ann_model_drift",
    "q145_ann_retrain_cutover", "q146_ann_multicol_pruning",
    "q147_versioned_merge", "q148_versioned_schema_evolution",
    "q149_versioned_change_feed",
    # (2) implementation changed this round (outputs unchanged; their
    # r11/r10 rows prove the OLD at-least-once sinks): q140/q122 now
    # commit through txn-keyed versioned-store appends (exactly-once
    # under micro-batch replay, the r11 verdict's task 1) — slots 8-9;
    "q140_streaming_ann_ingest", "q122_streaming_incremental_dedup",
    # (3) the ENTIRE r8 tier in module order (40 queries whose newest
    # green row is r8) — emptying it was the pre-derived r12 plan;
    # q07-q13 were displaced from the r11 window by that round's
    # additions — slots 10-49;
    "q07_sma_trailing", "q08_multiformat_parse", "q09_decimal_agg",
    "q10_quarantine_counts", "q11_pricing_summary",
    "q12_top_revenue_orders", "q13_region_revenue", "q14_group_topn",
    "q15_set_ops", "q16_rollup", "q17_pivot_status", "q18_distinct_agg",
    "q19_having_heavy_customers", "q20_asof_last_click",
    "q52_multiset_ops", "q100_table_profile", "q102_equidepth_histogram",
    "q104_key_uniqueness", "q107_bloom_join", "q22_sessionization",
    "q65_salted_distinct", "q66_salted_join", "q77_funnel",
    "q80_hll_distinct", "q95_quantile_sketch", "q99_anomaly_zscore",
    "q105_histogram_drift", "q23_dedup_exact", "q24_ngram_jaccard",
    "q25_minhash_lsh", "q26_simhash", "q117_dedup_span_removal",
    "q94_learned_ivf", "q98_semantic_dedup", "q109_sq8_quantization",
    "q30_langid", "q31_quality_score", "q115_bpe_train",
    "q116_trained_quality_scorer", "q118_small_file_compaction",
    # (4) oldest-r10 fill in module order to the 50-cap — slot 50.
    # The remaining 48 r10-tier (q112/q125/q128 onward) and all 50
    # r11-tier queries fall past the cap: most recently proven, still
    # covered by local parity (tests/test_oracle_parity.py runs the
    # identical comparison on every registered query, plus the sf0.01
    # driver-scale bridge for the oldest tier); they rotate forward in
    # r13.
    "q87_full_outer_reconciliation",
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
