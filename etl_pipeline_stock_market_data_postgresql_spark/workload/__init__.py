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
    # round-8 window. After r7 every registered query's newest green
    # driver row is r5-or-newer (the r4 tier is empty). This round,
    # per the CORRECTNESS_SEEN.md rule: (1)+(2) the five queries new
    # in r8 (never proven by the driver) — BPE tokenizer training,
    # ridge-trained quality scorer, duplicate-span removal, small-file
    # compaction, BPE encoding;
    "q115_bpe_train", "q116_trained_quality_scorer",
    "q117_dedup_span_removal", "q118_small_file_compaction",
    "q119_bpe_encode",
    # (3) the 11 queries whose newest green row is oldest (r5):
    # q92 + q01–q10 (their r6-window deferral is documented in
    # CORRECTNESS_SEEN.md);
    "q92_time_range_window",
    "q01_topk_latest", "q02_watermark_read", "q03_incremental_filter",
    "q04_antijoin_new_keys", "q05_semijoin_members",
    "q06_idempotent_merge", "q07_sma_trailing",
    "q08_multiformat_parse", "q09_decimal_agg", "q10_quarantine_counts",
    # then 34 of the 50-member r6 tier in module order; the trailing
    # 16 of that tier (q32/q33/q36/q40/q41/q43/q44/q96/q106/q108/q70/
    # q97/q101/q103/q93/q110) plus the 50 re-proven in r7 fall past
    # the cap — they are the most recently proven and stay covered by
    # local parity (tests/test_oracle_parity.py runs the identical
    # comparison on every registered query).
    "q11_pricing_summary", "q12_top_revenue_orders", "q13_region_revenue",
    "q14_group_topn", "q15_set_ops", "q16_rollup", "q17_pivot_status",
    "q18_distinct_agg", "q19_having_heavy_customers", "q20_asof_last_click",
    "q52_multiset_ops", "q100_table_profile", "q102_equidepth_histogram",
    "q104_key_uniqueness", "q107_bloom_join", "q22_sessionization",
    "q65_salted_distinct", "q66_salted_join", "q77_funnel",
    "q80_hll_distinct", "q95_quantile_sketch", "q99_anomaly_zscore",
    "q105_histogram_drift", "q23_dedup_exact", "q24_ngram_jaccard",
    "q25_minhash_lsh", "q26_simhash", "q51_lsh_verified_neardup",
    "q61_dedup_clusters", "q94_learned_ivf", "q98_semantic_dedup",
    "q109_sq8_quantization", "q30_langid", "q31_quality_score",
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
