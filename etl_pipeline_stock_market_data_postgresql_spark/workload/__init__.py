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
    # round-5 window. The driver REGENERATED the testdata mid-r4 (new
    # parquet time encoding), so only r4 rows certify on current data.
    # First: never-proven (new in r5) — span-level duplicate profiling,
    # count-min heavy hitters, retention cohorts, cluster purity,
    # full-outer reconciliation, sliding windows.
    "q83_duplicate_spans", "q84_heavy_hitters", "q85_retention_cohorts",
    "q86_cluster_purity", "q87_full_outer_reconciliation",
    "q88_sliding_window_stats", "q89_streaming_sliding_window",
    "q90_gapfill_locf", "q91_cdc_apply", "q92_time_range_window",
    # Then the three queries the TIMESTAMP_NTZ encoding actually broke
    # (q22 red in CORRECTNESS_r04; q56/q73 erroring in BENCH_r04) —
    # fixed in sources/tables.py (inferTimestampNTZ off + NTZ cast).
    "q22_sessionization", "q56_range_join", "q73_streaming_stream_join",
    # Then the 27 other queries whose newest green row is r3
    # (pre-regeneration data): they ran green in BENCH_r04 but need a
    # correctness row on the regenerated data.
    "q45_window_suite", "q46_streaming_tumbling", "q47_sql_exists",
    "q48_vwap", "q49_volatility", "q50_drawdown",
    "q53_ema", "q54_rsi", "q55_bollinger",
    "q57_hierarchical_rollup", "q58_stratified_split", "q59_stratum_sample",
    "q60_embedding_centroids", "q62_streaming_session_window",
    "q63_quality_gate", "q64_sequence_packing",
    "q67_tfidf_topterms", "q68_contamination", "q69_domain_mix_sample",
    "q71_rollup_refresh", "q72_policy_redaction", "q74_multimodal_decode",
    "q75_bucketed_join", "q76_repetition_stats",
    "q78_token_chunks", "q79_shuffle_shard", "q81_kmeans_step",
    # Fill to the driver's 50-query cap with r4-green queries (all
    # already proven on the regenerated data); the 39 past the cap are
    # likewise r4-green, so a fully-green r5 completes the union on
    # current data.
    "q01_topk_latest", "q02_watermark_read", "q03_incremental_filter",
    "q04_antijoin_new_keys", "q05_semijoin_members", "q06_idempotent_merge",
    "q07_sma_trailing", "q08_multiformat_parse", "q09_decimal_agg",
    "q10_quarantine_counts",
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
