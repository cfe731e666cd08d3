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
    # round-15 window, per the CORRECTNESS_SEEN.md rule (50 names
    # listed EXPLICITLY — the gate checks exactly all_queries()[:50];
    # tiers derived PROGRAMMATICALLY from CORRECTNESS_r*.json).
    # (1) new this round, no driver row possible yet: the change feed
    # as a Structured Streaming source (checkpoint-resumed incremental
    # MV follower), the copy-on-write UPDATE verb, and the
    # merge-on-read UPDATE (deletion vectors + appended postimages),
    # the store as a standard writeStream sink, and source→sink
    # incremental table replication — slots 1-5;
    "q164_streaming_cdf_follower", "q165_versioned_update",
    "q166_versioned_update_mor", "q167_streaming_store_sink",
    "q168_incremental_replication",
    # (2) implementation changed this round (outputs unchanged except
    # q162's history() rows; existing rows prove the OLD paths): every
    # committer now derives its claim and the visible latest from ONE
    # listing (_latest_and_claim) with staleness raises in the MoR
    # delete / metadata / restore paths (q153, q159, q163, q160's
    # history), history() skips vacuumed aborted holes (q162), the
    # pruned and point-lookup read entry points enforce 2PC visibility
    # (q142, q146, q154, q158), and commit_multi_append normalizes
    # txids (q162) — slots 4-12. Queries whose only store interaction
    # is append/read_version keep their r13/r14 rows: the _commit edit
    # collapses two listings into one with identical single-writer
    # behavior, re-proven here through the nine most-affected queries.
    "q162_multi_store_atomic_commit", "q153_versioned_restore",
    "q159_deletion_vectors", "q160_versioned_clone",
    "q163_column_mapping", "q142_ann_store_stats_pruning",
    "q146_ann_multicol_pruning", "q154_versioned_optimize_zorder",
    "q158_bloom_point_lookup",
    # (3) the ENTIRE 28-member r11 tier (the r14 plan's deferrals, in
    # the pre-derived seed order) — slots 13-40; if green, the r11
    # tier EMPTIES;
    "q45_window_suite", "q46_streaming_tumbling",
    "q62_streaming_session_window", "q73_streaming_stream_join",
    "q89_streaming_sliding_window", "q47_sql_exists", "q48_vwap",
    "q49_volatility", "q50_drawdown", "q53_ema", "q54_rsi",
    "q55_bollinger", "q56_range_join", "q57_hierarchical_rollup",
    "q58_stratified_split", "q59_stratum_sample",
    "q60_embedding_centroids", "q64_sequence_packing",
    "q71_rollup_refresh", "q72_policy_redaction", "q78_token_chunks",
    "q79_shuffle_shard", "q91_cdc_apply", "q67_tfidf_topterms",
    "q68_contamination", "q69_domain_mix_sample", "q75_bucketed_join",
    "q133_jsonl_roundtrip",
    # (4) the oldest 8 of the 43-member r12 tier in module order —
    # slots 43-50; the remaining r12-tier queries (plus the r13/r14
    # tiers) fall past the cap: most recently proven, still covered by
    # local parity (tests/test_oracle_parity.py) at sf0.001/sf0.01;
    # they rotate forward in r16.
    "q07_sma_trailing", "q08_multiformat_parse", "q09_decimal_agg",
    "q10_quarantine_counts", "q11_pricing_summary",
    "q12_top_revenue_orders", "q13_region_revenue", "q14_group_topn",
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
