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
    # round-14 window, per the CORRECTNESS_SEEN.md rule (50 names
    # listed EXPLICITLY — the gate checks exactly all_queries()[:50];
    # tiers derived PROGRAMMATICALLY from CORRECTNESS_r*.json).
    # (1) new this round, no driver row possible yet: the KEYLESS
    # typed change feed via row tracking, the atomic cross-store
    # commit (2PC over the manifest CAS), and column mapping
    # (metadata-only RENAME/DROP COLUMN) — slots 1-3;
    "q161_row_tracking_cdf", "q162_multi_store_atomic_commit",
    "q163_column_mapping",
    # (2) implementation changed this round (outputs unchanged; their
    # r13/r12 rows prove the OLD code paths): the copy-on-write
    # delete/merge victim re-read moved to the shared row-id-aware
    # _logical_rows, version_diff was refactored around the row-id
    # engine, deletion-vector construction moved executor-side with a
    # distributed read path, restore gained the sidecar horizon check,
    # OPTIMIZE/compaction branch on row tracking, and q158's probes
    # dedupe — slots 4-14 (module order). Queries whose only commit
    # path is a plain append (q110/q118/q120/q122/q137/q140/q141/
    # q145/q148/q155-q157) are untouched by these edits — the staged
    # constraint validation is a no-op on constraint-less stores —
    # and keep their r12/r13 rows.
    "q143_ann_versioned_delete", "q149_versioned_change_feed",
    "q147_versioned_merge", "q150_versioned_cdf_typed",
    "q151_versioned_conditional_merge", "q152_incremental_mv_from_cdf",
    "q153_versioned_restore", "q154_versioned_optimize_zorder",
    "q158_bloom_point_lookup", "q159_deletion_vectors",
    "q160_versioned_clone",
    # (3) the 16-member r10 tier, in module order (the r13 plan's
    # deferrals) — slots 15-30; if green, the r10 tier EMPTIES;
    "q96_streaming_dedup", "q106_streaming_stateful_hwm", "q108_twap",
    "q129_pareto_frontier", "q132_token_budget_fill",
    "q70_scd2_history", "q97_bm25_ranking", "q101_bigram_novelty",
    "q103_scd2_pit_enrichment", "q119_bpe_encode", "q121_dsir_weights",
    "q130_importance_resample", "q124_lm_perplexity",
    "q93_zorder_pruning", "q110_dynamic_partition_overwrite",
    "q127_schema_evolution",
    # (4) the oldest 20 of the 48-member r11 tier in module order —
    # slots 31-50; the remaining 28 r11-tier queries (plus the r12/r13
    # tiers) fall past the cap: most recently proven, still covered by
    # local parity (tests/test_oracle_parity.py) at sf0.001/sf0.01;
    # they rotate forward in r15.
    "q01_topk_latest", "q02_watermark_read", "q03_incremental_filter",
    "q04_antijoin_new_keys", "q05_semijoin_members",
    "q06_idempotent_merge", "q135_pagerank_convergence",
    "q136_kcore_converged", "q92_time_range_window",
    "q134_incremental_ann", "q137_ann_index_writeback",
    "q138_ann_store_probe", "q139_ann_store_delete",
    "q142_ann_store_stats_pruning", "q34_multimodal_meta",
    "q74_multimodal_decode", "q37_cube", "q38_string_funcs",
    "q39_percentiles", "q42_unpivot",
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
