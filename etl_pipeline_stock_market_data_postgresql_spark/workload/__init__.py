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
    # round-13 window, per the CORRECTNESS_SEEN.md rule (50 names
    # listed EXPLICITLY — the gate checks exactly all_queries()[:50];
    # tiers derived PROGRAMMATICALLY from CORRECTNESS_r*.json).
    # (1) new this round, no driver row possible yet: the typed change
    # data feed (_change_type classification by key), the conditional /
    # column-subset MERGE, the incremental materialized-view
    # maintenance loop over the typed feed, RESTORE-to-version,
    # OPTIMIZE ZORDER on the store, the portable HLL register / KMV
    # theta sketches, incremental sketch maintenance in the store,
    # bloom-sidecar point lookups, merge-on-read DELETE via deletion
    # vectors, and zero-copy shallow CLONE — slots 1-11;
    "q150_versioned_cdf_typed", "q151_versioned_conditional_merge",
    "q152_incremental_mv_from_cdf", "q153_versioned_restore",
    "q154_versioned_optimize_zorder", "q155_portable_hll_registers",
    "q156_portable_kmv_theta", "q157_versioned_sketch_maintenance",
    "q158_bloom_point_lookup", "q159_deletion_vectors",
    "q160_versioned_clone",
    # (2) implementation changed this round (outputs unchanged; their
    # r12/r11/r10 rows prove the OLD manifest format): every query
    # that COMMITS through versioned_store._commit now writes the
    # bounded per-app txn ledger, commit_delete is null-safe +
    # pinned-schema, commit_merge re-reads victims under the pinned
    # union schema — slots 12-19. (q142/q144/q146 are read-only over
    # these stores and never touch the txns field; their r12/r10 rows
    # stand.)
    "q122_streaming_incremental_dedup", "q140_streaming_ann_ingest",
    "q141_ann_store_snapshot", "q143_ann_versioned_delete",
    "q145_ann_retrain_cutover", "q147_versioned_merge",
    "q148_versioned_schema_evolution", "q149_versioned_change_feed",
    # (3) the r10 tier in module order (first 31 of its 47; the last 16
    # — q70/q97/q101/q132/q129/q108/q106/q96 displaced by the in-round
    # q153-q160 additions, plus q103/q119/q121/q130/q124/q93/q110/q127
    # per the derivation — and all 49 r11-tier queries fall past the
    # cap: most recently proven, still covered by local parity
    # (tests/test_oracle_parity.py runs the identical comparison on
    # every registered query, plus the sf0.01 driver-scale bridge for
    # the oldest tier); they rotate forward in r14 — slots 20-50;
    "q112_equidepth_sketch", "q125_fuzzy_linkage", "q128_pagerank",
    "q131_kcore", "q114_global_sort", "q85_retention_cohorts",
    "q88_sliding_window_stats", "q90_gapfill_locf",
    "q51_lsh_verified_neardup", "q61_dedup_clusters",
    "q123_canonical_selection", "q120_incremental_dedup",
    "q83_duplicate_spans", "q28_ivf_topk", "q29_embedding_neardup",
    "q81_kmeans_step", "q82_kmeans_lloyd", "q86_cluster_purity",
    "q111_semantic_dedup_hier", "q113_ivfpq_adc",
    "q126_embedding_covariance", "q32_token_stats", "q33_fingerprint",
    "q63_quality_gate", "q76_repetition_stats", "q84_heavy_hitters",
    "q36_sma_over_bars", "q40_date_funcs", "q41_correlated_max",
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
