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
    # round-9 window, per the CORRECTNESS_SEEN.md rule.
    # (1) the one red row from r8: q119 failed on an oracle HUGEINT
    # typing defect (judge-verified; fixed this round) — slot 1;
    "q119_bpe_encode",
    # (2) new this round: incremental corpus dedup against a persisted
    # signature index, and DSIR hashed-n-gram importance weights;
    "q120_incremental_dedup", "q121_dsir_weights",
    "q122_streaming_incremental_dedup", "q123_canonical_selection",
    "q124_lm_perplexity", "q125_fuzzy_linkage",
    "q126_embedding_covariance", "q127_schema_evolution",
    "q128_pagerank", "q129_pareto_frontier", "q130_importance_resample",
    "q131_kcore", "q132_token_budget_fill", "q133_jsonl_roundtrip",
    # (2b) outputs/oracles CHANGED this round: q51/q61's verification
    # moved to 60-bit shingle fingerprints (values verified identical
    # at gate SF, but the r8 green rows prove the OLD oracle pair);
    "q51_lsh_verified_neardup", "q61_dedup_clusters",
    # (3) the 16 r6-tier deferrals (newest green row is r6);
    "q32_token_stats", "q33_fingerprint", "q36_sma_over_bars",
    "q40_date_funcs", "q41_correlated_max", "q43_array_aggregation",
    "q44_joinback_avg", "q70_scd2_history", "q93_zorder_pruning",
    "q96_streaming_dedup", "q97_bm25_ranking", "q101_bigram_novelty",
    "q103_scd2_pit_enrichment", "q106_streaming_stateful_hwm",
    "q108_twap", "q110_dynamic_partition_overwrite",
    # (4) the oldest-r7 tier in module order fills the remaining 26
    # slots (q113 also carries this round's Arrow-kernel rework). The
    # trailing 24 of the r7 tier (q47–q50, q53–q60, q64, q67–q69,
    # q71/q72/q73, q75, q78/q79, q89, q91) and the 49 r8-proven
    # queries fall past the cap — most recently proven, still covered by local
    # parity (tests/test_oracle_parity.py runs the identical
    # comparison on every registered query).
    "q87_full_outer_reconciliation", "q112_equidepth_sketch",
    "q114_global_sort", "q85_retention_cohorts",
    "q88_sliding_window_stats", "q90_gapfill_locf",
    "q83_duplicate_spans", "q28_ivf_topk", "q29_embedding_neardup",
    "q81_kmeans_step", "q82_kmeans_lloyd", "q86_cluster_purity",
    "q111_semantic_dedup_hier", "q113_ivfpq_adc", "q63_quality_gate",
    "q76_repetition_stats", "q84_heavy_hitters",
    # q34_multimodal_meta, q74_multimodal_decode, q37_cube,
    # q38_string_funcs, q39_percentiles, q42_unpivot, q45_window_suite,
    # q46_streaming_tumbling, q62_streaming_session_window,
    # q89_streaming_sliding_window and q73_streaming_stream_join were
    # the 18th-28th r7-tier slots; the late additions q123-q133
    # displace them past the 50-cap — they join the r10 rotation with
    # the other 21 r7-tier deferrals.
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
