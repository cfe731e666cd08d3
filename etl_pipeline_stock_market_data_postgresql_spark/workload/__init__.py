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
    # round-6 window. r5 went 50/50 green, so every query has a green
    # driver row on the regenerated data within r4∪r5. This round:
    # first the ten queries new in r6 (never proven) — z-order pruning,
    # learned-IVF ANN, quantile sketch, streaming dedup, BM25, semantic
    # dedup, z-score anomaly, table profile, bigram novelty, equi-depth
    # histogram.
    "q93_zorder_pruning", "q94_learned_ivf", "q95_quantile_sketch",
    "q96_streaming_dedup", "q97_bm25_ranking", "q98_semantic_dedup",
    "q99_anomaly_zscore", "q100_table_profile", "q101_bigram_novelty",
    "q102_equidepth_histogram", "q103_scd2_pit_enrichment",
    "q104_key_uniqueness", "q105_histogram_drift",
    "q106_streaming_stateful_hwm", "q107_bloom_join", "q108_twap",
    "q109_sq8_quantization", "q110_dynamic_partition_overwrite",
    # Then the 39 queries whose newest green row is r4: their rows
    # predate r5's loader/tokenizer edits (sources/tables.py,
    # functions/textstats.py), so they rotate forward per the
    # oldest-green-first rule in CORRECTNESS_SEEN.md.
    "q11_pricing_summary", "q12_top_revenue_orders", "q13_region_revenue",
    "q14_group_topn", "q15_set_ops", "q16_rollup", "q17_pivot_status",
    "q18_distinct_agg", "q19_having_heavy_customers", "q20_asof_last_click",
    "q23_dedup_exact", "q24_ngram_jaccard", "q25_minhash_lsh", "q26_simhash",
    "q30_langid",
    "q31_quality_score", "q32_token_stats", "q33_fingerprint",
    "q36_sma_over_bars", "q40_date_funcs",
    "q41_correlated_max", "q43_array_aggregation",
    "q44_joinback_avg", "q51_lsh_verified_neardup", "q52_multiset_ops",
    "q61_dedup_clusters", "q65_salted_distinct", "q66_salted_join",
    "q70_scd2_history", "q77_funnel", "q80_hll_distinct",
    # 18 new + 31 r4-aged leaves ONE fill slot to the cap; it goes to
    # the NTZ-sensitive q22 (single r5 row on the regenerated data).
    # Eight r4-aged queries defer past the cap to make room for
    # q103–q110 (new > oldest-green): q28/q29/q82 (embeddings-only),
    # q38 (part-table-only), q42 (status/priority columns of orders
    # only), q37 (returnflag/linestatus/quantity/extendedprice of
    # lineitem only), q39 (event_type/value only), q34 (text→binary
    # plumbing, no time columns, no tokenizer) — none can be affected
    # by the r5 loader/tokenizer edits their rotation guards against;
    # all stay covered by local parity.
    "q22_sessionization",
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
