"""Registry-wide physical-plan lint: every registered query's returned
plan is checked for the three scale-killer shapes, so the "no cartesian
/ no nested-loop / no table-scale single-partition funnel ANYWHERE"
claim is structural — any future query inherits the lint the moment it
is registered, instead of relying on a hand-written per-query plan test
(tests/test_plans.py still carries the deeper per-query assertions:
broadcast presence, pushdown, range partitioning, codegen spans).

Allowlists are EXPLICIT and justified inline. Two patterns are
legitimately present at 100 TB:

- ``BroadcastNestedLoopJoin`` is how Spark executes a deliberate
  ``crossJoin(F.broadcast(tiny))`` — the build side in every
  allowlisted query is a 1-row or K-row aggregate/codebook (bounds,
  centroids, quantile boundaries, corpus-wide constants), never
  corpus-scale. The lint bans the shape everywhere else because an
  ACCIDENTAL nested-loop join (join-condition typo, missed equi-key)
  is the classic silent O(n*m) cliff.
- ``Exchange SinglePartition`` below a final ungrouped aggregate moves
  only per-partition PARTIAL rows (map-side combine has already run),
  and below a documented K-row coalesce moves K rows. The lint bans it
  elsewhere because a single-partition exchange carrying table-scale
  rows (the no-partition window, the global collect funnel) serializes
  the job on one task.

Queries that localCheckpoint internally (iterative/storage/streaming)
expose only their post-checkpoint plan here; their pre-checkpoint
shapes are asserted by their dedicated tests on the factored-out
stages (e.g. _range_sorted_lineitem for q114).
"""

from __future__ import annotations

import pytest

from etl_pipeline_stock_market_data_postgresql_spark import plans
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

LINT_SF = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin allowlist: every entry is crossJoin(broadcast(X))
# where X is the named tiny side (size independent of, or logarithmic in,
# the corpus).
BNLJ_ALLOWED = {
    "q28_ivf_topk":           "query-vector set + cell table (K rows)",
    "q69_domain_mix_sample":  "1-row corpus weight normalizer",
    "q81_kmeans_step":        "K centroid rows to every vector",
    "q86_cluster_purity":     "K centroid rows",
    "q90_gapfill_locf":       "1-row (min_ts, max_ts) bounds",
    "q94_learned_ivf":        "K learned-centroid rows",
    "q97_bm25_ranking":       "1-row corpus avgdl",
    "q98_semantic_dedup":     "K centroid rows",
    "q100_table_profile":     "1-row table-wide stats",
    "q102_equidepth_histogram": "k-1 quantile boundary rows",
    "q105_histogram_drift":   "1-row per-window totals",
    "q111_semantic_dedup_hier": "1-row skew-cap (p99.9 of K cell sizes) "
                                "broadcast to the K-row size table",
    "q112_equidepth_sketch":  "k-1 sketch boundary rows (2 passes)",
    "q113_ivfpq_adc":         "codebook / ADC lookup table rows",
    "q121_dsir_weights":      "1-row corpus/target feature totals",
    "q124_lm_perplexity":     "1-row train vocabulary size (V)",
    "q126_embedding_covariance": "1-row exact corpus count",
    "q130_importance_resample": "1-row corpus-mean importance + q121's totals",
    "q134_incremental_ann":   "K centroid rows to every (base|delta) vector",
    "q138_ann_store_probe":   "K centroid rows crossed to the Q query "
                              "vectors (probe ranking)",
    "q144_ann_model_drift":   "K frozen-centroid rows to every vector "
                              "(nearest-cell distance)",
}

# Exchange SinglePartition allowlist: the single partition only ever
# receives partial-aggregate rows or a documented K-row side.
SINGLE_PARTITION_ALLOWED = {
    "q69_domain_mix_sample":  "final ungrouped agg (per-language partials)",
    "q77_funnel":             "final ungrouped funnel totals",
    "q87_full_outer_reconciliation": "1-row reconciliation verdict",
    "q90_gapfill_locf":       "1-row bounds agg feeding the sequence",
    "q97_bm25_ranking":       "1-row corpus avgdl agg",
    "q100_table_profile":     "1-row table profile agg",
    "q102_equidepth_histogram": "1-row exact-percentile agg",
    "q104_key_uniqueness":    "1-row count-vs-distinct verdict",
    "q105_histogram_drift":   "1-row TVD verdict agg",
    "q111_semantic_dedup_hier": "1-row skew-cap agg (p99.9 over K "
                                "cell-size rows; map-side partials only)",
    "q112_equidepth_sketch":  "1-row sketch agg (k-1 boundaries)",
    "q114_global_sort":       "cumulative offsets over |partitions| rows",
    "q121_dsir_weights":      "1-row corpus/target totals agg",
    "q124_lm_perplexity":     "1-row train vocabulary-size agg",
    "q129_pareto_frontier":   "running-max window over <=1001 level rows",
    "q130_importance_resample": "1-row corpus-mean agg (+q121's totals agg)",
    "q135_pagerank_convergence": "per-iteration 1-row residual aggs "
                                 "(map-side partials only reach the "
                                 "single partition)",
    "q141_ann_store_snapshot": "per-version 1-row snapshot summaries "
                               "(map-side partials only)",
    "q142_ann_store_stats_pruning": "per-version 1-row range summaries "
                                    "(map-side partials only)",
    "q143_ann_versioned_delete": "per-version 1-row delete-certificate "
                                 "summaries (map-side partials only)",
    "q145_ann_retrain_cutover": "per-version 1-row cutover summaries "
                                "(map-side partials only)",
    "q146_ann_multicol_pruning": "per-probe 1-row pruned-window summaries "
                                 "(map-side partials only)",
    "q148_versioned_schema_evolution": "1-row v1-shape summary "
                                       "(map-side partials only)",
    "q149_versioned_change_feed": "per-transition 1-row feed summaries "
                                  "(map-side partials only)",
    "q153_versioned_restore": "per-version 1-row rollback-certificate "
                              "summaries (map-side partials only)",
    "q165_versioned_update": "per-version 1-row correction-certificate "
                             "summaries (map-side partials only)",
    "q166_versioned_update_mor": "per-version 1-row correction-"
                                 "certificate summaries (map-side "
                                 "partials only)",
    "q167_streaming_store_sink": "per-version 1-row sink-batch "
                                 "summaries (map-side partials only)",
    "q168_incremental_replication": "per-version 1-row replica-"
                                    "certificate summaries (map-side "
                                    "partials only)",
    "q154_versioned_optimize_zorder": "per-(version, probe) 1-row "
                                      "content-invariance summaries "
                                      "(map-side partials only)",
    "q155_portable_hll_registers": "ungrouped exact-distinct reference "
                                   "agg + the 256-register merged-"
                                   "sketch summary (map-side partials "
                                   "/ m register rows only)",
    "q156_portable_kmv_theta": "ungrouped exact-set reference agg + "
                               "K-row sketch summaries (map-side "
                               "partials / <=K rows only; the sketch "
                               "builds themselves are "
                               "TakeOrderedAndProject)",
    "q157_versioned_sketch_maintenance": "per-version 1-row register "
                                         "checksums over the m=256-row "
                                         "profile table (map-side "
                                         "partials only)",
    "q158_bloom_point_lookup": "per-probe 1-row lookup summaries over "
                               "the bloom-surviving files (map-side "
                               "partials only)",
    "q159_deletion_vectors": "per-version / per-feed 1-row checksums "
                             "(map-side partials only; the DV "
                             "anti-join side is the broadcast "
                             "deleted-positions table)",
    "q160_versioned_clone": "per-(branch, version) 1-row checksums "
                            "(map-side partials only)",
    "q162_multi_store_atomic_commit": "per-(store, claimed-version) "
                                      "1-row content checksums (map-"
                                      "side partials only; the aborted-"
                                      "hole row is a 1-row literal "
                                      "frame)",
    "q163_column_mapping": "per-version 1-row schema/content "
                           "summaries (map-side partials only)",
    "q169_mapped_store_sink": "per-version 1-row content summaries "
                              "(map-side partials only)",
    "q170_cdf_restore_follower": "running signed totals over 4 "
                                 "per-version feed-summary rows "
                                 "(map-side partials only)",
    "q171_streaming_cdc_merge": "per-version 1-row balance checksums "
                                "(map-side partials only)",
    "q172_batch_source_api": "per-(version, phase) 1-row content "
                             "summaries (map-side partials only)",
    "q173_cdf_batch_range": "running signed totals over 4 per-version "
                            "feed-summary rows (map-side partials "
                            "only)",
    "q174_streaming_file_admission": "per-(batch, version) 1-row "
                                     "geometry/checksum summaries "
                                     "(map-side partials only)",
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_scale_killer_in_plan(spark, name):
    q = all_queries()[name]
    df = q.spark_fn(spark, LINT_SF)
    try:
        low = plans.explain_str(df).lower()
        assert "cartesianproduct" not in low, \
            f"{name}: CartesianProduct in plan"
        if name not in BNLJ_ALLOWED:
            assert "broadcastnestedloopjoin" not in low, \
                f"{name}: unjustified BroadcastNestedLoopJoin (allowlist " \
                f"it with a reason if the build side is provably tiny)"
        if name not in SINGLE_PARTITION_ALLOWED:
            assert "singlepartition" not in low, \
                f"{name}: unjustified single-partition exchange"
    finally:
        spark.catalog.clearCache()


def test_allowlists_only_name_registered_queries():
    names = set(all_queries())
    assert set(BNLJ_ALLOWED) <= names, set(BNLJ_ALLOWED) - names
    assert set(SINGLE_PARTITION_ALLOWED) <= names, \
        set(SINGLE_PARTITION_ALLOWED) - names
