"""Plan-shape assertions: the free Catalyst optimizations the engine
relies on at scale must actually appear in the physical plans
(SURVEY.md §4). A failure here is a 100×-at-scale regression even if
results stay correct."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark import plans
from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load
from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
    q11_pricing_summary, q12_top_revenue_orders, q13_region_revenue)


def test_filter_pushdown_to_parquet(spark, sf_dir):
    df = (load(spark, sf_dir, "customer")
          .filter(F.col("c_mktsegment") == "BUILDING")
          .select("c_custkey"))
    pf = plans.pushed_filters(df)
    assert any("c_mktsegment" in p for p in pf), pf


def test_column_pruning_q11(spark, sf_dir):
    df = q11_pricing_summary(spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    assert schemas, "no parquet scan found"
    cols = schemas[0]
    # 7 of 11 lineitem columns: the scan must not read the other 4
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert set(cols) >= {"l_quantity", "l_extendedprice", "l_discount",
                         "l_tax", "l_returnflag", "l_linestatus"}


def test_dimension_joins_broadcast(spark, sf_dir):
    assert plans.has_broadcast_join(q12_top_revenue_orders(spark, sf_dir))
    assert plans.has_broadcast_join(q13_region_revenue(spark, sf_dir))


def test_topk_plans_as_take_ordered(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.reference_parity import q01_topk_latest

    text = plans.explain_str(q01_topk_latest(spark, sf_dir))
    assert "TakeOrderedAndProject" in text, text[:500]


def test_wholestage_codegen_present(spark, sf_dir):
    # AQE wraps the plan before execution and hides codegen subtrees
    # from explain; disable it for the static inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q11_pricing_summary(spark, sf_dir)
        assert plans.wholestage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    # q56's ±60s range join must execute as an equi-join on the band
    # bucket; a theta-join would plan BroadcastNestedLoopJoin/Cartesian
    # and go quadratic per event_type at scale.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.pipeline_ops import q56_range_join

    text = plans.explain_str(q56_range_join(spark, sf_dir))
    assert "NestedLoop" not in text and "Cartesian" not in text, text[:800]
    assert "Join" in text


def test_stratum_sample_has_no_global_sort(spark, sf_dir):
    # q59's per-stratum top-k must hash-partition by lang for the
    # window, never range-partition the full corpus into a total order.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.pipeline_ops import q59_stratum_sample

    text = plans.explain_str(q59_stratum_sample(spark, sf_dir))
    assert "rangepartitioning" not in text.lower(), text[:800]
    assert "hashpartitioning(lang" in text, text[:800]


def test_scd2_single_exchange_serves_all_windows(spark, sf_dir):
    # q70 chains three windows (same-day pick, change detection,
    # interval close) whose partition keys are all supersets of
    # {custkey}: the explicit custkey repartition must be the ONLY
    # shuffle — extra Exchanges would re-shuffle the fact table per
    # window at scale.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q70_scd2_history

    import re

    text = plans.explain_str(q70_scd2_history(spark, sf_dir))
    exchanges = re.findall(r"\(\d+\) Exchange", text)
    assert len(exchanges) == 1, text[:1200]


def test_contamination_filter_reaches_scan(spark, sf_dir):
    # q68's train-side totals must push the eval-slice exclusion into
    # the documents scan, not filter post-shuffle.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q68_contamination

    text = plans.explain_str(q68_contamination(spark, sf_dir))
    assert "NestedLoop" not in text and "Cartesian" not in text, text[:800]


def test_domain_mix_broadcasts_thresholds(spark, sf_dir):
    # q69's per-language thresholds are a handful of rows — they must
    # broadcast onto the corpus scan, never shuffle the documents.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q69_domain_mix_sample

    assert plans.has_broadcast_join(q69_domain_mix_sample(spark, sf_dir))


def test_tfidf_topk_window_is_hash_partitioned(spark, sf_dir):
    # q67's final top-k runs over the (lang) vocabulary table — hash
    # partitioning by lang, never a rangepartitioned global sort.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q67_tfidf_topterms

    text = plans.explain_str(q67_tfidf_topterms(spark, sf_dir))
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_indicator_windows_partition_by_series_key(spark, sf_dir):
    # q53/q54/q55 (EMA, RSI, Bollinger) must window over the per-series
    # key (user_id) — hash partitioning, never a rangepartitioned
    # global sort. See finance_analytics module docstring for the
    # single-hot-series story (pre-bar the ticks, q35→q36 shape).
    from etl_pipeline_stock_market_data_postgresql_spark.workload.finance_analytics import (
        q53_ema, q54_rsi, q55_bollinger)

    for q in (q53_ema, q54_rsi, q55_bollinger):
        text = plans.explain_str(q(spark, sf_dir))
        assert "hashpartitioning(user_id" in text, (q.__name__, text[:800])
        assert "rangepartitioning" not in text.lower(), (q.__name__, text[:800])


def test_token_chunking_is_shuffle_free(spark, sf_dir):
    # q78 is a pure per-row map (tokenize → explode bounded sequence →
    # slice): beyond the initial single-row-group spread there must be
    # no Exchange — chunking 100 TB is then perfectly parallel.
    import re

    from etl_pipeline_stock_market_data_postgresql_spark.workload.pipeline_ops import q78_token_chunks

    text = plans.explain_str(q78_token_chunks(spark, sf_dir))
    exchanges = re.findall(r"\(\d+\) Exchange", text)
    assert len(exchanges) <= 1, text[:1200]  # only the defensive spread


def test_shuffle_shard_has_no_global_sort(spark, sf_dir):
    # q79's training-order shuffle must sort within hash-partitioned
    # shards only; a rangepartitioning would serialize the corpus
    # through a global sample-and-sort at scale.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.pipeline_ops import q79_shuffle_shard

    text = plans.explain_str(q79_shuffle_shard(spark, sf_dir))
    assert "rangepartitioning" not in text.lower(), text[:800]
    assert "hashpartitioning" in text, text[:800]


def test_rollup_reuses_cached_hourly_level(spark, sf_dir):
    # q57's day level must re-aggregate the persisted hourly aggregate
    # (InMemoryRelation appears), not rescan raw events twice.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.pipeline_ops import q57_hierarchical_rollup

    df = q57_hierarchical_rollup(spark, sf_dir)
    try:
        text = plans.explain_str(df)
        assert text.count("InMemoryTableScan") >= 2, text[:800]
    finally:
        spark.catalog.clearCache()


def test_duplicate_spans_no_cartesian_and_hash_joins_only(spark, sf_dir):
    # q83's cross-doc dup set must come from hash aggregation + LEFT
    # SEMI on the hash — an all-pairs product over spans would be
    # quadratic in the corpus.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.text_dedup import q83_duplicate_spans

    df = q83_duplicate_spans(spark, sf_dir)
    try:
        text = plans.explain_str(df)
        assert "CartesianProduct" not in text, text[:800]
        assert "SortMergeJoin" not in text, text[:800]
    finally:
        spark.catalog.clearCache()


def test_heavy_hitters_broadcasts_candidates(spark, sf_dir):
    # q84 joins the DEPTH*WIDTH sketch against 20 candidate rows: the
    # candidate side must broadcast; a shuffle join on (d, b) would
    # exchange the sketch for nothing.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.textstats import q84_heavy_hitters

    df = q84_heavy_hitters(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]


def test_retention_cohorts_broadcasts_sizes_and_dedups_first(spark, sf_dir):
    # q85's outer agg must consume the already-distinct user-week table
    # (no expensive count-distinct), and the tiny cohort-size table must
    # broadcast back rather than shuffle the cohort triangle.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import q85_retention_cohorts

    df = q85_retention_cohorts(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    # assert the absence of the specific count-distinct expansion (the
    # `count(distinct ...)` expression / its Expand rewrite), not the bare
    # substring "distinct" — node names may legitimately contain it
    lowered = text.lower()
    assert "count(distinct" not in lowered, \
        "count-distinct should not appear; input is pre-distinct"
    assert "expand" not in lowered, \
        "count-distinct Expand rewrite should not appear"


def test_q94_learned_ivf_broadcasts_never_cartesian(spark, sf_dir):
    # both argmin fanouts (corpus->cells, query->probes), the probe
    # pairing, and the exact-top3 flag join must all be broadcasts of
    # the tiny side; any CartesianProduct would mean the corpus gets
    # paired all-against-all somewhere
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import q94_learned_ivf

    df = q94_learned_ivf(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]


def test_q95_sketch_is_single_aggregation_pass(spark, sf_dir):
    # the sketch must be computed by percentile_approx partials (one
    # grouped aggregation over events), and the rank-verification pass
    # must broadcast the tiny per-(group, q) estimate table back — no
    # shuffle of events keyed on anything but event_type
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import q95_quantile_sketch

    df = q95_quantile_sketch(spark, sf_dir)
    text = plans.explain_str(df)
    assert "percentile_approx" in text, text[:800]
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]


def test_q97_bm25_topk_is_take_ordered_and_broadcasts(spark, sf_dir):
    # the doc ranking must plan as TakeOrderedAndProject (bounded
    # top-k, never a global sort) and the query-term / corpus-stats
    # tables must broadcast; no CartesianProduct anywhere
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q97_bm25_ranking

    df = q97_bm25_ranking(spark, sf_dir)
    text = plans.explain_str(df)
    assert "TakeOrderedAndProject" in text, text[:800]
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q98_semantic_dedup_blocks_on_cells(spark, sf_dir):
    # centroid fanouts broadcast the K-row side; the candidate pairing
    # must be a real equi-join on the cell id (never CartesianProduct —
    # that would be corpus all-pairs, the thing SemDeDup's clustering
    # exists to avoid); no global sort anywhere
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import q98_semantic_dedup

    df = q98_semantic_dedup(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q111_hier_semdedup_blocks_on_cells_without_flat_fanout(spark, sf_dir):
    # same contract as q98 (broadcast centroid fanouts, equi-join pair
    # generation, no cartesian, no global sort) — the hierarchy must
    # not reintroduce either failure shape
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import q111_semantic_dedup_hier

    df = q111_semantic_dedup_hier(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    assert "CartesianProduct" not in text, text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q114_global_sort_is_range_partitioned_not_single_task(spark, sf_dir):
    # the terasort contract: the data path range-partitions and sorts
    # per partition — it must NOT funnel the table through a single
    # partition (no global window, no single-partition exchange) and
    # must not need any window at all (local ranks come from the
    # monotonic id arithmetic)
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
        _range_sorted_lineitem, q114_global_sort)

    srt = _range_sorted_lineitem(spark, sf_dir)
    text = plans.explain_str(srt)
    low = text.lower()
    assert "rangepartitioning" in low, text[:800]
    assert "singlepartition" not in low, text[:800]
    assert "window" not in low, text[:800]
    # the full query adds only the broadcast offsets join on top of the
    # checkpointed sort; the offsets side is |partitions| rows
    df = q114_global_sort(spark, sf_dir)
    assert plans.has_broadcast_join(df), plans.explain_str(df)[:800]
    # ranks are a gapless permutation of 1..n
    n = df.count()
    agg = df.agg(F.min("global_rank"), F.max("global_rank"),
                 F.countDistinct("global_rank")).collect()[0]
    assert tuple(agg) == (1, n, n), tuple(agg)


def test_q113_ivfpq_broadcasts_codebook_no_corpus_product(spark, sf_dir):
    # the codebook/LUT/exact-flag sides all broadcast; candidate
    # generation must stay the IVF cell equi-join (no corpus-scale
    # cartesian), and nothing range-partitions
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import q113_ivfpq_adc

    df = q113_ivfpq_adc(spark, sf_dir)
    text = plans.explain_str(df)
    assert plans.has_broadcast_join(df), text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q99_anomaly_single_user_shuffle(spark, sf_dir):
    # all three moments (count/sum/sum-of-squares) must come from ONE
    # window pass: exactly one exchange, hash-partitioned on user_id —
    # a second exchange would mean the frame was computed twice
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import q99_anomaly_zscore

    import re

    df = q99_anomaly_zscore(spark, sf_dir)
    text = plans.explain_str(df)
    low = text.lower()
    # formatted explain prints each node as a "(N) Name" detail header
    assert len(re.findall(r"\(\d+\) Exchange\b", text)) == 1, text[:800]
    assert "hashpartitioning(user_id" in low, text[:800]
    assert "rangepartitioning" not in low, text[:800]


def test_q100_profile_two_pruned_passes(spark, sf_dir):
    # exactly TWO parquet scans: the wide hash-agg pass (counts,
    # distincts via one Expand, numeric/ts min-max) and the narrow
    # string-min/max pass pruned to the two enum columns (string
    # min/max has an immutable buffer; merged in, it would drag the
    # whole Expand through SortAggregate - the 4.6x regression the
    # split exists to avoid). SortAggregate may appear only in the
    # narrow pass, i.e. the Expand must stay on the hash side.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import q100_table_profile

    import re

    df = q100_table_profile(spark, sf_dir)
    text = plans.explain_str(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", text)) == 2, text[:800]
    assert "Expand" in text, text[:800]
    schemas = plans.read_schema_columns(df)
    narrow = min(schemas, key=len)
    assert set(narrow) == {"l_returnflag", "l_linestatus"}, schemas


def test_q101_bigram_model_join_no_cartesian(spark, sf_dir):
    # the df-model re-join must be an equi-join on the bigram hash;
    # nothing in the plan may cartesian or globally sort the corpus
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q101_bigram_novelty

    df = q101_bigram_novelty(spark, sf_dir)
    text = plans.explain_str(df)
    assert "CartesianProduct" not in text, text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q102_equidepth_no_global_sort(spark, sf_dir):
    # the whole point vs ntile(): no rangepartitioning / single-partition
    # global sort. Since r16 the k-1 boundaries arrive as LITERALS
    # (functions.quantiles.exact_percentiles runs ahead of the plan), so
    # the assignment pass needs no runtime boundary join either — the
    # only exchange left is the bucket hash-aggregate's.
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import q102_equidepth_histogram

    df = q102_equidepth_histogram(spark, sf_dir)
    text = plans.explain_str(df)
    low = text.lower()
    import re
    # NB: "percentile(" contains the substring "ntile(" — require a
    # non-letter before the window-function call form
    assert not re.search(r"(?<![a-z])ntile\(", low), text[:800]
    assert "rangepartitioning" not in low, text[:800]
    # boundaries are plan-time literals: no broadcast, no join at all
    assert "BroadcastExchange" not in text, text[:800]
    assert "Join" not in text, text[:800]
    assert "hashpartitioning" in low, text[:800]


def test_q112_sketch_histogram_no_global_sort_and_certifies(spark, sf_dir):
    # same plan contract as q102 (broadcast 1-row boundaries, no ntile,
    # no range partitioning), with the sketch aggregate present and the
    # rank-space certification true on every bucket
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
        EQD_BUCKETS, q112_equidepth_sketch)

    df = q112_equidepth_sketch(spark, sf_dir)
    text = plans.explain_str(df)
    low = text.lower()
    import re
    assert not re.search(r"(?<![a-z])ntile\(", low), text[:800]
    assert "rangepartitioning" not in low, text[:800]
    assert "BroadcastExchange" in text, text[:800]
    assert "approx_percentile" in low or "percentile_approx" in low, text[:800]
    rows = df.collect()
    assert len(rows) == EQD_BUCKETS
    assert all(r.within_tol for r in rows), rows
    # the exact witness edges are non-decreasing; last bucket open-ended
    edges = [r.exact_edge for r in sorted(rows, key=lambda r: r.bucket)]
    assert edges[-1] is None and all(e is not None for e in edges[:-1])
    assert all(a <= b for a, b in zip(edges[:-2], edges[1:-1]))


def test_q105_drift_shuffles_only_cells(spark, sf_dir):
    # the raw-event pass must end at the (type, slice, bin) hash
    # aggregate: bounds broadcast back (BroadcastExchange), everything
    # after the cell aggregate is tiny-table algebra; no global sort
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import q105_histogram_drift

    df = q105_histogram_drift(spark, sf_dir)
    text = plans.explain_str(df)
    assert "BroadcastExchange" in text, text[:800]
    assert "CartesianProduct" not in text, text[:800]
    assert "rangepartitioning" not in text.lower(), text[:800]


def test_q107_bloom_filters_below_forced_merge_join(spark, sf_dir):
    # the merge hint must hold (SortMergeJoin, not a broadcast that
    # would hide the technique); the bloom probe must run as broadcast
    # HASH joins on the word index (the O(1) lookup — a map element_at
    # would be a linear scan per row, see operators/bloom.py) followed
    # by the bitmask test; nothing may cartesian
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import q107_bloom_join

    df = q107_bloom_join(spark, sf_dir)
    text = plans.explain_str(df)
    assert "SortMergeJoin" in text, text[:800]
    assert "BroadcastHashJoin" in text and "xxhash64" in text, text[:800]
    assert "CartesianProduct" not in text, text[:800]


def test_q108_twap_single_series_exchange(spark, sf_dir):
    # the lead() window and the final aggregate must share ONE user_id
    # exchange (Catalyst satisfies the aggregate's distribution from
    # the window's shuffle); no global sort anywhere
    import re

    from etl_pipeline_stock_market_data_postgresql_spark.workload.finance_analytics import q108_twap

    df = q108_twap(spark, sf_dir)
    text = plans.explain_str(df)
    low = text.lower()
    assert len(re.findall(r"\(\d+\) Exchange\b", text)) == 1, text[:800]
    assert "hashpartitioning(user_id" in low, text[:800]
    assert "rangepartitioning" not in low, text[:800]
