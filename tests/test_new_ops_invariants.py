"""Semantic invariants for the round-5 operators (q83–q88) — properties
that must hold on ANY input, checked on real testdata. These complement
the differential oracle: the oracle proves Spark == DuckDB, these prove
both engines compute the *right kind* of answer.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load
from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import (
    q85_retention_cohorts, q88_sliding_window_stats)
from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
    q87_full_outer_reconciliation)
from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import (
    q86_cluster_purity)
from etl_pipeline_stock_market_data_postgresql_spark.workload.text_dedup import (
    q83_duplicate_spans)
from etl_pipeline_stock_market_data_postgresql_spark.workload.textstats import (
    q84_heavy_hitters)


def test_duplicate_spans_bounds(spark, sf_dir):
    rows = q83_duplicate_spans(spark, sf_dir).collect()
    assert rows, "corpus has docs with >= 6 tokens"
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_span_ratio <= 1.0
    spark.catalog.clearCache()


def test_count_min_never_underestimates(spark, sf_dir):
    rows = q84_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # the defining count-min guarantee: estimate >= true count
        assert r.est_count >= r.exact_count, r
        assert r.overcount == r.est_count - r.exact_count


def test_retention_first_week_is_full_cohort(spark, sf_dir):
    rows = q85_retention_cohorts(spark, sf_dir).collect()
    by_cohort = {r.cohort_week: r for r in rows if r.week_offset == 0}
    for r in rows:
        assert 1 <= r.n_active <= r.n_cohort
        assert 0.0 < r.retention_rate <= 1.0
    # every cohort member is by construction active at offset 0
    for r in by_cohort.values():
        assert r.n_active == r.n_cohort
    # cohort sizes partition the user base
    n_users = (load(spark, sf_dir, "events")
               .agg(F.countDistinct("user_id")).collect()[0][0])
    assert sum(r.n_cohort for r in by_cohort.values()) == n_users


def test_cluster_purity_partitions_vectors(spark, sf_dir):
    rows = q86_cluster_purity(spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert 1 <= r.n_majority <= r.n_members
        assert 0.0 < r.purity <= 1.0


def test_reconciliation_counts_tie_out(spark, sf_dir):
    r = q87_full_outer_reconciliation(spark, sf_dir).collect()[0]
    n_orders = load(spark, sf_dir, "orders").count()
    n_line_keys = (load(spark, sf_dir, "lineitem")
                   .select("l_orderkey").distinct().count())
    assert r.n_matched + r.n_order_only == n_orders
    assert r.n_matched + r.n_lineitem_only == n_line_keys
    assert 0 <= r.n_price_mismatch <= r.n_matched


def test_sliding_windows_double_count_events(spark, sf_dir):
    rows = q88_sliding_window_stats(spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    # length/slide = 2: every event appears in exactly two windows
    assert sum(r.n_events for r in rows) == 2 * n_events


def test_gapfill_grid_is_complete_and_conserves_events(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import (
        q90_gapfill_locf)

    rows = q90_gapfill_locf(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    hours = ev.select(F.date_trunc("hour", "ts").alias("h")) \
              .agg(F.min("h"), F.max("h")).collect()[0]
    n_hours = int((hours[1] - hours[0]).total_seconds() // 3600) + 1
    # the grid is dense: every (type, hour) cell exists exactly once
    assert len(rows) == n_types * n_hours
    assert len({(r.event_type, r.bucket_start) for r in rows}) == len(rows)
    # gap filling invents no events
    assert sum(r.n_events for r in rows) == ev.count()
    # LOCF: once a type has seen data, filled_avg is never NULL again
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.bucket_start)):
        seen = by_type.get(r.event_type, False)
        if r.n_events > 0:
            by_type[r.event_type] = True
        elif seen:
            assert r.filled_avg is not None, r


def test_anomaly_flags_respect_min_baseline(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import (
        ZS_MIN_N, q99_anomaly_zscore)

    rows = q99_anomaly_zscore(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    # one verdict per event, never a dropped or duplicated row
    assert len(rows) == ev.count()
    flagged = [r for r in rows if r.is_anomaly]
    # no flag before the baseline has ZS_MIN_N samples
    assert all(r.n_win >= ZS_MIN_N for r in flagged)
    # 3-sigma flags are rare by construction (Chebyshev: < 1/9 even
    # distribution-free; on this data well under 2%)
    assert len(flagged) < 0.02 * len(rows), len(flagged)


def test_semantic_dedup_keeps_a_representative_per_cell(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import q98_semantic_dedup

    rows = q98_semantic_dedup(spark, sf_dir).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        # the lowest id in a cell has no lower-id neighbor to defer to
        lowest = min(members, key=lambda r: r.vec_id)
        assert not lowest.removed, (cell, lowest)
        # dedup never empties a cell
        assert any(not r.removed for r in members), cell


def test_hier_semdedup_matches_flat_blocking_semantics(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.similarity import (
        q98_semantic_dedup, q111_semantic_dedup_hier)

    flat = {r.vec_id: r for r in q98_semantic_dedup(spark, sf_dir).collect()}
    hier = {r.vec_id: r for r in
            q111_semantic_dedup_hier(spark, sf_dir).collect()}
    # every vector is assigned exactly once by both paths
    assert set(flat) == set(hier)
    by_cell = {}
    for r in hier.values():
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        # keep-lowest-id: the lowest id in a cell is never removed
        lowest = min(members, key=lambda r: r.vec_id)
        assert not lowest.removed, (cell, lowest)
        assert any(not r.removed for r in members), cell
    # the hierarchy trains its own cells (child seeds are per-super
    # members, not the first-K vectors), so raw cell IDS are
    # incomparable — what must agree is the PARTITION STRUCTURE: for a
    # seeded pair sample, whether two vectors share a cell should
    # usually match between the flat and hierarchical clusterings
    # (Rand-index flavor; measured 0.82-0.84 at the deliberately tiny
    # G=2 test hierarchy)
    import random
    rng = random.Random(7)
    ids = sorted(flat)
    pairs = [(rng.choice(ids), rng.choice(ids)) for _ in range(4000)]
    same = sum(1 for x, y in pairs
               if (flat[x].cell == flat[y].cell)
               == (hier[x].cell == hier[y].cell)) / len(pairs)
    assert same >= 0.75, same


def test_table_profile_measures_are_consistent(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
        _PROFILE_COLS, q100_table_profile)

    rows = q100_table_profile(spark, sf_dir).collect()
    assert {r.col_name for r in rows} == {c for c, _ in _PROFILE_COLS}
    n = load(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.n_rows == n
        assert 0 <= r.n_null <= r.n_rows
        assert 0 < r.n_distinct <= r.n_rows - r.n_null
        assert r.min_s is not None and r.max_s is not None


def test_bigram_novelty_bounds(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import q101_bigram_novelty

    rows = q101_bigram_novelty(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r.n_rare <= r.n_bigrams
        if r.n_bigrams == 0:
            assert r.fam_e6 is None and not r.is_novel
        else:
            # every bigram occurs in at least its own doc: df >= 1, so
            # mean df in micro-units is >= 1e6
            assert r.fam_e6 >= 1_000_000


def test_equidepth_buckets_partition_and_order(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
        EQD_BUCKETS, q102_equidepth_histogram)

    rows = sorted(q102_equidepth_histogram(spark, sf_dir).collect(),
                  key=lambda r: r.bucket)
    li = load(spark, sf_dir, "lineitem")
    assert [r.bucket for r in rows] == list(range(EQD_BUCKETS))
    # buckets partition the table exactly
    assert sum(r.n_rows for r in rows) == li.count()
    # equi-depth: each bucket within 2% of the ideal share (continuous
    # value column, so boundary ties are negligible)
    ideal = li.count() / EQD_BUCKETS
    for r in rows:
        assert abs(r.n_rows - ideal) <= 0.02 * li.count() + 1, r
    # value ranges are disjoint and ordered
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_v <= hi.min_v, (lo, hi)


def test_key_uniqueness_lattice_properties(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.relational import (
        _KEY_CANDIDATES, q104_key_uniqueness)

    rows = {r.candidate: r for r in q104_key_uniqueness(spark, sf_dir).collect()}
    n = load(spark, sf_dir, "lineitem").count()
    assert set(rows) == {"+".join(c) for c in _KEY_CANDIDATES}
    for r in rows.values():
        assert r.n_rows == n
        assert 1 <= r.n_keys <= n
        assert r.is_unique == (r.n_keys == n) == (r.n_rows_in_dup_groups == 0)
        # every violating group has >= 2 rows
        if not r.is_unique:
            assert r.n_rows_in_dup_groups >= 2 * (n - r.n_keys > 0)
    # a superset of columns never has fewer distinct keys
    for a in _KEY_CANDIDATES:
        for b in _KEY_CANDIDATES:
            if set(a) < set(b):
                assert rows["+".join(a)].n_keys <= rows["+".join(b)].n_keys


def test_drift_tvd_is_a_bounded_metric(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.events_analytics import q105_histogram_drift

    rows = q105_histogram_drift(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    per_type = {r.event_type: r for r in rows}
    # the query histograms only non-NULL values, so the slice totals
    # must reconcile against the NULL-excluded per-type counts
    counts = {r.event_type: r.n for r in
              ev.filter(F.col("value").isNotNull())
              .groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(per_type)
    for t, r in per_type.items():
        # slices partition the type's non-NULL-valued events
        assert r.n_early + r.n_late == counts.get(t, 0)
        if r.tvd_e6 is not None:
            # TVD is a [0, 1] metric (micro-units)
            assert 0 <= r.tvd_e6 <= 1_000_000
            assert r.drifted == (r.tvd_e6 > 50_000)
        else:
            # one-sided type (all events in a single half): no TVD,
            # and the flag stays two-valued
            assert r.drifted is False


def test_bloom_prefilter_is_a_superset_and_actually_reduces(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.operators.bloom import bloom_prefiltered

    sel = (load(spark, sf_dir, "orders")
           .filter(F.col("o_orderpriority") == "1-URGENT")
           .select("o_orderkey"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    n_all = li.count()
    reduced = bloom_prefiltered(li, sel, "l_orderkey", "o_orderkey")
    n_red = reduced.count()
    true_m = li.join(sel.distinct(), li.l_orderkey == sel.o_orderkey,
                     "left_semi")
    n_true = true_m.count()
    # never drops a true match...
    assert reduced.join(sel.distinct(),
                        reduced.l_orderkey == sel.o_orderkey,
                        "left_semi").count() == n_true
    assert n_red >= n_true
    # ...and the false-positive residue is small: the reduction is real
    # (1/5 priority selectivity + <1% fp at these key counts)
    assert n_red <= 0.3 * n_all, (n_red, n_all)
