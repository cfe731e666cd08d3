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
