"""Bucketed-table co-located join: the write-time layout contract must
actually eliminate the join shuffle (and with sorted buckets, the
per-bucket sort). These are plan-shape guarantees — the 100 TB payoff
is that every repeated join on the bucket key skips the Exchange."""

from __future__ import annotations

import pytest

from etl_pipeline_stock_market_data_postgresql_spark import plans
from etl_pipeline_stock_market_data_postgresql_spark.sources.bucketed import (
    colocated_join, write_bucketed)
from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    write_bucketed(orders, "t_orders_b", ["o_custkey"], N_BUCKETS,
                   sort_cols=["o_custkey"], path=str(base / "orders"))
    write_bucketed(customer, "t_customer_b", ["c_custkey"], N_BUCKETS,
                   sort_cols=["c_custkey"], path=str(base / "customer"))
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def _no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")


def _restore(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_colocated_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    _no_broadcast(spark)
    try:
        joined = colocated_join(spark, t_orders, t_customer,
                                "o_custkey", "c_custkey")
        text = plans.explain_str(joined)
        assert "Exchange" not in text, text[:1200]
        assert "SortMergeJoin" in text, text[:1200]
        assert "Bucketed: true" in text, text[:1200]
    finally:
        _restore(spark)


def test_unbucketed_join_does_shuffle(spark, sf_dir, bucketed_tables):
    # control: the same join on raw parquet MUST have exchanges —
    # proving the bucketed plan's absence of Exchange is the layout's
    # doing, not some session-wide setting
    _no_broadcast(spark)
    try:
        orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
        joined = orders.join(customer,
                             orders["o_custkey"] == customer["c_custkey"])
        assert "Exchange" in plans.explain_str(joined)
    finally:
        _restore(spark)


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    joined = colocated_join(spark, t_orders, t_customer,
                            "o_custkey", "c_custkey")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    expected = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]).count()
    # row-identical to the unbucketed join
    assert joined.count() == expected


def test_bucket_pruning_on_key_equality(spark, sf_dir, bucketed_tables):
    # point lookups on the bucket key read 1 of N buckets: the scan
    # advertises SelectedBucketsCount 1
    t_orders, _ = bucketed_tables
    some_key = spark.table(t_orders).select("o_custkey").first()[0]
    # a bare filter exploits no output distribution, so the planner
    # auto-disables the bucketed scan; force it to surface the pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        df = spark.table(t_orders).filter(f"o_custkey = {some_key}")
        text = plans.explain_str(df)
        assert "SelectedBucketsCount: 1 out of" in text, text[:800]
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                       "true")
