"""q75 plan guarantees: the gated bucketed-join query must actually run
the co-located (Exchange-free) join — otherwise it proves nothing the
plain join doesn't."""

from __future__ import annotations

from etl_pipeline_stock_market_data_postgresql_spark import plans
from etl_pipeline_stock_market_data_postgresql_spark.workload.storage import (
    q75_bucketed_join, q75_joined)


def test_q75_join_subtree_has_no_exchange(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = q75_joined(spark, sf_dir)
        text = plans.explain_str(joined)
        assert "Exchange" not in text, text[:1200]
        assert "SortMergeJoin" in text, text[:1200]
        assert "Bucketed: true" in text, text[:1200]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q75_full_query_single_agg_exchange(spark, sf_dir):
    # the only Exchange in the whole gated query is the final
    # per-segment aggregation — the join itself contributes none
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        import re
        text = plans.explain_str(q75_bucketed_join(spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Exchange", text)) == 1, text[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q75_is_idempotent(spark, sf_dir):
    # overwrite-mode rewrite: running the query twice in one session
    # (gate + bench do) must not fail or change results
    a = sorted(map(tuple, q75_bucketed_join(spark, sf_dir).collect()))
    b = sorted(map(tuple, q75_bucketed_join(spark, sf_dir).collect()))
    assert a == b and len(a) == 5
