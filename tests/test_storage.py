"""q75 plan guarantees: the gated bucketed-join query must actually run
the co-located (Exchange-free) join — otherwise it proves nothing the
plain join doesn't."""

from __future__ import annotations

import re
from contextlib import contextmanager

from etl_pipeline_stock_market_data_postgresql_spark import plans
from etl_pipeline_stock_market_data_postgresql_spark.workload.storage import (
    q75_bucketed_join, q75_joined)


@contextmanager
def _no_broadcast_no_aqe(spark):
    """Override confs for plan-shape assertions, restoring the values
    that were actually in effect (not hardcoded defaults) so these
    tests can never leak conf into the rest of the session."""
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled")
    saved = {k: spark.conf.get(k) for k in keys}
    spark.conf.set(keys[0], "-1")
    spark.conf.set(keys[1], "false")
    try:
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q75_join_subtree_has_no_exchange(spark, sf_dir):
    with _no_broadcast_no_aqe(spark):
        joined = q75_joined(spark, sf_dir)
        text = plans.explain_str(joined)
        assert "Exchange" not in text, text[:1200]
        assert "SortMergeJoin" in text, text[:1200]
        assert "Bucketed: true" in text, text[:1200]


def test_q75_full_query_single_agg_exchange(spark, sf_dir):
    # the only Exchange in the whole gated query is the final
    # per-segment aggregation — the join itself contributes none
    with _no_broadcast_no_aqe(spark):
        text = plans.explain_str(q75_bucketed_join(spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Exchange", text)) == 1, text[:1500]


def test_q75_is_idempotent(spark, sf_dir):
    # overwrite-mode rewrite: running the query twice in one session
    # (gate + bench do) must not fail or change results
    a = sorted(map(tuple, q75_bucketed_join(spark, sf_dir).collect()))
    b = sorted(map(tuple, q75_bucketed_join(spark, sf_dir).collect()))
    assert a == b and len(a) == 5
