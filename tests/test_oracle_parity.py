"""Local differential-oracle harness — the same comparison the driver's
correctness gate performs: run every workload query in Spark AND its
DuckDB oracle SQL on identical parquet, compare row count, column names,
and order-insensitive values.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/
testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd
import pytest

from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import TESTDATA_TABLES
from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

QUERIES = all_queries()


def _duckdb_conn(sf_dir: str):
    conn = duckdb.connect()
    for t in TESTDATA_TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return conn


from conftest import normalize_rows as _normalize_rows_impl


def _assert_pandas_safe(name, engine, rows):
    """The external driver's gate compares results through pandas, whose
    datetime64[ns] range tops out at 2262-04-11 — narrower than Spark's
    and DuckDB's TIMESTAMP. A value that stringifies fine here but
    overflows there (e.g. a 9999-12-31 sentinel) would pass locally and
    fail at the gate, so force every temporal cell through the same
    nanosecond conversion the driver performs."""
    for r in rows:
        for v in r:
            if isinstance(v, (_dt.datetime, _dt.date)):
                try:
                    pd.Timestamp(v).as_unit("ns")
                except (ValueError, OverflowError) as e:
                    raise AssertionError(
                        f"{name}: {engine} value {v!r} is outside pandas "
                        f"datetime64[ns] range — the driver gate would "
                        f"fail on it: {e}") from e


def _normalize_rows(cols, rows):
    return _normalize_rows_impl(cols, rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    _compare(spark, sf_dir, name)


# The queries the external driver's 50-row gate has historically missed
# (see CORRECTNESS_SEEN.md) lean hardest on local evidence — run them at
# the driver's own scale (sf0.01) in the DEFAULT suite, not just behind
# the env knob (~+45s budget; skipped when the knob already points at a
# non-default dir to avoid double-running).
import os as _os

_DRIVER_SCALE_DIR = "/root/testdata/sf0.01"
_DRIVER_GAPPED = [
    "q45_window_suite", "q46_streaming_tumbling", "q47_sql_exists",
    "q48_vwap", "q49_volatility", "q50_drawdown", "q53_ema", "q54_rsi",
    "q55_bollinger", "q56_range_join", "q57_hierarchical_rollup",
    "q58_stratified_split", "q59_stratum_sample", "q60_embedding_centroids",
    "q62_streaming_session_window", "q64_sequence_packing",
    "q67_tfidf_topterms", "q68_contamination", "q69_domain_mix_sample",
    "q70_scd2_history", "q71_rollup_refresh", "q72_policy_redaction",
    "q73_streaming_stream_join", "q74_multimodal_decode",
    "q75_bucketed_join", "q76_repetition_stats", "q77_funnel",
    "q78_token_chunks", "q79_shuffle_shard", "q80_hll_distinct",
    "q81_kmeans_step",
]


@pytest.mark.parametrize("name", _DRIVER_GAPPED)
def test_driver_gapped_query_at_driver_scale(spark, name):
    if _os.environ.get("SPARK_GRAFT_TEST_SF_DIR"):
        pytest.skip("explicit SF dir set; main parametrization covers this")
    _compare(spark, _DRIVER_SCALE_DIR, name)


def _compare(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    assert q.oracle is not None, f"{name}: no oracle SQL declared"
    conn = _duckdb_conn(sf_dir)
    try:
        res = conn.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        conn.close()

    _assert_pandas_safe(name, "spark", spark_rows)
    _assert_pandas_safe(name, "duckdb", duck_rows)
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    a = _normalize_rows(spark_cols, spark_rows)
    b = _normalize_rows(duck_cols, duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"
