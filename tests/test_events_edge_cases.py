"""Differential oracle over an events corpus the driver testdata does
NOT contain: exact session-gap boundaries, timestamps landing exactly
on window edges, NULL values, sparse users with week gaps, duplicate
timestamps needing tiebreaks, and funnel users who purchase before
viewing. The same Spark-vs-DuckDB comparison as test_oracle_parity.py,
over a synthetic events table where every boundary class appears.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(days=0, hours=0, minutes=0, seconds=0, micros=0):
    return _T0 + dt.timedelta(days=days, hours=hours, minutes=minutes,
                              seconds=seconds, microseconds=micros)


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # single event in the corpus's first hour, exactly on the hour
    (1, _ts(), 1, "view", 1.0, "{}"),
    # user 2: second event EXACTLY 30 min after the first (the session
    # rule: a gap of exactly the threshold starts a NEW session)
    (2, _ts(hours=1), 2, "view", 2.0, "{}"),
    (3, _ts(hours=1, minutes=30), 2, "click", 3.0, "{}"),
    # and a third 29:59.999999 later (same session — one microsecond in)
    (4, _ts(hours=1, minutes=59, seconds=59, micros=999999), 2, "view",
     4.0, "{}"),
    # exactly on a half-hour boundary (sliding-window edge: [start, end))
    (5, _ts(hours=2, minutes=30), 3, "view", 5.0, "{}"),
    # NULL value (sums must go NULL-transparent identically)
    (6, _ts(hours=3), 3, "click", None, "{}"),
    # duplicate timestamp, same user, distinct event_ids (tiebreak)
    (7, _ts(hours=4), 4, "view", 7.0, "{}"),
    (8, _ts(hours=4), 4, "view", 8.0, "{}"),
    # funnel: user 5 converts in order; user 6 purchases BEFORE viewing
    (9, _ts(days=1), 5, "view", 1.0, "{}"),
    (10, _ts(days=1, minutes=5), 5, "click", 1.0, "{}"),
    (11, _ts(days=1, minutes=10), 5, "purchase", 9.0, "{}"),
    (12, _ts(days=2), 6, "purchase", 9.0, "{}"),
    (13, _ts(days=2, minutes=5), 6, "view", 1.0, "{}"),
    # user 7: active in week 1 and week 3, silent in week 2 (retention
    # gap; also stretches the gap-fill grid across empty hours)
    (14, _ts(days=3), 7, "view", 1.0, "{}"),
    (15, _ts(days=15), 7, "view", 1.0, "{}"),
]

# queries that read ONLY the events table
EVENT_QUERIES = [
    "q22_sessionization", "q77_funnel", "q80_hll_distinct",
    "q85_retention_cohorts", "q88_sliding_window_stats",
    "q90_gapfill_locf", "q92_time_range_window",
    # r6 events-only additions
    "q95_quantile_sketch", "q99_anomaly_zscore", "q105_histogram_drift",
    "q108_twap",
    # r13: portable sketches (events-only)
    "q155_portable_hll_registers",
    "q156_portable_kmv_theta",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events")
    df = spark.createDataFrame(
        EDGE_EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    from conftest import write_single_parquet
    write_single_parquet(df, os.path.join(str(d), "events.parquet"))
    return str(d)


from conftest import normalize_rows as _normalize


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(spark, edge_events_dir, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, edge_events_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    conn = duckdb.connect()
    try:
        conn.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{edge_events_dir}/events.parquet'")
        res = conn.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        conn.close()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}")
    assert _normalize(spark_cols, spark_rows) == _normalize(duck_cols, duck_rows)
