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


# ---------------------------------------------------------------------------
# Engine-type portability: the driver's gate hashes both results THROUGH
# PANDAS, whose dtype conversion is engine-specific. DuckDB HUGEINT (the
# default result of sum(BIGINT)) becomes float64, so an uncast oracle sum
# hashes as "140.0" against Spark's "140" and the gate goes red even though
# raw values match — exactly how q119 escaped the r8 local harness (which
# deliberately compares raw collect()/fetchall() values). Pin the repo
# convention instead: every OUTPUT column of both engines must be a
# pandas-portable primitive, and the per-column kinds must agree.
# ---------------------------------------------------------------------------

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def _duck_kind(type_str: str) -> str:
    t = type_str.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"  # rejected outright below
    if t in _DUCK_INT:
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return f"other:{t}"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return f"other:{dt.simpleString()}"


def _assert_type_portable(name, conn, oracle_sql, spark_schema):
    """Bind (not execute) the oracle and compare output types, by column
    name, against the Spark result schema after mapping both to pandas
    dtype kinds. Rejects the two divergence classes pandas mediation
    introduces: HUGEINT (int128 -> float64) and DECIMAL (float64 in
    DuckDB's .df() vs object Decimal in Spark's toPandas) — output
    columns must be cast to BIGINT/DOUBLE before leaving the query."""
    rel = conn.sql(oracle_sql)
    duck = {c: _duck_kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    spark = {f.name: _spark_kind(f.dataType) for f in spark_schema.fields}
    problems = []
    for col, dk in duck.items():
        if dk == "HUGEINT":
            problems.append(
                f"oracle column {col!r} is HUGEINT (uncast sum?) — pandas "
                f"renders it float64; CAST(... AS BIGINT) in the oracle")
        elif dk == "decimal":
            problems.append(
                f"oracle column {col!r} is DECIMAL — DuckDB .df() gives "
                f"float64 while Spark toPandas gives object Decimal; cast "
                f"the output to DOUBLE (or BIGINT) in BOTH engines")
    for col in set(duck) & set(spark):
        dk, sk = duck[col], spark[col]
        if dk in ("HUGEINT", "decimal") or sk == "decimal":
            continue  # already reported above / symmetric decimal rule
        if dk != sk:
            problems.append(
                f"column {col!r}: oracle kind {dk} vs spark kind {sk} — "
                f"pandas dtypes diverge, the gate hash will differ even "
                f"on equal values")
    for col, sk in spark.items():
        if sk == "decimal":
            problems.append(
                f"spark column {col!r} is DecimalType — toPandas gives "
                f"object Decimal vs the oracle's float64; cast to double "
                f"at the output")
    assert not problems, f"{name}: non-portable output types: " + \
        "; ".join(problems)


def test_all_oracles_bind_to_portable_types(sf_dir):
    """Bind-time sweep (no Spark, no execution): every declared oracle's
    output columns must be pandas-portable primitives. This is the fast
    gate for the q119 class — an uncast sum() binds as HUGEINT and fails
    here in milliseconds rather than at the driver's correctness gate."""
    conn = _duckdb_conn(sf_dir)
    try:
        bad = []
        for name, q in sorted(QUERIES.items()):
            if q.oracle is None:
                continue
            rel = conn.sql(q.oracle)
            for c, t in zip(rel.columns, rel.types):
                k = _duck_kind(str(t))
                if k in ("HUGEINT", "decimal") or k.startswith("other:"):
                    bad.append((name, c, str(t)))
        assert not bad, (
            "oracle output columns with non-portable types (cast to "
            f"BIGINT/DOUBLE at the output): {bad}")
    finally:
        conn.close()


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
    # the tier whose newest driver row is OLDEST after the r15 window
    # (the 34 r12-tier queries the r15 rotation could not fit — they
    # rotate into the gate in r16; see CORRECTNESS_SEEN.md's r15
    # derived row and r16 seed); local sf0.01 evidence bridges the
    # gap until then:
    "q15_set_ops", "q16_rollup", "q17_pivot_status",
    "q18_distinct_agg", "q19_having_heavy_customers",
    "q20_asof_last_click", "q87_full_outer_reconciliation",
    "q52_multiset_ops", "q100_table_profile",
    "q102_equidepth_histogram", "q104_key_uniqueness",
    "q107_bloom_join", "q22_sessionization", "q65_salted_distinct",
    "q66_salted_join", "q77_funnel", "q80_hll_distinct",
    "q95_quantile_sketch", "q99_anomaly_zscore",
    "q105_histogram_drift", "q23_dedup_exact", "q24_ngram_jaccard",
    "q25_minhash_lsh", "q26_simhash", "q117_dedup_span_removal",
    "q94_learned_ivf", "q98_semantic_dedup", "q109_sq8_quantization",
    "q144_ann_model_drift", "q30_langid", "q31_quality_score",
    "q115_bpe_train", "q116_trained_quality_scorer",
    "q118_small_file_compaction",
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
        _assert_type_portable(name, conn, q.oracle, sdf.schema)
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
