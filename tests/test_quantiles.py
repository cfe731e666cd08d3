"""functions.quantiles.exact_percentiles — bit-exact pin against the
``percentile`` aggregate it replaces (the r16 optimization contract:
same doubles, cheaper plan)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.functions.quantiles import (
    exact_percentiles, round_half_up_py)
from etl_pipeline_stock_market_data_postgresql_spark.functions.rounding import (
    round_half_up)
from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load

QS = [k / 8 for k in range(1, 8)]


def _agg_percentile(df, col, ps):
    pcsv = ", ".join(repr(p) for p in ps)
    return list(df.agg(F.expr(f"percentile({col}, array({pcsv}))")).first()[0])


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_matches_percentile_aggregate_on_lineitem(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    got = exact_percentiles(li, "l_extendedprice", QS)
    want = _agg_percentile(li, "l_extendedprice", QS)
    assert got == want  # bit-exact doubles, not approx


def test_matches_on_ties_nulls_and_tiny(spark):
    # heavy ties (forces duplicate mass through the bracket windows),
    # NULLs (percentile ignores them), and n smaller than the sketch
    # accuracy (GK degenerates to exact)
    rows = ([(float(v),) for v in [1, 1, 1, 2, 2, 3, 3, 3, 3, 10]] * 7
            + [(None,)] * 5)
    df = spark.createDataFrame(rows, "x double")
    ps = [0.1, 0.25, 0.5, 0.9, 0.99]
    assert exact_percentiles(df, "x", ps) == _agg_percentile(df, "x", ps)


def test_all_null_and_rounding_twin(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_percentiles(df, "x", [0.5]) == [None]
    # python rounding twin == Spark expression on awkward doubles
    vals = [1234.5678915, 0.0000005, 90000.000001, 7.125]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    spark_side = [r[0] for r in
                  sdf.select(round_half_up(F.col("x"), 6)).collect()]
    assert [round_half_up_py(v, 6) for v in vals] == spark_side


def test_loose_sketch_still_exact(spark):
    # accuracy far below n: wide brackets, big candidate windows — the
    # refinement must still return the exact aggregate's doubles
    df = spark.range(1000).select((F.col("id") * 1.5).alias("x"))
    got = exact_percentiles(df, "x", [0.5, 0.9], accuracy=10)
    assert got == _agg_percentile(df, "x", [0.5, 0.9])


def test_fallback_when_sketch_uncovered(spark):
    # force the coverage check to fail (a sketch whose bracket misses
    # the needed rank): exactness must come from the
    # percentile-aggregate fallback, never the sketch
    import etl_pipeline_stock_market_data_postgresql_spark.functions.quantiles as q
    df = spark.range(1000).select((F.col("id") * 1.5).alias("x"))
    want = _agg_percentile(df, "x", [0.5])
    real_first = type(df).first
    calls = {"n": 0}

    def poisoned_first(self):
        row = real_first(self)
        calls["n"] += 1
        if calls["n"] == 1:  # the sketch row: brackets below all data
            return type(row)(n=row["n"], b=[0.0, 0.0])
        return row

    import unittest.mock as mock
    with mock.patch.object(type(df), "first", poisoned_first):
        got = q.exact_percentiles(df, "x", [0.9])
    assert calls["n"] >= 2  # fallback aggregate actually ran
    assert got == _agg_percentile(df, "x", [0.9])
