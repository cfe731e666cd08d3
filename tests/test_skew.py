from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.operators import skew


def test_salted_distinct_count_matches_plain(spark):
    # hot key: 'hot' has 5000 rows, others 10 each
    rows = [("hot", i % 700) for i in range(5000)]
    rows += [(f"k{j}", i) for j in range(20) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, v int")
    salted = {r["k"]: r["n_distinct"]
              for r in skew.salted_distinct_count(df, ["k"], "v").collect()}
    plain = {r["k"]: r["n"]
             for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    assert salted == plain
    assert salted["hot"] == 700


def test_salted_distinct_count_plan_is_array_free(spark):
    # the scale guarantee: two hash aggregations, no per-task arrays —
    # a collect_set formulation would show ObjectHashAggregate
    df = spark.createDataFrame([("k", 1)], "k string, v int")
    plan = (skew.salted_distinct_count(df, ["k"], "v")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ObjectHashAggregate" not in plan
    assert "collect_set" not in plan
    assert "HashAggregate" in plan


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", i) for i in range(5)],
        "k string, payload int")
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("absent", "A")], "k string, tag string")
    salted = (skew.salted_join(left, right, ["k"], ["payload"], factor=4)
              .groupBy("k", "tag").count())
    plain = left.join(right, "k").groupBy("k", "tag").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    a = df.select(skew.deterministic_salt(["v"], 8).alias("s")).collect()
    b = df.select(skew.deterministic_salt(["v"], 8).alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]
    assert all(0 <= r["s"] < 8 for r in a)
