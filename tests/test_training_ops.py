"""Semantic properties of the round-3 training-data operators — checks
the oracle hash-compare cannot express (it proves Spark == DuckDB, not
that both satisfy the operator's contract)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import (
    q69_domain_mix_sample, q70_scd2_history)


def test_scd2_intervals_partition_history(spark, sf_dir):
    rows = q70_scd2_history(spark, sf_dir).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["custkey"]].append(r)
    assert by_cust, "no SCD2 rows produced"
    for cust, versions in by_cust.items():
        versions.sort(key=lambda r: r["version_n"])
        # version numbers are 1..n dense
        assert [r["version_n"] for r in versions] == list(
            range(1, len(versions) + 1))
        # exactly one open (current) version, and it is the last
        currents = [r for r in versions if r["is_current"]]
        assert len(currents) == 1 and currents[0] is versions[-1]
        for a, b in zip(versions, versions[1:]):
            # intervals chain with no gaps or overlaps
            assert a["effective_to"] == b["effective_from"], (cust, a, b)
            # a new version exists only when the attribute changed
            assert a["priority"] != b["priority"], (cust, a, b)
        # the open interval is encoded as NULL (pandas-safe; no
        # 9999-12-31-style sentinel that overflows datetime64[ns])
        assert versions[-1]["effective_to"] is None
        for r in versions[:-1]:
            assert r["effective_to"] is not None


def test_domain_mix_upsamples_rare_languages(spark, sf_dir):
    rows = q69_domain_mix_sample(spark, sf_dir).collect()
    assert rows
    # temperature alpha=0.5 contract: smaller domains get a sampling
    # probability at least as high as larger ones
    by_size = sorted(rows, key=lambda r: r["n_docs"])
    for small, large in zip(by_size, by_size[1:]):
        assert small["sample_p"] >= large["sample_p"] - 1e-12
    # the overall budget lands near 25% (hash uniformity at test scale)
    total = sum(r["n_docs"] for r in rows)
    sampled = sum(r["n_sampled"] for r in rows)
    assert 0.15 <= sampled / total <= 0.35, (sampled, total)
    # sampled never exceeds the stratum, probabilities are valid
    for r in rows:
        assert 0.0 <= r["sample_p"] <= 1.0
        assert r["n_sampled"] <= r["n_docs"]


def test_contamination_excludes_eval_slice(spark, sf_dir):
    from etl_pipeline_stock_market_data_postgresql_spark.workload.training_ops import (
        EVAL_MOD, q68_contamination)
    from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load

    rows = {r["lang"]: r for r in q68_contamination(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents")
    train_counts = {r["lang"]: r["n"] for r in
                    docs.filter(F.col("doc_id") % EVAL_MOD != 0)
                    .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # n_train counts exactly the non-eval docs; contamination is a subset
    for lang, r in rows.items():
        assert r["n_train"] == train_counts[lang]
        assert 0 <= r["n_contaminated"] <= r["n_train"]
