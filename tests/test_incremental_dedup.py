"""Incremental near-dup dedup vs batch recompute — the operator's
correctness anchor: with a pair-free index whose ids precede the
delta's, components over corpus ∪ delta use exactly the delta-delta ∪
delta-corpus edges, so per-delta verdicts match a full batch rerun."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.operators import dedup, incremental_dedup as inc
from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load

THRESHOLD = 0.20


def _batch_keep_and_verdicts(docs, threshold=THRESHOLD):
    """Reference batch dedup: verified pairs -> components -> verdict
    (kept iff the doc is its component's minimum id)."""
    sh = dedup.shingle_table(docs, "doc_id", "text", n=3)
    sig = dedup.minhash_signatures(sh, "doc_id")
    cand = dedup.lsh_candidate_pairs(sig, "doc_id")
    ver = dedup.verify_jaccard_on_pairs(cand, sh, "doc_id", threshold)
    comp = dedup.connected_components(
        ver.select("id_a", "id_b").persist(), "id_a", "id_b")
    verdicts = (docs.select("doc_id")
                .join(comp.withColumnRenamed("node", "doc_id"),
                      "doc_id", "left")
                .select("doc_id",
                        F.coalesce("comp", F.col("doc_id"))
                        .alias("canonical_id")))
    return {r["doc_id"]: r["canonical_id"] for r in verdicts.collect()}


def _split(spark, sf_dir, frac=2 / 3):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    b = int(max_id * frac)
    return docs, docs.filter(F.col("doc_id") <= b), \
        docs.filter(F.col("doc_id") > b)


def test_incremental_equals_batch_recompute(spark, sf_dir):
    docs, corpus0, delta = _split(spark, sf_dir)
    # batch-dedup the initial corpus -> pair-free kept set
    batch0 = _batch_keep_and_verdicts(corpus0)
    kept0_ids = [i for i, c in batch0.items() if c == i]
    kept0 = corpus0.join(
        spark.createDataFrame([(i,) for i in kept0_ids], "doc_id long"),
        "doc_id", "left_semi")
    index = inc.build_minhash_index(kept0, "doc_id", "text")

    verdicts, new_rows = inc.incremental_neardup(
        index, delta, "doc_id", "text", THRESHOLD)
    got = {r["doc_id"]: (r["kept"], r["canonical_id"])
           for r in verdicts.collect()}

    # batch recompute over kept-corpus ∪ delta, restricted to delta ids
    union = kept0.unionByName(delta)
    batch = _batch_keep_and_verdicts(union)
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    expected = {i: (c == i, c) for i, c in batch.items() if i in delta_ids}
    assert got == expected
    assert len(got) == len(delta_ids)

    # the appended rows are exactly the kept delta docs' index rows
    new_ids = sorted(r["doc_id"] for r in new_rows.select("doc_id").collect())
    assert new_ids == sorted(i for i, (k, _) in got.items() if k)


def test_second_batch_induction(spark, sf_dir):
    """The kept-delta set is pair-free, so index ∪ new_rows is a valid
    index for the NEXT batch: a second increment still equals the batch
    recompute over all three generations."""
    docs, corpus0, rest = _split(spark, sf_dir, frac=1 / 2)
    mid = rest.agg(F.percentile_approx("doc_id", 0.5)).first()[0]
    delta1 = rest.filter(F.col("doc_id") <= mid)
    delta2 = rest.filter(F.col("doc_id") > mid)

    batch0 = _batch_keep_and_verdicts(corpus0)
    kept0 = corpus0.join(
        spark.createDataFrame(
            [(i,) for i, c in batch0.items() if c == i], "doc_id long"),
        "doc_id", "left_semi")
    index = inc.build_minhash_index(kept0, "doc_id", "text")
    v1, rows1 = inc.incremental_neardup(index, delta1, "doc_id", "text",
                                        THRESHOLD)
    index2 = index.unionByName(rows1)
    v2, _ = inc.incremental_neardup(index2, delta2, "doc_id", "text",
                                    THRESHOLD)
    got2 = {r["doc_id"]: (r["kept"], r["canonical_id"])
            for r in v2.collect()}

    kept1 = delta1.join(v1.filter("kept").select("doc_id"),
                        "doc_id", "left_semi")
    union = kept0.unionByName(kept1).unionByName(delta2)
    batch = _batch_keep_and_verdicts(union)
    delta2_ids = {r["doc_id"] for r in delta2.select("doc_id").collect()}
    expected = {i: (c == i, c) for i, c in batch.items() if i in delta2_ids}
    assert got2 == expected


def test_id_ordering_precondition_enforced(spark, sf_dir):
    docs, corpus0, delta = _split(spark, sf_dir)
    # swap roles: delta ids now PRECEDE the index's -> must refuse
    index = inc.build_minhash_index(delta, "doc_id", "text")
    with pytest.raises(ValueError, match="append-ordered"):
        inc.incremental_neardup(index, corpus0, "doc_id", "text", THRESHOLD)


def test_unique_delta_all_kept(spark, sf_dir):
    """A delta with no near-dups (each doc its own text universe) keeps
    everything and appends one index row per doc."""
    docs, corpus0, delta = _split(spark, sf_dir)
    index = inc.build_minhash_index(corpus0.limit(0), "doc_id", "text")
    small = delta.limit(20)
    verdicts, new_rows = inc.incremental_neardup(
        index, small, "doc_id", "text", 0.999999)
    rows = verdicts.collect()
    assert len(rows) == small.count()
    assert all(r["kept"] and r["canonical_id"] == r["doc_id"] for r in rows)
    assert new_rows.count() == len(rows)
