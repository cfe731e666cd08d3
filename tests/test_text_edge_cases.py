"""Differential oracle on a corpus the driver testdata does NOT contain:
empty, punctuation-only, and single-token documents (ADVICE r2 — q63/q64
parity previously held only because testdata had no token-less texts).

Runs the same Spark-vs-DuckDB comparison as test_oracle_parity.py, but
over a synthetic documents table where every text-edge class appears.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (1, "", "en", "edge"),
    (2, "!!! ??? ...", "en", "edge"),           # punctuation-only
    (3, "hello", "en", "edge"),                 # single token
    (4, "the quick brown fox jumps over the lazy dog today", "en", "web"),
    (5, "the quick brown fox jumps over the lazy dog today", "en", "web"),
    (6, "a table row holds the data for a query line order", "en", "web"),
    (7, "---", "fr", "edge"),
    (8, "query line order join stream filter scan data here now", "fr", "web"),
    (9, "data stream filter scan query join order line the end", "fr", "web"),
    (10, "un deux trois quatre cinq six sept huit neuf dix", "fr", "web"),
]

# queries that read ONLY the documents table and exercise token math
DOC_QUERIES = [
    "q31_quality_score", "q32_token_stats", "q63_quality_gate",
    "q64_sequence_packing", "q67_tfidf_topterms", "q68_contamination",
    "q69_domain_mix_sample", "q30_langid", "q23_dedup_exact",
    "q58_stratified_split", "q59_stratum_sample",
    # r5: span dedup drops docs with < 6 tokens (empty/punct/single-token
    # rows must vanish identically in both engines); the count-min sketch
    # must survive a corpus where some docs contribute zero tokens
    "q83_duplicate_spans", "q84_heavy_hitters",
    # r6: BM25 must survive zero-token docs (dl = 0 never reaches a
    # denominator because such docs have no tf rows); the bigram model
    # must keep <2-token docs with n_bigrams = 0, never drop them
    "q97_bm25_ranking", "q101_bigram_novelty",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [(i, t, l, s, len(t)) for i, t, l, s in EDGE_DOCS]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet"))
    return str(d)


from conftest import normalize_rows as _normalize


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_sf_dir, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, edge_sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    conn = duckdb.connect()
    try:
        conn.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{edge_sf_dir}/documents.parquet/*.parquet'")
        res = conn.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        conn.close()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}")
    assert _normalize(spark_cols, spark_rows) == _normalize(duck_cols, duck_rows)
