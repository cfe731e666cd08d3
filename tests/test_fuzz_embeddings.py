"""Seeded randomized differential test over an adversarial embeddings
corpus: exact duplicate vectors, 1-ulp-ish near-duplicates, constant
dimensions (SQ8's hi == lo path, degenerate PQ sub-spaces), dense
clusters, tiny-norm and negative vectors, a NULL label — the edge
shapes the real testdata never exercises. Every embeddings-only
operator (sign-bucket and learned IVF, k-means step/trace, cluster
purity, SemDeDup flat and hierarchical, SQ8, IVF-PQ) must hash-match
its DuckDB oracle on this corpus exactly like the driver gate.

Component values are multiples of 1/1024, so they are exactly
representable in FLOAT (the parquet column type) and the
float->double widening is bit-identical in both engines.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from conftest import normalize_rows as _normalize, write_single_parquet

from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

SEED = 0xFEED
DIM = 64
N_VECS = 140
Q = 1024  # component grid: k/Q is exact in float32 for |k| < 2^14


def _gen_vectors():
    rng = random.Random(SEED)
    # three cluster centers on the grid
    centers = [[rng.randrange(-Q, Q) / Q for _ in range(DIM)]
               for _ in range(3)]
    vecs = []
    for i in range(N_VECS):
        r = rng.random()
        if vecs and r < 0.08:                       # exact duplicate
            v = list(rng.choice(vecs)[1])
        elif vecs and r < 0.16:                     # near duplicate
            v = list(rng.choice(vecs)[1])
            v[rng.randrange(DIM)] += 1 / Q
        elif r < 0.24:                              # tiny-norm vector
            v = [rng.randrange(-2, 3) / Q for _ in range(DIM)]
        elif r < 0.55:                              # clustered
            c = rng.choice(centers)
            v = [c[d] + rng.randrange(-32, 33) / Q for d in range(DIM)]
        else:                                       # isotropic
            v = [rng.randrange(-Q, Q) / Q for _ in range(DIM)]
        # dims 60..63 are constant across the corpus: hi == lo in SQ8,
        # zero-variance PQ sub-space
        v[60:64] = [0.25, -0.5, 0.0, 1.0]
        label = None if i == 13 else i % 5
        vecs.append((i, v, label))
    return vecs


FUZZ_EMB_QUERIES = [
    "q28_ivf_topk", "q29_embedding_neardup", "q81_kmeans_step",
    "q82_kmeans_lloyd", "q86_cluster_purity", "q94_learned_ivf",
    "q98_semantic_dedup", "q109_sq8_quantization",
    "q111_semantic_dedup_hier", "q113_ivfpq_adc",
    "q126_embedding_covariance",
]


@pytest.fixture(scope="module")
def fuzz_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_emb")
    df = spark.createDataFrame(
        _gen_vectors(),
        "vec_id bigint, embedding array<float>, label int")
    write_single_parquet(df, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FUZZ_EMB_QUERIES)
def test_fuzz_embeddings_match_oracle(spark, fuzz_emb_dir, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, fuzz_emb_dir)
    try:
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = list(sdf.columns)

        conn = duckdb.connect()
        try:
            conn.execute("CREATE VIEW embeddings AS SELECT * FROM "
                         f"'{fuzz_emb_dir}/embeddings.parquet'")
            res = conn.execute(q.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        finally:
            conn.close()

        assert sorted(spark_cols) == sorted(duck_cols)
        assert len(spark_rows) == len(duck_rows), (
            f"{name}: {len(spark_rows)} vs {len(duck_rows)}")
        assert _normalize(spark_cols, spark_rows) == \
            _normalize(duck_cols, duck_rows)
    finally:
        spark.catalog.clearCache()


def test_fuzz_corpus_has_the_edge_shapes():
    vecs = _gen_vectors()
    texts = [tuple(v) for _, v, _ in vecs]
    assert len(set(texts)) < len(texts)            # exact dups present
    assert any(l is None for _, _, l in vecs)      # NULL label present
    # constant dims really are constant
    assert len({tuple(v[60:64]) for _, v, _ in vecs}) == 1
