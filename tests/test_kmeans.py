"""Lloyd k-means operator: convergence and partition properties the
gated single step (q81) can't show — multi-iteration inertia descent,
empty-cluster survival, and assignment totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.functions.vectors import as_double
from etl_pipeline_stock_market_data_postgresql_spark.operators import kmeans
from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load

K = 8


def _vectors(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(F.col("vec_id").alias("id"),
                      as_double(F.col("embedding")).alias("v"))


def test_lloyd_inertia_never_increases(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    centroids = (v.filter(F.col("id") < K)
                 .select(F.col("id").alias("cid"), F.col("v").alias("cv")))
    _, history = kmeans.lloyd(v, centroids, n_iter=3)
    assert len(history) == 3
    # Textbook monotonicity holds for exact arithmetic; centroid
    # components are quantized (1e-9 grid) before the next assignment,
    # so near convergence an iteration may tick up by quantization
    # noise. Allow n·D quanta of slack (n≈1500 vecs × D=64 dims × 1e-9
    # per squared-distance term ≪ 1e-3 at this corpus's inertia scale).
    n, d = v.count(), 64
    eps_q = n * d * 1e-9
    assert all(b <= a + eps_q for a, b in zip(history, history[1:])), history


def test_lloyd_trace_matches_lloyd_history(spark, sf_dir):
    # the distributed trace (gated path, q82) must report exactly the
    # inertia sequence the driver-side convergence loop sees
    v = _vectors(spark, sf_dir)
    centroids = (v.filter(F.col("id") < K)
                 .select(F.col("id").alias("cid"), F.col("v").alias("cv")))
    _, history = kmeans.lloyd(v, centroids, n_iter=3)
    trace = kmeans.lloyd_trace(v, centroids, n_iter=3)
    assert trace.columns == ["iteration", "inertia_q", "n_assigned"]
    rows = sorted(trace.collect(), key=lambda r: r["iteration"])
    assert [r["inertia_q"] for r in rows] == history
    n = v.count()
    assert all(r["n_assigned"] == n for r in rows)


def test_assignment_is_total_and_unique(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    centroids = (v.filter(F.col("id") < K)
                 .select(F.col("id").alias("cid"), F.col("v").alias("cv")))
    assigned = kmeans.assign(v, centroids)
    n_vec = v.count()
    assert assigned.count() == n_vec
    assert assigned.select("id").distinct().count() == n_vec
    assert assigned.filter(~F.col("cid").between(0, K - 1)).count() == 0
    # each seed vector is its own nearest centroid (d2 == 0)
    own = assigned.filter(F.col("id") < K)
    assert own.filter(F.col("d2") != 0.0).count() == 0


def test_empty_cluster_keeps_old_centroid(spark):
    # a centroid far from every point gets no members and must survive
    # the update unchanged
    data = [(i, [float(i % 3), 0.0]) for i in range(30)]
    v = spark.createDataFrame(data, "id: long, v: array<double>")
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [100.0, 100.0])],
        "cid: long, cv: array<double>")
    assigned = kmeans.assign(v, cent)
    assert assigned.filter(F.col("cid") == 2).count() == 0
    updated = kmeans.new_centroids(kmeans.component_sums(assigned), cent)
    rows = {r["cid"]: r["cv"] for r in updated.collect()}
    assert rows[2] == [100.0, 100.0]
    assert len(rows) == 3
