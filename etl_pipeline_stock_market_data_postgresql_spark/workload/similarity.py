"""Similarity-search workload over the embeddings table
(beyond-reference): brute-force cosine top-k (exact baseline),
sign-bucketed IVF top-k (scale path), embedding near-dup pairs.
Spark plans in operators/similarity.py; oracle SQL generated from the
same vector-math renderings (functions/vectors.py) so dot products are
evaluated in the same order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import Query
from ..functions.rounding import round_half_up_sql
from ..functions.vectors import cosine_sql, sign_bucket_sql
from ..operators import similarity
from ..sources.tables import load

N_QUERIES = 10      # vec_id < 10 are the query vectors
TOP_K = 5
IVF_BITS = 4
NEARDUP_THRESHOLD = 0.30  # synthetic corpus has no true near-dups; low
                          # threshold keeps the result set non-trivial

_COS = cosine_sql("a.v", "b.v")
# portable half-up rounding (NOT DuckDB ROUND, which is half-even —
# an exact tie at the 7th decimal would flip ranks across engines)
_SIM6 = round_half_up_sql(_COS, 6)
_EMB_D = "(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"


def q27_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 query vectors —
    query side broadcast, corpus streamed, windowed rank."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.brute_force_topk(queries, emb, "vec_id", "embedding", TOP_K)


_Q27_SQL = f"""
SELECT * FROM (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         {_SIM6} AS sim,
         CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {_SIM6} DESC, b.vec_id ASC) AS INT) AS rank
  FROM {_EMB_D} a JOIN {_EMB_D} b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {N_QUERIES}
)
WHERE rank <= {TOP_K}
"""


def q28_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 probing only the query's sign bucket — the
    1/2^bits-of-corpus-per-query ANN scale path."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.ivf_topk(queries, emb, "vec_id", "embedding", 3, IVF_BITS)


_BUCKET_A = sign_bucket_sql("a.v", IVF_BITS)
_BUCKET_B = sign_bucket_sql("b.v", IVF_BITS)

_Q28_SQL = f"""
SELECT * FROM (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_BUCKET_A} AS bucket,
         {_SIM6} AS sim,
         CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {_SIM6} DESC, b.vec_id ASC) AS INT) AS rank
  FROM {_EMB_D} a
  JOIN {_EMB_D} b ON {_BUCKET_A} = {_BUCKET_B} AND a.vec_id <> b.vec_id
  WHERE a.vec_id < {N_QUERIES}
)
WHERE rank <= 3
"""


def q29_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold via the
    bucketed scale path: candidates come from a sign-bucket equi-join
    (shuffle ∝ corpus, no corpus broadcast, no all-pairs product).
    q27 is the exact all-pairs recall baseline for this family."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.neardup_pairs(emb, "vec_id", "embedding",
                                    NEARDUP_THRESHOLD, n_bits=IVF_BITS)


_Q29_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_SIM6} AS sim
FROM {_EMB_D} a
JOIN {_EMB_D} b ON {_BUCKET_A} = {_BUCKET_B} AND a.vec_id < b.vec_id
WHERE {_SIM6} >= {NEARDUP_THRESHOLD}
"""


QUERIES: dict[str, Query] = {
    "q27_cosine_topk": Query(q27_cosine_topk, _Q27_SQL),
    "q28_ivf_topk": Query(q28_ivf_topk, _Q28_SQL),
    "q29_embedding_neardup": Query(q29_embedding_neardup, _Q29_SQL),
}
