"""Similarity search over embedding columns (beyond-reference,
first-class): brute-force cosine top-k as the correctness baseline and a
sign-bucketed (IVF-style) variant as the scale path.

Scale design:
- Norms are computed ONCE per vector before pairing (the per-pair
  arithmetic is bit-identical to recomputing them, so oracle parity is
  unaffected, but the per-pair cost drops to one dot product).
- The corpus side is hash-repartitioned to full parallelism first —
  embedding tables often arrive as few fat row-groups, and the pairwise
  compute must not serialize on scan partitioning.
- Brute force is broadcast(queries) × corpus: no corpus shuffle.
  Fine up to ~1e10 pair-ops; beyond that, bucket.
- IVF/sign-LSH: both sides get a coarse bucket id from component signs;
  the join is bucket-equi, probing 1/2^bits of the corpus per query.
  Recall < 1 by design — the approximate scale path; brute force is the
  exact oracle to measure recall against.

Ranking uses round(sim, 6) with an id tiebreak so ordering is stable
across engines and runs (floating-point last-ulp differences cannot
flip ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import vectors
from ..functions.rounding import round_half_up


def _prepped(df: DataFrame, id_col: str, vec_col: str, id_alias: str,
             vec_alias: str, nrm_alias: str, n_bits: int = 0) -> DataFrame:
    v = vectors.as_double(F.col(vec_col))
    cols = [F.col(id_col).alias(id_alias), v.alias(vec_alias),
            vectors.norm(v).alias(nrm_alias)]
    if n_bits > 0:
        cols.append(vectors.sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
    return df.select(*cols)


def _sim(vec_a: str, vec_b: str, nrm_a: str, nrm_b: str) -> F.Column:
    return round_half_up(
        vectors.dot(F.col(vec_a), F.col(vec_b)) / (F.col(nrm_a) * F.col(nrm_b)), 6)


def _spread(df: DataFrame, key: str) -> DataFrame:
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)


def brute_force_topk(queries: DataFrame, corpus: DataFrame, id_col: str,
                     vec_col: str, k: int) -> DataFrame:
    """Exact cosine top-k: (q_id, neighbor_id, sim, rank). Self-matches
    (same id) are excluded."""
    q = _prepped(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    c = _spread(_prepped(corpus, id_col, vec_col, "neighbor_id", "n_vec", "n_nrm"),
                "neighbor_id")
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("neighbor_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("sim", _sim("q_vec", "n_vec", "q_nrm", "n_nrm"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "sim", "rank"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, id_col: str,
             vec_col: str, k: int, n_bits: int = 4) -> DataFrame:
    """Approximate top-k probing only the query's sign-bucket:
    (q_id, neighbor_id, bucket, sim, rank)."""
    q = _prepped(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm", n_bits)
    c = _spread(_prepped(corpus, id_col, vec_col, "neighbor_id", "n_vec", "n_nrm", n_bits),
                "neighbor_id")
    pairs = c.join(F.broadcast(q), "bucket").filter(F.col("q_id") != F.col("neighbor_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("sim", _sim("q_vec", "n_vec", "q_nrm", "n_nrm"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "bucket", "sim", "rank"))


def learned_ivf_topk(queries: DataFrame, corpus: DataFrame,
                     centroids: DataFrame, id_col: str, vec_col: str,
                     k: int, nprobe: int = 2) -> DataFrame:
    """IVF-Flat ANN with LEARNED cells: corpus vectors live in their
    nearest-centroid cell; each query probes its ``nprobe`` nearest
    cells. (q_id, neighbor_id, cell, sim, rank) — the trained upgrade
    of :func:`ivf_topk`'s sign-bucket heuristic, and the standard
    100 TB ANN shape (FAISS IVF-Flat): per-query work is the probed
    cells' population, ~nprobe/K of the corpus, and recall follows
    cell quality rather than a fixed hash.

    ``centroids``: (cid, cv: array<double>), e.g. from
    operators/kmeans.lloyd. Scale shape: both cell assignments are the
    broadcast-K struct-min argmin (shuffle-free fanout; ties on d2 go
    to the smaller cid in both engines); the candidate pairing is a
    broadcast of the tiny probe table keyed on cell — each corpus row
    belongs to exactly one cell, so a (q, neighbor) pair arises at most
    once and needs no dedup."""
    from .kmeans import sqdist

    q = _prepped(queries, id_col, vec_col, "q_id", "q_vec", "q_nrm")
    c = _spread(_prepped(corpus, id_col, vec_col, "neighbor_id", "n_vec",
                         "n_nrm"), "neighbor_id")
    cd = (c.crossJoin(F.broadcast(centroids))
          .withColumn("d2", sqdist(F.col("n_vec"), F.col("cv"))))
    cells = (cd.groupBy("neighbor_id")
             .agg(F.min(F.struct("d2", "cid")).alias("m"),
                  F.first("n_vec").alias("n_vec"),   # constant per id
                  F.first("n_nrm").alias("n_nrm"))
             .select("neighbor_id", "n_vec", "n_nrm",
                     F.col("m.cid").alias("cell")))
    qd = (q.crossJoin(F.broadcast(centroids))
          .withColumn("d2", sqdist(F.col("q_vec"), F.col("cv"))))
    wp = Window.partitionBy("q_id").orderBy("d2", "cid")
    probes = (qd.withColumn("cell_rank", F.row_number().over(wp))
              .filter(F.col("cell_rank") <= nprobe)
              .select("q_id", "q_vec", "q_nrm", F.col("cid").alias("cell")))
    pairs = (cells.join(F.broadcast(probes), "cell")
             .filter(F.col("q_id") != F.col("neighbor_id")))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("sim", _sim("q_vec", "n_vec", "q_nrm", "n_nrm"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "cell", "sim", "rank"))


def neardup_pairs(corpus: DataFrame, id_col: str, vec_col: str,
                  threshold: float, n_bits: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥
    threshold).

    ``n_bits > 0`` is the scale path: both sides carry a sign-bucket id
    and the pairing is a plain bucket equi-join — a shuffle proportional
    to the corpus, never a corpus broadcast (the full corpus stops
    fitting in executor memory long before the interesting scale).
    Near-identical vectors share sign buckets, so recall for true
    near-dups is high; pick ``n_bits`` so 2^n_bits buckets keep
    per-bucket populations task-sized (more bits at bigger corpora).
    Catalyst/AQE still broadcast-joins when a side is genuinely small.

    ``n_bits = 0`` is the exact all-pairs baseline (broadcast corpus) —
    the recall oracle, small-scale only."""
    a = _spread(_prepped(corpus, id_col, vec_col, "id_a", "vec_a", "nrm_a", n_bits),
                "id_a")
    b = _prepped(corpus, id_col, vec_col, "id_b", "vec_b", "nrm_b", n_bits)
    pairs = a.join(b, "bucket") if n_bits > 0 else a.crossJoin(F.broadcast(b))
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("sim", _sim("vec_a", "vec_b", "nrm_a", "nrm_b"))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def pq_argmin_codes(sub: DataFrame, codewords: DataFrame,
                    sub_d: int) -> DataFrame:
    """(id, m, code, sv): nearest codeword per PQ sub-vector via an
    Arrow-vectorized numpy kernel (mapInPandas).

    The pure-JVM expression shape (broadcast codeword-array column +
    per-row ``transform`` into 256 structs + ``array_min``) allocates
    |rows|·M·CODES short-lived structs — measured 82M allocations and
    ~10-15s per encode pass at the 10x probe, which made q113 the
    registry's heaviest row. The same argmin as a batched numpy
    computation is a (rows × sub_d) · (sub_d × CODES) distance matrix
    per Arrow batch: allocation-free inner loop, ~10x faster, still
    fully distributed (the kernel runs per partition; the codebook is
    M·CODES rows ≈ a few KB, collected once and shipped in the task
    closure).

    BIT-IDENTICAL to the JVM/DuckDB fold semantics, which is what lets
    the oracle stay unchanged: d2 accumulates per dimension in index
    order (``acc += d*d`` — plain IEEE doubles, no FMA, no pairwise
    re-association), reproducing kmeans.sqdist's left-to-right fold
    exactly; ties pick the smallest code because rows are argmin'd over
    codewords sorted by code and numpy returns the first minimum —
    the same rule as ``array_min`` over (d2, code) structs."""
    import numpy as np
    import pandas as pd

    grouped: dict[int, list] = {}
    for r in codewords.select("m", "code", "cv").collect():
        grouped.setdefault(int(r["m"]), []).append((int(r["code"]), r["cv"]))
    by_m: dict[int, tuple] = {}
    for m_val, lst in grouped.items():
        lst.sort(key=lambda t: t[0])
        codes = np.array([c for c, _ in lst], dtype=np.int64)
        cmat = np.array([list(v) for _, v in lst], dtype=np.float64)
        by_m[m_val] = (codes, cmat)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mvals = pdf["m"].to_numpy()
            sv_stack = np.stack(pdf["sv"].to_numpy())
            code_out = np.empty(len(pdf), dtype=np.int64)
            for m_val in np.unique(mvals):
                mask = mvals == m_val
                codes, cmat = by_m[int(m_val)]
                x = sv_stack[mask]
                acc = np.zeros((x.shape[0], cmat.shape[0]))
                for i in range(sub_d):
                    d = x[:, i, None] - cmat[None, :, i]
                    acc += d * d
                code_out[mask] = codes[acc.argmin(axis=1)]
            yield pd.DataFrame({"id": pdf["id"], "m": pdf["m"],
                                "code": code_out, "sv": pdf["sv"]})

    return sub.mapInPandas(kernel, "id long, m int, code long, sv array<double>")


COV_SCALE = 1_000_000  # integer micro-units per embedding element


def covariance_partials(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-Arrow-batch partial X^T X, column sums, and row count for an
    EXACT integer covariance over embedding dimensions (mapInPandas).

    Output rows ``(i, j, v)``, all int64:
      - ``i >= 0, j >= i``: partial sum of ``q_i * q_j`` (upper
        triangle incl. the variance diagonal)
      - ``i >= 0, j = -1``: partial sum of ``q_i``
      - ``i = -1, j = -1``: partial row count

    Exactness: elements are quantized to integer micro-units with the
    same IEEE double ops the DuckDB oracle applies (widen float32 to
    double — exact — then ``* COV_SCALE + 0.5`` and ``floor``), so both
    engines see identical integers; every sum after that is integer
    arithmetic, where accumulation order cannot matter. The int64
    matmul is exact (no FP): with |q| <= ~1e7 and Arrow's default 10k
    rows/batch the per-batch partials stay far below 2^63, and the
    GLOBAL sums go through exact DECIMAL downstream, so corpus scale
    never touches int64 again. The |q| bound is not assumed: each batch
    asserts ``rows * max(|q|)^2 < 2^63`` (exact Python-int arithmetic)
    and raises instead of silently wrapping when larger-magnitude
    embeddings or a raised maxRecordsPerBatch violate it.

    Scale design: a d^2-sized aggregate is the shape where pure JVM
    expressions fail twice over — a posexplode self-join shuffles
    n * d^2 rows, and a d*(d+1)/2-column aggregate defeats whole-stage
    codegen. The kernel reduces each Arrow batch to d*(d+1)/2 + d + 1
    partial rows, so the shuffle carries #batches * O(d^2) KB-sized
    partials regardless of corpus size — a tree-reduce in DataFrame
    clothing, the same partial-aggregation contract as map-side
    combine."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim, k=0)
    iu_i, iu_j = iu[0].astype(np.int32), iu[1].astype(np.int32)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * float(COV_SCALE) + 0.5).astype(np.int64)
            qmax = int(np.abs(q).max()) if q.size else 0
            if len(pdf) * qmax * qmax >= 2 ** 63:
                raise OverflowError(
                    f"covariance_partials: batch of {len(pdf)} rows with "
                    f"max|q|={qmax} would wrap int64 partials; lower "
                    f"spark.sql.execution.arrow.maxRecordsPerBatch or "
                    f"rescale the embeddings")
            c = q.T @ q                       # exact int64 matmul
            s = q.sum(axis=0, dtype=np.int64)
            d_idx = np.arange(dim, dtype=np.int32)
            yield pd.DataFrame({
                "i": np.concatenate([iu_i, d_idx,
                                     np.array([-1], dtype=np.int32)]),
                "j": np.concatenate([iu_j,
                                     np.full(dim, -1, dtype=np.int32),
                                     np.array([-1], dtype=np.int32)]),
                "v": np.concatenate([c[iu_i, iu_j], s,
                                     np.array([len(pdf)], dtype=np.int64)]),
            })

    return emb.mapInPandas(kernel, "i int, j int, v long")
