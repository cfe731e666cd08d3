"""Distributed Lloyd k-means over embedding columns — the learned-
partition ANN path (IVF-flat with trained centroids, vs the sign-bucket
heuristic in operators/similarity.py).

Scale shape per iteration (nothing depends on corpus size except the
two map-side-combinable shuffles):

- **assign**: centroids (K×D doubles, tiny) broadcast into a K-fanout
  join; the argmin is ``min(struct(d2, cid))`` — associative, so the
  per-partition partials combine map-side and the shuffle carries one
  row per vector, never K.
- **update**: q60-style integer-space component sums — posexplode to
  (cid, pos, floor(x·10⁹)) and hash-aggregate; the shuffle carries
  longs keyed on (cid, pos), K·D groups total regardless of corpus
  size, and integer addition is exact and shuffle-order-independent.
- per-round ``localCheckpoint`` truncates lineage (the iterative-plan
  lesson from dedup.connected_components — without it the plan tree
  doubles per round).

Determinism (oracle-comparable, workload/similarity.py q81):
assignment ties break on cluster id via the lexicographic struct-min;
every cross-row addition happens on exact integers (quantized d2 /
components / drift terms); the only float ops are per-row folds with
identical left-to-right order in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vectors import as_double

Q_COMP = 10**9    # centroid component quantization (exact BIGINT sums)
Q_D2 = 10**6      # per-member squared-distance quantization (inertia)
Q_DRIFT = 10**12  # per-component drift-term quantization


def sqdist(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² with the same left-to-right fold order as
    functions.vectors.dot — bit-identical to the DuckDB rendering."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment.

    ``vectors``: (id, v: array<double>); ``centroids``: (cid, cv).
    Returns (id, v, cid, d2) — ties on d2 go to the smallest cid.
    """
    d = (vectors.crossJoin(F.broadcast(centroids))
         .withColumn("d2", sqdist(F.col("v"), F.col("cv"))))
    best = (d.groupBy("id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"),
                 F.first("v").alias("v")))  # v is constant per id
    return best.select("id", "v",
                       F.col("m.cid").alias("cid"),
                       F.col("m.d2").alias("d2"))


def component_sums(assigned: DataFrame) -> DataFrame:
    """(cid, pos, s, n): exact integer component sums per cluster.
    ``pos`` is 0-based; ``s`` = Σ floor(vᵢ·Q_COMP) as BIGINT."""
    comp = assigned.select(
        "cid", F.posexplode("v").alias("pos", "x"))
    return (comp.groupBy("cid", "pos")
            .agg(F.sum(F.floor(F.col("x") * Q_COMP).cast("long")).alias("s"),
                 F.count("*").alias("n")))


def new_centroids(sums: DataFrame, old: DataFrame) -> DataFrame:
    """Rebuild (cid, cv) arrays from integer sums; empty clusters keep
    their old centroid (standard Lloyd convention)."""
    comp = F.col("s").cast("double") / (F.col("n").cast("double") * Q_COMP)
    rebuilt = (sums.withColumn("c", comp)
               .groupBy("cid")
               .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("a"))
               .select("cid", F.transform("a", lambda x: x["c"]).alias("cv")))
    return (old.select("cid", F.col("cv").alias("cv_old"))
            .join(rebuilt, "cid", "left")
            .select("cid", F.coalesce("cv", "cv_old").alias("cv")))


def lloyd(vectors: DataFrame, centroids: DataFrame,
          n_iter: int) -> tuple[DataFrame, list[int]]:
    """Run ``n_iter`` Lloyd iterations; returns the final centroids and
    the per-iteration quantized inertia history (monotone non-increasing
    by the standard k-means argument — asserted in tests).

    The per-iteration ``.collect()`` fetches one scalar (the inertia)
    and exists for the convergence-loop API; the gated/driver path is
    :func:`lloyd_trace`, which keeps the history distributed."""
    history: list[int] = []
    for _ in range(n_iter):
        assigned = assign(vectors, centroids)
        inertia = assigned.agg(
            F.sum(F.floor(F.col("d2") * Q_D2).cast("long"))).collect()[0][0]
        history.append(int(inertia or 0))
        centroids = new_centroids(component_sums(assigned), centroids)
        # truncate lineage: each round's plan would otherwise embed all
        # previous rounds' joins
        centroids = centroids.localCheckpoint(eager=True)
    return centroids, history


def lloyd_trace(vectors: DataFrame, centroids: DataFrame,
                n_iter: int) -> DataFrame:
    """``n_iter`` Lloyd iterations with the convergence trace as DATA:
    returns one row per iteration ``(iteration, inertia_q, n_assigned)``
    with no driver-side ``.collect()`` anywhere in the path.

    Per iteration the O(|corpus|) assignment is ``localCheckpoint``-ed
    once and then feeds BOTH the inertia row and the centroid update, so
    the broadcast-K argmin runs exactly once per round; the 1-row
    inertia aggregate is checkpointed too, which detaches the returned
    union from every iteration's corpus-sized blocks — they become
    unreachable (ContextCleaner-collectable) as soon as the next round's
    centroids materialize. The returned plan is a union of ``n_iter``
    one-row scans, nothing more."""
    rows: list[DataFrame] = []
    for it in range(1, n_iter + 1):
        assigned = assign(vectors, centroids).localCheckpoint(eager=True)
        trace = (assigned.agg(
            F.sum(F.floor(F.col("d2") * Q_D2).cast("long")).alias("inertia_q"),
            F.count("*").alias("n_assigned"))
            .select(F.lit(it).alias("iteration"),
                    F.coalesce("inertia_q", F.lit(0).cast("long"))
                    .alias("inertia_q"), "n_assigned")
            .localCheckpoint(eager=True))
        rows.append(trace)
        if it < n_iter:
            centroids = (new_centroids(component_sums(assigned), centroids)
                         .localCheckpoint(eager=True))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
