"""Iterative graph centrality: exact integer PageRank.

PageRank is the link-quality signal large-scale corpus curation
actually uses (Common Crawl's host-level ranks gate what gets crawled
and kept; Gopher/CCNet-style pipelines consume URL/host quality
priors), and it is the canonical iterate-over-a-distributed-graph
workload: every iteration is one join (ranks -> out-edges) and one
map-side-combinable aggregate (contributions -> new ranks), shuffle
cost ~ |edges| per round.

Exactness contract (cross-engine, the repo-wide integer playbook):
ranks live in integer micro-units (1.0 == 1_000_000). The damping
multiply and per-out-degree split happen in ONE integer floor-division
``(r * DAMP_NUM) div (DAMP_DEN * outdeg)`` — both engines floor
identically on non-negative BIGINTs — and the teleport term is the
integer constant ``TELEPORT = (DAMP_DEN - DAMP_NUM) * SCALE / DAMP_DEN``.
No float touches the state, so V iterations stay bit-identical to the
unrolled-CTE oracle at any parallelism.

Scale design:
- The rank state is one long per node; each iteration's lineage is cut
  with a DISK_ONLY ``localCheckpoint`` (node-table-sized state must
  never unroll through the heap — the q114 lesson).
- Contributions aggregate BEFORE the rank update join (map-side
  combine on dst), so the per-round shuffle is |edges| once, not
  |edges| x consumers.
- Dangling nodes (outdeg 0) would leak mass; callers dealing with
  directed graphs must either add both directions (undirected
  semantics, what q128 does) or pre-drop danglers. The operator
  asserts nothing and documents the contract instead of scanning for
  violations (a full outdeg==0 check would cost an extra pass per
  call; tests pin the behavior).

Reference parity: the reference has no graph operators — this is a
beyond-reference capability (BASELINE.json north star) alongside
``dedup.connected_components``.

``kcore_peel`` shares the playbook: degree-threshold peeling is the
other workhorse graph-quality signal (spam/mirror farms live in
low-core shells; k-core membership is a classic crawl-frontier and
link-spam feature), and each peel round is the same shuffle shape —
one map-side-combinable degree aggregate plus semi-joins keyed on the
node id, all integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

RANK_SCALE = 1_000_000   # micro-units of rank mass per node at init
DAMP_NUM, DAMP_DEN = 17, 20          # damping d = 0.85 as a ratio
TELEPORT = (DAMP_DEN - DAMP_NUM) * RANK_SCALE // DAMP_DEN  # (1-d)*SCALE


def pagerank_exact(edges: DataFrame, iters: int) -> DataFrame:
    """(node, rank_micro) after ``iters`` exact-integer PageRank rounds
    over the directed edge list (src long, dst long). Every node that
    appears as a src must have its in-edges present too (see module
    docstring on danglers); rank mass initializes to RANK_SCALE per
    node."""
    src, dst = "src", "dst"
    # the edge list fans out to three consumers (nodes x2 via the
    # union, outdeg, ed) — without a cut, the caller's whole edge
    # derivation re-runs per consumer (the q113/q120 fan-out lesson)
    edges = edges.localCheckpoint(eager=True,
                                  storageLevel=StorageLevel.DISK_ONLY)
    # nodes is re-read every iteration's rank-update join: cut it too
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct()
             .localCheckpoint(eager=True,
                              storageLevel=StorageLevel.DISK_ONLY))
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    # outdeg is node-sized — same broadcast-cliff reasoning as the
    # per-round joins below: pin the shuffle join
    ed = (edges.join(outdeg.hint("merge"), src)
          .select(src, dst, "deg")
          .localCheckpoint(eager=True,
                           storageLevel=StorageLevel.DISK_ONLY))
    r = (nodes.select("node",
                      F.lit(RANK_SCALE).cast("long").alias("rank_micro"))
         .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY))
    for i in range(iters):
        # both per-round joins are node-table-sized on at least one
        # side; pin them to shuffle joins (merge hint) — Catalyst's
        # static estimator sees a small checkpointed rank table and
        # broadcasts it, which works at test SF but is a driver-memory
        # cliff once nodes outgrow the broadcast budget (the 100x probe
        # showed a 512 MB broadcast-exchange; a web-scale host graph is
        # orders beyond that). Shuffle-on-node is the scale-correct
        # plan: both sides hash-partition on the key, no table is
        # materialized whole anywhere.
        contrib = (ed.join(r.hint("merge"), ed[src] == r["node"])
                   .select(F.col(dst).alias("node"),
                           F.expr(f"(rank_micro * {DAMP_NUM}L) div "
                                  f"({DAMP_DEN}L * deg)").alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = (nodes.join(summed.hint("merge"), "node", "left")
             .select("node",
                     (F.lit(TELEPORT).cast("long")
                      + F.coalesce(F.col("s"), F.lit(0).cast("long"))
                      ).alias("rank_micro")))
        if i < iters - 1:
            # cut lineage BETWEEN iterations only — the final rank
            # table feeds one consumer (the caller's next op), so a
            # last checkpoint would pay a node-table write for nothing
            r = r.localCheckpoint(eager=True,
                                  storageLevel=StorageLevel.DISK_ONLY)
    return r


def pagerank_with_residuals(edges: DataFrame,
                            iters: int) -> tuple[DataFrame, DataFrame]:
    """:func:`pagerank_exact` plus the convergence trajectory: returns
    ``(ranks, residuals)`` where ``residuals`` has one row per
    iteration — (iter, max_abs_delta, sum_abs_delta, n_changed), the
    per-round rank movement in exact micro-units. max|Δ| is the L∞
    residual convergence monitoring actually thresholds on ("stop when
    no rank moved more than ε"); sumΔ/n_changed give the L1 and
    support views of the same trajectory. A production curation
    pipeline gates on rank STABILITY, not a fixed round count — this is
    the measurement that decides when the fixed-V contract (q128) is
    enough.

    Exactness: deltas subtract two exact-integer rank states, so every
    residual is an exact BIGINT and the whole trajectory is
    bit-identical to the unrolled-CTE oracle (q135 gates all three
    columns per round).

    Scale shape: identical per-round cost to pagerank_exact plus one
    node-sized join per round for the delta (merge-hinted — same
    broadcast-cliff reasoning as the rank-update join) reduced to a
    1-row aggregate; the residual table is ``iters`` rows total. Every
    round's rank state is lineage-cut (unlike pagerank_exact's
    between-rounds-only cut, each state here has two consumers: the
    residual aggregate and the next round)."""
    src, dst = "src", "dst"
    edges = edges.localCheckpoint(eager=True,
                                  storageLevel=StorageLevel.DISK_ONLY)
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct()
             .localCheckpoint(eager=True,
                              storageLevel=StorageLevel.DISK_ONLY))
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    ed = (edges.join(outdeg.hint("merge"), src)
          .select(src, dst, "deg")
          .localCheckpoint(eager=True,
                           storageLevel=StorageLevel.DISK_ONLY))
    r = (nodes.select("node",
                      F.lit(RANK_SCALE).cast("long").alias("rank_micro"))
         .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY))
    res_parts = []
    for i in range(iters):
        contrib = (ed.join(r.hint("merge"), ed[src] == r["node"])
                   .select(F.col(dst).alias("node"),
                           F.expr(f"(rank_micro * {DAMP_NUM}L) div "
                                  f"({DAMP_DEN}L * deg)").alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r_new = (nodes.join(summed.hint("merge"), "node", "left")
                 .select("node",
                         (F.lit(TELEPORT).cast("long")
                          + F.coalesce(F.col("s"), F.lit(0).cast("long"))
                          ).alias("rank_micro"))
                 .localCheckpoint(eager=True,
                                  storageLevel=StorageLevel.DISK_ONLY))
        d = (r.select("node", F.col("rank_micro").alias("prev"))
             .join(r_new.hint("merge"), "node")
             .select((F.col("rank_micro") - F.col("prev")).alias("d")))
        res_parts.append(d.agg(
            F.max(F.abs(F.col("d"))).alias("max_abs_delta"),
            F.sum(F.abs(F.col("d"))).alias("sum_abs_delta"),
            F.count(F.when(F.col("d") != 0, 1)).alias("n_changed"))
            .select(F.lit(i + 1).cast("int").alias("iter"),
                    "max_abs_delta", "sum_abs_delta", "n_changed"))
        r = r_new
    residuals = res_parts[0]
    for part in res_parts[1:]:
        residuals = residuals.unionByName(part)
    return r, residuals


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """(node, deg) of the nodes still carrying edges after ``rounds``
    degree-threshold peel iterations over the directed edge list
    (src long, dst long): each round drops every node whose current
    out-degree is < k, then removes all edges touching a dropped node.
    For an undirected graph stored with both directions, out-degree is
    THE degree and the peel is the textbook k-core recurrence.

    Bounded-round semantics (not the fixpoint): ``deg`` is recomputed
    on the final edge set, so a node the NEXT round would peel still
    appears — exactly what the unrolled-CTE oracle computes, so the
    driver hash certifies the whole trajectory. For the true k-core
    use :func:`kcore_fixpoint`.

    Scale shape per round: one map-side-combinable degree aggregate
    (shuffle ∝ |edges|, combine on src) and two semi-joins against the
    node-sized survivor set — pinned to shuffle joins (merge hint) for
    the same broadcast-cliff reason as pagerank_exact; lineage cut per
    round with a DISK_ONLY localCheckpoint."""
    src, dst = "src", "dst"
    ed = edges.localCheckpoint(eager=True,
                               storageLevel=StorageLevel.DISK_ONLY)
    for i in range(rounds):
        alive = (ed.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
                 .filter(F.col("deg") >= k)
                 .select(src))
        ed = (ed.join(alive.hint("merge"), src, "left_semi")
              .join(alive.withColumnRenamed(src, dst).hint("merge"),
                    dst, "left_semi"))
        if i < rounds - 1:
            # cut lineage BETWEEN rounds only: the final round's edge
            # set feeds exactly one consumer (the degree aggregate
            # below), so a last checkpoint would pay a full |edges|
            # disk write+read for nothing
            ed = ed.localCheckpoint(eager=True,
                                    storageLevel=StorageLevel.DISK_ONLY)
    return (ed.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col(src).alias("node"), "deg"))


def kcore_fixpoint(edges: DataFrame, k: int,
                   max_rounds: int = 100) -> DataFrame:
    """(node, deg) of the TRUE k-core: peel until the surviving EDGE
    count stops changing (each pass runs one :func:`kcore_peel` round
    and pays one driver-side count as the convergence check — the
    standard driver-coordinated fixpoint, same shape as the dedup
    connected-components loop). The witness is the edge count, not the
    node count: on a directed graph with sink-only dst nodes the edge
    set can shrink in a round while the distinct-src count stays
    constant, so a node-count witness could terminate before the true
    core — and edges.count() is the cheaper scan anyway (no distinct
    shuffle). An unchanged edge count is sound on any edge list: the
    peel only ever removes edges, so equal counts mean the alive filter
    kept every src and dropped nothing, i.e. the next round would be
    identical. ``max_rounds`` bounds pathological chains (a path graph
    peels one layer per round); the peel count needed is at most the
    graph's degeneracy ordering depth, tiny for real-world graphs.

    Returns ``(core_df, rounds_used)`` where ``rounds_used`` counts the
    peel passes executed INCLUDING the final no-op pass that proved the
    fixpoint — the state is fixed after ``rounds_used - 1`` effective
    peels, so callers certifying convergence-within-R compare
    ``rounds_used - 1 <= R`` (as q136 does, relational.py).

    Not oracle-gated directly: the round count is data-dependent, which
    an unrolled-CTE oracle cannot express — q136 gates it anyway by
    certifying ``rounds_used`` against a statically-unrolled bound, and
    unit tests pin it against a driver-side reference (the documented
    weaker-check class)."""
    src, dst = "src", "dst"
    ed = edges.localCheckpoint(eager=True,
                               storageLevel=StorageLevel.DISK_ONLY)
    n_prev = ed.count()
    rounds_used = 0
    for _ in range(max_rounds):
        alive = (ed.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
                 .filter(F.col("deg") >= k)
                 .select(src))
        ed = (ed.join(alive.hint("merge"), src, "left_semi")
              .join(alive.withColumnRenamed(src, dst).hint("merge"),
                    dst, "left_semi")
              .localCheckpoint(eager=True,
                               storageLevel=StorageLevel.DISK_ONLY))
        rounds_used += 1
        n = ed.count()
        if n == n_prev:
            break
        n_prev = n
    core = (ed.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col(src).alias("node"), "deg"))
    return core, rounds_used
