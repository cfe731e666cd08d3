"""Incremental corpus deduplication against a PERSISTED MinHash
signature index (beyond-reference, first-class).

Every batch dedup query (q23–q26, q51, q61) re-derives its state from
the full corpus. A real 100 TB training-data pipeline cannot: each NEW
ingest batch must be deduplicated against everything already kept
WITHOUT re-shingling or re-shuffling the corpus. This module lifts the
reference's conflict-ignoring idempotent-append pattern (`ON CONFLICT
DO NOTHING`, main_parallel.py:285; operators/upsert.py
``idempotent_append``) from exact-PK space to near-duplicate space:

- the persisted state is a **signature index** — one compact row per
  KEPT doc: the K MinHash values (for LSH banding) plus the sorted
  60-bit shingle-fingerprint array (for exact verification). ~100s of
  bytes per doc, independent of document length;
- a new batch is shingled/signed (cost ∝ delta), banded, and LSH-joined
  against the index's band projection — corpus-side work is a columnar
  scan of the compact index (band keys derive from the stored m-columns
  by projection; document text is never touched again);
- candidates verify exactly against the stored fingerprint arrays, and
  the verified edges resolve through the same hybrid connected
  components as the batch path;
- the output is (verdict per delta doc, index rows for the kept docs) —
  the caller APPENDS the new rows to the stored index, and appending
  the same batch's verdict twice is a no-op, the reference's
  idempotency property.

Correctness anchor (what makes the incremental result equal a BATCH
recompute over corpus ∪ delta, the q120 oracle): a deduped corpus has
NO verified pairs internally — within a component only the minimum id
survives, and cross-component pairs are below threshold by definition.
So in the union graph the edges are exactly delta–delta ∪ delta–corpus,
which is precisely the edge set the incremental path computes; the
component structure (and hence every delta doc's verdict) is identical.
This requires index ids < delta ids (append-ordered ingest — older
docs have smaller ids), which ``incremental_neardup`` asserts; and it
is inductive: the kept-delta set is itself pair-free (a kept doc has no
verified edge to any smaller kept id, else its component minimum would
differ), so the updated index satisfies the precondition for the next
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup
from ..functions.hashing import MERSENNE_P, hash32, minhash_perm

#: m-columns stored in the index (bands * rows_per_band at defaults)
DEFAULT_BANDS = 4
DEFAULT_ROWS_PER_BAND = 3


def build_minhash_index(docs: DataFrame, id_col: str, text_col: str,
                        n: int = 3,
                        bands: int = DEFAULT_BANDS,
                        rows_per_band: int = DEFAULT_ROWS_PER_BAND,
                        cache_out: list | None = None) -> DataFrame:
    """One index row per doc: (id, m0..m{K-1}, shs, n_sh). Both hash
    projections (the 32-bit permutation input and the 60-bit
    fingerprint) are computed in ONE pass below a SINGLE grouped
    aggregation — the K minhash ``min``s and the fingerprint
    ``collect_set`` share one exchange on the id, where the previous
    shape ran two aggregations over a persisted shingle table and
    joined them back (two exchanges + a join + a cache; r16 guide §2.4
    "two operations keyed the same way share one exchange").
    ``cache_out`` is kept for signature compatibility (nothing is
    persisted here any more — the single consumer needs no cache)."""
    from ..functions.hashing import hash60

    sh = dedup.shingle_table(docs, id_col, text_col, n=n)
    proj = sh.select(
        F.col(id_col),
        (hash32(F.col("shingle")) % F.lit(MERSENNE_P)).alias("hm"),
        hash60(F.col("shingle")).alias("h60"))
    k = bands * rows_per_band
    aggs = [F.min(minhash_perm(F.col("hm"), i)).alias(f"m{i}")
            for i in range(k)]
    aggs.append(F.array_sort(F.collect_set("h60")).alias("shs"))
    return (proj.groupBy(id_col).agg(*aggs)
            .withColumn("n_sh", F.size("shs").cast("long")))


def incremental_neardup(index: DataFrame, delta_docs: DataFrame,
                        id_col: str, text_col: str, threshold: float,
                        n: int = 3,
                        bands: int = DEFAULT_BANDS,
                        rows_per_band: int = DEFAULT_ROWS_PER_BAND,
                        check_ids: bool = True,
                        cache_out: list | None = None,
                        known_index_max=None
                        ) -> tuple[DataFrame, DataFrame]:
    """Dedup ``delta_docs`` against the stored ``index`` (and against
    itself). Returns ``(verdicts, new_index_rows)``:

    - ``verdicts``: one row per delta doc — (id, kept, canonical_id)
      where ``canonical_id`` is the minimum id reachable through
      verified near-dup edges in corpus ∪ delta (the doc itself when
      unique) and ``kept = (canonical_id == id)``;
    - ``new_index_rows``: index rows for the kept delta docs — append
      them to the stored index to absorb the batch.

    PRECONDITIONS (asserted when ``check_ids``): the index is pair-free
    at the same (n, bands, rows_per_band, threshold) — true by
    construction when it was built by this function's keep-set or a
    batch dedup keep-set — and every index id < every delta id.

    .. warning:: the id-ordering precondition is load-bearing for
       CANDIDATE COMPLETENESS, not just for the error message: the
       unified banded join keeps only ``id_a < id_b`` pairs, so with
       ``check_ids=False`` and a violated precondition, corpus→delta
       candidates whose corpus id >= delta id are SILENTLY DROPPED
       (the pre-r16 two-join shape would have kept them). Callers that
       disable the check must guarantee the ordering themselves (e.g.
       via ``known_index_max`` from store manifest stats, O(files)
       driver metadata).

    Scale shape: delta-side text work ∝ delta; corpus-side work is a
    columnar scan of the compact index (m-columns for banding, arrays
    only for docs that land in a candidate pair via left-semi); the
    candidate join shuffles band keys, the verify join shuffles
    fingerprint arrays for candidates only; components run on the
    verified edges (hybrid driver-local under
    ``dedup.DRIVER_EDGES_THRESHOLD``)."""
    delta_index = build_minhash_index(delta_docs, id_col, text_col, n,
                                      bands, rows_per_band,
                                      cache_out=cache_out).persist()
    if cache_out is not None:
        cache_out.append(delta_index)

    if check_ids:
        # ``known_index_max`` lets a store-backed caller answer the
        # index side from manifest column stats (versioned_store.
        # snapshot_min_max — O(files) driver metadata) instead of a
        # full index scan per batch; the delta side reads the cache.
        hi = (known_index_max if known_index_max is not None
              else index.agg(F.max(id_col).alias("m")).first()["m"])
        lo = delta_index.agg(F.min(id_col).alias("m")).first()["m"]
        if hi is not None and lo is not None and hi >= lo:
            raise ValueError(
                f"incremental_neardup: index ids must precede delta ids "
                f"(append-ordered ingest); got max(index)={hi} >= "
                f"min(delta)={lo} — batch-equivalence does not hold")

    # --- candidates -----------------------------------------------------
    # ONE banded join covers both pair families (guide §2.4 — two
    # operations keyed the same way share one exchange): the id_a side
    # is corpus ∪ delta band keys, the id_b side delta only. Every
    # corpus id precedes every delta id (the asserted precondition), so
    # the id_a < id_b filter keeps exactly corpus→delta plus ordered
    # delta–delta pairs — the same set the previous two joins produced
    # (their id_a spaces are disjoint, so one distinct over the union
    # equals the union of the two distincts).
    bt_d = dedup.band_table(delta_index, id_col, bands, rows_per_band)
    bt_c = dedup.band_table(index, id_col, bands, rows_per_band)
    a_all = (bt_c.unionByName(bt_d)
             .select(F.col(id_col).alias("id_a"), "band_id", "band_key"))
    d_b = bt_d.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    cand = (a_all.join(d_b, ["band_id", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())

    # --- exact verification on fingerprint sets -------------------------
    # one verify join against corpus ∪ delta sets (disjoint id spaces:
    # each id_a resolves in exactly one of the two tables)
    sets_d = delta_index.select(id_col, "shs", "n_sh")
    sets_all = index.select(id_col, "shs", "n_sh").unionByName(sets_d)
    ver = dedup.jaccard_on_set_tables(cand, sets_all, sets_d,
                                      id_col, threshold)
    edges = ver.select("id_a", "id_b").persist()
    if cache_out is not None:
        cache_out.append(edges)

    # --- components + verdicts ------------------------------------------
    comp = dedup.connected_components(edges, "id_a", "id_b")
    verdicts = (delta_index.select(id_col)
                .join(comp.withColumnRenamed("node", id_col), id_col, "left")
                .select(F.col(id_col),
                        F.coalesce("comp", F.col(id_col))
                        .alias("canonical_id"))
                .withColumn("kept",
                            (F.col("canonical_id") == F.col(id_col)))
                .select(id_col, "kept", "canonical_id"))

    kept_ids = verdicts.filter("kept").select(id_col)
    new_index_rows = delta_index.join(kept_ids, id_col, "left_semi")
    return verdicts, new_index_rows
