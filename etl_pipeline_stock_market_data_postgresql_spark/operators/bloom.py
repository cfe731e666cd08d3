"""Bloom-filter runtime pre-join reduction, hand-built from public
primitives.

The classic 100 TB join optimization: before shuffling a huge fact side
into a join, probe each row against a Bloom filter built from the
(already filtered) key side and drop the rows that cannot match — the
shuffle then carries only (true matches + the filter's false-positive
rate) instead of the whole fact table. Spark's own runtime row-group
filters use the same idea internally (`bloom_filter_agg` /
`might_contain`), but those expressions are not registered public API,
so this module builds the identical structure from public functions:

- **build**: each key hashes to ``k`` bit positions (xxhash64 with k
  seeds); positions become (word, bit) pairs and one map-side-combinable
  ``bit_or`` aggregate ORs them into 64-bit words; the words collapse to
  a single-row ``map<word_idx, bits>`` — ≤ bits/64 entries, broadcast
  to every executor.
- **probe**: a pure JVM row expression — recompute the k positions,
  look the words up in the broadcast map, AND the masks. An absent word
  means "no key ever touched it", so ``element_at``'s NULL propagates
  to a dropped row, exactly might_contain's semantics.

False positives are filtered by the exact join that follows, so the
Bloom stage is RESULT-INVISIBLE — the differential oracle for any query
using it is the plain join, same contract as salting (operators/skew)
and bucketing (sources/bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BLOOM_BITS = 1 << 20  # 1M bits = 16384 words ≈ 128 KB broadcast
BLOOM_K = 2


def build_bloom(keys: DataFrame, key_col: str, bits: int = BLOOM_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """1-row DataFrame ``(bloom: map<bigint, bigint>)`` over the values
    of ``keys[key_col]``. The only shuffle carries ≤ bits/64
    (word, partial-bits) pairs — corpus-size-independent."""
    # floor-mod keeps negative hashes in [0, bits) identically everywhere
    pos = [f"(((xxhash64({key_col}, {seed}) % {bits}) + {bits}) % {bits})"
           for seed in range(k)]
    words = (keys.selectExpr(f"explode(array({', '.join(pos)})) AS pos")
             .selectExpr("pos div 64 AS w", "CAST(pos % 64 AS INT) AS b"))
    bm = (words.groupBy("w")
          .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))")
               .alias("bits")))
    return bm.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias("bloom"))


def probe_sql(bloom_col: str, key_col: str, bits: int = BLOOM_BITS,
              k: int = BLOOM_K) -> str:
    """might_contain as a SQL boolean over (bloom map, key) columns:
    true iff every probed word exists AND has the probed bit set (an
    absent word yields NULL, which the filter drops —
    definitely-absent)."""
    conds = []
    for seed in range(k):
        p = f"(((xxhash64({key_col}, {seed}) % {bits}) + {bits}) % {bits})"
        conds.append(
            f"(element_at({bloom_col}, {p} div 64)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0")
    return " AND ".join(conds)


def bloom_prefiltered(fact: DataFrame, keys: DataFrame, fact_key: str,
                      key_col: str, bits: int = BLOOM_BITS,
                      k: int = BLOOM_K) -> DataFrame:
    """``fact`` reduced to rows whose key MIGHT be in ``keys`` — the
    pre-shuffle reduction step. Follow with the exact join; the filter
    only shrinks what the join has to shuffle."""
    bloom = build_bloom(keys, key_col, bits, k)
    return (fact.crossJoin(F.broadcast(bloom))
            .filter(F.expr(probe_sql("bloom", fact_key, bits, k)))
            .drop("bloom"))
