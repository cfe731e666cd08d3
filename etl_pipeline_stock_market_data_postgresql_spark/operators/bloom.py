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
  ``bit_or`` aggregate ORs them into 64-bit words — a ``(w, bits)``
  table of ≤ bits/64 rows, corpus-size-independent.
- **probe**: k BROADCAST HASH JOINS on the word index (one per hash),
  then a bitmask test. The word table stays relational on purpose:
  Spark's ``element_at`` on a map literal is a LINEAR key scan
  (ArrayBasedMapData has no hash index — measured 4.6s for a
  16384-entry map over 600k rows), and densifying the map into an
  indexable array is a single-task O(words²) scatter (measured 13s at
  build). The broadcast hash join IS the O(1) hashed lookup those
  shapes were reaching for, built from the join machinery that already
  does it right. Unmatched words null out and correctly fail the mask
  test — definitely-absent.

False positives are filtered by the exact join that follows, so the
Bloom stage is RESULT-INVISIBLE — the differential oracle for any query
using it is the plain join, same contract as salting (operators/skew)
and bucketing (sources/bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BLOOM_BITS = 1 << 20  # 1M bits = 16384 words ≈ 256 KB broadcast
BLOOM_K = 2


def _pos_sql(key_col: str, bits: int, seed: int) -> str:
    # floor-mod keeps negative hashes in [0, bits) identically everywhere
    return f"(((xxhash64({key_col}, {seed}) % {bits}) + {bits}) % {bits})"


def build_bloom(keys: DataFrame, key_col: str, bits: int = BLOOM_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """``(w, bits)`` word table (≤ bits/64 rows) over the values of
    ``keys[key_col]``. The only shuffle carries the word partials."""
    pos = [_pos_sql(key_col, bits, seed) for seed in range(k)]
    words = (keys.selectExpr(f"explode(array({', '.join(pos)})) AS pos")
             .selectExpr("pos div 64 AS w", "CAST(pos % 64 AS INT) AS b"))
    return (words.groupBy("w")
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))")
                 .alias("bits")))


def bloom_prefiltered(fact: DataFrame, keys: DataFrame, fact_key: str,
                      key_col: str, bits: int = BLOOM_BITS,
                      k: int = BLOOM_K) -> DataFrame:
    """``fact`` reduced to rows whose key MIGHT be in ``keys`` — the
    pre-shuffle reduction step. Follow with the exact join; the filter
    only shrinks what the join has to shuffle."""
    bloom = build_bloom(keys, key_col, bits, k)
    out = fact
    probe_cols = []
    for seed in range(k):
        p = _pos_sql(fact_key, bits, seed)
        w_col, bits_col = f"_bf_w{seed}", f"_bf_bits{seed}"
        side = bloom.select(F.col("w").alias(w_col),
                            F.col("bits").alias(bits_col))
        out = (out.withColumn(w_col, F.expr(f"{p} div 64"))
               .join(F.broadcast(side), w_col, "left"))
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
        probe_cols.append((w_col, bits_col,
                           F.expr(f"({bits_col} & {mask}) != 0")))
    cond = None
    for _, _, hit in probe_cols:
        cond = hit if cond is None else (cond & hit)
    return out.filter(cond).drop(
        *[c for w, b, _ in probe_cols for c in (w, b)])
