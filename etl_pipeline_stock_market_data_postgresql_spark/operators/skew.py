"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime. Two cases remain manual at 100 TB:

- **Skewed aggregation with expensive per-group state** (e.g.
  collect_list / exact distinct on a hot key): pre-aggregate on a
  salted key, then merge. Spark's map-side partial aggregation already
  handles sum/count; salting matters when the partial state itself is
  large or the agg is not algebraic.
- **Broadcast-ineligible skewed join**: salt the hot side with a
  deterministic factor and explode the other side across all salts.

Salts are derived from stable row content (never rand()) so plans stay
deterministic and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deterministic_salt(cols: list[str], factor: int) -> Column:
    """Stable salt in [0, factor): hash of non-key content columns."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(factor))


def salted_distinct_count(df: DataFrame, key_cols: list[str], value_col: str,
                          factor: int = 16) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, two-phase and array-free:
    phase 1 dedups (key, value) — a hash aggregation whose shuffle key
    IS (key, value), so a hot key's distinct state spreads across the
    whole cluster natively (hashing by value is exactly what salting by
    value would do, minus the salt bookkeeping); phase 2 counts rows per
    key with map-side partial counts. No per-task arrays anywhere — the
    earlier collect_set formulation put a hot key's entire distinct set
    (÷ factor) in single-task memory, which dies at ~1e9 distinct values
    per key.

    ``factor`` is kept for API stability; the (key, value) shuffle
    already provides maximal spreading, so no explicit salt is needed."""
    del factor  # spreading comes from the (key, value) shuffle itself
    return (df.select(*key_cols, value_col).distinct()
            .groupBy(*key_cols)
            .agg(F.count("*").alias("n_distinct")))


def salted_join(skewed: DataFrame, other: DataFrame, key_cols: list[str],
                salt_cols: list[str], factor: int = 8) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``other`` is too big
    to broadcast: salt the skewed side deterministically, replicate the
    other side across all salt values, join on (key, salt). Shuffle
    volume for the hot key spreads over ``factor`` partitions."""
    s = skewed.withColumn("_salt", deterministic_salt(salt_cols, factor))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    return s.join(o, [*key_cols, "_salt"]).drop("_salt")
