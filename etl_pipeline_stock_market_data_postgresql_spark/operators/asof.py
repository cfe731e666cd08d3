"""As-of join — for each left row, the latest right row at/earlier than it.

Spark has no native as-of join (the reference has none either; this is
part of the generic time-series query surface a stock engine needs, e.g.
price ⋈ latest-indicator-before). Strategy:

- ``asof_join_union``: tag and union both sides, then one window pass
  per key carries the last right-side value forward
  (``last(..., ignorenulls=True)``). ONE shuffle on the key, no range
  explosion — this is the 100 TB-safe plan: sort-merge within key
  partitions, never a cross product. Skewed keys are handled by AQE.
- ``pd.merge_asof`` via ``applyInPandas`` would be the per-group
  imperative fallback; not needed since the union trick stays fully
  JVM-side under whole-stage codegen.

Strictness: ``strict=True`` means right.ts < left.ts (ties excluded);
``strict=False`` means right.ts <= left.ts. Implemented purely by sort
position at equal timestamps: the window frame ends at the current row,
so a right row sorted *after* a left row with the same timestamp is
invisible to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_union(left: DataFrame, right: DataFrame, key_cols: list[str],
                    left_time: str, right_time: str,
                    right_value_cols: list[str], strict: bool = True,
                    right_tiebreak: str | None = None) -> DataFrame:
    """Columns of ``left`` + ``asof_<c>`` for each right value column.
    ``right_tiebreak`` (a unique right column) makes the winner among
    equal-timestamp right rows deterministic (the largest wins)."""
    # strict: left sorts before right at equal ts (right invisible);
    # non-strict: right sorts first (right visible).
    left_side, right_side = (0, 1) if strict else (1, 0)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("_asof_ts"),
        F.lit(left_side).alias("_asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in right_value_cols],
        F.lit(None).cast("long").alias("_asof_rtb"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in key_cols],
        F.col(right_time).alias("_asof_ts"),
        F.lit(right_side).alias("_asof_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        (F.col(right_tiebreak).cast("long") if right_tiebreak is not None
         else F.lit(0).cast("long")).alias("_asof_rtb"),
    )
    for c in left.columns:
        if c not in key_cols:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tagged = r_tagged.select(*l_tagged.columns)

    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col("_asof_ts"), F.col("_asof_side"),
                  F.col("_asof_rtb").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    merged = l_tagged.unionByName(r_tagged)
    for c in right_value_cols:
        merged = merged.withColumn(
            f"asof_{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w))
    helper = ["_asof_ts", "_asof_side", "_asof_rtb",
              *[f"_rv_{c}" for c in right_value_cols]]
    return merged.filter(F.col("_asof_side") == left_side).drop(*helper)
