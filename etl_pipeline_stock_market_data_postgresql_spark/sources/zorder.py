"""Z-order (Morton-curve) clustering: multi-column file pruning.

Min/max statistics prune parquet files and row groups only when a
filtered column is CLUSTERED — a linear sort makes exactly one column
tight and leaves every other column's per-file range at nearly the
full domain. Interleaving the bits of two columns into one Morton key
and range-partitioning + sorting on it gives BOTH columns per-file
ranges near 1/√files of their domain, so selective filters on either
column (or both) skip most files. This is the lakehouse layout
technique behind Delta's OPTIMIZE ZORDER and the reason a 100 TB fact
table can answer two-dimensional point-ish queries without a
partition-per-column explosion.

Reference parity note: the reference delegates layout to PostgreSQL
indexes; z-ordering is the scan-pruning analogue for immutable
columnar files, complementing `bucketed.py` (which targets join
shuffles, not scan selectivity).

Everything here is a JVM-side column expression (shift/and/or under
whole-stage codegen); the layout claim is verified in
tests/test_zorder.py by reading the written files' parquet footer
statistics back with pyarrow — per the repo rule that writer-side
ordering claims are proven from the files, not from the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    integer columns (a in even positions, b in odd). 2·bits ≤ 62 keeps
    the key in a long. Callers with non-integer or skewed domains
    should quantize/rank first; the curve only needs a monotone mapping
    into [0, 2^bits)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i))
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(1),
                        2 * i + 1))
    return key


def z_value_n(cols: list[Column], bits: int) -> Column:
    """N-column Morton key: round-robin interleave of the low ``bits``
    bits of each column (column i owns output positions ``i, i+n,
    i+2n, ...``). ``n * bits <= 62`` keeps the key in a long — the
    caller trades per-column resolution for dimensionality exactly as
    every OPTIMIZE ZORDER implementation does (Delta caps columns for
    the same reason: each added column halves the per-file tightness
    of all of them). The two-column :func:`z_value` is the n=2
    special case kept for its fixed layout compatibility."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits or n * bits > 62:
        raise ValueError(f"n*bits must be in [1, 62], got {n}*{bits}")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            key = key.bitwiseOR(F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(1),
                i * n + j))
    return key


def zordered_frame_n(df: DataFrame, cols: tuple[str, ...],
                     n_files: int, bits: int | None = None) -> DataFrame:
    """N-column generalization of :func:`zordered_frame`: scale each
    column to [0, 2^bits) from one min/max pass, range-partition +
    sort on the round-robin Morton key, drop the key. ``bits``
    defaults to the largest resolution the 62-bit key affords
    (``62 // n``)."""
    bits = bits if bits is not None else max(1, 62 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c), F.max(c)]
    row = df.agg(*aggs).collect()[0]
    bounds = [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]
    if any(lo is None for lo, _ in bounds):
        return df
    top = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
        return F.least(F.floor(frac * top).cast("long"), F.lit(top))

    zk = z_value_n([scaled(c, lo, hi)
                    for c, (lo, hi) in zip(cols, bounds)], bits)
    return (df.withColumn("_zorder_key", zk)
            .repartitionByRange(n_files, "_zorder_key")
            .sortWithinPartitions("_zorder_key")
            .drop("_zorder_key"))


def zordered_frame(df: DataFrame, col_a: str, col_b: str,
                   n_files: int, bits: int = 16) -> DataFrame:
    """``df`` re-laid-out as ``n_files`` partitions clustered on the
    Morton key of (col_a, col_b): range-partition by the key (each
    partition owns a contiguous curve segment — this is what bounds
    BOTH columns' per-partition min/max), sort within partitions so
    parquet row groups inherit the same tightness, and drop the key.
    Each partition becomes one file under any one-file-per-partition
    writer (plain ``write.parquet``, or a versioned-store commit).

    Both columns are first scaled to the full [0, 2^bits) range from a
    one-pass min/max aggregate — interleaving raw values whose domains
    use different bit widths degenerates to a linear sort on the wider
    column (the narrow column's high bits are all zero, so the curve's
    top bits come from one column only). The min/max pass is the same
    metadata collection every OPTIMIZE ZORDER implementation performs,
    and at 100 TB it is a map-side-combinable aggregate, not a sort."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)).collect()[0]
    if lo_a is None or lo_b is None:  # empty input: nothing to cluster
        return df
    top = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> Column:
        # divide FIRST: (v-lo)*top would overflow long (ANSI error /
        # silent wrap) for spans above ~2^63/top, e.g. epoch-microsecond
        # domains. (v-lo)/span is an exact-enough double in [0, 1];
        # the clamp guards the v == hi rounding edge.
        span = max(int(hi) - int(lo), 1)
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
        return F.least(F.floor(frac * top).cast("long"), F.lit(top))

    zk = z_value(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    return (df.withColumn("_zorder_key", zk)
            .repartitionByRange(n_files, "_zorder_key")
            .sortWithinPartitions("_zorder_key")
            .drop("_zorder_key"))


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Write ``df`` z-order-clustered (see :func:`zordered_frame`) as
    ``n_files`` parquet files."""
    zordered_frame(df, col_a, col_b, n_files, bits=bits) \
        .write.mode(mode).parquet(path)
