"""Z-order layout verification — from the parquet footers, not the plan
(writer-side ordering claims are proven by reading files back, because
partitionBy re-buckets rows by directory and can silently destroy any
within-file ordering the plan claimed to produce).

The measurable claim: after z-ordering on (a, b), the average per-file
min/max width of BOTH columns is a small fraction of the domain,
whereas a linear sort on `a` leaves `b`'s per-file width at ~the full
domain. Tight per-file ranges are exactly what parquet min/max pruning
consumes, so this is the file-skipping property itself.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import load
from etl_pipeline_stock_market_data_postgresql_spark.sources.zorder import (
    write_zordered, z_value)

N_FILES = 16


def _per_file_widths(path: str, col_a: str, col_b: str):
    """(avg width_a, avg width_b) across files, normalized by domain."""
    spans_a, spans_b = [], []
    glo = {col_a: [None, None], col_b: [None, None]}
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert files, path
    for f in files:
        md = pq.read_metadata(f)
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        spans_a.append((mins[col_a], maxs[col_a]))
        spans_b.append((mins[col_b], maxs[col_b]))
        for c, lo, hi in ((col_a, mins[col_a], maxs[col_a]),
                          (col_b, mins[col_b], maxs[col_b])):
            g = glo[c]
            g[0] = lo if g[0] is None else min(g[0], lo)
            g[1] = hi if g[1] is None else max(g[1], hi)

    def avg_norm(spans, c):
        dom = glo[c][1] - glo[c][0]
        return sum(hi - lo for lo, hi in spans) / len(spans) / dom

    return avg_norm(spans_a, col_a), avg_norm(spans_b, col_b)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                                "l_quantity")
    d = tmp_path_factory.mktemp("zorder")
    zpath = os.path.join(str(d), "z")
    lpath = os.path.join(str(d), "linear")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", N_FILES)
    # the baseline every naive pipeline produces: linear sort on one key
    (li.repartitionByRange(N_FILES, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(lpath))
    return zpath, lpath


def test_zorder_bounds_both_columns(layouts):
    zpath, lpath = layouts
    za, zb = _per_file_widths(zpath, "l_partkey", "l_suppkey")
    la, lb = _per_file_widths(lpath, "l_partkey", "l_suppkey")
    # linear layout: first column tight, second column ~full domain
    assert la < 0.25, la
    assert lb > 0.8, lb
    # z-order: BOTH columns bounded well below the domain — the curve
    # trades a little of a's tightness for pruning on b too
    assert za < 0.5, za
    assert zb < 0.5, zb
    # and b is far tighter than the linear layout's b
    assert zb < lb / 2, (zb, lb)


def test_z_value_interleaves_bits(spark):
    df = spark.range(1).select(
        z_value(F.lit(0b101), F.lit(0b011), bits=3).alias("z"))
    # a=101, b=011 -> z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert df.collect()[0].z == 0b011011


def test_zordered_read_roundtrip(spark, sf_dir, layouts):
    zpath, _ = layouts
    df = spark.read.parquet(zpath)
    got = df.filter((F.col("l_partkey") % 97 == 3)).count()
    # same rows as the source — layout must not lose or duplicate data
    src = load(spark, sf_dir, "lineitem")
    want = src.filter((F.col("l_partkey") % 97 == 3)).count()
    assert got == want


def test_zorder_empty_input_writes_cleanly(spark, tmp_path):
    df = (load(spark, "/root/testdata/sf0.001", "lineitem")
          .select("l_partkey", "l_suppkey").filter(F.lit(False)))
    out = os.path.join(str(tmp_path), "empty")
    write_zordered(df, out, "l_partkey", "l_suppkey", 4)
    assert spark.read.parquet(out).count() == 0


def test_z_value_n_three_columns_bound_all_ranges(spark, tmp_path):
    """3-column Morton clustering bounds EVERY column's per-file
    min/max to a fraction of its domain — the property a linear sort
    gives one column and z_value gives two. Verified from footers."""
    from etl_pipeline_stock_market_data_postgresql_spark.sources.zorder import (
        z_value_n, zordered_frame_n)

    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("a"),
        (F.col("id") * 40503 % n).alias("b"),
        (F.col("id") * 69621 % n).alias("c"))
    out = str(tmp_path / "z3")
    # 64 files => the curve's top 6 bits quarter EVERY column, leaving
    # slack for repartitionByRange's nondeterministic boundary
    # sampling (a straddling file widens one column to ~full domain;
    # with 64 files a few straddlers cannot push the average past the
    # bound — at 8 files they occasionally did, which is why this test
    # is not written against the minimum file count)
    zordered_frame_n(df, ("a", "b", "c"), n_files=64).write.parquet(out)

    import glob

    import pyarrow.parquet as pq
    widths = {"a": [], "b": [], "c": []}
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    # sampling wobble can leave a couple of range partitions empty
    # (an empty partition writes no file) — demand the shape, not
    # an exact count
    assert 56 <= len(files) <= 64
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.num_columns)}
        for col in widths:
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            widths[col].append(hi - lo)
    for col, ws in widths.items():
        avg = sum(ws) / len(ws)
        assert avg <= 0.6 * n, f"{col}: avg per-file width {avg}"
    # content invariance
    assert spark.read.parquet(out).count() == n
    # geometry guards
    with pytest.raises(ValueError):
        z_value_n([], 8)
    with pytest.raises(ValueError):
        z_value_n([F.col("a"), F.col("b"), F.col("c")], 21)
