"""Fingerprint-invalidated derived-table cache (sources/derived_cache):
build-once semantics, rebuild on input change, atomic publication
layout, and the graph/dedup consumers' contract that cached == fresh.
"""

import os
import time

import pytest

from etl_pipeline_stock_market_data_postgresql_spark.sources.derived_cache import (
    _FP_NAME, cached_parquet, file_fingerprint, table_fingerprint)


def _touch(path: str, content: bytes) -> None:
    with open(path, "wb") as f:
        f.write(content)


class TestFileFingerprint:
    def test_stable_across_calls(self, tmp_path):
        _touch(str(tmp_path / "a.parquet"), b"xyz")
        fp1 = file_fingerprint([str(tmp_path / "a.parquet")], params="p1")
        fp2 = file_fingerprint([str(tmp_path / "a.parquet")], params="p1")
        assert fp1 == fp2

    def test_changes_on_content_size(self, tmp_path):
        p = str(tmp_path / "a.parquet")
        _touch(p, b"xyz")
        fp1 = file_fingerprint([p])
        _touch(p, b"xyzw")
        assert file_fingerprint([p]) != fp1

    def test_changes_on_mtime_same_size(self, tmp_path):
        p = str(tmp_path / "a.parquet")
        _touch(p, b"xyz")
        fp1 = file_fingerprint([p])
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        assert file_fingerprint([p]) != fp1

    def test_changes_on_params(self, tmp_path):
        p = str(tmp_path / "a.parquet")
        _touch(p, b"xyz")
        assert file_fingerprint([p], "v1") != file_fingerprint([p], "v2")

    def test_directory_walk_order_invariant_and_recursive(self, tmp_path):
        d = tmp_path / "t.parquet"
        (d / "sub").mkdir(parents=True)
        _touch(str(d / "b.bin"), b"1")
        _touch(str(d / "sub" / "a.bin"), b"2")
        fp1 = file_fingerprint([str(d)])
        assert fp1 == file_fingerprint([str(d)])
        _touch(str(d / "sub" / "a.bin"), b"22")  # nested change invalidates
        assert file_fingerprint([str(d)]) != fp1

    def test_missing_path_fingerprints_as_absent(self, tmp_path):
        missing = str(tmp_path / "nope.parquet")
        assert file_fingerprint([missing]) == file_fingerprint([missing])

    def test_table_fingerprint_is_by_table_name(self, tmp_path):
        _touch(str(tmp_path / "orders.parquet"), b"o")
        _touch(str(tmp_path / "lineitem.parquet"), b"l")
        fp_ol = table_fingerprint(str(tmp_path), ("orders", "lineitem"))
        fp_o = table_fingerprint(str(tmp_path), ("orders",))
        assert fp_ol != fp_o


class TestCachedParquet:
    def test_build_once_then_read(self, spark, tmp_path):
        calls = []

        def build():
            calls.append(1)
            return spark.range(5).withColumnRenamed("id", "x")

        path = str(tmp_path / "derived")
        df1 = cached_parquet(spark, path, "fp1", build)
        assert sorted(r.x for r in df1.collect()) == [0, 1, 2, 3, 4]
        df2 = cached_parquet(spark, path, "fp1", build)
        assert sorted(r.x for r in df2.collect()) == [0, 1, 2, 3, 4]
        assert len(calls) == 1  # second call served from the cache

    def test_rebuilds_on_fingerprint_change(self, spark, tmp_path):
        path = str(tmp_path / "derived")
        cached_parquet(spark, path, "fp1", lambda: spark.range(3))
        df = cached_parquet(spark, path, "fp2",
                            lambda: spark.range(10, 12))
        assert sorted(r.id for r in df.collect()) == [10, 11]

    def test_fingerprint_file_is_inside_and_invisible_to_spark(
            self, spark, tmp_path):
        path = str(tmp_path / "derived")
        df = cached_parquet(spark, path, "fpX", lambda: spark.range(2))
        assert os.path.isfile(os.path.join(path, _FP_NAME))
        assert df.count() == 2  # underscore file ignored by the scan

    def test_no_tmp_dirs_left_behind(self, spark, tmp_path):
        path = str(tmp_path / "derived")
        cached_parquet(spark, path, "a", lambda: spark.range(1))
        cached_parquet(spark, path, "b", lambda: spark.range(1))
        leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
        assert leftovers == []


@pytest.mark.usefixtures("spark")
class TestConsumers:
    def test_trade_edges_cached_equals_fresh_and_invalidates(
            self, spark, sf_dir, tmp_path, monkeypatch):
        """End-to-end: _trade_edges through a private scratch root
        builds, re-serves identical rows, and rebuilds when an input
        table's mtime moves. Runs on a COPY of the input tables —
        testdata is read-only, including its mtimes."""
        import shutil

        from etl_pipeline_stock_market_data_postgresql_spark.workload import relational

        sf_copy = tmp_path / "sfcopy"
        sf_copy.mkdir()
        for t in ("orders", "lineitem"):
            shutil.copyfile(os.path.join(sf_dir, f"{t}.parquet"),
                            str(sf_copy / f"{t}.parquet"))
        monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "scr"))

        e1 = sorted(
            (r.src, r.dst)
            for r in relational._trade_edges(spark, str(sf_copy)).collect())
        und = str(tmp_path / "scr" / "sfcopy" / "trade_und")
        assert os.path.isfile(os.path.join(und, _FP_NAME))
        built_at = os.path.getmtime(os.path.join(und, _FP_NAME))
        e2 = sorted(
            (r.src, r.dst)
            for r in relational._trade_edges(spark, str(sf_copy)).collect())
        assert e1 == e2
        assert os.path.getmtime(os.path.join(und, _FP_NAME)) == built_at

        # shift an input's mtime -> fingerprint moves -> rebuild
        op = str(sf_copy / "orders.parquet")
        st = os.stat(op)
        time.sleep(0.01)
        os.utime(op, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        e3 = sorted(
            (r.src, r.dst)
            for r in relational._trade_edges(spark, str(sf_copy)).collect())
        assert e3 == e1  # same logical inputs -> same rows
        assert os.path.getmtime(os.path.join(und, _FP_NAME)) > built_at
