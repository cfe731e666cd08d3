"""Manifest-versioned parquet store — the Delta/Iceberg core in
miniature: data files are IMMUTABLE and append-only, every commit
writes a new manifest (an explicit file list), and readers resolve a
manifest instead of listing the directory. That single inversion buys
the three properties a 100 TB table needs and a plain parquet
directory cannot give:

- **time travel**: any retained version re-reads exactly its files;
- **snapshot-preserving compaction**: a rewrite commit publishes new
  files in a NEW manifest while the old files (and therefore every
  old snapshot) remain readable until vacuum;
- **snapshot isolation**: a reader holding version N never sees a
  concurrent append or rewrite, because nothing it references is
  mutated — only vacuum deletes, and only files no retained manifest
  references.

Reference parity: the reference delegates durability/versioning to
PostgreSQL (MVCC); this is the Spark-native equivalent for immutable
file storage.

Scale shape: a manifest here is a flat JSON file list — at 100 TB this
becomes a manifest TREE with per-file column stats (Iceberg's layout)
so planning prunes by stats before any scan, but the commit/read/
vacuum contract is unchanged. Commits are single-writer (the caller
serializes; a metastore CAS would arbitrate on a real lakehouse) and
publish via write-temp + atomic rename, so a crashed commit leaves at
worst orphaned data files for vacuum — never a readable-but-wrong
manifest."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_DATA = "data"
_MANIFESTS = "manifests"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFESTS, f"v{version:05d}.json")


def latest_version(root: str) -> int | None:
    d = os.path.join(root, _MANIFESTS)
    if not os.path.isdir(d):
        return None
    vs = [int(f[1:6]) for f in os.listdir(d)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs) if vs else None


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version), encoding="ascii") as f:
        return json.load(f)


def read_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Snapshot read: exactly the files version ``version`` committed.
    Never lists the data directory — concurrent appends/rewrites are
    invisible, and a vacuumed (unretained) version fails loudly on the
    missing file rather than silently returning partial data."""
    files = read_manifest(root, version)["files"]
    return spark.read.parquet(
        *[os.path.join(root, _DATA, f) for f in files])


def _file_stats(path: str, cols: tuple[str, ...]) -> dict:
    """Per-column [min, max] from the parquet footer — metadata only,
    no data pages read. This is the per-file stats entry an Iceberg
    manifest carries; it is what makes :func:`read_version_pruned`'s
    file skipping a pure planning decision."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for c in cols:
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out[c] = [lo, hi]
    return out


def _commit(spark: SparkSession, root: str, df: DataFrame,
            carry_prev: bool, stats_cols: tuple[str, ...]) -> int:
    os.makedirs(os.path.join(root, _DATA), exist_ok=True)
    os.makedirs(os.path.join(root, _MANIFESTS), exist_ok=True)
    prev = latest_version(root)
    version = (prev or 0) + 1
    tmp = os.path.join(root, f".commit-tmp-{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.parquet(tmp)
    new, stats = [], {}
    cols = tuple(c for c in stats_cols if c in df.columns)
    for i, f in enumerate(sorted(x for x in os.listdir(tmp)
                                 if x.endswith(".parquet"))):
        name = f"v{version:05d}-{i:05d}.parquet"
        dst = os.path.join(root, _DATA, name)
        os.replace(os.path.join(tmp, f), dst)
        new.append(name)
        if cols:
            stats[name] = _file_stats(dst, cols)
    shutil.rmtree(tmp, ignore_errors=True)
    if carry_prev and prev is not None:
        pm = read_manifest(root, prev)
        files = pm["files"] + new
        stats = {**pm.get("stats", {}), **stats}
    else:
        files = new
    body = json.dumps({"version": version, "files": files,
                       "stats": stats})
    mtmp = _manifest_path(root, version) + ".tmp"
    with open(mtmp, "w", encoding="ascii") as f:
        f.write(body)
    os.replace(mtmp, _manifest_path(root, version))
    return version


def read_version_pruned(spark: SparkSession, root: str, version: int,
                        col: str, lo, hi) -> tuple[DataFrame, int, int]:
    """Snapshot read that OPENS only files whose manifest [min, max]
    stats for ``col`` overlap [lo, hi] — Iceberg-style file skipping
    as a pure planning decision over driver-side metadata (no footer
    reads at plan time, no data reads for skipped files). Returns
    ``(df, n_files_opened, n_files_total)``. The skipped set is a
    proven superset-complement: a file whose min/max misses the range
    cannot hold a matching row, so the caller applying the PRECISE
    predicate to the returned frame gets exactly the unpruned answer.
    Files without recorded stats for ``col`` are conservatively
    opened."""
    man = read_manifest(root, version)
    stats = man.get("stats", {})
    keep = []
    for f in man["files"]:
        s = stats.get(f, {}).get(col)
        if s is None or (s[0] <= hi and s[1] >= lo):
            keep.append(f)
    if not keep:  # preserve schema on an empty match
        return (read_version(spark, root, version).limit(0),
                0, len(man["files"]))
    df = spark.read.parquet(
        *[os.path.join(root, _DATA, f) for f in keep])
    return df, len(keep), len(man["files"])


def commit_append(spark: SparkSession, root: str, df: DataFrame,
                  stats_cols: tuple[str, ...] = ("id",)) -> int:
    """New version = previous files + df's files (incremental ingest).
    Footer min/max stats for ``stats_cols`` (those present) are
    recorded per file for :func:`read_version_pruned`."""
    return _commit(spark, root, df, carry_prev=True,
                   stats_cols=stats_cols)


def commit_rewrite(spark: SparkSession, root: str, df: DataFrame,
                   stats_cols: tuple[str, ...] = ("id",)) -> int:
    """New version = ONLY df's files (compaction / full replace). The
    superseded files stay on disk — every retained older snapshot keeps
    reading them — until :func:`vacuum`."""
    return _commit(spark, root, df, carry_prev=False,
                   stats_cols=stats_cols)


def vacuum(root: str, keep_versions: list[int]) -> list[str]:
    """Delete every data file not referenced by any KEPT manifest;
    returns the deleted names. Retention policy is the caller's (time-
    or version-based on a real lakehouse); vacuuming a version a
    concurrent reader still holds is the one way to break snapshot
    isolation, which is why retention windows exist."""
    keep: set[str] = set()
    for v in keep_versions:
        keep |= set(read_manifest(root, v)["files"])
    data = os.path.join(root, _DATA)
    removed = []
    for f in sorted(os.listdir(data)):
        if f.endswith(".parquet") and f not in keep:
            os.remove(os.path.join(data, f))
            removed.append(f)
    return removed
