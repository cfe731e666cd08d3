"""Fingerprint-invalidated derived-table cache (materialized views).

Several queries share an expensive derived table: the trade-graph edge
list (q128 PageRank, q131/q136 k-core both pay the same orders⨝lineitem
distinct-pair pass), and the dedup signature index (q120/q122's fixture
batch-dedups the same two-thirds of the corpus). A production pipeline
materializes these once and refreshes on input change — this module is
that primitive: ``cached_parquet`` returns the stored parquet when its
recorded input fingerprint still matches, and (re)builds otherwise.

Invalidation is by INPUT fingerprint, not output content: the
fingerprint hashes the source files' (relative path, size, mtime_ns)
triples plus a caller-supplied params string (derivation constants +
a version token bumped on logic change). A content hash would need a
full pass over the inputs — exactly the pass the cache exists to avoid;
file-stat invalidation is the standard lakehouse refresh trigger
(a changed upstream commit touches files). On a real cluster the same
contract reads the table format's snapshot/commit id instead of mtimes.

Publication is atomic-ish: build into a pid-suffixed temp dir next to
the target, write the fingerprint INSIDE it, then rename over the
target — a reader never observes a half-written cache. Two same-user
same-SF processes racing the build both produce identical content (the
derivations are deterministic), so last-rename-wins is safe; distinct
users/SFs never share a path (sources/scratch.scratch_base).

Reference parity: the reference delegates derived state to PostgreSQL
tables it refreshes by re-INSERT (main_parallel.py's re-fetch +
idempotent load); this is the Spark-native equivalent with explicit
staleness tracking.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_FP_NAME = "_INPUT_FINGERPRINT"


def sweep_stale_siblings(path: str, tags: tuple[str, ...],
                         keep: str | None = None) -> None:
    """Remove leftover work directories next to ``path`` whose names
    are ``<basename(path)>.<tag><pid>`` and whose creating process is
    DEAD — the debris a crash between a build and its rename pair
    leaves behind (``.old-<pid>`` asides, ``.tmp-<pid>`` builds). The
    names embed the creator's pid, so a retry under a new pid would
    otherwise never reclaim them; a LIVE owner (this module tolerates
    racing same-content builders — last rename wins) keeps its dir."""
    parent = os.path.dirname(os.path.abspath(path))
    base = os.path.basename(os.path.normpath(path))
    if not os.path.isdir(parent):
        return
    me = os.getpid()
    for entry in os.listdir(parent):
        full = os.path.join(parent, entry)
        if full == keep or not entry.startswith(base + "."):
            continue
        tail = entry[len(base):]
        if not any(tail.startswith(t) for t in tags):
            continue
        owner = tail.rsplit("-", 1)[-1]
        if owner.isdigit() and int(owner) != me:
            try:
                os.kill(int(owner), 0)
                continue  # live owner — not ours to reclaim
            except ProcessLookupError:
                pass
            except PermissionError:
                continue  # exists under another uid
        shutil.rmtree(full, ignore_errors=True)


def file_fingerprint(paths: list[str] | tuple[str, ...],
                     params: str = "") -> str:
    """Hex digest over the (relpath, size, mtime_ns) of every file under
    ``paths`` (each a file or directory, walked recursively, sorted so
    listing order can't move the digest) plus ``params``. Missing paths
    fingerprint as absent — building from them would fail anyway."""
    h = hashlib.sha256()
    h.update(params.encode())
    for root in paths:
        h.update(b"\x00" + os.path.basename(os.path.normpath(root)).encode())
        if os.path.isfile(root):
            st = os.stat(root)
            h.update(f"|.|{st.st_size}|{st.st_mtime_ns}".encode())
            continue
        if not os.path.isdir(root):
            h.update(b"|missing")
            continue
        entries = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                entries.append((os.path.relpath(p, root),
                                st.st_size, st.st_mtime_ns))
        for rel, size, mtime in sorted(entries):
            h.update(f"|{rel}|{size}|{mtime}".encode())
    return h.hexdigest()


def table_fingerprint(sf_dir: str, tables: tuple[str, ...],
                      params: str = "") -> str:
    """Fingerprint of testdata tables by name — the common case."""
    return file_fingerprint(
        [os.path.join(sf_dir, f"{t}.parquet") for t in tables], params)


def _stored_fingerprint(path: str) -> str | None:
    try:
        with open(os.path.join(path, _FP_NAME), encoding="ascii") as f:
            return f.read().strip()
    except OSError:
        return None


def cached_parquet(spark: SparkSession, path: str, fingerprint: str,
                   build: Callable[[], DataFrame]) -> DataFrame:
    """Return ``spark.read.parquet(path)``, (re)building it from
    ``build()`` first unless the stored fingerprint matches. The
    returned scan is lazy and re-readable — multi-consumer plans read
    the compact materialized table per consumer instead of re-deriving
    (the persist-vs-reread tradeoff tips to reread once the state is
    columnar on disk)."""
    if _stored_fingerprint(path) != fingerprint:
        sweep_stale_siblings(path, (".tmp-",))  # crashed-build debris
        tmp = f"{path}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build().write.mode("overwrite").parquet(tmp)
        # the fingerprint lands INSIDE tmp before publication, and its
        # underscore prefix keeps Spark's file index from reading it
        with open(os.path.join(tmp, _FP_NAME), "w", encoding="ascii") as f:
            f.write(fingerprint)
        try:
            publish_dir(tmp, path)
        except OSError:
            # a concurrent builder published between our rename-aside
            # and rename; both builds are deterministic over the same
            # fingerprinted inputs, so theirs is as good as ours
            if _stored_fingerprint(path) != fingerprint:
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def publish_dir(tmp: str, path: str) -> None:
    """Atomically publish directory ``tmp`` as ``path`` by renaming the
    LIVE directory aside first (not rmtree-then-rename): a concurrent
    reader mid-scan on the old state keeps a consistent directory to
    finish against instead of observing a half-deleted one; the
    missing-dir window is a single rename pair. (Readers that LIST
    after the swap see only the new state — parquet dirs are immutable
    once published.) The stale copy is removed after the swap, and any
    ``.old-*`` asides a CRASHED earlier publish leaked (their names
    embed the dead pid, so only this sweep reclaims them) are removed
    on entry. On a real lakehouse this is the metastore pointer
    swap."""
    sweep_stale_siblings(path, (".old-",), keep=tmp)
    old = f"{path}.old-{os.getpid()}"
    shutil.rmtree(old, ignore_errors=True)
    try:
        os.replace(path, old)
    except FileNotFoundError:
        pass  # first build: nothing to move aside
    try:
        os.replace(tmp, path)
    except OSError:
        # restore the live state we moved aside (unless a concurrent
        # publisher already put a new one at path — their build wins)
        if os.path.exists(old) and not os.path.exists(path):
            os.replace(old, path)
        else:
            shutil.rmtree(old, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
