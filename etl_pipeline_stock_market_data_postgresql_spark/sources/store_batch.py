"""BATCH read/write halves of the ``versioned_store`` Python Data
Source — with these, the store speaks all four quadrants of the
standard Spark API surface:

- ``spark.read.format("versioned_store")`` … this module's reader;
- ``df.write.format("versioned_store").mode(...)`` … this module's
  writer (append / overwrite);
- ``spark.readStream.format("store_cdf")`` … streaming change feed
  (``streaming/cdf_source.py``);
- ``df.writeStream.format("versioned_store")`` … streaming sink
  (``streaming/store_sink.py``).

READER — snapshot scan with PLANNING-TIME file skipping:

``partitions()`` is one :class:`InputPartition` per LIVE data file of
the resolved version (``versionAsOf`` option; default the latest
VISIBLE version — 2PC invisibility and aborted-hole semantics are the
store's, not re-derived here). Spark's ``pushFilters`` hands the scan
the query's conjunctive predicates at plan time; supported
comparisons (=, <, <=, >, >=, IN on top-level columns) fold into
per-column [lo, hi] ranges that prune through the SAME two-level
manifest statistics :func:`versioned_store.read_version_pruned_multi`
uses — a whole segment whose summary misses a conjunct is skipped
without even reading the segment file, then surviving files prune by
their footer-stats entries, then an equality on a bloom-indexed
column probes the per-file sidecar. EVERY filter is returned to Spark
as "still needs evaluating" (the API's safe mode): pruning only ever
skips files PROVEN rowless for the conjunction, Spark re-applies the
exact predicates to the rows that do flow, so answers are exact even
for filters the range model only approximates. Rows never touch the
driver: executors pyarrow-read their one file, subtract its deletion
vector's positions, NULL-fill columns the file predates, and emit
Arrow record batches under the pinned logical schema (physical names
mapped on column-mapped stores).

Spark requires ``spark.sql.python.filterPushdown.enabled=true`` when
a reader overrides ``pushFilters`` (it refuses to silently drop the
implementation); the repo's session factory sets it, and the reader
degrades to the no-pushdown variant via ``filterPushdown=false`` for
foreign sessions that cannot.

WRITER — the two-phase distributed commit every real table format
uses (and the streaming sink already implements): executors stream
their partition's Arrow batches straight into staged parquet files in
the store's data dir (no per-row Python transit), the driver
publishes ALL of them as ONE CAS manifest commit. ``mode("append")``
carries the previous snapshot; ``mode("overwrite")`` publishes a
manifest referencing ONLY the new files (op ``rewrite``) — the old
snapshot stays time-travelable and vacuum reclaims it by policy.
``txnAppId``/``txnVersion`` options give batch writes the same
idempotent-replay ledger as streaming micro-batches. A failed job
aborts by deleting its staged files; a crashed driver leaves
dead-pid orphans that vacuum's writer-liveness rule reclaims.

Reference parity: the reference reads its tables back with pandas
``read_sql`` over a psycopg2 connection (single socket, single
process — README_duckdb.md's analysis section); here the same
``spark.read`` call fans one task per file across the cluster and
skips files the predicate proves empty.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSourceArrowWriter,
                                    DataSourceReader, EqualTo,
                                    GreaterThan, GreaterThanOrEqual,
                                    In, InputPartition, LessThan,
                                    LessThanOrEqual,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

_DATA = "data"  # versioned_store._DATA (executor-side literal, same
# convention as streaming/cdf_source.py)


def nullable_schema(schema: StructType) -> StructType:
    """Recursively relax nullability — the scan's declared schema must
    match what parquet snapshot reads actually produce (parquet-backed
    frames are nullable throughout; the manifest may record NOT NULL
    from the writer's frame, and evolution NULL-fills old files
    regardless)."""
    from pyspark.sql.types import ArrayType, MapType, StructField

    def _relax(dt):
        if isinstance(dt, StructType):
            return StructType([
                StructField(f.name, _relax(f.dataType), True)
                for f in dt.fields])
        if isinstance(dt, ArrayType):
            return ArrayType(_relax(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(_relax(dt.keyType), _relax(dt.valueType),
                           True)
        return dt

    return _relax(schema)


class _FilePartition(InputPartition):
    """One live data file — the executor work unit. ``dv`` is the
    file's deletion-vector sidecar name (None when unmarked)."""

    def __init__(self, file: str, dv: str | None):
        self.file = file
        self.dv = dv


def _read_dv_positions(root: str, name: str) -> set:
    import json

    from .dv_codec import decode_positions_doc

    with open(os.path.join(root, _DATA, name), encoding="ascii") as f:
        return set(decode_positions_doc(json.load(f)))


def _intersect(a: tuple, b: tuple) -> tuple:
    lo = b[0] if a[0] is None else a[0] if b[0] is None else max(a[0], b[0])
    hi = b[1] if a[1] is None else a[1] if b[1] is None else min(a[1], b[1])
    return (lo, hi)


def _stats_hit(rng: tuple, s) -> bool:
    """May file-range ``s=[min,max]`` contain a row in ``rng``?
    Conservative: un-comparable (mixed-type) bounds never prune."""
    lo, hi = rng
    try:
        if hi is not None and not s[0] <= hi:
            return False
        if lo is not None and not s[1] >= lo:
            return False
    except TypeError:
        return True
    return True


class StoreBatchReader(DataSourceReader):
    """Pruning batch reader (see module docstring). Planning state is
    driver-side manifest metadata; the pickled reader ships only the
    root, pinned schema and column map to executors."""

    def __init__(self, root: str, version: int):
        from . import versioned_store as vstore

        self._root = root
        self._version = version
        raw = vstore._read_manifest_raw(root, version)
        vstore._check_tx_visible(root, version, raw)
        self._raw: dict | None = raw
        if raw.get("schema") is None:
            raise ValueError(
                f"{root} predates recorded schemas — the batch source "
                f"needs the manifest schema to scan under")
        self._schema_json = raw["schema"]
        self._colmap = raw.get("colmap") or {}
        # logical-name ranges/equality sets collected by pushFilters
        self._ranges: dict[str, tuple] = {}
        self._eq_values: dict[str, list] = {}
        #: filled by partitions() — (files opened, files+segments total)
        self.plan_report: dict | None = None

    # -- planning (driver) -------------------------------------------

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Fold supported conjuncts into per-column ranges for stats
        pruning. ALL filters are returned (Spark re-applies them), so
        a conjunct the range model cannot express — or a file without
        stats — costs only a forgone skip, never a wrong row."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            rng = None
            if isinstance(f, EqualTo):
                if f.value is None:
                    continue  # NULL literal: never prune on it
                rng = (f.value, f.value)
                if isinstance(f.value, int):  # bloom keys are ints
                    self._eq_values.setdefault(col, []).append(f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                if f.value is None:
                    continue
                # strict > prunes with the closed bound — superset-safe
                rng = (f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                if f.value is None:
                    continue
                rng = (None, f.value)
            elif isinstance(f, In):
                # a NULL in the list never matches a row, so pruning
                # on the non-null bounds stays superset-safe
                vals = [v for v in f.value if v is not None]
                if vals:
                    try:
                        rng = (min(vals), max(vals))
                    except TypeError:
                        rng = None
            if rng is not None:
                self._ranges[col] = _intersect(
                    self._ranges.get(col, (None, None)), rng)
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        from . import versioned_store as vstore

        raw = self._raw
        if raw is None:  # re-planned after a prior partitions() call
            raw = vstore._read_manifest_raw(self._root, self._version)
        cm = self._colmap
        # stats (and bloom sidecars) are keyed PHYSICAL on mapped stores
        ranges = {cm.get(c, c): rng for c, rng in self._ranges.items()}
        eq = {cm.get(c, c): vs for c, vs in self._eq_values.items()}

        def _hits(fs: dict) -> bool:
            for col, rng in ranges.items():
                s = fs.get(col)
                if s is not None and not _stats_hit(rng, s):
                    return False
            return True

        if "segments" in raw:
            files: list[str] = []
            stats: dict = {}
            n_total = 0
            for entry in raw["segments"]:
                if isinstance(entry, dict) and not _hits(entry["stats"]):
                    n_total += entry["n"]  # segment skipped unread
                    continue
                sd = vstore._read_segment(self._root,
                                          vstore._seg_name(entry))
                n_total += len(sd["files"])
                for f in sd["files"]:
                    if _hits(sd["stats"].get(f, {})):
                        files.append(f)
                        stats[f] = sd["stats"].get(f, {})
        else:
            stats = raw.get("stats", {})
            files = [f for f in raw["files"]
                     if _hits(stats.get(f, {}))]
            n_total = len(raw["files"])

        if eq:  # bloom probe the range survivors (point lookups)
            kept = []
            for f in files:
                fs = stats.get(f, {})
                drop = False
                for col, vals in eq.items():
                    marker = fs.get(vstore._BLOOM_PREFIX + col)
                    if marker is None:
                        continue
                    try:
                        bl = vstore._read_file_bloom(
                            os.path.join(self._root, _DATA, f)).get(col)
                    except OSError:
                        continue  # sidecar gone: cannot prune
                    if bl is not None and not any(
                            vstore._bloom_maybe_contains(
                                bl["words"], v, k=bl["k"])
                            for v in vals):
                        drop = True
                        break
                if not drop:
                    kept.append(f)
            files = kept

        self.plan_report = {"n_files": len(files), "n_total": n_total}
        self._raw = None  # slim the reader pickle shipped to executors
        dvm = {f: stats.get(f, {}).get(vstore._DV_KEY) for f in files}
        return [_FilePartition(f, dvm[f]) for f in sorted(files)]

    # -- execution (executor) ----------------------------------------

    def read(self, partition: _FilePartition | None) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        if partition is None:
            # an empty partitions() list (every file pruned) runs one
            # task with no partition object: emit nothing — the scan's
            # schema still comes from schema(), so shape is preserved
            return
        table = pq.read_table(
            os.path.join(self._root, _DATA, partition.file))
        if self._colmap:  # physical field names → logical
            inv = {p: l for l, p in self._colmap.items()}
            table = table.rename_columns(
                [inv.get(c, c) for c in table.column_names])
        if partition.dv:
            exc = _read_dv_positions(self._root, partition.dv)
            n = table.num_rows
            table = table.take(pa.array(
                [i for i in range(n) if i not in exc], type=pa.int64()))
        target = to_arrow_schema(nullable_schema(
            StructType.fromJson(self._schema_json)))
        cols = []
        for field in target:
            if field.name in table.column_names:
                col = table.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:  # file predates the column: NULL-fill
                col = pa.nulls(table.num_rows, type=field.type)
            cols.append(col)
        out = pa.table(cols, names=[f.name for f in target])
        yield from out.to_batches(max_chunksize=1 << 16)


class StoreBatchPlainReader(StoreBatchReader):
    """``filterPushdown=false`` variant: does NOT override
    ``pushFilters``, so it loads under sessions where
    ``spark.sql.python.filterPushdown.enabled`` is off (Spark refuses
    to run an overriding reader there rather than silently skip it).
    Scans every live file; Spark applies all predicates post-scan."""

    # restore the base-class attribute so the runtime's override
    # detection (`__func__ is not DataSourceReader.pushFilters`) sees
    # the default implementation
    pushFilters = DataSourceReader.pushFilters


class StoreBatchWriter(DataSourceArrowWriter):
    """Batch writer: composition over the streaming sink's Arrow
    executor path (identical staged-file contract), with a batch
    commit that publishes once — append (carry the snapshot) or
    overwrite (fresh file list, op ``rewrite``)."""

    def __init__(self, core, overwrite: bool,
                 txn: tuple[str, int] | None):
        self._core = core  # a StoreStreamWriter (executor write/abort)
        self._overwrite = overwrite
        self._txn = txn

    def write(self, iterator) -> WriterCommitMessage:
        return self._core.write(iterator)

    def commit(self, messages) -> None:
        from . import versioned_store as vstore

        c = self._core
        files = sorted(m.file for m in messages
                       if m is not None and m.file is not None)
        if not files and not self._overwrite and self._txn is None:
            # un-ledgered APPEND of an empty frame: publishing would
            # only mint a contentless version — no-op instead. An
            # overwrite must still publish (it is a truncate), and a
            # txn-keyed write must record its ledger entry so replays
            # no-op.
            return
        vstore.commit_staged_files(
            c._root, files, stats_cols=c._stats_cols,
            bloom_cols=c._bloom_cols, txn=self._txn,
            schema_json=c._schema_json,
            allow_evolution=c._allow_evolution,
            op="rewrite" if self._overwrite else "append",
            carry_prev=not self._overwrite,
            colmap=c._colmap, assigned_new=c._assigned_new,
            colmax=c._colmax)

    def abort(self, messages) -> None:
        self._core.abort(messages, 0)
