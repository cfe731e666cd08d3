"""Structured Streaming SOURCE over the versioned store's change feed
— Delta's ``readChangeFeed`` shape, implemented as a real PySpark 4
Python Data Source (SPARK-44076): ``spark.readStream.format(...)`` on
a store root yields every committed change as typed rows, with Spark's
own checkpoint offset log tracking the last processed VERSION. This is
the consumer half the r14 verdict asked for: an incremental
materialized view (or any downstream pipeline) follows the store
across commits by just running a stream — no hand-rolled cursor file,
no driver loop; restart resumes from the checkpoint exactly-once when
paired with a txn-keyed sink (the store's own Delta-style
txnAppId/txnVersion ledger).

Semantics — the DELTA MULTISET of each commit, signed:

- an ADDED file's rows feed as ``insert`` (minus any deletion-vector
  positions the same commit attached to it);
- a REMOVED file's rows feed as ``delete`` (minus the positions its
  vector had already marked — those rows were logically gone before);
- a CARRIED file whose deletion vector changed feeds only the
  newly-marked positions as ``delete`` (and, after a RESTORE that
  rolled a vector back, the unmarked positions as ``insert``) — a
  merge-on-read takedown of 100 rows feeds 100 rows, not the file.

A copy-on-write rewrite's SURVIVOR rows therefore appear as a
``delete``(old file) + ``insert``(new file) pair. That is deliberate:
the pair is additively self-cancelling, so signed aggregation — the
incremental-view-maintenance use this source exists for — is exact for
every verb (append, CoW delete/merge, MoR delete, purge, restore,
compaction), while the source itself never needs the cross-file
``exceptAll`` that batch :func:`version_diff` performs (a per-commit
global anti-join inside a streaming micro-batch would shuffle the
whole rewrite; the signed pair costs only the changed files). Batch
``version_diff``/``version_diff_typed`` remain the precise feeds when
pairing matters.

Scale shape: offsets and change classification are DRIVER-side
manifest metadata (O(#changed files) per commit — the same planning
cost any snapshot read pays); row reads are EXECUTOR-side, one input
partition per changed file, pyarrow-vectorized into Arrow record
batches. A 1000-file commit fans out as 1000 tasks; nothing row-scale
ever touches the driver. Aborted 2PC holes feed nothing; an in-doubt
top-of-chain prepare simply holds ``latestOffset`` back until the
transaction decides (2PC invisibility, preserved under streaming).

Schema contract: the stream's schema (and column mapping) is pinned at
QUERY START from the store's then-latest manifest — Spark streaming
schemas are static. Files predating a schema evolution surface added
columns as NULL; physical field names are stable under column mapping,
so renames never break the feed. A RESTART from checkpoint re-resolves
the schema from the then-latest manifest (``DataSource.schema()`` and
the reader are re-instantiated per query), so after an ALTER/evolution
the follower picks up the new columns by restarting — offsets carry
over, exactly-once holds, pre-evolution files NULL-fill (pinned by
``tests/test_r16_ops.py::
test_cdf_restart_from_checkpoint_picks_up_evolved_schema``). While a
query is IN FLIGHT its pinned schema stays what it was at start:
commits the evolution made are still fed completely and correctly
under the old projection (added columns simply don't appear until the
restart) — Delta's readChangeFeed makes the same trade.

Reference parity: the reference re-polls PostgreSQL tables on a
schedule (main_parallel.py's fetch loop); this replaces polling with a
change-feed subscription — the shape a 100 TB pipeline needs.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import LongType, StringType, StructType

FORMAT_NAME = "store_cdf"

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"

_DATA = "data"  # versioned_store._DATA (kept in sync; executor-side
# reads must not import the Spark-session-level store module lazily)


class _ChangePartition(InputPartition):
    """One changed FILE of one commit — the unit of executor work.

    ``mode``:
      - ``"all"``: every row of ``file`` (minus ``dv_exclude``'s
        positions) feeds with ``kind``;
      - ``"dv_diff"``: only positions in ``dv_include`` minus
        ``dv_exclude`` feed (carried file whose vector changed) —
        both sidecars are read executor-side, positions never touch
        the driver.
    """

    def __init__(self, file: str, kind: str, version: int, mode: str,
                 dv_exclude: str | None = None,
                 dv_include: str | None = None):
        self.file = file
        self.kind = kind
        self.version = version
        self.mode = mode
        self.dv_exclude = dv_exclude
        self.dv_include = dv_include


def _read_dv_positions(root: str, name: str) -> set:
    from ..sources.dv_codec import decode_positions_doc

    with open(os.path.join(root, _DATA, name), encoding="ascii") as f:
        return set(decode_positions_doc(json.load(f)))


def _visible_manifest_at(root: str, v: int):
    """The resolved manifest of the newest visible version ≤ v —
    walks down past aborted holes (an offset recorded while a
    prepare was pending may sit ON a hole after it aborts)."""
    from ..sources import versioned_store as vstore

    for w in range(v, 0, -1):
        try:
            return vstore.read_manifest(root, w)
        except vstore.AbortedTransactionError:
            continue
    return None


def _classify_commit(man: dict, prev: dict | None,
                     v: int) -> list[_ChangePartition]:
    """DRIVER-side change classification of ONE commit vs its
    predecessor — the shared planning core of the streaming source
    and the batch range reader (semantics in the module docstring)."""
    from ..sources.versioned_store import _DV_KEY

    ft = set(man["files"])
    st = man.get("stats", {})
    ff = set(prev["files"]) if prev is not None else set()
    sf_ = prev.get("stats", {}) if prev is not None else {}
    out = []
    for f in sorted(ft - ff):  # added → insert (minus v's DV)
        out.append(_ChangePartition(
            f, "insert", v, "all",
            dv_exclude=st.get(f, {}).get(_DV_KEY)))
    for f in sorted(ff - ft):  # removed → delete (its LIVE rows)
        out.append(_ChangePartition(
            f, "delete", v, "all",
            dv_exclude=sf_.get(f, {}).get(_DV_KEY)))
    for f in sorted(ft & ff):  # carried: only a CHANGED vector feeds
        dv_f = sf_.get(f, {}).get(_DV_KEY)
        dv_t = st.get(f, {}).get(_DV_KEY)
        if dv_f == dv_t:
            continue
        if dv_t is not None:
            # newly marked = dv_t − dv_f → delete; when the commit
            # REMOVED the vector entirely (dv_t None, e.g. restore
            # to a pre-MoR-delete version) that set is empty by
            # construction and no delete partition exists — emitting
            # one with dv_include=None would crash read()
            out.append(_ChangePartition(
                f, "delete", v, "dv_diff",
                dv_include=dv_t, dv_exclude=dv_f))
        if dv_f is not None:
            out.append(_ChangePartition(  # rolled back → insert
                f, "insert", v, "dv_diff",
                dv_include=dv_f, dv_exclude=dv_t))
    return out


def _classify_version(root: str, v: int) -> list[_ChangePartition]:
    """The change partitions of ONE version, in the deterministic
    classification order (a pure function of the immutable manifests
    — required by file-granular offsets, whose slices must be stable
    across restarts and replays). An aborted hole classifies empty."""
    from ..sources import versioned_store as vstore

    try:
        man = vstore.read_manifest(root, v)
    except vstore.AbortedTransactionError:
        return []
    prev = _visible_manifest_at(root, v - 1) if v >= 2 else None
    return _classify_commit(man, prev, v)


def _plan_changes(root: str, lo: int, hi: int) -> list[_ChangePartition]:
    """All change partitions of the commit range ``(lo, hi]`` —
    aborted holes feed nothing; the baseline below ``lo`` walks down
    past holes."""
    from ..sources import versioned_store as vstore

    parts: list[_ChangePartition] = []
    prev = _visible_manifest_at(root, lo) if lo >= 1 else None
    for v in range(lo + 1, hi + 1):
        try:
            man = vstore.read_manifest(root, v)
        except vstore.AbortedTransactionError:
            continue  # a hole feeds nothing; prev carries forward
        parts.extend(_classify_commit(man, prev, v))
        prev = man
    return parts


def _read_change_partition(root: str, colmap: dict, schema_json,
                           p: _ChangePartition) -> Iterator:
    """EXECUTOR-side: pyarrow-read one changed file, apply the
    position semantics, emit Arrow record batches under the pinned
    schema (physical→logical mapping resolved here; columns predating
    an evolution fill as NULL). Shared by the streaming source and
    the batch range reader."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    table = pq.read_table(os.path.join(root, _DATA, p.file))
    if colmap:  # physical field names → logical
        inv = {phys: log for log, phys in colmap.items()}
        table = table.rename_columns(
            [inv.get(c, c) for c in table.column_names])
    n = table.num_rows
    if p.mode == "dv_diff":
        inc = _read_dv_positions(root, p.dv_include)
        exc = (_read_dv_positions(root, p.dv_exclude)
               if p.dv_exclude else set())
        # indices typed explicitly: an EMPTY diff (a restore that
        # SHRANK the vector makes dv_t−dv_f empty) would otherwise
        # hand pyarrow a null-typed list and crash array_take
        table = table.take(pa.array(
            sorted(q for q in inc - exc if q < n), type=pa.int64()))
    elif p.dv_exclude:
        exc = _read_dv_positions(root, p.dv_exclude)
        table = table.take(pa.array(
            [i for i in range(n) if i not in exc], type=pa.int64()))
    target = to_arrow_schema(StructType.fromJson(schema_json))
    cols = []
    for field in target:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:  # pre-evolution file: the added column is NULL
            col = pa.nulls(table.num_rows, type=field.type)
        cols.append(col)
    cols.append(pa.array([p.kind] * table.num_rows,
                         type=pa.string()))
    cols.append(pa.array([p.version] * table.num_rows,
                         type=pa.int64()))
    out = pa.table(
        cols, names=[f.name for f in target]
        + [CHANGE_TYPE_COL, COMMIT_VERSION_COL])
    yield from out.to_batches(max_chunksize=1 << 16)


class StoreCDFStreamReader(DataSourceStreamReader):
    """Stream reader whose OFFSET is the store's manifest version,
    optionally refined by a file index for file-granular admission.

    ``initialOffset`` starts at ``startingVersion`` (exclusive;
    default 0 = feed the whole store from its first commit, which is
    how a brand-new materialized view bootstraps from the feed alone).
    ``latestOffset`` is the store's latest VISIBLE version — a
    prepared in-doubt 2PC top holds the offset back instead of
    leaking, an aborted hole is skipped by classification. Spark
    persists the committed offset in the checkpoint, so a restarted
    query resumes at the exact boundary it last processed.

    Offsets are ``{"version": v}`` (all changes of versions ≤ v
    complete) or — under ``maxFilesPerBatch`` when a cap lands inside
    a commit — ``{"version": v, "idx": k}``: additionally the FIRST k
    change partitions of version v+1 (the classification order is a
    pure function of the immutable manifests, so the slice is stable
    across restarts and replays). A whole-version offset serializes
    WITHOUT ``idx`` so legacy checkpoints and new ones compare
    equal."""

    def __init__(self, root: str, starting_version: int,
                 max_versions_per_batch: int | None = None,
                 cursor_path: str | None = None,
                 max_files_per_batch: int | None = None):
        from ..sources import versioned_store as vstore

        self._root = root
        self._start = starting_version
        self._last_visible = starting_version
        self._max_versions = max_versions_per_batch
        self._max_files = max_files_per_batch
        if max_versions_per_batch is not None \
                and max_files_per_batch is not None:
            raise ValueError(
                "maxVersionsPerBatch and maxFilesPerBatch are "
                "alternative admission caps — set at most one")
        for label, cap in (("maxVersionsPerBatch",
                            max_versions_per_batch),
                           ("maxFilesPerBatch", max_files_per_batch)):
            if cap is not None and cap < 1:
                # a zero cap would report a frozen offset forever — a
                # silently-stalled stream, the worst failure mode
                raise ValueError(f"{label} must be >= 1, got {cap}")
        if (max_versions_per_batch is not None
                or max_files_per_batch is not None) and not cursor_path:
            # the Python source API never hands the reader the
            # RESTORED offset (initialOffset is skipped on restart, and
            # latestOffset takes no start), so a capped reader that
            # forgot its floor would report an offset at-or-behind the
            # checkpoint forever — a restarted query would never drain.
            # The cursor file is that floor, ADVISORY ONLY: data
            # completeness and exactly-once remain entirely Spark's
            # offset log; a stale/ahead cursor only changes batch
            # sizing (one cursor per query, like a checkpoint dir).
            raise ValueError(
                "admission caps (maxVersionsPerBatch / "
                "maxFilesPerBatch) require cursorPath (a small file "
                "this source owns, one per query) so admission "
                "control survives restarts")
        self._cursor_path = cursor_path
        floor = (starting_version, 0)
        if cursor_path and os.path.exists(cursor_path):
            with open(cursor_path, encoding="ascii") as f:
                txt = f.read().strip()
            if txt:
                v, _, k = txt.partition(":")
                floor = max(floor, (int(v), int(k or 0)))
        self._reported = floor  # admission floor (v, idx), ratcheted
        self._nparts: dict[int, int] = {}  # version → partition count
        # schema + column mapping pinned at query start (see module
        # docstring); physical names are rename-stable, so this one
        # mapping reads every file the stream will ever feed
        v = vstore.latest_version(root)
        if v is None:
            raise ValueError(f"no committed version under {root}")
        man = vstore.read_manifest(root, v)
        self._schema_json = man.get("schema")
        if self._schema_json is None:
            raise ValueError(
                f"{root} predates recorded schemas — the change-feed "
                f"source needs a pinned schema to stream under")
        self._colmap = man.get("colmap") or {}

    @staticmethod
    def _off(d: dict) -> tuple[int, int]:
        """Offset dict → (version, idx); legacy offsets lack idx."""
        return int(d["version"]), int(d.get("idx", 0))

    @staticmethod
    def _dict(off: tuple[int, int]) -> dict:
        """(v, 0) serializes WITHOUT idx (legacy-equal)."""
        v, k = off
        return {"version": v, "idx": k} if k else {"version": v}

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def _nparts_of(self, v: int) -> int:
        if v not in self._nparts:
            self._nparts[v] = len(_classify_version(self._root, v))
        return self._nparts[v]

    def latestOffset(self) -> dict:
        from ..sources import versioned_store as vstore

        try:
            v = vstore.latest_version(self._root)
        except vstore.InDoubtTransactionError:
            # 2PC blocking window: hold the stream at the last visible
            # version until the transaction decides — never feed (or
            # skip past) a prepare that may still commit
            return {"version": self._last_visible}
        if v is not None and v > self._last_visible:
            self._last_visible = v
        if self._max_versions is None and self._max_files is None:
            return {"version": self._last_visible}
        # ADMISSION CONTROL (Delta's maxFilesPerTrigger shape): a
        # follower against a deep backlog catches up in bounded
        # micro-batches instead of one giant batch whose state/shuffle
        # must hold the whole backlog at once. Each call RATCHETS the
        # persisted floor forward by at most one cap (never past the
        # visible latest): batches then span (checkpoint offset,
        # floor], so a crash that lost the in-memory floor costs at
        # most one idle poll before the ratchet re-exceeds the
        # checkpoint and the next batch fires — never a stall, never
        # skipped data (completeness is Spark's offset log, the cursor
        # only sizes batches).
        if self._max_versions is not None:
            target = (min(self._last_visible,
                          self._reported[0] + self._max_versions), 0)
        else:
            # FILE-granular: walk pending versions spending the budget
            # on their change-partition counts (driver-side metadata;
            # counts cached — manifests are immutable); a cap landing
            # INSIDE a commit yields a partial (v, idx) offset, so a
            # 10k-file backfill drains as many bounded batches
            fv, fk = self._reported
            budget = self._max_files
            while budget > 0 and fv < self._last_visible:
                rem = self._nparts_of(fv + 1) - fk
                if rem <= budget:
                    budget -= rem
                    fv, fk = fv + 1, 0
                else:
                    fk += budget
                    budget = 0
            target = (fv, fk)
        if target > self._reported:
            self._reported = target
            self._persist_floor()
        return self._dict(self._reported)

    def _persist_floor(self) -> None:
        if not self._cursor_path:
            return
        tmp = f"{self._cursor_path}.tmp-{os.getpid()}"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(f"{self._reported[0]}:{self._reported[1]}")
        os.replace(tmp, self._cursor_path)

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        (v1, k1), (v2, k2) = self._off(start), self._off(end)
        if (v2, k2) > self._reported:  # ground truth during a replay
            self._reported = (v2, k2)
            self._persist_floor()
        parts: list[InputPartition] = []
        if (v1, k1) >= (v2, k2):
            return parts
        if v1 == v2:  # both ends inside version v1+1
            return _classify_version(self._root, v1 + 1)[k1:k2]
        lo = v1
        if k1:  # finish the partially-consumed version first
            parts += _classify_version(self._root, v1 + 1)[k1:]
            lo = v1 + 1
        parts += _plan_changes(self._root, lo, v2)
        if k2:  # head of the next version up to the cap
            parts += _classify_version(self._root, v2 + 1)[:k2]
        return parts

    def read(self, partition: _ChangePartition) -> Iterator:
        """EXECUTOR-side: one changed file → Arrow record batches
        under the stream's pinned schema (shared core:
        :func:`_read_change_partition`)."""
        yield from _read_change_partition(
            self._root, self._colmap, self._schema_json, partition)

    def commit(self, end: dict) -> None:
        # Spark's checkpoint offset log is the durable cursor for DATA;
        # the admission floor just tracks it
        if self._off(end) > self._reported:
            self._reported = self._off(end)
            self._persist_floor()


class StoreCDFBatchReader(DataSourceReader):
    """BATCH range read of the change feed — Delta's
    ``spark.read.format("delta").option("readChangeFeed", ...)`` /
    ``table_changes(…, start, end)`` shape: all changes in
    ``(startingVersion, endingVersion]`` as one DataFrame, same typed
    column contract and per-changed-file executor fan-out as the
    streaming source, no checkpoint machinery. Planning is the SAME
    driver-side manifest walk the stream performs per micro-batch;
    the schema (and column mapping) pins at ``endingVersion`` so a
    range ending before a schema evolution reads under the schema of
    its own era."""

    def __init__(self, root: str, lo: int, hi: int):
        self._root = root
        self._lo = lo
        self._hi = hi
        man = _visible_manifest_at(root, hi)
        if man is None or man.get("schema") is None:
            raise ValueError(
                f"{root} has no visible schema-bearing manifest at or "
                f"below version {hi}")
        self._schema_json = man["schema"]
        self._colmap = man.get("colmap") or {}

    def partitions(self) -> Sequence[InputPartition]:
        return _plan_changes(self._root, self._lo, self._hi)

    def read(self, partition: _ChangePartition | None) -> Iterator:
        if partition is None:
            return  # empty range: one no-op task, schema preserved
        yield from _read_change_partition(
            self._root, self._colmap, self._schema_json, partition)


class StoreChangeFeedDataSource(DataSource):
    """``spark.readStream.format("store_cdf").option("path", root)``
    (streaming), or ``spark.read.format("store_cdf")`` (batch range).

    Options:
      - ``path`` (required): the versioned-store root;
      - ``startingVersion`` (default 0): feed changes AFTER this
        version (exclusive) — 0 bootstraps from the first commit;
      - ``maxVersionsPerBatch`` (default unbounded): admission
        control — cap each micro-batch at this many store versions so
        a deep backlog drains in bounded batches; requires
        ``cursorPath``;
      - ``maxFilesPerBatch`` (default unbounded; alternative to
        maxVersionsPerBatch): FILE-granular admission — Delta's
        maxFilesPerTrigger: caps each micro-batch at this many
        changed-file partitions, splitting INSIDE a commit when
        needed (a 10k-file backfill append drains as bounded batches
        instead of one giant one); requires ``cursorPath``;
      - ``cursorPath``: a small file this source owns (one per query,
        conventionally next to the checkpoint) holding the admission
        floor across restarts — ADVISORY only, exactly-once stays with
        Spark's offset log;
      - ``endingVersion`` (BATCH reads only; default latest visible):
        the inclusive upper bound of the change range — with
        ``startingVersion`` (exclusive) this is Delta's
        ``table_changes(start, end)``.

    The source schema is the store's logical schema at the range end
    (CURRENT for streams) plus ``_change_type`` (string) and
    ``_commit_version`` (long) — the Delta ``readChangeFeed`` column
    contract."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from ..sources import versioned_store as vstore

        root = self.options.get("path")
        if not root:
            raise ValueError("store_cdf requires option 'path' "
                             "(the versioned-store root)")
        if self.options.get("endingVersion") is not None:
            # batch range read: pin the schema of the range's END era
            man = _visible_manifest_at(
                root, int(self.options["endingVersion"]))
            schema_json = man.get("schema") if man else None
        else:
            v = vstore.latest_version(root)
            if v is None:
                raise ValueError(f"no committed version under {root}")
            schema_json = vstore.read_manifest(root, v).get("schema")
        if schema_json is None:
            raise ValueError(
                f"{root} predates recorded schemas — the change-feed "
                f"source needs a pinned schema to stream under")
        out = StructType.fromJson(schema_json)
        out = out.add(CHANGE_TYPE_COL, StringType(), False)
        return out.add(COMMIT_VERSION_COL, LongType(), False)

    def streamReader(self, schema: StructType) -> StoreCDFStreamReader:
        mv = self.options.get("maxVersionsPerBatch")
        mf = self.options.get("maxFilesPerBatch")
        return StoreCDFStreamReader(
            self.options["path"],
            int(self.options.get("startingVersion", 0)),
            max_versions_per_batch=int(mv) if mv is not None else None,
            cursor_path=self.options.get("cursorPath"),
            max_files_per_batch=int(mf) if mf is not None else None)

    def _ending_version(self, root: str) -> int:
        from ..sources import versioned_store as vstore

        ev = self.options.get("endingVersion")
        if ev is not None:
            return int(ev)
        v = vstore.latest_version(root)  # 2PC invisibility applies
        if v is None:
            raise ValueError(f"no committed version under {root}")
        return v

    def reader(self, schema: StructType) -> StoreCDFBatchReader:
        root = self.options.get("path")
        if not root:
            raise ValueError("store_cdf requires option 'path' "
                             "(the versioned-store root)")
        return StoreCDFBatchReader(
            root, int(self.options.get("startingVersion", 0)),
            self._ending_version(root))


def register(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(StoreChangeFeedDataSource)


def read_change_feed_stream(spark, root: str, starting_version: int = 0,
                            max_versions_per_batch: int | None = None,
                            cursor_path: str | None = None,
                            max_files_per_batch: int | None = None):
    """``readStream`` over the store's change feed (registers the
    source on first use)."""
    register(spark)
    reader = (spark.readStream.format(FORMAT_NAME)
              .option("path", root)
              .option("startingVersion", starting_version))
    if max_versions_per_batch is not None:
        reader = reader.option("maxVersionsPerBatch",
                               max_versions_per_batch)
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerBatch",
                               max_files_per_batch)
    if cursor_path is not None:
        reader = reader.option("cursorPath", cursor_path)
    return reader.load()


def read_change_feed(spark, root: str, starting_version: int = 0,
                     ending_version: int | None = None):
    """BATCH ``table_changes``: every change in
    ``(starting_version, ending_version]`` as one DataFrame
    (registers the source on first use)."""
    register(spark)
    reader = (spark.read.format(FORMAT_NAME)
              .option("path", root)
              .option("startingVersion", starting_version))
    if ending_version is not None:
        reader = reader.option("endingVersion", ending_version)
    return reader.load()
