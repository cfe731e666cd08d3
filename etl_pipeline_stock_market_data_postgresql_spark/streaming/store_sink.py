"""Structured Streaming SINK for the versioned store — the write half
of the data-source pair (``streaming/cdf_source.py`` is the read
half): ``df.writeStream.format("versioned_store").option("path",
root)`` lands every micro-batch as ONE atomic, exactly-once store
commit, through the standard sink API instead of a hand-rolled
``foreachBatch`` closure.

Execution shape (the two-phase pattern every real table sink uses —
Delta's transaction log commit, Iceberg's append commit):

1. EXECUTORS (``write``): each partition's rows stream into one
   parquet file written DIRECTLY into the store's data directory under
   a unique, driver-pid-tagged name — staged bytes, invisible until a
   manifest references them (the store's core invariant). The task
   returns a tiny commit message (file name + row count); rows never
   visit the driver.
2. DRIVER (``commit``): the collected file names publish as ONE
   manifest CAS commit, txn-keyed ``(txnAppId | queryId, batchId)`` —
   Delta's txnAppId/txnVersion: foreachBatch-style replays (restart
   from checkpoint, speculative re-runs) find the batch id already in
   the per-app ledger and no-op. ``abort`` (any task failed) deletes
   the staged files; a driver crash between write and commit leaves
   orphans whose embedded pid is dead — exactly what vacuum's
   dead-writer rule reclaims.

Scale shape: one file per non-empty partition per batch (use
``spark.sql.shuffle.partitions`` / coalesce upstream to size them);
commit metadata is O(files + #segments); small-file growth is repaid
by the store's OPTIMIZE/compaction like any streaming table. Schema
is ENFORCED against the store on every commit (evolution via the
``allowEvolution`` option); row-tracked stores assign fresh row-id
bases exactly like a batch append. Column-mapped stores are not yet
writable through the sink (physical-name translation) — they raise.

Reference parity: replaces the reference's executemany-into-PostgreSQL
loop (main_parallel.py:142-161) with an exactly-once streaming table
sink.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (DataSource, DataSourceStreamWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import Row, StructType

SINK_FORMAT_NAME = "versioned_store"

#: executor-side arrow row-group size for staged files
_WRITE_CHUNK_ROWS = 1 << 16


class _StagedFile(WriterCommitMessage):
    """One task's commit message; ``file is None`` marks an EMPTY
    partition (the runtime requires a WriterCommitMessage object from
    every task — despite its docstring, returning None raises
    DATA_SOURCE_TYPE_MISMATCH — so empties send a sentinel the driver
    filters out)."""

    def __init__(self, file: str | None, n_rows: int):
        self.file = file
        self.n_rows = n_rows


class StoreStreamWriter(DataSourceStreamWriter):
    def __init__(self, root: str, schema: StructType, stats_cols,
                 bloom_cols, app_id: str | None, allow_evolution: bool):
        self._root = root
        self._schema_json = schema.json()
        self._stats_cols = tuple(stats_cols)
        self._bloom_cols = tuple(bloom_cols)
        self._app_id = app_id
        self._allow_evolution = allow_evolution
        # the DRIVER's pid goes into staged file names: vacuum's
        # dead-writer rule then protects in-flight staging for exactly
        # as long as this query's driver lives (executor python workers
        # are transient — their pids would look dead immediately)
        self._driver_pid = os.getpid()

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        """EXECUTOR-side: stream this partition's rows into one staged
        parquet file in the store's data dir (Arrow-batched, bounded
        memory); empty partitions stage nothing."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = StructType.fromJson(__import__("json")
                                     .loads(self._schema_json))
        target = to_arrow_schema(schema)
        names = [f.name for f in target]
        name = (f"sink-p{self._driver_pid}-"
                f"{uuid.uuid4().hex[:16]}.parquet")
        path = os.path.join(self._root, "data", name)
        writer = None
        n = 0
        buf: list = []
        try:
            for row in iterator:
                buf.append(tuple(row[c] for c in names))
                if len(buf) >= _WRITE_CHUNK_ROWS:
                    batch = pa.record_batch(
                        [pa.array([r[i] for r in buf], type=f.type)
                         for i, f in enumerate(target)], schema=target)
                    if writer is None:
                        writer = pq.ParquetWriter(path, target)
                    writer.write_batch(batch)
                    n += len(buf)
                    buf = []
            if buf:
                batch = pa.record_batch(
                    [pa.array([r[i] for r in buf], type=f.type)
                     for i, f in enumerate(target)], schema=target)
                if writer is None:
                    writer = pq.ParquetWriter(path, target)
                writer.write_batch(batch)
                n += len(buf)
        finally:
            if writer is not None:
                writer.close()
        if n == 0:
            return _StagedFile(None, 0)  # empty partition: sentinel
        return _StagedFile(name, n)

    def commit(self, messages: List[Optional[WriterCommitMessage]],
               batchId: int) -> None:
        """DRIVER-side: publish the staged files as one txn-keyed
        manifest commit — the batch's atomic visibility point."""
        from ..sources import versioned_store as vstore

        files = sorted(m.file for m in messages
                       if m is not None and m.file is not None)
        app = self._app_id or "stream-sink"
        if not files:
            # an empty batch still records its txn so a replay of it
            # stays a no-op and the ledger stays monotone
            vstore.commit_staged_files(
                self._root, [], stats_cols=self._stats_cols,
                bloom_cols=self._bloom_cols, txn=(app, batchId),
                schema_json=self._schema_json,
                allow_evolution=self._allow_evolution)
            return
        vstore.commit_staged_files(
            self._root, files, stats_cols=self._stats_cols,
            bloom_cols=self._bloom_cols, txn=(app, batchId),
            schema_json=self._schema_json,
            allow_evolution=self._allow_evolution)

    def abort(self, messages: List[Optional[WriterCommitMessage]],
              batchId: int) -> None:
        """A task failed: best-effort delete of the staged files (a
        crash that skips this leaves dead-pid orphans for vacuum)."""
        for m in messages:
            if m is None or m.file is None:
                continue
            try:
                os.remove(os.path.join(self._root, "data", m.file))
            except OSError:
                pass


class VersionedStoreSink(DataSource):
    """``df.writeStream.format("versioned_store")``.

    Options:
      - ``path`` (required): the store root;
      - ``txnAppId`` (default "stream-sink"): the per-app ledger key —
        one entry per writer however many batches commit;
      - ``statsCols`` / ``bloomCols`` (comma-separated): manifest
        min/max stats and bloom sidecars for the staged files;
      - ``allowEvolution`` ("true"/"false"): schema evolution opt-in.
    """

    @classmethod
    def name(cls) -> str:
        return SINK_FORMAT_NAME

    def streamWriter(self, schema: StructType, overwrite: bool
                     ) -> StoreStreamWriter:
        root = self.options.get("path")
        if not root:
            raise ValueError("versioned_store sink requires option "
                             "'path' (the store root)")
        if overwrite:
            raise ValueError("versioned_store sink is append-only per "
                             "batch (complete/update output modes are "
                             "not supported; maintain aggregates via "
                             "foreachBatch + commit_rewrite)")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        split = (lambda v: tuple(x for x in (v or "").split(",") if x))
        return StoreStreamWriter(
            root, schema,
            stats_cols=split(self.options.get("statsCols")),
            bloom_cols=split(self.options.get("bloomCols")),
            app_id=self.options.get("txnAppId"),
            allow_evolution=str(self.options.get(
                "allowEvolution", "false")).lower() == "true")


def register(spark) -> None:
    spark.dataSource.register(VersionedStoreSink)


def write_stream_to_store(df, root: str, checkpoint: str,
                          app_id: str = "stream-sink",
                          stats_cols: tuple = (),
                          allow_evolution: bool = False):
    """Convenience: an availableNow-ready writeStream builder for the
    store sink (registers the format on first use)."""
    register(df.sparkSession)
    w = (df.writeStream.format(SINK_FORMAT_NAME)
         .option("path", root)
         .option("txnAppId", app_id)
         .option("checkpointLocation", checkpoint))
    if stats_cols:
        w = w.option("statsCols", ",".join(stats_cols))
    if allow_evolution:
        w = w.option("allowEvolution", "true")
    return w
