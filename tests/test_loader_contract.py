"""Loader contract: every time column `load()` returns must be a true
TIMESTAMP, whatever parquet encoding the driver ships.

The round-4 testdata regeneration silently switched the time columns
from INT64 TIMESTAMP(NANOS) to `timestamp[us], isAdjustedToUTC=false`
(read as TIMESTAMP_NTZ when inference is on), which broke
unix_micros/withWatermark in three queries. This test makes any future
encoding change fail ONE cheap assertion with a pointed message instead
of several opaque operator errors.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_stock_market_data_postgresql_spark.sources.tables import (
    _NANO_TS_COLS, load)

_SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
@pytest.mark.parametrize("table,cols", sorted(_NANO_TS_COLS.items()))
def test_time_columns_load_as_timestamp(spark, sf, table, cols):
    dtypes = dict(load(spark, sf, table).dtypes)
    for c in cols:
        assert dtypes.get(c) == "timestamp", (
            f"{table}.{c} loaded as {dtypes.get(c)!r}, not 'timestamp' — "
            f"the driver's parquet encoding for {sf} changed; extend the "
            f"normalization branches in sources/tables.load()"
        )


def test_ntz_parquet_is_normalized(spark, tmp_path):
    """Deliberately write an NTZ-encoded parquet 'events' fixture and
    prove load() still returns TIMESTAMP (the r4 failure mode)."""
    tbl = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        # timestamp without tz metadata => isAdjustedToUTC=false => NTZ
        "ts": pa.array([1_700_000_000_000_000, 1_700_000_060_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([10, 11], pa.int64()),
    })
    path = tmp_path / "events.parquet"
    pq.write_table(tbl, path)
    df = load(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    # unix_micros (the op that broke in r4) must resolve
    from pyspark.sql import functions as F
    vals = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("ts").collect()]
    assert vals == [1_700_000_000_000_000, 1_700_000_060_000_000]


def test_nanos_parquet_is_normalized(spark, tmp_path):
    """The pre-r4 encoding (INT64 TIMESTAMP(NANOS) via nanosAsLong →
    bigint) must also still normalize — the loader tolerates all known
    driver encodings simultaneously."""
    tbl = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
        "user_id": pa.array([10], pa.int64()),
    })
    path = tmp_path / "events.parquet"
    pq.write_table(tbl, path)
    df = load(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
