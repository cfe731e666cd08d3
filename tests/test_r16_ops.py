"""Round-16 operator tests: the two r15 ADVICE findings — (1) the
change-feed source crashing (and permanently wedging the stream) on a
carried file whose deletion vector was REMOVED (restore to a
pre-MoR-delete version emitted a dv_diff delete partition with
dv_include=None); (2) commit_multi_append's txid charset validation
being skippable via a caller-supplied id whose embedded pid parses to
the caller's own pid ('x-p<pid>-../../evil' path traversal)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_stock_market_data_postgresql_spark.sources import (
    versioned_store as vstore)
from etl_pipeline_stock_market_data_postgresql_spark.streaming import (
    cdf_source)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("x")).coalesce(1)


def _stream_feed(spark, root, tmp_path, tag):
    out = str(tmp_path / f"feed-{tag}")
    q = (cdf_source.read_change_feed_stream(spark, root)
         .writeStream.trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / f"ck-{tag}"))
         .foreachBatch(lambda bdf, bid:
                       bdf.write.mode("append").parquet(out))
         .start())
    q.awaitTermination()
    return spark.read.parquet(out)


# --- (1) restore after MoR delete: removed DV must not crash the feed --------

def test_cdf_restore_after_mor_delete_feeds_rollback_inserts(
        spark, tmp_path):
    """The exact ADVICE repro: append → MoR delete → restore(1). The
    restore REMOVES the carried file's deletion vector (dv_t None,
    dv_f set); the feed must emit the unmarked positions as inserts —
    and no delete partition at all (newly-marked set is empty) —
    instead of crashing read() with os.path.join(root, 'data', None).
    Signed aggregation of the full feed must equal every snapshot."""
    root = str(tmp_path / "src")
    vstore.commit_append(spark, root, _ids(spark, 0, 10),
                         stats_cols=("id",))
    vstore.commit_delete_mor(spark, root, F.col("id") % 3 == 0)
    vstore.restore(spark, root, 1)
    feed = _stream_feed(spark, root, tmp_path, "restore-mor")
    sign = F.when(F.col("_change_type") == "insert",
                  F.lit(1)).otherwise(F.lit(-1))
    for v in range(1, vstore.latest_version(root) + 1):
        snap = vstore.read_version(spark, root, v)
        sa = snap.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("x").alias("xs")).first()
        fa = (feed.filter(F.col("_commit_version") <= v)
              .agg(F.sum(sign).alias("n"),
                   F.sum(sign * F.col("x")).alias("xs")).first())
        assert (fa["n"] or 0, fa["xs"] or 0) == (sa["n"], sa["xs"]), v
    # v3 (the restore) feeds exactly the rows the MoR delete had
    # marked, as inserts — 4 rows (ids 0,3,6,9), no deletes
    v3 = feed.filter(F.col("_commit_version") == 3)
    assert v3.filter(F.col("_change_type") == "delete").count() == 0
    assert sorted(r["id"] for r in v3.collect()) == [0, 3, 6, 9]


def test_cdf_classify_skips_delete_partition_when_dv_removed(
        spark, tmp_path):
    """Unit-level pin on _classify: carried file, dv_f set, dv_t None
    ⇒ exactly one dv_diff INSERT partition (dv_include=dv_f), no
    partition with dv_include=None anywhere."""
    root = str(tmp_path / "src")
    vstore.commit_append(spark, root, _ids(spark, 0, 10),
                         stats_cols=("id",))
    vstore.commit_delete_mor(spark, root, F.col("id") < 2)
    vstore.restore(spark, root, 1)
    reader = cdf_source.StoreCDFStreamReader(root, 0)
    parts = reader.partitions({"version": 2}, {"version": 3})
    assert [p.kind for p in parts] == ["insert"]
    assert parts[0].mode == "dv_diff"
    assert parts[0].dv_include is not None
    assert parts[0].dv_exclude is None
    # and read() on it works (this is what crashed pre-fix)
    import pyarrow as pa

    rows = sum(b.num_rows for b in reader.read(parts[0]))
    assert rows == 2


def test_cdf_model_walk_seed_with_restore_after_mor(spark, tmp_path):
    """Model-walk seed chosen to exercise restore-over-MoR-vector
    rollback (the case seeds 7/23 miss): a deterministic verb chain
    containing mor_delete → ... → restore to a pre-vector version,
    then the signed feed must equal every snapshot prefix."""
    root = str(tmp_path / "walk")
    nxt = [1000]

    def fresh(n):
        lo = nxt[0]
        nxt[0] += n
        return spark.range(lo, lo + n).select(
            F.col("id"), (F.col("id") * 10).alias("x")).coalesce(1)

    vstore.commit_append(spark, root, fresh(40), stats_cols=("id",))
    vstore.commit_delete_mor(spark, root, F.col("id") % 4 == 0)
    vstore.commit_append(spark, root, fresh(15), stats_cols=("id",))
    vstore.commit_delete_mor(spark, root, F.col("id") % 4 == 1)
    vstore.restore(spark, root, 1)          # rolls BOTH vectors back
    vstore.commit_update_mor(spark, root, F.col("id") % 5 == 2,
                             {"x": F.col("x") - 1}, stats_cols=("id",))
    vstore.restore(spark, root, 4)          # re-applies one vector
    feed = _stream_feed(spark, root, tmp_path, "walk")
    sign = F.when(F.col("_change_type") == "insert",
                  F.lit(1)).otherwise(F.lit(-1))
    for v in range(1, vstore.latest_version(root) + 1):
        try:
            snap = vstore.read_version(spark, root, v)
        except vstore.AbortedTransactionError:
            continue
        sa = snap.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("x").alias("xs")).first()
        fa = (feed.filter(F.col("_commit_version") <= v)
              .agg(F.sum(sign).alias("n"),
                   F.sum(sign * F.col("x")).alias("xs")).first())
        assert (fa["n"] or 0, fa["xs"] or 0) == \
            (sa["n"], sa["xs"] or 0), v


# --- (2) txid charset enforced even for own-pid-format ids --------------------

def test_multi_append_rejects_own_pid_traversal_txid(spark, tmp_path):
    """'x-p<pid>-../../evil' parses its embedded pid to os.getpid(),
    which pre-fix skipped the charset check and opened
    txlog/<txid>.intent verbatim — path traversal. Must raise, and
    must write NOTHING outside the txlog."""
    s1 = str(tmp_path / "s1")
    txlog = str(tmp_path / "inner" / "txlog")
    evil = f"x-p{os.getpid()}-../../evil"
    with pytest.raises(ValueError):
        vstore.commit_multi_append(
            spark, [(s1, _ids(spark, 0, 5), {})], txlog, txid=evil)
    assert not os.path.exists(str(tmp_path / "evil.intent"))
    assert not any((tmp_path / "inner").rglob("*evil*")) \
        if (tmp_path / "inner").exists() else True


def test_multi_append_rejects_malformed_own_pid_txid(spark, tmp_path):
    """A txid whose pid segment parses to ours but that is not in the
    canonical tx-p<pid>-<suffix> shape (wrong prefix) must be
    rejected, not passed through."""
    s1 = str(tmp_path / "s1")
    txlog = str(tmp_path / "txlog")
    with pytest.raises(ValueError):
        vstore.commit_multi_append(
            spark, [(s1, _ids(spark, 0, 5), {})], txlog,
            txid=f"weird-p{os.getpid()}-ok")


def test_multi_append_canonical_own_pid_txid_still_passes(
        spark, tmp_path):
    """The format the function itself generates still passes through
    unchanged after the unconditional charset check."""
    s1 = str(tmp_path / "s1")
    txlog = str(tmp_path / "txlog")
    txid = f"tx-p{os.getpid()}-r16check"
    vstore.commit_multi_append(
        spark, [(s1, _ids(spark, 0, 5), {})], txlog, txid=txid)
    assert os.path.exists(os.path.join(txlog, f"{txid}.decision"))
    assert vstore.read_version(
        spark, s1, vstore.latest_version(s1)).count() == 5
