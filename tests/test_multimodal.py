"""Binary-column plumbing: schemas, Arrow batch shapes, and determinism
of the stubbed decode/feature/frame-sample operators."""

from __future__ import annotations

from etl_pipeline_stock_market_data_postgresql_spark import multimodal as mm


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 200), (3, "")],
        "doc_id long, text string")


def test_metadata_jvm_side(spark):
    df = mm.binary_metadata(mm.attach_binary_payload(_docs(spark)))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["payload_bytes"] == 11
    assert rows[2]["payload_bytes"] == 200
    assert len(rows[1]["payload_sha256"]) == 64
    assert rows[1]["payload_format"] == "unknown"


def test_decode_stub_schema_and_determinism(spark):
    df = mm.decode_image_stub(mm.attach_binary_payload(_docs(spark)))
    assert df.schema == mm.binary_columns.DECODED_SCHEMA
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b
    assert all(r[1] >= 1 and r[2] >= 1 for r in a)  # width/height positive


def test_decode_histogram_partials_match_per_doc_decode(spark):
    # the in-kernel combine must be a pure refactor of per-doc decode +
    # groupBy: same histogram, regardless of how rows split into batches
    payload = mm.attach_binary_payload(_docs(spark))
    per_doc = mm.decode_image_stub(payload)
    expected = {(r["width"], r["height"], r["n_channels"]): r
                for r in per_doc.groupBy("width", "height", "n_channels")
                .count().collect()}
    partial = mm.binary_columns.decode_image_histogram_stub(payload)
    assert partial.schema == mm.binary_columns.DECODED_HIST_SCHEMA
    got = (partial.groupBy("width", "height", "n_channels")
           .sum("n_docs").collect())
    assert {(r[0], r[1], r[2]): r[3] for r in got} == {
        k: v["count"] for k, v in expected.items()}


def test_features_stub(spark):
    df = mm.extract_features_stub(mm.attach_binary_payload(_docs(spark)))
    rows = {r["doc_id"]: r["features"] for r in df.collect()}
    assert len(rows[1]) == mm.binary_columns.FEATURE_DIM
    assert rows[3] == [0.0] * mm.binary_columns.FEATURE_DIM  # empty payload
    assert all(0.0 <= x <= 1.0 for x in rows[2])


def test_frame_sample_stub(spark):
    df = mm.frame_sample_stub(
        mm.attach_binary_payload(_docs(spark)), every_n=64)
    rows = [r for r in df.collect() if r["doc_id"] == 2]
    assert len(rows) == 4  # 200 bytes / 64 stride -> 4 frames
    assert sum(len(r["frame_bytes"]) for r in rows) == 200


def test_real_decoder_is_explicitly_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_image_real()
