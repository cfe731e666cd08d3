"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
standard large-scale representation (the bytes travel with the row;
decode happens executor-side, batched). This container has no media
libraries, so the decode/feature kernels are STUBS with real Spark
plumbing: correct schemas, Arrow-batched ``mapInPandas`` signatures,
and partition-aware batch shapes — swap the stub body for PIL/ffmpeg
calls on a real cluster and nothing else changes.

Scale design:
- metadata extraction (size, digest, magic-byte sniff) is pure JVM
  column expressions — no Python, runs at scan speed;
- decode/feature extraction is ``mapInPandas`` (one Arrow batch at a
  time, bounded memory) — never ``collect``, never row-at-a-time UDFs;
- batches stay on the partition that read them: no shuffle is
  introduced by decoding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# magic-byte prefixes for cheap JVM-side format sniffing
_MAGIC = {
    "png": bytes([0x89, 0x50, 0x4E, 0x47]).hex(),
    "jpeg": bytes([0xFF, 0xD8, 0xFF]).hex(),
    "gif": b"GIF8".hex(),
    "riff": b"RIFF".hex(),  # wav/avi containers
}

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Deterministic fake media payload from a text column (UTF-8 bytes)
    — stands in for real image/audio bytes so the binary-column plumbing
    is exercised end to end."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata columns over an opaque binary payload — pure JVM
    expressions (octet length, content digest, magic-byte format sniff)."""
    prefix = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    fmt = F.lit("unknown")
    for name, magic in _MAGIC.items():
        fmt = F.when(prefix.startswith(magic.lower()), name).otherwise(fmt)
    return (df
            .withColumn("payload_bytes", F.octet_length(F.col(bin_col)).cast("long"))
            .withColumn("payload_sha256", F.sha2(F.col(bin_col), 256))
            .withColumn("payload_format", fmt))


def decode_image_stub(df: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "payload") -> DataFrame:
    """Image decode via mapInPandas. STUB: derives deterministic fake
    dimensions from the byte length instead of a real decoder; the
    Spark-side contract (schema, Arrow batching, partition locality) is
    production-shaped."""
    src = df.select(id_col, bin_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[bin_col].map(len)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                # real impl: PIL.Image.open(io.BytesIO(b)).size
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
            })

    return src.mapInPandas(decode, DECODED_SCHEMA)


DECODED_HIST_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("min_doc_id", T.LongType()),
])


def decode_image_histogram_stub(df: DataFrame, id_col: str = "doc_id",
                                bin_col: str = "payload") -> DataFrame:
    """Decode + dimension histogram with the combine pushed INTO the
    Arrow kernel: each batch decodes (same stub as decode_image_stub)
    and returns one partial row per distinct (width, height, channels)
    instead of one row per document — map-side combine at the Python
    boundary. Arrow return traffic and the downstream shuffle shrink
    from |docs| rows to |distinct dims| per batch; the input transfer
    (the payloads being decoded) is the irreducible cost."""
    src = df.select(id_col, bin_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[bin_col].map(len)
            dims = pd.DataFrame({
                # real impl: PIL.Image.open(io.BytesIO(b)).size
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                "doc_id": pdf[id_col].astype("int64"),
            })
            g = (dims.groupby(["width", "height", "n_channels"],
                              as_index=False)
                 .agg(n_docs=("doc_id", "count"),
                      min_doc_id=("doc_id", "min")))
            g["n_docs"] = g["n_docs"].astype("int64")
            yield g[["width", "height", "n_channels", "n_docs", "min_doc_id"]]

    return src.mapInPandas(decode, DECODED_HIST_SCHEMA)


def extract_features_stub(df: DataFrame, id_col: str = "doc_id",
                          bin_col: str = "payload") -> DataFrame:
    """Feature extraction via mapInPandas. STUB: deterministic
    byte-histogram-derived vector instead of a CNN embedding."""
    src = df.select(id_col, bin_col)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float((sum(b[i::FEATURE_DIM]) % 256) / 255.0)
                 for i in range(FEATURE_DIM)] if len(b) else [0.0] * FEATURE_DIM
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return src.mapInPandas(featurize, FEATURES_SCHEMA)


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      bin_col: str = "payload", every_n: int = 64) -> DataFrame:
    """Video frame sampling via mapInPandas (1→many rows). STUB: slices
    the payload at fixed strides in place of container demuxing. The
    fan-out is vectorized (numpy repeat/arange over the whole Arrow
    batch, byte slices from one concatenated buffer) so the shape
    carries no per-row Python loop — if real codecs land, only the
    per-frame decode call changes, not the batch plumbing."""
    import numpy as np

    src = df.select(id_col, bin_col)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf[bin_col].map(len).to_numpy(dtype="int64")
            counts = -(-lens // every_n)  # ceil: frames per payload
            ids = np.repeat(pdf[id_col].to_numpy(dtype="int64"), counts)
            # frame_idx = 0..counts[i)-1 within each payload, built as
            # one global arange minus each payload's start offset
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            idxs = np.arange(counts.sum(), dtype="int64") - \
                np.repeat(starts, counts)
            buf = b"".join(pdf[bin_col])
            # global byte offsets of each frame inside the joined buffer
            byte_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            offs = np.repeat(byte_starts, counts) + idxs * every_n
            ends = np.minimum(offs + every_n,
                              np.repeat(byte_starts + lens, counts))
            frames = [buf[o:e] for o, e in zip(offs.tolist(), ends.tolist())]
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_idx": pd.array(idxs.astype("int32"), dtype="int32"),
                "frame_bytes": frames})

    return src.mapInPandas(sample, FRAMES_SCHEMA)


def decode_image_real(*_args, **_kwargs):
    """Real decoder entry point — requires PIL/ffmpeg, absent here."""
    raise NotImplementedError(
        "media libraries are not available in this environment; "
        "use decode_image_stub for plumbing tests")
