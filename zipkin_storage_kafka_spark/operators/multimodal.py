"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

Design (training-data-pipeline extension; BASELINE.json north star): media
travels as ``binary`` payloads + a typed metadata struct; decode/
feature-extract/resize/frame-sample run as ``mapInPandas`` stages — the
Spark-side contracts (schema, batch shape, partition preservation) are real
and tested.  The codec itself is STUBBED: image/audio libraries are not in
this container, so ``decode_payload`` uses a deterministic fake decoder
(md5-seeded pseudo-pixels) unless a real decoder is injected.  Swapping in
PIL/torchaudio later changes one function, not the pipeline.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size;
payload bytes never pass through the driver; a ``repartition(n)`` before
the decode stage sets decode parallelism independent of file layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture from the documents table: the utf-8 text
    bytes become the payload; metadata derives from n_chars.  Gives tests a
    real binary column without external files."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
            F.lit("fake/deterministic").alias("format"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    Real deployments replace this with PIL/libav decoding; the container
    has no media libraries, so features are md5-derived pseudo-pixels in
    [0, 1): feature i = int(md5(payload + b"#i")[:8 hex], 16) / 2**32.
    Deterministic in the payload bytes (same input -> same features on
    every executor) and — deliberately — pure md5-hex arithmetic so the
    DuckDB oracle reproduces values bit-for-bit (ints < 2**32 divided by
    2**32 are exact doubles; no float32 or RNG in the path).
    """
    return np.array(
        [
            int(hashlib.md5(payload + b"#%d" % i).hexdigest()[:8], 16) / 2**32
            for i in range(dim)
        ],
        dtype=np.float64,
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    The pandas iterator contract is the real production shape: per-batch
    vectorized decode, constant memory, schema pinned to FEATURES_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                    "decoded_width": pdf["meta"].map(
                        lambda m: m["width"] if m is not None else None
                    ),
                    "decoded_height": pdf["meta"].map(
                        lambda m: m["height"] if m is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: passes payloads through the stub resizer (identity on
    bytes, metadata rewritten).  A real resizer swaps the inner lambda."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = out["meta"].map(
                lambda m: {
                    "width": width,
                    "height": height,
                    "sample_rate": m["sample_rate"],
                    "n_frames": m["n_frames"],
                    "format": m["format"],
                }
            )
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: 1 row per sampled frame.  The
    stub 'frame' is a deterministic byte slice; a real implementation
    decodes container frames.  Output explodes rows — the schema and
    per-batch fan-out shape are the production contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n = row["meta"]["n_frames"] or 0
                payload = row["payload"]
                for fi in range(0, n, every_n):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    start = (fi * 7) % max(1, len(payload))
                    payloads.append(payload[start : start + 8])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_payload": pd.Series(payloads, dtype=object),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)
