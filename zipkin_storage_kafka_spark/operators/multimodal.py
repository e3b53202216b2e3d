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
import struct
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


# ---------------------------------------------------------------------------
# Real image codec: 24-bit uncompressed BMP in pure numpy/struct.
#
# The generic decode_payload above is an honestly-documented stub because
# the container has no media libraries — but BMP needs none: the format is
# a fixed header + raw BGR rows, so encode/decode/resize below are a REAL
# binary image codec (headers, bottom-up row order, 4-byte row padding,
# channel order all handled).  The pixel SYNTHESIS for fixtures is integer
# arithmetic ((doc_id*31 + y*7 + x*3 + c*11) % 256) so the DuckDB oracle
# reproduces decoded statistics closed-form — the t2 gate checks the whole
# encode->decode(->resize->encode->decode) pipeline value-for-value.
# ---------------------------------------------------------------------------

BMP_HEADER_BYTES = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def bmp_row_size(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded up to a 4-byte boundary."""
    return ((3 * width + 3) // 4) * 4


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    Real format details handled: little-endian headers, BGR channel order,
    bottom-up row storage, rows padded to 4 bytes.
    """
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row = bmp_row_size(w)
    img_size = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + img_size, 0, 0, BMP_HEADER_BYTES
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    buf = np.zeros((h, row), dtype=np.uint8)
    # vertical flip (BMP stores bottom row first) + RGB -> BGR
    buf[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    return header + info + buf.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Accepts any conforming producer's file (positive = bottom-up or
    negative = top-down height), not just :func:`encode_bmp` output.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row = bmp_row_size(w)
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=offset
    ).reshape(h, row)
    rgb = arr[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with floor index mapping
    (src = (dst * src_dim) // dst_dim) — the mapping is integer math so the
    oracle reproduces resized statistics exactly."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[np.ix_(ys, xs)]


def synth_pixels(doc_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic fixture pixels: (doc_id*31 + y*7 + x*3 + c*11) % 256.
    Pure integer arithmetic — DuckDB reproduces any decoded statistic."""
    y = np.arange(height, dtype=np.int64).reshape(-1, 1, 1)
    x = np.arange(width, dtype=np.int64).reshape(1, -1, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, -1)
    return ((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


BMP_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("px00_r", T.IntegerType()),
        T.StructField("r_mean", T.DoubleType()),
        T.StructField("g_mean", T.DoubleType()),
        T.StructField("b_mean", T.DoubleType()),
    ]
)


def _arrow_pipeline(base: DataFrame, schema, *stages) -> DataFrame:
    """ONE Arrow-batched mapInPandas applying pdf-level ``stages`` in
    order (r14 fusion, guide sect. 4): Spark pipelines CHAINED
    mapInPandas operators into a single stage that holds one Python
    worker PER OPERATOR per task (a 3-operator chain on 32 cores holds
    96 workers) and ships the intermediate payload bytes JVM<->Python
    between every pair.  Fusing at the pandas level keeps one worker
    per task and moves the heavy bytes across the boundary ZERO times —
    only the small base columns enter and the stat columns leave."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for stage in stages:
                pdf = stage(pdf)
            yield pdf

    return base.mapInPandas(run, schema)


def _bmp_base(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 24 + 8).cast("int").alias("width"),
        (F.col("n_chars") % 16 + 8).cast("int").alias("height"),
    )


def _bmp_render_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = [
        encode_bmp(synth_pixels(mid, w, h))
        for mid, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"])
    ]
    out = pdf.copy()
    out["payload"] = pd.Series(payloads, index=pdf.index, dtype=object)
    return out


def bmp_media_from_documents(docs: DataFrame) -> DataFrame:
    """Render a REAL BMP per document: w = n_chars%24+8, h = n_chars%16+8,
    pixels from :func:`synth_pixels`.  Arrow-batched; payloads never touch
    the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _bmp_render_pdf(pdf)

    return _bmp_base(docs).mapInPandas(run, BMP_MEDIA_SCHEMA)


def _bmp_stats_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {
        "media_id": [],
        "width": [],
        "height": [],
        "payload_bytes": [],
        "px00_r": [],
        "r_mean": [],
        "g_mean": [],
        "b_mean": [],
    }
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        img = decode_bmp(payload)
        h, w, _ = img.shape
        n = h * w
        sums = img.reshape(n, 3).sum(axis=0, dtype=np.int64)
        cols["media_id"].append(mid)
        cols["width"].append(w)
        cols["height"].append(h)
        cols["payload_bytes"].append(len(payload))
        cols["px00_r"].append(int(img[0, 0, 0]))
        cols["r_mean"].append(int(sums[0]) / n)
        cols["g_mean"].append(int(sums[1]) / n)
        cols["b_mean"].append(int(sums[2]) / n)
    return pd.DataFrame(cols)


def bmp_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every BMP payload and emit per-channel means + dims + the
    top-left red value (px00_r pins vertical orientation: a decoder that
    forgot the bottom-up flip reads row h-1 there and the oracle catches
    it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _bmp_stats_pdf(pdf)

    return media.mapInPandas(run, BMP_STATS_SCHEMA)


def _bmp_resize_pdf(pdf: pd.DataFrame, out_w: int, out_h: int) -> pd.DataFrame:
    out = pdf.copy()
    out["payload"] = pd.Series(
        [
            encode_bmp(resize_nearest(decode_bmp(p), out_w, out_h))
            for p in pdf["payload"]
        ],
        index=pdf.index,
        dtype=object,
    )
    out["width"] = np.int32(out_w)
    out["height"] = np.int32(out_h)
    return out


def bmp_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real resize: decode -> nearest-neighbor -> re-encode.  Unlike
    :func:`resize_images` (metadata-only stub for the generic media kinds),
    this path transforms the actual bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _bmp_resize_pdf(pdf, out_w, out_h)

    return media.mapInPandas(run, BMP_MEDIA_SCHEMA)


def bmp_stats_pipeline(
    docs: DataFrame, resize: tuple[int, int] | None = None
) -> DataFrame:
    """FUSED render [-> resize] -> decode-stats over real BMP bytes in
    ONE Arrow stage (r14): the same :func:`encode_bmp` /
    :func:`decode_bmp` / :func:`resize_nearest` kernels as the chained
    operators, composed at the pandas level, so payload bytes never
    cross the JVM boundary and each task holds one Python worker
    instead of two or three.  Value-identical to
    ``bmp_decode_stats(bmp_resize?(bmp_media_from_documents(docs)))``
    (test-pinned)."""
    stages = [_bmp_render_pdf]
    if resize is not None:
        ow, oh = resize
        stages.append(lambda pdf: _bmp_resize_pdf(pdf, ow, oh))
    stages.append(_bmp_stats_pdf)
    return _arrow_pipeline(_bmp_base(docs), BMP_STATS_SCHEMA, *stages)


# -- real audio codec: 16-bit PCM WAV (RIFF), pure numpy ----------------------
#
# The audio twin of the BMP path above: no media library needed for
# uncompressed PCM, so the "audio as opaque binary" plumbing gets a REAL
# encode -> decode -> transform -> re-encode pipeline whose every statistic
# the DuckDB oracle recomputes closed-form from the sample formula.

WAV_HEADER_BYTES = 44  # RIFF(12) + canonical fmt chunk(24) + data header(8)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n, ch) int16 array as a canonical PCM WAV: RIFF header,
    16-byte fmt chunk (format 1 = PCM), little-endian interleaved data."""
    n, ch = samples.shape
    assert samples.dtype == np.int16
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    riff = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16, 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16,
    )
    return riff + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to ((n, ch) int16 array, sample_rate).

    A real chunk walk, not an offset-44 assumption: foreign writers put
    LIST/INFO/fact chunks between fmt and data, and odd-sized chunks are
    word-padded — both handled, so any conforming producer's file decodes.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if sz > len(payload) - pos:
            # a declared size past the buffer is corruption/truncation —
            # refuse loudly instead of silently decoding fewer samples
            raise ValueError(
                f"truncated chunk {cid!r}: declares {sz} bytes, "
                f"{len(payload) - pos} remain"
            )
        body = payload[pos : pos + sz]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, sr, _rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt_body, 0
    )
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_fmt})")
    arr = np.frombuffer(data_body, dtype="<i2").reshape(-1, ch)
    return arr.astype(np.int16), sr


def resample_nearest(
    samples: np.ndarray, sr_in: int, sr_out: int
) -> np.ndarray:
    """Nearest-sample resample with floor index mapping
    (src = (dst * sr_in) // sr_out), out length = (n * sr_out) // sr_in —
    integer math only, so the oracle reproduces resampled statistics."""
    n = samples.shape[0]
    out_n = (n * sr_out) // sr_in
    idx = (np.arange(out_n) * sr_in) // sr_out
    return samples[idx]


def synth_samples(doc_id: int, n: int, ch: int) -> np.ndarray:
    """Deterministic fixture audio: ((doc_id*37 + i*13 + c*17) % 65536)
    - 32768 — full int16 range, pure integer arithmetic for the oracle."""
    i = np.arange(n, dtype=np.int64).reshape(-1, 1)
    c = np.arange(ch, dtype=np.int64).reshape(1, -1)
    return (((doc_id * 37 + i * 13 + c * 17) % 65536) - 32768).astype(
        np.int16
    )


WAV_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("s0", T.IntegerType()),
        T.StructField("mean0", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def _wav_base(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(8000) + (F.col("doc_id") % 3) * 4000)
        .cast("int")
        .alias("sample_rate"),
        (F.col("doc_id") % 2 + 1).cast("int").alias("channels"),
        (F.col("n_chars") % 50 + 20).cast("int").alias("n"),
    )


def _wav_render_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = [
        encode_wav(synth_samples(mid, n, ch), sr)
        for mid, sr, ch, n in zip(
            pdf["media_id"], pdf["sample_rate"], pdf["channels"], pdf["n"]
        )
    ]
    out = pdf[["media_id", "sample_rate", "channels"]].copy()
    out["payload"] = pd.Series(payloads, index=pdf.index, dtype=object)
    return out[["media_id", "sample_rate", "channels", "payload"]]


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Render a REAL WAV per document: n = n_chars%50+20 samples,
    channels = doc_id%2+1, rate = 8000 + (doc_id%3)*4000.  Arrow-batched;
    payloads never touch the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_render_pdf(pdf)

    return _wav_base(docs).mapInPandas(run, WAV_MEDIA_SCHEMA)


def _wav_stats_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in WAV_STATS_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, sr = decode_wav(payload)
        n, ch = arr.shape
        cols["media_id"].append(mid)
        cols["sample_rate"].append(sr)
        cols["channels"].append(ch)
        cols["n_samples"].append(n)
        cols["payload_bytes"].append(len(payload))
        cols["duration_ms"].append(n * 1000 // sr)
        cols["s0"].append(int(arr[0, 0]))
        cols["mean0"].append(int(arr[:, 0].sum(dtype=np.int64)) / n)
        cols["peak"].append(int(np.abs(arr.astype(np.int64)).max()))
    return pd.DataFrame(cols)


def wav_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every WAV payload: rate/channels/length from the chunk walk,
    exact integer duration, first sample (pins endianness + interleave
    offset), channel-0 mean, absolute peak."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_stats_pdf(pdf)

    return media.mapInPandas(run, WAV_STATS_SCHEMA)


def _wav_resample_pdf(pdf: pd.DataFrame, out_sr: int) -> pd.DataFrame:
    payloads = []
    for payload in pdf["payload"]:
        arr, sr = decode_wav(payload)
        payloads.append(encode_wav(resample_nearest(arr, sr, out_sr), out_sr))
    out = pdf[["media_id", "channels"]].copy()
    out["sample_rate"] = np.int32(out_sr)
    out["payload"] = pd.Series(payloads, index=pdf.index, dtype=object)
    return out[["media_id", "sample_rate", "channels", "payload"]]


def wav_resample(media: DataFrame, out_sr: int) -> DataFrame:
    """Real resample: decode -> nearest-sample index map -> re-encode at
    ``out_sr`` — the audio analog of bmp_resize, transforming actual
    bytes, not metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_resample_pdf(pdf, out_sr)

    return media.mapInPandas(run, WAV_MEDIA_SCHEMA)


def wav_stats_pipeline(
    docs: DataFrame, resample_sr: int | None = None
) -> DataFrame:
    """FUSED render [-> resample] -> decode-stats over real WAV bytes in
    ONE Arrow stage (r14, see :func:`_arrow_pipeline`): the same
    :func:`encode_wav` / :func:`decode_wav` / :func:`resample_nearest`
    kernels as the chained operators, composed at the pandas level.
    Value-identical to
    ``wav_decode_stats(wav_resample?(wav_media_from_documents(docs)))``
    (test-pinned)."""
    stages = [_wav_render_pdf]
    if resample_sr is not None:
        stages.append(lambda pdf: _wav_resample_pdf(pdf, resample_sr))
    stages.append(_wav_stats_pdf)
    return _arrow_pipeline(_wav_base(docs), WAV_STATS_SCHEMA, *stages)


# Perceptual-hash image near-dup ---------------------------------------------

AHASH_GRID = 8
PHASH_MAX_HAMMING = 3

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("b0", T.IntegerType(), False),
        T.StructField("b1", T.IntegerType(), False),
        T.StructField("b2", T.IntegerType(), False),
        T.StructField("b3", T.IntegerType(), False),
    ]
)


def ahash_bands(px: "np.ndarray") -> tuple[int, int, int, int]:
    """aHash of one decoded (h, w, 3) uint8 image as four 16-bit band
    ints: nearest-neighbor downsample to the 8x8 grid, integer grayscale
    (r+g+b) div 3, threshold each cell against the integer mean.  Module
    level (not a closure) so the invariance properties — constant
    brightness shifts that don't wrap leave every bit unchanged — are
    testable without a Spark round-trip."""
    small = resize_nearest(px, AHASH_GRID, AHASH_GRID).astype(np.int64)
    gray = (small[:, :, 0] + small[:, :, 1] + small[:, :, 2]) // 3
    mean = int(gray.sum()) // (AHASH_GRID * AHASH_GRID)
    bits = (gray >= mean).reshape(-1)  # j = y*8 + x, row-major
    return tuple(
        int(sum(int(bits[16 * i + j]) << j for j in range(16)))
        for i in range(4)
    )


def bmp_ahash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint from REAL image bytes:
    decode the BMP, nearest-neighbor downsample to the 8x8 grid, integer
    grayscale (r+g+b) div 3, threshold each cell against the integer mean
    — 64 bits stored as four 16-bit band integers (b0..b3, bit j of the
    row-major grid lands in band j div 16 at position j mod 16).

    All arithmetic is integer (floor division throughout), so the oracle
    reproduces every bit closed-form from the synthetic pixel formula —
    a decoder bug (orientation, channel order, padding) flips bits and
    breaks the hash.  aHash is invariant to constant brightness shifts
    (mean moves with the pixels), which is what makes it a NEAR-dup
    fingerprint rather than an exact-byte one.

    Scale (100 TB): Arrow-batched ``mapInPandas``, partition-preserving,
    payloads never on the driver; the hash output is 4 ints/image — the
    downstream join input is ~10^3x smaller than the media bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "media_id": [], "b0": [], "b1": [], "b2": [], "b3": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                bands = ahash_bands(decode_bmp(bytes(payload)))
                cols["media_id"].append(int(mid))
                for i in range(4):
                    cols[f"b{i}"].append(bands[i])
            yield pd.DataFrame(cols)

    return media.mapInPandas(run, AHASH_SCHEMA)


def phash_neardup(
    hashes: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance,
    banded exactly like MinHash-LSH: candidates = pairs agreeing on at
    least one of the four 16-bit bands (an equi-join on (band, value) —
    never all-pairs), verified by the exact 64-bit Hamming distance.

    With 4 bands, ``max_hamming`` <= 3 makes the band stage EXACT by
    pigeonhole (3 differing bits cannot touch all 4 bands), so unlike
    probabilistic LSH this candidate generation has perfect recall for
    the verified predicate.

    Output: id_a, id_b (id_a < id_b), hamming (int).

    Scale (100 TB): candidate volume is bounded by band-bucket occupancy
    (sum of bucket^2 per band), the LSH cost shape; the verify join
    carries 4 ints per side.  Skewed buckets (e.g. flat images hashing
    to 0) split under AQE skew-join like any hot LSH bucket.
    """
    # Pigeonhole exactness only holds for max_hamming <= bands - 1: 4
    # differing bits CAN touch all four bands, and such pairs would
    # silently vanish from the candidate join.  Refuse rather than
    # return an incomplete pair set (recall loss with no error is the
    # worst failure mode a dedup primitive can have).
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band pigeonhole "
            "bound (3); banded candidates would miss qualifying pairs"
        )
    bands = hashes.select(
        "media_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "val"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("id_a"),
            F.col("y.media_id").alias("id_b"),
        )
        .distinct()
    )
    ha, hb = hashes.alias("ha"), hashes.alias("hb")
    hamming = sum(
        F.bit_count(
            F.col(f"ha.b{i}").bitwiseXOR(F.col(f"hb.b{i}"))
        )
        for i in range(4)
    )
    return (
        cand.join(ha, F.col("id_a") == F.col("ha.media_id"))
        .join(hb, F.col("id_b") == F.col("hb.media_id"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_class_neardup(
    hashes: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Near-dup search between EXACT-HASH CLASSES: collapse identical
    aHashes to one canonical representative first (one groupBy — the
    same exact-before-fuzzy staging pipe_clean_corpus uses before LSH),
    then run the banded Hamming search over DISTINCT hashes only.

    This is the scale-correct registry flavor: on a corpus with heavy
    duplication the raw pair set grows with the duplicate mass squared
    (908k pairs at sf0.1 here — brightness-shifted renders collapse to
    identical aHashes), while distinct hashes grow sub-linearly
    (299 -> 1462 for 10x docs on this corpus), so the class pair set is
    orders of magnitude smaller and carries the SAME information: every
    raw near-dup pair is reconstructible as (member of class a, member
    of class b) plus the within-class exact groups.

    Output: id_a, id_b (canonical = min media_id per class, id_a < id_b),
    hamming, n_images_a, n_images_b.
    """
    # Lazily checkpointed: the class relation feeds FIVE subtrees (the
    # band self-join's two sides, the verify join's two sides, and the
    # two member-count attachments) which would each re-run the
    # collapse groupBy; the relation is DISTINCT-HASH sized (sublinear
    # in the corpus — 299 -> 1462 for 10x docs here), so the
    # non-reliable-checkpoint trade-off (SCALE.md r11) costs KBs.
    groups = (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_images"),
        )
        .localCheckpoint(eager=False)
    )
    pairs = phash_neardup(
        groups.select("media_id", "b0", "b1", "b2", "b3"), max_hamming
    )
    na = groups.select(
        F.col("media_id").alias("id_a"), F.col("n_images").alias("n_images_a")
    )
    nb = groups.select(
        F.col("media_id").alias("id_b"), F.col("n_images").alias("n_images_b")
    )
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", "hamming", "n_images_a", "n_images_b")
    )


WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channel", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("zcr", T.DoubleType(), False),
    ]
)


def pcm_channel_features(arr: "np.ndarray") -> list[tuple[int, float, int, float]]:
    """Per-channel (rms, crossings, zcr) of one decoded (n, ch) int16
    PCM block — module level so the numeric properties (exact integer
    sums, sign-boundary crossing count) are testable without a Spark
    round-trip.  Returns [(channel, rms, zero_crossings, zcr), ...].

    Degenerate-but-conforming inputs (any producer's file, not just the
    synthetic corpus): an empty data chunk yields NO feature rows (there
    is no signal to describe), and a single-frame block has zcr 0.0 by
    definition (a crossing needs two samples) — neither divides by
    zero."""
    import math

    a = arr.astype(np.int64)
    n, ch = a.shape
    if n == 0:
        return []
    out = []
    for c in range(ch):
        v = a[:, c]
        sum_sq = int((v * v).sum())
        nonneg = v >= 0
        crossings = int((nonneg[:-1] != nonneg[1:]).sum())
        zcr = crossings / (n - 1) if n > 1 else 0.0
        out.append((c, math.sqrt(sum_sq / n), crossings, zcr))
    return out


def wav_features(media: DataFrame) -> DataFrame:
    """Per-channel audio features from REAL PCM bytes: RMS energy and
    zero-crossing rate — the canonical first-pass audio quality/segment
    signals (silence gating, voiced/unvoiced discrimination).

    Numeric determinism without rounding: the squared-sample sum is an
    exact int64, so ``rms = sqrt(sum_sq / n)`` is two correctly-rounded
    IEEE operations and bit-matches the oracle's ``sqrt(sum/ n)``; the
    crossing count is an exact integer (sign boundary defined as
    ``v >= 0`` vs ``v < 0``, so zeros never produce engine-dependent
    ties), and ``zcr = crossings / (n-1)`` is one exact division.

    Output: media_id, channel, n_samples, rms, zero_crossings, zcr —
    one row per (media, channel).

    Scale (100 TB): Arrow-batched ``mapInPandas``, partition-preserving,
    payloads never on the driver; cost ∝ media bytes on-executor, the
    same envelope as the codec roundtrips.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_features_pdf(pdf)

    return media.mapInPandas(run, WAV_FEATURES_SCHEMA)


def _wav_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in WAV_FEATURES_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, _sr = decode_wav(payload)
        n = arr.shape[0]
        for c, rms, crossings, zcr in pcm_channel_features(arr):
            cols["media_id"].append(int(mid))
            cols["channel"].append(c)
            cols["n_samples"].append(n)
            cols["rms"].append(rms)
            cols["zero_crossings"].append(crossings)
            cols["zcr"].append(zcr)
    return pd.DataFrame(cols)


def wav_features_pipeline(docs: DataFrame) -> DataFrame:
    """FUSED render -> per-channel RMS/ZCR over real WAV bytes in ONE
    Arrow stage (r14, see :func:`_arrow_pipeline`).  Value-identical to
    ``wav_features(wav_media_from_documents(docs))`` (test-pinned)."""
    return _arrow_pipeline(
        _wav_base(docs), WAV_FEATURES_SCHEMA, _wav_render_pdf,
        _wav_features_pdf,
    )


# -- real video codec: FRV1 packed-frame container, pure numpy/struct --------
#
# The video member of the real-codec family (BMP image, PCM WAV audio):
# uncompressed video needs no media library either, so "video as opaque
# binary" gets a REAL container — a 12-byte header (magic, frame count,
# dims, fps) followed by tightly packed top-down RGB frames.  Unlike BMP
# there is NO row padding and no bottom-up flip (documented contrast: a
# decoder that conflates the two containers breaks the oracle hash).
# Frame pixels are integer arithmetic in (doc_id, frame, y, x, channel),
# so every per-frame statistic, inter-frame difference, and sampled-frame
# checksum is closed-form recomputable by the DuckDB oracle.

FRV_MAGIC = b"FRV1"
FRV_HEADER_BYTES = 12  # magic(4) + <HHHH> n_frames, width, height, fps


def encode_frv(frames: np.ndarray, fps: int) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 array as an FRV1 container:
    magic + little-endian counts header + packed top-down RGB bytes."""
    n, h, w, c = frames.shape
    assert c == 3
    header = FRV_MAGIC + struct.pack("<HHHH", n, w, h, fps)
    return header + frames.astype(np.uint8).tobytes()


def decode_frv(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an FRV1 container back to ((n_frames, h, w, 3) uint8, fps).
    Validates magic and exact payload length — a truncated or padded
    container raises rather than yielding shifted frames."""
    if payload[:4] != FRV_MAGIC:
        raise ValueError("not an FRV1 container")
    n, w, h, fps = struct.unpack("<HHHH", payload[4:FRV_HEADER_BYTES])
    body = payload[FRV_HEADER_BYTES:]
    if len(body) != n * h * w * 3:
        raise ValueError("FRV1 length mismatch")
    arr = np.frombuffer(body, dtype=np.uint8).reshape(n, h, w, 3)
    return arr, fps


def synth_frames(
    doc_id: int, n_frames: int, width: int, height: int
) -> np.ndarray:
    """Deterministic fixture frames:
    (doc_id*31 + f*17 + y*7 + x*3 + c*11) % 256 — the BMP pixel formula
    extended with a frame term, so DuckDB reproduces any decoded
    statistic including inter-frame differences."""
    f = np.arange(n_frames, dtype=np.int64).reshape(-1, 1, 1, 1)
    y = np.arange(height, dtype=np.int64).reshape(1, -1, 1, 1)
    x = np.arange(width, dtype=np.int64).reshape(1, 1, -1, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, 1, -1)
    return (
        (doc_id * 31 + f * 17 + y * 7 + x * 3 + c * 11) % 256
    ).astype(np.uint8)


FRV_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FRV_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("px000", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)

FRV_CUTS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("diff_energy", T.DoubleType()),
        T.StructField("is_cut", T.BooleanType()),
    ]
)

FRV_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def frv_media_from_documents(docs: DataFrame) -> DataFrame:
    """Render a REAL FRV1 clip per document: n_frames = n_chars%6+2,
    w = n_chars%8+4, h = n_chars%5+3, fps 4; frames from
    :func:`synth_frames`.  Arrow-batched; payloads never on the driver."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frv_render_pdf(pdf)

    return _frv_base(docs).mapInPandas(run, FRV_MEDIA_SCHEMA)


def _frv_base(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 6 + 2).cast("int").alias("n_frames"),
        (F.col("n_chars") % 8 + 4).cast("int").alias("width"),
        (F.col("n_chars") % 5 + 3).cast("int").alias("height"),
        F.lit(4).cast("int").alias("fps"),
    )


def _frv_render_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["payload"] = pd.Series(
        [
            encode_frv(synth_frames(mid, n, w, h), fps)
            for mid, n, w, h, fps in zip(
                pdf["media_id"],
                pdf["n_frames"],
                pdf["width"],
                pdf["height"],
                pdf["fps"],
            )
        ],
        index=pdf.index,
        dtype=object,
    )
    return out


def frv_frame_stats(media: DataFrame) -> DataFrame:
    """Decode every FRV1 payload and emit one row PER FRAME: the frame's
    top-left red value (px000 pins the frame-offset arithmetic — an
    off-by-one-frame slice reads (f±1)'s formula value), the exact int64
    pixel sum, and the mean.  The per-frame fan-out is the production
    frame-extraction shape; rows stay Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frv_frame_stats_pdf(pdf)

    return media.mapInPandas(run, FRV_FRAME_STATS_SCHEMA)


def _frv_frame_stats_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {
        k.name: [] for k in FRV_FRAME_STATS_SCHEMA.fields
    }
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, _fps = decode_frv(payload)
        n, h, w, _ = arr.shape
        sums = arr.reshape(n, -1).sum(axis=1, dtype=np.int64)
        for fi in range(n):
            cols["media_id"].append(int(mid))
            cols["frame_index"].append(fi)
            cols["px000"].append(int(arr[fi, 0, 0, 0]))
            cols["px_sum"].append(int(sums[fi]))
            cols["mean_px"].append(int(sums[fi]) / (h * w * 3))
    return pd.DataFrame(cols)


def frv_frame_stats_pipeline(docs: DataFrame) -> DataFrame:
    """FUSED render -> per-frame stats in ONE Arrow stage (r14, see
    :func:`_arrow_pipeline`).  Value-identical to
    ``frv_frame_stats(frv_media_from_documents(docs))`` (test-pinned)."""
    return _arrow_pipeline(
        _frv_base(docs), FRV_FRAME_STATS_SCHEMA, _frv_render_pdf,
        _frv_frame_stats_pdf,
    )


def frv_scene_cuts(media: DataFrame, threshold: float = 60.0) -> DataFrame:
    """Inter-frame difference energy (mean |pixel delta| between frame
    f-1 and f, exact int64 sum / double divide) with a fixed-threshold
    cut flag — the shot-boundary primitive a video curation pipeline
    runs before frame sampling (one row per frame transition).

    The synthetic formula advances 17 per frame, so deltas are the
    wrap-aware constant |17 - 256·[wrap]| pattern — the oracle
    recomputes them exactly; is_cut cannot flip on a ulp because
    diff_energy is a ratio of exact integers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frv_cuts_pdf(pdf, threshold)

    return media.mapInPandas(run, FRV_CUTS_SCHEMA)


def _frv_cuts_pdf(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in FRV_CUTS_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, _fps = decode_frv(payload)
        n, h, w, _ = arr.shape
        if n < 2:
            continue
        d = np.abs(arr[1:].astype(np.int64) - arr[:-1].astype(np.int64))
        sums = d.reshape(n - 1, -1).sum(axis=1, dtype=np.int64)
        denom = h * w * 3
        for fi in range(1, n):
            energy = int(sums[fi - 1]) / denom
            cols["media_id"].append(int(mid))
            cols["frame_index"].append(fi)
            cols["diff_energy"].append(energy)
            cols["is_cut"].append(energy >= threshold)
    return pd.DataFrame(cols)


def frv_scene_cuts_pipeline(
    docs: DataFrame, threshold: float = 60.0
) -> DataFrame:
    """FUSED render -> inter-frame cut detection in ONE Arrow stage
    (r14, see :func:`_arrow_pipeline`).  Value-identical to
    ``frv_scene_cuts(frv_media_from_documents(docs))`` (test-pinned)."""
    return _arrow_pipeline(
        _frv_base(docs), FRV_CUTS_SCHEMA, _frv_render_pdf,
        lambda pdf: _frv_cuts_pdf(pdf, threshold),
    )


def frv_frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: slice every ``every_n``-th frame out of the
    container bytes (stride over the packed frame layout) and emit its
    byte length + exact pixel checksum — the real-codec successor of the
    generic :func:`sample_frames` stub.  An off-by-one in the stride or
    the frame byte-offset arithmetic shifts px_sum to a different
    frame's closed-form value."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frv_sample_pdf(pdf, every_n)

    return media.mapInPandas(run, FRV_SAMPLE_SCHEMA)


def _frv_sample_pdf(pdf: pd.DataFrame, every_n: int) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in FRV_SAMPLE_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        n, w, h, _fps = struct.unpack("<HHHH", payload[4:FRV_HEADER_BYTES])
        frame_len = h * w * 3
        for fi in range(0, n, every_n):
            start = FRV_HEADER_BYTES + fi * frame_len
            frame = np.frombuffer(
                payload[start : start + frame_len], dtype=np.uint8
            )
            cols["media_id"].append(int(mid))
            cols["frame_index"].append(fi)
            cols["frame_bytes"].append(frame_len)
            cols["px_sum"].append(int(frame.sum(dtype=np.int64)))
    return pd.DataFrame(cols)


def frv_frame_sample_pipeline(docs: DataFrame, every_n: int = 2) -> DataFrame:
    """FUSED render -> every-Nth-frame byte-slice sampling in ONE Arrow
    stage (r14, see :func:`_arrow_pipeline`).  Value-identical to
    ``frv_frame_sample(frv_media_from_documents(docs))`` (test-pinned)."""
    return _arrow_pipeline(
        _frv_base(docs), FRV_SAMPLE_SCHEMA, _frv_render_pdf,
        lambda pdf: _frv_sample_pdf(pdf, every_n),
    )


# Energy-based voice-activity detection ---------------------------------------

VAD_FRAME = 8  # samples per analysis frame (complete frames only)
VAD_MS_THRESHOLD = 250_000_000  # mean-square activity threshold

VAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("n_values", T.IntegerType(), False),
    ]
)


def wav_frame_energies(media: DataFrame, frame: int = VAD_FRAME) -> DataFrame:
    """Per-frame energy from REAL WAV bytes: decode, split channel-
    interleaved PCM into complete ``frame``-sample windows, and emit the
    exact int64 sum of squares across all channels per frame (the tail
    partial frame is dropped, deterministically).

    Columns: media_id, frame_idx (0-based), energy (sum v^2, exact),
    n_values (frame x channels).

    Scale (100 TB): Arrow-batched decode, one output row per frame —
    the standard framewise shape speech pipelines aggregate from;
    payloads never leave the executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_frame_energies_pdf(pdf, frame)

    return media.mapInPandas(run, VAD_FRAME_SCHEMA)


def _wav_frame_energies_pdf(pdf: pd.DataFrame, frame: int) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in VAD_FRAME_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, _sr = decode_wav(payload)
        n, ch = arr.shape
        nf = n // frame
        if nf == 0:
            continue
        sq = arr[: nf * frame].astype(np.int64) ** 2
        e = sq.reshape(nf, frame * ch).sum(axis=1)
        cols["media_id"].extend([int(mid)] * nf)
        cols["frame_idx"].extend(range(nf))
        cols["energy"].extend(int(x) for x in e)
        cols["n_values"].extend([frame * ch] * nf)
    return pd.DataFrame(cols)


def wav_frame_energies_pipeline(
    docs: DataFrame, frame: int = VAD_FRAME
) -> DataFrame:
    """FUSED render -> per-frame energy in ONE Arrow stage (r14, see
    :func:`_arrow_pipeline`); the JVM-side islanding of
    :func:`wav_vad_segments` composes on top unchanged.  Value-identical
    to ``wav_frame_energies(wav_media_from_documents(docs))``
    (test-pinned)."""
    return _arrow_pipeline(
        _wav_base(docs),
        VAD_FRAME_SCHEMA,
        _wav_render_pdf,
        lambda pdf: _wav_frame_energies_pdf(pdf, frame),
    )


def wav_vad_segments(
    media: DataFrame,
    frame: int = VAD_FRAME,
    ms_threshold: int = VAD_MS_THRESHOLD,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the speech-data
    curation primitive (which parts of this recording carry signal, how
    much active audio does the corpus hold): frames whose mean square
    reaches ``ms_threshold`` are active, and consecutive active frames
    merge into segments via gaps-and-islands.

    The activity test compares exact integers (energy >= threshold *
    n_values — never a float mean), so a segment boundary cannot flip
    between engines on a rounding ulp.

    Columns: media_id, seg (1-based by start), start_frame, end_frame,
    n_frames, mean_sq (round4).

    Scale (100 TB): framewise rows partial-agg per (media, island);
    both windows partition by media_id — per-key, never global.  The
    decode stays in the Arrow kernel; islanding and aggregation are
    JVM-side codegen.
    """
    fe = wav_frame_energies(media, frame)
    return _vad_tail(fe, ms_threshold)


def wav_vad_segments_pipeline(
    docs: DataFrame,
    frame: int = VAD_FRAME,
    ms_threshold: int = VAD_MS_THRESHOLD,
) -> DataFrame:
    """:func:`wav_vad_segments` served off the FUSED render->frame-energy
    Arrow stage (r14, see :func:`_arrow_pipeline`); the JVM islanding
    tail is shared verbatim.  Value-identical to
    ``wav_vad_segments(wav_media_from_documents(docs))`` (test-pinned)."""
    return _vad_tail(wav_frame_energies_pipeline(docs, frame), ms_threshold)


def _vad_tail(fe: DataFrame, ms_threshold: int) -> DataFrame:
    from pyspark.sql import Window

    from zipkin_storage_kafka_spark.functions.portable import round4

    active = fe.filter(
        F.col("energy")
        >= F.lit(int(ms_threshold)).cast("long") * F.col("n_values")
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    isl = active.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    seg = isl.groupBy("media_id", "grp").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("energy").alias("_se"),
        F.sum("n_values").alias("_sv"),
    )
    ws = Window.partitionBy("media_id").orderBy("start_frame")
    return seg.select(
        "media_id",
        F.row_number().over(ws).cast("int").alias("seg"),
        F.col("start_frame").cast("int").alias("start_frame"),
        F.col("end_frame").cast("int").alias("end_frame"),
        F.col("n_frames").cast("int").alias("n_frames"),
        round4(F.col("_se").cast("double") / F.col("_sv")).alias(
            "mean_sq"
        ),
    )


def media_payload_sizes(docs: DataFrame) -> DataFrame:
    """Per-document encoded payload sizes measured with ``octet_length``
    on the REAL BMP/WAV bytes — the once-per-snapshot ingest derivation
    behind :func:`multimodal_record_sizes` (a deployment records sizes
    when it encodes, not by re-encoding per query; the registry
    materializes this table via matcache like shingles/charlm scores).

    Output: doc_id, bmp_b, wav_b.
    """
    bmp_len = bmp_media_from_documents(docs).select(
        F.col("media_id").alias("doc_id"),
        F.octet_length("payload").cast("long").alias("bmp_b"),
    )
    wav_len = wav_media_from_documents(docs).select(
        F.col("media_id").alias("doc_id"),
        F.octet_length("payload").cast("long").alias("wav_b"),
    )
    return bmp_len.join(wav_len, "doc_id")


def multimodal_record_sizes(
    docs: DataFrame, sizes: DataFrame | None = None
) -> DataFrame:
    """Per-language byte budget of the assembled multimodal training
    record (text + image + audio per document) — the input a shard
    planner needs before packing interleaved multimodal batches
    (pipe_shard_plan's byte-budget logic, extended across modalities).

    The sizes are measured with ``octet_length`` on the REAL encoded
    payloads (the BMP/WAV bytes produced by the codecs, Arrow-batched,
    never on the driver), so the row proves the container framing at
    corpus scale: the oracle computes the same totals CLOSED-FORM from
    the header + row-stride / sample-count arithmetic, and any framing
    drift (padding, header size, channel count) breaks the hash.

    Scale: one id-keyed join of the (materialized) per-doc size table
    down to |langs| rows — nothing wide moves at query time.

    Output: lang, n_docs, text_chars, bmp_bytes, wav_bytes, total_bytes.
    """
    if sizes is None:
        sizes = media_payload_sizes(docs)
    base = docs.select("doc_id", "lang", F.col("n_chars").cast("long"))
    return (
        base.join(sizes, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("text_chars"),
            F.sum("bmp_b").alias("bmp_bytes"),
            F.sum("wav_b").alias("wav_bytes"),
            (F.sum("n_chars") + F.sum("bmp_b") + F.sum("wav_b")).alias(
                "total_bytes"
            ),
        )
    )


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channel", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("n_codes", T.LongType(), False),
        T.StructField("n_distinct_codes", T.LongType(), False),
        T.StructField("codes", T.StringType(), False),
    ]
)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Robust audio fingerprint from REAL PCM bytes — the energy-
    difference scheme of Haitsma & Kalker 2002 ("A Highly Robust Audio
    Fingerprinting System"), time-domain simplification: each 8-sample
    frame splits into 4 contiguous 2-sample bands with exact int64
    energies E[f][b] = sum v^2; fingerprint bit b of frame f is the
    sign of the double difference (E[f][b] - E[f][b+1]) -
    (E[f-1][b] - E[f-1][b+1]), giving a 3-bit code per frame from the
    second frame on.  (The paper's 33 FFT bands become 4 time bands
    here — the bit construction, the part that carries the robustness
    argument, is unchanged; a real deployment swaps in band-pass
    energies.)

    All-integer, so the SQL oracle reproduces the codes exactly from
    the synthetic PCM formula; strict ``> 0`` means a zero difference
    can never flip on engine float behavior (there are no floats).

    Output: media_id, channel, n_frames, n_codes, n_distinct_codes,
    codes (comma-joined frame codes, the per-channel fingerprint).

    Scale (100 TB): Arrow-batched ``mapInPandas``, partition-
    preserving; per-row output is ~n_samples/8 small integers.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _audio_fp_pdf(pdf)

    return media.mapInPandas(run, AUDIO_FP_SCHEMA)


def _audio_fp_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {k.name: [] for k in AUDIO_FP_SCHEMA.fields}
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        arr, _sr = decode_wav(payload)
        n = arr.shape[0]
        n_frames = n // 8
        for c in range(arr.shape[1]):
            v = arr[: n_frames * 8, c].astype(np.int64)
            if n_frames >= 1:
                energy = (v * v).reshape(n_frames, 4, 2).sum(axis=2)
                band_diff = energy[:, :3] - energy[:, 1:]
                dd = band_diff[1:] - band_diff[:-1]
                bits = (dd > 0).astype(np.int64)
                codes = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
            else:
                codes = np.zeros(0, dtype=np.int64)
            cols["media_id"].append(int(mid))
            cols["channel"].append(c)
            cols["n_frames"].append(int(n_frames))
            cols["n_codes"].append(int(codes.shape[0]))
            cols["n_distinct_codes"].append(int(np.unique(codes).shape[0]))
            cols["codes"].append(",".join(str(int(x)) for x in codes))
    return pd.DataFrame(cols)


def audio_fingerprint_pipeline(docs: DataFrame) -> DataFrame:
    """FUSED oscillatory-fixture render -> Haitsma-Kalker fingerprint in
    ONE Arrow stage (r14, see :func:`_arrow_pipeline`).  Value-identical
    to ``audio_fingerprint(fm_wav_media_from_documents(docs))``
    (test-pinned)."""
    return _arrow_pipeline(
        _wav_base(docs), AUDIO_FP_SCHEMA, _fm_wav_render_pdf, _audio_fp_pdf
    )


def synth_fm_samples(doc_id: int, n: int, ch: int) -> np.ndarray:
    """Oscillatory fixture audio for the fingerprint row:
    ((doc_id*9973 + i*40503 + c*17) % 65536) - 32768.  The 40503 step
    wraps the int16 range every ~1.6 samples, so band energies vary
    frame to frame and the Haitsma-Kalker bits carry signal — the
    linear :func:`synth_samples` ramp is feature-free for a
    difference-of-differences fingerprint (every code degenerates to
    0).  Still pure integer arithmetic, so the oracle reproduces every
    sample."""
    i = np.arange(n, dtype=np.int64).reshape(-1, 1)
    c = np.arange(ch, dtype=np.int64).reshape(1, -1)
    return (((doc_id * 9973 + i * 40503 + c * 17) % 65536) - 32768).astype(
        np.int16
    )


def fm_wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Render the oscillatory-fixture WAV per document (same geometry
    as :func:`wav_media_from_documents`: n = n_chars%50+20 samples,
    channels = doc_id%2+1, rate 8000 + (doc_id%3)*4000), carrying
    :func:`synth_fm_samples` audio — real bytes, Arrow-batched."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fm_wav_render_pdf(pdf)

    return _wav_base(docs).mapInPandas(run, WAV_MEDIA_SCHEMA)


def _fm_wav_render_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = [
        encode_wav(synth_fm_samples(int(mid), int(n), int(ch)), sr)
        for mid, sr, ch, n in zip(
            pdf["media_id"], pdf["sample_rate"], pdf["channels"], pdf["n"]
        )
    ]
    out = pdf[["media_id", "sample_rate", "channels"]].copy()
    out["payload"] = pd.Series(payloads, index=pdf.index, dtype=object)
    return out[["media_id", "sample_rate", "channels", "payload"]]
