"""Multimodal plumbing tests: schema, batch shape, determinism,
distribution — the Spark-side contracts are real even though the decoder is
a deterministic stub."""

from __future__ import annotations

from pyspark.sql import functions as F

from zipkin_storage_kafka_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_payload,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from zipkin_storage_kafka_spark.sources.tables import load_table


def _media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_kinds(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(spark, sf_dir):
    media = _media(spark, sf_dir).limit(50)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # determinism across executions (and executors): same payload -> same vec
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_repartition_preserves_rows(spark, sf_dir):
    media = _media(spark, sf_dir).repartition(8)
    assert extract_features(media).count() == _media(spark, sf_dir).count()


def test_resize_rewrites_metadata(spark, sf_dir):
    out = resize_images(_media(spark, sf_dir), 224, 224)
    metas = out.select("meta.width", "meta.height").distinct().collect()
    assert metas == [type(metas[0])(width=224, height=224)]
    assert out.count() == _media(spark, sf_dir).filter(F.col("kind") == "image").count()


def test_frame_sampling_fanout(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = sample_frames(media, every_n=10)
    videos = media.filter(F.col("kind") == "video").select(
        "media_id", "meta.n_frames"
    )
    expected = sum(
        len(range(0, r["n_frames"], 10)) for r in videos.collect()
    )
    assert frames.count() == expected
    one = frames.first()
    assert isinstance(one["frame_payload"], (bytes, bytearray))


def test_decoder_stub_is_deterministic_locally():
    a = decode_payload(b"hello")
    b = decode_payload(b"hello")
    c = decode_payload(b"other")
    assert (a == b).all()
    assert not (a == c).all()


# --- real BMP codec (pure numpy/struct; no external media libs) ---------


def test_bmp_roundtrip_identity_all_padding_widths():
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        BMP_HEADER_BYTES,
        bmp_row_size,
        decode_bmp,
        encode_bmp,
        synth_pixels,
    )

    # widths 1..4 cover every 4-byte row-padding residue
    for w, h in [(1, 1), (2, 2), (3, 5), (4, 4), (31, 23), (8, 8)]:
        px = synth_pixels(123456, w, h)
        payload = encode_bmp(px)
        assert len(payload) == BMP_HEADER_BYTES + bmp_row_size(w) * h
        assert np.array_equal(decode_bmp(payload), px)


def test_bmp_golden_bytes():
    """Pin the wire format, not just encode/decode symmetry: a 2x1 RGB
    image must serialize to the exact BGR+padded row after the 54-byte
    header (a matched flip/channel-swap bug in BOTH directions would pass
    roundtrip identity but fail this)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import encode_bmp

    px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    payload = encode_bmp(px)
    assert payload[:2] == b"BM"
    assert payload[54:62] == bytes([3, 2, 1, 6, 5, 4, 0, 0])


def test_bmp_decodes_foreign_topdown_file():
    """Decoder accepts a conforming top-down (negative height) BMP a
    third-party producer would write — it is a decoder, not merely the
    inverse of our encoder."""
    import struct

    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        bmp_row_size,
        decode_bmp,
    )

    w = h = 2
    row = bmp_row_size(w)
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + row * h, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, row * h, 0, 0, 0, 0
    )
    buf = np.zeros((h, row), dtype=np.uint8)
    buf[:, : 3 * w] = px[:, :, ::-1].reshape(h, 3 * w)
    assert np.array_equal(decode_bmp(header + info + buf.tobytes()), px)


def test_bmp_rejects_non_bmp_and_unsupported():
    import pytest

    from zipkin_storage_kafka_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNGnot really")
    # 8-bit BMP header -> unsupported bpp
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_bmp(header + info + b"\x00\x00\x00\x00")


def test_bmp_resize_nearest_index_math():
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        resize_nearest,
        synth_pixels,
    )

    px = synth_pixels(7, 10, 6)
    out = resize_nearest(px, 4, 4)
    assert out.shape == (4, 4, 3)
    for yo in range(4):
        for xo in range(4):
            assert (
                out[yo, xo] == px[(yo * 6) // 4, (xo * 10) // 4]
            ).all()


def test_bmp_media_pipeline_spark(spark, sf_dir):
    """Spark-side contract: real BMP payloads flow through mapInPandas,
    decode stats match a driver-side decode of the same payload."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        bmp_decode_stats,
        bmp_media_from_documents,
        bmp_resize,
        decode_bmp,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = bmp_media_from_documents(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    stats = {r["media_id"]: r for r in bmp_decode_stats(media).collect()}
    for mid, r in rows.items():
        img = decode_bmp(bytes(r["payload"]))
        s = stats[mid]
        assert (s["height"], s["width"]) == img.shape[:2]
        assert s["payload_bytes"] == len(r["payload"])
        assert s["px00_r"] == int(img[0, 0, 0])
        assert abs(s["r_mean"] - img[:, :, 0].mean()) < 1e-12
    resized = bmp_resize(media, 16, 16)
    for r in resized.collect():
        img = decode_bmp(bytes(r["payload"]))
        assert img.shape == (16, 16, 3)


def test_wav_golden_bytes():
    """Pin the WAV wire format: a 2-sample stereo clip must serialize to
    the canonical 44-byte header + little-endian interleaved int16 data
    (matched byte-order bugs in both codec directions would survive
    roundtrip identity but fail this)."""
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import encode_wav

    smp = np.array([[1, -2], [256, 32767]], dtype=np.int16)
    payload = encode_wav(smp, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    # fmt: PCM(1), 2 channels, 8000 Hz, byte rate 32000, align 4, 16 bit
    import struct

    assert struct.unpack_from("<HHIIHH", payload, 20) == (
        1, 2, 8000, 32000, 4, 16,
    )
    assert payload[36:40] == b"data"
    assert payload[44:] == bytes(
        [0x01, 0x00, 0xFE, 0xFF, 0x00, 0x01, 0xFF, 0x7F]
    )


def test_wav_roundtrip_identity():
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_samples,
    )

    for ch in (1, 2):
        for n in (1, 7, 64):
            smp = synth_samples(123, n, ch)
            arr, sr = decode_wav(encode_wav(smp, 16000))
            assert sr == 16000
            assert np.array_equal(arr, smp)


def test_wav_decodes_foreign_file_with_extra_chunks():
    """The decoder walks RIFF chunks: a LIST chunk (odd-sized, so padded)
    between fmt and data — as real recorders write — must not break the
    data offset; a fixed offset-44 reader would."""
    import struct

    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import decode_wav

    data = np.array([[5], [-6], [7]], dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    info = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad to even
    dat = struct.pack("<4sI", b"data", len(data)) + data
    body = fmt + info + dat
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    arr, sr = decode_wav(payload)
    assert sr == 8000
    assert arr.flatten().tolist() == [5, -6, 7]


def test_wav_rejects_non_wav_and_unsupported():
    import struct

    import pytest as _pytest

    from zipkin_storage_kafka_spark.operators.multimodal import decode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"nope" * 10)
    # 8-bit PCM is out of scope and must be refused, not mis-decoded
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    dat = struct.pack("<4sI", b"data", 2) + b"\x01\x02"
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt + dat), b"WAVE")
    with _pytest.raises(ValueError):
        decode_wav(payload + fmt + dat)


def test_wav_resample_index_math():
    import numpy as np

    from zipkin_storage_kafka_spark.operators.multimodal import (
        resample_nearest,
    )

    smp = np.arange(12, dtype=np.int16).reshape(-1, 1)
    out = resample_nearest(smp, 12000, 4000)  # keep every 3rd sample
    assert out.flatten().tolist() == [0, 3, 6, 9]
    up = resample_nearest(smp[:4], 4000, 8000)  # repeat each sample
    assert up.flatten().tolist() == [0, 0, 1, 1, 2, 2, 3, 3]


def test_wav_rejects_truncated_chunk():
    """A data chunk declaring more bytes than remain is corruption and
    must raise, not silently decode fewer samples."""
    import struct

    import numpy as np
    import pytest as _pytest

    from zipkin_storage_kafka_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_samples,
    )

    payload = encode_wav(synth_samples(7, 10, 1), 8000)
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[:-6])  # cut mid-data


def test_fused_pipelines_match_chained(spark, sf_dir):
    """r14 fusion contract: every fused single-Arrow-stage pipeline is
    value-identical to its chained mapInPandas composition — the same
    codec kernels composed at the pandas level instead of across
    JVM<->Python boundaries."""
    import zipkin_storage_kafka_spark.operators.multimodal as mm

    docs = load_table(spark, sf_dir, "documents").limit(60)
    pairs = [
        (
            mm.bmp_stats_pipeline(docs),
            mm.bmp_decode_stats(mm.bmp_media_from_documents(docs)),
        ),
        (
            mm.bmp_stats_pipeline(docs, resize=(16, 16)),
            mm.bmp_decode_stats(
                mm.bmp_resize(mm.bmp_media_from_documents(docs), 16, 16)
            ),
        ),
        (
            mm.wav_stats_pipeline(docs),
            mm.wav_decode_stats(mm.wav_media_from_documents(docs)),
        ),
        (
            mm.wav_stats_pipeline(docs, resample_sr=4000),
            mm.wav_decode_stats(
                mm.wav_resample(mm.wav_media_from_documents(docs), 4000)
            ),
        ),
        (
            mm.wav_features_pipeline(docs),
            mm.wav_features(mm.wav_media_from_documents(docs)),
        ),
        (
            mm.audio_fingerprint_pipeline(docs),
            mm.audio_fingerprint(mm.fm_wav_media_from_documents(docs)),
        ),
        (
            mm.wav_vad_segments_pipeline(docs),
            mm.wav_vad_segments(mm.wav_media_from_documents(docs)),
        ),
        (
            mm.frv_frame_stats_pipeline(docs),
            mm.frv_frame_stats(mm.frv_media_from_documents(docs)),
        ),
        (
            mm.frv_scene_cuts_pipeline(docs, threshold=60.0),
            mm.frv_scene_cuts(mm.frv_media_from_documents(docs)),
        ),
        (
            mm.frv_frame_sample_pipeline(docs, every_n=2),
            mm.frv_frame_sample(mm.frv_media_from_documents(docs)),
        ),
    ]
    for fused, chained in pairs:
        assert fused.columns == chained.columns
        a = sorted(map(tuple, fused.collect()))
        b = sorted(map(tuple, chained.collect()))
        assert a == b and len(a) > 0
