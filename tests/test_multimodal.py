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
