"""Multimodal binary-column operators: fake-codec decode, features, resize,
one-to-many frame sampling — Spark plumbing (schemas, Arrow batches,
mapInPandas iterator contract) is real; the codec is the mandated stub."""

import struct

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.multimodal import (
    _decode,
    decode_meta,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    return media_from_documents(docs).cache()


def test_decode_meta_all_kinds(media):
    meta = decode_meta(media).cache()
    kinds = {r["kind"] for r in meta.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = meta.filter(F.col("kind") == "image").first()
    # image geometry is a pure function of doc_id: w = id%37+8, h = id%23+8
    assert img["width"] == img["media_id"] % 37 + 8
    assert img["height"] == img["media_id"] % 23 + 8
    aud = meta.filter(F.col("kind") == "audio").first()
    assert aud["sample_rate"] == 16000
    vid = meta.filter(F.col("kind") == "video").first()
    assert vid["n_frames"] == vid["media_id"] % 5 + 2


def test_image_features_deterministic(media):
    feats = image_features(media).orderBy("media_id")
    rows = feats.collect()
    assert rows, "no image rows"
    for r in rows:
        assert sum(r["histogram"]) == r["width"] * r["height"]
        assert 0.0 <= r["mean_px"] <= 255.0
    # determinism: same input → identical features on a rerun
    again = image_features(media).orderBy("media_id").collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in again]


def test_resize_roundtrip(media):
    out = resize_images(media, 4, 3)
    r = out.first()
    assert r["width"] == 4 and r["height"] == 3
    d = _decode(r["payload"])
    assert d["kind"] == "image" and len(d["body"]) == 12
    # resized payload is itself decodable by the rest of the stack
    assert image_features(out).first()["width"] == 4


def test_sample_frames_one_to_many(media):
    frames = sample_frames(media, every=2).cache()
    meta = decode_meta(media).filter(F.col("kind") == "video")
    expected = sum(
        len(range(0, r["n_frames"], 2)) for r in meta.collect()
    )
    assert frames.count() == expected
    f0 = frames.orderBy("media_id", "frame_idx").first()
    assert f0["frame_idx"] == 0 and len(f0["frame"]) > 0


def test_real_codec_raises():
    with pytest.raises(NotImplementedError):
        _decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_fake_codec_roundtrip_unit():
    img = encode_fake_image(5, 4, b"s")
    d = _decode(img)
    assert (d["width"], d["height"], len(d["body"])) == (5, 4, 20)
    aud = encode_fake_audio(8000, 100, b"s")
    assert _decode(aud)["sample_rate"] == 8000
    vid = encode_fake_video(3, 3, 4, b"s")
    dv = _decode(vid)
    assert dv["n_frames"] == 4 and len(dv["body"]) == 36
    assert struct.unpack(">II", img[4:12]) == (5, 4)
