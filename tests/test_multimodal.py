"""Multimodal binary-column plumbing: features, resize, frame sampling."""

from pyspark.sql import functions as F

from collection_templates_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    repartition_by_payload_size,
    resize_images,
    sample_frames,
)


def _media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    return documents_as_media(docs)


def test_extract_features_deterministic(spark):
    m = _media(spark)
    a = {(r.media_id, r.n_bytes, r.head_md5) for r in extract_features(m).collect()}
    b = {(r.media_id, r.n_bytes, r.head_md5) for r in extract_features(m).collect()}
    assert a == b and len(a) == 20
    one = next(iter(a))
    assert one[1] > 0 and len(one[2]) == 16


def test_resize_images_schema_and_size(spark):
    out = resize_images(_media(spark), width=64, height=64).collect()
    assert len(out) == 20
    for r in out:
        assert r.meta_width == 64 and r.meta_height == 64
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) > 0


def test_sample_frames(spark):
    out = sample_frames(_media(spark), every_ms=500, max_frames=4).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    assert all(len(v) <= 4 for v in by_media.values())
    frames = sorted(by_media[out[0].media_id], key=lambda r: r.frame_idx)
    assert [f.frame_ms for f in frames] == [i * 500 for i in range(len(frames))]
    assert len({bytes(f.payload) for f in frames}) == len(frames)  # distinct


def test_repartition_by_payload_size(spark):
    m = _media(spark)
    out = repartition_by_payload_size(m, target_bytes=1024)
    assert out.rdd.getNumPartitions() >= 2  # 20 docs × ~200B ≫ 1 KB target
    assert out.count() == 20


def test_decode_image_is_stubbed():
    import pytest

    from collection_templates_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
