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


def test_decode_image_unknown_formats_still_stubbed():
    """PNG, baseline JPEG, GIF and lossless WebP decode for real
    (r5/r6/r7/r12); LOSSY WebP (VP8 chunk) stays a clean
    NotImplementedError so callers fall back to fake_decode. A
    truncated JPEG is a ValueError (malformed, not env-limited)."""
    import struct

    import pytest

    from collection_templates_spark.operators.multimodal import decode_image

    vp8_body = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    lossy = (
        b"RIFF"
        + struct.pack("<I", 4 + len(vp8_body))
        + b"WEBP"
        + vp8_body
    )
    with pytest.raises(NotImplementedError):
        decode_image(lossy)
    with pytest.raises(ValueError):
        from collection_templates_spark.functions.jpeg import decode_jpeg

        decode_jpeg(b"\xff\xd8\xff")


def test_extract_audio_features_real_wav_decode(spark):
    """PCM WAV decodes for real via stdlib wave (r5); other formats yield
    null features, mirroring the PNG path."""
    import io
    import struct
    import wave

    from collection_templates_spark.operators.multimodal import (
        extract_audio_features,
    )

    def make_wav(rate, samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    # constant |amplitude| 1000, 8000 samples at 8 kHz = 1000 ms
    wav = make_wav(8000, [1000, -1000] * 4000)
    rows = [(1, wav), (2, b"\x49\x44\x33 not decodable mp3 bytes")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert (got[1]["n_channels"], got[1]["sample_rate"]) == (1, 8000)
    assert got[1]["duration_ms"] == 1000
    assert got[1]["mean_abs_amplitude"] == "1000.000000"
    assert got[2]["n_channels"] is None
