"""AVI/MJPEG container contracts (functions/avi.py) and the real
video frame-sampling path (operators/multimodal.sample_frames).

Fixtures: flat-block JPEGs from encode_flat_jpeg wrapped in a minimal
AVI by encode_avi_mjpeg — every sampled frame decodes through the real
baseline-JPEG path, so the container parse and the pixel decode are
pinned end-to-end.
"""

import struct

import pytest

from collection_templates_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from collection_templates_spark.functions.jpeg import (
    decode_jpeg,
    encode_flat_jpeg,
)


def _frames(levels):
    return [encode_flat_jpeg([[v]]) for v in levels]


def test_container_roundtrip_and_frame_decode():
    levels = [40, 120, 200]
    avi = encode_avi_mjpeg(_frames(levels), 8, 8, usec_per_frame=33_333)
    w, h, usec, frames = decode_avi_mjpeg(avi)
    assert (w, h, usec) == (8, 8, 33_333)
    assert len(frames) == 3
    for f, v in zip(frames, levels):
        fw, fh, ct, px = decode_jpeg(f)
        assert (fw, fh) == (8, 8)
        assert px[0] == pytest.approx(v, abs=2)


def test_container_error_paths():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # a 'video' whose frames are not JPEG → NotImplementedError
    avi = encode_avi_mjpeg([b"\x00\x01\x02\x03"], 4, 4)
    with pytest.raises(NotImplementedError):
        decode_avi_mjpeg(avi)
    # truncated container: the movi LIST's declared size overruns
    good = encode_avi_mjpeg(_frames([99]), 8, 8)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(good[:-10])


def test_sample_frames_real_avi(spark):
    from collection_templates_spark.operators.multimodal import (
        sample_frames,
    )

    levels = [10, 60, 110, 160, 210]
    # 2 fps (500 ms per frame); sample every 1000 ms -> frames 0, 2, 4
    avi = encode_avi_mjpeg(_frames(levels), 8, 8, usec_per_frame=500_000)
    media = spark.createDataFrame(
        [(1, bytearray(avi))], "media_id long, payload binary"
    )
    rows = sample_frames(media, every_ms=1000, max_frames=8).collect()
    assert [(r.frame_idx, r.frame_ms) for r in rows] == [
        (0, 0), (1, 1000), (2, 2000)
    ]
    for r, v in zip(rows, [10, 110, 210]):
        fw, fh, ct, px = decode_jpeg(bytes(r.payload))
        assert px[0] == pytest.approx(v, abs=2)


def test_sample_frames_fake_path_preserved(spark):
    from collection_templates_spark.operators.multimodal import (
        sample_frames,
    )

    blob = bytes(range(256)) * 2
    media = spark.createDataFrame(
        [(7, bytearray(blob))], "media_id long, payload binary"
    )
    rows = sample_frames(media, every_ms=250, max_frames=3).collect()
    assert [(r.frame_idx, r.frame_ms) for r in rows] == [
        (0, 0), (1, 250), (2, 500)
    ]
    assert bytes(rows[1].payload) == blob[16:32]
