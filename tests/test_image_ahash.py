"""Perceptual average-hash over the REAL PNG decode
(multimodal.image_ahash): a brightness-jittered copy stays within a few
Hamming bits, a structurally different image lands far away, and
undecodable payloads yield NULL — the near-duplicate-image key."""

from collection_templates_spark.functions.png import encode_png
from collection_templates_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    image_ahash,
)


def _gradient_png(w=32, h=32, jitter=0):
    # horizontal gradient: left dark, right bright (strong 8x8 structure)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = min(255, (x * 255) // (w - 1) + jitter)
            px += bytes((v, v, v))
    return encode_png(w, h, bytes(px), color_type=2)


def _checker_png(w=32, h=32):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if ((x // 4) + (y // 4)) % 2 == 0 else 0
            px += bytes((v, v, v))
    return encode_png(w, h, bytes(px), color_type=2)


def _hamming(a, b):
    return bin((a & (2**64 - 1)) ^ (b & (2**64 - 1))).count("1")


def test_ahash_near_dup_vs_different(spark):
    rows = [
        (1, "image", _gradient_png(), None, None, None),
        (2, "image", _gradient_png(jitter=6), None, None, None),   # jittered
        (3, "image", _gradient_png(48, 24), None, None, None),     # resized
        (4, "image", _checker_png(), None, None, None),            # different
        (5, "image", b"not a png at all", None, None, None),       # broken
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert out[5] is None
    assert out[1] is not None
    # jitter and resize survive: same structure, tiny Hamming distance
    assert _hamming(out[1], out[2]) <= 4
    assert _hamming(out[1], out[3]) <= 8
    # a checkerboard is nothing like a gradient
    assert _hamming(out[1], out[4]) >= 16


def test_ahash_deterministic(spark):
    rows = [(1, "image", _gradient_png(), None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    a = image_ahash(media).collect()[0].ahash
    b = image_ahash(media).collect()[0].ahash
    assert a == b
