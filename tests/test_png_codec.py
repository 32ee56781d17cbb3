"""Pure-stdlib PNG codec + the real multimodal decode path."""

import struct
import zlib

import pytest

from collection_templates_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _gradient(w, h, ch):
    return bytes(((x * 7 + y * 13 + c * 31) & 0xFF)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ctype,ch", [
    (1, 1, 0, 1), (7, 3, 0, 1), (5, 4, 2, 3), (16, 16, 2, 3), (3, 9, 6, 4),
])
def test_roundtrip(w, h, ctype, ch):
    px = _gradient(w, h, ch)
    data = encode_png(w, h, px, color_type=ctype)
    assert data.startswith(PNG_SIGNATURE)
    gw, gh, gc, gpx = decode_png(data)
    assert (gw, gh, gc, gpx) == (w, h, ctype, px)


def _png_with_filters(width, height, ch, ctype, rows_with_filters):
    """Hand-build a PNG whose scanlines use the GIVEN filter types —
    the encoder only emits filter 0, so unfiltering of Sub/Up/Average/
    Paeth must be exercised with crafted IDAT bytes."""
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_with_filters)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_all_filter_types_unfilter_per_spec():
    # grayscale 4x5, one row per filter type; expectations derived by
    # hand from RFC 2083 definitions (bpp=1, so "left" is previous byte)
    rows = [
        (0, [10, 20, 30, 40]),     # None  → 10 20 30 40
        (1, [5, 5, 5, 5]),         # Sub   → 5 10 15 20
        (2, [1, 2, 3, 4]),         # Up    → +prev row [5 10 15 20]
        (3, [10, 10, 10, 10]),     # Avg   → left/up avg + 10
        (4, [1, 1, 1, 1]),         # Paeth
    ]
    data = _png_with_filters(4, 5, 1, 0, rows)
    w, h, ctype, px = decode_png(data)
    assert (w, h, ctype) == (4, 5, 0)
    got = [list(px[y * 4 : (y + 1) * 4]) for y in range(5)]
    assert got[0] == [10, 20, 30, 40]
    assert got[1] == [5, 10, 15, 20]
    assert got[2] == [6, 12, 18, 24]  # Up adds the UNFILTERED row 1
    # Avg row: r3[i] = 10 + floor((left + up)/2); up = r2
    r3 = []
    left = 0
    for up in [6, 12, 18, 24]:
        v = (10 + ((left + up) >> 1)) & 0xFF
        r3.append(v)
        left = v
    assert got[3] == r3
    # Paeth row: predictor of (left, up, upper-left) per spec
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    r4 = []
    left = 0
    for i, up in enumerate(r3):
        ul = r3[i - 1] if i else 0
        v = (1 + paeth(left, up, ul)) & 0xFF
        r4.append(v)
        left = v
    assert got[4] == r4


def test_corrupt_crc_and_bad_signature_raise():
    data = bytearray(encode_png(2, 2, _gradient(2, 2, 3), color_type=2))
    data[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_extract_image_features_real_decode(spark):
    from collection_templates_spark.operators.multimodal import (
        extract_image_features,
    )

    solid = bytes([100, 150, 200]) * (6 * 4)  # 6x4 RGB, mean 150
    rows = [
        (1, encode_png(6, 4, solid, color_type=2)),
        (2, encode_png(2, 2, _gradient(2, 2, 1), color_type=0)),
        (3, b"\xff\xd8\xff not actually decodable jpeg"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (6, 4, 3)
    assert got[1]["mean_sample"] == "150.000000"
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (2, 2, 1)
    assert got[3]["width"] is None  # non-PNG → env-limited, not a crash
