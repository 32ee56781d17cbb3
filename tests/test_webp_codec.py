"""VP8L (WebP lossless) decoder contracts (functions/webp.py).

Round-trip fixtures come from ``encode_webp_lossless`` (literal-only,
normal prefix codes). The LZ77 / color-cache / transform / meta-prefix
paths are exercised by HAND-PACKED bitstreams built with BitWriter —
each expected pixel output is computed independently from the spec
semantics, so encoder and decoder cannot share a bug on those paths.
"""

import struct

import pytest

from collection_templates_spark.functions.webp import (
    BitWriter,
    _canonical_codes,
    _write_prefix_lengths,
    decode_vp8l_stream,
    decode_webp,
    encode_webp_lossless,
)


def _rgba(px, w, h):
    return [
        [tuple(px[4 * (y * w + x) + i] for i in range(4)) for x in range(w)]
        for y in range(h)
    ]


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple_code(bw, symbols):
    """Emit a simple prefix code for 1 or 2 symbols (each < 256)."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _normal_code(bw, length_map, alphabet):
    lengths = [0] * alphabet
    for s, l in length_map.items():
        lengths[s] = l
    _write_prefix_lengths(bw, lengths)
    return _canonical_codes({s: l for s, l in length_map.items()})


def _put(bw, codes, sym):
    code, nbits = codes[sym]
    for i in range(nbits - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def test_roundtrip_pattern_and_alpha():
    img = [
        [(r * 31 % 256, (r + c) * 17 % 256, c * 73 % 256, 255 - 10 * r)
         for c in range(6)]
        for r in range(4)
    ]
    w, h, ct, px = decode_webp(encode_webp_lossless(img))
    assert (w, h, ct) == (6, 4, 6)
    assert _rgba(px, w, h) == img


def test_simple_codes_and_lz77_distance_map():
    # 3x2: one literal pixel then a length-5 copy at distance 1
    # (distance code 2 = DISTANCE_MAP[1] = (1, 0) -> dist 1)
    bw = BitWriter()
    _header(bw, 3, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green code: symbols {5 literal green, 259 = length-sym 3}
    g_codes = _normal_code(bw, {5: 1, 259: 1}, 256 + 24)
    _simple_code(bw, [7])  # red: single symbol, zero bits per read
    _simple_code(bw, [9])  # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [1])  # distance: prefix sym 1 -> value 2
    _put(bw, g_codes, 5)  # literal (a=255, r=7, g=5, b=9)
    _put(bw, g_codes, 259)  # length sym 3 -> value 4, extra 0 bits...
    # prefix sym 3 < 4 -> length = 4; need 5 copies? use length 4 then
    # one more literal to fill 6 pixels: 1 literal + 4 copies + 1 literal
    _put(bw, g_codes, 5)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    assert (w, h) == (3, 2)
    assert _rgba(rgba, w, h) == [[(7, 5, 9, 255)] * 3] * 2


def test_lz77_row_above_and_long_distance():
    # 4x3 stream: 4 literals (distinct), then a copy of the whole first
    # row via distance code 1 = (0,1) -> dist = w; then 4 more copies
    # at plain distance (code 121 -> dist = 1) replicating one pixel
    bw = BitWriter()
    _header(bw, 4, 3)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g_codes = _normal_code(
        bw, {1: 2, 2: 2, 258: 2, 259: 2}, 256 + 24
    )  # greens 1,2; length syms 2 (=3), 3 (=4)
    r_codes = _normal_code(bw, {10: 1, 20: 1}, 256)
    _simple_code(bw, [0])  # blue always 0
    _simple_code(bw, [255])  # alpha
    # distance code: sym 0 -> 1 (map (0,1): dist=w), sym 38 -> ?
    # value(38): extra=(38-2)>>1=18 too big; use sym 4: extra=1,
    # offset=(2+0)<<1=4, value=4+bit+1 -> 5 or 6. We need dist_code 121
    # (plain distance 1): sym 10 -> extra=4, offset=(2+0)<<4=32,
    # value=32+x+1, x=88 impossible. Use map code 2=(1,0)->dist 1: ok.
    d_codes = _normal_code(bw, {0: 1, 1: 1}, 40)
    for g, r in ((1, 10), (2, 20), (1, 10), (2, 20)):
        _put(bw, g_codes, g)
        _put(bw, r_codes, r)
    _put(bw, g_codes, 259)  # length 4
    _put(bw, d_codes, 0)  # dist code 1 -> (0,1) -> dist = 4
    _put(bw, g_codes, 259)  # length 4 again
    _put(bw, d_codes, 0)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    row = [(10, 1, 0, 255), (20, 2, 0, 255), (10, 1, 0, 255), (20, 2, 0, 255)]
    assert _rgba(rgba, w, h) == [row, row, row]


def test_color_cache_hit():
    # literal pixel inserted into a 1-bit cache, then re-emitted via a
    # cache symbol. hash = (0x1e35a7bd * argb) >> 31 for cache_bits=1
    argb = (255 << 24) | (3 << 16) | (200 << 8) | 7
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(1, 4)  # cache_bits = 1
    bw.write(0, 1)  # no meta
    g_codes = _normal_code(bw, {200: 1, 280 + idx: 1}, 256 + 24 + 2)
    _simple_code(bw, [3])
    _simple_code(bw, [7])
    _simple_code(bw, [255])
    _simple_code(bw, [0])
    _put(bw, g_codes, 200)
    _put(bw, g_codes, 280 + idx)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    assert _rgba(rgba, w, h) == [[(3, 200, 7, 255), (3, 200, 7, 255)]]


def test_subtract_green_transform():
    # final pixels have r = g + 5, b = g + 9 (mod 256); stored
    # residuals are r'=5, b'=9 constant
    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_codes = _normal_code(bw, {100: 1, 250: 1}, 256 + 24)
    _simple_code(bw, [5])
    _simple_code(bw, [9])
    _simple_code(bw, [255])
    _simple_code(bw, [0])
    for g in (100, 250, 250, 100):
        _put(bw, g_codes, g)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    def px(g):
        return ((g + 5) % 256, g, (g + 9) % 256, 255)
    assert _rgba(rgba, w, h) == [[px(100), px(250)], [px(250), px(100)]]


def test_color_indexing_bundled():
    # 2-entry palette, 5x1 image -> width_bits=3 (8 px/byte),
    # packed width 1; indices 0,1,1,0,1 pack LSB-first = 0b10110
    bw = BitWriter()
    _header(bw, 5, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # palette_size - 1 = 1
    # palette image (2x1 entropy image, delta coded):
    # entry0 = red, entry1 = entry0 + delta = blue
    bw.write(0, 1)  # no cache
    # green code over {0}, red over {255, 1}, blue {0,255}, alpha {255,0}
    pg = _normal_code(bw, {0: 1, 1: 1}, 256 + 24)
    pr = _normal_code(bw, {255: 1, 1: 1}, 256)
    pb = _normal_code(bw, {0: 1, 255: 1}, 256)
    pa = _normal_code(bw, {255: 1, 0: 1}, 256)
    _simple_code(bw, [0])  # distance unused
    # entry0: argb(255, 255, 0, 0) = red
    _put(bw, pg, 0); _put(bw, pr, 255); _put(bw, pb, 0); _put(bw, pa, 255)
    # delta to blue (0,0,255): dr = 1 (255->0 is +1 mod 256), dg = 0,
    # db = 255, da = 0
    _put(bw, pg, 0); _put(bw, pr, 1); _put(bw, pb, 255); _put(bw, pa, 0)
    bw.write(0, 1)  # no more transforms
    # main image: 1x1 packed pixel, green = 0b10110 = 22
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    mg = _normal_code(bw, {22: 1, 0: 1}, 256 + 24)
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [255])
    _simple_code(bw, [0])
    _put(bw, mg, 22)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    RED, BLUE = (255, 0, 0, 255), (0, 0, 255, 255)
    assert _rgba(rgba, w, h) == [[RED, BLUE, BLUE, RED, BLUE]]


def test_predictor_transform_mode_L():
    # 2x2, predictor blocks of 4 (size_bits=2) -> one 1x1 mode image
    # with mode 1 (predict = Left). Targets:
    #   P00=(10,10,10,255) P10=(12,11,13,255)
    #   P01=(20,30,40,255) P11=(21,32,43,255)
    # residuals (mod 256, alpha too):
    #   S00 = P00 - (0,0,0,255); S10 = P10 - P00 (first row uses L)
    #   S01 = P01 - P00 (first col uses T); S11 = P11 - P01 (mode L)
    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor
    bw.write(0, 3)  # size_bits = 2
    # 1x1 mode image: green = 1
    bw.write(0, 1)  # no cache
    _simple_code(bw, [1])  # green
    _simple_code(bw, [0]); _simple_code(bw, [0]); _simple_code(bw, [0])
    _simple_code(bw, [0])  # distance
    # single-symbol codes read zero bits -> the 1x1 image needs no bits
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residual channels
    g_codes = _normal_code(bw, {10: 2, 1: 2, 20: 2, 2: 2}, 256 + 24)
    r_codes = _normal_code(bw, {10: 2, 2: 2, 1: 2, 0: 2}, 256)
    b_codes = _normal_code(bw, {10: 2, 3: 2, 30: 2, 0: 2}, 256)
    a_codes = _normal_code(bw, {0: 1, 1: 1}, 256)
    _simple_code(bw, [0])
    resid = [
        (10, 10, 10, 0),  # S00 (alpha 255-255=0)
        (2, 1, 3, 0),  # S10
        (10, 20, 30, 0),  # S01
        (1, 2, 3, 0),  # S11
    ]
    for r, g, b, a in resid:
        _put(bw, g_codes, g)
        _put(bw, r_codes, r)
        _put(bw, b_codes, b)
        _put(bw, a_codes, a)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    assert _rgba(rgba, w, h) == [
        [(10, 10, 10, 255), (12, 11, 13, 255)],
        [(20, 30, 40, 255), (21, 32, 43, 255)],
    ]


def test_cross_color_transform():
    # 2x1, one transform element with g2r = 16 -> red gets
    # (16 * sign(g)) >> 5 added; g2b = r2b = 0
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # cross-color
    bw.write(0, 3)  # size_bits = 2
    bw.write(0, 1)  # transform image: no cache
    _simple_code(bw, [0])  # green channel carries g2b = 0
    _simple_code(bw, [0])  # red = r2b = 0
    _simple_code(bw, [16])  # blue channel carries g2r = 16
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    g_codes = _normal_code(bw, {64: 1, 100: 1}, 256 + 24)
    r_codes = _normal_code(bw, {8: 1, 50: 1}, 256)
    _simple_code(bw, [5])
    _simple_code(bw, [255])
    _simple_code(bw, [0])
    # pixel0: g=64 (delta (16*64)>>5 = 32), stored r=8 -> final 40
    _put(bw, g_codes, 64); _put(bw, r_codes, 8)
    # pixel1: g=100 -> delta (16*100)>>5 = 50, stored r=50 -> final 100
    _put(bw, g_codes, 100); _put(bw, r_codes, 50)
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    assert _rgba(rgba, w, h) == [[(40, 64, 5, 255), (100, 100, 5, 255)]]


def test_meta_prefix_two_groups():
    # 8x1 with meta_bits=2 -> two 4-px blocks, each its own code group
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(0, 3)  # meta_bits = 2
    # meta image 2x1: green 0 then 1, red 0 (group ids 0 and 1)
    bw.write(0, 1)  # no cache in meta image
    mg = _normal_code(bw, {0: 1, 1: 1}, 256 + 24)
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [255])
    _simple_code(bw, [0])
    _put(bw, mg, 0)
    _put(bw, mg, 1)
    # group 0: all pixels green 11; group 1: all green 22
    _simple_code(bw, [11])
    _simple_code(bw, [1]); _simple_code(bw, [2]); _simple_code(bw, [255])
    _simple_code(bw, [0])
    _simple_code(bw, [22])
    _simple_code(bw, [3]); _simple_code(bw, [4]); _simple_code(bw, [255])
    _simple_code(bw, [0])
    # 8 pixels: single-symbol codes need no bits at all
    w, h, rgba = decode_vp8l_stream(bw.bytes())
    left, right = (1, 11, 2, 255), (3, 22, 4, 255)
    assert _rgba(rgba, w, h) == [[left] * 4 + [right] * 4]


def test_container_and_error_paths():
    img = [[(1, 2, 3)]]
    data = encode_webp_lossless(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + b"\x00" * 16)  # not WEBP
    with pytest.raises(NotImplementedError):
        # lossy VP8 chunk
        body = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        decode_webp(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body)
    with pytest.raises(ValueError):
        decode_vp8l_stream(b"\x00\x00")  # bad signature
    # truncated stream
    with pytest.raises(ValueError):
        decode_vp8l_stream(data[20:26])


def test_multimodal_dispatch_webp():
    from collection_templates_spark.operators.multimodal import decode_image

    img = [[(9, 8, 7), (6, 5, 4)]]
    w, h, ct, px = decode_image(encode_webp_lossless(img))
    assert (w, h, ct) == (2, 1, 6)
    assert px[:4] == bytes([9, 8, 7, 255])
