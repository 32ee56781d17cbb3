"""GIF decoder contracts (functions/gif.py).

Fixtures come from ``encode_gif`` — the no-growth LZW form (CLEAR before
every literal) is spec-valid and hand-derivable, while decode still
exercises real LSB-first variable-width unpacking, CLEAR/EOI handling,
color tables, sub-block framing and interlace reordering. A separate
test feeds a table-GROWING stream (raw hand-packed codes) so the
dictionary path is covered too.
"""

import struct

import numpy as np
import pytest

from collection_templates_spark.functions.gif import decode_gif, encode_gif

PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def _rgb(px, w, h):
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)


def test_solid_and_pattern_roundtrip():
    grid = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]]
    w, h, ct, px = decode_gif(encode_gif(grid, PAL4))
    assert (w, h, ct) == (4, 3, 2)
    rgb = _rgb(px, w, h)
    for y, row in enumerate(grid):
        for x, ci in enumerate(row):
            assert tuple(rgb[y, x].tolist()) == PAL4[ci], (y, x)


def test_interlaced_rows_reorder():
    # 9 rows, each a solid color index — interlace pass order is
    # 0,8 / 4 / 2,6 / 1,3,5,7; deinterlace must restore row identity
    grid = [[y % 4] * 2 for y in range(9)]
    data = encode_gif(grid, PAL4, interlaced=True)
    w, h, ct, px = decode_gif(data)
    assert (w, h) == (2, 9)
    rgb = _rgb(px, w, h)
    for y in range(9):
        assert tuple(rgb[y, 0].tolist()) == PAL4[y % 4], y


def test_growing_lzw_table():
    """Hand-packed LZW stream WITHOUT per-literal clears: the dictionary
    grows and a dictionary code is emitted (and the KwKwK self-reference
    case), proving the real decoder paths beyond the fixture form."""
    # palette bits=2 -> clear=4, eoi=5, width starts at 3
    # codes: CLEAR, 0, 1, 6(="01"), 1, EOI → decoded indices 0 1 0 1 1
    #   after CLEAR: prev=None
    #   0 -> out [0]; prev=[0]
    #   1 -> out [1]; table[6]=[0,1]; prev=[1]
    #   6 -> out [0,1]; table[7]=[1,0]; prev=[0,1]
    #   1 -> out [1]; table[8]=[0,1,1]; width grows to 4 at next_code=8
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (1, 4), (5, 4)]
    acc = 0
    nbits = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 5, 1, 0x81, 0, 0)  # GCT, 4 entries
    for r, g, b in PAL4:
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 5, 1, 0)
    out += bytes([2])
    out += bytes([len(data)]) + data + b"\x00\x3b"
    w, h, ct, px = decode_gif(bytes(out))
    assert (w, h) == (5, 1)
    rgb = _rgb(px, w, h)
    for x, ci in enumerate([0, 1, 0, 1, 1]):
        assert tuple(rgb[0, x].tolist()) == PAL4[ci], x


def test_local_color_table_overrides_global():
    grid = [[0, 1]]
    data = bytearray(encode_gif(grid, PAL4))
    # rewrite: strip GCT flag, attach the table to the image descriptor
    # header: 6 sig + 7 LSD; GCT = 12 bytes; image descriptor after
    lsd_packed = data[10]
    assert lsd_packed & 0x80
    gct = bytes(data[13 : 13 + 12])
    rest = bytes(data[13 + 12 :])
    assert rest[0] == 0x2C
    new = bytes(data[:10]) + bytes([lsd_packed & 0x7F]) + bytes(data[11:13])
    new += rest[:9] + bytes([rest[9] | 0x81]) + gct + rest[10:]
    w, h, ct, px = decode_gif(new)
    rgb = _rgb(px, w, h)
    assert tuple(rgb[0, 0].tolist()) == PAL4[0]
    assert tuple(rgb[0, 1].tolist()) == PAL4[1]


def test_extension_blocks_skipped():
    grid = [[2, 2], [3, 3]]
    data = bytearray(encode_gif(grid, PAL4))
    # insert a Graphic Control Extension before the image descriptor
    idx = data.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(data[:idx]) + gce + bytes(data[idx:])
    w, h, ct, px = decode_gif(patched)
    rgb = _rgb(px, w, h)
    assert tuple(rgb[0, 0].tolist()) == PAL4[2]
    assert tuple(rgb[1, 1].tolist()) == PAL4[3]


def test_decode_image_routes_gif():
    from collection_templates_spark.operators.multimodal import decode_image

    w, h, ct, px = decode_image(encode_gif([[1]], PAL4))
    assert (w, h, ct) == (1, 1, 2)
    assert tuple(px) == PAL4[1]


def test_malformed_gifs_raise_valueerror_only():
    good = encode_gif([[0, 1], [2, 3]], PAL4)
    corruptions = [
        good[:5],
        good[:12],
        good[:20],
        good[:-3],
        good[:6] + b"\x00" * (len(good) - 6),
        bytes(good).replace(b"\x2c", b"\x2d", 1),
    ]
    for bad in corruptions:
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_byte_flip_fuzz_never_escapes_valueerror():
    data = encode_gif([[y % 4] * 3 for y in range(4)], PAL4)
    for i in range(len(data)):
        for repl in (0x00, 0xFF):
            bad = data[:i] + bytes([repl]) + data[i + 1 :]
            try:
                decode_gif(bad)
            except ValueError:
                pass
