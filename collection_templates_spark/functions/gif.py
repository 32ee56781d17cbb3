"""Pure-stdlib GIF decoder — third real image-decode path alongside
``functions/png.py`` and ``functions/jpeg.py`` (r6 verdict #8 optional:
"a GIF (stdlib LZW) decoder if another real decode path is wanted
cheaply").

GIF87a/89a (the public CompuServe/W3C spec) needs no C library: an
LSB-first variable-width LZW stream over palette indices plus a color
table. Implemented:

- ``decode_gif``: header + logical screen descriptor, global and local
  color tables, the FIRST image frame (animation frames beyond the
  first are out of scope for feature extraction), interlaced row
  ordering, extension blocks skipped → ``(width, height, 2, rgb)`` with
  the PNG/JPEG codec's color_type convention (2 = RGB, 3 bytes/px).
- ``encode_gif`` (test fixture helper): spec-valid GIF from an index
  grid + palette. The LZW stream is the no-table-growth form (a CLEAR
  code before every literal), so expected bytes are hand-derivable
  while the decoder still exercises real variable-width unpacking,
  CLEAR handling and EOI.

Malformed payloads raise ValueError ONLY (the executor boundary's
degrade-to-NULL contract — same normalization as decode_jpeg).

No reference-repo counterpart: the reference stores image URLs only
(create_kv.py db5); decoding is this repo's multimodal extension
surface.
"""

from __future__ import annotations

import struct


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code width
    grows when the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader state
    pos = 0
    acc = 0
    nbits = 0

    def read_code(width: int) -> int | None:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    # dictionary: code -> byte sequence
    def reset_table() -> tuple[dict, int, int]:
        table = {i: bytes([i]) for i in range(clear)}
        return table, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("invalid LZW code in GIF data")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW output exceeds image size")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, 2, rgb pixels) for the first image frame."""
    try:
        return _decode_gif(payload)
    except (IndexError, KeyError, struct.error) as ex:
        raise ValueError(f"malformed GIF: {type(ex).__name__}: {ex}") from ex


def _decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[pos : pos + n]
        if len(gct) < n:
            raise ValueError("truncated global color table")
        pos += n

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")

        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("zero image dimension in GIF")
        ct = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            ct = payload[pos : pos + n]
            if len(ct) < n:
                raise ValueError("truncated local color table")
            pos += n
        if ct is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(ipacked & 0x40)

        if pos >= len(payload):
            raise ValueError("truncated GIF (no LZW code size)")
        min_code_size = payload[pos]
        pos += 1
        if not (2 <= min_code_size <= 11):
            raise ValueError(f"bad LZW min code size {min_code_size}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            data += payload[pos : pos + n]
            if len(payload) - pos < n:
                raise ValueError("truncated GIF data sub-block")
            pos += n

        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF LZW output shorter than image")
        idx = idx[: w * h]

        if interlaced:
            deinter = bytearray(w * h)
            src_row = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, h, step):
                    deinter[y * w : (y + 1) * w] = idx[
                        src_row * w : (src_row + 1) * w
                    ]
                    src_row += 1
            idx = deinter

        ncolors = len(ct) // 3
        rgb = bytearray(3 * w * h)
        for i, ci in enumerate(idx):
            if ci >= ncolors:
                raise ValueError("palette index out of range")
            rgb[3 * i : 3 * i + 3] = ct[3 * ci : 3 * ci + 3]
        return w, h, 2, bytes(rgb)
    raise ValueError("no image descriptor in GIF")


def encode_gif(
    indices: "list[list[int]]",
    palette: "list[tuple[int, int, int]]",
    interlaced: bool = False,
) -> bytes:
    """Spec-valid GIF89a fixture from an index grid + palette, using the
    no-growth LZW form (CLEAR before every literal — table never grows,
    code width stays at min_code_size + 1)."""
    h = len(indices)
    w = len(indices[0])
    bits = max(2, (max(1, len(palette) - 1)).bit_length())
    size_field = bits - 1
    n_entries = 1 << bits
    clear = 1 << bits
    eoi = clear + 1
    width = bits + 1

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    for i in range(n_entries):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0
    )
    out += bytes([bits])

    rows = indices
    if interlaced:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = [indices[y] for y in order]

    # LSB-first bit packing
    acc = 0
    nbits = 0
    data = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for row in rows:
        for v in row:
            put(int(v))
            put(clear)
    put(eoi)
    if nbits:
        data.append(acc & 0xFF)

    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
