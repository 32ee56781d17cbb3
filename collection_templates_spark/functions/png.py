"""Pure-stdlib PNG codec (zlib + struct) — the real-decode path for the
multimodal pipeline.

The container has no PIL/libjpeg, but PNG needs neither: the format is
zlib-deflated filtered scanlines in length-tagged chunks (RFC 2083). This
module implements:

- ``encode_png``: 8-bit RGB/RGBA/grayscale, filter 0 scanlines — enough
  to fabricate deterministic test fixtures anywhere;
- ``decode_png``: 8-bit color types 0 (gray), 2 (RGB), 6 (RGBA),
  non-interlaced, with ALL FIVE scanline filters (None/Sub/Up/Average/
  Paeth) unfiltered per the spec, chunk CRCs verified.

Baseline JPEG has its own pure decoder since r6 (``functions/jpeg.py``);
``operators/multimodal.decode_image`` routes PNG payloads here, JPEG
there, and raises only for formats that genuinely need C libraries
(WebP/AVIF, progressive JPEG), so the decode stub documented in rounds
1-4 is now a real decoder for both major formats with zero new
dependencies.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 2
) -> bytes:
    """8-bit non-interlaced PNG from raw pixel bytes (row-major,
    ``channels`` interleaved samples per pixel, no padding)."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"expected {width * height * ch} pixel bytes, got {len(pixels)}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, color_type, raw pixel bytes). Verifies the
    signature and every chunk CRC; supports 8-bit depth, color types
    0/2/6, no interlace — raises ValueError otherwise."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color_type={color_type}"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR chunk")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out += line
        prev = line
    return width, height, color_type, bytes(out)
