"""Pure-stdlib/numpy baseline JPEG decoder — the last real-decode gap of
the multimodal pipeline (r5 verdict #8, mirroring ``functions/png.py``).

The container has no PIL/libjpeg; baseline sequential JPEG (ITU T.81,
the public 1992 spec) needs neither — it is marker-framed segments, two
canonical Huffman table families, run/size entropy coding of zig-zagged
quantized 8×8 DCT blocks, and an inverse DCT:

- ``decode_jpeg``: baseline + extended-sequential Huffman scans
  (SOF0/SOF1), grayscale or YCbCr with arbitrary sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 box-upsampled), restart markers, 8- and 16-bit
  quantization tables → ``(width, height, color_type, pixels)`` with the
  same color_type convention as the PNG codec (0 = gray, 2 = RGB).
- ``encode_flat_jpeg`` (test fixture helper): a valid baseline JPEG for
  images whose 8×8 blocks are each a single flat value — flat blocks
  have ONE nonzero DCT coefficient (DC = 8·(v−128)), so the encoder is
  a DC-difference Huffman coder + EOB per block, yet exercises the full
  decoder path (markers, both table classes, DC prediction, dequant,
  IDCT, level shift, subsampling). Hand-checkable against the spec.

Progressive (SOF2) and arithmetic-coded JPEGs raise
``UnsupportedJpegError`` (a ValueError subclass) — the caller's
documented fallback (``operators/multimodal.fake_decode``) covers
those, now as the exception rather than the rule. Corrupt-data errors
stay plain ValueError so the executor-side degrade-to-NULL boundary
can tell "format this codec doesn't do" from "broken payload" (r7
advice).

No reference-repo counterpart: the reference stores avatar/banner image
URLS only (create_kv.py db5); decoding is this repo's multimodal
extension surface.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpegError(ValueError):
    """A well-formed JPEG in a mode this codec intentionally does not
    implement (progressive/lossless/arithmetic SOF families). Subclasses
    ValueError so generic malformed-payload handling still catches it,
    but lets ``operators/multimodal.decode_image`` route ONLY these to
    the fake_decode fallback while true corruption degrades to NULL."""


#: zig-zag order: index i of the scan → (row, col) in the 8×8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# 8-point DCT-III basis (the IDCT), orthonormalized per T.81 A.3.3:
# s(x) = Σ_u C(u)/2 · S(u) · cos((2x+1)uπ/16)
_IDCT_1D = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def _idct2(block: "np.ndarray") -> "np.ndarray":
    return _IDCT_1D @ block @ _IDCT_1D.T


class _Huff:
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) form."""

    def __init__(self, bits: list[int], values: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment; 0xFF00 stuffing
    removed, RSTn markers resynchronize byte alignment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def _byte(self) -> int:
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            if b != 0xFF:
                return b
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:  # stuffed FF
                return 0xFF
            raise ValueError(f"unexpected marker FF{nxt:02X} in scan")

    def read_bit(self) -> int:
        b = self._byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Skip to just past the next RSTn marker (byte-aligned)."""
        if self.bit:
            self.bit = 0
            # a partially-consumed stuffed FF occupies two bytes
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t raw bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, color_type, pixels): color_type 0 (gray, 1
    byte/px) for 1-component scans, 2 (RGB, 3 bytes/px) for YCbCr.

    Malformed payloads raise ValueError ONLY — corrupt data can hit
    IndexError/KeyError/struct.error deep in the parser (short DQT/SOF
    segments, scans referencing undefined tables, AC runs past 63), and
    the executor-side callers (``operators/multimodal``) promise a
    degrade-to-NULL boundary keyed on ValueError, so everything that is
    a data problem rather than a code bug is normalized here (r6 advice).
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error, ZeroDivisionError) as ex:
        raise ValueError(f"malformed JPEG: {type(ex).__name__}: {ex}") from ex


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    width = height = 0
    restart_interval = 0
    scan: bytes | None = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, td, ta)
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (no segment length)")
        length = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + length]
        if len(seg) != max(0, length - 2):
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i : i + n]
                vals = (
                    struct.unpack(">64H", raw) if pq else list(raw)
                )
                tbl = np.zeros((8, 8))
                for zi, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = vals[zi]
                qt[tq] = tbl
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = seg[i + 17 : i + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, values)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            height, width = struct.unpack(">HH", seg[1:5])
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0xF,
                 seg[8 + 3 * c])
                for c in range(seg[5])
            ]
            if width == 0 or height == 0:
                raise ValueError("zero image dimension in SOF")
            for _cid, ch, cv, _tq in comps:
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("invalid sampling factor in SOF")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"unsupported JPEG mode (SOF marker FF{marker:02X}); "
                "only baseline/extended-sequential Huffman is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c[0]: idx for idx, c in enumerate(comps)}
            scan_comps = [
                (by_id[seg[1 + 2 * s]], seg[2 + 2 * s] >> 4,
                 seg[2 + 2 * s] & 0xF)
                for s in range(ns)
            ]
            scan = payload[pos + length :]
            break
        # APPn / COM / others: skipped
        pos += length
    if scan is None or not comps:
        raise ValueError("no SOS/SOF in JPEG")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for _, h, v, _tq in comps:
        planes.append(np.zeros((mcuy * v * 8, mcux * h * 8)))
    pred = [0] * len(comps)
    rdr = _BitReader(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rdr.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, td, ta in scan_comps:
                _, h, v, tq = comps[ci]
                for by in range(v):
                    for bx in range(h):
                        t = rdr.decode(huff_dc[td])
                        diff = _extend(rdr.read_bits(t), t)
                        pred[ci] += diff
                        coef = np.zeros((8, 8))
                        coef[0, 0] = pred[ci]
                        zi = 1
                        while zi < 64:
                            rs = rdr.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    zi += 16
                                    continue
                                break  # EOB
                            zi += r
                            if zi > 63:
                                raise ValueError("AC coefficient index overflow")
                            rr, cc = _ZIGZAG[zi]
                            coef[rr, cc] = _extend(rdr.read_bits(s), s)
                            zi += 1
                        block = _idct2(coef * qt[tq]) + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full resolution (box), crop, color-convert
    full = []
    for (cid, h, v, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        full.append(up[:height, :width])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 0, px.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
    return width, height, 2, rgb.tobytes()


# ---------------------------------------------------------------------------
# Flat-block encoder: deterministic fixtures with hand-derivable bytes.
# ---------------------------------------------------------------------------

#: minimal DC Huffman table: category t is coded in t+? — use a simple
#: canonical table with categories 0..11 at increasing lengths 2,3,...
_FIX_DC_BITS = [0, 1, 2, 2, 2, 2, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0]
_FIX_DC_VALS = bytes([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
#: AC table only needs EOB (run/size 0x00); one 1-bit code
_FIX_AC_BITS = [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_FIX_AC_VALS = bytes([0x00])


def _fix_dc_codes() -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(_FIX_DC_BITS[length - 1]):
            codes[_FIX_DC_VALS[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        """1-fill to the byte boundary (T.81 fill bits), stuffing a
        resulting 0xFF like any other entropy byte."""
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def marker(self, m: int) -> None:
        self.pad()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_flat_jpeg(
    blocks: "list[list[int]] | np.ndarray",
    subsample: tuple[int, int] = (1, 1),
    chroma_blocks: "tuple | None" = None,
    width: int | None = None,
    height: int | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Valid baseline JPEG whose 8×8 blocks are each one flat value.

    ``blocks``: 2-D grid of luma values (one per 8×8 block). Grayscale
    unless ``chroma_blocks`` = (cb_grid, cr_grid) is given (grids at the
    chroma block resolution implied by ``subsample`` = luma (h, v)).
    Flat value v ⇒ the only DCT coefficient is DC = 8·(v−128); with the
    all-eights quantization table the quantized DC is exactly v−128.
    """
    blocks = np.asarray(blocks, dtype=np.int64)
    by, bx = blocks.shape
    h, v = subsample
    width = width or bx * 8
    height = height or by * 8
    ncomp = 3 if chroma_blocks is not None else 1

    out = bytearray(b"\xff\xd8")  # SOI
    q = bytes([0]) + bytes([8] * 64)  # table 0, all 8s, zigzag-invariant
    out += _seg(0xDB, q)
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    sof += bytes([1, (h << 4) | v, 0])
    if ncomp == 3:
        sof += bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + bytes(_FIX_DC_BITS) + _FIX_DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_FIX_AC_BITS) + _FIX_AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    dc_codes = _fix_dc_codes()
    w = _BitWriter()

    def put_block(value: int, pred: int) -> int:
        diff = (value - 128) - pred
        t = diff.bit_length() if diff else 0
        ln, code = dc_codes[t]
        w.write(code, ln)
        if t:
            raw = diff if diff > 0 else diff + (1 << t) - 1
            w.write(raw, t)
        w.write(0, 1)  # EOB (the 1-bit AC code 0)
        return value - 128

    if ncomp == 1:
        pred = 0
        mcu = 0
        for row in blocks:
            for val in row:
                if restart_interval and mcu and mcu % restart_interval == 0:
                    w.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                    pred = 0
                pred = put_block(int(val), pred)
                mcu += 1
    else:
        cbg = np.asarray(chroma_blocks[0], dtype=np.int64)
        crg = np.asarray(chroma_blocks[1], dtype=np.int64)
        preds = [0, 0, 0]
        mcu = 0
        for my in range(by // v):
            for mx in range(bx // h):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    w.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                    preds = [0, 0, 0]
                mcu += 1
                for byy in range(v):
                    for bxx in range(h):
                        preds[0] = put_block(
                            int(blocks[my * v + byy, mx * h + bxx]), preds[0]
                        )
                preds[1] = put_block(int(cbg[my, mx]), preds[1])
                preds[2] = put_block(int(crg[my, mx]), preds[2])
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
