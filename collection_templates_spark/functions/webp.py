"""Pure-stdlib WebP-lossless (VP8L) codec: a real decoder for the
multimodal column path plus a minimal spec-valid encoder for fixtures.

Decoder coverage of the public VP8L bitstream spec (the WebP Lossless
Bitstream Specification, google/libwebp docs — implemented from the
spec text, no code ported): RIFF/WEBP container, simple AND normal
(code-length-coded) prefix codes, meta-prefix image, color cache,
LZ77 backward references with the 120-entry 2-D distance map, and all
four transforms (predictor's 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling). Lossy VP8 and animated
VP8X stay environment-limited (NotImplementedError), matching the
multimodal dispatch convention (operators/multimodal.py).

The encoder exists to make fixtures: literal-only coding (no LZ77, no
cache, no transforms) with NORMAL code-length-coded prefix codes, so a
round-trip exercises the decoder's canonical-Huffman and
code-length-decoding machinery; tests hand-pack streams with
``BitWriter`` for the LZ77/cache/transform paths.

Reference parity note: the reference repo has no image path at all —
this backs the beyond-reference multimodal operators (SURVEY §2 "LLM
pipeline" extensions), same role as functions/png.py / jpeg.py /
gif.py.
"""

from __future__ import annotations

import struct

# order in which code-length code lengths are stored
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# (dx, dy) neighborhood for distance codes 1..120 (spec table);
# dist = dy * xsize + dx, clamped to >= 1
DISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_MAX_PIXELS = 16_000_000  # same guard class as png/gif/jpeg decoders


class BitReader:
    """LSB-first bit reader over bytes (the VP8L convention)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    """LSB-first bit writer (fixture encoder / hand-packed tests)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)


class _Huffman:
    """Canonical prefix-code decoder built from code lengths.

    Lengths follow the deflate/VP8L canonical rule: shorter codes
    first, ties by symbol order, codes assigned MSB-first then read
    bit-reversed (VP8L streams prefix codes most-significant-bit
    first within the LSB-first byte stream — i.e. each code's bits
    arrive first-bit-first, so the decoder walks a binary trie).
    """

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]) -> None:
        self.single: int | None = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            return
        # canonical code assignment
        max_len = max(l for l, _ in nz)
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        if (code + bl_count[max_len]) > (1 << max_len):
            raise ValueError("VP8L: over-subscribed prefix code")
        self.table = {}
        for s, l in enumerate(lengths):
            if l > 0:
                self.table[(l, next_code[l])] = s
                next_code[l] += 1

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            if length > 15:
                raise ValueError("VP8L: invalid prefix code in stream")
            sym = self.table.get((length, code))
            if sym is not None:
                return sym


def _read_prefix_code(br: BitReader, alphabet_size: int) -> _Huffman:
    """One prefix code: simple (1-2 symbols) or normal form."""
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _Huffman(lengths)
    # normal: code-length code, then symbol lengths with repeats
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_huff = _Huffman(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nonzero = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev_nonzero = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= alphabet_size:
                    break
                lengths[i] = prev_nonzero
                i += 1
        elif cl == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


def _prefix_value(br: BitReader, sym: int) -> int:
    """Length/distance prefix decode: symbol -> value (spec formula)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_entropy_image(
    br: BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Decode one 'spatially-coded image' (the main ARGB plane or a
    transform/meta sub-image) into a list of w*h ARGB uint32."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("VP8L: bad image dimensions")
    cache_bits = 0
    cache: list[int] = []
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
        cache = [0] * (1 << cache_bits)
    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        num_groups = max(meta) + 1
        meta_w = mw
    groups = []
    green_alphabet = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alphabet),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    pix: list[int] = [0] * (w * h)
    pos = 0
    n = w * h

    def cache_insert(argb: int) -> None:
        if cache_bits:
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            green = s
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (green << 8) | blue
            pix[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist_sym = g[4].read(br)
            dist_code = _prefix_value(br, dist_sym)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DISTANCE_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                cache_insert(argb)
                pos += 1
        else:
            if not cache_bits:
                raise ValueError("VP8L: cache symbol without color cache")
            pix[pos] = cache[s - 280]
            pos += 1
    return pix


def _sub(v: int) -> int:
    """Sign-extend the low byte to the color-transform delta domain."""
    return v - 256 if v >= 128 else v


def _apply_inverse_transforms(
    pix: list[int], w: int, h: int, transforms: list[tuple]
) -> tuple[list[int], int]:
    """Apply inverse transforms in reverse encode order; returns the
    (pixels, true_width) — color-indexing changes the width back."""
    for t in reversed(transforms):
        kind = t[0]
        if kind == 3:  # color indexing
            _, palette, packed_w, width_bits = t
            # unbundle sub-byte indices from the green channel
            out = [0] * (w * h)
            if width_bits == 0:
                for i, p in enumerate(pix):
                    idx = (p >> 8) & 0xFF
                    out[i] = palette[idx] if idx < len(palette) else 0
            else:
                pixels_per_byte = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                for y in range(h):
                    for x in range(w):
                        packed = pix[y * packed_w + (x >> width_bits)]
                        green = (packed >> 8) & 0xFF
                        idx = (green >> (bits * (x & (pixels_per_byte - 1)))) & mask
                        out[y * w + x] = (
                            palette[idx] if idx < len(palette) else 0
                        )
            pix = out
        elif kind == 2:  # subtract green
            for i, p in enumerate(pix):
                g = (p >> 8) & 0xFF
                r = ((p >> 16) & 0xFF) + g & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                pix[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif kind == 1:  # cross-color transform
            _, size_bits, timg, tw = t
            for y in range(h):
                for x in range(w):
                    e = timg[(y >> size_bits) * tw + (x >> size_bits)]
                    g2r = _sub(e & 0xFF)
                    g2b = _sub((e >> 8) & 0xFF)
                    r2b = _sub((e >> 16) & 0xFF)
                    p = pix[y * w + x]
                    a = (p >> 24) & 0xFF
                    r = (p >> 16) & 0xFF
                    g = (p >> 8) & 0xFF
                    b = p & 0xFF
                    r = (r + ((g2r * _sub(g)) >> 5)) & 0xFF
                    b = (b + ((g2b * _sub(g)) >> 5)) & 0xFF
                    b = (b + ((r2b * _sub(r)) >> 5)) & 0xFF
                    pix[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b
        elif kind == 0:  # predictor transform
            _, size_bits, timg, tw = t
            pix = _inverse_predictor(pix, w, h, size_bits, timg, tw)
    return pix, w


def _avg2(a: int, b: int) -> int:
    return sum(
        ((((a >> s) & 0xFF) + ((b >> s) & 0xFF)) // 2) << s
        for s in (24, 16, 8, 0)
    )


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        v = ((a >> s) & 0xFF) + ((b >> s) & 0xFF) - ((c >> s) & 0xFF)
        out |= max(0, min(255, v)) << s
    return out


def _clamp_add_sub_half(a: int, b: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        x = ((a >> s) & 0xFF)
        bb = (b >> s) & 0xFF
        v = x + (x - bb) // 2
        out |= max(0, min(255, v)) << s
    return out


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for s in (24, 16, 8, 0):
        pred_l = abs(((t >> s) & 0xFF) - ((tl >> s) & 0xFF))
        pred_t = abs(((l >> s) & 0xFF) - ((tl >> s) & 0xFF))
        pl += pred_l
        pt += pred_t
    return l if pl <= pt else t


def _inverse_predictor(
    pix: list[int], w: int, h: int, size_bits: int, timg: list[int], tw: int
) -> list[int]:
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]  # L
            elif x == 0:
                pred = out[i - w]  # T
            else:
                mode = (timg[(y >> size_bits) * tw + (x >> size_bits)] >> 8) & 0xFF
                L = out[i - 1]
                T = out[i - w]
                TL = out[i - w - 1]
                TR = out[i - w + 1] if x + 1 < w else out[i - w]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            p = pix[i]
            out[i] = (
                ((((p >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
                | ((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | ((p & 0xFF) + (pred & 0xFF)) & 0xFF
            )
    return out


def decode_vp8l_stream(data: bytes) -> tuple[int, int, bytes]:
    """Decode a raw VP8L bitstream -> (width, height, RGBA bytes)."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    if w * h > _MAX_PIXELS:
        raise ValueError("VP8L: image too large")

    transforms: list[tuple] = []
    seen = set()
    img_w = w  # color-indexing shrinks the coded width
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: repeated transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / cross-color
            size_bits = br.read(3) + 2
            tw = (img_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            timg = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, size_bits, timg, tw))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            palette_size = br.read(8) + 1
            pimg = _decode_entropy_image(br, palette_size, 1, False)
            # palette entries are delta-coded componentwise
            palette = []
            prev = 0
            for p in pimg:
                cur = (
                    ((((prev >> 24) & 0xFF) + ((p >> 24) & 0xFF)) & 0xFF) << 24
                    | ((((prev >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8
                    | (((prev & 0xFF) + (p & 0xFF)) & 0xFF)
                )
                palette.append(cur)
                prev = cur
            if palette_size <= 2:
                width_bits = 3
            elif palette_size <= 4:
                width_bits = 2
            elif palette_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            packed_w = (img_w + (1 << width_bits) - 1) >> width_bits
            transforms.append((3, palette, packed_w, width_bits))
            img_w = packed_w

    pix = _decode_entropy_image(br, img_w, h, True)
    pix, _ = _apply_inverse_transforms(pix, w, h, transforms)
    out = bytearray(w * h * 4)
    for i, p in enumerate(pix):
        out[4 * i] = (p >> 16) & 0xFF  # R
        out[4 * i + 1] = (p >> 8) & 0xFF  # G
        out[4 * i + 2] = p & 0xFF  # B
        out[4 * i + 3] = (p >> 24) & 0xFF  # A
    return w, h, bytes(out)


def decode_webp(payload: bytes) -> tuple[int, int, int, bytes]:
    """RIFF container -> (width, height, color_type=6/RGBA, pixels).

    Lossless (VP8L) decodes for real; lossy VP8 / extended VP8X raise
    NotImplementedError (the multimodal fake_decode fallback contract).
    """
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    off = 12
    while off + 8 <= len(payload):
        fourcc = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if fourcc == b"VP8L":
            if len(body) < size:
                raise ValueError("WebP: truncated VP8L chunk")
            w, h, rgba = decode_vp8l_stream(body)
            return w, h, 6, rgba
        if fourcc in (b"VP8 ", b"VP8X"):
            # Deliberately NOT implemented from scratch (r13 decision):
            # VP8L was feasible because its entropy coding is
            # SELF-DESCRIBING — every prefix code is carried in the
            # stream, so the decoder needs no normative constants
            # beyond the structured 120-entry distance map. Lossy VP8
            # (RFC 6386) is the opposite: its boolean-arithmetic
            # decoder leans on ~2,000 normative spec constants (the
            # 4×8×3×11 default coefficient probabilities, the
            # 10×10×9 keyframe bmode probabilities, the 2×128
            # quantizer lookups) that are not derivable from first
            # principles and have no source in this container (no
            # libvpx, no Pillow, no ffmpeg). A decoder with invented
            # tables would round-trip against a same-tabled fixture
            # encoder while being wrong on EVERY real file — a worse
            # outcome than this honest fallback. Revisit iff a
            # normative table source lands in the environment.
            raise NotImplementedError(
                "lossy/extended WebP needs libwebp (or at minimum RFC "
                "6386's normative probability/quantizer tables, which "
                "this container has no source for); only VP8L "
                "(lossless) decodes here"
            )
        off += 8 + size + (size & 1)
    raise ValueError("WebP: no image chunk found")


def _write_prefix_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Emit a NORMAL-form prefix code whose code-length code is the
    trivial all-literal one (every used length coded in 3-bit CL codes
    of equal length — we give every CL symbol 0..15 that appears a
    nonzero CL-code length by construction)."""
    used = sorted({l for l in lengths})
    # code-length code: give each used length symbol length
    # ceil(log2(len(used))) via canonical assignment over exactly the
    # used symbols (plus padding symbol if count is odd and >1)
    cl_syms = list(used)
    if len(cl_syms) == 1:
        # degenerate: one distinct length; CL huffman with single
        # symbol — decoder's single-symbol path reads no bits
        cl_lengths = {cl_syms[0]: 1}
    else:
        depth = max(1, (len(cl_syms) - 1).bit_length())
        # make the code complete: pad with unused high symbols
        while (len(cl_syms) & (len(cl_syms) - 1)) != 0:
            pad = next(s for s in range(19) if s not in cl_syms)
            cl_syms.append(pad)
            cl_syms.sort()
            depth = max(1, (len(cl_syms) - 1).bit_length())
        cl_lengths = {s: depth for s in cl_syms}
    order_pos = {s: i for i, s in enumerate(CODE_LENGTH_ORDER)}
    num_cl = max(order_pos[s] for s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write(0, 1)  # normal code
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        s = CODE_LENGTH_ORDER[i]
        bw.write(cl_lengths.get(s, 0), 3)
    bw.write(0, 1)  # no max_symbol
    # canonical CL codes (MSB-first emission)
    huff = _canonical_codes(cl_lengths)
    for l in lengths:
        code, nbits = huff[l]
        for i in range(nbits - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) canonical assignment (deflate rule)."""
    by_len: dict[int, list[int]] = {}
    for s, l in lengths.items():
        if l > 0:
            by_len.setdefault(l, []).append(s)
    max_len = max(by_len)
    bl_count = [len(by_len.get(l, ())) for l in range(max_len + 1)]
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for l in sorted(by_len):
        for s in sorted(by_len[l]):
            out[s] = (next_code[l], l)
            next_code[l] += 1
    return out


def encode_webp_lossless(pixels: list[list[tuple]], ) -> bytes:
    """Minimal spec-valid VP8L encoder for fixtures: literal-only
    (no LZ77/cache/transforms), NORMAL prefix codes built from the
    actual symbol frequencies' support (uniform depths — valid, not
    optimal). ``pixels`` is rows of (r, g, b) or (r, g, b, a).
    """
    h = len(pixels)
    w = len(pixels[0])
    rows = [
        [(p if len(p) == 4 else (*p, 255)) for p in row] for row in pixels
    ]

    def channel_lengths(values: set[int], alphabet: int) -> list[int]:
        syms = sorted(values)
        if len(syms) == 1:
            lengths = [0] * alphabet
            lengths[syms[0]] = 1  # handled by single-symbol path? no:
            # single nonzero length builds a 1-bit code; pad for
            # completeness with the next symbol
            other = (syms[0] + 1) % alphabet
            lengths[other] = 1
            return lengths
        # complete code: pad symbol set to a power of two
        padded = list(syms)
        cand = 0
        while (len(padded) & (len(padded) - 1)) != 0:
            while cand in values or cand in padded:
                cand += 1
            padded.append(cand)
        depth = (len(padded) - 1).bit_length()
        lengths = [0] * alphabet
        for s in padded:
            lengths[s] = depth
        return lengths

    greens = {p[1] for row in rows for p in row}
    reds = {p[0] for row in rows for p in row}
    blues = {p[2] for row in rows for p in row}
    alphas = {p[3] for row in rows for p in row}

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if any(p[3] != 255 for row in rows for p in row) else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix image

    g_lengths = channel_lengths(greens, 256 + 24)
    r_lengths = channel_lengths(reds, 256)
    b_lengths = channel_lengths(blues, 256)
    a_lengths = channel_lengths(alphas, 256)
    d_lengths = channel_lengths({0}, 40)
    for lengths in (g_lengths, r_lengths, b_lengths, a_lengths, d_lengths):
        _write_prefix_lengths(bw, lengths)

    g_codes = _canonical_codes({i: l for i, l in enumerate(g_lengths) if l})
    r_codes = _canonical_codes({i: l for i, l in enumerate(r_lengths) if l})
    b_codes = _canonical_codes({i: l for i, l in enumerate(b_lengths) if l})
    a_codes = _canonical_codes({i: l for i, l in enumerate(a_lengths) if l})

    def put(codes: dict, sym: int) -> None:
        code, nbits = codes[sym]
        for i in range(nbits - 1, -1, -1):
            bw.write((code >> i) & 1, 1)

    for row in rows:
        for r, g, b, a in row:
            put(g_codes, g)
            put(r_codes, r)
            put(b_codes, b)
            put(a_codes, a)

    vp8l = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
