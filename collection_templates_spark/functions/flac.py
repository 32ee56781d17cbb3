"""Pure-stdlib FLAC decoder (+ a minimal fixture encoder for tests).

Closes the compressed-audio gap in the multimodal path the way r12's
VP8L closed the compressed-image one — and for the same reason it is
FEASIBLE where mp3 is not: FLAC (RFC 9639 / the xiph spec) carries no
normative probability or Huffman tables. Everything a decoder needs is
algorithmic — Rice codes (self-describing parameter per partition),
polynomial fixed predictors with pinned small-integer coefficients,
stream-carried LPC coefficients, and two CRCs from known polynomials
(CRC-8 poly 0x07, CRC-16 poly 0x8005). mp3's MPEG-1 Layer III by
contrast needs large normative Huffman/scalefactor tables with no
source in this container, so it stays a documented ``fake_decode``
fallback.

Supported (the full lossless core):
- STREAMINFO parsing + all metadata blocks skipped by length;
- frame headers: sync, UTF-8-coded frame number, all block-size /
  sample-rate / sample-size code paths, CRC-8 verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0–4, LPC orders 1–32,
  wasted-bits unary prefix;
- residual: 4-bit Rice and 5-bit Rice2 partitions, escape-to-raw
  partitions, partition order 0–15;
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries bps+1 — per spec);
- frame CRC-16 verified; decode returns interleaved little-endian PCM
  (the ``decode_audio`` WAV contract).

The encoder exists to MAKE fixtures (constant/verbatim/fixed/LPC
subframes, chosen Rice parameters, mid/side) — tests additionally pin
the decoder against HAND-PACKED bit streams per path so encoder and
decoder cannot share a bug (the r12 VP8L methodology).

Reference analogue: none (the reference has no media surface); this is
the §9 multimodal extension.
"""

from __future__ import annotations

import struct

FLAC_MAGIC = b"fLaC"

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — frame headers."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — frames."""
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = (
                ((c << 1) ^ 0x8005) & 0xFFFF
                if c & 0x8000
                else (c << 1) & 0xFFFF
            )
    return c


class BitReader:
    """MSB-first bit reader over bytes (FLAC is big-endian bit-packed)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            v = (v << 1) | (
                (self.data[self.byte] >> (7 - self.bit)) & 1
            )
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(br: BitReader) -> int:
    """FLAC's UTF-8-style extended coded number (up to 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_residual(br: BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: partition order does not divide blocksize")
    out: list[int] = []
    for p in range(n_parts):
        n = blocksize >> part_order
        if p == 0:
            n -= order
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            out.extend(
                br.read_signed(bits) if bits else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                out.append(_zigzag_decode((q << param) | r))
    return out


def _decode_subframe(br: BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = [v] * blocksize
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coefs)
            )
            samples.append(pred + r)
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        for r in res:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a FLAC stream → (n_channels, sample_rate, n_samples,
    interleaved little-endian PCM bytes) — the ``decode_audio``
    contract. Verifies the header CRC-8 and frame CRC-16; only 8/16-bit
    sample sizes are emitted as PCM (wider inputs decode but are
    rejected at the PCM step to keep the contract exact)."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("FLAC: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (length,) = struct.unpack(
            ">I", b"\x00" + payload[pos + 1 : pos + 4]
        )
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    si = BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total_samples = si.read(36)

    channels_out: list[list[int]] = [[] for _ in range(n_channels)]
    while pos < len(payload):
        frame_start = pos
        br = BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample-rate code")
        bps = _SAMPLE_SIZES.get(ss_code, bps_si) if ss_code else bps_si
        # header CRC-8 covers sync..just before the crc byte (the
        # header is whole bytes by construction: 32 fixed bits + the
        # byte-granular coded number + 8/16-bit extensions)
        assert br.bit == 0
        hdr_end = br.byte
        if crc8(payload[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC: frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_channels:
                raise ValueError("FLAC: channel count mismatch")
            chans = [
                _decode_subframe(br, blocksize, bps)
                for _ in range(n_channels)
            ]
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("FLAC: stereo decorrelation needs 2ch")
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                chans = [
                    [(2 * m + (s & 1) + s) >> 1 for m, s in zip(mid, side)],
                    [(2 * m + (s & 1) - s) >> 1 for m, s in zip(mid, side)],
                ]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        br.align()
        body_end = br.byte
        want = struct.unpack(">H", payload[body_end : body_end + 2])[0]
        if crc16(payload[frame_start:body_end]) != want:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = body_end + 2
        for c, vals in zip(channels_out, chans):
            c.extend(vals)

    n = len(channels_out[0])
    if total_samples and n != total_samples:
        raise ValueError("FLAC: sample count mismatch vs STREAMINFO")
    if bps_si == 16:
        fmt, lo, hi = "<h", -32768, 32767
    elif bps_si == 8:
        fmt, lo, hi = "<b", -128, 127
    else:
        raise ValueError("FLAC: only 8/16-bit PCM emitted")
    out = bytearray()
    for i in range(n):
        for c in channels_out:
            v = c[i]
            if v < lo or v > hi:
                raise ValueError("FLAC: sample out of range")
            out += struct.pack(fmt, v)
    return n_channels, sample_rate, n, bytes(out)


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def write_signed(self, v: int, n: int) -> "BitWriter":
        return self.write(v & ((1 << n) - 1), n)

    def write_unary(self, n: int) -> "BitWriter":
        self.bits.extend([0] * n + [1])
        return self

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def _zigzag_encode(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _write_rice(bw: BitWriter, residual: list[int], param: int) -> None:
    for r in residual:
        z = _zigzag_encode(r)
        bw.write_unary(z >> param)
        if param:
            bw.write(z & ((1 << param) - 1), param)


def encode_flac(
    channels: list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    subframe: str = "fixed2",
    rice_param: int = 3,
    stereo_mode: str | None = None,
) -> bytes:
    """Minimal FLAC encoder for fixtures: one frame holding all
    samples, every channel coded with the requested ``subframe`` type
    ('constant' | 'verbatim' | 'fixed0'..'fixed4' | 'lpc1'), Rice
    partition order 0. ``stereo_mode`` ∈ {None, 'mid_side'}."""
    blocksize = len(channels[0])
    n_channels = len(channels)

    si = BitWriter()
    si.write(blocksize, 16).write(blocksize, 16)
    si.write(0, 24).write(0, 24)
    si.write(sample_rate, 20).write(n_channels - 1, 3).write(bps - 1, 5)
    si.write(blocksize, 36)
    streaminfo = si.to_bytes() + b"\x00" * 16  # md5 unchecked

    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    def write_subframe(bw: BitWriter, samples: list[int], sbps: int) -> None:
        bw.write(0, 1)  # padding
        if subframe == "constant":
            bw.write(0, 6).write(0, 1)
            bw.write_signed(samples[0], sbps)
            return
        if subframe == "verbatim":
            bw.write(1, 6).write(0, 1)
            for s in samples:
                bw.write_signed(s, sbps)
            return
        if subframe.startswith("fixed"):
            order = int(subframe[5:])
            bw.write(8 + order, 6).write(0, 1)
            coefs = _FIXED_COEFS[order]
        elif subframe == "lpc1":
            order = 1
            bw.write(32, 6).write(0, 1)
        else:
            raise ValueError(subframe)
        for s in samples[:order]:
            bw.write_signed(s, sbps)
        if subframe == "lpc1":
            coefs = (1,)
            bw.write(2 - 1, 4)  # precision 2
            bw.write_signed(0, 5)  # shift 0
            bw.write_signed(1, 2)  # coefficient +1
        res = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        bw.write(0, 2)  # 4-bit rice
        bw.write(0, 4)  # partition order 0
        bw.write(rice_param, 4)
        _write_rice(bw, res, rice_param)

    fb = BitWriter()
    fb.write(0b11111111111110, 14).write(0, 1).write(0, 1)
    fb.write(7, 4)  # 16-bit blocksize-1 follows
    fb.write(0, 4)  # sample rate: from STREAMINFO
    if stereo_mode == "mid_side":
        fb.write(10, 4)
    else:
        fb.write(n_channels - 1, 4)
    fb.write(4 if bps == 16 else 1, 3).write(0, 1)
    fb.write(0, 8)  # coded frame number 0
    fb.write(blocksize - 1, 16)
    header = fb.to_bytes()
    header += bytes([crc8(header)])

    body = BitWriter()
    if stereo_mode == "mid_side":
        mid = [
            (l + r) >> 1 for l, r in zip(channels[0], channels[1])
        ]
        side = [l - r for l, r in zip(channels[0], channels[1])]
        write_subframe(body, mid, bps)
        write_subframe(body, side, bps + 1)
    else:
        for ch in channels:
            write_subframe(body, ch, bps)
    frame = header + body.to_bytes()
    frame += struct.pack(">H", crc16(frame))
    return bytes(out) + frame
