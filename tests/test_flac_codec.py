"""FLAC decoder: every subframe/residual/stereo path pinned — round
trips through the fixture encoder PLUS hand-packed bit streams per
path so encoder and decoder cannot share a bug (the VP8L methodology,
tests/test_webp_codec.py)."""

import math
import struct

import pytest

from collection_templates_spark.functions.flac import (
    BitReader,
    BitWriter,
    _read_residual,
    _read_utf8_number,
    _zigzag_decode,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _sine(n, amp=1000, period=32, phase=0):
    return [
        int(amp * math.sin(2 * math.pi * (i + phase) / period))
        for i in range(n)
    ]


def _pcm_to_channels(pcm, n_ch):
    vals = struct.unpack(f"<{len(pcm) // 2}h", pcm)
    return [list(vals[c::n_ch]) for c in range(n_ch)]


# ---------------------------------------------------------------------------
# hand-packed primitives
# ---------------------------------------------------------------------------


def test_crc_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 over '123456789' are the
    # standard published check values (CRC-8/SMBUS = 0xF4,
    # CRC-16/BUYPASS = 0xFEE8)
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_bitreader_msb_first():
    br = BitReader(bytes([0b10110001, 0b01000000]))
    assert br.read(3) == 0b101
    assert br.read(6) == 0b100010
    assert br.read_signed(3) == -4  # bits 100


def test_utf8_coded_number_paths():
    # 1-byte, 2-byte, 3-byte forms (hand-packed)
    assert _read_utf8_number(BitReader(bytes([0x41]))) == 0x41
    assert _read_utf8_number(BitReader(bytes([0xC2, 0xA3]))) == 0xA3
    assert (
        _read_utf8_number(BitReader(bytes([0xE2, 0x82, 0xAC]))) == 0x20AC
    )
    with pytest.raises(ValueError):
        _read_utf8_number(BitReader(bytes([0xC2, 0xC0])))


def test_zigzag():
    assert [_zigzag_decode(v) for v in range(6)] == [0, -1, 1, -2, 2, -3]


def test_rice_residual_hand_packed():
    """Residual [3, -2, 0, 5] with rice param 2, partition order 0:
    zigzag → [6, 3, 0, 10]; each as unary(q)+2 bits: q=1 r=2 → 01 10,
    q=0 r=3 → 1 11, q=0 r=0 → 1 00, q=2 r=2 → 001 10."""
    bw = BitWriter()
    bw.write(0, 2)  # method: 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(2, 4)  # rice param 2
    for bits in ("0110", "111", "100", "00110"):
        for b in bits:
            bw.write(int(b), 1)
    br = BitReader(bw.to_bytes())
    assert _read_residual(br, 4, 0) == [3, -2, 0, 5]


def test_rice_escape_partition_hand_packed():
    """Escape parameter (0b1111) → 5-bit raw bitcount, verbatim
    residuals."""
    bw = BitWriter()
    bw.write(0, 2).write(0, 4)
    bw.write(15, 4)  # escape
    bw.write(6, 5)  # 6 raw bits per residual
    bw.write_signed(-17, 6).write_signed(20, 6)
    br = BitReader(bw.to_bytes())
    assert _read_residual(br, 2, 0) == [-17, 20]


# ---------------------------------------------------------------------------
# full-stream paths (fixture encoder round trips)
# ---------------------------------------------------------------------------


def test_constant_subframe_roundtrip():
    ch, sr, n, pcm = decode_flac(
        encode_flac([[-42] * 64], subframe="constant")
    )
    assert (ch, sr, n) == (1, 8000, 64)
    assert _pcm_to_channels(pcm, 1)[0] == [-42] * 64


def test_verbatim_subframe_roundtrip():
    data = _sine(48)
    _, _, _, pcm = decode_flac(encode_flac([data], subframe="verbatim"))
    assert _pcm_to_channels(pcm, 1)[0] == data


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    data = _sine(96, amp=700, period=24)
    _, _, _, pcm = decode_flac(
        encode_flac([data], subframe=f"fixed{order}", rice_param=6)
    )
    assert _pcm_to_channels(pcm, 1)[0] == data


def test_lpc_subframe_roundtrip():
    data = _sine(64, amp=500)
    _, _, _, pcm = decode_flac(
        encode_flac([data], subframe="lpc1", rice_param=6)
    )
    assert _pcm_to_channels(pcm, 1)[0] == data


def test_stereo_independent_and_mid_side():
    left = _sine(64, amp=800)
    right = _sine(64, amp=600, phase=5)
    for mode in (None, "mid_side"):
        ch, _, n, pcm = decode_flac(
            encode_flac(
                [left, right],
                subframe="fixed2",
                rice_param=6,
                stereo_mode=mode,
            )
        )
        assert (ch, n) == (2, 64)
        got = _pcm_to_channels(pcm, 2)
        assert got[0] == left and got[1] == right, mode


def test_8bit_roundtrip():
    data = [(-60 + 3 * i) % 100 - 50 for i in range(32)]
    ch, _, n, pcm = decode_flac(
        encode_flac([data], bps=8, subframe="verbatim")
    )
    vals = list(struct.unpack(f"<{n}b", pcm))
    assert vals == data


def test_crc_corruption_detected():
    blob = bytearray(encode_flac([_sine(32)], subframe="fixed1"))
    blob[-3] ^= 0x40  # flip a bit in the frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))


def test_header_crc_corruption_detected():
    blob = bytearray(encode_flac([[-1] * 16], subframe="constant"))
    # frame starts right after fLaC + 4-byte block header + 34 bytes
    frame_start = 4 + 4 + 34
    blob[frame_start + 2] ^= 0x01  # blocksize code nibble
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"fLaX" + b"\x00" * 40)


def test_multimodal_decode_audio_flac_path():
    """decode_audio routes FLAC payloads through the real decoder."""
    from collection_templates_spark.operators.multimodal import (
        decode_audio,
    )

    data = _sine(64, amp=900)
    ch, sr, n, pcm = decode_audio(
        encode_flac([data], sample_rate=16000, subframe="fixed2",
                    rice_param=6)
    )
    assert (ch, sr, n) == (1, 16000, 64)
    assert _pcm_to_channels(pcm, 1)[0] == data
