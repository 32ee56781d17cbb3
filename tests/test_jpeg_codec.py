"""Baseline JPEG decoder contracts (functions/jpeg.py).

The fixtures are flat-block JPEGs from ``encode_flat_jpeg`` — for a flat
8×8 block the DCT has a single DC coefficient, so the expected decoded
pixels are hand-derivable from the T.81 spec (DC = 8·(v−128), quant 8 ⇒
quantized DC = v−128, IDCT ⇒ flat v). The encoder emits real marker
segments, both Huffman table classes, DC prediction and byte stuffing,
so a decode exercises the full baseline path, not a special case.
"""

import numpy as np
import pytest

from collection_templates_spark.functions.jpeg import (
    decode_jpeg,
    encode_flat_jpeg,
)


def _gray_plane(pixels: bytes, w: int, h: int) -> "np.ndarray":
    return np.frombuffer(pixels, dtype=np.uint8).reshape(h, w)


def test_single_flat_block():
    data = encode_flat_jpeg([[200]])
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (8, 8, 0)
    assert set(px) == {200}


def test_dc_prediction_chain_and_negative_diffs():
    """2×3 grid with rising and falling values — the DC differences go
    positive and negative, covering _extend on both signs."""
    grid = [[10, 250, 128], [90, 91, 17]]
    data = encode_flat_jpeg(grid)
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (24, 16, 0)
    plane = _gray_plane(px, w, h)
    for by, row in enumerate(grid):
        for bx, val in enumerate(row):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert set(block.flatten().tolist()) == {val}, (by, bx)


def test_non_multiple_of_8_crop():
    data = encode_flat_jpeg([[64, 128]], width=13, height=5)
    w, h, ct, px = decode_jpeg(data)
    assert (w, h) == (13, 5)
    plane = _gray_plane(px, w, h)
    assert set(plane[:, :8].flatten().tolist()) == {64}
    assert set(plane[:, 8:].flatten().tolist()) == {128}


def test_color_444_flat_converts_bt601():
    """One flat YCbCr MCU at 4:4:4; expected RGB from the JFIF BT.601
    formulas, computed independently here."""
    y, cb, cr = 120, 90, 180
    data = encode_flat_jpeg([[y]], chroma_blocks=([[cb]], [[cr]]))
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (8, 8, 2)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    exp_r = int(np.clip(round(y + 1.402 * (cr - 128)), 0, 255))
    exp_g = int(
        np.clip(
            round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255
        )
    )
    exp_b = int(np.clip(round(y + 1.772 * (cb - 128)), 0, 255))
    assert set(rgb[:, :, 0].flatten().tolist()) == {exp_r}
    assert set(rgb[:, :, 1].flatten().tolist()) == {exp_g}
    assert set(rgb[:, :, 2].flatten().tolist()) == {exp_b}


def test_color_420_subsampled():
    """16×16 4:2:0: four luma blocks per MCU, one chroma block pair,
    box-upsampled 2× both ways."""
    luma = [[40, 80], [160, 240]]
    data = encode_flat_jpeg(
        luma, subsample=(2, 2), chroma_blocks=([[128]], [[128]])
    )
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (16, 16, 2)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    # neutral chroma ⇒ R=G=B=Y per block
    for by in range(2):
        for bx in range(2):
            block = rgb[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :]
            assert set(block.flatten().tolist()) == {luma[by][bx]}, (by, bx)


def test_byte_stuffing_roundtrip():
    """Values chosen so the entropy stream emits 0xFF bytes (stuffed on
    encode, de-stuffed on decode) — sweep a range and require exactness
    everywhere; any stuffing bug shifts all subsequent bits."""
    grid = [[v for v in range(1, 256, 16)] for _ in range(2)]
    data = encode_flat_jpeg(grid)
    w, h, ct, px = decode_jpeg(data)
    plane = _gray_plane(px, w, h)
    for by, row in enumerate(grid):
        for bx, val in enumerate(row):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert set(block.flatten().tolist()) == {val}, (by, bx)


def test_progressive_rejected_cleanly():
    data = bytearray(encode_flat_jpeg([[100]]))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|unsupported"):
        decode_jpeg(bytes(data))


def test_decode_image_routes_jpeg():
    from collection_templates_spark.operators.multimodal import decode_image

    w, h, ct, px = decode_image(encode_flat_jpeg([[55]]))
    assert (w, h, ct) == (8, 8, 0)
    assert set(px) == {55}


def test_truncated_raises():
    data = encode_flat_jpeg([[200, 30, 90]])
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_decode_image_boundary_semantics():
    """r7 advice: decode_image must route UNSUPPORTED JPEG modes
    (progressive) to NotImplementedError (→ fake_decode fallback) but
    let CORRUPT-data ValueError propagate (→ degrade-to-NULL, same as
    the PNG/GIF paths) — previously every JPEG ValueError became
    NotImplementedError and corruption yielded fabricated features."""
    from collection_templates_spark.functions.jpeg import (
        UnsupportedJpegError,
    )
    from collection_templates_spark.operators.multimodal import decode_image

    progressive = bytearray(encode_flat_jpeg([[100]]))
    i = progressive.find(b"\xff\xc0")
    progressive[i + 1] = 0xC2
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(bytes(progressive))
    with pytest.raises(NotImplementedError):
        decode_image(bytes(progressive))

    truncated = encode_flat_jpeg([[200, 30, 90]])
    truncated = truncated[: len(truncated) // 2]
    with pytest.raises(ValueError) as exc_info:
        decode_image(truncated)
    assert not isinstance(exc_info.value, NotImplementedError)


def test_restart_markers_resync_and_reset_dc():
    """DRI/RSTn path: a 1-MCU restart interval pads to byte boundary,
    emits RST0..7 cyclically and RESETS the DC predictor — values chosen
    so a decoder that failed to reset the predictor would be provably
    wrong on every block after the first."""
    grid = [[200, 30, 180, 90, 250, 10, 130, 70, 220]]
    data = encode_flat_jpeg(grid, restart_interval=1)
    assert data.count(b"\xff\xd0") >= 1  # RST0 actually present
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (72, 8, 0)
    plane = _gray_plane(px, w, h)
    for bx, val in enumerate(grid[0]):
        assert set(plane[:, bx * 8 : bx * 8 + 8].flatten().tolist()) == {
            val
        }, (bx, val)


def test_restart_interval_three():
    grid = [[v for v in range(10, 240, 20)] for _ in range(2)]
    data = encode_flat_jpeg(grid, restart_interval=3)
    w, h, ct, px = decode_jpeg(data)
    plane = _gray_plane(px, w, h)
    for by, row in enumerate(grid):
        for bx, val in enumerate(row):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert set(block.flatten().tolist()) == {val}, (by, bx)


def test_color_restart_markers():
    """r6 advice #4: a color fixture with a restart interval must emit
    RSTn between MCUs (not just write the DRI segment) and decode back
    exactly — predictor-reset values chosen to catch a non-reset."""
    luma = [[40, 200, 90, 250]]
    cb = [[100, 150, 80, 190]]
    cr = [[160, 60, 210, 30]]
    data = encode_flat_jpeg(
        luma, chroma_blocks=(cb, cr), restart_interval=1
    )
    assert data.count(b"\xff\xd0") >= 1
    w, h, ct, px = decode_jpeg(data)
    assert (w, h, ct) == (32, 8, 2)
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    for bx in range(4):
        y_, cb_, cr_ = luma[0][bx], cb[0][bx], cr[0][bx]
        exp = [
            int(np.clip(round(y_ + 1.402 * (cr_ - 128)), 0, 255)),
            int(
                np.clip(
                    round(
                        y_
                        - 0.344136 * (cb_ - 128)
                        - 0.714136 * (cr_ - 128)
                    ),
                    0,
                    255,
                )
            ),
            int(np.clip(round(y_ + 1.772 * (cb_ - 128)), 0, 255)),
        ]
        block = rgb[:, bx * 8 : bx * 8 + 8, :]
        for c in range(3):
            assert set(block[:, :, c].flatten().tolist()) == {exp[c]}, (
                bx,
                c,
            )


def test_malformed_payloads_raise_valueerror_only():
    """r6 advice #1: corrupt data must surface as ValueError (the
    executor boundary's degrade-to-NULL contract), never IndexError /
    KeyError / struct.error, no matter where in the parser it hits."""
    good = encode_flat_jpeg([[200, 30, 90]], restart_interval=1)
    corruptions = [
        good[:4],                                    # short DQT/no length
        good[:2] + b"\xff\xdb\x00\x03\x00",          # truncated DQT body
        good[:2] + b"\xff\xc0\x00\x05\x08\x00",      # short SOF
        bytes(good).replace(b"\xff\xd0", b"\x00\x00", 1),  # RST clobbered
        good[:-10],                                  # truncated scan
    ]
    # scan referencing an undefined Huffman table: strip the DHT segments
    no_dht = bytearray()
    pos = 0
    while pos < len(good):
        if good[pos] == 0xFF and pos + 1 < len(good) and good[pos + 1] == 0xC4:
            seglen = int.from_bytes(good[pos + 2 : pos + 4], "big")
            pos += 2 + seglen
            continue
        no_dht.append(good[pos])
        pos += 1
    corruptions.append(bytes(no_dht))
    for i, bad in enumerate(corruptions):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_random_byte_flips_never_escape_valueerror():
    """Deterministic fuzz: flip each byte of a real fixture to 0x00 and
    0xFF one at a time; decode must either succeed or raise ValueError."""
    data = encode_flat_jpeg(
        [[40, 80], [160, 240]],
        subsample=(2, 2),
        chroma_blocks=([[128]], [[128]]),
    )
    for i in range(2, len(data) - 2):
        for repl in (0x00, 0xFF):
            bad = data[:i] + bytes([repl]) + data[i + 1 :]
            try:
                decode_jpeg(bad)
            except ValueError:
                pass
