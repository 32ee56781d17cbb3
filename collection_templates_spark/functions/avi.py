"""Pure-stdlib AVI (RIFF) container codec for Motion-JPEG video.

Makes the multimodal VIDEO path real for the one mainstream format
whose frames this container can already decode: MJPEG-in-AVI (every
frame is a baseline JPEG — functions/jpeg.py owns the pixel decode).
H.264/VP9-class codecs stay environment-limited (NotImplementedError →
fake_decode fallback), the same split as lossy WebP vs VP8L.

Container-only logic (public AVI/RIFF layout: 'hdrl' header list with
``avih``/``strh``, 'movi' list of ``00dc``/``00db`` frame chunks) —
no codec work here. ``encode_avi_mjpeg`` builds minimal spec-valid
fixtures from JPEG payloads so tests can round-trip real frames.

Reference parity note: the reference has no media path at all; this
backs the beyond-reference multimodal frame-sampling operators
(operators/multimodal.py::sample_frames).
"""

from __future__ import annotations

import struct


def _fourcc(data: bytes, off: int) -> bytes:
    return data[off : off + 4]


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a RIFF/AVI container -> (width, height,
    micro_sec_per_frame, [frame JPEG bytes...]).

    Accepts MJPEG video streams (``00dc``/``00db`` chunks whose bodies
    start with the JPEG SOI marker). Raises ValueError on a malformed
    container and NotImplementedError when the video stream is a
    non-JPEG codec.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    width = height = 0
    usec_per_frame = 0
    frames: list[bytes] = []
    handler = b""

    def walk(start: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, handler
        off = start
        while off + 8 <= end:
            cc = _fourcc(payload, off)
            (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
            body_start = off + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("AVI: chunk overruns container")
            if cc == b"LIST":
                walk(body_start + 4, body_end)  # skip list type fourcc
            elif cc == b"avih" and size >= 40:
                usec_per_frame, = struct.unpack(
                    "<I", payload[body_start : body_start + 4]
                )
                width, height = struct.unpack(
                    "<II", payload[body_start + 32 : body_start + 40]
                )
            elif cc == b"strh" and size >= 8:
                if payload[body_start : body_start + 4] == b"vids":
                    handler = payload[body_start + 4 : body_start + 8]
            elif cc[2:4] in (b"dc", b"db") and cc[:2].isdigit():
                frames.append(payload[body_start:body_end])
            off = body_end + (size & 1)  # chunks pad to even

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI: no video frame chunks found")
    bad = [i for i, f in enumerate(frames) if f[:2] != b"\xff\xd8"]
    if bad:
        raise NotImplementedError(
            f"AVI video stream is not MJPEG (handler={handler!r}); "
            "H.264-class codecs need ffmpeg, not in this container"
        )
    return width, height, usec_per_frame, frames


def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    usec_per_frame: int = 40_000,
) -> bytes:
    """Build a minimal spec-valid MJPEG AVI from JPEG payloads."""

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags
        len(jpeg_frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IIIIIIIIII4H",
            0,  # flags
            0,  # priority+language
            0,  # initial frames
            usec_per_frame,  # dwScale
            1_000_000,  # dwRate (rate/scale = fps)
            0,  # start
            len(jpeg_frames),  # length
            0,  # suggested buffer
            0xFFFFFFFF,  # quality
            0,  # sample size
            0, 0, 0, 0,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",
        0,  # size image
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
