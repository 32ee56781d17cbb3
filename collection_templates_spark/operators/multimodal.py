"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns beside a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` so the decoder sees contiguous byte batches, not pickled
rows. PNG decode is REAL (pure-stdlib codec, ``functions/png.py`` — r5),
baseline JPEG decode is REAL (stdlib+numpy T.81 decoder,
``functions/jpeg.py`` — r6), PCM-WAV audio is REAL (stdlib ``wave``).
Compressed audio/video (mp3/ogg/h264 — ffmpeg-class C libraries) and
WebP/progressive-JPEG remain environment-limited: those paths raise
``NotImplementedError`` and the tested fallback uses ``fake_decode``
(deterministic from the bytes), keeping the Spark-side plumbing (schema,
batch shape, partitioning) real either way.

Scale notes: payload columns dominate bytes — select them ONLY in the stage
that decodes (column pruning keeps every other stage payload-free), and
repartition by size not count before decode so Arrow batches stay ~tens of
MB. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_md5", StringType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real image decode where the format allows it without C libraries:
    PNG payloads go through the pure-stdlib codec (``functions/png.py``
    — zlib inflate + all five scanline filters, CRC-checked) and
    baseline/extended-sequential JPEG through the stdlib+numpy decoder
    (``functions/jpeg.py`` — full T.81 Huffman/DCT path, r6) and GIF
    through the stdlib LZW decoder (``functions/gif.py``, r7) →
    (width, height, color_type, raw pixels). WebP and progressive JPEG
    remain environment-limited and raise ``NotImplementedError``;
    callers fall back to ``fake_decode`` for those."""
    from collection_templates_spark.functions.jpeg import (
        UnsupportedJpegError,
        decode_jpeg,
    )
    from collection_templates_spark.functions.png import (
        PNG_SIGNATURE,
        decode_png,
    )

    if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        try:
            return decode_png(payload)
        except ValueError:
            raise
        except Exception as ex:  # zlib.error/struct.error on corrupt data
            raise ValueError(f"malformed PNG: {ex}") from ex
    if payload[:2] == b"\xff\xd8":
        try:
            return decode_jpeg(payload)
        except UnsupportedJpegError as ex:
            # progressive/arithmetic MODES → fake_decode fallback; plain
            # ValueError (truncated/corrupt data) propagates so corruption
            # degrades to NULL exactly like the PNG/GIF paths (r7 advice —
            # previously every JPEG ValueError became NotImplementedError
            # and corrupt payloads yielded fabricated fake_decode features).
            raise NotImplementedError(str(ex)) from ex
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from collection_templates_spark.functions.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # lossless VP8L decodes for real (functions/webp.py, r12);
        # lossy VP8 / extended VP8X raise NotImplementedError inside
        # and fall back to fake_decode like progressive JPEG
        from collection_templates_spark.functions.webp import decode_webp

        return decode_webp(payload)
    raise NotImplementedError(
        "unrecognized image format (PNG, baseline JPEG, GIF and "
        "lossless WebP decode here; lossy WebP/AVIF need C libraries "
        "not in this container)"
    )


def decode_audio(payload: bytes) -> tuple[int, int, int, bytes]:
    """Real audio decode for PCM WAV (RIFF) payloads — stdlib ``wave``
    needs no C library — and for FLAC through the pure-stdlib lossless
    decoder (``functions/flac.py``, r13: Rice/fixed/LPC subframes,
    mid/side, CRC-verified — feasible table-free, unlike mp3): →
    (n_channels, sample_rate, n_frames, raw frames). mp3/ogg/aac remain
    environment-limited (normative Huffman tables with no source here)
    and raise ``NotImplementedError``."""
    import io
    import wave

    if payload[:4] == b"fLaC":
        from collection_templates_spark.functions.flac import decode_flac

        return decode_flac(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "non-WAV/FLAC audio decoding requires ffmpeg-class "
            "libraries; not in this container"
        )
    with wave.open(io.BytesIO(payload)) as w:
        n_frames = w.getnframes()
        return (
            w.getnchannels(),
            w.getframerate(),
            n_frames,
            w.readframes(n_frames),
        )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("mean_abs_amplitude", StringType()),  # 6dp string
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL decode-and-featurize for 16-bit PCM WAV payloads via the
    stdlib decoder (channels, rate, duration, mean |amplitude|); other
    formats yield null features instead of failing the batch. Mirrors
    extract_image_features."""
    import struct as _struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, rates, durs, amps = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    ch, rate, n, frames = decode_audio(bytes(b))
                    n_samp = len(frames) // 2  # 16-bit PCM
                    vals = _struct.unpack(f"<{n_samp}h", frames[: n_samp * 2])
                    chs.append(ch)
                    rates.append(rate)
                    durs.append(int(n * 1000 / rate) if rate else None)
                    amps.append(
                        format(
                            sum(abs(v) for v in vals) / max(n_samp, 1), ".6f"
                        )
                    )
                except Exception:  # undecodable format/corrupt payload
                    chs.append(None)
                    rates.append(None)
                    durs.append(None)
                    amps.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_channels": pd.array(chs, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                    "mean_abs_amplitude": amps,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def fake_decode(payload: bytes) -> tuple[int, str]:
    """Deterministic stand-in for a decoder: byte length + md5 head."""
    return len(payload), hashlib.md5(payload).hexdigest()[:16]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fabricate a media table from the documents corpus (payload = UTF-8
    bytes) so the binary plumbing is testable without real media files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: real impl = PIL thumbnail. The fake
    re-scales the byte length proportionally so size-dependent downstream
    logic is exercisable."""
    target = max(1, (len(payload) * width * height) // (256 * 256))
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize (stubbed decode — plumbing is real:
    payload-only projection, per-batch loop, typed output schema)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        fake_resize(b, width, height) for b in pdf["payload"]
                    ],
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with its
    timestamp. MJPEG-in-AVI payloads sample REAL frames (r12 —
    functions/avi.py parses the RIFF container; each emitted payload
    is that frame's actual baseline JPEG, decodable by
    functions/jpeg.py): the frame nearest each ``every_ms`` tick, up
    to ``max_frames``, frame_ms = the frame's true timestamp. Other
    codecs (H.264-class — ffmpeg territory) keep the documented
    deterministic fake slicing so the plumbing stays testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collection_templates_spark.functions.avi import (
            decode_avi_mjpeg,
        )

        for pdf in batches:
            ids, idxs, mss, payloads = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                frames = None
                usec = 0
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    try:
                        _, _, usec, frames = decode_avi_mjpeg(b)
                    except NotImplementedError:
                        frames = None  # non-MJPEG codec → fake path
                if frames is not None:
                    usec = usec or 40_000
                    step = max(1, (every_ms * 1000) // usec)
                    for i, fi in enumerate(
                        range(0, len(frames), step)[:max_frames]
                    ):
                        ids.append(mid)
                        idxs.append(i)
                        mss.append((fi * usec) // 1000)
                        payloads.append(frames[fi])
                    continue
                n = min(max_frames, max(1, len(b) // 16))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    payloads.append(bytes(b[i * 16 : (i + 1) * 16]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ms": mss,
                    "payload": payloads,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def repartition_by_payload_size(
    media: DataFrame, target_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Size-aware repartition before decode: media rows vary from KBs to
    GBs, so row-count partitioning makes pathological Arrow batches. One
    cheap aggregate estimates total payload bytes → partition count."""
    total = media.select(
        F.sum(F.length("payload")).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total // target_bytes) + 1)
    return media.repartition(n)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_sample", StringType()),  # 6dp decimal string
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode-and-featurize for PNG payloads (width, height,
    channels, mean sample value) via the pure-stdlib codec — the
    previously-stubbed leg of the multimodal pipeline made concrete.
    Non-PNG payloads yield null dimensions (decoder unavailable in this
    container) instead of failing the batch. Same Arrow-batched
    ``mapInPandas`` shape as extract_features."""
    from collection_templates_spark.operators.multimodal import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, ms = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    w, h, ctype, pixels = decode_image(bytes(b))
                    ch = {0: 1, 2: 3, 6: 4}[ctype]
                    ws.append(w)
                    hs.append(h)
                    cs.append(ch)
                    ms.append(
                        format(sum(pixels) / max(len(pixels), 1), ".6f")
                    )
                except (NotImplementedError, ValueError):
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    ms.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_channels": pd.array(cs, dtype="Int32"),
                    "mean_sample": ms,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` receives an iterator of pandas batches — the decoder loop
    is per-batch vectorizable and payload bytes arrive via Arrow without
    per-row pickling.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [d[0] for d in decoded],
                    "head_md5": [d[1] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _ahash_from_pixels(
    w: int, h: int, n_channels: int, pixels: bytes, grid: int = 8
) -> int:
    """64-bit average hash: grayscale → ``grid``×``grid`` box-average →
    threshold at the mean → row-major bit pack. Pure integer/py-float
    arithmetic (no image libs), deterministic for a given decode."""
    # grayscale via integer BT.601-ish weights on the first 3 channels
    # (single-channel payloads pass through)
    npx = w * h
    gray = [0.0] * npx
    if n_channels == 1:
        for i in range(npx):
            gray[i] = float(pixels[i])
    else:
        for i in range(npx):
            o = i * n_channels
            gray[i] = (
                299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2]
            ) / 1000.0
    cells = [0.0] * (grid * grid)
    counts = [0] * (grid * grid)
    for y in range(h):
        cy = min(grid - 1, y * grid // h)
        row = y * w
        for x in range(w):
            cx = min(grid - 1, x * grid // w)
            c = cy * grid + cx
            cells[c] += gray[row + x]
            counts[c] += 1
    means = [
        cells[i] / counts[i] if counts[i] else 0.0
        for i in range(grid * grid)
    ]
    overall = sum(means) / len(means)
    bits = 0
    for i, m in enumerate(means):
        if m >= overall:
            bits |= 1 << i
    # two's-complement fold into a signed 64-bit slot (the xxhash64 /
    # simhash storage convention — Hamming math is bit-level, sign-blind)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) over decodable image payloads —
    the near-duplicate-image key: two images within a few Hamming bits
    are the same picture through resize/re-encode/brightness jitter.
    Rides the REAL PNG decode; undecodable payloads yield NULL (the
    extract_image_features convention). Pair generation downstream is
    exact-hash groupBy or banded Hamming (the SimHash machinery —
    dedup.simhash_pairs' chunk-banding applies verbatim to these 64-bit
    keys).

    Same Arrow-batched ``mapInPandas`` shape as the other decoders; at
    100 TB the decode is the embarrassingly-parallel stage and the hash
    is 64 bits per image — the shuffle after this operator is key-sized,
    not pixel-sized.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    w, h, ctype, pixels = decode_image(bytes(b))
                    ch = {0: 1, 2: 3, 6: 4}[ctype]
                    hs.append(_ahash_from_pixels(w, h, ch, pixels, grid))
                except (NotImplementedError, ValueError, KeyError):
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "ahash": pd.array(hs, dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, AHASH_SCHEMA
    )


# Synthetic 16×16 grayscale fixture corpus for the image-dedup bank row:
# pixel values are a CLOSED FORM of doc_id, so the DuckDB oracle can
# recompute the expected aHash with integer arithmetic while the Spark
# path runs the REAL encode→decode→hash pipeline. Groups of
# AHASH_GROUP consecutive doc_ids share a base pattern; each doc flips
# exactly one pixel (value ↔ AHASH_FLIP−value), so in-group pairs land
# within a few Hamming bits and cross-group patterns are independent.
# 16×16 → 8×8 cells of exactly 2×2 px make every aHash float op exact
# dyadic arithmetic (sums/4, /64), hence bit_i ⟺ 64·cellsum_i ≥ total.
AHASH_IMG_W = 16
AHASH_GROUP = 5
AHASH_P_HI = 200
AHASH_P_LO = 40
AHASH_FLIP = 240
# pattern = (ax·x + by·y + cz·x·y) mod 97 < 48, with ax/by/cz mixed
# per group via multiplicative hashes — a first cut used a LINEAR
# pattern (7x+11y+13·base) mod 29, which is only 29 distinct patterns
# (base enters as a constant offset), so cross-group hashes collided
# en masse (433k pairs at sf0.1, 98% cross-group). The mixed bilinear
# family makes cross-group hashes effectively random 64-bit keys
# (expected Hamming ≈ 32 ≫ 10) while in-group pairs stay ≤ a few bits.
AHASH_MOD = 97
AHASH_THRESH = 48
AHASH_MIX_AX = 2654435761
AHASH_MIX_BY = 40503
AHASH_MIX_CZ = 9176
AHASH_IDX_MULT = 37


def synthetic_gray_png_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 16×16 grayscale PNG per document id (REAL encoder
    — the decode side of the bank row exercises the production codec
    path end-to-end). Numpy builds the pixel grid; encode_png is the
    repo's pure-stdlib encoder."""
    import numpy as np

    from collection_templates_spark.functions.png import encode_png

    w = AHASH_IMG_W

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:w, 0:w]
        lin = (yy * w + xx).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                base = did // AHASH_GROUP
                ax = 7 + (base * AHASH_MIX_AX) % 89
                by = 11 + (base * AHASH_MIX_BY) % 83
                cz = (base * AHASH_MIX_CZ) % 79
                pat = (ax * xx + by * yy + cz * xx * yy) % AHASH_MOD
                px = np.where(
                    pat < AHASH_THRESH, AHASH_P_HI, AHASH_P_LO
                ).astype(np.int64)
                idx = (did * AHASH_IDX_MULT) % (w * w)
                px = np.where(lin == idx, AHASH_FLIP - px, px)
                ids.append(did)
                payloads.append(
                    encode_png(
                        w, w, bytes(px.astype(np.uint8)), color_type=0
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["image"] * len(ids),
                    "payload": payloads,
                    "meta_width": pd.array([w] * len(ids), dtype="Int32"),
                    "meta_height": pd.array([w] * len(ids), dtype="Int32"),
                    "meta_duration_ms": pd.array(
                        [None] * len(ids), dtype="Int32"
                    ),
                }
            )

    return docs.select(id_col).mapInPandas(run, MEDIA_SCHEMA)


def ahash_near_dup_pairs(
    hashed: DataFrame, max_hamming: int = 10
) -> DataFrame:
    """Banded Hamming near-duplicate pairs over an (media_id, ahash)
    table: the 64-bit key splits into four 16-bit bands; candidates
    share ≥ 1 band (equi-join per band — never an all-pairs XOR scan),
    then the exact ``bit_count(xor)`` verifies ≤ ``max_hamming``. The
    simhash chunk-banding recall argument applies verbatim: a pair
    within h bits misses only if every band differs, impossible for
    h ≤ 3 and geometrically unlikely for clustered bit flips; the
    ORACLE mirrors the banded semantics, so the contract is exact.

    Scale shape: per-band shuffles on 16-bit keys with bounded
    per-bucket fan-out (hash buckets of near-identical images);
    supports the same hot-bucket cap as the text dedup family. The
    hash table is lineage-cut before the self-join — both join sides
    read the materialized 64-bit keys instead of re-running the
    decode+hash pipeline per side (the tfidf lineage-cut rule)."""
    h = hashed.filter(F.col("ahash").isNotNull()).localCheckpoint(
        eager=False
    )
    bands = h.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    (
                        F.shiftright(F.col("ahash"), 16 * b)
                        .bitwiseAND(F.lit(65535))
                    )
                    * F.lit(4)
                    + F.lit(b)
                    for b in range(4)
                ]
            )
        ).alias("band_key"),
    )
    a = bands.select(
        F.col("media_id").alias("id1"),
        F.col("ahash").alias("h1"),
        "band_key",
    )
    b = bands.select(
        F.col("media_id").alias("id2"),
        F.col("ahash").alias("h2"),
        "band_key",
    )
    cands = (
        a.join(b, "band_key")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "h1", "h2")
        .distinct()
    )
    return (
        cands.select(
            "id1",
            "id2",
            F.bit_count(
                F.col("h1").bitwiseXOR(F.col("h2"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
