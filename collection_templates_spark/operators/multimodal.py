"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns beside a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` so the (C-library) decoder sees contiguous byte batches, not
pickled rows. The actual decoders (PIL/ffmpeg/torchaudio) are NOT in this
container — ``decode_image`` raises ``NotImplementedError`` and the tested
path uses ``fake_decode`` (deterministic from the bytes), keeping the
Spark-side plumbing (schema, batch shape, partitioning) real.

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


def decode_image(payload: bytes) -> object:
    """Real decoder stub — image libraries are not available in this
    environment. The pipeline shape is exercised through ``fake_decode``."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg; not available in this container"
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
