"""The delta pipeline as a real Structured Streaming job (r9 verdict #8,
SURVEY §2.9's named extension): document batches LAND AS FILES, a
file-source stream picks each one up, and ``foreachBatch`` runs the
exact batch operators — probe the persisted minhash index
(``dedup_batch_against_index``), write the accepted (no-history-match)
docs to the accepted sink, append them to the index
(``append_to_index``) — so every micro-batch is checkable against the
batch path it reuses (tests/test_stream_delta.py replays the same files
sequentially in batch mode and asserts identical accepted sets and
identical index state).

Exactly-once story: the streaming checkpoint makes file pickup
exactly-once per SOURCE file, but ``foreachBatch`` bodies re-run on
recovery, and ``append_to_index`` is an append-only log that must not
double-accept — so the batch is guarded by an epoch-id marker under the
index (the canonical foreachBatch idempotency pattern: Spark docs,
"Using Foreach and ForeachBatch"). A replayed epoch sees its marker and
no-ops; a genuinely new epoch appends once.

Scale shape: identical to the batch delta path — the probe join
shuffles only the batch side against the (optionally bucketed) band
table, the accept is an O(batch) append; driver state per epoch is one
marker file. Backpressure via ``maxFilesPerTrigger`` keeps each
micro-batch index-probe-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def _epoch_marker(index_path: str, epoch_id: int) -> str:
    return os.path.join(index_path, "_epochs", str(epoch_id))


def stream_delta_pipeline(
    spark: SparkSession,
    drop_dir: str,
    index_path: str,
    accepted_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    bucket_bands: int | None = None,
    max_files_per_trigger: int = 1,
    threshold: float = 0.5,
) -> StreamingQuery:
    """Watch ``drop_dir`` for parquet document batches; per micro-batch:
    probe → accept survivors into ``accepted_dir`` AND the index.
    Returns the started query (``availableNow`` trigger — drains what
    exists, then stops; rerun to drain new drops)."""
    from collection_templates_spark.operators.incremental_dedup import (
        append_to_index,
        dedup_batch_against_index,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        marker = _epoch_marker(index_path, epoch_id)
        if os.path.exists(marker):
            return  # replayed epoch after recovery: already applied
        if batch_df.isEmpty():
            return
        # pin the batch: the probe and the accept must see ONE snapshot
        batch = batch_df.localCheckpoint(eager=True)
        pairs = dedup_batch_against_index(
            spark, index_path, batch, threshold=threshold
        )
        matched = pairs.select(
            F.col("doc_new").alias("doc_id")
        ).distinct()
        kept = batch.join(matched, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        kept.write.mode("append").parquet(accepted_dir)
        append_to_index(kept, index_path, bucket_bands=bucket_bands)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("applied")

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
