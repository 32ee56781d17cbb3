"""Structured Streaming extension: custom-collection drops as a file stream.

The reference is pure batch (4-weekly reruns; SURVEY §2.9) — this is the
§2.9-noted extension, not parity: S8 JSONL drops land in a directory,
``readStream`` picks them up, and ``foreachBatch`` runs the same
prepare + upsert code the batch path uses (exactly-once per file via the
streaming checkpoint + deterministic ids making the sink idempotent).

Also provided: a windowed event-rate monitor showing watermark + tumbling
aggregation over a stream table (the canonical late-data pattern), used by
tests against the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from collection_templates_spark.operators.custom_collections import (
    prepare_custom_collections,
    produce_custom_update_operations,
)
from collection_templates_spark.schemas import CUSTOM_COLLECTION_SCHEMA


def stream_custom_collections(
    spark: SparkSession,
    drop_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    domains: DataFrame,
    created_ms: float,
    known_ids: DataFrame | None = None,
) -> StreamingQuery:
    """Watch ``drop_dir`` for JSONL drops; per micro-batch produce documents
    + ops into ``output_dir`` (parquet, append)."""
    stream = (
        spark.readStream.schema(CUSTOM_COLLECTION_SCHEMA)
        .json(drop_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        docs = prepare_custom_collections(batch, domains, created_ms)
        ops = produce_custom_update_operations(docs, known_ids)
        docs.write.mode("append").parquet(f"{output_dir}/docs")
        ops.write.mode("append").parquet(f"{output_dir}/ops")

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark for late data —
    works on a streaming OR batch DataFrame (same code path)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window).alias("w"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
