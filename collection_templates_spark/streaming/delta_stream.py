"""The delta pipeline as a real Structured Streaming job (r9 verdict #8,
SURVEY §2.9's named extension): document batches LAND AS FILES, a
file-source stream picks each one up, and ``foreachBatch`` runs the
exact batch operators — probe the persisted minhash index
(``dedup_batch_against_index``), write the accepted (no-history-match)
docs to the accepted sink, and publish their LSH state as an epoch
segment of the index — so every micro-batch is checkable against the
batch path it reuses (tests/test_stream_delta.py replays the same files
sequentially in batch mode and asserts identical accepted sets and
identical index state).

Crash-consistency story (r11 advice: the marker alone did not make the
three steps atomic). Every epoch's outputs are EPOCH-ADDRESSED and
written with ``mode("overwrite")``:

- accepted docs   → ``accepted_dir/epoch=N/``
- index bands     → ``index_path/bands_epochs/epoch=N/``
- index shingles  → ``index_path/shingles_epochs/epoch=N/``
- completion mark → ``index_path/_epochs/N`` (written LAST)

and the probe (``dedup_batch_against_index``) unions into the base
index ONLY the segments whose completion marker exists. That closes
both crash windows:

- crash after the accepted write, before the marker → the recovery
  replay recomputes the identical ``kept`` (its own unmarked segment is
  invisible to the probe) and OVERWRITES ``epoch=N`` — no duplicate
  rows ever accumulate;
- crash after the segment write, before the marker → same: the
  unmarked segment is not probed, so the replay's ``kept`` is NOT
  empty, and the overwrite converges.

So the guarantee is: after the recovery run completes, state equals
exactly-once application. DURING a crashed half-epoch, a reader listing
raw parquet under ``accepted_dir`` may observe the partial epoch;
readers that need crash-consistent views use :func:`read_accepted`,
which filters to marker-complete epochs. Epochs whose batch survives
zero docs write only the marker (no empty parquet dirs).

Scale shape: identical to the batch delta path — the probe join
shuffles only the batch side against the (optionally bucketed) band
table plus the batch-sized epoch segments (the bucketed base keeps its
shuffle-elision: segments are joined separately and unioned AFTER the
join, see incremental_dedup); the accept is an O(batch) overwrite into
a fresh epoch directory; driver state per epoch is one marker file.
Backpressure via ``maxFilesPerTrigger`` keeps each micro-batch
index-probe-sized. Periodic compaction = ``build_minhash_index`` over
(history + accepted), which clears all epoch segments and markers.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def _epoch_marker(index_path: str, epoch_id: int) -> str:
    return os.path.join(index_path, "_epochs", str(epoch_id))


def _marked_max_event_us(index_path: str) -> int | None:
    """Highest event-time (unix micros) recorded by any COMPLETED
    epoch's marker — the crash-consistent watermark state. Markers from
    the unwatermarked pipeline hold 'applied' (non-numeric) and simply
    don't advance the clock; an unmarked (crashed) epoch contributes
    nothing, so its recovery replay recomputes the same watermark its
    first attempt saw."""
    best = None
    edir = os.path.join(index_path, "_epochs")
    if not os.path.isdir(edir):
        return None
    for name in os.listdir(edir):
        try:
            with open(os.path.join(edir, name)) as fh:
                v = int(fh.read().strip())
        except (OSError, ValueError):
            continue
        if best is None or v > best:
            best = v
    return best


def read_accepted(spark: SparkSession, accepted_dir: str, index_path: str):
    """Crash-consistent view of the accepted sink: only epochs whose
    completion marker exists under ``index_path/_epochs`` are read (a
    crashed half-epoch's partial files are invisible until its recovery
    replay completes and marks it). Returns None when no marked epoch
    has accepted any docs yet."""
    dirs = []
    for d in sorted(glob.glob(os.path.join(accepted_dir, "epoch=*"))):
        n = d.rsplit("=", 1)[-1]
        if os.path.exists(_epoch_marker(index_path, int(n))):
            dirs.append(d)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def stream_delta_pipeline(
    spark: SparkSession,
    drop_dir: str,
    index_path: str,
    accepted_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
    threshold: float = 0.5,
    ts_col: str | None = None,
    delay_us: int = 0,
    late_dir: str | None = None,
) -> StreamingQuery:
    """Watch ``drop_dir`` for parquet document batches; per micro-batch:
    probe → accept survivors into ``accepted_dir`` AND the index (as a
    marker-gated epoch segment — see module docstring for the
    crash-consistency protocol). Returns the started query
    (``availableNow`` trigger — drains what exists, then stops; rerun
    to drain new drops).

    Watermark / late-data mode (``ts_col`` set): rows whose event time
    (a unix-micros long column) is STRICTLY below the watermark —
    max event time over all COMPLETED epochs minus ``delay_us``, the
    Structured-Streaming ``withWatermark`` convention — are routed to
    ``late_dir`` (epoch-addressed, crash-consistent like the accepted
    sink; never silently dropped) and excluded from probe/accept. The
    epoch marker then records the max event time over the WHOLE batch
    (late rows included — watermarks advance on arrival, exactly like
    Spark's global max-event-time clock), which is what makes the
    watermark state itself crash-consistent: only completed epochs
    advance the clock, so a recovery replay of a crashed epoch applies
    the same cutoff its first attempt did. Replaying the drops
    sequentially through the batch operators WITH the same cutoff rule
    yields identical accepted/late/index state (pinned by
    tests/test_stream_delta.py and tools/stress_stream_delta.py
    --watermark)."""
    from collection_templates_spark.operators.dedup import (
        hashed_shingle_sets,
        lsh_band_table,
    )
    from collection_templates_spark.operators.incremental_dedup import (
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
        marker_text = "applied"
        if ts_col is not None:
            batch_max = batch.agg(
                F.max(F.col(ts_col).cast("long")).alias("m")
            ).collect()[0]["m"]
            prev_max = _marked_max_event_us(index_path)
            new_max = (
                batch_max
                if prev_max is None or batch_max > prev_max
                else prev_max
            )
            marker_text = str(new_max)
            if prev_max is not None:
                wm = prev_max - delay_us
                late = batch.filter(F.col(ts_col).cast("long") < wm)
                if late_dir is not None and not late.isEmpty():
                    late.write.mode("overwrite").parquet(
                        os.path.join(late_dir, f"epoch={epoch_id}")
                    )
                batch = batch.filter(
                    F.col(ts_col).cast("long") >= wm
                ).localCheckpoint(eager=True)
            if batch.isEmpty():
                # all-late batch still completes (and advances the clock)
                os.makedirs(os.path.dirname(marker), exist_ok=True)
                with open(marker, "w") as fh:
                    fh.write(marker_text)
                return
        # the probe sees base index + MARKED epoch segments only — a
        # prior crashed attempt at THIS epoch left an unmarked segment
        # that must not shadow the batch against itself
        pairs = dedup_batch_against_index(
            spark, index_path, batch, threshold=threshold
        )
        matched = pairs.select(
            F.col("doc_new").alias("doc_id")
        ).distinct()
        kept = batch.join(matched, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        if not kept.isEmpty():
            # epoch-addressed overwrites: a recovery replay of this
            # epoch converges instead of appending twice
            kept.write.mode("overwrite").parquet(
                os.path.join(accepted_dir, f"epoch={epoch_id}")
            )
            sets = hashed_shingle_sets(
                kept, "doc_id", "text", 3
            ).localCheckpoint(eager=False)
            lsh_band_table(sets, 64, 2).write.mode("overwrite").parquet(
                os.path.join(index_path, "bands_epochs", f"epoch={epoch_id}")
            )
            sets.write.mode("overwrite").parquet(
                os.path.join(
                    index_path, "shingles_epochs", f"epoch={epoch_id}"
                )
            )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(marker_text)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
