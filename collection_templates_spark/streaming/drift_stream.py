"""Streaming drift monitor: per-micro-batch PSI against a persisted
reference histogram (the streaming composition of operators/drift.py's
r12 PSI operator, following delta_stream.py's crash-consistency
pattern).

Event batches land as parquet files; a file-source stream picks each
one up and ``foreachBatch``:

1. bins the batch (``binned_counts`` — the same binning the batch PSI
   row uses) and writes it as an EPOCH-ADDRESSED histogram segment
   ``state_dir/hist/epoch=N/`` with ``mode("overwrite")``;
2. computes the cumulative observed histogram = marker-complete
   segments + this batch's in-memory histogram, and the per-group PSI
   vs the reference via ``psi_from_histograms`` — histograms are the
   mergeable sufficient statistic, which is WHY the monitor persists
   them rather than raw rows;
3. writes the epoch's PSI rows to ``state_dir/psi/epoch=N/``
   (overwrite) and the completion marker ``state_dir/_epochs/N`` LAST.

Crash-consistency is delta_stream's exactly: an unmarked epoch's
segments are invisible to step 2, so a recovery replay recomputes the
identical cumulative state and overwrites both directories —
after recovery, state equals exactly-once application, and re-running
a drained stream changes nothing. Readers use :func:`read_psi_log`
(marker-complete epochs only).

Scale shape: per micro-batch the stream shuffles ONLY the batch
(one binned groupBy); the merge unions k·bins-sized histogram
segments (tiny, independent of corpus size); PSI is arithmetic over a
k×bins frame. Backpressure via ``maxFilesPerTrigger``. Compaction =
rewrite one merged segment and clear markers, same recipe as the
delta pipeline's index.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from collection_templates_spark.operators.drift import (
    binned_counts,
    psi_from_histograms,
)


def _marker(state_dir: str, epoch_id: int) -> str:
    return os.path.join(state_dir, "_epochs", str(epoch_id))


def _complete_epochs(state_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(state_dir, "_epochs", "*"))
        if os.path.basename(p).isdigit()
    )


def _read_segments(
    spark: SparkSession, state_dir: str, sub: str, epochs: list[int]
) -> DataFrame | None:
    dirs = [
        os.path.join(state_dir, sub, f"epoch={e}")
        for e in epochs
        if os.path.isdir(os.path.join(state_dir, sub, f"epoch={e}"))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def build_reference_histogram(
    df: DataFrame,
    ref_path: str,
    group_col: str,
    value_col: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 500.0,
) -> None:
    """Bin the reference corpus once and persist the (grp, bin, n)
    histogram — the monitor never re-reads reference rows."""
    binned_counts(
        df, group_col, value_col, F.lit("ref"), n_bins, lo, hi
    ).select("grp", "bin", "n").write.mode("overwrite").parquet(ref_path)


def read_psi_log(spark: SparkSession, state_dir: str) -> DataFrame:
    """Crash-consistent PSI log: rows of (epoch, grp, n_a, n_b, psi)
    from marker-complete epochs only."""
    epochs = _complete_epochs(state_dir)
    log = _read_segments(spark, state_dir, "psi", epochs)
    if log is None:
        return spark.createDataFrame(
            [],
            "epoch long, grp string, n_a long, n_b long, psi double",
        )
    return log


def stream_drift_monitor(
    spark: SparkSession,
    drop_dir: str,
    ref_path: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    group_col: str,
    value_col: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 500.0,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Start the monitor (availableNow — drains what's in ``drop_dir``
    then stops; production would drop the flag and run continuously)."""
    ref = spark.read.parquet(ref_path)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        hist = (
            binned_counts(
                batch_df, group_col, value_col, F.lit("cur"),
                n_bins, lo, hi,
            )
            .select("grp", "bin", "n")
            .localCheckpoint(eager=True)
        )
        seg_dir = os.path.join(state_dir, "hist", f"epoch={epoch_id}")
        hist.write.mode("overwrite").parquet(seg_dir)
        # cumulative = compacted base (if one was published) + segments
        # above its watermark — compact_state_segments keeps this read
        # O(1) in epoch count (operators/index_maintenance)
        from collection_templates_spark.operators.index_maintenance import (
            read_state_with_base,
        )

        prior = read_state_with_base(
            spark, state_dir, "hist", _complete_epochs(state_dir),
            exclude_epoch=epoch_id,
        )
        cum = hist if prior is None else prior.unionByName(hist)
        cum = cum.groupBy("grp", "bin").agg(F.sum("n").alias("n"))
        psi = psi_from_histograms(ref, cum, n_bins).withColumn(
            "epoch", F.lit(epoch_id)
        ).select("epoch", "grp", "n_a", "n_b", "psi")
        psi.write.mode("overwrite").parquet(
            os.path.join(state_dir, "psi", f"epoch={epoch_id}")
        )
        os.makedirs(os.path.join(state_dir, "_epochs"), exist_ok=True)
        with open(_marker(state_dir, epoch_id), "w") as fh:
            fh.write("done")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
