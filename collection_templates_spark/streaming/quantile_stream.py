"""Streaming quantile monitor: per-micro-batch DDSketch summaries
merged into a crash-consistent cumulative sketch, read against a
persisted reference sketch — the order-statistics sibling of
``streaming/drift_stream.py``'s PSI monitor, and the streaming payoff
of ``operators/sketches``' r13 mergeable quantile summary.

Why a sketch and not rows: a latency/price monitor at 100 TB cannot
re-quantile history per micro-batch. The DDSketch histogram is the
MERGEABLE sufficient statistic for quantiles (count addition ≡ single
pass, pinned by test_round13_properties), so the monitor persists one
tiny (bin, cnt) segment per epoch and the cumulative p50/p90/p99 costs
a union of segment tables — never a second look at any row, same as
the PSI monitor's histograms.

Protocol (delta_stream's exactly): per epoch
1. sketch the batch (``ddsketch_bins``) → write
   ``state_dir/sketch/epoch=N/`` (overwrite);
2. cumulative sketch = marker-complete segments + this batch, quantile
   estimates off it (``ddsketch_quantiles``), compared with the
   reference sketch's estimates at the same q — alarm when the
   relative shift exceeds ``rel_alarm``;
3. write ``state_dir/quantiles/epoch=N/`` then the marker LAST.
Unmarked epochs are invisible; recovery replays to the identical
state; re-running a drained stream changes nothing.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from collection_templates_spark.operators.sketches import (
    DD_ALPHA,
    ddsketch_bins,
    ddsketch_quantiles,
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


def build_reference_sketch(
    df: DataFrame,
    ref_path: str,
    value_col: str,
    alpha: float = DD_ALPHA,
) -> None:
    """Sketch the reference corpus ONCE and persist the (bin, cnt)
    summary — the monitor never re-reads reference rows."""
    ddsketch_bins(df, value_col, alpha).write.mode("overwrite").parquet(
        ref_path
    )


def read_quantile_log(spark: SparkSession, state_dir: str) -> DataFrame:
    """Crash-consistent monitor log: (epoch, q, est_q, ref_q,
    rel_shift, alarm) from marker-complete epochs only."""
    log = _read_segments(
        spark, state_dir, "quantiles", _complete_epochs(state_dir)
    )
    if log is None:
        return spark.createDataFrame(
            [],
            "epoch long, q double, est_q double, ref_q double, "
            "rel_shift double, alarm boolean",
        )
    return log


def stream_quantile_monitor(
    spark: SparkSession,
    drop_dir: str,
    ref_path: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = DD_ALPHA,
    rel_alarm: float = 0.2,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Start the monitor (availableNow — drains ``drop_dir`` then
    stops; production drops the flag and runs continuously)."""
    ref_est = (
        ddsketch_quantiles(
            spark.read.parquet(ref_path), quantiles, alpha
        )
        .withColumnRenamed("est_q", "ref_q")
        .localCheckpoint(eager=True)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        sk = ddsketch_bins(batch_df, value_col, alpha).localCheckpoint(
            eager=True
        )
        sk.write.mode("overwrite").parquet(
            os.path.join(state_dir, "sketch", f"epoch={epoch_id}")
        )
        # cumulative = compacted base + segments above its watermark
        # (compact_state_segments; O(1) in epoch count)
        from collection_templates_spark.operators.index_maintenance import (
            read_state_with_base,
        )

        prior = read_state_with_base(
            spark, state_dir, "sketch", _complete_epochs(state_dir),
            exclude_epoch=epoch_id,
        )
        cum = sk if prior is None else prior.unionByName(sk)
        cum = cum.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
        est = ddsketch_quantiles(cum, quantiles, alpha)
        shift = F.round(
            F.abs(
                F.try_divide(F.col("est_q"), F.col("ref_q"))
                - F.lit(1.0)
            ),
            6,
        )
        out = (
            est.join(ref_est, "q")
            .select(
                F.lit(epoch_id).alias("epoch"),
                "q",
                "est_q",
                "ref_q",
                shift.alias("rel_shift"),
                (shift > F.lit(rel_alarm)).alias("alarm"),
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(state_dir, "quantiles", f"epoch={epoch_id}")
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
