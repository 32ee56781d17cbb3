"""Streaming heavy-hitters monitor: per-micro-batch Count-Min segments
plus bounded candidate sets, merged into a crash-consistent cumulative
top-k — the frequent-items sibling of ``drift_stream.py`` (PSI) and
``quantile_stream.py`` (DDSketch), completing the monitor trio
(distribution / order statistics / frequent items).

Why this state and not rows: "what are the top keys so far" at 100 TB
cannot re-aggregate history per micro-batch, and exact per-key state
grows with cardinality. The CMS cell table is the MERGEABLE sufficient
statistic for counts (cell-wise addition ≡ single pass — the same
additivity the cms_token_errors row pins), so the monitor persists one
d×w-row segment per epoch; candidate keys (each epoch's exact top-C)
bound the probe set, the standard CMS+heap heavy-hitter design
(Cormode & Muthukrishnan 2005). A key missed by every epoch's top-C
must have ranked ≤ C in no epoch — its total is at most
Σ_epochs (epoch C-th count), the documented miss bound; at production
C the bound sits far under any alerting threshold.

Protocol (delta_stream's exactly): per epoch
1. write ``state_dir/cms/epoch=N/`` (cell counts) and
   ``state_dir/cand/epoch=N/`` (exact per-key batch counts of the
   batch top-C, TakeOrdered — never a global sort);
2. cumulative = marker-complete segments + this batch: cells sum,
   candidates union-distinct, estimate = min over d probe rows,
   top-k by (estimate DESC, key ASC) → write
   ``state_dir/topk/epoch=N/``;
3. write the marker LAST. Unmarked epochs are invisible; recovery
   replays to the identical state; re-running a drained stream
   changes nothing.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from collection_templates_spark.operators.dedup import _poly_hash
from collection_templates_spark.operators.sketches import (
    CMS_BASES,
    CMS_WIDTH,
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


def _probe_cells(keys: DataFrame, key_col: str) -> DataFrame:
    return keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    (_poly_hash(F.col(key_col), b) % CMS_WIDTH).cast("int")
                    for b in CMS_BASES
                ]
            )
        ).alias("row", "cell"),
    )


def hh_topk_from_state(
    spark: SparkSession,
    state_dir: str,
    epochs: list[int],
    extra_cms: DataFrame | None = None,
    extra_cand: DataFrame | None = None,
    k: int = 10,
) -> DataFrame:
    """Cumulative top-k over marker-complete epochs (+ an optional
    in-flight batch): summed CMS cells probed at the union of
    candidate keys. Deterministic: (estimate DESC, key ASC) total
    order, TakeOrdered shape."""
    cms = _read_segments(spark, state_dir, "cms", epochs)
    if extra_cms is not None:
        cms = extra_cms if cms is None else cms.unionByName(extra_cms)
    cand = _read_segments(spark, state_dir, "cand", epochs)
    if cand is not None:
        cand = cand.select("key")  # segments persist (key, n)
    if extra_cand is not None:
        extra_cand = extra_cand.select("key")
        cand = (
            extra_cand if cand is None else cand.unionByName(extra_cand)
        )
    if cms is None or cand is None:
        return spark.createDataFrame(
            [], "rank int, key string, est long"
        )
    cells = cms.groupBy("row", "cell").agg(F.sum("c").alias("c"))
    keys = cand.select("key").distinct()
    est = (
        _probe_cells(keys, "key")
        .join(cells, ["row", "cell"])
        .groupBy("key")
        .agg(F.min("c").cast("long").alias("est"))
    )
    top = est.orderBy(F.desc("est"), F.asc("key")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("est"), F.asc("key"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "key", "est")


def read_topk_log(spark: SparkSession, state_dir: str) -> DataFrame:
    """Crash-consistent monitor log: (epoch, rank, key, est) from
    marker-complete epochs only."""
    log = _read_segments(
        spark, state_dir, "topk", _complete_epochs(state_dir)
    )
    if log is None:
        return spark.createDataFrame(
            [], "epoch long, rank int, key string, est long"
        )
    return log


def stream_heavyhitters_monitor(
    spark: SparkSession,
    drop_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    key_col: str,
    k: int = 10,
    candidates_per_epoch: int = 50,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Start the monitor (availableNow — drains ``drop_dir`` then
    stops; production drops the flag and runs continuously)."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        keys = batch_df.select(F.col(key_col).cast("string").alias("key"))
        cms = (
            _probe_cells(keys, "key")
            .groupBy("row", "cell")
            .agg(F.count("*").alias("c"))
            .localCheckpoint(eager=True)
        )
        cms.write.mode("overwrite").parquet(
            os.path.join(state_dir, "cms", f"epoch={epoch_id}")
        )
        cand = (
            keys.groupBy("key")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(candidates_per_epoch)
            .localCheckpoint(eager=True)
        )
        cand.write.mode("overwrite").parquet(
            os.path.join(state_dir, "cand", f"epoch={epoch_id}")
        )
        prior = [
            e for e in _complete_epochs(state_dir) if e != epoch_id
        ]
        top = hh_topk_from_state(
            spark, state_dir, prior, extra_cms=cms,
            extra_cand=cand.select("key"), k=k,
        ).withColumn("epoch", F.lit(epoch_id).cast("long"))
        top.select("epoch", "rank", "key", "est").write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, "topk", f"epoch={epoch_id}"))
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
