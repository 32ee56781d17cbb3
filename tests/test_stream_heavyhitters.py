"""Streaming heavy-hitters monitor (streaming/heavyhitters_stream.py):
each epoch's cumulative top-k equals the batch-mode computation over
batches 0..k replayed with the same epoch boundaries (CMS cell
additivity + candidate union), a planted hot key takes rank 1 as soon
as it floods, reruns are idempotent, and unmarked (crashed) epochs are
invisible."""

import pytest
import os

from collection_templates_spark.streaming.heavyhitters_stream import (
    hh_topk_from_state,
    read_topk_log,
    stream_heavyhitters_monitor,
)

SCHEMA = "key string"

# batch 0/1: zipf-ish spread; batch 2 floods key 'hot'
BATCHES = [
    [(f"k{x % 17}",) for x in range(150)],
    [(f"k{x % 23}",) for x in range(150)],
    [("hot",)] * 120 + [(f"k{x % 11}",) for x in range(60)],
]
K = 5


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _run(spark, tmp):
    flat = f"{tmp}/flat"
    os.makedirs(flat, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        d = f"{tmp}/b{i}"
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.replace(f"{d}/{f}", f"{flat}/{i:04d}.parquet")
    state = f"{tmp}/state"
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_heavyhitters_monitor(
        spark, flat, state, f"{tmp}/ckpt", schema, "key", k=K,
        candidates_per_epoch=50,
    )
    q.awaitTermination(120)
    return state


def _batch_topk(spark, tmp2, upto):
    """Batch replay with the SAME epoch boundaries: run the monitor's
    per-epoch state build over batches 0..upto in a scratch state dir
    and read its final top-k — CMS segments per batch, candidates per
    batch, exactly the cumulative the stream maintains."""
    from pyspark.sql import functions as F

    from collection_templates_spark.streaming.heavyhitters_stream import (
        _probe_cells,
    )

    state2 = f"{tmp2}/replay_state_{upto}"
    for i in range(upto + 1):
        keys = _df(spark, BATCHES[i]).select(
            F.col("key").cast("string").alias("key")
        )
        cms = (
            _probe_cells(keys, "key")
            .groupBy("row", "cell")
            .agg(F.count("*").alias("c"))
        )
        cms.write.mode("overwrite").parquet(
            f"{state2}/cms/epoch={i}"
        )
        cand = (
            keys.groupBy("key")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(50)
        )
        cand.write.mode("overwrite").parquet(
            f"{state2}/cand/epoch={i}"
        )
    return [
        (r.rank, r.key, r.est)
        for r in hh_topk_from_state(
            spark, state2, list(range(upto + 1)), k=K
        ).collect()
    ]


@pytest.mark.slow
def test_stream_topk_matches_batch_replay_and_flood(spark, tmp_path):
    tmp = str(tmp_path)
    state = _run(spark, tmp)
    log = read_topk_log(spark, state).collect()
    by_epoch = {}
    for r in log:
        by_epoch.setdefault(r.epoch, []).append((r.rank, r.key, r.est))
    assert len(by_epoch) == 3
    epochs = sorted(by_epoch)
    for i, e in enumerate(epochs):
        want = _batch_topk(spark, tmp, i)
        assert sorted(by_epoch[e]) == sorted(want), (i, by_epoch[e], want)
    # CMS estimates never undercount: rank-1 estimate of the flood
    # epoch is >= the true 'hot' count, and 'hot' holds rank 1
    final = sorted(by_epoch[epochs[-1]])
    assert final[0][1] == "hot"
    assert final[0][2] >= 120


@pytest.mark.slow
def test_stream_topk_rerun_idempotent_and_marker_gated(spark, tmp_path):
    tmp = str(tmp_path)
    state = _run(spark, tmp)
    before = sorted(
        (r.epoch, r.rank, r.key, r.est)
        for r in read_topk_log(spark, state).collect()
    )
    flat = f"{tmp}/flat"
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_heavyhitters_monitor(
        spark, flat, state, f"{tmp}/ckpt", schema, "key", k=K,
        candidates_per_epoch=50,
    )
    q.awaitTermination(120)
    after = sorted(
        (r.epoch, r.rank, r.key, r.est)
        for r in read_topk_log(spark, state).collect()
    )
    assert after == before
    epochs = sorted({e for e, *_ in before})
    os.remove(os.path.join(state, "_epochs", str(epochs[-1])))
    left = {r.epoch for r in read_topk_log(spark, state).collect()}
    assert epochs[-1] not in left
