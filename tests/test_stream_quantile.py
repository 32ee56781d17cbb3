"""Streaming quantile monitor (streaming/quantile_stream.py): each
epoch's quantile estimates equal the batch-mode sketch over batches
0..k (stream == batch replay, via DDSketch merge ≡ single pass), the
alarm fires exactly when the shifted batch arrives, reruns are
idempotent, and unmarked (crashed) epochs are invisible."""

import pytest
import os

from collection_templates_spark.operators.sketches import (
    ddsketch_bins,
    ddsketch_quantiles,
)
from collection_templates_spark.streaming.quantile_stream import (
    build_reference_sketch,
    read_quantile_log,
    stream_quantile_monitor,
)

SCHEMA = "v double"

REF = [(float(1 + x % 100),) for x in range(400)]
# batch 0 matches the reference; batch 2 shifts p90/p99 up 3x
BATCHES = [
    [(float(1 + x % 100),) for x in range(100)],
    [(float(1 + x % 100),) for x in range(100)],
    [(float(300 + x % 100),) for x in range(100)],
]
QS = (0.5, 0.9)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _batch_est(spark, upto):
    rows = [r for b in BATCHES[: upto + 1] for r in b]
    return {
        r.q: r.est_q
        for r in ddsketch_quantiles(
            ddsketch_bins(_df(spark, rows), "v"), QS
        ).collect()
    }


def _run(spark, tmp):
    flat = f"{tmp}/flat"
    os.makedirs(flat, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        d = f"{tmp}/b{i}"
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.replace(f"{d}/{f}", f"{flat}/{i:04d}.parquet")
    ref_path = f"{tmp}/ref"
    state = f"{tmp}/state"
    build_reference_sketch(_df(spark, REF), ref_path, "v")
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_quantile_monitor(
        spark, flat, ref_path, state, f"{tmp}/ckpt", schema, "v",
        quantiles=QS, rel_alarm=0.5,
    )
    q.awaitTermination(120)
    return ref_path, state


def test_stream_quantiles_match_batch_replay_and_alarm(spark, tmp_path):
    _, state = _run(spark, str(tmp_path))
    log = read_quantile_log(spark, state).collect()
    by_epoch = {}
    for r in log:
        by_epoch.setdefault(r.epoch, {})[r.q] = r
    assert len(by_epoch) == 3
    epochs = sorted(by_epoch)
    for k, e in enumerate(epochs):
        want = _batch_est(spark, k)
        for q in QS:
            assert by_epoch[e][q].est_q == want[q], (k, q)
    # batch 0/1 match the reference (no alarm); the shifted batch 2
    # pushes p90 past the 50% relative-shift alarm
    assert not any(by_epoch[epochs[0]][q].alarm for q in QS)
    assert not any(by_epoch[epochs[1]][q].alarm for q in QS)
    assert by_epoch[epochs[2]][0.9].alarm
    assert not by_epoch[epochs[2]][0.5].alarm  # median barely moves


@pytest.mark.slow
def test_stream_quantile_rerun_idempotent_and_marker_gated(
    spark, tmp_path
):
    _, state = _run(spark, str(tmp_path))
    before = sorted(
        (r.epoch, r.q, r.est_q, r.alarm)
        for r in read_quantile_log(spark, state).collect()
    )
    # re-run over the drained drop dir: checkpoint says nothing new
    flat = f"{tmp_path}/flat"
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_quantile_monitor(
        spark, flat, f"{tmp_path}/ref", state, f"{tmp_path}/ckpt",
        schema, "v", quantiles=QS, rel_alarm=0.5,
    )
    q.awaitTermination(120)
    after = sorted(
        (r.epoch, r.q, r.est_q, r.alarm)
        for r in read_quantile_log(spark, state).collect()
    )
    assert after == before
    # deleting a marker makes that epoch invisible (crash window)
    epochs = sorted({e for e, *_ in before})
    os.remove(os.path.join(state, "_epochs", str(epochs[-1])))
    left = {e for e, *_ in (
        (r.epoch, r.q) for r in read_quantile_log(spark, state).collect()
    )}
    assert epochs[-1] not in left


@pytest.mark.slow
def test_stream_quantile_state_compaction(spark, tmp_path):
    """Mid-stream state compaction: fold the sketch segments into a
    base (watermark gating, markers retained for the output log), then
    continue the stream — later epochs' estimates still equal the
    batch replay, folded segment dirs are gone, and a stale restored
    segment is ignored."""
    import shutil

    from collection_templates_spark.operators.index_maintenance import (
        compact_state_segments,
        read_layout,
    )

    tmp = str(tmp_path)
    _, state = _run(spark, tmp)
    n_before = len(read_quantile_log(spark, state).collect())
    # snapshot a segment to restore later (stale-segment crash window)
    shutil.copytree(
        f"{state}/sketch/epoch=0", f"{tmp}/snap_epoch0"
    )
    stats = compact_state_segments(
        spark, state, "sketch", ("bin",), cnt_col="cnt"
    )
    assert stats["epochs_folded"] == 3
    assert not os.path.exists(f"{state}/sketch/epoch=0")
    lay = read_layout(state, {})
    assert lay["sketch_watermark"] == 2 and lay["sketch_base"]
    # markers survive (they gate the output log)
    assert len(read_quantile_log(spark, state).collect()) == n_before

    # restore a folded segment (GC-crash simulation): watermark must
    # keep it invisible to the cumulative read
    shutil.copytree(f"{tmp}/snap_epoch0", f"{state}/sketch/epoch=0")

    # continue the stream with a 4th batch
    extra = [(float(1 + x % 100),) for x in range(100)]
    d = f"{tmp}/b3"
    _df(spark, extra).coalesce(1).write.mode("overwrite").parquet(d)
    flat = f"{tmp}/flat"
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            os.replace(f"{d}/{f}", f"{flat}/0003.parquet")
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_quantile_monitor(
        spark, flat, f"{tmp}/ref", state, f"{tmp}/ckpt", schema, "v",
        quantiles=QS, rel_alarm=0.5,
    )
    q.awaitTermination(120)
    log = read_quantile_log(spark, state).collect()
    by_epoch = {}
    for r in log:
        by_epoch.setdefault(r.epoch, {})[r.q] = r.est_q
    last = max(by_epoch)
    rows = [x for b in BATCHES for x in b] + extra
    want = {
        r.q: r.est_q
        for r in ddsketch_quantiles(
            ddsketch_bins(_df(spark, rows), "v"), QS
        ).collect()
    }
    for qv in QS:
        assert by_epoch[last][qv] == want[qv], qv
