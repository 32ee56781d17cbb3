"""Streaming drift monitor (streaming/drift_stream.py): per-epoch PSI
equals the batch composition psi_from_histograms(reference, union of
batches 0..k) — stream == batch replay, the delta_stream check pattern
— plus rerun idempotency and marker-gated crash consistency."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from collection_templates_spark.operators.drift import (
    binned_counts,
    psi_from_histograms,
)
from collection_templates_spark.streaming.drift_stream import (
    build_reference_histogram,
    read_psi_log,
    stream_drift_monitor,
)

SCHEMA = "grp string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


REF = [("g", float(x % 10)) for x in range(200)]
# batch 0 matches the reference; later batches drift upward
BATCHES = [
    [("g", float(x % 10)) for x in range(40)],
    [("g", float(5 + x % 5)) for x in range(40)],
    [("g", 9.0)] * 40,
]


def _batch_psi(spark, ref_path, upto):
    ref = spark.read.parquet(ref_path)
    rows = [r for b in BATCHES[: upto + 1] for r in b]
    cum = (
        binned_counts(_df(spark, rows), "grp", "v", F.lit("cur"), 10, 0.0, 10.0)
        .select("grp", "bin", "n")
    )
    return {
        r.grp: (r.n_a, r.n_b, r.psi)
        for r in psi_from_histograms(ref, cum, 10).collect()
    }


def _run(spark, tmp):
    drop = f"{tmp}/drop"
    os.makedirs(drop, exist_ok=True)
    ref_path = f"{tmp}/ref"
    state = f"{tmp}/state"
    build_reference_histogram(
        _df(spark, REF), ref_path, "grp", "v", n_bins=10, lo=0.0, hi=10.0
    )
    for i, rows in enumerate(BATCHES):
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
            f"{drop}/batch_{i}"
        )
    # file source lists files, not dirs — flatten the parquet parts
    files = []
    for i in range(len(BATCHES)):
        for f in os.listdir(f"{drop}/batch_{i}"):
            if f.endswith(".parquet"):
                files.append((f"{drop}/batch_{i}/{f}", i))
    flat = f"{tmp}/flat"
    os.makedirs(flat, exist_ok=True)
    for path, i in files:
        os.replace(path, f"{flat}/{i:04d}.parquet")
    schema = spark.read.parquet(f"{flat}/0000.parquet").schema
    q = stream_drift_monitor(
        spark, flat, ref_path, state, f"{tmp}/ckpt", schema,
        "grp", "v", n_bins=10, lo=0.0, hi=10.0,
    )
    q.awaitTermination(120)
    return ref_path, state


def test_stream_psi_matches_batch_replay(spark, tmp_path):
    ref_path, state = _run(spark, str(tmp_path))
    log = read_psi_log(spark, state).collect()
    by_epoch = {r.epoch: (r.n_a, r.n_b, r.psi) for r in log}
    assert len(by_epoch) == 3
    epochs = sorted(by_epoch)
    for k, e in enumerate(epochs):
        assert by_epoch[e] == _batch_psi(spark, ref_path, k)["g"], (k, e)
    # drift grows as the shifted batches accumulate
    psis = [by_epoch[e][2] for e in epochs]
    assert psis[0] < psis[1] < psis[2]
    # batch 0 alone matches the reference closely
    assert psis[0] < 0.05 and psis[2] > 0.3


@pytest.mark.slow
def test_stream_rerun_is_idempotent(spark, tmp_path):
    ref_path, state = _run(spark, str(tmp_path))
    before = sorted(
        map(tuple, read_psi_log(spark, state).collect())
    )
    # drained rerun: same checkpoint, no new files -> nothing changes
    schema = spark.read.parquet(
        f"{tmp_path}/flat/0000.parquet"
    ).schema
    q = stream_drift_monitor(
        spark, f"{tmp_path}/flat", ref_path, state,
        f"{tmp_path}/ckpt", schema, "grp", "v",
        n_bins=10, lo=0.0, hi=10.0,
    )
    q.awaitTermination(120)
    after = sorted(map(tuple, read_psi_log(spark, state).collect()))
    assert after == before


@pytest.mark.slow
def test_unmarked_epoch_invisible(spark, tmp_path):
    ref_path, state = _run(spark, str(tmp_path))
    epochs = sorted(
        int(p) for p in os.listdir(f"{state}/_epochs")
    )
    last = epochs[-1]
    # simulate a crash-window state: delete the last marker — its psi
    # rows and histogram segment must become invisible to readers
    os.remove(f"{state}/_epochs/{last}")
    log = read_psi_log(spark, state)
    assert log.filter(F.col("epoch") == last).count() == 0
    assert log.select("epoch").distinct().count() == len(epochs) - 1
