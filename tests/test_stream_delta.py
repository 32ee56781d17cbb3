"""Streaming delta pipeline (streaming/delta_stream.py): per-file
micro-batches probe/accept against the persisted minhash index, and the
result is IDENTICAL to replaying the same files sequentially through the
batch operators — the per-batch batch-oracle check r9 verdict #8 asked
for. Plus the epoch-marker idempotency guard (re-running the drained
stream changes nothing)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.incremental_dedup import (
    append_to_index,
    build_minhash_index,
    dedup_batch_against_index,
)
from collection_templates_spark.streaming.delta_stream import (
    stream_delta_pipeline,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


HISTORY = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "sphinx of black quartz judge my vow completely today"),
]
# batch 1: doc 11 near-dups history doc 1; doc 12 is fresh
BATCH1 = [
    (11, "the quick brown fox jumps over the lazy dog tonight"),
    (12, "a completely novel document about spark structured streaming"),
]
# batch 2: doc 21 near-dups doc 12 (ACCEPTED from batch 1 — catches
# streams that forget to append survivors); doc 22 fresh
BATCH2 = [
    (21, "a completely novel document about spark structured streaming"),
    (22, "another entirely different text with no overlap whatsoever"),
]


def _run_stream(spark, tmp, batches):
    drop = f"{tmp}/drop"
    idx = f"{tmp}/index"
    accepted = f"{tmp}/accepted"
    ckpt = f"{tmp}/ckpt"
    build_minhash_index(_docs(spark, HISTORY), idx)
    schema = _docs(spark, HISTORY).schema
    for i, rows in enumerate(batches):
        _docs(spark, rows).coalesce(1).write.mode("append").parquet(drop)
        time.sleep(1.1)  # distinct mtimes: file-source picks up in order
    q = stream_delta_pipeline(spark, drop, idx, accepted, ckpt, schema)
    q.awaitTermination(120)
    return drop, idx, accepted, ckpt


def _batch_replay(spark, tmp, batches):
    idx = f"{tmp}/index_oracle"
    build_minhash_index(_docs(spark, HISTORY), idx)
    accepted = []
    for rows in batches:
        batch = _docs(spark, rows)
        pairs = dedup_batch_against_index(spark, idx, batch)
        matched = {r.doc_new for r in pairs.collect()}
        kept = [r for r in rows if r[0] not in matched]
        accepted.extend(kept)
        if kept:
            append_to_index(_docs(spark, kept), idx)
    return accepted, idx


@pytest.mark.slow
def test_stream_matches_sequential_batch_replay(spark, tmp_path):
    tmp = str(tmp_path)
    batches = [BATCH1, BATCH2]
    _, idx, accepted_dir, _ = _run_stream(spark, tmp, batches)
    got = sorted(
        r.doc_id for r in spark.read.parquet(accepted_dir).collect()
    )
    expected, idx_oracle = _batch_replay(spark, tmp, batches)
    assert got == sorted(d for d, _ in expected)
    # 11 is a history dup, 21 duplicates the batch-1 survivor 12
    assert got == [12, 22]
    # index state converged too: both indexes give identical pair sets
    # for a fresh probing batch
    probe = _docs(
        spark,
        [(91, BATCH1[1][1]), (92, "the quick brown fox jumps over "
                                  "the lazy dog tonight")],
    )
    p_stream = sorted(
        (r.doc_new, r.doc_old)
        for r in dedup_batch_against_index(spark, idx, probe).collect()
    )
    p_oracle = sorted(
        (r.doc_new, r.doc_old)
        for r in dedup_batch_against_index(
            spark, idx_oracle, probe
        ).collect()
    )
    assert p_stream == p_oracle
    assert (91, 12) in p_stream and (92, 1) in p_stream


@pytest.mark.slow
def test_stream_rerun_is_idempotent(spark, tmp_path):
    tmp = str(tmp_path)
    drop, idx, accepted_dir, ckpt = _run_stream(spark, tmp, [BATCH1])
    before = sorted(
        r.doc_id for r in spark.read.parquet(accepted_dir).collect()
    )
    schema = _docs(spark, HISTORY).schema
    # drain again with the same checkpoint: no new files -> no change
    q = stream_delta_pipeline(spark, drop, idx, accepted_dir, ckpt, schema)
    q.awaitTermination(120)
    after = sorted(
        r.doc_id for r in spark.read.parquet(accepted_dir).collect()
    )
    assert before == after == [12]
    # epoch markers exist (the foreachBatch idempotency guard)
    assert os.listdir(os.path.join(idx, "_epochs"))


@pytest.mark.slow
def test_unmarked_epoch_segment_is_invisible_to_probe(spark, tmp_path):
    """r11-advice crash window #2: a crash AFTER the epoch's index
    segment write but BEFORE the marker must not make the recovery
    replay probe the batch against itself. Unmarked segments are
    ignored; marking flips them into the index."""
    from collection_templates_spark.operators.dedup import (
        hashed_shingle_sets,
        lsh_band_table,
    )
    from collection_templates_spark.streaming.delta_stream import (
        _epoch_marker,
    )

    tmp = str(tmp_path)
    idx = f"{tmp}/index"
    build_minhash_index(_docs(spark, HISTORY), idx)
    batch = _docs(spark, BATCH1)
    # simulate the crashed attempt: segment written, marker NOT written
    sets = hashed_shingle_sets(batch, "doc_id", "text", 3)
    lsh_band_table(sets, 64, 2).write.mode("overwrite").parquet(
        f"{idx}/bands_epochs/epoch=5"
    )
    sets.write.mode("overwrite").parquet(f"{idx}/shingles_epochs/epoch=5")
    pairs = {
        (r.doc_new, r.doc_old)
        for r in dedup_batch_against_index(spark, idx, batch).collect()
    }
    # doc 11 matches HISTORY doc 1 — and nothing matches the unmarked
    # segment (11↔11 / 12↔12 self-pairs would appear if it leaked)
    assert pairs == {(11, 1)}
    # recovery completes: marker written -> the segment IS the index now
    os.makedirs(os.path.dirname(_epoch_marker(idx, 5)), exist_ok=True)
    with open(_epoch_marker(idx, 5), "w") as fh:
        fh.write("applied")
    probe = _docs(spark, [(91, BATCH1[1][1])])
    pairs2 = {
        (r.doc_new, r.doc_old)
        for r in dedup_batch_against_index(spark, idx, probe).collect()
    }
    assert (91, 12) in pairs2


def test_epoch_replay_overwrites_instead_of_duplicating(spark, tmp_path):
    """r11-advice crash window #1: a crash AFTER the accepted write but
    BEFORE the marker means the recovery replay re-writes the epoch.
    Epoch-addressed overwrite converges — no duplicate doc_ids."""
    from collection_templates_spark.streaming.delta_stream import (
        _epoch_marker,
        read_accepted,
    )

    tmp = str(tmp_path)
    idx = f"{tmp}/index"
    accepted = f"{tmp}/accepted"
    build_minhash_index(_docs(spark, HISTORY), idx)
    kept = _docs(spark, [BATCH1[1]])
    # first (crashed) attempt + replay: two writes of the same epoch
    kept.write.mode("overwrite").parquet(f"{accepted}/epoch=3")
    assert read_accepted(spark, accepted, idx) is None  # unmarked: hidden
    kept.write.mode("overwrite").parquet(f"{accepted}/epoch=3")
    os.makedirs(os.path.dirname(_epoch_marker(idx, 3)), exist_ok=True)
    with open(_epoch_marker(idx, 3), "w") as fh:
        fh.write("applied")
    rows = read_accepted(spark, accepted, idx).collect()
    assert sorted(r.doc_id for r in rows) == [12]  # exactly once
    raw = spark.read.parquet(accepted)
    assert raw.count() == 1


@pytest.mark.slow
def test_index_rebuild_clears_epoch_segments(spark, tmp_path):
    """Compaction contract: build_minhash_index(overwrite) subsumes and
    removes any streaming epoch segments + markers."""
    tmp = str(tmp_path)
    _, idx, accepted_dir, _ = _run_stream(spark, tmp, [BATCH1])
    assert os.path.isdir(f"{idx}/bands_epochs")
    build_minhash_index(_docs(spark, HISTORY), idx)
    assert not os.path.isdir(f"{idx}/bands_epochs")
    assert not os.path.isdir(f"{idx}/_epochs")


@pytest.mark.slow
def test_watermarked_stream_routes_late_rows(spark, tmp_path):
    """r11 verdict #5: out-of-order batch arrival under a watermark
    policy — rows with event time strictly below (max completed-epoch
    event time - delay) go to the late sink and never probe/accept;
    the stream equals a sequential batch replay applying the same
    cutoff."""
    from collection_templates_spark.streaming.delta_stream import (
        stream_delta_pipeline,
    )

    tmp = str(tmp_path)
    drop, idx = f"{tmp}/drop", f"{tmp}/index"
    accepted, late, ckpt = f"{tmp}/acc", f"{tmp}/late", f"{tmp}/ckpt"
    S = 1_000_000  # seconds -> micros
    delay = 300 * S

    def docs_ts(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, ts long"
        )

    build_minhash_index(_docs(spark, HISTORY), idx)
    b1 = [(11, BATCH1[0][1], 1000 * S), (12, BATCH1[1][1], 1000 * S)]
    b2 = [(21, BATCH2[0][1], 2000 * S), (22, BATCH2[1][1], 2000 * S)]
    # out-of-order drop: two LATE novel docs (500s < wm=1700s) + one
    # on-time doc; late docs are novel, so silently processing them
    # (the bug mode) would change the accepted set
    b3 = [
        (31, "late yet entirely novel first document here", 500 * S),
        (32, "late and also novel second document text", 500 * S),
        (33, "an on time novel document about watermarks", 2100 * S),
    ]
    batches = [b1, b2, b3]
    for rows in batches:
        docs_ts(rows).coalesce(1).write.mode("append").parquet(drop)
        time.sleep(1.1)
    q = stream_delta_pipeline(
        spark, drop, idx, accepted, ckpt, docs_ts(b1).schema,
        ts_col="ts", delay_us=delay, late_dir=late,
    )
    q.awaitTermination(180)

    got_acc = sorted(
        r.doc_id for r in spark.read.parquet(accepted).collect()
    )
    got_late = sorted(
        r.doc_id for r in spark.read.parquet(late).collect()
    )
    assert got_late == [31, 32]
    # 11 dups history; 21 dups accepted 12; 31/32 late; rest accepted
    assert got_acc == [12, 22, 33]

    # sequential batch replay with the same watermark rule
    idx2 = f"{tmp}/idx2"
    build_minhash_index(_docs(spark, HISTORY), idx2)
    wm_max, exp_acc, exp_late = None, [], []
    for rows in batches:
        batch_max = max(ts for _, _, ts in rows)
        if wm_max is not None:
            cutoff = wm_max - delay
            exp_late.extend(d for d, _, ts in rows if ts < cutoff)
            rows = [r for r in rows if r[2] >= cutoff]
        wm_max = batch_max if wm_max is None else max(wm_max, batch_max)
        if not rows:
            continue
        batch = _docs(spark, [(d, t) for d, t, _ in rows])
        matched = {
            r.doc_new
            for r in dedup_batch_against_index(spark, idx2, batch).collect()
        }
        kept = [(d, t) for d, t, _ in rows if d not in matched]
        exp_acc.extend(d for d, _ in kept)
        if kept:
            append_to_index(_docs(spark, kept), idx2)
    assert got_acc == sorted(exp_acc)
    assert got_late == sorted(exp_late)
