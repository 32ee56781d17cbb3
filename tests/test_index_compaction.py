"""Compaction invariance for the persisted incremental indexes
(r12 verdict #6): N appends followed by compaction must preserve probe
results EXACTLY while the data-file count drops, the epoch-fold must
respect markers and the watermark, and every crash window of the
versioned-dir + atomic-pointer protocol must leave a valid index."""

import pytest
import os
import shutil

from collection_templates_spark.operators.incremental_ann import (
    ann_batch_against_index,
    append_to_ivf_index,
    build_ivf_index,
)
from collection_templates_spark.operators.incremental_dedup import (
    append_to_index,
    build_minhash_index,
    dedup_batch_against_index,
)
from collection_templates_spark.operators.index_maintenance import (
    compact_ivf_index,
    compact_minhash_index,
    parquet_file_count,
    read_layout,
)

_HISTORY = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "completely unrelated text about parquet column pruning here"),
    (4, "distributed joins shuffle on their keys unless broadcast applies"),
]
_B1 = [
    (101, "the quick brown fox jumps over the lazy dog yesterday"),
    (102, "watermarks bound state for late arriving streaming events"),
]
_B2 = [
    (201, "the quick brown fox jumps over the lazy dog today"),
    (202, "watermarks bound state for late arriving streaming rows"),
]
_PROBE = [
    (301, "the quick brown fox jumps over the lazy dog tonight"),
    (302, "watermarks bound state for late arriving streaming events"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _pairs(df):
    return {
        (r["doc_new"], r["doc_old"], r["jaccard"]) for r in df.collect()
    }


def _vecs(spark, ids, seed):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(8)]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _topk(df):
    return {
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in df.collect()
    }


# ---------------------------------------------------------------------------
# IVF vector index
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_ann_compaction_probe_invariant_and_fewer_files(spark, tmp_path):
    idx = str(tmp_path / "ann")
    corpus = _vecs(spark, range(40), 1)
    build_ivf_index(corpus, idx, n_clusters=4, iterations=2)
    for s in (2, 3, 4):
        append_to_ivf_index(_vecs(spark, range(40 * s, 40 * s + 10), s), idx)
    batch = _vecs(spark, range(900, 905), 9)
    before = _topk(ann_batch_against_index(spark, idx, batch, k=3))
    files_before = parquet_file_count(os.path.join(idx, "vectors"))
    stats = compact_ivf_index(spark, idx)
    assert stats["files_before"] == files_before
    assert stats["files_after"] < files_before
    # exactly one data file per cluster partition after the rewrite
    live = read_layout(idx, {"vectors": "vectors"})["vectors"]
    for d in os.listdir(os.path.join(idx, live)):
        if d.startswith("cluster="):
            n = parquet_file_count(os.path.join(idx, live, d))
            assert n == 1, (d, n)
    after = _topk(ann_batch_against_index(spark, idx, batch, k=3))
    assert after == before
    # old base dir is gone (GC) and the pointer names the new one
    assert not os.path.exists(os.path.join(idx, "vectors"))


@pytest.mark.slow
def test_ann_append_after_compaction_matches_uncompacted(spark, tmp_path):
    """build + append + compact + append ≡ build + append + append —
    compaction is invisible to every later operation."""
    corpus = _vecs(spark, range(40), 1)
    b1 = _vecs(spark, range(100, 110), 2)
    b2 = _vecs(spark, range(200, 210), 3)
    batch = _vecs(spark, range(900, 905), 9)

    plain = str(tmp_path / "plain")
    build_ivf_index(corpus, plain, n_clusters=4, iterations=2)
    append_to_ivf_index(b1, plain)
    append_to_ivf_index(b2, plain)

    comp = str(tmp_path / "comp")
    build_ivf_index(corpus, comp, n_clusters=4, iterations=2)
    append_to_ivf_index(b1, comp)
    compact_ivf_index(spark, comp)
    append_to_ivf_index(b2, comp)
    compact_ivf_index(spark, comp)  # second compaction: version chain

    assert _topk(
        ann_batch_against_index(spark, comp, batch, k=3)
    ) == _topk(ann_batch_against_index(spark, plain, batch, k=3))


# ---------------------------------------------------------------------------
# MinHash signature index
# ---------------------------------------------------------------------------


def test_dedup_compaction_probe_invariant(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_docs(spark, _HISTORY), idx)
    append_to_index(_docs(spark, _B1), idx)
    append_to_index(_docs(spark, _B2), idx)
    probe = _docs(spark, _PROBE)
    before = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert before  # non-vacuous
    stats = compact_minhash_index(spark, idx)
    assert stats["files_after"] < stats["files_before"]
    after = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert after == before
    # append after compaction lands in the live base and is probed
    append_to_index(
        _docs(
            spark,
            [(401, "the quick brown fox jumps over the lazy dog tonight")],
        ),
        idx,
    )
    grown = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert any(old == 401 for _, old, _ in grown)
    assert grown >= after


def _write_epoch_segment(spark, idx, epoch, rows, marked=True):
    """Handcraft a streaming epoch segment the way delta_stream
    publishes one: epoch-addressed band/shingle dirs, marker LAST."""
    from collection_templates_spark.operators.dedup import (
        hashed_shingle_sets,
        lsh_band_table,
    )

    sets = hashed_shingle_sets(_docs(spark, rows), "doc_id", "text", 3)
    bands = lsh_band_table(sets, 64, 2)
    bands.write.mode("overwrite").parquet(
        f"{idx}/bands_epochs/epoch={epoch}"
    )
    sets.write.mode("overwrite").parquet(
        f"{idx}/shingles_epochs/epoch={epoch}"
    )
    if marked:
        os.makedirs(f"{idx}/_epochs", exist_ok=True)
        open(f"{idx}/_epochs/{epoch}", "w").close()


@pytest.mark.slow
def test_dedup_compaction_folds_marked_epochs_only(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_docs(spark, _HISTORY), idx)
    _write_epoch_segment(spark, idx, 0, _B1, marked=True)
    _write_epoch_segment(spark, idx, 1, _B2, marked=False)  # crashed
    probe = _docs(spark, _PROBE)
    before = _pairs(dedup_batch_against_index(spark, idx, probe))
    # the marked segment's docs are visible, the crashed one's are not
    assert any(old in (101, 102) for _, old, _ in before)
    assert not any(old in (201, 202) for _, old, _ in before)
    stats = compact_minhash_index(spark, idx)
    assert stats["epochs_folded"] == 1
    after = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert after == before
    lay = read_layout(idx, {})
    assert lay["epoch_watermark"] == 0
    # the crashed segment still exists on disk and is still invisible
    assert os.path.exists(f"{idx}/bands_epochs/epoch=1")


@pytest.mark.slow
def test_dedup_stale_marker_after_fold_is_ignored(spark, tmp_path):
    """GC-crash window: a folded epoch whose marker+segment survive a
    crashed cleanup must NOT double-count — the watermark, not the GC,
    retires segments."""
    idx = str(tmp_path / "idx")
    build_minhash_index(_docs(spark, _HISTORY), idx)
    _write_epoch_segment(spark, idx, 0, _B1, marked=True)
    probe = _docs(spark, _PROBE)
    before = _pairs(dedup_batch_against_index(spark, idx, probe))
    # snapshot the segment, compact (which GCs it), then restore it
    # with its marker — simulating a crash between pointer flip and GC
    snap = str(tmp_path / "snap")
    shutil.copytree(f"{idx}/bands_epochs", f"{snap}/bands_epochs")
    shutil.copytree(f"{idx}/shingles_epochs", f"{snap}/shingles_epochs")
    compact_minhash_index(spark, idx)
    shutil.copytree(f"{snap}/bands_epochs", f"{idx}/bands_epochs", dirs_exist_ok=True)
    shutil.copytree(f"{snap}/shingles_epochs", f"{idx}/shingles_epochs", dirs_exist_ok=True)
    os.makedirs(f"{idx}/_epochs", exist_ok=True)
    open(f"{idx}/_epochs/0", "w").close()
    after = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert after == before  # no duplicates from the restored segment
    # and a SECOND compaction (the idempotent retry) stays invariant
    compact_minhash_index(spark, idx)
    assert _pairs(dedup_batch_against_index(spark, idx, probe)) == before


@pytest.mark.slow
def test_dedup_bucketed_compaction_swaps_catalog(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_docs(spark, _HISTORY), idx, bucket_bands=4)
    append_to_index(_docs(spark, _B1), idx, bucket_bands=4)
    probe = _docs(spark, _PROBE)
    before = _pairs(dedup_batch_against_index(spark, idx, probe))
    from collection_templates_spark.operators.incremental_dedup import (
        _bands_table_name,
    )

    old_table = _bands_table_name(idx)
    assert spark.catalog.tableExists(old_table)
    compact_minhash_index(spark, idx, bucket_bands=4)
    lay = read_layout(idx, {})
    assert lay["bands_table"] and lay["bands_table"] != old_table
    assert spark.catalog.tableExists(lay["bands_table"])
    assert not spark.catalog.tableExists(old_table)
    assert _pairs(dedup_batch_against_index(spark, idx, probe)) == before
    # a rebuild retires the compacted layout entirely
    build_minhash_index(_docs(spark, _HISTORY), idx, bucket_bands=4)
    assert not os.path.exists(os.path.join(idx, "_layout.json"))
    assert spark.catalog.tableExists(old_table)


@pytest.mark.slow
def test_dedup_tombstone_covering_late_epoch_survives_fold(
    spark, tmp_path, monkeypatch
):
    """ADVICE r14 (index_maintenance GC race): a tombstone masking a
    doc that lives ONLY in an epoch segment completing after the
    fold's segment listing must survive that fold's GC — the
    cover-epoch stamp keeps it on disk until the fold that actually
    folds its epoch, so the delete can never resurface under
    concurrent streaming ingest."""
    from collection_templates_spark.operators import (
        incremental_dedup as _inc,
    )
    from collection_templates_spark.operators.incremental_dedup import (
        delete_from_index,
    )
    from collection_templates_spark.operators.index_maintenance import (
        tombstone_files,
    )

    idx = str(tmp_path / "idx")
    probe = _docs(spark, _PROBE)
    build_minhash_index(_docs(spark, _HISTORY), idx)
    # doc 101 exists ONLY in epoch 0; the tombstone lands after the
    # marker, so it is stamped cover=0
    _write_epoch_segment(spark, idx, 0, _B1, marked=True)
    delete_from_index(spark, idx, [101])
    before = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert all(old != 101 for _, old, _ in before)

    # the race: epoch 0 completed AFTER this fold listed segments —
    # simulate with a stale (empty) listing while the tombstone
    # snapshot below it still sees the cover=0 segment
    monkeypatch.setattr(
        _inc, "_completed_epoch_dirs", lambda *a, **k: []
    )
    compact_minhash_index(spark, idx)
    monkeypatch.undo()

    # the old snapshot GC deleted these files here — the cover stamp
    # must keep them (epoch 0 is still unfolded)
    assert tombstone_files(idx), "tombstone GC'd before its epoch folded"
    mid = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert mid == before  # still masked

    # the NEXT fold sees epoch 0, folds it, and only then GCs
    stats = compact_minhash_index(spark, idx)
    assert stats["epochs_folded"] == 1
    assert tombstone_files(idx) == []
    after = _pairs(dedup_batch_against_index(spark, idx, probe))
    assert after == before
    assert all(old != 101 for _, old, _ in after)
