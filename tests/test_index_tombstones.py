"""Delete/tombstone support for the persisted incremental indexes
(r13 verdict #2): ``delete_from_index`` / ``delete_from_ivf_index``
append tombstone segments; every later probe masks the deleted ids
(probe == rebuild-from-surviving-docs, the invariance the verdict
asks for); compaction folds tombstones out of the base for good and
the crash window (tombstone outliving the fold's GC) is idempotent."""

import pytest
import os

from collection_templates_spark.operators.incremental_ann import (
    ann_batch_against_index,
    build_ivf_index,
    delete_from_ivf_index,
)
from collection_templates_spark.operators.incremental_dedup import (
    build_minhash_index,
    dedup_batch_against_index,
    delete_from_index,
)
from collection_templates_spark.operators.index_maintenance import (
    compact_ivf_index,
    compact_minhash_index,
    tombstone_files,
)
from collection_templates_spark.operators.similarity import ivf_cosine_topk

_HISTORY = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "completely unrelated text about parquet column pruning here"),
    (4, "distributed joins shuffle on their keys unless broadcast applies"),
    (6, "the quick brown fox jumps over the lazy dog tomorrow"),
]
_PROBE = [
    (301, "the quick brown fox jumps over the lazy dog tonight"),
    (302, "distributed joins shuffle on their keys unless broadcast wins"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _pairs(df):
    return {
        (r["doc_new"], r["doc_old"], r["jaccard"]) for r in df.collect()
    }


def _vecs(spark, ids, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(8)]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _topk(df):
    return {
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in df.collect()
    }


# ---------------------------------------------------------------------------
# MinHash signature index
# ---------------------------------------------------------------------------


def test_dedup_delete_probe_equals_survivor_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    batch = _docs(spark, _PROBE)
    build_minhash_index(_docs(spark, _HISTORY), idx)
    delete_from_index(spark, idx, [1, 6])

    survivors = [r for r in _HISTORY if r[0] not in (1, 6)]
    build_minhash_index(_docs(spark, survivors), ref)

    got = _pairs(dedup_batch_against_index(spark, idx, batch))
    want = _pairs(dedup_batch_against_index(spark, ref, batch))
    assert got == want
    assert all(doc_old not in (1, 6) for _, doc_old, _ in got)
    # the un-deleted near-dup of doc 301 must still be found
    assert any(doc_old == 2 for _, doc_old, _ in got)


@pytest.mark.slow
def test_dedup_delete_bucketed_index(spark, tmp_path):
    """The broadcast anti-join mask must not break the bucketed
    (catalog-table) probe path."""
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    batch = _docs(spark, _PROBE)
    build_minhash_index(_docs(spark, _HISTORY), idx, bucket_bands=4)
    delete_from_index(
        spark, idx, spark.createDataFrame([(1,), (6,)], "doc_id long")
    )
    build_minhash_index(
        _docs(spark, [r for r in _HISTORY if r[0] not in (1, 6)]),
        ref,
        bucket_bands=4,
    )
    got = _pairs(dedup_batch_against_index(spark, idx, batch))
    want = _pairs(dedup_batch_against_index(spark, ref, batch))
    assert got == want


@pytest.mark.slow
def test_dedup_compaction_folds_tombstones(spark, tmp_path):
    idx = str(tmp_path / "idx")
    batch = _docs(spark, _PROBE)
    build_minhash_index(_docs(spark, _HISTORY), idx)
    delete_from_index(spark, idx, [1])
    delete_from_index(spark, idx, [6])
    before = _pairs(dedup_batch_against_index(spark, idx, batch))
    assert len(tombstone_files(idx)) == 2

    stats = compact_minhash_index(spark, idx)
    assert stats["tombstones_folded"] == 2
    assert tombstone_files(idx) == []  # folded and GC'd
    after = _pairs(dedup_batch_against_index(spark, idx, batch))
    assert after == before
    # the deleted docs are physically gone from the compacted base
    lay_bands = spark.read.parquet(
        os.path.join(idx, f"bands_v{stats['version']}")
    )
    assert lay_bands.filter(lay_bands.doc.isin(1, 6)).count() == 0


@pytest.mark.slow
def test_dedup_tombstone_crash_window_idempotent(spark, tmp_path):
    """A tombstone that survives the fold's GC (crash between pointer
    flip and file removal) re-masks rows that are already gone — the
    probe must be unchanged."""
    idx = str(tmp_path / "idx")
    batch = _docs(spark, _PROBE)
    build_minhash_index(_docs(spark, _HISTORY), idx)
    delete_from_index(spark, idx, [1, 6])
    before = _pairs(dedup_batch_against_index(spark, idx, batch))
    compact_minhash_index(spark, idx)
    # simulate the crash: re-append the same tombstones post-fold
    delete_from_index(spark, idx, [1, 6])
    assert _pairs(dedup_batch_against_index(spark, idx, batch)) == before


@pytest.mark.slow
def test_dedup_rebuild_clears_tombstones(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_docs(spark, _HISTORY), idx)
    delete_from_index(spark, idx, [2])
    build_minhash_index(_docs(spark, _HISTORY), idx)  # full rebuild
    assert tombstone_files(idx) == []
    got = _pairs(
        dedup_batch_against_index(spark, idx, _docs(spark, _PROBE))
    )
    assert any(doc_old == 2 for _, doc_old, _ in got)  # 2 is back


# ---------------------------------------------------------------------------
# IVF vector index
# ---------------------------------------------------------------------------


def test_ann_delete_probe_equals_survivor_scan(spark, tmp_path):
    """Probe after delete == direct IVF over the surviving vectors with
    the SAME persisted quantizer (the IVF contract: lists shrink, the
    quantizer is stable — a full rebuild would retrain it)."""
    idx = str(tmp_path / "ann")
    history = _vecs(spark, range(32))
    batch = _vecs(spark, range(100, 106), seed=9)
    cents = build_ivf_index(history, idx, n_clusters=4, iterations=2)
    dead = [0, 5, 12, 31]
    delete_from_ivf_index(spark, idx, dead)

    got = _topk(
        ann_batch_against_index(spark, idx, batch, k=3, n_probe=2)
    )
    want = _topk(
        ivf_cosine_topk(
            history.filter(~history.vec_id.isin(dead)),
            batch,
            k=3,
            n_probe=2,
            centroids=cents,
        )
    )
    assert got == want
    assert all(n not in dead for _, _, n, _ in got)


@pytest.mark.slow
def test_ann_compaction_folds_tombstones(spark, tmp_path):
    idx = str(tmp_path / "ann")
    history = _vecs(spark, range(32))
    batch = _vecs(spark, range(100, 104), seed=9)
    build_ivf_index(history, idx, n_clusters=4, iterations=2)
    delete_from_ivf_index(spark, idx, [3, 7])
    before = _topk(
        ann_batch_against_index(spark, idx, batch, k=3, n_probe=2)
    )
    stats = compact_ivf_index(spark, idx)
    assert stats["tombstones_folded"] == 1
    assert tombstone_files(idx) == []
    after = _topk(
        ann_batch_against_index(spark, idx, batch, k=3, n_probe=2)
    )
    assert after == before
    base = spark.read.parquet(os.path.join(idx, f"vectors_v{stats['version']}"))
    assert base.filter(base.vec_id.isin(3, 7)).count() == 0


@pytest.mark.slow
def test_ann_rebuild_clears_tombstones(spark, tmp_path):
    idx = str(tmp_path / "ann")
    build_ivf_index(_vecs(spark, range(16)), idx, n_clusters=4)
    delete_from_ivf_index(spark, idx, [1])
    build_ivf_index(_vecs(spark, range(16)), idx, n_clusters=4)
    assert tombstone_files(idx) == []


# ---------------------------------------------------------------------------
# Streaming probe path
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_stream_probe_masks_tombstones(spark, tmp_path):
    """The streaming delta pipeline probes through the same masked
    path: a batch doc whose only near-dup in the index was tombstoned
    must be ACCEPTED by the stream, not rejected against a retracted
    document."""
    import time

    from collection_templates_spark.streaming.delta_stream import (
        stream_delta_pipeline,
    )

    tmp = str(tmp_path)
    drop, idx = f"{tmp}/drop", f"{tmp}/index"
    accepted, ckpt = f"{tmp}/accepted", f"{tmp}/ckpt"
    history = _docs(spark, _HISTORY)
    build_minhash_index(history, idx)
    # retract every near-dup of probe doc 301 (docs 1, 2, 6)
    delete_from_index(spark, idx, [1, 2, 6])
    batch = [
        (301, "the quick brown fox jumps over the lazy dog tonight"),
        (302, "watermarks bound state for late arriving streaming events"),
    ]
    _docs(spark, batch).coalesce(1).write.mode("append").parquet(drop)
    time.sleep(1.1)
    q = stream_delta_pipeline(
        spark, drop, idx, accepted, ckpt, history.schema
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(accepted).collect())
    assert got == [301, 302]  # 301's only matches were tombstoned
