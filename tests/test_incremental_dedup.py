"""incremental_dedup: the persisted-index probe equals the full-corpus
LSH pair set restricted to batch-involving CROSS pairs.

This is the module's whole contract (r8 verdict #2): deduping a new
batch against history must cost O(batch + matched state) while
producing EXACTLY what a from-scratch ``minhash_lsh_pairs(history ∪
batch, min_band_collisions=1)`` run would report for pairs that span
the batch/history boundary. Pinned here:

1. build → probe equivalence against the full-corpus reference,
2. the append path (probe batch2 after accepting batch1 sees pairs
   against BOTH history and batch1),
3. the joined-bucket cap (|batch bucket| × |history bucket| guard)
   drops a planted hot bucket and ``None`` restores exactness,
4. batch-internal pairs are NOT emitted (callers run the ordinary
   batch-sized ``minhash_lsh_pairs`` for those).
"""

import pytest

from collection_templates_spark.operators.dedup import minhash_lsh_pairs
from collection_templates_spark.operators.incremental_dedup import (
    append_to_index,
    build_minhash_index,
    dedup_batch_against_index,
)

# Near-dup clusters: edits of a base sentence keep word-3-gram jaccard
# comfortably above 0.5; unrelated docs share no shingles.
_HISTORY = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "completely unrelated text about parquet column pruning here"),
    (4, "distributed joins shuffle on their keys unless broadcast applies"),
]
_BATCH1 = [
    (101, "the quick brown fox jumps over the lazy dog yesterday"),
    (102, "watermarks bound state for late arriving streaming events"),
]
_BATCH2 = [
    (201, "the quick brown fox jumps over the lazy dog today"),
    (202, "watermarks bound state for late arriving streaming rows"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _cross_pairs(full_df, batch_ids):
    """Full-corpus pairs restricted to exactly-one-side-in-batch, as
    order-free ({a, b}, jaccard) tuples."""
    out = set()
    for r in full_df.collect():
        in_b = (r["doc1"] in batch_ids) + (r["doc2"] in batch_ids)
        if in_b == 1:
            out.add((frozenset((r["doc1"], r["doc2"])), r["jaccard"]))
    return out


def _probe_pairs(df):
    return {
        (frozenset((r["doc_new"], r["doc_old"])), r["jaccard"])
        for r in df.collect()
    }


def test_probe_equals_full_corpus_cross_pairs(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_df(spark, _HISTORY), idx)
    got = _probe_pairs(
        dedup_batch_against_index(spark, idx, _df(spark, _BATCH1))
    )
    full = minhash_lsh_pairs(
        _df(spark, _HISTORY + _BATCH1),
        min_band_collisions=1,
        max_bucket_size=None,
    )
    want = _cross_pairs(full, {i for i, _ in _BATCH1})
    assert got == want
    assert got  # the planted near-dup (101 vs 1/2) must be present


def test_append_then_probe_sees_accepted_batch(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_df(spark, _HISTORY), idx)
    append_to_index(_df(spark, _BATCH1), idx)
    got = _probe_pairs(
        dedup_batch_against_index(spark, idx, _df(spark, _BATCH2))
    )
    full = minhash_lsh_pairs(
        _df(spark, _HISTORY + _BATCH1 + _BATCH2),
        min_band_collisions=1,
        max_bucket_size=None,
    )
    want = _cross_pairs(full, {i for i, _ in _BATCH2})
    assert got == want
    # 201 duplicates history doc 1 AND batch1's 101; 202 near-dups
    # batch1's 102 — the append path must surface the batch1 matches
    matched = {next(iter(p - {201, 202})) for p, _ in got}
    assert 101 in matched and 102 in matched


def test_batch_internal_pairs_not_emitted(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_minhash_index(_df(spark, _HISTORY), idx)
    twins = [
        (301, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (302, "alpha beta gamma delta epsilon zeta eta theta kappa"),
    ]
    out = dedup_batch_against_index(spark, idx, _df(spark, twins))
    assert out.count() == 0  # 301↔302 is batch-internal, not cross


@pytest.mark.slow
def test_joined_bucket_cap_drops_hot_bucket(spark, tmp_path):
    # 10 identical history docs: every band bucket the batch doc probes
    # joins to 10 rows, so a cap of 5 drops them all; None restores the
    # exact 10 cross pairs.
    hot = [(i, "same exact hot text repeated in every document") for i in
           range(10)]
    probe = [(900, "same exact hot text repeated in every document")]
    idx = str(tmp_path / "idx")
    build_minhash_index(_df(spark, hot), idx)
    capped = dedup_batch_against_index(
        spark, idx, _df(spark, probe), max_bucket_size=5
    )
    assert capped.count() == 0
    uncapped = dedup_batch_against_index(
        spark, idx, _df(spark, probe), max_bucket_size=None
    )
    assert uncapped.count() == 10


@pytest.mark.slow
def test_bucketed_index_probe_skips_history_shuffle(spark, tmp_path):
    """bucket_bands: the persisted band table is bucketed on band_hash,
    so the probe's candidate join reads history bucket-aligned (scan
    shows the bucket spec; one fewer Exchange than the plain-parquet
    probe) and produces the identical pair set."""
    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    plain_idx = str(tmp_path / "plain")
    buck_idx = str(tmp_path / "bucketed")
    hist = _df(spark, _HISTORY)
    build_minhash_index(hist, plain_idx)
    build_minhash_index(hist, buck_idx, bucket_bands=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = dedup_batch_against_index(
            spark, plain_idx, _df(spark, _BATCH1)
        )
        bucketed = dedup_batch_against_index(
            spark, buck_idx, _df(spark, _BATCH1)
        )
        p_plain, p_buck = plan_of(plain), plan_of(bucketed)
        assert "Bucketed: true" in p_buck, p_buck
        # the band table feeds both the bucket-cap count and the pair
        # join — each consumer loses its history-side shuffle
        assert p_buck.count("Exchange") <= p_plain.count("Exchange") - 2, (
            p_buck
        )
        assert _probe_pairs(bucketed) == _probe_pairs(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
