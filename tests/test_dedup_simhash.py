"""SimHash recall guarantee: the pigeonhole-blocked pair join must return
EXACTLY the brute-force hamming-join pair set, including at large
max_hamming where round-1's fixed 4-band blocking silently dropped pairs.

Reference has no SimHash (LLM-pipeline extension); blocking scheme is
multi-index hashing (Norouzi et al., "Fast Search in Hamming Space with
Multi-Index Hashing").
"""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import (
    SIMHASH_BITS,
    _chunk_layout,
    simhash_fingerprints,
    simhash_pairs,
)


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the tall green trees above"
    )
    rows = [("d00", base)]
    # planted near-dups: progressively larger single-word edits
    words = base.split(" ")
    for i in range(1, 12):
        mutated = list(words)
        for j in range(i):
            mutated[(3 * j + 1) % len(words)] = f"tok{i}_{j}"
        rows.append((f"d{i:02d}", " ".join(mutated)))
    # unrelated docs
    for i in range(20):
        rows.append(
            (
                f"u{i:02d}",
                " ".join(f"word{i}_{k} filler{(i * 7 + k) % 13}" for k in range(18)),
            )
        )
    rows.append(("tiny", "too short"))  # < 3 words -> no fingerprint
    return spark.createDataFrame(rows, "doc_id string, text string")


def _brute_force_pairs(fps, max_hamming):
    a = fps.select(F.col("doc").alias("doc1"), F.col("fp").alias("fp1"))
    b = fps.select(F.col("doc").alias("doc2"), F.col("fp").alias("fp2"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc1") < F.col("doc2"))
        .withColumn(
            "hamming", F.bit_count(F.col("fp1").bitwiseXOR(F.col("fp2"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


@pytest.mark.parametrize("max_hamming", [3, 12])
def test_blocked_pairs_equal_brute_force(spark, max_hamming):
    docs = _corpus(spark)
    fps = simhash_fingerprints(docs)
    expected = {
        (r.doc1, r.doc2, r.hamming)
        for r in _brute_force_pairs(fps, max_hamming).collect()
    }
    got = {
        (r.doc1, r.doc2, r.hamming)
        for r in simhash_pairs(docs, max_hamming=max_hamming).collect()
    }
    assert got == expected
    if max_hamming == 12:
        # the corpus must actually exercise the 4..12 range that bands=4
        # used to drop, else this test proves nothing
        assert any(4 <= h <= 12 for _, _, h in expected)


def test_insufficient_bands_raise(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, max_hamming=12, bands=4)


def test_chunk_layout_partitions_all_bits():
    for bands in (1, 4, 13, 31, SIMHASH_BITS):
        layout = _chunk_layout(SIMHASH_BITS, bands)
        assert len(layout) == bands
        covered = []
        for off, w in layout:
            assert w >= 1
            covered.extend(range(off, off + w))
        assert covered == list(range(SIMHASH_BITS))


def test_fingerprint_is_62_bit_long(spark):
    docs = _corpus(spark)
    fps = simhash_fingerprints(docs).collect()
    assert len(fps) == len(docs.collect()) - 1  # "tiny" has no shingles
    for r in fps:
        assert 0 <= r.fp < (1 << SIMHASH_BITS)
