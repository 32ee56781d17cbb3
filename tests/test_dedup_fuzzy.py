"""blocked_levenshtein_pairs: blocking exactness and the block-size cap.

``max_block_size`` is the r7-verdict hardening: blocking is equi-keyed
(never all-pairs), but a skewed blocking key — many names sharing a
first token within one block — reintroduces an uncapped quadratic term
INSIDE the block. The cap drops degenerate blocks before pair
generation, mirroring ``minhash_lsh_pairs``'s ``max_bucket_size``.
Contract pinned here: (1) when every block is under the cap the result
is EXACT (this is why the ``dedup_fuzzy_names`` bank row can be oracled
as the full replay), (2) a planted 10k-name hot block produces ZERO
candidate pairs under the default cap instead of ~5·10⁷, and (3)
``max_block_size=None`` restores the uncapped semantics.
"""

import pytest

from collection_templates_spark.operators.dedup import (
    blocked_levenshtein_pairs,
)


def _names_df(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "doc_id int, text string"
    )


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["distance"]) for r in df.collect()}


def test_small_blocks_exact(spark):
    # two blocks ("acme", "zen"); within acme: 0↔1 distance 1, 0↔2 and
    # 1↔2 exceed max_distance; cross-block pairs never considered even
    # when the edit distance is tiny ("zen x" vs "acme x").
    df = _names_df(
        spark,
        ["acme corp", "acme corp2", "acme unrelated inc", "zen corp"],
    )
    got = _pairs(blocked_levenshtein_pairs(df, max_distance=2))
    assert got == {(0, 1, 1)}


def test_block_cols_partition_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp", "t1"),
            (2, "acme corpo", "t1"),
            (3, "acme corp", "t2"),
        ],
        "doc_id int, text string, cat string",
    )
    out = blocked_levenshtein_pairs(df, block_cols=("cat",), max_distance=2)
    rows = out.collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}
    assert rows[0]["cat"] == "t1"  # block col rides through


def test_planted_hot_block_is_dropped_by_default_cap(spark):
    # 10k names share the first token: one 10k block = ~5e7 ordered
    # pairs if uncapped. Default max_block_size=1000 must drop it
    # BEFORE pair generation while the small clean block still matches.
    hot = [f"alpha name{i:05d}" for i in range(10_000)]
    clean = ["beta corp", "beta corp2"]
    df = _names_df(spark, hot + clean)
    got = _pairs(blocked_levenshtein_pairs(df, max_distance=3))
    assert got == {(10_000, 10_001, 1)}


def test_cap_none_restores_uncapped_semantics(spark):
    names = [f"gamma v{i}" for i in range(50)]
    df = _names_df(spark, names)
    capped = blocked_levenshtein_pairs(df, max_distance=3, max_block_size=49)
    assert capped.count() == 0
    uncapped = blocked_levenshtein_pairs(
        df, max_distance=3, max_block_size=None
    )
    # every ordered pair of the 50 "gamma vX" names is within distance 3
    # of at least the two-char suffix edits; spot-check the count is the
    # full ordered-pair set for the ≤2-char-suffix subset (v0..v9: all
    # single-digit suffixes differ by 1 substitution)
    single = uncapped.filter("id_a < 10 and id_b < 10")
    assert single.count() == 45  # C(10,2), each distance 1
    assert uncapped.count() > 45


def test_null_blocking_keys_produce_no_pairs(spark):
    # Blocking is join-EQUALITY on the keys: NULL never equals NULL, so
    # two rows sharing a NULL block column must NOT become candidates
    # (r8 advice: groupBy would bucket NULLs together — the operator
    # filters NULL-keyed rows to keep the equi-join / oracle contract).
    df = spark.createDataFrame(
        [
            (1, "acme corp", None),
            (2, "acme corpo", None),
            (3, "acme corp", "t1"),
            (4, "acme corps", "t1"),
            (5, None, "t1"),  # NULL name → NULL first-token key
        ],
        "doc_id int, text string, cat string",
    )
    out = blocked_levenshtein_pairs(df, block_cols=("cat",), max_distance=2)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(3, 4)}
