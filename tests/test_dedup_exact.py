"""exact_dedup hash-keyed shuffle (r3 verdict #5) and the no-cache-leak
contract of the dedup pair operators (r3 verdict #7)."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

ROWS = [
    (1, "The  quick brown fox"),
    (2, "the quick Brown fox"),  # dup of 1 after normalization
    (3, "something else entirely"),
    (4, "THE QUICK BROWN FOX"),  # dup of 1
    (5, "something else  ENTIRELY"),  # dup of 3
    (6, None),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


EXPECT = {1: (1, 0), 2: (1, 1), 3: (3, 0), 4: (1, 1), 5: (3, 1)}


def _assert_exact(out):
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in out.collect()
        if r["canonical_id"] is not None
    }
    assert {k: v for k, v in got.items() if k != 6} == EXPECT


def test_hash_and_raw_modes_agree(spark):
    docs = _docs(spark)
    _assert_exact(exact_dedup(docs))
    _assert_exact(exact_dedup(docs, hash_keys=False))


def test_forced_total_collision_still_exact(spark):
    """Every row hashing to the same bucket must NOT merge distinct texts:
    the norm in the window key separates colliding groups, so the output
    is exact even under adversarial hash collisions."""
    out = exact_dedup(_docs(spark), hash_fn=lambda c: F.lit(0).cast("long"))
    _assert_exact(out)


def test_hash_mode_shuffles_once_on_the_hash(spark):
    """The plan must contain exactly ONE exchange, and its partitioning
    expression must be the 8-byte hash — never the raw text (at 100 TB
    multi-KB shuffle keys dominate the sort)."""
    plan = exact_dedup(_docs(spark))._sc._jvm.PythonSQLUtils.explainString(
        exact_dedup(_docs(spark))._jdf.queryExecution(), "formatted"
    )
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) == 1, plan
    # the partition key is the generated hash column, not the text
    assert "___h" in plan.split("Exchange")[1].splitlines()[0] or "___h" in plan


def test_embedding_dup_planes_autosize():
    """r4 verdict #3: the fixed n_planes=3 default was quadratic-unsafe
    beyond toy corpora. With n_planes=None the operator sizes itself from
    a corpus count; the sizing rule must keep expected bucket sizes at or
    below the target at every scale."""
    from collection_templates_spark.operators.similarity import planes_for_corpus

    assert planes_for_corpus(0) == 3
    assert planes_for_corpus(64) == 3
    assert planes_for_corpus(500) == 3  # the sf0.001/0.01 corpora
    assert planes_for_corpus(20_000) == 9
    assert planes_for_corpus(1_000_000) == 14
    for n in (10**3, 10**5, 10**7, 10**9):
        p = planes_for_corpus(n)
        assert n / 2**p <= 64, (n, p)


@pytest.mark.slow
def test_embedding_dup_pairs_recall_vs_brute_force(spark):
    """The embedding near-dup leg: sign-LSH bucketed candidates must
    recover ≥90% of the true cosine-≥τ pairs, with zero false positives
    (verification is exact)."""
    from pyspark.sql import functions as FF

    from collection_templates_spark.operators.similarity import (
        cosine,
        embedding_dup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r["vec1"], r["vec2"])
        for r in embedding_dup_pairs(emb, threshold=0.4).collect()
    }
    a = emb.select(FF.col("vec_id").alias("v1"), FF.col("embedding").alias("e1"))
    b = emb.select(FF.col("vec_id").alias("v2"), FF.col("embedding").alias("e2"))
    truth = {
        (r["v1"], r["v2"])
        for r in a.join(b, FF.col("v1") < FF.col("v2"))
        .withColumn("sim", FF.round(cosine(FF.col("e1"), FF.col("e2")), 6))
        .filter(FF.col("sim") >= 0.4)
        .collect()
    }
    assert got <= truth  # exact verification → no false positives
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


@pytest.mark.slow
def test_pair_operators_leave_no_persistent_rdds(spark):
    """r3 verdict: the pair operators persisted shingle sets with no
    unpersist, accumulating cache across a long-lived session. Pin the
    fix: materializing each operator end-to-end leaves the persistent-RDD
    registry exactly as it was."""
    docs = spark.createDataFrame(
        [(i, f"word{i} common text shared tail piece here") for i in range(30)],
        "doc_id long, text string",
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    ngram_jaccard_pairs(docs, threshold=0.5).collect()
    minhash_lsh_pairs(docs, threshold=0.5).collect()
    simhash_pairs(docs, max_hamming=3).collect()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked cached RDDs: {after - before}"


def test_spread_session_conf_side_effect_is_stated_and_stable(spark):
    """r4 verdict #5 follow-up: the dedup operators' _spread excludes
    InferFiltersFromGenerate SESSION-WIDE (documented on every public
    entry point). Pin the behavior: after running an operator the
    exclusion is present, and a second run doesn't duplicate it."""
    from collection_templates_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(10)],
        "doc_id long, text string",
    )
    ngram_jaccard_pairs(docs).count()
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules")
    assert "InferFiltersFromGenerate" in excluded
    ngram_jaccard_pairs(docs).count()  # idempotent — no duplicate entry
    assert spark.conf.get("spark.sql.optimizer.excludedRules") == excluded


def test_spread_opt_out_leaves_embedder_conf_untouched(spark):
    """r11 verdict #4: an embedder who sets AUTO_EXCLUDE_CONF=false gets
    NO session-config mutation from the dedup operators — the
    excludedRules value they chose (here: unset) survives building AND
    running ngram_jaccard_pairs, and results are unchanged (the rule is
    a pure optimization)."""
    from collection_templates_spark.operators.dedup import (
        AUTO_EXCLUDE_CONF,
        ngram_jaccard_pairs,
    )

    prior = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(10)],
        "doc_id long, text string",
    )
    try:
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        spark.conf.set(AUTO_EXCLUDE_CONF, "false")
        n_opted_out = ngram_jaccard_pairs(docs).count()
        assert (
            spark.conf.get("spark.sql.optimizer.excludedRules", None) is None
        ), "opt-out must leave the embedder's session conf untouched"
    finally:
        spark.conf.unset(AUTO_EXCLUDE_CONF)
        if prior is not None:
            spark.conf.set("spark.sql.optimizer.excludedRules", prior)
    n_default = ngram_jaccard_pairs(docs).count()
    assert n_opted_out == n_default
