"""ngram_jaccard_pairs: prefix-filter exactness and the hot-shingle cap.

The cap (``max_bucket_size``) is the 100 TB guard: it bounds any one
candidate-join bucket at cap² pairs. These tests pin down its two
contractual properties: (1) when no shingle is hotter than the cap the
result is EXACT (identical to the uncapped run — this is why the driver
query's oracle can be the full pair set), and (2) on a stopword-heavy
corpus the capped run still finds pairs whose prefixes hold rare
shingles, while pairs made ONLY of ultra-hot shingles are the documented
loss.
"""

import random

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import ngram_jaccard_pairs

WORDS = [f"w{i}" for i in range(200)]


def _pairs(df):
    return {(r["doc1"], r["doc2"]) for r in df.collect()}


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_cap_unhit_is_exact(spark):
    rng = random.Random(11)
    texts = [" ".join(rng.choices(WORDS, k=rng.randint(3, 12))) for _ in range(80)]
    # plant near-dups: copy with one word changed
    for i in range(0, 80, 10):
        w = texts[i].split()
        w[-1] = "zzz"
        texts.append(" ".join(w))
    docs = _corpus(spark, texts)
    capped = _pairs(ngram_jaccard_pairs(docs, threshold=0.5))  # default cap
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=None))
    assert capped == exact
    assert len(exact) > 0  # the planted dups were actually found


def test_positional_filter_sound_under_cap(spark):
    """r4 advice (HIGH): with ``max_bucket_size`` set, the positional
    bound counted only cap-surviving shingles while α used full set
    sizes, so two IDENTICAL docs (9 hot capped + 11 rare trigrams,
    n=22, n_surv=13, α=15 > 13 = old bound) were pruned before
    verification ever saw them. The corrected bound credits the maximum
    possible capped overlap (+min(n−n_surv) = +9 here), so the pair must
    survive with jaccard 1.0."""
    hot = " ".join(f"h{i}" for i in range(11))  # 9 hot trigrams
    rare = " ".join(f"r{i}" for i in range(13))  # 11 rare (+2 boundary)
    # five fillers push every hot trigram's df to 7 > cap=4; their own
    # suffix trigrams are unique so fillers share no SURVIVING shingle
    texts = [f"{hot} f{i}a f{i}b" for i in range(5)]
    texts += [f"{hot} {rare}", f"{hot} {rare}"]  # docs 5, 6: identical
    docs = _corpus(spark, texts)
    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=4)
    rows = {(r["doc1"], r["doc2"]): r["jaccard"] for r in capped.collect()}
    # filler×filler true pairs (J=9/13, all-capped overlap) are the
    # documented cap loss; the identical pair with a rare-shingle prefix
    # must NOT be lost
    assert rows == {(5, 6): 1.0}


def test_hot_shingle_cap_bounds_and_keeps_rare_pairs(spark):
    """300 boilerplate docs all sharing the same 6-word text (every shingle
    df=300 ≫ cap=50) + 2 planted rare near-dup pairs. Under the cap the
    rare pairs survive, the all-boilerplate clique (300·299/2 ≈ 45k pairs)
    is dropped — that clique is exactly the quadratic blowup the cap
    exists to prevent (exact dedup, not near-dup, is the right tool for
    identical boilerplate)."""
    boiler = "the quick brown fox jumps high"
    texts = [boiler] * 300
    texts += [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",  # J = 3/5 ≥ 0.5 on 3-grams
        "one two three four five six",
        "one two three four five seven",
    ]
    docs = _corpus(spark, texts)
    capped = _pairs(ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=50))
    assert (300, 301) in capped
    assert (302, 303) in capped
    # nothing from the boilerplate clique leaks through the capped index
    assert all(d1 >= 300 for d1, _ in capped), sorted(capped)[:5]
    # sanity: uncapped DOES produce the quadratic clique — the cap is
    # load-bearing, not a no-op (count only; don't materialize 45k pairs
    # driver-side)
    n_exact = ngram_jaccard_pairs(
        docs, threshold=0.5, max_bucket_size=None
    ).count()
    assert n_exact == 300 * 299 // 2 + 2
