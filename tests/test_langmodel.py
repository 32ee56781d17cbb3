"""Corpus unigram model (F9/F10/F11 public-equivalent — langmodel.py).

Reference semantics under test: sequence_log_probability over space-split
lowercase names (create_merged.py:942-943), inspect_label's
(interesting_score, best tokenization) shape (create_merged.py:930-946),
and wordninja.split's shortest-cost DP (load_custom_collections.py:152).
"""

import math

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.functions.langmodel import (
    UnigramModel,
    score_names,
    word_frequency_model,
)

CORPUS = [
    ("the new york times", ),
    ("new york city hall", ),
    ("the times of india", ),
    ("india and the world", ),
]


@pytest.fixture(scope="module")
def model_df(spark):
    docs = spark.createDataFrame(CORPUS, "text string")
    return word_frequency_model(docs).cache()


@pytest.fixture(scope="module")
def model(model_df):
    return UnigramModel.from_dataframe(model_df)


def test_model_counts_and_smoothing(model_df, model):
    rows = {r["token"]: r for r in model_df.collect()}
    assert rows["the"]["n"] == 3
    assert rows["new"]["n"] == 2
    total = sum(r["n"] for r in rows.values())
    vocab = len(rows)
    assert model.total == total and model.vocab == vocab
    expect = math.log((3 + 1) / (total + vocab))
    assert rows["the"]["log_prob"] == pytest.approx(expect, abs=1e-12)


def test_log_probability_matches_dataframe_path(spark, model_df, model):
    names = spark.createDataFrame(
        [(1, ["new", "york"]), (2, ["qzx", "times"]), (3, [])],
        "id long, tokens array<string>",
    )
    out = {
        r["id"]: r
        for r in score_names(names, model_df).collect()
    }
    assert out[1]["log_probability"] == pytest.approx(
        model.log_probability(["new", "york"]), abs=1e-9
    )
    # OOV token gets the smoothed floor, not -inf / null
    assert out[2]["log_probability"] == pytest.approx(
        model.log_probability(["qzx", "times"]), abs=1e-9
    )
    # empty token array → null score (reference: errors → None)
    assert out[3]["log_probability"] is None
    assert out[3]["interesting_score"] is None
    # geometric-mean score ∈ (0, 1), frequent tokens score higher
    assert 0 < out[2]["interesting_score"] < out[1]["interesting_score"] < 1


def test_wordninja_dp_split(model):
    # known concatenations split at lowest total Zipf cost
    assert model.split("newyork") == ["new", "york"]
    assert model.split("thenewyorktimes") == ["the", "new", "york", "times"]
    # single known word stays whole
    assert model.split("india") == ["india"]
    # unknown run degrades to per-char only when nothing else matches;
    # mixed known/unknown keeps the known words intact
    assert model.split("newyorkqz") == ["new", "york", "q", "z"]
    assert model.split("") == []


def test_interesting_score_shape(model):
    score, toks = model.interesting_score("newyork")
    assert toks == ["new", "york"]
    assert 0 < score < 1
    assert model.interesting_score("") == (None, [])
    # frequent single word beats a rare-but-known one
    s_the, _ = model.interesting_score("the")
    s_hall, _ = model.interesting_score("hall")
    assert s_the > s_hall


def test_factory_uses_real_scores_end_to_end(spark, model_df):
    """Real-model ordering reaches the factory output: a name made of
    frequent corpus words gets a higher log-probability than junk."""
    from collection_templates_spark.functions.udfs import (
        log_probability_udf_for,
    )
    from collection_templates_spark.operators.factory import collection_factory

    model = UnigramModel.from_dataframe(model_df)
    bc = spark.sparkContext.broadcast(model.freqs)

    member = {
        "curated": "newyork",
        "tokenized": ["new", "york"],
        "interesting_score": 0.5,
        "rank": 5,
        "status": "available",
    }
    rows = [
        ("Q1", "new york times", [member]),
        ("Q2", "zzqx vvkw jjqq", [member]),
    ]
    df = spark.createDataFrame(
        rows,
        "item string, name string, members array<struct<curated:string,"
        "tokenized:array<string>,interesting_score:double,rank:bigint,"
        "status:string>>",
    ).select(
        "item",
        "name",
        "members",
        F.lit(7).cast("long").alias("rank"),
        F.array().cast("array<struct<id:string,label:string>>").alias("types"),
        F.array().cast("array<string>").alias("keywords"),
        F.lit(None).cast("array<string>").alias("image"),
        F.lit(None).cast("array<string>").alias("page_banner"),
        F.lit("a").alias("article"),
        F.lit(1).cast("long").alias("valid_members_count"),
        F.lit(0).cast("long").alias("invalid_members_count"),
        F.lit(False).alias("is_merged"),
    )
    out = collection_factory(
        df, created_ms=0.0, log_prob_udf=log_probability_udf_for(bc)
    )
    lp = {
        r["metadata"]["id"]: r["metadata"]["collection_name_log_probability"]
        for r in out.collect()
    }
    assert lp["Q1"] > lp["Q2"]
    assert lp["Q1"] == pytest.approx(
        model.log_probability(["new", "york", "times"]), abs=1e-9
    )


def test_score_names_empty_model(spark):
    """Pinned behavior: an empty model scores every name NULL (the Laplace
    denominator is undefined at V=0) rather than raising — score_names
    stays lazy by design. See the docstring note in langmodel.score_names."""
    empty = spark.createDataFrame([], "token string, n long, log_prob double")
    names = spark.createDataFrame(
        [(1, ["new", "york"])], "id long, tokens array<string>"
    )
    row = score_names(names, empty).collect()[0]
    assert row["log_probability"] is None
    assert row["interesting_score"] is None


def test_broadcast_model_cache_is_uuid_keyed(spark, model_df):
    """r3's stale-id fix, exercised: the per-process UnigramModel cache must
    key on the driver-assigned uuid, hit across repeated batches of one
    broadcast, miss across distinct broadcasts (two pipeline runs in one
    session), and never cache an untagged plain-dict broadcast."""
    from collection_templates_spark.functions import udfs

    model = UnigramModel.from_dataframe(model_df)

    bc1 = udfs.broadcast_model(spark.sparkContext, model.freqs)
    m1 = udfs._model_for(bc1)
    assert udfs._model_for(bc1) is m1  # second Arrow batch: cache hit

    bc2 = udfs.broadcast_model(spark.sparkContext, model.freqs)
    m2 = udfs._model_for(bc2)
    assert m2 is not m1  # same dict, new run → new key, no stale hit

    plain = spark.sparkContext.broadcast(model.freqs)
    assert udfs._model_for(plain) is not udfs._model_for(plain)  # rebuild


def test_model_cache_bounded(spark, model_df):
    from collection_templates_spark.functions import udfs

    model = UnigramModel.from_dataframe(model_df)
    bcs = [
        udfs.broadcast_model(spark.sparkContext, model.freqs)
        for _ in range(udfs._MODEL_CACHE_MAX + 3)
    ]
    for bc in bcs:
        udfs._model_for(bc)
    assert len(udfs._MODEL_CACHE) <= udfs._MODEL_CACHE_MAX
    assert udfs._model_for(bcs[-1]) is udfs._model_for(bcs[-1])  # MRU kept


def test_two_models_one_session_score_with_own_corpus(spark, model_df):
    """End-to-end r2-bug scenario: two scoring UDFs built back-to-back in
    one session (as two run_pipeline calls would) must each score with
    their OWN corpus, not a cache-collided predecessor."""
    from collection_templates_spark.functions.udfs import (
        broadcast_model,
        log_probability_udf_for,
    )

    m_real = UnigramModel.from_dataframe(model_df)
    m_tiny = UnigramModel({"zebra": 50})
    df = spark.createDataFrame([("the",)], "name string")

    udf_a = log_probability_udf_for(broadcast_model(spark.sparkContext, m_real.freqs))
    udf_b = log_probability_udf_for(broadcast_model(spark.sparkContext, m_tiny.freqs))
    got_a = df.select(udf_a("name").alias("lp")).collect()[0]["lp"]
    got_b = df.select(udf_b("name").alias("lp")).collect()[0]["lp"]
    assert got_a == pytest.approx(m_real.log_probability(["the"]), abs=1e-9)
    assert got_b == pytest.approx(m_tiny.log_probability(["the"]), abs=1e-9)
    assert got_a != got_b


def test_tokenizer_udf_uses_model_split(spark, model_df):
    from collection_templates_spark.operators.custom_collections import (
        tokenize_name,
        tokenize_name_udf_for,
    )

    model = UnigramModel.from_dataframe(model_df)
    bc = spark.sparkContext.broadcast(model.freqs)
    # plain-python path (non-simple runs like "-" stay their own token,
    # reference load_custom_collections.py:148-151 parity)
    assert tokenize_name("newyork-cityhall", wordsplit=model.split) == [
        "new", "york", "-", "city", "hall",
    ]
    # UDF path
    df = spark.createDataFrame([("thenewyorktimes",)], "name string")
    got = df.select(tokenize_name_udf_for(bc)("name").alias("t")).collect()
    assert got[0]["t"] == ["the", "new", "york", "times"]


def test_bigram_perplexity_discriminates_word_order(spark):
    """Two docs with the SAME unigram bag but different sequential
    coherence: the unigram filter scores them identically, the
    interpolated bigram filter must separate them — the reason the
    operator exists. Corpus includes coherent filler so the bigram
    model has something to prefer."""
    from collection_templates_spark.functions.langmodel import (
        doc_perplexity,
        doc_perplexity_bigram,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "the cat sat on the mat"),
        (4, "the cat sat on the mat"),      # coherent, common order
        (5, "mat the on sat cat the"),      # same bag, scrambled
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r["doc"]: r["perplexity"] for r in doc_perplexity(df).collect()}
    bi = {
        r["doc"]: r["perplexity"]
        for r in doc_perplexity_bigram(df).collect()
    }
    assert uni[4] == uni[5]          # unigram is order-blind
    assert bi[4] < bi[5]             # bigram sees the scramble
    # contract: one row per non-empty doc, n_tokens = analyzer count
    out = {r["doc"]: r["n_tokens"] for r in doc_perplexity_bigram(df).collect()}
    assert out == {1: 6, 2: 6, 3: 6, 4: 6, 5: 6}
