"""Round-11 operators, each pinned by a hand-computed fixture here AND
an oracled bank row in plans/testdata_queries.py: KS test, chi-square,
correlation matrix, MAD anomalies, CUSUM change-point, attribution,
RFM segmentation, top paths, k-core peeling, Jaccard link prediction,
readability, char entropy, Gopher rules, reservoir sampling, SQ8."""

import datetime

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.graph import (
    kcore_stats,
    link_prediction_jaccard,
)
from collection_templates_spark.operators.product_analytics import (
    attribution_summary,
    rfm_segments,
    top_paths,
)
from collection_templates_spark.operators.similarity import (
    sq8_cosine_topk,
    sq8_dequantized,
)
from collection_templates_spark.operators.stats import (
    chi_square_independence,
    correlation_matrix,
    ks_test_2sample,
)
from collection_templates_spark.operators.temporal import (
    cusum_changepoint,
    mad_anomalies,
)
from collection_templates_spark.operators.text_analysis import (
    char_entropy,
    readability_stats,
)
from collection_templates_spark.operators.training_prep import (
    gopher_quality_rules,
    sample_reservoir,
)


def _ts(day, hour=0, minute=0):
    return datetime.datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------------------
# statistical tests
# ---------------------------------------------------------------------------


def test_ks_2sample_hand_computed(spark):
    # a = {1,2,3}, b = {2,3,4}: step CDFs at pooled values 1,2,3,4 are
    # a: 1/3, 2/3, 1, 1 and b: 0, 1/3, 2/3, 1 -> D = 1/3.
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    assert (out.n_a, out.n_b) == (3, 3)
    assert out.ks_d == round(1 / 3, 6)
    assert out.crit_05 == round(1.358 * (6 / 9) ** 0.5, 6)
    assert not out.reject_05


def test_ks_identical_samples_zero(spark):
    rows = [("a", float(i)) for i in range(10)] + [
        ("b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    assert ks_test_2sample(df, "g", "v", "a", "b").collect()[0].ks_d == 0.0


def test_chi_square_2x2_hand_computed(spark):
    # contingency 10/20 | 20/10: all expected 15, chi2 = 4*(25/15) = 20/3.
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 10
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0]
    assert (out.n, out.dof) == (60, 1)
    assert out.chi2 == round(20 / 3, 6)
    assert out.cramers_v == round((20 / 3 / 60) ** 0.5, 6)


def test_chi_square_single_column_null_cramers(spark):
    df = spark.createDataFrame([("r1", "c1"), ("r2", "c1")], "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0]
    assert out.dof == 0 and out.cramers_v is None


def test_correlation_matrix_exact(spark):
    # y = 2x -> corr 1, cov 2; z = 4-x -> corr(x,z) = -1, cov -1.
    rows = [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r.x, r.y): r for r in correlation_matrix(df, ("x", "y", "z")).collect()}
    assert out[("x", "y")].corr == 1.0 and out[("x", "y")].cov == 2.0
    assert out[("x", "z")].corr == -1.0 and out[("x", "z")].cov == -1.0
    assert out[("y", "z")].corr == -1.0 and out[("y", "z")].cov == -2.0
    assert all(r.n == 3 for r in out.values())


# ---------------------------------------------------------------------------
# anomaly / change-point
# ---------------------------------------------------------------------------


def test_mad_flags_outlier_and_scores(spark):
    rows = [("g", i, v) for i, v in enumerate([10.0, 12.0, 14.0, 16.0, 100.0])]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {r.t: r for r in mad_anomalies(df, "grp", "t", "v").collect()}
    # med = 14, |dev| = 4,2,0,2,86 -> mad = 2, scale = 2.9652
    assert out[0].med == 14.0 and out[0].mad == 2.0
    assert out[4].is_anomaly == 1
    assert out[4].score == round(86 / (2 * 1.4826), 4)
    assert out[0].is_anomaly == 0
    assert out[0].score == round(-4 / (2 * 1.4826), 4)


def test_mad_zero_flags_nothing(spark):
    rows = [("g", i, 5.0) for i in range(4)] + [("g", 9, 500.0)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = mad_anomalies(df, "grp", "t", "v").collect()
    # median 5, deviations 0,0,0,0,495 -> MAD 0: constant-series guard
    assert all(r.is_anomaly == 0 and r.score is None for r in out)


def test_cusum_finds_level_shift(spark):
    rows = [("g", i, v) for i, v in enumerate([0.0, 0.0, 0.0, 10.0, 10.0])]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = cusum_changepoint(df, "grp", "t", "v").collect()[0]
    # mean 4: S = -4,-8,-12,-6,0 -> argmax |S| at t=2 (0-based), |S|=12
    assert out.n == 5 and out.mean_v == 4.0
    assert out.cp_t == 2 and out.cp_s_abs == 12.0


def test_cusum_earliest_tie(spark):
    # symmetric series: |S| peaks twice with equal magnitude; earliest wins
    rows = [("g", i, v) for i, v in enumerate([0.0, 10.0, 0.0, 10.0])]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = cusum_changepoint(df, "grp", "t", "v").collect()[0]
    # mean 5: S = -5, 0, -5, 0 -> ties at t=0 and t=2, earliest = 0
    assert out.cp_t == 0 and out.cp_s_abs == 5.0


# ---------------------------------------------------------------------------
# product analytics
# ---------------------------------------------------------------------------


def test_attribution_first_last(spark):
    rows = [
        (1, 1, _ts(1, 9), "view"),
        (2, 1, _ts(1, 10), "click"),
        (3, 1, _ts(1, 11), "purchase"),
        (4, 2, _ts(2, 9), "signup"),
        (5, 2, _ts(2, 10), "purchase"),
        (6, 2, _ts(2, 11), "error"),
        (7, 2, _ts(2, 12), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.channel: r for r in attribution_summary(df).collect()}
    # u1 purchase: first=view last=click; u2 p1: first=last=signup;
    # u2 p2: first=signup last=error
    assert out["view"].first_touch == 1 and out["view"].last_touch == 0
    assert out["click"].first_touch == 0 and out["click"].last_touch == 1
    assert out["signup"].first_touch == 2 and out["signup"].last_touch == 1
    assert out["error"].first_touch == 0 and out["error"].last_touch == 1
    assert all(r.n_conversions == 3 for r in out.values())
    assert out["signup"].first_share == round(2 / 3, 6)


def test_rfm_quartiles_diagonal(spark):
    # 4 customers, strictly ordered on all three metrics the same way:
    # each lands on the (i,i,i) diagonal cell alone.
    rows = []
    oid = 0
    for cust, (n_orders, price, last_day) in enumerate(
        [(8, 1000.0, 28), (6, 500.0, 21), (4, 100.0, 14), (2, 50.0, 7)], start=1
    ):
        for _ in range(n_orders):
            oid += 1
            rows.append((oid, cust, datetime.date(2024, 1, last_day), price))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {(r.r_q, r.f_q, r.m_q): r for r in rfm_segments(df).collect()}
    assert set(out) == {(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)}
    assert out[(1, 1, 1)].n_customers == 1
    assert out[(1, 1, 1)].avg_monetary == 8000.0
    assert out[(1, 1, 1)].avg_recency_days == 0.0
    assert out[(4, 4, 4)].avg_recency_days == 21.0


def test_top_paths_sessionized(spark):
    rows = [
        (1, 1, _ts(1, 9, 0), "a"),
        (2, 1, _ts(1, 9, 5), "b"),
        (3, 1, _ts(1, 9, 10), "c"),
        (4, 1, _ts(1, 9, 12), "d"),  # 4th event: not in the 3-step path
        (5, 1, _ts(1, 15, 0), "d"),  # >30min gap: new session
        (6, 2, _ts(1, 9, 0), "a"),
        (7, 2, _ts(1, 9, 1), "b"),
        (8, 2, _ts(1, 9, 2), "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.path: r.n_sessions for r in top_paths(df, gap_minutes=30).collect()}
    assert out == {"a>b>c": 2, "d": 1}


# ---------------------------------------------------------------------------
# graph
# ---------------------------------------------------------------------------


def test_kcore_peels_pendant(spark):
    # triangle a-b-c + pendant d-a; k=2 removes d in sweep 1, then stable.
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.sweep: r for r in kcore_stats(df, k=2, sweeps=3).collect()}
    assert (out[1].n_nodes, out[1].n_edges) == (3, 3)
    assert (out[2].n_nodes, out[2].n_edges) == (3, 3)
    assert (out[3].n_nodes, out[3].n_edges) == (3, 3)


def test_kcore_cascade(spark):
    # path a-b-c-d, k=2: sweep1 drops a,d -> b-c both deg 1 -> sweep2 empty
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.sweep: r for r in kcore_stats(df, k=2, sweeps=2).collect()}
    assert (out[1].n_nodes, out[1].n_edges) == (2, 1)
    assert (out[2].n_nodes, out[2].n_edges) == (0, 0)


def test_link_prediction_path_graph(spark):
    # a-b-c: only candidate is (a,c) through b -> cn 1, jaccard 1/(1+1-1)=1
    edges = [("a", "b"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = link_prediction_jaccard(df, k=5).collect()
    assert len(out) == 1
    assert (out[0].a, out[0].b, out[0].cn, out[0].jaccard) == ("a", "c", 1, 1.0)


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every 2-path closes an EXISTING edge -> no predictions
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert link_prediction_jaccard(df, k=5).count() == 0


def test_link_prediction_center_cap(spark):
    # star center s with 3 leaves: cap 2 silences all wedges through s
    edges = [("s", "l1"), ("s", "l2"), ("s", "l3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert link_prediction_jaccard(df, max_center_degree=2, k=9).count() == 0
    assert link_prediction_jaccard(df, max_center_degree=3, k=9).count() == 3


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_readability_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!")], "doc_id long, text string"
    )
    r = readability_stats(df).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    assert r.flesch == round(206.835 - 1.015 * 3 - 84.6 * 1, 4)
    assert r.fk_grade == round(0.39 * 3 + 11.8 * 1 - 15.59, 4)


def test_readability_syllable_floor(spark):
    # 'rhythm' has no aeiouy-group? y counts: 'rhythm' -> 'y' group = 1;
    # 'xvz' has none -> floored to 1.
    df = spark.createDataFrame([(1, "xvz")], "doc_id long, text string")
    r = readability_stats(df).collect()[0]
    assert r.n_syllables == 1


def test_char_entropy_exact(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].entropy_bits == 1.0 and out[1].n_distinct == 2
    assert out[2].entropy_bits == 2.0
    assert out[3].entropy_bits == 0.0 and out[3].n_chars == 4


# ---------------------------------------------------------------------------
# quality / sampling
# ---------------------------------------------------------------------------


def test_gopher_rules_fixture(spark):
    good = "the of " + " ".join(["word"] * 58)  # 60 words, 2 stopword hits
    short = "tiny doc no stop"  # fails word count AND stopword probe
    df = spark.createDataFrame(
        [(1, good, "s1"), (2, short, "s1")],
        "doc_id long, text string, source string",
    )
    r = gopher_quality_rules(df).collect()[0]
    assert r.n_docs == 2
    assert r.fail_word_count == 1 and r.fail_stopword == 1
    assert r.fail_word_len == 0 and r.fail_symbol == 0 and r.fail_alpha == 0
    assert r.pass_frac == 0.5


def test_gopher_symbol_and_alpha_rules(spark):
    symbolic = " ".join(["the", "of"] + ["x#"] * 58)  # 60 words, 58 '#'
    numeric = "the of " + " ".join(["123"] * 58)  # alpha frac 2/60
    df = spark.createDataFrame(
        [(1, symbolic, "s"), (2, numeric, "s")],
        "doc_id long, text string, source string",
    )
    r = gopher_quality_rules(df).collect()[0]
    assert r.fail_symbol == 1 and r.fail_alpha == 1


def test_reservoir_deterministic_and_sized(spark):
    rows = [(i, f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(map(tuple, sample_reservoir(df, k=4).collect()))
    b = sorted(map(tuple, sample_reservoir(df, k=4).collect()))
    assert a == b and len(a) == 12
    per_grp = {}
    for grp, _id, rk in a:
        per_grp.setdefault(grp, []).append(rk)
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_grp.values())
    # independent draw under a different salt
    c = sorted(map(tuple, sample_reservoir(df, k=4, salt="other").collect()))
    assert c != a


def test_reservoir_insertion_stable(spark):
    # appending rows evicts at most (changes) survivors - never reshuffles
    base = [(i, "g") for i in range(50)]
    df1 = spark.createDataFrame(base, "doc_id long, source string")
    df2 = spark.createDataFrame(base + [(99, "g")], "doc_id long, source string")
    s1 = {r.id for r in sample_reservoir(df1, k=5).collect()}
    s2 = {r.id for r in sample_reservoir(df2, k=5).collect()}
    assert len(s1 & s2) >= 4


# ---------------------------------------------------------------------------
# SQ8
# ---------------------------------------------------------------------------


def test_sq8_reconstruction_bound(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    deq = {r.vec_id: r.embedding for r in sq8_dequantized(df).collect()}
    dims = list(zip(*[v for _, v in rows]))
    for vid, vec in rows:
        for d, v in enumerate(vec):
            width = max(dims[d]) - min(dims[d])
            assert abs(deq[vid][d] - v) <= width / 512 + 1e-12


def test_sq8_topk_matches_brute_when_separated(spark):
    from collection_templates_spark.operators.similarity import cosine_topk

    # well-separated clusters: quantization can't flip the ranking
    rows = []
    for i in range(12):
        base = [0.0] * 8
        base[i % 4] = 1.0
        rows.append((i, [b + 0.01 * (i // 4) for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    brute = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(df, q, k=3).collect()
    }
    sq8 = {
        (r.query_id, r.rank): r.neighbor_id
        for r in sq8_cosine_topk(df, q, k=3).collect()
    }
    assert brute == sq8


# ---------------------------------------------------------------------------
# wave 2: RAKE, OLS, feature hashing, fuzzy decontamination
# ---------------------------------------------------------------------------


def test_rake_hand_computed(spark):
    from collection_templates_spark.operators.text_analysis import (
        rake_keywords,
    )

    # doc: "red apple and green apple of red fruit" — stopwords {and, of}
    # phrases: [red apple], [green apple], [red fruit]
    # freq: red 2, apple 2, green 1, fruit 1; deg: red 4, apple 4,
    # green 2, fruit 2 -> every word scores 2.0; every phrase 4.0
    df = spark.createDataFrame(
        [(1, "red apple and green apple of red fruit")],
        "doc_id long, text string",
    )
    out = {r.phrase: r for r in rake_keywords(df, k=10).collect()}
    assert set(out) == {"red apple", "green apple", "red fruit"}
    assert all(r.score == 4.0 and r.n == 1 for r in out.values())


def test_rake_degree_favors_long_phrases(spark):
    from collection_templates_spark.operators.text_analysis import (
        rake_keywords,
    )

    # "deep neural network" (len 3) outranks the lone "network":
    # deg(deep)=deg(neural)=3, freq 1 -> 3.0 each; network appears in
    # both phrases: freq 2, deg 3+1 -> 2.0; phrase scores 8.0 vs 2.0
    df = spark.createDataFrame(
        [(1, "deep neural network and network")], "doc_id long, text string"
    )
    out = rake_keywords(df, k=10).collect()
    assert out[0].phrase == "deep neural network" and out[0].score == 8.0
    assert out[1].phrase == "network" and out[1].score == 2.0


def test_rake_max_phrase_len_cut(spark):
    from collection_templates_spark.operators.text_analysis import (
        rake_keywords,
    )

    df = spark.createDataFrame(
        [(1, "one two three four five and six")], "doc_id long, text string"
    )
    out = {r.phrase for r in rake_keywords(df, k=10, max_phrase_len=4).collect()}
    assert out == {"six"}  # the 5-token run is dropped as boilerplate


def test_ols_recovers_exact_plane(spark):
    from collection_templates_spark.operators.stats import (
        ols_regression_2var,
    )

    # y = 5 + 2*x1 - 3*x2, exact: coefficients recovered, r2 = 1
    rows = []
    for x1 in range(6):
        for x2 in range(4):
            rows.append((float(5 + 2 * x1 - 3 * x2), float(x1), float(x2)))
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_regression_2var(df, "y", "x1", "x2").collect()[0]
    assert (out.b0, out.b1, out.b2) == (5.0, 2.0, -3.0)
    assert out.r2 == 1.0 and out.n == 24


def test_feature_hashing_bounds(spark):
    from collection_templates_spark.operators.training_prep import (
        feature_hashing_stats,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    out = feature_hashing_stats(df, n_buckets=1024).collect()[0]
    assert out.n_tokens_total == 6 and out.n_distinct_tokens == 5
    # 5 tokens in 1024 buckets: collisions possible but buckets used +
    # colliding counts must be consistent
    assert out.n_buckets_used <= 5
    assert out.n_buckets_used + out.n_colliding_buckets >= 5 - out.n_colliding_buckets


def test_fuzzy_decontaminate_flags_near_dup(spark):
    from collection_templates_spark.operators.training_prep import (
        fuzzy_decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today", "b")],
        "doc_id long, text string, source string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "s1"),
            (2, "an entirely unrelated document about database engines", "s1"),
            (3, "another unrelated piece of text mentioning nothing", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.grp: r for r in fuzzy_decontaminate(spark, corpus, bench).collect()}
    assert out["s1"].n_contaminated == 1 and out["s1"].n_docs == 2
    assert out["s1"].contaminated_frac == 0.5
    assert out["s2"].n_contaminated == 0


def test_ewma_recursion_exact(spark):
    from collection_templates_spark.operators.temporal import ewma_smoothing

    vals = [8.0, 4.0, 2.0, 10.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {r.rn: r.ewma for r in ewma_smoothing(df, "grp", "t", "v").collect()}
    # recursive reference: s1=8, s2=6, s3=4, s4=7
    s, expect = vals[0], {1: 8.0}
    for i, v in enumerate(vals[1:], start=2):
        s = 0.5 * v + 0.5 * s
        expect[i] = round(s, 4)
    assert out == expect


def test_ewma_long_series_no_overflow(spark):
    # r11-advice regression: the single-scan form overflowed double at
    # row_number >= 1024 (u = v*2^(rn-1) -> inf, ewma = NaN tails). The
    # block-anchored scan must stay finite and match the recursion for
    # series far past that ceiling.
    import math
    import random

    from collection_templates_spark.operators.temporal import ewma_smoothing

    rng = random.Random(12)
    vals = [round(rng.uniform(0.01, 5000.0), 2) for _ in range(1300)]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {r.rn: r.ewma for r in ewma_smoothing(df, "grp", "t", "v").collect()}
    assert len(out) == 1300
    assert all(math.isfinite(e) for e in out.values())
    s = vals[0]
    for i, v in enumerate(vals[1:], start=2):
        s = 0.5 * v + 0.5 * s
        # block-boundary truncation error < max|v|*2^-513; fp noise only
        assert abs(out[i] - s) < 2e-4, (i, out[i], s)
    # constant series is a fixed point: ewma == c exactly at every row,
    # including across the 512-row block boundaries
    cdf = spark.createDataFrame(
        [("c", i, 7.25) for i in range(1200)], "grp string, t int, v double"
    )
    cout = ewma_smoothing(cdf, "grp", "t", "v").collect()
    assert all(r.ewma == 7.25 for r in cout)


def test_seasonal_decompose_rejects_even_period(spark):
    import pytest as _pytest

    from collection_templates_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame(
        [("g", "2024-01-0%d" % (i + 1), 1.0) for i in range(7)],
        "grp string, t string, v double",
    ).withColumn("t", F.col("t").cast("date"))
    with _pytest.raises(ValueError):
        seasonal_decompose(df, "grp", "t", "v", period=6)


def test_range_join_binned_pre_epoch(spark):
    # r11-advice regression: bin assignment must be genuinely integer —
    # floor semantics (not truncate-toward-zero) for pre-1970 timestamps.
    from collection_templates_spark.operators.temporal import range_join_binned

    left = spark.createDataFrame(
        [(1, "1969-12-31 23:59:00")], "user_id int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "1969-12-31 23:58:30"),
            (1, "1969-12-31 23:59:30"),
            (1, "1970-01-01 00:03:30"),
            (1, "1969-12-31 23:50:00"),
        ],
        "user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        str(r["r"]["ts"])
        for r in range_join_binned(
            left, right, "user_id", "ts", "ts", -120.0, 300.0
        ).collect()
    )
    assert got == [
        "1969-12-31 23:58:30",
        "1969-12-31 23:59:30",
        "1970-01-01 00:03:30",
    ]


def test_phrase_match_token_boundaries(spark):
    from collection_templates_spark.operators.search import phrase_match

    df = spark.createDataFrame(
        [
            (1, "new york is a city"),
            (2, "renew yorkshire is not"),       # substring, NOT a match
            (3, "new new york and new york"),    # two matches, first at 1
            (4, "york new"),                      # wrong order
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in phrase_match(df, ("new", "york")).collect()}
    assert set(out) == {1, 3}
    assert out[1].n_matches == 1 and out[1].first_pos == 0
    assert out[3].n_matches == 2 and out[3].first_pos == 1


def test_ks_missing_group_is_null_not_crash(spark):
    # ANSI mode: an absent sample must yield NULL D, not DIVIDE_BY_ZERO
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    out = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    assert out.n_b == 0 and out.ks_d is None and out.reject_05 is None


def test_mann_whitney_hand_computed(spark):
    from collection_templates_spark.operators.stats import mann_whitney_u

    # a = {1,2}, b = {2,3}: ranks 1, 2.5 (tie), 2.5, 4
    # R_a = 1 + 2.5 = 3.5; U_a = 3.5 - 3 = 0.5; mu = 2
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (out.n_a, out.n_b) == (2, 2)
    assert out.u_a == 0.5 and out.mu_u == 2.0
    # sigma^2 = (4/12)*((5) - 6/12) = 1.5 -> z = -1.5/sqrt(1.5)
    assert out.z == round(-1.5 / (1.5 ** 0.5), 6)
    assert not out.reject_05


def test_gini_extremes(spark):
    from collection_templates_spark.operators.stats import (
        gini_concentration,
    )

    # perfectly equal: gini 0; one key owns everything: gini -> (n-1)/n
    eq = spark.createDataFrame(
        [(k, 10.0) for k in range(10)], "k long, v double"
    )
    out = gini_concentration(eq, "k", "v").collect()[0]
    assert out.gini == 0.0 and out.top_decile_share == 0.1
    uneq = spark.createDataFrame(
        [(0, 1000.0)] + [(k, 0.0) for k in range(1, 10)], "k long, v double"
    )
    out = gini_concentration(uneq, "k", "v").collect()[0]
    assert out.gini == 0.9 and out.top_decile_share == 1.0


def test_langid_confusion_diagonal_dominates(spark):
    from collection_templates_spark.plans.testdata_queries import (
        text_langid_confusion,
    )

    out = text_langid_confusion(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_total = sum(r.n for r in out)
    assert n_total == 500
    # the synthetic corpus text is English-ish word soup for EVERY lang
    # label (no CJK chars, no es/fr/de markers) — the matrix honestly
    # reports that: predictions stay in the classifier alphabet, and the
    # en-labeled row is the one the marker heuristic actually gets right
    assert {r.predicted for r in out} <= {"en", "de", "fr", "es", "zh", "und"}
    en_row = {r.predicted: r.n for r in out if r.actual == "en"}
    assert en_row.get("en", 0) > sum(en_row.values()) / 2


# ---------------------------------------------------------------------------
# wave 5: OHLC, autocorrelation, Benford, assortativity, DSIR
# ---------------------------------------------------------------------------


def test_ohlc_tuple_order_and_extremes(spark):
    from collection_templates_spark.operators.temporal import (
        ohlc_downsample,
    )

    rows = [
        (1, "a", _ts(1, 9), 5.0),
        (2, "a", _ts(1, 10), 9.0),
        (3, "a", _ts(1, 8), 3.0),     # earliest -> open
        (4, "a", _ts(1, 11), 7.0),    # latest -> close
        (5, "a", _ts(1, 8), 4.0),     # same ts as #3, higher id: NOT open
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    r = ohlc_downsample(df).collect()[0]
    assert (r.open, r.high, r.low, r.close) == (3.0, 9.0, 3.0, 7.0)
    assert r.n_events == 5 and r.v_total == 28.0


def test_autocorrelation_alternating_series(spark):
    import datetime

    from collection_templates_spark.operators.temporal import (
        autocorrelation,
    )

    # perfectly alternating +1/-1: acf(1) -> negative, acf(2) -> positive
    rows = [
        ("g", datetime.date(2024, 1, 1 + i), 1.0 if i % 2 == 0 else -1.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, t date, v double")
    out = {r.lag: r for r in autocorrelation(df, "grp", "t", "v", 2).collect()}
    assert out[1].acf == -0.9 and out[1].n_pairs == 9  # (n-k)/n shrinkage
    assert out[2].acf == 0.8 and out[2].n_pairs == 8


def test_benford_uniform_digits(spark):
    from collection_templates_spark.operators.stats import (
        benford_first_digit,
    )

    # 100.00..199.99-style values all lead with 1
    rows = [(float(100 + i),) for i in range(100)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_first_digit(df, "v").collect()}
    assert set(out) == {1}
    assert out[1].observed_frac == 1.0
    assert out[1].expected_frac == round(__import__("math").log10(2), 9)


def test_assortativity_star_is_negative_one(spark):
    from collection_templates_spark.operators.graph import (
        degree_assortativity,
    )

    # star graph: every edge joins degree-3 hub to degree-1 leaf -> r = -1
    edges = [("hub", f"l{i}") for i in range(3)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert r.assortativity == -1.0
    assert (r.n_nodes, r.n_edges) == (4, 3)


def test_dsir_prefers_target_vocab(spark):
    from collection_templates_spark.operators.training_prep import (
        dsir_importance_weights,
    )

    tgt = spark.createDataFrame(
        [(100, "physics quantum relativity physics", "t")],
        "doc_id long, text string, source string",
    )
    raw = spark.createDataFrame(
        [(200, "pizza recipe dough cheese pizza", "r")],
        "doc_id long, text string, source string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "quantum physics notes", "c"),
            (2, "cheese pizza dough", "c"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in
           dsir_importance_weights(corpus, tgt, raw).collect()}
    assert out[1].prefers_target == 1 and out[1].weight > 0
    assert out[2].prefers_target == 0 and out[2].weight < 0
    assert out[1].n_tokens == 3


def test_merge_intervals_rules(spark):
    from collection_templates_spark.operators.temporal import (
        merge_intervals,
    )

    rows = [
        ("u", 0, 10),
        ("u", 5, 12),    # overlaps -> same island
        ("u", 12, 20),   # touching (start == prev end) -> merges
        ("u", 30, 40),   # gap -> new island
        ("u", 32, 35),   # contained -> same island
        ("v", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(
        (r.key, r.island_start, r.island_end, r.n_source_intervals)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert out == [("u", 0, 20, 3), ("u", 30, 40, 2), ("v", 0, 1, 1)]


def test_interval_coverage_counts(spark):
    from collection_templates_spark.operators.temporal import (
        interval_coverage,
    )

    rows = [
        (1, 7, _ts(1, 9, 0)),
        (2, 7, _ts(1, 9, 10)),   # within 30min union -> one island
        (3, 7, _ts(1, 15, 0)),   # far away -> second island
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    r = interval_coverage(df, half_width_minutes=15).collect()[0]
    assert r.n_events == 3 and r.n_islands == 2
    # island1 spans 9:00-15 .. 9:25 = 40min; island2 = 30min
    assert r.covered_us == (40 + 30) * 60 * 1_000_000
    assert r.longest_island_us == 40 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# wave 7: clustering coefficient, Heaps fit, seasonal decomposition
# ---------------------------------------------------------------------------


def test_clustering_coefficient_shapes(spark):
    from collection_templates_spark.operators.graph import (
        clustering_coefficient,
    )

    # triangle + pendant: a,b,c all cc=1 except a (degree 3, 1 triangle:
    # 2*1/(3*2) = 1/3); pendant d cc=0
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r for r in clustering_coefficient(df).collect()}
    assert out["a"].clustering_coeff == round(1 / 3, 6)
    assert out["b"].clustering_coeff == 1.0
    assert out["c"].clustering_coeff == 1.0
    assert out["d"].clustering_coeff == 0.0 and out["d"].degree == 1


def test_heaps_fit_pure_power_law(spark):
    from collection_templates_spark.operators.text_analysis import heaps_fit

    # construct docs where V = N exactly (all-distinct tokens):
    # beta = 1, ln_k = 0
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate([4, 8, 16, 32])
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = heaps_fit(df).collect()[0]
    assert out.n_docs == 4 and out.beta == 1.0 and out.ln_k == 0.0


def test_seasonal_decompose_recovers_weekly_pattern(spark):
    import datetime

    from collection_templates_spark.operators.temporal import (
        seasonal_decompose,
    )

    # constant 10 + a +7 spike every 7th day starting 2024-01-01:
    # the spike phase is 0; trend = 11 everywhere (each full window has
    # exactly one spike: 10*6+17 = 77 -> 11); seasonal(phase 0) = +6,
    # all other phases -1; residuals 0
    rows = [
        ("g", datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
         17.0 if i % 7 == 0 else 10.0)
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "grp string, t date, v double")
    out = seasonal_decompose(df, "grp", "t", "v").collect()
    assert len(out) == 22  # 28 minus 3 lost each edge
    assert all(r.trend == 11.0 for r in out)
    for r in out:
        assert r.seasonal == (6.0 if r.phase == 0 else -1.0)
        assert r.residual == 0.0


def test_pattern_runs_hand_computed(spark):
    import datetime

    from collection_templates_spark.plans.testdata_queries import QUERIES  # noqa: F401

    # direct check of the islands logic on a synthetic series through
    # the same expressions the bank row uses
    from pyspark.sql import Window

    vals = [1.0, 2.0, 3.0, 4.0, 2.0, 3.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [
        ("g", datetime.date(2024, 1, 1 + i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "event_type string, day date, v double")
    w = Window.partitionBy("event_type").orderBy("day")
    rising = (F.col("v") > F.lag("v").over(w)).cast("int")
    flagged = df.withColumn("rising", F.coalesce(rising, F.lit(0)))
    isl = flagged.withColumn(
        "island",
        F.sum(F.lit(1) - F.col("rising")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = (
        isl.filter(F.col("rising") == 1)
        .groupBy("event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    out = runs.groupBy("event_type").agg(
        F.sum((F.col("run_len") >= 3).cast("long")).alias("n_runs_ge3"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("rising_days"),
    ).collect()[0]
    # runs: +3 (1-2-3-4), +1 (2-3), +4 (1..5) -> two runs >= 3, longest 4
    assert (out.n_runs_ge3, out.longest_run, out.rising_days) == (2, 4, 8)


def test_lexical_diversity_extremes(spark):
    from collection_templates_spark.plans import testdata_queries as tq

    # all-identical tokens -> simpson 1, ttr -> 1/N; all-distinct ->
    # simpson 0, ttr 1. Build through the same expressions inline.
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa aaa", "rep"), (2, "one two three four", "uni")],
        "doc_id long, text string, source string",
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    agg = per_tok.groupBy("source").agg(
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).alias("ty"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("co"),
    )
    out = {r.source: r for r in agg.collect()}
    assert out["rep"].co == 12 and out["rep"].nt == 4   # D = 12/12 = 1
    assert out["uni"].co == 0                            # D = 0
