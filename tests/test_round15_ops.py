"""Round-15 additions: the exact-integer ALS requantization (zero
float steps — r14 verdict #1) and delete-aware incremental rollup
refresh."""

from __future__ import annotations


def test_als_requant_ladder_equals_bignum_rounding():
    """The oracle's HUGEINT three-step ×10⁴ division ladder must equal
    Python-bignum round_half_away(num·10¹²/det) on adversarial values:
    negatives, exact halves, |num| ≫ det, det near the sf0.01 scale
    cap — if these agree, the Spark mapInPandas solve and the DuckDB
    oracle solve agree by construction (same rational, same rounding
    law), which is the whole r15 fix for the recsys_als_eval flake."""
    import duckdb

    from collection_templates_spark.operators.product_analytics import (
        _round_div_half_away,
    )

    cases = [
        (0, 7),
        (1, 2 * 10**12),  # exactly half a micro -> rounds up (away)
        (-1, 2 * 10**12),  # exactly half, negative -> away from zero
        (3, 2 * 10**12),
        (123456789, 987654321),
        (-123456789, 987654321),
        (10**26, 3 * 10**31),  # sf0.01-scale magnitudes
        (-(10**26) + 7, 3 * 10**31),
        (999_999_999_999, 10**12),  # just under 1 micro
        (7 * 10**25 + 1, 2 * 10**25),
    ]
    con = duckdb.connect()
    for num, det in cases:
        expected = _round_div_half_away(num * 10**12, det)
        q = f"""
        SELECT CAST(sg * (qa * 100000000 + qb * 10000 + qc
                   + CASE WHEN 2 * rc >= det THEN 1 ELSE 0 END)
               AS BIGINT) AS f
        FROM (
          SELECT *, (rb * 10000) // det AS qc, (rb * 10000) % det AS rc
          FROM (
            SELECT *, (ra * 10000) // det AS qb, (ra * 10000) % det AS rb
            FROM (
              SELECT *, (n * 10000) // det AS qa, (n * 10000) % det AS ra
              FROM (SELECT CAST({det} AS HUGEINT) AS det,
                           CASE WHEN {num} < 0 THEN -1 ELSE 1 END AS sg,
                           abs(CAST({num} AS HUGEINT)) AS n))))
        """
        got = con.execute(q).fetchone()[0]
        assert got == expected, (num, det, got, expected)
    con.close()


def test_round_div_half_away_law():
    """Half-away-from-zero on the true rational, exhaustively near the
    boundary: agrees with Decimal ROUND_HALF_UP division."""
    from decimal import ROUND_HALF_UP, Decimal

    from collection_templates_spark.operators.product_analytics import (
        _round_div_half_away,
    )

    for num in range(-25, 26):
        for det in range(1, 8):
            want = int(
                (Decimal(num) / Decimal(det)).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP
                )
            )
            assert _round_div_half_away(num, det) == want, (num, det)


def test_chunk_documents_boundaries_and_tail(spark):
    """Window/overlap arithmetic: starts at k·stride, window-sized
    slices, the final chunk keeps the tail (shorter, never dropped),
    and a doc shorter than one window yields exactly one chunk."""
    from collection_templates_spark.operators.training_prep import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, words), (2, "only three tokens")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 3: starts 0,3,6,9 over 10 tokens
    assert [r["start_tok"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_tokens"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert c1[-1]["chunk_text"] == "w9"  # tail kept
    # every token appears in some chunk
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(10)}
    c2 = by_doc[2]
    assert len(c2) == 1 and c2[0]["n_tokens"] == 3
    assert c2[0]["chunk_text"] == "only three tokens"


def test_length_bucket_stats_hand_computed(spark):
    """Bucket edges, overflow truncation, and the utilization divide
    on a hand-built corpus: 16 tokens sits IN the 16 bucket (edge
    inclusive), 17 spills to 32, and an 1100-token doc clamps to 1024
    with truncated token mass counted at full length but utilization
    capped at the ceiling."""
    from collection_templates_spark.operators.training_prep import (
        length_bucket_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 16)),   # exactly 16 -> bucket 16
            (2, " ".join(["b"] * 17)),   # 17 -> bucket 32
            (3, " ".join(["c"] * 32)),   # 32 -> bucket 32
            (4, " ".join(["d"] * 1100)),  # overflow -> 1024, truncated
        ],
        "doc_id long, text string",
    )
    rows = {
        r["bucket"]: r for r in length_bucket_stats(docs).collect()
    }
    assert set(rows) == {16, 32, 1024}
    assert rows[16]["n_docs"] == 1
    assert rows[16]["sum_tokens"] == 16
    assert rows[16]["pad_waste"] == 0
    assert rows[16]["utilization"] == 1.0
    assert rows[32]["n_docs"] == 2
    assert rows[32]["sum_tokens"] == 49
    assert rows[32]["pad_waste"] == 64 - 49
    assert rows[32]["utilization"] == round(49 / 64, 6)
    assert rows[1024]["sum_tokens"] == 1100  # full mass reported
    assert rows[1024]["pad_waste"] == 0      # truncation, not padding
    assert rows[1024]["utilization"] == 1.0


def test_centroid_outliers_plants_the_outlier(spark):
    """A planted far vector must rank 1 in its label with the exact
    integer distance; ranks are dense per label and capped at top_k;
    ties break by vec_id ascending."""
    from collection_templates_spark.operators.linalg import (
        centroid_outliers,
    )

    dim = 4
    base = [0.1, 0.2, -0.1, 0.0]
    rows = [
        (1, base, 0),
        (2, base, 0),
        (3, [0.1, 0.2, -0.1, 0.9], 0),  # planted outlier in label 0
        (4, base, 1),
        (5, base, 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = centroid_outliers(emb, dim=dim, top_k=2).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    l0 = sorted(by_label[0], key=lambda r: r["rank"])
    assert l0[0]["vec_id"] == 3 and l0[0]["rank"] == 1
    # exact integer distance: centroid_d3 = round((0+0+900000)/3)
    # = 300000; planted diff 600000^2, others 300000^2 each
    assert l0[0]["dist2"] == 600000 * 600000
    assert l0[1]["dist2"] == 300000 * 300000
    # only top_k=2 rows for label 0 (the third-farthest is cut)
    assert len(l0) == 2
    # label 1 is all-identical: dist2 == 0, tie broken by vec_id
    l1 = sorted(by_label[1], key=lambda r: r["rank"])
    assert [r["vec_id"] for r in l1] == [4, 5]
    assert all(r["dist2"] == 0 for r in l1)


def test_mixture_materialize_budget_crossing(spark):
    """The doc that CROSSES the budget is kept (budgets fill, never
    undershoot), everything after it is dropped, and the selection is
    a prefix of the (hash, id) order: cum_before < target for every
    kept row, pick_order is 1..k contiguous, and the last kept row's
    cum_tokens >= target when the group has enough mass."""
    from pyspark.sql import functions as F

    from collection_templates_spark.operators.training_prep import (
        mixture_materialize,
    )

    # 6 docs x 3 tokens each, one group; target 5 -> exactly 2 picked
    docs = spark.createDataFrame(
        [(i, "g", "aa bb cc") for i in range(6)],
        "doc_id long, lang string, text string",
    )
    plan = spark.createDataFrame(
        [("g", 5)], "grp string, target_tokens_grp long"
    )
    out = mixture_materialize(docs, plan).orderBy("pick_order").collect()
    assert len(out) == 2
    assert [r["pick_order"] for r in out] == [1, 2]
    assert out[0]["cum_tokens"] == 3
    assert out[1]["cum_tokens"] == 6  # crossed the 5-token budget, kept
    # empty-target group selects nothing; missing-plan group selects
    # nothing (inner join on the plan)
    plan0 = spark.createDataFrame(
        [("g", 0)], "grp string, target_tokens_grp long"
    )
    assert mixture_materialize(docs, plan0).count() == 0
    other = docs.withColumn("lang", F.lit("h"))
    assert mixture_materialize(other, plan).count() == 0


def test_learn_bpe_merges_spark_equals_driver_learner(spark):
    """The distributed trainer must replicate the driver learner
    EXACTLY — same greedy non-overlapping rebuild, same
    (count DESC, pair ASC) pick — on the Sennrich toy corpus AND on a
    word table engineered with overlapping runs ('aaaa' under (a,a))
    where greedy-vs-overlap semantics diverge."""
    from collection_templates_spark.functions.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_spark,
    )

    for counts in (
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        [("aaaa", 3), ("aaa", 2), ("ab", 7), ("baaab", 1)],
        [("xy", 1)],
    ):
        want = learn_bpe_merges(counts, n_merges=5)
        wc = spark.createDataFrame(counts, "word string, n long")
        got = [
            (r["left_sym"], r["right_sym"])
            for r in learn_bpe_merges_spark(
                wc, n_merges=5, min_pair_count=2
            )
            .orderBy("rank")
            .collect()
        ]
        assert got == want, (counts, got, want)


def test_learn_bpe_merges_spark_stops_below_min_count(spark):
    from collection_templates_spark.functions.bpe import (
        learn_bpe_merges_spark,
    )

    wc = spark.createDataFrame([("ab", 2), ("cd", 1)], "word string, n long")
    out = learn_bpe_merges_spark(wc, n_merges=10, min_pair_count=2).collect()
    # (a,b) count 2 and its follow-ups (ab,</w>) count 2 survive;
    # anything at count 1 must not be learned.
    assert all(r["pair_count"] >= 2 for r in out)
    assert len(out) < 10


def test_isotonic_calibration_pava_properties(spark):
    """iso_rate must be (a) non-decreasing in bin, (b) the L2-optimal
    fit per the minimax characterization computed independently in
    Python bignums, (c) equal to raw_rate when raw rates are already
    monotone."""
    from fractions import Fraction

    from collection_templates_spark.operators.stats import (
        isotonic_calibration,
    )

    # scores chosen so bins are 10,30,50,70 with non-monotone rates
    rows = []
    for s, lab, k in [
        (0.105, True, 8), (0.105, False, 2),   # bin 10: 0.8
        (0.305, True, 1), (0.305, False, 9),   # bin 30: 0.1
        (0.505, True, 5), (0.505, False, 5),   # bin 50: 0.5
        (0.705, True, 9), (0.705, False, 1),   # bin 70: 0.9
    ]:
        rows += [(s, lab)] * k
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {
        r["bin"]: r
        for r in isotonic_calibration(df, "score", "y", n_bins=100).collect()
    }
    assert sorted(out) == [10, 30, 50, 70]
    iso = [out[b]["iso_rate"] for b in sorted(out)]
    assert iso == sorted(iso)
    # independent minimax fit over the binned integers
    bins = [(8, 10), (1, 10), (5, 10), (9, 10)]
    pre_p = [0] * (len(bins) + 1)
    pre_n = [0] * (len(bins) + 1)
    for i, (p, n) in enumerate(bins):
        pre_p[i + 1] = pre_p[i] + p
        pre_n[i + 1] = pre_n[i] + n
    for i in range(len(bins)):
        v = max(
            min(
                Fraction(pre_p[k + 1] - pre_p[j], pre_n[k + 1] - pre_n[j])
                for k in range(i, len(bins))
            )
            for j in range(i + 1)
        )
        got = iso[i]
        assert abs(got - round(float(v), 6)) < 1e-12, (i, got, v)
    # already-monotone input: iso == raw
    df2 = spark.createDataFrame(
        [(0.105, True)] * 2 + [(0.105, False)] * 8 + [(0.905, True)] * 9
        + [(0.905, False)] * 1,
        "score double, y boolean",
    )
    for r in isotonic_calibration(df2, "score", "y", n_bins=100).collect():
        assert r["iso_rate"] == r["raw_rate"]


def test_rolling_distinct_users_bruteforce(spark):
    """Cover-set expansion == the O(days x activity) brute force on a
    frame with multi-active users, gaps, and window-spanning churn."""
    import datetime as dt
    import random

    from collection_templates_spark.operators.product_analytics import (
        rolling_distinct_users,
    )

    rng = random.Random(15)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (f"u{rng.randrange(9)}",
         base + dt.timedelta(days=rng.randrange(25),
                             hours=rng.randrange(24)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        r["day"]: r["rolling_users"]
        for r in rolling_distinct_users(df, window_days=7).collect()
    }
    active = {(u, ts.date()) for u, ts in rows}
    days = sorted({d for _, d in active})
    last = max(days)
    want = {}
    for d in days:
        for off in range(7):
            day = d + dt.timedelta(days=off)
            if day <= last:
                want.setdefault(day, set())
    for u, d in active:
        for off in range(7):
            day = d + dt.timedelta(days=off)
            if day in want:
                want[day].add(u)
    want = {d: len(s) for d, s in want.items()}
    assert got == want


def test_roc_auc_bruteforce_with_ties(spark):
    """AUC == P(s+ > s-) + 0.5 P(s+ == s-) by exhaustive pair count,
    on a frame dense with ties; degenerate one-class input -> NULL auc
    (try_divide), not an error."""
    from fractions import Fraction

    from collection_templates_spark.operators.stats import roc_auc

    import random

    rng = random.Random(7)
    rows = [
        (round(rng.choice([0.1, 0.25, 0.25, 0.5, 0.7, 0.7, 0.9]), 6),
         rng.random() < 0.4)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "score double, y boolean")
    r = roc_auc(df, "score", "y").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    want = Fraction(num, 2 * len(pos) * len(neg))
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert abs(r["auc"] - round(float(want), 6)) < 1e-12
    assert abs(r["gini"] - round(float(2 * want - 1), 6)) < 1e-9
    # one-class degenerate
    df1 = spark.createDataFrame([(0.5, True), (0.7, True)],
                                "score double, y boolean")
    r1 = roc_auc(df1, "score", "y").collect()[0]
    assert r1["auc"] is None and r1["n_neg"] == 0


def test_cohens_kappa_hand_computed(spark):
    """Kappa against the textbook 2x2 worked example, the
    perfect-agreement and independence edges, and the pe=1 degenerate
    (both columns constant -> NULL via try_divide)."""
    from fractions import Fraction

    from collection_templates_spark.operators.stats import cohens_kappa

    # classic worked example: raters agree 20+15 of 50,
    # marginals A: 25/25, B: 30/20 -> pe = (25*30 + 25*20)/2500 = 0.5
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n_pairs"] == 50 and r["n_agree"] == 35
    want = (Fraction(35, 50) - Fraction(1, 2)) / (1 - Fraction(1, 2))
    assert r["kappa"] == round(float(want), 6)  # 0.4
    # perfect agreement -> 1.0
    df2 = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 4, "a string, b string"
    )
    assert cohens_kappa(df2, "a", "b").collect()[0]["kappa"] == 1.0
    # both constant -> pe = 1 -> NULL, not an error
    df3 = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    assert cohens_kappa(df3, "a", "b").collect()[0]["kappa"] is None
    # partially-overlapping marginals ('y' appears on both sides:
    # r_y=2, c_y=4 -> src=8), diag 0 -> negative kappa
    df4 = spark.createDataFrame(
        [("x", "y")] * 4 + [("y", "z")] * 2, "a string, b string"
    )
    r4 = cohens_kappa(df4, "a", "b").collect()[0]
    want4 = Fraction(6 * 0 - 8, 36 - 8)
    assert r4["kappa"] == round(float(want4), 6)
    # fully DISJOINT label sets: the marginal join is EMPTY, true
    # cross-term 0 -> kappa = (n*0 - 0)/(n^2 - 0) = 0.0 exactly, not
    # NULL (the coalesce in the sum_rc aggregate)
    df5 = spark.createDataFrame([("x", "y")] * 4, "a string, b string")
    r5 = cohens_kappa(df5, "a", "b").collect()[0]
    assert r5["kappa"] == 0.0
