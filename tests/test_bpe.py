"""BPE tokenizer induction: driver learner + distinct-word application."""

from pyspark.sql import functions as F  # noqa: F401

from collection_templates_spark.functions.bpe import (
    END,
    apply_bpe,
    bpe_tokenize,
    learn_bpe_merges,
    train_bpe,
)


def test_pinned_merge_table_closed_form():
    """The bpe_apply_stats oracle states n_pieces in closed form —
    len(w) + 1 − Σ substring occurrences − endswith('e') — on the claim
    that the pinned rules are mutually non-interacting. Sweep arbitrary
    words over the rules' alphabet (plus noise chars) and check the real
    greedy applier agrees exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from collection_templates_spark.plans.testdata_queries import _BPE_MERGES

    def closed_form(w: str) -> int:
        n = len(w) + 1
        for pat in ("th", "an", "in", "or"):
            n -= (len(w) - len(w.replace(pat, ""))) // 2
        if w.endswith("e"):
            n -= 1
        return n

    @given(st.text(alphabet="thaniore x'", min_size=1, max_size=20))
    @settings(max_examples=500)
    def sweep(w):
        assert len(apply_bpe(w, _BPE_MERGES)) == closed_form(w), w

    sweep()


def test_learn_bpe_hand_computed():
    # the Sennrich-style toy corpus: 'low'x5, 'lower'x2, 'newest'x6,
    # 'widest'x3 — first merges are (e,s) 9, (es,t) 9, (est,</w>) 9 ...
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_merges(counts, n_merges=4)
    assert merges[0] == ("e", "s")        # count 9, lexicographic vs (l,o)=7
    assert merges[1] == ("es", "t")       # the chain continues
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")        # 7 occurrences
    # tokenization with the learned table
    assert apply_bpe("newest", merges) == ["n", "e", "w", "est" + END]
    assert apply_bpe("lowest", merges) == ["lo", "w", "est" + END]


def test_learn_bpe_reconstruction_and_monotone():
    counts = [("banana", 4), ("bandana", 2), ("cabana", 3), ("ban", 7)]
    prev = None
    for n in (0, 2, 5, 10):
        merges = learn_bpe_merges(counts, n_merges=n)
        total = 0
        for w, _ in counts:
            pieces = apply_bpe(w, merges)
            # concatenation invariant: pieces always rebuild word + END
            assert "".join(pieces) == w + END
            total += len(pieces)
        # more merges never tokenize the training words into MORE pieces
        if prev is not None:
            assert total <= prev
        prev = total


def test_bpe_tokenize_matches_driver_reference(spark):
    rows = [
        (0, "the lowlands lower the lowest low"),
        (1, "newest widest low low low"),
        (2, "  The   LOW  "),  # normalization
        (3, None),             # null text → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=8)
    # determinism across runs
    assert merges == train_bpe(docs, n_merges=8)
    got = {
        r["doc"]: (r["n_words"], r["n_pieces"], r["compression"])
        for r in bpe_tokenize(docs, merges).collect()
    }
    want = {}
    for doc_id, text in rows:
        if text is None:
            continue
        words = [w for w in " ".join(text.lower().split()).split(" ") if w]
        if not words:
            continue
        pieces = sum(len(apply_bpe(w, merges)) for w in words)
        want[doc_id] = (
            len(words),
            pieces,
            round(pieces / len(words), 6),
        )
    assert got == want
    assert 3 not in got


def test_bpe_word_cap_is_take_ordered(spark):
    """The max_words prune must be TakeOrderedAndProject (distributed
    top-N), not a single-partition global window."""
    from collection_templates_spark.functions.bpe import bpe_word_counts

    docs = spark.createDataFrame(
        [(i, f"w{i % 50} common") for i in range(200)],
        "doc_id long, text string",
    )
    df = bpe_word_counts(docs, max_words=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["word"] == "common" and rows[0]["n"] == 200
