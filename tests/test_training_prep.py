"""Training-prep operators: benchmark decontamination + sequence packing."""

from pyspark.sql import functions as F  # noqa: F401

from collection_templates_spark.operators.training_prep import (
    ngram_contamination,
    pack_sequences,
)


def _trigrams(text: str) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_ngram_contamination_matches_python_brute_force(spark):
    bench_texts = ["the quick brown fox jumps", "pack my box with jugs"]
    corpus_rows = [
        (10, "the quick brown fox jumps high today"),
        (11, "completely novel content with no overlap here"),
        (12, "The  Quick   brown fox jumps"),  # normalization: full overlap
        (13, "short one"),  # < 3 words → absent from output
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    got = {
        r["doc"]: (r["n_grams"], r["n_contaminated"], r["contamination"])
        for r in ngram_contamination(corpus, bench).collect()
    }
    bench_grams = set().union(*(_trigrams(t) for t in bench_texts))
    want = {}
    for doc_id, text in corpus_rows:
        g = _trigrams(text)
        if g:
            hits = len(g & bench_grams)
            want[doc_id] = (len(g), hits, round(hits / len(g), 6))
    assert got == want
    assert got[12][2] == 1.0  # whitespace/case-normalized full overlap
    assert 13 not in got


def test_pack_sequences_layout_and_shard_independence(spark):
    # letter-run words → bpe_ish count == word count, so layouts are
    # hand-checkable; context_len=5
    rows = [
        ("a", 1, "aa bb cc"),          # 3 tokens: offset 0, bin 0
        ("a", 2, "dd ee ff gg"),       # 4 tokens: offset 3, spans 3-6 → crosses
        ("a", 3, "hh"),                # 1 token:  offset 7, bin 1
        ("b", 1, "ii jj kk ll mm nn"), # 6 tokens: offset 0, spans 0-5 → crosses
        ("b", 2, ""),                  # 0 tokens: offset 6, bin 1, no cross
        ("b", 3, None),                # null text = 0 tokens, same contract
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["grp"], r["doc"]): (
            r["n_tokens"], r["start_offset"], r["bin"], r["crosses_boundary"]
        )
        for r in pack_sequences(docs, context_len=5).collect()
    }
    assert got == {
        ("a", 1): (3, 0, 0, 0),
        ("a", 2): (4, 3, 0, 1),
        ("a", 3): (1, 7, 1, 0),
        ("b", 1): (6, 0, 0, 1),
        ("b", 2): (0, 6, 1, 0),
        ("b", 3): (0, 6, 1, 0),
    }


def test_pack_sequences_total_order_is_per_shard(spark):
    """Offsets restart per shard and never depend on other shards — the
    property that keeps the operator embarrassingly parallel."""
    rows = [(f"s{i % 4}", i, "tok " * 10) for i in range(40)]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = pack_sequences(docs, context_len=64).collect()
    per_shard = {}
    for r in out:
        per_shard.setdefault(r["grp"], []).append(r)
    for grp, members in per_shard.items():
        members.sort(key=lambda r: r["doc"])
        offset = 0
        for r in members:
            assert r["start_offset"] == offset, (grp, r)
            offset += r["n_tokens"]


def test_repetition_stats_matches_python_brute_force(spark):
    rows = [
        (1, "spam spam spam spam"),          # top 2-gram 'spam spam' = 3/3
        (2, "a b a b a"),                    # 'a b' 2, 'b a' 2 → top 2/4
        (3, "all distinct words here now"),  # every 2-gram once → 1/4
        (4, "one"),                          # < 2 words → absent
    ]
    from collection_templates_spark.operators.training_prep import (
        repetition_stats,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_ngrams"], r["top_ngram_count"], r["top_ngram_frac"])
        for r in repetition_stats(docs, n=2).collect()
    }
    from collections import Counter

    want = {}
    for doc_id, text in rows:
        toks = " ".join(text.lower().split()).split(" ")
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        if grams:
            c = Counter(grams)
            top = max(c.values())
            want[doc_id] = (len(grams), top, round(top / len(grams), 6))
    assert got == want
    assert got[1][2] == 1.0 and got[3][2] == 0.25


def test_redact_pii_counts_order_and_portability(spark):
    from collection_templates_spark.operators.pii import (
        PII_PATTERNS,
        redact_pii,
    )

    rows = [
        (1, "mail me at a.b-c%d@ex-ample.co.uk or (555) 123-4567 now"),
        (2, "server 192.168.1.254 and 10.0.0.1, no mail"),
        # email whose domain embeds a dotted quad: the email rule runs
        # FIRST, so no partial <IP> inside an address
        (3, "x@10.0.0.1.com then bare 10.0.0.1"),
        (4, "nothing sensitive here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["text_redacted"] == "mail me at <EMAIL> or <PHONE> now"
    assert got[2]["n_ipv4"] == 2
    assert got[2]["text_redacted"] == "server <IP> and <IP>, no mail"
    assert got[3]["text_redacted"] == "<EMAIL> then bare <IP>"
    assert got[4]["text_redacted"] == "nothing sensitive here"
    # portability: the SAME pattern strings produce the SAME redaction in
    # DuckDB's RE2 engine — the property the oracle relies on
    import duckdb

    con = duckdb.connect()
    for doc_id, text in rows:
        red = "t"
        for _, pat, repl in PII_PATTERNS:
            red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
        duck = con.execute(
            f"SELECT {red} FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert duck == got[doc_id]["text_redacted"], (doc_id, duck)


def test_decontamination_plan_broadcasts_benchmark(spark):
    """The benchmark gram set must reach the corpus side as a BROADCAST
    (the corpus is the 100 TB side); any cartesian product is a bug."""
    from collection_templates_spark.operators.training_prep import (
        ngram_contamination,
    )

    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(100)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "w1 w2 w3")], "doc_id long, text string"
    )
    df = ngram_contamination(corpus, bench)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_contamination_spans_matches_python_brute_force(spark):
    bench_texts = ["alpha beta gamma delta epsilon zeta"]
    corpus_rows = [
        # verbatim quote in the middle → run of consecutive hits
        (20, "novel one two alpha beta gamma delta epsilon after words"),
        # two separated quoted fragments → max run < total hits
        (21, "alpha beta gamma x y z delta epsilon zeta q"),
        (22, "no overlap at all in this document"),
    ]
    from collection_templates_spark.operators.training_prep import (
        contamination_spans,
    )

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, t) for t in bench_texts], "doc_id long, text string"
    )
    got = {
        r["doc"]: (r["n_grams"], r["n_contaminated"], r["max_contaminated_run"])
        for r in contamination_spans(corpus, bench).collect()
    }
    bench_grams = set()
    for t in bench_texts:
        toks = t.split()
        bench_grams |= {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    want = {}
    for doc_id, text in corpus_rows:
        toks = text.split()
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        hits = [g in bench_grams for g in grams]
        run = best = 0
        for h in hits:
            run = run + 1 if h else 0
            best = max(best, run)
        want[doc_id] = (len(grams), sum(hits), best)
    assert got == want
    assert got[20][2] == 3  # 5-word quote → 3 consecutive trigrams
    assert got[21][2] == 1 and got[21][1] == 2  # fragments don't chain
    assert got[22] == (5, 0, 0)  # 7 words → 5 trigrams, none contaminated


def test_assign_split_deterministic_and_uniform(spark):
    from collection_templates_spark.operators.training_prep import assign_split

    docs = spark.createDataFrame(
        [(i,) for i in range(5000)], "doc_id long"
    )
    a = {r["doc_id"]: (r["split_bucket"], r["split"])
         for r in assign_split(docs).collect()}
    b = {r["doc_id"]: (r["split_bucket"], r["split"])
         for r in assign_split(docs).collect()}
    assert a == b  # stable across runs
    from collections import Counter

    dist = Counter(v[1] for v in a.values())
    assert abs(dist["train"] / 5000 - 0.9) < 0.02, dist
    assert abs(dist["val"] / 5000 - 0.05) < 0.02, dist
    assert abs(dist["test"] / 5000 - 0.05) < 0.02, dist
    # a different salt draws an INDEPENDENT split (same marginals,
    # different assignment)
    c = {r["doc_id"]: r["split"]
         for r in assign_split(docs, salt="fold2").collect()}
    moved = sum(1 for k in a if a[k][1] != c[k])
    assert moved > 100, moved


def test_sample_stratified_rates_and_nesting(spark):
    from collection_templates_spark.operators.training_prep import (
        sample_stratified,
    )

    rows = [(i, "s%d" % (i % 4)) for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    kept = sample_stratified(docs, rates, default_rate=0.25).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("s0", ())) == 1000  # rate 1.0 keeps all
    assert "s2" not in by_src  # rate 0.0 keeps none
    assert abs(len(by_src["s1"]) / 1000 - 0.5) < 0.06
    assert abs(len(by_src["s3"]) / 1000 - 0.25) < 0.06
    # determinism: re-running reproduces the exact same sample
    again = {
        (r["doc_id"], r["source"])
        for r in sample_stratified(docs, rates, default_rate=0.25).collect()
    }
    assert {(r["doc_id"], r["source"]) for r in kept} == again
    # nesting: a lower rate's sample is a SUBSET of a higher rate's (the
    # property that lets you grow a sample without resampling old rows)
    small = {
        r["doc_id"]
        for r in sample_stratified(docs, {}, default_rate=0.1).collect()
    }
    big = {
        r["doc_id"]
        for r in sample_stratified(docs, {}, default_rate=0.3).collect()
    }
    assert small < big


def test_mixture_plan_arithmetic(spark):
    import math

    from collection_templates_spark.operators.training_prep import (
        mixture_plan,
    )

    # letter-run words → bpe_ish count == word count
    rows = [
        (0, "aa bb cc dd", "big"),
        (1, "aa bb cc dd ee ff gg hh ii jj kk ll", "big"),
        (2, "aa bb", "small"),
        (3, "aa bb", "small"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["grp"]: r.asDict()
        for r in mixture_plan(docs, target_tokens=100, alpha=0.5).collect()
    }
    toks = {"big": 16, "small": 4}
    w_tot = math.sqrt(16) + math.sqrt(4)
    for grp, n in toks.items():
        w = math.sqrt(n) / w_tot
        tgt = math.floor(w * 100)
        assert got[grp]["n_tokens"] == n
        assert got[grp]["weight"] == round(w, 6)
        assert got[grp]["target_tokens_grp"] == tgt
        assert got[grp]["sample_rate"] == round(tgt / n, 6)
        assert got[grp]["epochs"] == math.ceil(tgt / n)
    # temperature flattening: alpha=0.5 gives "small" MORE than its
    # natural 4/20 share, "big" less than 16/20
    assert got["small"]["weight"] > 4 / 20
    assert got["big"]["weight"] < 16 / 20


def test_vocab_oov_matches_python_brute_force(spark):
    from collections import Counter

    from collection_templates_spark.operators.training_prep import vocab_oov

    rows = [
        (0, "a a a b b c dd"),
        (1, "b c dd ee ff"),
        (2, "  A   b  "),  # normalization folds case/whitespace
        (3, None),  # null text → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    V = 3
    got = {
        r["doc"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_oov(docs, vocab_size=V).collect()
    }
    counts = Counter()
    toks_by_doc = {}
    for doc_id, text in rows:
        if text is None:
            continue
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        toks_by_doc[doc_id] = toks
        counts.update(toks)
    vocab = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    }
    want = {}
    for doc_id, toks in toks_by_doc.items():
        if toks:
            oov = sum(1 for t in toks if t not in vocab)
            want[doc_id] = (len(toks), oov, round(oov / len(toks), 6))
    assert got == want
    assert 3 not in got


def test_boilerplate_stats_matches_python_brute_force(spark):
    from collections import Counter

    from collection_templates_spark.operators.training_prep import (
        boilerplate_stats,
    )

    rows = [(i, "x y common tail %d" % (i % 2)) for i in range(10)] + [
        (100, "totally different words here"),
        (101, "zz"),  # < 2 words → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_grams"], r["n_boiler"], r["boiler_frac"])
        for r in boilerplate_stats(docs, min_df=5, n=2).collect()
    }

    def bigrams(text):
        toks = " ".join(text.lower().split()).split(" ")
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    df = Counter()
    grams_by_doc = {}
    for doc_id, text in rows:
        g = bigrams(text)
        if g:
            grams_by_doc[doc_id] = g
            df.update(g)
    boiler = {g for g, c in df.items() if c >= 5}
    want = {}
    for doc_id, g in grams_by_doc.items():
        b = len(g & boiler)
        want[doc_id] = (len(g), b, round(b / len(g), 6))
    assert got == want
    assert 101 not in got
    # "x y"/"y common"/"common tail" hit df=10; "tail 0" df=5 — all four
    # of doc 0's grams are boilerplate; the unique doc has none
    assert got[0][1] == 4 and got[100][1] == 0


def test_winnowing_matches_python_brute_force(spark):
    from collection_templates_spark.operators.text_analysis import (
        winnowing_summary,
    )

    MOD, K, W = 2147483647, 4, 3
    rows = [
        (0, "abcdefghij"),
        (1, "aaaaaaaaaa"),  # degenerate: all hashes equal (tie rule)
        (2, "Mixed  Case text with   spaces"),
        (3, "abc"),  # shorter than k → no hashes → absent
        (4, "abcde"),  # 2 hashes < w → no full window → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: (r["n_hashes"], r["n_fp"], r["fp_checksum"], r["density"])
        for r in winnowing_summary(docs, k=K, w=W).collect()
    }

    def brute(text):
        norm = " ".join(text.lower().split())
        hs = []
        for i in range(len(norm) - K + 1):
            h = 0
            for ch in norm[i : i + K]:
                h = (h * 31 + ord(ch)) % MOD
            hs.append(h)
        sel = set()
        for e in range(W - 1, len(hs)):
            lo = e - W + 1
            m = min(hs[lo : e + 1])
            for p in range(lo, e + 1):
                if hs[p] == m:  # tie-inclusive selection rule
                    sel.add(p)
        return hs, sel

    want = {}
    for doc_id, text in rows:
        hs, sel = brute(text)
        if sel:
            ck = sum(hs[p] * (p + 1) % MOD for p in sel)
            want[doc_id] = (
                len(hs),
                len(sel),
                ck,
                round(len(sel) / len(hs), 6),
            )
    assert got == want
    assert 3 not in got and 4 not in got
    # the all-equal doc selects EVERY position under the tie rule
    assert got[1][1] == got[1][0]


def test_winnowing_containment_matches_python_brute_force(spark):
    from collection_templates_spark.operators.text_analysis import (
        winnowing_containment_pairs,
    )

    MOD, K, W = 2147483647, 6, 3
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " with an extra tail of different words"),  # contains 0
        (2, "completely unrelated text goes here instead now"),
        (3, base.upper()),  # case-normalized → identical to 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc1"], r["doc2"]): (r["n_shared"], r["containment"])
        for r in winnowing_containment_pairs(
            docs, k=K, w=W, min_shared=1, max_bucket_size=None
        ).collect()
    }

    def fps(text):
        norm = " ".join(text.lower().split())
        hs = []
        for i in range(len(norm) - K + 1):
            h = 0
            for ch in norm[i : i + K]:
                h = (h * 31 + ord(ch)) % MOD
            hs.append(h)
        sel = set()
        for e in range(W - 1, len(hs)):
            m = min(hs[e - W + 1 : e + 1])
            for p in range(e - W + 1, e + 1):
                if hs[p] == m:
                    sel.add(hs[p])
        return sel

    sets = {i: fps(t) for i, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                c = len(sets[a] & sets[b])
                if c >= 1:
                    want[(a, b)] = (
                        c,
                        round(c / min(len(sets[a]), len(sets[b])), 6),
                    )
    assert got == want
    # the containment signal: doc 0 fully inside doc 1, and 3 == 0
    assert got[(0, 1)][1] == 1.0
    assert got[(0, 3)] == (len(sets[0]), 1.0)
    # hot-bucket cap: dropping every bucket kills all pairs (lower bound)
    assert (
        winnowing_containment_pairs(
            docs, k=K, w=W, min_shared=1, max_bucket_size=0
        ).count()
        == 0
    )


def test_winnowing_udf_matches_native(spark):
    """The numpy-batched rolling_hash_udf must be value-identical to the
    native HOF rolling_shingle_hashes on every corpus text (incl. CJK
    codepoints, nulls, and texts shorter than k)."""
    from collection_templates_spark.functions.udfs import rolling_hash_udf
    from collection_templates_spark.operators.text_analysis import (
        rolling_shingle_hashes,
    )

    rows = [
        (0, "the quick brown fox"),
        (1, "短い中文テキスト mixed with ascii"),
        (2, "x"),   # shorter than k
        (3, None),  # null text
        (4, "exactly8"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (4, 8, 20):
        got = {
            r["doc_id"]: r["u"]
            for r in docs.select(
                "doc_id", rolling_hash_udf(F.col("text"), F.lit(k)).alias("u")
            ).collect()
        }
        want = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id", rolling_shingle_hashes(F.col("text"), k).alias("n")
            ).collect()
        }
        for doc_id in got:
            # native yields NULL/[] for short-or-null; udf yields [] — both
            # vanish at the posexplode, so normalize for the comparison
            assert (got[doc_id] or []) == (want[doc_id] or []), (k, doc_id)


def test_sample_weighted_is_deterministic_and_weight_biased(spark):
    """Same (salt, ids, weights) → identical sample; across many salts
    a 50×-heavier item is included far more often (the Efraimidis–
    Spirakis inclusion-∝-weight property); plan uses TakeOrdered, not a
    global sort."""
    from collection_templates_spark.operators.training_prep import (
        sample_weighted,
    )

    rows = [(i, "x", 50 if i < 20 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")

    a = [r["doc_id"] for r in sample_weighted(df, k=30).collect()]
    b = [r["doc_id"] for r in sample_weighted(df, k=30).collect()]
    assert a == b  # deterministic

    heavy_hits = 0
    trials = 12
    for s in range(trials):
        got = {r["doc_id"] for r in sample_weighted(df, k=30, salt=f"s{s}").collect()}
        heavy_hits += len([i for i in got if i < 20])
    # heavy items are 10% of rows but ~50x weight: expect them to take
    # well over half the sample on average
    assert heavy_hits / (30 * trials) > 0.45, heavy_hits

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sample_weighted(df, k=30).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
