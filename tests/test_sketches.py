"""Deterministic sketch contracts (operators/sketches.py): the CMS
overestimate guarantee under forced collisions, and the HLL estimate
re-derived in plain Python from the same portable hash."""

import math


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_cms_never_underestimates_even_with_tiny_width(spark):
    """w=4 forces heavy cell collisions — estimates may be way high but
    NEVER below the true count (the one-sided CMS guarantee)."""
    from collection_templates_spark.operators.sketches import (
        cms_token_errors,
    )

    texts = ["alpha beta gamma delta " * 5, "beta beta epsilon zeta eta"]
    out = cms_token_errors(_docs(spark, texts), width=4).collect()
    assert len(out) == 7
    for r in out:
        assert r["n_est"] >= r["n_true"], r


def test_cms_exact_when_collision_free(spark):
    from collection_templates_spark.operators.sketches import (
        cms_token_errors,
    )

    out = cms_token_errors(
        _docs(spark, ["one two two three three three"]), width=4096
    ).collect()
    got = {r["token"]: (r["n_true"], r["n_est"]) for r in out}
    assert got == {"one": (1, 1), "two": (2, 2), "three": (3, 3)}


def test_hll_matches_python_rederivation(spark):
    """The register table, harmonic sum and correction re-derived in
    plain Python from the same portable hash — estimate equal to 4dp."""
    from collection_templates_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_RANK_BITS,
        hll_cardinality,
    )

    words = [f"w{i}x" for i in range(200)]
    texts = [" ".join(words[i::4]) for i in range(4)]
    row = hll_cardinality(_docs(spark, texts)).collect()[0]
    assert row["n_true"] == 200

    MOD = 2147483647

    def poly(s, base):
        h = 0
        for c in s:
            h = (h * base + ord(c)) % MOD
        return h

    m, rb = HLL_M, HLL_RANK_BITS

    def mix(a, b):
        return ((a * a % MOD) * 48271 % MOD + b) % MOD

    regs = {}
    for w in set(words):
        h1, h2 = poly(w, 31), poly(w, 37)
        g1, g2 = mix(h1, h2), mix(h2, h1)
        b = g1 % m
        r = (rb + 1) if g2 == 0 else min((g2 & -g2).bit_length(), rb + 1)
        regs[b] = max(regs.get(b, 0), r)
    num = sum(2 ** (rb + 1 - mx) for mx in regs.values())
    denom = num / float(2 ** (rb + 1)) + (m - len(regs))
    raw_e = HLL_ALPHA * m * m / denom
    v = m - len(regs)
    est = m * math.log(m / v) if (raw_e <= 2.5 * m and v > 0) else raw_e
    assert row["estimate"] == round(est, 4)
    # the estimator is actually informative at this size
    assert abs(row["estimate"] - 200) / 200 < 0.25


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The register table is a plain groupBy-max, i.e. legal streaming
    state: the SAME function over a file stream (complete mode) must
    produce the identical m-row register table the batch path builds —
    the sketch-as-streaming-state contract."""
    from collection_templates_spark.operators.sketches import (
        _analyzer_tokens,
        hll_register_table,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i * 7 % 50} shared common") for i in range(40)],
        "doc_id long, text string",
    )
    src = tmp_path / "docs"
    docs.repartition(4).write.parquet(str(src))

    batch_regs = sorted(
        map(
            tuple,
            hll_register_table(
                _analyzer_tokens(docs, "doc_id", "text")
            ).collect(),
        )
    )

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        hll_register_table(_analyzer_tokens(stream, "doc_id", "text"))
        .writeStream.format("memory")
        .queryName("hll_regs_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("hll_regs_stream").collect()))
    assert got == batch_regs


def test_streaming_cms_cells_match_batch(spark, tmp_path):
    """The CMS cell table is a plain groupBy-count — also legal
    streaming state (≤ d·w rows): stream == batch cells."""
    from pyspark.sql import functions as F

    from collection_templates_spark.operators.dedup import _poly_hash
    from collection_templates_spark.operators.sketches import (
        CMS_BASES,
        CMS_WIDTH,
        _analyzer_tokens,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 17} beta") for i in range(30)],
        "doc_id long, text string",
    )
    src = tmp_path / "docs"
    docs.repartition(3).write.parquet(str(src))

    def cells(df):
        toks = _analyzer_tokens(df, "doc_id", "text")
        return (
            toks.select(
                F.posexplode(
                    F.array(
                        *[
                            (_poly_hash(F.col("token"), b) % CMS_WIDTH)
                            .cast("int")
                            for b in CMS_BASES
                        ]
                    )
                ).alias("row", "cell")
            )
            .groupBy("row", "cell")
            .agg(F.count("*").alias("c"))
        )

    batch = sorted(map(tuple, cells(docs).collect()))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        cells(stream)
        .writeStream.format("memory")
        .queryName("cms_cells_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("cms_cells_stream").collect()))
    assert got == batch


def test_theta_small_sets_are_exact(spark):
    """Sets smaller than k keep every member and θ=1.0, so the
    intersection estimate must equal the exact overlap."""
    from collection_templates_spark.operators.sketches import (
        kmv_theta_intersections,
    )

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    out = kmv_theta_intersections(ev, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.set_a, r.set_b) == ("a", "b")
    assert r.n_exact == 10
    assert r.n_est == 10.0
    assert r.rel_err == 0.0


def test_theta_estimate_within_tolerance_on_large_sets(spark):
    """k=64 over thousands of members: the estimate is approximate but
    must land within a generous multiple of the 1/sqrt(k) ~ 12.5%
    theoretical error."""
    from collection_templates_spark.operators.sketches import (
        kmv_theta_intersections,
    )

    rows = [("a", i) for i in range(4000)] + [
        ("b", i) for i in range(2000, 6000)
    ]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    r = kmv_theta_intersections(ev, k=64).collect()[0]
    assert r.n_exact == 2000
    assert 0.5 * 2000 <= r.n_est <= 1.5 * 2000, r.n_est


def test_bloom_no_false_negatives_and_model_sane(spark):
    """Every true member must pass the filter (Bloom guarantee), and a
    deliberately tiny m forces false positives the fpr must report."""
    from pyspark.sql import functions as F

    from collection_templates_spark.operators.sketches import (
        bloom_filter_fpr,
    )

    keys = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "token string"
    )
    probes = keys.select("token").union(
        spark.createDataFrame(
            [(f"zz{i}",) for i in range(500)], "token string"
        )
    )
    r = bloom_filter_fpr(keys, probes, m=64).collect()[0]
    # m=64 with 200 keys -> nearly every bit set -> most non-members pass
    assert r.n_keys == 200
    assert r.n_probes == 500
    assert r.n_false_pos > 0
    assert 0.0 < r.fpr <= 1.0
    assert 0.0 < r.fpr_model <= 1.0

    # membership completeness: with the same m, every true member passes —
    # replicate the pass test directly
    from collection_templates_spark.operators.dedup import _poly_hash
    from collection_templates_spark.operators.sketches import BLOOM_BASES

    m = 64
    bits = {
        row.pos
        for row in keys.select(
            F.explode(
                F.array(
                    *[
                        (_poly_hash(F.col("token"), b) % m).cast("int")
                        for b in BLOOM_BASES
                    ]
                )
            ).alias("pos")
        ).collect()
    }
    def py_poly(s: str, b: int) -> int:
        h = 0
        for c in s:
            h = (h * b + ord(c)) % 2147483647
        return h

    for i in range(200):
        tok = f"key{i}"
        assert {py_poly(tok, b) % m for b in BLOOM_BASES} <= bits, tok


def test_hll_merge_equals_single_pass_registers(spark):
    from collection_templates_spark.operators.sketches import (
        _analyzer_tokens,
        hll_merge,
        hll_register_table,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared common") for i in range(30)],
        "doc_id long, text string",
    )
    ta = _analyzer_tokens(docs.filter("doc_id % 2 = 0"), "doc_id", "text")
    tb = _analyzer_tokens(docs.filter("doc_id % 2 = 1"), "doc_id", "text")
    merged = {
        r.bucket: r.mx
        for r in hll_merge(
            hll_register_table(ta), hll_register_table(tb)
        ).collect()
    }
    direct = {
        r.bucket: r.mx
        for r in hll_register_table(ta.unionByName(tb)).collect()
    }
    assert merged == direct  # max-merge identity, element-wise


def test_hll_union_cardinality_row(spark):
    from collection_templates_spark.operators.sketches import (
        hll_union_cardinality,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared common") for i in range(40)],
        "doc_id long, text string",
    )
    (row,) = hll_union_cardinality(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    ).collect()
    assert row.n_register_mismatch == 0
    assert row.n_true == 43  # tok0..tok40 + shared + common
    assert row.rel_err < 0.35  # m=64 union estimate within tolerance


def test_hll_merge_idempotent_and_commutative(spark):
    from collection_templates_spark.operators.sketches import (
        _analyzer_tokens,
        hll_merge,
        hll_register_table,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i * 7 % 11}") for i in range(20)],
        "doc_id long, text string",
    )
    ra = hll_register_table(
        _analyzer_tokens(docs.filter("doc_id < 10"), "doc_id", "text")
    )
    rb = hll_register_table(
        _analyzer_tokens(docs.filter("doc_id >= 10"), "doc_id", "text")
    )
    ab = {(r.bucket, r.mx) for r in hll_merge(ra, rb).collect()}
    ba = {(r.bucket, r.mx) for r in hll_merge(rb, ra).collect()}
    aa = {(r.bucket, r.mx) for r in hll_merge(ra, ra, rb).collect()}
    assert ab == ba == aa


def test_hll_merge_with_empty_side_is_identity(spark):
    from collection_templates_spark.operators.sketches import (
        _analyzer_tokens,
        hll_merge,
        hll_register_table,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 3}") for i in range(12)],
        "doc_id long, text string",
    )
    regs = hll_register_table(_analyzer_tokens(docs, "doc_id", "text"))
    empty = hll_register_table(
        _analyzer_tokens(docs.filter("doc_id < 0"), "doc_id", "text")
    )
    merged = {(r.bucket, r.mx) for r in hll_merge(regs, empty).collect()}
    assert merged == {(r.bucket, r.mx) for r in regs.collect()}
