"""Round-9 additions: paragraph-level exact dedup, quality-ranked
cluster retention, cohort retention analytics."""

import datetime

from pyspark.sql import functions as F

from collection_templates_spark.operators.clustering import dedup_keep_best
from collection_templates_spark.operators.dedup import paragraph_dedup_stats


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, n_chars bigint"
    )


def test_paragraph_dedup_cross_doc_only(spark):
    # chunk width 2: doc0 = [ab][cd], doc1 = [ab][xy], doc2 = [zz][qq].
    # "a b" is shared across docs 0 and 1; nothing else collides.
    docs = _docs(
        spark,
        [
            (0, "a b c d", 7),
            (1, "a b x y", 7),
            (2, "z z q q", 7),
        ],
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_ratio, r.drop_doc)
        for r in paragraph_dedup_stats(docs, chunk_tokens=2).collect()
    }
    assert out[0] == (2, 1, 0.5, 0)
    assert out[1] == (2, 1, 0.5, 0)
    assert out[2] == (2, 0, 0.0, 0)


def test_paragraph_dedup_self_repeat_not_duplicate(spark):
    # doc0 repeats ITS OWN chunk ("a b" twice) — multiplicity is decided
    # per (chunk, doc) GROUP, so a self-repeat never counts as duplicated.
    docs = _docs(spark, [(0, "a b a b", 7), (1, "c d e f", 7)])
    out = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in paragraph_dedup_stats(docs, chunk_tokens=2).collect()
    }
    assert out[0] == (2, 0)
    assert out[1] == (2, 0)


def test_paragraph_dedup_drop_threshold_and_partial_window(spark):
    # doc0/doc1 share both full chunks; doc0's trailing partial window
    # ("e") is unique, giving ratio 4/5 < 1.0 but >= 0.6 → dropped; the
    # 5-token doc still yields ceil(5/2)=3 chunks (last partial kept).
    docs = _docs(
        spark,
        [
            (0, "a b c d e", 9),
            (1, "a b c d", 7),
        ],
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.drop_doc)
        for r in paragraph_dedup_stats(docs, chunk_tokens=2).collect()
    }
    assert out[0] == (3, 2, 1)  # 2/3 ≥ 0.6
    assert out[1] == (2, 2, 1)  # 2/2 ≥ 0.6


def test_paragraph_dedup_empty_text(spark):
    docs = _docs(spark, [(0, "", 0), (1, "", 0)])
    out = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.drop_doc)
        for r in paragraph_dedup_stats(docs, chunk_tokens=2).collect()
    }
    # both docs consist of ONE empty chunk, shared cross-doc → dropped
    assert out[0] == (1, 1, 1)
    assert out[1] == (1, 1, 1)


def test_keep_best_prefers_quality_over_min_id(spark):
    # cluster {1,3,5}: doc 3 is longest → kept, even though 1 is min id;
    # singleton 0 keeps itself; tie in cluster {7,8} broken by min id.
    docs = _docs(
        spark,
        [
            (0, "s", 1),
            (1, "a", 10),
            (3, "b", 30),
            (5, "c", 20),
            (7, "d", 4),
            (8, "e", 4),
        ],
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (7, 8)], "doc1 bigint, doc2 bigint"
    )
    out = {
        r.doc_id: (r.cluster, r.keep)
        for r in dedup_keep_best(docs, pairs).collect()
    }
    assert out[0] == (0, 1)
    assert out[1] == (1, 0)
    assert out[3] == (1, 1)
    assert out[5] == (1, 0)
    assert out[7] == (7, 1)
    assert out[8] == (7, 0)


def test_keep_best_exactly_one_keeper_per_cluster(spark):
    docs = _docs(spark, [(i, f"t{i}", i % 5) for i in range(30)])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 28, 2)], "doc1 bigint, doc2 bigint"
    )
    out = dedup_keep_best(docs, pairs)
    per_cluster = (
        out.groupBy("cluster").agg(F.sum("keep").alias("k")).collect()
    )
    assert all(r.k == 1 for r in per_cluster)
    assert out.count() == 30


def test_cohort_retention_offsets(spark):
    from collection_templates_spark.plans.testdata_queries import (
        events_cohort_retention,
    )
    import os
    import tempfile

    # u1 active weeks 0,1,2; u2 active weeks 0,2; u3 first seen week 1.
    # Mondays: 2024-01-01, 2024-01-08, 2024-01-15.
    def ts(day, hour=12):
        return datetime.datetime(2024, 1, day, hour)

    rows = [
        (1, 1, ts(1)), (2, 1, ts(9)), (3, 1, ts(16)),
        (4, 2, ts(3)), (5, 2, ts(17)),
        (6, 3, ts(10)), (7, 3, ts(10, 13)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp"
    ).withColumn("event_type", F.lit("x")).withColumn(
        "value", F.lit(0.0)
    ).withColumn("props", F.lit("{}"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (str(r.cohort_week), r.week_offset): (
                r.n_active,
                r.retention_rate,
            )
            for r in events_cohort_retention(spark, d).collect()
        }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-01", 2)] == (2, 1.0)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert len(out) == 4


def test_triangle_count_known_graph(spark):
    from collection_templates_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4}: C(4,3)=4 triangles, each node in exactly 3.
    # Square {10,11,12,13}: zero triangles (nodes absent from output).
    # Edges given in mixed orientation with a duplicate to exercise the
    # normalize+distinct step.
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    square = [(10, 11), (11, 12), (13, 12), (10, 13), (11, 10)]
    edges = spark.createDataFrame(
        k4 + square + [(2, 1)], "src bigint, dst bigint"
    )
    out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_hub_graph(spark):
    from collection_templates_spark.operators.graph import triangle_count

    # star hub 0 with leaves 1..20 plus one leaf-leaf edge (1,2): the
    # only triangle is (0,1,2) — the degree orientation must not lose it
    # even though the hub's degree dwarfs everyone.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 21)] + [(1, 2)],
        "src bigint, dst bigint",
    )
    out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_hash_sampled_quantiles_full_sample_is_exact(spark):
    from collection_templates_spark.operators.sketches import (
        hash_sampled_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "k bigint, x double"
    )
    out = hash_sampled_quantiles(
        df, "x", F.col("k"), sample_mod=1
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r.est_q == r.exact_q
        assert r.abs_err == 0.0 and r.rel_err == 0.0
    med = {r.q: r.exact_q for r in out}[0.5]
    assert med == 50.5  # (n-1)*q interpolation on 1..100


def test_hash_sampled_quantiles_sampled_close(spark):
    from collection_templates_spark.operators.sketches import (
        hash_sampled_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(i % 1000)) for i in range(1, 5001)], "k bigint, x double"
    )
    out = {
        r.q: r for r in hash_sampled_quantiles(
            df, "x", F.col("k"), sample_mod=8
        ).collect()
    }
    # deterministic: rerun is bit-identical
    out2 = {
        r.q: r for r in hash_sampled_quantiles(
            df, "x", F.col("k"), sample_mod=8
        ).collect()
    }
    assert {q: (r.est_q, r.exact_q) for q, r in out.items()} == {
        q: (r.est_q, r.exact_q) for q, r in out2.items()
    }
    # ~uniform values: the 1/8 hash sample tracks within a loose band
    for q, r in out.items():
        assert r.abs_err <= 100, (q, r)
