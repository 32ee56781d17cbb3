"""Connected components / canonical dedup clustering."""

from collection_templates_spark.operators.clustering import (
    connected_components,
    dedup_keep_canonical,
)


def test_connected_components_chain_and_cycle(spark):
    # chain 1-2-3-4 (transitive: 1~4 never scored), cycle 10-11-12-10,
    # isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "doc1 bigint, doc2 bigint",
    )
    cc = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_path_graph_converges_in_log_rounds(spark):
    """r4 verdict #2: a 50-edge chain needs 50 propagation-only rounds —
    past the default cap of 20, which used to return silently-unconverged
    labels. With pointer jumping it must converge (to cluster 0 for every
    node) well inside the default cap."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc1 bigint, doc2 bigint"
    )
    cc = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert cc == {i: 0 for i in range(51)}


def test_unconverged_raises_instead_of_truncating(spark):
    """Hitting max_iterations before the fixpoint must raise, never
    return wrong labels (a 64-edge chain cannot converge in 2 rounds)."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc1 bigint, doc2 bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=2)


def test_dedup_keep_canonical_with_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "doc1 bigint, doc2 bigint")
    out = {r.doc_id: (r.cluster, r.keep)
           for r in dedup_keep_canonical(docs, pairs).collect()}
    assert out == {
        0: (0, 1), 1: (1, 1), 2: (2, 1),
        3: (1, 0), 4: (4, 1), 5: (1, 0),
    }


def test_pagerank_hand_computed_and_conserving(spark):
    """3-node directed cycle → exactly uniform 1/3 at every sweep; a
    bidirectional star concentrates mass in the hub; with no dangling
    nodes total mass stays 1 per sweep (checked post-final-round)."""
    from pyspark.sql import functions as F

    from collection_templates_spark.operators.graph import pagerank

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r["node"]: r["pagerank"] for r in pagerank(cyc, 3).collect()}
    assert got == {"a": 0.333333, "b": 0.333333, "c": 0.333333}

    star_half = [("hub", x) for x in ("s1", "s2", "s3", "s4")]
    star = spark.createDataFrame(
        star_half + [(b, a) for a, b in star_half], "src string, dst string"
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank(star, 3).collect()}
    assert pr["hub"] > pr["s1"]
    assert abs(pr["s1"] - pr["s4"]) < 1e-9  # spokes symmetric
    assert abs(sum(pr.values()) - 1.0) < 1e-4  # mass conserved
