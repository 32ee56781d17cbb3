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


def test_pagerank_dangling_restores_mass(spark):
    """Directed chain a→b→c: c is dangling. Simple variant leaks c's
    mass (total < 1); the redistribution variant conserves it (total ≈ 1
    up to rounding)."""
    from collection_templates_spark.operators.graph import pagerank

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    simple = {
        r["node"]: r["pagerank"] for r in pagerank(chain, 3).collect()
    }
    redis = {
        r["node"]: r["pagerank"]
        for r in pagerank(chain, 3, redistribute_dangling=True).collect()
    }
    assert sum(simple.values()) < 0.999
    assert abs(sum(redis.values()) - 1.0) < 1e-4
    # redistribution strictly raises every node's rank vs the leaky run
    for n in simple:
        assert redis[n] > simple[n], n


def test_hits_hand_computed_bipartite(spark):
    """Two customers → three suppliers: c1 links s1,s2; c2 links s2,s3.
    After one sweep: a(s2) ∝ 2, a(s1)=a(s3) ∝ 1 → normalized (1.0, 0.5);
    h(c1)=h(c2)=0.5+1.0 → both normalize to 1.0. Second sweep breaks the
    hub tie: both still sum the same authorities — stays symmetric.
    Suppliers have hub 0, customers authority 0 (bipartite zero sides)."""
    from collection_templates_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s2"), ("c2", "s3")],
        "src string, dst string",
    )
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, 2).collect()}
    assert out["s2"][1] == 1.0
    assert out["s1"][1] == out["s3"][1] == 0.5
    assert out["c1"][0] == out["c2"][0] == 1.0
    for s in ("s1", "s2", "s3"):
        assert out[s][0] == 0.0, s
    for c in ("c1", "c2"):
        assert out[c][1] == 0.0, c


def test_hits_asymmetric_hub_ranking(spark):
    """A hub pointing at MORE high-authority nodes must out-rank one
    pointing at fewer: c1→{s1,s2,s3}, c2→{s1}. All three suppliers'
    authority comes only from hubs; after normalization c1 > c2."""
    from collection_templates_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c1", "s3"), ("c2", "s1")],
        "src string, dst string",
    )
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, 2).collect()}
    assert out["c1"][0] == 1.0
    assert 0.0 < out["c2"][0] < 1.0
    # s1 has two in-links, s2/s3 one each
    assert out["s1"][1] == 1.0
    assert out["s2"][1] == out["s3"][1] < 1.0
