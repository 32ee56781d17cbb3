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
