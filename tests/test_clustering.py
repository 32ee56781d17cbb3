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
