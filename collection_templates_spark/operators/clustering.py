"""Connected components over similarity pairs → duplicate clusters.

Near-dup detection (dedup.py) emits PAIRS; deduplication needs CLUSTERS
(every doc mapped to one canonical representative, transitively: if A~B and
B~C then A,B,C share a cluster even when A~C was never scored).

Algorithm: iterative min-label propagation (the standard large-graph CC —
each round every node takes the min label among itself and its neighbors;
converges in O(diameter) rounds). Each round is one join + one groupBy;
lineage is cut per round. Near-dup graphs have tiny diameters (clusters are
quasi-cliques), so 3-5 rounds typically suffice; the loop stops at the
fixpoint regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "doc1",
    right: str = "doc2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, cluster) with cluster = min node id in the component.

    ``pairs`` are undirected edges; isolated nodes absent from ``pairs``
    are simply not returned (callers left-join and coalesce to self).
    """
    edges = (
        pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
        .unionByName(
            pairs.select(F.col(right).alias("a"), F.col(left).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("___mb"))
        .select("node", F.least("node", "___mb").alias("cluster"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("cluster").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce("nmin", F.col("cluster"))).alias(
                    "new_cluster"
                ),
                "cluster",
            )
        )
        changed = updated.filter(F.col("new_cluster") < F.col("cluster"))
        if changed.isEmpty():
            break
        labels = updated.select(
            "node", F.col("new_cluster").alias("cluster")
        ).localCheckpoint(eager=True)
    return labels.select("node", "cluster")


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Docs annotated with cluster + keep flag (canonical = min id in its
    cluster; singletons keep themselves)."""
    cc = connected_components(pairs)
    out = docs.join(cc, docs[id_col] == cc.node, "left").drop("node")
    return out.withColumn(
        "cluster", F.coalesce("cluster", F.col(id_col))
    ).withColumn("keep", (F.col(id_col) == F.col("cluster")).cast("int"))
