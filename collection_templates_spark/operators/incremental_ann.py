"""Incremental ANN against a persisted IVF index — the vector-side
sibling of ``operators/incremental_dedup``.

An evolving 100 TB embedding corpus cannot re-rank from scratch per
batch: the inverted-file state is persisted ONCE and every incoming
batch (queries to answer, or vectors to accept) touches O(batch +
probed lists), never the whole index:

    centroids = build_ivf_index(history, index_path)   # once / per-merge
    topk = ann_batch_against_index(spark, index_path, batch)
    append_to_ivf_index(new_vectors, index_path)       # accept a batch

Layout: ``centroids/`` is the (cluster, pos, v) coarse-quantizer table
(k × dim rows — readable by ANY engine, which is what makes the probe
fully oracle-replayable), and ``vectors/`` is the corpus PARTITIONED BY
``cluster`` on disk. The probe computes the distinct probed-cluster set
(bounded by ``n_clusters`` — configuration, not data) and pushes it as
a STATIC ``IN`` partition filter, so every unprobed cluster's files are
dropped at file-listing time — probe IO is ``n_probe/n_clusters`` of
the index, the inverted-list contract, with NO shuffle of the index
side (the scoring join broadcasts the batch). Pinned by a plan test on
the scan's PartitionFilters.

Determinism: identical to ``similarity.ivf_cosine_topk`` — the trainer
rounds every assignment cosine and centroid mean to 6dp with
lowest-cluster ties (see ``train_ivf_centroids``), probes sort by
(rounded sim DESC, cluster ASC), rankings by (sim DESC, id ASC). A
probe against the index therefore equals the direct
``ivf_cosine_topk(history, batch, centroids=...)`` run bit for bit
(pinned by tests/test_incremental_ann.py) and the DuckDB oracle replays
the whole chain.

``append_to_ivf_index`` assigns new vectors with the PERSISTED
centroids (the IVF accept path: lists grow, the quantizer is stable
between retrains) — an O(batch) partitioned append. Callers own id
uniqueness across appends, as with any append-only log.

Reference analogue: none (the reference has no vector surface); this is
the at-scale extension mirroring its delta philosophy
(airflow/dags/update_es.py:249-313 — process what changed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collection_templates_spark.operators.scratch import scratch_dir
from collection_templates_spark.operators.similarity import (
    _centroid_assign_udf,
    cosine,
    make_probe_udf,
    topk_per_query,
    train_ivf_centroids,
)


def scratch_ann_index_path() -> str:
    """Unique PID-owned scratch directory for an IVF index."""
    return scratch_dir("spark_ann_index_")


def _vectors_dir(index_path: str) -> str:
    """The LIVE vector-partition dir: the compaction pointer's target
    when one was published (operators/index_maintenance), else the
    legacy ``vectors/``."""
    import os

    from collection_templates_spark.operators.index_maintenance import (
        ANN_DEFAULT_LAYOUT,
        read_layout,
    )

    lay = read_layout(index_path, ANN_DEFAULT_LAYOUT)
    return os.path.join(index_path, lay["vectors"])


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    n_clusters: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Train the coarse quantizer on ``corpus`` and persist the full IVF
    state under ``index_path`` (see module docstring for the layout).
    Returns the trained centroid matrix."""
    spark = corpus.sparkSession
    # a rebuild retires any compaction-published layout (and its
    # versioned dirs) — the fresh base is the legacy vectors/ dir
    import shutil

    from collection_templates_spark.operators.index_maintenance import (
        clear_layout,
        clear_tombstones,
    )

    import os as _os

    clear_tombstones(index_path)
    if _os.path.isdir(index_path):
        for name in _os.listdir(index_path):
            if name.startswith("vectors_v"):
                shutil.rmtree(
                    _os.path.join(index_path, name), ignore_errors=True
                )
    clear_layout(index_path)
    centroids = train_ivf_centroids(
        corpus, n_clusters, iterations, vec_col=vec_col, id_col=id_col
    )
    cent_rows = [
        (int(c), int(p), float(v))
        for c, row in enumerate(centroids)
        for p, v in enumerate(row)
    ]
    spark.createDataFrame(
        cent_rows, "cluster int, pos int, v double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
    assign = _centroid_assign_udf(centroids)
    (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_path}/vectors")
    )
    return centroids


def load_centroids(spark: SparkSession, index_path: str) -> "np.ndarray":
    """The persisted (k × dim) coarse quantizer — bounded driver state
    (same audited-collect class as the trainer memos)."""
    rows = spark.read.parquet(f"{index_path}/centroids").collect()
    k = max(r["cluster"] for r in rows) + 1
    dim = max(r["pos"] for r in rows) + 1
    cents = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        cents[r["cluster"], r["pos"]] = r["v"]
    return cents


def append_to_ivf_index(
    batch: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Accept a vector batch into the index: assign with the PERSISTED
    centroids, append into the cluster partitions — O(batch)."""
    spark = batch.sparkSession
    assign = _centroid_assign_udf(load_centroids(spark, index_path))
    (
        batch.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(_vectors_dir(index_path))
    )


def delete_from_ivf_index(
    spark: SparkSession,
    index_path: str,
    vec_ids,
) -> None:
    """Retract vectors from the persisted IVF index: an O(delete-batch)
    tombstone append — the inverted lists are not rewritten, probes
    mask the deleted ids, and the next ``compact_ivf_index`` folds
    them out of the cluster partitions for good. ``vec_ids`` is a
    one-column DataFrame or a list of ids. Idempotent. The coarse
    quantizer is untouched (the IVF contract: lists shrink, the
    quantizer is stable between retrains)."""
    from collection_templates_spark.operators.index_maintenance import (
        append_tombstones,
    )

    append_tombstones(spark, index_path, vec_ids, "vec_id")


def ann_batch_against_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors of every batch vector against the
    persisted index: (query_id, neighbor_id, rank, sim). The batch side
    is exploded to (query, probed cluster) and BROADCAST; the index scan
    keeps only probed clusters via a static partition-filter pushdown
    (see module docstring)."""
    cents = load_centroids(spark, index_path)
    probe = make_probe_udf(cents, n_probe)
    # materialize the (batch × n_probe)-row probe frame once: it feeds
    # both the probed-cluster set below and the scoring join
    q = batch.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe(F.col(vec_col))).alias("cluster"),
    ).localCheckpoint(eager=True)
    # STATIC partition pruning: the distinct probed-cluster set is
    # bounded by n_clusters (configuration, not data — the audited-
    # collect class), and an IN literal on the partition column prunes
    # unprobed lists at file-listing time with no optimizer heuristics
    # involved (Spark's dynamic pruning declines this join: the probe
    # side has no "selective" predicate). Pinned by a plan test on
    # PartitionFilters.
    probed = sorted(
        r["cluster"] for r in q.select("cluster").distinct().collect()
    )
    vecs = spark.read.parquet(_vectors_dir(index_path)).filter(
        F.col("cluster").isin(probed)
    )
    # tombstone mask (delete_from_ivf_index): broadcast anti-join after
    # the partition filter, so pruning still drops unprobed lists at
    # file-listing time and only surviving vectors are scored
    from collection_templates_spark.operators.index_maintenance import (
        read_tombstones,
    )

    tomb = read_tombstones(spark, index_path, "vec_id")
    if tomb is not None:
        vecs = vecs.join(F.broadcast(tomb), "vec_id", "left_anti")
    sim = F.round(cosine(F.col("query_vec"), F.col("embedding")), 6)
    scored = (
        vecs.join(F.broadcast(q), "cluster")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim", sim)
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    return topk_per_query(scored, k).select(
        "query_id", "neighbor_id", "rank", "sim"
    )
