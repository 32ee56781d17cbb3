"""Incremental ANN vs persisted IVF index (operators/incremental_ann):
probe ≡ direct ivf_cosine_topk with the same centroids, O(batch) append
round-trip, persisted-quantizer fidelity, and the static-partition-
filter plan shape that makes probe IO proportional to probed lists."""

import pytest
import contextlib
import io

from pyspark.sql import functions as F

from collection_templates_spark.operators.incremental_ann import (
    ann_batch_against_index,
    append_to_ivf_index,
    build_ivf_index,
    load_centroids,
)
from collection_templates_spark.operators.similarity import ivf_cosine_topk


def _vectors(spark, n, dim=8, offset=0):
    # deterministic, mildly clustered: vector i leans toward axis i % dim
    rows = []
    for i in range(n):
        v = [0.1 * ((i + j) % 5) for j in range(dim)]
        v[i % dim] += 2.0
        rows.append((i + offset, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_index_probe_equals_direct_ivf(spark, tmp_path):
    path = str(tmp_path / "ivf")
    history = _vectors(spark, 32)
    batch = _vectors(spark, 6, offset=100)
    cents = build_ivf_index(history, path, n_clusters=4, iterations=2)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in ann_batch_against_index(
            spark, path, batch, k=3, n_probe=2
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in ivf_cosine_topk(
            history, batch, k=3, n_probe=2, centroids=cents
        ).collect()
    }
    assert got == want and len(got) == 18


@pytest.mark.slow
def test_load_centroids_round_trip(spark, tmp_path):
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(
        _vectors(spark, 16), path, n_clusters=4, iterations=2
    )
    assert (load_centroids(spark, path) == cents).all()


def test_append_then_probe_finds_new_vector(spark, tmp_path):
    path = str(tmp_path / "ivf")
    build_ivf_index(_vectors(spark, 32), path, n_clusters=4, iterations=2)
    # appended vector 200 is an exact copy of future query 300's vector
    probe_vec = [0.0] * 7 + [3.0]
    new = spark.createDataFrame(
        [(200, probe_vec)], "vec_id long, embedding array<float>"
    )
    append_to_ivf_index(new, path)
    batch = spark.createDataFrame(
        [(300, probe_vec)], "vec_id long, embedding array<float>"
    )
    top = ann_batch_against_index(spark, path, batch, k=1, n_probe=2).collect()
    assert top[0].neighbor_id == 200 and top[0].sim == 1.0


@pytest.mark.slow
def test_probe_scan_prunes_unprobed_partitions(spark, tmp_path):
    # the probed-cluster set must reach the vectors scan as a partition
    # filter — that is the O(probed lists) IO contract
    path = str(tmp_path / "ivf")
    build_ivf_index(_vectors(spark, 32), path, n_clusters=4, iterations=2)
    batch = _vectors(spark, 2, offset=100)
    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        ann_batch_against_index(spark, path, batch, k=3, n_probe=2).explain(
            "formatted"
        )
    p = plan_buf.getvalue()
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cluster" in ln and " IN " in ln for ln in pf), p


@pytest.mark.slow
def test_two_appends_accumulate(spark, tmp_path):
    path = str(tmp_path / "ivf")
    build_ivf_index(_vectors(spark, 16), path, n_clusters=4, iterations=2)
    probe_vec = [0.0] * 7 + [3.0]
    for vid in (201, 202):
        append_to_ivf_index(
            spark.createDataFrame(
                [(vid, probe_vec)], "vec_id long, embedding array<float>"
            ),
            path,
        )
    batch = spark.createDataFrame(
        [(300, probe_vec)], "vec_id long, embedding array<float>"
    )
    top = ann_batch_against_index(spark, path, batch, k=2, n_probe=2).collect()
    assert {r.neighbor_id for r in top} == {201, 202}  # both appends live
