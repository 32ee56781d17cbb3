"""Property tests for the round-11 operators: algebraic identities and
randomized equivalence against brute-force Python references — the
invariants that hold for ANY input, complementing test_round11_ops'
hand-computed fixtures."""

import datetime
import random

from pyspark.sql import functions as F

from collection_templates_spark.operators.graph import (
    degree_assortativity,
)
from collection_templates_spark.operators.stats import (
    gini_concentration,
    ks_test_2sample,
    mann_whitney_u,
)
from collection_templates_spark.operators.temporal import (
    cusum_changepoint,
    ewma_smoothing,
    merge_intervals,
)
from collection_templates_spark.operators.text_analysis import char_entropy


def test_mann_whitney_group_swap_antisymmetry(spark):
    rng = random.Random(11)
    rows = [("a", float(rng.randint(0, 20))) for _ in range(40)] + [
        ("b", float(rng.randint(5, 25))) for _ in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    ab = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    ba = mann_whitney_u(df, "g", "v", "b", "a").collect()[0]
    # U_a + U_b = n_a * n_b, and z flips sign exactly
    assert ab.u_a + ba.u_a == ab.n_a * ab.n_b
    assert ab.z == -ba.z


def test_ks_symmetry_and_bounds(spark):
    rng = random.Random(13)
    rows = [("a", float(rng.randint(0, 30))) for _ in range(50)] + [
        ("b", float(rng.randint(10, 40))) for _ in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    ab = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    ba = ks_test_2sample(df, "g", "v", "b", "a").collect()[0]
    assert ab.ks_d == ba.ks_d  # |F_a - F_b| is symmetric
    assert 0.0 <= ab.ks_d <= 1.0


def test_gini_scale_and_permutation_invariance(spark):
    rng = random.Random(17)
    vals = [(k, float(rng.randint(1, 500))) for k in range(60)]
    df1 = spark.createDataFrame(vals, "k long, v double")
    df2 = spark.createDataFrame(
        [(k, v * 4.0) for k, v in vals], "k long, v double"
    )
    g1 = gini_concentration(df1, "k", "v").collect()[0]
    g2 = gini_concentration(df2, "k", "v").collect()[0]
    assert g1.gini == g2.gini  # scale-free
    assert g1.top_decile_share == g2.top_decile_share
    assert 0.0 <= g1.gini < 1.0


def test_cusum_translation_invariance(spark):
    rng = random.Random(19)
    vals = [float(rng.randint(0, 100)) for _ in range(30)]
    rows1 = [("g", i, v) for i, v in enumerate(vals)]
    rows2 = [("g", i, v + 1000.0) for i, v in enumerate(vals)]
    a = cusum_changepoint(
        spark.createDataFrame(rows1, "grp string, t int, v double"),
        "grp", "t", "v",
    ).collect()[0]
    b = cusum_changepoint(
        spark.createDataFrame(rows2, "grp string, t int, v double"),
        "grp", "t", "v",
    ).collect()[0]
    # adding a constant shifts the mean, not the deviations
    assert a.cp_t == b.cp_t and a.cp_s_abs == b.cp_s_abs


def test_ewma_bounded_by_series_extremes(spark):
    rng = random.Random(23)
    rows = [
        ("g", i, float(rng.randint(-50, 50)) / 4) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = ewma_smoothing(df, "grp", "t", "v").collect()
    lo = min(r.v for r in out)
    hi = max(r.v for r in out)
    assert all(lo - 1e-4 <= r.ewma <= hi + 1e-4 for r in out)
    # first smoothed value IS the first observation
    assert next(r for r in out if r.rn == 1).ewma == round(
        next(r for r in out if r.rn == 1).v, 4
    )


def test_merge_intervals_matches_python_reference(spark):
    rng = random.Random(29)
    rows = []
    for k in ("u", "v", "w"):
        for _ in range(50):
            s = rng.randint(0, 1000)
            rows.append((k, s, s + rng.randint(1, 80)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {}
    for r in merge_intervals(df, "k", "s", "e").collect():
        got.setdefault(r.key, []).append(
            (r.island_start, r.island_end, r.n_source_intervals)
        )
    for k in got:
        got[k].sort()
    expect = {}
    for k in ("u", "v", "w"):
        ivs = sorted((s, e) for kk, s, e in rows if kk == k)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:  # touching merges
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        expect[k] = [tuple(m) for m in merged]
    assert got == expect


def test_entropy_bounds_and_uniform_max(spark):
    import math

    rng = random.Random(31)
    docs = [(i, "".join(rng.choice("abcdefgh") for _ in range(200)))
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in char_entropy(df).collect():
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_distinct) + 1e-6


def test_assortativity_regular_graph_is_null(spark):
    # a 4-cycle: every endpoint degree 2 -> zero degree variance ->
    # the coefficient is undefined and must be NULL, not a crash
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = degree_assortativity(df).collect()[0]
    assert r.assortativity is None
    assert (r.n_nodes, r.n_edges) == (4, 4)


def test_wedge_rewrites_match_brute_force(spark):
    # r15: the wedge self-joins in triangle_count /
    # link_prediction_jaccard became sorted-adjacency bucket-collect
    # enumeration (posexplode + slice-explode) and assortativity's
    # Σ(j+k)/Σ(j²+k²)/M became degree moments with a single-join Σjk —
    # pin all three against a brute-force Python reference on a random
    # multigraph-free graph (dupes + self-loop-free by construction)
    from itertools import combinations

    from collection_templates_spark.operators.graph import (
        link_prediction_jaccard,
        triangle_count,
    )

    rng = random.Random(17)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(90)
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    # triangles per node, brute: iterate unordered triples once
    tri = {}
    for a, b, c in combinations(nodes, 3):
        if b in adj.get(a, ()) and c in adj.get(a, ()) and c in adj.get(b, ()):
            for n in (a, b, c):
                tri[n] = tri.get(n, 0) + 1
    got_tri = {
        r.node: r.n_triangles for r in triangle_count(df).collect()
    }
    assert got_tri == tri

    # link prediction, brute: non-adjacent pairs sharing >=1 neighbor
    deg = {n: len(s) for n, s in adj.items()}
    cn = {}
    for c in nodes:
        for a, b in combinations(sorted(adj.get(c, ())), 2):
            cn[(a, b)] = cn.get((a, b), 0) + 1
    scored = [
        (
            round(k / (deg[a] + deg[b] - k), 6),
            k,
            a,
            b,
        )
        for (a, b), k in cn.items()
        if b not in adj[a]
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    expect = [
        (a, b, k, j) for (j, k, a, b) in scored[:10]
    ]
    got = [
        (r.a, r.b, r.cn, r.jaccard)
        for r in link_prediction_jaccard(df, max_center_degree=64, k=10).collect()
    ]
    assert got == expect

    # assortativity, brute (two-orientation Pearson of endpoint degrees)
    m = len(edges)
    s_jk = sum(deg[a] * deg[b] for a, b in edges)
    s_sum = sum(deg[a] + deg[b] for a, b in edges)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    mean_term = s_sum / (2.0 * m)
    num = s_jk / m - mean_term * mean_term
    den = s_sq / (2.0 * m) - mean_term * mean_term
    r = degree_assortativity(df).collect()[0]
    assert (r.n_nodes, r.n_edges) == (len(adj), m)
    assert abs(r.assortativity - round(num / den, 6)) <= 1e-9
