"""Round-14 operator tests: the ADVICE.md fixes (Durbin-Watson exact
decimal products, power-iteration degenerate guards) plus the new
round-14 operators added as the round proceeds."""

from __future__ import annotations

import math

import pytest


def test_durbin_watson_scale12_products_exact(spark):
    """ADVICE r13 (medium): the DW sums must be exact DECIMAL(38,12) —
    the old (20,6)x(19,6) product crossed the 38-digit cap and
    allowPrecisionLoss silently shrank the scale to 10/11, rounding
    every term. This series' 6dp residuals (+-0.001667, 0.003333)
    square to values that NEED scale 12 (2.778889e-6, 1.1108889e-5):
    exact arithmetic gives DW = 5e-5 / 1.6666667e-5 = 3.0 on the nose,
    while the shrunken-scale sums gave 2.999999."""
    from collection_templates_spark.operators.stats import durbin_watson

    df = spark.createDataFrame(
        [(0, "0.00"), (1, "0.01"), (2, "0.01")],
        "t long, y string",
    ).selectExpr("t", "CAST(y AS DECIMAL(18,2)) AS y")
    row = durbin_watson(df, "y", "t").collect()[0]
    assert row["n"] == 3
    assert row["dw"] == pytest.approx(3.0, abs=0)  # exact, not 2.999999


def test_durbin_watson_zero_residuals_null_not_error(spark):
    """Exactly-linear 2dp data: every 6dp residual rounds to 0, so both
    DW sums are 0 and try_divide must yield NULL (not a crash)."""
    from collection_templates_spark.operators.stats import durbin_watson

    df = spark.createDataFrame(
        [(t, f"{1.0 + 2.0 * t:.2f}") for t in range(6)],
        "t long, y string",
    ).selectExpr("t", "CAST(y AS DECIMAL(18,2)) AS y")
    row = durbin_watson(df, "y", "t").collect()[0]
    assert row["dw"] is None


def test_power_iteration_empty_input_degrades(spark):
    from collection_templates_spark.operators.linalg import (
        power_iteration_top_component,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = power_iteration_top_component(df, "embedding", dim=4, iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "pos", "loading", "mean_x", "eigval", "explained_var",
    ]


def test_power_iteration_single_row_degrades(spark):
    from collection_templates_spark.operators.linalg import (
        power_iteration_top_component,
    )

    df = spark.createDataFrame(
        [(0, [0.5, -0.25, 0.125, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = power_iteration_top_component(df, "embedding", dim=4, iters=2)
    assert out.count() == 0


def test_pca_components_replica_and_structure(spark):
    """The 2-component deflation ladder replicated exactly in pure
    Python (ints + byte-equivalent rounding) must reproduce the
    distributed loadings bit-for-bit; on a cloud with two planted
    orthogonal directions the components must recover them in variance
    order, near-orthogonal, with a decreasing eigval / increasing
    cum_explained curve."""
    import math
    import random

    import numpy as np

    from collection_templates_spark.operators.linalg import (
        _MICRO,
        _round_half_up,
        power_iteration_components,
    )

    rng = random.Random(1414)
    dim, n = 12, 300
    vecs = []
    for _ in range(n):
        t1, t2 = rng.gauss(0, 1.0), rng.gauss(0, 1.0)
        row = [0.0] * dim
        for j in range(dim):
            base = 0.5 * t1 if j < 3 else (0.25 * t2 if j < 6 else 0.0)
            row[j] = float(np.float32(base + rng.gauss(0, 0.02) + 0.03))
        vecs.append(row)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = power_iteration_components(
        df, "embedding", dim=dim, iters=3, n_components=2
    ).collect()
    by_comp = {}
    for r in got:
        by_comp.setdefault(r.component, {})[r.pos] = r
    assert set(by_comp) == {0, 1}

    # ---- exact Python replica of the spec ----
    X = [
        [int(_round_half_up(float(np.float32(x)), 6) * _MICRO) for x in row]
        for row in vecs
    ]
    m = [
        int(_round_half_up(float(sum(r[j] for r in X)) / float(n), 0))
        for j in range(dim)
    ]
    C = [[r[j] - m[j] for j in range(dim)] for r in X]

    def rnd_micro(x):
        h = _MICRO // 2
        return (x + h) // _MICRO if x >= 0 else -((-x + h) // _MICRO)

    comps = []
    for _comp in range(2):
        v = [_MICRO // 8] * dim
        for _ in range(3):
            d = [
                rnd_micro(sum(c[j] * v[j] for j in range(dim))) for c in C
            ]
            w = [sum(d[i] * C[i][j] for i in range(n)) for j in range(dim)]
            wr = [_round_half_up(float(wj) / 1.0e12, 6) for wj in w]
            norm = math.sqrt(float(sum(r * r for r in wr)))
            v = [
                int(_round_half_up(float(r) / norm, 6) * _MICRO)
                for r in wr
            ]
        comps.append(v)
        # deflate by the found component
        d = [rnd_micro(sum(c[j] * v[j] for j in range(dim))) for c in C]
        C = [
            [C[i][j] - rnd_micro(d[i] * v[j]) for j in range(dim)]
            for i in range(n)
        ]

    for comp, v in enumerate(comps):
        for j in range(dim):
            assert by_comp[comp][j].loading == pytest.approx(
                v[j] / float(_MICRO), abs=0
            ), (comp, j)

    # structure: planted directions recovered in variance order
    l0 = [by_comp[0][j].loading for j in range(dim)]
    l1 = [by_comp[1][j].loading for j in range(dim)]
    assert sum(abs(x) for x in l0[:3]) > 0.9 * sum(abs(x) for x in l0)
    assert sum(abs(x) for x in l1[3:6]) > 0.9 * sum(abs(x) for x in l1)
    assert abs(sum(a * b for a, b in zip(l0, l1))) < 0.05
    e0, e1 = by_comp[0][0], by_comp[1][0]
    assert e0.eigval > e1.eigval > 0
    assert e0.cum_explained < e1.cum_explained <= 1.0 + 1e-6
    assert e1.cum_explained == pytest.approx(
        e0.explained_var + e1.explained_var, abs=2e-6
    )


def test_pca_components_constant_embeddings_null_then_stop(spark):
    from collection_templates_spark.operators.linalg import (
        power_iteration_components,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    rows = power_iteration_components(
        df, "embedding", dim=4, iters=2, n_components=3
    ).collect()
    # component 0 degenerates -> NULL rows, later components not run
    assert {r.component for r in rows} == {0}
    assert all(r.loading is None and r.eigval is None for r in rows)


def test_ar2_yule_walker_planted_process_and_replica(spark):
    """On a planted AR(2) process the Yule-Walker fit must recover the
    true coefficients; and an exact-decimal Python replica of the spec
    must reproduce the distributed phi/forecast bit-for-bit."""
    import random

    from collection_templates_spark.operators.linalg import _round_half_up
    from collection_templates_spark.operators.stats import ar2_yule_walker

    rng = random.Random(909)
    p1, p2 = 0.6, -0.3
    d_prev, d_prev2 = 0.0, 0.0
    ys = []
    for _t in range(400):
        e = rng.gauss(0, 1.0)
        d = p1 * d_prev + p2 * d_prev2 + e
        ys.append(round(100.0 + d, 2))
        d_prev2, d_prev = d_prev, d
    df = spark.createDataFrame(
        [("a", t, f"{y:.2f}") for t, y in enumerate(ys)],
        "g string, t long, y string",
    ).selectExpr("g", "t", "CAST(y AS DECIMAL(18,2)) AS y")
    row = ar2_yule_walker(df, "g", "t", "y").collect()[0]
    assert row["n"] == 400
    assert row["phi1"] == pytest.approx(p1, abs=0.15)
    assert row["phi2"] == pytest.approx(p2, abs=0.15)

    # ---- exact replica ----
    from decimal import Decimal

    n = len(ys)
    sy = sum(Decimal(f"{y:.2f}") for y in ys)
    ybar = float(sy) / float(n)
    d6 = [_round_half_up(y - ybar, 6) for y in ys]
    c0 = sum(a * a for a in d6)
    c1 = sum(d6[i] * d6[i - 1] for i in range(1, n))
    c2 = sum(d6[i] * d6[i - 2] for i in range(2, n))
    g0, g1, g2 = float(c0), float(c1), float(c2)
    den = g0 * g0 - g1 * g1
    phi1 = (g1 * (g0 - g2)) / den
    phi2 = (g0 * g2 - g1 * g1) / den
    fc = ybar + phi1 * float(d6[-1]) + phi2 * float(d6[-2])
    assert row["phi1"] == float(_round_half_up(phi1, 6))
    assert row["phi2"] == float(_round_half_up(phi2, 6))
    assert row["forecast_next"] == float(_round_half_up(fc, 2))


def test_ar2_yule_walker_degenerate_groups(spark):
    """1-row and constant groups degrade to NULL phis, never an error."""
    from collection_templates_spark.operators.stats import ar2_yule_walker

    rows = [("one", 0, "5.00")] + [
        ("const", t, "7.00") for t in range(10)
    ]
    df = spark.createDataFrame(
        rows, "g string, t long, y string"
    ).selectExpr("g", "t", "CAST(y AS DECIMAL(18,2)) AS y")
    got = {r["g"]: r for r in ar2_yule_walker(df, "g", "t", "y").collect()}
    assert got["one"]["phi1"] is None
    assert got["const"]["phi1"] is None  # c0 == 0 -> den == 0 -> NULL


def test_als_implicit_matches_exact_python_replica(spark):
    """The rank-2 implicit-ALS sweep chain replicated in pure Python
    (exact ints for every accumulation AND for the closed-form solve —
    r15: f = round_half_away(num·10¹²/det) in bignum, zero float
    steps) must reproduce the distributed factors bit-for-bit; and on
    a 2-block interaction matrix the learned factors must score
    observed (in-block) pairs above unobserved (cross-block) pairs."""
    from collection_templates_spark.operators.product_analytics import (
        ALS_ALPHA,
        ALS_LAMBDA_MICRO2,
        _round_div_half_away,
        als_implicit_rank2,
    )

    # 2-block matrix: users 0-9 buy items 100-109, users 10-19 buy
    # items 200-209, with per-pair counts varying deterministically
    rows = []
    for u in range(20):
        base = 100 if u < 10 else 200
        for j in range(10):
            if (u + j) % 3 != 0:
                rows.append((u, base + j, 1 + (u * 7 + j) % 4))
    inter = spark.createDataFrame(rows, "u long, it long, r long")
    users, items = als_implicit_rank2(inter)
    got_u = {r.fid: (r.f0u, r.f1u) for r in users.collect()}
    got_i = {r.fid: (r.f0u, r.f1u) for r in items.collect()}

    # ---- exact Python replica of the spec ----
    M = 1_000_000
    item_ids = sorted({it for _, it, _ in rows})
    user_ids = sorted({u for u, _, _ in rows})
    fac_i = {
        i: (100000 + (i % 17) * 50000, 50000 + (i % 13) * 50000)
        for i in item_ids
    }
    by_u = {}
    by_i = {}
    for u, it, r in rows:
        by_u.setdefault(u, []).append((it, r))
        by_i.setdefault(it, []).append((u, r))

    def solve(obs, fac):
        g00 = sum(f0 * f0 for f0, _ in fac.values())
        g01 = sum(f0 * f1 for f0, f1 in fac.values())
        g11 = sum(f1 * f1 for _, f1 in fac.values())
        out = {}
        for eid, lst in obs.items():
            s00 = sum(r * fac[o][0] * fac[o][0] for o, r in lst)
            s01 = sum(r * fac[o][0] * fac[o][1] for o, r in lst)
            s11 = sum(r * fac[o][1] * fac[o][1] for o, r in lst)
            b0 = sum((1 + ALS_ALPHA * r) * fac[o][0] for o, r in lst)
            b1 = sum((1 + ALS_ALPHA * r) * fac[o][1] for o, r in lst)
            a00 = g00 + ALS_ALPHA * s00 + ALS_LAMBDA_MICRO2
            a01 = g01 + ALS_ALPHA * s01
            a11 = g11 + ALS_ALPHA * s11 + ALS_LAMBDA_MICRO2
            det = a00 * a11 - a01 * a01
            out[eid] = (
                _round_div_half_away((a11 * b0 - a01 * b1) * M**2, det),
                _round_div_half_away((a00 * b1 - a01 * b0) * M**2, det),
            )
        return out

    fac_u = None
    for _ in range(2):
        fac_u = solve(by_u, fac_i)
        fac_i = solve(by_i, fac_u)
    assert got_u == fac_u
    assert got_i == fac_i

    # block structure: observed pairs outrank cross-block pairs
    def score(u, it):
        fu, fi = got_u[u], got_i[it]
        return fu[0] * fi[0] + fu[1] * fi[1]

    in_block = [score(u, it) for u, it, _ in rows]
    cross = [
        score(u, it)
        for u in user_ids
        for it in item_ids
        if (u < 10) != (it < 150)
    ]
    assert min(in_block) > max(cross)


def test_als_rank_eval_block_matrix(spark):
    """On the 2-block matrix with some pairs held out, the ALS ranking
    must place held-out IN-BLOCK items inside top-10 for every test
    user (block scores dominate) — hit_rate 1.0 and MRR consistent
    with the integer reciprocal-rank accumulation."""
    from collection_templates_spark.operators.product_analytics import (
        als_implicit_rank2,
        als_rank_eval,
    )

    rows = []
    for u in range(20):
        base = 100 if u < 10 else 200
        for j in range(10):
            rows.append((u, base + j, 1 + (u * 7 + j) % 4))
    inter = spark.createDataFrame(rows, "u long, it long, r long")
    train = inter.filter((inter.u + inter.it) % 5 != 0)
    test = inter.filter((inter.u + inter.it) % 5 == 0)
    uf, itf = als_implicit_rank2(train)
    m = als_rank_eval(uf, itf, train, test, k=10).collect()[0]
    assert m["n_users"] == test.select("u").distinct().count()
    assert m["hit_rate"] == 1.0  # every held-out item is in-block
    assert 0 < m["mrr"] <= 1.0
    assert m["hits_at_k"] >= m["n_hit_users"] == m["n_users"]


def test_power_iteration_constant_embeddings_null_rows(spark):
    """Zero-variance cloud: Cv == 0, the unit iterate is undefined —
    the operator emits per-dimension rows with NULL loading/eigval
    (the oracle's x/0 path), never a ZeroDivisionError."""
    from collection_templates_spark.operators.linalg import (
        power_iteration_top_component,
    )

    df = spark.createDataFrame(
        [(i, [0.5, -0.25, 0.125, 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    rows = (
        power_iteration_top_component(df, "embedding", dim=4, iters=2)
        .orderBy("pos")
        .collect()
    )
    assert len(rows) == 4
    assert all(r["loading"] is None for r in rows)
    assert all(r["eigval"] is None for r in rows)
    assert rows[0]["mean_x"] == pytest.approx(0.5)
    assert rows[3]["mean_x"] == pytest.approx(1.0)
