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
