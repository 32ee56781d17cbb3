"""Round-12 operators, each pinned by a hand-computed fixture here AND
an oracled bank row in plans/testdata_queries.py: Spearman rho, Kendall
tau-b, Theil–Sen slope, deterministic bootstrap CI."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.stats import (
    bootstrap_mean_ci,
    kendall_tau,
    spearman_rho,
)
from collection_templates_spark.operators.temporal import theil_sen_slope


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "x double, y double")


def test_spearman_perfect_monotone(spark):
    # any monotone transform scores rho = 1 (the whole point vs Pearson)
    rows = [(float(i), float(i**3)) for i in range(1, 9)]
    out = spearman_rho(_pairs(spark, rows), "x", "y").collect()[0]
    assert out.n == 8 and out.rho == 1.0
    rows = [(float(i), float(-(i**3))) for i in range(1, 9)]
    assert spearman_rho(_pairs(spark, rows), "x", "y").collect()[0].rho == -1.0


def test_spearman_ties_average_ranks(spark):
    # x = (1,2,2,4) -> ranks (1, 2.5, 2.5, 4); y = (1,3,2,4) -> (1,3,2,4)
    # Pearson on ranks: cov 4.5, var_x 4.5, var_y 5 -> 4.5/sqrt(22.5)
    rows = [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (4.0, 4.0)]
    out = spearman_rho(_pairs(spark, rows), "x", "y").collect()[0]
    assert out.rho == pytest.approx(4.5 / 22.5**0.5, abs=1e-6)


def test_kendall_hand_example(spark):
    # x = 1..4, y = (1,3,2,4): pairs C=5, D=1 -> tau = 4/6
    rows = [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)]
    out = kendall_tau(_pairs(spark, rows), "x", "y").collect()[0]
    assert (out.concordant, out.discordant) == (5, 1)
    assert out.tau_b == pytest.approx(4 / 6, abs=1e-6)


def test_kendall_tie_correction(spark):
    # x has a tie: n0=6, n1 (x-ties)=1, n2=0; C=5, D=0
    # tau_b = 5 / sqrt(5 * 6) ~ 0.912871
    rows = [(1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (4.0, 4.0)]
    out = kendall_tau(_pairs(spark, rows), "x", "y").collect()[0]
    assert out.tau_b == pytest.approx(5 / (5 * 6) ** 0.5, abs=1e-6)


def test_theil_sen_ignores_outlier(spark):
    import datetime

    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(21):
        v = 10.0 + 2.0 * i
        if i == 10:
            v = 500.0  # one wild day must not move the slope
        rows.append(("g", d0 + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "grp string, t date, v double")
    out = theil_sen_slope(df, "grp", "t", "v").collect()[0]
    assert out.n_days == 21
    assert out.slope == pytest.approx(2.0, abs=1e-6)
    assert out.intercept == pytest.approx(10.0, abs=1e-6)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    rows = [(i, float(100 + (i * 37) % 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out1 = bootstrap_mean_ci(df, "value", "event_id").collect()[0]
    out2 = bootstrap_mean_ci(df, "value", "event_id").collect()[0]
    assert out1 == out2  # pure function of (salt, ids, values)
    assert out1.n == 2000 and out1.b == 48
    assert out1.ci_lo <= out1.mean <= out1.ci_hi
    assert out1.q_lo <= out1.mean <= out1.q_hi
    # CI width is a plausible multiple of the analytic SE (sd/sqrt(n));
    # values span [100, 150) ~ sd 14.4 -> SE ~ 0.32
    width = out1.ci_hi - out1.ci_lo
    assert 0.05 < width < 5.0, out1


def test_bootstrap_ci_salt_changes_replicates_not_mean(spark):
    rows = [(i, float(i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    a = bootstrap_mean_ci(df, "value", "event_id", salt="a").collect()[0]
    b = bootstrap_mean_ci(df, "value", "event_id", salt="b").collect()[0]
    assert a.mean == b.mean
    assert (a.q_lo, a.q_hi) != (b.q_lo, b.q_hi)
