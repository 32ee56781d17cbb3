"""Property tests for the round-13 operators: algebraic identities and
randomized equivalence against brute-force Python references."""

import math
import random

from pyspark.sql import functions as F

from collection_templates_spark.operators.sketches import (
    DD_ALPHA,
    ddsketch_bins,
    ddsketch_merge,
    ddsketch_quantiles,
)


def _values_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_ddsketch_merge_equals_single_pass(spark):
    """merge(bins(shard_1), …, bins(shard_k)) == bins(whole), exactly —
    the summary is a row-local binning, so the merged histogram is the
    single-pass histogram bin-for-bin (the hll_merge max-register
    argument, for order statistics)."""
    rng = random.Random(131)
    vals = [rng.lognormvariate(2.0, 1.5) for _ in range(4000)]
    whole = _values_df(spark, vals)
    k = 5
    shards = [
        _values_df(spark, vals[i::k]) for i in range(k)
    ]  # arbitrary interleaved sharding
    single = {
        r.bin: r.cnt
        for r in ddsketch_bins(whole, "v").collect()
    }
    merged = {
        r.bin: r.cnt
        for r in ddsketch_merge(
            *[ddsketch_bins(s, "v") for s in shards]
        ).collect()
    }
    assert merged == single


def test_ddsketch_relative_error_bound(spark):
    """Every estimate is within alpha relative error of the true order
    statistic at rank floor(q*(n-1))+1 — the DDSketch guarantee, which
    is deterministic (no failure probability, unlike KLL)."""
    rng = random.Random(137)
    vals = sorted(rng.expovariate(0.01) + 0.01 for _ in range(3000))
    df = _values_df(spark, vals)
    n = len(vals)
    for q_row in ddsketch_quantiles(
        ddsketch_bins(df, "v"), (0.1, 0.5, 0.9, 0.99)
    ).collect():
        exact = vals[int(math.floor(q_row.q * (n - 1)))]
        # est_q is rounded 4dp; allow that rounding on top of alpha
        assert abs(q_row.est_q - exact) / exact <= DD_ALPHA + 1e-3, (
            q_row,
            exact,
        )


def test_ddsketch_bin_count_bounded(spark):
    """Summary size is O(log(max/min)/log(gamma)) regardless of row
    count — the reason the sketch exists at 100 TB."""
    rng = random.Random(139)
    vals = [rng.uniform(0.01, 1e6) for _ in range(20000)]
    n_bins = ddsketch_bins(_values_df(spark, vals), "v").count()
    gamma = (1 + DD_ALPHA) / (1 - DD_ALPHA)
    bound = math.log(1e6 / 0.01) / math.log(gamma) + 2
    assert n_bins <= bound


def test_ddsketch_zero_and_negative_sentinel(spark):
    """v <= 0 lands in the sentinel bin and reads back as exactly 0.0
    when it holds the target rank."""
    df = _values_df(spark, [0.0, -3.0, 0.0, 5.0])
    rows = ddsketch_quantiles(
        ddsketch_bins(df, "v"), (0.25,)
    ).collect()
    assert rows[0].est_q == 0.0
