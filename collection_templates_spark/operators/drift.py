"""Distribution-drift monitoring: equi-width histograms + Jensen–Shannon
divergence between data splits.

The check a continuously-fed 100 TB corpus runs on every batch: has the
VALUE DISTRIBUTION of a signal (event values, doc lengths, quality
scores) moved between two slices (yesterday vs today, source A vs B)?
The standard monitor is a binned histogram per slice and a bounded
symmetric divergence between them — JS divergence (½KL(P‖M) + ½KL(Q‖M),
M = ½(P+Q)), which unlike raw KL is finite even when a bin is empty on
one side.

Everything is pure column arithmetic over ONE aggregate per slice:
bin ids are a clamped floor((v − lo)/width) (bounds are caller-pinned
literals, so the pass is one map + one map-side-combined groupBy —
no global min/max scan, no sort), per-bin probabilities are exact
integer-count ratios, and the per-bin JS contributions are rounded to
9dp before the per-group sum (the perplexity-family convention: makes
the ≤ n_bins-term summation replayable in any engine / any order) with
the final divergence rounded to 6dp.

Scale shape: the histogram is n_groups × n_splits × n_bins rows —
bounded by configuration, not data; the divergence join/aggregate runs
on that tiny frame. The one full-data pass is the binning groupBy
(map-side combined). Skewed group keys ride AQE; there is no window.

The reference has no numeric-drift surface (its snapshot diff is exact
row identity — airflow/dags/update_es.py); this is part of the at-scale
extension surface next to the sketch family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def binned_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split: Column,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """(group, split, bin, n) equi-width histogram counts. ``split`` is
    any string-typed column expression naming the slice a row belongs
    to. Out-of-range values clamp into the edge bins (deterministic —
    monitors must not crash on a stray outlier); NULL values are
    dropped. Bin arithmetic is double-precision floor((v − lo)/width),
    identical in any IEEE engine."""
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if hi <= lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    width = (hi - lo) / n_bins
    raw = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width)
    )
    bin_id = (
        F.greatest(F.lit(0).cast("long"), F.least(F.lit(n_bins - 1).cast("long"), raw))
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            split.alias("split"),
            bin_id.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def js_divergence(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split: Column,
    split_a: str,
    split_b: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Per-group Jensen–Shannon divergence (natural log) between the
    ``split_a`` and ``split_b`` value distributions, plus the slice
    sizes. Output: (grp, n_a, n_b, js_divergence); groups missing one
    side entirely are omitted (no distribution to compare). JS is
    bounded by ln 2 ≈ 0.6931; 0 ⇔ identical binned distributions.

    Determinism: per-bin contributions rounded to 9dp before the sum,
    total to 6dp; probability ratios are exact integer-count divisions
    evaluated in the same shape both engines (n/tot, p/m)."""
    hist = binned_counts(df, group_col, value_col, split, n_bins, lo, hi)
    tot = hist.groupBy("grp", "split").agg(F.sum("n").alias("tot"))
    h = hist.join(tot, ["grp", "split"])
    a = h.filter(F.col("split") == split_a).select(
        "grp",
        "bin",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
        F.col("tot").alias("n_a"),
    )
    b = h.filter(F.col("split") == split_b).select(
        "grp",
        "bin",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("q"),
        F.col("tot").alias("n_b"),
    )
    # full outer per (grp, bin): a bin empty on one side contributes
    # p·ln(p/m) with m = p/2 (the finite-JS property)
    j = a.join(b, ["grp", "bin"], "full_outer").select(
        "grp",
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
        "n_a",
        "n_b",
    )
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    term_p = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(
        F.lit(0.0)
    )
    term_q = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(
        F.lit(0.0)
    )
    contrib = F.round(F.lit(0.5) * term_p + F.lit(0.5) * term_q, 9)
    return (
        j.groupBy("grp")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.sum(contrib), 6).alias("js_divergence"),
        )
        .filter(F.col("n_a").isNotNull() & F.col("n_b").isNotNull())
        .select(
            "grp",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "js_divergence",
        )
    )


def welch_t_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split: Column,
    split_a: str,
    split_b: str,
) -> DataFrame:
    """Welch's unequal-variance t statistic per group between two
    slices — the parametric companion of :func:`js_divergence` (JS asks
    "did the distribution move?", Welch asks "did the MEAN move, and is
    the gap larger than the noise?"). Output per group: slice sizes,
    6dp means, the t statistic and the Welch–Satterthwaite degrees of
    freedom (both computed FROM the 6dp-rounded means/variances, so the
    arithmetic replays in any engine).

    Scale: one map-side-combined aggregate per (group, split) — count/
    mean/variance are the classic one-pass moments — then pure column
    arithmetic on the groups×2-row frame. No window, no join wider
    than groups×2."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        split.alias("split"),
        F.col(value_col).cast("double").alias("v"),
    )
    mom = base.groupBy("grp", "split").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("m"),
        F.round(F.var_samp("v"), 6).alias("s2"),
    )

    def side(tag: str) -> DataFrame:
        return mom.filter(F.col("split") == tag).select(
            "grp",
            F.col("n").alias(f"n_{tag}"),
            F.col("m").alias(f"mean_{tag}"),
            F.col("s2").alias(f"___v_{tag}"),
        )

    j = side(split_a).join(side(split_b), "grp")
    va = F.col(f"___v_{split_a}") / F.col(f"n_{split_a}").cast("double")
    vb = F.col(f"___v_{split_b}") / F.col(f"n_{split_b}").cast("double")
    t = (F.col(f"mean_{split_a}") - F.col(f"mean_{split_b}")) / F.sqrt(va + vb)
    dof = (va + vb) * (va + vb) / (
        va * va / (F.col(f"n_{split_a}").cast("double") - 1)
        + vb * vb / (F.col(f"n_{split_b}").cast("double") - 1)
    )
    return j.select(
        "grp",
        F.col(f"n_{split_a}").cast("long").alias("n_a"),
        F.col(f"n_{split_b}").cast("long").alias("n_b"),
        F.col(f"mean_{split_a}").alias("mean_a"),
        F.col(f"mean_{split_b}").alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 2).alias("welch_df"),
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split: Column,
    split_a: str,
    split_b: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Per-group Population Stability Index between the ``split_a``
    (expected) and ``split_b`` (actual) value distributions — the
    industry drift gate (PSI < 0.1 stable, > 0.25 shifted) and
    :func:`js_divergence`'s unbounded companion: PSI weights tail bins
    by the log-ratio, so a thin-bin shift JS barely sees moves PSI.

    Empty bins get additive smoothing p = (n + 1/2)/(tot + k/2) —
    PSI's ln(p/q) is infinite on a zero, and the deterministic
    +1/2-per-bin prior keeps the statistic finite and exact-integer
    derived (no epsilon constant whose magnitude the data scale would
    have to tune).

    Determinism: smoothed probabilities are exact-integer divisions;
    per-bin contributions (p−q)·ln(p/q) are rounded to 9dp and summed
    in DECIMAL(38,9) (order-independent), total rounded 6dp.

    Scale shape: identical to js_divergence — one binned groupBy, a
    per-group total join, one k-bin reduce per group. Output:
    (grp, n_a, n_b, psi).
    """
    hist = binned_counts(df, group_col, value_col, split, n_bins, lo, hi)
    return psi_from_histograms(
        hist.filter(F.col("split") == split_a).select("grp", "bin", "n"),
        hist.filter(F.col("split") == split_b).select("grp", "bin", "n"),
        n_bins,
    )


def psi_from_histograms(
    hist_a: DataFrame,
    hist_b: DataFrame,
    n_bins: int,
) -> DataFrame:
    """PSI from two pre-binned (grp, bin, n) histograms — the algebra
    :func:`psi_drift` runs after binning, exposed for callers that
    only HOLD histograms (the streaming drift monitor's persisted
    reference and cumulative state; histograms are the mergeable
    sufficient statistic, raw rows are not replayable). Identical
    smoothing/rounding, identical output: (grp, n_a, n_b, psi).
    """

    def side(h: DataFrame, p: str, n: str) -> DataFrame:
        tot = h.groupBy("grp").agg(F.sum("n").alias(n))
        return h.join(tot, "grp").select(
            "grp", "bin", F.col("n").alias(f"n_{p}"), n
        )

    j = side(hist_a, "pa", "n_a").join(
        side(hist_b, "pb", "n_b"), ["grp", "bin"], "full_outer"
    )
    # a group missing one side entirely has no distribution to compare
    j = j.withColumn(
        "na_g", F.max("n_a").over(Window.partitionBy("grp"))
    ).withColumn(
        "nb_g", F.max("n_b").over(Window.partitionBy("grp"))
    ).filter(F.col("na_g").isNotNull() & F.col("nb_g").isNotNull())
    k = F.lit(float(n_bins))
    p = (
        F.coalesce(F.col("n_pa"), F.lit(0)).cast("double")
        + F.lit(0.5)
    ) / (F.col("na_g").cast("double") + k / F.lit(2.0))
    q = (
        F.coalesce(F.col("n_pb"), F.lit(0)).cast("double")
        + F.lit(0.5)
    ) / (F.col("nb_g").cast("double") + k / F.lit(2.0))
    contrib = F.round((p - q) * F.log(p / q), 9).cast("decimal(38,9)")
    return (
        j.groupBy("grp")
        .agg(
            F.max("na_g").alias("n_a"),
            F.max("nb_g").alias("n_b"),
            (F.round(F.sum(contrib).cast("double"), 6) + F.lit(0.0))
            .alias("psi"),
        )
    )
