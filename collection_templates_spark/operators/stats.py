"""Robust numeric statistics: per-group winsorization (percentile
clipping) audit.

The pre-training-metrics hygiene pass every large numeric column gets:
clamp values at per-group low/high percentiles so a handful of
outliers can't dominate means (document lengths, scores, prices...).
``winsorize_stats`` surfaces the audit a pipeline runs BEFORE wiring
the clamp in: the cut values, how many rows each side clips, and the
mean before/after.

Determinism: cut values are exact (n−1)·q-interpolated percentiles
(Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — the
sketch_quantile_errors-pinned shared convention), rounded to 6dp BEFORE
any comparison/clamp so a last-ulp interpolation difference between
engines can never flip a row's below/above classification; means
rounded to 4dp (the repo-wide avg convention).

Scale shape: two passes over the data — one exact-percentile aggregate
per group (a sort-based agg; at 100 TB swap in ``approx_percentile``
with the same plan, this exact form is the oracle-checkable semantics)
and one clamp+mean aggregate with the tiny per-group cut table
broadcast back. No window, no driver-side data.

The reference clamps constants, not percentiles
(airflow/dags/../factory rank clamps, SURVEY §2.7 F6); this is the
at-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization audit: (grp, cut_lo, cut_hi, n_below,
    n_above, mean_raw, mean_winsorized). NULL values are dropped."""
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("grp"), v.alias("v")
    )
    cuts = base.groupBy("grp").agg(
        F.round(F.percentile(F.col("v"), F.lit(float(p_lo))), 6).alias(
            "cut_lo"
        ),
        F.round(F.percentile(F.col("v"), F.lit(float(p_hi))), 6).alias(
            "cut_hi"
        ),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("cut_lo")), F.col("cut_hi"))
    return (
        base.join(F.broadcast(cuts), "grp")
        .groupBy("grp")
        .agg(
            F.min("cut_lo").alias("cut_lo"),
            F.min("cut_hi").alias("cut_hi"),
            F.sum((F.col("v") < F.col("cut_lo")).cast("long")).alias(
                "n_below"
            ),
            F.sum((F.col("v") > F.col("cut_hi")).cast("long")).alias(
                "n_above"
            ),
            F.round(F.avg("v"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact per-group weighted median: the smallest value whose
    cumulative weight reaches half the group's total (the lower
    weighted median — deterministic, no interpolation, so engines can
    never disagree on a midpoint). The estimator ``percentile`` can't
    express (it has no weight argument) and the one a corpus needs the
    moment rows carry multiplicities — dedup counts, token counts,
    sampling weights.

    Plan: ONE shuffle — the per-group cumulative-sum window over
    (value, tie_cols) order — plus a map-side-combined total; the
    crossing pick is a filter + min-aggregate, no second sort. NULL
    values/weights and non-positive weights are dropped.

    Output: (grp, w_total, w_median) with w_total rounded to 6dp and
    the median a raw value from the data (exact pass-through).
    """
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    base = df.filter(
        v.isNotNull() & w.isNotNull() & (w > 0)
    ).select(
        F.col(group_col).alias("grp"),
        v.alias("v"),
        w.alias("w"),
        *[F.col(c) for c in tie_cols],
    )
    win = (
        Window.partitionBy("grp")
        .orderBy(F.col("v").asc(), *[F.col(c).asc() for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("grp")
    cum = base.withColumn("___cw", F.round(F.sum("w").over(win), 6)).withColumn(
        "___tw", F.round(F.sum("w").over(tot), 6)
    )
    crossed = cum.filter(
        F.col("___cw") >= F.col("___tw") / F.lit(2.0)
    )
    return crossed.groupBy("grp").agg(
        F.min("___tw").alias("w_total"),
        F.min("v").alias("w_median"),
    )
