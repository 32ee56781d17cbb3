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

from pyspark.sql import DataFrame
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
