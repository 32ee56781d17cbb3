"""Privacy risk auditing: k-anonymity / l-diversity measurement.

Before a table with quasi-identifiers ships (to a vendor, a training
corpus, an analytics mart), the release pipeline measures re-
identification risk: how many rows sit in equivalence classes smaller
than k under the chosen quasi-identifier columns, and how diverse the
sensitive attribute is within each class. These are measurements (the
audit gate), not anonymizers — the pipeline generalizes/suppresses and
re-measures until the histogram clears policy.

Determinism: everything is integer counts over exact groupings — no
floating-point accumulation anywhere.

Scale shape: one groupBy over the QI tuple (the class table — at most
one row per distinct QI combination, usually ≪ rows), then a groupBy
over class sizes (tiny). The sensitive-diversity variant adds one
count_distinct per class riding the same exchange. No windows, no
broadcast, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_histogram(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Equivalence-class size histogram under ``qi_cols``: one row per
    distinct class size with (class_size, n_classes, n_rows) — the
    table is k-anonymous at level k iff no row has class_size < k.

    With ``sensitive_col``, adds min_l_diversity: the MINIMUM distinct
    sensitive-value count over classes of that size (distinct
    l-diversity; a class where everyone shares one diagnosis is
    l = 1 no matter how large it is).
    """
    qi = [F.col(c) for c in qi_cols]
    if sensitive_col is None:
        classes = df.groupBy(*qi).agg(
            F.count(F.lit(1)).alias("class_size")
        )
        return (
            classes.groupBy("class_size")
            .agg(F.count(F.lit(1)).alias("n_classes"))
            .select(
                "class_size",
                "n_classes",
                (F.col("class_size") * F.col("n_classes")).alias(
                    "n_rows"
                ),
            )
        )
    classes = df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("l_div"),
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            "min_l_diversity",
        )
    )
