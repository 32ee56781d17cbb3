"""Data-quality checks: the expectations layer a training-data pipeline
runs before trusting a corpus drop.

Each check compiles to one aggregate expression; ``run_checks`` evaluates a
whole suite in a SINGLE pass over the table (one job, map-side combined)
and returns a tidy report frame (check, column, metric, ok). Referential
integrity is the only check needing a second table (anti-join count).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    column: str
    metric: float
    ok: bool


def null_ratio(df: DataFrame, col: str) -> F.Column:
    return (
        F.sum(F.col(col).isNull().cast("long")) / F.count("*")
    ).alias(f"null_ratio__{col}")


def run_checks(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    accepted_values: dict[str, tuple] | None = None,
    max_null_ratio: float = 0.0,
) -> DataFrame:
    """Evaluate all checks in one aggregation; returns
    (check, column, metric double, ok boolean) rows."""
    aggs = [F.count("*").alias("___n")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn__{c}"))
    for c in unique:
        aggs.append(F.countDistinct(c).alias(f"uq__{c}"))
        aggs.append(F.count(c).alias(f"cnt__{c}"))
    for c, vals in (accepted_values or {}).items():
        aggs.append(
            F.sum((~F.col(c).isin(*vals) & F.col(c).isNotNull()).cast("long")).alias(
                f"av__{c}"
            )
        )
    row = df.agg(*aggs).collect()[0]

    results: list[tuple[str, str, float, bool]] = []
    for c in not_null:
        ratio = (row[f"nn__{c}"] or 0) / max(row["___n"], 1)
        results.append(("not_null", c, float(ratio), ratio <= max_null_ratio))
    for c in unique:
        dupes = (row[f"cnt__{c}"] or 0) - (row[f"uq__{c}"] or 0)
        results.append(("unique", c, float(dupes), dupes == 0))
    for c in (accepted_values or {}):
        bad = row[f"av__{c}"] or 0
        results.append(("accepted_values", c, float(bad), bad == 0))

    spark = df.sparkSession
    return spark.createDataFrame(
        results, "check string, column string, metric double, ok boolean"
    )


def referential_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan count: child keys with no parent (anti-join)."""
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("k")).distinct(), "k", "left_anti"
        )
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [("referential_integrity", child_key, float(orphans), orphans == 0)],
        "check string, column string, metric double, ok boolean",
    )
