"""Table profiling: one-pass per-column data-quality summary.

The audit every ingestion pipeline runs before trusting a new source
(the reference validates incoming dumps field-by-field —
airflow/dags/create_inlets.py's per-field filters and
supplemental/collection-templates-related/update_templates.py's doc
validation are the per-column trust checks this generalizes): null
counts, exact distinct cardinality, numeric ranges, string length
ranges — one row per column.

Determinism: every statistic is an integer count or a native-type
min/max cast to double at the end — no floating accumulation at all.

Scale shape: ONE aggregate over the table computes every column's
statistics (k columns → ~4k agg expressions in a single
map-side-combined pass; the k exact count_distincts expand the input
k-way, the one genuinely multi-pass-shaped cost — at 100 TB swap
``exact_distinct=False`` to use approx_count_distinct (HLL, no
expand) with the identical plan otherwise; the exact form is the
oracle-checkable semantics). The single result row is exploded into
k output rows driver-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Per-column profile: (col_name, dtype, n_rows, n_null,
    n_distinct, min_num, max_num, min_len, max_len).

    min/max_num are populated for numeric and decimal columns (cast to
    double), min/max_len for string columns; both NULL otherwise.
    n_distinct counts non-null distinct values (exact by default, HLL
    when ``exact_distinct`` is False).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    cols = df.dtypes
    for c, t in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn")
        )
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"{c}__nd")
            )
        if t in _NUMERIC or t.startswith("decimal"):
            aggs.append(
                F.min(F.col(c)).cast("double").alias(f"{c}__mn")
            )
            aggs.append(
                F.max(F.col(c)).cast("double").alias(f"{c}__mx")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
        if t == "string":
            aggs.append(
                F.min(F.length(F.col(c)))
                .cast("long")
                .alias(f"{c}__ln")
            )
            aggs.append(
                F.max(F.length(F.col(c)))
                .cast("long")
                .alias(f"{c}__lx")
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{c}__ln"))
            aggs.append(F.lit(None).cast("long").alias(f"{c}__lx"))
    one = df.groupBy().agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(t).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            F.col(f"{c}__ln").alias("min_len"),
            F.col(f"{c}__lx").alias("max_len"),
        )
        for c, t in cols
    ]
    return one.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew diagnostics: the pre-flight check before
    keying a 100 TB shuffle on a column — per-key count distribution
    (max, p50/p90/p99, top-1 share). A top1_share near 1/partitions
    means one reducer owns the key; the fix (salting, AQE skew join)
    is chosen from exactly these numbers.

    Determinism: counts are integers; percentiles over the per-key
    count table are exact interpolated (percentile ≡ quantile_cont)
    rounded 6dp; top1_share is one exact-integer division rounded 6dp.

    Scale shape: one map-side-combined groupBy(key) (the count table —
    one row per key), one single-row reduce over it. NULL keys are
    counted as their own class (they all land in one shuffle
    partition — exactly the skew the report exists to catch).
    Output one row: (n_rows, n_keys, max_count, top1_share,
    p50_count, p90_count, p99_count).
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = counts.groupBy().agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_count"),
        F.round(F.percentile(F.col("n"), F.lit(0.5)), 6).alias(
            "p50_count"
        ),
        F.round(F.percentile(F.col("n"), F.lit(0.9)), 6).alias(
            "p90_count"
        ),
        F.round(F.percentile(F.col("n"), F.lit(0.99)), 6).alias(
            "p99_count"
        ),
    )
    return m.select(
        "n_rows",
        "n_keys",
        "max_count",
        F.round(
            F.col("max_count").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("top1_share"),
        "p50_count",
        "p90_count",
        "p99_count",
    )
