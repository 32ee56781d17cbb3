"""Temporal joins Spark lacks as built-ins: as-of join and banded range join.

The reference has neither (all its joins are string equi-joins, SURVEY
§2.3), but any event-log/training-data pipeline needs them. Both are
implemented as compositions of built-in operators with scale-correct
shuffles — no broadcast-nested-loop, no theta join:

- ``as_of_join``: the sort-merge trick — union both streams tagged, one
  window pass per key carries the latest right-side row forward. Cost: one
  shuffle of (left + right) on the key, one sort. This is how kdb/Flink
  do it, re-expressed in DataFrame ops.
- ``range_join_binned``: the band-join trick — right rows land in
  fixed-width time bins, left rows explode to the bins their window
  overlaps, the join is an equi-join on (key, bin) and the exact predicate
  filters inside the bucket. Cost: |right| + |left|·(window/bin + 1) rows
  shuffled on uniform keys, vs |left|·|right| for the naive theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest right row with
    right_time <= left_time for the same key (backward as-of; null when no
    prior right row exists).

    Ties at identical timestamps resolve right-before-left (the right row
    IS visible to a left row with the same timestamp). Multiple right rows
    sharing the same (key, right_time) resolve deterministically to the
    greatest (right_time, *right_value_cols) tuple: the carry window orders
    by the right-row struct itself, giving a total order without needing a
    caller-supplied tie-break column.
    """
    lt = F.col(left_time)
    tagged_l = left.select(
        F.col(on).alias("___k"),
        lt.alias("___t"),
        F.lit(1).alias("___side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("___lrow"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{dict(right.dtypes)[c]}"
                for c in ((right_time,) + tuple(right_value_cols))
            )
            + ">"
        )
        .alias("___rrow"),
    )
    tagged_r = right.select(
        F.col(on).alias("___k"),
        F.col(right_time).alias("___t"),
        F.lit(0).alias("___side"),
        F.lit(None).cast(tagged_l.schema["___lrow"].dataType.simpleString()).alias(
            "___lrow"
        ),
        F.struct(
            *[F.col(c) for c in ((right_time,) + tuple(right_value_cols))]
        ).alias("___rrow"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # ___rrow as the final sort key totally orders right rows that share a
    # timestamp (struct comparison is field-wise); left rows all carry null
    # there and only read, so their relative order is irrelevant.
    w = (
        Window.partitionBy("___k")
        .orderBy("___t", "___side", "___rrow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "___last_r", F.last("___rrow", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("___side") == 1).select(
        F.col("___lrow.*"),
        *[
            F.col(f"___last_r.{c}").alias(f"{c}{suffix}")
            for c in ((right_time,) + tuple(right_value_cols))
        ],
    )
    return out


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    bin_seconds: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with same key and
    left_time + lower <= right_time <= left_time + upper.

    Implemented as an equi-join on (key, time-bin): right rows map to their
    bin; left rows explode to every bin their window can overlap; the exact
    range predicate filters within buckets. Output columns: all left columns
    (prefixed l_) struct + all right columns (prefixed r_) struct to avoid
    collisions — callers select what they need.
    """
    if bin_seconds is None:
        bin_seconds = max(upper_seconds - lower_seconds, 1.0)
    # all arithmetic in integer microseconds: no fp boundary ambiguity
    bin_us = int(bin_seconds * 1_000_000)
    lower_us = int(lower_seconds * 1_000_000)
    upper_us = int(upper_seconds * 1_000_000)
    lus = F.unix_micros(F.col(left_time))
    rus = F.unix_micros(F.col(right_time))

    r = right.select(
        F.col(on).alias("___k"),
        F.floor(rus / bin_us).cast("long").alias("___bin"),
        F.struct(*[F.col(c) for c in right.columns]).alias("r"),
    )
    lo_bin = F.floor((lus + lower_us) / bin_us).cast("long")
    hi_bin = F.floor((lus + upper_us) / bin_us).cast("long")
    l = left.select(
        F.col(on).alias("___k"),
        F.explode(F.sequence(lo_bin, hi_bin)).alias("___bin"),
        F.struct(*[F.col(c) for c in left.columns]).alias("l"),
    )
    joined = l.join(r, ["___k", "___bin"])
    lt = F.unix_micros(F.col(f"l.{left_time}"))
    rt = F.unix_micros(F.col(f"r.{right_time}"))
    return joined.filter(
        (rt >= lt + F.lit(lower_us)) & (rt <= lt + F.lit(upper_us))
    ).select("l", "r")
