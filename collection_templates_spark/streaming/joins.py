"""Stream-stream interval join: the streaming counterpart of
``operators/temporal.range_join_binned``.

Two watermarked event streams joined on a key within an event-time band.
Spark buffers each side in state only as far as the watermark + band
requires, so state is bounded by (watermark + band) × arrival rate — the
standard funnel-analysis join (click → purchase within N minutes) running
continuously. Batch and streaming share semantics; the test asserts the
streaming result equals the batch banded range join on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_seconds: int = 0,
    upper_seconds: int = 300,
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """INNER join of two streams: same key, right_time within
    [left_time + lower, left_time + upper]. Columns are prefixed l_/r_.

    Both sides need watermarks for state cleanup; the band bounds how long
    a buffered row can still match, so state retires at
    watermark + upper_seconds.
    """
    l = left.select(
        F.col(on).alias("l_key"),
        F.col(left_time).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, left_time)
        ],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(on).alias("r_key"),
        F.col(right_time).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_time)
        ],
    ).withWatermark("r_ts", watermark)
    cond = F.expr(
        "l_key = r_key AND "
        f"r_ts >= l_ts + INTERVAL {lower_seconds} SECONDS AND "
        f"r_ts <= l_ts + INTERVAL {upper_seconds} SECONDS"
    )
    return l.join(r, cond, "inner")
