"""As-of join and banded range join (custom temporal operators)."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.temporal import (
    as_of_join,
    range_join_binned,
)


def _ts(spark, rows, schema="user_id long, ts string, event_id long"):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_as_of_join_backward(spark):
    left = _ts(spark, [
        (1, "2024-01-01 10:00:00", 100),
        (1, "2024-01-01 12:00:00", 101),
        (2, "2024-01-01 09:00:00", 200),  # no prior right row
    ])
    right = _ts(spark, [
        (1, "2024-01-01 09:30:00", 1),
        (1, "2024-01-01 11:00:00", 2),
        (1, "2024-01-01 12:00:00", 3),  # equal ts: visible to left@12:00
        (2, "2024-01-01 10:00:00", 4),  # after left — not visible
    ])
    out = {r.event_id: r.event_id_asof for r in as_of_join(
        left, right, on="user_id", right_value_cols=("event_id",)
    ).collect()}
    assert out == {100: 1, 101: 3, 200: None}


@pytest.mark.slow
def test_range_join_binned_matches_naive(spark):
    import random

    rng = random.Random(5)
    left = _ts(spark, [
        (u, f"2024-01-01 00:{rng.randint(0,59):02d}:{rng.randint(0,59):02d}", i)
        for i, u in enumerate(rng.choices(range(4), k=40))
    ])
    right = _ts(spark, [
        (u, f"2024-01-01 00:{rng.randint(0,59):02d}:{rng.randint(0,59):02d}", 1000 + i)
        for i, u in enumerate(rng.choices(range(4), k=40))
    ])
    banded = range_join_binned(left, right, "user_id", "ts", "ts", -120.0, 120.0)
    got = sorted(
        (r["l"].event_id, r["r"].event_id) for r in banded.collect()
    )
    naive = sorted(
        (l.event_id, r.event_id)
        for l in left.collect()
        for r in right.collect()
        if l.user_id == r.user_id
        and abs((r.ts - l.ts).total_seconds()) <= 120
    )
    assert got == naive and len(got) > 0

def test_as_of_join_right_timestamp_ties_deterministic(spark):
    """Two right rows at the same (key, ts): the greatest
    (right_time, *right_value_cols) tuple wins, every run."""
    left = _ts(spark, [(1, "2024-01-01 12:00:00", 100)])
    right = _ts(spark, [
        (1, "2024-01-01 11:00:00", 7),
        (1, "2024-01-01 11:00:00", 9),  # tie on ts -> larger event_id wins
        (1, "2024-01-01 11:00:00", 8),
    ])
    for _ in range(3):
        out = as_of_join(
            left, right.repartition(4), on="user_id",
            right_value_cols=("event_id",),
        ).collect()
        assert [r.event_id_asof for r in out] == [9]
