"""Incremental daily rollup (continuous-aggregate pattern)."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.rollup_table import (
    build_daily_rollup,
    refresh_rollup,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, event_type string, value double, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_incremental_refresh_only_touches_affected_days(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batch1 = _events(spark, [
        ("2024-01-01 10:00:00", "click", 1.0, 1),
        ("2024-01-01 11:00:00", "click", 2.0, 2),
        ("2024-01-02 10:00:00", "view", 5.0, 1),
    ])
    r1 = refresh_rollup(spark, path, batch1)
    first = {(r.day, r.event_type): (r.n_events, r.sum_value) for r in r1.collect()}
    assert first[("2024-01-01", "click")] == (2, 3.0)
    assert first[("2024-01-02", "view")] == (1, 5.0)

    # batch 2: late event for day 1 + a new day; day-2 partition untouched
    batch2 = _events(spark, [
        ("2024-01-01 23:00:00", "click", 4.0, 3),
        ("2024-01-03 09:00:00", "click", 7.0, 1),
    ])
    r2 = refresh_rollup(spark, path, batch2)
    merged = {(r.day, r.event_type): (r.n_events, r.sum_value) for r in r2.collect()}
    assert merged[("2024-01-01", "click")] == (3, 7.0)  # merged with late event
    assert merged[("2024-01-02", "view")] == (1, 5.0)  # untouched partition
    assert merged[("2024-01-03", "click")] == (1, 7.0)  # new partition


def test_rollup_matches_full_rebuild(spark, tmp_path):
    """Incremental refreshes must equal a from-scratch rollup of all data."""
    path = str(tmp_path / "rollup")
    from collection_templates_spark.sources.testdata import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    refresh_rollup(spark, path, half1)
    incremental = refresh_rollup(spark, path, half2)
    full = build_daily_rollup(ev)
    inc = {(r.day, r.event_type): (r.n_events, r.sum_value)
           for r in incremental.collect()}
    ful = {(r.day, r.event_type): (r.n_events, r.sum_value)
           for r in full.collect()}
    assert inc == ful

def test_streaming_rollup_matches_batch(spark, tmp_path):
    """build_daily_rollup's mergeable columns are a plain groupBy
    aggregate — also legal Structured Streaming state (one row per
    (day, event_type)): the streamed rollup equals the batch rollup.
    approx_users is excluded (HLL± state is the documented non-mergeable
    limitation)."""
    import datetime

    src = tmp_path / "events_src"
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1 + (i % 5), i % 24, 0, 0),
            i % 7,
            ["click", "view", "purchase"][i % 3],
            float(i) / 4.0,
        )
        for i in range(200)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    ev = spark.createDataFrame(rows, schema)
    ev.write.mode("overwrite").parquet(str(src))

    cols = ["day", "event_type", "n_events", "sum_value",
            "min_value", "max_value"]
    batch = sorted(
        map(tuple, build_daily_rollup(ev).select(*cols).collect())
    )

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        build_daily_rollup(stream)
        .select(*cols)
        .writeStream.format("memory")
        .queryName("rollup_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("rollup_stream").collect()))
    assert got == batch


def _ev_id(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, "
        "user_id long",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_delete_refresh_equals_recompute_from_surviving(spark, tmp_path):
    """r14 verdict #5: retraction-aware refresh ≡ from-scratch rollup
    of the surviving events — exact for the non-invertible aggregates
    (min/max) because dirtied days recompute wholesale; untouched days
    keep their partitions byte-identical."""
    from collection_templates_spark.operators.index_maintenance import (
        tombstone_files,
    )
    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup_with_deletes,
        retract_from_rollup,
    )

    path = str(tmp_path / "rollup")
    rows = [
        (1, "2024-01-01 10:00:00", "click", 1.0, 1),
        (2, "2024-01-01 11:00:00", "click", 9.0, 2),  # day-1 max
        (3, "2024-01-02 10:00:00", "view", 5.0, 1),
        (4, "2024-01-02 12:00:00", "view", 2.0, 3),
        (5, "2024-01-03 09:00:00", "click", 7.0, 1),
    ]
    base = _ev_id(spark, rows)
    refresh_rollup(spark, path, base)

    # retract the day-1 max and ALL of day-3 (GDPR user 1, say)
    retract_from_rollup(
        spark, path, base.filter(F.col("event_id").isin(2, 5))
    )
    assert tombstone_files(path)
    out = refresh_rollup_with_deletes(spark, path, base)
    got = {
        (r.day, r.event_type): (r.n_events, r.sum_value, r.max_value)
        for r in out.collect()
    }
    surv = base.filter(~F.col("event_id").isin(2, 5))
    want = {
        (r.day, r.event_type): (r.n_events, r.sum_value, r.max_value)
        for r in build_daily_rollup(surv).collect()
    }
    assert got == want
    assert got[("2024-01-01", "click")] == (1, 1.0, 1.0)  # max re-dropped
    assert ("2024-01-03", "click") not in got  # emptied day gone
    import os

    assert not os.path.exists(os.path.join(path, "day=2024-01-03"))
    assert tombstone_files(path) == []  # folded snapshot GC'd

    # idempotent no-op when nothing is queued
    again = refresh_rollup_with_deletes(spark, path, surv)
    got2 = {
        (r.day, r.event_type): (r.n_events, r.sum_value, r.max_value)
        for r in again.collect()
    }
    assert got2 == want


@pytest.mark.slow
def test_delete_refresh_with_new_batch_and_crash_window(spark, tmp_path):
    """Deletes + a new batch in one refresh; then the crash window —
    a tombstone re-appended after its fold (GC crashed) re-folds as a
    no-op. Retracted ids whose rows are ALREADY gone from the base
    (GDPR deletes upstream first) still dirty their day via the
    tombstone's own day column."""
    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup_with_deletes,
        retract_from_rollup,
    )

    path = str(tmp_path / "rollup")
    rows = [
        (1, "2024-01-01 10:00:00", "click", 1.0, 1),
        (2, "2024-01-01 11:00:00", "click", 9.0, 2),
        (3, "2024-01-02 10:00:00", "view", 5.0, 1),
    ]
    base = _ev_id(spark, rows)
    refresh_rollup(spark, path, base)
    # upstream already erased event 2 — the retraction frame is built
    # from the tombstone request (id + day), not the base row
    retract_from_rollup(
        spark,
        path,
        spark.createDataFrame([(2, "2024-01-01")], "event_id long, day string"),
    )
    new_batch = _ev_id(spark, [(6, "2024-01-04 08:00:00", "view", 4.0, 9)])
    base_after = base.filter(F.col("event_id") != 2).unionByName(new_batch)
    out = refresh_rollup_with_deletes(
        spark, path, base_after, new_events=new_batch
    )
    got = {
        (r.day, r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert got[("2024-01-01", "click")] == (1, 1.0)
    assert got[("2024-01-04", "view")] == (1, 4.0)
    assert got[("2024-01-02", "view")] == (1, 5.0)

    # crash window: the same tombstone re-appended post-fold
    retract_from_rollup(
        spark,
        path,
        spark.createDataFrame([(2, "2024-01-01")], "event_id long, day string"),
    )
    out2 = refresh_rollup_with_deletes(spark, path, base_after)
    got2 = {
        (r.day, r.event_type): (r.n_events, r.sum_value)
        for r in out2.collect()
    }
    assert got2 == got


def test_delete_refresh_day_window_immune_to_os_timezone(spark, tmp_path):
    """r15 ADVICE (medium): the affected-day ts-range filter must be
    built in the SESSION timezone, not the driver OS timezone — naive
    Python datetime literals convert via time.mktime in the OS zone,
    silently shifting the window on non-UTC hosts and dropping
    affected-day events near midnight. Reproduction: OS TZ set to
    America/New_York (UTC-5), an affected-day event at 01:00 UTC —
    a naive-literal window [05:00, 05:00+1d) UTC would exclude it."""
    import os
    import time as _time

    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup_with_deletes,
        retract_from_rollup,
    )

    path = str(tmp_path / "rollup")
    rows = [
        (1, "2024-01-01 01:00:00", "click", 1.0, 1),  # 01:00 UTC
        (2, "2024-01-01 11:00:00", "click", 9.0, 2),
        (3, "2024-01-02 10:00:00", "view", 5.0, 1),
    ]
    base = _ev_id(spark, rows)
    refresh_rollup(spark, path, base)
    retract_from_rollup(spark, path, base.filter(F.col("event_id") == 2))

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        out = refresh_rollup_with_deletes(spark, path, base)
        got = {
            (r.day, r.event_type): (r.n_events, r.sum_value)
            for r in out.collect()
        }
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
    # the 01:00-UTC survivor must still be counted in its day
    assert got[("2024-01-01", "click")] == (1, 1.0)
    assert got[("2024-01-02", "view")] == (1, 5.0)


@pytest.mark.slow
def test_delete_refresh_envelope_fallback_past_64_days(spark, tmp_path):
    """r15 ADVICE (low): past 64 affected days the per-day Or tree is
    replaced by ONE [min, max+1) envelope plus the exact isin — same
    rows, O(1)-in-history planning. 70 affected days exercises the
    fallback branch; result must equal a from-scratch rollup of the
    surviving events."""
    import datetime

    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup_with_deletes,
        retract_from_rollup,
    )

    path = str(tmp_path / "rollup")
    d0 = datetime.datetime(2024, 1, 1, 6, 0, 0)
    # two events per day over 70 days; the even-id one of each day is
    # retracted, so ALL 70 days are affected (> 64 ⇒ envelope branch)
    # while every day keeps a survivor
    rows = [
        (
            2 * i + j,
            (d0 + datetime.timedelta(days=i, hours=j)).strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "click",
            float(i % 7 + j),
            i % 5,
        )
        for i in range(70)
        for j in (0, 1)
    ]
    base = _ev_id(spark, rows)
    refresh_rollup(spark, path, base)
    retract_from_rollup(spark, path, base.filter(F.col("event_id") % 2 == 0))
    out = refresh_rollup_with_deletes(spark, path, base)
    got = {
        (r.day, r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    surv = base.filter(F.col("event_id") % 2 == 1)
    want = {
        (r.day, r.event_type): (r.n_events, r.sum_value)
        for r in build_daily_rollup(surv).collect()
    }
    assert got == want
    assert len(got) == 70
