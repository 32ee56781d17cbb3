"""Incremental daily rollup (continuous-aggregate pattern)."""

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
