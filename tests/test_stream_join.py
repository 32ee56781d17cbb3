"""Stream-stream interval join equals the batch banded range join."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.temporal import range_join_binned
from collection_templates_spark.streaming.joins import stream_interval_join


def test_stream_interval_join_matches_batch(spark, tmp_path):
    rows_l = [
        (1, "2024-01-01 10:00:00", 100),
        (1, "2024-01-01 11:00:00", 101),
        (2, "2024-01-01 10:30:00", 200),
    ]
    rows_r = [
        (1, "2024-01-01 10:02:00", 900),  # within 5m of 100
        (1, "2024-01-01 11:20:00", 901),  # outside 5m of 101
        (2, "2024-01-01 10:31:00", 902),  # within 5m of 200
    ]

    def write(rows, name):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.parquet(str(tmp_path / name))
        return df

    batch_l = write(rows_l, "left")
    batch_r = write(rows_r, "right")

    schema = "user_id long, ts timestamp, event_id long"
    sl = spark.readStream.schema(schema).parquet(str(tmp_path / "left"))
    sr = spark.readStream.schema(schema).parquet(str(tmp_path / "right"))
    q = (
        stream_interval_join(sl, sr, on="user_id", upper_seconds=300)
        .select("l_event_id", "r_event_id")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.l_event_id, r.r_event_id)
        for r in spark.read.schema("l_event_id long, r_event_id long")
        .parquet(str(tmp_path / "out"))
        .collect()
    )

    batch = range_join_binned(batch_l, batch_r, "user_id", "ts", "ts", 0.0, 300.0)
    expect = sorted(
        (r["l"].event_id, r["r"].event_id) for r in batch.collect()
    )
    assert got == expect == [(100, 900), (200, 902)]


def test_stream_dedup_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming leg of the dedup suite: first-seen doc per normalized
    text survives, duplicates within the watermark horizon are dropped —
    the surviving text SET equals the batch exact_dedup canonical set."""
    from collection_templates_spark.streaming.dedup_stream import dedup_stream

    rows = [
        (1, "The  quick brown fox", "2024-01-01 10:00:00"),
        (2, "the quick Brown fox", "2024-01-01 10:01:00"),  # dup of 1
        (3, "something else entirely", "2024-01-01 10:02:00"),
        (4, "THE QUICK BROWN FOX", "2024-01-01 10:03:00"),  # dup of 1
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(tmp_path / "docs"))

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(str(tmp_path / "docs"))
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = (
        spark.read.schema("doc_id long, text string, ts timestamp")
        .parquet(str(tmp_path / "out"))
        .collect()
    )
    # exactly one survivor per normalized text; which duplicate survives
    # is batch-order-dependent, the normalized SET is not
    norm = sorted(" ".join(r.text.lower().split()) for r in out)
    assert norm == ["something else entirely", "the quick brown fox"]


@pytest.mark.slow
def test_windowed_counts_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed counts finalize a window once the watermark
    passes its end; a record arriving after that is DROPPED, not merged —
    the bounded-state contract the 100 TB streaming story depends on."""
    import time as _time

    from collection_templates_spark.streaming.custom_stream import (
        windowed_event_counts,
    )

    del _time
    schema = "ts timestamp, event_type string, value double"

    def write(rows, name):
        spark.createDataFrame(
            [(r[0], r[1], r[2]) for r in rows], "ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
            str(tmp_path / "in" / name)
        )

    def run_once():
        # one availableNow pass over the NEW files; the checkpoint carries
        # the watermark across runs, exactly like a restarted prod job
        src = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / "in"))
        )
        q = (
            windowed_event_counts(
                src, window="10 minutes", watermark="30 minutes"
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = tmp_path / "out"
        if not any(p.suffix == ".parquet" for p in out.glob("*.parquet")):
            return set()
        return {
            (str(r.window_start), r.n_events, r.total_value)
            for r in spark.read.parquet(str(out)).collect()
        }

    # run 1: advances the watermark to 12:00 - 30m = 11:30; append mode
    # emits nothing yet (windows finalize in a LATER batch)
    write(
        [("2024-01-01 10:05:00", "click", 1.0),
         ("2024-01-01 12:00:00", "click", 1.0)],
        "b1",
    )
    run_once()
    # run 2: a LATE event into the already-past-watermark 10:00 window
    # must be DROPPED; this batch finalizes that window with batch-1
    # data only
    write(
        [("2024-01-01 10:06:00", "click", 5.0),
         ("2024-01-01 12:40:00", "click", 1.0)],
        "b2",
    )
    got2 = run_once()
    assert ("2024-01-01 10:00:00", 1, 1.0) in got2, got2
    assert not any(s == "2024-01-01 10:00:00" and v != 1.0 for s, _, v in got2)
    # run 3: fresh data pushes the watermark past every earlier window —
    # the late 5.0 must never resurface anywhere
    write([("2024-01-01 14:00:00", "click", 1.0)], "b3")
    got3 = run_once()
    assert ("2024-01-01 10:00:00", 1, 1.0) in got3, got3
    assert ("2024-01-01 12:00:00", 1, 1.0) in got3, got3
    assert ("2024-01-01 12:40:00", 1, 1.0) in got3, got3
    assert all(v == 1.0 and n == 1 for _, n, v in got3), got3
