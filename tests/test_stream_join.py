"""Stream-stream interval join equals the batch banded range join."""

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
