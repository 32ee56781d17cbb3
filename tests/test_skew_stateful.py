"""Skew utilities + stateful streaming sessionization."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.skew import (
    salted_join,
    split_heavy_hitters,
)


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        "p_partkey", "p_brand"
    )
    plain = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    fact = li.withColumnRenamed("l_partkey", "p_partkey")
    salted = (
        salted_join(fact, p, "p_partkey", salt_factor=8, salt_source="l_orderkey")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_split_heavy_hitters(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold1", 1), ("cold2", 2)],
        "k string, v int",
    )
    hot, cold = split_heavy_hitters(df, "k", threshold=50)
    assert hot.count() == 100 and cold.count() == 2
    assert {r.k for r in cold.select("k").distinct().collect()} == {"cold1", "cold2"}


@pytest.mark.slow
def test_stateful_sessionize_stream(spark, tmp_path):
    """File-source stream through applyInPandasWithState: sessions closed by
    the 30-min gap appear in the output; the open tail session does not
    (until timeout)."""
    src = tmp_path / "events"
    batch = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 7),
            ("2024-01-01 00:10:00", 7),
            ("2024-01-01 02:00:00", 7),  # new session (gap 110m)
            ("2024-01-01 02:05:00", 7),
        ],
        "ts string, user_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch.coalesce(1).write.parquet(str(src))

    from collection_templates_spark.streaming.stateful import sessionize_stream

    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(str(src))
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(str(tmp_path / "out"))
    closed = [tuple(map(str, r)) for r in out.collect()]
    assert closed == [
        ("7", "2024-01-01 00:00:00", "2024-01-01 00:10:00", "2")
    ], closed


def test_aqe_skew_join_split_fires(spark):
    """100 TB story: for skewed joins we DON'T hand-salt, AQE's runtime
    skew-join split is the safety net (one collection owning 10-25% of
    all members — the reference's 10.5M-human skew). Prove the mechanism
    actually engages, not just that the conf is set: a hot-key
    sort-merge join under proportionally lowered skew thresholds must
    show SortMergeJoin(skew=true) reading a skewed AQEShuffleRead in the
    finalized adaptive plan, and still produce the exact join result."""
    from pyspark.sql import functions as FF

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pad = FF.sha2(FF.col("id").cast("string"), 256).alias("pad")
        hot = spark.range(200_000).select(
            FF.lit(0).alias("k"), FF.col("id").alias("v"), pad
        )
        cold = spark.range(10_000).select(
            (FF.col("id") % 100 + 1).alias("k"), FF.col("id").alias("v"), pad
        )
        dim = spark.range(101).select(
            FF.col("id").alias("k"),
            FF.concat(FF.lit("name_"), FF.col("id")).alias("name"),
        )
        j = hot.union(cold).join(dim, "k").select(FF.sum("v").alias("s"))
        [row] = j.collect()
        assert row["s"] == sum(range(200_000)) + sum(range(10_000))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
