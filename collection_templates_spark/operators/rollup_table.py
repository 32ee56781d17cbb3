"""Continuous aggregates: hypertable-style incremental rollup tables.

A day-partitioned pre-aggregate over an append-only event stream, refreshed
incrementally: only the partitions touched by new data are recomputed and
dynamically overwritten — the TimescaleDB continuous-aggregate /
materialized-rollup pattern on Spark partitioned parquet.

Scale: refresh cost is O(new events + size of affected days), never
O(history). Query cost against the rollup is a partition-pruned scan of
pre-shrunk data. Dynamic partition overwrite keeps the refresh idempotent
(task retries rewrite the same partition deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collection_templates_spark.operators.scratch import scratch_dir


def scratch_rollup_path() -> str:
    """Unique PID-owned scratch directory for a rollup table; orphaned
    siblings reaped only when their owning process is gone (r7 advice
    #3 — an age-only reaper could delete a concurrent LIVE session's
    lazily-read backing parquet). Lifecycle logic in
    ``operators/scratch.scratch_dir``."""
    return scratch_dir("spark_rollup_refresh_")


def build_daily_rollup(events: DataFrame) -> DataFrame:
    """events(ts, event_type, value, user_id) → one row per
    (day, event_type) with the reusable aggregate state."""
    return (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )


def refresh_rollup(
    spark: SparkSession, rollup_path: str, new_events: DataFrame
) -> DataFrame:
    """Incrementally refresh the day-partitioned rollup with a batch of new
    events: recompute ONLY the affected days from (existing rollup rows of
    those days are replaced wholesale — aggregates of a day must come from
    all of that day's events, so callers pass every new event exactly once
    and late events for day D trigger D's recompute from the new batch plus
    the day's previously rolled state via mergeable aggregates).

    For simplicity and correctness the affected-day recompute here merges
    the OLD rollup row with the new batch's partial aggregate
    (count/sum/min/max merge exactly; approx_users re-estimates from the
    partial — documented limitation of non-mergeable sketches without
    binary-state storage).
    """
    def read_back() -> DataFrame:
        # partition discovery type-infers `day` back to DATE — normalize
        return spark.read.parquet(rollup_path).withColumn(
            "day", F.date_format("day", "yyyy-MM-dd")
        )

    partial = build_daily_rollup(new_events)
    try:
        existing = read_back()
        have_existing = True
    except Exception:
        have_existing = False
    if not have_existing:
        partial.write.partitionBy("day").mode("overwrite").parquet(rollup_path)
        return read_back()

    affected = partial.select("day").distinct()
    old_affected = existing.join(F.broadcast(affected), "day", "left_semi")
    merged = (
        old_affected.unionByName(partial)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 6).alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.max("approx_users").alias("approx_users"),
        )
    )
    # materialize before writing: the merged plan READS rollup_path, which
    # the dynamic-overwrite below is about to rewrite
    merged = merged.localCheckpoint(eager=True)
    prev_conf = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy("day").mode("overwrite").parquet(rollup_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_conf)
    return read_back()
