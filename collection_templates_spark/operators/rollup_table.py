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
    spark: SparkSession,
    rollup_path: str,
    new_events: DataFrame,
    read_result: bool = True,
) -> DataFrame | None:
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

    ``read_result=False`` skips the final read-back (datasource
    re-resolution + partition discovery, ~0.15 s of driver work at the
    bench scale) for callers that refresh again before reading — e.g.
    a build-then-refresh replay whose intermediate state is never
    queried (r15).
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
        return read_back() if read_result else None

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
    _dynamic_overwrite(spark, merged, rollup_path)
    return read_back() if read_result else None


def _dynamic_overwrite(
    spark: SparkSession, df: DataFrame, rollup_path: str
) -> None:
    prev_conf = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy("day").mode("overwrite").parquet(rollup_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_conf)


def retract_from_rollup(
    spark: SparkSession,
    rollup_path: str,
    retracted: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> None:
    """Queue event retractions (late-arriving corrections, GDPR
    erasure — r14 verdict #5) against the rollup as an O(batch)
    tombstone segment under ``rollup_path/tombstones/`` (the
    index_maintenance segment/snapshot-GC machinery). ``retracted``
    carries the event id plus its timestamp OR day — the day rides in
    the tombstone so folding never needs the retracted row to still
    exist in the base table (a GDPR flow deletes it there first).

    Aggregate state is not maskable at read time (the retracted event
    is already summed in), so visibility is at the next
    :func:`refresh_rollup_with_deletes` — exactly the continuous-
    aggregate invalidation-log semantics (TimescaleDB's
    invalidation_log → next refresh window)."""
    cols = set(retracted.columns)
    if "day" in cols:
        day = F.col("day")
    else:
        day = F.date_format(ts_col, "yyyy-MM-dd")
    (
        retracted.select(
            F.col(id_col).cast("long").alias(id_col),
            day.alias("day"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{rollup_path}/tombstones")
    )


def refresh_rollup_with_deletes(
    spark: SparkSession,
    rollup_path: str,
    base_events: DataFrame,
    new_events: DataFrame | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Fold queued retractions (and optionally ingest a new batch) by
    recomputing ONLY the affected days from the SURVIVING base events:
    min/max/distinct are not invertible, so subtracting retracted
    contributions from rolled state is impossible in general — the
    exact refresh is a from-scratch recompute of the dirtied days,
    which is also exact for ``approx_users`` (no estimate-merge).

    Contract: ``base_events`` is the CURRENT full event table (new
    batch already appended, retracted rows present or not — the
    tombstone anti-join removes them either way); ``new_events`` only
    widens the affected-day set. Days whose every event is retracted
    lose their partition entirely (local-FS dir removal here; a
    metastore deployment issues DROP PARTITION). The folded tombstone
    SNAPSHOT is GC'd afterwards — segments appended concurrently
    survive and fold at the next refresh, and re-folding a tombstone
    is idempotent (anti-join of already-absent ids).

    Scale shape: O(tombstones + affected-days' events), never
    O(history) — the affected-day set is a broadcast filter that
    partition-prunes the base scan on a day-partitioned event store,
    and the rewrite is dynamic partition overwrite."""
    import os
    import shutil

    from collection_templates_spark.operators.index_maintenance import (
        _gc_tombstone_files,
        tombstone_files,
    )

    tomb_snapshot = tombstone_files(rollup_path)
    days = None
    if tomb_snapshot:
        tomb = spark.read.parquet(*tomb_snapshot).select(id_col, "day")
        days = tomb.select("day").distinct()
    if new_events is not None:
        nd = new_events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).distinct()
        days = nd if days is None else days.unionByName(nd).distinct()
    if days is None:
        return spark.read.parquet(rollup_path).withColumn(
            "day", F.date_format("day", "yyyy-MM-dd")
        )

    affected = [r["day"] for r in days.collect()]
    # affected-day filter as RAW ts ranges, not date_format(ts).isin(…):
    # identical rows (date_format buckets ts by session-TZ local day;
    # [day 00:00, day+1 00:00) is that bucket), but the range form (a)
    # skips a per-row string format over the whole base scan and (b)
    # reaches the parquet scan as PushedFilters min/max on ts, so a
    # ts-clustered event store row-group-prunes instead of full-scanning
    # (guide §6.2). Day bounds are built with to_timestamp on the day
    # STRING — parsed in spark.sql.session.timeZone, the same zone
    # date_format buckets by, and constant-folded to a pushable literal.
    # NEVER naive Python datetime literals: py4j converts those via
    # time.mktime in the driver's OS timezone, which silently shifts
    # the window on non-UTC hosts (r15 ADVICE — reproduced with
    # TZ=America/New_York: a 01:00-UTC event fell outside its day).
    import datetime as _dt

    def _day_range(d: str) -> F.Column:
        d1 = (_dt.date.fromisoformat(d) + _dt.timedelta(days=1)).isoformat()
        return (F.col("ts") >= F.to_timestamp(F.lit(d))) & (
            F.col("ts") < F.to_timestamp(F.lit(d1))
        )

    if len(affected) <= 64:
        cond = F.lit(False)
        for d in sorted(affected):
            cond = cond | _day_range(d)
    else:
        # A retraction set spanning years (GDPR erasure of a long-active
        # user) would build an O(days)-deep Or tree — planning/codegen
        # cost grows with history, contradicting the operator's
        # "never O(history)" contract (r15 ADVICE). Past 64 days, prune
        # with ONE pushable [min_day, max_day+1) envelope and keep the
        # exact day-set membership as the old isin form on top.
        lo, hi = min(affected), max(affected)
        cond = (
            (F.col("ts") >= F.to_timestamp(F.lit(lo)))
            & (
                F.col("ts")
                < F.to_timestamp(
                    F.lit(
                        (
                            _dt.date.fromisoformat(hi) + _dt.timedelta(days=1)
                        ).isoformat()
                    )
                )
            )
            & F.date_format("ts", "yyyy-MM-dd").isin(affected)
        )
    surviving = base_events.filter(cond)
    if tomb_snapshot:
        surviving = surviving.join(
            F.broadcast(tomb.select(id_col).distinct()),
            id_col,
            "left_anti",
        )
    recomputed = build_daily_rollup(surviving).localCheckpoint(eager=True)
    _dynamic_overwrite(spark, recomputed, rollup_path)
    still_there = {
        r["day"] for r in recomputed.select("day").distinct().collect()
    }
    for d in affected:
        if d not in still_there:
            shutil.rmtree(
                os.path.join(rollup_path, f"day={d}"), ignore_errors=True
            )
    _gc_tombstone_files(rollup_path, tomb_snapshot)
    return spark.read.parquet(rollup_path).withColumn(
        "day", F.date_format("day", "yyyy-MM-dd")
    )
