"""Operator-inventory queries over the driver's synthetic tables.

Every entry exercises one row (or cluster of rows) of SURVEY.md §2's operator
inventory, re-expressed on the TPC-H-ish testdata so the driver can check it
against a DuckDB oracle (``ORACLE_SQL``). The *pipeline-shaped* versions of
the same operators (real N-Triples/collections semantics) live under
``collection_templates_spark.operators`` and are tested in ``tests/``.

Determinism rules (the driver hash-compares values):
- every aggregate / computed column is aliased identically in Spark and SQL;
- doubles are ``round()``-ed (sums to 2dp, means/medians to 4dp) so fp
  summation order can't flip the hash;
- arrays are sorted and joined to strings;
- every window / top-k has a total-order tie-breaker.

Scale notes are inline per query; the common ones: dimension joins
(region/nation/part-allowlist) are broadcast; aggregations are partial
(map-side) by construction; filters sit directly on the parquet scan so
pushdown + column pruning reach the file source.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collection_templates_spark.operators.graph import transitive_closure


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from collection_templates_spark.sources.testdata import load_table

    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→partial-agg→final-agg (A4/A5/A6 shape; TPC-H Q1).

    Whole pipeline stays in whole-stage codegen; the only shuffle is the
    6-group final aggregation (map-side combine first).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def filter_pushdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tight predicate stack on the scan (P2/P8/P12 analog; TPC-H Q6).

    All four predicates push to the parquet reader (min/max pruning on
    l_shipdate); projection prunes to 4 columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


def agg_entity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple→entity grouping analog (A1, create_kv.py:108-125).

    The reference accumulates adjacent rows per subject; here groupBy makes
    adjacency irrelevant. 'first/last wins' for single-valued predicates
    becomes an explicit deterministic ``min_by``; multi-valued accumulation
    becomes a sorted distinct list.
    """
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min_by("event_type", "event_id").alias("first_type"),
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def agg_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status histogram with derived buckets (A5, create_merged.py:873-881)."""
    o = _t(spark, sf_dir, "orders")
    n_open = F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    n_finished = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    n_pending = F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        n_open.alias("n_open"),
        n_finished.alias("n_finished"),
        n_pending.alias("n_pending"),
        (n_open + n_pending).alias("n_nonfinal"),
        F.round(n_finished.cast("double") / F.count("*"), 4).alias("finished_ratio"),
    )


def agg_member_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean + EXACT median with clamps (A6/F6, create_merged.py:966-977).

    ``percentile`` (exact, interpolating — numpy-median semantics), not
    ``percentile_approx``: the reference uses np.median. Clamp to 1e-8 as the
    reference does for rank_feature positivity.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
            F.round(F.greatest(F.avg("c_acctbal"), F.lit(1e-8)), 4).alias(
                "avg_bal_clamped"
            ),
            F.count("*").alias("n_customers"),
        )
    )


def agg_merge_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-merge semantics (A8, create_merged.py:549-576): min-id winner,
    count sum, set-union of attributes, deterministic flags."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min("o_orderkey").alias("merged_id"),
        F.count("*").alias("members_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.max("o_orderpriority").alias("max_priority"),
        (F.count("*") > 1).cast("int").alias("is_merged"),
    )


def date_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time daily rollup (the batch analog of a tumbling window)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True pivot (A1's predicate→column reshaping as a first-class op):
    one column per event type, counts per user."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in types])
    )


def agg_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping flags — subtotal/total rows in one pass
    (beyond-reference engine surface; reference has no grouping sets)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .rollup("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "total_value",
        )
    )


def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested/JSON field access (F14 analog, update_es.py:116-130):
    extract props.k, aggregate per event type. try_cast/TRY_CAST in both
    engines — malformed props.k degrades to NULL instead of an ANSI
    crash (r7 advice #4)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").try_cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def join_inner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim⋈dim⋈dim star join (J1/J5). nation/region broadcast; the
    orders⋈customer join shuffles on the key both sides already need."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def join_left_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + default-on-miss (J7: ranks.get(id, 0))."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


def join_semi_allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast left-semi against a small allowlist (J3/Opt-3)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    allow = p.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")).select(
        "p_partkey"
    )
    return (
        li.join(F.broadcast(allow), li.l_partkey == allow.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def join_anti_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join = the snapshot 'archive' branch (U4/D4, update_es.py:306-311)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers"))
    )


def snapshot_diff_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer snapshot diff with hash-equality routing (J14/D2/F15,
    update_es.py:249-313): insert / archive / update / noop per id.

    The canonical state string is built from integer-cents so the sha256
    compare is engine-portable (doubles never enter the hash).
    """
    o = _t(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")

    def snap(df: DataFrame, cond) -> DataFrame:
        return (
            df.filter(cond)
            .groupBy("o_custkey")
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
                F.count("*").alias("cnt"),
            )
            .withColumn(
                "state_hash",
                F.sha2(F.concat_ws("|", F.col("cents"), F.col("cnt")), 256),
            )
        )

    prev = snap(o, F.col("o_orderdate") < split).alias("p")
    curr = snap(o, F.col("o_orderdate") >= split).alias("c")
    joined = prev.join(curr, F.col("p.o_custkey") == F.col("c.o_custkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("p.o_custkey"), F.col("c.o_custkey")).alias("custkey"),
        F.when(F.col("p.o_custkey").isNull(), "insert")
        .when(F.col("c.o_custkey").isNull(), "archive")
        .when(F.col("p.state_hash") != F.col("c.state_hash"), "update")
        .otherwise("noop")
        .alias("op"),
    )


# ---------------------------------------------------------------------------
# Windows / sorts / top-k / dedup (SURVEY §2.5, §2.8)
# ---------------------------------------------------------------------------


def window_dup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate counting via window (A7, create_merged.py:992-1017)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand", "p_size")
    return (
        p.withColumn("n_dups", F.count("*").over(w))
        .filter(F.col("n_dups") > 1)
        .select("p_partkey", "p_brand", "p_size", "n_dups")
    )


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k with the reference's log-rank sort key (O2/O4/F5:
    log2(rank+1)/max(len,10), create_merged.py:884-886)."""
    o = _t(spark, sf_dir, "orders")
    score = F.log2(F.col("o_totalprice") + 1) / F.greatest(
        F.length("o_orderstatus"), F.lit(10)
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("score"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            "rn",
            F.round("score", 6).alias("score_r"),
        )
    )


def window_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-keep-first-by-sort (O6, uniq_members create_merged.py:365-370)."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data — the
    # full key list makes the kept row a total order (engine-independent).
    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc("l_linenumber"),
        F.asc("l_partkey"),
        F.asc("l_suppkey"),
        F.asc("l_extendedprice"),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream table (batch analog of
    Structured Streaming session windows; 30-minute inactivity gap)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    us = F.unix_micros("ts")
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("new_sess").alias("n_sessions"),
        )
    )


def window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in sliding/hopping time window (the Structured
    Streaming window operator in its batch form): 2-hour windows hopping
    every hour, so each event lands in exactly two windows — counts and
    value totals per (window_start, event_type). Oracle: replay the
    window assignment as date_trunc minus i×slide for i in 0..1. NULL-ts
    events are filtered in BOTH engines (r5 advice: F.window drops them
    once, the oracle's range(2) cross join would count them twice under
    one NULL window_start group)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (gap-merged event-time sessions, the
    same operator Structured Streaming uses) — one row per session. Oracle:
    the classic lag→flag→cumsum session id construction."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Temporal joins (custom operators Spark lacks as built-ins)
# ---------------------------------------------------------------------------


def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join via the union-window sort-merge pattern: each
    purchase gets the latest prior-or-equal click by the same user."""
    from collection_templates_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = as_of_join(
        purchases, clicks, on="user_id", right_value_cols=("event_id",)
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("click_event_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("gap_us"),
    )


def temporal_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: purchases within 5 minutes AFTER a click by the
    same user, aggregated per user — equi-join on (key, time-bin) instead of
    a theta join."""
    from collection_templates_spark.operators.temporal import range_join_binned

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    pairs = range_join_binned(
        clicks, purchases, "user_id", "ts", "ts", 0.0, 300.0
    )
    gap = F.unix_micros(F.col("r.ts")) - F.unix_micros(F.col("l.ts"))
    return (
        pairs.select(F.col("l.user_id").alias("user_id"), gap.alias("gap_us"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"), F.min("gap_us").alias("min_gap_us"))
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6)
# ---------------------------------------------------------------------------


def set_union_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union + membership flags (U1/U2/U5 merge routing)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    tagged = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.lit(1).alias("in_customer"),
        F.lit(0).alias("in_supplier"),
    ).unionByName(
        s.select(
            F.col("s_nationkey").alias("nationkey"),
            F.lit(0).alias("in_customer"),
            F.lit(1).alias("in_supplier"),
        )
    )
    return tagged.groupBy("nationkey").agg(
        F.max("in_customer").alias("in_customer"),
        F.max("in_supplier").alias("in_supplier"),
        (F.max("in_customer") + F.max("in_supplier") == 2)
        .cast("int")
        .alias("in_both"),
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.7)
# ---------------------------------------------------------------------------


def scalar_curate_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curate_name-style regexp chain (F1/F12/F13, create_merged.py:373-380):
    underscore→space, strip parenthetical, strip chars, ucfirst — all native
    column expressions, zero Python in the hot path."""
    p = _t(spark, sf_dir, "part")
    cleaned = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("p_name"), "_", " "), " \\(.*\\)$", ""),
        "[.'-]",
        "",
    )
    tmp = p.select("p_partkey", cleaned.alias("cleaned"))
    return tmp.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("cleaned", 1, 1)), F.expr("substring(cleaned, 2)")
        ).alias("curated"),
        F.size(F.split("cleaned", " ")).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Graph (SURVEY §2.3 J13)
# ---------------------------------------------------------------------------


def graph_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative transitive closure (J13 ontology reachability) over the
    customer→nation→region containment hierarchy; oracle is a recursive CTE.
    """
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    edges = n.select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("dst"),
    ).unionByName(
        c.select(
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias("dst"),
        )
    )
    return transitive_closure(edges)


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions (SURVEY §7 step 9): dedup, similarity search,
# text analysis, multimodal plumbing
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: canonical (min) id per text group."""
    from collection_templates_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "canonical_id", "is_duplicate")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (inverted-index candidates).

    max_bucket_size=1000 is the hot-shingle guard (bounds any candidate
    bucket at 1000² pairs at 100 TB); exact here because the hottest
    shingle df in the testdata is ~25 — the oracle is the full pair set."""
    from collection_templates_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5, max_bucket_size=1000)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + banded LSH (r=2, b=32) candidates, verified with exact
    Jaccard — output equals the exact pair set w.p. ≈ 1 - 1e-4 per pair, so
    the exact-Jaccard SQL is a valid oracle.

    ``min_band_collisions`` is pinned to 1 (any-band candidacy) HERE even
    though the operator defaults to 2: the gate oracle is the exact pair
    set, and at j just above the 0.5 threshold the ≥2-band miss
    probability is ~1.2e-3/pair vs ~1e-4 — a regenerated corpus with one
    near-threshold organic pair could fail the hash gate. The =2 setting
    is a stress-scale candidate-suppression lever (see dedup.py), not a
    gate-scale one."""
    from collection_templates_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5, min_band_collisions=1)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SimHash(62) hamming ≤ 3 pairs via pigeonhole blocking
    (bands = max_hamming + 1 = 4, so every qualifying pair shares a
    15-16-bit chunk — 100% recall by construction). The fingerprint is
    engine-portable (two polynomial hashes mod 2^31-1), so the oracle
    recomputes identical fingerprints in DuckDB and brute-forces
    bit_count(xor) at sf-test scale."""
    from collection_templates_spark.operators.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)


def _lsh_cc_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (node, cluster) connected-components labels over the LSH
    pair set: ``dedup_clusters`` and ``dedup_keep_best`` differ only in
    the retention policy applied ON TOP of the same CC pass (r9 verdict
    perf watch — keep-best was recomputing pairs + CC end to end).
    Memoized like the ANN rankings; the labels table is ≤ |docs| rows.
    LSH-candidates + exact-verify pairs equal the exact pair set on this
    corpus (see dedup_minhash_lsh, incl. the min_band_collisions=1 pin)
    at roughly half the cost of the all-pairs shingle join."""
    from collection_templates_spark.operators.clustering import (
        connected_components,
    )
    from collection_templates_spark.operators.dedup import minhash_lsh_pairs

    def build() -> DataFrame:
        docs = _t(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(
            docs, threshold=0.5, min_band_collisions=1
        )
        return connected_components(pairs)

    return _memo_df(spark, sf_dir, "lsh_cc", build, table="documents")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive duplicate clusters via iterative
    min-label propagation; every document mapped to its canonical (min-id)
    representative. Oracle: recursive-CTE reachability min."""
    from collection_templates_spark.operators.clustering import (
        dedup_keep_canonical,
    )

    docs = _t(spark, sf_dir, "documents")
    return dedup_keep_canonical(
        docs, pairs=None, cc=_lsh_cc_for(spark, sf_dir)
    ).select("doc_id", "cluster", "keep")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 8 query vectors over the full corpus
    (the shared memoized ranking — see _brute_topk_for)."""
    return _brute_topk_for(spark, sf_dir)


# Shared sign-LSH configuration for ann_lsh_topk and ann_lsh_recall: on the
# weakly-clustered synthetic embeddings, 4 planes × 32 tables measures
# avg recall@5 ≈ 0.95 (min 0.8) vs brute force at sf0.01 — the recall row
# the driver sees. Production corpora with real cluster structure get away
# with the operator's cheaper 16-table default.
_LSH_QUERY_CONF = {"n_planes": 4, "n_tables": 32}


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN — the 100 TB scale path. Approximate w.r.t.
    brute force but DETERMINISTIC given the literal planes, so it is
    fully ORACLED (DuckDB replays the exact bucketing + rankings); the
    companion ann_lsh_recall row quantifies recall vs brute force."""
    return _lsh_topk_for(spark, sf_dir)


# Deterministic-trainer memoization: the IVF centroids and PQ codebooks
# are pure functions of (sf_dir, hyperparameters) — the trainers round
# every assignment cosine and every mean, so a recompute is bit-identical.
# The driver (and bench.py) runs all queries in ONE process; training the
# same quantizer once per dependent query is pure recompute, the same
# reasoning as operators/cache_tables.py. Keyed by (sf_dir, embeddings
# file fingerprint) — r5 advice: sf_dir alone would serve stale models if
# the driver regenerated /root/testdata and re-invoked queries() within
# the SAME process while the DuckDB oracle replays from the new parquet.
_TRAINER_MEMO: dict = {}


def _table_fingerprint(sf_dir: str, table: str) -> tuple:
    """Cheap content fingerprint of a testdata table: (path, mtime_ns,
    size) per data file, walking into the directory form too."""
    import os

    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        parts = sorted(
            os.path.join(p, f)
            for f in os.listdir(p)
            if not f.startswith(("_", "."))
        )
    else:
        parts = [p]
    return tuple(
        (f, os.stat(f).st_mtime_ns, os.stat(f).st_size) for f in parts
    )


def _embeddings_fingerprint(sf_dir: str) -> tuple:
    return _table_fingerprint(sf_dir, "embeddings")


def _memo_df(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    builder,
    table: str = "embeddings",
):
    """Result-DataFrame memoization (r6 verdict #4): each ANN ranking in
    the bank is consumed by TWO-to-FIVE rows (its own topk row, the
    recall row that grades it, and — for brute force — every recall
    row), and each consumer was re-scoring the corpus. The ≤40-row
    results are memoized as eager localCheckpoints — the same
    single-process pure-recompute reasoning as _TRAINER_MEMO, keyed
    additionally by applicationId because a checkpointed DataFrame is
    unusable from a different SparkSession. ``table`` names the input
    table whose content fingerprint keys the memo (r8: the perplexity
    family shares documents-derived frames the same way)."""
    key = (
        tag,
        sf_dir,
        _table_fingerprint(sf_dir, table),
        spark.sparkContext.applicationId,
    )
    if key not in _TRAINER_MEMO:
        _TRAINER_MEMO[key] = builder().localCheckpoint(eager=True)
    return _TRAINER_MEMO[key]


def _perplexity_pairs_for(spark: SparkSession, sf_dir: str):
    """Shared (doc, token, prev) scoring stream of the perplexity family
    (r7 verdict #3): text_perplexity / _bigram / _kn each re-exploded
    the same corpus on both the model and scoring sides — bench rows #1
    and #2. Memoized like the ANN rankings; token-occurrence-sized
    (corpus-proportional), which is a deliberate BENCH-LOCAL cache — at
    100 TB you would materialize only the model tables and re-stream the
    corpus, exactly what the un-memoized operators do."""
    from collection_templates_spark.functions.langmodel import (
        bigram_pair_stream,
    )

    docs = _t(spark, sf_dir, "documents")
    return _memo_df(
        spark, sf_dir, "ppl_pairs",
        lambda: bigram_pair_stream(docs),
        table="documents",
    )


def _bigram_counts_for(spark: SparkSession, sf_dir: str):
    """THE (prev, token) corpus aggregate (vocab²-bounded) every
    perplexity model table re-aggregates; built once off the shared pair
    stream."""
    from collection_templates_spark.functions.langmodel import (
        bigram_counts,
    )

    return _memo_df(
        spark, sf_dir, "ppl_bigram_counts",
        lambda: bigram_counts(_perplexity_pairs_for(spark, sf_dir)),
        table="documents",
    )


def _unigram_model_for(spark: SparkSession, sf_dir: str):
    """The documents unigram model (token, n, log_prob), derived from
    the shared bigram counts — expression-identical to
    ``word_frequency_model`` (same Laplace smoothing over the same
    token counts), vocabulary-sized, so the memo is cheap and serves
    text_perplexity / text_word_model / scalar_log_probability."""
    from collection_templates_spark.functions.langmodel import (
        unigram_model_from_counts,
    )

    return _memo_df(
        spark, sf_dir, "ppl_unigram_model",
        lambda: unigram_model_from_counts(
            _bigram_counts_for(spark, sf_dir)
            .groupBy("token")
            .agg(F.sum("n2").alias("n"))
        ),
        table="documents",
    )


def _brute_topk_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return _memo_df(
        spark, sf_dir, "brute5",
        lambda: cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5),
    )


def _lsh_topk_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        lsh_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return _memo_df(
        spark, sf_dir, "lsh5",
        lambda: lsh_cosine_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=5, **_LSH_QUERY_CONF
        ),
    )


def _ivf_topk_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return _memo_df(
        spark, sf_dir, "ivf5",
        lambda: ivf_cosine_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=5,
            centroids=_ivf_centroids_for(spark, sf_dir),
        ),
    )


def _pq_topk_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        pq_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return _memo_df(
        spark, sf_dir, "pq5",
        lambda: pq_cosine_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=5, m=16, ks=64,
            codebooks=_pq_codebooks_for(spark, sf_dir),
        ),
    )


def _respq_topk_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        residual_ivfpq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return _memo_df(
        spark, sf_dir, "respq5",
        lambda: residual_ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 8), k=5,
            n_clusters=16, n_probe=4, m=16, ks=16,
            centroids=_ivf_centroids_for(spark, sf_dir),
            codebooks=_respq_codebooks_for(spark, sf_dir),
        ),
    )


def _ivf_centroids_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        train_ivf_centroids,
    )

    key = ("ivf", sf_dir, _embeddings_fingerprint(sf_dir))
    if key not in _TRAINER_MEMO:
        _TRAINER_MEMO[key] = train_ivf_centroids(
            _t(spark, sf_dir, "embeddings")
        )
    return _TRAINER_MEMO[key]


def _pq_codebooks_for(spark: SparkSession, sf_dir: str):
    from collection_templates_spark.operators.similarity import (
        train_pq_codebooks,
    )

    key = ("pq", sf_dir, _embeddings_fingerprint(sf_dir))
    if key not in _TRAINER_MEMO:
        _TRAINER_MEMO[key] = train_pq_codebooks(
            _t(spark, sf_dir, "embeddings"), m=16, ks=64, iterations=2
        )
    return _TRAINER_MEMO[key]


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer, n_probe cluster
    scan per query — the inverted-list 100 TB shape. Approximate w.r.t.
    brute force but fully ORACLED (r4 verdict #1): the trainer's rounded-
    cosine assignments and 6dp-rounded means are replayed verbatim by the
    generated DuckDB SQL (_ivf_common_ctes — 3 unrolled assign/mean
    stages, the k-means analogue of the LSH plane-literal replay). The
    companion ann_ivf_recall row quantifies recall vs brute force."""
    return _ivf_topk_for(spark, sf_dir)


def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible exactness signal for the approximate ANN path (r3
    verdict): per-query recall@5 of sign-LSH top-k against brute-force
    cosine top-k. Fully ORACLED — the LSH hyperplanes are deterministic
    splitmix constants embedded verbatim in the generated oracle SQL, so
    DuckDB reproduces the identical bucketing, candidate set, rankings and
    recall values (see _lsh_recall_oracle_sql below)."""
    brute = _brute_topk_for(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = (
        _lsh_topk_for(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("___hit", F.lit(1))
    )
    return (
        brute.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("___hit"), F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5")
        )
    )


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible exactness signal for the IVF ANN path (r4 verdict
    #6, mirroring ann_lsh_recall): per-query recall@5 of IVF top-k
    against brute-force cosine top-k. Fully ORACLED — the deterministic
    k-means replay (see ann_ivf_topk) reproduces the identical probe
    sets, so DuckDB computes the identical recall values."""
    brute = _brute_topk_for(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (
        _ivf_topk_for(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("___hit", F.lit(1))
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("___hit"), F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5")
        )
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (round-5 extension completing the ANN
    family: brute → sign-LSH → IVF → PQ): 16 subspaces × 64 codewords,
    asymmetric-distance scoring — the corpus is scanned as 96-bit codes,
    never as vectors. Deterministic trainer (lowest-id init, rounded
    cosines, rounded means) makes the whole path ORACLE-replayable."""
    return _pq_topk_for(spark, sf_dir)


def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with exact refinement (round-5 extension): ADC orders a coarse
    top-50, stored vectors are fetched only for those rows, exact cosine
    picks the final top-5 — recall jumps 0.475 → 0.925 on this corpus
    for a 50-vector-per-query fetch. The production serving pattern
    (quantized scan + bounded refine), fully ORACLED."""
    from collection_templates_spark.operators.similarity import (
        pq_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return pq_cosine_topk(
        emb, q, k=5, m=16, ks=64, rerank=50,
        codebooks=_pq_codebooks_for(spark, sf_dir),
    )


def _respq_codebooks_for(spark: SparkSession, sf_dir: str):
    """Residual PQ codebooks trained against the memoized coarse
    centroids (same deterministic trainers; key separate from the raw-PQ
    memo because the codebooks quantize x − centroid under L2)."""
    from collection_templates_spark.operators.similarity import (
        train_residual_pq,
    )

    key = ("respq", sf_dir, _embeddings_fingerprint(sf_dir))
    if key not in _TRAINER_MEMO:
        _, cbs = train_residual_pq(
            _t(spark, sf_dir, "embeddings"),
            n_clusters=16,
            m=16,
            ks=16,
            iterations=2,
            centroids=_ivf_centroids_for(spark, sf_dir),
        )
        _TRAINER_MEMO[key] = cbs
    return _TRAINER_MEMO[key]


def ann_respq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoding IVF-PQ (round-5 extension — the FAISS IVFPQ
    layout): inverted lists keyed by the coarse cluster, rows storing
    m-byte codes of the RESIDUAL x − centroid (L2 codeword choice; the
    codes resolve within-cluster structure) plus one reconstruction-norm
    float that keeps cosine scoring exact-denominator. Fully ORACLED:
    the DuckDB SQL replays the coarse k-means, the residual L2 k-means,
    the encode and the decomposed ADC score."""
    return _respq_topk_for(spark, sf_dir)


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF-PQ (r5 verdict #4 — the last un-oracled ANN variant):
    IVF cluster routing over PQ-ADC scoring with codes over RAW vectors.
    Reuses BOTH memoized trainers (the coarse k-means of ann_ivf_* and
    the m=16/ks=64 codebooks of ann_pq_*), so the generated oracle is
    exactly the two existing replays chained: coarse assign + probe from
    the IVF oracle, codebook/codes/norms from the PQ oracle, and the ADC
    score restricted to probed clusters."""
    from collection_templates_spark.operators.similarity import (
        ivfpq_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return ivfpq_cosine_topk(
        emb, q, k=5, n_clusters=16, n_probe=4, m=16, ks=64,
        centroids=_ivf_centroids_for(spark, sf_dir),
        codebooks=_pq_codebooks_for(spark, sf_dir),
    )


#: Pinned BPE merge table for the driver-visible apply query (r5 verdict
#: #7: the LEARNER stays test-only — its merge table is data-dependent —
#: but applying a FIXED table is statically replayable). These five rules
#: are chosen to be mutually non-interacting so the piece count has a
#: closed form the oracle can state: each rule's two symbols are single
#: chars (or the end marker) with first ≠ second, no rule's output feeds
#: another rule, and no two rules can claim the same character position
#: (the only shared char, 'n' in an/in, would need two different
#: predecessors at once) — so greedy rank order never matters and
#: n_pieces(w) = len(w) + 1 − Σ substring occurrences − endswith('e').
_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("a", "n"), ("i", "n"), ("o", "r"), ("e", "</w>"),
]


def bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc subword statistics under the pinned merge table — the A10
    tokenization surface driven end-to-end (explode → per-DISTINCT-word
    UDF tokenize → native aggregate), now with a hash-checked oracle."""
    from collection_templates_spark.functions.bpe import bpe_tokenize

    docs = _t(spark, sf_dir, "documents")
    return bpe_tokenize(docs, _BPE_MERGES).withColumnRenamed("doc", "doc_id")


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic dedup over the embedding table (round 6):
    the memoized coarse k-means clusters the space, and within each
    cluster a vector is dropped when an earlier cluster-mate lies inside
    the cosine ε-ball (τ = 0.4, the corpus's loose near-dup regime —
    see _EMB_DUP_CONF). Fully ORACLED by chaining the existing IVF
    k-means replay with an in-cluster pairwise check."""
    from collection_templates_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, threshold=0.4, centroids=_ivf_centroids_for(spark, sf_dir)
    )


def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (round 6) — the per-doc keyword
    extraction every corpus explorer ships: tf × ln(N/df), 6dp-rounded,
    ranked per doc with the rank filter directly above the window so
    InferWindowGroupLimit pre-prunes map-side (the ANN-finisher shape on
    a text workload). Columns: (doc_id, term, rank, tfidf)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z0-9']+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("___tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("___df"))
    n = docs.agg(F.count("*").alias("___n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("___tf")
                * F.log(
                    F.col("___n").cast("double") / F.col("___df")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "rank", "tfidf")
    )


def sample_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (round 6): Efraimidis–Spirakis
    u^(1/w) keys from the portable hash, top-64 by key — inclusion
    probability ∝ n_chars, zero RNG state, replayed exactly."""
    from collection_templates_spark.operators.training_prep import (
        sample_weighted,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_weighted(docs, k=64)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the customer↔supplier bipartite
    graph (round 6) — the canonical iterative-dataflow workload,
    unrolled into joins/aggregates and fully ORACLED by replaying the
    three sweeps as CTE stages (the k-means-replay convention applied
    to graph iteration)."""
    from collection_templates_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # integer node encoding (customer 2k, supplier 2k+1): the rank
    # vector and 1M+ edge rows shuffle per sweep, and 8-byte keys beat
    # 'c12345' strings ~2× end-to-end; labels are re-attached in one
    # final projection
    # one-year subgraph: the operator is iteration-count × edge-count —
    # the 1995 slice keeps the bench row at the per-query floor while
    # exercising the identical plan shape (the filter pushes to the
    # orders scan)
    pairs = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
    )
    return pr.select(label.alias("node"), "pagerank")


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus card (round 7, bank row #100): document count,
    token totals, exact vocabulary size, exact duplicate rate and the
    Shannon entropy of the language distribution — the summary table a
    dataset release publishes next to the data. Entropy terms are
    9dp-rounded before the (≤ |langs|-term) sum per the repo's fp
    convention."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.lower("text"), "[^a-z0-9']+")
        ).alias("token")
    ).filter(F.col("token") != "")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    tok_stats = toks.agg(
        F.count("*").alias("total_tokens"),
        F.count_distinct("token").alias("vocab"),
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    dup = docs.select(norm.alias("___n")).agg(
        F.count_distinct("___n").alias("___uniq")
    )
    lang_terms = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("___nl"))
        .join(F.broadcast(n_docs))
        .select(
            F.round(
                -(F.col("___nl") / F.col("n_docs"))
                * F.log(F.col("___nl") / F.col("n_docs")),
                9,
            ).alias("___term")
        )
        .agg(F.round(F.sum("___term"), 6).alias("lang_entropy"))
    )
    return (
        n_docs.join(F.broadcast(tok_stats))
        .join(F.broadcast(dup))
        .join(F.broadcast(lang_terms))
        .select(
            "n_docs",
            "total_tokens",
            "vocab",
            F.round(
                F.col("total_tokens") / F.col("n_docs"), 4
            ).alias("avg_doc_tokens"),
            F.round(
                1.0 - F.col("___uniq") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            "lang_entropy",
        )
    )


def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order-function surface in one row (round 7): sort,
    distinct, slice, reverse, position, filter, transform and aggregate
    over the token array of each document — the §2.11-adjacent
    primitives that ride inside many operators, pinned directly.
    Array-valued results are string-joined so the hash compare sees
    scalars."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " "
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.concat_ws(",", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws(",", F.array_sort(F.array_distinct(toks))).alias(
            "vocab_sorted"
        ),
        F.concat_ws(",", F.reverse(F.slice(toks, 1, 3))).alias(
            "first3_reversed"
        ),
        F.array_position(toks, "the").cast("long").alias("pos_the"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 5)).alias(
            "n_long_tokens"
        ),
        F.concat_ws(
            ",", F.slice(F.transform(toks, F.upper), 1, 2)
        ).alias("first2_upper"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping flags (round 7) — the
    generalization the rollup row doesn't pin: three hand-picked sets
    ((priority, status), (status), ()) with GROUPING() markers, via
    Spark SQL over a temp view (the DataFrame API exposes only
    rollup/cube)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("___gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total_price
        FROM ___gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
        """
    )


def agg_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles at four quantiles per group
    (round 7) — extends A6's single exact median to the quantile-band
    summary every data-quality dashboard publishes. Both engines use
    the same linear interpolation ((1−f)·a + f·b over the sorted
    values); 4dp rounding absorbs the arithmetic-order ulp."""
    o = _t(spark, sf_dir, "orders")
    qs = [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")]
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        *[
            F.round(F.percentile("o_totalprice", F.lit(q)), 4).alias(a)
            for q, a in qs
        ],
    )


def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates (round 7): every / some /
    count_if per event type — the ANSI bool_and/bool_or family the bank
    didn't pin (NULL-skipping semantics included: props-derived k is
    NULL for some rows)."""
    ev = _t(spark, sf_dir, "events")
    # try_cast, not cast: the oracle uses TRY_CAST and ANSI mode is ON —
    # a regenerated corpus with a non-numeric props.k must NULL out in
    # both engines, not crash only the Spark side (r7 advice #4).
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        ev.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.every(F.col("value") >= 0).alias("all_nonneg"),
            F.some(F.col("value") > 90).alias("any_gt90"),
            F.count_if(F.col("value") > 50).alias("n_gt50"),
            F.every(F.col("k") >= 0).alias("all_k_nonneg"),
            F.some(F.col("k") > 900).alias("any_k_gt900"),
        )
    )


def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist in one row (round 7) — the three
    ranking window primitives the bank didn't yet pin (row_number/rank
    ride inside many queries; these three have distinct edge semantics:
    ntile's uneven-bucket remainder rule, percent_rank's (r-1)/(n-1),
    cume_dist's ties-inclusive fraction). Per order-priority window over
    order totals; totally ordered by the (priority, orderkey) pair."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        # keep the gate row compact: quartile boundaries + extremes per
        # priority exercise every primitive's edge arithmetic
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("pct_rank"), 6).alias("min_pct_rank"),
            F.round(F.max("cume"), 6).alias("max_cume"),
        )
    )


def window_range_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed moving aggregate (round 7) — the one window-frame
    kind the bank didn't pin (ROWS frames ride in window_running_total):
    per user, the trailing-24-hour event-value sum and count at each
    event, frame bounds on epoch seconds so peers at equal timestamps
    are included (RANGE, not ROWS, semantics). Totally ordered by
    (user_id, ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    secs = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round(F.sum("value").over(w), 2).alias("sum_24h"),
        F.count("*").over(w).alias("n_24h"),
    )


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (round 7) — the inverse of agg_pivot_event_types and
    a distinct relational primitive (stack/UNPIVOT): the per-priority
    status histogram melted from wide columns to (priority, status
    metric, value) rows."""
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "n_open"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "n_finished"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias(
            "n_pending"
        ),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_open", "n_finished", "n_pending"],
        "status_metric",
        "n",
    )


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS hubs/authorities (round 7) over the directed
    customer→supplier graph — customers are pure hubs, suppliers pure
    authorities, so both score families do real work and the bipartite
    zero sides are pinned. Two sweeps, max-normalized (exact comparison,
    engine-replayable — see operators/graph.hits), unrolled-CTE oracle
    like the pagerank rows."""
    from collection_templates_spark.operators.graph import hits

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    out = hits(edges, iterations=2)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
    )
    return out.select(label.alias("node"), "hub", "authority")


def rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup refresh as a driver row (round 7; previously
    t-only in operators/rollup_table.py): the day-partitioned continuous
    aggregate is built from the events before a mid-day cutoff, then
    refreshed with the batch after it — so one day is genuinely MERGED
    (old rolled state + new partial, the TimescaleDB continuous-
    aggregate shape), ten days are new-only, and nineteen must pass
    through untouched. The oracle replays build + merge with the same
    6dp partial-sum rounding (the merge arithmetic is the semantics
    under test; refresh-equals-rebuild up to rounding stays pinned by
    tests/test_rollup_table.py).

    ``approx_users`` (an HLL estimate, not mergeable without binary
    sketch state — documented limitation in the operator) is projected
    out of the gate row.

    Scale shape: refresh cost is O(new events + affected days), never
    O(history) — the affected-day filter is a broadcast semi-join and
    the rewrite is dynamic partition overwrite."""
    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup,
        scratch_rollup_path,
    )

    ev = _t(spark, sf_dir, "events")
    cut = "2024-01-20 12:00:00"
    hist = ev.filter(F.col("ts") < cut)
    batch = ev.filter(F.col("ts") >= cut)
    # unique dir per invocation: the refresh is idempotent per path, and
    # a fresh path keeps repeated bench/gate runs independent. Scratch
    # lifecycle (PID-owned naming + orphan reaping) lives in the operator
    # module — the bank stays pure (r7 verdict #7 / advice #3).
    path = scratch_rollup_path()
    # read_result=False: the build step's read-back is never queried —
    # the refresh below re-reads the path itself (r15, guide §5.3)
    refresh_rollup(spark, path, hist, read_result=False)
    out = refresh_rollup(spark, path, batch)
    return out.select(
        "day", "event_type", "n_events", "sum_value", "min_value",
        "max_value",
    )


def rollup_incremental_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware rollup refresh (round 15; r14 verdict #5):
    the day-partitioned continuous aggregate is built from ALL events,
    then one day is fully erased (2024-01-11 — the GDPR shape) and two
    neighbours lose their event_id ≡ 0 (mod 5) rows (late-arriving
    corrections); ``retract_from_rollup`` queues the tombstone segment
    and ``refresh_rollup_with_deletes`` folds it by recomputing ONLY
    the three dirtied days from the surviving events
    (operators/rollup_table.py — min/max are not invertible, so exact
    retraction is an affected-day recompute, never state subtraction;
    the emptied day's partition is dropped). The oracle is the rollup
    of the surviving events directly — refresh ≡ recompute-from-
    surviving, also pinned by tests/test_rollup_table.py.

    Scale shape: O(tombstones + affected-days' events) — the
    affected-day set partition-prunes the base scan; untouched
    partitions are not read or rewritten."""
    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup,
        refresh_rollup_with_deletes,
        retract_from_rollup,
        scratch_rollup_path,
    )

    ev = _t(spark, sf_dir, "events")
    path = scratch_rollup_path()
    refresh_rollup(spark, path, ev, read_result=False)
    day = F.date_format("ts", "yyyy-MM-dd")
    retracted = ev.filter(
        (day == "2024-01-11")
        | (
            day.isin("2024-01-10", "2024-01-12")
            & (F.col("event_id") % 5 == 0)
        )
    ).select("event_id", "ts")
    retract_from_rollup(spark, path, retracted)
    out = refresh_rollup_with_deletes(spark, path, ev)
    return out.select(
        "day", "event_type", "n_events", "sum_value", "min_value",
        "max_value",
    )


def graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution (round 7; r6 verdict
    #6) over the DIRECTED customer→supplier graph — suppliers have no
    out-edges, so a large fraction of the mass is dangling every sweep
    and the redistribution term does real work (the simple variant's
    ranks would all drift low). Same 1995 slice, node encoding and
    3-sweep unrolled-CTE oracle as graph_pagerank; each sweep's Dᵢ is
    replayed as a one-row CTE."""
    from collection_templates_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(
        edges, iterations=3, damping=0.85, redistribute_dangling=True
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
    )
    return pr.select(label.alias("node"), "pagerank")


def sketch_cms_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min token-frequency sketch read back against exact counts
    (round 6): d=4 portable-poly rows × w=256, the one-pass bounded-
    memory heavy-hitter summary — the CMS overestimate guarantee is
    SURFACED per token, and the oracle replays the cells exactly."""
    from collection_templates_spark.operators.sketches import (
        cms_token_errors,
    )

    return cms_token_errors(_t(spark, sf_dir, "documents"))


def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate vs exact count (round 6):
    m=64 registers over the portable 62-bit hash, integer-exact harmonic
    sum, linear-counting small-range correction — fully replayed."""
    from collection_templates_spark.operators.sketches import (
        hll_cardinality,
    )

    return hll_cardinality(_t(spark, sf_dir, "documents"))


def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch intersection estimates between the per-event-type
    user sets (round 7, extending the sketch family beyond CMS/HLL to
    SET OPERATIONS — the thing theta sketches exist for): every
    event-type pair's estimated vs exact audience overlap. Deterministic
    (portable integer hashes, row_number order statistics), so fully
    replayed by the oracle."""
    from collection_templates_spark.operators.sketches import (
        kmv_theta_intersections,
    )

    return kmv_theta_intersections(_t(spark, sf_dir, "events"))


def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership with the measured false-positive rate
    next to the ρᵏ load model (round 7): the filter is built over the
    tokens of the even-doc half of the corpus and probed with the
    odd-doc tokens PLUS their 'q_'-prefixed variants ('_' never appears
    in analyzer tokens, so the variants are guaranteed non-members and
    the fpr denominator is never empty at any sf) — the pre-filter every
    large-scale decontamination / blocklist join puts in front of the
    exact check. Set-bit table replayed verbatim in SQL."""
    from collection_templates_spark.operators.sketches import (
        _analyzer_tokens,
        bloom_filter_fpr,
    )

    docs = _t(spark, sf_dir, "documents")
    keys = _analyzer_tokens(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    odd = _analyzer_tokens(
        docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text"
    )
    probes = odd.select("token").union(
        odd.select(F.concat(F.lit("q_"), F.col("token")).alias("token"))
    )
    return bloom_filter_fpr(keys, probes)


def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel (round 6 capstone): the training
    candidates (doc_id ≥ 20, the decontamination convention) flow
    through exact dedup → logistic quality filter → benchmark
    decontamination (drop contamination ≥ 0.2), and the query reports
    one row per stage with the surviving count and retention vs ingest —
    the dashboard every data-curation run publishes. Each stage is an
    already-oracled operator; the funnel pins their COMPOSITION
    (cumulative survivorship), which no single-operator query checks.

    Scale shape: stage survivors are id-projected semi/anti joins (the
    heavy per-stage work — dedup window, model scan, gram join — is each
    operator's own documented shape); the four counts are one-row
    aggregates unioned, and retention rides a broadcast of the ingest
    count."""
    from collection_templates_spark.operators.dedup import exact_dedup
    from collection_templates_spark.operators.training_prep import (
        ngram_contamination,
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    s0 = train.select("doc_id")
    s1 = (
        exact_dedup(train)
        .filter(F.col("is_duplicate") == 0)
        .select("doc_id")
    )
    qual_keep = (
        quality_classifier(train)
        .withColumnRenamed("doc", "doc_id")
        .filter(F.col("keep"))
        .select("doc_id")
    )
    s2 = s1.join(qual_keep, "doc_id", "left_semi")
    dirty = (
        ngram_contamination(train, bench)
        .withColumnRenamed("doc", "doc_id")
        .filter(F.col("contamination") >= 0.2)
        .select("doc_id")
    )
    s3 = s2.join(dirty, "doc_id", "left_anti")

    counts = None
    for name, df in (
        ("00_ingest", s0),
        ("01_exact_dedup", s1),
        ("02_quality", s2),
        ("03_decontaminate", s3),
    ):
        c = df.agg(F.count("*").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )
        counts = c if counts is None else counts.unionByName(c)
    n0 = s0.agg(F.count("*").alias("___n0"))
    return counts.join(F.broadcast(n0)).select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs") / F.col("___n0"), 6).alias("retention"),
    )


def wiki_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline end-to-end as a funnel (round 7 capstone):
    the staged collection funnel is the artifact the reference exists to
    produce (570,487 extracted → 511,932 merged → 411,776 final;
    /root/reference/Makefile:218-261 comments, stages
    create_collections.py:41-73 → merge_lists_and_categories.py →
    prepare_collections2.py), and this query pins the COMPOSITION of the
    already-oracled stage semantics with per-stage (rows_in, rows_out,
    retention) — the exact shape ``corpus_funnel`` gives the LLM side.

    Driver-table mapping (same conventions as the other wiki-flavored
    gate queries): orders = candidate collections, lineitem⋈part =
    members with a type, customer = the rank source. Stages:

    - 00_extract          collections with ≥1 member at all
                          (create_collections.py:41-73 emit gate)
    - 01_validate_members ontology type-validation: a member is valid
                          iff its part type class is not blacklisted
                          (filter_articles2.py valid/invalid split;
                          blacklist analog: p_type 'ECONOMY%'); keep
                          collections with ≥1 valid member ("No parent"
                          rows drop)
    - 02_enrich_rank      rank enrichment + interesting-score positivity
                          (prepare_members_names.py qrank join +
                          cache_interesting_score; rank = c_acctbal > 0)
    - 03_name_filters     name-based drops at merge time
                          (merge_lists_and_categories.py "Filtered by
                          prefix/by" counters; name = min valid member
                          p_name, prefix blacklist 'hot ')
    - 04_merge_dups       merge related collections, min-id winner
                          (J11/J12 merge by relation/name → one row per
                          (o_custkey, o_orderpriority) group;
                          filter_duplicates.py)
    - 05_member_gate      final member-count gate 3..10000
                          (prepare_collections2.py min members; the P11
                          >10k gate)

    Scale shape: ONE annotated pass — the members aggregate (map-side
    combined) joins orders/customer once and every per-collection stage
    count is a conditional sum of cumulative stage flags in a single
    aggregate (the merge-level counts need one more tiny aggregate over
    the merged groups). Two corpus passes total instead of one per
    stage; the 1-row count relations broadcast-join into a wide row and
    the stage table is ONE posexplode of a literal stage array over that
    row — structurally a single aggregate subtree, not a union relying
    on ReuseExchange (r7 verdict #6)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    customer = _t(spark, sf_dir, "customer")

    members = lineitem.join(
        part, lineitem.l_partkey == part.p_partkey
    ).select(
        "l_orderkey",
        "p_name",
        (~F.col("p_type").startswith("ECONOMY")).cast("int").alias("valid"),
    )
    m_agg = members.groupBy("l_orderkey").agg(
        F.count("*").alias("n_members"),
        F.sum("valid").alias("n_valid"),
        F.min(F.when(F.col("valid") == 1, F.col("p_name"))).alias("cname"),
    )
    ann = (
        orders.join(m_agg, orders.o_orderkey == m_agg.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            "n_valid",
            F.lit(True).alias("f0"),
            (F.col("n_valid") >= 1).alias("f1"),
            (
                (F.col("n_valid") >= 1) & (F.col("c_acctbal") > 0)
            ).alias("f2"),
            (
                (F.col("n_valid") >= 1)
                & (F.col("c_acctbal") > 0)
                & ~F.col("cname").startswith("hot ")
            ).alias("f3"),
        )
    )
    per_coll = ann.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("f1").cast("long")).alias("n1"),
        F.sum(F.col("f2").cast("long")).alias("n2"),
        F.sum(F.col("f3").cast("long")).alias("n3"),
    )
    merged = (
        ann.filter("f3")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.sum("n_valid").alias("total_valid"))
    )
    per_merge = merged.agg(
        F.count("*").alias("n4"),
        F.sum(
            F.col("total_valid").between(3, 10000).cast("long")
        ).alias("n5"),
    )
    wide = (
        orders.agg(F.count("*").alias("n_raw"))
        .join(F.broadcast(per_coll))
        .join(F.broadcast(per_merge))
    )
    stages = [
        ("00_extract", "n_raw", "n0"),
        ("01_validate_members", "n0", "n1"),
        ("02_enrich_rank", "n1", "n2"),
        ("03_name_filters", "n2", "n3"),
        ("04_merge_dups", "n3", "n4"),
        ("05_member_gate", "n4", "n5"),
    ]
    # ONE posexplode of a literal stage array over the single wide row
    # (r7 verdict #6): the former 6-branch union of one-row projections
    # re-referenced the joined aggregate plan per branch and leaned on
    # ReuseExchange to dedup the corpus scans — structurally one
    # aggregate subtree now, optimizer-independent.
    stage_arr = F.array(
        *[
            F.struct(
                F.lit(stage).alias("stage"),
                F.col(cin).cast("long").alias("rows_in"),
                F.col(cout).cast("long").alias("rows_out"),
            )
            for stage, cin, cout in stages
        ]
    )
    return wide.select(
        F.explode(stage_arr).alias("s"), F.col("n_raw")
    ).select(
        "s.stage",
        "s.rows_in",
        "s.rows_out",
        F.round(F.col("s.rows_out") / F.col("n_raw"), 6).alias("retention"),
    )


def related_collections_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-collections precompute as a driver row (round 7; reference
    precompute_related.py:110-156 — max_related=10, max_per_type=2,
    name_diversity_ratio=0.5; the last §2.10 surface without one).

    Collections-shaped input from ``part``: item = p_partkey, name =
    p_name, types = {p_type, p_brand} (two type axes so shared_types
    genuinely varies), rank = round(p_retailprice·10). The nested
    ``related`` array is posexploded to flat (item, rn, rel_id,
    rel_name, score) rows so the hash compare sees scalars.

    Scale shape: candidates come from the per-type equi-join (never
    all-pairs), the per-(src,type) cap bounds each source's candidate
    set at types·max_per_type before the final top-k window."""
    from collection_templates_spark.operators.related import (
        related_collections,
    )

    part = _t(spark, sf_dir, "part")
    colls = part.select(
        F.col("p_partkey").alias("item"),
        F.col("p_name").alias("name"),
        F.transform(
            F.array_distinct(F.array("p_type", "p_brand")),
            lambda w: F.struct(w.alias("id")),
        ).alias("types"),
        F.round(F.col("p_retailprice") * 10).cast("long").alias("rank"),
    )
    rel = related_collections(
        colls, max_related=10, max_per_type=2, name_diversity_ratio=0.5
    )
    return rel.select(
        "item", F.posexplode("related").alias("pos", "r")
    ).select(
        "item",
        (F.col("pos") + 1).cast("int").alias("rn"),
        F.col("r.id").alias("rel_id"),
        F.col("r.name").alias("rel_name"),
        F.col("r.score").alias("score"),
    )


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language (round 6): pieces-per-word under
    the pinned merge table, grouped over the documents language column —
    the standard multilingual-tokenizer health metric (a language with
    high fertility is under-served by the vocabulary and burns context
    length). Same closed-form oracle as bpe_apply_stats, one more
    rollup."""
    from collection_templates_spark.functions.bpe import bpe_tokenize

    docs = _t(spark, sf_dir, "documents")
    per_doc = bpe_tokenize(docs, _BPE_MERGES).withColumnRenamed(
        "doc", "doc_id"
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_pieces").alias("total_pieces"),
            F.round(
                F.sum("n_pieces") / F.sum("n_words"), 6
            ).alias("fertility"),
        )
    )


def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity (round 6) — the CCNet-style
    filter one order above text_perplexity; model counts + interpolation
    replayed verbatim in the oracle."""
    from collection_templates_spark.functions.langmodel import (
        doc_perplexity_bigram,
    )

    docs = _t(spark, sf_dir, "documents")
    return doc_perplexity_bigram(
        docs,
        pairs=_perplexity_pairs_for(spark, sf_dir),
        bi_full=_bigram_counts_for(spark, sf_dir),
    ).withColumnRenamed("doc", "doc_id")


def ann_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-prediction accuracy (round 7): the evaluation loop
    every embedding pipeline runs — predict each query vector's label by
    majority vote of its exact cosine top-5 (tie → smallest label),
    score against the true label, report per-label accuracy. Uses the
    embeddings table's label column; 64 query vectors. Deterministic
    end-to-end (6dp sims, total-ordered vote window), fully replayed in
    the oracle.

    Scale shape: the brute ranking is the documented O(|Q|·N) baseline
    with the engine-partial top-k finisher; votes/accuracy aggregate
    |Q|·k rows."""
    from collection_templates_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 64)
    # the 64-query brute ranking is deterministic and 320 rows —
    # memoized like the 8-query ANN rankings (the fill bills to run 1)
    topk = _memo_df(
        spark, sf_dir, "knn_topk64",
        lambda: cosine_topk(emb, q, k=5),
        table="embeddings",
    )
    nb = topk.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nlabel"),
        ),
        "neighbor_id",
    )
    votes = nb.groupBy("query_id", "nlabel").agg(F.count("*").alias("nv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("nv"), F.asc("nlabel")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nlabel").alias("pred"))
    )
    truth = q.select(F.col("vec_id").alias("query_id"), "label")
    per = truth.join(pred, "query_id")
    return per.groupBy("label").agg(
        F.count("*").alias("n_queries"),
        F.sum((F.col("pred") == F.col("label")).cast("int")).alias(
            "n_correct"
        ),
        F.round(
            F.sum((F.col("pred") == F.col("label")).cast("int"))
            / F.count("*"),
            4,
        ).alias("accuracy"),
    )


def text_perplexity_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram perplexity (round 7) — the
    smoothing that actually wins Chen & Goodman's bakeoff, completing
    the LM-filter ladder unigram → interpolated bigram → KN bigram;
    absolute discounting + continuation probabilities replayed verbatim
    in the oracle."""
    from collection_templates_spark.functions.langmodel import (
        doc_perplexity_kneser_ney,
    )

    docs = _t(spark, sf_dir, "documents")
    return doc_perplexity_kneser_ney(
        docs,
        pairs=_perplexity_pairs_for(spark, sf_dir),
        bi_full=_bigram_counts_for(spark, sf_dir),
    ).withColumnRenamed("doc", "doc_id")


def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching (round 7): record-linkage blocking
    (first name token + p_type + p_brand — the narrower key is the
    standard blocking recall/cost tradeoff, stated not hidden) then
    exact Levenshtein ≤ 3 over part names, rolled up to (p_type,
    distance) pair counts — the classic near-duplicate name-curation
    primitive, never all-pairs. Levenshtein is identically defined in
    both engines, so the rollup is an exact replay."""
    from collection_templates_spark.operators.dedup import (
        blocked_levenshtein_pairs,
    )

    part = _t(spark, sf_dir, "part")
    pairs = blocked_levenshtein_pairs(
        part,
        id_col="p_partkey",
        name_col="p_name",
        block_cols=("p_type", "p_brand"),
        max_distance=3,
        # cap-independent: the DuckDB oracle is an uncapped equality
        # self-join, so the oracled row must not depend on the
        # operator's max_block_size recall cut (r8 advice) — block
        # sizes here are tiny, the cap is a stress-scale guard only
        max_block_size=None,
    )
    return pairs.groupBy("p_type", "distance").agg(
        F.count("*").alias("n_pairs"),
        F.min(F.concat_ws("|", "name_a", "name_b")).alias("example_pair"),
    )


_INCR_INDEX_MEMO: dict = {}
# index paths delta_pipeline has already appended its accepted batch to
# (appends must be once-per-fill; the memoized index is shared)
_DELTA_APPENDED: set = set()


def _incremental_probe_for(spark: SparkSession, sf_dir: str):
    """Shared persisted-index build + batch probe of the incremental
    rows (``dedup_incremental`` + ``delta_pipeline`` both consume the
    identical cross-pair set — same _memo_df reasoning as the ANN
    rankings: the fill bills to the first consumer). Returns
    ``(index_path, pairs_df)`` so delta_pipeline can also exercise the
    accept-into-index append against the SAME persisted index. Memo
    keyed like _memo_df (content fingerprint + applicationId; a
    checkpointed frame is unusable from another session)."""
    from collection_templates_spark.operators.incremental_dedup import (
        build_minhash_index,
        dedup_batch_against_index,
        scratch_index_path,
    )

    key = (
        sf_dir,
        _table_fingerprint(sf_dir, "documents"),
        spark.sparkContext.applicationId,
    )
    if key not in _INCR_INDEX_MEMO:
        docs = _t(spark, sf_dir, "documents")
        history = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        # unique scratch dir per fill (lifecycle in operators/scratch)
        path = scratch_index_path()
        # bucketed on the probe-join key: the gate thereby exercises
        # the shuffle-eliding bucketed-index path (bucketing changes
        # physical layout only — the pair set is identical)
        build_minhash_index(history, path, bucket_bands=8)
        pairs = dedup_batch_against_index(
            spark, path, batch, max_bucket_size=None
        ).localCheckpoint(eager=True)
        _INCR_INDEX_MEMO[key] = (path, pairs)
    return _INCR_INDEX_MEMO[key]


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a persisted LSH index (round 9, r8
    verdict #2): the even-doc_id half of the corpus is indexed ONCE
    (banded minhash table + hashed shingle sets persisted to a scratch
    path), then the odd half arrives as a batch and probes it — cost
    O(batch + matched state), never a history rescan. Output is the
    CROSS pair set (doc_new=odd, doc_old=even, exact jaccard ≥ 0.5).

    With ``min_band_collisions=1`` (any-band candidacy) and no bucket
    cap, candidacy + exact-Jaccard verify replicate
    ``minhash_lsh_pairs`` exactly, so the DuckDB exact cross-pair SQL
    is the oracle (same banding-miss pin as ``dedup_minhash_lsh``:
    ~1e-4/pair at j=0.5, ≈0 in the j≥0.7 near-dup regime).
    Equivalence to the full-corpus run is pinned by
    tests/test_incremental_dedup.py."""
    return _incremental_probe_for(spark, sf_dir)[1]


def delta_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed incremental story as ONE verifiable surface (round 9,
    r8 verdict #6 — the delta analogue of ``wiki_pipeline_funnel``):
    a document batch lands, probes the persisted dedup index, the
    deduped survivors are accepted into the index, and an event batch
    refreshes the day-partitioned rollup; per-stage delta counts come
    back as (stage, n) rows.

    Stages: ``batch_docs`` (incoming batch size), ``dedup_cross_pairs``
    (near-dup pairs vs history), ``batch_docs_kept`` (batch docs with
    no history match — what ``append_to_index`` accepts),
    ``rollup_days_touched`` (days the event batch dirties),
    ``rollup_rows_total`` (rollup rows after refresh). Every stage is
    a pure count, so the oracle replays the whole pipeline with exact
    SQL (cross pairs via the shared shingle CTE; rollup structure via
    distinct (day, event_type))."""
    from collection_templates_spark.operators.incremental_dedup import (
        append_to_index,
    )
    from collection_templates_spark.operators.rollup_table import (
        refresh_rollup,
        scratch_rollup_path,
    )

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    # index build + probe shared with dedup_incremental (checkpointed
    # pair set — the fill bills to the first consumer)
    path, pairs = _incremental_probe_for(spark, sf_dir)
    matched = pairs.select(F.col("doc_new").alias("doc_id")).distinct()
    kept = batch.join(matched, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    # accept the deduped batch (same bucket spec as the index build) —
    # ONCE per index fill: the memoized index is shared across
    # invocations (check runs, warm bench runs), and re-appending the
    # same batch would stack duplicate doc_ids in bands/shingles,
    # violating append_to_index's id-uniqueness contract (r9 advice)
    if path not in _DELTA_APPENDED:
        append_to_index(kept, path, bucket_bands=8)
        _DELTA_APPENDED.add(path)

    ev = _t(spark, sf_dir, "events")
    cut = "2024-01-20 12:00:00"
    rpath = scratch_rollup_path()
    refresh_rollup(spark, rpath, ev.filter(F.col("ts") < cut))
    rolled = refresh_rollup(spark, rpath, ev.filter(F.col("ts") >= cut))

    def _stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    days_touched = (
        ev.filter(F.col("ts") >= cut)
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
    )
    return (
        _stage("batch_docs", batch)
        .unionByName(_stage("dedup_cross_pairs", pairs))
        .unionByName(_stage("batch_docs_kept", kept))
        .unionByName(_stage("rollup_days_touched", days_touched))
        .unionByName(_stage("rollup_rows_total", rolled))
    )


def _dedup_delete_probe_for(spark: SparkSession, sf_dir: str):
    """Index-build + tombstone-delete + batch-probe fill for
    ``dedup_index_delete`` (own scratch index — the shared
    _incremental_probe_for index must stay delete-free for
    dedup_incremental/delta_pipeline). History = doc_id % 4 == 0
    (bucketed like the shared index), tombstones = doc_id % 8 == 0
    (half the history retracted), batch = odd doc_ids. Memo keyed like
    _memo_df; delete_from_index is idempotent, so a re-fill appending
    the same tombstones to a surviving scratch path stays correct."""
    from collection_templates_spark.operators.incremental_dedup import (
        build_minhash_index,
        dedup_batch_against_index,
        delete_from_index,
        scratch_index_path,
    )

    key = (
        sf_dir,
        _table_fingerprint(sf_dir, "documents"),
        spark.sparkContext.applicationId,
        "tombstone",
    )
    if key not in _INCR_INDEX_MEMO:
        docs = _t(spark, sf_dir, "documents")
        history = docs.filter(F.col("doc_id") % 4 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        path = scratch_index_path()
        build_minhash_index(history, path, bucket_bands=8)
        delete_from_index(
            spark,
            path,
            history.filter(F.col("doc_id") % 8 == 0).select("doc_id"),
        )
        pairs = dedup_batch_against_index(
            spark, path, batch, max_bucket_size=None
        ).localCheckpoint(eager=True)
        _INCR_INDEX_MEMO[key] = (path, pairs)
    return _INCR_INDEX_MEMO[key]


def dedup_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-delete probe of the persisted LSH index (round 14, r13
    verdict #2 — the retraction half of the incremental story):
    doc_id % 4 == 0 docs are indexed, then the % 8 == 0 half is
    RETRACTED via ``delete_from_index`` (an O(delete-batch) tombstone
    append — no base rewrite), and the odd-id batch probes the masked
    index. Output is the surviving cross-pair set (doc_new=odd,
    doc_old ≡ 4 mod 8, exact jaccard ≥ 0.5) — the from-scratch oracle
    indexes only the survivors, so the hash match IS the
    probe ≡ rebuild-from-survivors invariance at gate scale
    (tests/test_index_tombstones.py pins it unit-scale, plus the
    compaction fold and crash-window idempotence)."""
    return _dedup_delete_probe_for(spark, sf_dir)[1]


def text_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring mining (round 7): per doc, the
    coverage and longest run of 5-grams shared with ≥ 2 documents — the
    distributed n-gram-join realization of Lee et al.'s exact substring
    dedup (suffix arrays don't distribute; the gram self-aggregate
    does)."""
    from collection_templates_spark.operators.training_prep import (
        common_substring_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return common_substring_spans(docs, n=5, min_docs=2).withColumnRenamed(
        "doc", "doc_id"
    )


def quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality filter with pinned literal weights (round 6) —
    the fastText/FineWeb-style keep/drop signal as pure native
    expressions, model restated verbatim in the oracle."""
    from collection_templates_spark.operators.training_prep import (
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    return quality_classifier(docs).withColumnRenamed("doc", "doc_id")


def ann_respq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of residual IVF-PQ against brute-force cosine —
    the third quantified ANN-quality signal (LSH, raw PQ, residual PQ),
    fully ORACLED via the same chained replay as ann_respq_topk."""
    brute = _brute_topk_for(spark, sf_dir).select("query_id", "neighbor_id")
    res = (
        _respq_topk_for(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("___hit", F.lit(1))
    )
    return (
        brute.join(res, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("___hit"), F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5")
        )
    )


def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of PQ-ADC top-k against brute-force cosine —
    the quantified lossy-compression signal (≈0.5 on this corpus: 96-bit
    codes over near-random 64-dim vectors is the adversarial case for
    PQ; structured production embeddings fare far better)."""
    brute = _brute_topk_for(spark, sf_dir).select("query_id", "neighbor_id")
    pq = (
        _pq_topk_for(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("___hit", F.lit(1))
    )
    return (
        brute.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("___hit"), F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5")
        )
    )


# embedding near-dup configuration, shared with the generated oracle:
# τ=0.4 matches the synthetic corpus (best cosines ~0.5 — far looser than
# a production near-dup regime, where τ≥0.9 makes LSH far MORE selective).
# 8 planes keep buckets tight (≈ N/256 per table — the quadratic-cost
# guard that must scale with the corpus), 64 tables buy the recall back
# (measured 0.85 vs brute force at sf0.1, 920 true pairs). The oracle
# replays the buckets exactly, so recall misses still hash-match.
_EMB_DUP_CONF = {"n_planes": 8, "n_tables": 64, "threshold": 0.4}


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the embedding leg of the
    dedup suite. Sign-LSH bucket-collect candidates, exact inline cosine
    verification, fully ORACLED via plane-literal replay."""
    from collection_templates_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(
        emb,
        threshold=_EMB_DUP_CONF["threshold"],
        n_planes=_EMB_DUP_CONF["n_planes"],
        n_tables=_EMB_DUP_CONF["n_tables"],
    )


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (round-5 LLM-pipeline extension): per
    training doc (doc_id ≥ 20), the fraction of its distinct word-3-grams
    occurring anywhere in the holdout set (doc_id < 20). Broadcast
    benchmark gram set, single corpus shuffle."""
    from collection_templates_spark.operators.training_prep import (
        ngram_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
    ).withColumnRenamed("doc", "doc_id")


def pack_sequences_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation packing (round-5 LLM-pipeline extension): documents
    laid out per source shard in doc_id order, mapped onto 256-token
    context windows — offset, first window, boundary-straddle flag. One
    shuffle on the shard key, window within shard."""
    from collection_templates_spark.operators.training_prep import (
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        pack_sequences(docs, context_len=256)
        .withColumnRenamed("grp", "source")
        .withColumnRenamed("doc", "doc_id")
    )


def decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (round-5 LLM-pipeline extension): per
    training doc, the longest consecutive run of benchmark-occurring
    3-grams — catches verbatim quoting that the fraction metric dilutes.
    Gaps-and-islands over broadcast-marked gram positions."""
    from collection_templates_spark.operators.training_prep import (
        contamination_spans,
    )

    docs = _t(spark, sf_dir, "documents")
    return contamination_spans(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
    ).withColumnRenamed("doc", "doc_id")


def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (round-5 LLM-pipeline
    extension): engine-portable polynomial hash of 'split:'+id → bucket →
    90/5/5 thresholds. Stable across runs/engines/partitionings — no
    shuffle, no randomness."""
    from collection_templates_spark.operators.training_prep import (
        assign_split,
    )

    docs = _t(spark, sf_dir, "documents")
    return assign_split(docs).select("doc_id", "split_bucket", "split")


def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (round-5 LLM-pipeline
    extension): per-source keep-rates via the portable hash — src0 keeps
    everything, src1 half, src2 a quarter, the rest 10%. Pure filter,
    fully pushable, reproducible across engines and partitionings."""
    from collection_templates_spark.operators.training_prep import (
        sample_stratified,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_stratified(
        docs, {"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.1
    ).select("doc_id", "source", "sample_bucket")


def mixture_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled training-mixture plan (round-5 LLM-pipeline
    extension): per-language token counts → weight ∝ tokens^0.5 → per-
    language token targets, sampling rates and epoch counts for a 100k-
    token budget (the multilingual up-sampling rule)."""
    from collection_templates_spark.operators.training_prep import (
        mixture_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    return mixture_plan(docs, target_tokens=100_000).withColumnRenamed(
        "grp", "lang"
    )


def vocab_oov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + OOV rate (round-5 LLM-pipeline extension):
    top-16 corpus tokens by (count desc, token) become the vocab
    (TakeOrdered top-V, not a global window); per-doc out-of-vocabulary
    fraction via broadcast join."""
    from collection_templates_spark.operators.training_prep import vocab_oov

    docs = _t(spark, sf_dir, "documents")
    return vocab_oov(docs, vocab_size=16).withColumnRenamed("doc", "doc_id")


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate fraction (round-5 LLM-pipeline extension):
    2-grams occurring in ≥ 40 distinct documents are boilerplate; per doc
    the fraction of its distinct grams that are. The frequency threshold
    caps the boilerplate set's size, so the join back is a broadcast."""
    from collection_templates_spark.operators.training_prep import (
        boilerplate_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_stats(docs, min_df=40, n=2).withColumnRenamed(
        "doc", "doc_id"
    )


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (round-5 LLM-pipeline extension):
    MOSS-style windowed-min selection over 8-char Karp-Rabin rolling
    hashes (window 4) — per doc the selected-fingerprint count, density
    and a position-sensitive checksum pinning the exact selected set."""
    from collection_templates_spark.operators.text_analysis import (
        winnowing_summary,
    )

    docs = _t(spark, sf_dir, "documents")
    return winnowing_summary(docs, k=8, w=4).withColumnRenamed(
        "doc", "doc_id"
    )


def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style copy detection (round-5 LLM-pipeline extension): doc
    pairs sharing ≥ 2 winnowing fingerprint values (k=20, w=8), scored by
    containment = shared / min fingerprint-set size — catches a short doc
    pasted into a long one, which Jaccard dilutes to ~0. Inverted-index
    bucket-collect on the hash value; the 500-bucket hot cap never fires
    at this 500-doc corpus, so the counts are exact for the oracle."""
    from collection_templates_spark.operators.text_analysis import (
        winnowing_containment_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    return winnowing_containment_pairs(docs, k=20, w=8, min_shared=2)


def export_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export manifest (round-5 LLM-pipeline extension): per
    (split, shard) doc and token counts under deterministic hash
    sharding, shard counts sized from each split's token total — the
    assignment the partitioned shard writer materializes, fully in-flow
    (per-split totals broadcast back, nothing on the driver)."""
    from collection_templates_spark.operators.export import export_manifest

    docs = _t(spark, sf_dir, "documents")
    return export_manifest(docs, tokens_per_shard=5000)


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style top-2-gram repetition fraction per document (round-5
    LLM-pipeline extension): boilerplate/template spam scores high."""
    from collection_templates_spark.operators.training_prep import (
        repetition_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    return repetition_stats(docs, n=2).withColumnRenamed("doc", "doc_id")


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (round-5 LLM-pipeline extension): the documents are
    deterministically augmented with synthetic email/phone/IP strings
    (the corpus itself is clean), then scrubbed with the engine-portable
    PII_PATTERNS — the oracle replays the augmentation and the redaction
    byte-for-byte, proving the regex machinery is cross-engine."""
    from collection_templates_spark.operators.pii import redact_pii as _redact

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com (555) 123-4567 ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return _redact(aug).select(
        "doc_id",
        F.col("text_redacted").alias("clean_text"),
        "n_email",
        "n_phone",
        "n_ipv4",
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish piece counting, punctuation/stopword ratios,
    composite quality score — all native column expressions."""
    from collection_templates_spark.operators.text_analysis import with_text_stats

    docs = _t(spark, sf_dir, "documents")
    out = with_text_stats(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_bpe_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with deterministic tie-breaks."""
    from collection_templates_spark.operators.text_analysis import with_language_id

    docs = _t(spark, sf_dir, "documents")
    return with_language_id(docs).select("doc_id", "lang_pred")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial document fingerprint (portable integer
    arithmetic: h = h*31 + code mod 2^31-1)."""
    from collection_templates_spark.operators.text_analysis import with_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return with_fingerprint(docs).select("doc_id", "fingerprint")


def text_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 analog: per-source token frequency table (explode + count)."""
    from collection_templates_spark.operators.search import token_frequencies

    docs = _t(spark, sf_dir, "documents")
    return token_frequencies(docs, min_count=5).select(
        F.col("grp").alias("source"), "token", "n"
    )


def search_bm25ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 batch search analogue: TF-IDF scoring of a fixed query over the
    documents corpus, deterministic top-20."""
    from collection_templates_spark.operators.search import search_corpus

    docs = _t(spark, sf_dir, "documents")
    return search_corpus(docs, "spark hash join", k=20)


# the fixed demo query for the stemmed/LTR search: every term is an
# inflected form whose single-pass stem matches a corpus token's stem
# (sorted→sort, tables→table, hashing→hash, queries→query, keys→key) —
# stemming is exercised on BOTH sides, not a no-op.
_STEMMED_QUERY = "sorted tables hashing queries keys"
_LTR_WEIGHTS = {"bm25": 1.0, "n_chars": 3.0}


def search_stemmed_ltr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 analyzer-grade search: suffix-stemmed BM25 (k1=1.2, b=0) +
    rank_feature saturation on n_chars (pivot = geometric mean, the ES
    default) + linear rescore of the top-50 at query_weight 0 — the batch
    re-expression of the reference's english_stemmer/BM25_b0 mapping and
    sltr rescore (populate.py:86-153, search.py:14-94). Fully ORACLED:
    the stemmer CASE chain in the oracle SQL is generated from the same
    SUFFIX_RULES table the Spark expression compiles from."""
    from collection_templates_spark.operators.search import (
        search_corpus_stemmed,
    )

    docs = _t(spark, sf_dir, "documents")
    return search_corpus_stemmed(
        docs,
        _STEMMED_QUERY,
        k=20,
        feature_cols=("n_chars",),
        rescore_weights=_LTR_WEIGHTS,
    )


def ltr_train_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise LTR training (operators/ltr.ltr_train_weights): fit
    rel ~ ov + sat on the deterministic judgment table via exact
    DECIMAL normal equations — the batch analogue of training the
    RankLib model configure-ltr.py uploads (reference
    research/learning-to-rank/configure-ltr.py:128-156)."""
    from collection_templates_spark.operators.ltr import (
        ltr_train_weights as _train,
    )

    return _train(_t(spark, sf_dir, "documents"))


def ltr_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 A/B of the trained pointwise ranker vs the no-LTR
    baseline (operators/ltr.ltr_ndcg_eval), per query — the reference's
    compare_window_sizes.py:191-211 NDCG formula and
    evaluate_endpoints.py endpoint comparison, re-expressed as windows
    over the judged table."""
    from collection_templates_spark.operators.ltr import (
        ltr_ndcg_eval as _eval,
    )

    return _eval(_t(spark, sf_dir, "documents"))


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: 32-token windows with stride 24 (8-token
    overlap), last partial window kept — all native array ops."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(24))
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda s: F.slice(toks, s, 32))
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", "chunk").alias("chunk_text"),
        F.size("chunk").alias("n_chunk_tokens"),
    )


def ann_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (IVF coarse-quantizer build step),
    long format: (label, dim, centroid value)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame: running per-user cumulative sum over event
    time (rows unbounded-preceding → current)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations in one pass: null ratios, uniqueness,
    accepted values, plus referential integrity via anti-join."""
    from collection_templates_spark.operators.quality_checks import (
        referential_integrity,
        run_checks,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rep = run_checks(
        orders,
        not_null=("o_orderkey", "o_custkey"),
        unique=("o_orderkey",),
        accepted_values={"o_orderstatus": ("O", "F", "P")},
    ).unionByName(referential_integrity(orders, "o_custkey", customer, "c_custkey"))
    return rep.select(
        F.col("check").alias("check_name"),
        F.col("column").alias("col_name"),
        F.round("metric", 6).alias("metric"),
        F.col("ok").cast("int").alias("ok"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing: documents → media table (UTF-8 payload) →
    Arrow-batched mapInPandas feature extraction (deterministic fake decode).
    """
    from collection_templates_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )

    docs = _t(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs))


def text_word_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language model over the documents corpus (langmodel.py —
    the public-equivalent of the reference's external NameRank table,
    create_merged.py:942-943): (token, n, Laplace-smoothed log_prob).
    One partial-agg shuffle; the totals ride along as a 1-row broadcast.
    Serves from the memoized shared unigram model (r7 verdict #3) —
    expression-identical to a direct word_frequency_model build."""
    return _unigram_model_for(spark, sf_dir).select(
        "token", "n", F.round("log_prob", 6).alias("log_prob")
    )


def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram perplexity under the corpus's own word model
    (round-5 LLM-pipeline extension) — the CCNet-style LM quality
    filter. Model + totals broadcast; one per-doc re-aggregation. Rides
    the shared pair stream + memoized unigram model (r7 verdict #3)."""
    from collection_templates_spark.functions.langmodel import doc_perplexity

    docs = _t(spark, sf_dir, "documents")
    return doc_perplexity(
        docs,
        model=_unigram_model_for(spark, sf_dir),
        pairs=_perplexity_pairs_for(spark, sf_dir),
    ).withColumnRenamed("doc", "doc_id")


def scalar_log_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10 real scoring: every part name scored against the documents
    unigram model — log_probability = Σ ln((n+1)/(N+V)) over space-split
    tokens (OOV takes the smoothed floor), interesting_score = geometric
    mean probability. Model broadcast; one per-name re-aggregation.
    Serves from the memoized shared unigram model (r7 verdict #3)."""
    from collection_templates_spark.functions.langmodel import score_names

    part = _t(spark, sf_dir, "part")
    names = part.select(
        "p_partkey",
        F.col("p_name").alias("name"),
        F.split(F.lower("p_name"), " ").alias("tokens"),
    )
    scored = score_names(names, _unigram_model_for(spark, sf_dir))
    return scored.select(
        "p_partkey",
        "name",
        F.round("log_probability", 4).alias("log_probability"),
        F.round("interesting_score", 6).alias("interesting_score"),
    )


def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup stats (Dolma/RefinedWeb passage pass):
    16-token non-overlapping chunks, cross-document exact-match flags,
    per-doc duplicate ratio + drop decision. Oracle replays the identical
    chunking with string_split + generate_series."""
    from collection_templates_spark.operators.dedup import (
        paragraph_dedup_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    return paragraph_dedup_stats(docs, chunk_tokens=16)


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked near-dup retention: LSH pairs → transitive clusters
    → keep the HIGHEST-QUALITY doc per cluster (n_chars desc, doc_id asc
    tie-break) instead of the arbitrary min-id canonical. Oracle:
    recursive-CTE reachability + a window argmax."""
    from collection_templates_spark.operators.clustering import (
        dedup_keep_best as _keep_best,
    )

    docs = _t(spark, sf_dir, "documents")
    # Same pair source AND the same memoized CC pass as dedup_clusters
    # (r9 verdict perf watch) — only the retention window differs.
    return _keep_best(
        docs,
        pairs=None,
        quality_cols=["n_chars"],
        cc=_lsh_cc_for(spark, sf_dir),
    ).select("doc_id", "cluster", "keep")


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream: users grouped by
    first-seen ISO week; for each (cohort_week, week_offset) the count of
    still-active users and the retention rate vs the cohort size. Plan:
    one distinct on (user, week), one per-user min, a user-keyed join,
    one (cohort, week) aggregate; the per-cohort size table is tiny
    (#distinct weeks) and broadcast into the final join."""
    ev = _t(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    act = (
        weeks.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        act.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") / F.col("cohort_n"), 6).alias(
                "retention_rate"
            ),
        )
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the 1995 customer co-purchase graph
    (edges = customer pairs sharing ≥2 distinct parts that year — the
    thresholded co-occurrence projection that keeps a projection graph
    sparse; the one-year slice is the graph_pagerank convention, and the
    date filter pushes to the orders scan). Pair generation is a plain
    codegen'd self-join on the part key — the upstream is ONE cheap
    distinct, so the bucket-collect trade (shuffle-once but interpreted
    array enumeration) measures 2× SLOWER here; bucket-collect wins only
    when the per-side upstream is the expensive part (see dedup.py).
    The count itself is the degree-oriented wedge join
    (graph.py::triangle_count). Oracle: the projection + the exact
    three-way a<b<c edge join."""
    from collection_templates_spark.operators.graph import triangle_count

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cp = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        # both self-join sides read cp; the cut runs the orders⋈lineitem
        # upstream once (ReuseExchange can't help — the join needs a
        # different partitioning than the distinct produced)
        .localCheckpoint(eager=True)
    )
    a = cp.select(F.col("c").alias("u"), "p")
    b = cp.select(F.col("c").alias("v"), "p")
    edges = (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    return triangle_count(edges, "u", "v")


def sketch_quantile_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sampled quantile estimates of the lineitem
    price distribution vs exact quantiles — the order-statistics member
    of the sketch family (CMS/HLL/theta/Bloom), same surface-the-error
    convention. The sample key is the unique (l_orderkey, l_linenumber)
    row id folded through the portable mixer; both engines interpolate
    with the (n−1)·q convention."""
    from collection_templates_spark.operators.sketches import (
        hash_sampled_quantiles,
    )

    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    return hash_sampled_quantiles(
        li, "l_extendedprice", key, sample_mod=16
    )


def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit over lineitem: rows binned to the
    8-bit (l_partkey % 256, l_suppkey % 256) grid, bucketed 16 ways by
    the top Morton bits vs the top x bits, per-bucket bounding
    rectangles surfaced (layout.zorder_layout_stats). The oracle
    replays the interleave bit-for-bit via layout.zorder_sql_expr — the
    oracle row IS the zorder_value/zorder_sql_expr equivalence proof.
    One map + one map-side-combined aggregate; no sort, no window."""
    from collection_templates_spark.operators.layout import (
        zorder_layout_stats,
    )

    li = _t(spark, sf_dir, "lineitem")
    return zorder_layout_stats(
        li,
        F.col("l_partkey") % 256,
        F.col("l_suppkey") % 256,
        n_buckets=16,
        bits=8,
    )


def temporal_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily grid with forward-fill over the events
    stream (temporal.gap_fill — the TimescaleDB gapfill+locf shape):
    last observation per (user, day) by (ts, event_id) DESC, a
    sequence-exploded day grid per user span, LOCF window. Grid size is
    users × ≤30 days — linear in keys, never in events."""
    from collection_templates_spark.operators.temporal import gap_fill

    ev = _t(spark, sf_dir, "events")
    out = gap_fill(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        order_cols=("ts", "event_id"),
    )
    return out.select(
        "user_id",
        "day",
        F.round("obs_value", 6).alias("obs_value"),
        F.round("filled_value", 6).alias("filled_value"),
        "is_observed",
    )


def events_trailing_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags per event_type
    (temporal.trailing_zscore): each value vs the mean/stddev of its 20
    predecessors (frame EXCLUDES the current row), NULL score under 5
    predecessors, |z| ≥ 2 flagged. mean/stddev rounded to 6dp BEFORE
    the z arithmetic in both engines. ONE shuffle (the window)."""
    from collection_templates_spark.operators.temporal import (
        trailing_zscore,
    )

    ev = _t(spark, sf_dir, "events")
    out = trailing_zscore(
        ev,
        part_col="event_type",
        value_col="value",
        order_cols=("ts", "event_id"),
        window=20,
        min_n=5,
        threshold=2.0,
    )
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        "n_prev",
        "mu",
        "sigma",
        "z",
        "is_anomaly",
    )


def quality_dynamic_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language dynamic quality gating
    (training_prep.dynamic_quality_threshold — the CCNet/FineWeb
    per-language cut): type-token ratio ranked within each lang,
    top 60 % kept. ttr rounded to 6dp BEFORE ranking in both engines;
    total order (ttr DESC, doc_id ASC). One explode + per-doc
    aggregate, one per-group window."""
    from collection_templates_spark.operators.training_prep import (
        dynamic_quality_threshold,
    )

    docs = _t(spark, sf_dir, "documents")
    return dynamic_quality_threshold(
        docs, group_col="lang", id_col="doc_id", text_col="text",
        keep_fraction=0.6,
    )


def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix
    (training_prep.cross_source_overlap): exact 16-token passages
    shared between every source pair + passage-set Jaccard — chunking
    identical to dedup_paragraph. Join fan-out bounded by the source
    count (20), never corpus size."""
    from collection_templates_spark.operators.training_prep import (
        cross_source_overlap,
    )

    docs = _t(spark, sf_dir, "documents")
    return cross_source_overlap(
        docs, source_col="source", text_col="text", chunk_tokens=16
    )


def drift_js_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/drift.js_divergence): the
    per-event-type value distribution of the first half of January vs
    the second, 16 equi-width bins over the pinned [0, 500] domain,
    Jensen–Shannon divergence per type. One map-side-combined binning
    aggregate; the divergence arithmetic runs on the 16×2-row-per-type
    histogram frame."""
    from collection_templates_spark.operators.drift import js_divergence

    ev = _t(spark, sf_dir, "events")
    split = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"), F.lit("early")
    ).otherwise(F.lit("late"))
    return js_divergence(
        ev,
        group_col="event_type",
        value_col="value",
        split=split,
        split_a="early",
        split_b="late",
        n_bins=16,
        lo=0.0,
        hi=500.0,
    )


def stats_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization audit (operators/stats.winsorize_stats):
    l_extendedprice clipped at the per-returnflag 5th/95th exact
    percentiles; cut values 6dp-rounded BEFORE any comparison so the
    (n−1)·q interpolation can never flip a row's classification
    between engines. Exact percentile = the oracle-checkable semantics
    of the approx_percentile 100 TB pass."""
    from collection_templates_spark.operators.stats import winsorize_stats

    li = _t(spark, sf_dir, "lineitem")
    return winsorize_stats(
        li, "l_returnflag", "l_extendedprice", p_lo=0.05, p_hi=0.95
    )


def text_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token PMI collocations (text_analysis.token_pmi) over
    the documents corpus, pairs under 5 occurrences cut. Rides the
    memoized perplexity pair stream (_perplexity_pairs_for) — one
    vocab²-bounded aggregate, no corpus re-explode."""
    from collection_templates_spark.operators.text_analysis import (
        token_pmi,
    )

    docs = _t(spark, sf_dir, "documents")
    return token_pmi(
        docs, min_count=5, pairs=_perplexity_pairs_for(spark, sf_dir)
    )


def events_state_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands state history (temporal.state_islands): each
    user's event_type stream collapsed into consecutive-run validity
    intervals (the SCD2 build step). One shuffle — lag, running sum,
    island aggregate and lead all partition by user."""
    from collection_templates_spark.operators.temporal import state_islands

    ev = _t(spark, sf_dir, "events")
    return state_islands(
        ev,
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        order_cols=("ts", "event_id"),
    )


def dedup_cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size report — the audit a dedup pass publishes:
    one row per cluster SIZE with the number of clusters that size, the
    docs they hold, and the docs a keep-one policy would drop
    (size − 1 each). Singletons (docs in no pair) count as size 1.
    Rides the shared memoized CC labels (_lsh_cc_for) — this row costs
    two tiny aggregates on top of it."""
    docs = _t(spark, sf_dir, "documents")
    cc = _lsh_cc_for(spark, sf_dir)
    labeled = (
        docs.join(cc, docs.doc_id == cc.node, "left")
        .select(F.coalesce("cluster", F.col("doc_id")).alias("cluster"))
    )
    sizes = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("size").cast("long").alias("size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            ((F.col("size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_dropped_keep_one"),
        )
    )


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert statistics: for each user with a purchase
    STRICTLY after their first view, the lag between the two; one
    summary row (n_converted, mean/min/max lag seconds, exact median
    via the shared (n−1)·q percentile convention). Two type-filtered
    min-aggregates + one user-keyed join — the window_funnel plan shape
    reduced to its lag."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_buy")
    )
    lag = (
        p.join(v, "user_id")
        .filter(F.col("t_buy") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t_buy").alias("t_buy"), F.min("t_view").alias("t_view"))
        .select(
            (
                F.unix_micros("t_buy") - F.unix_micros("t_view")
            ).cast("double").alias("lag_us")
        )
    )
    sec = F.col("lag_us") / F.lit(1000000.0)
    return lag.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.avg(sec), 4).alias("mean_lag_sec"),
        F.round(F.min(sec), 4).alias("min_lag_sec"),
        F.round(F.max(sec), 4).alias("max_lag_sec"),
        F.round(F.percentile(sec, F.lit(0.5)), 4).alias("median_lag_sec"),
    )


def drift_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t per event_type between the two
    January halves (drift.welch_t_by_group — the parametric companion
    of drift_js_events, same split). One moments aggregate + arithmetic
    on the groups×2 frame; t and df computed FROM 6dp-rounded
    means/variances so both engines replay identically."""
    from collection_templates_spark.operators.drift import welch_t_by_group

    ev = _t(spark, sf_dir, "events")
    split = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"), F.lit("early")
    ).otherwise(F.lit("late"))
    return welch_t_by_group(
        ev, "event_type", "value", split, "early", "late"
    )


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus token distribution
    (text_analysis.zipf_fit): OLS slope of ln(freq) vs ln(rank) for the
    top 1000 terms, closed form over 6dp-rounded sums. Rides the
    memoized token stream."""
    from collection_templates_spark.operators.text_analysis import zipf_fit

    docs = _t(spark, sf_dir, "documents")
    return zipf_fit(
        docs,
        tokens_df=_perplexity_pairs_for(spark, sf_dir).select("token"),
    )


def basket_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-occurring in the same order
    (support ≥ 2) with their lift — the frequent-itemset primitive at
    the pair level. Self-equi-join on the order key: per-order fan-out
    is basket² (TPC-H baskets are ≤ 7 lines), never corpus²; item
    supports broadcast for the lift denominator. The order count rides
    as a broadcast 1-row aggregate (the Q11 broadcast-scalar shape, r15)
    instead of a driver ``collect`` — no separate job, no serialized
    driver action, and the basket distinct exchange is shared with the
    pair/support branches instead of re-run."""
    li = _t(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = basket.select("o").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("___n")
    )
    a = basket.select("o", F.col("p").alias("p1"))
    b = basket.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    sup = basket.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    s1 = F.broadcast(sup.select(F.col("p").alias("p1"), F.col("s").alias("s1")))
    s2 = F.broadcast(sup.select(F.col("p").alias("p2"), F.col("s").alias("s2")))
    n = F.col("___n")
    return (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            F.col("support").cast("long").alias("support"),
            F.round(
                (F.col("support").cast("double") / n)
                / (
                    (F.col("s1").cast("double") / n)
                    * (F.col("s2").cast("double") / n)
                ),
                6,
            ).alias("lift"),
        )
    )


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (raw tf × ln(N/df), ties broken
    alphabetically) — the classic keyword extractor. Rides the memoized
    perplexity pair stream for the token explode; df and N are
    vocab-bounded / scalar aggregates; top-k is the engine's partial
    group-limit (one window above the rank filter). N rides as a
    broadcast 1-row aggregate (the Q11 broadcast-scalar shape, r15)
    instead of a driver ``collect`` — one job instead of two, no
    serialized driver action in the query path."""
    pairs = _perplexity_pairs_for(spark, sf_dir)
    tf = pairs.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = pairs.select("doc").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("___n")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(F.broadcast(n_docs))
        .select(
            F.col("doc").alias("doc_id"),
            "token",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("___n") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "token", "tfidf")
    )


def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one full-outer join
    (snapshot_diff.merge_upsert — the APPLY complement of
    produce_update_operations): a deterministic change batch over the
    customer table (custkey%10==0 → segment update, %10==1 → delete,
    %10==2 → re-keyed insert) applied to the base; output is the
    post-merge table."""
    from collection_templates_spark.operators.snapshot_diff import (
        merge_upsert,
    )

    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    upd = base.filter(F.col("k") % 10 == 0).select(
        "k", F.lit("UPDATED").alias("seg"), "bal", F.lit("update").alias("op")
    )
    dele = base.filter(F.col("k") % 10 == 1).select(
        "k", "seg", "bal", F.lit("archive").alias("op")
    )
    ins = base.filter(F.col("k") % 10 == 2).select(
        (F.col("k") + 1000000).alias("k"), "seg", "bal",
        F.lit("insert").alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    return merge_upsert(base, changes, key_col="k")


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (graph.label_propagation, 3 sweeps, min-label ties) over the same
    1995 co-purchase projection as graph_triangle_count. Per sweep: one
    |E| join + one map-side-combined count + one degree-bounded argmax
    window. Oracle unrolls the three sweeps as CTEs."""
    from collection_templates_spark.operators.graph import (
        label_propagation,
    )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cp = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = cp.select(F.col("c").alias("u"), "p")
    b = cp.select(F.col("c").alias("v"), "p")
    edges = (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    return label_propagation(edges, "u", "v", iterations=3)


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group weighted median (stats.weighted_median — the
    lower weighted median, no interpolation): l_extendedprice weighted
    by l_quantity per returnflag. One cumulative-weight window shuffle;
    quantities are integer-valued so every cumulative sum is exact in
    both engines."""
    from collection_templates_spark.operators.stats import weighted_median

    li = _t(spark, sf_dir, "lineitem")
    return weighted_median(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


def text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document script composition (text_analysis.script_mix):
    codepoint-range counts/fractions of latin/cjk/digit/space/other,
    deterministic dominant script, mixed-script flag — the
    multilingual-corpus audit. One explode + one map-side-combined
    per-doc aggregate."""
    from collection_templates_spark.operators.text_analysis import (
        script_mix,
    )

    docs = _t(spark, sf_dir, "documents")
    return script_mix(docs)


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the per-user event-type
    stream: P(next | current) with counts, over the unique (ts,
    event_id) order. The sequence-mining companion of the funnel/island
    rows — one lag window (single shuffle) + one pair aggregate;
    output is |types|² rows regardless of corpus size."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("cur"),
            F.col("event_type").alias("nxt"),
        )
        .filter(F.col("cur").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (
        pairs.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("n_cur").cast("double"), 6
            ).alias("p"),
        )
    )


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY under the external gate
    (sketches.hll_union_cardinality): registers built independently per
    corpus half, max-merged, the merged estimate graded against the
    union's exact distinct count AND against the single-pass registers
    (mismatch count — 0 by the max-merge identity, computed not
    assumed). Mergeability is what makes the sketch distributed:
    shards sketch alone, the combine is m rows."""
    from collection_templates_spark.operators.sketches import (
        hll_union_cardinality,
    )

    docs = _t(spark, sf_dir, "documents")
    return hll_union_cardinality(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


_ANN_INDEX_MEMO: dict = {}


def _ann_index_probe_for(spark: SparkSession, sf_dir: str):
    """Shared persisted-IVF-index build + batch probe (even vec_ids
    indexed, odd vec_ids < 16 arriving as the batch) — the vector-side
    sibling of _incremental_probe_for, same memo reasoning (the fill
    bills to the first consumer; keyed by content fingerprint +
    applicationId)."""
    from collection_templates_spark.operators.incremental_ann import (
        ann_batch_against_index,
        build_ivf_index,
        scratch_ann_index_path,
    )

    key = (
        sf_dir,
        _embeddings_fingerprint(sf_dir),
        spark.sparkContext.applicationId,
    )
    if key not in _ANN_INDEX_MEMO:
        emb = _t(spark, sf_dir, "embeddings")
        history = emb.filter(F.col("vec_id") % 2 == 0)
        batch = emb.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 16)
        )
        path = scratch_ann_index_path()
        build_ivf_index(history, path)
        topk = ann_batch_against_index(
            spark, path, batch
        ).localCheckpoint(eager=True)
        _ANN_INDEX_MEMO[key] = (path, topk)
    return _ANN_INDEX_MEMO[key]


def ann_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN against a persisted IVF index
    (operators/incremental_ann — the vector-side sibling of
    dedup_incremental): the even half of the embeddings corpus is
    indexed ONCE (coarse quantizer + cluster-partitioned lists written
    to a scratch path), then an odd-id batch probes it — probe IO is
    the probed partitions only (static partition-filter pushdown,
    pinned by a plan test; Spark's DPP declines this join shape — see
    the incremental_ann module doc), cost O(batch + probed lists).
    Deterministic end to end
    (6dp trainer/probe/ranking convention), so the DuckDB oracle
    replays the whole chain with the corpus/query split applied to the
    shared IVF CTEs; equivalence to the direct ivf_cosine_topk run is
    pinned by tests/test_incremental_ann.py."""
    return _ann_index_probe_for(spark, sf_dir)[1]


def _ann_delete_probe_for(spark: SparkSession, sf_dir: str):
    """IVF build + tombstone-delete + probe fill for
    ``ann_index_delete`` (own scratch index; the shared
    _ann_index_probe_for index stays delete-free). Same even/odd
    split as the shared fill, then vec_id % 8 == 0 is retracted —
    the quantizer was trained on the FULL even half (the IVF
    contract: deletes shrink lists, never retrain), which is exactly
    what the oracle's list_pred-filtered CTE replays."""
    from collection_templates_spark.operators.incremental_ann import (
        ann_batch_against_index,
        build_ivf_index,
        delete_from_ivf_index,
        scratch_ann_index_path,
    )

    key = (
        sf_dir,
        _embeddings_fingerprint(sf_dir),
        spark.sparkContext.applicationId,
        "tombstone",
    )
    if key not in _ANN_INDEX_MEMO:
        emb = _t(spark, sf_dir, "embeddings")
        history = emb.filter(F.col("vec_id") % 2 == 0)
        batch = emb.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 16)
        )
        path = scratch_ann_index_path()
        build_ivf_index(history, path)
        delete_from_ivf_index(
            spark,
            path,
            history.filter(F.col("vec_id") % 8 == 0).select("vec_id"),
        )
        topk = ann_batch_against_index(
            spark, path, batch
        ).localCheckpoint(eager=True)
        _ANN_INDEX_MEMO[key] = (path, topk)
    return _ANN_INDEX_MEMO[key]


def ann_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-delete probe of the persisted IVF index (round 14, r13
    verdict #2): the even-id half is indexed, the % 8 == 0 quarter is
    RETRACTED via ``delete_from_ivf_index`` (tombstone append — the
    inverted lists are not rewritten, the quantizer is untouched),
    and the odd-id batch probes the masked index. The oracle replays
    the IVF chain with the quantizer trained on the FULL even half
    but the candidate lists restricted to survivors (list_pred) —
    hash-matching it is the probe ≡ delete-aware-index invariance;
    tests/test_index_tombstones.py pins probe ≡ same-centroid scan of
    survivors plus the compaction fold."""
    return _ann_delete_probe_for(spark, sf_dir)[1]


def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (temporal.window_funnel — ClickHouse
    windowFunnel semantics): view → click → purchase strictly ordered
    within 7 days of each user's first view; per-stage user counts and
    conversion vs stage 1. k−1 user-keyed joins, no event-stream
    window."""
    from collection_templates_spark.operators.temporal import window_funnel

    ev = _t(spark, sf_dir, "events")
    return window_funnel(
        ev, steps=("view", "click", "purchase"), window_days=7
    )


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join equivalence under the external oracle
    (operators/skew.salted_join, previously pytest-only): orders ⋈
    customer with the dim side replicated 8× and the fact side
    deterministically salted on o_orderkey, aggregated per market
    segment. The salt changes the shuffle key, never the result — the
    oracle is the PLAIN join."""
    from collection_templates_spark.operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(
        orders, cust, key="o_custkey", salt_factor=8,
        salt_source="o_orderkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )



# ---------------------------------------------------------------------------
# Round-11 additions: statistical tests, anomaly/change-point, product
# analytics, graph core/link-prediction, readability/entropy/Gopher
# quality, SQ8 quantization, reservoir sampling
# ---------------------------------------------------------------------------


def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test (stats.ks_test_2sample):
    do BUILDING and MACHINERY customers draw order totals from the same
    distribution? Exact step-CDF D over pooled distinct values, integer
    CDF arithmetic, alpha=0.05 critical value."""
    from collection_templates_spark.operators.stats import ks_test_2sample

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    oc = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_totalprice", "c_mktsegment"
    )
    return ks_test_2sample(
        oc, "c_mktsegment", "o_totalprice", "BUILDING", "MACHINERY"
    )


def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event type vs weekday
    (stats.chi_square_independence): integer contingency marginals,
    9dp-per-cell contributions, Cramer's V effect size. Weekday is
    (dayofmonth-1) % 7 — engine-portable (no locale-dependent dow
    builtin) and the true weekday for this corpus's epoch."""
    from collection_templates_spark.operators.stats import (
        chi_square_independence,
    )

    ev = _t(spark, sf_dir, "events")
    wd = ((F.dayofmonth("ts") - 1) % 7).alias("wd")
    return chi_square_independence(
        ev.select("event_type", wd), "event_type", "wd"
    )


def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + covariance over lineitem's four
    numeric columns (stats.correlation_matrix): every moment accumulates
    as DECIMAL (exact — no FP summation-order exposure), the closed
    forms run on exact inputs, ONE map-side-combined pass for all six
    pairs."""
    from collection_templates_spark.operators.stats import (
        correlation_matrix,
    )

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )


def _daily_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (event_type, day, v) daily-total series: v is the exact
    DECIMAL(18,2) day total cast to double — identical in both engines
    regardless of row order, the determinism anchor for the MAD and
    CUSUM rows."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("v")
    )


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation anomaly flags over per-type daily
    revenue (temporal.mad_anomalies): the robust control chart — exact
    interpolated median/MAD rounded 6dp before the 3-sigma-equivalent
    (1.4826 scale) compare."""
    from collection_templates_spark.operators.temporal import mad_anomalies

    return mad_anomalies(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate per event type
    (temporal.cusum_changepoint): cumulative deviation from the series
    mean with DECIMAL-exact prefix sums, earliest-argmax tie rule —
    Page's classic single-shift detector over the daily series."""
    from collection_templates_spark.operators.temporal import (
        cusum_changepoint,
    )

    return cusum_changepoint(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution
    (product_analytics.attribution_summary): every purchase credits the
    earliest and latest strictly-before event of its user (tuple order
    on (ts, event_id) — the conversion_lag anchoring), rolled up per
    channel with shares."""
    from collection_templates_spark.operators.product_analytics import (
        attribution_summary,
    )

    return attribution_summary(_t(spark, sf_dir, "events"))


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of customers from orders
    (product_analytics.rfm_segments): ntile(4) cuts with (metric,
    custkey) total order, DECIMAL-exact monetary, <=64 segment cells."""
    from collection_templates_spark.operators.product_analytics import (
        rfm_segments,
    )

    return rfm_segments(_t(spark, sf_dir, "orders"))


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths (product_analytics.top_paths): sessionize
    (6h gap — wide enough that this sparse stream forms multi-event
    sessions), join the first 3 event types per session with '>', count,
    top-20 with path tie-break."""
    from collection_templates_spark.operators.product_analytics import (
        top_paths,
    )

    return top_paths(
        _t(spark, sf_dir, "events"), gap_minutes=360, path_len=3, k=20
    )


def _copurchase_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-part bipartite edges via orders: the sparse graph the
    k-core and link-prediction rows peel (node ids prefixed 'c'/'p' so
    the two sides can't collide)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-sweep k-core peeling (graph.kcore_stats, k=20, 4 sweeps)
    on the customer-part bipartite graph: nodes/edges surviving each
    peel — integer-exact, oracle replays the sweeps as unrolled CTEs."""
    from collection_templates_spark.operators.graph import kcore_stats

    return kcore_stats(
        _copurchase_bipartite(spark, sf_dir), k=20, sweeps=4
    )


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Jaccard link prediction
    (graph.link_prediction_jaccard) over the 1995-window customer-part
    graph (the LPA projection convention — the full-history graph is
    wedge-dense enough that this one row would dominate the bench;
    capping the window keeps the measured shape while the operator
    stays general): capped wedge generation (center degree <= 64),
    true-degree Jaccard, top-20 with total tie order."""
    from collection_templates_spark.operators.graph import (
        link_prediction_jaccard,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    return link_prediction_jaccard(edges, max_center_degree=64, k=20)


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch / Flesch-Kincaid readability
    (text_analysis.readability_stats): vowel-group syllable proxy,
    sentence-run proxy, per-row exact arithmetic — no summation-order
    exposure anywhere."""
    from collection_templates_spark.operators.text_analysis import (
        readability_stats,
    )

    return readability_stats(_t(spark, sf_dir, "documents"))


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character Shannon entropy
    (text_analysis.char_entropy): 9dp-per-term ln-based bits (explicit
    ln2 literal — never an engine's log2), 6dp sums — the
    gibberish/compression proxy filter."""
    from collection_templates_spark.operators.text_analysis import (
        char_entropy,
    )

    return char_entropy(_t(spark, sf_dir, "documents"))


def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate per source
    (training_prep.gopher_quality_rules): word-count bounds, mean word
    length, symbol ratio, alpha-word fraction, stopword probe — per-rule
    failure counts and the all-rules pass fraction, 6dp-rounded ratios
    before every threshold compare."""
    from collection_templates_spark.operators.training_prep import (
        gopher_quality_rules,
    )

    return gopher_quality_rules(_t(spark, sf_dir, "documents"))


def sample_reservoir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source k-sample (training_prep.sample_reservoir):
    minwise portable hash folded mod a large prime (the raw two-fold
    hash is near-monotone over sequential ids), k=5 per source —
    stable across engines, runs, partitionings and appends."""
    from collection_templates_spark.operators.training_prep import (
        sample_reservoir,
    )

    return sample_reservoir(_t(spark, sf_dir, "documents"), k=5)


def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of SQ8 scalar quantization against brute
    cosine (similarity.sq8_cosine_topk): 8-bit/dim keeps recall at 1.0
    on this corpus where 96-bit PQ codes drop to ~0.5 — the measured
    compression-vs-recall contrast, riding the memoized brute ranking."""
    from collection_templates_spark.operators.similarity import (
        sq8_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    sq8 = (
        sq8_cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
        .select("query_id", "neighbor_id")
        .withColumn("___hit", F.lit(1))
    )
    brute = _brute_topk_for(spark, sf_dir).select("query_id", "neighbor_id")
    return (
        brute.join(sq8, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("___hit"), F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5")
        )
    )



def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (text_analysis.rake_keywords): stopword/
    punctuation-bounded phrases via gaps-and-islands, degree/frequency
    word scores, top-20 phrases with total tie order."""
    from collection_templates_spark.operators.text_analysis import (
        rake_keywords,
    )

    return rake_keywords(_t(spark, sf_dir, "documents"), k=20)


def stats_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-feature OLS (stats.ols_regression_2var):
    l_extendedprice ~ l_quantity + l_discount via Cramer's rule on
    DECIMAL-exact moments — never an engine's regr_* internals."""
    from collection_templates_spark.operators.stats import (
        ols_regression_2var,
    )

    return ols_regression_2var(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice", "l_quantity", "l_discount",
    )


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit (training_prep.feature_hashing_stats):
    vocabulary hashed into 1024 buckets with the portable hash, collision
    counts and colliding-token fraction."""
    from collection_templates_spark.operators.training_prep import (
        feature_hashing_stats,
    )

    return feature_hashing_stats(_t(spark, sf_dir, "documents"))


def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination (training_prep.fuzzy_decontaminate):
    docs with doc_id % 11 == 0 act as the held-out benchmark; the rest of
    the corpus probes a minhash index built on it, and near-dups
    (trigram jaccard >= 0.5) are flagged per source — the paraphrased-leak
    gate exact n-gram overlap misses. Memoized like the other
    index-building rows (the fill bills to the first run)."""
    from collection_templates_spark.operators.training_prep import (
        fuzzy_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    return _memo_df(
        spark, sf_dir, "fuzzy_decon",
        lambda: fuzzy_decontaminate(
            spark,
            docs.filter(F.col("doc_id") % 11 != 0),
            docs.filter(F.col("doc_id") % 11 == 0),
        ),
    )



def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily revenue per event type
    (temporal.ewma_smoothing): the recursive alpha=1/2 smoother as ONE
    cumulative window via the exact dyadic reparameterization — every
    weight a power of two, so both engines compute identical terms."""
    from collection_templates_spark.operators.temporal import (
        ewma_smoothing,
    )

    return ewma_smoothing(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")


def _paired_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, x, y) pairing of the click and purchase daily totals —
    the bounded two-metric table the rank-association rows share."""
    d = _daily_event_series(spark, sf_dir)
    a = d.filter(F.col("event_type") == "click").select(
        "day", F.col("v").alias("x")
    )
    b = d.filter(F.col("event_type") == "purchase").select(
        "day", F.col("v").alias("y")
    )
    return a.join(b, "day")


def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (stats.spearman_rho) between click and
    purchase daily revenue: average ranks are exact multiples of 0.5,
    rank moments DECIMAL-exact — the monotone-association companion to
    the raw-moment correlation row."""
    from collection_templates_spark.operators.stats import spearman_rho

    return spearman_rho(_paired_daily(spark, sf_dir), "x", "y")


def stats_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b (stats.kendall_tau) on the same paired daily series:
    concordant/discordant pair counts with tie correction —
    integer-exact throughout, the only float op is the final ratio."""
    from collection_templates_spark.operators.stats import kendall_tau

    return kendall_tau(_paired_daily(spark, sf_dir), "x", "y")


def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type
    (temporal.theil_sen_slope): median of pairwise slopes over the
    bounded daily series — the 29%-breakdown robust companion to the
    OLS slope."""
    from collection_templates_spark.operators.temporal import (
        theil_sen_slope,
    )

    return theil_sen_slope(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")


def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half-sample bootstrap CI for the mean event value
    (stats.bootstrap_mean_ci): 48 bit-sampled replicates from one
    arithmetic row hash, all replicate sums in ONE map-side-combined
    aggregate, √2-corrected subsampling CI."""
    from collection_templates_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    return bootstrap_mean_ci(
        _t(spark, sf_dir, "events"), "value", "event_id"
    )


def stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F (stats.anova_oneway) of event value across the
    five event types: DECIMAL-exact group moments, cross-group terms
    rounded-then-DECIMAL-summed (order-independent), closed-form
    F/η²."""
    from collection_templates_spark.operators.stats import anova_oneway

    return anova_oneway(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H (stats.kruskal_wallis) across event types:
    pooled average ranks (multiples of 0.5 — exact), DECIMAL rank
    sums, tie-corrected H — the k-sample companion of the
    Mann–Whitney row."""
    from collection_templates_spark.operators.stats import kruskal_wallis

    return kruskal_wallis(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


def _user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user A/B unit table: deterministic variant = parity of
    user_id, success = user fired ≥1 purchase event."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int"))
        .cast("boolean")
        .alias("converted")
    ).select(
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )


def stats_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test (stats.two_proportion_ztest) on
    user conversion (≥1 purchase) between the parity variants —
    integer counts, one closed-form z."""
    from collection_templates_spark.operators.stats import (
        two_proportion_ztest,
    )

    return two_proportion_ztest(
        _user_conversion(spark, sf_dir), "variant", "converted", "A", "B"
    )


def _user_prepost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (variant, x, y) table for CUPED: x = pre-period spend
    (before 2024-01-11), y = post-period spend, both DECIMAL-exact day
    sums cast to double; variant = parity of user_id."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-11").cast("timestamp")
    dv = F.col("value").cast("decimal(18,2)")
    return ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cut, dv)),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cut, dv)),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("y"),
    ).select(
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "x",
        "y",
    )


def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (stats.cuped_adjustment) on per-user
    post-period spend with pre-period spend as the covariate: pooled
    θ from DECIMAL-exact moments, per-variant adjusted means, achieved
    variance-reduction ratio (= ρ²)."""
    from collection_templates_spark.operators.stats import (
        cuped_adjustment,
    )

    return cuped_adjustment(
        _user_prepost(spark, sf_dir), "variant", "x", "y"
    )


def _survival_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared time-to-first-purchase unit table for the survival rows
    (KM and Nelson–Aalen): per signed-up user, duration = days from
    first signup to first subsequent purchase (observed) or to the
    corpus horizon (right-censored)."""
    ev = _t(spark, sf_dir, "events")
    signup = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min(F.to_date("ts")).alias("s_day"))
    horizon = ev.groupBy().agg(
        F.max(F.to_date("ts")).alias("h_day")
    )
    purchase = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("p_day")
    )
    first_p = (
        signup.join(purchase, "user_id")
        .filter(F.col("p_day") >= F.col("s_day"))
        .groupBy("user_id")
        .agg(F.min("p_day").alias("p_day"))
    )
    units = (
        signup.join(first_p, "user_id", "left")
        .join(F.broadcast(horizon))
        .select(
            F.datediff(
                F.coalesce(F.col("p_day"), F.col("h_day")),
                F.col("s_day"),
            ).alias("dur"),
            F.col("p_day").isNotNull().alias("obs"),
        )
    )
    return units


def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival (stats.kaplan_meier) for time-to-first-
    purchase: per signed-up user, duration = days from first signup to
    first subsequent purchase (observed) or to the corpus horizon (the
    global max event day — right-censored, no purchase by then);
    integer-exact risk sets, ordered 12dp-rounded log-sum product."""
    from collection_templates_spark.operators.stats import kaplan_meier

    return kaplan_meier(_survival_units(spark, sf_dir), "dur", "obs")


def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard (stats.nelson_aalen) on the same
    time-to-first-purchase unit table as the KM row: additive d/n
    hazard increments (12dp-rounded before the ordered cumulative sum)
    with the Fleming–Harrington exp(−H) survival — the mergeable-
    hazard companion estimate."""
    from collection_templates_spark.operators.stats import nelson_aalen

    return nelson_aalen(_survival_units(spark, sf_dir), "dur", "obs")


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of the events table
    (profiling.profile_table): null counts, exact distinct
    cardinality, numeric ranges, string length ranges — the
    ingestion-trust audit, one aggregate pass."""
    from collection_templates_spark.operators.profiling import (
        profile_table,
    )

    return profile_table(_t(spark, sf_dir, "events"))


def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layered BFS (graph.bfs_layers, 4 hops) over the 1995-window
    customer-part bipartite graph from the custkey ≡ 1 (mod 500) seed
    customers: the (hop, n_nodes) reachability histogram — frontier
    joins only, integer-exact; the oracle replays it as a recursive
    CTE with a min-hop reduction."""
    from collection_templates_spark.operators.graph import bfs_layers

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.pmod(F.col("c_custkey"), F.lit(500)) == 1)
        .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"))
    )
    return bfs_layers(edges, seeds, max_hops=4)


def drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (drift.psi_drift) per event type,
    first half of January (expected) vs second (actual), the same
    16-bin [0, 500] histogram as the JS row — PSI's log-ratio weighting
    vs JS's bounded symmetric view, with the +1/2-per-bin smoothing
    prior keeping empty bins finite."""
    from collection_templates_spark.operators.drift import psi_drift

    ev = _t(spark, sf_dir, "events")
    split = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        F.lit("early"),
    ).otherwise(F.lit("late"))
    return psi_drift(
        ev,
        group_col="event_type",
        value_col="value",
        split=split,
        split_a="early",
        split_b="late",
        n_bins=16,
        lo=0.0,
        hi=500.0,
    )


def quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (stats.calibration_bins, 10 bins) of the
    pinned-weight logistic quality score against the lang = 'en'
    label: per score decile the mean prediction, observed positive
    rate, and gap — the calibration audit of the quality_logistic
    row's model."""
    from collection_templates_spark.operators.stats import (
        calibration_bins,
    )
    from collection_templates_spark.operators.training_prep import (
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    # label rides through the classifier's scan (passthrough) — one
    # corpus pass, no self-join (r12 verdict #5)
    labeled = quality_classifier(docs, passthrough=("lang",)).select(
        "score", (F.col("lang") == "en").alias("is_en")
    )
    return calibration_bins(labeled, "score", "is_en", n_bins=10)


def events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative users
    (product_analytics.user_growth): the growth triptych over the
    events table — integer-exact, one user-keyed shuffle, day-level
    cumulative window."""
    from collection_templates_spark.operators.product_analytics import (
        user_growth,
    )

    return user_growth(_t(spark, sf_dir, "events"))


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (privacy.k_anonymity_histogram)
    of customer under the (nation, market segment) quasi-identifiers
    with account balance as the sensitive attribute: equivalence-class
    size histogram + per-size minimum distinct-l — integer-exact."""
    from collection_templates_spark.operators.privacy import (
        k_anonymity_histogram,
    )

    return k_anonymity_histogram(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        sensitive_col="c_acctbal",
    )


def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics (profiling.key_skew_report) for
    orders.o_custkey — the pre-flight check before keying a join on
    it: per-key count percentiles and top-1 share."""
    from collection_templates_spark.operators.profiling import (
        key_skew_report,
    )

    return key_skew_report(_t(spark, sf_dir, "orders"), "o_custkey")


def search_tfidf_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-normalized vector-space retrieval
    (search.search_tfidf_cosine) for 'spark hash join' — the SMART
    lnc.ltc baseline next to the raw tf·idf search_bm25ish row;
    per-doc norms over ALL terms, DECIMAL-accumulated."""
    from collection_templates_spark.operators.search import (
        search_tfidf_cosine,
    )

    return search_tfidf_cosine(
        _t(spark, sf_dir, "documents"), "spark hash join", k=20
    )


def lineitem_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue concentration
    (product_analytics.pareto_abc) over part revenue
    Σ extendedprice·(1−discount): class A = first 80 % of value, B to
    95 %, C the tail — DECIMAL-exact revenue, 9dp-rounded share before
    classification."""
    from collection_templates_spark.operators.product_analytics import (
        pareto_abc,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            )
        ).alias("rev"),
    )
    return pareto_abc(li, "l_partkey", "rev")


def ann_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids
    (similarity.centroid_separation) — the cluster-separation audit of
    the IVF coarse quantizer's label structure; 6dp centroids,
    DECIMAL-accumulated dot/norm sums."""
    from collection_templates_spark.operators.similarity import (
        centroid_separation,
    )

    return centroid_separation(_t(spark, sf_dir, "embeddings"))


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day exact rolling median of daily revenue per event
    type (temporal.rolling_quantile): interpolated percentile over a
    ROWS frame on the bounded daily series — the robust monitoring
    line."""
    from collection_templates_spark.operators.temporal import (
        rolling_quantile,
    )

    return rolling_quantile(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v",
        q=0.5, window_rows=7,
    ).withColumnRenamed("grp", "event_type")


def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-week cohort LTV curves (product_analytics.cohort_ltv):
    cumulative purchase revenue per user by account age — DECIMAL-exact
    revenue, Monday-based week truncation in both engines."""
    from collection_templates_spark.operators.product_analytics import (
        cohort_ltv,
    )

    return cohort_ltv(_t(spark, sf_dir, "events"))


def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search via positional adjacency (search.phrase_match,
    Lucene PhraseQuery slop-0 semantics): per-doc match counts and first
    anchor position for the corpus bigram 'batch batch' — token-boundary
    aware, unlike substring LIKE."""
    from collection_templates_spark.operators.search import phrase_match

    return phrase_match(
        _t(spark, sf_dir, "documents"), ("batch", "batch")
    )



def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (stats.mann_whitney_u): BUILDING vs
    MACHINERY order totals — average ranks on ties are multiples of 0.5
    so the rank sums are EXACT in both engines; tie-corrected z."""
    from collection_templates_spark.operators.stats import mann_whitney_u

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    oc = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_totalprice", "c_mktsegment"
    )
    return mann_whitney_u(
        oc, "c_mktsegment", "o_totalprice", "BUILDING", "MACHINERY"
    )


def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (stats.gini_concentration): exact Gini over
    per-customer order totals (DECIMAL rank-weighted sums) + the
    top-decile share — the who-owns-the-corpus audit."""
    from collection_templates_spark.operators.stats import (
        gini_concentration,
    )

    return gini_concentration(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_totalprice"
    )


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the marker-word
    classifier (text_analysis.language_id) against the corpus's ground-
    truth lang labels — the model-eval surface over an existing
    operator; counts are integers, the tie rules are the oracled
    text_language_id ones."""
    from collection_templates_spark.operators.text_analysis import (
        language_id,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("actual"),
            language_id(F.col("text")).alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )



def temporal_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event type (temporal.ohlc_downsample):
    open/close by (ts, event_id) tuple order, DECIMAL-exact day totals
    — one map-side-combined aggregate."""
    from collection_templates_spark.operators.temporal import (
        ohlc_downsample,
    )

    return ohlc_downsample(_t(spark, sf_dir, "events"))


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag 1..7 autocorrelation of daily revenue per event type
    (temporal.autocorrelation): DECIMAL-exact means, 9dp-per-term
    cross products, calendar-day lag join — the seasonality detector."""
    from collection_templates_spark.operators.temporal import (
        autocorrelation,
    )

    return autocorrelation(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")


def stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals
    (stats.benford_first_digit): integer-string leading digits (never
    float formatting or log10 of the value), 9dp expected-fraction
    literals shared with the oracle, chi-square contributions."""
    from collection_templates_spark.operators.stats import (
        benford_first_digit,
    )

    return benford_first_digit(_t(spark, sf_dir, "orders"), "o_totalprice")


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (graph.degree_assortativity, Newman 2002)
    of the customer-part graph — exact integer moment sums, one rounded
    formula; strongly negative for a bipartite projection."""
    from collection_templates_spark.operators.graph import (
        degree_assortativity,
    )

    return degree_assortativity(_copurchase_bipartite(spark, sf_dir))


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (training_prep.dsir_importance_weights):
    every document scored log p_target - log p_raw under two Laplace
    unigram models (target = sources src0-src4) via the oracled
    langmodel machinery — the importance-resampling selection signal."""
    from collection_templates_spark.operators.training_prep import (
        dsir_importance_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    tgt_sources = ("src0", "src1", "src2", "src3", "src4")
    return dsir_importance_weights(
        docs,
        docs.filter(F.col("source").isin(*tgt_sources)),
        docs.filter(~F.col("source").isin(*tgt_sources)),
    )



def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity coverage (temporal.interval_coverage): each
    event claims a ±15-minute window, overlaps union via the classic
    interval merge (exclusive-prefix cummax island rule, integer
    microseconds), coverage is the merged span total — the uptime/SLA
    shape."""
    from collection_templates_spark.operators.temporal import (
        interval_coverage,
    )

    return interval_coverage(_t(spark, sf_dir, "events"))



def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients (graph.clustering_coefficient) over
    the 1995 co-purchase projection (the triangle-count graph):
    2T/(d(d-1)) per node, degree-<2 nodes report 0 — integers + one
    rounded division."""
    from collection_templates_spark.operators.graph import (
        clustering_coefficient,
    )

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = cp.select(F.col("c").alias("u"), "p")
    b = cp.select(F.col("c").alias("v"), "p")
    edges = (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("u", "v")
    )
    return clustering_coefficient(edges, "u", "v")


def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit (text_analysis.heaps_fit): log-log OLS of per-doc
    vocabulary size vs token count — the vocabulary-growth corpus-health
    scalar next to text_zipf_fit, same closed-form-over-rounded-sums
    convention."""
    from collection_templates_spark.operators.text_analysis import heaps_fit

    return heaps_fit(_t(spark, sf_dir, "documents"))


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of per-type daily revenue
    (temporal.seasonal_decompose): centered 7-day MA trend (DECIMAL
    window sums), portable weekday phase, per-phase seasonal means,
    residuals — STL-lite over the shared daily series."""
    from collection_templates_spark.operators.temporal import (
        seasonal_decompose,
    )

    return seasonal_decompose(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v"
    ).withColumnRenamed("grp", "event_type")



def events_pattern_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-run pattern mining over the daily series (the
    MATCH_RECOGNIZE-lite shape: A B+ where B = strictly-rising day):
    per event type, the number of rising runs of length >= 3, the
    longest rising run, and total rising days — gaps-and-islands over
    the sign of the day-over-day diff (exact DECIMAL-derived values, so
    the > compare is engine-identical)."""
    ev = _daily_event_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    rising = (F.col("v") > F.lag("v").over(w)).cast("int")
    flagged = ev.withColumn("rising", F.coalesce(rising, F.lit(0)))
    # island id: cumulative count of NON-rising days = constant within
    # each maximal rising run
    isl = flagged.withColumn(
        "island",
        F.sum(F.lit(1) - F.col("rising")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = (
        isl.filter(F.col("rising") == 1)
        .groupBy("event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("event_type").agg(
        F.sum((F.col("run_len") >= 3).cast("long"))
        .cast("long")
        .alias("n_runs_ge3"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.sum("run_len").cast("long").alias("rising_days"),
    )


def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: Simpson's repeat-rate
    D = Σ n(n−1) / (N(N−1)) over the token distribution (the
    probability two random tokens coincide — templated text scores
    high) plus the type-token ratio — EXACT integer arithmetic until
    the one rounded division each."""
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = per_tok.groupBy(F.col("source").alias("grp")).agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("coincide"),
    )
    return agg.select(
        "grp",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(
            F.col("coincide").cast("double")
            / (
                F.col("n_tokens").cast("double")
                * (F.col("n_tokens").cast("double") - F.lit(1.0))
            ),
            6,
        ).alias("simpson_d"),
        F.round(
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# Round 13 — mergeable quantile sketch + distribution tests + feature
# selection + graph shortest paths
# ---------------------------------------------------------------------------


def sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summary (sketches.ddsketch_bins /
    ddsketch_merge / ddsketch_quantiles — DDSketch shape, Masson–Rim–Lee
    VLDB'19): per-shard log-binned histograms (shard = user_id mod 8,
    standing in for 8 executors' partial states), merged by count
    addition, then p50/p90/p99 read off the MERGED summary and graded
    against the exact order statistic at the same rank.

    This closes the sketch family's order-statistics gap (CMS/HLL/
    theta/Bloom all merge associatively; ``sketch_quantile_errors``
    was a hash-sample, not a summary). KLL's compactor is randomized
    and t-digest's centroids are order-dependent — both break the
    cross-engine hash gate; DDSketch's summary is a pure row-local
    binning, so merge ≡ single pass EXACTLY (pinned by the property
    test) and every estimate is within alpha=2% of the true order
    statistic by construction (``within_alpha`` is computed, not
    asserted).

    Scale shape: ONE map-side-combined aggregation builds all shard
    histograms; the merge is a ~460-bin groupBy; the exact side's
    distinct-value cumulative window exists only to GRADE the sketch
    (it is the full sort the sketch replaces at 100 TB).
    """
    from collection_templates_spark.operators.sketches import (
        ddsketch_bins,
        ddsketch_quantiles,
    )

    alpha = 0.02
    qs = (0.5, 0.9, 0.99)
    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(8)).alias("shard"),
        F.col("value").cast("double").alias("v"),
    )
    per_shard = ddsketch_bins(ev, "v", alpha=alpha, group_cols=("shard",))
    merged = per_shard.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    est = ddsketch_quantiles(merged, qs, alpha=alpha)

    # exact order statistic at rank floor(q*(n-1)) + 1 — the quantity
    # the sketch bounds — via a distinct-value cumulative table (values
    # are 2dp doubles: bounded distinct count, deterministic in both
    # engines; no interpolation-convention exposure).
    n_total = ev.agg(F.count(F.lit(1)).alias("n"))
    tgt = None
    for q in qs:
        t = n_total.select(
            F.lit(float(q)).alias("q"),
            (
                F.floor(F.lit(float(q)) * (F.col("n").cast("double") - 1.0))
                + F.lit(1)
            ).alias("rank"),
        )
        tgt = t if tgt is None else tgt.unionByName(t)
    vals = ev.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vals.select("v", F.sum("c").over(wv).alias("cum"))
    exact = (
        tgt.join(vcum, F.col("cum") >= F.col("rank"))
        .groupBy("q")
        .agg(F.min("v").alias("exact_q"))
    )
    rel = F.abs(F.col("est_q") - F.col("exact_q")) / F.col("exact_q")
    return (
        est.join(exact, "q")
        .select(
            "q",
            "est_q",
            F.round("exact_q", 4).alias("exact_q"),
            F.round(rel, 6).alias("rel_err"),
            (F.round(rel, 6) <= F.lit(alpha)).alias("within_alpha"),
        )
        .orderBy("q")
    )


def stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe homoscedasticity test (stats.
    levene_brown_forsythe) of event value across the five event types —
    the variance-equality gate for the ANOVA row's pooled-variance
    assumption; median-centered so skew doesn't masquerade as
    heteroscedasticity."""
    from collection_templates_spark.operators.stats import (
        levene_brown_forsythe,
    )

    return levene_brown_forsythe(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test (stats.jarque_bera) of event value:
    DECIMAL-exact raw power sums up to Σv⁴, closed-form
    skewness/kurtosis/JB — the shape test that tells the z-based
    monitors whether 'z' means anything."""
    from collection_templates_spark.operators.stats import jarque_bera

    return jarque_bera(_t(spark, sf_dir, "events"), "value")


def stats_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max-studentized-deviate (stats.grubbs_test) on order
    totals — the single-worst-point outlier screen (vs the MAD row's
    bulk-outlier flagging)."""
    from collection_templates_spark.operators.stats import grubbs_test

    return grubbs_test(_t(spark, sf_dir, "orders"), "o_totalprice")


def stats_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic randomization test (stats.permutation_mean_test)
    for the A/B difference in mean event value between the parity
    variants: 62 hash-bit relabelings, all replicate sums in ONE
    map-side aggregate, smoothed p-value — the assumption-free
    companion to the Welch-t row."""
    from collection_templates_spark.operators.stats import (
        permutation_mean_test,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant"),
    )
    return permutation_mean_test(
        ev, "variant", "value", "event_id", "A", "B"
    )


def events_poisson_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test (stats.poisson_rate_test):
    purchases per ACTIVE DAY between the parity variants — count-data
    experiment readout (the two-proportion row is Bernoulli; purchase
    intensity is Poisson)."""
    from collection_templates_spark.operators.stats import (
        poisson_rate_test,
    )

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "k"
        ),
        F.countDistinct(F.to_date("ts")).alias("t"),
    ).select(
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "k",
        "t",
    )
    return poisson_rate_test(per_user, "variant", "k", "t", "A", "B")


def feature_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model-free feature ranking (stats.mutual_information): MI and
    NMI between three candidate user-level features (activity bucket,
    spend bucket, event-type breadth) and the conversion label — the
    which-features-carry-signal pass a training-data pipeline runs
    before fitting anything."""
    from collection_templates_spark.operators.stats import (
        mutual_information,
    )

    ev = _t(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,2)")
    # the user aggregate feeds THREE feature branches — one eager cut
    # so the events scan+groupBy runs once, not per branch (the
    # multi-consumer-lineage rule; the table is |users|-sized)
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dv).alias("total"),
        F.countDistinct("event_type").alias("n_types"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "label"
        ),
    ).localCheckpoint(eager=True)
    feats = users.select(
        F.lit("activity_bucket").alias("f"),
        F.least(F.floor(F.col("n_events") / F.lit(10)), F.lit(12))
        .cast("string")
        .alias("x"),
        F.col("label").cast("string").alias("y"),
    ).unionByName(
        users.select(
            F.lit("spend_bucket").alias("f"),
            F.least(
                F.floor(F.col("total").cast("double") / F.lit(500.0)),
                F.lit(9),
            )
            .cast("string")
            .alias("x"),
            F.col("label").cast("string").alias("y"),
        )
    ).unionByName(
        users.select(
            F.lit("type_breadth").alias("f"),
            F.col("n_types").cast("string").alias("x"),
            F.col("label").cast("string").alias("y"),
        )
    )
    return mutual_information(feats, "f", "x", "y")


def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop weighted shortest paths (graph.weighted_sssp, 4
    hops, integer min-quantity edge weights) over the 1995-window
    customer-part bipartite graph from the custkey ≡ 1 (mod 500)
    seeds — reported as the distance-band histogram. The weighted
    companion to the BFS-layers row; the oracle replays the
    Bellman–Ford sweeps as chained full-relaxation CTEs (frontier
    pruning ≡ full relaxation after every sweep — SPFA argument)."""
    from collection_templates_spark.operators.graph import weighted_sssp

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        .agg(F.min(F.col("l_quantity").cast("long")).alias("w"))
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.pmod(F.col("c_custkey"), F.lit(500)) == 1)
        .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"))
    )
    sp = weighted_sssp(edges, seeds, max_hops=4)
    return (
        sp.groupBy(F.floor(F.col("dist") / F.lit(5)).alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
        )
        .orderBy("band")
    )


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source shingle novelty: for each document the fraction of
    its distinct word-3-grams that occur in NO other document
    (corpus-unique), aggregated per source — the content-freshness
    profile a training-data pipeline reads next to the dedup rate
    (low novelty ⇒ templated/boilerplate-heavy source even when no
    pair crosses the dedup threshold). Docs under 3 tokens have no
    shingles and are excluded (both engines).

    Determinism: integer document frequencies; per-doc novelty rounded
    9dp then DECIMAL-summed per source (the PSI trick). Scale shape:
    one explode → one shingle-df groupBy (inverted-index shape) → join
    back → per-doc agg; the exploded table feeds two consumers, so it
    gets ONE eager localCheckpoint (the r12 multi-consumer-lineage
    rule: cut the heavy tokenize subtree, nothing else)."""
    from collection_templates_spark.operators.dedup import word_shingles

    # DISK_ONLY: this is an O(doc × shingle) table — the corpus-sized
    # class (the r15 ALS rule); the default deserialized level tried to
    # pin tens of GB of exploded strings in the storage pool at sf100
    # and OOMed the heap before the df aggregate even ran.
    from pyspark import StorageLevel as _SL

    sh = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("text"), 3)).alias("s"),
        )
        .localCheckpoint(eager=True, storageLevel=_SL.DISK_ONLY)
    )
    # a corpus-unique shingle (df == 1) belongs to exactly ONE doc, so
    # its owner comes out of the same df aggregate (min == only) — the
    # per-doc unique count then joins back at |docs| rows, not
    # |doc × shingle| rows (the exponent-0.99 join this row first
    # shipped with; the oracle computes identical values either way)
    uniq_per_doc = (
        sh.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("doc_id"),
        )
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    per_doc = (
        sh.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .join(uniq_per_doc, "doc_id", "left")
        .withColumn("n_uni", F.coalesce("n_uni", F.lit(0)))
    )
    nv = F.round(
        F.col("n_uni").cast("double") / F.col("n_sh").cast("double"), 9
    )
    return (
        per_doc.select("source", nv.alias("nv"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("nv").cast("decimal(38,9)")).alias("s_nov"),
            F.sum((F.col("nv") < F.lit(0.2)).cast("long")).alias(
                "n_low_novelty"
            ),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.col("s_nov").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("mean_novelty"),
            F.col("n_low_novelty").cast("long").alias("n_low_novelty"),
        )
        .orderBy("source")
    )


def temporal_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-based downsampling (temporal.lttb_downsample, parallel
    bucket-average variant of LTTB) of the per-type daily revenue
    series to one point per 10-day bucket — the decimation step a
    dashboard/export pipeline runs before shipping a 100M-point series
    to a chart, keeping the visually dominant extremes instead of
    naive every-Nth sampling."""
    from collection_templates_spark.operators.temporal import (
        lttb_downsample,
    )

    return lttb_downsample(
        _daily_event_series(spark, sf_dir),
        "event_type",
        "day",
        "v",
        bucket_size=10,
    ).withColumnRenamed("grp", "event_type")


def ltr_rank_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary rank-quality battery (ltr.ltr_rank_metrics): MRR@10,
    P@5, Recall@10, AP@10 of the trained pointwise ranker per query —
    the endpoint-comparison metrics next to the graded NDCG row
    (reference research/learning-to-rank/evaluate_endpoints.py)."""
    from collection_templates_spark.operators.ltr import ltr_rank_metrics

    return ltr_rank_metrics(_t(spark, sf_dir, "documents"))


def _parity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with the parity A/B variant — the shared unit table of
    the experiment rows (two_proportion / permutation / CUPED)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "A")
        .otherwise("B")
        .alias("variant"),
    )


def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (stats.srm_check): chi-square
    GOF of the parity A/B event split against the designed 50/50 — the
    assignment-health check that gates every other experiment row."""
    from collection_templates_spark.operators.stats import srm_check

    return srm_check(_parity_events(spark, sf_dir), "variant", "A", "B")


def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required per-arm sample size (stats.power_analysis_mean) to
    detect a 5% shift of mean event value at 80% power — the
    experiment-DESIGN companion to the readout tests."""
    from collection_templates_spark.operators.stats import (
        power_analysis_mean,
    )

    return power_analysis_mean(_t(spark, sf_dir, "events"), "value")


def stats_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence readout (stats.tost_equivalence) of mean event
    value between the parity variants with a ±5%-of-pooled-mean margin
    — 'no change' as a POSITIVE claim, vs the t-test's mere
    non-significance."""
    from collection_templates_spark.operators.stats import (
        tost_equivalence,
    )

    return tost_equivalence(
        _parity_events(spark, sf_dir), "variant", "value", "A", "B"
    )


def stats_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bivariate (quantity, extendedprice) outliers by squared
    Mahalanobis distance (stats.mahalanobis_outliers) — the
    correlation-aware joint-distribution screen next to the univariate
    Grubbs/MAD rows (a cheap low-quantity/high-price line is invisible
    per-axis)."""
    from collection_templates_spark.operators.stats import (
        mahalanobis_outliers,
    )

    return mahalanobis_outliers(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


def quality_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar calibration summary of the quality classifier vs the
    lang='en' label: ECE (the bin-weighted |gap| of the reliability
    diagram — quality_calibration reduced to the number dashboards
    track) and the Brier score (mean squared error of the probability,
    the proper-scoring companion that catches what ECE's binning can
    hide). One corpus pass + a 10-row bin reduce.

    Determinism: scores are 6dp-rounded then DECIMAL-accumulated; the
    Brier terms (s − y)² are squares of 6dp decimals summed as
    DECIMAL(38,12); each bin's |gap| weight term is rounded 9dp then
    DECIMAL-summed (the PSI trick)."""
    from collection_templates_spark.operators.training_prep import (
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = quality_classifier(docs, passthrough=("lang",)).select(
        F.col("score").cast("decimal(18,6)").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    binned = labeled.select(
        F.least(
            F.floor(F.col("s").cast("double") * F.lit(10.0)).cast("int"),
            F.lit(9),
        ).alias("bin"),
        "s",
        "y",
        # diff narrowed to (12,6) BEFORE squaring: a (19,6)² would cap
        # at 38 digits and silently reduce scale (the r13 width-ladder
        # rule)
        (
            (F.col("s") - F.col("y")).cast("decimal(12,6)")
            * (F.col("s") - F.col("y")).cast("decimal(12,6)")
        )
        .cast("decimal(30,12)")
        .alias("sq"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("ss"),
        F.sum("y").alias("np"),
        F.sum("sq").alias("sqs"),
    )
    gap = F.abs(
        F.col("ss").cast("double") / F.col("n").cast("double")
        - F.col("np").cast("double") / F.col("n").cast("double")
    )
    term = F.round(F.col("n").cast("double") * gap, 9).cast(
        "decimal(38,9)"
    )
    out = bins.groupBy().agg(
        F.sum("n").alias("n"),
        F.sum(term).alias("wgap"),
        F.sum("sqs").alias("sq_all"),
    )
    n = F.col("n").cast("double")
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("wgap").cast("double") / n, 6).alias("ece"),
        F.round(F.col("sq_all").cast("double") / n, 6).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table via DECIMAL-exact
    distributed power iteration (linalg.power_iteration_top_component):
    3 rounds of one-aggregate-per-round matrix-vector products with
    in-engine 6dp normalization — the anisotropy / dominant-axis audit
    run before ANN indexing or whitening, iterative linear algebra
    under the bank's cross-engine determinism discipline."""
    from collection_templates_spark.operators.linalg import (
        power_iteration_top_component,
    )

    return power_iteration_top_component(
        _t(spark, sf_dir, "embeddings"), "embedding", dim=64, iters=3
    )


def embedding_pca_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 principal components via power iteration with exact-int64
    Hotelling deflation (linalg.power_iteration_components, round 14,
    r13 verdict #5): component k runs the same integer-micros ladder on
    the matrix deflated by the previously-found 6dp iterates, and the
    cum_explained column is the explained-variance curve — the "how
    many components do SemDeDup/IVF embeddings actually need" audit.
    Deflation is c ← c − rh(rh(c·vₚ)·vₚ), all exact int64 on 6dp
    quantities, so the 3-component chain is byte-replayed by the
    generated deflation oracle; orthogonality and the exact-replica
    equivalence are pinned in tests/test_round14_ops.py."""
    from collection_templates_spark.operators.linalg import (
        power_iteration_components,
    )

    return power_iteration_components(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        dim=64,
        iters=3,
        n_components=3,
    )


def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroscedasticity test (stats.breusch_pagan_1var)
    on the same daily-revenue ~ day-index fit as the DW row: squared
    residuals regressed on t, BP = n·R² vs the χ²(1) 95% cut —
    completing the fit / serial-correlation / heteroscedasticity
    regression-diagnostics trio."""
    from collection_templates_spark.operators.stats import (
        breusch_pagan_1var,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("y")
    )
    first = daily.groupBy().agg(F.min("day").alias("d0"))
    series = daily.join(F.broadcast(first)).select(
        F.datediff(F.col("day"), F.col("d0")).alias("t"), "y"
    )
    return breusch_pagan_1var(series, "y", "t")


def temporal_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic fingerprints (temporal.sax_words) of each event
    type's daily revenue: z-normalize → 8-segment PAA → alphabet-4
    symbols at the N(0,1) quartile breakpoints — the discrete series
    word that makes shingle/hash similarity machinery apply to time
    series; DECIMAL moments, 6dp z before symbol compares."""
    from collection_templates_spark.operators.temporal import sax_words

    out = sax_words(
        _daily_event_series(spark, sf_dir), "event_type", "day", "v",
        n_segments=8,
    )
    return out.select(
        F.col("grp").alias("event_type"),
        "n_points",
        "n_segments",
        "sax_word",
    ).orderBy("event_type")


def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-user estimates from DAILY HLL sketches
    (sketches.hll_sliding_window_users): mergeability along the time
    axis — every window is a per-bucket max of stored m-row daily
    registers, never an event-log rescan; exact windowed distincts
    alongside."""
    from collection_templates_spark.operators.sketches import (
        hll_sliding_window_users,
    )

    return hll_sliding_window_users(_t(spark, sf_dir, "events"))


def sketch_theta_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta A-NOT-B set-difference estimates
    (sketches.kmv_theta_differences) between every ordered pair of
    per-event-type user sets — the DataSketches AnotB operation
    completing the sketch family's set algebra (union ≡ hll_merge,
    intersection ≡ sketch_theta_intersection), exact difference joined
    alongside to surface the error."""
    from collection_templates_spark.operators.sketches import (
        kmv_theta_differences,
    )

    return kmv_theta_differences(_t(spark, sf_dir, "events"))


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoother (temporal.holt_linear_forecast) over
    each event type's daily revenue: the coupled level/trend recursion
    carried in exact integer micro-cents (α=1/2, β=1/4 → dyadic
    half-away divides), final level/trend, 7-day-ahead forecast and
    one-step MAE/RMSE — presentation math runs in-engine on the exact
    integer state, mirrored by a recursive-CTE oracle."""
    from collection_templates_spark.operators.temporal import (
        holt_linear_forecast,
    )

    daily = _daily_event_series(spark, sf_dir).select(
        "event_type",
        "day",
        F.round(F.col("v") * 100, 0).cast("long").alias("cents"),
    )
    st = holt_linear_forecast(daily, "event_type", "day", "cents")
    nm2 = (F.col("n") - 2).cast("double")
    sse = F.col("sse_u2").cast("decimal(38,0)").cast("double")
    return st.select(
        F.col("grp").alias("event_type"),
        "n",
        F.round(F.col("l_u").cast("double") / F.lit(1.0e8), 2).alias(
            "level"
        ),
        F.round(F.col("b_u").cast("double") / F.lit(1.0e8), 4).alias(
            "trend"
        ),
        F.round(
            (F.col("l_u") + F.lit(7) * F.col("b_u")).cast("double")
            / F.lit(1.0e8),
            2,
        ).alias("forecast_7"),
        F.round(
            (F.col("sae_u").cast("double") / F.lit(1.0e8)) / nm2, 4
        ).alias("mae"),
        F.round(F.sqrt((sse / F.lit(1.0e16)) / nm2), 4).alias("rmse"),
    ).orderBy("event_type")


def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph.personalized_pagerank) on the 1995
    customer↔supplier bipartite graph (undirected projection — no
    dangling nodes), teleporting to the custkey ≡ 1 (mod 20) seed
    customers: the related-entities ranking primitive, 3 unrolled
    sweeps with the pagerank rounding convention, oracled by CTE
    replay."""
    from collection_templates_spark.operators.graph import (
        personalized_pagerank,
    )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = pairs.select(F.col("src").alias("node")).distinct().filter(
        ((F.col("node") / 2).cast("long") % 20) == 1
    )
    out = personalized_pagerank(edges, seeds, iterations=3)
    return out.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
        )
        .otherwise(
            F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
        )
        .alias("node"),
        "ppr",
    )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplicate pairs over a synthetic
    16×16 grayscale PNG corpus (multimodal.synthetic_gray_png_media →
    REAL stdlib PNG encode→decode → multimodal.image_ahash → banded
    Hamming join). The fixture pixels are a closed form of doc_id
    (groups of 5 share a base pattern, one flipped pixel per doc), so
    the oracle recomputes the expected aHash with pure integer SQL —
    while the Spark path proves the production codec+hash+banding
    pipeline end-to-end on real bytes."""
    from collection_templates_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        image_ahash,
        synthetic_gray_png_media,
    )

    docs = _t(spark, sf_dir, "documents")
    hashed = image_ahash(synthetic_gray_png_media(docs))
    return ahash_near_dup_pairs(hashed, max_hamming=10).select(
        F.col("id1").alias("doc1"),
        F.col("id2").alias("doc2"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def temporal_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance (temporal.dtw_to_reference) from
    each event type's daily-revenue series to the click series:
    integer-cent Sakoe–Chiba banded DP — exact int64 in the numpy
    per-group kernel AND in the oracle's recursive-CTE replay (row-
    by-row prefix-scan recurrence carried as a list column); the
    operator Spark/DuckDB lack natively. Presentation divisions/
    rounds happen in-engine on the returned integer cents."""
    from collection_templates_spark.operators.temporal import (
        dtw_to_reference,
    )

    daily = _daily_event_series(spark, sf_dir)
    cents = F.round(F.col("v") * 100, 0).cast("long").alias("cents")
    ref = [
        int(r["cents"])
        for r in daily.filter(F.col("event_type") == "click")
        .select("day", cents)
        .orderBy("day")
        .collect()
    ]
    others = daily.filter(F.col("event_type") != "click").select(
        "event_type", "day", cents
    )
    out = dtw_to_reference(
        others, "event_type", "day", "cents", ref, band_floor=15
    )
    return out.select(
        F.col("grp").alias("event_type"),
        "n_a",
        "n_b",
        F.round(F.col("dtw_cents").cast("double") / F.lit(100.0), 2).alias(
            "dtw"
        ),
        F.round(
            F.col("dtw_cents").cast("double")
            / F.lit(100.0)
            / (F.col("n_a") + F.col("n_b")).cast("double"),
            6,
        ).alias("dtw_per_step"),
    ).orderBy("event_type")


def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson serial-correlation test (stats.durbin_watson) on
    the residuals of total daily revenue ~ day index: DECIMAL-exact
    OLS moments, 6dp-rounded residuals re-cast to DECIMAL before the
    exact DW sums — the trend-fit autocorrelation guardrail."""
    from collection_templates_spark.operators.stats import durbin_watson

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("y")
    )
    first = daily.groupBy().agg(F.min("day").alias("d0"))
    series = daily.join(F.broadcast(first)).select(
        F.datediff(F.col("day"), F.col("d0")).alias("t"), "y"
    )
    return durbin_watson(series, "y", "t")


def lineitem_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (product_analytics.skyline_2d)
    over per-part offers: points (min unit price paid, max quantity
    shipped) not dominated by any other part — cheaper-and-bigger
    frontier, one window over the distinct-point table."""
    from collection_templates_spark.operators.product_analytics import (
        skyline_2d,
    )

    li = _t(spark, sf_dir, "lineitem")
    # unit price = 2dp-rounded double division (identical IEEE op in
    # both engines) cast to DECIMAL, so the dominance compares are exact
    per_part = li.groupBy("l_partkey").agg(
        F.min(
            F.round(
                F.col("l_extendedprice") / F.col("l_quantity"), 2
            ).cast("decimal(18,2)")
        ).alias("unit_price"),
        F.max(F.col("l_quantity").cast("decimal(18,2)")).alias("max_qty"),
    )
    return skyline_2d(per_part, "unit_price", "max_qty").select(
        F.col("p").cast("double").alias("unit_price"),
        F.col("q").cast("double").alias("max_qty"),
        "n_members",
    )


def basket_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine neighborhoods
    (product_analytics.item_item_cosine): top-5 co-occurrence
    neighbors per part with support ≥ 2 — the collaborative-filtering
    primitive over the basket self-join, supports broadcast."""
    from collection_templates_spark.operators.product_analytics import (
        item_item_cosine,
    )

    return item_item_cosine(_t(spark, sf_dir, "lineitem"), k=5)


def events_ar2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) Yule-Walker fit per event type (stats.ar2_yule_walker,
    round 14): lag-0/1/2 autocovariances of the mean-centered daily
    revenue series as exact DECIMAL(38,12) sums (the scale-12 product
    discipline), closed-form φ₁/φ₂, and the one-step-ahead forecast —
    the autoregressive MODEL next to durbin_watson (detects serial
    correlation) and events_holt_forecast (smooths it)."""
    from collection_templates_spark.operators.stats import ar2_yule_walker

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("y")
    )
    return ar2_yule_walker(
        daily, "event_type", "day", "y"
    ).withColumnRenamed("g", "event_type")


def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (round 14): BUILDING-segment customers ⋈ orders
    before the cut ⋈ lineitems shipped after it, per-order revenue
    Σ price·(1−disc) as an exact DECIMAL sum, top-10 by (exact revenue
    DESC, o_orderdate, l_orderkey) — the classic selective-dim
    broadcast + selective-fact pushdown + TakeOrderedAndProject plan:
    both date filters reach the parquet scans, the filtered customer
    side broadcasts, and the top-k never globally sorts."""
    cut = "1997-06-15"
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev_exact"))
        .orderBy(
            F.desc("rev_exact"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rev_exact").cast("double"), 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def agg_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (round 14): orders whose total quantity clears
    the threshold (group-by-HAVING semi-join back onto the fact), with
    customer enrichment and the top-20 by (o_totalprice DESC,
    o_orderkey) — the aggregate-filter-rejoin pattern whose HAVING
    side reuses the same partial-aggregate shuffle shape at any
    scale."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
        )
        .filter(F.col("qty") > 200)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.round(F.col("qty").cast("double"), 2).alias("total_qty"),
        )
    )


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap (round 15;
    training_prep.chunk_documents — the RAG/long-context ingestion
    primitive next to pack_sequences): window 16, overlap 4 over the
    space-token stream, final chunk keeps the tail. The gate row
    md5-digests each chunk's text so the oracle pins exact chunk
    CONTENT (boundaries AND token bytes) without shipping the corpus
    through the compare."""
    from collection_templates_spark.operators.training_prep import (
        chunk_documents,
    )

    out = chunk_documents(
        _t(spark, sf_dir, "documents"), window=16, overlap=4
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "chunk_idx",
        "start_tok",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def join_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (round 15): order-priority histogram of one
    quarter's orders having AT LEAST ONE late line — the correlated
    EXISTS becomes a left-semi join with a mixed equi + range
    condition (this schema has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 60 days). Catalyst hashes the equi part
    and applies the range residually; the semi join never duplicates
    orders, so no distinct is needed before the count."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def agg_supplier_parts_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape (round 15): distinct supplier count per
    (brand, size) over the lineitem part↔supplier relation (this
    schema has no partsupp table), excluding one brand, a size set,
    and a supplier blocklist (negative account balance) — the NOT IN
    becomes a broadcast anti-join BELOW the aggregation. Top-20 by
    (supplier_cnt DESC, brand, size): the group key completes the
    total order, so the limit is deterministic."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 35, 42)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    rel = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        rel.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size")
        )
        .limit(20)
    )


def join_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (round 15): suppliers in one nation who were the
    SOLE late shipper on a multi-supplier finished order (nation set:
    n_nationkey ≡ 1 mod 3 — a single nation is empty at sf0.001 and a
    0-row gate row checks nothing). The classic
    double correlated subquery — EXISTS(another supplier on the order)
    AND NOT EXISTS(another LATE supplier) — decorrelates into ONE
    groupBy(orderkey) computing (distinct suppliers, distinct late
    suppliers): given the candidate row is itself late, EXISTS-other ⟺
    ns ≥ 2 and NOT-EXISTS-other-late ⟺ nl = 1. Spark-first shape: one
    shuffle on l_orderkey shared by the aggregate and the re-join
    (co-partitioned), nation and supplier broadcast; the oracle keeps
    the textbook EXISTS/NOT EXISTS form so both derivations must
    agree. Lateness is l_shipdate > o_orderdate + 60 days (no
    commit/receipt dates in this schema)."""
    l = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderdate", "o_orderstatus"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "late",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int"),
        )
    )
    per = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("nl"),
    )
    cand = (
        l.filter((F.col("late") == 1) & (F.col("o_orderstatus") == "F"))
        .join(per, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("ns") >= 2) & (F.col("nl") == 1))
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_nationkey") % 3 == 1
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        cand.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def join_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (round 15): local-supplier volume per nation of
    one region for one order year — the 6-way join whose signature is
    the EXTRA non-FK equality c_nationkey = s_nationkey (customer and
    supplier must share a nation). Spark-first plan: region⋈nation and
    supplier broadcast (true dims), the orders date filter reaches the
    parquet scan, and the only real shuffles are the two fact-side
    joins; Catalyst is free to reorder around the broadcasts. Revenue
    is the exact DECIMAL Σ price·(1−disc), rounded once at the edge."""
    nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(F.sum(rev).alias("rev_exact"))
        .select(
            "n_name",
            F.round(F.col("rev_exact").cast("double"), 2).alias("revenue"),
        )
    )


def agg_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape (round 15): the customer-distribution histogram
    — LEFT join customers to a FILTERED orders side (the filter lives
    in the join, so customers with only filtered-out orders count as
    zero, Q13's defining subtlety), then a two-level aggregate:
    orders-per-customer, customers-per-order-count. Two shuffles total
    (custkey, then the skinny c_count key); the zero bucket comes from
    count(o_custkey) ignoring the left join's nulls."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per = (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def agg_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (round 15): one month's promo revenue share —
    the conditional-aggregate ratio (two exact DECIMAL sums out of one
    scan, CASE inside the aggregate, one division at the edge). The
    month filter reaches the lineitem scan; part broadcasts. Both
    engines divide the same two exact decimals as doubles, so the 6dp
    round is boundary-free; try_divide guards the empty-month
    degenerate (repo convention)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-09-01")
            & (F.col("l_shipdate") < "1997-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    agg = (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("promo"),
            F.sum(rev).alias("total"),
        )
    )
    return agg.select(
        F.round(
            F.try_divide(
                F.col("promo").cast("double"), F.col("total").cast("double")
            )
            * F.lit(100.0),
            6,
        ).alias("promo_share"),
        F.round(F.col("promo").cast("double"), 2).alias("promo_revenue"),
        F.round(F.col("total").cast("double"), 2).alias("total_revenue"),
    )


def join_top_supplier_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q15 shape (round 15): the supplier(s) whose one-quarter
    revenue equals the maximum — the view-then-scalar-max pattern,
    done in ONE pass: the global max is a window over the
    POST-AGGREGATE per-supplier table (supplier-cardinality — bounded
    by the catalog, never the corpus), so lineitem is scanned once.
    The naive crossJoin(agg(max)) alternative re-derives the whole
    view for the max side — Spark's exchange reuse does NOT dedup it
    (verified in the r15 executed plan: two lineitem scans) — which at
    100 TB is a second fact scan to compute one number. Equality
    compares exact DECIMALs, so ties are exact, never
    float-adjacent."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    per = li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_exact"))
    w = Window.partitionBy()
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.withColumn("mx", F.max("rev_exact").over(w))
        .filter(F.col("rev_exact") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("rev_exact").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
    )


def agg_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (round 15): average yearly revenue lost if
    small-quantity orders (below 20% of the part's mean order size)
    moved to bulk — the correlated per-part AVG. Decorrelated
    Spark-first: ONE groupBy(partkey) over the brand-filtered join
    computes (Σqty, n) per part, re-joined to the same rows; the 20%
    comparison is cross-multiplied to exact integers
    (5·qty·n < Σqty — no float avg, no boundary), the oracle keeps the
    textbook correlated form so the derivations are independent."""
    pt = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    joined = li.join(
        F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per = joined.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("nq")
    )
    small = joined.join(per, F.col("l_partkey") == F.col("pk")).filter(
        qty * F.col("nq") * F.lit(5) < F.col("sq")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            / F.lit(7.0),
            2,
        ).alias("avg_yearly")
    )


def filter_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape (round 15): revenue under an OR of three
    (brand, size-range, quantity-range) conjunctions — the disjunctive
    predicate that defeats naive pushdown splitting. The shared
    conjuncts Catalyst CAN factor (p_size ≥ 1, quantity bounds) reach
    the scans; the residual OR evaluates post-join against the
    broadcast part side; one exact DECIMAL sum out."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(cond)
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


def agg_idle_customer_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape (round 15): positive-balance-above-average
    customers from a nation set who never ordered (this schema has no
    c_phone, so the country-code IN becomes a c_nationkey IN). The
    global-scalar threshold is a 1-row broadcast crossJoin, and the
    comparison is CROSS-MULTIPLIED to exact decimals
    (acctbal·n > Σbal — the avg never materializes as a float, so no
    engine can disagree at the boundary); the NOT EXISTS is a
    left-anti join onto DATE-FILTERED orders ("no order since the
    cut" — every customer in this corpus has SOME order, so the
    textbook never-ordered form would be a 0-row gate row that checks
    nothing, the Q21 lesson; the filter reaches the orders scan below
    the anti join)."""
    keys = (1, 5, 9, 13, 17, 21, 24)
    cs = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*keys))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    bal = F.col("c_acctbal").cast("decimal(20,2)")
    th = cs.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("s"), F.count(F.lit(1)).alias("n")
    )
    cand = cs.crossJoin(F.broadcast(th)).filter(
        bal * F.col("n") > F.col("s")
    )
    idle = cand.join(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("totacctbal"),
    )


def join_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (round 15): shipping volume between two nations
    by year, in BOTH directions — the two-aliased-dimension pattern
    (nation joined twice under different roles) plus a disjunctive
    pair filter that only fixes the direction AFTER both joins.
    Spark-first: supplier⋈nation and customer⋈nation are both
    broadcast (pre-filtered to the two nations, so the fact rows
    shrink at the join, not in a late filter); year() is evaluated
    once in the aggregate key. Exact DECIMAL revenue."""
    pair = ("NATION_3", "NATION_7")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*pair)
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            F.year("l_shipdate").alias("l_year"),
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(rev).alias("rev_exact"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("rev_exact").cast("double"), 2).alias("volume"),
        )
    )


def join_returned_revenue_top(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q10 shape (round 15): top-20 customers by revenue lost to
    returned items in one quarter — date-filtered orders ⋈ R-flagged
    lineitems ⋈ customer, per-customer exact DECIMAL revenue,
    TakeOrderedAndProject on (revenue DESC, c_custkey ASC — the unique
    key completes the total order). Both selective filters reach their
    parquet scans; customer broadcasts."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-07-01")
            & (F.col("o_orderdate") < "1997-10-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(rev).alias("rev_exact"))
        .orderBy(F.desc("rev_exact"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rev_exact").cast("double"), 2).alias("revenue"),
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
        )
    )


def agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (round 15): one nation's share of a region's
    order revenue by year — the GROUPED conditional-aggregate ratio
    (Q14's CASE-in-aggregate, but per group): numerator and
    denominator are exact DECIMAL sums out of the same scan, one
    guarded double divide per year at the edge. Customers restricted
    to the region (broadcast nation⋈region), the candidate supplier
    nation tagged via a broadcast supplier join."""
    nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("sup_nk")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(
            "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
        )
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("sup_nk") == 7, rev).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("nat_rev"),
        F.sum(rev).alias("all_rev"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.try_divide(
                F.col("nat_rev").cast("double"),
                F.col("all_rev").cast("double"),
            ),
            6,
        ).alias("mkt_share"),
        F.round(F.col("all_rev").cast("double"), 2).alias("total_revenue"),
    )


def agg_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (round 15): profit by supplier nation and year
    over a part-name-filtered slice — the two-product expression
    aggregate: Σ (price·(1−disc) − cost·qty), with p_retailprice·0.6
    standing in for ps_supplycost (no partsupp in this schema). Both
    products stay exact DECIMAL at deliberately TIGHT widths (see the
    inline width note), nation and the filtered part broadcast, one
    shuffle per fact join."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    # Width discipline (the r13 chained-decimal rule): (12,2)×(2,1)
    # ×(6,2) → (22,5), nowhere near the 38 cap, so Spark never
    # silently shrinks the scale; DuckDB's per-element products stay
    # inside int64. Wider casts here would LOOK safer and be wrong.
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.6).cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(6,2)")
    )
    return (
        li.join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(F.sum(rev - cost).alias("profit_exact"))
        .select(
            "n_name",
            "o_year",
            F.round(F.col("profit_exact").cast("double"), 2).alias(
                "profit"
            ),
        )
    )


def mixture_materialize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized training mixture (round 15;
    training_prep.mixture_materialize): per-language token targets for
    an 8k budget (BELOW the corpus token mass, so the cumulative cut
    actually bites — a never-cutting budget would be a filter that
    checks nothing) turned into an actual document selection —
    hash-ordered docs per language until the target is crossed, with
    pick order and running token total."""
    from pyspark import StorageLevel as _SL

    from collection_templates_spark.operators.training_prep import (
        bpe_ish_token_count,
        mixture_materialize,
        mixture_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    # ONE tokenizer pass (r16, guide §2.2): plan and materialize both
    # need the per-doc BPE-ish count, and each recomputed the corpus
    # regexp independently (scans are not deduped by exchange reuse).
    # The narrow (id, lang, n_tok) table is checkpointed DISK_ONLY
    # (corpus-sized → the r15 storage rule) and feeds both steps.
    counted = docs.select(
        "doc_id",
        "lang",
        F.coalesce(bpe_ish_token_count(F.col("text")), F.lit(0))
        .cast("long")
        .alias("___n_tok"),
    ).localCheckpoint(eager=True, storageLevel=_SL.DISK_ONLY)
    plan = mixture_plan(
        counted, target_tokens=8_000, token_count_col="___n_tok"
    )
    return mixture_materialize(
        counted, plan, token_count_col="___n_tok"
    )


def pack_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit over the documents table
    (training_prep.length_bucket_stats): per power-of-two token
    bucket, doc count, token mass, padding waste, and utilization —
    the padding-economics table next to pack_sequences' bin-packing."""
    from collection_templates_spark.operators.training_prep import (
        length_bucket_stats,
    )

    return length_bucket_stats(_t(spark, sf_dir, "documents"))


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-distance outliers over the embeddings table
    (linalg.centroid_outliers): top-5 farthest vectors per label by
    exact integer squared distance — the embedding-QC sweep."""
    from collection_templates_spark.operators.linalg import (
        centroid_outliers,
    )

    return centroid_outliers(_t(spark, sf_dir, "embeddings"))


def _als_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(
            li.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it")
        )
        .agg(F.count(F.lit(1)).alias("r"))
    )


def _als_train_for(spark: SparkSession, sf_dir: str, split: str):
    """Memoized ALS factor fill (the _TRAINER_MEMO convention: the
    sweep chain is a trainer, the fill bills to the first consumer;
    keyed by content fingerprint + applicationId). ``split`` is
    "all" (factors row) or "train" (eval row's (u+it)%5 != 0 side).
    Returns (user_factors, item_factors) eager checkpoints."""
    from collection_templates_spark.operators.product_analytics import (
        als_implicit_rank2,
    )

    key = (
        "als",
        split,
        sf_dir,
        # BOTH input tables (_als_interactions joins orders⋈lineitem;
        # the driver can regenerate one without the other — ADVICE r14)
        _table_fingerprint(sf_dir, "lineitem"),
        _table_fingerprint(sf_dir, "orders"),
        spark.sparkContext.applicationId,
    )
    if key not in _TRAINER_MEMO:
        inter = _als_interactions(spark, sf_dir)
        if split == "train":
            inter = inter.filter((F.col("u") + F.col("it")) % 5 != 0)
        users, items = als_implicit_rank2(inter)
        _TRAINER_MEMO[key] = (
            users.localCheckpoint(eager=True),
            items.localCheckpoint(eager=True),
        )
    return _TRAINER_MEMO[key]


def recsys_als_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration implicit-feedback ALS at rank 2
    (product_analytics.als_implicit_rank2, round 14, r13 verdict #4):
    the customer × part purchase-count matrix factorized by 2
    alternating sweeps of exact-integer 2×2 normal-equation solves
    (c = 1 + 40·r confidence, λ = 0.1, Hu-Koren-Volinsky) — the
    model-based recommender next to basket_item_similarity's
    neighborhood method. Factors are carried as 6dp micros between
    half-sweeps, every accumulation is DECIMAL-exact and the
    closed-form solve requantizes in exact integer arithmetic (zero
    float steps anywhere, r14 verdict #1), so the generated oracle
    unrolls the whole 4-half-sweep chain with a HUGEINT division
    ladder; output is the factor table for the custkey/partkey ≡ 0
    (mod 20) cohorts."""
    users, items = _als_train_for(spark, sf_dir, "all")

    def _pick(df: DataFrame, entity: str) -> DataFrame:
        return df.filter(F.col("fid") % 20 == 0).select(
            F.lit(entity).alias("entity"),
            F.col("fid").alias("id"),
            (F.col("f0u").cast("double") / F.lit(1.0e6)).alias("f0"),
            (F.col("f1u").cast("double") / F.lit(1.0e6)).alias("f1"),
        )

    return _pick(users, "user").unionByName(_pick(items, "item"))


def recsys_als_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out ranking quality of the ALS factorization
    (product_analytics.als_rank_eval, round 14): interactions split
    (u + it) % 5, factors trained on the train side only, and every
    mod-40 test user's non-train items ranked by the EXACT integer
    factor dot product — hit-rate@10 / MRR@10 against the held-out
    pairs, reciprocal ranks accumulated as lcm-scaled integers so the
    means are single double divides. Completes the recommender
    train → eval loop the way ltr_train_weights → ltr_rank_metrics
    does for LTR; the oracle replays the trained chain plus the
    ranking with the same 2520/rank integer trick."""
    from collection_templates_spark.operators.product_analytics import (
        als_rank_eval,
    )

    inter = _als_interactions(spark, sf_dir)
    train = inter.filter((F.col("u") + F.col("it")) % 5 != 0)
    # FIXED eval cohort (mod sample capped at an absolute key bound):
    # a mod-only cohort grows with the user table while the ranked
    # catalog grows with items — users x items = quadratic eval work
    # (measured 1.19 exponent sf0.1 -> sf1). Offline ranking eval at
    # scale holds the cohort constant and lets only the catalog grow
    # (linear; and past that the catalog side goes through the ANN
    # index, per the operator docstring).
    test = inter.filter(
        ((F.col("u") + F.col("it")) % 5 == 0)
        & (F.col("u") % 40 == 0)
        & (F.col("u") < 15000)
    )
    users_f, items_f = _als_train_for(spark, sf_dir, "train")
    return als_rank_eval(users_f, items_f, train, test, k=10)


def search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (search.search_rrf_fusion) of the raw
    tf·idf and SMART-cosine rankings for 'spark hash join': score-free
    1/(60+rank) hybrid, fused top-10 — both constituent rankings are
    themselves oracled bank rows."""
    from collection_templates_spark.operators.search import (
        search_rrf_fusion,
    )

    return search_rrf_fusion(
        _t(spark, sf_dir, "documents"), "spark hash join", k=10, pool=20
    )


def agg_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (round 15): per ship-delay bucket (this schema
    has no l_shipmode, so the mode IN becomes a derived
    days-from-order bucket — the synthetic corpus ships before the
    order date too, so 'early' is a real bucket), counts of
    high-priority (1-URGENT/2-HIGH) vs lower-priority order lines
    shipped in 1997. The Q12 plan essence: a large⋈large equi join
    (neither side broadcastable) feeding a CASE-conditional aggregate
    whose group key is computed, not stored — the filter reaches the
    lineitem scan, the join keys only on l_orderkey, and both
    conditional sums ride one map-side-combined aggregate."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_shipdate")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    dd = F.datediff(
        F.to_date(F.col("l_shipdate")), F.to_date(F.col("o_orderdate"))
    )
    bucket = (
        F.when(dd <= 0, "early")
        .when(dd <= 30, "1-30")
        .when(dd <= 90, "31-90")
        .otherwise("90+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("delay_bucket")).agg(
        F.sum(high.cast("long")).alias("high_line_count"),
        F.sum((~high).cast("long")).alias("low_line_count"),
    )


def window_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact trailing-7-day distinct users per day
    (product_analytics.rolling_distinct_users): the rolling-WAU row —
    sliding COUNT(DISTINCT) realized as per-user coverage-interval
    merging (gaps-and-islands over active days, ±1 island-edge deltas,
    prefix sum over the bounded day spine), never a day×activity range
    join and never a row blow-up. The ORACLE derives the same answer
    via the independent cover-set identity (a user counts toward day d
    iff one of their active days covers d)."""
    from collection_templates_spark.operators.product_analytics import (
        rolling_distinct_users,
    )

    return rolling_distinct_users(
        _t(spark, sf_dir, "events"), window_days=7
    )


def quality_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted isotonic (PAVA) calibration of the quality_logistic
    score against the lang='en' label (stats.isotonic_calibration,
    100 bins): the monotone-regression upgrade of
    quality_calibration's raw reliability diagram. The corpus
    collapses to ≤100 integer bin rows map-side; PAVA pools with
    exact cross-multiplied integer compares; the oracle re-derives
    the same fit INDEPENDENTLY via the minimax characterization
    max_{j≤i} min_{k≥i} mean(y[j..k]) — two different algorithms,
    one unique optimum."""
    from collection_templates_spark.operators.stats import (
        isotonic_calibration,
    )
    from collection_templates_spark.operators.training_prep import (
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = quality_classifier(docs, passthrough=("lang",)).select(
        "score", (F.col("lang") == "en").alias("is_en")
    )
    return isotonic_calibration(labeled, "score", "is_en", n_bins=100)


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (functions/bpe.py::
    learn_bpe_merges_spark): 6 merges over the pruned
    (min_count=2, top-1500) word-frequency table of the documents
    corpus — the trainer itself as a hash-checked bank row (the
    driver-side trainer is pinned by unit tests only; this variant
    keeps the vocab distributed and is the 100M-word scale path).
    The oracle unrolls all 6 rounds as gaps-and-islands CTEs —
    pair-count argmax + greedy non-overlapping rebuild — entirely
    independently of the Spark loop. The learned 6-row merge table is
    a deterministic pure function of the documents corpus, so it
    memoizes through the trainer-memo convention (_memo_df) like the
    other trained artifacts (codebooks, ALS factors)."""
    from collection_templates_spark.functions.bpe import (
        bpe_word_counts,
        learn_bpe_merges_spark,
    )

    def build():
        docs = _t(spark, sf_dir, "documents")
        wc = bpe_word_counts(docs, min_count=2, max_words=1500)
        return learn_bpe_merges_spark(wc, n_merges=6)

    return _memo_df(spark, sf_dir, "bpe_merges", build, table="documents")


def join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (round 15, completing the 22-shape sweep with
    Q11/Q20 below): for each PROMO part, the EUROPE supplier(s)
    offering the minimum observed line price — the correlated-min
    subquery decorrelated Spark-first (this schema has no partsupp, so
    the cost table derives from lineitem: min l_extendedprice per
    (part, supplier)). The Q15 one-pass idiom again: the per-part min
    is a window over the POST-AGGREGATE (part x supplier) table —
    catalog-sized, never the corpus — so lineitem is scanned once;
    both dimension sides broadcast PRE-FILTERED (region prune reaches
    the supplier join, the part prune reaches the fact scan). Min and
    the tie equality compare exact DECIMAL(18,2); top-100 is
    total-ordered ((s_acctbal DESC, n_name, s_name, p_partkey) —
    s_name is unique per supplier, so the prefix is deterministic)."""
    nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pt = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15)
        )
        .select("p_partkey", "p_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cost = (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "c"
            )
        )
    )
    mn = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("mc", F.min("c").over(mn))
        .filter(F.col("c") == F.col("mc"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            F.round(F.col("c").cast("double"), 2).alias("min_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def agg_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (round 15): parts whose revenue through ASIA
    suppliers exceeds a GLOBAL-scalar threshold — here 2x the average
    part's value, which keeps the HAVING scale-free (TPC-H's fixed
    0.0001 fraction selects nothing once the catalog outgrows 10^4
    parts). Money is folded to integer CENTS per row
    (CAST(DECIMAL(18,2) x 100 AS BIGINT) — exact at 2dp), so the
    per-part sums, the global total, and the cross-multiplied compare
    (val x n_parts > 2 x total) are pure integer arithmetic: HUGEINT
    in the oracle, DECIMAL(38,0) operands here — no decimal-width
    double fallback (DuckDB converts >38-width decimal products to
    DOUBLE silently) and no float boundary. The global scalar does
    NOT use the Q15 window idiom: that window is unpartitioned over
    the GROUP table, fine at supplier/nation cardinality but a
    single-task buffer of the whole part CATALOG here (2e8 rows at
    100 TB). Instead the per-part aggregate localCheckpoints
    (catalog-sized, the ALS-factor convention), the scalar is a tiny
    reduce of the checkpoint, and a 1-row broadcast crossJoin carries
    it back — one fact scan, no giant window, no re-derivation."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_regionkey") == 2
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cents = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.lit(100).cast("decimal(3,0)")
    ).cast("long")
    per = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).alias("val_c"))
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("val_c").alias("tot_c"), F.count(F.lit(1)).alias("np")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val_c").cast("decimal(38,0)") * F.col("np")
            > F.col("tot_c").cast("decimal(38,0)") * F.lit(2)
        )
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.round(F.col("val_c").cast("double") / F.lit(100.0), 2).alias(
                "part_value"
            ),
        )
    )


def join_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (round 15): EUROPE suppliers who DOMINATED some
    PROMO part's 1997 shipments (their quantity > half the part's
    total — the availqty > 0.5 x shipped correlated threshold, with
    the inequality flipped onto this schema's lineitem-only facts).
    The textbook double-nested EXISTS decorrelates to: one
    (part, supplier) integer-quantity aggregate off the pruned fact
    scan, a per-part window total (the same one-pass idiom), the
    cross-multiplied dominance filter 2q > tot (l_quantity is
    integer-valued 1..50, so everything is int64), and a DISTINCT
    semi-join-shaped collapse onto the broadcast supplier dimension —
    lineitem scanned once, no correlated re-scan per supplier."""
    pt = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    sp = (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_regionkey") == 3
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    w = Window.partitionBy("l_partkey")
    dom = (
        sp.withColumn("tq", F.sum("q").over(w))
        .filter(F.col("q") * 2 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dom.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
        .orderBy("s_suppkey")
    )


def quality_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact midrank ROC-AUC (stats.roc_auc) of the quality_logistic
    score against the lang='en' label — the threshold-free ranking
    companion of quality_isotonic_calibration (one says the ORDER
    separates, the other that the probabilities are honest). Integer-
    exact to the last division via the Mann-Whitney identity on
    doubled units; the oracle re-derives the same midrank rank-sum in
    HUGEINT."""
    from collection_templates_spark.operators.stats import roc_auc
    from collection_templates_spark.operators.training_prep import (
        quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = quality_classifier(docs, passthrough=("lang",)).select(
        "score", (F.col("lang") == "en").alias("is_en")
    )
    return roc_auc(labeled, "score", "is_en")


def text_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (stats.cohens_kappa) between the marker-word
    language-ID prediction and the corpus ground-truth lang label —
    the chance-corrected scalar on top of text_langid_confusion's
    matrix. Integer-exact to the single final division (the n·diag −
    Σr·c identity, DECIMAL(38,0)/HUGEINT); the oracle replays the
    pinned langid tie rules and re-derives kappa independently."""
    from collection_templates_spark.operators.stats import cohens_kappa
    from collection_templates_spark.operators.text_analysis import (
        language_id,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("lang").alias("actual"),
        language_id(F.col("text")).alias("predicted"),
    )
    return cohens_kappa(pairs, "actual", "predicted")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # STALEST-EXTERNALLY-CHECKED queries FIRST (the driver samples ~50
    # of the bank per round in INSERTION ORDER — this dict's order is
    # the sampling lever). Rotated for round 14 per the r13 verdict
    # #1: the new r14 rows lead, then the 19 parity-core rows with no
    # external green since r9 (the r9-stale remainder the r13 sample
    # missed), then the r10/r11-stale cohorts; the 50 rows each of r12
    # and r13 just sampled sit at the back — so the r14 sample has
    # ZERO overlap with r13's. All rows pass the identical local
    # oracle (tools/check.py) every round; the full-bank artifact is
    # CHECKLOCAL_r{N}.json.
    # --- r14 new rows (never externally sampled) ---
    "dedup_index_delete": dedup_index_delete,
    "ann_index_delete": ann_index_delete,
    "embedding_pca_components": embedding_pca_components,
    "recsys_als_factors": recsys_als_factors,
    "events_ar2_forecast": events_ar2_forecast,
    "recsys_als_eval": recsys_als_eval,
    "join_shipping_priority": join_shipping_priority,
    "agg_large_orders": agg_large_orders,
    # --- r9-stale parity core (no external green since r9) ---
    "agg_rollup_daily": agg_rollup_daily,
    "scalar_json_extract": scalar_json_extract,
    "join_inner_enrich": join_inner_enrich,
    "join_left_default": join_left_default,
    "join_semi_allowlist": join_semi_allowlist,
    "join_anti_archive": join_anti_archive,
    "snapshot_diff_merge": snapshot_diff_merge,
    "window_dup_count": window_dup_count,
    "window_topk_per_group": window_topk_per_group,
    "window_dedup_keep_first": window_dedup_keep_first,
    "window_sessionize": window_sessionize,
    "window_session_native": window_session_native,
    "window_hopping": window_hopping,
    "temporal_asof_join": temporal_asof_join,
    "temporal_range_join": temporal_range_join,
    "set_union_membership": set_union_membership,
    "scalar_curate_name": scalar_curate_name,
    "graph_transitive_closure": graph_transitive_closure,
    "dedup_exact": dedup_exact,
    # --- r10-stale ---
    "ann_incremental_topk": ann_incremental_topk,
    "sketch_hll_union": sketch_hll_union,
    "events_markov_transitions": events_markov_transitions,
    "text_script_mix": text_script_mix,
    "agg_weighted_median": agg_weighted_median,
    "graph_label_propagation": graph_label_propagation,
    "snapshot_merge_upsert": snapshot_merge_upsert,
    "basket_item_pairs": basket_item_pairs,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "drift_welch_ttest": drift_welch_ttest,
    "text_zipf_fit": text_zipf_fit,
    "dedup_cluster_report": dedup_cluster_report,
    "events_conversion_lag": events_conversion_lag,
    "drift_js_events": drift_js_events,
    "stats_winsorize": stats_winsorize,
    "text_token_pmi": text_token_pmi,
    "events_state_islands": events_state_islands,
    "events_window_funnel": events_window_funnel,
    "join_salted_skew": join_salted_skew,
    "layout_zorder_stats": layout_zorder_stats,
    "temporal_gap_fill": temporal_gap_fill,
    "events_trailing_zscore": events_trailing_zscore,
    "quality_dynamic_threshold": quality_dynamic_threshold,
    "corpus_cross_source_overlap": corpus_cross_source_overlap,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_clusters": dedup_clusters,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "agg_pricing_summary": agg_pricing_summary,
    "filter_pushdown_revenue": filter_pushdown_revenue,
    "text_stats": text_stats,
    "text_language_id": text_language_id,
    "text_fingerprint": text_fingerprint,
    "text_token_frequencies": text_token_frequencies,
    "text_chunking": text_chunking,
    "ann_label_centroids": ann_label_centroids,
    "window_running_total": window_running_total,
    "search_bm25ish": search_bm25ish,
    "search_stemmed_ltr": search_stemmed_ltr,
    "quality_report": quality_report,
    "multimodal_features": multimodal_features,
    "text_word_model": text_word_model,
    "scalar_log_probability": scalar_log_probability,
    "wiki_pipeline_funnel": wiki_pipeline_funnel,
    "related_collections": related_collections_q,
    "graph_pagerank_dangling": graph_pagerank_dangling,
    "rollup_refresh": rollup_refresh,
    "sketch_theta_intersection": sketch_theta_intersection,
    "sketch_bloom_fpr": sketch_bloom_fpr,
    # --- r11-stale ---
    "stats_ks_test": stats_ks_test,
    "stats_chi_square": stats_chi_square,
    "stats_correlation": stats_correlation,
    "events_anomaly_mad": events_anomaly_mad,
    "events_cusum_changepoint": events_cusum_changepoint,
    "events_attribution": events_attribution,
    "customer_rfm_segments": customer_rfm_segments,
    "events_top_paths": events_top_paths,
    "graph_kcore": graph_kcore,
    "graph_link_prediction": graph_link_prediction,
    "text_readability": text_readability,
    "text_entropy": text_entropy,
    "quality_gopher_rules": quality_gopher_rules,
    "sample_reservoir": sample_reservoir_q,
    "ann_sq8_recall": ann_sq8_recall,
    "text_rake_keywords": text_rake_keywords,
    "stats_ols_regression": stats_ols_regression,
    "text_feature_hashing": text_feature_hashing,
    "decontaminate_fuzzy": decontaminate_fuzzy,
    "events_ewma": events_ewma,
    "search_phrase_match": search_phrase_match,
    "stats_mann_whitney": stats_mann_whitney,
    "agg_gini_concentration": agg_gini_concentration,
    "text_langid_confusion": text_langid_confusion,
    "temporal_ohlc": temporal_ohlc,
    "events_autocorrelation": events_autocorrelation,
    "stats_benford": stats_benford,
    "graph_assortativity": graph_assortativity,
    "corpus_dsir_weights": corpus_dsir_weights,
    "events_interval_coverage": events_interval_coverage,
    "graph_clustering_coeff": graph_clustering_coeff,
    "text_heaps_fit": text_heaps_fit,
    "events_seasonal_decompose": events_seasonal_decompose,
    "events_pattern_runs": events_pattern_runs,
    "text_lexical_diversity": text_lexical_diversity,
    "text_perplexity_kn": text_perplexity_kn,
    "ann_knn_accuracy": ann_knn_accuracy,
    "graph_hits": graph_hits,
    "text_common_spans": text_common_spans,
    "window_rank_functions": window_rank_functions,
    "window_range_moving_sum": window_range_moving_sum,
    "agg_unpivot": agg_unpivot,
    "dedup_fuzzy_names": dedup_fuzzy_names,
    "agg_percentile_bands": agg_percentile_bands,
    "agg_boolean": agg_boolean,
    "scalar_array_functions": scalar_array_functions,
    "agg_grouping_sets": agg_grouping_sets,
    "corpus_report": corpus_report,
    "export_manifest": export_manifest_q,
    "text_boilerplate": text_boilerplate,
    # --- sampled by the r12 driver gate (freshest external) ---
    "ltr_train_weights": ltr_train_weights,
    "ltr_ndcg_eval": ltr_ndcg_eval,
    "stats_spearman": stats_spearman,
    "stats_kendall": stats_kendall,
    "events_theil_sen": events_theil_sen,
    "stats_bootstrap_ci": stats_bootstrap_ci,
    "stats_anova": stats_anova,
    "stats_kruskal_wallis": stats_kruskal_wallis,
    "stats_two_proportion": stats_two_proportion,
    "events_cuped": events_cuped,
    "events_kaplan_meier": events_kaplan_meier,
    "profile_events": profile_events,
    "graph_bfs_layers": graph_bfs_layers,
    "drift_psi_events": drift_psi_events,
    "quality_calibration": quality_calibration,
    "events_user_growth": events_user_growth,
    "privacy_k_anonymity": privacy_k_anonymity,
    "skew_key_report": skew_key_report,
    "search_tfidf_cosine": search_tfidf_cosine_q,
    "lineitem_pareto_abc": lineitem_pareto_abc,
    "ann_centroid_separation": ann_centroid_separation,
    "events_rolling_median": events_rolling_median,
    "events_cohort_ltv": events_cohort_ltv,
    "text_containment": text_containment,
    "text_perplexity": text_perplexity,
    "text_winnowing": text_winnowing,
    "vocab_oov": vocab_oov_q,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "bpe_apply_stats": bpe_apply_stats,
    "dedup_semantic": dedup_semantic,
    "quality_logistic": quality_logistic,
    "text_perplexity_bigram": text_perplexity_bigram,
    "bpe_fertility_by_lang": bpe_fertility_by_lang,
    "corpus_funnel": corpus_funnel,
    "sketch_cms_errors": sketch_cms_errors,
    "sketch_hll_cardinality": sketch_hll_cardinality,
    "graph_pagerank": graph_pagerank,
    "sample_weighted": sample_weighted_q,
    "text_top_terms": text_top_terms,
    "dedup_paragraph": dedup_paragraph,
    "dedup_keep_best": dedup_keep_best,
    "events_cohort_retention": events_cohort_retention,
    "graph_triangle_count": graph_triangle_count,
    "sketch_quantile_errors": sketch_quantile_errors,
    "dedup_incremental": dedup_incremental,
    "delta_pipeline": delta_pipeline,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_recall": ann_lsh_recall,
    # --- sampled by the r13 driver gate (freshest external): the 30
    # r13-new rows + the 20 r9-stale rows the r13 sample re-covered ---
    "embedding_pca_power": embedding_pca_power,
    "temporal_dtw": temporal_dtw,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "graph_ppr": graph_ppr,
    "events_holt_forecast": events_holt_forecast,
    "sketch_theta_difference": sketch_theta_difference,
    "sketch_hll_sliding": sketch_hll_sliding,
    "temporal_sax_words": temporal_sax_words,
    "stats_breusch_pagan": stats_breusch_pagan,
    "events_nelson_aalen": events_nelson_aalen,
    "stats_durbin_watson": stats_durbin_watson,
    "lineitem_skyline": lineitem_skyline,
    "basket_item_similarity": basket_item_similarity,
    "search_rrf": search_rrf,
    "sketch_quantile_merge": sketch_quantile_merge,
    "stats_levene": stats_levene,
    "stats_jarque_bera": stats_jarque_bera,
    "stats_grubbs": stats_grubbs,
    "stats_permutation": stats_permutation,
    "events_poisson_rate": events_poisson_rate,
    "feature_mutual_information": feature_mutual_information,
    "graph_shortest_paths": graph_shortest_paths,
    "text_ngram_novelty": text_ngram_novelty,
    "temporal_downsample_lttb": temporal_downsample_lttb,
    "ltr_rank_metrics": ltr_rank_metrics_q,
    "stats_srm_check": stats_srm_check,
    "stats_power_analysis": stats_power_analysis,
    "stats_tost": stats_tost,
    "stats_mahalanobis": stats_mahalanobis,
    "quality_ece": quality_ece,
    "ann_ivf_recall": ann_ivf_recall,
    "ann_pq_topk": ann_pq_topk,
    "ann_pq_rerank": ann_pq_rerank,
    "ann_respq_topk": ann_respq_topk,
    "ann_respq_recall": ann_respq_recall,
    "ann_pq_recall": ann_pq_recall,
    "decontaminate_ngrams": decontaminate_ngrams,
    "pack_sequences": pack_sequences_windows,
    "text_repetition": text_repetition,
    "redact_pii": redact_pii,
    "decontaminate_spans": decontaminate_spans,
    "split_assignment": split_assignment,
    "sample_stratified": sample_stratified_q,
    "mixture_plan": mixture_plan_q,
    "agg_entity_pivot": agg_entity_pivot,
    "agg_status_histogram": agg_status_histogram,
    "agg_member_metrics": agg_member_metrics,
    "agg_merge_collections": agg_merge_collections,
    "date_daily_rollup": date_daily_rollup,
    "agg_pivot_event_types": agg_pivot_event_types,
    # --- r15 new rows ---
    "rollup_incremental_delete": rollup_incremental_delete,
    "join_exists_late_orders": join_exists_late_orders,
    "agg_supplier_parts_distinct": agg_supplier_parts_distinct,
    "join_sole_late_supplier": join_sole_late_supplier,
    "text_chunk_windows": text_chunk_windows,
    "join_region_nation_revenue": join_region_nation_revenue,
    "agg_order_count_distribution": agg_order_count_distribution,
    "agg_promo_revenue_share": agg_promo_revenue_share,
    "join_top_supplier_revenue": join_top_supplier_revenue,
    "agg_small_qty_revenue": agg_small_qty_revenue,
    "filter_disjunctive_revenue": filter_disjunctive_revenue,
    "agg_idle_customer_balance": agg_idle_customer_balance,
    "join_nation_pair_volume": join_nation_pair_volume,
    "join_returned_revenue_top": join_returned_revenue_top,
    "agg_market_share": agg_market_share,
    "agg_nation_profit": agg_nation_profit,
    "mixture_materialize": mixture_materialize_q,
    "pack_bucket_stats": pack_bucket_stats,
    "embedding_outliers": embedding_outliers,
    "agg_ship_delay_priority": agg_ship_delay_priority,
    "window_sliding_distinct_users": window_sliding_distinct_users,
    "quality_isotonic_calibration": quality_isotonic_calibration,
    "bpe_train_merges": bpe_train_merges,
    "join_min_cost_supplier": join_min_cost_supplier,
    "agg_part_value_share": agg_part_value_share,
    "join_dominant_supplier": join_dominant_supplier,
    "quality_roc_auc": quality_roc_auc,
    "text_langid_kappa": text_langid_kappa,
}

# r16 rotation (r15 verdict #8): the driver samples ~50 rows in
# INSERTION ORDER — recsys_als_eval leads (externally red r14/r15;
# the r16 fix needs an external check), then the 6 rows whose last
# external green was r10, then the 50-row r11-stale cohort (57 rows
# ahead of the sample boundary, zero overlap with the r15 sample);
# the 50 rows r15 just checked move to the back.
_R16_FRONT = (
    "recsys_als_eval",
    "wiki_pipeline_funnel",
    "related_collections",
    "graph_pagerank_dangling",
    "rollup_refresh",
    "sketch_theta_intersection",
    "sketch_bloom_fpr",
    "stats_ks_test",
    "stats_chi_square",
    "stats_correlation",
    "events_anomaly_mad",
    "events_cusum_changepoint",
    "events_attribution",
    "customer_rfm_segments",
    "events_top_paths",
    "graph_kcore",
    "graph_link_prediction",
    "text_readability",
    "text_entropy",
    "quality_gopher_rules",
    "sample_reservoir",
    "ann_sq8_recall",
    "text_rake_keywords",
    "stats_ols_regression",
    "text_feature_hashing",
    "decontaminate_fuzzy",
    "events_ewma",
    "search_phrase_match",
    "stats_mann_whitney",
    "agg_gini_concentration",
    "text_langid_confusion",
    "temporal_ohlc",
    "events_autocorrelation",
    "stats_benford",
    "graph_assortativity",
    "corpus_dsir_weights",
    "events_interval_coverage",
    "graph_clustering_coeff",
    "text_heaps_fit",
    "events_seasonal_decompose",
    "events_pattern_runs",
    "text_lexical_diversity",
    "text_perplexity_kn",
    "ann_knn_accuracy",
    "graph_hits",
    "text_common_spans",
    "window_rank_functions",
    "window_range_moving_sum",
    "agg_unpivot",
    "dedup_fuzzy_names",
    "agg_percentile_bands",
    "agg_boolean",
    "scalar_array_functions",
    "agg_grouping_sets",
    "corpus_report",
    "export_manifest",
    "text_boilerplate",
)
_R15_SAMPLED = (
    "text_langid_kappa",
    "quality_roc_auc",
    "join_min_cost_supplier",
    "agg_part_value_share",
    "join_dominant_supplier",
    "agg_ship_delay_priority",
    "window_sliding_distinct_users",
    "quality_isotonic_calibration",
    "bpe_train_merges",
    "rollup_incremental_delete",
    "join_exists_late_orders",
    "agg_supplier_parts_distinct",
    "join_sole_late_supplier",
    "text_chunk_windows",
    "join_region_nation_revenue",
    "agg_order_count_distribution",
    "agg_promo_revenue_share",
    "join_top_supplier_revenue",
    "agg_small_qty_revenue",
    "filter_disjunctive_revenue",
    "agg_idle_customer_balance",
    "join_nation_pair_volume",
    "join_returned_revenue_top",
    "agg_market_share",
    "agg_nation_profit",
    "mixture_materialize",
    "pack_bucket_stats",
    "embedding_outliers",
    "recsys_als_eval",
    "corpus_cross_source_overlap",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "agg_pricing_summary",
    "filter_pushdown_revenue",
    "text_stats",
    "text_language_id",
    "text_fingerprint",
    "text_token_frequencies",
    "text_chunking",
    "ann_label_centroids",
    "window_running_total",
    "search_bm25ish",
    "search_stemmed_ltr",
    "quality_report",
    "multimodal_features",
    "text_word_model",
    "scalar_log_probability",
)
QUERIES = {
    **{k: QUERIES[k] for k in _R16_FRONT},
    **{
        k: v
        for k, v in QUERIES.items()
        if k not in _R16_FRONT and k not in _R15_SAMPLED
    },
    **{k: QUERIES[k] for k in _R15_SAMPLED if k not in _R16_FRONT},
}



def memo_backed_queries() -> list[str]:
    """Bank rows that serve (partly) from a process-lifetime memo
    (_TRAINER_MEMO / _INCR_INDEX_MEMO / the shared CC labels) after
    their first run — derived from the source so the list follows the
    code. bench.py labels these in its side file: their min-of-N is a
    warm-memo measurement, a DIFFERENT operation than run 1 (r9 verdict
    cosmetic #3 — the 0.017 s dedup_incremental min was probe-only)."""
    import inspect
    import re

    pat = re.compile(
        r"_memo_df|_brute_topk_for|_lsh_topk_for|_ivf_topk_for|_pq_"
        r"|_respq_|_ivfpq_|_ivf_centroids_for|_perplexity_pairs_for"
        r"|_bigram_counts_for|_unigram_model_for|_incremental_probe_for"
        r"|_lsh_cc_for|_ann_index_probe_for|_delete_probe_for"
        r"|_als_train_for"
    )
    return sorted(
        name
        for name, fn in QUERIES.items()
        if pat.search(inspect.getsource(fn))
    )

# Shared oracle for the two jaccard-based dedup queries: the LSH variant is
# candidate-generation + exact-verify, so its output equals the exact pair
# set. The oracled queries pin min_band_collisions=1 (any-band candidacy:
# miss ≈ (1-j^2)^32 ≈ 1e-4 per pair at j=0.5); the operator DEFAULT of 2
# would raise that to (1-p)^32 + 32p(1-p)^31 ≈ 1.2e-3 — acceptable for
# stress-scale dedup (planted dups sit at j ≥ 0.9, miss ~1e-22) but not
# worth the gate-flakiness risk against an exact oracle on a corpus the
# driver can regenerate.
_NGRAM_JACCARD_SQL = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1 AS doc1, d2 AS doc2,
           round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE round(c * 1.0 / (s1.n + s2.n - c), 6) >= 0.5
"""

ORACLE_SQL: dict[str, str] = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_pushdown_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "agg_entity_pivot": """
        SELECT user_id,
               count(*) AS n_events,
               arg_min(event_type, event_id) AS first_type,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
    "agg_status_histogram": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                 + sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinal,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 4) AS finished_ratio
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_member_metrics": """
        SELECT n_name AS nation_name,
               round(avg(c_acctbal), 4) AS avg_bal,
               round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
               round(greatest(avg(c_acctbal), 1e-8), 4) AS avg_bal_clamped,
               count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "agg_merge_collections": """
        SELECT o_custkey AS custkey,
               min(o_orderkey) AS merged_id,
               count(*) AS members_count,
               round(sum(o_totalprice), 2) AS total_price,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               max(o_orderpriority) AS max_priority,
               CAST(count(*) > 1 AS INT) AS is_merged
        FROM orders GROUP BY o_custkey
    """,
    "date_daily_rollup": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "agg_pivot_event_types": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "agg_rollup_daily": """
        SELECT coalesce(day, 'ALL') AS day,
               coalesce(event_type, 'ALL') AS event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value
              FROM events)
        GROUP BY ROLLUP(day, event_type)
    """,
    "scalar_json_extract": """
        SELECT event_type,
               count(k) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               max(k) AS max_k
        FROM (SELECT event_type,
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS k
              FROM events)
        GROUP BY event_type
    """,
    "join_inner_enrich": """
        SELECT r_name AS region_name, n_name AS nation_name,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "join_left_default": """
        SELECT c_custkey AS custkey,
               count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_semi_allowlist": """
        SELECT l_returnflag,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part
            WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
        GROUP BY l_returnflag
    """,
    "join_anti_archive": """
        SELECT c_mktsegment AS segment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "snapshot_diff_merge": """
        WITH prev AS (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
                   count(*) AS cnt
            FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_custkey
        ), curr AS (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
                   count(*) AS cnt
            FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
            GROUP BY o_custkey
        ), hp AS (
            SELECT o_custkey,
                   sha256(CAST(cents AS VARCHAR) || '|' || CAST(cnt AS VARCHAR)) AS h
            FROM prev
        ), hc AS (
            SELECT o_custkey,
                   sha256(CAST(cents AS VARCHAR) || '|' || CAST(cnt AS VARCHAR)) AS h
            FROM curr
        )
        SELECT coalesce(hp.o_custkey, hc.o_custkey) AS custkey,
               CASE WHEN hp.o_custkey IS NULL THEN 'insert'
                    WHEN hc.o_custkey IS NULL THEN 'archive'
                    WHEN hp.h <> hc.h THEN 'update'
                    ELSE 'noop' END AS op
        FROM hp FULL OUTER JOIN hc ON hp.o_custkey = hc.o_custkey
    """,
    "window_dup_count": """
        SELECT p_partkey, p_brand, p_size, n_dups FROM (
            SELECT p_partkey, p_brand, p_size,
                   count(*) OVER (PARTITION BY p_brand, p_size) AS n_dups
            FROM part)
        WHERE n_dups > 1
    """,
    "window_topk_per_group": """
        SELECT custkey, o_orderkey, rn, round(score, 6) AS score_r FROM (
            SELECT o_custkey AS custkey, o_orderkey,
                   log2(o_totalprice + 1) / greatest(length(o_orderstatus), 10) AS score,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY log2(o_totalprice + 1) / greatest(length(o_orderstatus), 10) DESC,
                                o_orderkey ASC) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    "window_dedup_keep_first": """
        SELECT l_returnflag,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC,
                         l_extendedprice ASC) AS rn
            FROM lineitem)
        WHERE rn = 1
        GROUP BY l_returnflag
    """,
    "window_sessionize": """
        SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
            SELECT user_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        GROUP BY user_id
    """,
    "window_hopping": """
        SELECT strftime(date_trunc('hour', ts) - i.i * INTERVAL 1 HOUR,
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events, (SELECT unnest(range(2)) AS i) i
        WHERE ts IS NOT NULL
        GROUP BY 1, event_type
    """,
    "window_session_native": """
        WITH flagged AS (
            -- >= (not >): session_window merges half-open [ts, ts+gap)
            -- intervals, so an event exactly gap after the previous one
            -- starts a NEW session in Spark.
            SELECT user_id, ts, value,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                >= 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), ids AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM ids GROUP BY user_id, sid
    """,
    "temporal_asof_join": """
        WITH clicks AS (SELECT user_id, ts, max(event_id) AS event_id
                        FROM events WHERE event_type = 'click'
                        GROUP BY user_id, ts),
        purch AS (SELECT user_id, ts, event_id FROM events
                  WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id,
               c.event_id AS click_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM purch p ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "temporal_range_join": """
        WITH clicks AS (SELECT user_id, ts FROM events
                        WHERE event_type = 'click'),
        purch AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase')
        SELECT c.user_id,
               count(*) AS n_pairs,
               min(epoch_us(p.ts) - epoch_us(c.ts)) AS min_gap_us
        FROM clicks c JOIN purch p
            ON c.user_id = p.user_id
           AND p.ts >= c.ts
           AND epoch_us(p.ts) <= epoch_us(c.ts) + 300000000
        GROUP BY c.user_id
    """,
    "set_union_membership": """
        SELECT nationkey,
               max(in_customer) AS in_customer,
               max(in_supplier) AS in_supplier,
               CAST(max(in_customer) + max(in_supplier) = 2 AS INT) AS in_both
        FROM (
            SELECT c_nationkey AS nationkey, 1 AS in_customer, 0 AS in_supplier
            FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 0 AS in_customer, 1 AS in_supplier
            FROM supplier)
        GROUP BY nationkey
    """,
    "scalar_curate_name": """
        SELECT p_partkey,
               upper(substr(cleaned, 1, 1)) || substr(cleaned, 2) AS curated,
               len(string_split(cleaned, ' ')) AS n_tokens
        FROM (
            SELECT p_partkey,
                   regexp_replace(
                       regexp_replace(replace(p_name, '_', ' '), ' \\(.*\\)$', ''),
                       '[.''-]', '', 'g') AS cleaned
            FROM part)
    """,
    "graph_transitive_closure": """
        WITH RECURSIVE edges(src, dst) AS (
            SELECT 'N' || CAST(n_nationkey AS VARCHAR),
                   'R' || CAST(n_regionkey AS VARCHAR) FROM nation
            UNION ALL
            SELECT 'C' || CAST(c_custkey AS VARCHAR),
                   'N' || CAST(c_nationkey AS VARCHAR) FROM customer
        ), closure(src, dst) AS (
            SELECT DISTINCT src, dst FROM edges
            UNION
            SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
        )
        SELECT src, dst FROM closure
    """,
    "dedup_exact": """
        SELECT doc_id, canonical_id,
               CAST(doc_id <> canonical_id AS INT) AS is_duplicate
        FROM (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                   ) AS canonical_id
            FROM documents)
    """,
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": _NGRAM_JACCARD_SQL,
    "dedup_clusters": f"""
        WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
        edges(a, b) AS (
            SELECT doc1, doc2 FROM pairs
            UNION SELECT doc2, doc1 FROM pairs
        ), reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ), clusters AS (
            SELECT a AS node, least(a, min(b)) AS cluster
            FROM reach GROUP BY a
        )
        SELECT d.doc_id,
               coalesce(c.cluster, d.doc_id) AS cluster,
               CAST(d.doc_id = coalesce(c.cluster, d.doc_id) AS INT) AS keep
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 8),
        sims AS (
            SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(
                       q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim
            FROM q, embeddings c WHERE c.vec_id <> q.qid)
        SELECT query_id, neighbor_id, rank, sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims)
        WHERE rank <= 5
    """,
    "text_stats": """
        WITH base AS (
            SELECT doc_id,
                   string_split(lower(text), ' ') AS toks,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
                   CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                             * 1.0 / length(text)
                        ELSE 0.0 END AS pr
            FROM documents
        ), b2 AS (
            SELECT doc_id, len(toks) AS n_tokens, n_bpe_tokens, pr,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, t -> t IN
                            ('the','a','an','of','and','or','in','on','to',
                             'is','are','was','for','with','that','this',
                             'it','as','at','by'))) * 1.0 / len(toks)
                        ELSE 0.0 END AS sr
            FROM base)
        SELECT doc_id, n_tokens, n_bpe_tokens,
               round(pr, 6) AS punct_ratio,
               round(sr, 6) AS stopword_ratio,
               round(0.4 * least(n_tokens / 64.0, 1.0)
                     + 0.3 * (1.0 - least(pr * 4, 1.0))
                     + 0.3 * least(sr * 5, 1.0), 6) AS quality_score
        FROM b2
    """,
    "text_language_id": """
        WITH s AS (
            SELECT doc_id,
                   len(list_filter(string_split(lower(text),' '), t -> t IN
                       ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
                   len(list_filter(string_split(lower(text),' '), t -> t IN
                       ('the','and','of','to','in','is','that','with'))) AS s_en,
                   len(list_filter(string_split(lower(text),' '), t -> t IN
                       ('el','la','los','las','es','no','por','para'))) AS s_es,
                   len(list_filter(string_split(lower(text),' '), t -> t IN
                       ('le','la','les','et','est','pas','pour','dans'))) AS s_fr,
                   len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
            FROM documents)
        SELECT doc_id,
               CASE WHEN cjk > 0 THEN 'zh'
                    WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
                    WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                    WHEN s_en >= s_de THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM s
    """,
    "text_fingerprint": """
        SELECT doc_id,
               list_reduce(
                   list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                       string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), '')]),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
        FROM documents
    """,
    "quality_report": """
        SELECT 'not_null' AS check_name, 'o_orderkey' AS col_name,
               round(CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*), 6) AS metric,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                    AS INT) AS ok
        FROM orders
        UNION ALL
        SELECT 'not_null', 'o_custkey',
               round(CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*), 6),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
                    AS INT)
        FROM orders
        UNION ALL
        SELECT 'unique', 'o_orderkey',
               round(CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                     AS DOUBLE), 6),
               CAST(count(o_orderkey) = count(DISTINCT o_orderkey) AS INT)
        FROM orders
        UNION ALL
        SELECT 'accepted_values', 'o_orderstatus',
               round(CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                                    AND o_orderstatus NOT IN ('O','F','P')
                              THEN 1 ELSE 0 END) AS DOUBLE), 6),
               CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('O','F','P')
                        THEN 1 ELSE 0 END) = 0 AS INT)
        FROM orders
        UNION ALL
        SELECT 'referential_integrity', 'o_custkey',
               round(CAST((SELECT count(*) FROM orders o
                           WHERE o.o_custkey IS NOT NULL
                             AND NOT EXISTS (SELECT 1 FROM customer c
                                             WHERE c.c_custkey = o.o_custkey))
                     AS DOUBLE), 6),
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey)) = 0
                    AS INT)
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               substr(md5(text), 1, 16) AS head_md5
        FROM documents
    """,
    "text_token_frequencies": """
        SELECT source, token, count(*) AS n
        FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY source, token
        HAVING count(*) >= 5
    """,
    "text_chunking": """
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ), starts AS (
            SELECT doc_id, t, i,
                   CAST((i - 1) / 24 AS INT) AS chunk_idx
            FROM toks, LATERAL (
                SELECT unnest(range(1, greatest(len(t), 1) + 1, 24)) AS i)
        )
        SELECT doc_id, chunk_idx,
               array_to_string(t[i:i+31], ' ') AS chunk_text,
               len(t[i:i+31]) AS n_chunk_tokens
        FROM starts
    """,
    "ann_label_centroids": """
        SELECT label, pos,
               round(avg(v), 6) AS centroid,
               count(*) AS n_vectors
        FROM (
            SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS v
            FROM embeddings, LATERAL (
                SELECT unnest(range(len(embedding))) AS i))
        GROUP BY label, pos
    """,
    "window_running_total": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
        FROM events
    """,
    "search_bm25ish": """
        WITH tf AS (
            SELECT doc_id,
                   len(list_filter(string_split(lower(text),' '),
                       t -> t = 'spark')) AS tf_spark,
                   len(list_filter(string_split(lower(text),' '),
                       t -> t = 'hash')) AS tf_hash,
                   len(list_filter(string_split(lower(text),' '),
                       t -> t = 'join')) AS tf_join
            FROM documents
        ), stats AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
                   sum(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS df_hash,
                   sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join
            FROM tf
        ), scored AS (
            SELECT doc_id,
                   round(tf_spark * ln((n + 1.0) / (df_spark + 1.0))
                       + tf_hash * ln((n + 1.0) / (df_hash + 1.0))
                       + tf_join * ln((n + 1.0) / (df_join + 1.0)), 6) AS score
            FROM tf, stats
        )
        SELECT doc_id, rank, score FROM (
            SELECT doc_id, score, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS rank
            FROM scored WHERE score > 0)
        WHERE rank <= 20
    """,
}

# dedup_simhash oracle: recompute the SAME 62-bit fingerprints (two polynomial
# hashes mod 2^31-1 per shingle, per-bit ±1 votes) in DuckDB and brute-force
# the hamming join — feasible at oracle scale, proving the blocked Spark plan
# exact. Generated because 62 per-bit vote expressions are mechanical.
_SIMHASH_BITS = 62
_SIMHASH_VOTES = ",\n           ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(_SIMHASH_BITS)
)
_SIMHASH_PACK = "\n             + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
    for b in range(_SIMHASH_BITS)
)
ORACLE_SQL["dedup_simhash"] = f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS w
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3
    ), hashed AS (
        SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT,
                   [ascii(c)::BIGINT for c in string_split(s, '')]),
                   (acc, x) -> (acc * 31 + x) % 2147483647) * 2147483648
               + list_reduce(list_prepend(0::BIGINT,
                   [ascii(c)::BIGINT for c in string_split(s, '')]),
                   (acc, x) -> (acc * 37 + x) % 2147483647) AS h
        FROM sh
    ), votes AS (
        SELECT doc_id,
           {_SIMHASH_VOTES}
        FROM hashed GROUP BY doc_id
    ), fps AS (
        SELECT doc_id,
             ( {_SIMHASH_PACK} )::BIGINT AS fp
        FROM votes
    )
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
"""

# ann_lsh_recall oracle: the sign-LSH pipeline is deterministic end-to-end
# (fixed splitmix hyperplanes), so DuckDB can replay it exactly — planes
# embedded as literals, buckets via list_dot_product signs, candidates via
# same-bucket equi-join, rankings with the shared round(·,6)+id tie-break.
# Generated because 64 plane vectors × 64 dims are mechanical constants.
def _lsh_common_ctes(n_planes: int, n_tables: int, dim: int) -> str:
    """The shared plane-replay CTEs: planes (literal), per-vector buckets,
    candidate pairs, all-pairs sims, brute top-5, LSH-restricted top-5."""
    from collection_templates_spark.operators.similarity import (
        _deterministic_planes,
    )

    rows = []
    for t in range(n_tables):
        for p, v in enumerate(_deterministic_planes(dim, n_planes, seed=1000 + t)):
            lit = "[" + ",".join(repr(x) for x in v) + "]::DOUBLE[]"
            rows.append(f"({t},{p},{lit})")
    values = ",\n               ".join(rows)
    return f"""planes(t, p, v) AS (VALUES
               {values}),
        sgn AS (
            SELECT e.vec_id, pl.t,
                   string_agg(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                                         pl.v) > 0
                                   THEN '1' ELSE '0' END,
                              '' ORDER BY pl.p) AS bucket
            FROM embeddings e CROSS JOIN planes pl
            GROUP BY e.vec_id, pl.t),
        cand AS (
            SELECT DISTINCT qs.vec_id AS qid, cs.vec_id AS nid
            FROM sgn cs JOIN sgn qs ON cs.t = qs.t AND cs.bucket = qs.bucket
            WHERE qs.vec_id < 8 AND cs.vec_id <> qs.vec_id),
        sims AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
                   round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6) AS sim
            FROM embeddings q, embeddings c
            WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        brute AS (
            SELECT qid, nid FROM (
                SELECT qid, nid, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
                FROM sims) WHERE rnk <= 5),
        lsh AS (
            SELECT qid, nid, sim, rnk FROM (
                SELECT s.qid, s.nid, s.sim, row_number() OVER (
                    PARTITION BY s.qid ORDER BY s.sim DESC, s.nid ASC) AS rnk
                FROM sims s JOIN cand ON s.qid = cand.qid AND s.nid = cand.nid)
            WHERE rnk <= 5)"""


def _lsh_recall_oracle_sql(n_planes: int = 4, n_tables: int = 16, dim: int = 64) -> str:
    return f"""
        WITH {_lsh_common_ctes(n_planes, n_tables, dim)}
        SELECT b.qid AS query_id,
               round(sum(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END) / 5.0,
                     6) AS recall_at_5
        FROM brute b LEFT JOIN lsh l ON b.qid = l.qid AND b.nid = l.nid
        GROUP BY b.qid
    """


def _lsh_topk_oracle_sql(n_planes: int = 4, n_tables: int = 16, dim: int = 64) -> str:
    return f"""
        WITH {_lsh_common_ctes(n_planes, n_tables, dim)}
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM lsh
    """


def _emb_dup_oracle_sql(
    n_planes: int, n_tables: int, threshold: float, dim: int = 64
) -> str:
    """Plane-replay oracle for the embedding near-dup pairs: identical
    bucketing, a<b self-collision pairs, exact cosine ≥ τ."""
    from collection_templates_spark.operators.similarity import (
        _deterministic_planes,
    )

    rows = []
    for t in range(n_tables):
        for p, v in enumerate(_deterministic_planes(dim, n_planes, seed=1000 + t)):
            lit = "[" + ",".join(repr(x) for x in v) + "]::DOUBLE[]"
            rows.append(f"({t},{p},{lit})")
    values = ",\n               ".join(rows)
    return f"""
        WITH planes(t, p, v) AS (VALUES
               {values}),
        sgn AS (
            SELECT e.vec_id, pl.t,
                   string_agg(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
                                                         pl.v) > 0
                                   THEN '1' ELSE '0' END,
                              '' ORDER BY pl.p) AS bucket
            FROM embeddings e CROSS JOIN planes pl
            GROUP BY e.vec_id, pl.t),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
            FROM sgn a JOIN sgn b ON a.t = b.t AND a.bucket = b.bucket
            WHERE a.vec_id < b.vec_id)
        SELECT c.vec1, c.vec2,
               round(list_cosine_similarity(x.embedding::DOUBLE[],
                                            y.embedding::DOUBLE[]), 6) AS sim
        FROM cand c
        JOIN embeddings x ON x.vec_id = c.vec1
        JOIN embeddings y ON y.vec_id = c.vec2
        WHERE round(list_cosine_similarity(x.embedding::DOUBLE[],
                                           y.embedding::DOUBLE[]), 6)
              >= {threshold}
    """


ORACLE_SQL["dedup_embedding_cosine"] = _emb_dup_oracle_sql(**_EMB_DUP_CONF)

ORACLE_SQL["ann_lsh_recall"] = _lsh_recall_oracle_sql(
    n_planes=_LSH_QUERY_CONF["n_planes"], n_tables=_LSH_QUERY_CONF["n_tables"]
)
# the sign-LSH top-k itself is deterministic given the literal planes, so
# it gets a FULL oracle too (was rows-only through round 3) — same replay
ORACLE_SQL["ann_lsh_topk"] = _lsh_topk_oracle_sql(
    n_planes=_LSH_QUERY_CONF["n_planes"], n_tables=_LSH_QUERY_CONF["n_tables"]
)


# ann_ivf_topk / ann_ivf_recall oracle: the IVF coarse quantizer is
# deterministic by construction (similarity.train_ivf_centroids — lowest-id
# init, 6dp-ROUNDED assignment cosines with lowest-cluster tie-break,
# 6dp-rounded per-dimension means, fixed iteration count), so DuckDB can
# replay the whole k-means: c0 = init centroids, then per iteration an
# assign stage (rn=1 over rounded cosine DESC, cluster ASC) and a mean
# stage (round(avg(emb[pos]),6)); empty clusters COALESCE to their previous
# centroid exactly as the trainer leaves their rows untouched. This is the
# k-means analogue of the LSH plane-literal replay above — generated
# because the 3 iterations are mechanical unrolls, not because anything is
# data-dependent at generation time.
def _ivf_common_ctes(
    n_clusters: int = 16,
    iterations: int = 3,
    n_probe: int = 4,
    k: int = 5,
    dim: int = 64,
    corpus_pred: str = "TRUE",
    query_pred: str = "vec_id < 8",
    list_pred: str = "TRUE",
) -> str:
    # corpus_pred restricts the indexed corpus (trainer init + lists);
    # query_pred selects the probing vectors — by default the classic
    # in-corpus 8 queries, for the incremental row a DISJOINT batch;
    # list_pred further restricts the CANDIDATE LISTS ONLY (the
    # tombstone-delete row: quantizer trained on the full corpus,
    # deleted vectors masked out of the inverted lists)
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
        f" WHERE {corpus_pred})",
        "eq AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
        f" WHERE {query_pred})",
        f"""c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cluster,
                   emb AS cent
            FROM (SELECT vec_id, emb FROM e
                  ORDER BY vec_id LIMIT {n_clusters}))""",
    ]
    rcos = "round(list_cosine_similarity(e.emb, c.cent), 6)"
    for i in range(1, iterations + 1):
        ctes.append(
            f"""a{i} AS (
            SELECT vec_id, emb, cluster FROM (
                SELECT e.vec_id, e.emb, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN c{i - 1} c)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{i} AS (
            SELECT a.cluster, p.pos, round(avg(a.emb[p.pos]), 6) AS m
            FROM a{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dim + 1})) AS pos) p
            GROUP BY a.cluster, p.pos)"""
        )
        ctes.append(
            f"""c{i} AS (
            SELECT c.cluster, coalesce(mm.cent, c.cent) AS cent
            FROM c{i - 1} c LEFT JOIN (
                SELECT cluster, list(m ORDER BY pos) AS cent
                FROM m{i} GROUP BY cluster) mm
            ON c.cluster = mm.cluster)"""
        )
    cf = f"c{iterations}"
    ctes.append(
        f"""af AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN {cf} c)
            WHERE rn = 1 AND ({list_pred}))"""
    )
    ctes.append(
        f"""probe AS (
            SELECT vec_id AS qid, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM eq e CROSS JOIN {cf} c)
            WHERE rn <= {n_probe})"""
    )
    ctes.append(
        f"""ivf AS (
            SELECT qid, nid, sim, rnk FROM (
                SELECT s.qid, s.nid, s.sim,
                       row_number() OVER (PARTITION BY s.qid
                           ORDER BY s.sim DESC, s.nid ASC) AS rnk
                FROM (
                    SELECT p.qid, a.vec_id AS nid,
                           round(list_cosine_similarity(q.emb, n.emb), 6)
                               AS sim
                    FROM probe p
                    JOIN af a ON a.cluster = p.cluster
                             AND a.vec_id <> p.qid
                    JOIN eq q ON q.vec_id = p.qid
                    JOIN e n ON n.vec_id = a.vec_id) s)
            WHERE rnk <= {k})"""
    )
    return ",\n        ".join(ctes)


def _ivf_topk_oracle_sql() -> str:
    return f"""
        WITH {_ivf_common_ctes()}
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM ivf
    """


def _ivf_recall_oracle_sql() -> str:
    return f"""
        WITH {_ivf_common_ctes()},
        sims AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim
            FROM e q, e c
            WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        brute AS (
            SELECT qid, nid FROM (
                SELECT qid, nid, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
                FROM sims) WHERE rnk <= 5)
        SELECT b.qid AS query_id,
               round(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) / 5.0,
                     6) AS recall_at_5
        FROM brute b LEFT JOIN ivf i ON b.qid = i.qid AND b.nid = i.nid
        GROUP BY b.qid
    """


ORACLE_SQL["ann_ivf_topk"] = _ivf_topk_oracle_sql()
ORACLE_SQL["ann_ivf_recall"] = _ivf_recall_oracle_sql()


# ann_pq_topk / ann_pq_recall oracle: product quantization is the IVF
# k-means replay run once PER SUBSPACE — all m sub-quantizers share each
# CTE stage keyed by the subspace index j (lowest-id init, 6dp-rounded
# assignment cosines with lowest-code ties, 6dp-rounded means, empty codes
# coalesce to their previous codeword). Scoring replays the ADC formula:
# sim(q, x) = Σⱼ dot(q_subⱼ, cb[j, codeⱼ]) / (|q| · sqrt(Σⱼ |cb[j, codeⱼ]|²)),
# rounded 6dp like every similarity in the module.
def _pq_common_ctes(
    m: int = 16,
    ks: int = 64,
    iterations: int = 2,
    k: int = 5,
    dim: int = 64,
) -> str:
    dsub = dim // m
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        f"""sub AS (
            SELECT e.vec_id, jj.j,
                   e.emb[jj.j * {dsub} + 1 : (jj.j + 1) * {dsub}] AS s
            FROM e CROSS JOIN
                 (SELECT unnest(range({m})) AS j) jj)""",
        f"""cb0 AS (
            SELECT j,
                   CAST(row_number() OVER (PARTITION BY j ORDER BY vec_id)
                        - 1 AS INT) AS code,
                   s AS cent
            FROM sub
            WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id
                             LIMIT {ks}))""",
    ]
    rcos = "round(list_cosine_similarity(sub.s, c.cent), 6)"
    for i in range(1, iterations + 1):
        ctes.append(
            f"""a{i} AS (
            SELECT vec_id, j, s, code FROM (
                SELECT sub.vec_id, sub.j, sub.s, c.code,
                       row_number() OVER (PARTITION BY sub.vec_id, sub.j
                           ORDER BY {rcos} DESC, c.code ASC) AS rn
                FROM sub JOIN cb{i - 1} c ON c.j = sub.j)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{i} AS (
            SELECT a.j, a.code, p.pos, round(avg(a.s[p.pos]), 6) AS mu
            FROM a{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dsub + 1})) AS pos) p
            GROUP BY a.j, a.code, p.pos)"""
        )
        ctes.append(
            f"""cb{i} AS (
            SELECT c.j, c.code, coalesce(mm.cent, c.cent) AS cent
            FROM cb{i - 1} c LEFT JOIN (
                SELECT j, code, list(mu ORDER BY pos) AS cent
                FROM m{i} GROUP BY j, code) mm
            ON c.j = mm.j AND c.code = mm.code)"""
        )
    cf = f"cb{iterations}"
    ctes.append(
        f"""af AS (
            SELECT vec_id, j, code FROM (
                SELECT sub.vec_id, sub.j, c.code,
                       row_number() OVER (PARTITION BY sub.vec_id, sub.j
                           ORDER BY {rcos} DESC, c.code ASC) AS rn
                FROM sub JOIN {cf} c ON c.j = sub.j)
            WHERE rn = 1)"""
    )
    ctes.append(
        f"""nrm AS (
            SELECT a.vec_id, sum(list_dot_product(c.cent, c.cent)) AS nsq
            FROM af a JOIN {cf} c ON c.j = a.j AND c.code = a.code
            GROUP BY a.vec_id)"""
    )
    ctes.append(
        """qn AS (
            SELECT vec_id, CASE WHEN sqrt(list_dot_product(emb, emb)) = 0
                                THEN 1.0
                                ELSE sqrt(list_dot_product(emb, emb))
                           END AS qnorm
            FROM e WHERE vec_id < 8)"""
    )
    ctes.append(
        f"""pq AS (
            SELECT qid, nid, sim, rnk FROM (
                SELECT s2.qid, s2.nid, s2.sim,
                       row_number() OVER (PARTITION BY s2.qid
                           ORDER BY s2.sim DESC, s2.nid ASC) AS rnk
                FROM (
                    SELECT qs.vec_id AS qid, a.vec_id AS nid,
                           round(sum(list_dot_product(qs.s, c.cent))
                                 / (max(qn.qnorm) * sqrt(max(nrm.nsq))), 6)
                               AS sim
                    FROM sub qs
                    JOIN af a ON a.j = qs.j AND a.vec_id <> qs.vec_id
                    JOIN {cf} c ON c.j = a.j AND c.code = a.code
                    JOIN nrm ON nrm.vec_id = a.vec_id
                    JOIN qn ON qn.vec_id = qs.vec_id
                    GROUP BY qs.vec_id, a.vec_id) s2)
            WHERE rnk <= {k})"""
    )
    return ",\n        ".join(ctes)


def _pq_topk_oracle_sql() -> str:
    return f"""
        WITH {_pq_common_ctes()}
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM pq
    """


def _pq_recall_oracle_sql() -> str:
    return f"""
        WITH {_pq_common_ctes()},
        sims AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim
            FROM e q, e c
            WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        brute AS (
            SELECT qid, nid FROM (
                SELECT qid, nid, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
                FROM sims) WHERE rnk <= 5)
        SELECT b.qid AS query_id,
               round(sum(CASE WHEN p.nid IS NOT NULL THEN 1 ELSE 0 END) / 5.0,
                     6) AS recall_at_5
        FROM brute b LEFT JOIN pq p ON b.qid = p.qid AND b.nid = p.nid
        GROUP BY b.qid
    """


def _pq_rerank_oracle_sql(coarse: int = 50, k: int = 5) -> str:
    return f"""
        WITH {_pq_common_ctes(k=coarse)},
        ex AS (
            SELECT p.qid, p.nid,
                   round(list_cosine_similarity(q.emb, n.emb), 6) AS sim
            FROM pq p
            JOIN e q ON q.vec_id = p.qid
            JOIN e n ON n.vec_id = p.nid)
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid ASC) AS rnk
            FROM ex)
        WHERE rnk <= {k}
    """


ORACLE_SQL["ann_pq_topk"] = _pq_topk_oracle_sql()
ORACLE_SQL["ann_pq_rerank"] = _pq_rerank_oracle_sql()
ORACLE_SQL["ann_pq_recall"] = _pq_recall_oracle_sql()


# ann_respq_topk oracle: residual-encoding IVF-PQ — three mechanical
# replays chained: (1) the coarse k-means, verbatim from the IVF oracle;
# (2) a per-subspace k-means over RESIDUALS vec − centroid, assignments
# by 6dp-rounded NEGATED squared L2 (the operator's metric="l2" —
# magnitude matters for reconstruction) with lowest-code ties; (3) the
# decomposed ADC score (dot(q, centroid) + Σⱼ lut) over the exact
# reconstruction norm |centroid + decode(codes)|², recomputed from the
# replayed reconstruction. Residual coordinates are single IEEE
# subtractions of parquet values and 6dp-rounded centroid means, so both
# engines derive bit-identical residuals; every comparison that feeds a
# discrete choice is rounded before comparing.
def _respq_oracle_sql(
    n_clusters: int = 16,
    coarse_iters: int = 3,
    n_probe: int = 4,
    m: int = 16,
    ks: int = 16,
    pq_iters: int = 2,
    k: int = 5,
    dim: int = 64,
) -> str:
    dsub = dim // m
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        f"""c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cluster,
                   emb AS cent
            FROM (SELECT vec_id, emb FROM e
                  ORDER BY vec_id LIMIT {n_clusters}))""",
    ]
    rcos = "round(list_cosine_similarity(e.emb, c.cent), 6)"
    for i in range(1, coarse_iters + 1):
        ctes.append(
            f"""a{i} AS (
            SELECT vec_id, emb, cluster FROM (
                SELECT e.vec_id, e.emb, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN c{i - 1} c)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{i} AS (
            SELECT a.cluster, p.pos, round(avg(a.emb[p.pos]), 6) AS mu
            FROM a{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dim + 1})) AS pos) p
            GROUP BY a.cluster, p.pos)"""
        )
        ctes.append(
            f"""c{i} AS (
            SELECT c.cluster, coalesce(mm.cent, c.cent) AS cent
            FROM c{i - 1} c LEFT JOIN (
                SELECT cluster, list(mu ORDER BY pos) AS cent
                FROM m{i} GROUP BY cluster) mm
            ON c.cluster = mm.cluster)"""
        )
    cf = f"c{coarse_iters}"
    ctes.append(
        f"""af AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN {cf} c)
            WHERE rn = 1)"""
    )
    ctes.append(
        f"""res AS (
            SELECT e.vec_id, a.cluster,
                   list_transform(range(1, {dim + 1}),
                       p -> e.emb[p] - c.cent[p]) AS r
            FROM e JOIN af a ON a.vec_id = e.vec_id
            JOIN {cf} c ON c.cluster = a.cluster)"""
    )
    ctes.append(
        f"""rsub AS (
            SELECT vec_id, jj.j,
                   r[jj.j * {dsub} + 1 : (jj.j + 1) * {dsub}] AS s
            FROM res CROSS JOIN
                 (SELECT unnest(range({m})) AS j) jj)"""
    )
    ctes.append(
        f"""rb0 AS (
            SELECT j,
                   CAST(row_number() OVER (PARTITION BY j ORDER BY vec_id)
                        - 1 AS INT) AS code,
                   s AS cent
            FROM rsub
            WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id
                             LIMIT {ks}))"""
    )
    rl2 = (
        "round(-(list_dot_product(rsub.s, rsub.s)"
        " - 2 * list_dot_product(rsub.s, c.cent)"
        " + list_dot_product(c.cent, c.cent)), 6)"
    )
    for i in range(1, pq_iters + 1):
        ctes.append(
            f"""ra{i} AS (
            SELECT vec_id, j, s, code FROM (
                SELECT rsub.vec_id, rsub.j, rsub.s, c.code,
                       row_number() OVER (PARTITION BY rsub.vec_id, rsub.j
                           ORDER BY {rl2} DESC, c.code ASC) AS rn
                FROM rsub JOIN rb{i - 1} c ON c.j = rsub.j)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""rm{i} AS (
            SELECT a.j, a.code, p.pos, round(avg(a.s[p.pos]), 6) AS mu
            FROM ra{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dsub + 1})) AS pos) p
            GROUP BY a.j, a.code, p.pos)"""
        )
        ctes.append(
            f"""rb{i} AS (
            SELECT c.j, c.code, coalesce(mm.cent, c.cent) AS cent
            FROM rb{i - 1} c LEFT JOIN (
                SELECT j, code, list(mu ORDER BY pos) AS cent
                FROM rm{i} GROUP BY j, code) mm
            ON c.j = mm.j AND c.code = mm.code)"""
        )
    rbf = f"rb{pq_iters}"
    ctes.append(
        f"""raf AS (
            SELECT vec_id, j, code FROM (
                SELECT rsub.vec_id, rsub.j, c.code,
                       row_number() OVER (PARTITION BY rsub.vec_id, rsub.j
                           ORDER BY {rl2} DESC, c.code ASC) AS rn
                FROM rsub JOIN {rbf} c ON c.j = rsub.j)
            WHERE rn = 1)"""
    )
    ctes.append(
        f"""rec AS (
            SELECT rf.vec_id, flatten(list(rb.cent ORDER BY rf.j)) AS rw
            FROM raf rf JOIN {rbf} rb ON rb.j = rf.j AND rb.code = rf.code
            GROUP BY rf.vec_id)"""
    )
    ctes.append(
        f"""nrm AS (
            SELECT vec_id, list_dot_product(recon, recon) AS nsq FROM (
                SELECT r.vec_id,
                       list_transform(range(1, {dim + 1}),
                           p -> c.cent[p] + r.rw[p]) AS recon
                FROM rec r
                JOIN af a ON a.vec_id = r.vec_id
                JOIN {cf} c ON c.cluster = a.cluster))"""
    )
    ctes.append(
        f"""probe AS (
            SELECT vec_id AS qid, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN {cf} c
                WHERE e.vec_id < 8)
            WHERE rn <= {n_probe})"""
    )
    ctes.append(
        """qn AS (
            SELECT vec_id, CASE WHEN sqrt(list_dot_product(emb, emb)) = 0
                                THEN 1.0
                                ELSE sqrt(list_dot_product(emb, emb))
                           END AS qnorm
            FROM e WHERE vec_id < 8)"""
    )
    ctes.append(
        f"""qsub AS (
            SELECT vec_id, jj.j,
                   emb[jj.j * {dsub} + 1 : (jj.j + 1) * {dsub}] AS s
            FROM e CROSS JOIN (SELECT unnest(range({m})) AS j) jj
            WHERE vec_id < 8)"""
    )
    ctes.append(
        f"""cand AS (
            SELECT p.qid, a.vec_id AS nid, p.cluster
            FROM probe p
            JOIN af a ON a.cluster = p.cluster AND a.vec_id <> p.qid)"""
    )
    ctes.append(
        f"""scored AS (
            SELECT cd.qid, cd.nid,
                   round((max(qc.qc) + sum(list_dot_product(qs.s, rb.cent)))
                         / (max(qn.qnorm) * sqrt(max(nrm.nsq))), 6) AS sim
            FROM cand cd
            JOIN raf rf ON rf.vec_id = cd.nid
            JOIN {rbf} rb ON rb.j = rf.j AND rb.code = rf.code
            JOIN qsub qs ON qs.vec_id = cd.qid AND qs.j = rf.j
            JOIN qn ON qn.vec_id = cd.qid
            JOIN nrm ON nrm.vec_id = cd.nid
            JOIN (SELECT e.vec_id AS qid, c.cluster,
                         list_dot_product(e.emb, c.cent) AS qc
                  FROM e JOIN {cf} c ON TRUE
                  WHERE e.vec_id < 8) qc
                ON qc.qid = cd.qid AND qc.cluster = cd.cluster
            GROUP BY cd.qid, cd.nid)"""
    )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid ASC) AS rnk
            FROM scored)
        WHERE rnk <= {k}
    """


ORACLE_SQL["ann_respq_topk"] = _respq_oracle_sql()


def _respq_recall_oracle_sql() -> str:
    base = _respq_oracle_sql()
    # reuse the full replay as a subquery: wrap its SELECT as `resq`
    inner = base.strip().rstrip()
    return f"""
        WITH resq AS ({inner}),
        e2 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        sims AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
                   round(list_cosine_similarity(q.emb, c.emb), 6) AS sim
            FROM e2 q, e2 c
            WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        brute AS (
            SELECT qid, nid FROM (
                SELECT qid, nid, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
                FROM sims) WHERE rnk <= 5)
        SELECT b.qid AS query_id,
               round(sum(CASE WHEN r.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / 5.0, 6) AS recall_at_5
        FROM brute b LEFT JOIN resq r
            ON b.qid = r.query_id AND b.nid = r.neighbor_id
        GROUP BY b.qid
    """


ORACLE_SQL["ann_respq_recall"] = _respq_recall_oracle_sql()


# ann_ivfpq_topk oracle: the composed layout is exactly the two existing
# replays chained — the IVF coarse k-means (c0..c3 / af / probe, verbatim
# from _ivf_common_ctes) and the raw-vector PQ (sub / cb0..cb2 / codes /
# norms, verbatim from _pq_common_ctes with the per-iteration stages
# prefixed pa/pm to avoid colliding with the coarse a/m) — plus one ADC
# scoring stage restricted to probed clusters. No new conventions: every
# discrete choice is over 6dp-rounded cosines with lowest-id ties.
def _ivfpq_oracle_sql(
    n_clusters: int = 16,
    coarse_iters: int = 3,
    n_probe: int = 4,
    m: int = 16,
    ks: int = 64,
    pq_iters: int = 2,
    k: int = 5,
    dim: int = 64,
) -> str:
    dsub = dim // m
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        f"""c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cluster,
                   emb AS cent
            FROM (SELECT vec_id, emb FROM e
                  ORDER BY vec_id LIMIT {n_clusters}))""",
    ]
    rcos = "round(list_cosine_similarity(e.emb, c.cent), 6)"
    for i in range(1, coarse_iters + 1):
        ctes.append(
            f"""a{i} AS (
            SELECT vec_id, emb, cluster FROM (
                SELECT e.vec_id, e.emb, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN c{i - 1} c)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{i} AS (
            SELECT a.cluster, p.pos, round(avg(a.emb[p.pos]), 6) AS mu
            FROM a{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dim + 1})) AS pos) p
            GROUP BY a.cluster, p.pos)"""
        )
        ctes.append(
            f"""c{i} AS (
            SELECT c.cluster, coalesce(mm.cent, c.cent) AS cent
            FROM c{i - 1} c LEFT JOIN (
                SELECT cluster, list(mu ORDER BY pos) AS cent
                FROM m{i} GROUP BY cluster) mm
            ON c.cluster = mm.cluster)"""
        )
    cf = f"c{coarse_iters}"
    ctes.append(
        f"""af AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN {cf} c)
            WHERE rn = 1)"""
    )
    ctes.append(
        f"""sub AS (
            SELECT e.vec_id, jj.j,
                   e.emb[jj.j * {dsub} + 1 : (jj.j + 1) * {dsub}] AS s
            FROM e CROSS JOIN
                 (SELECT unnest(range({m})) AS j) jj)"""
    )
    ctes.append(
        f"""cb0 AS (
            SELECT j,
                   CAST(row_number() OVER (PARTITION BY j ORDER BY vec_id)
                        - 1 AS INT) AS code,
                   s AS cent
            FROM sub
            WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id
                             LIMIT {ks}))"""
    )
    pcos = "round(list_cosine_similarity(sub.s, c.cent), 6)"
    for i in range(1, pq_iters + 1):
        ctes.append(
            f"""pa{i} AS (
            SELECT vec_id, j, s, code FROM (
                SELECT sub.vec_id, sub.j, sub.s, c.code,
                       row_number() OVER (PARTITION BY sub.vec_id, sub.j
                           ORDER BY {pcos} DESC, c.code ASC) AS rn
                FROM sub JOIN cb{i - 1} c ON c.j = sub.j)
            WHERE rn = 1)"""
        )
        ctes.append(
            f"""pm{i} AS (
            SELECT a.j, a.code, p.pos, round(avg(a.s[p.pos]), 6) AS mu
            FROM pa{i} a CROSS JOIN
                 (SELECT unnest(range(1, {dsub + 1})) AS pos) p
            GROUP BY a.j, a.code, p.pos)"""
        )
        ctes.append(
            f"""cb{i} AS (
            SELECT c.j, c.code, coalesce(mm.cent, c.cent) AS cent
            FROM cb{i - 1} c LEFT JOIN (
                SELECT j, code, list(mu ORDER BY pos) AS cent
                FROM pm{i} GROUP BY j, code) mm
            ON c.j = mm.j AND c.code = mm.code)"""
        )
    cbf = f"cb{pq_iters}"
    ctes.append(
        f"""paf AS (
            SELECT vec_id, j, code FROM (
                SELECT sub.vec_id, sub.j, c.code,
                       row_number() OVER (PARTITION BY sub.vec_id, sub.j
                           ORDER BY {pcos} DESC, c.code ASC) AS rn
                FROM sub JOIN {cbf} c ON c.j = sub.j)
            WHERE rn = 1)"""
    )
    ctes.append(
        f"""nrm AS (
            SELECT a.vec_id, sum(list_dot_product(c.cent, c.cent)) AS nsq
            FROM paf a JOIN {cbf} c ON c.j = a.j AND c.code = a.code
            GROUP BY a.vec_id)"""
    )
    ctes.append(
        """qn AS (
            SELECT vec_id, CASE WHEN sqrt(list_dot_product(emb, emb)) = 0
                                THEN 1.0
                                ELSE sqrt(list_dot_product(emb, emb))
                           END AS qnorm
            FROM e WHERE vec_id < 8)"""
    )
    ctes.append(
        f"""probe AS (
            SELECT vec_id AS qid, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {rcos} DESC, c.cluster ASC) AS rn
                FROM e CROSS JOIN {cf} c
                WHERE e.vec_id < 8)
            WHERE rn <= {n_probe})"""
    )
    ctes.append(
        """cand AS (
            SELECT p.qid, a.vec_id AS nid
            FROM probe p
            JOIN af a ON a.cluster = p.cluster AND a.vec_id <> p.qid)"""
    )
    ctes.append(
        f"""scored AS (
            SELECT cd.qid, cd.nid,
                   round(sum(list_dot_product(qs.s, c.cent))
                         / (max(qn.qnorm) * sqrt(max(nrm.nsq))), 6) AS sim
            FROM cand cd
            JOIN paf a ON a.vec_id = cd.nid
            JOIN {cbf} c ON c.j = a.j AND c.code = a.code
            JOIN sub qs ON qs.vec_id = cd.qid AND qs.j = a.j
            JOIN qn ON qn.vec_id = cd.qid
            JOIN nrm ON nrm.vec_id = cd.nid
            GROUP BY cd.qid, cd.nid)"""
    )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
        FROM (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY sim DESC, nid ASC) AS rnk
            FROM scored)
        WHERE rnk <= {k}
    """


ORACLE_SQL["ann_ivfpq_topk"] = _ivfpq_oracle_sql()

# bpe_apply_stats oracle: the pinned _BPE_MERGES rules are mutually
# non-interacting (see the table's comment), so greedy BPE collapses to a
# closed form — pieces(w) = len(w) + 1 − Σ non-overlapping substring
# occurrences − endswith('e'). Occurrence counting via length-of-replace
# is exact here: each rule's two chars differ, so its pattern cannot
# self-overlap. Same normalize→split as every word-level oracle.
# dedup_semantic oracle: the IVF coarse k-means replay (af = final
# assignments) + an in-cluster pairwise ε-ball check with the keep-
# lowest-id rule. The unreferenced probe/ivf CTEs of the shared
# generator are never executed.
ORACLE_SQL["dedup_semantic"] = f"""
    WITH {_ivf_common_ctes()},
    drops AS (
        SELECT DISTINCT a.vec_id
        FROM af a
        JOIN af b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6) >= 0.4
    )
    SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
    FROM af a LEFT JOIN drops d ON d.vec_id = a.vec_id
"""


# quality_logistic oracle: the pinned model restated over the SAME
# feature expressions the text_stats oracle already uses (+ a digit
# ratio); z 9dp-rounded before the sigmoid, score 6dp after — the
# repo's two-stage rounding convention.
def _quality_logistic_oracle_sql() -> str:
    from collection_templates_spark.operators.text_analysis import (
        STOPWORDS_EN,
    )
    from collection_templates_spark.operators.training_prep import (
        QUALITY_WEIGHTS,
    )

    w0, w1, w2, w3, w4 = QUALITY_WEIGHTS
    stops = ",".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   string_split(lower(text), ' ') AS toks,
                   CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                             * 1.0 / length(text)
                        ELSE 0.0 END AS pr,
                   CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '[0-9]'))
                             * 1.0 / length(text)
                        ELSE 0.0 END AS dr
            FROM documents
        ), b2 AS (
            SELECT doc_id, pr, dr,
                   least(len(toks) / 64.0, 1.0) AS lf,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, t -> t IN ({stops})))
                             * 1.0 / len(toks)
                        ELSE 0.0 END AS sr
            FROM base
        ), zz AS (
            SELECT doc_id,
                   round({w0} + {w1} * lf + ({w2}) * pr + {w3} * sr
                         + ({w4}) * dr, 9) AS z
            FROM b2
        )
        SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
               round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
        FROM zz
    """


ORACLE_SQL["quality_logistic"] = _quality_logistic_oracle_sql()


# text_perplexity_bigram oracle: same counts + interpolation as
# langmodel.doc_perplexity_bigram. λ and (1−λ) are emitted via repr so
# the SQL literal is the EXACT IEEE double Python computes (1.0 − 0.7 =
# 0.30000000000000004, not the SQL literal 0.3) — the lp is only
# 9dp-rounded AFTER the interpolation, so a 5e-17 weight difference
# could flip a boundary.
def _perplexity_bigram_oracle_sql(lam: float = 0.7) -> str:
    l1, l2 = repr(lam), repr(1.0 - lam)
    return f"""
        WITH arrs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9'']+'), x -> x <> '') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, t[i.i] AS token,
                   CASE WHEN i.i > 1 THEN t[i.i - 1] END AS prev
            FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
            WHERE len(t) > 0
        ), uni AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), tot AS (
            SELECT CAST(sum(n) AS DOUBLE) AS total,
                   CAST(count(*) AS DOUBLE) AS vocab
            FROM uni
        ), bi AS (
            SELECT prev, token, count(*) AS n2 FROM tok
            WHERE prev IS NOT NULL GROUP BY prev, token
        ), ctx AS (
            SELECT prev, sum(n2) AS nc FROM bi GROUP BY prev
        ), sc AS (
            SELECT tok.doc_id,
                   round(ln(CASE WHEN tok.prev IS NULL
                        THEN (coalesce(uni.n, 0) + 1)
                             / (tot.total + tot.vocab)
                        ELSE {l1} * ((coalesce(bi.n2, 0) + 1)
                                 / (coalesce(ctx.nc, 0) + tot.vocab))
                           + {l2} * ((coalesce(uni.n, 0) + 1)
                                 / (tot.total + tot.vocab)) END), 9) AS lp
            FROM tok
            CROSS JOIN tot
            LEFT JOIN uni USING (token)
            LEFT JOIN bi ON bi.prev = tok.prev AND bi.token = tok.token
            LEFT JOIN ctx ON ctx.prev = tok.prev
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(lp) / count(*), 6) AS avg_lp,
               round(exp(-sum(lp) / count(*)), 6) AS perplexity
        FROM sc GROUP BY doc_id
    """


ORACLE_SQL["text_perplexity_bigram"] = _perplexity_bigram_oracle_sql()


# text_perplexity_kn oracle: the KN discount/continuation arithmetic
# replayed; float literals forced to DOUBLE (DuckDB parses bare decimals
# as DECIMAL, whose arithmetic diverges from Spark's doubles).
def _perplexity_kn_oracle_sql(discount: float = 0.75) -> str:
    d = f"CAST({discount!r} AS DOUBLE)"
    return f"""
        WITH arrs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9'']+'), x -> x <> '') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, t[i.i] AS token,
                   CASE WHEN i.i > 1 THEN t[i.i - 1] END AS prev
            FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
            WHERE len(t) > 0
        ), uni AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), bi AS (
            SELECT prev, token, count(*) AS n2 FROM tok
            WHERE prev IS NOT NULL GROUP BY prev, token
        ), ctx AS (
            SELECT prev, sum(n2) AS nc, count(*) AS nu FROM bi GROUP BY prev
        ), cont AS (
            SELECT token, count(*) AS np FROM bi GROUP BY token
        ), tot AS (
            SELECT (SELECT CAST(count(*) AS DOUBLE) FROM bi) AS types,
                   (SELECT CAST(count(*) AS DOUBLE) FROM uni) AS vocab
        ), sc AS (
            SELECT tok.doc_id,
                   round(ln(CASE WHEN tok.prev IS NULL
                        THEN (coalesce(cont.np, 0) + 1)
                             / (tot.types + tot.vocab)
                        ELSE greatest(CAST(bi.n2 AS DOUBLE) - {d}, 0.0)
                                 / ctx.nc
                           + ({d} * ctx.nu / ctx.nc)
                             * ((coalesce(cont.np, 0) + 1)
                                / (tot.types + tot.vocab))
                        END), 9) AS lp
            FROM tok
            CROSS JOIN tot
            LEFT JOIN cont USING (token)
            LEFT JOIN bi ON bi.prev = tok.prev AND bi.token = tok.token
            LEFT JOIN ctx ON ctx.prev = tok.prev
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(lp) / count(*), 6) AS avg_lp,
               round(exp(-sum(lp) / count(*)), 6) AS perplexity
        FROM sc GROUP BY doc_id
    """


ORACLE_SQL["text_perplexity_kn"] = _perplexity_kn_oracle_sql()

# dedup_fuzzy_names: blocking + levenshtein replayed — DuckDB's
# levenshtein() is the same unit-cost edit distance as Spark's.
ORACLE_SQL["dedup_fuzzy_names"] = """
    WITH b AS (
        SELECT p_partkey AS id, p_name AS name, p_type, p_brand,
               split_part(p_name, ' ', 1) AS blk
        FROM part
    ), pairs AS (
        SELECT a.p_type, a.name AS name_a, c.name AS name_b,
               levenshtein(a.name, c.name) AS distance
        FROM b a JOIN b c
          ON a.blk = c.blk AND a.p_type = c.p_type
         AND a.p_brand = c.p_brand AND a.id < c.id
    )
    SELECT p_type, distance, count(*) AS n_pairs,
           min(name_a || '|' || name_b) AS example_pair
    FROM pairs WHERE distance <= 3
    GROUP BY p_type, distance
"""

# dedup_incremental / delta_pipeline: exact CROSS-pair replay — odd
# doc_ids are the incoming batch, even the persisted history index.
# Same shingle construction as _NGRAM_JACCARD_SQL; the operator's
# candidacy + exact-Jaccard verify equals this exact pair set under
# the min_band_collisions=1 / no-cap pin (see dedup_minhash_lsh).
_CROSS_PAIRS_CTE = """
    toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), cp AS (
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY 1, 2
    ), cross_pairs AS (
        SELECT doc_new, doc_old,
               round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
        FROM cp
        JOIN sizes s1 ON s1.doc_id = doc_new
        JOIN sizes s2 ON s2.doc_id = doc_old
        WHERE round(c * 1.0 / (s1.n + s2.n - c), 6) >= 0.5
    )
"""

ORACLE_SQL["dedup_incremental"] = (
    "WITH " + _CROSS_PAIRS_CTE
    + " SELECT doc_new, doc_old, jaccard FROM cross_pairs"
)

ORACLE_SQL["delta_pipeline"] = (
    "WITH " + _CROSS_PAIRS_CTE
    + """
    SELECT 'batch_docs' AS stage, count(*) AS n
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT 'dedup_cross_pairs', count(*) FROM cross_pairs
    UNION ALL
    SELECT 'batch_docs_kept',
           (SELECT count(*) FROM documents WHERE doc_id % 2 = 1)
           - (SELECT count(DISTINCT doc_new) FROM cross_pairs)
    UNION ALL
    SELECT 'rollup_days_touched',
           count(DISTINCT strftime(ts, '%Y-%m-%d'))
    FROM events WHERE ts >= TIMESTAMP '2024-01-20 12:00:00'
    UNION ALL
    SELECT 'rollup_rows_total', count(*)
    FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d'), event_type FROM events)
"""
)

# dedup_index_delete: exact cross-pair replay against the SURVIVING
# history only — history = doc_id % 4 == 0, tombstoned = % 8 == 0, so
# survivors are doc_id ≡ 4 (mod 8); the from-scratch oracle never sees
# the deleted docs, making the hash match the probe ≡
# rebuild-from-survivors invariance at gate scale.
ORACLE_SQL["dedup_index_delete"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), cp AS (
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 8 = 4
        GROUP BY 1, 2
    )
    SELECT doc_new, doc_old,
           round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
    FROM cp
    JOIN sizes s1 ON s1.doc_id = doc_new
    JOIN sizes s2 ON s2.doc_id = doc_old
    WHERE round(c * 1.0 / (s1.n + s2.n - c), 6) >= 0.5
"""

# text_common_spans: the corpus-derived shared-gram set (distinct-doc
# count >= 2 over 5-grams) + the same gaps-and-islands replay as
# decontaminate_spans. Oracle pos is 1-based vs Spark's 0-based posexplode
# — islands are shift-invariant and pos is not output.
ORACLE_SQL["text_common_spans"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), gr AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
        WHERE len(t) >= 5
    ), shared AS (
        SELECT g FROM (
            SELECT g, count(*) AS nd FROM (
                SELECT DISTINCT doc_id, g FROM gr)
            GROUP BY g)
        WHERE nd >= 2
    ), marked AS (
        SELECT gr.doc_id, gr.pos,
               CASE WHEN s.g IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM gr LEFT JOIN shared s ON gr.g = s.g
    ), base AS (
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(hit) AS BIGINT) AS n_shared
        FROM marked GROUP BY doc_id
    ), isl AS (
        SELECT doc_id, max(run) AS mx FROM (
            SELECT doc_id, grp, count(*) AS run FROM (
                SELECT doc_id, pos,
                       pos - row_number() OVER (
                           PARTITION BY doc_id ORDER BY pos) AS grp
                FROM marked WHERE hit = 1)
            GROUP BY doc_id, grp)
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_grams, b.n_shared,
           CAST(coalesce(i.mx, 0) AS BIGINT) AS max_shared_run
    FROM base b LEFT JOIN isl i ON b.doc_id = i.doc_id
"""

# ann_knn_accuracy: the brute ranking (ann_cosine_topk idiom, 64 queries),
# the majority vote and the per-label rollup replayed.
ORACLE_SQL["ann_knn_accuracy"] = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < 64),
    sims AS (
        SELECT q.qid AS query_id, c.vec_id AS neighbor_id, c.label AS nlabel,
               round(list_cosine_similarity(
                   q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS sim
        FROM q, embeddings c WHERE c.vec_id <> q.qid),
    topk AS (
        SELECT query_id, nlabel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims)
        WHERE rank <= 5),
    votes AS (
        SELECT query_id, nlabel, count(*) AS nv
        FROM topk GROUP BY query_id, nlabel),
    pred AS (
        SELECT query_id, nlabel AS pred FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY nv DESC, nlabel ASC) AS rn
            FROM votes)
        WHERE rn = 1)
    SELECT qlabel AS label,
           count(*) AS n_queries,
           CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS accuracy
    FROM q JOIN pred ON pred.query_id = q.qid
    GROUP BY qlabel
"""

# corpus_funnel oracle: the three stage criteria restated verbatim from
# their own oracles (dedup_exact's min-id window, quality_logistic's
# pinned model, decontaminate_ngrams' trigram CTEs), composed with
# cumulative IN/NOT IN survivorship and a stage-count union.
def _corpus_funnel_oracle_sql() -> str:
    from collection_templates_spark.operators.text_analysis import (
        STOPWORDS_EN,
    )
    from collection_templates_spark.operators.training_prep import (
        QUALITY_WEIGHTS,
    )

    w0, w1, w2, w3, w4 = QUALITY_WEIGHTS
    stops = ",".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
        WITH train AS (SELECT * FROM documents WHERE doc_id >= 20),
        canon AS (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS cid
            FROM train),
        s1 AS (SELECT doc_id FROM canon WHERE doc_id = cid),
        qbase AS (
            SELECT doc_id,
                   string_split(lower(text), ' ') AS toks,
                   CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                             * 1.0 / length(text)
                        ELSE 0.0 END AS pr,
                   CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '[0-9]'))
                             * 1.0 / length(text)
                        ELSE 0.0 END AS dr
            FROM train),
        qb2 AS (
            SELECT doc_id, pr, dr, least(len(toks) / 64.0, 1.0) AS lf,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, t -> t IN ({stops})))
                             * 1.0 / len(toks)
                        ELSE 0.0 END AS sr
            FROM qbase),
        qkeep AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       round({w0} + {w1} * lf + ({w2}) * pr + {w3} * sr
                             + ({w4}) * dr, 9) AS z
                FROM qb2)
            WHERE round(1.0 / (1.0 + exp(-z)), 6) >= 0.5),
        s2 AS (SELECT doc_id FROM s1
               WHERE doc_id IN (SELECT doc_id FROM qkeep)),
        toks3 AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g')), ' ') AS t
            FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
            FROM toks3, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
            WHERE len(t) >= 3),
        bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20),
        cont AS (
            SELECT c.doc_id,
                   round(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS contamination
            FROM (SELECT doc_id, g FROM sh WHERE doc_id >= 20) c
            LEFT JOIN bench b ON c.g = b.g
            GROUP BY c.doc_id),
        dirty AS (SELECT doc_id FROM cont WHERE contamination >= 0.2),
        s3 AS (SELECT doc_id FROM s2
               WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
        n0 AS (SELECT count(*) AS n FROM train),
        stages AS (
            SELECT '00_ingest' AS stage,
                   (SELECT count(*) FROM train) AS n_docs
            UNION ALL SELECT '01_exact_dedup', (SELECT count(*) FROM s1)
            UNION ALL SELECT '02_quality', (SELECT count(*) FROM s2)
            UNION ALL SELECT '03_decontaminate', (SELECT count(*) FROM s3))
        SELECT stage, n_docs, round(n_docs * 1.0 / n0.n, 6) AS retention
        FROM stages, n0
    """


ORACLE_SQL["corpus_funnel"] = _corpus_funnel_oracle_sql()

# related_collections replayed stage-by-stage: per-type candidate join,
# per-(src,type) rank cap, name-token-Jaccard diversity filter, shared-type
# log-rank score, final top-10 — same tie-breakers in every window.
ORACLE_SQL["related_collections"] = """
    WITH base AS (
        SELECT p_partkey AS item, p_name AS name,
               list_distinct([p_type, p_brand]) AS type_ids,
               CAST(round(p_retailprice * 10, 0) AS BIGINT) AS rank,
               list_distinct(string_split(lower(p_name), ' ')) AS toks
        FROM part
    ), e AS (
        SELECT item, name, rank, toks, unnest(type_ids) AS tid FROM base
    ), pairs AS (
        SELECT a.item AS src, a.toks AS src_toks, a.tid,
               b.item AS dst, b.name AS dst_name, b.rank AS dst_rank,
               b.toks AS dst_toks
        FROM e a JOIN e b ON a.tid = b.tid AND a.item <> b.item
    ), capped AS (
        SELECT *, row_number() OVER (
                   PARTITION BY src, tid
                   ORDER BY dst_rank DESC, dst ASC) AS rn_t
        FROM pairs
    ), diverse AS (
        SELECT * FROM (
            SELECT *,
                   len(list_intersect(src_toks, dst_toks)) AS common,
                   len(src_toks) + len(dst_toks)
                     - len(list_intersect(src_toks, dst_toks)) AS un
            FROM capped WHERE rn_t <= 2
        ) WHERE CASE WHEN un > 0
                     THEN common / CAST(un AS DOUBLE) ELSE 0.0 END < 0.5
    ), scored AS (
        SELECT src, dst, dst_name, dst_rank, count(*) AS shared_types,
               round(count(*) * log2(dst_rank + 2), 6) AS score
        FROM diverse GROUP BY 1, 2, 3, 4
    ), top AS (
        SELECT *, row_number() OVER (
                   PARTITION BY src
                   ORDER BY score DESC, dst_rank DESC, dst ASC) AS rn
        FROM scored
    )
    SELECT src AS item, CAST(rn AS INT) AS rn, dst AS rel_id,
           dst_name AS rel_name, score
    FROM top WHERE rn <= 10
"""

# Every stage criterion of the wiki funnel restated: the member-validity
# blacklist, the >0 rank clamp, the name prefix filter, the merge keys and
# the 3..10000 gate are the query's semantics — the oracle re-derives all
# seven counts from the base tables.
ORACLE_SQL["wiki_pipeline_funnel"] = """
    WITH magg AS (
        SELECT l_orderkey,
               count(*) AS n_members,
               sum(CASE WHEN p_type NOT LIKE 'ECONOMY%' THEN 1 ELSE 0 END)
                   AS n_valid,
               min(CASE WHEN p_type NOT LIKE 'ECONOMY%' THEN p_name END)
                   AS cname
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    ), s0 AS (
        SELECT o.*, n_valid, cname
        FROM orders o JOIN magg ON o_orderkey = l_orderkey
    ), s1 AS (
        SELECT * FROM s0 WHERE n_valid >= 1
    ), s2 AS (
        SELECT s1.* FROM s1 JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
    ), s3 AS (
        SELECT * FROM s2 WHERE cname NOT LIKE 'hot %'
    ), s4 AS (
        SELECT o_custkey, o_orderpriority,
               min(o_orderkey) AS rep, sum(n_valid) AS total_valid
        FROM s3 GROUP BY 1, 2
    ), s5 AS (
        SELECT * FROM s4 WHERE total_valid BETWEEN 3 AND 10000
    ), wide AS (
        SELECT (SELECT count(*) FROM orders) AS n_raw,
               (SELECT count(*) FROM s0) AS n0,
               (SELECT count(*) FROM s1) AS n1,
               (SELECT count(*) FROM s2) AS n2,
               (SELECT count(*) FROM s3) AS n3,
               (SELECT count(*) FROM s4) AS n4,
               (SELECT count(*) FROM s5) AS n5
    )
    SELECT stage, rows_in, rows_out,
           round(rows_out / CAST(n_raw AS DOUBLE), 6) AS retention
    FROM wide, (
        SELECT '00_extract' AS stage, n_raw AS rows_in, n0 AS rows_out FROM wide
        UNION ALL SELECT '01_validate_members', n0, n1 FROM wide
        UNION ALL SELECT '02_enrich_rank', n1, n2 FROM wide
        UNION ALL SELECT '03_name_filters', n2, n3 FROM wide
        UNION ALL SELECT '04_merge_dups', n3, n4 FROM wide
        UNION ALL SELECT '05_member_gate', n4, n5 FROM wide
    ) rows
"""


def _poly_hash_sql(var: str, base: int) -> str:
    """The dedup._poly_hash portable polynomial fold as DuckDB SQL (the
    text_fingerprint idiom): fold(h·base + codepoint) mod 2³¹−1."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT "
        f"for c in string_split({var}, '')]), "
        f"(acc, x) -> (acc * {base} + x) % 2147483647)"
    )


# sketch_cms_errors oracle: the d×w cell table and the per-token probes
# replayed with the same portable poly bases.
def _cms_oracle_sql() -> str:
    from collection_templates_spark.operators.sketches import (
        CMS_BASES,
        CMS_WIDTH,
    )

    cells = "\n            UNION ALL ".join(
        f"SELECT {i} AS row, {_poly_hash_sql('token', b)} % {CMS_WIDTH} "
        f"AS cell FROM tok"
        for i, b in enumerate(CMS_BASES)
    )
    probes = "\n            UNION ALL ".join(
        f"SELECT token, n_true, {i} AS row, "
        f"{_poly_hash_sql('token', b)} % {CMS_WIDTH} AS cell FROM exact"
        for i, b in enumerate(CMS_BASES)
    )
    return f"""
        WITH tok AS (
            SELECT t.token
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(token)
            WHERE t.token <> ''
        ), cells AS (
            {cells}
        ), cms AS (
            SELECT row, cell, count(*) AS c FROM cells GROUP BY row, cell
        ), exact AS (
            SELECT token, count(*) AS n_true FROM tok GROUP BY token
        ), probes AS (
            {probes}
        )
        SELECT token, n_true, min(c) AS n_est
        FROM probes JOIN cms USING (row, cell)
        GROUP BY token, n_true
    """


ORACLE_SQL["sketch_cms_errors"] = _cms_oracle_sql()


# sketch_theta_intersection oracle: the KMV order statistics and the theta
# intersection replayed — same mixer, same (u, v) tie-break, same θ cut.
def _theta_oracle_sql(k: int = 64) -> str:
    p = 2147483647
    mix = (
        f"((((v * 31) % {p}) * ((v * 31) % {p}) % {p}) * 48271 % {p}"
        f" + (v * 37) % {p}) % {p}"
    )
    return f"""
        WITH members AS (
            SELECT DISTINCT event_type AS s, user_id AS v FROM events
        ), hashed AS (
            SELECT s, v,
                   CAST({mix} AS DOUBLE) / 2147483647.0 AS u
            FROM members
        ), sk AS (
            SELECT * FROM (
                SELECT s, v, u,
                       row_number() OVER (
                           PARTITION BY s ORDER BY u ASC, v ASC) AS rn
                FROM hashed
            ) WHERE rn <= {k}
        ), theta AS (
            SELECT s,
                   coalesce(max(CASE WHEN rn = {k} THEN u END), 1.0)
                       AS theta
            FROM sk GROUP BY s
        ), common AS (
            SELECT a.s AS set_a, b.s AS set_b,
                   round(count(*) / least(ta.theta, tb.theta), 4) AS n_est
            FROM sk a
            JOIN sk b ON a.v = b.v AND a.s < b.s
            JOIN theta ta ON ta.s = a.s
            JOIN theta tb ON tb.s = b.s
            WHERE a.u < least(ta.theta, tb.theta)
            GROUP BY a.s, b.s, ta.theta, tb.theta
        ), exact AS (
            SELECT a.s AS set_a, b.s AS set_b, count(*) AS n_exact
            FROM members a JOIN members b ON a.v = b.v AND a.s < b.s
            GROUP BY a.s, b.s
        )
        SELECT set_a, set_b, n_exact,
               coalesce(n_est, 0.0) AS n_est,
               round(abs(coalesce(n_est, 0.0) - n_exact)
                     / CAST(n_exact AS DOUBLE), 4) AS rel_err
        FROM exact LEFT JOIN common USING (set_a, set_b)
    """


ORACLE_SQL["sketch_theta_intersection"] = _theta_oracle_sql()


# sketch_bloom_fpr oracle: the set-bit table, the 3-position probe test
# and the ρᵏ model replayed with the same poly bases; explicit ρ·ρ·ρ, not
# pow(), so the IEEE ops match.
def _bloom_oracle_sql() -> str:
    from collection_templates_spark.operators.sketches import (
        BLOOM_BASES,
        BLOOM_M,
    )

    m = BLOOM_M
    key_pos = "\n            UNION ALL ".join(
        f"SELECT key, {_poly_hash_sql('key', b)} % {m} AS pos FROM keys"
        for b in BLOOM_BASES
    )
    probe_pos = "\n            UNION ALL ".join(
        f"SELECT probe, {_poly_hash_sql('probe', b)} % {m} AS pos"
        f" FROM probes"
        for b in BLOOM_BASES
    )
    nb = len(BLOOM_BASES)
    rho = f"(CAST(n_bits_set AS DOUBLE) / {float(m)})"
    model = " * ".join([rho] * nb)
    return f"""
        WITH ktok AS (
            SELECT t.token
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(token)
            WHERE t.token <> '' AND doc_id % 2 = 0
        ), ptok AS (
            SELECT t.token
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(token)
            WHERE t.token <> '' AND doc_id % 2 = 1
        ), keys AS (
            SELECT DISTINCT token AS key FROM ktok
        ), probes AS (
            SELECT DISTINCT probe FROM (
                SELECT token AS probe FROM ptok
                UNION ALL SELECT 'q_' || token FROM ptok
            )
        ), bits AS (
            SELECT DISTINCT pos FROM ({key_pos})
        ), ppos AS (
            {probe_pos}
        ), passing AS (
            SELECT probe FROM (
                SELECT probe, count(*) AS hits
                FROM ppos WHERE pos IN (SELECT pos FROM bits)
                GROUP BY probe
            ) WHERE hits = {nb}
        ), false_pos AS (
            SELECT probe FROM passing
            WHERE probe NOT IN (SELECT key FROM keys)
        ), true_neg AS (
            SELECT probe FROM probes
            WHERE probe NOT IN (SELECT key FROM keys)
        ), wide AS (
            SELECT (SELECT count(*) FROM keys) AS n_keys,
                   (SELECT count(*) FROM bits) AS n_bits_set,
                   (SELECT count(*) FROM true_neg) AS n_probes,
                   (SELECT count(*) FROM false_pos) AS n_false_pos
        )
        SELECT {m} AS m, {nb} AS k_hashes, n_keys, n_bits_set, n_probes,
               n_false_pos,
               CASE WHEN n_probes > 0
                    THEN round(n_false_pos / CAST(n_probes AS DOUBLE), 6)
                    ELSE 0.0 END AS fpr,
               round({model}, 6) AS fpr_model
        FROM wide
    """


ORACLE_SQL["sketch_bloom_fpr"] = _bloom_oracle_sql()


# graph_pagerank oracle: the three sweeps unrolled as CTE stages — the
# k-means-replay convention applied to graph iteration. (1−d) emitted
# via repr (1.0 − 0.85 = 0.15000000000000002, not the SQL literal 0.15).
def _pagerank_oracle_sql(
    iterations: int = 3, damping: float = 0.85, dangling: bool = False
) -> str:
    d, om = repr(damping), repr(1.0 - damping)
    ctes = [
        """pairs AS (
            SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01')""",
        (
            "edges AS (SELECT src, dst FROM pairs)"
            if dangling
            else """edges AS (
            SELECT src, dst FROM pairs
            UNION ALL SELECT dst, src FROM pairs)"""
        ),
        """nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges)""",
        """outdeg AS (
            SELECT src AS node, count(*) AS o FROM edges GROUP BY src)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
            SELECT e.dst AS node, round(r.pr / dg.o, 9) AS c
            FROM r{i - 1} r
            JOIN outdeg dg ON dg.node = r.node
            JOIN edges e ON e.src = r.node)"""
        )
        ctes.append(
            f"""s{i} AS (
            SELECT node, sum(c) AS s FROM c{i} GROUP BY node)"""
        )
        if dangling:
            ctes.append(
                f"""d{i} AS (
            SELECT round(coalesce(sum(pr), 0.0), 9) AS dm
            FROM r{i - 1}
            WHERE node NOT IN (SELECT node FROM outdeg))"""
            )
            ctes.append(
                f"""r{i} AS (
            SELECT nodes.node,
                   round({om} / nn.n
                         + {d} * (coalesce(s{i}.s, 0.0)
                                  + d{i}.dm / nn.n), 9) AS pr
            FROM nodes CROSS JOIN nn CROSS JOIN d{i}
            LEFT JOIN s{i} ON s{i}.node = nodes.node)"""
            )
        else:
            ctes.append(
                f"""r{i} AS (
            SELECT nodes.node,
                   round({om} / nn.n + {d} * coalesce(s{i}.s, 0.0), 9) AS pr
            FROM nodes CROSS JOIN nn
            LEFT JOIN s{i} ON s{i}.node = nodes.node)"""
            )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                    ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
               round(pr, 6) AS pagerank
        FROM r{iterations}
    """


ORACLE_SQL["graph_pagerank"] = _pagerank_oracle_sql()
ORACLE_SQL["graph_pagerank_dangling"] = _pagerank_oracle_sql(dangling=True)


# graph_hits oracle: the two max-normalized sweeps unrolled — contribution
# rounding, the scalar max normalizer and the bipartite zero sides all
# replayed (same convention family as the pagerank oracles).
def _hits_oracle_sql(iterations: int = 2) -> str:
    ctes = [
        """pairs AS (
            SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01')""",
        "edges AS (SELECT src, dst FROM pairs)",
        """nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges)""",
        "h0 AS (SELECT node, 1.0 AS h FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""ar{i} AS (
            SELECT e.dst AS node, round(sum(round(h.h, 9)), 9) AS s
            FROM h{i - 1} h JOIN edges e ON e.src = h.node
            GROUP BY e.dst)"""
        )
        ctes.append(f"amx{i} AS (SELECT max(s) AS mx FROM ar{i})")
        ctes.append(
            f"""a{i} AS (
            SELECT nodes.node,
                   round(coalesce(ar.s, 0.0) / amx.mx, 9) AS a
            FROM nodes CROSS JOIN amx{i} amx
            LEFT JOIN ar{i} ar ON ar.node = nodes.node)"""
        )
        ctes.append(
            f"""hr{i} AS (
            SELECT e.src AS node, round(sum(round(a.a, 9)), 9) AS s
            FROM a{i} a JOIN edges e ON e.dst = a.node
            GROUP BY e.src)"""
        )
        ctes.append(f"hmx{i} AS (SELECT max(s) AS mx FROM hr{i})")
        ctes.append(
            f"""h{i} AS (
            SELECT nodes.node,
                   round(coalesce(hr.s, 0.0) / hmx.mx, 9) AS h
            FROM nodes CROSS JOIN hmx{i} hmx
            LEFT JOIN hr{i} hr ON hr.node = nodes.node)"""
        )
    joined = ",\n        ".join(ctes)
    n = iterations
    return f"""
        WITH {joined}
        SELECT CASE WHEN h{n}.node % 2 = 0
                    THEN 'c' || CAST(h{n}.node // 2 AS VARCHAR)
                    ELSE 's' || CAST((h{n}.node - 1) // 2 AS VARCHAR)
               END AS node,
               round(h{n}.h, 6) AS hub,
               round(a{n}.a, 6) AS authority
        FROM h{n} JOIN a{n} ON a{n}.node = h{n}.node
    """


ORACLE_SQL["graph_hits"] = _hits_oracle_sql()

# corpus_report: every stat re-derived from the base table, entropy with
# the same 9dp-term rounding.
ORACLE_SQL["corpus_report"] = """
    WITH tok AS (
        SELECT t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
    ), nd AS (SELECT count(*) AS n_docs FROM documents),
    ts AS (SELECT count(*) AS total_tokens,
                  count(DISTINCT token) AS vocab FROM tok),
    uq AS (SELECT count(DISTINCT trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g'))) AS uniq FROM documents),
    ent AS (
        SELECT round(sum(term), 6) AS lang_entropy FROM (
            SELECT round(-(nl / CAST(n_docs AS DOUBLE))
                         * ln(nl / CAST(n_docs AS DOUBLE)), 9) AS term
            FROM (SELECT lang, count(*) AS nl FROM documents GROUP BY lang),
                 nd)
    )
    SELECT n_docs, total_tokens, vocab,
           round(total_tokens / CAST(n_docs AS DOUBLE), 4)
               AS avg_doc_tokens,
           round(1.0 - uniq / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
           lang_entropy
    FROM nd, ts, uq, ent
"""

# scalar_array_functions: DuckDB list_* equivalents; list_position is
# NULL-not-0 on miss (coalesced), slices are inclusive 1-based.
ORACLE_SQL["scalar_array_functions"] = """
    WITH base AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(t) AS INT) AS n_tokens,
           array_to_string(t[1:3], ',') AS first3,
           array_to_string(list_sort(list_distinct(t)), ',')
               AS vocab_sorted,
           array_to_string(list_reverse(t[1:3]), ',') AS first3_reversed,
           CAST(coalesce(list_position(t, 'the'), 0) AS BIGINT) AS pos_the,
           CAST(len(list_filter(t, x -> length(x) >= 5)) AS INT)
               AS n_long_tokens,
           array_to_string(list_transform(t[1:2], x -> upper(x)), ',')
               AS first2_upper,
           list_reduce(
               list_prepend(0::BIGINT,
                            [length(x)::BIGINT for x in t]),
               (a, b) -> a + b) AS total_chars
    FROM base
"""

# agg_grouping_sets: identical sets + GROUPING() flags in DuckDB.
ORACLE_SQL["agg_grouping_sets"] = """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
"""

# agg_percentile_bands: quantile_cont shares Spark percentile()'s linear
# interpolation.
ORACLE_SQL["agg_percentile_bands"] = """
    SELECT o_orderpriority,
           count(*) AS n,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderpriority
"""

# agg_boolean: every/some/count_if = bool_and/bool_or/count_if, all
# NULL-skipping in both engines.
ORACLE_SQL["agg_boolean"] = """
    SELECT event_type,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 90) AS any_gt90,
           CAST(count_if(value > 50) AS BIGINT) AS n_gt50,
           bool_and(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                    >= 0) AS all_k_nonneg,
           bool_or(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   > 900) AS any_k_gt900
    FROM events GROUP BY event_type
"""

# window_range_moving_sum: RANGE frame on epoch seconds; DuckDB's RANGE
# BETWEEN uses the same peer-inclusive semantics over the ORDER BY value.
ORACLE_SQL["window_range_moving_sum"] = """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(sum(value) OVER w, 2) AS sum_24h,
           count(*) OVER w AS n_24h
    FROM (SELECT *, CAST(epoch(ts) AS BIGINT) AS secs FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY secs
                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
"""

# agg_unpivot: UNPIVOT melted to the same (priority, metric, n) rows.
ORACLE_SQL["agg_unpivot"] = """
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_finished,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pending
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status_metric, n
    FROM wide
    UNPIVOT (n FOR status_metric IN (n_open, n_finished, n_pending))
"""

# window_rank_functions: ntile/percent_rank/cume_dist share ANSI
# definitions — replay with the identical total order and roundings.
ORACLE_SQL["window_rank_functions"] = """
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    )
    SELECT o_orderpriority, quartile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(min(pct_rank), 6) AS min_pct_rank,
           round(max(cume), 6) AS max_cume
    FROM ranked
    GROUP BY o_orderpriority, quartile
"""

# rollup_refresh: build-then-merge replay — kept days come from the history
# rollup verbatim, affected days re-aggregate (old rolled row ⊕ new partial)
# with the refresh's exact 6dp partial-sum rounding.
ORACLE_SQL["rollup_refresh"] = """
    WITH hist AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               count(*) AS n_events, round(sum(value), 6) AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM events WHERE ts < TIMESTAMP '2024-01-20 12:00:00'
        GROUP BY 1, 2
    ), batch AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               count(*) AS n_events, round(sum(value), 6) AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM events WHERE ts >= TIMESTAMP '2024-01-20 12:00:00'
        GROUP BY 1, 2
    ), affected AS (
        SELECT DISTINCT day FROM batch
    ), kept AS (
        SELECT * FROM hist WHERE day NOT IN (SELECT day FROM affected)
    ), merged AS (
        SELECT day, event_type,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(sum(sum_value), 6) AS sum_value,
               min(min_value) AS min_value, max(max_value) AS max_value
        FROM (
            SELECT h.* FROM hist h JOIN affected USING (day)
            UNION ALL SELECT * FROM batch
        ) GROUP BY 1, 2
    )
    SELECT day, event_type, n_events, sum_value, min_value, max_value
    FROM kept
    UNION ALL
    SELECT day, event_type, n_events, sum_value, min_value, max_value
    FROM merged
"""

# text_chunk_windows: same positional arithmetic in list form; DuckDB
# range(0,n,12) == Spark sequence(0,n-1,12) for n >= 1 (split of ''
# yields [''], so n >= 1 always); 1-based inclusive list slice clamps
# at the tail exactly like Spark's slice(length=16).
ORACLE_SQL["text_chunk_windows"] = """
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks), 1), 12)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start // 12 AS INT) AS chunk_idx,
           CAST(start AS INT) AS start_tok,
           CAST(least(16, len(toks) - start) AS INT) AS n_tokens,
           md5(array_to_string(toks[start + 1:start + 16], ' '))
               AS chunk_md5
    FROM s
"""

# Q4 shape: the textbook correlated EXISTS — DuckDB decorrelates it
# itself, so the two engines take independent routes to the histogram.
ORACLE_SQL["join_exists_late_orders"] = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
"""

# Q16 shape: NOT IN blocklist + count(DISTINCT) per group; the limit's
# order is total (count DESC, then the unique group key).
ORACLE_SQL["agg_supplier_parts_distinct"] = """
    SELECT p_brand, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 5, 9, 14, 20, 28, 35, 42)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
    LIMIT 20
"""

# Q21 shape: kept in the textbook EXISTS / NOT EXISTS form — the Spark
# side decorrelates into one groupBy, so the derivations are
# independent and must agree row-for-row.
ORACLE_SQL["join_sole_late_supplier"] = """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey
      AND n_nationkey % 3 = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
"""

# Q5 shape: the textbook 6-way join with the extra c_nationkey =
# s_nationkey equality; same exact-DECIMAL revenue idiom as Q3.
ORACLE_SQL["join_region_nation_revenue"] = """
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(4,2))
                             - CAST(l_discount AS DECIMAL(4,2))))
                      AS DOUBLE), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""

# Q13 shape: the priority filter must live in the LEFT JOIN condition
# (customers whose only orders are filtered out land in the 0 bucket).
ORACLE_SQL["agg_order_count_distribution"] = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey
         AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey)
    GROUP BY 1
"""

# Q14 shape: CASE-in-aggregate ratio; both engines divide the same two
# exact decimals as doubles, so the 6dp round is boundary-free.
ORACLE_SQL["agg_promo_revenue_share"] = """
    WITH a AS (
        SELECT sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(4,2))
                                - CAST(l_discount AS DECIMAL(4,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(4,2))
                      - CAST(l_discount AS DECIMAL(4,2)))) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')
    SELECT round(CASE WHEN total IS NULL OR total = 0 THEN NULL
                      ELSE CAST(promo AS DOUBLE)
                           / CAST(total AS DOUBLE) END
                 * 100.0, 6) AS promo_share,
           round(CAST(promo AS DOUBLE), 2) AS promo_revenue,
           round(CAST(total AS DOUBLE), 2) AS total_revenue
    FROM a
"""

# Q15 shape: view-then-scalar-max; equality on exact decimals.
ORACLE_SQL["join_top_supplier_revenue"] = """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(4,2))
                      - CAST(l_discount AS DECIMAL(4,2)))) AS rev_exact
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1)
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           round(CAST(rev_exact AS DOUBLE), 2) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_exact = (SELECT max(rev_exact) FROM rev)
"""

# Q17 shape: kept in the textbook correlated-AVG form — the Spark side
# decorrelates and cross-multiplies to exact integers, so the two
# derivations are independent and must agree.
ORACLE_SQL["agg_small_qty_revenue"] = """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND p_size <= 10
      AND 5 * CAST(l_quantity AS DECIMAL(18,2))
            * (SELECT count(*) FROM lineitem l2
               WHERE l2.l_partkey = p_partkey) <
          (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""

# Q19 shape: disjunction of (brand, size, quantity) conjunctions.
ORACLE_SQL["filter_disjunctive_revenue"] = """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(4,2))
                             - CAST(l_discount AS DECIMAL(4,2))))
                      AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""

# Q22 shape: the threshold comparison is cross-multiplied
# (bal·n > Σbal) so the average never materializes as a float; the
# (20,2) cast forces DuckDB's product into int128 (the r13 width rule).
ORACLE_SQL["agg_idle_customer_balance"] = """
    WITH cs AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_nationkey IN (1, 5, 9, 13, 17, 21, 24)),
    th AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(20,2))) AS s,
               count(*) AS n
        FROM cs WHERE c_acctbal > 0)
    SELECT c_nationkey, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS totacctbal
    FROM cs, th
    WHERE CAST(c_acctbal AS DECIMAL(20,2)) * n > s
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
"""

# Q7 shape: nation joined twice under different roles, direction fixed
# by the pair disjunction after both joins; year() in the group key.
ORACLE_SQL["join_nation_pair_volume"] = """
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(rev) AS DOUBLE), 2) AS volume
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l_discount AS DECIMAL(4,2))) AS rev
        FROM supplier, lineitem, orders, customer,
             nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY 1, 2, 3
"""

# Q10 shape: returned-item revenue per customer, top-20 total-ordered
# by (exact revenue DESC, unique custkey).
ORACLE_SQL["join_returned_revenue_top"] = """
    SELECT c_custkey, c_name,
           round(CAST(rev_exact AS DOUBLE), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal
    FROM (
        SELECT c_custkey, c_name, c_acctbal,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(4,2))
                      - CAST(l_discount AS DECIMAL(4,2)))) AS rev_exact
        FROM customer, orders, lineitem
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY rev_exact DESC, c_custkey ASC
        LIMIT 20)
"""

# Q8 shape: grouped conditional-aggregate ratio — exact DECIMAL
# numerator/denominator per year, one double divide at the edge.
ORACLE_SQL["agg_market_share"] = """
    WITH j AS (
        SELECT year(o_orderdate) AS o_year, s_nationkey AS sup_nk,
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l_discount AS DECIMAL(4,2))) AS rev
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CASE WHEN all_rev IS NULL OR all_rev = 0 THEN NULL
                      ELSE CAST(nat_rev AS DOUBLE)
                           / CAST(all_rev AS DOUBLE) END, 6)
               AS mkt_share,
           round(CAST(all_rev AS DOUBLE), 2) AS total_revenue
    FROM (
        SELECT o_year,
               sum(CASE WHEN sup_nk = 7 THEN rev
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat_rev,
               sum(rev) AS all_rev
        FROM j GROUP BY 1)
"""

# Q9 shape: two exact DECIMAL products per row (widths chosen to stay
# inside int64 per element in DuckDB and below Spark's 38 cap).
ORACLE_SQL["agg_nation_profit"] = """
    SELECT n_name, year(o_orderdate) AS o_year,
           round(CAST(sum(
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2))
                  - CAST(l_discount AS DECIMAL(4,2)))
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(0.6 AS DECIMAL(2,1))
                 * CAST(l_quantity AS DECIMAL(6,2))
           ) AS DOUBLE), 2) AS profit
    FROM lineitem, part, supplier, orders, nation
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND l_orderkey = o_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY 1, 2
"""

# mixture_materialize: the mixture_plan target CTE replayed, then the
# hash-ordered per-group cumulative budget cut — order key is the
# two-fold portable hash % 999983 (rank-by-hash rule), id tie-break;
# all counts and cumsums exact int64.
ORACLE_SQL["mixture_materialize"] = """
    WITH per AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(coalesce(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')), 0)) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY lang
    ), tot AS (
        SELECT sum(pow(n_tokens, 0.5)) AS w_tot FROM per
    ), targets AS (
        SELECT lang,
               CAST(floor(round(pow(n_tokens, 0.5) / w_tot, 9) * 8000)
                    AS BIGINT) AS target
        FROM per, tot
    ), tokd AS (
        SELECT doc_id, lang,
               CAST(coalesce(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')), 0) AS BIGINT)
                   AS n_tok
        FROM documents
    ), chars AS (
        SELECT doc_id,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('mix:' || CAST(doc_id AS VARCHAR), '')])
                   AS cs
        FROM documents
    ), h AS (
        SELECT doc_id,
               (list_reduce(cs, (acc, x) -> (acc * 31 + x) % 2147483647)
                    * 2147483648
                + list_reduce(cs, (acc, x) -> (acc * 37 + x) % 2147483647))
               % 999983 AS hk
        FROM chars
    ), ordered AS (
        SELECT t.doc_id, t.lang, t.n_tok,
               coalesce(sum(t.n_tok) OVER (
                   PARTITION BY t.lang ORDER BY h.hk ASC, t.doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before,
               CAST(row_number() OVER (
                   PARTITION BY t.lang ORDER BY h.hk ASC, t.doc_id ASC)
                   AS BIGINT) AS pick_order
        FROM tokd t JOIN h USING (doc_id)
    )
    SELECT doc_id, lang, n_tok, pick_order,
           CAST(cum_before + n_tok AS BIGINT) AS cum_tokens
    FROM ordered JOIN targets USING (lang)
    WHERE cum_before < target
"""

# pack_bucket_stats: exact CASE bucket ladder (no float log2), int64
# sums, one double divide for utilization.
ORACLE_SQL["pack_bucket_stats"] = """
    WITH t AS (
        SELECT len(string_split(lower(text), ' ')) AS ntok
        FROM documents),
    b AS (
        SELECT ntok,
               CASE WHEN ntok <= 16 THEN 16 WHEN ntok <= 32 THEN 32
                    WHEN ntok <= 64 THEN 64 WHEN ntok <= 128 THEN 128
                    WHEN ntok <= 256 THEN 256 WHEN ntok <= 512 THEN 512
                    ELSE 1024 END AS bucket,
               least(ntok, 1024) AS eff
        FROM t)
    SELECT CAST(bucket AS INT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS sum_tokens,
           CAST(bucket * count(*) - sum(eff) AS BIGINT) AS pad_waste,
           round(CAST(sum(eff) AS DOUBLE) / (bucket * count(*)), 6)
               AS utilization
    FROM b GROUP BY bucket
"""

# embedding_outliers: the linalg integer-micros discipline — 6dp micro
# quantization, exact int64 centroid sums, round(sum/n) centroid (the
# PCA mean idiom), exact integer dist², total-order window.
ORACLE_SQL["embedding_outliers"] = """
    WITH base AS (
        SELECT vec_id AS vid, label AS lbl, i AS d,
               CAST(CAST(round(CAST(embedding[i + 1] AS DOUBLE), 6)
                         AS DECIMAL(7,6))
                    * CAST(1000000 AS DECIMAL(19,0)) AS BIGINT) AS x
        FROM embeddings, LATERAL (SELECT unnest(range(64)) AS i)),
    cent AS (
        SELECT lbl, d,
               CAST(round(CAST(sum(x) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS c
        FROM base GROUP BY 1, 2),
    dist AS (
        SELECT vid, lbl,
               CAST(sum((x - c) * (x - c)) AS BIGINT) AS dist2
        FROM base JOIN cent USING (lbl, d)
        GROUP BY 1, 2)
    SELECT lbl AS label, vid AS vec_id, dist2, rank
    FROM (
        SELECT vid, lbl, dist2,
               row_number() OVER (
                   PARTITION BY lbl
                   ORDER BY dist2 DESC, vid ASC) AS rank
        FROM dist)
    WHERE rank <= 5
"""

# rollup_incremental_delete: refresh-with-deletes ≡ rollup of the
# surviving events (one fully-erased day + two partially-retracted
# neighbours); same per-day 6dp sum rounding as rollup_refresh.
ORACLE_SQL["rollup_incremental_delete"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           count(*) AS n_events, round(sum(value), 6) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') <> '2024-01-11'
      AND NOT (strftime(ts, '%Y-%m-%d') IN ('2024-01-10', '2024-01-12')
               AND event_id % 5 = 0)
    GROUP BY 1, 2
"""

# text_top_terms oracle: tf × ln(N/df) with the same analyzer split.
ORACLE_SQL["text_top_terms"] = """
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(term)
        WHERE t.term <> ''
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(*) AS n FROM documents
    )
    SELECT doc_id, term, rank, tfidf FROM (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6)
                   AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE)
                                             / dfreq.df), 6) DESC,
                            tf.term ASC) AS rank
        FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    WHERE rank <= 3
"""

# sample_weighted oracle: the Efraimidis–Spirakis key replayed from the
# portable two-fold hash (the split_assignment idiom); the key is
# 12dp-rounded BEFORE ranking in both engines, id tie-break, top-64.
ORACLE_SQL["sample_weighted"] = f"""
    WITH chars AS (
        SELECT doc_id, n_chars,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('wsample:' || CAST(doc_id AS VARCHAR), '')])
                   AS cs
        FROM documents
        WHERE n_chars > 0
    ), keyed AS (
        SELECT doc_id, n_chars AS weight,
               round(pow(
                   ((list_reduce(cs, (acc, x) -> (acc * 31 + x)
                                  % 2147483647) * 2147483648
                     + list_reduce(cs, (acc, x) -> (acc * 37 + x)
                                  % 2147483647)) + 1)
                       / {float(2 ** 62)!r},
                   1.0 / CAST(n_chars AS DOUBLE)), 12) AS sample_key
        FROM chars
    )
    SELECT doc_id, weight, sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id ASC
    LIMIT 64
"""


# sketch_hll_cardinality oracle: registers from the portable 62-bit hash
# of DISTINCT tokens (max-per-bucket over occurrences equals max over
# distincts), integer-exact harmonic numerator, linear-counting
# correction; float constants emitted via repr for IEEE identity.
def _hll_oracle_sql() -> str:
    from collection_templates_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_RANK_BITS,
    )

    m, rb = HLL_M, HLL_RANK_BITS
    rmax = rb + 1
    amm = repr(HLL_ALPHA * m * m)
    return f"""
        WITH tok AS (
            SELECT t.token
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(token)
            WHERE t.token <> ''
        ), hs AS (
            SELECT DISTINCT {_poly_hash_sql('token', 31)} AS h1,
                   {_poly_hash_sql('token', 37)} AS h2
            FROM tok
        ), gs AS (
            -- the nonlinear overflow-safe mixer (see sketches.py):
            -- g = (48271·(h² mod p) mod p + h') mod p
            SELECT ((h1 * h1 % 2147483647) * 48271 % 2147483647 + h2)
                       % 2147483647 AS g1,
                   ((h2 * h2 % 2147483647) * 48271 % 2147483647 + h1)
                       % 2147483647 AS g2
            FROM hs
        ), rb AS (
            SELECT g1 % {m} AS bucket,
                   CASE WHEN g2 > 0
                        THEN least(length(bin(g2 & (-g2))), {rmax})
                        ELSE {rmax} END AS r
            FROM gs
        ), regs AS (
            SELECT bucket, max(r) AS mx FROM rb GROUP BY bucket
        ), agg AS (
            SELECT count(*) AS nonzero,
                   CAST(sum(CAST(pow(2.0, {rmax} - mx) AS BIGINT))
                        AS BIGINT) AS num
            FROM regs
        ), nt AS (
            SELECT count(DISTINCT token) AS n_true FROM tok
        ), est AS (
            SELECT nonzero, num, n_true,
                   {amm} / (num / {float(2 ** rmax)!r}
                            + ({m} - nonzero)) AS raw_e
            FROM agg, nt
        )
        , est2 AS (
            SELECT n_true,
                   round(CASE WHEN raw_e <= {2.5 * m!r}
                                  AND ({m} - nonzero) > 0
                              THEN {float(m)!r}
                                   * ln({float(m)!r} / ({m} - nonzero))
                              ELSE raw_e END, 4) AS estimate
            FROM est
        )
        SELECT {m} AS m, n_true, estimate,
               round(abs(estimate - n_true) / n_true, 4) AS rel_err
        FROM est2
    """


ORACLE_SQL["sketch_hll_cardinality"] = _hll_oracle_sql()

# bpe_fertility_by_lang oracle: the bpe_apply_stats closed form rolled
# up per language. Sums cast to BIGINT (DuckDB sum(int) is HUGEINT).
ORACLE_SQL["bpe_fertility_by_lang"] = """
    WITH words AS (
        SELECT doc_id, t.w
        FROM documents,
             unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS t(w)
        WHERE t.w <> ''
    ), pieces AS (
        SELECT doc_id,
               length(w) + 1
               - (length(w) - length(replace(w, 'th', ''))) // 2
               - (length(w) - length(replace(w, 'an', ''))) // 2
               - (length(w) - length(replace(w, 'in', ''))) // 2
               - (length(w) - length(replace(w, 'or', ''))) // 2
               - CASE WHEN w LIKE '%e' THEN 1 ELSE 0 END AS n_p
        FROM words
    ), per_doc AS (
        SELECT doc_id, count(*) AS n_words,
               CAST(sum(n_p) AS BIGINT) AS n_pieces
        FROM pieces GROUP BY doc_id
    )
    SELECT d.lang, count(*) AS n_docs,
           CAST(sum(p.n_words) AS BIGINT) AS total_words,
           CAST(sum(p.n_pieces) AS BIGINT) AS total_pieces,
           round(CAST(sum(p.n_pieces) AS DOUBLE) / sum(p.n_words), 6)
               AS fertility
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.lang
"""

ORACLE_SQL["bpe_apply_stats"] = """
    WITH words AS (
        SELECT doc_id, t.w
        FROM documents,
             unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS t(w)
        WHERE t.w <> ''
    ), pieces AS (
        SELECT doc_id,
               length(w) + 1
               - (length(w) - length(replace(w, 'th', ''))) // 2
               - (length(w) - length(replace(w, 'an', ''))) // 2
               - (length(w) - length(replace(w, 'in', ''))) // 2
               - (length(w) - length(replace(w, 'or', ''))) // 2
               - CASE WHEN w LIKE '%e' THEN 1 ELSE 0 END AS n_p
        FROM words
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_p) AS BIGINT) AS n_pieces,
           round(CAST(sum(n_p) AS DOUBLE) / count(*), 6) AS compression
    FROM pieces GROUP BY doc_id
"""

# decontamination: same trigram derivation as the jaccard-dedup oracle
# (normalize → split → distinct 3-grams), benchmark grams deduped, LEFT
# join so clean docs keep contamination 0. Sums cast to BIGINT (DuckDB
# sum(int) is HUGEINT, Spark's is LONG).
ORACLE_SQL["decontaminate_ngrams"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), bench AS (
        SELECT DISTINCT g FROM sh WHERE doc_id < 20
    )
    SELECT c.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           round(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS contamination
    FROM (SELECT doc_id, g FROM sh WHERE doc_id >= 20) c
    LEFT JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
"""

# sequence packing: BPE-ish token count (same regex as text_stats),
# shard-ordered running offset, fixed 256-token windows.
ORACLE_SQL["pack_sequences"] = """
    WITH base AS (
        SELECT source, doc_id,
               coalesce(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')), 0) AS n_tokens
        FROM documents
    ), o AS (
        SELECT source, doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_offset
        FROM base)
    SELECT source, doc_id, n_tokens, start_offset,
           CAST(floor(start_offset / 256.0) AS BIGINT) AS bin,
           CASE WHEN n_tokens > 0
                     AND CAST(floor((start_offset + n_tokens - 1) / 256.0)
                              AS BIGINT)
                         <> CAST(floor(start_offset / 256.0) AS BIGINT)
                THEN 1 ELSE 0 END AS crosses_boundary
    FROM o
"""

# repetition: same normalized-token derivation as the jaccard oracle but
# n-grams kept with MULTIPLICITY (repetition needs counts, dedup needs
# sets).
ORACLE_SQL["text_repetition"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), gr AS (
        SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
        WHERE len(t) >= 2
    ), cnt AS (
        SELECT doc_id, g, count(*) AS c FROM gr GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_ngrams,
           CAST(max(c) AS BIGINT) AS top_ngram_count,
           round(max(c) * 1.0 / sum(c), 6) AS top_ngram_frac
    FROM cnt GROUP BY doc_id
"""


def _redact_pii_oracle_sql() -> str:
    """Generated from the SAME PII_PATTERNS table as the Spark operator —
    the patterns are written to run identically under Java regex and RE2,
    so interpolating them verbatim keeps one source of truth."""
    from collection_templates_spark.operators.pii import PII_PATTERNS

    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    redacted = "text"
    for _, pat, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return f"""
        WITH aug AS (
            SELECT doc_id,
                   coalesce(text, '') || ' contact user'
                       || CAST(doc_id AS VARCHAR)
                       || '@example.com (555) 123-4567 ip 10.0.0.'
                       || CAST(doc_id % 256 AS VARCHAR) AS text
            FROM documents
        )
        SELECT doc_id,
           {redacted} AS clean_text,
           {counts}
        FROM aug
    """


ORACLE_SQL["redact_pii"] = _redact_pii_oracle_sql()

# span decontamination: positions kept (non-distinct grams), hits marked
# via the benchmark LEFT join, islands via pos - row_number (constant
# within a consecutive hit run).
ORACLE_SQL["decontaminate_spans"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
    ), gr AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i+2], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), bench AS (
        SELECT DISTINCT g FROM gr WHERE doc_id < 20
    ), marked AS (
        SELECT c.doc_id, c.pos,
               CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM (SELECT doc_id, pos, g FROM gr WHERE doc_id >= 20) c
        LEFT JOIN bench b ON c.g = b.g
    ), base AS (
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(hit) AS BIGINT) AS n_contaminated
        FROM marked GROUP BY doc_id
    ), isl AS (
        SELECT doc_id, max(run) AS mx FROM (
            SELECT doc_id, grp, count(*) AS run FROM (
                SELECT doc_id, pos,
                       pos - row_number() OVER (
                           PARTITION BY doc_id ORDER BY pos) AS grp
                FROM marked WHERE hit = 1)
            GROUP BY doc_id, grp)
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_grams, b.n_contaminated,
           CAST(coalesce(i.mx, 0) AS BIGINT) AS max_contaminated_run
    FROM base b LEFT JOIN isl i ON b.doc_id = i.doc_id
"""

# split assignment: the portable TWO-fold hash (dedup.
# portable_shingle_hash — poly31 * 2^31 + poly37, same folds the simhash
# oracle replays) over 'split:' || id, bucketed mod 10000 with 90/5/5
# thresholds. One fold alone is measurably non-uniform on sequential ids.
ORACLE_SQL["split_assignment"] = """
    WITH chars AS (
        SELECT doc_id,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('split:' || CAST(doc_id AS VARCHAR), '')])
                   AS cs
        FROM documents
    ), h AS (
        SELECT doc_id,
               (list_reduce(cs, (acc, x) -> (acc * 31 + x) % 2147483647)
                    * 2147483648
                + list_reduce(cs, (acc, x) -> (acc * 37 + x) % 2147483647))
               % 10000 AS split_bucket
        FROM chars
    )
    SELECT doc_id, split_bucket,
           CASE WHEN split_bucket < 9000 THEN 'train'
                WHEN split_bucket < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM h
"""

# stratified sampling: the same two-fold portable hash over 'sample:'||id,
# bucketed mod 1e6, kept when below the per-source rate threshold
ORACLE_SQL["sample_stratified"] = """
    WITH chars AS (
        SELECT doc_id, source,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('sample:' || CAST(doc_id AS VARCHAR), '')])
                   AS cs
        FROM documents
    ), h AS (
        SELECT doc_id, source,
               (list_reduce(cs, (acc, x) -> (acc * 31 + x) % 2147483647)
                    * 2147483648
                + list_reduce(cs, (acc, x) -> (acc * 37 + x) % 2147483647))
               % 1000000 AS sample_bucket
        FROM chars
    )
    SELECT doc_id, source, sample_bucket
    FROM h
    WHERE sample_bucket < CASE source WHEN 'src0' THEN 1000000
                                      WHEN 'src1' THEN 500000
                                      WHEN 'src2' THEN 250000
                                      ELSE 100000 END
"""

# export manifest: split via the 'split:' hash (as split_assignment),
# shard via the 'shard:' hash mod a per-split shard count sized from the
# split's BPE-ish token total (ceil(tokens/5000), min 1)
ORACLE_SQL["export_manifest"] = """
    WITH base AS (
        SELECT doc_id,
               coalesce(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')), 0) AS n_tokens,
               (list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('split:' || CAST(doc_id AS VARCHAR), '')]),
                    (acc, x) -> (acc * 31 + x) % 2147483647) * 2147483648
                + list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('split:' || CAST(doc_id AS VARCHAR), '')]),
                    (acc, x) -> (acc * 37 + x) % 2147483647)) % 10000 AS sb,
               (list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('shard:' || CAST(doc_id AS VARCHAR), '')]),
                    (acc, x) -> (acc * 31 + x) % 2147483647) * 2147483648
                + list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('shard:' || CAST(doc_id AS VARCHAR), '')]),
                    (acc, x) -> (acc * 37 + x) % 2147483647)) AS shard_hash
        FROM documents
    ), s AS (
        SELECT doc_id, n_tokens, shard_hash,
               CASE WHEN sb < 9000 THEN 'train'
                    WHEN sb < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM base
    ), tot AS (
        SELECT split,
               greatest(CAST(ceil(sum(n_tokens) / 5000) AS BIGINT), 1)
                   AS n_shards
        FROM s GROUP BY split
    )
    SELECT s.split, s.shard_hash % tot.n_shards AS shard,
           count(*) AS n_docs,
           CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens
    FROM s JOIN tot ON s.split = tot.split
    GROUP BY 1, 2
"""

# mixture plan: per-language BPE-ish token totals (same regexp as
# text_stats), weight = tokens^0.5 / sum, floor'd integer targets
ORACLE_SQL["mixture_plan"] = """
    WITH per AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(coalesce(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')), 0)) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY lang
    ), tot AS (
        SELECT sum(pow(n_tokens, 0.5)) AS w_tot FROM per
    ), w AS (
        -- weight pinned at 9dp BEFORE the floor (matches Spark), and
        -- zero-token groups yield NULL rate/epochs instead of 0/0
        SELECT lang, n_docs, n_tokens,
               round(pow(n_tokens, 0.5) / w_tot, 9) AS w9
        FROM per, tot
    )
    SELECT lang, n_docs, n_tokens,
           round(w9, 6) AS weight,
           CAST(floor(w9 * 100000) AS BIGINT) AS target_tokens_grp,
           round(CASE WHEN n_tokens > 0
                      THEN floor(w9 * 100000) / n_tokens END, 6)
               AS sample_rate,
           CAST(ceil(CASE WHEN n_tokens > 0
                          THEN floor(w9 * 100000) / n_tokens END)
               AS BIGINT) AS epochs
    FROM w
"""

# vocab induction + OOV: top-16 tokens by (count desc, token asc), per-doc
# out-of-vocab fraction
ORACLE_SQL["vocab_oov"] = """
    WITH toks AS (
        SELECT doc_id, t.tok
        FROM documents,
             unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS t(tok)
        WHERE t.tok <> ''
    ), counts AS (
        SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ), vocab AS (
        SELECT tok FROM counts ORDER BY c DESC, tok ASC LIMIT 16
    )
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                 / count(*), 6) AS oov_rate
    FROM toks LEFT JOIN vocab v ON toks.tok = v.tok
    GROUP BY doc_id
"""

# corpus boilerplate: distinct 2-grams per doc (same split as the jaccard
# oracle), document frequency >= 40 marks boilerplate
ORACLE_SQL["text_boilerplate"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                   'g')), ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
        WHERE len(t) >= 2
    ), dfreq AS (
        SELECT g, count(*) AS df FROM sh GROUP BY g
    ), boiler AS (
        SELECT g FROM dfreq WHERE df >= 40
    )
    SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_boiler,
           round(sum(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END)
                 / count(*), 6) AS boiler_frac
    FROM sh LEFT JOIN boiler b ON sh.g = b.g
    GROUP BY doc_id
"""

# winnowing: 8-char Karp-Rabin rolling hashes (base-31 poly, same fold as
# text_fingerprint), windowed-min selection over windows of 4, tie rule
# "equals some containing full-window min" — identical in both engines
ORACLE_SQL["text_winnowing"] = """
    WITH cs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                   'g')), '') AS c
        FROM documents
    ), hs AS (
        SELECT doc_id,
               [list_reduce(list_prepend(0::BIGINT,
                    [ascii(x)::BIGINT for x in c[i:i+7]]),
                    (acc, x) -> (acc * 31 + x) % 2147483647)
                for i in range(1, len(c) - 8 + 2)] AS harr
        FROM cs
        WHERE len(c) >= 8
    ), h AS (
        SELECT doc_id, unnest(range(len(harr))) AS pos, unnest(harr) AS h
        FROM hs
    ), m AS (
        SELECT doc_id, pos, h,
               CASE WHEN pos >= 3 THEN
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               END AS mn
        FROM h
    ), s AS (
        SELECT doc_id, pos, h,
               max(mn) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) = h
                   AS sel
        FROM m
    )
    SELECT doc_id, count(*) AS n_hashes,
           CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
           CAST(sum(CASE WHEN sel THEN (h * (pos + 1)) % 2147483647
                         ELSE 0 END) AS BIGINT) AS fp_checksum,
           round(sum(CASE WHEN sel THEN 1 ELSE 0 END) / count(*), 6)
               AS density
    FROM s GROUP BY doc_id HAVING n_fp > 0
"""

# winnowing containment: 20-char rolling hashes, window 8, distinct
# selected VALUES per doc, pairs by shared value, containment vs the
# smaller fingerprint set (the bucket-collect cap never fires at 500 docs)
ORACLE_SQL["text_containment"] = """
    WITH cs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                   'g')), '') AS c
        FROM documents
    ), hs AS (
        SELECT doc_id,
               [list_reduce(list_prepend(0::BIGINT,
                    [ascii(x)::BIGINT for x in c[i:i+19]]),
                    (acc, x) -> (acc * 31 + x) % 2147483647)
                for i in range(1, len(c) - 20 + 2)] AS harr
        FROM cs
        WHERE len(c) >= 20
    ), h AS (
        SELECT doc_id, unnest(range(len(harr))) AS pos, unnest(harr) AS h
        FROM hs
    ), m AS (
        SELECT doc_id, pos, h,
               CASE WHEN pos >= 7 THEN
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
               END AS mn
        FROM h
    ), s AS (
        SELECT doc_id, pos, h,
               max(mn) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) = h
                   AS sel
        FROM m
    ), fp AS (
        SELECT DISTINCT doc_id, h FROM s WHERE sel
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT d1 AS doc1, d2 AS doc2, c AS n_shared,
           round(c / least(s1.n, s2.n), 6) AS containment
    FROM shared
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
"""

# search_stemmed_ltr oracle: the stemmer CASE chains (staged pass +
# stabilize-or-leave guard) are generated from the SAME SUFFIX_RULES table
# as the Spark side (functions/stemming.py), and every score is rounded
# identically (per-term 9dp → bm25 6dp; sat 9dp; es/ltr 6dp), so the full
# analyzer → BM25_b0 → rank_feature → rescore pipeline hash-matches across
# engines.
def _stemmed_ltr_oracle_sql() -> str:
    from collection_templates_spark.functions.stemming import (
        suffix_stem_sql_select,
    )
    from collection_templates_spark.operators.search import analyze_query_terms

    # same analyzer as the Spark side (search.analyze_query_terms), and
    # quote-escaped: analyzer tokens may legitimately contain apostrophes
    terms = analyze_query_terms(_STEMMED_QUERY)
    in_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    stem_select = suffix_stem_sql_select(
        "SELECT doc_id, tok FROM toks", "tok", "term", "doc_id"
    )
    w_bm = _LTR_WEIGHTS["bm25"]
    w_nc = _LTR_WEIGHTS["n_chars"]
    return f"""
        WITH toks AS (
            SELECT doc_id, t.tok
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(tok)
            WHERE t.tok <> ''
        ), stemmed AS (
            {stem_select}
        ), hits AS (
            SELECT doc_id, term, count(*) AS tf FROM stemmed
            WHERE term IN ({in_list})
            GROUP BY doc_id, term
        ), dfs AS (
            SELECT term, count(*) AS df FROM hits GROUP BY term
        ), n AS (
            SELECT count(*)::DOUBLE AS n FROM documents
        ), per_term AS (
            SELECT h.doc_id,
                   round(ln(1 + (n.n - dfs.df + 0.5) / (dfs.df + 0.5))
                         * (h.tf * 2.2) / (h.tf + 1.2), 9) AS s
            FROM hits h JOIN dfs USING (term) CROSS JOIN n
        ), bm AS (
            SELECT doc_id, round(sum(s), 6) AS bm25
            FROM per_term GROUP BY doc_id
        ), piv AS (
            SELECT exp(avg(CASE WHEN n_chars > 0
                               THEN ln(n_chars::DOUBLE) END)) AS p
            FROM documents
        ), scored AS (
            SELECT d.doc_id, bm.bm25,
                   round(CASE WHEN d.n_chars > 0
                              THEN d.n_chars / (d.n_chars + piv.p)
                              ELSE 0.0 END, 9) AS sat
            FROM documents d JOIN bm ON d.doc_id = bm.doc_id CROSS JOIN piv
        ), top AS (
            SELECT doc_id, bm25, sat, round(bm25 + sat, 6) AS es_score
            FROM scored ORDER BY es_score DESC, doc_id ASC LIMIT 50
        )
        SELECT doc_id, rank, ltr_score, bm25 FROM (
            SELECT doc_id, bm25,
                   round({w_bm} * bm25 + {w_nc} * sat, 6) AS ltr_score,
                   row_number() OVER (
                       ORDER BY round({w_bm} * bm25 + {w_nc} * sat, 6) DESC,
                                doc_id ASC) AS rank
            FROM top)
        WHERE rank <= 20
    """


ORACLE_SQL["search_stemmed_ltr"] = _stemmed_ltr_oracle_sql()

# text_word_model / scalar_log_probability oracles: rebuild the SAME unigram
# model (tokens = lowercase split on [^a-z0-9']+, Laplace smoothing over
# total+vocab) in DuckDB; per-token lp rounded to 9dp before the sum in BOTH
# engines so fp association order cannot flip the hash.
_MODEL_CTE = """
    tok AS (
        SELECT t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
    ), model AS (
        SELECT token, count(*) AS n FROM tok GROUP BY token
    ), tot AS (
        SELECT CAST(sum(n) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom
        FROM model
    )
"""

ORACLE_SQL["text_word_model"] = f"""
    WITH {_MODEL_CTE}
    SELECT token, n,
           round(ln((CAST(n AS DOUBLE) + 1.0) / tot.denom), 6) AS log_prob
    FROM model, tot
"""

ORACLE_SQL["text_perplexity"] = f"""
    WITH {_MODEL_CTE},
    dtok AS (
        SELECT doc_id, t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
    ), lp AS (
        SELECT doc_id,
               round(ln((CAST(coalesce(m.n, 0) AS DOUBLE) + 1.0) / tot.denom),
                     9) AS lp
        FROM dtok
        LEFT JOIN model m ON dtok.token = m.token
        CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(sum(lp) / count(*), 6) AS avg_lp,
           round(exp(-sum(lp) / count(*)), 6) AS perplexity
    FROM lp GROUP BY doc_id
"""

ORACLE_SQL["scalar_log_probability"] = f"""
    WITH {_MODEL_CTE},
    names AS (
        SELECT p_partkey, p_name AS name, t.token
        FROM part, unnest(string_split(lower(p_name), ' ')) AS t(token)
    ), scored AS (
        SELECT n.p_partkey, n.name,
               round(ln((CAST(coalesce(m.n, 0) AS DOUBLE) + 1.0) / tot.denom),
                     9) AS lp
        FROM names n
        LEFT JOIN model m ON n.token = m.token
        CROSS JOIN tot
    )
    SELECT p_partkey, name,
           round(sum(lp), 4) AS log_probability,
           round(exp(sum(lp) / count(*)), 6) AS interesting_score
    FROM scored GROUP BY p_partkey, name
"""


# dedup_paragraph oracle: identical 16-token non-overlapping chunking
# (generate_series step = window width, last partial window kept), exact
# cross-doc multiplicity via per-(chunk, doc) groups.
ORACLE_SQL["dedup_paragraph"] = """
    WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM documents
    ), chunks AS (
        SELECT doc_id,
               array_to_string(toks[i : i + 15], ' ') AS chunk_text
        FROM base,
             unnest(generate_series(1, greatest(len(toks), 1), 16)) AS t(i)
    ), per_doc_chunk AS (
        SELECT chunk_text, doc_id, count(*) AS n_inst
        FROM chunks GROUP BY 1, 2
    ), flagged AS (
        SELECT doc_id, n_inst,
               count(*) OVER (PARTITION BY chunk_text) AS n_docs
        FROM per_doc_chunk
    ), agg AS (
        SELECT doc_id,
               CAST(sum(n_inst) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN n_docs > 1 THEN n_inst ELSE 0 END)
                    AS BIGINT) AS n_dup_chunks
        FROM flagged GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_dup_chunks,
           round(n_dup_chunks * 1.0 / n_chunks, 6) AS dup_ratio,
           CAST(round(n_dup_chunks * 1.0 / n_chunks, 6) >= 0.6 AS INT)
               AS drop_doc
    FROM agg
"""

# dedup_keep_best oracle: the dedup_clusters reachability CTE plus a
# window argmax on (n_chars DESC, doc_id ASC) per cluster.
ORACLE_SQL["dedup_keep_best"] = f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
    edges(a, b) AS (
        SELECT doc1, doc2 FROM pairs
        UNION SELECT doc2, doc1 FROM pairs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), clusters AS (
        SELECT a AS node, least(a, min(b)) AS cluster
        FROM reach GROUP BY a
    ), labeled AS (
        SELECT d.doc_id, d.n_chars,
               coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
    )
    SELECT doc_id, cluster,
           CAST(row_number() OVER (
               PARTITION BY cluster
               ORDER BY n_chars DESC, doc_id ASC) = 1 AS INT) AS keep
    FROM labeled
"""

# events_cohort_retention oracle: ISO-week truncation is Monday-aligned in
# both engines, so the day delta is always a multiple of 7.
ORACLE_SQL["events_cohort_retention"] = """
    WITH weeks AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ), first AS (
        SELECT user_id, min(week) AS cohort_week
        FROM weeks GROUP BY user_id
    ), cohort_sizes AS (
        SELECT cohort_week, count(*) AS cohort_n
        FROM first GROUP BY cohort_week
    ), act AS (
        SELECT f.cohort_week, w.week, count(*) AS n_active
        FROM weeks w JOIN first f ON w.user_id = f.user_id
        GROUP BY f.cohort_week, w.week
    )
    SELECT a.cohort_week,
           CAST((a.week - a.cohort_week) / 7 AS INT) AS week_offset,
           CAST(a.n_active AS BIGINT) AS n_active,
           round(a.n_active * 1.0 / s.cohort_n, 6) AS retention_rate
    FROM act a JOIN cohort_sizes s ON a.cohort_week = s.cohort_week
"""


# graph_triangle_count oracle: thresholded co-purchase projection + the
# exact three-way a<b<c edge join (no orientation needed for exactness),
# per-corner credit via three unions.
ORACLE_SQL["graph_triangle_count"] = """
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
    ), e AS (
        SELECT u, v FROM (
            SELECT a.c AS u, b.c AS v, count(*) AS shared
            FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
            GROUP BY 1, 2
        ) WHERE shared >= 2
    ), tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
"""


# sketch_quantile_errors oracle: the portable mixer replayed on the
# unique row id, quantile_cont per requested q (DuckDB's (n-1)*q linear
# interpolation ≡ Spark's percentile), errors on raw doubles then
# rounded. Literal quantiles are CAST to DOUBLE (DuckDB float literals
# are DECIMAL).
def _quantile_oracle_sql(
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    sample_mod: int = 16,
) -> str:
    p = 2147483647
    mix = (
        f"((((v * 31) % {p}) * ((v * 31) % {p}) % {p}) * 48271 % {p}"
        f" + (v * 37) % {p}) % {p}"
    )
    branches = "\n        UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q,"
        f" (SELECT quantile_cont(val, {q}) FROM samp) AS e,"
        f" (SELECT quantile_cont(val, {q}) FROM fullt) AS x"
        for q in quantiles
    )
    return f"""
        WITH keyed AS (
            SELECT CAST(l_extendedprice AS DOUBLE) AS val,
                   CAST({mix} AS DOUBLE) / {p}.0 AS u
            FROM (SELECT l_extendedprice,
                         l_orderkey * 8 + l_linenumber AS v
                  FROM lineitem)
        ), samp AS (
            SELECT val FROM keyed WHERE u < 1.0 / {sample_mod}
        ), fullt AS (
            SELECT val FROM keyed
        ), vals AS (
            {branches}
        )
        SELECT q, round(e, 4) AS est_q, round(x, 4) AS exact_q,
               round(abs(e - x), 4) AS abs_err,
               round(abs(e - x) / x, 6) AS rel_err
        FROM vals
    """


ORACLE_SQL["sketch_quantile_errors"] = _quantile_oracle_sql()


# layout_zorder_stats oracle: the Morton interleave replayed
# bit-for-bit via layout.zorder_sql_expr — this row IS the
# zorder_value / zorder_sql_expr equivalence proof. Bucket cuts are
# pure shifts of the FIXED code domain (top log2(n_buckets) bits).
def _zorder_oracle_sql(n_buckets: int = 16, bits: int = 8) -> str:
    import math

    from collection_templates_spark.operators.layout import zorder_sql_expr

    shift = int(math.log2(n_buckets))
    zexpr = zorder_sql_expr("zx", "zy", bits)
    return f"""
        WITH base AS (
            SELECT l_partkey % 256 AS zx, l_suppkey % 256 AS zy
            FROM lineitem
        ), coded AS (
            SELECT zx, zy, ({zexpr}) AS zval FROM base
        ), z AS (
            SELECT 'zorder' AS layout,
                   CAST(zval >> {2 * bits - shift} AS INT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(zx) AS x_min, max(zx) AS x_max,
                   min(zy) AS y_min, max(zy) AS y_max
            FROM coded GROUP BY 2
        ), r AS (
            SELECT 'roworder' AS layout,
                   CAST(zx >> {bits - shift} AS INT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(zx) AS x_min, max(zx) AS x_max,
                   min(zy) AS y_min, max(zy) AS y_max
            FROM coded GROUP BY 2
        ), u AS (
            SELECT * FROM z UNION ALL SELECT * FROM r
        )
        SELECT layout, bucket, n_rows, x_min, x_max, y_min, y_max,
               CAST((x_max - x_min + 1) * (y_max - y_min + 1) AS BIGINT)
                   AS area
        FROM u
    """


ORACLE_SQL["layout_zorder_stats"] = _zorder_oracle_sql()

# temporal_gap_fill oracle: identical per-(user, day) last-observation
# pick, generate_series day grid per user span, LOCF via
# last_value(IGNORE NULLS) over the unbounded-preceding frame.
ORACLE_SQL["temporal_gap_fill"] = """
    WITH obs AS (
        SELECT user_id, day, value AS obs_value FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ), span AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1
        FROM obs GROUP BY user_id
    ), grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM span
    )
    SELECT g.user_id, g.day,
           round(o.obs_value, 6) AS obs_value,
           round(last_value(o.obs_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS filled_value,
           CAST(o.obs_value IS NOT NULL AS INT) AS is_observed
    FROM grid g
    LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
"""

# events_trailing_zscore oracle: the same 20-row trailing frame
# (EXCLUDES the current row), mean/stddev rounded to 6dp BEFORE the z
# arithmetic (identical convention to the Spark operator), cold start
# (< 5 predecessors) NULL.
ORACLE_SQL["events_trailing_zscore"] = """
    WITH w0 AS (
        SELECT event_id, event_type, value,
               count(value) OVER w AS n_prev,
               round(avg(value) OVER w, 6) AS mu0,
               round(stddev_samp(value) OVER w, 6) AS sigma0
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, round(value, 6) AS value,
           CAST(n_prev AS BIGINT) AS n_prev,
           CASE WHEN n_prev >= 5 THEN mu0 END AS mu,
           CASE WHEN n_prev >= 5 THEN sigma0 END AS sigma,
           CASE WHEN n_prev >= 5 AND sigma0 > 0
                THEN round((value - mu0) / sigma0, 6) END AS z,
           coalesce(CAST(abs(CASE WHEN n_prev >= 5 AND sigma0 > 0
                THEN round((value - mu0) / sigma0, 6) END)
                >= CAST(2.0 AS DOUBLE) AS INT), 0) AS is_anomaly
    FROM w0
"""

# quality_dynamic_threshold oracle: identical tokenization
# ([^a-z0-9']+ on lowered text, empties dropped), ttr rounded to 6dp
# BEFORE the percent_rank, total order (ttr DESC, doc_id ASC).
ORACLE_SQL["quality_dynamic_threshold"] = """
    WITH toks AS (
        SELECT doc_id, lang, t.tok
        FROM documents,
             LATERAL (SELECT unnest(regexp_split_to_array(
                 lower(text), '[^a-z0-9'']+')) AS tok) AS t
        WHERE t.tok <> ''
    ), per_doc AS (
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
        FROM toks GROUP BY doc_id, lang
    ), ranked AS (
        SELECT doc_id, lang, n_tokens, n_distinct,
               round(n_distinct * 1.0 / n_tokens, 6) AS ttr
        FROM per_doc
    )
    SELECT doc_id, lang, n_tokens, n_distinct, ttr,
           round(percent_rank() OVER w, 6) AS pct_rank,
           CAST(round(percent_rank() OVER w, 6)
                <= CAST(0.6 AS DOUBLE) AS INT) AS keep
    FROM ranked
    WINDOW w AS (PARTITION BY lang ORDER BY ttr DESC, doc_id ASC)
"""

# corpus_cross_source_overlap oracle: chunking identical to
# dedup_paragraph (space-split, non-overlapping 16-token windows, last
# partial kept), DISTINCT (source, chunk), src_a < src_b equi-join,
# broadcast-shaped size lookups for the Jaccard denominator.
ORACLE_SQL["corpus_cross_source_overlap"] = """
    WITH base AS (
        SELECT source, string_split(lower(text), ' ') AS toks
        FROM documents
    ), chunks AS (
        SELECT DISTINCT source AS src,
               array_to_string(toks[i : i + 15], ' ') AS chunk_text
        FROM base,
             unnest(generate_series(1, greatest(len(toks), 1), 16)) AS t(i)
    ), sizes AS (
        SELECT src, count(*) AS n FROM chunks GROUP BY src
    ), shared AS (
        SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
        FROM chunks a
        JOIN chunks b ON a.chunk_text = b.chunk_text AND a.src < b.src
        GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.src = src_a
    JOIN sizes sb ON sb.src = src_b
"""


# drift_js_events oracle: identical clamped equi-width binning (width
# 500/16 = 31.25 exact in binary), exact count-ratio probabilities,
# per-bin JS contributions rounded to 9dp before the sum (the
# perplexity-family convention), total to 6dp. All float literals CAST
# to DOUBLE (DuckDB bare decimals are DECIMAL).
def _js_drift_oracle_sql(n_bins: int = 16, lo: float = 0.0, hi: float = 500.0) -> str:
    width = (hi - lo) / n_bins
    return f"""
        WITH binned AS (
            SELECT event_type AS grp,
                   CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 'early' ELSE 'late' END AS split,
                   CAST(greatest(0, least({n_bins - 1},
                       floor((CAST(value AS DOUBLE) - CAST({lo!r} AS DOUBLE))
                             / CAST({width!r} AS DOUBLE)))) AS INT) AS bin
            FROM events WHERE value IS NOT NULL
        ), hist AS (
            SELECT grp, split, bin, count(*) AS n
            FROM binned GROUP BY 1, 2, 3
        ), tot AS (
            SELECT grp, split, sum(n) AS tot FROM hist GROUP BY 1, 2
        ), h AS (
            SELECT hist.grp, hist.split, hist.bin,
                   CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS pr, tot
            FROM hist JOIN tot USING (grp, split)
        ), a AS (
            SELECT grp, bin, pr AS p, tot AS n_a FROM h WHERE split = 'early'
        ), b AS (
            SELECT grp, bin, pr AS q, tot AS n_b FROM h WHERE split = 'late'
        ), j AS (
            SELECT coalesce(a.grp, b.grp) AS grp,
                   coalesce(p, CAST(0 AS DOUBLE)) AS p,
                   coalesce(q, CAST(0 AS DOUBLE)) AS q,
                   n_a, n_b
            FROM a FULL OUTER JOIN b
              ON a.grp = b.grp AND a.bin = b.bin
        ), t AS (
            SELECT grp, n_a, n_b,
                   round(CAST(0.5 AS DOUBLE)
                         * (CASE WHEN p > 0 THEN p * ln(p / ((p + q)
                              / CAST(2.0 AS DOUBLE))) ELSE CAST(0 AS DOUBLE) END)
                       + CAST(0.5 AS DOUBLE)
                         * (CASE WHEN q > 0 THEN q * ln(q / ((p + q)
                              / CAST(2.0 AS DOUBLE))) ELSE CAST(0 AS DOUBLE) END),
                       9) AS c
            FROM j
        )
        SELECT grp, CAST(max(n_a) AS BIGINT) AS n_a,
               CAST(max(n_b) AS BIGINT) AS n_b,
               round(sum(c), 6) AS js_divergence
        FROM t GROUP BY grp
        HAVING max(n_a) IS NOT NULL AND max(n_b) IS NOT NULL
    """


ORACLE_SQL["drift_js_events"] = _js_drift_oracle_sql()

# stats_winsorize oracle: quantile_cont ≡ Spark percentile ((n−1)·q
# interpolation — the sketch_quantile_errors-pinned convention), cuts
# rounded to 6dp BEFORE the clamp/classification.
ORACLE_SQL["stats_winsorize"] = """
    WITH cuts AS (
        SELECT l_returnflag AS grp,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE),
                                   CAST(0.05 AS DOUBLE)), 6) AS cut_lo,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE),
                                   CAST(0.95 AS DOUBLE)), 6) AS cut_hi
        FROM lineitem WHERE l_extendedprice IS NOT NULL
        GROUP BY 1
    )
    SELECT l.l_returnflag AS grp,
           min(c.cut_lo) AS cut_lo,
           min(c.cut_hi) AS cut_hi,
           CAST(sum(CASE WHEN l.l_extendedprice < c.cut_lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN l.l_extendedprice > c.cut_hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           round(avg(CAST(l.l_extendedprice AS DOUBLE)), 4) AS mean_raw,
           round(avg(least(greatest(CAST(l.l_extendedprice AS DOUBLE),
                                    c.cut_lo), c.cut_hi)), 4)
               AS mean_winsorized
    FROM lineitem l JOIN cuts c ON c.grp = l.l_returnflag
    WHERE l.l_extendedprice IS NOT NULL
    GROUP BY 1
"""

# text_token_pmi oracle: the perplexity-family tokenization CTE, exact
# integer-count probabilities, the identical division shape
# (n2/M) / ((n_a/N) * (n_b/N)).
ORACLE_SQL["text_token_pmi"] = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS t
        FROM documents
    ), tok AS (
        SELECT doc_id, t[i.i] AS token,
               CASE WHEN i.i > 1 THEN t[i.i - 1] END AS prev
        FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
        WHERE len(t) > 0
    ), uni AS (
        SELECT token, count(*) AS n1 FROM tok GROUP BY token
    ), tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_tok,
               CAST(count(prev) AS DOUBLE) AS n_pair
        FROM tok
    ), bi AS (
        SELECT prev, token, count(*) AS n2 FROM tok
        WHERE prev IS NOT NULL GROUP BY prev, token
        HAVING count(*) >= 5
    )
    SELECT bi.prev, bi.token, CAST(bi.n2 AS BIGINT) AS n_pair,
           round(ln((CAST(bi.n2 AS DOUBLE) / tot.n_pair)
                    / ((CAST(ua.n1 AS DOUBLE) / tot.n_tok)
                       * (CAST(ub.n1 AS DOUBLE) / tot.n_tok))), 6) AS pmi
    FROM bi
    CROSS JOIN tot
    JOIN uni ua ON ua.token = bi.prev
    JOIN uni ub ON ub.token = bi.token
"""

# events_state_islands oracle: identical lag-change flag + running-sum
# island id over the unique (ts, event_id) order, then the per-island
# aggregate and the lead() to close each interval.
ORACLE_SQL["events_state_islands"] = """
    WITH base AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM base
    ), g AS (
        SELECT user_id, island,
               min(event_type) AS state,
               min(ts) AS valid_from,
               max(ts) AS last_seen,
               CAST(count(*) AS BIGINT) AS n_events
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id, CAST(island AS BIGINT) AS island, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
               AS valid_to,
           last_seen, n_events
    FROM g
"""

# join_salted_skew oracle: the salt changes the physical shuffle key
# only — the oracle is the plain join + aggregate.
ORACLE_SQL["join_salted_skew"] = """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
"""


# events_window_funnel oracle: the identical sequential min-aggregate
# chain — strict ordering (ts > previous stage), 7-day window anchored
# at each user's first stage-1 event, earliest qualifying event per
# stage.
ORACLE_SQL["events_window_funnel"] = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
          AND e.ts <= v.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ), counts AS (
        SELECT 1 AS stage_idx, 'view' AS stage,
               (SELECT count(*) FROM v) AS n
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
    )
    SELECT stage_idx, stage, CAST(n AS BIGINT) AS n_users,
           round(CAST(n AS DOUBLE)
                 / CAST((SELECT count(*) FROM v) AS DOUBLE), 6)
               AS conversion
    FROM counts
"""


# ann_incremental_topk oracle: the shared IVF CTE chain with the
# corpus/query split applied — trainer init = 16 lowest EVEN ids,
# lists = even half, probes = the odd-id batch (disjoint from the
# index, so the self-exclusion guard is vacuous but kept).
ORACLE_SQL["ann_incremental_topk"] = f"""
    WITH {_ivf_common_ctes(
        corpus_pred="vec_id % 2 = 0",
        query_pred="vec_id % 2 = 1 AND vec_id < 16",
    )}
    SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
    FROM ivf
"""


# ann_index_delete oracle: the same chain with the quantizer trained
# on the FULL even half (corpus_pred) but the candidate lists masked
# to the surviving vectors (list_pred) — replaying exactly what a
# tombstone delete does to a stable-quantizer IVF index.
ORACLE_SQL["ann_index_delete"] = f"""
    WITH {_ivf_common_ctes(
        corpus_pred="vec_id % 2 = 0",
        query_pred="vec_id % 2 = 1 AND vec_id < 16",
        list_pred="vec_id % 8 <> 0",
    )}
    SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank, sim
    FROM ivf
"""


# sketch_hll_union oracle: the per-half register chains (same hashing /
# mixer / rank scheme as sketch_hll_cardinality), the per-bucket max
# merge, the estimator over the merged registers, and the
# merged-vs-single-pass register comparison.
def _hll_union_oracle_sql() -> str:
    from collection_templates_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_RANK_BITS,
    )

    m, rb = HLL_M, HLL_RANK_BITS
    rmax = rb + 1
    amm = repr(HLL_ALPHA * m * m)
    return f"""
        WITH tok AS (
            SELECT doc_id % 2 AS half, t.token
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                     AS t(token)
            WHERE t.token <> ''
        ), hs AS (
            SELECT DISTINCT half, {_poly_hash_sql('token', 31)} AS h1,
                   {_poly_hash_sql('token', 37)} AS h2
            FROM tok
        ), gs AS (
            SELECT half,
                   ((h1 * h1 % 2147483647) * 48271 % 2147483647 + h2)
                       % 2147483647 AS g1,
                   ((h2 * h2 % 2147483647) * 48271 % 2147483647 + h1)
                       % 2147483647 AS g2
            FROM hs
        ), rnk AS (
            SELECT half, g1 % {m} AS bucket,
                   CASE WHEN g2 > 0
                        THEN least(length(bin(g2 & (-g2))), {rmax})
                        ELSE {rmax} END AS r
            FROM gs
        ), regs AS (
            SELECT half, bucket, max(r) AS mx FROM rnk GROUP BY 1, 2
        ), merged AS (
            SELECT bucket, max(mx) AS mx FROM regs GROUP BY bucket
        ), direct AS (
            SELECT bucket, max(r) AS mx FROM rnk GROUP BY bucket
        ), mism AS (
            SELECT CAST(count(*) AS BIGINT) AS n_register_mismatch
            FROM merged mm FULL OUTER JOIN direct d
              ON mm.bucket = d.bucket
            WHERE mm.mx <> d.mx OR mm.mx IS NULL OR d.mx IS NULL
        ), agg AS (
            SELECT count(*) AS nonzero,
                   CAST(sum(CAST(pow(2.0, {rmax} - mx) AS BIGINT))
                        AS BIGINT) AS num
            FROM merged
        ), nt AS (
            SELECT count(DISTINCT token) AS n_true FROM tok
        ), est AS (
            SELECT nonzero, num, n_true,
                   {amm} / (num / {float(2 ** rmax)!r}
                            + ({m} - nonzero)) AS raw_e
            FROM agg, nt
        ), est2 AS (
            SELECT n_true,
                   round(CASE WHEN raw_e <= {2.5 * m!r}
                                  AND ({m} - nonzero) > 0
                              THEN {float(m)!r}
                                   * ln({float(m)!r} / ({m} - nonzero))
                              ELSE raw_e END, 4) AS estimate
            FROM est
        )
        SELECT {m} AS m, n_true, estimate,
               round(abs(estimate - n_true) / n_true, 4) AS rel_err,
               (SELECT n_register_mismatch FROM mism)
                   AS n_register_mismatch
        FROM est2
    """


ORACLE_SQL["sketch_hll_union"] = _hll_union_oracle_sql()


# events_markov_transitions oracle: the identical lag pairing over the
# unique (ts, event_id) order, pair counts, per-current normalization.
ORACLE_SQL["events_markov_transitions"] = """
    WITH seq AS (
        SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS cur,
               event_type AS nxt
        FROM events
    ), pr AS (
        SELECT cur, nxt, count(*) AS n FROM seq
        WHERE cur IS NOT NULL GROUP BY 1, 2
    ), tt AS (
        SELECT cur, sum(n) AS n_cur FROM pr GROUP BY cur
    )
    SELECT pr.cur, pr.nxt, CAST(pr.n AS BIGINT) AS n,
           round(CAST(pr.n AS DOUBLE) / CAST(tt.n_cur AS DOUBLE), 6) AS p
    FROM pr JOIN tt ON pr.cur = tt.cur
"""


# text_script_mix oracle: identical per-char codepoint classification
# (string_split('') ≡ F.split(s, ""); ascii() returns the first
# codepoint in both engines), fixed-priority dominance, 6dp fractions.
ORACLE_SQL["text_script_mix"] = """
    WITH chars AS (
        SELECT doc_id, ascii(t.c) AS cp
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, '')) AS c) t
        WHERE t.c <> ''
    ), cls AS (
        SELECT doc_id,
               CASE WHEN cp BETWEEN 48 AND 57 THEN 'digit'
                    WHEN cp BETWEEN 65 AND 90 OR cp BETWEEN 97 AND 122
                         THEN 'latin'
                    WHEN cp BETWEEN 19968 AND 40959 THEN 'cjk'
                    WHEN cp IN (9, 10, 13, 32) THEN 'space'
                    ELSE 'other' END AS k
        FROM chars
    ), agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chars,
               CAST(sum(CASE WHEN k = 'latin' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_latin,
               CAST(sum(CASE WHEN k = 'cjk' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cjk,
               CAST(sum(CASE WHEN k = 'digit' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_digit,
               CAST(sum(CASE WHEN k = 'space' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_space,
               CAST(sum(CASE WHEN k = 'other' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_other
        FROM cls GROUP BY doc_id
    )
    SELECT doc_id, n_chars, n_latin, n_cjk, n_digit, n_space, n_other,
           round(n_latin * 1.0 / n_chars, 6) AS frac_latin,
           round(n_cjk * 1.0 / n_chars, 6) AS frac_cjk,
           CASE WHEN n_cjk >= n_latin AND n_cjk >= n_digit
                     AND n_cjk >= n_other THEN 'cjk'
                WHEN n_latin >= n_digit AND n_latin >= n_other
                     THEN 'latin'
                WHEN n_digit >= n_other THEN 'digit'
                ELSE 'other' END AS dominant,
           CAST(n_latin > 0 AND n_cjk > 0 AS INT) AS is_mixed
    FROM agg
"""


# agg_weighted_median oracle: identical cumulative-weight crossing pick
# (lower weighted median, ROWS frame, 6dp-rounded cumulative sums —
# integer-valued weights make every sum exact anyway).
ORACLE_SQL["agg_weighted_median"] = """
    WITH base AS (
        SELECT l_returnflag AS grp,
               CAST(l_extendedprice AS DOUBLE) AS v,
               CAST(l_quantity AS DOUBLE) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_quantity > 0
    ), cum AS (
        SELECT grp, v,
               round(sum(w) OVER (PARTITION BY grp ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cw,
               round(sum(w) OVER (PARTITION BY grp), 6) AS tw
        FROM base
    )
    SELECT grp, min(tw) AS w_total, min(v) AS w_median
    FROM cum WHERE cw >= tw / CAST(2.0 AS DOUBLE)
    GROUP BY grp
"""


# graph_label_propagation oracle: the co-purchase projection + three
# synchronous sweeps unrolled as CTEs (most-frequent neighbor label,
# smallest label on ties).
def _lpa_oracle_sql(iterations: int = 3) -> str:
    ctes = ["""cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
    )""", """e AS (
        SELECT u, v FROM (
            SELECT a.c AS u, b.c AS v, count(*) AS shared
            FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
            GROUP BY 1, 2
        ) WHERE shared >= 2
    )""", """und AS (
        SELECT u AS a, v AS b FROM e
        UNION SELECT v, u FROM e
    )""", """l0 AS (
        SELECT DISTINCT a AS node, a AS community FROM und
    )"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""f{i} AS (
        SELECT und.a AS node, l.community, count(*) AS n
        FROM und JOIN l{i - 1} l ON l.node = und.b
        GROUP BY 1, 2
    )""")
        ctes.append(f"""l{i} AS (
        SELECT node, community FROM (
            SELECT node, community,
                   row_number() OVER (PARTITION BY node
                       ORDER BY n DESC, community ASC) AS rn
            FROM f{i}) WHERE rn = 1
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, community FROM l{iterations}"
    )


ORACLE_SQL["graph_label_propagation"] = _lpa_oracle_sql()


# snapshot_merge_upsert oracle: the identical change derivation and
# the full-outer MERGE (change wins; delete removes; base passes).
ORACLE_SQL["snapshot_merge_upsert"] = """
    WITH base AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               round(c_acctbal, 2) AS bal
        FROM customer
    ), changes AS (
        SELECT k, 'UPDATED' AS seg, bal, 'update' AS op
        FROM base WHERE k % 10 = 0
        UNION ALL
        SELECT k, seg, bal, 'archive' FROM base WHERE k % 10 = 1
        UNION ALL
        SELECT k + 1000000, seg, bal, 'insert' FROM base WHERE k % 10 = 2
    )
    SELECT coalesce(c.k, b.k) AS k,
           CASE WHEN c.op IS NOT NULL THEN c.seg ELSE b.seg END AS seg,
           CASE WHEN c.op IS NOT NULL THEN c.bal ELSE b.bal END AS bal
    FROM base b FULL OUTER JOIN changes c ON b.k = c.k
    WHERE c.op IS NULL OR c.op <> 'archive'
"""


# basket_item_pairs oracle: DISTINCT baskets, the p1<p2 self-join,
# support cut, lift from broadcast-shaped item supports.
ORACLE_SQL["basket_item_pairs"] = """
    WITH basket AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), nn AS (
        SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n FROM basket
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, count(*) AS support
        FROM basket a JOIN basket b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), sup AS (
        SELECT p, count(*) AS s FROM basket GROUP BY p
    )
    SELECT p1, p2, CAST(support AS BIGINT) AS support,
           round((CAST(support AS DOUBLE) / nn.n)
                 / ((CAST(s1.s AS DOUBLE) / nn.n)
                    * (CAST(s2.s AS DOUBLE) / nn.n)), 6) AS lift
    FROM pairs
    CROSS JOIN nn
    JOIN sup s1 ON s1.p = pairs.p1
    JOIN sup s2 ON s2.p = pairs.p2
"""

# text_tfidf_top_terms oracle: the perplexity-family tokenization,
# tf/df/N aggregates, identical tf·ln(N/df) shape, top-3 per doc with
# the (tfidf DESC, token ASC) total order.
ORACLE_SQL["text_tfidf_top_terms"] = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS t
        FROM documents
    ), tok AS (
        SELECT doc_id, t[i.i] AS token
        FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
        WHERE len(t) > 0
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
    ), dft AS (
        SELECT token, count(*) AS df FROM tf GROUP BY token
    ), nd AS (
        SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tok
    ), scored AS (
        SELECT tf.doc_id, tf.token,
               round(CAST(tf.tf AS DOUBLE)
                     * ln(nd.n / CAST(dft.df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN dft USING (token) CROSS JOIN nd
    )
    SELECT doc_id, rank, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token ASC) AS rank
        FROM scored)
    WHERE rank <= 3
"""


# drift_welch_ttest oracle: identical moments (6dp means/variances
# BEFORE the t arithmetic), same expression shapes (no pow()).
ORACLE_SQL["drift_welch_ttest"] = """
    WITH base AS (
        SELECT event_type AS grp,
               CASE WHEN ts < TIMESTAMP '2024-01-16'
                    THEN 'early' ELSE 'late' END AS split,
               CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ), mom AS (
        SELECT grp, split, count(*) AS n,
               round(avg(v), 6) AS m, round(var_samp(v), 6) AS s2
        FROM base GROUP BY 1, 2
    ), a AS (
        SELECT grp, n AS n_a, m AS mean_a, s2 / n AS va
        FROM mom WHERE split = 'early'
    ), b AS (
        SELECT grp, n AS n_b, m AS mean_b, s2 / n AS vb
        FROM mom WHERE split = 'late'
    )
    SELECT a.grp, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a, mean_b,
           round((mean_a - mean_b) / sqrt(va + vb), 6) AS t_stat,
           round((va + vb) * (va + vb)
                 / (va * va / (n_a - 1) + vb * vb / (n_b - 1)), 2)
               AS welch_df
    FROM a JOIN b ON a.grp = b.grp
"""

# text_zipf_fit oracle: identical tokenization, (count DESC, token ASC)
# rank, closed-form OLS over 6dp-rounded sums.
ORACLE_SQL["text_zipf_fit"] = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS t
        FROM documents
    ), tok AS (
        SELECT t[i.i] AS token
        FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
        WHERE len(t) > 0
    ), counts AS (
        SELECT token, count(*) AS n FROM tok GROUP BY token
    ), top AS (
        SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 1000
    ), pts AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token ASC)
                        AS DOUBLE)) AS x,
               ln(CAST(n AS DOUBLE)) AS y
        FROM top
    ), sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
               round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
               round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx
        FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_terms,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
                 / k, 4) AS intercept
    FROM sums
"""


# dedup_cluster_report oracle: the reachability CTE (shared with
# dedup_clusters/dedup_keep_best) + the size histogram.
ORACLE_SQL["dedup_cluster_report"] = f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
    edges(a, b) AS (
        SELECT doc1, doc2 FROM pairs
        UNION SELECT doc2, doc1 FROM pairs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), clusters AS (
        SELECT a AS node, least(a, min(b)) AS cluster
        FROM reach GROUP BY a
    ), labeled AS (
        SELECT coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
    ), sizes AS (
        SELECT cluster, count(*) AS sz FROM labeled GROUP BY cluster
    )
    SELECT CAST(sz AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           CAST((sz - 1) * count(*) AS BIGINT) AS n_dropped_keep_one
    FROM sizes GROUP BY sz
"""

# events_conversion_lag oracle: identical first-view anchor, strictly-
# after purchase, earliest conversion, micros arithmetic, (n−1)·q
# median.
ORACLE_SQL["events_conversion_lag"] = """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT p.user_id, min(p.ts) AS t_buy, min(v.t_view) AS t_view
        FROM events p JOIN v ON p.user_id = v.user_id
        WHERE p.event_type = 'purchase' AND p.ts > v.t_view
        GROUP BY p.user_id
    ), lagt AS (
        SELECT CAST(epoch_us(t_buy) - epoch_us(t_view) AS DOUBLE)
               / CAST(1000000.0 AS DOUBLE) AS sec
        FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(avg(sec), 4) AS mean_lag_sec,
           round(min(sec), 4) AS min_lag_sec,
           round(max(sec), 4) AS max_lag_sec,
           round(quantile_cont(sec, CAST(0.5 AS DOUBLE)), 4)
               AS median_lag_sec
    FROM lagt
"""


# ---------------------------------------------------------------------------
# Round-11 oracles
# ---------------------------------------------------------------------------

# stats_ks_test: step-CDF replay over pooled distinct values — integer
# cumulative counts, exact divisions, 6dp rounds on D and the critical
# value (every fractional literal CAST to DOUBLE — the DuckDB DECIMAL
# trap).
ORACLE_SQL["stats_ks_test"] = """
    WITH oc AS (
        SELECT CAST(o.o_totalprice AS DOUBLE) AS v, c.c_mktsegment AS g
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o.o_totalprice IS NOT NULL
    ), at_v AS (
        SELECT v,
               sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS cb
        FROM oc GROUP BY v
    ), cum AS (
        SELECT sum(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
               sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
        FROM at_v
    ), tot AS (
        SELECT cum_a, cum_b,
               max(cum_a) OVER () AS ta, max(cum_b) OVER () AS tb
        FROM cum
    ), d AS (
        SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
               max(abs(CAST(cum_a AS DOUBLE) / CAST(ta AS DOUBLE)
                       - CAST(cum_b AS DOUBLE) / CAST(tb AS DOUBLE))) AS dd
        FROM tot
    )
    SELECT n_a, n_b, round(dd, 6) AS ks_d,
           round(CAST(1.358 AS DOUBLE)
                 * sqrt(CAST(n_a + n_b AS DOUBLE)
                        / CAST(n_a * n_b AS DOUBLE)), 6) AS crit_05,
           round(dd, 6) > round(CAST(1.358 AS DOUBLE)
                 * sqrt(CAST(n_a + n_b AS DOUBLE)
                        / CAST(n_a * n_b AS DOUBLE)), 6) AS reject_05
    FROM d
"""

# stats_chi_square: integer contingency marginals; expected values and
# per-cell contributions as exact-input doubles, 9dp per cell before the
# bounded sum (drift_js convention), 6dp outputs.
ORACLE_SQL["stats_chi_square"] = """
    WITH base AS (
        SELECT event_type AS r, (day(ts) - 1) % 7 AS c FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ), cells AS (
        SELECT r, c, count(*) AS o FROM base GROUP BY r, c
    ), rt AS (SELECT r, sum(o) AS rt FROM cells GROUP BY r
    ), ct AS (SELECT c, sum(o) AS ct FROM cells GROUP BY c
    ), nt AS (
        SELECT sum(o) AS n, count(DISTINCT r) AS nr,
               count(DISTINCT c) AS nc
        FROM cells
    ), j AS (
        SELECT nt.n, nt.nr, nt.nc,
               round((CAST(cells.o AS DOUBLE)
                      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                        / CAST(nt.n AS DOUBLE))
                     * (CAST(cells.o AS DOUBLE)
                        - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                          / CAST(nt.n AS DOUBLE))
                     / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                        / CAST(nt.n AS DOUBLE)), 9) AS cell_chi2
        FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN nt
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((max(nr) - 1) * (max(nc) - 1) AS BIGINT) AS dof,
           round(sum(cell_chi2), 6) AS chi2,
           round(CASE WHEN least(max(nr), max(nc)) > 1 THEN
               sqrt(sum(cell_chi2)
                    / (CAST(max(n) AS DOUBLE)
                       * CAST(least(max(nr) - 1, max(nc) - 1) AS DOUBLE)))
               END, 6) AS cramers_v
    FROM j
"""


# stats_correlation: DECIMAL moment sums (exact — no FP summation-order
# exposure), closed-form r and cov on exact inputs, one UNION branch per
# pair mirroring the Spark explode of the single moments row.
def _corr_oracle_sql(
    cols: tuple[str, ...] = (
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    ),
) -> str:
    dec = "DECIMAL(18,2)"
    moments = ["count(*) AS n"]
    for c in cols:
        moments.append(f"sum(CAST({c} AS {dec})) AS s_{c}")
        moments.append(
            f"sum(CAST({c} AS {dec}) * CAST({c} AS {dec})) AS ss_{c}"
        )
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for x, y in pairs:
        moments.append(
            f"sum(CAST({x} AS {dec}) * CAST({y} AS {dec})) AS sxy_{x}_{y}"
        )
    branches = []
    for x, y in pairs:
        nd = "CAST(n AS DOUBLE)"
        sx, sy = f"CAST(s_{x} AS DOUBLE)", f"CAST(s_{y} AS DOUBLE)"
        sxx, syy = f"CAST(ss_{x} AS DOUBLE)", f"CAST(ss_{y} AS DOUBLE)"
        sxy = f"CAST(sxy_{x}_{y} AS DOUBLE)"
        branches.append(f"""
        SELECT '{x}' AS x, '{y}' AS y, CAST(n AS BIGINT) AS n,
               round(({nd} * {sxy} - {sx} * {sy})
                     / sqrt(({nd} * {sxx} - {sx} * {sx})
                            * ({nd} * {syy} - {sy} * {sy})), 4)
               + CAST(0 AS DOUBLE) AS corr,
               round(({sxy} - {sx} * {sy} / {nd})
                     / ({nd} - CAST(1.0 AS DOUBLE)), 4)
               + CAST(0 AS DOUBLE) AS cov
        FROM m""")
    return (
        "WITH m AS (SELECT " + ", ".join(moments) + " FROM lineitem)"
        + " UNION ALL ".join(branches)
    )


ORACLE_SQL["stats_correlation"] = _corr_oracle_sql()

# Shared daily series for the MAD / CUSUM rows: DECIMAL(18,2) day totals
# cast to double — exact in both engines regardless of row order.
_DAILY_SERIES_CTE = """daily AS (
        SELECT event_type AS grp, CAST(ts AS DATE) AS t,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    )"""

ORACLE_SQL["events_anomaly_mad"] = f"""
    WITH {_DAILY_SERIES_CTE}, med AS (
        SELECT grp, round(quantile_cont(v, 0.5), 6) AS med
        FROM daily GROUP BY grp
    ), madt AS (
        SELECT d.grp, min(m.med) AS med,
               round(quantile_cont(abs(d.v - m.med), 0.5), 6) AS mad
        FROM daily d JOIN med m USING (grp) GROUP BY d.grp
    )
    SELECT d.grp AS event_type, d.t, d.v, m.med, m.mad,
           CASE WHEN m.mad > 0 THEN
               round((d.v - m.med)
                     / (m.mad * CAST(1.4826 AS DOUBLE)), 4)
               + CAST(0 AS DOUBLE) END AS score,
           CASE WHEN m.mad > 0 AND abs(round((d.v - m.med)
                    / (m.mad * CAST(1.4826 AS DOUBLE)), 4))
                    > CAST(3.0 AS DOUBLE)
                THEN 1 ELSE 0 END AS is_anomaly
    FROM daily d JOIN madt m USING (grp)
"""

# events_cusum_changepoint: DECIMAL(18,6)-exact prefix sums, 9dp mean,
# S_t = cum − t·mean rounded 6dp, earliest argmax.
ORACLE_SQL["events_cusum_changepoint"] = f"""
    WITH {_DAILY_SERIES_CTE}, base AS (
        SELECT grp, t, CAST(v AS DECIMAL(18,6)) AS vd FROM daily
        WHERE v IS NOT NULL
    ), mean_t AS (
        SELECT grp,
               round(CAST(sum(vd) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
                   AS mean_v,
               count(*) AS n
        FROM base GROUP BY grp
    ), cum AS (
        SELECT b.grp, b.t, m.mean_v, m.n,
               round(CAST(sum(b.vd) OVER (PARTITION BY b.grp ORDER BY b.t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE)
                     - CAST(row_number() OVER (PARTITION BY b.grp
                       ORDER BY b.t) AS DOUBLE) * m.mean_v, 6) AS s
        FROM base b JOIN mean_t m USING (grp)
    ), ranked AS (
        SELECT grp, t, s, n, mean_v,
               row_number() OVER (PARTITION BY grp
                   ORDER BY abs(s) DESC, t ASC) AS rk
        FROM cum
    )
    SELECT grp AS event_type, CAST(n AS BIGINT) AS n, mean_v,
           t AS cp_t, round(abs(s), 6) AS cp_s_abs
    FROM ranked WHERE rk = 1
"""

# events_attribution: strictly-before tuple join + ordered first/last
# aggregates; counts are integers, shares exact divisions rounded 6dp.
ORACLE_SQL["events_attribution"] = """
    WITH conv AS (
        SELECT user_id AS u, epoch_us(ts) AS c_us, event_id AS c_id
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id AS u, epoch_us(ts) AS t_us, event_id AS t_id,
               event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ), j AS (
        SELECT c.u, c.c_id, t.channel, t.t_us, t.t_id
        FROM conv c JOIN touch t ON c.u = t.u
         AND (t.t_us < c.c_us OR (t.t_us = c.c_us AND t.t_id < c.c_id))
    ), pc AS (
        SELECT u, c_id,
               first(channel ORDER BY t_us, t_id) AS first_channel,
               last(channel ORDER BY t_us, t_id) AS last_channel
        FROM j GROUP BY u, c_id
    ), f AS (
        SELECT first_channel AS channel, count(*) AS first_touch
        FROM pc GROUP BY 1
    ), l AS (
        SELECT last_channel AS channel, count(*) AS last_touch
        FROM pc GROUP BY 1
    ), tot AS (SELECT count(*) AS n_conversions FROM pc)
    SELECT channel,
           CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch,
           CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch,
           CAST(tot.n_conversions AS BIGINT) AS n_conversions,
           round(CAST(coalesce(first_touch, 0) AS DOUBLE)
                 / CAST(tot.n_conversions AS DOUBLE), 6) AS first_share,
           round(CAST(coalesce(last_touch, 0) AS DOUBLE)
                 / CAST(tot.n_conversions AS DOUBLE), 6) AS last_share
    FROM f FULL OUTER JOIN l USING (channel) CROSS JOIN tot
"""

# customer_rfm_segments: ntile(4) with (metric, custkey) total order,
# DECIMAL-exact monetary, averages from exact sums.
ORACLE_SQL["customer_rfm_segments"] = """
    WITH pc AS (
        SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY 1
    ), wr AS (
        SELECT *, date_diff('day', last_order,
                            (SELECT max(last_order) FROM pc))
                   AS recency_days
        FROM pc
    ), seg AS (
        SELECT *,
            ntile(4) OVER (ORDER BY recency_days ASC, custkey) AS r_q,
            ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_q,
            ntile(4) OVER (ORDER BY monetary DESC, custkey) AS m_q
        FROM wr
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(monetary) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS avg_monetary,
           round(CAST(sum(recency_days) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS avg_recency_days
    FROM seg GROUP BY 1, 2, 3
"""

# events_top_paths: sessionize (6h epoch_us gap), first-3 path assembly
# via ordered string_agg, top-20 with path tie-break.
ORACLE_SQL["events_top_paths"] = """
    WITH lagd AS (
        SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS p_us
        FROM events
    ), flag AS (
        SELECT *, CASE WHEN p_us IS NULL OR us - p_us > 21600000000
                       THEN 1 ELSE 0 END AS ns
        FROM lagd
    ), sess AS (
        SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_idx
        FROM flag
    ), steps AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, sess_idx
                   ORDER BY ts, event_id) AS rn
        FROM sess
    ), paths AS (
        SELECT user_id, sess_idx,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM steps WHERE rn <= 3 GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC LIMIT 20
"""


# graph_kcore: the customer-part bipartite projection + the fixed peeling
# sweeps unrolled as CTE pairs (degree filter, induced edges), exactly
# the LPA-oracle unrolling pattern.
def _kcore_oracle_sql(k: int = 20, sweeps: int = 4) -> str:
    ctes = ["""e0 AS (
        SELECT DISTINCT least('c' || o.o_custkey, 'p' || l.l_partkey) AS a,
               greatest('c' || o.o_custkey, 'p' || l.l_partkey) AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )"""]
    selects = []
    for i in range(1, sweeps + 1):
        ctes.append(f"""d{i} AS (
        SELECT n, count(*) AS d FROM (
            SELECT a AS n FROM e{i - 1}
            UNION ALL SELECT b FROM e{i - 1})
        GROUP BY n
    )""")
        ctes.append(f"""k{i} AS (SELECT n FROM d{i} WHERE d >= {k})""")
        ctes.append(f"""e{i} AS (
        SELECT e.a, e.b FROM e{i - 1} e
        JOIN k{i} x ON e.a = x.n JOIN k{i} y ON e.b = y.n
    )""")
        selects.append(
            f"""SELECT {i} AS sweep,
               CAST(count(DISTINCT n) AS BIGINT) AS n_nodes,
               CAST(count(*) / 2 AS BIGINT) AS n_edges
            FROM (SELECT a AS n FROM e{i} UNION ALL SELECT b FROM e{i})"""
        )
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(
        selects
    )


ORACLE_SQL["graph_kcore"] = _kcore_oracle_sql()

# graph_link_prediction: capped wedge join (center degree <= 64),
# true-degree Jaccard, anti-join against existing edges, top-20.
ORACLE_SQL["graph_link_prediction"] = """
    WITH e AS (
        SELECT DISTINCT least('c' || o.o_custkey, 'p' || l.l_partkey) AS a,
               greatest('c' || o.o_custkey, 'p' || l.l_partkey) AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
    ), adj AS (
        SELECT a AS n, b AS nbr FROM e UNION ALL SELECT b, a FROM e
    ), deg AS (SELECT n, count(*) AS d FROM adj GROUP BY n
    ), centers AS (SELECT n FROM deg WHERE d <= 64
    ), adjc AS (
        SELECT adj.n, adj.nbr FROM adj JOIN centers USING (n)
    ), wed AS (
        SELECT x.nbr AS a, y.nbr AS b
        FROM adjc x JOIN adjc y ON x.n = y.n AND x.nbr < y.nbr
    ), cn AS (SELECT a, b, count(*) AS cn FROM wed GROUP BY a, b
    ), fresh AS (
        SELECT cn.a, cn.b, cn.cn FROM cn
        LEFT JOIN e ON cn.a = e.a AND cn.b = e.b
        WHERE e.a IS NULL
    )
    SELECT f.a, f.b, CAST(f.cn AS BIGINT) AS cn,
           round(CAST(f.cn AS DOUBLE)
                 / CAST(da.d + db.d - f.cn AS DOUBLE), 6) AS jaccard
    FROM fresh f JOIN deg da ON da.n = f.a JOIN deg db ON db.n = f.b
    ORDER BY jaccard DESC, cn DESC, a ASC, b ASC LIMIT 20
"""

# text_readability: TOKEN_SPLIT_RE tokens, [.!?]+ sentence runs,
# [aeiouy]+ vowel-group syllables (min 1 each) — per-row exact formulas.
ORACLE_SQL["text_readability"] = """
    WITH w AS (
        SELECT doc_id, text,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS words
        FROM documents
    ), calc AS (
        SELECT doc_id,
               len(words) AS n_words,
               greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                   AS n_sentences,
               list_sum([greatest(1, len(regexp_extract_all(x,
                   '[aeiouy]+'))) for x in words]) AS n_syllables
        FROM w WHERE len(words) > 0
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE)
                   * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 - CAST(84.6 AS DOUBLE)
                   * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
                 4) + CAST(0 AS DOUBLE) AS flesch,
           round(CAST(0.39 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + CAST(11.8 AS DOUBLE)
                   * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                 - CAST(15.59 AS DOUBLE), 4) + CAST(0 AS DOUBLE)
               AS fk_grade
    FROM calc
"""

# text_entropy: per-char probability terms −(p·ln p)/ln2 rounded 9dp
# before the per-doc sum (drift_js convention), 6dp sums.
ORACLE_SQL["text_entropy"] = """
    WITH pc AS (
        SELECT doc_id, t.c AS c, count(*) AS cnt
        FROM documents,
             LATERAL (SELECT unnest(string_split(text, '')) AS c) t
        WHERE t.c <> ''
        GROUP BY doc_id, t.c
    ), tot AS (
        SELECT doc_id, sum(cnt) AS n_chars, count(*) AS n_distinct
        FROM pc GROUP BY doc_id
    )
    SELECT pc.doc_id, CAST(max(t.n_chars) AS BIGINT) AS n_chars,
           CAST(max(t.n_distinct) AS BIGINT) AS n_distinct,
           round(sum(round(-((CAST(pc.cnt AS DOUBLE)
                              / CAST(t.n_chars AS DOUBLE))
                             * ln(CAST(pc.cnt AS DOUBLE)
                                  / CAST(t.n_chars AS DOUBLE))
                             / CAST(0.6931471805599453 AS DOUBLE)), 9)), 6)
               AS entropy_bits
    FROM pc JOIN tot t USING (doc_id) GROUP BY pc.doc_id
"""

# quality_gopher_rules: in-row token-array rules, 6dp ratio rounds
# before every threshold compare, integer failure counts per source.
ORACLE_SQL["quality_gopher_rules"] = """
    WITH w AS (
        SELECT source AS grp, text,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS words
        FROM documents
    ), c AS (
        SELECT grp,
               len(words) AS n_words,
               round(CAST(list_sum([len(x) for x in words]) AS DOUBLE)
                     / CAST(len(words) AS DOUBLE), 6) AS mean_wl,
               round(CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
                     / CAST(len(words) AS DOUBLE), 6) AS symbol_ratio,
               round(CAST(len(list_filter(words,
                         x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                     / CAST(len(words) AS DOUBLE), 6) AS alpha_frac,
               len(list_filter(words, x -> list_contains(
                   ['the', 'be', 'to', 'of', 'and', 'that', 'have',
                    'with'], x))) AS stop_hits
        FROM w WHERE len(words) > 0
    ), f AS (
        SELECT grp,
               CASE WHEN n_words BETWEEN 50 AND 100000
                    THEN 0 ELSE 1 END AS f_word_count,
               CASE WHEN mean_wl BETWEEN CAST(3.0 AS DOUBLE)
                         AND CAST(10.0 AS DOUBLE)
                    THEN 0 ELSE 1 END AS f_word_len,
               CASE WHEN symbol_ratio > CAST(0.1 AS DOUBLE)
                    THEN 1 ELSE 0 END AS f_symbol,
               CASE WHEN alpha_frac < CAST(0.8 AS DOUBLE)
                    THEN 1 ELSE 0 END AS f_alpha,
               CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS f_stopword
        FROM c
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_word_count) AS BIGINT) AS fail_word_count,
           CAST(sum(f_word_len) AS BIGINT) AS fail_word_len,
           CAST(sum(f_symbol) AS BIGINT) AS fail_symbol,
           CAST(sum(f_alpha) AS BIGINT) AS fail_alpha,
           CAST(sum(f_stopword) AS BIGINT) AS fail_stopword,
           round(CAST(sum(CASE WHEN f_word_count + f_word_len + f_symbol
                               + f_alpha + f_stopword = 0
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS pass_frac
    FROM f GROUP BY grp
"""

# sample_reservoir: the split_assignment two-fold portable hash over
# 'reservoir:'||id, folded mod the 999983 prime, rank per source.
ORACLE_SQL["sample_reservoir"] = """
    WITH chars AS (
        SELECT doc_id, source,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('reservoir:' || CAST(doc_id AS VARCHAR),
                                '')]) AS cs
        FROM documents
    ), h AS (
        SELECT doc_id, source,
               (list_reduce(cs, (acc, x) -> (acc * 31 + x) % 2147483647)
                    * 2147483648
                + list_reduce(cs, (acc, x) -> (acc * 37 + x) % 2147483647))
               % 999983 AS hh
        FROM chars
    ), r AS (
        SELECT source AS grp, doc_id AS id,
               row_number() OVER (PARTITION BY source
                   ORDER BY hh, doc_id) AS rk
        FROM h
    )
    SELECT grp, id, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
"""

# ann_sq8_recall: per-dim min/max stats, bucket-center dequantization
# replayed with the exact Spark expression shapes, list_cosine_similarity
# ranking (the ANN-family convention), recall@5 vs brute.
ORACLE_SQL["ann_sq8_recall"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    dims AS (
        SELECT vec_id, ii.i0 AS dim, emb[ii.i0 + 1] AS v
        FROM e CROSS JOIN (SELECT unnest(range(64)) AS i0) ii
    ), stats AS (
        SELECT dim, min(v) AS mn, max(v) AS mx FROM dims GROUP BY dim
    ), deq AS (
        SELECT d.vec_id, d.dim,
               CASE WHEN s.mx > s.mn THEN
                   s.mn + (least(CAST(255 AS DOUBLE),
                               floor((d.v - s.mn) / (s.mx - s.mn) * 256))
                           + CAST(0.5 AS DOUBLE))
                          * (s.mx - s.mn) / CAST(256 AS DOUBLE)
                   ELSE s.mn + CAST(0.5 AS DOUBLE) * (s.mx - s.mn)
                        / CAST(256 AS DOUBLE)
               END AS dv
        FROM dims d JOIN stats s USING (dim)
    ), dvec AS (
        SELECT vec_id, list(dv ORDER BY dim) AS emb FROM deq
        GROUP BY vec_id
    ), sq AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
               round(list_cosine_similarity(q.emb, c.emb), 6) AS sim
        FROM (SELECT * FROM e WHERE vec_id < 8) q, dvec c
        WHERE c.vec_id <> q.vec_id
    ), sqt AS (
        SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (
                PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
            FROM sq) WHERE rnk <= 5
    ), sims AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
               round(list_cosine_similarity(q.emb, c.emb), 6) AS sim
        FROM e q, e c WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
    ), brute AS (
        SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (
                PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rnk
            FROM sims) WHERE rnk <= 5
    )
    SELECT b.qid AS query_id,
           round(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(5.0 AS DOUBLE), 6) AS recall_at_5
    FROM brute b LEFT JOIN sqt i ON b.qid = i.qid AND b.nid = i.nid
    GROUP BY b.qid
"""


# text_rake_keywords: the full RAKE chain replayed — positions INCLUDE
# the empty tokens the split yields at punctuation (they are boundaries),
# phrase assembly via ordered string_agg, degree/frequency word scores.
ORACLE_SQL["text_rake_keywords"] = """
    WITH arrs AS (
        SELECT doc_id AS doc,
               regexp_split_to_array(lower(text), '[^a-z0-9'']+') AS t
        FROM documents
    ), toks AS (
        SELECT doc, i.i - 1 AS pos, t[i.i] AS tok
        FROM arrs, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
    ), marked AS (
        SELECT doc, pos, tok,
               (tok = '' OR list_contains(
                   ['the','a','an','of','and','or','in','on','to','is',
                    'are','was','for','with','that','this','it','as',
                    'at','by'], tok)) AS is_b
        FROM toks
    ), ph AS (
        SELECT doc, pos, tok, is_b,
               sum(CASE WHEN is_b THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS phrase_id
        FROM marked
    ), words AS (
        SELECT doc, phrase_id, pos, tok FROM ph WHERE NOT is_b
    ), phrases AS (
        SELECT doc, phrase_id, count(*) AS plen,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM words GROUP BY doc, phrase_id
        HAVING count(*) <= 4
    ), member AS (
        SELECT w.doc, w.phrase_id, p.plen, w.tok
        FROM words w JOIN phrases p USING (doc, phrase_id)
    ), ws AS (
        SELECT tok,
               round(CAST(sum(plen) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS wscore
        FROM member GROUP BY tok
    ), psc AS (
        SELECT m.doc, m.phrase_id, round(sum(ws.wscore), 6) AS score
        FROM member m JOIN ws USING (tok) GROUP BY m.doc, m.phrase_id
    ), agg AS (
        SELECT p.phrase, CAST(count(*) AS BIGINT) AS n,
               min(s.score) AS score
        FROM phrases p JOIN psc s USING (doc, phrase_id)
        GROUP BY p.phrase
    )
    SELECT phrase, n, score FROM agg
    ORDER BY score DESC, n DESC, phrase ASC LIMIT 20
"""

# stats_ols_regression: the identical centered-moment Cramer arithmetic
# over DECIMAL-exact sums.
ORACLE_SQL["stats_ols_regression"] = """
    WITH m AS (
        SELECT count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS s1,
               sum(CAST(l_discount AS DECIMAL(18,2))) AS s2,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS s11,
               sum(CAST(l_discount AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS s22,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS s12,
               sum(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS s1y,
               sum(CAST(l_discount AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS s2y,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
               CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
               CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
               CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
               CAST(syy AS DOUBLE) AS syy
        FROM m
    ), c AS (
        SELECT n, s1, s2, sy,
               s11 - s1 * s1 / n AS a11,
               s22 - s2 * s2 / n AS a22,
               s12 - s1 * s2 / n AS a12,
               s1y - s1 * sy / n AS c1,
               s2y - s2 * sy / n AS c2,
               syy - sy * sy / n AS sst
        FROM d
    ), b AS (
        SELECT n, s1, s2, sy, c1, c2, sst,
               (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
               (c2 * a11 - c1 * a12) / (a11 * a22 - a12 * a12) AS b2
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((sy - b1 * s1 - b2 * s2) / n, 6) AS b0,
           round(b1, 6) AS b1, round(b2, 6) AS b2,
           round((b1 * c1 + b2 * c2) / sst, 6) AS r2
    FROM b
"""

# text_feature_hashing: the portable two-fold hash over 'fh:'||token
# (tokens are ASCII by the split), mod 1024 buckets, collision rollup.
ORACLE_SQL["text_feature_hashing"] = """
    WITH toks AS (
        SELECT t.tok AS tok FROM (
            SELECT list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9'']+'), x -> x <> '') AS ws
            FROM documents),
            LATERAL (SELECT unnest(ws) AS tok) t
    ), per_tok AS (
        SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), hashed AS (
        SELECT tok, n,
               (list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('fh:' || tok, '')]),
                    (acc, x) -> (acc * 31 + x) % 2147483647) * 2147483648
                + list_reduce(list_prepend(0::BIGINT,
                    [ascii(c)::BIGINT for c in
                     string_split('fh:' || tok, '')]),
                    (acc, x) -> (acc * 37 + x) % 2147483647))
               % 1024 AS bucket
        FROM per_tok
    ), per_bucket AS (
        SELECT bucket, count(*) AS n_distinct, sum(n) AS n_tokens
        FROM hashed GROUP BY bucket
    )
    SELECT CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
           CAST(sum(n_distinct) AS BIGINT) AS n_distinct_tokens,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(sum(CASE WHEN n_distinct > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_colliding_buckets,
           CAST(max(n_distinct) AS BIGINT) AS max_bucket_distinct,
           round(CAST(sum(CASE WHEN n_distinct > 1 THEN n_distinct
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(n_distinct) AS DOUBLE), 6)
               AS colliding_token_frac
    FROM per_bucket
"""

# decontaminate_fuzzy: the dedup_incremental exact-cross-pair replay with
# the % 11 benchmark split, rolled up per source.
ORACLE_SQL["decontaminate_fuzzy"] = """
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                   'g')), ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), cp AS (
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE a.doc_id % 11 <> 0 AND b.doc_id % 11 = 0
        GROUP BY 1, 2
    ), hits AS (
        SELECT DISTINCT doc_new AS doc_id FROM cp
        JOIN sizes s1 ON s1.doc_id = doc_new
        JOIN sizes s2 ON s2.doc_id = doc_old
        WHERE round(c * 1.0 / (s1.n + s2.n - c), 6) >= 0.5
    )
    SELECT d.source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           round(CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1
                          ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS contaminated_frac
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 11 <> 0
    GROUP BY d.source
"""


# events_ewma: the BLOCK-ANCHORED dyadic reparameterization replayed —
# local exponent e = (rn−1) % 512, u = v·2^e (global first row keeps
# the s_1 = x_1 anchor, u = 2v), s = (block cumsum + lag(block total,
# 512)·2^−512) / 2^(e+1); power(2, n) is exact in any IEEE engine, so
# the only exposure is last-ulp summation noise under the 4dp round.
# Identical text-shape to temporal.ewma_smoothing (EWMA_BLOCK = 512).
ORACLE_SQL["events_ewma"] = f"""
    WITH {_DAILY_SERIES_CTE}, rn AS (
        SELECT grp, t, v,
               row_number() OVER (PARTITION BY grp ORDER BY t) AS rn
        FROM daily WHERE v IS NOT NULL
    ), u AS (
        SELECT grp, t, v, rn,
               (rn - 1) % 512 AS e,
               (rn - 1) // 512 AS blk,
               CASE WHEN rn = 1 THEN CAST(2 AS DOUBLE) * v
                    ELSE v * power(CAST(2 AS DOUBLE),
                                   CAST((rn - 1) % 512 AS DOUBLE))
               END AS uu
        FROM rn
    ), sums AS (
        SELECT grp, t, v, rn, e,
               sum(uu) OVER (PARTITION BY grp, blk ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c,
               sum(uu) OVER (PARTITION BY grp, blk) AS bt
        FROM u
    ), scanned AS (
        SELECT grp, t, v, rn, e, c,
               lag(bt, 512) OVER (PARTITION BY grp ORDER BY t) AS tprev
        FROM sums
    )
    SELECT grp AS event_type, t, v, CAST(rn AS INT) AS rn,
           round((c + coalesce(tprev, CAST(0 AS DOUBLE))
                      * power(CAST(2 AS DOUBLE), CAST(-512 AS DOUBLE)))
                 / power(CAST(2 AS DOUBLE), CAST(e + 1 AS DOUBLE)), 4)
               AS ewma
    FROM scanned
"""

# search_phrase_match: positional adjacency replay with the dedup
# normalize convention (trim + whitespace-collapse + lower, space split).
ORACLE_SQL["search_phrase_match"] = """
    WITH toks AS (
        SELECT doc_id AS doc, i.i - 1 AS pos, t[i.i] AS tok
        FROM (SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text),
                         '\\s+', ' ', 'g')), ' ') AS t
              FROM documents),
             LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
    ), led AS (
        SELECT doc, pos, tok,
               lead(tok, 1) OVER (PARTITION BY doc ORDER BY pos) AS n1
        FROM toks
    )
    SELECT doc, CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(pos) AS BIGINT) AS first_pos
    FROM led WHERE tok = 'batch' AND n1 = 'batch'
    GROUP BY doc
"""


# stats_mann_whitney: distinct-value average ranks (multiples of 0.5 —
# exact sums), tie-corrected z; every fractional literal CAST to DOUBLE.
ORACLE_SQL["stats_mann_whitney"] = """
    WITH oc AS (
        SELECT CAST(o.o_totalprice AS DOUBLE) AS v, c.c_mktsegment AS g
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o.o_totalprice IS NOT NULL
    ), at_v AS (
        SELECT v,
               sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS cb
        FROM oc GROUP BY v
    ), ranked AS (
        SELECT ca, cb, ca + cb AS cnt,
               coalesce(sum(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM at_v
    ), agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               sum(CAST(ca AS DOUBLE)
                   * (CAST(cum_before AS DOUBLE)
                      + (CAST(cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                        / CAST(2 AS DOUBLE))) AS r_a,
               sum(cnt * cnt * cnt - cnt) AS tie_term
        FROM ranked
    )
    SELECT n_a, n_b,
           r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE)
                 + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE) AS u_a,
           CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               / CAST(2 AS DOUBLE) AS mu_u,
           round((r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE)
                      + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE)
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    / CAST(2 AS DOUBLE))
                 / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        / CAST(12 AS DOUBLE)
                        * ((CAST(n_a + n_b AS DOUBLE) + CAST(1 AS DOUBLE))
                           - CAST(tie_term AS DOUBLE)
                             / (CAST(n_a + n_b AS DOUBLE)
                                * (CAST(n_a + n_b AS DOUBLE)
                                   - CAST(1 AS DOUBLE))))), 6) AS z,
           abs(round((r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE)
                      + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE)
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    / CAST(2 AS DOUBLE))
                 / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        / CAST(12 AS DOUBLE)
                        * ((CAST(n_a + n_b AS DOUBLE) + CAST(1 AS DOUBLE))
                           - CAST(tie_term AS DOUBLE)
                             / (CAST(n_a + n_b AS DOUBLE)
                                * (CAST(n_a + n_b AS DOUBLE)
                                   - CAST(1 AS DOUBLE))))), 6))
               > CAST(1.96 AS DOUBLE) AS reject_05
    FROM agg
"""

# agg_gini_concentration: rank-weighted DECIMAL sums (i·x stays exact),
# top-decile cut by descending rank with the same tie order.
ORACLE_SQL["agg_gini_concentration"] = """
    WITH per_key AS (
        SELECT o_custkey AS k,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT k, x,
               row_number() OVER (ORDER BY x ASC, k ASC) AS i,
               row_number() OVER (ORDER BY x DESC, k ASC) AS i_desc,
               count(*) OVER () AS n
        FROM per_key
    ), agg AS (
        SELECT CAST(max(n) AS BIGINT) AS n_keys,
               sum(x * i) AS s1,
               sum(x) AS st,
               sum(CASE WHEN i_desc <= greatest(1, CAST(floor(n / 10)
                        AS INT)) THEN x ELSE 0 END) AS top_x
        FROM ranked
    )
    SELECT n_keys,
           round(CAST(2 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / (CAST(n_keys AS DOUBLE) * CAST(st AS DOUBLE))
                 - (CAST(n_keys AS DOUBLE) + CAST(1 AS DOUBLE))
                   / CAST(n_keys AS DOUBLE), 6) AS gini,
           round(CAST(top_x AS DOUBLE) / CAST(st AS DOUBLE), 6)
               AS top_decile_share
    FROM agg
"""

# text_langid_confusion: the text_language_id replay grouped against
# the ground-truth label.
ORACLE_SQL["text_langid_confusion"] = """
    WITH s AS (
        SELECT lang,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('the','and','of','to','in','is','that','with'))) AS s_en,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('el','la','los','las','es','no','por','para'))) AS s_es,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('le','la','les','et','est','pas','pour','dans'))) AS s_fr,
               len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
        FROM documents
    ), pred AS (
        SELECT lang AS actual,
               CASE WHEN cjk > 0 THEN 'zh'
                    WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0
                        THEN 'und'
                    WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de
                        THEN 'fr'
                    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                    WHEN s_en >= s_de THEN 'en'
                    ELSE 'de' END AS predicted
        FROM s
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY actual, predicted
"""



# temporal_ohlc: ordered first/last aggregates over the (epoch_us,
# event_id) tuple order, DECIMAL-exact day totals.
ORACLE_SQL["temporal_ohlc"] = """
    SELECT event_type AS key, CAST(ts AS DATE) AS day,
           first(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id)
               AS open,
           max(CAST(value AS DOUBLE)) AS high,
           min(CAST(value AS DOUBLE)) AS low,
           last(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id)
               AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_total
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
"""

# events_autocorrelation: DECIMAL-exact mean, 9dp-per-term products,
# calendar-day (t + lag) equi-join — 'cr' because CROSS is reserved.
ORACLE_SQL["events_autocorrelation"] = f"""
    WITH {_DAILY_SERIES_CTE}, base AS (
        SELECT grp, t, v, CAST(v AS DECIMAL(18,6)) AS vd FROM daily
        WHERE v IS NOT NULL
    ), mean_t AS (
        SELECT grp,
               round(CAST(sum(vd) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
                   AS m
        FROM base GROUP BY grp
    ), dev AS (
        SELECT b.grp, b.t, b.v - m.m AS d
        FROM base b JOIN mean_t m USING (grp)
    ), denom AS (
        SELECT grp, sum(round(d * d, 9)) AS ss FROM dev GROUP BY grp
    ), lagt AS (
        SELECT grp, t, d, l.lag
        FROM dev, (SELECT unnest(range(1, 8)) AS lag) l
    ), pairs AS (
        SELECT a.grp, a.lag, a.d, b.d AS d2
        FROM lagt a JOIN dev b ON a.grp = b.grp
          AND b.t = a.t + CAST(a.lag AS INT)
    ), num AS (
        SELECT grp, lag, count(*) AS n_pairs,
               sum(round(d * d2, 9)) AS cr
        FROM pairs GROUP BY grp, lag
    )
    SELECT n.grp AS event_type, CAST(n.lag AS INT) AS lag,
           CAST(n.n_pairs AS BIGINT) AS n_pairs,
           round(n.cr / de.ss, 6) AS acf
    FROM num n JOIN denom de USING (grp)
"""

# stats_benford: integer-string first digit (decimal cents -> BIGINT ->
# VARCHAR), 9dp expected literals identical to the Spark map.
ORACLE_SQL["stats_benford"] = """
    WITH base AS (
        SELECT CAST(substr(CAST(CAST(CAST(CAST(o_totalprice
                   AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ), counts AS (
        SELECT digit, count(*) AS n FROM base GROUP BY digit
    ), tot AS (
        SELECT digit, n, sum(n) OVER () AS n_total FROM counts
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
               AS observed_frac,
           CASE digit WHEN 1 THEN CAST(0.301029996 AS DOUBLE) WHEN 2 THEN CAST(0.176091259 AS DOUBLE) WHEN 3 THEN CAST(0.124938737 AS DOUBLE) WHEN 4 THEN CAST(0.096910013 AS DOUBLE) WHEN 5 THEN CAST(0.079181246 AS DOUBLE) WHEN 6 THEN CAST(0.06694679 AS DOUBLE) WHEN 7 THEN CAST(0.057991947 AS DOUBLE) WHEN 8 THEN CAST(0.051152522 AS DOUBLE) WHEN 9 THEN CAST(0.045757491 AS DOUBLE) END AS expected_frac,
           round(CAST(n_total AS DOUBLE)
                 * (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                    - CASE digit WHEN 1 THEN CAST(0.301029996 AS DOUBLE) WHEN 2 THEN CAST(0.176091259 AS DOUBLE) WHEN 3 THEN CAST(0.124938737 AS DOUBLE) WHEN 4 THEN CAST(0.096910013 AS DOUBLE) WHEN 5 THEN CAST(0.079181246 AS DOUBLE) WHEN 6 THEN CAST(0.06694679 AS DOUBLE) WHEN 7 THEN CAST(0.057991947 AS DOUBLE) WHEN 8 THEN CAST(0.051152522 AS DOUBLE) WHEN 9 THEN CAST(0.045757491 AS DOUBLE) END)
                 * (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                    - CASE digit WHEN 1 THEN CAST(0.301029996 AS DOUBLE) WHEN 2 THEN CAST(0.176091259 AS DOUBLE) WHEN 3 THEN CAST(0.124938737 AS DOUBLE) WHEN 4 THEN CAST(0.096910013 AS DOUBLE) WHEN 5 THEN CAST(0.079181246 AS DOUBLE) WHEN 6 THEN CAST(0.06694679 AS DOUBLE) WHEN 7 THEN CAST(0.057991947 AS DOUBLE) WHEN 8 THEN CAST(0.051152522 AS DOUBLE) WHEN 9 THEN CAST(0.045757491 AS DOUBLE) END)
                 / CASE digit WHEN 1 THEN CAST(0.301029996 AS DOUBLE) WHEN 2 THEN CAST(0.176091259 AS DOUBLE) WHEN 3 THEN CAST(0.124938737 AS DOUBLE) WHEN 4 THEN CAST(0.096910013 AS DOUBLE) WHEN 5 THEN CAST(0.079181246 AS DOUBLE) WHEN 6 THEN CAST(0.06694679 AS DOUBLE) WHEN 7 THEN CAST(0.057991947 AS DOUBLE) WHEN 8 THEN CAST(0.051152522 AS DOUBLE) WHEN 9 THEN CAST(0.045757491 AS DOUBLE) END, 6)
               AS chi2_contrib
    FROM tot
"""

# graph_assortativity: exact integer moments over the undirected edge
# list, identical closed form.
ORACLE_SQL["graph_assortativity"] = """
    WITH e AS (
        SELECT DISTINCT least('c' || o.o_custkey, 'p' || l.l_partkey) AS a,
               greatest('c' || o.o_custkey, 'p' || l.l_partkey) AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), deg AS (
        SELECT n, count(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        GROUP BY n
    ), keyed AS (
        SELECT da.d AS da, db.d AS db
        FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
    ), agg AS (
        SELECT count(*) AS m, sum(da * db) AS s_jk,
               sum(da + db) AS s_sum,
               sum(da * da + db * db) AS s_sq
        FROM keyed
    ), nodes AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(m AS BIGINT) AS n_edges,
           round((CAST(s_jk AS DOUBLE) / CAST(m AS DOUBLE)
                  - (CAST(s_sum AS DOUBLE)
                     / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE)))
                    * (CAST(s_sum AS DOUBLE)
                       / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE))))
                 / (CAST(s_sq AS DOUBLE)
                    / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE))
                    - (CAST(s_sum AS DOUBLE)
                       / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE)))
                      * (CAST(s_sum AS DOUBLE)
                         / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE)))),
                 6) AS assortativity
    FROM agg CROSS JOIN nodes
"""

# corpus_dsir_weights: two Laplace unigram models over the source split,
# per-token 9dp lps (the scalar_log_probability replay, run twice).
ORACLE_SQL["corpus_dsir_weights"] = """
    WITH tok_t AS (
        SELECT t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
          AND source IN ('src0','src1','src2','src3','src4')
    ), model_t AS (SELECT token, count(*) AS n FROM tok_t GROUP BY token
    ), tot_t AS (
        SELECT CAST(sum(n) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom
        FROM model_t
    ), tok_r AS (
        SELECT t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
          AND source NOT IN ('src0','src1','src2','src3','src4')
    ), model_r AS (SELECT token, count(*) AS n FROM tok_r GROUP BY token
    ), tot_r AS (
        SELECT CAST(sum(n) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom
        FROM model_r
    ), names AS (
        SELECT doc_id, source, t.token
        FROM documents,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+'))
                 AS t(token)
        WHERE t.token <> ''
    ), lp_t AS (
        SELECT n.doc_id, n.source, CAST(count(*) AS BIGINT) AS n_tokens,
               round(sum(round(ln((CAST(coalesce(m.n, 0) AS DOUBLE)
                   + CAST(1 AS DOUBLE)) / tot.denom), 9)), 4) AS lp_target
        FROM names n
        LEFT JOIN model_t m ON n.token = m.token
        CROSS JOIN tot_t tot
        GROUP BY n.doc_id, n.source
    ), lp_r AS (
        SELECT n.doc_id, n.source,
               round(sum(round(ln((CAST(coalesce(m.n, 0) AS DOUBLE)
                   + CAST(1 AS DOUBLE)) / tot.denom), 9)), 4) AS lp_raw
        FROM names n
        LEFT JOIN model_r m ON n.token = m.token
        CROSS JOIN tot_r tot
        GROUP BY n.doc_id, n.source
    )
    SELECT t.doc_id, t.source, t.n_tokens, t.lp_target, r.lp_raw,
           round(t.lp_target - r.lp_raw, 4) + CAST(0 AS DOUBLE) AS weight,
           CAST(round(t.lp_target - r.lp_raw, 4) + CAST(0 AS DOUBLE)
                > CAST(0 AS DOUBLE) AS INT) AS prefers_target
    FROM lp_t t JOIN lp_r r ON t.doc_id = r.doc_id
        AND t.source = r.source
"""


# events_interval_coverage: the interval-merge replay — same exclusive-
# prefix cummax island rule over integer microseconds.
ORACLE_SQL["events_interval_coverage"] = """
    WITH iv AS (
        SELECT user_id AS k,
               epoch_us(ts) - 900000000 AS s,
               epoch_us(ts) + 900000000 AS e
        FROM events WHERE ts IS NOT NULL
    ), flagged AS (
        SELECT k, s, e,
               CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR s > max(e) OVER (PARTITION BY k ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS ni
        FROM iv
    ), isl AS (
        SELECT k, s, e,
               sum(ni) OVER (PARTITION BY k ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ), merged AS (
        SELECT k, island, min(s) AS i_start, max(e) AS i_end,
               count(*) AS n_src
        FROM isl GROUP BY k, island
    )
    SELECT k AS key, CAST(sum(n_src) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
           CAST(max(i_end - i_start) AS BIGINT) AS longest_island_us
    FROM merged GROUP BY k
"""


# graph_clustering_coeff: the triangle-count projection + exact
# three-way join triangles + degree join, 2T/(d(d-1)) rounded 6dp.
ORACLE_SQL["graph_clustering_coeff"] = """
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
    ), e AS (
        SELECT u, v FROM (
            SELECT a.c AS u, b.c AS v, count(*) AS shared
            FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
            GROUP BY 1, 2
        ) WHERE shared >= 2
    ), tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ), tcount AS (
        SELECT node, count(*) AS n_triangles FROM corners GROUP BY node
    ), deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY node
    )
    SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
               round(CAST(2 AS DOUBLE)
                     * CAST(coalesce(t.n_triangles, 0) AS DOUBLE)
                     / (CAST(d.degree AS DOUBLE)
                        * (CAST(d.degree AS DOUBLE) - CAST(1 AS DOUBLE))),
                     6)
           ELSE CAST(0 AS DOUBLE) END AS clustering_coeff
    FROM deg d LEFT JOIN tcount t ON d.node = t.node
"""

# text_heaps_fit: per-doc (ln N, ln V) points, zipf-style closed form
# over 6dp-rounded sums.
ORACLE_SQL["text_heaps_fit"] = """
    WITH arrs AS (
        SELECT list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS words
        FROM documents
    ), pts AS (
        SELECT ln(CAST(len(words) AS DOUBLE)) AS x,
               ln(CAST(len(list_distinct(words)) AS DOUBLE)) AS y
        FROM arrs WHERE len(words) >= 2
    ), sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
               round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
               round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx
        FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_docs,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS beta,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                 / k, 4) AS ln_k
    FROM sums
"""

# events_seasonal_decompose: DECIMAL centered-MA trend, double-folded
# modulo phase, per-phase DECIMAL seasonal means, 6dp residuals.
ORACLE_SQL["events_seasonal_decompose"] = f"""
    WITH {_DAILY_SERIES_CTE}, base AS (
        SELECT grp, t, v, CAST(v AS DECIMAL(18,6)) AS vd FROM daily
        WHERE v IS NOT NULL
    ), trended AS (
        SELECT grp, t, v,
               count(vd) OVER w AS nw,
               round(CAST(sum(vd) OVER w AS DOUBLE)
                     / CAST(7 AS DOUBLE), 9) AS trend
        FROM base
        WINDOW w AS (PARTITION BY grp ORDER BY t
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), full_rows AS (
        SELECT grp, t, v, trend,
               ((date_diff('day', DATE '2024-01-01', t) % 7) + 7) % 7
                   AS phase,
               v - trend AS detr
        FROM trended WHERE nw = 7
    ), seas AS (
        SELECT grp, phase,
               round(CAST(sum(CAST(detr AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS seasonal
        FROM full_rows GROUP BY grp, phase
    )
    SELECT f.grp AS event_type, f.t, f.v,
           CAST(f.phase AS INT) AS phase, f.trend, s.seasonal,
           round(f.detr - s.seasonal, 6) AS residual
    FROM full_rows f JOIN seas s ON f.grp = s.grp AND f.phase = s.phase
"""


# events_pattern_runs: strict-rise islands over the exact daily series.
ORACLE_SQL["events_pattern_runs"] = f"""
    WITH {_DAILY_SERIES_CTE}, flagged AS (
        SELECT grp, t, v,
               CASE WHEN v > lag(v) OVER (PARTITION BY grp ORDER BY t)
                    THEN 1 ELSE 0 END AS rising
        FROM daily
    ), isl AS (
        SELECT grp, t, rising,
               sum(1 - rising) OVER (PARTITION BY grp ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ), runs AS (
        SELECT grp, island, count(*) AS run_len
        FROM isl WHERE rising = 1 GROUP BY grp, island
    )
    SELECT grp AS event_type,
           CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_runs_ge3,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(sum(run_len) AS BIGINT) AS rising_days
    FROM runs GROUP BY grp
"""

# text_lexical_diversity: integer coincidence counts, one rounded
# division each for Simpson's D and TTR.
ORACLE_SQL["text_lexical_diversity"] = """
    WITH toks AS (
        SELECT source, t.tok FROM (
            SELECT source, list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9'']+'), x -> x <> '') AS ws
            FROM documents),
            LATERAL (SELECT unnest(ws) AS tok) t
    ), per_tok AS (
        SELECT source, tok, count(*) AS n FROM toks GROUP BY source, tok
    ), agg AS (
        SELECT source AS grp, sum(n) AS n_tokens, count(*) AS n_types,
               sum(n * (n - 1)) AS coincide
        FROM per_tok GROUP BY source
    )
    SELECT grp, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           round(CAST(coincide AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE)
                    * (CAST(n_tokens AS DOUBLE) - CAST(1 AS DOUBLE))),
                 6) AS simpson_d,
           round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS ttr
    FROM agg
"""


# ltr_train_weights / ltr_ndcg_eval: the judged-candidate CTE is
# GENERATED from the same query/pivot/stub constants the Spark
# operator uses (operators/ltr.py); moments replay the stats_ols
# DECIMAL(18,6) convention; the eval replays the reference's NDCG
# formula (compare_window_sizes.py:191-211) with the UNROUNDED
# closed-form weights — bit-identical across engines because every
# feature is an exact rational and every moment sum is DECIMAL-exact.
def _ltr_judged_cte() -> str:
    from collection_templates_spark.operators.ltr import (
        DEFAULT_LTR_QUERIES,
        NOISE_MOD,
        SAT_PIVOT,
    )

    branches = []
    for q in DEFAULT_LTR_QUERIES:
        terms = q.split()
        bigrams = [f" {a} {b} " for a, b in zip(terms, terms[1:])]
        mt = " + ".join(
            f"CAST(contains(padded, ' {t} ') AS INT)" for t in terms
        )
        mb = " + ".join(
            f"CAST(contains(padded, '{bg}') AS INT)" for bg in bigrams
        )
        branches.append(
            f"""SELECT * FROM (
                SELECT '{q}' AS query, doc_id, ({mt}) AS mt,
                       ({mb}) AS mb, nc, {len(terms)} AS ntt,
                       {len(bigrams)} AS ntb FROM ltr_base
            ) WHERE mt >= 1"""
        )
    unioned = "\n            UNION ALL\n            ".join(branches)
    return f"""ltr_base AS (
        SELECT doc_id, n_chars AS nc,
               ' ' || trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')) || ' ' AS padded
        FROM documents
    ), feats AS (
        SELECT query, doc_id,
               round((CAST(mt AS DOUBLE) / CAST(ntt AS DOUBLE)
                      + CAST(mb AS DOUBLE) / CAST(ntb AS DOUBLE))
                     / CAST(2 AS DOUBLE), 6) AS ov,
               round(CAST(nc AS DOUBLE)
                     / CAST(nc + {SAT_PIVOT} AS DOUBLE), 6) AS sat
        FROM ({unioned})
    ), jchars AS (
        SELECT query, doc_id, ov, sat,
               list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
                   string_split('ltrj:' || query || ':'
                                || CAST(doc_id AS VARCHAR), '')]) AS cs
        FROM feats
    ), judged AS (
        SELECT query, doc_id,
               CAST(floor(CAST(2 AS DOUBLE) * ov
                          + CAST(4 AS DOUBLE) * sat
                          + CAST((list_reduce(cs, (acc, x) ->
                                      (acc * 31 + x) % 2147483647)
                                  * 2147483648
                                  + list_reduce(cs, (acc, x) ->
                                      (acc * 37 + x) % 2147483647))
                                 % {NOISE_MOD} AS DOUBLE)
                            / CAST({NOISE_MOD} AS DOUBLE)) AS INT)
                   AS rel,
               ov, sat
        FROM jchars
    )"""


_LTR_MOMENTS_CTE = """m AS (
        SELECT count(*) AS n,
               sum(CAST(ov AS DECIMAL(18,6))) AS s1,
               sum(CAST(sat AS DECIMAL(18,6))) AS s2,
               sum(CAST(rel AS DECIMAL(18,6))) AS sy,
               sum(CAST(ov AS DECIMAL(18,6))
                   * CAST(ov AS DECIMAL(18,6))) AS s11,
               sum(CAST(sat AS DECIMAL(18,6))
                   * CAST(sat AS DECIMAL(18,6))) AS s22,
               sum(CAST(ov AS DECIMAL(18,6))
                   * CAST(sat AS DECIMAL(18,6))) AS s12,
               sum(CAST(ov AS DECIMAL(18,6))
                   * CAST(rel AS DECIMAL(18,6))) AS s1y,
               sum(CAST(sat AS DECIMAL(18,6))
                   * CAST(rel AS DECIMAL(18,6))) AS s2y,
               sum(CAST(rel AS DECIMAL(18,6))
                   * CAST(rel AS DECIMAL(18,6))) AS syy
        FROM judged
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
               CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
               CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
               CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
               CAST(syy AS DOUBLE) AS syy
        FROM m
    ), c AS (
        SELECT n, s1, s2, sy,
               s11 - s1 * s1 / n AS a11,
               s22 - s2 * s2 / n AS a22,
               s12 - s1 * s2 / n AS a12,
               s1y - s1 * sy / n AS c1,
               s2y - s2 * sy / n AS c2,
               syy - sy * sy / n AS sst
        FROM d
    ), b AS (
        SELECT n, s1, s2, sy, c1, c2, sst,
               (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
               (c2 * a11 - c1 * a12) / (a11 * a22 - a12 * a12) AS b2
        FROM c
    ), wts AS (
        SELECT n, c1, c2, sst, b1, b2,
               (sy - b1 * s1 - b2 * s2) / n AS b0
        FROM b
    )"""


ORACLE_SQL["ltr_train_weights"] = f"""
    WITH {_ltr_judged_cte()}, {_LTR_MOMENTS_CTE}
    SELECT CAST(n AS BIGINT) AS n,
           round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
           round((b1 * c1 + b2 * c2) / sst, 6) AS r2
    FROM wts
"""

ORACLE_SQL["ltr_ndcg_eval"] = f"""
    WITH {_ltr_judged_cte()}, {_LTR_MOMENTS_CTE}, scored AS (
        SELECT j.query, j.doc_id, j.rel,
               round(j.ov, 6) AS score_base,
               round(w.b0 + w.b1 * j.ov + w.b2 * j.sat, 6) AS score_ltr
        FROM judged j CROSS JOIN wts w
    ), ranked AS (
        SELECT query, rel,
               row_number() OVER (PARTITION BY query
                   ORDER BY score_base DESC, doc_id) AS rb,
               row_number() OVER (PARTITION BY query
                   ORDER BY score_ltr DESC, doc_id) AS rl,
               row_number() OVER (PARTITION BY query
                   ORDER BY rel DESC, doc_id) AS ri
        FROM scored
    ), agg AS (
        SELECT query, CAST(count(*) AS BIGINT) AS n_judged,
               sum(CASE WHEN rb <= 10 THEN
                       round(CAST(rel AS DOUBLE)
                             / log2(CAST(rb AS DOUBLE)
                                    + CAST(1 AS DOUBLE)), 9)
                   ELSE CAST(0 AS DOUBLE) END) AS dcg_base,
               sum(CASE WHEN rl <= 10 THEN
                       round(CAST(rel AS DOUBLE)
                             / log2(CAST(rl AS DOUBLE)
                                    + CAST(1 AS DOUBLE)), 9)
                   ELSE CAST(0 AS DOUBLE) END) AS dcg_ltr,
               sum(CASE WHEN ri <= 10 THEN
                       round(CAST(rel AS DOUBLE)
                             / log2(CAST(ri AS DOUBLE)
                                    + CAST(1 AS DOUBLE)), 9)
                   ELSE CAST(0 AS DOUBLE) END) AS idcg
        FROM ranked GROUP BY query
    )
    SELECT query, n_judged,
           round(CASE WHEN idcg > CAST(0 AS DOUBLE)
                      THEN dcg_base / idcg
                      ELSE CAST(0 AS DOUBLE) END, 6) AS ndcg_base,
           round(CASE WHEN idcg > CAST(0 AS DOUBLE)
                      THEN dcg_ltr / idcg
                      ELSE CAST(0 AS DOUBLE) END, 6) AS ndcg_ltr
    FROM agg
"""


_PAIRED_DAILY_CTE = """paired AS (
        SELECT a.t AS t, a.v AS x, b.v AS y
        FROM daily a JOIN daily b ON a.t = b.t
        WHERE a.grp = 'click' AND b.grp = 'purchase'
    )"""

# stats_spearman: the distinct-value average-rank tables (ranks are
# multiples of 0.5 — exact), DECIMAL(18,1) rank moments (width 37,
# inside both engines' 38-digit ceiling), Pearson formula on ranks.
ORACLE_SQL["stats_spearman"] = f"""
    WITH {_DAILY_SERIES_CTE}, {_PAIRED_DAILY_CTE}, xr AS (
        SELECT x,
               CAST(coalesce(sum(cnt) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                 / CAST(2 AS DOUBLE) AS r_x
        FROM (SELECT x, count(*) AS cnt FROM paired GROUP BY x)
    ), yr AS (
        SELECT y,
               CAST(coalesce(sum(cnt) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                 / CAST(2 AS DOUBLE) AS r_y
        FROM (SELECT y, count(*) AS cnt FROM paired GROUP BY y)
    ), ranked AS (
        SELECT CAST(r_x AS DECIMAL(18,1)) AS rx,
               CAST(r_y AS DECIMAL(18,1)) AS ry
        FROM paired p JOIN xr USING (x) JOIN yr USING (y)
    ), m AS (
        SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * ry) AS sxy, sum(rx * rx) AS sxx,
               sum(ry * ry) AS syy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / sqrt((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        * (CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                             / CAST(n AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS rho
    FROM m
"""

# stats_kendall: pair enumeration over an arbitrary total order (the
# counts depend only on the (x, y) multiset, so tie order is
# irrelevant), integer concordance/tie counts, tau-b ratio.
ORACLE_SQL["stats_kendall"] = f"""
    WITH {_DAILY_SERIES_CTE}, {_PAIRED_DAILY_CTE}, idx AS (
        SELECT x, y, row_number() OVER (ORDER BY x, y) AS i FROM paired
    ), pr AS (
        SELECT a.x - b.x AS dx, a.y - b.y AS dy
        FROM idx a JOIN idx b ON a.i < b.i
    ), agg AS (
        SELECT sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS d,
               sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS tx,
               sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS ty,
               sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS txy,
               count(*) AS n0
        FROM pr
    ), cnt AS (SELECT count(*) AS n FROM paired)
    SELECT CAST(cnt.n AS BIGINT) AS n,
           CAST(agg.c AS BIGINT) AS concordant,
           CAST(agg.d AS BIGINT) AS discordant,
           round(CAST(agg.c - agg.d AS DOUBLE)
                 / sqrt((CAST(n0 AS DOUBLE)
                         - CAST(tx + txy AS DOUBLE))
                        * (CAST(n0 AS DOUBLE)
                           - CAST(ty + txy AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS tau_b
    FROM agg, cnt
"""

# events_theil_sen: pairwise slopes (9dp before the median), exact
# interpolated medians, integer day offsets from the per-key first day.
ORACLE_SQL["events_theil_sen"] = f"""
    WITH {_DAILY_SERIES_CTE}, t0 AS (
        SELECT grp, min(t) AS t0 FROM daily GROUP BY grp
    ), days AS (
        SELECT d.grp,
               CAST(date_diff('day', t0.t0, d.t) AS DOUBLE) AS dd, d.v
        FROM daily d JOIN t0 ON d.grp = t0.grp
    ), pr AS (
        SELECT a.grp,
               round((b.v - a.v) / (b.dd - a.dd), 9) AS slope
        FROM days a JOIN days b ON a.grp = b.grp AND a.dd < b.dd
    ), slopes AS (
        SELECT grp, round(quantile_cont(slope, 0.5), 6) AS slope
        FROM pr GROUP BY grp
    )
    SELECT d.grp AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           min(s.slope) AS slope,
           round(quantile_cont(d.v - s.slope * d.dd, 0.5), 6)
               AS intercept
    FROM days d JOIN slopes s ON d.grp = s.grp
    GROUP BY d.grp
"""


def _bootstrap_ci_oracle_sql(b: int = 48, salt: str = "boot") -> str:
    salt_add = sum(ord(c) for c in salt)
    sums = "\n".join(
        f"               sum(CASE WHEN (h >> {j}) & 1 = 1 THEN vd END)"
        f" AS s{j},\n"
        f"               sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1"
        f" ELSE 0 END) AS c{j},"
        for j in range(b)
    )
    means = ",\n".join(
        f"               CASE WHEN c{j} > 0 THEN"
        f" round(CAST(s{j} AS DOUBLE) / CAST(c{j} AS DOUBLE), 9) END"
        for j in range(b)
    )
    return f"""
    WITH base AS (
        SELECT CAST(value AS DECIMAL(28,2)) AS vd,
               ((event_id * 2654435761 + {97531 + salt_add})
                % 2147483647) * 2147483648
               + ((event_id * 1566083941 + {13579 + salt_add})
                  % 2147483647) AS h
        FROM events WHERE value IS NOT NULL
    ), m AS (
        SELECT sum(vd) AS s_all, count(*) AS n_all,
{sums}
               1 AS one
        FROM base
    ), reps AS (
        SELECT s_all, n_all, unnest([
{means}
        ]) AS rep_mean
        FROM m
    ), q AS (
        SELECT s_all, n_all,
               round(quantile_cont(rep_mean, 0.025), 6) AS q_lo,
               round(quantile_cont(rep_mean, 0.975), 6) AS q_hi
        FROM reps GROUP BY s_all, n_all
    )
    SELECT CAST(n_all AS BIGINT) AS n, {b} AS b,
           round(CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
               AS mean,
           q_lo, q_hi,
           round(CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)
                 - sqrt(CAST(2 AS DOUBLE))
                   * (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)
                      - q_lo), 6) AS ci_lo,
           round(CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)
                 + sqrt(CAST(2 AS DOUBLE))
                   * (q_hi - CAST(s_all AS DOUBLE)
                      / CAST(n_all AS DOUBLE)), 6) AS ci_hi
    FROM q
"""


ORACLE_SQL["stats_bootstrap_ci"] = _bootstrap_ci_oracle_sql()


# stats_anova: DECIMAL group moments; the cross-group sum of
# s_g^2/n_g re-enters DECIMAL after a 6dp round (order-independent);
# F / eta^2 closed-form on the exact scalars.
ORACLE_SQL["stats_anova"] = """
    WITH base AS (
        SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE value IS NOT NULL
    ), grp AS (
        SELECT g, count(*) AS ng, sum(v) AS sg, sum(v * v) AS qg
        FROM base GROUP BY g
    ), m AS (
        SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s_all,
               sum(qg) AS q_all,
               sum(CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                              / CAST(ng AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS a
        FROM grp
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(CAST(a AS DOUBLE)
                 - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                   / CAST(n AS DOUBLE), 4)
           + CAST(0 AS DOUBLE) AS ss_between,
           round(CAST(q_all AS DOUBLE) - CAST(a AS DOUBLE), 4)
           + CAST(0 AS DOUBLE) AS ss_within,
           round(((CAST(a AS DOUBLE)
                   - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - CAST(1 AS DOUBLE)))
                 / ((CAST(q_all AS DOUBLE) - CAST(a AS DOUBLE))
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS f_stat,
           round((CAST(a AS DOUBLE)
                  - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / ((CAST(a AS DOUBLE)
                     - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    + (CAST(q_all AS DOUBLE) - CAST(a AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS eta_sq
    FROM m
"""

# stats_kruskal_wallis: pooled average ranks over the distinct-value
# table (multiples of 0.5), DECIMAL(28,1) rank sums, the same
# round-then-DECIMAL cross-group trick, integer tie term.
ORACLE_SQL["stats_kruskal_wallis"] = """
    WITH base AS (
        SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ), at_v AS (
        SELECT v, count(*) AS cnt FROM base GROUP BY v
    ), ranked AS (
        SELECT v,
               CAST(coalesce(sum(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                 / CAST(2 AS DOUBLE) AS avg_rank
        FROM at_v
    ), per_g AS (
        SELECT g, count(*) AS ng,
               sum(CAST(avg_rank AS DECIMAL(28,1))) AS rg
        FROM base JOIN ranked USING (v) GROUP BY g
    ), ties AS (
        SELECT sum(cnt * cnt * cnt - cnt) AS tie_term FROM at_v
    ), m AS (
        SELECT count(*) AS k, sum(ng) AS n,
               sum(CAST(round(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE)
                              / CAST(ng AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS a
        FROM per_g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(CAST(12 AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)))
                 * CAST(a AS DOUBLE)
                 - CAST(3 AS DOUBLE)
                   * (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)), 6)
           + CAST(0 AS DOUBLE) AS h_stat,
           round((CAST(12 AS DOUBLE)
                  / (CAST(n AS DOUBLE)
                     * (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)))
                  * CAST(a AS DOUBLE)
                  - CAST(3 AS DOUBLE)
                    * (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)))
                 / (CAST(1 AS DOUBLE)
                    - CAST(tie_term AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS h_corrected,
           CAST(k - 1 AS BIGINT) AS df
    FROM m, ties
"""

# stats_two_proportion: integer conversion counts per parity variant,
# one closed-form pooled z.
ORACLE_SQL["stats_two_proportion"] = """
    WITH u AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                   AS variant,
               max(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) = 1 AS converted
        FROM events GROUP BY user_id
    ), m AS (
        SELECT sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN variant = 'A' AND converted THEN 1
                        ELSE 0 END) AS x_a,
               sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN variant = 'B' AND converted THEN 1
                        ELSE 0 END) AS x_b
        FROM u
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
           round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS p_a,
           round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS p_b,
           round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt(CAST(x_a + x_b AS DOUBLE)
                        / CAST(n_a + n_b AS DOUBLE)
                        * (CAST(1 AS DOUBLE)
                           - CAST(x_a + x_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                        * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
                           + CAST(1 AS DOUBLE)
                             / CAST(n_b AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS z,
           abs(round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt(CAST(x_a + x_b AS DOUBLE)
                            / CAST(n_a + n_b AS DOUBLE)
                            * (CAST(1 AS DOUBLE)
                               - CAST(x_a + x_b AS DOUBLE)
                                 / CAST(n_a + n_b AS DOUBLE))
                            * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
                               + CAST(1 AS DOUBLE)
                                 / CAST(n_b AS DOUBLE))), 6)
               + CAST(0 AS DOUBLE))
           > CAST('1.96' AS DOUBLE) AS reject_05
    FROM m
"""

# events_cuped: per-user DECIMAL-exact pre/post spend, pooled theta
# from DECIMAL moments, per-variant adjusted means; theta and the
# variance-reduction ratio repeat across the two variant rows.
ORACLE_SQL["events_cuped"] = """
    WITH u AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                   AS variant,
               CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-11'
                   THEN CAST(value AS DECIMAL(18,2)) END),
                   0) AS DOUBLE) AS x,
               CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-11'
                   THEN CAST(value AS DECIMAL(18,2)) END),
                   0) AS DOUBLE) AS y
        FROM events GROUP BY user_id
    ), per_v AS (
        SELECT variant, count(*) AS n,
               sum(CAST(x AS DECIMAL(18,2))) AS sx,
               sum(CAST(y AS DECIMAL(18,2))) AS sy,
               sum(CAST(x AS DECIMAL(18,2))
                   * CAST(y AS DECIMAL(18,2))) AS sxy,
               sum(CAST(x AS DECIMAL(18,2))
                   * CAST(x AS DECIMAL(18,2))) AS sxx,
               sum(CAST(y AS DECIMAL(18,2))
                   * CAST(y AS DECIMAL(18,2))) AS syy
        FROM u GROUP BY variant
    ), pooled AS (
        SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
               sum(sxy) AS psxy, sum(sxx) AS psxx, sum(syy) AS psyy
        FROM per_v
    )
    SELECT variant, CAST(n AS BIGINT) AS n,
           round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS mean_y,
           round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(psxy AS DOUBLE)
                    - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)
                      / CAST(pn AS DOUBLE))
                   / (CAST(psxx AS DOUBLE)
                      - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)
                        / CAST(pn AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                      - CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE)), 6)
           + CAST(0 AS DOUBLE) AS mean_y_cuped,
           round((CAST(psxy AS DOUBLE)
                  - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)
                    / CAST(pn AS DOUBLE))
                 / (CAST(psxx AS DOUBLE)
                    - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)
                      / CAST(pn AS DOUBLE)), 6)
           + CAST(0 AS DOUBLE) AS theta,
           round((CAST(psxy AS DOUBLE)
                  - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)
                    / CAST(pn AS DOUBLE))
                 * (CAST(psxy AS DOUBLE)
                    - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)
                      / CAST(pn AS DOUBLE))
                 / ((CAST(psxx AS DOUBLE)
                     - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)
                       / CAST(pn AS DOUBLE))
                    * (CAST(psyy AS DOUBLE)
                       - CAST(psy AS DOUBLE) * CAST(psy AS DOUBLE)
                         / CAST(pn AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS var_reduction
    FROM per_v, pooled
"""

# events_kaplan_meier: integer risk sets via a suffix window over the
# distinct-duration table; product-limit as an ordered 12dp-rounded
# log-sum; the d == n_risk final row pinned to exactly 0.
ORACLE_SQL["events_kaplan_meier"] = """
    WITH signup AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS s_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), horizon AS (
        SELECT max(CAST(ts AS DATE)) AS h_day FROM events
    ), first_p AS (
        SELECT s.user_id, min(CAST(e.ts AS DATE)) AS p_day
        FROM signup s JOIN events e ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS DATE) >= s.s_day
        GROUP BY s.user_id
    ), u AS (
        SELECT date_diff('day', s.s_day,
                         coalesce(p.p_day, horizon.h_day)) AS dur,
               p.p_day IS NOT NULL AS obs
        FROM signup s LEFT JOIN first_p p ON s.user_id = p.user_id,
             horizon
    ), at_t AS (
        SELECT dur AS t,
               sum(CASE WHEN obs THEN 1 ELSE 0 END) AS d_events,
               sum(CASE WHEN obs THEN 0 ELSE 1 END) AS c_censored
        FROM u GROUP BY dur
    ), risked AS (
        SELECT t, d_events, c_censored,
               sum(d_events + c_censored) OVER (ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_risk
        FROM at_t
    ), lsum AS (
        SELECT t, d_events, c_censored, n_risk,
               sum(CASE WHEN d_events < n_risk THEN
                       round(ln(CAST(1 AS DOUBLE)
                                - CAST(d_events AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE)), 12)
                   ELSE CAST(0 AS DOUBLE) END) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lns
        FROM risked
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CAST(c_censored AS BIGINT) AS c_censored,
           CASE WHEN d_events = n_risk THEN CAST(0 AS DOUBLE)
                ELSE round(exp(lns), 6) + CAST(0 AS DOUBLE) END
               AS survival
    FROM lsum WHERE d_events > 0
"""


def _profile_events_oracle_sql() -> str:
    """Per-column UNION ALL replay of profiling.profile_table over
    events: integer counts + native min/max cast to double — dtype
    literals pinned to the loader's Spark schema."""
    spec = [
        ("event_id", "bigint", True, False),
        ("ts", "timestamp", False, False),
        ("user_id", "bigint", True, False),
        ("event_type", "string", False, True),
        ("value", "double", True, False),
        ("props", "string", False, True),
    ]
    parts = []
    for c, t, num, st in spec:
        mn = (
            f"CAST(min({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        )
        mx = (
            f"CAST(max({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        )
        ln = (
            f"CAST(min(length({c})) AS BIGINT)"
            if st
            else "CAST(NULL AS BIGINT)"
        )
        lx = (
            f"CAST(max(length({c})) AS BIGINT)"
            if st
            else "CAST(NULL AS BIGINT)"
        )
        parts.append(f"""
    SELECT '{c}' AS col_name, '{t}' AS dtype,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {ln} AS min_len, {lx} AS max_len
    FROM events""")
    return "\n    UNION ALL\n".join(parts)


ORACLE_SQL["profile_events"] = _profile_events_oracle_sql()

# graph_bfs_layers: the frontier loop replayed as a bounded recursive
# CTE — UNION-dedup'd (node, hop) walk, min-hop reduction, layer
# histogram.
ORACLE_SQL["graph_bfs_layers"] = """
    WITH RECURSIVE e AS (
        SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS s,
               'p' || CAST(l.l_partkey AS VARCHAR) AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
    ), und AS (
        SELECT DISTINCT s, d FROM (
            SELECT s, d FROM e UNION ALL SELECT d AS s, s AS d FROM e
        )
    ), seeds AS (
        SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
        FROM customer WHERE c_custkey % 500 = 1
    ), walk AS (
        SELECT node, 0 AS hop FROM seeds
        UNION
        SELECT u.d AS node, w.hop + 1 AS hop
        FROM walk w JOIN und u ON u.s = w.node
        WHERE w.hop < 4
    ), mind AS (
        SELECT node, min(hop) AS hop FROM walk GROUP BY node
    )
    SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
    FROM mind GROUP BY hop
"""


def _psi_drift_oracle_sql(
    n_bins: int = 16, lo: float = 0.0, hi: float = 500.0
) -> str:
    """Textual mirror of drift.psi_drift: same binning CTE as the JS
    oracle, +1/2-per-bin smoothing, per-bin contributions rounded 9dp
    and summed in DECIMAL (order-independent). Bins empty in BOTH
    slices are omitted in both engines (they never enter the
    histogram) — consistent, documented semantics."""
    width = (hi - lo) / n_bins
    return f"""
        WITH binned AS (
            SELECT event_type AS grp,
                   CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 'early' ELSE 'late' END AS split,
                   CAST(greatest(0, least({n_bins - 1},
                       floor((CAST(value AS DOUBLE) - CAST({lo!r} AS DOUBLE))
                             / CAST({width!r} AS DOUBLE)))) AS INT) AS bin
            FROM events WHERE value IS NOT NULL
        ), hist AS (
            SELECT grp, split, bin, count(*) AS n
            FROM binned GROUP BY 1, 2, 3
        ), tot AS (
            SELECT grp, split, sum(n) AS tot FROM hist GROUP BY 1, 2
        ), a AS (
            SELECT hist.grp, hist.bin, n AS n_pa, tot AS n_a
            FROM hist JOIN tot USING (grp, split) WHERE split = 'early'
        ), b AS (
            SELECT hist.grp, hist.bin, n AS n_pb, tot AS n_b
            FROM hist JOIN tot USING (grp, split) WHERE split = 'late'
        ), j AS (
            SELECT coalesce(a.grp, b.grp) AS grp, n_pa, n_pb, n_a, n_b
            FROM a FULL OUTER JOIN b
              ON a.grp = b.grp AND a.bin = b.bin
        ), w AS (
            SELECT grp, n_pa, n_pb,
                   max(n_a) OVER (PARTITION BY grp) AS na_g,
                   max(n_b) OVER (PARTITION BY grp) AS nb_g
            FROM j
        ), t AS (
            SELECT grp, na_g, nb_g,
                   CAST(round(
                       ((CAST(coalesce(n_pa, 0) AS DOUBLE)
                         + CAST(0.5 AS DOUBLE))
                        / (CAST(na_g AS DOUBLE)
                           + CAST({n_bins} AS DOUBLE)
                             / CAST(2 AS DOUBLE))
                        - (CAST(coalesce(n_pb, 0) AS DOUBLE)
                           + CAST(0.5 AS DOUBLE))
                          / (CAST(nb_g AS DOUBLE)
                             + CAST({n_bins} AS DOUBLE)
                               / CAST(2 AS DOUBLE)))
                       * ln(((CAST(coalesce(n_pa, 0) AS DOUBLE)
                              + CAST(0.5 AS DOUBLE))
                             / (CAST(na_g AS DOUBLE)
                                + CAST({n_bins} AS DOUBLE)
                                  / CAST(2 AS DOUBLE)))
                            / ((CAST(coalesce(n_pb, 0) AS DOUBLE)
                                + CAST(0.5 AS DOUBLE))
                               / (CAST(nb_g AS DOUBLE)
                                  + CAST({n_bins} AS DOUBLE)
                                    / CAST(2 AS DOUBLE)))), 9)
                       AS DECIMAL(38,9)) AS c
            FROM w
            WHERE na_g IS NOT NULL AND nb_g IS NOT NULL
        )
        SELECT grp, CAST(max(na_g) AS BIGINT) AS n_a,
               CAST(max(nb_g) AS BIGINT) AS n_b,
               round(CAST(sum(c) AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS psi
        FROM t GROUP BY grp
    """


ORACLE_SQL["drift_psi_events"] = _psi_drift_oracle_sql()

# quality_calibration: the quality_logistic score replay as a CTE,
# lang = 'en' labels, decile bins on the 6dp-rounded score, DECIMAL
# score sums.
ORACLE_SQL["quality_calibration"] = f"""
    WITH scores AS ({_quality_logistic_oracle_sql()}),
    lab AS (
        SELECT s.doc_id, s.score, d.lang = 'en' AS y
        FROM scores s JOIN documents d USING (doc_id)
    ), bb AS (
        SELECT least(CAST(floor(round(CAST(score AS DOUBLE), 6)
                                * CAST(10 AS DOUBLE)) AS INT), 9)
                   AS bin,
               CAST(round(CAST(score AS DOUBLE), 6) AS DECIMAL(18,6))
                   AS s,
               CASE WHEN y THEN 1 ELSE 0 END AS pos
        FROM lab WHERE score IS NOT NULL AND y IS NOT NULL
    ), g AS (
        SELECT bin, count(*) AS n, sum(s) AS ss, sum(pos) AS np
        FROM bb GROUP BY bin
    )
    SELECT bin, CAST(n AS BIGINT) AS n,
           round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS mean_score,
           round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS frac_positive,
           round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS gap
    FROM g
"""

# events_user_growth: per-(user, day) dedup + per-user first day,
# integer day counts, ordered cumulative window.
ORACLE_SQL["events_user_growth"] = """
    WITH pud AS (
        SELECT DISTINCT user_id AS uid, CAST(ts AS DATE) AS day
        FROM events
    ), fd AS (
        SELECT uid, min(day) AS first_day FROM pud GROUP BY uid
    ), daily AS (
        SELECT day, count(*) AS dau,
               sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                   AS new_users
        FROM pud JOIN fd USING (uid) GROUP BY day
    )
    SELECT day, CAST(dau AS BIGINT) AS dau,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_users
    FROM daily
"""


# privacy_k_anonymity: integer equivalence-class histogram +
# per-size min distinct-l — exact groupings, no floats.
ORACLE_SQL["privacy_k_anonymity"] = """
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
               count(DISTINCT c_acctbal) AS l_div
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(class_size * count(*) AS BIGINT) AS n_rows,
           CAST(min(l_div) AS BIGINT) AS min_l_diversity
    FROM classes GROUP BY class_size
"""

# skew_key_report: per-key count table, exact interpolated percentiles
# (quantile_cont ≡ Spark percentile), one-row reduce.
ORACLE_SQL["skew_key_report"] = """
    WITH counts AS (
        SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_count,
           round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
               AS top1_share,
           round(quantile_cont(n, CAST(0.5 AS DOUBLE)), 6)
               AS p50_count,
           round(quantile_cont(n, CAST(0.9 AS DOUBLE)), 6)
               AS p90_count,
           round(quantile_cont(n, CAST(0.99 AS DOUBLE)), 6)
               AS p99_count
    FROM counts
"""

# search_tfidf_cosine: the perplexity-family tokenization CTE, 9dp
# idf, DECIMAL-accumulated norms and dot products, cosine ratio with
# the (score DESC, doc_id ASC) total tie order.
ORACLE_SQL["search_tfidf_cosine"] = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS t
        FROM documents
    ), tok AS (
        SELECT doc_id AS doc, unnest(t) AS token FROM arrs
    ), tf AS (
        SELECT doc, token, count(*) AS tf FROM tok GROUP BY doc, token
    ), nd AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
    ), idf AS (
        SELECT token,
               round(ln((nd.n + CAST(1 AS DOUBLE))
                        / (CAST(count(*) AS DOUBLE)
                           + CAST(1 AS DOUBLE))), 9) AS idf
        FROM tf, nd GROUP BY token, nd.n
    ), w AS (
        SELECT doc, tf.token, CAST(tf AS DOUBLE) * idf AS w
        FROM tf JOIN idf USING (token)
    ), norms AS (
        SELECT doc,
               sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,6)))
                         AS DOUBLE)) AS norm_d
        FROM w GROUP BY doc
    ), qv AS (
        SELECT token, idf FROM idf
        WHERE token IN ('hash', 'join', 'spark')
    ), qn AS (
        SELECT sqrt(CAST(sum(CAST(round(idf * idf, 6)
                                  AS DECIMAL(38,6))) AS DOUBLE))
                   AS norm_q
        FROM qv
    ), dots AS (
        SELECT doc,
               sum(CAST(round(w.w * qv.idf, 9) AS DECIMAL(38,9)))
                   AS dot
        FROM w JOIN qv USING (token) GROUP BY doc
    ), scored AS (
        SELECT doc AS doc_id,
               round(CAST(dot AS DOUBLE) / (norm_d * norm_q), 6)
                   AS score
        FROM dots JOIN norms USING (doc), qn
    ), top AS (
        SELECT doc_id, score FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id ASC LIMIT 20
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                AS INT) AS rank,
           score
    FROM top
"""


# lineitem_pareto_abc: DECIMAL revenue totals, cumulative window over
# the total (value desc, key asc) order, 9dp share before the class
# compare, 3-row rollup.
ORACLE_SQL["lineitem_pareto_abc"] = """
    WITH per_key AS (
        SELECT l_partkey AS k,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS val
        FROM lineitem GROUP BY 1
    ), cum AS (
        SELECT val,
               sum(val) OVER (ORDER BY val DESC, k ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(val) OVER () AS tot
        FROM per_key
    ), classed AS (
        SELECT CASE
                 WHEN round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE),
                            9) <= CAST('0.8' AS DOUBLE) THEN 'A'
                 WHEN round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE),
                            9) <= CAST('0.95' AS DOUBLE) THEN 'B'
                 ELSE 'C' END AS abc_class,
               val, tot
        FROM cum
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys,
           round(CAST(sum(val) AS DOUBLE), 2) AS value,
           round(CAST(sum(val) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
               AS value_share
    FROM classed GROUP BY abc_class
"""

# ann_centroid_separation: 6dp per-dim centroid averages, label pair
# join on dim, DECIMAL-accumulated dot/norms, 6dp cosine.
ORACLE_SQL["ann_centroid_separation"] = """
    WITH cent AS (
        SELECT label AS lab, pos, round(avg(v), 6) AS c
        FROM (
            SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS v
            FROM embeddings, LATERAL (
                SELECT unnest(range(len(embedding))) AS i))
        GROUP BY label, pos
    ), pairs AS (
        SELECT a.lab AS label_a, b.lab AS label_b,
               a.c AS ca, b.c AS cb
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.lab < b.lab
    ), agg AS (
        SELECT label_a, label_b,
               sum(CAST(round(ca * cb, 9) AS DECIMAL(38,9))) AS dot,
               sum(CAST(round(ca * ca, 9) AS DECIMAL(38,9))) AS na,
               sum(CAST(round(cb * cb, 9) AS DECIMAL(38,9))) AS nb
        FROM pairs GROUP BY label_a, label_b
    )
    SELECT label_a, label_b,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))),
                 6)
           + CAST(0 AS DOUBLE) AS cosine
    FROM agg
"""


# events_rolling_median: trailing-7 ROWS-frame quantile_cont over the
# shared daily series (total order: day is unique per type).
ORACLE_SQL["events_rolling_median"] = f"""
    WITH {_DAILY_SERIES_CTE}
    SELECT grp AS event_type, t, v,
           round(quantile_cont(v, CAST('0.5' AS DOUBLE)) OVER (
               PARTITION BY grp ORDER BY t
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
           + CAST(0 AS DOUBLE) AS rolling_q
    FROM daily
"""

# events_cohort_ltv: Monday-based week cohorts, DECIMAL revenue,
# cumulative window over (cohort, age).
ORACLE_SQL["events_cohort_ltv"] = """
    WITH signup AS (
        SELECT user_id AS uid, min(CAST(ts AS DATE)) AS s_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), coh AS (
        SELECT uid, s_day,
               CAST(date_trunc('week', s_day) AS DATE) AS cohort
        FROM signup
    ), sizes AS (
        SELECT cohort, count(*) AS n_users FROM coh GROUP BY cohort
    ), rev AS (
        SELECT c.cohort,
               date_diff('day', c.s_day, CAST(e.ts AS DATE)) AS age_days,
               sum(CAST(e.value AS DECIMAL(18,2))) AS rev_day
        FROM events e JOIN coh c ON e.user_id = c.uid
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS DATE) >= c.s_day
        GROUP BY 1, 2
    ), cum AS (
        SELECT cohort, age_days,
               sum(rev_day) OVER (PARTITION BY cohort ORDER BY age_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS revenue_cum
        FROM rev
    )
    SELECT cum.cohort, CAST(age_days AS BIGINT) AS age_days,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(revenue_cum AS DOUBLE) AS revenue_cum,
           round(CAST(revenue_cum AS DOUBLE)
                 / CAST(n_users AS DOUBLE), 6) AS ltv_per_user
    FROM cum JOIN sizes ON cum.cohort = sizes.cohort
"""

# sketch_quantile_merge: the oracle replays the DDSketch binning
# (ceil of the 6dp-rounded ln ratio — the round-before-discretize rule),
# the count-addition merge (trivially the same as one pass in SQL), the
# rank rule floor(q*(n-1))+1, and the distinct-value exact order
# statistic. gamma = 51/49 is written as the same double division in
# both engines; pow() 1-ulp scatter is absorbed by the 4dp round.
ORACLE_SQL["sketch_quantile_merge"] = """
    WITH v AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE value IS NOT NULL
    ), g AS (
        SELECT CAST(51 AS DOUBLE) / CAST(49 AS DOUBLE) AS gamma
    ), bins AS (
        SELECT CAST(CASE WHEN v <= 0 THEN -2147483648
                    ELSE ceil(round(ln(v) / ln(gamma), 6)) END AS INT)
                   AS bin,
               count(*) AS cnt
        FROM v, g GROUP BY 1
    ), cum AS (
        SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM bins
    ), n AS (
        SELECT count(*) AS n FROM v
    ), tgt AS (
        SELECT CAST(q AS DOUBLE) AS q,
               CAST(floor(CAST(q AS DOUBLE)
                          * (CAST(n AS DOUBLE) - 1)) + 1 AS BIGINT)
                   AS rank
        FROM (SELECT unnest([0.5, 0.9, 0.99]) AS q), n
    ), est AS (
        SELECT q, min(bin) AS bin
        FROM tgt JOIN cum ON cum.cum >= tgt.rank GROUP BY q
    ), estv AS (
        SELECT q,
               round(CASE WHEN bin = -2147483648 THEN CAST(0 AS DOUBLE)
                     ELSE CAST(2 AS DOUBLE) * pow(gamma, bin)
                          / (gamma + CAST(1 AS DOUBLE)) END, 4) AS est_q
        FROM est, g
    ), vals AS (
        SELECT v, count(*) AS c FROM v GROUP BY v
    ), vcum AS (
        SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vals
    ), exact AS (
        SELECT q, min(v) AS exact_q
        FROM tgt JOIN vcum ON vcum.cum >= tgt.rank GROUP BY q
    )
    SELECT estv.q AS q, est_q, round(exact_q, 4) AS exact_q,
           round(abs(est_q - exact_q) / exact_q, 6) AS rel_err,
           round(abs(est_q - exact_q) / exact_q, 6)
               <= CAST(0.02 AS DOUBLE) AS within_alpha
    FROM estv JOIN exact ON estv.q = exact.q
    ORDER BY q
"""

# stats_levene: group medians via quantile_cont (≡ percentile on the
# same doubles), z = 6dp-rounded |v − med| as DECIMAL(18,6), the
# round-then-DECIMAL cross-group trick from the ANOVA oracle.
ORACLE_SQL["stats_levene"] = """
    WITH base AS (
        SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ), med AS (
        SELECT g, quantile_cont(v, 0.5) AS med FROM base GROUP BY g
    ), zt AS (
        SELECT base.g,
               CAST(round(abs(v - med), 6) AS DECIMAL(18,6)) AS z
        FROM base JOIN med ON base.g = med.g
    ), grp AS (
        SELECT g, count(*) AS ng, sum(z) AS sg,
               sum(CAST(z * z AS DECIMAL(30,12))) AS qg
        FROM zt GROUP BY g
    ), m AS (
        SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s_all,
               sum(qg) AS q_all,
               sum(CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                              / CAST(ng AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS a
        FROM grp
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(((CAST(a AS DOUBLE)
                   - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - CAST(1 AS DOUBLE)))
                 / ((CAST(q_all AS DOUBLE) - CAST(a AS DOUBLE))
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS w_stat,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(n - k AS BIGINT) AS df2
    FROM m
"""

# stats_jarque_bera: the same per-power DECIMAL width ladder
# (9,2 → 12,4 → 16,6 → 20,8) and the same closed-form central-moment
# expressions (m2^1.5 written as m2*sqrt(m2) — sqrt is IEEE-exact in
# both engines, pow is not).
ORACLE_SQL["stats_jarque_bera"] = """
    WITH base AS (
        -- one operand of every multiply is widened past 18 digits so
        -- DuckDB runs the product in int128 (an int64 DECIMAL(12,4)
        -- square overflows); the CAST back to the ladder width keeps
        -- the VALUES identical to Spark's (both exact)
        SELECT CAST(value AS DECIMAL(9,2)) AS v1,
               CAST(CAST(value AS DECIMAL(20,2))
                    * CAST(value AS DECIMAL(18,2)) AS DECIMAL(12,4)) AS v2
        FROM events WHERE value IS NOT NULL
    ), pw AS (
        SELECT v1, v2,
               CAST(CAST(v2 AS DECIMAL(20,4)) * v1 AS DECIMAL(16,6))
                   AS v3,
               CAST(CAST(v2 AS DECIMAL(20,4)) * CAST(v2 AS DECIMAL(18,4))
                    AS DECIMAL(20,8)) AS v4
        FROM base
    ), s AS (
        SELECT count(*) AS n, sum(v1) AS s1, sum(v2) AS s2,
               sum(v3) AS s3, sum(v4) AS s4
        FROM pw
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
               CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
               CAST(s4 AS DOUBLE) AS s4
        FROM s
    ), mom AS (
        SELECT n,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - CAST(3 AS DOUBLE) * (s1 / n) * (s2 / n)
                   + CAST(2 AS DOUBLE) * (s1 / n) * (s1 / n) * (s1 / n)
                   AS m3,
               s4 / n - CAST(4 AS DOUBLE) * (s1 / n) * (s3 / n)
                   + CAST(6 AS DOUBLE) * (s1 / n) * (s1 / n) * (s2 / n)
                   - CAST(3 AS DOUBLE) * (s1 / n) * (s1 / n)
                     * (s1 / n) * (s1 / n) AS m4
        FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(m3 / (m2 * sqrt(m2)), 6) + CAST(0 AS DOUBLE)
               AS skewness,
           round(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS ex_kurtosis,
           round(n / CAST(6 AS DOUBLE)
                 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - CAST(3 AS DOUBLE))
                      * (m4 / (m2 * m2) - CAST(3 AS DOUBLE))
                      / CAST(4 AS DOUBLE)), 4)
           + CAST(0 AS DOUBLE) AS jb_stat
    FROM mom
"""

# stats_grubbs: DECIMAL moments then arg-max deviation, tie-broken by
# larger value (ORDER BY dev DESC, v DESC ≡ max_by struct).
ORACLE_SQL["stats_grubbs"] = """
    WITH base AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v,
               CAST(o_totalprice AS DECIMAL(18,2)) AS vd
        FROM orders WHERE o_totalprice IS NOT NULL
    ), m AS (
        SELECT count(*) AS n, sum(vd) AS s1,
               sum(CAST(vd * vd AS DECIMAL(38,4))) AS s2
        FROM base
    ), scal AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))) AS sd
        FROM m
    ), dev AS (
        SELECT n, mean, sd, v, abs(v - mean) AS d
        FROM base, scal
    ), top AS (
        SELECT n, mean, sd, v AS outlier_value, d AS max_dev
        FROM dev ORDER BY d DESC, v DESC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(mean, 6) + CAST(0 AS DOUBLE) AS mean,
           round(sd, 6) + CAST(0 AS DOUBLE) AS sd,
           outlier_value,
           round(max_dev / sd, 6) + CAST(0 AS DOUBLE) AS g_stat
    FROM top
"""


def _permutation_oracle_sql(b: int = 62, salt: str = "perm") -> str:
    salt_add = sum(ord(c) for c in salt)
    sums = "\n".join(
        f"               sum(CASE WHEN (h >> {j}) & 1 = 1 THEN vd END)"
        f" AS s{j},\n"
        f"               sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1"
        f" ELSE 0 END) AS c{j},"
        for j in range(b)
    )
    diffs = ",\n".join(
        f"               round(CAST(s{j} AS DOUBLE) / CAST(c{j} AS"
        f" DOUBLE)\n"
        f"                 - CAST(s_all - s{j} AS DOUBLE)"
        f" / CAST(n_all - c{j} AS DOUBLE), 9)"
        for j in range(b)
    )
    return f"""
    WITH base AS (
        SELECT CAST(value AS DECIMAL(28,2)) AS vd,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
               ((event_id * 2654435761 + {97531 + salt_add})
                % 2147483647) * 2147483648
               + ((event_id * 1566083941 + {13579 + salt_add})
                  % 2147483647) AS h
        FROM events WHERE value IS NOT NULL
    ), m AS (
        SELECT sum(vd) AS s_all, count(*) AS n_all,
               sum(CASE WHEN g = 'A' THEN vd END) AS s_a,
               sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS c_a,
{sums}
               1 AS one
        FROM base
    ), obs AS (
        SELECT *, round(CAST(s_a AS DOUBLE) / CAST(c_a AS DOUBLE)
                   - CAST(s_all - s_a AS DOUBLE)
                     / CAST(n_all - c_a AS DOUBLE), 9) AS d_obs
        FROM m
    ), reps AS (
        SELECT n_all, d_obs, unnest([
{diffs}
        ]) AS d_rep
        FROM obs
    ), agg AS (
        SELECT n_all, d_obs,
               sum(CASE WHEN abs(d_rep) >= abs(d_obs) THEN 1
                        ELSE 0 END) AS n_ext
        FROM reps GROUP BY n_all, d_obs
    )
    SELECT CAST(n_all AS BIGINT) AS n, {b} AS b,
           d_obs + CAST(0 AS DOUBLE) AS diff_obs,
           CAST(n_ext AS BIGINT) AS n_extreme,
           round((CAST(n_ext AS DOUBLE) + CAST(1 AS DOUBLE))
                 / CAST({b + 1} AS DOUBLE), 6) AS p_value
    FROM agg
"""


ORACLE_SQL["stats_permutation"] = _permutation_oracle_sql()

# events_poisson_rate: integer purchase counts / active-day exposures
# per parity variant, one closed-form z.
ORACLE_SQL["events_poisson_rate"] = """
    WITH u AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                   AS variant,
               sum(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS k,
               count(DISTINCT CAST(ts AS DATE)) AS t
        FROM events GROUP BY user_id
    ), m AS (
        SELECT sum(CASE WHEN variant = 'A' THEN k END) AS k_a,
               sum(CASE WHEN variant = 'A' THEN t END) AS t_a,
               sum(CASE WHEN variant = 'B' THEN k END) AS k_b,
               sum(CASE WHEN variant = 'B' THEN t END) AS t_b
        FROM u
    )
    SELECT CAST(k_a AS BIGINT) AS k_a, CAST(t_a AS BIGINT) AS t_a,
           CAST(k_b AS BIGINT) AS k_b, CAST(t_b AS BIGINT) AS t_b,
           round(CAST(k_a AS DOUBLE) / CAST(t_a AS DOUBLE), 6)
               AS rate_a,
           round(CAST(k_b AS DOUBLE) / CAST(t_b AS DOUBLE), 6)
               AS rate_b,
           round((CAST(k_a AS DOUBLE) / CAST(t_a AS DOUBLE)
                  - CAST(k_b AS DOUBLE) / CAST(t_b AS DOUBLE))
                 / sqrt(CAST(k_a AS DOUBLE)
                        / (CAST(t_a AS DOUBLE) * CAST(t_a AS DOUBLE))
                        + CAST(k_b AS DOUBLE)
                          / (CAST(t_b AS DOUBLE)
                             * CAST(t_b AS DOUBLE))), 6)
           + CAST(0 AS DOUBLE) AS z
    FROM m
"""

# feature_mutual_information: integer contingency cells per feature,
# each ln term rounded 9dp then DECIMAL-summed (the PSI trick), NMI
# from the same-machinery marginal entropies.
ORACLE_SQL["feature_mutual_information"] = """
    WITH users AS (
        SELECT user_id, count(*) AS n_events,
               sum(CAST(value AS DECIMAL(18,2))) AS total,
               count(DISTINCT event_type) AS n_types,
               max(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), feats AS (
        SELECT 'activity_bucket' AS f,
               CAST(least(floor(n_events / 10), 12) AS VARCHAR) AS x,
               CAST(label AS VARCHAR) AS y
        FROM users
        UNION ALL
        SELECT 'spend_bucket' AS f,
               CAST(least(floor(CAST(total AS DOUBLE)
                                / CAST(500 AS DOUBLE)), 9)
                    AS VARCHAR) AS x,
               CAST(label AS VARCHAR) AS y
        FROM users
        UNION ALL
        SELECT 'type_breadth' AS f, CAST(n_types AS VARCHAR) AS x,
               CAST(label AS VARCHAR) AS y
        FROM users
    ), cells AS (
        SELECT f, x, y, count(*) AS nxy FROM feats GROUP BY f, x, y
    ), mx AS (
        SELECT f, x, sum(nxy) AS nx FROM cells GROUP BY f, x
    ), my AS (
        SELECT f, y, sum(nxy) AS ny FROM cells GROUP BY f, y
    ), nt AS (
        SELECT f, sum(nxy) AS nn FROM cells GROUP BY f
    ), mi AS (
        SELECT c.f,
               sum(CAST(round(CAST(nxy AS DOUBLE) / CAST(nn AS DOUBLE)
                        * ln(CAST(nn AS DOUBLE) * CAST(nxy AS DOUBLE)
                             / (CAST(nx AS DOUBLE)
                                * CAST(ny AS DOUBLE))), 9)
                        AS DECIMAL(38,9))) AS mi_d
        FROM cells c
        JOIN mx ON c.f = mx.f AND c.x = mx.x
        JOIN my ON c.f = my.f AND c.y = my.y
        JOIN nt ON c.f = nt.f
        GROUP BY c.f
    ), hx AS (
        SELECT mx.f,
               sum(CAST(round(CAST(nx AS DOUBLE) / CAST(nn AS DOUBLE)
                        * ln(CAST(nn AS DOUBLE) / CAST(nx AS DOUBLE)),
                        9) AS DECIMAL(38,9))) AS h_nx,
               count(*) AS k_nx
        FROM mx JOIN nt ON mx.f = nt.f GROUP BY mx.f
    ), hy AS (
        SELECT my.f,
               sum(CAST(round(CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE)
                        * ln(CAST(nn AS DOUBLE) / CAST(ny AS DOUBLE)),
                        9) AS DECIMAL(38,9))) AS h_ny,
               count(*) AS k_ny
        FROM my JOIN nt ON my.f = nt.f GROUP BY my.f
    )
    SELECT mi.f AS feature, CAST(nn AS BIGINT) AS n,
           CAST(k_nx AS BIGINT) AS k_x, CAST(k_ny AS BIGINT) AS k_y,
           round(CAST(mi_d AS DOUBLE), 6) AS mi_nats,
           round(CAST(mi_d AS DOUBLE)
                 / sqrt(CAST(h_nx AS DOUBLE) * CAST(h_ny AS DOUBLE)),
                 6)
           + CAST(0 AS DOUBLE) AS nmi
    FROM mi JOIN hx ON mi.f = hx.f JOIN hy ON mi.f = hy.f
    JOIN nt ON mi.f = nt.f
    ORDER BY feature
"""


def _sssp_oracle_sql(max_hops: int = 4) -> str:
    """Chained full-relaxation CTEs ≡ the frontier-pruned Bellman–Ford
    loop: after sweep k both hold the exact ≤k-edge shortest
    distances (integer weights — no float min anywhere)."""
    hops = ""
    prev = "d0"
    for k in range(1, max_hops + 1):
        hops += f""", d{k} AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.d AS node, {prev}.dist + e.w AS dist
            FROM {prev} JOIN e ON {prev}.node = e.s
        ) GROUP BY node
    )"""
        prev = f"d{k}"
    return f"""
    WITH e0 AS (
        SELECT concat('c', o_custkey) AS s,
               concat('p', l_partkey) AS d,
               min(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1, 2
    ), e AS (
        SELECT s, d, min(w) AS w FROM (
            SELECT s, d, w FROM e0
            UNION ALL
            SELECT d AS s, s AS d, w FROM e0
        ) GROUP BY s, d
    ), d0 AS (
        SELECT concat('c', c_custkey) AS node, CAST(0 AS BIGINT) AS dist
        FROM customer WHERE c_custkey % 500 = 1
    ){hops}
    SELECT CAST(floor(dist / 5) AS BIGINT) AS band,
           count(*) AS n_nodes,
           min(dist) AS min_dist, max(dist) AS max_dist
    FROM {prev} GROUP BY band ORDER BY band
"""


ORACLE_SQL["graph_shortest_paths"] = _sssp_oracle_sql()

# text_ngram_novelty: same tokenize/shingle CTEs as the jaccard oracle,
# integer dfs, per-doc ratio rounded 9dp then DECIMAL-summed per source.
ORACLE_SQL["text_ngram_novelty"] = """
    WITH toks AS (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                            'g')), ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(t[i:i+2], ' ') AS s
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
        WHERE len(t) >= 3
    ), dfreq AS (
        SELECT s, count(*) AS df FROM sh GROUP BY s
    ), per_doc AS (
        SELECT doc_id, source, count(*) AS n_sh,
               sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_uni
        FROM sh JOIN dfreq USING (s) GROUP BY 1, 2
    ), nov AS (
        SELECT source,
               round(CAST(n_uni AS DOUBLE) / CAST(n_sh AS DOUBLE), 9)
                   AS nv
        FROM per_doc
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(nv AS DECIMAL(38,9))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_novelty,
           CAST(sum(CASE WHEN nv < CAST(0.2 AS DOUBLE) THEN 1
                         ELSE 0 END) AS BIGINT) AS n_low_novelty
    FROM nov GROUP BY source ORDER BY source
"""

# temporal_downsample_lttb: same daily series, row_number x, bucket
# averages via lag/lead over the bucket table, 6dp-rounded area with
# (area DESC, x ASC) pick; boundary buckets keep first/last point via
# the same 1e18±x key trick as the Spark side.
ORACLE_SQL["temporal_downsample_lttb"] = """
    WITH daily AS (
        SELECT event_type AS grp, CAST(ts AS DATE) AS ord,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), pts AS (
        SELECT grp, ord, v,
               CAST(row_number() OVER (PARTITION BY grp ORDER BY ord)
                    AS DOUBLE) AS x
        FROM daily
    ), pb AS (
        SELECT *, CAST(floor((x - 1) / 10) AS BIGINT) AS bucket FROM pts
    ), bstats AS (
        SELECT grp, bucket, avg(x) AS bx, avg(v) AS by_
        FROM pb GROUP BY grp, bucket
    ), nb AS (
        SELECT grp, bucket,
               lag(bx) OVER (PARTITION BY grp ORDER BY bucket) AS xa,
               lag(by_) OVER (PARTITION BY grp ORDER BY bucket) AS ya,
               lead(bx) OVER (PARTITION BY grp ORDER BY bucket) AS xc,
               lead(by_) OVER (PARTITION BY grp ORDER BY bucket) AS yc
        FROM bstats
    ), j AS (
        SELECT pb.*, xa, ya, xc, yc,
               CASE WHEN xa IS NULL THEN -x
                    WHEN xc IS NULL THEN x
               ELSE round(abs((xa - xc) * (v - ya)
                              - (xa - x) * (ya - yc)), 6) END AS key
        FROM pb JOIN nb ON pb.grp = nb.grp AND pb.bucket = nb.bucket
    ), ranked AS (
        SELECT grp, ord, v, bucket,
               row_number() OVER (PARTITION BY grp, bucket
                   ORDER BY key DESC, x ASC) AS rn
        FROM j
    )
    SELECT grp AS event_type, ord, v, bucket
    FROM ranked WHERE rn = 1 ORDER BY event_type, ord
"""

# ltr_rank_metrics: same judged/weights CTEs as the ndcg oracle, then
# binary relevance (rel >= 4), total-ordered ranks, integer-count
# metrics; AP terms rounded 9dp and DECIMAL-summed.
ORACLE_SQL["ltr_rank_metrics"] = f"""
    WITH {_ltr_judged_cte()}, {_LTR_MOMENTS_CTE}, scored AS (
        SELECT j.query, j.doc_id,
               CASE WHEN j.rel >= 4 THEN 1 ELSE 0 END AS is_rel,
               round(w.b0 + w.b1 * j.ov + w.b2 * j.sat, 6) AS score
        FROM judged j CROSS JOIN wts w
    ), ranked AS (
        SELECT query, is_rel,
               row_number() OVER (PARTITION BY query
                   ORDER BY score DESC, doc_id) AS r,
               sum(is_rel) OVER (PARTITION BY query
                   ORDER BY score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_rel
        FROM scored
    ), agg AS (
        SELECT query, count(*) AS n_judged, sum(is_rel) AS n_rel,
               min(CASE WHEN is_rel = 1 AND r <= 10 THEN r END)
                   AS first_rel,
               sum(CASE WHEN r <= 5 THEN is_rel ELSE 0 END) AS rel_at_5,
               sum(CASE WHEN r <= 10 THEN is_rel ELSE 0 END) AS rel_at_k,
               sum(CASE WHEN is_rel = 1 AND r <= 10 THEN
                       CAST(round(CAST(cum_rel AS DOUBLE)
                                  / CAST(r AS DOUBLE), 9)
                            AS DECIMAL(38,9)) END) AS ap_sum
        FROM ranked GROUP BY query
    )
    SELECT query, CAST(n_judged AS BIGINT) AS n_judged,
           CAST(n_rel AS BIGINT) AS n_rel,
           round(coalesce(CAST(1 AS DOUBLE)
                          / CAST(first_rel AS DOUBLE),
                          CAST(0 AS DOUBLE)), 6) AS mrr,
           round(CAST(rel_at_5 AS DOUBLE) / CAST(5 AS DOUBLE), 6)
               AS p_at_5,
           round(CASE WHEN n_rel > 0
                      THEN CAST(rel_at_k AS DOUBLE)
                           / CAST(n_rel AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END, 6) AS recall_at_k,
           round(CASE WHEN n_rel > 0
                      THEN coalesce(CAST(ap_sum AS DOUBLE),
                                    CAST(0 AS DOUBLE))
                           / least(CAST(n_rel AS DOUBLE),
                                   CAST(10 AS DOUBLE))
                      ELSE CAST(0 AS DOUBLE) END, 6) AS ap_at_k
    FROM agg
"""

# stats_srm_check: integer counts, closed-form 1-df chi-square GOF
# against the designed 50/50 split, 3.841 critical literal.
ORACLE_SQL["stats_srm_check"] = """
    WITH m AS (
        SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b
        FROM events
    ), d AS (
        SELECT n_a, n_b,
               CAST(n_a + n_b AS DOUBLE) * CAST(0.5 AS DOUBLE) AS ea,
               CAST(n_a + n_b AS DOUBLE)
                   * (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) AS eb
        FROM m
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(ea, 4) AS expected_a,
           round((CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea)
                 / ea
                 + (CAST(n_b AS DOUBLE) - eb)
                   * (CAST(n_b AS DOUBLE) - eb) / eb, 6)
           + CAST(0 AS DOUBLE) AS chi2,
           round((CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea)
                 / ea
                 + (CAST(n_b AS DOUBLE) - eb)
                   * (CAST(n_b AS DOUBLE) - eb) / eb, 6)
               > CAST(3.841 AS DOUBLE) AS srm_flag
    FROM d
"""

# stats_power_analysis: DECIMAL moments, closed-form n per arm with the
# (1.959964 + 0.841621)^2 literal precomputed in Python on both sides.
ORACLE_SQL["stats_power_analysis"] = f"""
    WITH m AS (
        SELECT count(*) AS n, sum(CAST(value AS DECIMAL(28,2))) AS s1,
               sum(CAST(CAST(value AS DECIMAL(28,2))
                        * CAST(value AS DECIMAL(18,2))
                        AS DECIMAL(38,4))) AS s2
        FROM events WHERE value IS NOT NULL
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
               CAST(s2 AS DOUBLE) AS s2
        FROM m
    ), e AS (
        SELECT n, s1 / n AS mean,
               (s2 - s1 * s1 / n) / (n - CAST(1 AS DOUBLE)) AS var
        FROM d
    )
    SELECT CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
           round(sqrt(var), 6) AS sd,
           round(CAST(0.05 AS DOUBLE) * mean, 6) AS delta_abs,
           CAST(ceil(round(CAST(2 AS DOUBLE) * var
                           * CAST({(1.959964 + 0.841621) ** 2!r} AS DOUBLE)
                           / ((CAST(0.05 AS DOUBLE) * mean)
                              * (CAST(0.05 AS DOUBLE) * mean)), 6))
                AS BIGINT) AS n_per_arm
    FROM e
"""

# stats_tost: per-variant DECIMAL moments, two one-sided Welch z's vs
# the 1.644854 critical literal.
ORACLE_SQL["stats_tost"] = """
    WITH base AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
               CAST(value AS DECIMAL(28,2)) AS v
        FROM events WHERE value IS NOT NULL
    ), m AS (
        SELECT sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN g = 'A' THEN v END) AS sa,
               sum(CASE WHEN g = 'A' THEN
                   CAST(v * CAST(v AS DECIMAL(18,2)) AS DECIMAL(38,4))
                   END) AS qa,
               sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN g = 'B' THEN v END) AS sb,
               sum(CASE WHEN g = 'B' THEN
                   CAST(v * CAST(v AS DECIMAL(18,2)) AS DECIMAL(38,4))
                   END) AS qb
        FROM base
    ), d AS (
        SELECT CAST(n_a AS DOUBLE) AS na, CAST(sa AS DOUBLE) AS sa,
               CAST(qa AS DOUBLE) AS qa, CAST(n_b AS DOUBLE) AS nb,
               CAST(sb AS DOUBLE) AS sb, CAST(qb AS DOUBLE) AS qb,
               n_a, n_b
        FROM m
    ), e AS (
        SELECT n_a, n_b, na, nb, sa / na AS ma, sb / nb AS mb,
               (qa - sa * sa / na) / (na - CAST(1 AS DOUBLE)) AS va,
               (qb - sb * sb / nb) / (nb - CAST(1 AS DOUBLE)) AS vb,
               CAST(0.05 AS DOUBLE) * ((sa + sb) / (na + nb)) AS margin
        FROM d
    ), z AS (
        SELECT n_a, n_b, ma, mb, margin, ma - mb AS diff,
               round((ma - mb + margin)
                     / sqrt(va / na + vb / nb), 6) AS z_lo,
               round((margin - (ma - mb))
                     / sqrt(va / na + vb / nb), 6) AS z_up
        FROM e
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           round(diff, 6) + CAST(0 AS DOUBLE) AS diff,
           round(margin, 6) AS margin,
           z_lo + CAST(0 AS DOUBLE) AS z_lower,
           z_up + CAST(0 AS DOUBLE) AS z_upper,
           z_lo > CAST(1.644854 AS DOUBLE)
               AND z_up > CAST(1.644854 AS DOUBLE) AS equivalent
    FROM z
"""

# stats_mahalanobis: DECIMAL moment pass, closed-form 2x2 inverse-
# covariance d2 rounded 6dp, (d2 DESC, x DESC, y DESC) top-10.
ORACLE_SQL["stats_mahalanobis"] = """
    WITH base AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
               CAST(l_extendedprice AS DOUBLE) AS y,
               CAST(l_quantity AS DECIMAL(18,2)) AS xd,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS yd
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ), m AS (
        SELECT count(*) AS n, sum(xd) AS sx, sum(yd) AS sy,
               sum(CAST(xd * CAST(xd AS DECIMAL(20,2))
                        AS DECIMAL(38,4))) AS sxx,
               sum(CAST(yd * CAST(yd AS DECIMAL(20,2))
                        AS DECIMAL(38,4))) AS syy,
               sum(CAST(xd * CAST(yd AS DECIMAL(20,2))
                        AS DECIMAL(38,4))) AS sxy
        FROM base
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
               CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
               CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy
        FROM m
    ), scal AS (
        SELECT sx / n AS mx, sy / n AS my,
               (sxx - sx * sx / n) / (n - CAST(1 AS DOUBLE)) AS vx,
               (syy - sy * sy / n) / (n - CAST(1 AS DOUBLE)) AS vy,
               (sxy - sx * sy / n) / (n - CAST(1 AS DOUBLE)) AS vxy
        FROM d
    ), scored AS (
        SELECT x, y,
               round(((x - mx) * (x - mx) * vy
                      - CAST(2 AS DOUBLE) * (x - mx) * (y - my) * vxy
                      + (y - my) * (y - my) * vx)
                     / (vx * vy - vxy * vxy), 6) AS d2
        FROM base, scal
    )
    SELECT x, y, d2 + CAST(0 AS DOUBLE) AS d2,
           CAST(row_number() OVER (ORDER BY d2 DESC, x DESC, y DESC)
                AS INT) AS rank
    FROM scored ORDER BY d2 DESC, x DESC, y DESC LIMIT 10
"""

# quality_ece: the calibration oracle's score/bin CTEs reduced to the
# two scalars — bin-weighted |gap| terms rounded 9dp then
# DECIMAL-summed; Brier squares on the (12,6)-narrowed diff with the
# widen-one-operand int128 trick.
ORACLE_SQL["quality_ece"] = f"""
    WITH scores AS ({{}}),
    lab AS (
        SELECT s.score, d.lang = 'en' AS y
        FROM scores s JOIN documents d USING (doc_id)
    ), bb AS (
        SELECT least(CAST(floor(round(CAST(score AS DOUBLE), 6)
                                * CAST(10 AS DOUBLE)) AS INT), 9)
                   AS bin,
               CAST(round(CAST(score AS DOUBLE), 6) AS DECIMAL(18,6))
                   AS s,
               CASE WHEN y THEN 1 ELSE 0 END AS pos
        FROM lab WHERE score IS NOT NULL AND y IS NOT NULL
    ), bq AS (
        SELECT bin, s, pos,
               CAST(CAST(CAST(s - pos AS DECIMAL(20,6))
                         * CAST(s - pos AS DECIMAL(12,6))
                         AS DECIMAL(30,12)) AS DECIMAL(30,12)) AS sq
        FROM bb
    ), g AS (
        SELECT bin, count(*) AS n, sum(s) AS ss, sum(pos) AS np,
               sum(sq) AS sqs
        FROM bq GROUP BY bin
    ), t AS (
        SELECT n, sqs,
               CAST(round(CAST(n AS DOUBLE)
                          * abs(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                                - CAST(np AS DOUBLE)
                                  / CAST(n AS DOUBLE)), 9)
                    AS DECIMAL(38,9)) AS wg
        FROM g
    )
    SELECT CAST(sum(n) AS BIGINT) AS n,
           round(CAST(sum(wg) AS DOUBLE)
                 / CAST(sum(n) AS DOUBLE), 6) AS ece,
           round(CAST(sum(sqs) AS DOUBLE)
                 / CAST(sum(n) AS DOUBLE), 6) AS brier
    FROM t
"""
ORACLE_SQL["quality_ece"] = ORACLE_SQL["quality_ece"].format(
    _quality_logistic_oracle_sql()
)


# events_nelson_aalen: the KM unit-table CTEs verbatim, then additive
# d/n increments (12dp-rounded before the ordered cumulative sum) and
# the exp(-H) Fleming-Harrington transform.
ORACLE_SQL["events_nelson_aalen"] = """
    WITH signup AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS s_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), horizon AS (
        SELECT max(CAST(ts AS DATE)) AS h_day FROM events
    ), first_p AS (
        SELECT s.user_id, min(CAST(e.ts AS DATE)) AS p_day
        FROM signup s JOIN events e ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS DATE) >= s.s_day
        GROUP BY s.user_id
    ), u AS (
        SELECT date_diff('day', s.s_day,
                         coalesce(p.p_day, horizon.h_day)) AS dur,
               p.p_day IS NOT NULL AS obs
        FROM signup s LEFT JOIN first_p p ON s.user_id = p.user_id,
             horizon
    ), at_t AS (
        SELECT dur AS t,
               sum(CASE WHEN obs THEN 1 ELSE 0 END) AS d_events,
               sum(CASE WHEN obs THEN 0 ELSE 1 END) AS c_censored
        FROM u GROUP BY dur
    ), risked AS (
        SELECT t, d_events, c_censored,
               sum(d_events + c_censored) OVER (ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_risk
        FROM at_t
    ), hsum AS (
        SELECT t, d_events, n_risk,
               sum(round(CAST(d_events AS DOUBLE)
                         / CAST(n_risk AS DOUBLE), 12)) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS h_raw
        FROM risked
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS d_events,
           round(h_raw, 6) + CAST(0 AS DOUBLE) AS cum_hazard,
           round(exp(-h_raw), 6) + CAST(0 AS DOUBLE) AS survival_fh
    FROM hsum WHERE d_events > 0
"""


# stats_durbin_watson: DECIMAL-exact OLS moments of daily revenue ~ t,
# double closed-form slope/intercept, 6dp residuals re-cast to DECIMAL
# (one operand widened past 18 digits for the int128 multiply), exact
# DW sums, final double ratio.
ORACLE_SQL["stats_durbin_watson"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS y
        FROM events GROUP BY 1
    ), d0 AS (
        SELECT min(day) AS d0 FROM daily
    ), series AS (
        SELECT date_diff('day', d0.d0, day) AS t, y FROM daily, d0
    ), m AS (
        SELECT count(*) AS n,
               sum(CAST(t AS DECIMAL(20,0))) AS st,
               sum(y) AS sy,
               sum(CAST(t AS DECIMAL(20,0)) * y) AS sty,
               sum(CAST(t AS DECIMAL(20,0))
                   * CAST(t AS DECIMAL(20,0))) AS stt
        FROM series
    ), coef AS (
        SELECT n,
               (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                  * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM m
    ), resid AS (
        SELECT t, n, a, b,
               CAST(round(CAST(y AS DOUBLE)
                          - (a + b * CAST(t AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS e
        FROM series, coef
    ), diffed AS (
        SELECT n, a, b, e,
               lag(e) OVER (ORDER BY t) AS e_prev
        FROM resid
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(max(b), 6) AS slope,
           round(max(a), 6) AS intercept,
           round(CAST(sum(CAST(e - e_prev AS DECIMAL(19,6))
                          * CAST(e - e_prev AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(e AS DECIMAL(19,6))
                            * CAST(e AS DECIMAL(18,6))) AS DOUBLE),
                 6) AS dw
    FROM diffed
"""


# lineitem_skyline: distinct (2dp unit price, qty) points per part,
# sort-filter skyline via the strictly-earlier running max window.
ORACLE_SQL["lineitem_skyline"] = """
    WITH per_part AS (
        SELECT l_partkey,
               min(CAST(round(l_extendedprice / l_quantity, 2)
                        AS DECIMAL(18,2))) AS unit_price,
               max(CAST(l_quantity AS DECIMAL(18,2))) AS max_qty
        FROM lineitem GROUP BY l_partkey
    ), pts AS (
        SELECT unit_price AS p, max_qty AS q, count(*) AS n_members
        FROM per_part GROUP BY 1, 2
    ), flagged AS (
        SELECT p, q, n_members,
               max(q) OVER (ORDER BY p ASC, q DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_q_before
        FROM pts
    )
    SELECT CAST(p AS DOUBLE) AS unit_price,
           CAST(q AS DOUBLE) AS max_qty,
           CAST(n_members AS BIGINT) AS n_members
    FROM flagged
    WHERE best_q_before IS NULL OR best_q_before < q
    ORDER BY p
"""


# basket_item_similarity: the basket_item_pairs self-join, both pair
# directions, cosine = support / sqrt(s1*s2) of exact integers, top-5
# per item on the (cosine DESC, neighbor ASC) total order.
ORACLE_SQL["basket_item_similarity"] = """
    WITH basket AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, count(*) AS support
        FROM basket a JOIN basket b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), bidir AS (
        SELECT p1, p2, support FROM pairs
        UNION ALL
        SELECT p2 AS p1, p1 AS p2, support FROM pairs
    ), sup AS (
        SELECT p, count(*) AS s FROM basket GROUP BY p
    ), scored AS (
        SELECT bidir.p1 AS item, bidir.p2 AS neighbor,
               CAST(support AS BIGINT) AS support,
               round(CAST(support AS DOUBLE)
                     / sqrt(CAST(s1.s AS DOUBLE)
                            * CAST(s2.s AS DOUBLE)), 6) AS cosine
        FROM bidir
        JOIN sup s1 ON s1.p = bidir.p1
        JOIN sup s2 ON s2.p = bidir.p2
    ), ranked AS (
        SELECT item, neighbor, support, cosine,
               CAST(row_number() OVER (PARTITION BY item
                   ORDER BY cosine DESC, neighbor ASC) AS INT) AS rank
        FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
"""


# search_rrf: both constituent rankings' oracles verbatim as derived
# tables, full-outer joined, 1/(60+rank) contributions, fused top-10.
ORACLE_SQL["search_rrf"] = f"""
    WITH lhs AS (
        SELECT doc_id, rank AS rank_tfidf
        FROM ({ORACLE_SQL["search_bm25ish"]})
    ), rhs AS (
        SELECT doc_id, rank AS rank_cosine
        FROM ({ORACLE_SQL["search_tfidf_cosine"]})
    ), fused AS (
        SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
               CAST(l.rank_tfidf AS INT) AS rank_tfidf,
               CAST(r.rank_cosine AS INT) AS rank_cosine,
               round(
                   (CASE WHEN l.rank_tfidf IS NOT NULL THEN
                        CAST(1 AS DOUBLE)
                        / (CAST(60 AS DOUBLE)
                           + CAST(l.rank_tfidf AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END)
                   + (CASE WHEN r.rank_cosine IS NOT NULL THEN
                        CAST(1 AS DOUBLE)
                        / (CAST(60 AS DOUBLE)
                           + CAST(r.rank_cosine AS DOUBLE))
                      ELSE CAST(0 AS DOUBLE) END), 6) AS rrf_score
        FROM lhs l FULL OUTER JOIN rhs r ON l.doc_id = r.doc_id
    ), top AS (
        SELECT * FROM fused
        ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    )
    SELECT doc_id, rank_tfidf, rank_cosine, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
                AS INT) AS fused_rank
    FROM top
"""


def _pca_power_oracle_sql(dim: int = 64, iters: int = 3) -> str:
    """Generated unrolled power-iteration oracle mirroring
    linalg.power_iteration_top_component's integer-micros ladder:
    exploded 6dp micro components (BIGINT), per-iteration
    (d = Σ c·v half-away-rescaled to micros | w = Σ d·c | in-engine
    6dp normalize) CTE triple in join/groupBy form. All per-row math
    is int64; the cross-row sums ride DuckDB's hugeint Sum (exact, ≡
    Spark's DECIMAL(25,0) Sum); the only float steps are the same
    round/sqrt/divide the Spark side runs."""
    its = []
    prev = "v0"
    for k in range(1, iters + 1):
        its.append(f"""
    it{k}d AS (
        SELECT vec_id,
               CASE WHEN sum(c * v) >= 0
                    THEN (sum(c * v) + 500000) // 1000000
                    ELSE -((-sum(c * v) + 500000) // 1000000)
               END AS d
        FROM c JOIN {prev} USING (pos) GROUP BY vec_id
    ), it{k}w AS (
        SELECT pos,
               CAST(round(CAST(sum(d * c) AS DOUBLE) / 1e12, 6)
                    AS DECIMAL(15,6)) AS wr
        FROM c JOIN it{k}d USING (vec_id) GROUP BY pos
    ), it{k}n AS (
        SELECT sqrt(CAST(sum(CAST(wr AS DECIMAL(16,6)) * wr)
                         AS DOUBLE)) AS norm
        FROM it{k}w
    ), it{k}v AS (
        SELECT pos,
               CAST(CAST(round(CAST(wr AS DOUBLE) / norm, 6)
                         AS DECIMAL(7,6))
                    * CAST(1000000 AS DECIMAL(19,0)) AS BIGINT) AS v
        FROM it{k}w, it{k}n
    )""")
        prev = f"it{k}v"
    return f"""
    WITH xr AS (
        SELECT vec_id, i AS pos,
               CAST(CAST(round(CAST(embedding[i + 1] AS DOUBLE), 6)
                         AS DECIMAL(7,6))
                    * CAST(1000000 AS DECIMAL(19,0)) AS BIGINT) AS x
        FROM embeddings, LATERAL (SELECT unnest(range({dim})) AS i)
    ), mm AS (
        SELECT pos, count(*) AS n,
               CAST(round(CAST(sum(x) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE), 0)
                    AS BIGINT) AS m
        FROM xr GROUP BY pos
    ), c AS (
        SELECT vec_id, xr.pos, x - m AS c
        FROM xr JOIN mm ON xr.pos = mm.pos
    ), nrow AS (
        SELECT max(n) AS n FROM mm
    ), v0 AS (
        SELECT unnest(range({dim})) AS pos, CAST(125000 AS BIGINT) AS v
    ),{",".join(its)}, tr AS (
        SELECT sum(c * c) AS t FROM c
    )
    SELECT CAST(fv.pos AS INT) AS pos,
           CAST(fv.v AS DOUBLE) / 1000000.0 AS loading,
           CAST(mm.m AS DOUBLE) / 1000000.0 AS mean_x,
           round(it{iters}n.norm / CAST(nrow.n - 1 AS DOUBLE), 6)
               AS eigval,
           round((it{iters}n.norm / CAST(nrow.n - 1 AS DOUBLE))
                 / ((CAST(tr.t AS DOUBLE) / 1e12)
                    / CAST(nrow.n - 1 AS DOUBLE)), 6)
               AS explained_var
    FROM it{iters}v fv
    JOIN mm ON mm.pos = fv.pos, it{iters}n, nrow, tr
    """


ORACLE_SQL["embedding_pca_power"] = _pca_power_oracle_sql()


def _pca_components_oracle_sql(
    dim: int = 64, iters: int = 3, ncomp: int = 3
) -> str:
    """Generated deflation oracle mirroring
    linalg.power_iteration_components: the _pca_power_oracle_sql
    iteration triple replayed per component over matrices c1..cK,
    where c(k+1) = ck − rh(rh(ck·vk)·vk) — the exact-int64 Hotelling
    deflation by the found 6dp iterate (rh = half-away micro² → micro
    rescale, the same CASE expression the d-step uses). Eigval /
    explained / cum come from the per-component norms and the shared
    trace; the cum sums norms left-to-right, the same order the
    driver loop adds them."""

    def rh(x: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN (({x}) + 500000) // 1000000 "
            f"ELSE -((-({x}) + 500000) // 1000000) END"
        )

    ctes = []
    for ci in range(1, ncomp + 1):
        mat = f"c{ci}"
        prev = "v0"
        for k in range(1, iters + 1):
            p = f"k{ci}it{k}"
            ctes.append(f"""
    {p}d AS MATERIALIZED (
        SELECT vec_id, {rh("sum(c * v)")} AS d
        FROM {mat} JOIN {prev} USING (pos) GROUP BY vec_id
    ), {p}w AS MATERIALIZED (
        SELECT pos,
               CAST(round(CAST(sum(d * c) AS DOUBLE) / 1e12, 6)
                    AS DECIMAL(15,6)) AS wr
        FROM {mat} JOIN {p}d USING (vec_id) GROUP BY pos
    ), {p}n AS MATERIALIZED (
        SELECT sqrt(CAST(sum(CAST(wr AS DECIMAL(16,6)) * wr)
                         AS DOUBLE)) AS norm
        FROM {p}w
    ), {p}v AS MATERIALIZED (
        SELECT pos,
               CAST(CAST(round(CAST(wr AS DOUBLE) / norm, 6)
                         AS DECIMAL(7,6))
                    * CAST(1000000 AS DECIMAL(19,0)) AS BIGINT) AS v
        FROM {p}w, {p}n
    )""")
            prev = f"{p}v"
        if ci < ncomp:
            ctes.append(f"""
    defl{ci} AS MATERIALIZED (
        SELECT vec_id, {rh("sum(c * v)")} AS d
        FROM {mat} JOIN {prev} USING (pos) GROUP BY vec_id
    ), c{ci + 1} AS MATERIALIZED (
        SELECT a.vec_id, a.pos, a.c - {rh("dd.d * vv.v")} AS c
        FROM {mat} a
        JOIN defl{ci} dd ON a.vec_id = dd.vec_id
        JOIN {prev} vv ON a.pos = vv.pos
    )""")
    selects = []
    for ci in range(1, ncomp + 1):
        fv = f"k{ci}it{iters}v"
        fn = f"k{ci}it{iters}n"
        cum_expr = " + ".join(
            f"k{c}it{iters}n.norm" for c in range(1, ci + 1)
        )
        norms = ", ".join(f"k{c}it{iters}n" for c in range(1, ci + 1))
        selects.append(f"""
    SELECT CAST({ci - 1} AS INT) AS component,
           CAST(fv.pos AS INT) AS pos,
           CAST(fv.v AS DOUBLE) / 1000000.0 AS loading,
           CAST(mm.m AS DOUBLE) / 1000000.0 AS mean_x,
           round({fn}.norm / CAST(nrow.n - 1 AS DOUBLE), 6) AS eigval,
           round(({fn}.norm / CAST(nrow.n - 1 AS DOUBLE))
                 / ((CAST(tr.t AS DOUBLE) / 1e12)
                    / CAST(nrow.n - 1 AS DOUBLE)), 6) AS explained_var,
           round((({cum_expr}) / CAST(nrow.n - 1 AS DOUBLE))
                 / ((CAST(tr.t AS DOUBLE) / 1e12)
                    / CAST(nrow.n - 1 AS DOUBLE)), 6) AS cum_explained
    FROM {fv} fv
    JOIN mm ON mm.pos = fv.pos, {norms}, nrow, tr""")
    return f"""
    WITH xr AS MATERIALIZED (
        SELECT vec_id, i AS pos,
               CAST(CAST(round(CAST(embedding[i + 1] AS DOUBLE), 6)
                         AS DECIMAL(7,6))
                    * CAST(1000000 AS DECIMAL(19,0)) AS BIGINT) AS x
        FROM embeddings, LATERAL (SELECT unnest(range({dim})) AS i)
    ), mm AS MATERIALIZED (
        SELECT pos, count(*) AS n,
               CAST(round(CAST(sum(x) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE), 0)
                    AS BIGINT) AS m
        FROM xr GROUP BY pos
    ), c1 AS MATERIALIZED (
        SELECT vec_id, xr.pos, x - m AS c
        FROM xr JOIN mm ON xr.pos = mm.pos
    ), nrow AS (
        SELECT max(n) AS n FROM mm
    ), v0 AS (
        SELECT unnest(range({dim})) AS pos, CAST(125000 AS BIGINT) AS v
    ),{",".join(ctes)}, tr AS (
        SELECT sum(c * c) AS t FROM c1
    )
    {" UNION ALL ".join(selects)}
    """


ORACLE_SQL["embedding_pca_components"] = _pca_components_oracle_sql()


def _als_chain_ctes(
    sweeps: int = 2, alpha: int = 40, inter_pred: str = "TRUE"
) -> tuple[str, str, str]:
    """The unrolled ALS sweep-chain CTEs mirroring
    product_analytics.als_implicit_rank2 (shared by the factors and
    eval oracles): per half-sweep a 1-row Gram CTE (hugeint sums over
    int64 micro products ≡ Spark's DECIMAL sums), a per-entity
    correction/b aggregate, and the closed-form 2×2 solve as an EXACT
    HUGEINT division ladder (see ``ladder`` below — zero float steps,
    r14 verdict #1). ``inter_pred`` filters the
    training interactions (the eval oracle trains on the split).
    Returns (ctes_sql, user_cte, item_cte)."""
    lam = 100_000_000_000

    def ladder(src: str) -> str:
        """The EXACT solve (r14 verdict #1 — zero float steps): keep
        Cramer numerators (micro³) and det (micro⁴) as HUGEINT and
        compute f_u = round_half_away(|num|·10¹² / det) by three ×10⁴
        floor-division steps, so no intermediate passes int128
        (max is det·10⁴ ≈ 10³⁶ at sf0.01; the oracle only ever runs
        at sf ≤ 0.01 — the Spark side uses unbounded Python ints,
        product_analytics._als_requant_batches, same arithmetic).
        Positive operands only (sign split out), where DuckDB ``//``
        truncation ≡ floor; the final half-bit CASE is the HALF_UP
        convention shared with Spark's BigDecimal round."""
        steps = []
        for side, n in (("0", "n0"), ("1", "n1")):
            steps.append(
                f"(q{side}a * 100000000 + q{side}b * 10000 + q{side}c"
                f" + CASE WHEN 2 * r{side}c >= det THEN 1 ELSE 0 END)"
            )
        return f"""SELECT fid,
               CAST(sg0 * {steps[0]} AS BIGINT) AS f0u,
               CAST(sg1 * {steps[1]} AS BIGINT) AS f1u
        FROM (
          SELECT *, (r0b * 10000) // det AS q0c, (r0b * 10000) % det AS r0c,
                 (r1b * 10000) // det AS q1c, (r1b * 10000) % det AS r1c
          FROM (
            SELECT *, (r0a * 10000) // det AS q0b, (r0a * 10000) % det AS r0b,
                   (r1a * 10000) // det AS q1b, (r1a * 10000) % det AS r1b
            FROM (
              SELECT *, (n0 * 10000) // det AS q0a, (n0 * 10000) % det AS r0a,
                     (n1 * 10000) // det AS q1a, (n1 * 10000) % det AS r1a
              FROM (
                SELECT fid, a00m * a11m - a01m * a01m AS det,
                       CASE WHEN a11m * b0m - a01m * b1m < 0
                            THEN -1 ELSE 1 END AS sg0,
                       abs(a11m * b0m - a01m * b1m) AS n0,
                       CASE WHEN a00m * b1m - a01m * b0m < 0
                            THEN -1 ELSE 1 END AS sg1,
                       abs(a00m * b1m - a01m * b0m) AS n1
                FROM (
                  SELECT fid,
                         CAST(g00 + {alpha} * s00 + {lam} AS HUGEINT) AS a00m,
                         CAST(g01 + {alpha} * s01 AS HUGEINT) AS a01m,
                         CAST(g11 + {alpha} * s11 + {lam} AS HUGEINT) AS a11m,
                         CAST(b0 AS HUGEINT) AS b0m,
                         CAST(b1 AS HUGEINT) AS b1m
                  FROM {src}))))) """
    ctes = [
        f"""inter AS MATERIALIZED (
        SELECT u, it, r FROM (
            SELECT o_custkey AS u, l_partkey AS it, count(*) AS r
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2)
        WHERE {inter_pred}
    )""",
        """f0 AS MATERIALIZED (
        SELECT it AS fid,
               100000 + (it % 17) * 50000 AS f0u,
               50000 + (it % 13) * 50000 AS f1u
        FROM (SELECT DISTINCT it FROM inter)
    )""",
    ]
    prev = "f0"
    for t in range(1, 2 * sweeps + 1):
        key, okey = ("u", "it") if t % 2 == 1 else ("it", "u")
        ctes.append(f"""g{t} AS (
        SELECT sum(f0u * f0u) AS g00, sum(f0u * f1u) AS g01,
               sum(f1u * f1u) AS g11
        FROM {prev}
    ), s{t} AS (
        SELECT {key} AS fid,
               sum(r * f0u * f0u) AS s00, sum(r * f0u * f1u) AS s01,
               sum(r * f1u * f1u) AS s11,
               sum((1 + {alpha} * r) * f0u) AS b0,
               sum((1 + {alpha} * r) * f1u) AS b1
        FROM inter JOIN {prev} ON inter.{okey} = {prev}.fid
        GROUP BY 1
    ), f{t} AS MATERIALIZED (
        {ladder(f"s{t}, g{t}")}
    )""")
        prev = f"f{t}"
    uf, itf = f"f{2 * sweeps - 1}", f"f{2 * sweeps}"
    joined = ",\n    ".join(ctes)
    return joined, uf, itf


def _als_oracle_sql(sweeps: int = 2, alpha: int = 40) -> str:
    joined, uf, itf = _als_chain_ctes(sweeps, alpha)
    return f"""
    WITH {joined}
    SELECT 'user' AS entity, fid AS id,
           CAST(f0u AS DOUBLE) / 1000000.0 AS f0,
           CAST(f1u AS DOUBLE) / 1000000.0 AS f1
    FROM {uf} WHERE fid % 20 = 0
    UNION ALL
    SELECT 'item', fid,
           CAST(f0u AS DOUBLE) / 1000000.0,
           CAST(f1u AS DOUBLE) / 1000000.0
    FROM {itf} WHERE fid % 20 = 0
    """


ORACLE_SQL["recsys_als_factors"] = _als_oracle_sql()


def _als_eval_oracle_sql(sweeps: int = 2, alpha: int = 40) -> str:
    """Held-out ranking-eval oracle: the ALS chain trained on the
    (u + it) % 5 <> 0 split, then the brute exact-int ranking of
    non-train items per test user, hit/MRR aggregation with the
    lcm(1..10)=2520 integer reciprocal-rank trick (one double divide
    at the end, matching als_rank_eval)."""
    joined, uf, itf = _als_chain_ctes(
        sweeps, alpha, inter_pred="(u + it) % 5 <> 0"
    )
    return f"""
    WITH {joined},
    allpairs AS MATERIALIZED (
        SELECT o_custkey AS u, l_partkey AS it
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    ),
    test_pairs AS (SELECT u, it FROM allpairs
                   WHERE (u + it) % 5 = 0 AND u % 40 = 0
                     AND u < 15000),
    train_pairs AS (SELECT u, it FROM allpairs WHERE (u + it) % 5 <> 0),
    cohort AS MATERIALIZED (
        SELECT t.u, f.f0u AS uf0, f.f1u AS uf1
        FROM (SELECT DISTINCT u FROM test_pairs) t
        JOIN {uf} f ON f.fid = t.u
    ),
    ranked AS MATERIALIZED (
        SELECT u, it, row_number() OVER (
                   PARTITION BY u ORDER BY score DESC, it ASC) AS rank
        FROM (
            SELECT c.u, i.fid AS it,
                   c.uf0 * i.f0u + c.uf1 * i.f1u AS score
            FROM cohort c CROSS JOIN {itf} i
            WHERE NOT EXISTS (
                SELECT 1 FROM train_pairs tp
                WHERE tp.u = c.u AND tp.it = i.fid))
    ),
    per_user AS (
        SELECT r.u, min(r.rank) AS first_rank, count(*) AS n_hits
        FROM ranked r JOIN test_pairs tp ON tp.u = r.u AND tp.it = r.it
        WHERE r.rank <= 10
        GROUP BY r.u
    )
    SELECT n_users, n_hit_users, hits_at_k,
           -- round_half_up(a/b, 6) as EXACT integer arithmetic:
           -- (2*a*10^6 + b) // (2*b), then ONE double divide by 10^6
           -- of an exact integer (correctly rounded IEEE — identical
           -- in every engine/version). round(DOUBLE, 6) is the one
           -- construct whose implementation varies across DuckDB
           -- releases; als_rank_eval mirrors this form (r16).
           CASE WHEN n_users = 0 THEN NULL ELSE
             CAST((2 * n_hit_users * 1000000 + n_users)
                  // (2 * n_users) AS DOUBLE) / 1000000.0
           END AS hit_rate,
           CASE WHEN n_users = 0 THEN NULL ELSE
             CAST((2 * rr_sum * 1000000 + n_users * 2520)
                  // (2 * n_users * 2520) AS DOUBLE) / 1000000.0
           END AS mrr
    FROM (
        SELECT count(*) AS n_users,
               count(first_rank) AS n_hit_users,
               coalesce(sum(n_hits), 0) AS hits_at_k,
               coalesce(sum(2520 // first_rank), 0) AS rr_sum
        FROM cohort c LEFT JOIN per_user p ON p.u = c.u)
    """


ORACLE_SQL["recsys_als_eval"] = _als_eval_oracle_sql()


# join_shipping_priority: top-10 rank on the EXACT decimal revenue
# (rounded only at output), ties broken by date then the unique
# orderkey — identical selection in both engines.
ORACLE_SQL["join_shipping_priority"] = """
    SELECT l_orderkey,
           round(CAST(rev_exact AS DOUBLE), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM (
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(4,2))
                      - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev_exact
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY rev_exact DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10)
"""

ORACLE_SQL["agg_large_orders"] = """
    SELECT c.c_name, c.c_custkey, b.l_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(CAST(b.qty AS DOUBLE), 2) AS total_qty
    FROM (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200) b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, b.l_orderkey ASC
    LIMIT 20
"""


# events_ar2_forecast: exact-decimal autocovariances (the DW scale-12
# product convention), closed-form Yule-Walker solve, forecast from the
# max_by-picked last/second-last deviations (DuckDB arg_max skips NULL
# values natively — the Spark side guards the ordering explicitly).
ORACLE_SQL["events_ar2_forecast"] = """
    WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS t,
               sum(CAST(value AS DECIMAL(18,2))) AS y
        FROM events GROUP BY 1, 2
    ), means AS (
        SELECT g, count(*) AS n, sum(y) AS sy FROM daily GROUP BY g
    ), centered AS (
        SELECT d.g, t, n,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
               CAST(round(CAST(y AS DOUBLE)
                          - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS d
        FROM daily d JOIN means m ON d.g = m.g
    ), lagged AS (
        SELECT g, t, n, ybar, d,
               lag(d, 1) OVER (PARTITION BY g ORDER BY t) AS d1,
               lag(d, 2) OVER (PARTITION BY g ORDER BY t) AS d2
        FROM centered
    ), agg AS (
        SELECT g, max(n) AS n, max(ybar) AS ybar,
               sum(CAST(d AS DECIMAL(19,6))
                   * CAST(d AS DECIMAL(18,6))) AS c0,
               sum(CAST(d AS DECIMAL(19,6))
                   * CAST(d1 AS DECIMAL(18,6))) AS c1,
               sum(CAST(d AS DECIMAL(19,6))
                   * CAST(d2 AS DECIMAL(18,6))) AS c2,
               arg_max(d, t) AS dlast,
               arg_max(d1, t) AS dprev
        FROM lagged GROUP BY g
    )
    SELECT g AS event_type, CAST(n AS BIGINT) AS n,
           round((CAST(c1 AS DOUBLE)
                  * (CAST(c0 AS DOUBLE) - CAST(c2 AS DOUBLE)))
                 / NULLIF(CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
                          - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE), 0),
                 6) + CAST(0 AS DOUBLE) AS phi1,
           round((CAST(c0 AS DOUBLE) * CAST(c2 AS DOUBLE)
                  - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE))
                 / NULLIF(CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
                          - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE), 0),
                 6) + CAST(0 AS DOUBLE) AS phi2,
           round(ybar
                 + ((CAST(c1 AS DOUBLE)
                     * (CAST(c0 AS DOUBLE) - CAST(c2 AS DOUBLE)))
                    / NULLIF(CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
                             - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE),
                             0)) * CAST(dlast AS DOUBLE)
                 + ((CAST(c0 AS DOUBLE) * CAST(c2 AS DOUBLE)
                     - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE))
                    / NULLIF(CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE)
                             - CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE),
                             0)) * CAST(dprev AS DOUBLE),
                 2) AS forecast_next
    FROM agg
"""


# temporal_dtw oracle: the banded DP replayed as a recursive CTE — one
# row per (group, matrix-row i) carrying DP row i as a BIGINT list; the
# step applies the same prefix-scan recurrence the numpy kernel runs
# (enter row i at column jp, run right: cur[j] = pc[j] +
# min_jp(min(prev[jp], prev[jp-1]) - pc[jp-1])), all integer cents.
# Generated from composable fragments so the lambda nesting stays
# paren-balanced by construction.
def _dtw_oracle_sql() -> str:
    big = "1000000000000000::BIGINT"
    lo = "greatest(1, dp.i + 1 - wp.w)"

    def cost_sum(upper: str) -> str:
        return (
            f"list_sum(list_transform(range({lo}, {upper}), "
            f"t -> abs(lg.l[dp.i + 1] - lref.l[t])))::BIGINT"
        )

    bterm = (
        f"least(row[jp], CASE WHEN jp >= 2 THEN row[jp - 1] "
        f"ELSE {big} END)"
    )
    pcterm = f"(CASE WHEN jp > {lo} THEN {cost_sum('jp')} ELSE 0::BIGINT END)"
    inner = (
        f"list_min(list_transform(range({lo}, j + 1), "
        f"jp -> {bterm} - {pcterm}))"
    )
    cell = f"least({cost_sum('j + 1')} + {inner}, {big})"
    step_cell = (
        f"CASE WHEN j BETWEEN {lo} AND least(lref.n, dp.i + 1 + wp.w) "
        f"THEN {cell} ELSE {big} END"
    )
    base_cell = (
        f"CASE WHEN j <= 1 + wp.w THEN "
        f"list_sum(list_transform(range(1, j + 1), "
        f"t -> abs(lg.l[1] - lref.l[t])))::BIGINT ELSE {big} END"
    )
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                               AS DOUBLE) * 100, 0) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), lref AS (
        SELECT list(cents ORDER BY day) AS l, count(*) AS n
        FROM daily WHERE event_type = 'click'
    ), lg AS (
        SELECT event_type AS grp, list(cents ORDER BY day) AS l,
               count(*) AS n
        FROM daily WHERE event_type <> 'click' GROUP BY 1
    ), wp AS (
        SELECT grp, greatest(15, abs(lg.n - lref.n) + 5) AS w
        FROM lg, lref
    ), dp(grp, i, row) AS (
        SELECT lg.grp, 1,
               list_transform(range(1, lref.n + 1), j -> {base_cell})
        FROM lg JOIN wp USING (grp), lref
        UNION ALL
        SELECT dp.grp, dp.i + 1,
               list_transform(range(1, lref.n + 1), j -> {step_cell})
        FROM dp
        JOIN lg ON lg.grp = dp.grp
        JOIN wp ON wp.grp = dp.grp, lref
        WHERE dp.i < lg.n
    )
    SELECT dp.grp AS event_type,
           CAST(lg.n AS BIGINT) AS n_a,
           CAST(lref.n AS BIGINT) AS n_b,
           round(CAST(dp.row[lref.n] AS DOUBLE) / 100.0, 2) AS dtw,
           round(CAST(dp.row[lref.n] AS DOUBLE) / 100.0
                 / CAST(lg.n + lref.n AS DOUBLE), 6) AS dtw_per_step
    FROM dp JOIN lg ON lg.grp = dp.grp, lref
    WHERE dp.i = lg.n
    ORDER BY event_type
    """


ORACLE_SQL["temporal_dtw"] = _dtw_oracle_sql()


# multimodal_phash_dedup oracle: recompute the aHash from the fixture's
# closed-form pixels in integer SQL (cell sums over 2x2 blocks, bit_i
# iff 64*s_i >= total, row-major bit pack with the signed-64 fold), then
# the SAME banded candidate join + bit_count(xor) verify the Spark
# operator runs. Constants mirror multimodal.AHASH_* exactly.
ORACLE_SQL["multimodal_phash_dedup"] = """
    WITH px AS (
        SELECT d.doc_id, ci.ci AS ci,
               (ci.ci % 8) * 2 + (k.k % 2) AS x,
               (ci.ci // 8) * 2 + (k.k // 2) AS y
        FROM documents d,
             LATERAL (SELECT unnest(range(64)) AS ci) ci,
             LATERAL (SELECT unnest(range(4)) AS k) k
    ), coeff AS (
        SELECT doc_id, ci, x, y,
               7 + ((doc_id // 5) * 2654435761) % 89 AS ax,
               11 + ((doc_id // 5) * 40503) % 83 AS by,
               ((doc_id // 5) * 9176) % 79 AS cz
        FROM px
    ), vals AS (
        SELECT doc_id, ci,
               CASE WHEN y * 16 + x = (doc_id * 37) % 256
                    THEN 240 - (CASE WHEN (ax * x + by * y + cz * x * y)
                                          % 97 < 48
                                THEN 200 ELSE 40 END)
                    ELSE (CASE WHEN (ax * x + by * y + cz * x * y)
                                    % 97 < 48
                          THEN 200 ELSE 40 END)
               END AS v
        FROM coeff
    ), cells AS (
        SELECT doc_id, ci, sum(v) AS s FROM vals GROUP BY doc_id, ci
    ), tot AS (
        SELECT doc_id, sum(s) AS st FROM cells GROUP BY doc_id
    ), bits AS (
        SELECT c.doc_id, ci,
               CASE WHEN 64 * s >= st THEN 1 ELSE 0 END AS b
        FROM cells c JOIN tot USING (doc_id)
    ), hashes AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN b = 1 AND ci < 63
                             THEN (1::BIGINT << ci) ELSE 0::BIGINT END)
                    + sum(CASE WHEN b = 1 AND ci = 63
                               THEN -9223372036854775807 - 1
                               ELSE 0 END) AS BIGINT) AS h
        FROM bits GROUP BY doc_id
    ), bands AS (
        SELECT doc_id, h,
               ((h >> (16 * bb.b)) & 65535) * 4 + bb.b AS band_key
        FROM hashes, LATERAL (SELECT unnest(range(4)) AS b) bb
    ), cands AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
               a.h AS h1, b.h AS h2
        FROM bands a
        JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
    FROM cands
    WHERE bit_count(xor(h1, h2)) <= 10
"""


def _ppr_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    """Personalized-pagerank CTE replay (the _pagerank_oracle_sql
    convention): teleportation to the seed restart vector, undirected
    projection so no dangling term, 9dp contribution/iterate rounds."""
    d, om = repr(damping), repr(1.0 - damping)
    ctes = [
        """pairs AS (
            SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01')""",
        """edges AS (
            SELECT src, dst FROM pairs
            UNION ALL SELECT dst, src FROM pairs)""",
        """nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges)""",
        """outdeg AS (
            SELECT src AS node, count(*) AS o FROM edges GROUP BY src)""",
        """seeds AS (
            SELECT DISTINCT src AS node FROM pairs
            WHERE (src // 2) % 20 = 1)""",
        "ns AS (SELECT count(*) AS n FROM seeds)",
        """base AS (
            SELECT nodes.node,
                   CASE WHEN seeds.node IS NOT NULL
                        THEN 1.0 / ns.n ELSE 0.0 END AS r
            FROM nodes
            LEFT JOIN seeds ON seeds.node = nodes.node, ns)""",
        "r0 AS (SELECT node, r AS pr FROM base)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
            SELECT e.dst AS node, round(r.pr / dg.o, 9) AS c
            FROM r{i - 1} r
            JOIN outdeg dg ON dg.node = r.node
            JOIN edges e ON e.src = r.node)"""
        )
        ctes.append(
            f"""s{i} AS (
            SELECT node, sum(c) AS s FROM c{i} GROUP BY node)"""
        )
        ctes.append(
            f"""r{i} AS (
            SELECT base.node,
                   round({om} * base.r
                         + {d} * coalesce(s{i}.s, 0.0), 9) AS pr
            FROM base LEFT JOIN s{i} ON s{i}.node = base.node)"""
        )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                    ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
               round(pr, 6) AS ppr
        FROM r{iterations}
    """


ORACLE_SQL["graph_ppr"] = _ppr_oracle_sql()


def _holt_oracle_sql() -> str:
    """events_holt_forecast oracle: the integer micro-cent Holt ladder
    replayed as a recursive CTE — one row per (group, t) carrying
    (level, trend, Σ|e|, Σe² as HUGEINT); the dyadic half-away rounds
    are generated inline as sign-split integer divides."""

    def rnd(x: str, d: int) -> str:
        h = d // 2
        return (
            f"(CASE WHEN ({x}) >= 0 THEN (({x}) + {h}) // {d} "
            f"ELSE -((-({x}) + {h}) // {d}) END)"
        )

    lnew = rnd("s.y + r.l + r.b", 2)
    bnew = rnd(f"{lnew} - r.l + 3 * r.b", 4)
    return f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2)))
                               AS DOUBLE) * 100, 0) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), series AS (
        SELECT event_type AS grp, cents * 1000000 AS y,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS t
        FROM daily
    ), counts AS (
        SELECT grp, count(*) AS n FROM series GROUP BY grp
        HAVING count(*) >= 3
    ), rec(grp, t, l, b, sae, sse) AS (
        SELECT s1.grp, 2, s2.y, s2.y - s1.y, 0::BIGINT, 0::HUGEINT
        FROM series s1
        JOIN series s2 ON s2.grp = s1.grp AND s2.t = 2
        JOIN counts c ON c.grp = s1.grp
        WHERE s1.t = 1
        UNION ALL
        SELECT r.grp, r.t + 1,
               {lnew},
               {bnew},
               r.sae + abs(s.y - (r.l + r.b)),
               r.sse + (s.y - (r.l + r.b))::HUGEINT
                       * (s.y - (r.l + r.b))
        FROM rec r
        JOIN series s ON s.grp = r.grp AND s.t = r.t + 1
        JOIN counts c ON c.grp = r.grp
        WHERE r.t < c.n
    )
    SELECT rec.grp AS event_type,
           CAST(c.n AS BIGINT) AS n,
           round(CAST(l AS DOUBLE) / 1e8, 2) AS level,
           round(CAST(b AS DOUBLE) / 1e8, 4) AS trend,
           round(CAST(l + 7 * b AS DOUBLE) / 1e8, 2) AS forecast_7,
           round((CAST(sae AS DOUBLE) / 1e8)
                 / CAST(c.n - 2 AS DOUBLE), 4) AS mae,
           round(sqrt((CAST(sse AS DOUBLE) / 1e16)
                      / CAST(c.n - 2 AS DOUBLE)), 4) AS rmse
    FROM rec JOIN counts c ON c.grp = rec.grp
    WHERE rec.t = c.n
    ORDER BY event_type
    """


ORACLE_SQL["events_holt_forecast"] = _holt_oracle_sql()


# sketch_theta_difference oracle: the _theta_oracle_sql sketch build
# verbatim, then the AnotB counts — survivors of S_a under the pair θ
# minus co-survivors in S_b — and the exact |A| − |A∩B| alongside.
def _theta_diff_oracle_sql(k: int = 64) -> str:
    p = 2147483647
    mix = (
        f"((((v * 31) % {p}) * ((v * 31) % {p}) % {p}) * 48271 % {p}"
        f" + (v * 37) % {p}) % {p}"
    )
    return f"""
        WITH members AS (
            SELECT DISTINCT event_type AS s, user_id AS v FROM events
        ), hashed AS (
            SELECT s, v,
                   CAST({mix} AS DOUBLE) / 2147483647.0 AS u
            FROM members
        ), sk AS (
            SELECT * FROM (
                SELECT s, v, u,
                       row_number() OVER (
                           PARTITION BY s ORDER BY u ASC, v ASC) AS rn
                FROM hashed
            ) WHERE rn <= {k}
        ), theta AS (
            SELECT s,
                   coalesce(max(CASE WHEN rn = {k} THEN u END), 1.0)
                       AS theta
            FROM sk GROUP BY s
        ), a_under AS (
            SELECT a.s AS set_a, tb.s AS set_b,
                   ta.theta AS th_a, tb.theta AS th_b,
                   count(*) AS na
            FROM sk a
            JOIN theta ta ON ta.s = a.s
            JOIN theta tb ON tb.s <> a.s
            WHERE a.u < least(ta.theta, tb.theta)
            GROUP BY a.s, tb.s, ta.theta, tb.theta
        ), both_under AS (
            SELECT a.s AS set_a, b.s AS set_b, count(*) AS nab
            FROM sk a
            JOIN sk b ON a.v = b.v AND a.s <> b.s
            JOIN theta ta ON ta.s = a.s
            JOIN theta tb ON tb.s = b.s
            WHERE a.u < least(ta.theta, tb.theta)
            GROUP BY a.s, b.s
        ), est AS (
            SELECT set_a, set_b,
                   round(CAST(na - coalesce(nab, 0) AS DOUBLE)
                         / least(th_a, th_b), 4) AS n_est
            FROM a_under
            LEFT JOIN both_under USING (set_a, set_b)
        ), inter AS (
            SELECT a.s AS set_a, b.s AS set_b, count(*) AS ni
            FROM members a JOIN members b ON a.v = b.v AND a.s <> b.s
            GROUP BY a.s, b.s
        ), sizes AS (
            SELECT s AS set_a, count(*) AS sz FROM members GROUP BY s
        ), pairs AS (
            SELECT sizes.set_a, o.set_b, sizes.sz
            FROM sizes
            JOIN (SELECT DISTINCT s AS set_b FROM members) o
              ON o.set_b <> sizes.set_a
        ), exact AS (
            SELECT p2.set_a, p2.set_b,
                   p2.sz - coalesce(inter.ni, 0) AS n_exact
            FROM pairs p2
            LEFT JOIN inter USING (set_a, set_b)
        )
        SELECT exact.set_a, exact.set_b,
               CAST(n_exact AS BIGINT) AS n_exact,
               coalesce(n_est, 0.0) AS n_est,
               round(abs(coalesce(n_est, 0.0)
                         - CAST(n_exact AS DOUBLE))
                     / nullif(CAST(n_exact AS DOUBLE), 0.0), 4)
                   AS rel_err
        FROM exact LEFT JOIN est USING (set_a, set_b)
    """


ORACLE_SQL["sketch_theta_difference"] = _theta_diff_oracle_sql()


# sketch_hll_sliding oracle: daily numeric-mix registers, the 7-day
# fan-out to target event days, per-bucket max merge, and the exact
# _hll_estimate arithmetic (integer harmonic numerator, linear-counting
# branch) replayed per day; exact windowed distincts alongside.
ORACLE_SQL["sketch_hll_sliding"] = """
    WITH hashed AS (
        SELECT CAST(ts AS DATE) AS day,
               ((((user_id * 31) % 2147483647)
                 * ((user_id * 31) % 2147483647) % 2147483647)
                * 48271 % 2147483647
                + (user_id * 37) % 2147483647) % 2147483647 AS g1,
               ((((user_id * 37) % 2147483647)
                 * ((user_id * 37) % 2147483647) % 2147483647)
                * 48271 % 2147483647
                + (user_id * 31) % 2147483647) % 2147483647 AS g2
        FROM events
    ), ranked AS (
        SELECT day, CAST(g1 % 64 AS INT) AS bucket,
               CASE WHEN g2 > 0
                    THEN least(length(bin(g2 & -g2)), 31)
                    ELSE 31 END AS r
        FROM hashed
    ), daily_regs AS (
        SELECT day, bucket, max(r) AS mx FROM ranked GROUP BY 1, 2
    ), days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ), fanned AS (
        SELECT dr.day + CAST(kk.k AS INT) AS tday, bucket, mx
        FROM daily_regs dr, LATERAL (SELECT unnest(range(7)) AS k) kk
    ), merged AS (
        SELECT tday, bucket, max(mx) AS mx
        FROM fanned
        WHERE tday IN (SELECT day FROM days)
        GROUP BY 1, 2
    ), agg AS (
        SELECT tday, count(*) AS nonzero,
               sum(CAST(pow(2.0, CAST(31 - mx AS DOUBLE)) AS BIGINT))
                   AS num
        FROM merged GROUP BY tday
    ), est AS (
        SELECT tday,
               round(CASE
                 WHEN (0.709 * 64 * 64)
                      / (CAST(num AS DOUBLE) / 2147483648.0
                         + CAST(64 - nonzero AS DOUBLE)) <= 2.5 * 64
                      AND 64 - nonzero > 0
                 THEN CAST(64 AS DOUBLE)
                      * ln(CAST(64 AS DOUBLE)
                           / CAST(64 - nonzero AS DOUBLE))
                 ELSE (0.709 * 64 * 64)
                      / (CAST(num AS DOUBLE) / 2147483648.0
                         + CAST(64 - nonzero AS DOUBLE))
               END, 4) AS estimate
        FROM agg
    ), daily_users AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events
    ), exact AS (
        SELECT du.day + CAST(kk.k AS INT) AS tday, count(DISTINCT u) AS n_true
        FROM daily_users du, LATERAL (SELECT unnest(range(7)) AS k) kk
        WHERE du.day + CAST(kk.k AS INT) IN (SELECT day FROM days)
        GROUP BY 1
    )
    SELECT est.tday AS day, CAST(n_true AS BIGINT) AS n_true,
           estimate,
           round(abs(estimate - CAST(n_true AS DOUBLE))
                 / CAST(n_true AS DOUBLE), 4) AS rel_err
    FROM est JOIN exact ON exact.tday = est.tday
"""


# temporal_sax_words oracle: DECIMAL moments, integer PAA bucketing,
# the same scalar double z per segment (6dp before compares), symbols
# assembled with string_agg in segment order.
ORACLE_SQL["temporal_sax_words"] = """
    WITH daily AS (
        SELECT event_type AS grp, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS v
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY day) - 1
                   AS idx
        FROM daily
    ), moments AS (
        SELECT grp, count(*) AS n, sum(v) AS s,
               sum(CAST(v AS DECIMAL(20,2)) * v) AS ss
        FROM base GROUP BY grp
    ), stats AS (
        SELECT grp, n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               sqrt((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / CAST(n - 1 AS DOUBLE)) AS sd
        FROM moments
    ), segged AS (
        SELECT b.grp, b.v, st.n, st.mu, st.sd,
               CAST(floor(CAST(b.idx * 8 AS DOUBLE)
                          / CAST(st.n AS DOUBLE)) AS INT) AS seg
        FROM base b JOIN stats st ON st.grp = b.grp
    ), paa AS (
        SELECT grp, seg, max(n) AS n, max(mu) AS mu, max(sd) AS sd,
               sum(v) AS segsum, count(*) AS segn
        FROM segged GROUP BY grp, seg
    ), lettered AS (
        SELECT grp, n, seg,
               CASE
                 WHEN round((CAST(segsum AS DOUBLE)
                             / CAST(segn AS DOUBLE) - mu)
                            / nullif(sd, 0.0), 6) < -0.6745 THEN 'a'
                 WHEN round((CAST(segsum AS DOUBLE)
                             / CAST(segn AS DOUBLE) - mu)
                            / nullif(sd, 0.0), 6) < 0.0 THEN 'b'
                 WHEN round((CAST(segsum AS DOUBLE)
                             / CAST(segn AS DOUBLE) - mu)
                            / nullif(sd, 0.0), 6) < 0.6745 THEN 'c'
                 ELSE 'd'
               END AS sym
        FROM paa
    )
    SELECT grp AS event_type,
           CAST(max(n) AS BIGINT) AS n_points,
           CAST(count(*) AS BIGINT) AS n_segments,
           string_agg(sym, '' ORDER BY seg) AS sax_word
    FROM lettered
    GROUP BY grp
    ORDER BY event_type
"""


# stats_breusch_pagan oracle: the DW oracle's moment/coefficient CTEs,
# then the auxiliary e² ~ t regression with DECIMAL-exact moments
# (2dp-rounded squared residuals; widened operands for int128) and the
# scalar BP = n·R² readout.
ORACLE_SQL["stats_breusch_pagan"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS y
        FROM events GROUP BY 1
    ), d0 AS (
        SELECT min(day) AS d0 FROM daily
    ), series AS (
        SELECT date_diff('day', d0.d0, day) AS t, y FROM daily, d0
    ), m AS (
        SELECT count(*) AS n,
               sum(CAST(t AS DECIMAL(20,0))) AS st,
               sum(y) AS sy,
               sum(CAST(t AS DECIMAL(20,0)) * y) AS sty,
               sum(CAST(t AS DECIMAL(20,0))
                   * CAST(t AS DECIMAL(20,0))) AS stt
        FROM series
    ), coef AS (
        SELECT n, st, stt,
               (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                  * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM m
    ), aux AS (
        SELECT t, n, st, stt,
               CAST(round(
                   round(CAST(y AS DOUBLE)
                         - (a + b * CAST(t AS DOUBLE)), 6)
                   * round(CAST(y AS DOUBLE)
                           - (a + b * CAST(t AS DOUBLE)), 6), 2)
                    AS DECIMAL(18,2)) AS e2
        FROM series, coef
    ), agg AS (
        SELECT max(n) AS n, max(st) AS st, max(stt) AS stt,
               sum(e2) AS se2,
               sum(CAST(t AS DECIMAL(20,0)) * e2) AS ste2,
               sum(CAST(e2 AS DECIMAL(20,2)) * e2) AS se2sq
        FROM aux
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(((CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(se2sq AS DOUBLE)
                       - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE))),
                 6) AS aux_r2,
           round(CAST(n AS DOUBLE)
                 * ((CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE)))
                   / ((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(se2sq AS DOUBLE)
                         - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE))),
                 6) AS bp_stat,
           (CAST(n AS DOUBLE)
            * ((CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(ste2 AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(se2 AS DOUBLE)))
              / ((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(se2sq AS DOUBLE)
                    - CAST(se2 AS DOUBLE) * CAST(se2 AS DOUBLE)))
            > 3.841) AS heteroscedastic_95
    FROM agg
"""


# agg_ship_delay_priority: Q12-shape conditional aggregate; the delay
# bucket derives from integer day arithmetic on midnight-aligned
# timestamps (exact in both engines).
ORACLE_SQL["agg_ship_delay_priority"] = """
    WITH j AS (
        SELECT date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS dd,
               o_orderpriority IN ('1-URGENT', '2-HIGH') AS high
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CASE WHEN dd <= 0 THEN 'early'
                WHEN dd <= 30 THEN '1-30'
                WHEN dd <= 90 THEN '31-90'
                ELSE '90+' END AS delay_bucket,
           CAST(sum(CASE WHEN high THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(sum(CASE WHEN high THEN 0 ELSE 1 END) AS BIGINT)
               AS low_line_count
    FROM j GROUP BY 1
"""

# window_sliding_distinct_users: the cover-set identity — a user
# counts toward day d iff active in [d-6, d], i.e. iff one of their
# active days covers d. Both derivations are dedup+count integer-exact.
ORACLE_SQL["window_sliding_distinct_users"] = """
    WITH pud AS (
        SELECT DISTINCT user_id AS uid, CAST(ts AS DATE) AS day
        FROM events
    ), mx AS (SELECT max(day) AS md FROM pud),
    cov AS (
        SELECT DISTINCT uid, day + CAST(i AS INT) AS d
        FROM pud, LATERAL (SELECT unnest(range(0, 7)) AS i) _, mx
        WHERE day + CAST(i AS INT) <= md
    )
    SELECT d AS day, CAST(count(*) AS BIGINT) AS rolling_users
    FROM cov GROUP BY 1
"""

# quality_isotonic_calibration: the minimax characterization of
# weighted isotonic regression — fit(i) = max_{j<=i} min_{k>=i}
# weighted-mean(y, bins j..k) — computed over prefix sums of the
# 100-bin integer aggregate (B^3/6 ~ 1.7e5 triples at B=100). The
# Spark side runs PAVA; both land on the unique L2 optimum, and every
# fitted value is one division of the same two exact integers.
ORACLE_SQL["quality_isotonic_calibration"] = f"""
    WITH scores AS ({_quality_logistic_oracle_sql()}),
    lab AS (
        SELECT s.doc_id, s.score, d.lang = 'en' AS y
        FROM scores s JOIN documents d USING (doc_id)
    ), bb AS (
        SELECT least(CAST(floor(round(CAST(score AS DOUBLE), 6)
                                * CAST(100 AS DOUBLE)) AS INT), 99)
                   AS bin,
               CASE WHEN y THEN 1 ELSE 0 END AS pos
        FROM lab WHERE score IS NOT NULL AND y IS NOT NULL
    ), g AS (
        SELECT bin, count(*) AS n, sum(pos) AS np FROM bb GROUP BY bin
    ), o AS (
        SELECT bin, n, np, row_number() OVER (ORDER BY bin) AS r
        FROM g
    ), c AS (
        SELECT r, sum(n) OVER (ORDER BY r) AS cn,
               sum(np) OVER (ORDER BY r) AS cp
        FROM o
    ), seg AS (
        SELECT j.r AS jr, k.r AS kr,
               CAST(k.cp - coalesce(j0.cp, 0) AS DOUBLE)
               / CAST(k.cn - coalesce(j0.cn, 0) AS DOUBLE) AS m
        FROM c k JOIN c j ON j.r <= k.r
        LEFT JOIN c j0 ON j0.r = j.r - 1
    ), mn AS (
        SELECT o.r AS ir, s.jr, min(s.m) AS mnv
        FROM o JOIN seg s ON s.jr <= o.r AND s.kr >= o.r
        GROUP BY 1, 2
    ), iso AS (
        SELECT ir AS r, max(mnv) AS v FROM mn GROUP BY ir
    )
    SELECT o.bin, CAST(o.n AS BIGINT) AS n, CAST(o.np AS BIGINT) AS pos,
           round(CAST(o.np AS DOUBLE) / CAST(o.n AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS raw_rate,
           round(iso.v, 6) + CAST(0 AS DOUBLE) AS iso_rate
    FROM o JOIN iso USING (r)
"""


def _bpe_train_oracle_sql(
    n_merges: int = 6, min_count: int = 2, max_words: int = 1500
) -> str:
    """Unrolled-round oracle for bpe_train_merges: each round is
    (pair-count argmax with the (count DESC, pair ASC) total order) +
    (greedy non-overlapping rebuild via gaps-and-islands — candidate
    runs merge at odd in-run positions, the consumed successor drops),
    exactly the classic BPE trainer's semantics, derived independently
    of the Spark loop. All counts are integers; pair picks compare
    binary strings; nothing floats."""
    parts = [
        f"""
    WITH wc AS MATERIALIZED (
        SELECT word, count(*) AS n
        FROM (
            SELECT unnest(string_split(trim(regexp_replace(
                       lower(text), '\\s+', ' ', 'g')), ' ')) AS word
            FROM documents
        ) _ WHERE word <> ''
        GROUP BY word HAVING count(*) >= {min_count}
        ORDER BY n DESC, word ASC LIMIT {max_words}
    ), w0 AS MATERIALIZED (
        SELECT word, CAST(n AS BIGINT) AS n,
               list_append(string_split(word, ''), '</w>') AS toks
        FROM wc
    )"""
    ]
    for t in range(n_merges):
        parts.append(
            f""", p{t} AS (
        SELECT toks[i] AS a, toks[i + 1] AS b, sum(n) AS c
        FROM w{t}, LATERAL (SELECT unnest(range(1, len(toks))) AS i) _
        GROUP BY 1, 2
    ), b{t} AS MATERIALIZED (
        SELECT a, b, c FROM p{t} ORDER BY c DESC, a ASC, b ASC LIMIT 1
    ), tk{t} AS (
        SELECT word, n, CAST(i AS INT) AS i, toks[i] AS t
        FROM w{t},
             LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) _
    ), c1{t} AS (
        SELECT *, lead(t) OVER (PARTITION BY word ORDER BY i) AS nt
        FROM tk{t}
    ), c2{t} AS (
        SELECT *, CASE WHEN t = (SELECT a FROM b{t})
                        AND nt = (SELECT b FROM b{t})
                       THEN 1 ELSE 0 END AS cand
        FROM c1{t}
    ), c3{t} AS (
        SELECT *, CASE WHEN cand = 1 THEN i - row_number() OVER (
                       PARTITION BY word, cand ORDER BY i) END AS isl
        FROM c2{t}
    ), c4{t} AS (
        SELECT *, cand = 1 AND row_number() OVER (
                      PARTITION BY word, isl ORDER BY i) % 2 = 1
                  AS start
        FROM c3{t}
    ), c5{t} AS (
        SELECT *, coalesce(lag(start) OVER (
                      PARTITION BY word ORDER BY i), false) AS consumed
        FROM c4{t}
    ), w{t + 1} AS MATERIALIZED (
        SELECT word, n,
               list(CASE WHEN start THEN t || nt ELSE t END
                    ORDER BY i) AS toks
        FROM c5{t} WHERE NOT consumed GROUP BY word, n
    )"""
        )
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT {t + 1} AS \"rank\", a AS left_sym, b AS right_sym,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{t}"
        for t in range(n_merges)
    )
    parts.append(f"\n    {unions}")
    return "".join(parts)


ORACLE_SQL["bpe_train_merges"] = _bpe_train_oracle_sql()


# Q2 shape oracle: the textbook CORRELATED-min form (the Spark side
# decorrelates via a window over the aggregate — independent
# derivations of the same set). cost is MATERIALIZED: it is referenced
# by the outer query AND per-part by the correlated subquery.
ORACLE_SQL["join_min_cost_supplier"] = """
    WITH cost AS MATERIALIZED (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS c
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name,
           CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
           round(CAST(c.c AS DOUBLE), 2) AS min_cost
    FROM part, supplier, nation, region, cost c
    WHERE p_partkey = c.pk AND s_suppkey = c.sk
      AND p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND c.c = (SELECT min(c2.c)
                 FROM cost c2, supplier s2, nation n2, region r2
                 WHERE c2.pk = p_partkey AND c2.sk = s2.s_suppkey
                   AND s2.s_nationkey = n2.n_nationkey
                   AND n2.n_regionkey = r2.r_regionkey
                   AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

# Q11 shape oracle: scalar subqueries for the global total and part
# count (the Spark side uses one window over the same aggregate).
# Integer cents end to end; the cross-multiply runs in HUGEINT.
ORACLE_SQL["agg_part_value_share"] = """
    WITH v AS MATERIALIZED (
        SELECT l_partkey,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS val_c
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = 2
        GROUP BY 1
    )
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
           round(CAST(val_c AS DOUBLE) / 100.0, 2) AS part_value
    FROM v
    WHERE CAST(val_c AS HUGEINT) * (SELECT count(*) FROM v)
          > 2 * (SELECT CAST(sum(val_c) AS HUGEINT) FROM v)
"""

# Q20 shape oracle: the textbook nested-EXISTS form with a correlated
# per-part total (the Spark side decorrelates via the per-part window).
# Pure integer quantities.
ORACLE_SQL["join_dominant_supplier"] = """
    WITH sp AS MATERIALIZED (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS BIGINT)) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3
      AND EXISTS (
        SELECT 1 FROM sp
        WHERE sp.l_suppkey = s_suppkey
          AND 2 * sp.q > (SELECT sum(q) FROM sp s2
                          WHERE s2.l_partkey = sp.l_partkey))
"""


# quality_roc_auc: the Mann-Whitney midrank identity on doubled units,
# HUGEINT until the single final division (the Spark side mirrors in
# DECIMAL(38,0)); +0.0 guards the -0.0 round split on gini.
ORACLE_SQL["quality_roc_auc"] = f"""
    WITH scores AS ({_quality_logistic_oracle_sql()}),
    lab AS (
        SELECT s.score, d.lang = 'en' AS y
        FROM scores s JOIN documents d USING (doc_id)
    ), base AS (
        SELECT round(CAST(score AS DOUBLE), 6) AS v, y
        FROM lab WHERE score IS NOT NULL AND y IS NOT NULL
    ), at_v AS (
        SELECT v, sum(CASE WHEN y THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN y THEN 0 ELSE 1 END) AS c0
        FROM base GROUP BY v
    ), r AS (
        SELECT *, coalesce(sum(c1 + c0) OVER (
            ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS cumb
        FROM at_v
    ), agg AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
               CAST(sum(c0) AS BIGINT) AS n_neg,
               sum(CAST(c1 AS HUGEINT)
                   * (2 * cumb + c1 + c0 + 1)) AS two_r
        FROM r
    ), fin AS (
        SELECT n_pos, n_neg,
               CAST(two_r - CAST(n_pos AS HUGEINT) * (n_pos + 1)
                    AS DOUBLE)
               / CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE)
                   AS araw
        FROM agg
    )
    SELECT n_pos, n_neg,
           round(araw, 6) + CAST(0 AS DOUBLE) AS auc,
           round(2.0 * araw - 1.0, 6) + CAST(0 AS DOUBLE) AS gini
    FROM fin
"""


# text_langid_kappa: the langid replay (same pinned tie rules as
# text_langid_confusion) + the single-division kappa identity in
# HUGEINT; +0.0 guards the -0.0 round split (kappa can be negative).
ORACLE_SQL["text_langid_kappa"] = """
    WITH s AS (
        SELECT lang,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('der','die','das','und','ist','nicht','mit','ein'))) AS s_de,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('the','and','of','to','in','is','that','with'))) AS s_en,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('el','la','los','las','es','no','por','para'))) AS s_es,
               len(list_filter(string_split(lower(text),' '), t -> t IN
                   ('le','la','les','et','est','pas','pour','dans'))) AS s_fr,
               len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
        FROM documents
    ), pred AS (
        SELECT lang AS a,
               CASE WHEN cjk > 0 THEN 'zh'
                    WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0
                        THEN 'und'
                    WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de
                        THEN 'fr'
                    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                    WHEN s_en >= s_de THEN 'en'
                    ELSE 'de' END AS b
        FROM s
    ), cm AS (
        SELECT a, b, count(*) AS c FROM pred GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
                   AS diag
        FROM cm
    ), ra AS (SELECT a, sum(c) AS r FROM cm GROUP BY a),
    cb AS (SELECT b, sum(c) AS cn FROM cm GROUP BY b),
    rc AS (
        -- coalesce: disjoint label sets -> empty join, true cross-term 0
        SELECT coalesce(sum(CAST(r AS HUGEINT) * cn),
                        CAST(0 AS HUGEINT)) AS src
        FROM ra JOIN cb ON a = b
    )
    SELECT n AS n_pairs, diag AS n_agree,
           round(CAST(CAST(n AS HUGEINT) * diag - src AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n - src AS DOUBLE), 6)
           + CAST(0 AS DOUBLE) AS kappa
    FROM tot, rc
"""
