"""Product/clickstream analytics over keyed event streams: conversion
attribution, RFM segmentation, and top session paths.

The engine-surface rows a warehouse team runs daily on the events
table — none exist in the reference (a single-threaded wiki ETL;
SURVEY §2 scopes these as the at-scale extension surface alongside the
funnel/retention/markov rows already in the bank).

Determinism conventions shared with the events family:
``(ts, event_id)`` is the total order everywhere (lineitem-style ts
ties are real), timestamps compare via ``unix_micros`` ≡ DuckDB
``epoch_us``, and "strictly before" means tuple-order
``(ts_a, id_a) < (ts_b, id_b)`` (the events_conversion_lag anchored
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribution_summary(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: every
    ``convert_type`` event is attributed to the earliest and the latest
    OTHER event strictly before it in its user's stream; per channel
    (event type) report both attribution counts and their shares.

    Tie-breaks: "strictly before" is tuple order on (ts, event_id);
    first/last touch are min_by/max_by over the same tuple — totally
    ordered, so both engines pick identical touches. Conversions with
    no prior touch are excluded (and countable as the difference from
    the conversion total, reported in the ``n_conversions`` column).

    Scale shape: ONE user-keyed join between the (small) conversion
    side and the touch side — per-user fanout is bounded by session
    activity, and the join key is the natural bucketing key at 100 TB
    (pre-bucket events by user_id and both sides co-locate). The
    argmin/argmax collapse happens in the same aggregate, no window
    over raw events. Output: one row per channel
    (channel, first_touch, last_touch, first_share, last_share).
    """
    us = F.unix_micros("ts")
    conv = events.filter(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("u"),
        us.alias("c_us"),
        F.col("event_id").alias("c_id"),
    )
    touch = events.filter(F.col(type_col) != convert_type).select(
        F.col(user_col).alias("u"),
        us.alias("t_us"),
        F.col("event_id").alias("t_id"),
        F.col(type_col).alias("channel"),
    )
    before = (F.col("t_us") < F.col("c_us")) | (
        (F.col("t_us") == F.col("c_us")) & (F.col("t_id") < F.col("c_id"))
    )
    order_key = F.struct(F.col("t_us").alias("us"), F.col("t_id").alias("id"))
    per_conv = (
        conv.join(touch, "u")
        .filter(before)
        .groupBy("u", "c_id")
        .agg(
            F.min_by(F.col("channel"), order_key).alias("first_channel"),
            F.max_by(F.col("channel"), order_key).alias("last_channel"),
        )
    )
    first = per_conv.groupBy(
        F.col("first_channel").alias("channel")
    ).agg(F.count(F.lit(1)).alias("first_touch"))
    last = per_conv.groupBy(F.col("last_channel").alias("channel")).agg(
        F.count(F.lit(1)).alias("last_touch")
    )
    tot = per_conv.groupBy().agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    return (
        first.join(last, "channel", "full_outer")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(tot.withColumn("_k", F.lit(1))), "_k")
        .select(
            "channel",
            F.coalesce("first_touch", F.lit(0)).alias("first_touch"),
            F.coalesce("last_touch", F.lit(0)).alias("last_touch"),
            "n_conversions",
            F.round(
                F.coalesce("first_touch", F.lit(0)).cast("double")
                / F.col("n_conversions").cast("double"),
                6,
            ).alias("first_share"),
            F.round(
                F.coalesce("last_touch", F.lit(0)).cast("double")
                / F.col("n_conversions").cast("double"),
                6,
            ).alias("last_share"),
        )
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation of
    customers from their order history, rolled up to segment cells —
    the classic CRM cube.

    Per customer: recency = days from last order to the corpus max
    date, frequency = order count, monetary = exact DECIMAL total.
    Quartiles via ``ntile(4)`` with the SQL-standard earlier-buckets-
    larger fill, totally ordered by (metric, custkey) so both engines
    cut identically; recency is ranked ascending (fresh = quartile 1),
    frequency/monetary descending (big = quartile 1).

    Scale shape: one groupBy(custkey) aggregate, three ntile windows
    over the *customer* table (1000× smaller than orders), one cell
    rollup. Output ≤ 64 rows: (r_q, f_q, m_q, n_customers,
    avg_monetary, avg_recency_days).
    """
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    wall = Window.partitionBy()
    with_rec = per_cust.withColumn(
        "recency_days",
        F.datediff(F.max("last_order").over(wall), F.col("last_order")),
    )
    seg = (
        with_rec.withColumn(
            "r_q",
            F.ntile(4).over(
                Window.orderBy(F.col("recency_days").asc(), F.col("custkey"))
            ),
        )
        .withColumn(
            "f_q",
            F.ntile(4).over(
                Window.orderBy(F.col("frequency").desc(), F.col("custkey"))
            ),
        )
        .withColumn(
            "m_q",
            F.ntile(4).over(
                Window.orderBy(F.col("monetary").desc(), F.col("custkey"))
            ),
        )
    )
    # Averages from exact sums (DECIMAL monetary; integer recency):
    # avg() over doubles is summation-order-dependent across engines.
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("monetary").cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("avg_monetary"),
        F.round(
            F.sum("recency_days").cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("avg_recency_days"),
    )


def top_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    path_len: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top session paths: sessionize each user's stream (inactivity gap,
    the window_sessionize convention), take the first ``path_len`` event
    types of every session in (ts, event_id) order, join them with
    ``>``, and return the ``k`` most frequent paths — the navigation-
    pattern miner (ClickHouse's sequence analysis / GA "top paths").

    Determinism: session boundaries from unix_micros gaps (exact
    integers); path assembly sorts (rn, type) structs — no
    collect_list order dependence; top-k breaks ties by path string.

    Scale shape: ONE user-keyed window shuffle (sessionize + row_number
    share it), one path aggregate whose key space is bounded by
    |types|^path_len, and a TakeOrdered top-k — no global sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros("ts")
    prev_us = F.lag(us).over(w)
    new_sess = (
        F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    )
    sess = events.withColumn(
        "sess_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_idx").orderBy("ts", "event_id")
    steps = sess.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= path_len
    )
    paths = steps.groupBy("user_id", "sess_idx").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("rn").alias("rn"),
                            F.col("event_type").alias("et"),
                        )
                    )
                ),
                lambda s: s.et,
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return counted.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(k)


def user_growth(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily active / new / cumulative user counts — the growth
    triptych on every product dashboard: DAU = distinct users active
    that day, new = users whose FIRST-ever activity is that day,
    cumulative = running total of new (≡ distinct users ever seen).

    Integer-exact throughout: one per-(user, day) dedup aggregate that
    also carries each user's first day (a min over the user's rows —
    no per-user window), then a per-day count and one ordered
    cumulative window over the skinny day table.

    Scale shape: groupBy(user) for first-day (shuffles user ids once),
    groupBy(user, day) dedup rides the same exchange, day-level
    reduce, then a single-partition window over ~O(days) rows — the
    only single-node step is over the day table, never the raw events.
    Output: (day, dau, new_users, cum_users).
    """
    u = F.col(user_col)
    day = F.to_date(F.col(ts_col))
    per_user_day = df.select(u.alias("uid"), day.alias("day"))
    first_day = per_user_day.groupBy("uid").agg(
        F.min("day").alias("first_day")
    )
    active = per_user_day.distinct()
    daily = (
        active.join(first_day, "uid")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.sum(
                (F.col("day") == F.col("first_day")).cast("long")
            ).alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "dau",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def rolling_distinct_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact trailing-``window_days`` distinct users per day (rolling
    WAU/MAU) via per-user COVERAGE-INTERVAL MERGING: sliding
    COUNT(DISTINCT) has no native Spark form, the textbook
    day×activity range join re-reads every event per covered day, and
    the first cut here (cover-set expansion: explode each active day
    into the ``window_days`` days it covers + a second global
    distinct) measured SUPERLINEAR at the sf100 third decade (1.20 —
    the ×7 row blow-up and the second billion-row distinct cross the
    spill threshold while the answer itself is day-cardinality).

    This form never expands rows: a user covers day d iff active in
    [d−w+1, d], so their covered days are a UNION OF INTERVALS
    [day, day+w−1] — merged per user by gaps-and-islands over their
    sorted active days (new island when the gap exceeds ``w``), each
    island contributing +1 at its start and −1 after its clipped end,
    and a prefix sum over the DAY SPINE (a bounded dimension:
    sequence(min_day, max_day), thousands of rows) finishes. One
    shuffle on (uid) for the island window, one skinny groupBy(day)
    of 2 deltas per island, one dimension-sized cumulative window —
    linear in activity with constant ~2, zero blow-up, no giant
    distinct. Integer-exact throughout. Output: (day, rolling_users)
    for every day covered by ≥1 active user (count-0 gap days are
    omitted, matching the cover-set semantics).
    """
    w = int(window_days)
    active = df.select(
        F.col(user_col).alias("uid"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    uw = Window.partitionBy("uid").orderBy("day")
    isl = (
        active.withColumn("prev", F.lag("day").over(uw))
        .withColumn(
            "brk",
            (
                F.col("prev").isNull()
                | (F.datediff(F.col("day"), F.col("prev")) > F.lit(w))
            ).cast("int"),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(
                uw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    # The ONE pass over the corpus ends here: the island table is
    # entity-sized (≤ one row per user per activity gap), and every
    # downstream reference (the day scalar, the clip, both deltas, the
    # spine) reads the checkpoint — without it, the unionAll/scalar
    # branches each re-derive the corpus distinct + per-user window
    # (observed: 9 source references, 1 reused exchange).
    spans0 = (
        isl.groupBy("uid", "isl")
        .agg(F.min("day").alias("s"), F.max("day").alias("e"))
        .select("s", "e")
        .localCheckpoint(eager=True)
    )
    # corpus min/max day derive from the islands exactly: every user's
    # first/last active day is some island's s/e
    mx = spans0.agg(
        F.min("s").alias("min_day"), F.max("e").alias("max_day")
    )
    spans = spans0.crossJoin(F.broadcast(mx)).select(
        "s",
        F.least(
            F.date_add(F.col("e"), w - 1), F.col("max_day")
        ).alias("e2"),
    )
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("day"), F.lit(1).alias("d")
                ),
                F.struct(
                    F.date_add(F.col("e2"), 1).alias("day"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    dd = deltas.groupBy("day").agg(F.sum("d").alias("delta"))
    spine = mx.select(
        F.explode(
            F.sequence(F.col("min_day"), F.col("max_day"))
        ).alias("day")
    )
    cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(dd, "day", "left")
        .withColumn(
            "rolling_users",
            F.sum(F.coalesce(F.col("delta"), F.lit(0))).over(cum),
        )
        .filter(F.col("rolling_users") > 0)
        .select("day", F.col("rolling_users").cast("long").alias(
            "rolling_users"
        ))
    )


def pareto_abc(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
    scale: int = 4,
) -> DataFrame:
    """ABC / Pareto analysis: keys ranked by total value, classified by
    the cumulative-share thresholds (class A carries the first
    ``a_cut`` of value, B up to ``b_cut``, C the tail) — the 80/20
    inventory/revenue concentration report.

    Determinism: per-key totals accumulate in DECIMAL (exact for
    fixed-point inputs), the cumulative window runs over the TOTAL
    order (value desc, key asc), and the share each classification
    compares is rounded to 9dp first, so a last-ulp division
    difference can never flip a key's class.

    Scale shape: one map-side-combined groupBy(key), then ONE ordered
    cumulative window over the per-key table (rows = distinct keys ≪
    input; the global sort is inherent to ranked cumulative share —
    at 100 TB pre-bin by value magnitude and sort within bins), then a
    3-row class rollup. Output per class: (abc_class, n_keys, value,
    value_share).
    """
    dec = f"decimal(28,{scale})"
    v = F.col(value_col).cast(dec)
    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        F.sum(v).alias("val")
    )
    w = Window.orderBy(F.col("val").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    cum = per_key.withColumn("cum", F.sum("val").over(w)).withColumn(
        "tot", F.sum("val").over(tot)
    )
    share = F.round(
        F.col("cum").cast("double") / F.col("tot").cast("double"), 9
    )
    cls = (
        F.when(share <= F.lit(float(a_cut)), F.lit("A"))
        .when(share <= F.lit(float(b_cut)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        cum.select(cls.alias("abc_class"), "val", "tot")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum("val").cast("double"), 2).alias("value"),
            F.round(
                F.sum("val").cast("double")
                / F.max("tot").cast("double"),
                6,
            ).alias("value_share"),
        )
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    signup_type: str = "signup",
    revenue_type: str = "purchase",
    type_col: str = "event_type",
    value_col: str = "value",
    scale: int = 2,
) -> DataFrame:
    """Cohort LTV curves: users grouped by SIGNUP WEEK, cumulative
    revenue per user as a function of account age in days — the
    payback chart every growth team reads next to cohort retention
    (events_cohort_retention is the activity view; this is the money
    view).

    Determinism: revenue accumulates in DECIMAL (exact for fixed-point
    values); the cumulative window runs over the integer age order;
    LTV-per-user is one exact-input division rounded 6dp. Cohort =
    date_trunc('week') — Monday-based in BOTH engines.

    Scale shape: one per-user min (signup day), one user-keyed join of
    revenue events onto their cohort, one (cohort, age) aggregate,
    then a cumulative window over the bounded (cohort × age) table.
    Output: (cohort, age_days, n_users, revenue_cum, ltv_per_user).
    """
    dec = f"decimal(18,{scale})"
    u = F.col(user_col)
    day = F.to_date(F.col(ts_col))
    signup = (
        df.filter(F.col(type_col) == signup_type)
        .groupBy(u.alias("uid"))
        .agg(F.min(day).alias("s_day"))
        .withColumn(
            "cohort", F.date_trunc("week", F.col("s_day")).cast("date")
        )
    )
    sizes = signup.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        df.filter(F.col(type_col) == revenue_type)
        .select(
            u.alias("uid"),
            day.alias("p_day"),
            F.col(value_col).cast(dec).alias("rev"),
        )
        .join(signup, "uid")
        .filter(F.col("p_day") >= F.col("s_day"))
        .groupBy(
            "cohort",
            F.datediff(F.col("p_day"), F.col("s_day")).alias("age_days"),
        )
        .agg(F.sum("rev").alias("rev_day"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.withColumn("revenue_cum", F.sum("rev_day").over(w))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_days",
            "n_users",
            F.col("revenue_cum").cast("double").alias("revenue_cum"),
            F.round(
                F.col("revenue_cum").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
    )


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    count_alias: str = "n_members",
) -> DataFrame:
    """2-D skyline (Pareto-dominance) query: keep the points not
    dominated on (``min_col`` smaller-is-better, ``max_col``
    larger-is-better) — the classic "cheapest-and-biggest" frontier
    operator from the OLAP literature (Börzsönyi et al., ICDE 2001),
    absent from both engines' builtin surface.

    A point (p, q) is dominated iff another point has p' ≤ p AND
    q' ≥ q with at least one strict. Dominance is decided on the
    DISTINCT (p, q) point set (duplicate points never dominate each
    other), with the member count carried through, via the
    sort-filter-skyline method: order points by (p ASC, q DESC); a
    point is dominated exactly when the running max of q over STRICTLY
    EARLIER points in that order is ≥ its own q (earlier rows have
    smaller p, or equal p with strictly larger q — both dominate).
    One window over the distinct-point table — integer/DECIMAL exact,
    no float in the dominance decision.

    Scale shape: groupBy(point) collapse first (points ≪ rows), then
    a single-dimension ordered window over the skinny point table. At
    100 TB the standard grid prefilter applies (drop any point
    dominated by its own grid cell's corner before the sort); the
    frontier itself is provably small for independent dims (O(log n)
    expected points).
    """
    pts = df.groupBy(
        F.col(min_col).alias("p"), F.col(max_col).alias("q")
    ).agg(F.count(F.lit(1)).alias(count_alias))
    w = Window.orderBy(F.asc("p"), F.desc("q")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = pts.withColumn("best_q_before", F.max("q").over(w))
    return (
        flagged.filter(
            F.col("best_q_before").isNull()
            | (F.col("best_q_before") < F.col("q"))
        )
        .select("p", "q", count_alias)
        .orderBy("p")
    )


ALS_ALPHA = 40  # implicit-feedback confidence slope (Hu-Koren-Volinsky)
ALS_LAMBDA_MICRO2 = 100_000_000_000  # λ = 0.1 in micro² units


def _round_div_half_away(num: int, den: int) -> int:
    """round-half-away-from-zero of ``num / den`` for exact Python
    ints, ``den > 0`` — the micro-requantization primitive of the ALS
    solve (HALF_UP on the true rational, so it agrees with Spark's
    BigDecimal HALF_UP and the oracle's HUGEINT division ladder by
    construction: no float anywhere)."""
    sign = -1 if num < 0 else 1
    q, r = divmod(num if num >= 0 else -num, den)
    return sign * (q + (1 if 2 * r >= den else 0))


def _als_requant_batches(batches):
    """Arrow mapInPandas kernel for the 2×2 normal-equation solve:
    inputs are the EXACT integer Gram/confidence/b accumulations in
    micro²/micro units (DECIMAL(38,0) → decimal.Decimal → int), the
    output the 6dp-micro factors via Cramer's rule requantized in
    unbounded Python integers — f = round_half_away(num·10¹² / det).

    Why bignum and not a DECIMAL ladder Spark-side: det = A00·A11 −
    A01² is micro⁴-scaled and grows with the global Gram (Σ over ALL
    entities), so num·10¹² passes 38 digits around sf1 — exceeding
    both DECIMAL(38) and int128. Python ints have no cap, the loop is
    O(entities) per half-sweep, and the arithmetic is identical to
    the oracle's in-range HUGEINT ladder (pinned by unit test)."""
    import pandas as pd

    scale = 10**12
    for pdf in batches:
        n = len(pdf)
        f0 = [0] * n
        f1 = [0] * n
        cols = [pdf[c] for c in ("a00m", "a01m", "a11m", "b0m", "b1m")]
        for i in range(n):
            a00, a01, a11, b0, b1 = (int(c.iat[i]) for c in cols)
            det = a00 * a11 - a01 * a01  # ≥ λ² > 0: A is PD
            f0[i] = _round_div_half_away((a11 * b0 - a01 * b1) * scale, det)
            f1[i] = _round_div_half_away((a00 * b1 - a01 * b0) * scale, det)
        yield pd.DataFrame(
            {"fid": pdf["fid"].astype("int64"), "f0u": f0, "f1u": f1}
        )


def _als_init_factors(ids: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 6dp item-factor init in exact integer micros:
    f0 = 0.1 + (id mod 17)·0.05, f1 = 0.05 + (id mod 13)·0.05 — all
    multiples of 0.05, so the micros are exact and both engines build
    byte-identical initial factors with pure integer arithmetic."""
    i = F.col(id_col).cast("long")
    return ids.select(
        i.alias("fid"),
        (F.lit(100000) + (i % 17) * 50000).cast("long").alias("f0u"),
        (F.lit(50000) + (i % 13) * 50000).cast("long").alias("f1u"),
    )


def _als_solve_side(
    inter: DataFrame,
    fac: DataFrame,
    solve_col: str,
    other_col: str,
    alpha: int,
    lam_micro2: int,
) -> DataFrame:
    """One half-sweep of rank-2 implicit ALS: solve every ``solve_col``
    entity's 2×2 normal equations given the other side's factors.

    A = YᵀY + α·Σ_obs r·y yᵀ + λI accumulates EXACTLY — factors are
    int64 micros, every product is int64, every sum is DECIMAL (≡
    DuckDB's hugeint Sum); the YᵀY Gram over ALL entities is one 1-row
    aggregate broadcast onto the per-entity correction (the classic
    implicit-ALS trick that keeps the solve O(obs), never O(entities)).
    The closed-form 2×2 solve is ALSO exact (r14 verdict #1: the old
    cast-to-double requantization could disagree with the oracle by
    one 6dp micro on a boundary double): Cramer numerators and det
    stay scaled integers and f = round_half_away(num·10¹²/det) runs
    in unbounded Python ints via :func:`_als_requant_batches` — the
    chain now has ZERO float steps, so the factors re-entering the
    next half-sweep are deterministic to the micro in any engine or
    summation order."""
    y = fac.select(
        F.col("fid").alias(other_col),
        F.col("f0u"),
        F.col("f1u"),
    )
    gram = F.broadcast(
        y.agg(
            F.sum((F.col("f0u") * F.col("f0u")).cast("decimal(30,0)"))
            .alias("g00"),
            F.sum((F.col("f0u") * F.col("f1u")).cast("decimal(30,0)"))
            .alias("g01"),
            F.sum((F.col("f1u") * F.col("f1u")).cast("decimal(30,0)"))
            .alias("g11"),
        )
    )
    r = F.col("r").cast("long")
    per = (
        inter.join(F.broadcast(y), other_col)
        .groupBy(solve_col)
        .agg(
            F.sum((r * F.col("f0u") * F.col("f0u")).cast("decimal(30,0)"))
            .alias("s00"),
            F.sum((r * F.col("f0u") * F.col("f1u")).cast("decimal(30,0)"))
            .alias("s01"),
            F.sum((r * F.col("f1u") * F.col("f1u")).cast("decimal(30,0)"))
            .alias("s11"),
            F.sum(
                ((F.lit(1) + F.lit(alpha) * r) * F.col("f0u")).cast(
                    "decimal(30,0)"
                )
            ).alias("b0"),
            F.sum(
                ((F.lit(1) + F.lit(alpha) * r) * F.col("f1u")).cast(
                    "decimal(30,0)"
                )
            ).alias("b1"),
        )
    )
    d38 = "decimal(38,0)"
    exact = per.join(gram).select(
        F.col(solve_col).cast("long").alias("fid"),
        (F.col("g00") + F.lit(alpha) * F.col("s00") + F.lit(lam_micro2))
        .cast(d38)
        .alias("a00m"),
        (F.col("g01") + F.lit(alpha) * F.col("s01")).cast(d38).alias("a01m"),
        (F.col("g11") + F.lit(alpha) * F.col("s11") + F.lit(lam_micro2))
        .cast(d38)
        .alias("a11m"),
        F.col("b0").cast(d38).alias("b0m"),
        F.col("b1").cast(d38).alias("b1m"),
    )
    return exact.mapInPandas(
        _als_requant_batches, schema="fid long, f0u long, f1u long"
    )


def als_implicit_rank2(
    interactions: DataFrame,
    user_col: str = "u",
    item_col: str = "it",
    rating_col: str = "r",
    sweeps: int = 2,
    alpha: int = ALS_ALPHA,
    lam_micro2: int = ALS_LAMBDA_MICRO2,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration implicit-feedback ALS matrix factorization at
    rank 2 (r13 verdict #4): the model-based recommender next to the
    :func:`item_item_cosine` neighborhood method. ``interactions`` is
    the (user, item, count) implicit matrix; returns the
    (user_factors, item_factors) frames as (fid, f0u, f1u) int64
    micros after ``sweeps`` alternating closed-form solves (Hu,
    Koren & Volinsky, ICDM 2008 — c = 1 + α·r confidence, p ≡ 1).

    Deterministic end to end with ZERO float steps (see
    :func:`_als_solve_side`): every accumulation is exact-integer and
    the solve requantizes through integer division, so the whole sweep
    chain is byte-replayable (the oracle mirrors it with a HUGEINT
    division ladder) — what makes the ``recsys_als_factors`` and
    ``recsys_als_eval`` driver rows oracle-checkable boundary-free.

    Scale shape: per half-sweep, ONE broadcast of the other side's
    factor table onto the interaction list, one groupBy(solve side)
    with map-side-combined DECIMAL sums, one 1-row Gram broadcast —
    cost O(interactions + entities), never entities²; each factor
    frame is lineage-cut so the alternation does not re-derive the
    upstream chain per reference. A factor table is 2 longs + id per
    entity; past the broadcast threshold (~10⁷ entities) drop the
    hint and the factor join becomes a plain key-shuffle — the
    aggregate shape is unchanged.
    """
    # The interaction list is O(obs) — the ONE table here that scales
    # with the corpus, re-read once per half-sweep. The default
    # localCheckpoint level pins it DESERIALIZED in executor heap,
    # which is exactly what OOMed the sf10 scale run (r15): checkpoint
    # it DISK_ONLY instead — serialized, zero heap residency, still
    # lineage-cut; the factor tables below stay at the default level
    # because they are entity-sized (2 longs + id per entity).
    from pyspark import StorageLevel

    inter = interactions.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("it"),
        F.col(rating_col).alias("r"),
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    items = _als_init_factors(
        inter.select("it").distinct(), "it"
    ).localCheckpoint(eager=False)
    users = None
    for _ in range(sweeps):
        users = _als_solve_side(
            inter, items, "u", "it", alpha, lam_micro2
        ).localCheckpoint(eager=False)
        items = _als_solve_side(
            inter, users, "it", "u", alpha, lam_micro2
        ).localCheckpoint(eager=False)
    return users, items


def als_rank_eval(
    user_factors: DataFrame,
    item_factors: DataFrame,
    train: DataFrame,
    test: DataFrame,
    k: int = 10,
    user_col: str = "u",
    item_col: str = "it",
) -> DataFrame:
    """Held-out ranking quality of an ALS factorization: for every test
    user (one with ≥1 held-out interaction AND trained factors), rank
    the items NOT in their training set by the exact integer factor
    dot product, and report hit-rate@k / MRR@k against the held-out
    items — the recommender eval loop next to the LTR train→metrics
    pair.

    Determinism: scores are exact int64 dots of 6dp-micro factors (no
    float anywhere in the ranking), ordered (score DESC, item ASC);
    reciprocal ranks accumulate as integers scaled by lcm(1..k), the
    6dp HALF_UP rounding of both means is exact integer arithmetic
    ((2·a·10⁶ + b) div (2·b)), and the only float step anywhere is the
    final division of that integer by 10⁶ — correctly rounded IEEE,
    identical in every engine and engine version (r16).

    Scale shape: the brute ranking is ONE broadcast of the test-user
    factor cohort against the item-factor table (the brute-topk shape
    of similarity.py), an anti-join on the training pairs, and a
    per-user window — cost O(cohort × items); at 100 TB the cohort is
    the sampled eval set and the item side would go through the ANN
    index instead of the full scan."""
    import math as _math

    uf = user_factors.select(
        F.col("fid").alias("u"),
        F.col("f0u").alias("uf0"),
        F.col("f1u").alias("uf1"),
    )
    itf = item_factors.select(
        F.col("fid").alias("it"),
        F.col("f0u").alias("if0"),
        F.col("f1u").alias("if1"),
    )
    test_pairs = test.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("it")
    ).distinct()
    train_pairs = train.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("it")
    ).distinct()
    cohort = test_pairs.select("u").distinct().join(uf, "u")
    scored = (
        itf.join(F.broadcast(cohort))
        .withColumn(
            "score",
            F.col("uf0") * F.col("if0") + F.col("uf1") * F.col("if1"),
        )
        .join(train_pairs, ["u", "it"], "left_anti")
    )
    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("it"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    lcm = _math.lcm(*range(1, k + 1))
    per_user = (
        top.join(test_pairs, ["u", "it"])
        .groupBy("u")
        .agg(
            F.min("rank").alias("first_rank"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    joined = cohort.select("u").join(per_user, "u", "left")
    # The final metrics carry the ONLY remaining engine-sensitive step
    # this row ever had: round(double, 6). Spark rounds via the exact
    # BigDecimal expansion of the double; DuckDB multiplies by 10^6 in
    # floating point first, and that implementation has changed across
    # DuckDB releases — the one axis a local sweep cannot vary (r16;
    # the row was externally hash-red two rounds while bit-stable over
    # 9 local configs × master/partitions/memory, ALS_SWEEP artifact).
    # So the 6dp rounding itself is now EXACT INTEGER arithmetic in
    # both engines — round_half_up(a/b, 6) ≡ (2·a·10⁶ + b) div (2·b)
    # for a ≥ 0, b > 0 — and the only float step left is one double
    # division by 10⁶ of an exact integer, correctly rounded IEEE in
    # every engine. Values are identical to the old round() wherever
    # the old rounding was unambiguous (everywhere observed; the new
    # form removes only the ambiguity).
    aggd = joined.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_rank").alias("n_hit_users"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).alias("hits_at_k"),
        F.coalesce(
            F.sum((F.lit(lcm) / F.col("first_rank")).cast("long")),
            F.lit(0).cast("long"),
        ).alias("___rr"),
    )
    return aggd.select(
        "n_users",
        "n_hit_users",
        "hits_at_k",
        F.expr(
            """CASE WHEN n_users = 0 THEN NULL ELSE
                 CAST((2 * n_hit_users * 1000000 + n_users)
                      DIV (2 * n_users) AS DOUBLE) / 1000000.0
               END"""
        ).alias("hit_rate"),
        F.expr(
            f"""CASE WHEN n_users = 0 THEN NULL ELSE
                 CAST((2 * ___rr * 1000000 + n_users * {lcm})
                      DIV (2 * n_users * {lcm}) AS DOUBLE) / 1000000.0
               END"""
        ).alias("mrr"),
    )


def item_item_cosine(
    lineitem: DataFrame,
    k: int = 5,
    min_support: int = 2,
) -> DataFrame:
    """Item-item collaborative-filtering neighborhoods: cosine
    similarity between parts by order co-occurrence,
    cos(p, q) = support(p, q) / √(s_p · s_q), top-``k`` neighbors per
    item — the classic Amazon-style recommender primitive
    (Sarwar et al., WWW 2001) on the basket table.

    Determinism: supports and pair counts are integer-exact; cosine is
    one double sqrt/division of exact integers (identical in both
    engines), rounded 6dp; the per-item top-k has the
    (cosine DESC, neighbor ASC) total order.

    Scale shape: the pair generation is the basket_item_pairs
    self-equi-join on the order key — per-order fan-out is basket²
    (bounded baskets), never corpus²; item supports broadcast onto the
    pair table; the top-k is a per-item window over pairs that already
    passed the support floor. A hot-item cap (drop baskets above a
    size bound) is where this binds at 100 TB, same as the dedup caps.
    """
    basket = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = basket.select("o", F.col("p").alias("p1"))
    b = basket.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    both = pairs.select("p1", "p2", "support").union(
        pairs.select(
            F.col("p2").alias("p1"), F.col("p1").alias("p2"), "support"
        )
    )
    sup = basket.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    s1 = F.broadcast(sup.select(F.col("p").alias("p1"), F.col("s").alias("s1")))
    s2 = F.broadcast(sup.select(F.col("p").alias("p2"), F.col("s").alias("s2")))
    scored = (
        both.join(s1, "p1")
        .join(s2, "p2")
        .select(
            F.col("p1").alias("item"),
            F.col("p2").alias("neighbor"),
            F.col("support").cast("long").alias("support"),
            F.round(
                F.col("support").cast("double")
                / F.sqrt(
                    F.col("s1").cast("double") * F.col("s2").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cosine"), F.asc("neighbor")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
