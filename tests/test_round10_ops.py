"""Round-10 wiring of the five r9-snapshot operators (r9 verdict #1):
Z-order layout stats, gap-fill/LOCF, trailing z-score, per-group dynamic
quality threshold, cross-source overlap — each pinned by hand-computed
fixtures here AND an oracled bank row in plans/testdata_queries.py.
Plus regressions for the r9 advice items (stale bucketed catalog on
non-bucketed rebuild; delta_pipeline append idempotency)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.layout import (
    zorder_layout_stats,
    zorder_value,
)
from collection_templates_spark.operators.temporal import (
    gap_fill,
    trailing_zscore,
)
from collection_templates_spark.operators.training_prep import (
    cross_source_overlap,
    dynamic_quality_threshold,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_value_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 3, 5, 170, 255) for y in (0, 2, 7, 85, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton(x, y, 8), (x, y)


def test_zorder_layout_stats_quadrants(spark):
    # full 4x4 grid, bits=2, 4 buckets: the zorder cut is exactly the
    # four 2x2 quadrants (bucket = x1 + 2*y1); the roworder cut is the
    # four single-x columns (shift bits-log2(n)=0).
    grid = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(grid, "x long, y long")
    out = zorder_layout_stats(
        df, F.col("x"), F.col("y"), n_buckets=4, bits=2
    ).collect()
    z = {
        r.bucket: (r.n_rows, r.x_min, r.x_max, r.y_min, r.y_max, r.area)
        for r in out
        if r.layout == "zorder"
    }
    assert z == {
        0: (4, 0, 1, 0, 1, 4),
        1: (4, 2, 3, 0, 1, 4),
        2: (4, 0, 1, 2, 3, 4),
        3: (4, 2, 3, 2, 3, 4),
    }
    r = {
        b.bucket: (b.n_rows, b.x_min, b.x_max, b.y_min, b.y_max, b.area)
        for b in out
        if b.layout == "roworder"
    }
    assert r == {x: (4, x, x, 0, 3, 4) for x in range(4)}


def test_zorder_bounds_both_dimensions(spark):
    # 8x8 grid, 4 buckets: zorder buckets bound BOTH spans at 4;
    # roworder leaves y unbounded (span 8) — the data-skipping point.
    grid = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(grid, "x long, y long")
    out = zorder_layout_stats(
        df, F.col("x"), F.col("y"), n_buckets=4, bits=3
    ).collect()
    for row in out:
        if row.layout == "zorder":
            assert row.x_max - row.x_min == 3 and row.y_max - row.y_min == 3
        else:
            assert row.y_max - row.y_min == 7  # y unbounded per column pair


def test_zorder_layout_stats_rejects_out_of_domain(spark):
    # values >= 2**bits would silently alias in the Morton code; the
    # aggregated-row guard must fail loudly instead (r9 advice).
    df = spark.createDataFrame([(1, 1), (7, 2)], "x long, y long")
    with pytest.raises(Exception, match="zorder_layout_stats"):
        zorder_layout_stats(
            df, F.col("x"), F.col("y"), n_buckets=2, bits=2
        ).collect()


# ---------------------------------------------------------------------------
# gap_fill (LOCF)
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_gap_fill_locf_and_day_pick(spark):
    t = datetime.datetime
    ev = _ev(
        spark,
        [
            # user 1: two events on day 1 (later ts wins), gap days
            # 2-3, then day 4
            (1, t(2024, 1, 1, 10), 1.0, 1),
            (1, t(2024, 1, 1, 12), 2.0, 2),
            (1, t(2024, 1, 4, 9), 5.0, 3),
            # user 2: single observation → single grid row
            (2, t(2024, 1, 2, 8), 7.0, 4),
            # user 3: ts tie on day 1 — event_id desc breaks it
            (3, t(2024, 1, 1, 0), 3.0, 10),
            (3, t(2024, 1, 1, 0), 4.0, 11),
        ],
    )
    out = {
        (r.user_id, str(r.day)): (r.obs_value, r.filled_value, r.is_observed)
        for r in gap_fill(ev).collect()
    }
    assert out[(1, "2024-01-01")] == (2.0, 2.0, 1)
    assert out[(1, "2024-01-02")] == (None, 2.0, 0)
    assert out[(1, "2024-01-03")] == (None, 2.0, 0)
    assert out[(1, "2024-01-04")] == (5.0, 5.0, 1)
    assert out[(2, "2024-01-02")] == (7.0, 7.0, 1)
    assert out[(3, "2024-01-01")] == (4.0, 4.0, 1)
    assert len(out) == 6  # grid is per-key span, never the global span


# ---------------------------------------------------------------------------
# trailing_zscore
# ---------------------------------------------------------------------------


def test_trailing_zscore_hand_computed(spark):
    t = datetime.datetime
    vals = [10.0, 12.0, 11.0, 20.0, 12.0]
    ev = spark.createDataFrame(
        [
            ("a", t(2024, 1, 1, h), v, h)
            for h, v in enumerate(vals, start=1)
        ],
        "event_type string, ts timestamp, value double, event_id long",
    )
    out = {
        r.event_id: r
        for r in trailing_zscore(
            ev, window=3, min_n=2, threshold=1.0
        ).collect()
    }
    # cold start: 0 and 1 predecessors → NULL score, not anomalous
    assert (out[1].n_prev, out[1].z, out[1].is_anomaly) == (0, None, 0)
    assert (out[2].n_prev, out[2].z, out[2].is_anomaly) == (1, None, 0)
    # row 3: frame [10,12] → mu 11, sigma sqrt(2), z 0
    assert (out[3].mu, out[3].z, out[3].is_anomaly) == (
        11.0,
        0.0,
        0,
    )
    assert out[3].sigma == round(math.sqrt(2.0), 6)
    # row 4: frame [10,12,11] → mu 11, sigma 1, z 9 → anomaly
    assert (out[4].mu, out[4].sigma, out[4].z, out[4].is_anomaly) == (
        11.0,
        1.0,
        9.0,
        1,
    )
    # row 5: frame excludes the current row — [12,11,20], and the
    # rounding happens BEFORE the z arithmetic
    frame = [12.0, 11.0, 20.0]
    mu = round(sum(frame) / 3, 6)
    var = sum((v - sum(frame) / 3) ** 2 for v in frame) / 2
    sigma = round(math.sqrt(var), 6)
    assert out[5].mu == mu and out[5].sigma == sigma
    assert out[5].z == round((12.0 - mu) / sigma, 6)


def test_trailing_zscore_partitions_independent(spark):
    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            ("a", t(2024, 1, 1, 1), 1.0, 1),
            ("a", t(2024, 1, 1, 2), 2.0, 2),
            ("b", t(2024, 1, 1, 3), 100.0, 3),
        ],
        "event_type string, ts timestamp, value double, event_id long",
    )
    out = {
        r.event_id: r.n_prev
        for r in trailing_zscore(ev, window=3, min_n=2).collect()
    }
    assert out == {1: 0, 2: 1, 3: 0}  # b's row never sees a's history


# ---------------------------------------------------------------------------
# dynamic_quality_threshold
# ---------------------------------------------------------------------------


def test_dynamic_quality_threshold_per_group_cut(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),  # ttr 1.0      → pct_rank 0.0  keep
            (2, "en", "a a b"),  # ttr 0.666667 → pct_rank 0.5  keep
            (3, "en", "a a a"),  # ttr 0.333333 → pct_rank 1.0  drop
            (4, "fr", "x y"),  #  sole doc     → pct_rank 0.0  keep
            (5, "en", "!!!"),  #  zero tokens  → dropped from output
        ],
        "doc_id long, lang string, text string",
    )
    rows = {
        r.doc_id: r
        for r in dynamic_quality_threshold(
            docs, keep_fraction=0.6
        ).collect()
    }
    assert 5 not in rows
    assert (rows[1].ttr, rows[1].pct_rank, rows[1].keep) == (1.0, 0.0, 1)
    assert (rows[2].ttr, rows[2].pct_rank, rows[2].keep) == (
        0.666667,
        0.5,
        1,
    )
    assert (rows[3].ttr, rows[3].pct_rank, rows[3].keep) == (
        0.333333,
        1.0,
        0,
    )
    assert (rows[4].pct_rank, rows[4].keep) == (0.0, 1)
    assert (rows[2].n_tokens, rows[2].n_distinct) == (3, 2)


def test_dynamic_quality_threshold_tokenizes_like_langmodel(spark):
    # punctuation/case folding: "A, b-c!" → tokens a, b, c (ttr 1.0)
    docs = spark.createDataFrame(
        [(1, "en", "A, b-c!")], "doc_id long, lang string, text string"
    )
    row = dynamic_quality_threshold(docs).collect()[0]
    assert (row.n_tokens, row.n_distinct, row.ttr) == (3, 3, 1.0)


# ---------------------------------------------------------------------------
# cross_source_overlap
# ---------------------------------------------------------------------------


def test_cross_source_overlap_jaccard(spark):
    # chunk width 4 and all texts shorter → one chunk per doc; src A's
    # duplicated "x y" across two docs counts ONCE (DISTINCT per src)
    docs = spark.createDataFrame(
        [
            ("A", "x y"),
            ("A", "q q"),
            ("A", "x y"),
            ("B", "x y"),
            ("B", "z"),
            ("C", "w"),
        ],
        "source string, text string",
    )
    out = cross_source_overlap(docs, chunk_tokens=4).collect()
    assert len(out) == 1  # only pairs sharing >= 1 chunk appear
    r = out[0]
    assert (r.src_a, r.src_b) == ("A", "B")
    assert (r.n_a, r.n_b, r.n_shared) == (2, 2, 1)
    assert r.jaccard == round(1 / 3, 6)


# ---------------------------------------------------------------------------
# r9 advice regressions
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_nonbucketed_rebuild_drops_stale_catalog(spark, tmp_path):
    # build bucketed, then rebuild the SAME path non-bucketed: the
    # stale bucketed catalog entry must not survive to describe plain
    # parquet files ('Invalid bucket file' on probe otherwise).
    from collection_templates_spark.operators.incremental_dedup import (
        _bands_table_name,
        build_minhash_index,
        dedup_batch_against_index,
    )

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(10)))
         for i in range(6)],
        "doc_id long, text string",
    )
    build_minhash_index(docs, path, bucket_bands=4)
    assert spark.catalog.tableExists(_bands_table_name(path))
    build_minhash_index(docs, path, bucket_bands=None)
    assert not spark.catalog.tableExists(_bands_table_name(path))
    batch = spark.createDataFrame(
        [(100, " ".join(f"tok0x{j}" for j in range(10)))],
        "doc_id long, text string",
    )
    pairs = dedup_batch_against_index(spark, path, batch).collect()
    assert {(p.doc_new, p.doc_old) for p in pairs} == {(100, 0)}


@pytest.mark.slow
def test_delta_pipeline_append_is_idempotent(spark):
    # the memoized index is shared across invocations; re-running the
    # pipeline must not stack duplicate doc_ids into bands/shingles
    from collection_templates_spark.plans import testdata_queries as q

    sf = "/root/testdata/sf0.001"
    r1 = {r.stage: r.n for r in q.delta_pipeline(spark, sf).collect()}
    path, _ = q._incremental_probe_for(spark, sf)
    n1 = spark.read.parquet(f"{path}/bands").count()
    r2 = {r.stage: r.n for r in q.delta_pipeline(spark, sf).collect()}
    n2 = spark.read.parquet(f"{path}/bands").count()
    assert r1 == r2
    assert n1 == n2


# ---------------------------------------------------------------------------
# drift: binned histograms + JS divergence
# ---------------------------------------------------------------------------


def test_binned_counts_edges_and_clamp(spark):
    from collection_templates_spark.operators.drift import binned_counts

    df = spark.createDataFrame(
        [("g", 4.0), ("g", 3.9999), ("g", -5.0), ("g", 99.0), ("g", 0.0)],
        "grp string, v double",
    )
    out = {
        r.bin: r.n
        for r in binned_counts(
            df, "grp", "v", F.lit("s"), n_bins=5, lo=0.0, hi=10.0
        ).collect()
    }
    # width 2: 4.0 → bin 2, 3.9999 → bin 1, -5 clamps to 0, 99 to 4
    assert out == {2: 1, 1: 1, 0: 2, 4: 1}


def test_js_divergence_identical_zero_disjoint_ln2(spark):
    from collection_templates_spark.operators.drift import js_divergence

    rows = [("g", "a", float(v)) for v in (1, 5, 9)] + [
        ("g", "b", float(v)) for v in (1, 5, 9)
    ]
    rows += [("h", "a", 1.0), ("h", "b", 9.0)]  # disjoint bins
    rows += [("only_a", "a", 1.0)]  # missing side b → omitted
    df = spark.createDataFrame(rows, "grp string, split string, v double")
    out = {
        r.grp: (r.n_a, r.n_b, r.js_divergence)
        for r in js_divergence(
            df, "grp", "v", F.col("split"), "a", "b",
            n_bins=10, lo=0.0, hi=10.0,
        ).collect()
    }
    assert out["g"] == (3, 3, 0.0)
    assert out["h"] == (1, 1, round(math.log(2.0), 6))
    assert "only_a" not in out


def test_js_divergence_hand_computed(spark):
    from collection_templates_spark.operators.drift import js_divergence

    # split a: bins {0: p=.5, 1: p=.5}; split b: bin {0: q=1}
    df = spark.createDataFrame(
        [("g", "a", 0.5), ("g", "a", 1.5), ("g", "b", 0.5)],
        "grp string, split string, v double",
    )
    (row,) = js_divergence(
        df, "grp", "v", F.col("split"), "a", "b", n_bins=2, lo=0.0, hi=2.0
    ).collect()
    tp = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    tq = 1.0 * math.log(1.0 / 0.75)
    expected = round(round(0.5 * (0.5 * math.log(0.5 / 0.75))
                           + 0.5 * (1.0 * math.log(1.0 / 0.75)), 9)
                     + round(0.5 * (0.5 * math.log(0.5 / 0.25)), 9), 6)
    assert row.js_divergence == expected
    # and the unrounded value agrees to 6dp with the analytic JS
    assert abs(row.js_divergence - (0.5 * tp + 0.5 * tq)) < 1e-6


# ---------------------------------------------------------------------------
# winsorize_stats
# ---------------------------------------------------------------------------


def test_winsorize_stats_hand_computed(spark):
    from collection_templates_spark.operators.stats import winsorize_stats

    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 100)]
        + [("h", float(v)) for v in (10, 20, 30)],
        "grp string, v double",
    )
    out = {
        r.grp: r
        for r in winsorize_stats(df, "grp", "v", 0.25, 0.75).collect()
    }
    g = out["g"]  # (n-1)q: cut_lo idx 1 → 2.0, cut_hi idx 3 → 4.0
    assert (g.cut_lo, g.cut_hi) == (2.0, 4.0)
    assert (g.n_below, g.n_above) == (1, 1)
    assert (g.mean_raw, g.mean_winsorized) == (22.0, 3.0)
    h = out["h"]  # idx 0.5 → 15.0, idx 1.5 → 25.0
    assert (h.cut_lo, h.cut_hi) == (15.0, 25.0)
    assert (h.n_below, h.n_above) == (1, 1)
    assert (h.mean_raw, h.mean_winsorized) == (20.0, 20.0)


# ---------------------------------------------------------------------------
# token_pmi
# ---------------------------------------------------------------------------


def test_token_pmi_hand_computed(spark):
    from collection_templates_spark.operators.text_analysis import token_pmi

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = token_pmi(docs, min_count=2).collect()
    # N=6 tokens (a:3 b:2 c:1), M=4 adjacent pairs; only (a,b) has n2>=2
    assert len(out) == 1
    r = out[0]
    assert (r.prev, r.token, r.n_pair) == ("a", "b", 2)
    assert r.pmi == round(math.log((2 / 4) / ((3 / 6) * (2 / 6))), 6)


def test_token_pmi_min_count_cuts_rare_pairs(spark):
    from collection_templates_spark.operators.text_analysis import token_pmi

    docs = spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"
    )
    assert token_pmi(docs, min_count=2).collect() == []
    assert len(token_pmi(docs, min_count=1).collect()) == 2


# ---------------------------------------------------------------------------
# state_islands (gaps-and-islands / SCD2 build)
# ---------------------------------------------------------------------------


def test_state_islands_runs_and_intervals(spark):
    from collection_templates_spark.operators.temporal import state_islands

    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            (1, t(2024, 1, 1), "A", 1),
            (1, t(2024, 1, 2), "A", 2),
            (1, t(2024, 1, 3), "B", 3),
            (1, t(2024, 1, 4), "A", 4),
            (2, t(2024, 1, 1), "X", 5),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {
        (r.user_id, r.island): (
            r.state,
            r.valid_from,
            r.valid_to,
            r.last_seen,
            r.n_events,
        )
        for r in state_islands(ev).collect()
    }
    assert out[(1, 1)] == (
        "A", t(2024, 1, 1), t(2024, 1, 3), t(2024, 1, 2), 2
    )
    assert out[(1, 2)] == ("B", t(2024, 1, 3), t(2024, 1, 4), t(2024, 1, 3), 1)
    assert out[(1, 3)] == ("A", t(2024, 1, 4), None, t(2024, 1, 4), 1)
    assert out[(2, 1)] == ("X", t(2024, 1, 1), None, t(2024, 1, 1), 1)
    assert len(out) == 4


def test_state_islands_tie_broken_by_event_id(spark):
    from collection_templates_spark.operators.temporal import state_islands

    t = datetime.datetime
    # same ts: event_id orders B(6) after A(5) → two islands, A first
    ev = spark.createDataFrame(
        [(1, t(2024, 1, 1), "A", 5), (1, t(2024, 1, 1), "B", 6)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {r.island: r.state for r in state_islands(ev).collect()}
    assert out == {1: "A", 2: "B"}


# ---------------------------------------------------------------------------
# window_funnel
# ---------------------------------------------------------------------------


def test_window_funnel_ordering_window_and_strictness(spark):
    from collection_templates_spark.operators.temporal import window_funnel

    t = datetime.datetime
    rows = [
        # user 1: full chain within window
        (1, t(2024, 1, 1), "view"), (1, t(2024, 1, 2), "click"),
        (1, t(2024, 1, 3), "purchase"),
        # user 2: purchase without click → depth 1
        (2, t(2024, 1, 1), "view"), (2, t(2024, 1, 2), "purchase"),
        # user 3: click BEFORE first view doesn't count; later one does
        (3, t(2024, 1, 1), "click"), (3, t(2024, 1, 2), "view"),
        (3, t(2024, 1, 3), "click"),
        # user 4: click outside the 7-day window of the first view
        (4, t(2024, 1, 1), "view"), (4, t(2024, 1, 10), "click"),
        # user 5: never enters the funnel
        (5, t(2024, 1, 1), "purchase"),
        # user 6: same-ts click is NOT strictly after the view
        (6, t(2024, 1, 1), "view"), (6, t(2024, 1, 1), "click"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, s, i) for i, (u, ts, s) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {
        r.stage_idx: (r.stage, r.n_users, r.conversion)
        for r in window_funnel(
            ev, steps=("view", "click", "purchase"), window_days=7
        ).collect()
    }
    assert out[1] == ("view", 5, 1.0)       # users 1,2,3,4,6
    assert out[2] == ("click", 2, 0.4)      # users 1,3
    assert out[3] == ("purchase", 1, 0.2)   # user 1


def test_window_funnel_anchored_at_first_step(spark):
    from collection_templates_spark.operators.temporal import window_funnel

    t = datetime.datetime
    # click within 2 days of ITS predecessor but outside the window of
    # the stage-1 anchor → rejected (anchored semantics, not sliding)
    ev = spark.createDataFrame(
        [
            (1, t(2024, 1, 1), "view", 1),
            (1, t(2024, 1, 6), "click", 2),
            (1, t(2024, 1, 9), "purchase", 3),  # day 9 > day 1 + 7
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = {
        r.stage_idx: r.n_users
        for r in window_funnel(
            ev, steps=("view", "click", "purchase"), window_days=7
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 0}


# ---------------------------------------------------------------------------
# markov transitions
# ---------------------------------------------------------------------------


def test_markov_transitions_hand_computed(spark):
    from pyspark.sql import Window as W

    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            (1, t(2024, 1, 1), "A", 1),
            (1, t(2024, 1, 2), "B", 2),
            (1, t(2024, 1, 3), "A", 3),
            (1, t(2024, 1, 4), "B", 4),
            (2, t(2024, 1, 1), "A", 5),
            (2, t(2024, 1, 2), "A", 6),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("cur"),
            F.col("event_type").alias("nxt"),
        )
        .filter(F.col("cur").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.cur, r.nxt): r.n for r in pairs.collect()}
    # user1: A→B, B→A, A→B; user2: A→A — cross-user pairs never form
    assert got == {("A", "B"): 2, ("B", "A"): 1, ("A", "A"): 1}


# ---------------------------------------------------------------------------
# script_mix
# ---------------------------------------------------------------------------


def test_script_mix_classes_and_dominance(spark):
    from collection_templates_spark.operators.text_analysis import script_mix

    docs = spark.createDataFrame(
        [
            (1, "abc 12"),      # 3 latin, 2 digit, 1 space → latin
            (2, "中文a"),  # 2 cjk + 1 latin → cjk, mixed
            (3, "!!!"),         # other only
            (4, "99"),          # digit dominant
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_mix(docs).collect()}
    r1 = out[1]
    assert (r1.n_chars, r1.n_latin, r1.n_digit, r1.n_space) == (6, 3, 2, 1)
    assert (r1.dominant, r1.is_mixed) == ("latin", 0)
    assert r1.frac_latin == 0.5
    r2 = out[2]
    assert (r2.n_cjk, r2.n_latin, r2.dominant, r2.is_mixed) == (
        2, 1, "cjk", 1,
    )
    assert out[3].dominant == "other"
    assert out[4].dominant == "digit"


def test_script_mix_tie_priority(spark):
    from collection_templates_spark.operators.text_analysis import script_mix

    # equal latin and cjk counts → the fixed priority picks cjk
    docs = spark.createDataFrame(
        [(1, "a中")], "doc_id long, text string"
    )
    (row,) = script_mix(docs).collect()
    assert row.dominant == "cjk" and row.is_mixed == 1


# ---------------------------------------------------------------------------
# weighted_median
# ---------------------------------------------------------------------------


def test_weighted_median_hand_computed(spark):
    from collection_templates_spark.operators.stats import weighted_median

    df = spark.createDataFrame(
        # group g: values 1(w3), 2(w1), 10(w2) → total 6, half 3 →
        # cumulative 3 at v=1 crosses → lower weighted median 1.0
        [("g", 1.0, 3.0), ("g", 2.0, 1.0), ("g", 10.0, 2.0)]
        # group h: equal weights → ordinary lower median
        + [("h", float(v), 1.0) for v in (5, 6, 7, 8)],
        "grp string, v double, w double",
    )
    out = {
        r.grp: (r.w_total, r.w_median)
        for r in weighted_median(df, "grp", "v", "w").collect()
    }
    assert out["g"] == (6.0, 1.0)
    assert out["h"] == (4.0, 6.0)  # cw 2 >= 4/2 at the second value


def test_weighted_median_skews_with_weight(spark):
    from collection_templates_spark.operators.stats import weighted_median

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 100.0, 9.0)], "grp string, v double, w double"
    )
    (row,) = weighted_median(df, "grp", "v", "w").collect()
    assert row.w_median == 100.0  # weight mass, not row count, decides


def test_weighted_median_drops_nonpositive_weights(spark):
    from collection_templates_spark.operators.stats import weighted_median

    df = spark.createDataFrame(
        [("g", 50.0, 0.0), ("g", 1.0, 1.0), ("g", 2.0, None)],
        "grp string, v double, w double",
    )
    (row,) = weighted_median(df, "grp", "v", "w").collect()
    assert (row.w_total, row.w_median) == (1.0, 1.0)


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _lpa_reference(edge_list, iterations):
    """Independent pure-python synchronous LPA with min-label ties."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for u, v in edge_list:
        nbrs[u].add(v)
        nbrs[v].add(u)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n in nbrs:
            counts = Counter(labels[m] for m in nbrs[n])
            top = max(counts.values())
            new[n] = min(l for l, c in counts.items() if c == top)
        labels = new
    return labels


def test_label_propagation_matches_reference(spark):
    from collection_templates_spark.operators.graph import label_propagation

    # two triangles joined by one bridge, plus a pendant node
    edge_list = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
                 (6, 7)]
    edges = spark.createDataFrame(edge_list, "u long, v long")
    for its in (1, 2, 3):
        got = {
            r.node: r.community
            for r in label_propagation(edges, iterations=its).collect()
        }
        assert got == _lpa_reference(edge_list, its), its


def test_label_propagation_separates_disjoint_components(spark):
    from collection_templates_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "u long, v long",
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_semantics(spark):
    from collection_templates_spark.operators.snapshot_diff import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, payload string"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", "update"),    # matched non-delete → overwrite
            (3, None, "archive"),  # matched delete → removed
            (4, "d", "insert"),    # unmatched → insert
        ],
        "k long, payload string, op string",
    )
    out = {r.k: r.payload for r in merge_upsert(base, changes, "k").collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_merge_upsert_noop_on_empty_changes(spark):
    from collection_templates_spark.operators.snapshot_diff import (
        merge_upsert,
    )

    base = spark.createDataFrame([(1, "a")], "k long, payload string")
    changes = spark.createDataFrame([], "k long, payload string, op string")
    assert [
        (r.k, r.payload) for r in merge_upsert(base, changes, "k").collect()
    ] == [(1, "a")]


# ---------------------------------------------------------------------------
# basket pairs + tf-idf (bank-row semantics on tiny fixtures)
# ---------------------------------------------------------------------------


def test_basket_pair_support_and_lift_semantics(spark):
    # replicate the bank row's expressions on a fixture: baskets
    # {A,B,C}, {A,B}, {A} → only (A,B) reaches support 2; lift
    # (2/3) / ((3/3)(2/3)) = 1.0; duplicate lines collapse (DISTINCT)
    li = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "B"), (1, "C"),
         (2, "A"), (2, "B"), (3, "A")],
        "o long, p string",
    )
    basket = li.distinct()
    a = basket.select("o", F.col("p").alias("p1"))
    b = basket.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    ).collect()
    assert [(r.p1, r.p2, r.support) for r in pairs] == [("A", "B", 2)]


def test_tfidf_top_terms_hand_computed(spark):
    import math as m

    from collection_templates_spark.functions.langmodel import (
        bigram_pair_stream,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird"), (3, "bird bird bird fish")],
        "doc_id long, text string",
    )
    pairs = bigram_pair_stream(docs)
    tf = pairs.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window as W

    scored = tf.join(df_tbl, "token").select(
        F.col("doc").alias("doc_id"),
        "token",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(3.0) / F.col("df").cast("double")),
            6,
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    got = {(r.doc_id, r.rank): (r.token, r.tfidf) for r in top}
    assert got[(1, 1)] == ("cat", round(2 * m.log(3), 6))
    assert got[(1, 2)] == ("dog", round(m.log(1.5), 6))
    assert got[(3, 1)] == ("bird", round(3 * m.log(1.5), 6))
    assert got[(3, 2)] == ("fish", round(m.log(3), 6))


# ---------------------------------------------------------------------------
# welch t + zipf fit
# ---------------------------------------------------------------------------


def test_welch_t_hand_computed(spark):
    from collection_templates_spark.operators.drift import welch_t_by_group

    # a: [1,2,3] (mean 2, var 1); b: [4,6] (mean 5, var 2)
    rows = [("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
            ("g", "b", 4.0), ("g", "b", 6.0)]
    df = spark.createDataFrame(rows, "grp string, split string, v double")
    (r,) = welch_t_by_group(
        df, "grp", "v", F.col("split"), "a", "b"
    ).collect()
    va, vb = 1.0 / 3, 2.0 / 2
    t = (2.0 - 5.0) / math.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va**2 / 2 + vb**2 / 1)
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (3, 2, 2.0, 5.0)
    assert r.t_stat == round(t, 6)
    assert r.welch_df == round(dof, 2)


def test_welch_t_zero_for_identical_slices(spark):
    from collection_templates_spark.operators.drift import welch_t_by_group

    rows = [("g", s, float(v)) for s in ("a", "b") for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "grp string, split string, v double")
    (r,) = welch_t_by_group(
        df, "grp", "v", F.col("split"), "a", "b"
    ).collect()
    assert r.t_stat == 0.0


def test_zipf_fit_exact_power_law(spark):
    from collection_templates_spark.operators.text_analysis import zipf_fit

    # construct a corpus whose counts are exactly 64/rank for ranks
    # 1,2,4,8,...: ln(freq) = ln(64) - 1·ln(rank) → slope -1 exactly
    rows = []
    doc = 0
    for rank, n in [(1, 64), (2, 32), (4, 16), (8, 8)]:
        # token names chosen so count order == alphabetical tie order
        rows.append((doc, " ".join([f"t{rank:02d}"] * n)))
        doc += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    (r,) = zipf_fit(docs, max_rank=10).collect()
    assert r.n_terms == 4
    # points: (ln1,ln64),(ln2,ln32),(ln4? no — ranks are 1..4 by
    # row_number, not the designed 1,2,4,8
    # → fit the actual points independently
    import numpy as np

    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([64.0, 32.0, 16.0, 8.0]))
    k = 4.0
    sx, sy = round(x.sum(), 6), round(y.sum(), 6)
    sxy, sxx = round((x * y).sum(), 6), round((x * x).sum(), 6)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert r.slope == round(slope, 4)
    assert r.intercept == round((sy - slope * sx) / k, 4)


# ---------------------------------------------------------------------------
# cluster report + conversion lag (bank-row semantics on fixtures)
# ---------------------------------------------------------------------------


def test_cluster_report_histogram_semantics(spark):
    # sizes: one 3-cluster, one 2-cluster, two singletons → histogram
    from collection_templates_spark.operators.clustering import (
        dedup_keep_canonical,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}", 1) for i in range(7)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc1 long, doc2 long"
    )
    labeled = dedup_keep_canonical(docs, pairs).select("cluster")
    sizes = labeled.groupBy("cluster").agg(F.count(F.lit(1)).alias("size"))
    hist = {
        r.size: r.n
        for r in sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert hist == {3: 1, 2: 1, 1: 2}


def test_conversion_lag_strictly_after_first_view(spark):
    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            # user 1: view 10:00, purchases 09:00 (before → ignored)
            # and 12:00 → lag 7200 s
            (1, t(2024, 1, 1, 10), "view", 1),
            (1, t(2024, 1, 1, 9), "purchase", 2),
            (1, t(2024, 1, 1, 12), "purchase", 3),
            # user 2: purchase only → never converts
            (2, t(2024, 1, 1, 8), "purchase", 4),
            # user 3: view only
            (3, t(2024, 1, 1, 8), "view", 5),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_buy")
    )
    conv = (
        p.join(v, "user_id")
        .filter(F.col("t_buy") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t_buy").alias("t_buy"), F.min("t_view").alias("t_view"))
        .select(
            "user_id",
            (
                (F.unix_micros("t_buy") - F.unix_micros("t_view"))
                / F.lit(1000000.0)
            ).alias("sec"),
        )
        .collect()
    )
    assert [(r.user_id, r.sec) for r in conv] == [(1, 7200.0)]
