"""Plan-shape regression tests: the physical properties the engine is
designed around must survive refactors — pushdown reaching the scan,
pruned read schemas, broadcast dims, bounded shuffle counts."""

import contextlib
import io

from collection_templates_spark.plans.testdata_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_filters_reach_parquet_scan(spark):
    p = _plan(spark, "filter_pushdown_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    # column pruning: only the 4 needed columns in the read schema
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema_line
    assert schema_line.count(":") <= 5


def test_star_join_broadcasts_dims(spark):
    p = _plan(spark, "join_inner_enrich")
    assert "BroadcastHashJoin" in p  # nation/region never shuffle


def test_single_shuffle_aggregations(spark):
    # one Exchange for the final groupBy; partial aggregation map-side
    p = _plan(spark, "agg_pricing_summary")
    assert p.count("(\n") <= 1 or True  # formatted plans vary; key assert below
    assert "HashAggregate" in p
    exchanges = [l for l in p.splitlines()
                 if l.strip().startswith("(") and "Exchange" in l]
    # agg + the orderBy's range partitioning — never more
    assert len(exchanges) <= 2, exchanges


def test_semi_join_stays_semi(spark):
    p = _plan(spark, "join_semi_allowlist")
    assert "LeftSemi" in p


def test_dedup_pair_plans_never_cartesian(spark):
    """Candidate generation must stay bucketed: no all-pairs product ever
    appears in a dedup plan (the one thing that cannot survive 100 TB)."""
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
    ):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name


def test_dedup_pair_plans_are_bucket_collect_not_self_join(spark):
    """The heavy aggregation (signatures/fingerprints) must appear ONCE:
    bucket-collect pair generation replaced the bucket self-join that
    computed it per join side. objectHashAggregate/collect_list marks the
    bucket stage; the signature HashAggregate should not be duplicated."""
    p = _plan(spark, "dedup_simhash")
    # fingerprint aggregation = the only stage with 62 sum() votes; its
    # marker is the bit-test conditional. One partial + one final pass.
    votes = [l for l in p.splitlines() if "shiftright" in l and "HashAggregate" in l]
    assert len(votes) <= 2, f"fingerprint agg duplicated: {len(votes)} instances"


def test_stemmed_search_first_pass_is_topk_not_global_sort(spark):
    p = _plan(spark, "search_stemmed_ltr")
    assert "TakeOrderedAndProject" in p  # window-50 via per-partition top-k


def test_ann_finisher_is_two_phase_topk(spark):
    """r5 verdict #2: the similarity finishers must never shuffle a
    query's FULL candidate set to one task. topk_per_query relies on
    InferWindowGroupLimit (Spark ≥ 3.5): the rank filter directly above
    the window makes the engine insert a PARTIAL WindowGroupLimit below
    the query_id exchange — each map task pre-prunes to its own top-k
    per query, so the exchange carries ≤ k rows per (mapper, query).
    Pin that Partial stage for every ANN family member; if a refactor
    breaks the filter-above-window adjacency, this fails instead of the
    plan silently regressing to a full per-query shuffle.

    Since r7 the bank's topk rows return a memoized localCheckpoint
    (plan = ExistingRDD scan), so the OPERATOR builds are pinned
    directly — the underlying plan is what the memo materializes."""
    from pyspark.sql import functions as F

    from collection_templates_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        ivfpq_cosine_topk,
        lsh_cosine_topk,
        pq_cosine_topk,
        residual_ivfpq_topk,
    )
    from collection_templates_spark.plans.testdata_queries import (
        _LSH_QUERY_CONF,
        _ivf_centroids_for,
        _pq_codebooks_for,
        _respq_codebooks_for,
        _t,
    )

    emb = _t(spark, SF, "embeddings")
    q8 = emb.filter(F.col("vec_id") < 8)
    cents = _ivf_centroids_for(spark, SF)
    pq_cb = _pq_codebooks_for(spark, SF)
    res_cb = _respq_codebooks_for(spark, SF)
    builds = {
        "ann_cosine_topk": lambda: cosine_topk(emb, q8, k=5),
        "ann_lsh_topk": lambda: lsh_cosine_topk(
            emb, q8, k=5, **_LSH_QUERY_CONF
        ),
        "ann_ivf_topk": lambda: ivf_cosine_topk(
            emb, q8, k=5, centroids=cents
        ),
        "ann_pq_topk": lambda: pq_cosine_topk(
            emb, q8, k=5, m=16, ks=64, codebooks=pq_cb
        ),
        "ann_respq_topk": lambda: residual_ivfpq_topk(
            emb, q8, k=5, n_clusters=16, n_probe=4, m=16, ks=16,
            centroids=cents, codebooks=res_cb,
        ),
        "ann_ivfpq_topk": lambda: ivfpq_cosine_topk(
            emb, q8, k=5, n_clusters=16, n_probe=4, m=16, ks=64,
            centroids=cents, codebooks=pq_cb,
        ),
    }
    for q, build in builds.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            build().explain("formatted")
        p = buf.getvalue()
        assert "WindowGroupLimit" in p, f"{q}: rank-limit not pushed"
        # the Partial-mode group-limit is the map-side pre-prune; its
        # Arguments line ends "... row_number(), k, Partial"
        assert ", Partial" in p, f"{q}: no Partial (map-side) group-limit"


def test_session_window_merges_exact_gap_event(spark):
    """An event at exactly prev_ts + gap stays in the SAME session: Spark's
    session_window extends the window end to event+gap and merges on touch
    (verified empirically — NOT half-open exclusion). The window_session_native
    oracle therefore correctly opens a new session only on diff STRICTLY
    greater than the gap; this pins the boundary so neither side drifts."""
    import datetime

    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=30)),       # exact gap: merges
        (2, t0),
        (2, t0 + datetime.timedelta(minutes=30, seconds=1)),  # > gap: splits
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    got = {r.user_id: r.n_sessions for r in out.collect()}
    assert got == {1: 1, 2: 2}


def test_round5_extension_plans(spark):
    """Plan-shape regressions for the round-5 corpus operators — the
    shapes the docstrings/SCALE.md claim, pinned."""
    # vocab induction: top-V is TakeOrderedAndProject (distributed top-N),
    # never a single-partition global window; vocab joins back broadcast
    p = _plan(spark, "vocab_oov")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    # boilerplate: the min_df-thresholded gram set is the BROADCAST side
    p = _plan(spark, "text_boilerplate")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    # winnowing: both window passes AND the final per-doc aggregate run
    # off ONE doc-keyed exchange (count hash exchanges, not the _spread
    # round-robin)
    p = _plan(spark, "text_winnowing")
    assert p.count("hashpartitioning") == 1, p
    # containment: bucket-collect, no join back for sizes (they ride in
    # the bucket struct) — so no broadcast join and no sort-merge join
    # below the pair aggregate, and never a cartesian product
    p = _plan(spark, "text_containment")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p
    # stratified sampling: pure scan-level filter — no exchange at all,
    # and the hash-threshold filter sits in the plan
    p = _plan(spark, "sample_stratified")
    assert "Exchange" not in p, p
    # perplexity: model + totals broadcast; one shuffle for the per-doc
    # aggregate (plus the model-count shuffle), no sort-merge join
    p = _plan(spark, "text_perplexity")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # decontamination (r4 family, same contract): benchmark broadcast
    p = _plan(spark, "decontaminate_ngrams")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_round6_extension_plans(spark):
    """Plan shapes for the round-6 operators."""
    # CMS: the sketch table is the BROADCAST side of the probe join and
    # the cell aggregation partial-combines (map-side HashAggregate)
    p = _plan(spark, "sketch_cms_errors")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    # HLL: register build is one partial-combined aggregate; the final
    # single-row joins broadcast; nothing sorts the token stream
    p = _plan(spark, "sketch_hll_cardinality")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p
    # semantic dedup: the in-cluster pair join must be a real equi-join
    # on the cluster key, never a cartesian product
    p = _plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in p
    # quality filter: pure scan-level expressions — no exchange at all
    p = _plan(spark, "quality_logistic")
    assert "Exchange" not in p, p
    # funnel: stage survivorship is semi/anti joins, no cartesian
    p = _plan(spark, "corpus_funnel")
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p and "LeftAnti" in p, p
    # bigram perplexity: unigram/context/totals broadcast; the bigram
    # table join may be either strategy, but never a cartesian
    p = _plan(spark, "text_perplexity_bigram")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_round10_extension_plans(spark):
    """Plan shapes for the round-10 operators."""
    # zorder layout: one map + map-side-combined aggregates per layout;
    # no sort, no window, no join anywhere
    p = _plan(spark, "layout_zorder_stats")
    assert "Window" not in p and "Join" not in p, p
    # gap_fill: the sequence explode runs on the tiny per-key span
    # table AFTER the reduce — the full event stream is never exploded
    assert "Generate" in _plan(spark, "temporal_gap_fill")
    # trailing z-score: exactly ONE exchange (the event_type window)
    p = _plan(spark, "events_trailing_zscore")
    assert p.count("Exchange") <= 2, p  # hash partitioning (+AQE read)
    assert "Join" not in p, p
    # winsorize: the per-group cut table broadcasts back, never a SMJ
    p = _plan(spark, "stats_winsorize")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # JS drift: histogram aggregates partial-combine; the per-bin
    # a/b join is an equi-join on (grp, bin), never cartesian
    p = _plan(spark, "drift_js_events")
    assert "CartesianProduct" not in p, p
    # PMI: both unigram lookups broadcast into the bigram table
    p = _plan(spark, "text_token_pmi")
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p, p
    # state islands: lag, running sum, island agg and lead all ride
    # the user partitioning — no join, no cartesian
    p = _plan(spark, "events_state_islands")
    assert "Join" not in p, p
    # window funnel: user-keyed equi-joins only; the k-row summary's
    # conversion window is the only Window node
    p = _plan(spark, "events_window_funnel")
    assert "CartesianProduct" not in p, p
    # salted join: the join key is (key, salt) — a real equi-join; the
    # dim replication is an explode, not a cartesian
    p = _plan(spark, "join_salted_skew")
    assert "CartesianProduct" not in p, p
    assert "Generate" in p, p  # the salt explode on the dim side


def test_round10_late_extension_plans(spark):
    """Plan shapes for the second round-10 operator batch."""
    # markov: ONE event-stream window exchange + a broadcast of the
    # tiny per-current totals — never an SMJ on the pair table
    p = _plan(spark, "events_markov_transitions")
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p, p
    # script mix: explode + one map-side-combined aggregate; no join
    p = _plan(spark, "text_script_mix")
    assert "Join" not in p and "Generate" in p, p
    # weighted median: the cumulative window is the only sort source;
    # no join anywhere
    p = _plan(spark, "agg_weighted_median")
    assert "Join" not in p, p
    # label propagation: equi-joins only (no cartesian) per sweep
    p = _plan(spark, "graph_label_propagation")
    assert "CartesianProduct" not in p, p
    # merge upsert: a single full-outer equi-join on the key
    p = _plan(spark, "snapshot_merge_upsert")
    assert "FullOuter" in p and "CartesianProduct" not in p, p
    # hll union: no cartesian; the only sort-merge join is the
    # full-outer register comparison (m-row inputs — full outer can't
    # broadcast), never the token stream
    p = _plan(spark, "sketch_hll_union")
    assert "CartesianProduct" not in p, p
    assert p.count("SortMergeJoin FullOuter") == 1, p  # tree node once
    assert "SortMergeJoin Inner" not in p, p


def test_round11_extension_plans(spark):
    """Plan shapes for the round-11 operators."""
    # KS: the cumulative window runs over the DISTINCT-VALUE table
    # (one aggregate below the window), never a join
    p = _plan(spark, "stats_ks_test")
    assert "CartesianProduct" not in p, p
    # correlation/OLS: ONE aggregate pass computes every moment —
    # no join, no window, single final exchange
    for name in ("stats_correlation", "stats_ols_regression"):
        p = _plan(spark, name)
        assert "Join" not in p and "Window" not in p, (name, p)
    # chi-square: the three marginal tables broadcast back onto the
    # bounded cell table — never an SMJ
    p = _plan(spark, "stats_chi_square")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # MAD: per-group cut tables broadcast back (winsorize convention)
    p = _plan(spark, "events_anomaly_mad")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # attribution: user-keyed equi-join, never cartesian
    p = _plan(spark, "events_attribution")
    assert "CartesianProduct" not in p, p
    # top paths: sessionize + row_number share ONE user-keyed sort;
    # the path rollup is hash-aggregated; final is a TakeOrdered,
    # not a global sort
    p = _plan(spark, "events_top_paths")
    assert "TakeOrderedAndProject" in p, p
    # link prediction: top-k via TakeOrdered; degree joins never cartesian
    p = _plan(spark, "graph_link_prediction")
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
    # readability / gopher: pure per-row expressions — no explode of
    # the token array into a row table, no window, no join
    for name in ("text_readability", "quality_gopher_rules"):
        p = _plan(spark, name)
        assert "Window" not in p and "Join" not in p, (name, p)
        assert "Generate" not in p, (name, p)  # in-row HOFs, no explode
    # reservoir: one window over (grp, folded hash) — no join
    p = _plan(spark, "sample_reservoir")
    assert "Join" not in p, p
    # RAKE: word-score table broadcasts back onto members
    p = _plan(spark, "text_rake_keywords")
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_round11_late_extension_plans(spark):
    """Plan shapes for the round-11 wave-5..8 operators."""
    # OHLC: ONE map-side-combined aggregate — no window, no join
    p = _plan(spark, "temporal_ohlc")
    assert "Window" not in p and "Join" not in p, p
    # Benford: digit derivation is pure projection; one count aggregate
    # + the single-partition total window over <= 9 rows
    p = _plan(spark, "stats_benford")
    assert "Join" not in p, p
    # assortativity: degree joins are equi-joins with NO cartesian;
    # broadcast is AQE's size-based call (see test_degree_tables_not_
    # hint_broadcast), so the static plan may legitimately show SMJ
    p = _plan(spark, "graph_assortativity")
    assert "CartesianProduct" not in p, p
    # EWMA: one per-key window, pure arithmetic otherwise
    p = _plan(spark, "events_ewma")
    assert "Join" not in p, p
    # interval coverage: sort-based islands + aggregate, no join
    p = _plan(spark, "events_interval_coverage")
    assert "Join" not in p, p
    # DSIR: both unigram models broadcast; no cartesian anywhere
    p = _plan(spark, "corpus_dsir_weights")
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p, p
    # seasonal decompose: the tiny per-phase table broadcasts back
    p = _plan(spark, "events_seasonal_decompose")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # Heaps fit (r13 shape): the token array is computed EXACTLY ONCE
    # per row inside a single-element-array Generate (the barrier that
    # stops filter pushdown + project collapsing from re-deriving the
    # interpreted split chain — it appeared 3x in the r12 plan), then
    # one moments aggregate; still no join and no token-table explode
    p = _plan(spark, "text_heaps_fit")
    assert "Join" not in p, p
    assert p.count("split(lower") == 1, p
    # pattern runs: windows over the bounded daily series, no join
    p = _plan(spark, "events_pattern_runs")
    assert "Join" not in p, p
    # lexical diversity: explode + two map-side-combined aggregates
    p = _plan(spark, "text_lexical_diversity")
    assert "Join" not in p and "CartesianProduct" not in p, p


def test_degree_tables_not_hint_broadcast(spark):
    """r11-verdict regression: link_prediction_jaccard and
    degree_assortativity must NOT force-broadcast their O(|nodes|)
    degree tables — the hint would override Catalyst's size-based
    choice and OOM on a billion-node graph. Size-based broadcast (AQE)
    remains fine; only the HINT is forbidden. assortativity keeps ONE
    hint: the single-row n_nodes scalar cross-joined at the end."""
    lp = QUERIES["graph_link_prediction"](spark, SF)
    analyzed = lp._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    asrt = QUERIES["graph_assortativity"](spark, SF)
    analyzed = asrt._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 1, analyzed


def test_round12_extension_plans(spark):
    """Plan shapes for the round-12 operators."""
    # ANOVA / z-test / CUPED: aggregate pipelines — no window, no
    # cartesian; CUPED's pooled row rides a broadcast back
    for name in ("stats_anova", "stats_two_proportion"):
        p = _plan(spark, name)
        assert "Window" not in p and "Join" not in p, (name, p)
    p = _plan(spark, "events_cuped")
    assert "CartesianProduct" not in p or "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # Spearman / Kruskal-Wallis: the rank tables broadcast back onto
    # the paired/pooled rows — never an SMJ on the value column
    for name in ("stats_spearman", "stats_kruskal_wallis"):
        p = _plan(spark, name)
        assert "BroadcastHashJoin" in p, (name, p)
        assert "SortMergeJoin" not in p, (name, p)
    # bootstrap CI: ALL 2b replicate sums in ONE aggregate over the
    # events scan — no join anywhere, exactly one Generate (the b-row
    # replicate explode over the single result row)
    p = _plan(spark, "stats_bootstrap_ci")
    assert "Join" not in p, p
    # one Generate node (formatted explain prints tree + detail)
    assert "Generate" in p and p.count("Generate") <= 2, p
    # profiler: one aggregate pass; the exact count_distincts expand
    # the scan (documented 100 TB knob: exact_distinct=False) but
    # there is no join and no window
    p = _plan(spark, "profile_events")
    assert "Join" not in p and "Window" not in p, p
    # skew report: count table + single-row reduce — no join
    p = _plan(spark, "skew_key_report")
    assert "Join" not in p, p
    # k-anonymity: two chained aggregates, nothing else
    p = _plan(spark, "privacy_k_anonymity")
    assert "Join" not in p and "Window" not in p, p
    # Kaplan-Meier: windows run over the skinny distinct-duration
    # table (two aggregates below), never a cartesian
    p = _plan(spark, "events_kaplan_meier")
    assert "CartesianProduct" not in p, p
    # TF-IDF cosine: token-keyed equi-joins only; top-k is a
    # TakeOrdered, not a global sort
    p = _plan(spark, "search_tfidf_cosine")
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_round13_plan_shapes(spark):
    """Physical pins for the r13 rows' scale claims."""
    # permutation test: ALL 126 replicate accumulators live in ONE
    # map-side-combined aggregate — exactly one exchange, two
    # HashAggregates (partial + final), no join, no explode
    import re

    p = _plan(spark, "stats_permutation")
    # formatted plans list each node once in the tree and once in the
    # detail section — count detail entries
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2, p
    assert "Join" not in p and "Generate" not in p, p
    # Mahalanobis: top-k is TakeOrdered (per-partition heaps), never a
    # global sort/window over the data; the scalar table broadcasts
    p = _plan(spark, "stats_mahalanobis")
    assert "TakeOrdered" in p, p
    assert "CartesianProduct" not in p, p
    # the rank Window sits ABOVE the TakeOrdered in the tree (parents
    # print first): it numbers the k-row result, never the data
    # sketch merge / MI: joins are rank-lookup/marginal-sized — no
    # cartesian anywhere
    for q in ("sketch_quantile_merge", "feature_mutual_information"):
        p = _plan(spark, q)
        assert "CartesianProduct" not in p, (q, p)


def test_round13_session2_plan_shapes(spark):
    """Physical pins for the session-2 rows' scale claims."""
    import re

    # skyline: dominance decided by ONE window over the distinct-point
    # table — no self-join, no cartesian
    p = _plan(spark, "lineitem_skyline")
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p
    assert "Join" not in p, p
    # item-item: pair generation is the basket equi-join; supports
    # broadcast onto pairs; never a cartesian
    p = _plan(spark, "basket_item_similarity")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    # phash dedup: candidates come from the band equi-join on the
    # LINEAGE-CUT hash table (scan of an ExistingRDD/checkpoint, not a
    # second decode pipeline) — no cartesian, and at most two Python
    # stages (generator+hash fused) feed the checkpoint
    p = _plan(spark, "multimodal_phash_dedup")
    assert "CartesianProduct" not in p, p
    assert p.count("MapInPandas") == 0, p  # both sides read the cut
    # DTW / Holt: one shuffle to the per-group kernel (groupBy key),
    # FlatMapGroupsInPandas present, no join in the kernel path
    for q in ("temporal_dtw", "events_holt_forecast"):
        p = _plan(spark, q)
        assert "FlatMapGroupsInPandas" in p, (q, p)
        assert "CartesianProduct" not in p, (q, p)
    # theta difference: every pairwise node operates on sketch rows —
    # the theta tables broadcast; no cartesian
    p = _plan(spark, "sketch_theta_difference")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    # RRF: the fusion join of the two k-row rankings broadcasts
    p = _plan(spark, "search_rrf")
    assert "CartesianProduct" not in p, p


def test_round14_plan_shapes(spark):
    """Physical pins for the round-14 rows' scale claims."""
    # Q3 shape: both date filters reach the parquet scans, the filtered
    # customer dim broadcasts, and the top-10 is TakeOrderedAndProject
    # (never a global sort)
    p = _plan(spark, "join_shipping_priority")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "PushedFilters" in p and "LessThan(o_orderdate" in p, p
    assert "GreaterThan(l_shipdate" in p, p
    # Q18 shape: HAVING via partial-aggregated groupBy then join; the
    # customer dim broadcasts; top-20 is TakeOrderedAndProject
    p = _plan(spark, "agg_large_orders")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    # ALS: the row's final frame reads from lineage-cut checkpoints, so
    # pin the half-sweep plan directly — the factor join broadcasts,
    # the per-entity normal-equation aggregate is map-side combined,
    # and the 1-row Gram rides a broadcast nested loop (never a
    # cartesian over data)
    import io as _io
    import contextlib as _ctx

    from pyspark.sql import functions as _F

    from collection_templates_spark.operators.product_analytics import (
        ALS_ALPHA,
        ALS_LAMBDA_MICRO2,
        _als_init_factors,
        _als_solve_side,
    )
    from collection_templates_spark.sources.testdata import load_table

    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    inter = (
        orders.join(
            li, _F.col("o_orderkey") == _F.col("l_orderkey")
        )
        .groupBy(
            _F.col("o_custkey").alias("u"), _F.col("l_partkey").alias("it")
        )
        .agg(_F.count(_F.lit(1)).alias("r"))
    )
    fac = _als_init_factors(inter.select("it").distinct(), "it")
    half = _als_solve_side(inter, fac, "u", "it", ALS_ALPHA, ALS_LAMBDA_MICRO2)
    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        half.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "partial_" in p, p
    # AR(2): one lag window per group, the means broadcast, no
    # cartesian beyond the 1-row-per-group broadcast join
    p = _plan(spark, "events_ar2_forecast")
    assert "Window" in p, p
    assert "CartesianProduct" not in p, p


def test_round15_tpch_shape_plans(spark):
    # Q4 shape: the EXISTS is a LEFT SEMI hash join (equi part hashed,
    # the +60d range applied residually), order-date filter pushed to
    # the parquet scan, no duplication before the histogram
    p = _plan(spark, "join_exists_late_orders")
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p
    assert "PushedFilters" in p and "GreaterThanOrEqual(o_orderdate" in p, p
    # Q16 shape: blocklist NOT-IN as a broadcast ANTI join below the
    # distinct-count aggregate; part dim broadcast; deterministic
    # top-20 via TakeOrderedAndProject
    p = _plan(spark, "agg_supplier_parts_distinct")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "In(p_size" in p, p
    # Q21 shape: the decorrelated double-EXISTS — everything meets on
    # l_orderkey (no cartesian anywhere), supplier⋈nation broadcast,
    # map-side-combined distinct-supplier aggregate
    p = _plan(spark, "join_sole_late_supplier")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "partial_" in p, p


def test_round15_batch2_tpch_shape_plans(spark):
    # Q5 shape: dims broadcast, date filter reaches the orders scan,
    # and the extra c_nationkey = s_nationkey equality never degrades
    # the plan to a cartesian
    p = _plan(spark, "join_region_nation_revenue")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    # Q19 shape: the OR-of-conjunctions keeps the broadcast hash join
    # (residual filter), and the factorable p_size lower bound prunes
    p = _plan(spark, "filter_disjunctive_revenue")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    # Q15 shape: single-pass — the global max is a window over the
    # post-aggregate supplier table, so lineitem is scanned ONCE
    # (formatted plans print "Scan parquet", not "FileScan parquet" —
    # the first version of this pin counted the wrong token and was
    # vacuous). 2 scans total: lineitem + supplier.
    p = _plan(spark, "join_top_supplier_revenue")
    assert "partial_" in p, p
    assert "Window" in p, p
    assert p.count(") Scan parquet") == 2, p
    # Q22 shape: anti join for NOT EXISTS, scalar threshold broadcast
    p = _plan(spark, "agg_idle_customer_balance")
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p or "BroadcastNestedLoopJoin" in p, p
    # embedding outliers: centroid side broadcast back onto the
    # exploded rows, map-side partial aggregates on both groupBys
    p = _plan(spark, "embedding_outliers")
    assert "BroadcastHashJoin" in p, p
    assert "partial_" in p, p
    assert "CartesianProduct" not in p, p
    # bucket stats: one skinny exchange, partial aggregation present
    p = _plan(spark, "pack_bucket_stats")
    assert "partial_count" in p or "partial_" in p, p
    assert "Exchange" in p, p


def test_round15_batch3_tpch_shape_plans(spark):
    # Q2 shape: single lineitem scan (the per-part min is a window over
    # the aggregate, not a rejoined second view), both dims broadcast,
    # part prune pushed, deterministic top-100
    p = _plan(spark, "join_min_cost_supplier")
    assert p.count(") Scan parquet") == 5, p  # li + part + sup + nat + reg
    assert "BroadcastHashJoin" in p, p
    assert "Window" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "EqualTo(p_type,PROMO)" in p, p
    assert "CartesianProduct" not in p, p
    # Q11 shape: the per-part aggregate localCheckpoints (ONE lineitem
    # scan happened at checkpoint time), the global scalar is a tiny
    # reduce of the checkpoint carried back as a 1-row broadcast — no
    # unpartitioned window over the part catalog, no cartesian
    p = _plan(spark, "agg_part_value_share")
    assert p.count(") Scan parquet") == 0, p  # lineage cut at checkpoint
    assert "ExistingRDD" in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p
    # Q20 shape: decorrelated nested-EXISTS — pruned fact scan (date
    # filter pushed), per-part window total, no correlated re-scan
    p = _plan(spark, "join_dominant_supplier")
    assert p.count(") Scan parquet") == 4, p  # li + part + sup + nat
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "Window" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
