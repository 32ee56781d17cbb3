"""Batch learning-to-rank: judgment building, pointwise model training,
and NDCG evaluation — the batch analogue of the reference's LTR
research loop (r11 verdict "Missing #2").

Reference parity targets:
- feature classes: /root/reference/research/learning-to-rank/
  configure-ltr.py:128-156 defines the logged feature set as keyword
  match features (exact/tokenized name fields) + ``rank_feature``
  saturation features over metadata fields. Here: ``ov`` (the mean of
  query-term coverage and exact-adjacent-phrase bigram coverage — the
  keyword + exact-field match analogue; the phrase half is the RARE
  signal, so the judged pool's top-k holds genuine trade-offs) and ``sat``
  (saturation x/(x+pivot) over ``n_chars`` with an EXPLICIT pivot,
  ES's ``rank_feature`` with a fixed pivot parameter — fixed rather
  than the geometric-mean default so the feature is an exact rational
  and the cross-engine story is float-noise-free).
- model: the reference uploads a RankLib model trained offline on human
  judgments (readme.md; configure-ltr.py ``--model_path``). The batch
  analogue is the repo's closed-form pointwise fit: OLS of the graded
  relevance on the feature vector via exact DECIMAL normal equations
  (the stats.ols_regression_2var machinery) — a pointwise linear
  ranker whose weights both engines derive bit-identically.
- evaluation: NDCG@k exactly as
  /root/reference/research/learning-to-rank/compare_window_sizes.py:191-211
  computes it (dcg = Σ rel_i/log2(i+2); idcg over the judgment grades
  sorted desc; ``ndcg = dcg/idcg if idcg > 0 else 0``), comparing the
  LTR-rescored ranking against the no-LTR baseline the way
  evaluate_endpoints.py A/Bs the two endpoints.

Judgments: the reference's grades are human annotations (an external
artifact, like the model file). The deterministic stand-in models an
annotator who favors term coverage AND document comprehensiveness,
with per-pair judgment noise: rel = floor(2·ov + 4·sat + u) with u a
[0,1) draw from the portable hash of (query, doc) — a 0..6 graded
scale that is a pure function of the pair (stable across runs and
engines; the hash is the repo's engine-portable polynomial fold). The
point of the 2:4 weighting is that the no-LTR baseline (ov + sat,
1:1) is MIS-calibrated against it while the trained pointwise model
recovers ≈(2, 4) from the judgments — so the NDCG A/B genuinely
separates the two rankers instead of saturating at 1.0, and the noise
term keeps either ranker from reaching the ideal ordering, exactly
like human grades over an ML ranking.

Scale shape: judgment tables are bounded by construction (|queries| ×
matched docs — human-annotation-sized); building them is ONE corpus
scan whose per-query match counts explode into the judged rows
(round 15 — previously |queries| unioned scans, each re-running the
text normalization). Training is ONE map-side-combined
moment aggregate; evaluation is per-query windows over the bounded
judgment table. Nothing here touches unbounded state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Default query set for the bank rows: three-term queries over the
#: synthetic corpus vocabulary, one per "intent" the reference's test
#: queries family covers.
DEFAULT_LTR_QUERIES: tuple[str, ...] = (
    "spark window agg",
    "fast scan filter",
    "customer order join",
    "stream batch merge",
)

#: Explicit rank_feature saturation pivot (chars). Dyadic so sat =
#: n/(n+256) is an exact integer rational — no float-sum exposure.
SAT_PIVOT = 256

#: Judgment-noise modulus: u = (hash % NOISE_MOD) / NOISE_MOD ∈ [0,1).
NOISE_MOD = 997


def ltr_judgments(
    docs: DataFrame,
    queries: tuple[str, ...] = DEFAULT_LTR_QUERIES,
    id_col: str = "doc_id",
    text_col: str = "text",
    chars_col: str = "n_chars",
    pivot: int = SAT_PIVOT,
) -> DataFrame:
    """The judged (query, doc) table: one row per query × doc with at
    least one query term present (judgments exist only for retrieved
    candidates, as in any annotation pipeline). The match feature ov
    averages term coverage with exact-phrase (bigram) coverage — both
    via token-boundary space-padded contains, search.phrase_match's
    slop-0 semantics for the presence bit. Columns: (query, doc_id,
    rel, ov, sat) — rel
    the noisy 0..6 grade (module docstring), ov/sat the 6dp-rounded
    feature vector (exact rationals). The noise hash is the
    interpreted HOF fold — computed ONCE per judged row in a
    projection, never filtered on (the r4 pushdown rule); judgment
    tables are bounded, so this is cheap by construction."""
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    # ONE corpus scan for all queries (round 15, guide §2.2/§6.2): the
    # old shape unioned one filtered scan per query, so the parquet
    # text column was read — and the \s+ regexp normalization run —
    # |queries| times per consumer. Here every query's (mt, mb) counts
    # are computed in a single projection (codegen CSE evaluates
    # ``padded`` once per row) and exploded into the same
    # (query, doc_id, ...) rows; the mt >= 1 filter sits above the
    # Generate on its output attributes (the r13 Generate-barrier
    # idiom), so rows and values are identical to the union form.
    per_q = []
    for q in queries:
        terms = q.split()
        bigrams = [f" {a} {b} " for a, b in zip(terms, terms[1:])]
        mt = reduce(
            lambda a, b: a + b,
            [padded.contains(f" {t} ").cast("int") for t in terms],
        )
        mb = reduce(
            lambda a, b: a + b,
            [padded.contains(bg).cast("int") for bg in bigrams],
        )
        per_q.append(
            F.struct(
                F.lit(q).alias("query"),
                mt.alias("mt"),
                mb.alias("mb"),
                F.lit(len(terms)).alias("ntt"),
                F.lit(len(bigrams)).alias("ntb"),
            )
        )
    j = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(chars_col).alias("nc"),
            F.explode(F.array(*per_q)).alias("e"),
        )
        .select("doc_id", "nc", "e.query", "e.mt", "e.mb", "e.ntt", "e.ntb")
        .filter(F.col("mt") >= 1)
    )
    # graded match feature: mean of term coverage and exact-phrase
    # (bigram) coverage — ~7 levels, so the judged pool's top-k holds
    # genuine (ov, sat) trade-offs instead of a constant-ov plateau
    ov = (
        F.col("mt").cast("double") / F.col("ntt").cast("double")
        + F.col("mb").cast("double") / F.col("ntb").cast("double")
    ) / F.lit(2.0)
    feats = j.select(
        "query",
        "doc_id",
        F.round(ov, 6).alias("ov"),
        F.round(
            F.col("nc").cast("double")
            / (F.col("nc") + F.lit(pivot)).cast("double"),
            6,
        ).alias("sat"),
    )
    u = (
        portable_shingle_hash(
            F.concat(
                F.lit("ltrj:"),
                F.col("query"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        )
        % NOISE_MOD
    ).cast("double") / F.lit(float(NOISE_MOD))
    rel = F.floor(
        F.lit(2.0) * F.col("ov") + F.lit(4.0) * F.col("sat") + u
    ).cast("int")
    return feats.select("query", "doc_id", rel.alias("rel"), "ov", "sat")


def _judged_checkpoint(judged: DataFrame) -> DataFrame:
    """Eager DISK_ONLY lineage cut on the judged table for the two eval
    rows, where it feeds BOTH the training-moment aggregate and the
    scoring windows (r15, guide §2.2/§5): without the cut each consumer
    re-scans the corpus text column, re-runs the \\s+ normalization +
    contains() match chain AND the interpreted noise-hash fold. The
    judged relation is O(matched docs × |queries|) and 5 narrow columns
    — far smaller than the text it derives from, so materializing it
    once is the cheap side of the trade at any scale (unlike the
    shingle-array chains where the explode OUTGROWS its input).
    DISK_ONLY by the round's storage rule: corpus-proportional
    checkpoints stay out of the heap (search.py posting-list
    precedent)."""
    from pyspark import StorageLevel as _SL

    return judged.localCheckpoint(eager=True, storageLevel=_SL.DISK_ONLY)


def _weights(judged: DataFrame) -> DataFrame:
    """UNROUNDED pointwise OLS weights rel ~ ov + sat on exact DECIMAL
    moments (the stats.ols_regression_2var arithmetic verbatim, kept
    unrounded here so ranking with the weights is bit-identical across
    engines; the train row rounds for display). One moment pass."""
    dec = "decimal(18,6)"

    def d(c: str) -> F.Column:
        return F.col(c).cast(dec)

    m = judged.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("ov")).alias("s1"),
        F.sum(d("sat")).alias("s2"),
        F.sum(d("rel")).alias("sy"),
        F.sum(d("ov") * d("ov")).alias("s11"),
        F.sum(d("sat") * d("sat")).alias("s22"),
        F.sum(d("ov") * d("sat")).alias("s12"),
        F.sum(d("ov") * d("rel")).alias("s1y"),
        F.sum(d("sat") * d("rel")).alias("s2y"),
        F.sum(d("rel") * d("rel")).alias("syy"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = [F.col(c).cast("double") for c in ("s1", "s2", "sy")]
    s11, s22, s12 = [F.col(c).cast("double") for c in ("s11", "s22", "s12")]
    s1y, s2y, syy = [F.col(c).cast("double") for c in ("s1y", "s2y", "syy")]
    a11 = s11 - s1 * s1 / n
    a22 = s22 - s2 * s2 / n
    a12 = s12 - s1 * s2 / n
    c1 = s1y - s1 * sy / n
    c2 = s2y - s2 * sy / n
    det = a11 * a22 - a12 * a12
    b1 = (c1 * a22 - c2 * a12) / det
    b2 = (c2 * a11 - c1 * a12) / det
    b0 = (sy - b1 * s1 - b2 * s2) / n
    sst = syy - sy * sy / n
    r2 = (b1 * c1 + b2 * c2) / sst
    return m.select(
        F.col("n").cast("long").alias("n"),
        b0.alias("b0"),
        b1.alias("b1"),
        b2.alias("b2"),
        r2.alias("r2"),
    )


def ltr_train_weights(
    docs: DataFrame,
    queries: tuple[str, ...] = DEFAULT_LTR_QUERIES,
    **kwargs,
) -> DataFrame:
    """Fit the pointwise rank model on the judged feature table — the
    batch analogue of training the model configure-ltr.py uploads.
    Output one row: (n, b0, b1, b2, r2), 6dp."""
    w = _weights(ltr_judgments(docs, queries, **kwargs))
    return w.select(
        "n",
        F.round("b0", 6).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        F.round("r2", 6).alias("r2"),
    )


def ltr_ndcg_eval(
    docs: DataFrame,
    queries: tuple[str, ...] = DEFAULT_LTR_QUERIES,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """A/B the trained ranker against the no-LTR baseline, NDCG@k per
    query — compare_window_sizes.py:191-211's formula verbatim
    (``default_score=0``, the binary-eval convention there): dcg sums
    rel/log2(rank+1) over the top-k, idcg the same over grades sorted
    desc, ndcg = dcg/idcg if idcg > 0 else 0. Baseline score = ov alone
    — the no-LTR endpoint is text-match dominated (NO_LTR_QUERY's
    multi_match body), blind to the comprehensiveness signal the
    judgments reward; LTR score = b0 + b1·ov + b2·sat with the
    UNROUNDED trained weights, i.e. the model's edge IS the learned
    rank_feature weighting, which is precisely what the reference's
    A/B measures. All rankings tie-break on doc_id — total order.
    Output per query: (query, n_judged, ndcg_base, ndcg_ltr), 6dp."""
    judged = _judged_checkpoint(ltr_judgments(docs, queries, **kwargs))
    w = _weights(judged)
    scored = judged.join(F.broadcast(w))
    scored = scored.select(
        "query",
        "doc_id",
        "rel",
        F.round(F.col("ov"), 6).alias("score_base"),
        F.round(
            F.col("b0")
            + F.col("b1") * F.col("ov")
            + F.col("b2") * F.col("sat"),
            6,
        ).alias("score_ltr"),
    )
    wq = Window.partitionBy("query")
    r_base = F.row_number().over(
        wq.orderBy(F.desc("score_base"), F.asc("doc_id"))
    )
    r_ltr = F.row_number().over(
        wq.orderBy(F.desc("score_ltr"), F.asc("doc_id"))
    )
    r_ideal = F.row_number().over(
        wq.orderBy(F.desc("rel"), F.asc("doc_id"))
    )
    ranked = scored.select(
        "query",
        "rel",
        r_base.alias("rb"),
        r_ltr.alias("rl"),
        r_ideal.alias("ri"),
    )

    def gain(rank_col: str) -> F.Column:
        return F.sum(
            F.when(
                F.col(rank_col) <= k,
                F.round(
                    F.col("rel").cast("double")
                    / F.log2(F.col(rank_col).cast("double") + F.lit(1.0)),
                    9,
                ),
            ).otherwise(F.lit(0.0))
        )

    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).cast("long").alias("n_judged"),
        gain("rb").alias("dcg_base"),
        gain("rl").alias("dcg_ltr"),
        gain("ri").alias("idcg"),
    )
    ndcg = lambda c: F.round(  # noqa: E731
        F.when(F.col("idcg") > 0, F.col(c) / F.col("idcg")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return agg.select(
        "query",
        "n_judged",
        ndcg("dcg_base").alias("ndcg_base"),
        ndcg("dcg_ltr").alias("ndcg_ltr"),
    )


def ltr_rank_metrics(
    docs: DataFrame,
    queries: tuple[str, ...] = DEFAULT_LTR_QUERIES,
    k: int = 10,
    rel_threshold: int = 4,
    **kwargs,
) -> DataFrame:
    """Binary rank-quality metrics of the TRAINED ranker per query —
    the evaluation battery next to ltr_ndcg_eval's graded NDCG:
    MRR@k (reciprocal rank of the first relevant hit), Precision@5,
    Recall@k and AP@k, with relevant ≡ rel ≥ ``rel_threshold`` (the
    evaluate_endpoints.py endpoint-comparison shape, reference
    research/learning-to-rank, re-expressed as windows).

    Determinism: ranks are total-ordered (6dp score DESC, doc_id ASC);
    every metric is a ratio of small integers except AP, whose
    per-hit precision terms are rounded 9dp and DECIMAL-summed
    (order-free). Queries with no relevant docs report 0.0 metrics
    (stated, not null). Scale shape: judged tables are bounded
    (queries × matched docs); two windows + one groupBy.
    """
    judged = _judged_checkpoint(ltr_judgments(docs, queries, **kwargs))
    w = _weights(judged)
    scored = judged.join(F.broadcast(w)).select(
        "query",
        "doc_id",
        (F.col("rel") >= rel_threshold).cast("int").alias("is_rel"),
        F.round(
            F.col("b0")
            + F.col("b1") * F.col("ov")
            + F.col("b2") * F.col("sat"),
            6,
        ).alias("score"),
    )
    wq = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = scored.select(
        "query",
        "is_rel",
        F.row_number().over(wq).alias("r"),
        F.sum("is_rel")
        .over(wq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rel"),
    )
    ap_term = F.when(
        (F.col("is_rel") == 1) & (F.col("r") <= k),
        F.round(
            F.col("cum_rel").cast("double") / F.col("r").cast("double"),
            9,
        ),
    ).cast("decimal(38,9)")
    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_judged"),
        F.sum("is_rel").alias("n_rel"),
        F.min(
            F.when((F.col("is_rel") == 1) & (F.col("r") <= k), F.col("r"))
        ).alias("first_rel"),
        F.sum(
            F.when(F.col("r") <= 5, F.col("is_rel")).otherwise(F.lit(0))
        ).alias("rel_at_5"),
        F.sum(
            F.when(F.col("r") <= k, F.col("is_rel")).otherwise(F.lit(0))
        ).alias("rel_at_k"),
        F.sum(ap_term).alias("ap_sum"),
    )
    n_rel = F.col("n_rel").cast("double")
    zero = F.lit(0.0)
    return agg.select(
        "query",
        F.col("n_judged").cast("long").alias("n_judged"),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_rel").cast("double"), zero
            ),
            6,
        ).alias("mrr"),
        F.round(F.col("rel_at_5").cast("double") / F.lit(5.0), 6).alias(
            "p_at_5"
        ),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.col("rel_at_k").cast("double") / n_rel,
            ).otherwise(zero),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.coalesce(F.col("ap_sum").cast("double"), zero)
                / F.least(n_rel, F.lit(float(k))),
            ).otherwise(zero),
            6,
        ).alias("ap_at_k"),
    )
