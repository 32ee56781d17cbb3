"""Training-corpus preparation: benchmark decontamination + sequence packing.

Two operators every LLM pretraining pipeline runs that the reference (an
ETL for name collections) has no analogue for — same extension family as
text_analysis / dedup (SURVEY §2.9-ish "beyond" set):

- ``ngram_contamination``: per corpus document, the fraction of its
  distinct word n-grams that occur anywhere in a benchmark/holdout corpus
  — the standard train-test decontamination signal (docs above a
  threshold get dropped or quarantined before training).
- ``pack_sequences``: concatenation packing — documents are laid out
  end-to-end per shard in a deterministic order and mapped onto fixed
  ``context_len`` token windows (the GPT-style pretraining sample layout);
  each doc learns its shard-stream offset, first window index, and
  whether it straddles a window boundary.

Both are pure native column expressions + joins/windows (no UDFs), fully
replayed by the DuckDB oracle queries in plans/testdata_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from collection_templates_spark.operators.text_analysis import (
    bpe_ish_token_count,
)


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc, n_grams, n_contaminated, contamination) per corpus document:
    how much of its distinct word-``n``-gram set appears anywhere in
    ``benchmark``.

    Scale shape: the benchmark's distinct grams are aggregated once and
    BROADCAST (benchmarks are 1e4-1e7 grams; the corpus is the 100 TB
    side) — the corpus side is one explode + one map-side-combined
    groupBy on doc, a single shuffle of (doc, counts). No UDFs. Docs with
    fewer than ``n`` words have no grams and are absent from the output
    (callers left-join and coalesce contamination to 0), mirroring the
    dedup operators.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import (
        _spread,
        word_shingles,
    )

    c = _spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    b = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("___hit", F.lit(1))
    )
    return (
        c.join(F.broadcast(b), "g", "left")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("___hit", F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6),
        )
    )


def _word_ngrams_all(text: "F.Column", n: int) -> "F.Column":
    """ALL word n-gram occurrences of normalized text, in document order
    (NOT distinct — multiplicity and position matter for repetition and
    span metrics, unlike dedup's sets)."""
    from collection_templates_spark.operators.dedup import normalize_text

    toks = F.split(normalize_text(text), " ")
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Span-level decontamination (the published "N-token overlap window"
    criterion): per corpus doc, the LONGEST RUN of consecutive word
    n-grams that all occur in the benchmark — a doc quoting a benchmark
    item verbatim shows a long run even when its overall gram fraction is
    low, which is exactly what ngram_contamination misses.

    Columns: (doc, n_grams, n_contaminated, max_contaminated_run). Runs
    are computed with the gaps-and-islands pattern: hit grams keep their
    document position, ``pos - row_number()`` over hits per doc is
    constant within a consecutive run, one count per island, max per doc.

    Scale shape: benchmark grams broadcast (as in ngram_contamination);
    corpus side shuffles once on doc for the island window + once for the
    final aggregate — both keyed on doc, partial-combined where Spark
    can. Docs with < n words are absent.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import _spread

    g = _spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.posexplode(_word_ngrams_all(F.col(text_col), n)).alias("pos", "g"),
    )
    b = (
        benchmark.select(
            F.explode(_word_ngrams_all(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("___hit", F.lit(1))
    )
    marked = g.join(F.broadcast(b), "g", "left")
    # Single consumption of the marked subtree (r15): same one-window-
    # pass + two-level-aggregate shape as common_substring_spans below —
    # hit rows get the pos − rank-among-hits island key, non-hit rows
    # collapse into a per-doc NULL group, and one (doc, grp) → doc
    # aggregation ladder (both reusing the window's doc partitioning)
    # yields totals, hit count and max run without a second explode pass
    # or the base⋈islands join.
    w = Window.partitionBy("doc").orderBy("pos")
    runs = (
        marked.withColumn(
            "___grp",
            F.when(
                F.col("___hit") == 1,
                F.col("pos") - F.count("___hit").over(w),
            ),
        )
        .groupBy("doc", "___grp")
        .agg(F.count("*").alias("___run"))
    )
    return runs.groupBy("doc").agg(
        F.sum("___run").alias("n_grams"),
        F.sum(
            F.when(F.col("___grp").isNotNull(), F.col("___run")).otherwise(
                F.lit(0)
            )
        ).alias("n_contaminated"),
        F.coalesce(
            F.max(F.when(F.col("___grp").isNotNull(), F.col("___run"))),
            F.lit(0).cast("long"),
        ).alias("max_contaminated_run"),
    )


def common_substring_spans(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-substring mining — the n-gram-join
    realization of exact substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which
    uses suffix arrays single-node; the distributed shape is a gram
    self-aggregate): per doc, how much of it is covered by word
    ``n``-grams that also occur in ≥ ``min_docs`` documents, and the
    longest consecutive such run (the span a substring-dedup pass would
    cut).

    Columns: (doc, n_grams, n_shared, max_shared_run). Same
    gaps-and-islands machinery as ``contamination_spans``, but the
    marked set is corpus-derived (grams with distinct-doc count ≥
    ``min_docs``) instead of a broadcast benchmark.

    Scale shape: ONE gram-keyed shuffle for the distinct-doc count and
    one more for the mark join (the shared-gram table is corpus-sized,
    so no broadcast hint — AQE decides), then the doc-keyed island
    window. This is the canonical substring-dedup shuffle profile; the
    suffix-array equivalent cannot be expressed as a dataflow without
    it.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import _spread

    g = _spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.posexplode(_word_ngrams_all(F.col(text_col), n)).alias("pos", "g"),
    )
    shared = (
        g.select("doc", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("___nd"))
        .filter(F.col("___nd") >= min_docs)
        .select("g")
        .withColumn("___hit", F.lit(1))
    )
    marked = g.join(shared, "g", "left")
    # Single consumption of the join subtree (r15): the doc totals, the
    # shared count and the gaps-and-islands run length all come out of ONE
    # window pass + a two-level aggregate. ``___grp`` is the classic
    # pos − rank-among-hits island key, computed for hit rows only (the
    # windowed count skips NULL ``___hit``); non-hit rows collapse into a
    # per-doc NULL group, so the (doc, grp) counts feed n_grams (sum of
    # all groups), n_shared (sum of non-NULL groups) and max_shared_run
    # (max of non-NULL groups) without re-running the corpus join for a
    # second branch or joining base⋈islands back together. Both
    # aggregates reuse the window's doc partitioning — no new Exchange.
    w = Window.partitionBy("doc").orderBy("pos")
    runs = (
        marked.withColumn(
            "___grp",
            F.when(
                F.col("___hit") == 1,
                F.col("pos") - F.count("___hit").over(w),
            ),
        )
        .groupBy("doc", "___grp")
        .agg(F.count("*").alias("___run"))
    )
    return runs.groupBy("doc").agg(
        F.sum("___run").alias("n_grams"),
        F.sum(
            F.when(F.col("___grp").isNotNull(), F.col("___run")).otherwise(
                F.lit(0)
            )
        ).alias("n_shared"),
        F.coalesce(
            F.max(F.when(F.col("___grp").isNotNull(), F.col("___run"))),
            F.lit(0).cast("long"),
        ).alias("max_shared_run"),
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split",
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic train/val/test assignment: engine-portable polynomial
    hash of ``salt + ':' + id`` → bucket in [0, buckets) → split by
    cumulative weight thresholds. Adds ``split_bucket`` and ``split``.

    Hash-based (not random) so the assignment is stable across runs,
    engines and partitionings — the property that keeps a held-out set
    held out when the corpus is re-processed; change ``salt`` to draw an
    independent split. Pure column expressions: scan-speed, no shuffle.

    Uses the TWO-fold portable hash (poly31 ≪ 31 | poly37): a single
    base-31 fold of sequential ids is visibly non-uniform mod ``buckets``
    (measured 60/28/12 against a 90/5/5 target on 500 sequential ids;
    the two-fold mix lands 90.2/4.6/5.2).
    """
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    key = F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    bucket = portable_shingle_hash(key) % buckets
    out = df.withColumn("split_bucket", bucket)
    acc = 0.0
    expr = None
    for name, wgt in weights[:-1]:
        acc += wgt
        cond = F.col("split_bucket") < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(weights[-1][0])
        if expr is None
        else expr.otherwise(weights[-1][0])
    )
    return out.withColumn("split", expr)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signal: per doc, the fraction of all word
    ``n``-gram OCCURRENCES taken by the single most frequent n-gram
    (Rae et al. 2021's top-n-gram filters — boilerplate and template spam
    score high). Columns: (doc, n_ngrams, top_ngram_count,
    top_ngram_frac). Docs with < ``n`` words are absent.

    Unlike dedup's distinct shingle sets, multiplicity matters here, so
    grams are exploded un-deduplicated; the two aggregations are
    map-side-combined groupBys on (doc, gram) then (doc) — the standard
    two-level count shape, shuffle keys never wider than one gram.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import _spread

    g = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(_word_ngrams_all(F.col(text_col), n)).alias("g"),
    )
    counts = g.groupBy("doc", "g").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("doc")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.max("c").alias("top_ngram_count"),
        )
        .withColumn(
            "top_ngram_frac",
            F.round(F.col("top_ngram_count") / F.col("n_ngrams"), 6),
        )
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    group_col: str = "source",
    salt: str = "sample",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic stratified Bernoulli sampling: each row is kept iff
    ``portable_hash(salt + ':' + id) % buckets < rate[group] * buckets``.
    Adds ``sample_bucket``; the per-group keep-rates come from ``rates``
    (missing groups use ``default_rate``).

    Hash-based (not ``df.sample``) for the same reason as ``assign_split``:
    the decision is a pure function of the row id, so re-processing the
    corpus, changing partitioning, or switching engines reproduces the
    sample exactly — and the oracle can replay it. Pure column
    expressions: scan-speed, filter fully pushable, no shuffle. Change
    ``salt`` to draw an independent sample; the same two-fold portable
    hash as ``assign_split`` (one fold is non-uniform on sequential ids).
    """
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    key = F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    bucket = portable_shingle_hash(key) % buckets
    thresh = None
    for grp, rate in sorted(rates.items()):
        cond = F.col(group_col) == grp
        t = F.lit(int(round(rate * buckets)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_rate * buckets)))
        if thresh is None
        else thresh.otherwise(int(round(default_rate * buckets)))
    )
    return df.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < thresh
    )


def mixture_plan(
    docs: DataFrame,
    target_tokens: int,
    alpha: float = 0.5,
    group_col: str = "lang",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture planning (the multilingual-pretraining
    resampling rule, weight ∝ tokens^alpha): given a token budget, compute
    per-group sampling rates and epoch counts.

    Columns per group: ``n_docs``, ``n_tokens`` (BPE-ish pieces),
    ``weight`` = tokens^alpha / Σ tokens^alpha, ``target_tokens_grp`` =
    floor(budget × weight), ``sample_rate`` = target/available (may exceed
    1 — low-resource groups get up-sampled), ``epochs`` = ceil(rate).
    ``alpha`` = 1 reproduces natural proportions; ``alpha`` → 0 uniform.

    Scale shape: one map-side-combined groupBy over the corpus (the token
    count is a native regexp over each doc), then a single-row total
    joined back by cross-join broadcast — the per-group table is tiny
    (languages/domains number in the hundreds). All native expressions;
    doubles rounded for cross-engine comparability.
    """
    # token_count_col: callers that ALSO tokenize for a downstream step
    # (mixture_materialize) pass one precomputed per-doc count column so
    # the regexp tokenizer runs over the corpus ONCE, not once per
    # consumer (r16, guide §2.2 — plan + materialize shared a full
    # corpus regexp_count pass each).
    cnt = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else F.coalesce(bpe_ish_token_count(F.col(text_col)), F.lit(0))
    )
    per = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.sum(cnt).alias("n_tokens"),
    )
    w_raw = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    per = per.withColumn("w_raw", w_raw)
    tot = per.agg(F.sum("w_raw").alias("w_tot"))
    out = per.join(F.broadcast(tot))
    # r5 advice: w_tot is a summation-order-dependent double sum, so the
    # unrounded weight can differ by 1 ulp between engines and flip the
    # floor at an integer boundary — pin it at 9dp in BOTH engines first.
    # floor, not round: round-half behavior on doubles is the one integer
    # boundary DuckDB and Spark could disagree on; floor is unambiguous
    weight = F.round(F.col("w_raw") / F.col("w_tot"), 9)
    target_grp = F.floor(weight * target_tokens).cast("long")
    # r5 advice: a zero-token group would make rate 0/0 = NaN (and
    # ceil(NaN).cast under ANSI diverges from DuckDB) — NULL it instead
    rate = F.when(F.col("n_tokens") > 0, target_grp / F.col("n_tokens"))
    return out.select(
        "grp",
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("weight"),
        target_grp.alias("target_tokens_grp"),
        F.round(rate, 6).alias("sample_rate"),
        F.ceil(rate).cast("long").alias("epochs"),
    )


def vocab_oov(
    docs: DataFrame,
    vocab_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Word-vocabulary induction + per-document OOV rate: the corpus's
    ``vocab_size`` most frequent whitespace tokens (count desc, token asc
    — a total order) become the vocabulary; each doc reports how much of
    it falls outside. Columns: (doc, n_tokens, n_oov, oov_rate).

    Scale shape: token counting is one map-side-combined groupBy; vocab
    selection is ``orderBy(...).limit(V)`` which Spark executes as
    TakeOrderedAndProject — a distributed per-partition top-V plus a
    V-row driver merge, NOT a single-partition global window (the trap a
    rank()-based top-V would hit at a billion distinct tokens). The V-row
    vocab then broadcast-joins back against the corpus. Docs whose
    normalized text is empty have no tokens and are absent (same contract
    as the gram operators).

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import (
        _spread,
        normalize_text,
    )

    toks = _spread(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("___in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("___in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
    )


def boilerplate_stats(
    corpus: DataFrame,
    min_df: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate signal: an n-gram is *boilerplate* when it
    occurs in at least ``min_df`` distinct documents (headers, footers,
    template spam); each doc reports the fraction of its distinct grams
    that are boilerplate. Columns: (doc, n_grams, n_boiler, boiler_frac).

    This is the corpus-global complement of ``repetition_stats`` (which is
    within-doc): C4/RefinedWeb-style pipelines drop or strip spans whose
    grams are corpus-frequent.

    Scale shape: document frequency is one explode + map-side-combined
    groupBy on the gram; the ``min_df`` filter makes the boilerplate set
    small by construction (frequency thresholds cap its cardinality at
    total_grams / min_df), so the join back is a broadcast. Two shuffles
    total, both on short keys. Docs with < n words are absent.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from collection_templates_spark.operators.dedup import (
        _spread,
        word_shingles,
    )

    g = _spread(corpus).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    boiler = (
        g.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("g", F.lit(1).alias("___boiler"))
    )
    return (
        g.join(F.broadcast(boiler), "g", "left")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("___boiler", F.lit(0))).alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac", F.round(F.col("n_boiler") / F.col("n_grams"), 6)
        )
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Concatenation packing within each shard (``group_col``): documents
    are concatenated in ``id_col`` order per shard and mapped onto fixed
    ``context_len`` token windows.

    Columns: (group, doc, n_tokens, start_offset, bin, crosses_boundary)
    — ``start_offset`` is the number of tokens before this doc in its
    shard stream, ``bin`` the window index of its first token,
    ``crosses_boundary`` 1 when the doc straddles a window edge (the rows
    a packer either splits or pads around). Tokens are the
    BPE-pretokenizer-ish count (text_analysis.bpe_ish_token_count), so
    the whole operator is native expressions.

    Scale shape: ONE shuffle on the shard key and a within-shard window —
    no global sort; production packers lay out per shard/file exactly
    like this, which is what keeps the operation embarrassingly parallel
    at 100 TB. (``group_col`` must be a real shard key: a constant would
    funnel the corpus through one window partition.) Determinism:
    (group, id) must be a total order — ``doc_id`` is unique per corpus.
    """
    w = (
        Window.partitionBy("grp")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        # null text = zero tokens, not a null row in the token stream
        F.coalesce(bpe_ish_token_count(F.col(text_col)), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    out = d.withColumn("start_offset", start)
    first_bin = F.floor(F.col("start_offset") / context_len)
    last_bin = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / context_len
    )
    return (
        out.withColumn("bin", first_bin)
        .withColumn(
            "crosses_boundary",
            F.when(
                (F.col("n_tokens") > 0) & (last_bin != first_bin), 1
            )
            .otherwise(0)
            .cast("int"),
        )
    )


#: Pinned logistic quality-filter weights: (bias, length, punctuation,
#: stopword, digit). Sign structure is the FineWeb/fastText-style prose
#: prior — longer docs with natural stopword rates score up, punctuation-
#: and digit-dense docs score down. Literals so the oracle can restate
#: the whole model.
QUALITY_WEIGHTS: tuple[float, float, float, float, float] = (
    -1.2, 2.2, -3.0, 2.5, -2.0,
)


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the RAG /
    long-context ingestion primitive next to :func:`pack_sequences`
    (packing fills contexts across documents; chunking splits one
    document into retrievable windows). Tokens are the corpus
    convention (lowercased split on single spaces, empties kept —
    identical literal semantics in both engines); chunk k starts at
    k·(window−overlap) and takes ``window`` tokens, the final chunk
    keeping whatever tail remains rather than dropping it.

    Columns: (id, chunk_idx, start_tok, n_tokens, chunk_text).

    Determinism: pure positional arithmetic, no hashing, no floats.
    Scale shape: zero shuffles — a per-row Generate (the chunk-start
    explode) between two narrow projections, so the row growth
    streams; the token array rides a single-element-array explode so
    it is a Generate OUTPUT ATTRIBUTE, not a recomputed expression
    (the repo's Generate-barrier rule — size() and slice() both
    reference it downstream)."""
    stride = window - overlap
    base = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(F.split(F.lower(F.col(text_col)), " "))
        ).alias("toks"),
    )
    step = base.select(
        "id",
        "toks",
        F.posexplode(
            F.sequence(
                F.lit(0), F.size("toks") - 1, F.lit(stride)
            )
        ).alias("chunk_idx", "start_tok"),
    )
    return step.select(
        "id",
        "chunk_idx",
        "start_tok",
        F.least(
            F.lit(window), F.size("toks") - F.col("start_tok")
        ).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start_tok") + 1, window), " "
        ).alias("chunk_text"),
    )


def quality_classifier(
    docs: DataFrame,
    weights: tuple[float, float, float, float, float] = QUALITY_WEIGHTS,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Logistic quality classifier over handcrafted features — the
    model-free stand-in for the fastText/FineWeb quality filters every
    pretraining pipeline runs: score = σ(w·x) with x = (1, min(n_tok/64,
    1), punct_ratio, stopword_ratio, digit_ratio), keep = score ≥ 0.5.

    Everything is native expressions over one scan (regexp counts +
    a stopword list_filter — the text_stats feature set plus a digit
    ratio), so the filter runs at scan speed and the oracle restates the
    exact model: z is 9dp-rounded before the sigmoid and the score 6dp
    after, the repo's two-stage rounding convention for cross-engine
    float agreement. Columns: (doc, score, keep, *passthrough) —
    ``passthrough`` carries label/metadata columns through the SAME
    scan so callers (quality_calibration) don't self-join the corpus
    to get them back (r12 verdict #5: the join was a second full
    regexp-feature-free scan plus a doc-keyed shuffle)."""
    from collection_templates_spark.operators.text_analysis import (
        punct_ratio,
        stopword_ratio,
        tokens,
    )

    w0, w1, w2, w3, w4 = weights
    text = F.col(text_col)
    n_tok = F.size(tokens(text))
    len_feat = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    digit_ratio = F.when(
        F.length(text) > 0,
        F.regexp_count(text, F.lit("[0-9]")) / F.length(text),
    ).otherwise(F.lit(0.0))
    z = F.round(
        F.lit(w0)
        + F.lit(w1) * len_feat
        + F.lit(w2) * punct_ratio(text)
        + F.lit(w3) * stopword_ratio(text)
        + F.lit(w4) * digit_ratio,
        9,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    # single-element-array explode = Generate BARRIER (the r13
    # heaps_fit fix): the interpreted regexp/HOF feature chain becomes
    # a Generate OUTPUT ATTRIBUTE, so downstream filters (keep,
    # calibration's not-null guard) and multi-use projections (bin id
    # + mean-score accumulator) reference the attribute instead of
    # re-deriving the chain — it was evaluated up to 3x per row at
    # sf10 (quality_calibration's 1.05 second-decade exponent), once
    # after this. `keep` derives from the attribute too.
    from collection_templates_spark.operators.dedup import (
        ensure_infer_generate_excluded,
    )

    ensure_infer_generate_excluded(docs.sparkSession)
    row = F.explode(
        F.array(
            F.struct(
                F.col(id_col).alias("doc"),
                score.alias("score"),
                *[F.col(c).alias(c) for c in passthrough],
            )
        )
    )
    return docs.select(row.alias("___r")).select(
        F.col("___r.doc").alias("doc"),
        F.col("___r.score").alias("score"),
        (F.col("___r.score") >= 0.5).alias("keep"),
        *[F.col(f"___r.{c}").alias(c) for c in passthrough],
    )


def sample_weighted(
    df: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis (2006) one-pass scheme: each row draws a
    pseudo-uniform u from the portable hash of (salt, id) and keys
    itself with u^(1/w); the k LARGEST keys are a weighted sample
    (inclusion probability ∝ weight). The hash draw makes the sample a
    pure function of (salt, ids, weights): stable across runs, engines
    and partitionings — the same property assign_split relies on, and
    the standard way to draw an at-scale mixture-weighted subset with
    no RNG state.

    Rows with NULL or non-positive weight are excluded. The key is
    12dp-rounded BEFORE ranking (pow may differ in the last ulp across
    engines; the rounding plus the id tie-break makes the order
    engine-exact). Scale shape: pure per-row expressions + a top-k
    ``orderBy().limit(k)`` that Spark executes as TakeOrdered (per-
    partition top-k + a k-row driver merge, never a global sort).
    Columns: (id, weight, sample_key)."""
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    h = portable_shingle_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    u = (h + 1).cast("double") / F.lit(float(2**62))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), 12)
    return (
        df.filter(w > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dynamic_quality_threshold(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_fraction: float = 0.6,
) -> DataFrame:
    """Per-group dynamic quality gating: rank documents WITHIN each
    group by a quality signal and keep the top ``keep_fraction`` — the
    CCNet/FineWeb practice of thresholding per LANGUAGE rather than
    globally (a global cutoff starves low-resource languages whose
    score distribution sits lower). Signal here: type-token ratio
    (lexical diversity), the cheap-but-standard proxy; swap in any
    scored column without changing the plan.

    Determinism: ``percent_rank`` over the total order
    (ttr DESC, id ASC); ttr rounded to 6dp BEFORE ranking in both
    engines. Zero-token docs are dropped (no rankable signal).

    Scale: one explode + per-doc aggregate (map-side combined), one
    per-group window. Groups = languages (dozens), so the window
    partitions are large but few — at 100 TB use the two-pass variant
    (per-group ``approx_percentile`` of the score, broadcast the cutoff
    back) to avoid a single-language sort; this exact-rank form is the
    oracle-checkable semantics of that pass.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    toks = docs.select(
        id_col,
        group_col,
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias(
            "___tok"
        ),
    ).filter(F.col("___tok") != "")
    per_doc = toks.groupBy(id_col, group_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("___tok")).alias("n_distinct"),
    )
    per_doc = per_doc.withColumn(
        "ttr", F.round(F.col("n_distinct") / F.col("n_tokens"), 6)
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("ttr").desc(), F.col(id_col).asc()
    )
    return per_doc.select(
        id_col,
        group_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "ttr",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).withColumn(
        "keep",
        (F.round(F.percent_rank().over(w), 6) <= F.lit(keep_fraction)).cast(
            "int"
        ),
    )


def cross_source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, the
    number of exact ``chunk_tokens``-token passages they share and the
    Jaccard overlap of their passage sets — the audit a multi-source
    corpus runs before mixing (shared boilerplate / mirrored scrapes
    inflate dedup debt and leak eval data between sources). Chunking is
    identical to :func:`~collection_templates_spark.operators.dedup.
    paragraph_dedup_stats` (non-overlapping, last partial window kept).

    Plan: explode → DISTINCT (source, chunk) → self-equi-join on the
    chunk text with ``src_a < src_b`` → pair aggregate, plus a broadcast
    per-source size table for the Jaccard denominator. Per-chunk join
    fan-out is bounded by the SOURCE count (not corpus size) — a chunk
    present in all S sources yields at most S²/2 pair rows — so the
    shuffle is ~distinct-chunk-count rows at any corpus scale. Only
    pairs sharing at least one chunk are returned.
    """
    from collection_templates_spark.operators.dedup import _spread

    toks = F.split(F.lower(F.col(text_col)), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(chunk_tokens)
    )
    chunks = (
        _spread(docs)
        .select(
            F.col(source_col).alias("src"),
            F.explode(
                F.transform(
                    starts,
                    lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens)),
                )
            ).alias("chunk_text"),
        )
        .distinct()
    )
    sizes = chunks.groupBy("src").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = chunks.select(F.col("src").alias("src_a"), "chunk_text")
    b = chunks.select(F.col("src").alias("src_b"), "chunk_text")
    shared = (
        a.join(b, "chunk_text")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("src").alias("src_a"),
                                  F.col("n_chunks").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("src").alias("src_b"),
                                  F.col("n_chunks").alias("n_b")))
    return (
        shared.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, table A1
    — the heuristics Gopher/MassiveText filter web text with), rolled
    up per group: document counts, per-rule failure counts, and the
    all-rules pass fraction.

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max]; '#'/'…' symbol-to-word ratio below max; fraction of
    words containing a letter above min; at least ``min_stopword_hits``
    hits from the 8-word English stopword probe.

    Determinism: counts are integers; the three ratios are exact-input
    divisions rounded to 6dp BEFORE each threshold compare, so a
    boundary document classifies identically in both engines. Scale:
    pure per-row column expressions over the in-row token array + one
    group rollup — scan-speed, one shuffle of the tiny rule table.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    words = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    n_words = F.size(words)
    mean_wl = F.round(
        F.aggregate(
            words, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n_words.cast("double"),
        6,
    )
    n_symbols = F.regexp_count(F.col(text_col), F.lit("[#…]"))
    symbol_ratio = F.round(
        n_symbols.cast("double") / n_words.cast("double"), 6
    )
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.round(
        n_alpha.cast("double") / n_words.cast("double"), 6
    )
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(words, lambda x: F.array_contains(sw, x))
    )
    flagged = docs.filter(n_words > 0).select(
        F.col(group_col).alias("grp"),
        (~n_words.between(min_words, max_words)).cast("int").alias(
            "f_word_count"
        ),
        (~mean_wl.between(min_mean_word_len, max_mean_word_len))
        .cast("int")
        .alias("f_word_len"),
        (symbol_ratio > max_symbol_ratio).cast("int").alias("f_symbol"),
        (alpha_frac < min_alpha_word_frac).cast("int").alias("f_alpha"),
        (stop_hits < min_stopword_hits).cast("int").alias("f_stopword"),
    )
    fails = (
        F.col("f_word_count")
        + F.col("f_word_len")
        + F.col("f_symbol")
        + F.col("f_alpha")
        + F.col("f_stopword")
    )
    return (
        flagged.withColumn("passes", (fails == 0).cast("int"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_word_count").cast("long").alias("fail_word_count"),
            F.sum("f_word_len").cast("long").alias("fail_word_len"),
            F.sum("f_symbol").cast("long").alias("fail_symbol"),
            F.sum("f_alpha").cast("long").alias("fail_alpha"),
            F.sum("f_stopword").cast("long").alias("fail_stopword"),
            F.round(
                F.sum("passes").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("pass_frac"),
        )
    )


def sample_reservoir(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    salt: str = "reservoir",
) -> DataFrame:
    """Deterministic per-group k-sample: the classic reservoir sample
    re-expressed as minwise hashing — keep each group's ``k`` rows with
    the smallest portable hash of ``salt + ':' + id``. Statistically a
    uniform without-replacement sample (every row's hash rank is
    exchangeable), but stable across runs, engines, partitionings AND
    insertions (a new row evicts at most one survivor — the property
    that makes samples diffable across corpus refreshes; a true
    sequential reservoir has neither stability nor an oracle).

    The rank key is the portable hash REDUCED MOD A LARGE PRIME: the
    two-fold polynomial hash is near-monotone over sequential ids
    (constant stride between neighbors), so ranking by the raw hash
    would just pick the smallest ids — the mod-prime fold turns the
    stride into a full-period jump and the rank order into the
    advertised pseudo-random one (measured: raw-hash picks are the 5
    lowest ids per group; folded picks are spread across the id range).

    One window shuffle over (group, folded hash, id); change ``salt``
    for an independent draw. Output: (group, id, rank 1..k).
    """
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    key = F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        (portable_shingle_hash(key) % F.lit(999983)).alias("h"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("h").asc(), F.col("id").asc()
    )
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("grp", "id", F.col("rk").cast("int").alias("rk"))
    )


def feature_hashing_stats(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "fh",
) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: every token maps
    to ``portable_hash(salt + ':' + token) % n_buckets``; report how the
    vocabulary collides at that width — the check run before fixing a
    feature dimension for a hashed bag-of-words model (Weinberger et al.
    2009). Tokens here are ASCII by construction (TOKEN_SPLIT_RE keeps
    [a-z0-9']), so the ascii-fold portable hash is well-defined in both
    engines.

    Output one row: total/distinct token counts, buckets used, buckets
    holding >1 distinct token, the max distinct-per-bucket, and the
    fraction of distinct tokens sharing a bucket (exact divisions, 6dp).

    Scale shape: one explode + one vocab-bounded distinct aggregate +
    one bucket rollup — all map-side combined.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    toks = docs.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
        ).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    bucketed = per_tok.withColumn(
        "bucket",
        portable_shingle_hash(
            F.concat(F.lit(salt + ":"), F.col("tok"))
        )
        % n_buckets,
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("n").alias("n_tokens"),
    )
    return per_bucket.groupBy().agg(
        F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        F.sum("n_distinct").cast("long").alias("n_distinct_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum((F.col("n_distinct") > 1).cast("long"))
        .cast("long")
        .alias("n_colliding_buckets"),
        F.max("n_distinct").cast("long").alias("max_bucket_distinct"),
        F.round(
            F.sum(
                F.when(F.col("n_distinct") > 1, F.col("n_distinct"))
                .otherwise(F.lit(0))
            ).cast("double")
            / F.sum("n_distinct").cast("double"),
            6,
        ).alias("colliding_token_frac"),
    )


def fuzzy_decontaminate(
    spark,
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Fuzzy benchmark decontamination: corpus documents NEAR-duplicating
    any benchmark document (trigram-shingle Jaccard ≥ ``threshold`` via
    the persisted-minhash-index probe — the dedup_incremental machinery
    pointed at a benchmark instead of history) are flagged; report per
    group (n_docs, n_contaminated, contaminated_frac). The fuzzy
    complement of ``ngram_contamination``'s exact-overlap gate — the
    paraphrased-eval-set leak exact n-grams miss (the GPT-3/Llama report
    methodology).

    Scale shape: the benchmark index is tiny and built once per call
    (bounded: |benchmark|); the corpus probes it with the equi-keyed
    band join — O(corpus), never all-pairs. ``max_bucket_size=None``
    keeps candidacy exhaustive so the exact-Jaccard oracle replays the
    output 1:1 (the dedup_incremental pin).
    """
    from collection_templates_spark.operators.incremental_dedup import (
        build_minhash_index,
        dedup_batch_against_index,
        scratch_index_path,
    )

    path = scratch_index_path()
    build_minhash_index(benchmark, path, id_col=id_col)
    pairs = dedup_batch_against_index(
        spark, path, corpus, id_col=id_col, threshold=threshold,
        max_bucket_size=None,
    )
    hits = pairs.select(F.col("doc_new").alias(id_col)).distinct()
    flagged = corpus.join(
        hits.withColumn("___hit", F.lit(1)), id_col, "left"
    )
    return flagged.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("___hit"), F.lit(0)))
        .cast("long")
        .alias("n_contaminated"),
        F.round(
            F.sum(F.coalesce(F.col("___hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("contaminated_frac"),
    )


def dsir_importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", simplified to the
    unigram feature space): every corpus document is weighted by
    log p_target(doc) − log p_raw(doc) under two Laplace-smoothed
    unigram models — positive weight means the document looks more like
    the target domain than the raw pool, the signal DSIR resamples on.

    Reuses the oracled langmodel machinery verbatim
    (word_frequency_model + score_names: per-token 9dp-rounded lps,
    broadcast vocab-sized models), so the determinism story is the
    text_word_model / scalar_log_probability one. Output: the id
    columns + (n_tokens, lp_target, lp_raw, weight, prefers_target)
    with sums rounded 4dp and weight = round(lp_t − lp_r, 4).

    Scale shape (r15 single-pass rewrite): each pool's token counts are
    ONE explode+shuffle materialized at vocab size (eager local
    checkpoint — the model is tiny, its input is the corpus pass worth
    saving); the two Laplace models ride as ONE combined broadcast
    (full-outer on token, a miss on either side IS that model's OOV
    floor); the corpus is exploded ONCE and both log-probability sums
    accumulate in the same doc-keyed partial-combined re-aggregation —
    no second scoring pass, no st⋈sr doc-keyed join. Per-token lps are
    the same 9dp-rounded values ``score_names`` produces, so the output
    is bit-identical to the two-pass form. At 100 TB the models come
    from samples; the scoring pass shape is unchanged.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
        corpus_tokens,
        unigram_model_from_counts,
    )

    def pool_counts(docs: DataFrame) -> DataFrame:
        return (
            corpus_tokens(docs, text_col)
            .groupBy("token")
            .agg(F.count("*").alias("n"))
            .localCheckpoint(eager=True)
        )

    counts_t = pool_counts(target)
    counts_r = pool_counts(raw)
    # same denominator score_names derives from the model rows
    # (sum(n) + count(*) — the model carries counts unchanged)
    denom_t = counts_t.agg((F.sum("n") + F.count("*")).alias("___dt"))
    denom_r = counts_r.agg((F.sum("n") + F.count("*")).alias("___dr"))
    comb = (
        unigram_model_from_counts(counts_t)
        .select("token", F.col("log_prob").alias("___mt"))
        .join(
            unigram_model_from_counts(counts_r).select(
                "token", F.col("log_prob").alias("___mr")
            ),
            "token",
            "full_outer",
        )
        .select(F.col("token").alias("___tok"), "___mt", "___mr")
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    # n_tokens rides as a grouping key, exactly as it did through
    # score_names (which groups by every non-token column)
    names = corpus.select(
        *id_cols,
        F.size(toks).cast("long").alias("n_tokens"),
        toks.alias("tokens"),
    )
    lp_t = F.round(
        F.coalesce(
            F.col("___mt"),
            F.log(F.lit(1.0) / F.col("___dt").cast("double")),
        ),
        9,
    )
    lp_r = F.round(
        F.coalesce(
            F.col("___mr"),
            F.log(F.lit(1.0) / F.col("___dr").cast("double")),
        ),
        9,
    )
    scored = (
        names.withColumn("___tok", F.explode_outer("tokens"))
        .join(F.broadcast(denom_t))
        .join(F.broadcast(denom_r))
        .join(F.broadcast(comb), "___tok", "left")
        .groupBy(*id_cols, "n_tokens")
        .agg(
            F.sum(F.when(F.col("___tok").isNotNull(), lp_t)).alias("___st"),
            F.sum(F.when(F.col("___tok").isNotNull(), lp_r)).alias("___sr"),
        )
    )
    lp_target = F.round("___st", 4)
    lp_raw = F.round("___sr", 4)
    weight = F.round(lp_target - lp_raw, 4) + F.lit(0.0)
    return scored.select(
        *id_cols,
        "n_tokens",
        lp_target.alias("lp_target"),
        lp_raw.alias("lp_raw"),
        weight.alias("weight"),
        (weight > 0).cast("int").alias("prefers_target"),
    )


LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def length_bucket_stats(
    docs: DataFrame,
    text_col: str = "text",
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
) -> DataFrame:
    """Length-bucketed batching audit: assign every document to the
    smallest bucket that holds its token count (overflow clamps to the
    last bucket and truncates) and report per-bucket doc count, token
    mass, padding waste, and utilization — the padding-economics table
    a batched trainer reads before fixing batch shapes
    (:func:`pack_sequences` is the bin-packing alternative; this is
    the bucketed-batching one, where every sequence in a bucket pads
    to the bucket ceiling).

    The bucket is an exact CASE ladder, NOT float log2 — a
    power-of-two token count must never straddle a bucket edge on a
    last-ulp rounding difference between engines. Utilization is the
    one double divide of exact int64 sums (identical in both engines).

    Scale shape: one projection + one map-side-combined groupBy on a
    ≤ len(buckets)-value key — a single skinny exchange regardless of
    corpus size."""
    toks = F.size(F.split(F.lower(F.col(text_col)), " "))
    b = F.when(toks <= buckets[0], buckets[0])
    for cap in buckets[1:]:
        b = b.when(toks <= cap, cap)
    b = b.otherwise(buckets[-1])
    eff = F.least(toks, F.lit(buckets[-1]))
    return (
        docs.select(
            b.cast("int").alias("bucket"),
            toks.cast("long").alias("ntok"),
            eff.cast("long").alias("eff"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("sum_tokens"),
            F.sum("eff").alias("used"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            (F.col("bucket") * F.col("n_docs") - F.col("used")).alias(
                "pad_waste"
            ),
            F.round(
                F.col("used") / (F.col("bucket") * F.col("n_docs")), 6
            ).alias("utilization"),
        )
    )


def mixture_materialize(
    docs: DataFrame,
    plan: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
    token_count_col: str | None = None,
) -> DataFrame:
    """Materialize a :func:`mixture_plan`: per group, pick documents in
    deterministic hash order until the group's token target is covered
    (the first doc to CROSS the budget is kept — budgets fill, never
    silently undershoot), returning the selected docs with their pick
    order and running token total. This is the step that turns the
    planning table into an actual training corpus; min(target,
    available) semantics — up-sampling epochs stay in the plan.

    Determinism: the order key is the two-fold portable hash of
    (salt, id) folded ``% 999983`` (the hash is near-monotone over
    sequential ids — the r11 rank-by-hash rule), id tie-break, so the
    per-group cumulative sum is over a total order and both engines
    replay it exactly; token counts and cumsums are exact int64.

    Scale shape: one window per group over (hash, id) — a single
    shuffle on the group key; the plan side broadcasts (groups number
    in the hundreds). The window is the budget cut, so no second pass
    and no driver-side loop; skew = the largest group's partition,
    the same bound sessionization already lives with."""
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )

    # token_count_col: share ONE tokenizer pass with mixture_plan (r16,
    # see mixture_plan) — the per-doc count is the same expression both
    # steps need, and the regexp is the row's linear-cost asymptote
    # (0.83 second-decade exponent, docs/SCALE.md).
    tok = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else F.coalesce(
            bpe_ish_token_count(F.col(text_col)), F.lit(0)
        ).cast("long")
    )
    hk = (
        portable_shingle_hash(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        )
        % 999983
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        tok.alias("n_tok"),
        hk.alias("hk"),
    )
    w = Window.partitionBy("grp").orderBy(F.asc("hk"), F.asc("id"))
    cum_before = F.coalesce(
        F.sum("n_tok").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    tgt = plan.select(
        F.col("grp").alias("tgrp"),
        F.col("target_tokens_grp").alias("target"),
    )
    return (
        base.withColumn("cum_before", cum_before)
        .withColumn("pick_order", F.row_number().over(w))
        .join(F.broadcast(tgt), F.col("grp") == F.col("tgrp"))
        .filter(F.col("cum_before") < F.col("target"))
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "n_tok",
            "pick_order",
            (F.col("cum_before") + F.col("n_tok")).alias("cum_tokens"),
        )
    )
