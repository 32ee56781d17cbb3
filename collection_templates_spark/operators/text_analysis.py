"""Text-analysis operators for training-data pipelines.

All hot-path logic is native ``pyspark.sql.functions`` column expressions
(whole-stage codegen, zero Python) — at 100 TB these run at scan speed with
column pruning; nothing here shuffles.

Operators:
- token / character statistics + quality scoring (length, punctuation,
  stopword ratios — the classic "is this document prose" heuristics)
- language identification via marker-word / script heuristics
- document fingerprinting (polynomial rolling hash, Karp-Rabin shingles)

The reference has no text-corpus analytics (its text ops are name
normalization, SURVEY.md §2.7); these are the §9-extension operators for
LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small closed stopword sets keep language-ID a pure column expression.
STOPWORDS_EN = (
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "are",
    "was", "for", "with", "that", "this", "it", "as", "at", "by",
)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "dans"),
    "es": ("el", "la", "los", "las", "es", "no", "por", "para"),
}

HASH_MOD = 2147483647  # 2^31 - 1, Mersenne prime — portable 31-base poly hash
HASH_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-pretokenizer-style pieces: letter runs, single digits,
    punctuation singletons (the GPT-2 pretokenizer shape, regex-only)."""
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n > 0, F.regexp_count(text, F.lit("[^A-Za-z0-9\\s]")) / n).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] prose-quality heuristic: enough tokens, low
    punctuation density, natural stopword rate."""
    n_tok = F.size(tokens(text))
    len_component = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    stop_component = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return 0.4 * len_component + 0.3 * punct_component + 0.3 * stop_component


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language (n-gram-heuristic language ID)."""
    toks = tokens(text)

    def hits(markers: tuple[str, ...]) -> Column:
        # N.B. markers must be closed over, not a lambda default — Spark's
        # higher-order-function binder feeds a Column into every lambda param.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    return {lang: hits(markers) for lang, markers in LANG_MARKERS.items()}


def language_id(text: Column) -> Column:
    """argmax over marker-hit counts, 'und' (undetermined) when all zero;
    CJK script presence short-circuits to 'zh'. Deterministic tie-break by
    language code order via greatest-on-struct."""
    scores = language_scores(text)
    # struct comparison: (score, lang) max — later alphabetical code wins ties
    # only through the explicit ordering below, so ties are deterministic.
    pairs = [
        F.struct(score.alias("s"), F.lit(lang).alias("l"))
        for lang, score in sorted(scores.items())
    ]
    best = F.greatest(*pairs)
    has_cjk = F.regexp_count(text, F.lit("[\\u4e00-\\u9fff]")) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best["s"] > 0, best["l"])
        .otherwise(F.lit("und"))
    )


def poly_fingerprint(text: Column) -> Column:
    """Polynomial hash over characters: h = (h*31 + code) mod (2^31-1).

    Engine-portable (pure integer arithmetic) and order-sensitive — a true
    document fingerprint, unlike a bag-of-words hash. Runs as one
    ``aggregate`` over the split array, fully JVM-side.
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_BASE + F.ascii(c)) % HASH_MOD,
    )


def rolling_shingle_hashes(text: Column, window: int = 8) -> Column:
    """Karp-Rabin rolling-window hashes: the poly hash of every ``window``-char
    substring, as an array. Basis for containment / near-dup detection at the
    substring level (each value is computable from the previous in O(1); here
    we express it as per-window aggregate — still codegen'd, no Python)."""
    chars = F.split(text, "")
    n = F.size(chars)
    # sequence(1, 0) descends in Spark — empty branch for short texts
    starts = F.when(
        n >= window, F.sequence(F.lit(1), n - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda i: F.aggregate(
            F.slice(chars, i, window),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * HASH_BASE + F.ascii(c)) % HASH_MOD,
        ),
    )


def _winnowing_marked(
    df: DataFrame, k: int, w: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc, pos, h, sel) — every rolling k-char hash with its winnowing
    selection flag. Shared by winnowing_summary / winnowing_containment_pairs;
    see winnowing_summary for the algorithm and tie rule.

    The hash array comes from the numpy-batched ``rolling_hash_udf``
    (value-identical to the native ``rolling_shingle_hashes``, asserted by
    test_winnowing_udf_matches_native): the native HOF form is an
    interpreted per-position aggregate and dominates the operator (~2 s of
    a 2.3 s query at sf0.1); the Arrow batch is k vectorized Horner steps.
    """
    from pyspark.sql import Window

    from collection_templates_spark.functions.udfs import rolling_hash_udf
    from collection_templates_spark.operators.dedup import _spread

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    h = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.posexplode(rolling_hash_udf(norm, F.lit(k))).alias("pos", "h"),
    )
    trail = Window.partitionBy("doc").orderBy("pos").rowsBetween(-(w - 1), 0)
    lead = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    # min of the full window ENDING here (null while the window is partial)
    mn = F.when(F.col("pos") >= w - 1, F.min("h").over(trail))
    return h.withColumn("mn", mn).withColumn(
        # selected iff this hash is the min of SOME full window containing
        # it: all containing-window minima are <= h, so max == h iff some
        # window's min equals it (max ignores the partial-window nulls)
        "sel",
        F.max("mn").over(lead) == F.col("h"),
    )


def winnowing_summary(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003, the
    MOSS algorithm): over each document's Karp-Rabin ``k``-char rolling
    hashes, every window of ``w`` consecutive hashes contributes its
    minimum — the selected positions form a fingerprint set with
    guaranteed coverage (any shared substring of length ≥ k+w-1 yields a
    shared fingerprint) at expected density 2/(w+1).

    Tie rule: a position is selected when its hash EQUALS the minimum of
    some full window containing it — on (rare, 31-bit) intra-window hash
    ties both positions are selected, identically in both engines; the
    classic rightmost-only rule needs argmin-with-position, which has no
    portable cross-engine expression.

    Output per doc: ``n_hashes`` (rolling hashes = chars-k+1),
    ``n_fp`` (selected), ``density`` (n_fp/n_hashes, round 6), and
    ``fp_checksum`` = Σ hash·(pos+1) mod 2^31-1 over selected positions —
    an order-and-position-sensitive digest that pins the exact selected
    set without shipping it. Docs with fewer than k+w-1 chars have no
    full window and are absent (same contract as the gram operators).

    Scale shape: the rolling hashes are a native higher-order expression
    per doc; selection is two window passes over (doc, pos) — ONE shuffle
    on the doc key serves both (same partitioning, consecutive
    WindowExecs); the final per-doc aggregate reuses that clustering.
    No UDFs, no joins.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    sel = _winnowing_marked(df, k, w, id_col, text_col)
    return (
        sel.groupBy("doc")
        .agg(
            F.count("*").alias("n_hashes"),
            F.sum(F.when(F.col("sel"), 1).otherwise(0)).alias("n_fp"),
            F.sum(
                F.when(
                    F.col("sel"), (F.col("h") * (F.col("pos") + 1)) % HASH_MOD
                ).otherwise(0)
            ).alias("fp_checksum"),
        )
        .filter(F.col("n_fp") > 0)
        .withColumn("density", F.round(F.col("n_fp") / F.col("n_hashes"), 6))
    )


def winnowing_containment_pairs(
    df: DataFrame,
    k: int = 20,
    w: int = 8,
    min_shared: int = 2,
    max_bucket_size: int | None = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS-style cross-document copy detection: pairs of documents whose
    winnowing fingerprint VALUE sets (position-independent, like MOSS's
    final match step) share ≥ ``min_shared`` hashes, scored by
    ``containment`` = shared / min(|fp_a|, |fp_b|).

    Containment — not Jaccard — is the point: a 1-page document pasted
    into a 100-page one shares nearly all of its fingerprints
    (containment ≈ 1) while Jaccard is diluted to ~0.01; this is the
    plagiarism / quote-inclusion signal the set-similarity dedup family
    misses by construction. Winnowing's guarantee makes it robust: any
    shared substring of length ≥ k+w-1 chars contributes a shared
    fingerprint regardless of where it sits in either document.

    Scale shape: the standard inverted-index bucket-collect — distinct
    (doc, hash) fingerprints group ONCE on the 8-byte hash value, pairs
    are enumerated inside each bucket (``dedup._bucket_pairs``), and the
    per-pair shared count is exact (each shared value contributes exactly
    one pair row). Each doc's fingerprint-set SIZE rides along in the
    bucket struct (the simhash carried-fingerprint trick), so scoring is
    inline on the pair aggregate — the expensive winnowing phase runs
    exactly once and nothing joins back. ``max_bucket_size`` is the
    hot-bucket guard: a boilerplate substring shared by B docs is a B²
    bucket no matter how pairs are enumerated — capped buckets make the
    shared counts a LOWER bound (ubiquitous fingerprints stop witnessing
    pairs), which is the right degradation for copy detection since
    corpus-wide boilerplate is exactly what should not count as copying.
    Pass ``None`` for exact counts on corpora known to be small.

    Session side effect: excludes ``InferFiltersFromGenerate`` on first
    call (see dedup._spread / ngram_jaccard_pairs).
    """
    from pyspark.sql import Window

    from collection_templates_spark.operators.dedup import _bucket_pairs

    fp = (
        _winnowing_marked(df, k, w, id_col, text_col)
        .filter(F.col("sel"))
        .groupBy("doc", "h")
        .agg(F.lit(1).alias("___one"))
        .withColumn("n_fp", F.count("*").over(Window.partitionBy("doc")))
    )
    return (
        _bucket_pairs(
            fp.groupBy("h").agg(
                F.collect_list(
                    F.struct(F.col("doc"), F.col("n_fp"))
                ).alias("ms")
            ),
            max_bucket_size,
        )
        .groupBy(
            F.col("a.doc").alias("doc1"),
            F.col("b.doc").alias("doc2"),
        )
        .agg(
            F.count("*").alias("n_shared"),
            # n_fp is constant per doc; max() just picks it out
            F.max("a.n_fp").alias("n1"),
            F.max("b.n_fp").alias("n2"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "doc1",
            "doc2",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("n1", "n2"), 6
            ).alias("containment"),
        )
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_m": F.length(t),
            "n_tokens": F.size(tokens(t)),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "quality_score": quality_score(t),
        }
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", language_id(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return df.withColumn("fingerprint", poly_fingerprint(norm))


def token_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Pointwise mutual information of ADJACENT token pairs — the
    collocation / multi-word-expression detector (Church & Hanks 1990)
    a tokenizer-induction or phrase-mining pass runs over a corpus:
    PMI = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) from adjacent-pair
    counts (denominator = total adjacent pairs) and p(·) from unigram
    occurrence counts (denominator = total tokens). Pairs under
    ``min_count`` are cut (PMI is notoriously unstable on rare counts).

    Output: (prev, token, n_pair, pmi) for every surviving pair, pmi
    rounded to 6dp. The two corpus totals are single-row aggregates
    (bounded driver state, the audited-collect convention); counts are
    exact integers so the probability ratios are bit-reproducible in
    any IEEE engine evaluating the same division shape:
    (n2/M) / ((n_a/N) · (n_b/N)).

    ``pairs``: optional precomputed
    :func:`~collection_templates_spark.functions.langmodel.bigram_pair_stream`
    — the perplexity family shares the identical stream, so callers
    holding its memo pass it in and this costs ONE vocab²-bounded
    aggregate, no corpus re-explode.

    Scale: unigram and bigram counts are map-side-combined groupBys
    (vocab- / vocab²-bounded); the final join joins the bigram table to
    the (small, broadcast) unigram table twice. No window, no
    all-pairs anything.
    """
    from collection_templates_spark.functions.langmodel import (
        bigram_pair_stream,
    )

    if pairs is None:
        pairs = bigram_pair_stream(docs, text_col=text_col)
    # corpus totals ride as a broadcast 1-row aggregate (guide §5.3,
    # the Q11 broadcast-scalar shape) — previously a .collect()[0]
    # driver job serialized before the pmi job could be submitted
    totals = pairs.agg(
        F.count(F.lit(1)).alias("___n_tok"),
        F.count("prev").alias("___n_pair"),
    )
    n_tok = F.col("___n_tok").cast("double")
    n_pair = F.col("___n_pair").cast("double")
    uni = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("n1"))
    bi = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("n2"))
        .filter(F.col("n2") >= min_count)
    )
    ua = F.broadcast(
        uni.select(F.col("token").alias("prev"), F.col("n1").alias("n_a"))
    )
    ub = F.broadcast(
        uni.select(F.col("token").alias("token"), F.col("n1").alias("n_b"))
    )
    p_pair = F.col("n2").cast("double") / n_pair
    p_a = F.col("n_a").cast("double") / n_tok
    p_b = F.col("n_b").cast("double") / n_tok
    return (
        bi.join(ua, "prev")
        .join(ub, "token")
        .join(F.broadcast(totals))
        .select(
            "prev",
            "token",
            F.col("n2").cast("long").alias("n_pair"),
            F.round(F.log(p_pair / (p_a * p_b)), 6).alias("pmi"),
        )
    )


def script_mix(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document script composition — the multilingual-corpus audit
    that catches mislabeled languages and code/markup contamination:
    counts and fractions of Latin letters, CJK ideographs, digits,
    whitespace and other codepoints, a deterministic dominant-script
    pick, and a mixed-script flag (Latin AND CJK both present).

    Classes are explicit CODEPOINT RANGES (digits 48-57, Latin 65-90 /
    97-122, CJK U+4E00-U+9FFF, whitespace 9/10/13/32), not regex
    ``\\p{...}`` classes — property-class semantics differ between
    regex engines, codepoint arithmetic doesn't (Spark ``ascii`` and
    DuckDB ``ascii`` both return the first codepoint). Dominance
    resolves ties with a fixed priority (cjk > latin > digit > other);
    whitespace never dominates.

    Scale: one per-char explode feeding ONE map-side-combined per-doc
    aggregate — scan-shaped, no join, no window; at 100 TB the explode
    can be swapped for per-class ``regexp_count`` expressions if the
    regex engine is trusted, this form is the oracle-replayable exact
    semantics."""
    cp = F.ascii(F.col("c"))
    cls = (
        F.when((cp >= 48) & (cp <= 57), "digit")
        .when(((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122)), "latin")
        .when((cp >= 19968) & (cp <= 40959), "cjk")
        .when(cp.isin(9, 10, 13, 32), "space")
        .otherwise("other")
    )
    chars = docs.select(
        id_col, F.explode(F.split(F.col(text_col), "")).alias("c")
    ).filter(F.col("c") != "")

    def n(k: str) -> F.Column:
        return F.sum((cls == k).cast("long")).alias(f"n_{k}")

    agg = chars.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chars"),
        n("latin"), n("cjk"), n("digit"), n("space"), n("other"),
    )
    dom = (
        F.when(
            (F.col("n_cjk") >= F.col("n_latin"))
            & (F.col("n_cjk") >= F.col("n_digit"))
            & (F.col("n_cjk") >= F.col("n_other")),
            "cjk",
        )
        .when(
            (F.col("n_latin") >= F.col("n_digit"))
            & (F.col("n_latin") >= F.col("n_other")),
            "latin",
        )
        .when(F.col("n_digit") >= F.col("n_other"), "digit")
        .otherwise("other")
    )
    return agg.select(
        id_col,
        "n_chars",
        "n_latin",
        "n_cjk",
        "n_digit",
        "n_space",
        "n_other",
        F.round(F.col("n_latin") / F.col("n_chars"), 6).alias("frac_latin"),
        F.round(F.col("n_cjk") / F.col("n_chars"), 6).alias("frac_cjk"),
        dom.alias("dominant"),
        ((F.col("n_latin") > 0) & (F.col("n_cjk") > 0))
        .cast("int")
        .alias("is_mixed"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    max_rank: int = 1000,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Zipf-law fit of the corpus frequency distribution: the OLS slope
    of ln(frequency) against ln(rank) over the top ``max_rank`` terms —
    the corpus-health scalar (natural prose sits near −1; templated or
    deduplicate-me corpora drift far off). One row:
    (n_terms, slope, intercept).

    Determinism: rank order is the total (count DESC, token ASC); the
    regression is the CLOSED FORM over sums that are each rounded to
    6dp before the final division, so fp summation order can never move
    the slope (same convention as the JS/perplexity families — no
    reliance on an engine's regr_slope internals). ``tokens_df``: an
    optional precomputed (token) occurrence stream (the memoized
    perplexity pairs), else tokenized here.

    Scale: one vocab-bounded count aggregate, an engine-partial top-k
    (orderBy+limit), and a ≤ max_rank-row window + single-row reduce.
    """
    from pyspark.sql import Window

    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    if tokens_df is None:
        tokens_df = docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ).alias("token")
        ).filter(F.col("token") != "")
    counts = tokens_df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_rank)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    pts = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
    )
    slope = (
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return sums.select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 4).alias(
            "intercept"
        ),
    )


def readability_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document readability: Flesch reading ease and Flesch–Kincaid
    grade from word / sentence / syllable counts — the lightweight
    quality signal reading-level filters (and school-grade corpus
    splits) are built on.

    Proxies are the standard cheap ones: words are TOKEN_SPLIT_RE
    tokens, sentences are ``[.!?]+`` runs (min 1), a word's syllables
    are its ``[aeiouy]+`` vowel groups (min 1 — "rhythm" counts 1, not
    0). Counts are integers, the two formulas are exact-input double
    arithmetic rounded to 4dp — engine-identical with no summation-
    order exposure (everything is per-row).

    Scale: pure column expressions (one higher-order aggregate over the
    in-row token array — nothing explodes to a token table, nothing
    shuffles); output is one row per document.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    words = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    n_words = F.size(words)
    n_sentences = F.greatest(
        F.lit(1), F.regexp_count(F.col(text_col), F.lit("[.!?]+"))
    )
    n_syllables = F.aggregate(
        words,
        F.lit(0),
        lambda acc, x: acc
        + F.greatest(F.lit(1), F.regexp_count(x, F.lit("[aeiouy]+"))),
    )
    wps = n_words.cast("double") / n_sentences.cast("double")
    spw = n_syllables.cast("double") / n_words.cast("double")
    return docs.filter(n_words > 0).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        n_syllables.cast("long").alias("n_syllables"),
        (
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
            )
            + F.lit(0.0)  # kill the -0.0/+0.0 cross-engine zero-sign split
        ).alias("flesch"),
        (
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
            )
            + F.lit(0.0)
        ).alias("fk_grade"),
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    gibberish/compression-proxy filter: near-zero entropy is repeated
    filler, unusually high is base64/binary junk; both get cut before
    training.

    Determinism: per-char probabilities are exact integer divisions;
    each −p·ln(p)/ln(2) term is rounded to 9dp BEFORE the per-doc sum
    and the sum to 6dp (the drift_js / perplexity convention — ln-based
    with an explicit ln 2 literal, never an engine's log2 builtin).

    Scale: one explode + two map-side-combined aggregates keyed by
    doc_id — the same shape as script_mix; per-doc char alphabets are
    bounded, so the (doc, char) intermediate is O(docs · alphabet).
    """
    ln2 = F.lit(0.6931471805599453)
    per_char = (
        docs.select(
            "doc_id", F.explode(F.split(F.col(text_col), "")).alias("c")
        )
        .filter(F.col("c") != "")  # script_mix's defensive empty-char cut
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_char.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    p = F.col("cnt").cast("double") / F.col("n_chars").cast("double")
    term = F.round(-(p * F.log(p) / ln2), 9)
    return (
        per_char.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n_chars").cast("long").alias("n_chars"),
            F.max("n_distinct").cast("long").alias("n_distinct"),
            F.round(F.sum(term), 6).alias("entropy_bits"),
        )
    )


RAKE_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "are",
    "was", "for", "with", "that", "this", "it", "as", "at", "by",
)


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal token runs between stopword/punctuation boundaries; a word
    scores degree/frequency (degree = Σ length of phrases containing it,
    frequency = its occurrence count — co-occurrence favors words living
    in long phrases); a phrase scores the sum of its word scores. Top
    ``k`` phrases corpus-wide.

    Determinism: phrase segmentation is a cumulative boundary count
    (gaps-and-islands — replayable SQL, no UDF); degree/frequency are
    integers; word scores are exact divisions rounded 6dp; a phrase sums
    ≤ ``max_phrase_len`` rounded scores (6dp again — bounded-order
    noise dies at the round); top-k orders by (score desc, n desc,
    phrase asc).

    Scale shape: one posexplode + cumulative window per doc (the
    pack_sequences shape), two token-keyed aggregates for word stats
    (vocab-bounded), one broadcast score join back, TakeOrdered. Phrases
    longer than ``max_phrase_len`` are dropped (RAKE's own convention —
    unbounded runs are boilerplate, not keywords).
    """
    from pyspark.sql import Window

    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )

    sw = F.array(*[F.lit(s) for s in RAKE_STOPWORDS])
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE))
        .alias("pos", "tok"),
    )
    is_boundary = (F.col("tok") == "") | F.array_contains(sw, F.col("tok"))
    w = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = toks.withColumn(
        "phrase_id", F.sum(is_boundary.cast("int")).over(w)
    ).filter(~is_boundary)
    # phrases feeds THREE consumers (member, texts, and member's own
    # word-stat reaggregation) — checkpoint or the whole
    # posexplode+window chain re-runs per consumer (the triangle_count
    # lineage-cut rule; measured 43 s -> ~3 s at sf0.001).
    phrases = (
        marked.groupBy("doc", "phrase_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("pos").alias("pos"),
                                 F.col("tok").alias("tok"))
                    )
                ),
                lambda s: s.tok,
            ).alias("words")
        )
        .filter(F.size("words") <= max_phrase_len)
        .localCheckpoint(eager=True)
    )
    member = phrases.select(
        "doc", "phrase_id", F.size("words").alias("plen"),
        F.explode("words").alias("tok"),
    )
    word_stats = member.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    score = F.round(
        F.col("deg").cast("double") / F.col("freq").cast("double"), 6
    )
    scored_words = word_stats.select("tok", score.alias("wscore"))
    phrase_scores = (
        member.join(F.broadcast(scored_words), "tok")
        .groupBy("doc", "phrase_id")
        .agg(F.round(F.sum("wscore"), 6).alias("score"))
    )
    texts = phrases.select(
        "doc", "phrase_id", F.array_join("words", " ").alias("phrase")
    )
    agg = (
        texts.join(phrase_scores, ["doc", "phrase_id"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("score").alias("score"),
        )
    )
    return agg.orderBy(
        F.col("score").desc(), F.col("n").desc(), F.col("phrase").asc()
    ).limit(k)


def heaps_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heaps'-law fit: the log-log OLS of per-document vocabulary size
    against token count (V ≈ K·N^β; natural prose sits near β ∈
    [0.7, 0.9] — a flat β is templated text, β ≈ 1 is near-random
    vocabulary) — the corpus-health scalar next to zipf_fit, over
    PER-DOCUMENT points instead of the rank curve.

    Determinism: N and V are integers per doc; ln points are exact-input;
    the regression is the zipf_fit closed form over sums rounded 6dp
    BEFORE the final division — never an engine's regr_slope. Docs with
    fewer than 2 tokens are dropped (a 1-token doc pins V = N and adds
    no slope information; stated). Output one row:
    (n_docs, beta, ln_k).

    Plan shape (r12 verdict #5 — this row's 0.82 exponent was the r4
    HOF trap in miniature): a `.filter(n_tok >= 2)` on the computed
    token count gets pushed below the Project and re-derives the whole
    interpreted split chain, and Project collapsing inlines it again
    per consumer — 3 evaluations per row, measured 4.55 s at sf1. The
    fix is a single-element-array explode (a Generate BARRIER: its
    output is an attribute, so nothing re-derives the chain) plus
    when-guards instead of a Filter (nothing for predicate pushdown or
    InferFiltersFromGenerate to move on a vanilla session) — ONE
    tokenize per row, 2.25 s at sf1.
    """
    from collection_templates_spark.functions.langmodel import (
        TOKEN_SPLIT_RE,
    )
    from collection_templates_spark.operators.dedup import (
        ensure_infer_generate_excluded,
    )

    # vanilla sessions: keep InferFiltersFromGenerate from synthesizing
    # a chain-re-deriving filter below the barrier Generate
    ensure_infer_generate_excluded(docs.sparkSession)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    arr = docs.select(F.explode(F.array(words)).alias("w"))
    ok = F.size("w") >= 2
    pts = arr.select(
        F.when(ok, F.log(F.size("w").cast("double"))).alias("x"),
        F.when(
            ok, F.log(F.size(F.array_distinct("w")).cast("double"))
        ).alias("y"),
    )
    sums = pts.agg(
        # count("x"), not count(*): the when-guard nulls sub-threshold docs
        F.count("x").cast("double").alias("k"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
    )
    slope = (
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return sums.select(
        F.col("k").cast("long").alias("n_docs"),
        F.round(slope, 4).alias("beta"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("k"), 4
        ).alias("ln_k"),
    )
