"""Corpus-derived unigram language model: the public-equivalent of the
reference's external NameRank artifacts (F9/F10) and wordninja (F11).

Reference semantics being re-expressed:
- F9  ``namerank.nlp_inspector.ngrams.sequence_log_probability(
  name.lower().split(' '))`` — airflow/dags/create_merged.py:942-943 and
  airflow/dags/load_custom_collections.py:291.
- F10 ``namerank.inspect_label(label)`` → (interesting_score, best
  tokenization) — airflow/dags/create_merged.py:942 (configure_interesting_score).
- F11 ``wordninja.split(token)`` — airflow/dags/load_custom_collections.py:152.

The reference ships model files (an n-gram table, a ranked wordlist) that are
external artifacts, not public dependencies.  The public-equivalent here
derives the frequency table FROM A CORPUS DATAFRAME and implements the
published algorithms exactly:

- unigram sequence log-probability with Laplace (add-one) smoothing:
  ``lp(t) = ln((n_t + 1) / (N + V))`` summed over tokens — so unseen tokens
  get the uniform smoothed mass rather than -inf;
- interesting score = per-token geometric-mean probability
  ``exp(sum(lp)/len(tokens))`` ∈ (0, 1), paired with the best tokenization;
- word splitting = the wordninja dynamic program (public algorithm): words
  costed ``ln((rank+1) * ln(V))`` by descending frequency rank, shortest
  total-cost segmentation via a left-to-right DP with backtracking.

Everything model-side is a plain DataFrame (token, n, log_prob) built with
native explode/groupBy — at 100 TB the corpus scan is the only big stage and
it is one partial-aggregated shuffle.  The vocabulary (bounded by
``max_vocab``, frequency-ranked) is the only thing collected, and only when a
Python-side model object is actually needed (the DP splitter); pure scoring
stays JVM-side via a broadcast join (see ``score_names``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# one tokenizer convention for model building, shared with the oracle SQL:
# lowercase, split on anything outside [a-z0-9'], drop empties.
TOKEN_SPLIT_RE = "[^a-z0-9']+"


def corpus_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode a corpus into one lowercase token per row (column ``token``)."""
    return docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("token")
    ).filter(F.col("token") != "")


def word_frequency_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n, log_prob) unigram table with Laplace smoothing built in.

    ``log_prob = ln((n+1) / (total+vocab))``.  The totals ride along via a
    broadcast of the 1-row aggregate — no WindowExec, no driver round-trip.
    Scale: one partial-agg shuffle over the corpus tokens; the model itself
    is vocabulary-sized (small) from then on.
    """
    counts = corpus_tokens(docs, text_col).groupBy("token").agg(
        F.count("*").alias("n")
    )
    return unigram_model_from_counts(counts)


def score_names(
    names: DataFrame,
    model: DataFrame,
    tokens_col: str = "tokens",
    lp_col: str = "log_probability",
    score_col: str = "interesting_score",
) -> DataFrame:
    """F9/F10 as a pure DataFrame computation (no Python in the path).

    For each row's token array: posexplode, broadcast-left-join the model,
    OOV tokens take the smoothed floor ``ln(1/(total+vocab))``, then one
    groupBy re-assembles ``log_probability = Σ lp`` and
    ``interesting_score = exp(Σ lp / n_tokens)``.

    Determinism across engines: each per-token lp is rounded to 9dp before
    the sum so fp association order can't flip a downstream rounded hash.
    Scale: the model is broadcast (vocab-sized); the only shuffle is the
    per-name re-aggregation, partial-combined on the name key.

    An EMPTY model (zero rows) yields NULL ``lp_col``/``score_col`` for
    every name: the Laplace denominator ``total + vocab`` is undefined at
    V=0, and this function deliberately stays lazy (no count() action in
    plan building). Callers that would rather fail fast on an empty corpus
    should guard with ``model.take(1)`` themselves; the all-NULL behavior
    is pinned by ``tests/test_langmodel.py::test_score_names_empty_model``.
    """
    totals = model.agg(
        (F.sum("n") + F.count("*")).alias("___denom")
    )
    oov_lp = F.log(F.lit(1.0) / F.col("___denom").cast("double"))

    exploded = (
        names.withColumn("___tok", F.explode_outer(tokens_col))
        .join(F.broadcast(totals))
        .join(
            F.broadcast(model.select(F.col("token").alias("___tok"), "log_prob")),
            on="___tok",
            how="left",
        )
        .withColumn(
            "___lp", F.round(F.coalesce(F.col("log_prob"), oov_lp), 9)
        )
    )
    keys = [c for c in names.columns if c != tokens_col]
    return (
        exploded.groupBy(*keys)
        .agg(
            F.sum(F.when(F.col("___tok").isNotNull(), F.col("___lp"))).alias(
                "___sum_lp"
            ),
            F.count("___tok").alias("___n_tok"),
        )
        .withColumn(lp_col, F.col("___sum_lp"))
        .withColumn(
            score_col,
            F.when(
                F.col("___n_tok") > 0,
                F.exp(F.col("___sum_lp") / F.col("___n_tok")),
            ),
        )
        .drop("___sum_lp", "___n_tok")
    )


class UnigramModel:
    """Driver/executor-side model object for the Python-only paths (the DP
    word splitter, and scoring inside pandas UDFs where a name isn't already
    a DataFrame row).  Built from a ``{token: count}`` dict; bounded by
    construction (``from_dataframe`` caps the vocabulary frequency-ranked).
    """

    def __init__(self, freqs: dict[str, int]):
        self.freqs = freqs
        self.total = sum(freqs.values())
        self.vocab = len(freqs)
        # wordninja costing: rank words by descending frequency (token
        # lexicographic tie-break for determinism); cost = ln((rank+1)*ln(V)).
        ranked = sorted(freqs, key=lambda t: (-freqs[t], t))
        log_v = math.log(max(len(ranked), 2))
        self._cost = {w: math.log((i + 1) * log_v) for i, w in enumerate(ranked)}
        self._maxlen = max((len(w) for w in ranked), default=1)

    @classmethod
    def from_dataframe(cls, model: DataFrame, max_vocab: int = 200_000):
        """Collect the top-``max_vocab`` tokens by frequency.  This is the
        ONLY collect in the module and it is vocabulary-bounded — at 100 TB
        the corpus never moves, just its (capped) token histogram."""
        rows = (
            model.select("token", "n")
            .orderBy(F.desc("n"), F.asc("token"))
            .limit(max_vocab)
            .collect()
        )
        return cls({r["token"]: r["n"] for r in rows})

    # -- F9 ---------------------------------------------------------------
    def log_probability(self, tokens: list[str]) -> float | None:
        """Laplace-smoothed unigram sequence log-probability (9dp-rounded
        per token, matching ``score_names``)."""
        if not tokens:
            return None
        denom = float(self.total + self.vocab)
        lp = 0.0
        for t in tokens:
            lp += round(math.log((self.freqs.get(t, 0) + 1) / denom), 9)
        return lp

    # -- F10 --------------------------------------------------------------
    def interesting_score(self, label: str) -> tuple[float | None, list[str]]:
        """(geometric-mean token probability, best tokenization) — the
        inspect_label() shape; errors/empties → (None, [])."""
        if not label:
            return None, []
        tokens = self.split(label.lower())
        lp = self.log_probability(tokens)
        if lp is None:
            return None, []
        return math.exp(lp / len(tokens)), tokens

    # -- F11 --------------------------------------------------------------
    def split(self, text: str) -> list[str]:
        """wordninja's DP, re-implemented from the published algorithm:
        minimize Σ cost(word) over segmentations; unknown single characters
        cost a large-but-finite constant so mixed known/unknown input still
        segments; if no finite segmentation exists the input is returned
        whole (documented divergence — wordninja's wordlist-specific
        behavior is unreproducible without its exact wordlist)."""
        if not text:
            return []
        n = len(text)
        unk = 25.0  # ≫ any real word cost (ln((V+1)·lnV) ≈ 15 at V=2·10⁵)
        best = [0.0] + [math.inf] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            for j in range(max(0, i - self._maxlen), i):
                piece = text[j:i]
                c = self._cost.get(piece)
                if c is None and i - j == 1:
                    c = unk
                if c is not None and best[j] + c < best[i]:
                    best[i] = best[j] + c
                    back[i] = j
        if math.isinf(best[n]):  # pragma: no cover — unreachable with unk
            return [text]
        out: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            out.append(text[j:i])
            i = j
        return list(reversed(out))


def doc_perplexity(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    bi_full: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram perplexity — the classic LM-based quality
    filter (CCNet/RedPajama-style: documents scoring far from the corpus
    distribution are dropped or down-weighted before training):
    ``perplexity = exp(−Σ lp / n)`` under ``model`` (trained on ``docs``
    itself when not given; production passes a reference-corpus model).
    Columns: (doc, n_tokens, avg_lp, perplexity). Docs with no analyzer
    tokens are absent.

    Same determinism convention as score_names: each per-token lp is
    rounded to 9dp before the sum; OOV tokens take the Laplace floor.
    Scale: model and its 1-row total broadcast; the only shuffle is the
    per-doc re-aggregation, partial-combined on the doc key.

    ``pairs``/``bi_full`` (r7 verdict #3): callers running several
    perplexity variants over the same corpus pass a shared
    ``bigram_pair_stream`` / ``bigram_counts`` so neither the scoring
    explode nor the model aggregate is rebuilt — the unigram model
    derived from ``bi_full`` is expression-identical to
    ``word_frequency_model``'s.
    """
    if model is None:
        if bi_full is not None:
            model = unigram_model_from_counts(
                bi_full.groupBy("token").agg(F.sum("n2").alias("n"))
            )
        else:
            model = word_frequency_model(docs, text_col)
    totals = model.agg((F.sum("n") + F.count("*")).alias("___denom"))
    oov_lp = F.log(F.lit(1.0) / F.col("___denom").cast("double"))
    if pairs is not None:
        toks = pairs.select("doc", "token")
    else:
        toks = docs.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ).alias("token"),
        ).filter(F.col("token") != "")
    joined = (
        toks.join(F.broadcast(totals))
        .join(
            F.broadcast(model.select("token", "log_prob")), "token", "left"
        )
        .withColumn(
            "___lp", F.round(F.coalesce(F.col("log_prob"), oov_lp), 9)
        )
    )
    return (
        joined.groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("___lp").alias("___sum_lp"),
        )
        .select(
            "doc",
            "n_tokens",
            F.round(F.col("___sum_lp") / F.col("n_tokens"), 6).alias(
                "avg_lp"
            ),
            F.round(
                F.exp(-F.col("___sum_lp") / F.col("n_tokens")), 6
            ).alias("perplexity"),
        )
    )


def _token_array(text: "F.Column") -> "F.Column":
    """Ordered analyzer tokens of one document (empties removed),
    the array form of ``corpus_tokens``'s explode."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def bigram_pair_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, token, prev) — one row per token OCCURRENCE, ``prev`` NULL
    at document start. The shared scoring-side stream of the whole
    perplexity family: the unigram filter reads (doc, token) off it, the
    bigram/Kneser–Ney filters read all three columns, and
    ``bigram_counts`` over it is the ONE corpus aggregate every model
    table re-aggregates (r7 verdict #3 extracted this so callers running
    several perplexity variants build the stream once)."""
    arr = _token_array(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.zip_with(
                arr,
                F.slice(
                    F.concat(F.array(F.lit(None).cast("string")), arr),
                    1,
                    F.size(arr),
                ),
                lambda cur, prv: F.struct(
                    cur.alias("token"), prv.alias("prev")
                ),
            )
        ).alias("___pos", "___p"),
    ).select("doc", "___p.token", "___p.prev")


def bigram_counts(pairs: DataFrame) -> DataFrame:
    """(prev, token, n2) over a ``bigram_pair_stream`` — vocab²-bounded;
    unigram counts, context counts, continuation counts and type totals
    are all re-aggregations of this one corpus-scale aggregate."""
    return pairs.groupBy("prev", "token").agg(F.count("*").alias("n2"))


def unigram_model_from_counts(counts: DataFrame) -> DataFrame:
    """(token, n) → (token, n, log_prob) with the Laplace smoothing of
    ``word_frequency_model`` (shared expression so a model derived from
    ``bigram_counts`` is bit-identical to one built from the corpus)."""
    totals = counts.agg(
        F.sum("n").alias("___total"), F.count("*").alias("___vocab")
    )
    return (
        counts.join(F.broadcast(totals))
        .withColumn(
            "log_prob",
            F.log(
                (F.col("n") + F.lit(1).cast("double"))
                / (F.col("___total") + F.col("___vocab")).cast("double")
            ),
        )
        .drop("___total", "___vocab")
    )


def doc_perplexity_bigram(
    docs: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    bi_full: DataFrame | None = None,
) -> DataFrame:
    """Per-document perplexity under an INTERPOLATED bigram LM — the
    CCNet-style quality filter one order up from ``doc_perplexity``:
    token i ≥ 2 scores p = λ·p_bi(w|v) + (1−λ)·p_uni(w), the first token
    scores p_uni alone; both estimators are Laplace-smoothed
    (p_uni = (c(w)+1)/(total+V), p_bi = (c(v,w)+1)/(ctx(v)+V) with
    ctx(v) = Σ_w c(v,w)). A repeated-phrase document scores near-zero
    bigram surprise while staying unigram-plausible — exactly the signal
    the unigram filter cannot see. Columns: (doc, n_tokens, avg_lp,
    perplexity); docs with no analyzer tokens are absent.

    Determinism: per-token lp is 9dp-rounded before the per-doc sum
    (repo convention); every probability derives from integer counts by
    the same expression shape in both engines.

    Scale: the unigram model, totals, and context-count table are
    vocabulary-sized broadcasts; the bigram table is vocab²-bounded and
    joined WITHOUT a broadcast hint (AQE picks broadcast while it fits,
    shuffle-hash beyond — at web scale it is the one legitimately big
    model side). One pair-explode pass over the corpus, one per-doc
    re-aggregation, both partial-combined. ``pairs``/``bi_full``: pass a
    shared ``bigram_pair_stream`` / ``bigram_counts`` when running
    several perplexity variants over the same corpus (r7 verdict #3).
    """
    if pairs is None:
        pairs = bigram_pair_stream(docs, id_col, text_col)
    # ONE corpus-scale aggregate feeds every model table: uni and ctx
    # are re-aggregations of the (prev, token) counts (vocab²-bounded),
    # so the explode pass runs twice total (model side + scoring side),
    # not four times
    if bi_full is None:
        bi_full = bigram_counts(pairs)
    uni = bi_full.groupBy("token").agg(F.sum("n2").alias("n"))
    totals = uni.agg(
        F.sum("n").alias("___total"), F.count("*").alias("___vocab")
    )
    bi = bi_full.filter(F.col("prev").isNotNull())
    ctx = bi.groupBy("prev").agg(F.sum("n2").alias("nc"))

    p_uni = (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double") / (
        F.col("___total") + F.col("___vocab")
    ).cast("double")
    p_bi = (F.coalesce(F.col("n2"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("nc"), F.lit(0)) + F.col("___vocab")
    ).cast("double")
    p = F.when(
        F.col("prev").isNull(), p_uni
    ).otherwise(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)

    scored = (
        pairs.join(F.broadcast(totals))
        .join(F.broadcast(uni), "token", "left")
        .join(bi, ["prev", "token"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .withColumn("___lp", F.round(F.log(p), 9))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("___lp").alias("___sum_lp"),
        )
        .select(
            "doc",
            "n_tokens",
            F.round(F.col("___sum_lp") / F.col("n_tokens"), 6).alias(
                "avg_lp"
            ),
            F.round(
                F.exp(-F.col("___sum_lp") / F.col("n_tokens")), 6
            ).alias("perplexity"),
        )
    )


def doc_perplexity_kneser_ney(
    docs: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    bi_full: DataFrame | None = None,
) -> DataFrame:
    """Per-document perplexity under an interpolated KNESER–NEY bigram
    LM (Kneser & Ney 1995; the smoothing that superseded naive
    interpolation in every serious n-gram stack — Chen & Goodman 1999's
    winner): token i ≥ 2 scores

        p(w|v) = max(c(v,w) − D, 0)/c(v·)
               + (D·N1+(v·)/c(v·)) · P_cont(w)

    with absolute discount D, N1+(v·) = distinct continuations of v,
    and the CONTINUATION probability P_cont(w) = (N1+(·w)+1)/(T+V)
    (N1+(·w) = distinct predecessors of w, T = bigram types; the +1/+V
    Laplace floor keeps doc-initial-only tokens scoreable — documented
    deviation from the textbook form, which is undefined for them). The
    first token scores P_cont alone. Intuition the naive interpolation
    misses: a token frequent only inside one collocation ("francisco")
    gets a LOW continuation probability however high its raw count.

    Columns and determinism conventions identical to
    ``doc_perplexity_bigram`` (9dp per-token lp, 6dp outputs); the same
    single (prev, token) corpus aggregate feeds every model table —
    ctx/continuation/type counts are re-aggregations of it.

    Scale: identical shape to doc_perplexity_bigram — vocabulary-sized
    broadcasts everywhere except the vocab²-bounded bigram join, which
    AQE resolves. ``pairs``/``bi_full``: pass a shared
    ``bigram_pair_stream`` / ``bigram_counts`` when running several
    perplexity variants over the same corpus (r7 verdict #3).
    """
    if pairs is None:
        pairs = bigram_pair_stream(docs, id_col, text_col)
    if bi_full is None:
        bi_full = bigram_counts(pairs)
    uni = bi_full.groupBy("token").agg(F.sum("n2").alias("n"))
    bi = bi_full.filter(F.col("prev").isNotNull())
    ctx = bi.groupBy("prev").agg(
        F.sum("n2").alias("nc"), F.count("*").alias("nu")
    )
    cont = bi.groupBy("token").agg(F.count("*").alias("np"))
    totals = bi.agg(F.count("*").alias("___types")).join(
        uni.agg(F.count("*").alias("___vocab"))
    )

    d = F.lit(discount)
    p_cont = (F.coalesce(F.col("np"), F.lit(0)) + 1).cast("double") / (
        F.col("___types") + F.col("___vocab")
    ).cast("double")
    p_kn = (
        F.greatest(F.col("n2") - d, F.lit(0.0)) / F.col("nc")
        + (d * F.col("nu") / F.col("nc")) * p_cont
    )
    p = F.when(F.col("prev").isNull(), p_cont).otherwise(p_kn)

    scored = (
        pairs.join(F.broadcast(totals))
        .join(F.broadcast(cont), "token", "left")
        .join(bi, ["prev", "token"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .withColumn("___lp", F.round(F.log(p), 9))
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("___lp").alias("___sum_lp"),
        )
        .select(
            "doc",
            "n_tokens",
            F.round(F.col("___sum_lp") / F.col("n_tokens"), 6).alias(
                "avg_lp"
            ),
            F.round(
                F.exp(-F.col("___sum_lp") / F.col("n_tokens")), 6
            ).alias("perplexity"),
        )
    )
