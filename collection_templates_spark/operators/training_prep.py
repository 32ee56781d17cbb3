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
    from collection_templates_spark.operators.dedup import (
        _spread,
        normalize_text,
    )

    toks = F.split(normalize_text(F.col(text_col)), " ")
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    g = _spread(df).select(
        F.col(id_col).alias("doc"), F.explode(grams).alias("g")
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
