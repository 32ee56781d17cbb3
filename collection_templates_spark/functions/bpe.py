"""Byte-pair-encoding tokenizer induction over a Spark corpus.

The scale split is the one production tokenizer trainers use
(sentencepiece / HF tokenizers): the CORPUS-scale work is exactly one
word-frequency count — a map-side-combined groupBy Spark executes at scan
speed — and the merge-learning loop runs over that (pruned, bounded)
word-frequency table on the driver, because its cost is
O(vocab × merges), independent of corpus size. Applying the learned
merges back to the corpus goes through the distinct→compute→join idiom
(functions/udfs.compute_on_distinct): tokenization cost is per DISTINCT
word, the reference-memoization pattern this repo uses for every
expensive per-string function.

Determinism: merge selection is (pair count DESC, pair lexicographic ASC)
— a total order — so the same corpus always learns the same merge table
on any cluster layout.

No oracle query: the merge table is data-dependent, and the driver's
oracle SQL is generated statically — the learner is pinned by unit tests
(hand-computed merges, reconstruction invariant, monotone compression,
UDF-vs-driver tokenization equality) instead.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _n_pieces_udf_for(merges: list[tuple[str, str]]):
    """Module-scope pandas-UDF factory (type-hint resolution requires the
    annotations to resolve against module globals — see functions/udfs.py)."""
    m = list(merges)

    @F.pandas_udf("int")
    def n_pieces_udf(words: pd.Series) -> pd.Series:
        return pd.Series(
            [len(apply_bpe(w, m)) if w is not None else 0 for w in words]
        )

    return n_pieces_udf


def bpe_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int | None = 100_000,
) -> DataFrame:
    """(word, n) frequency table of normalized whitespace tokens — the one
    corpus-scale pass. ``min_count`` / ``max_words`` are the pruning every
    at-scale trainer applies before the driver sees anything: the cap is a
    TakeOrdered top-N (count desc, word asc — total order), never a global
    window."""
    from collection_templates_spark.operators.dedup import (
        _spread,
        normalize_text,
    )

    counts = (
        _spread(docs)
        .select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    if max_words is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
            max_words
        )
    return counts


def learn_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Classic BPE (Sennrich/Haddow/Birch 2016) over a word-frequency
    table: words start as character sequences + ``</w>``; each step merges
    the most frequent adjacent symbol pair (ties → lexicographically
    smallest pair). Pure driver-side Python BY DESIGN — see module
    docstring. Stops early when no pair occurs twice."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], n) for w, n in word_counts
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        pair = min(p for p, c in pairs.items() if c == best_count)
        merges.append(pair)
        a, b = pair
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge table (merges applied in
    learned priority order, the standard greedy scheme)."""
    syms = list(word) + [END]
    rank = {p: i for i, p in enumerate(merges)}
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int | None = 100_000,
) -> list[tuple[str, str]]:
    """One corpus pass + driver merge loop → the learned merge table.
    Only the pruned (word, n) table is collected (bounded by
    ``max_words``); collection order cannot matter because the learner
    re-sorts nothing — pair counts are order-free and ties break
    lexicographically."""
    counts = bpe_word_counts(docs, text_col, min_count, max_words)
    return learn_bpe_merges(
        [(r["word"], r["n"]) for r in counts.collect()], n_merges
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc subword statistics under a learned merge table:
    (doc, n_words, n_pieces, compression = pieces/words). The per-word
    tokenization runs once per DISTINCT word (compute_on_distinct's
    broadcast-join memoization), then aggregates natively."""
    from collection_templates_spark.functions.udfs import compute_on_distinct
    from collection_templates_spark.operators.dedup import (
        _spread,
        normalize_text,
    )

    n_pieces_udf = _n_pieces_udf_for(merges)
    exploded = _spread(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "word"
        ),
    ).filter(F.col("word") != "")
    pieced = compute_on_distinct(
        exploded, "word", fn=n_pieces_udf, out_col="n_p"
    )
    return (
        pieced.groupBy("doc")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_p").alias("n_pieces"),
        )
        .withColumn(
            "compression", F.round(F.col("n_pieces") / F.col("n_words"), 6)
        )
    )
