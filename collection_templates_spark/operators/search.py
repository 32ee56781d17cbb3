"""Batch search analogue of the serving-side ES query (SURVEY §2.10).

The reference serves name-discovery from Elasticsearch (multi_match over
name/keyword fields + rank_feature boosts + LTR rescore — research/
learning-to-rank/search.py:14-94). The engine-side batch equivalent scores
a query against the corpus with TF-IDF (BM25-ish) over tokenized text plus
a log-rank feature boost, then takes a deterministic top-k. Useful for
correctness demos and offline relevance evaluation; not a serving system.

All scoring is native column expressions: per-term regexp counts (TF),
one small aggregation for document frequencies (IDF, broadcast back), and a
single window for top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_tf(text: F.Column, term: str) -> F.Column:
    """Occurrences of term as a whole token (space-tokenized count)."""
    return F.size(
        F.filter(F.split(F.lower(text), " "), lambda t: t == F.lit(term))
    )


def search_corpus(
    docs: DataFrame,
    query: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_col: str | None = None,
    rank_boost: float = 0.1,
) -> DataFrame:
    """Top-k docs for a whitespace-tokenized query.

    score = Σ_t tf(t, doc) · ln((N+1)/(df_t+1))  [+ rank_boost · log2(1+rank)]
    Deterministic: ranking on 6dp-rounded score with id tie-break.
    """
    terms = [t for t in query.lower().split() if t]
    n_docs = docs.count()

    # document frequencies: one tiny aggregation, result folded into literals
    df_row = docs.agg(
        *[
            F.sum((_term_tf(F.col(text_col), t) > 0).cast("long")).alias(t)
            for t in terms
        ]
    ).collect()[0]
    idf = {t: math.log((n_docs + 1) / ((df_row[t] or 0) + 1)) for t in terms}

    score = None
    for t in terms:
        part = _term_tf(F.col(text_col), t) * F.lit(idf[t])
        score = part if score is None else score + part
    if rank_col is not None:
        score = score + F.lit(rank_boost) * F.log2(F.col(rank_col) + 1)

    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    # no global sort); the row_number window then runs over only k rows.
    top = (
        docs.withColumn("score", F.round(score, 6))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    # constant partition key: only k rows ever reach this window (the
    # limit(k) above), so one partition is correct — the lit(0) spec just
    # keeps WindowExec from warning about a missing partition.
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "score"
    )


def token_frequencies(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """A10 (collections-preprocessing token counts): per-group token
    frequency table via explode + count."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("grp", "token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
