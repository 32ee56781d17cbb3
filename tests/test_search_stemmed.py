"""Behavioral checks for the analyzer-grade search (stemmed BM25 + LTR)."""

from pyspark.sql import functions as F  # noqa: F401

from collection_templates_spark.operators.search import search_corpus_stemmed

DOCS = [
    (1, "sorting tables and hashing", 100),
    (2, "the sorted table was hashed", 400),
    (3, "nothing relevant here at all", 250),
    (4, "sort table hash sort table hash", 250),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")


def test_stemmed_matching_crosses_inflections(spark):
    """Query and corpus use different inflections; stemming must join
    them: docs 1, 2, 4 all match 'sorts tables hashes', doc 3 never."""
    out = search_corpus_stemmed(
        _docs(spark), "sorts tables hashes", k=4, feature_cols=("n_chars",)
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 2, 4}
    # doc 4 has double tf on every term → highest bm25
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[4]["bm25"] > by_id[1]["bm25"]


def test_ltr_rescore_reorders_topk(spark):
    """With bm25 weight 0 and a dominant feature weight, the rescore must
    rank purely by the saturated feature — a different order than the
    first-pass es_score."""
    out = search_corpus_stemmed(
        _docs(spark),
        "sorts tables hashes",
        k=4,
        feature_cols=("n_chars",),
        rescore_weights={"bm25": 0.0, "n_chars": 1.0},
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # n_chars: doc2=400 > doc4=250 > doc1=100 (doc3 filtered: no match)
    assert ranked == [2, 4, 1]


def test_punctuated_query_terms_match_analyzer_tokens(spark):
    """r4 advice: the query must be tokenized with the SAME split as the
    field analyzer — 'table-hashing' would otherwise be one unmatchable
    term. It must split into (table, hash) and match docs 1, 2, 4."""
    out = search_corpus_stemmed(
        _docs(spark), "table-hashing", k=4, feature_cols=("n_chars",)
    ).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 4}


def test_analyze_query_terms_split_and_escaping():
    """Shared analyzer split + apostrophes preserved; the oracle IN-list
    built from these terms must escape quotes into valid SQL."""
    from collection_templates_spark.operators.search import analyze_query_terms

    terms = analyze_query_terms("Hash-Join  o'brien's  HASH")
    assert terms == sorted({"hash", "join", "o'brien'"})
    in_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    import duckdb

    got = duckdb.connect().execute(
        f"SELECT count(*) FROM (VALUES ('hash'), ('o''brien''')) t(x) "
        f"WHERE x IN ({in_list})"
    ).fetchone()[0]
    assert got == 2
