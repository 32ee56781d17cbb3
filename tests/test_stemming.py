"""Stemmer contracts: the shared suffix table (three implementations must
agree exactly) and the full Porter algorithm (paper vectors)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from collection_templates_spark.functions.stemming import (
    SUFFIX_RULES,
    porter_stem,
    suffix_stem_expr,
    suffix_stem_py,
    suffix_stem_sql,
)

WORDS = [
    "tables", "table", "sorted", "sorting", "sort", "hashing", "hashed",
    "hash", "queries", "query", "keys", "key", "customers", "customer",
    "filters", "filtered", "filter", "merges", "merge", "orders",
    "ordering", "order", "caresses", "ponies", "boxes", "matches",
    "wishes", "happily", "goodness", "payments", "payment", "relational",
    "organization", "effectiveness", "hopefulness", "nervousness",
    "conditional", "ability", "ss", "a", "",
]


def test_three_implementations_agree(spark):
    """The Spark CASE chain, the DuckDB CASE chain, and the Python applier
    are generated from one table — they must agree token-for-token."""
    py = [suffix_stem_py(w) for w in WORDS]
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got_spark = [
        r["s"]
        for r in df.select(suffix_stem_expr(F.col("w")).alias("s"))
        .collect()
    ]
    sql = suffix_stem_sql("w")
    con = duckdb.connect()
    got_sql = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS w)", [w]).fetchone()[0]
        for w in WORDS
    ]
    assert got_spark == py
    assert got_sql == py


def test_single_pass_consistency():
    """Inflected and base forms must map to the same stem in ONE pass —
    the design constraint that replaces Porter's multi-step chaining."""
    pairs = [
        ("tables", "table"), ("sorted", "sort"), ("sorting", "sort"),
        ("hashing", "hash"), ("queries", "query"), ("keys", "key"),
        ("customers", "customer"), ("filters", "filter"),
        ("filtered", "filter"), ("merges", "merge"), ("orders", "order"),
        ("ordering", "order"), ("payments", "payment"),
    ]
    for a, b in pairs:
        assert suffix_stem_py(a) == suffix_stem_py(b), (a, b)


def test_idempotent_over_rule_outputs():
    """stem(stem(x)) == stem(x) for every word in the vocabulary-ish set
    and for every rule's own output shape."""
    for w in WORDS:
        s = suffix_stem_py(w)
        assert suffix_stem_py(s) == s, (w, s)
    for sfx, repl, _ in SUFFIX_RULES:
        out = suffix_stem_py("spark" + sfx)
        assert suffix_stem_py(out) == out, (sfx, repl, out)


PORTER_VECTORS = [
    # step examples from Porter (1980), "An algorithm for suffix stripping"
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radically", "radic"), ("differently", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,want", PORTER_VECTORS)
def test_porter_paper_vectors(word, want):
    assert porter_stem(word) == want
