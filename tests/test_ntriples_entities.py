"""N-Triples parse + entity-table build (reference create_kv.py semantics)."""

from pyspark.sql import functions as F

from collection_templates_spark.operators.entities import (
    build_all_stores,
    title_qid_from_triples,
)
from collection_templates_spark.sources.ntriples import parse_ntriples

WD = "<http://www.wikidata.org/entity/"
WP = "<https://en.wikipedia.org/wiki/"
P = "<http://www.wikidata.org/prop/direct/"

LINES = [
    # Q1: split-subject (non-adjacent rows for Q1) — the reference's
    # adjacency assumption must NOT matter here
    f"{WD}Q1> {P}P31> {WD}Q5> .",
    f"{WD}Q2> {P}P279> {WD}Q5> .",
    f"{WD}Q1> {P}P31> {WD}Q42> .",
    # blacklisted instance_of object dropped (P3)
    f"{WD}Q1> {P}P31> {WD}Q13442814> .",
    # label literals; later label overwrites (last wins)
    f'{WD}Q1> <http://www.w3.org/2000/01/rdf-schema#label> "first"@en .',
    f'{WD}Q1> <http://www.w3.org/2000/01/rdf-schema#label> "second"@en .',
    # about: en-wiki title → qid (db1 source)
    f"{WP}Some_Title> <http://schema.org/about> {WD}Q1> .",
    # name with en-wiki subject skipped (P4)
    f'{WP}Some_Title> <http://schema.org/name> "skipme"@en .',
    # unknown predicate dropped (P1)
    f"{WD}Q1> {P}P9999> {WD}Q5> .",
    # non-en literal → clean() fails → dropped (P2)
    f'{WD}Q3> <http://www.w3.org/2000/01/rdf-schema#label> "nope"@de .',
    # db3/db4 predicates
    f"{WD}Q7> {P}P4224> {WD}Q5> .",
    f"{WD}Q8> {P}P360> {WD}Q5> .",
    f"{WD}Q8> {P}P1753> {WD}Q7> .",
    f"{WD}Q9> <http://www.w3.org/2002/07/owl#sameAs> {WD}Q1> .",
]


def test_parse_and_stores(spark):
    lines = spark.createDataFrame([(x,) for x in LINES], ["value"])
    triples = parse_ntriples(lines)
    rows = {(r.subject, r.predicate, r.object) for r in triples.collect()}
    assert ("Q1", "instance_of", "Q5") in rows
    assert ("Q1", "instance_of", "Q13442814") not in rows  # blacklist
    assert not any(p == "name" for _, p, _ in rows)  # en-wiki name skipped
    assert ("Q3", "label", "nope") not in rows  # @de literal dropped

    stores = build_all_stores(triples)
    db2 = {r.id: r for r in stores["db2"].collect()}
    assert db2["Q1"].instance_of == ["Q5", "Q42"]  # input order, split subject OK
    assert db2["Q2"].subclass_of == ["Q5"]
    db5 = {r.id: r for r in stores["db5"].collect()}
    assert db5["Q1"].label == "second"  # last value wins
    db3 = {r.id: r for r in stores["db3"].collect()}
    assert db3["Q7"].category_contains == ["Q5"]
    assert db3["Q8"].is_a_list_of == ["Q5"]
    db4 = {r.id: r for r in stores["db4"].collect()}
    assert db4["Q8"].list_related_to_category == ["Q7"]
    db6 = {r.id: r for r in stores["db6"].collect()}
    assert db6["Q9"].same_as == "Q1"

    t = {r.title: r.qid for r in title_qid_from_triples(triples).collect()}
    assert t == {"Some_Title": "Q1"}


def test_line_prefilter(spark):
    from collection_templates_spark.sources.ntriples import line_prefilter

    lines = spark.createDataFrame(
        [(LINES[0],), ("<http://x> <http://other/pred> <http://y> .",)], ["value"]
    )
    kept = lines.filter(line_prefilter()).collect()
    assert len(kept) == 1
