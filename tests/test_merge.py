"""Merge-stage semantics (A7-A9, J11/J12, P7-P9)."""

import pytest
from pyspark.sql import functions as F

from collection_templates_spark.operators.merge import (
    apply_collection_filters,
    merge_lists_and_categories,
    remove_collections_with_letters,
    remove_duplicates,
)

COLL_DDL = (
    "item string, types array<struct<id:string,label:string>>, article string,"
    " name string, members array<struct<curated:string,tokenized:array<string>,"
    "interesting_score:double,rank:bigint,status:string>>,"
    " valid_members_count bigint, invalid_members_count bigint,"
    " keywords array<string>, description string, image array<string>,"
    " page_banner array<string>, rank bigint, is_merged boolean"
)


def _member(curated, rank, status=None):
    return (curated, [curated], 0.5, rank, status)


def _coll(item, name, members, types=None, keywords=None, description=None,
          rank=0, valid=0, invalid=0):
    return (
        item, types or [("Q1", "thing")], f"art_{item}", name, members,
        valid, invalid, keywords or [], description, [], [], rank, False,
    )


def make(spark, rows):
    return spark.createDataFrame(rows, COLL_DDL)


def test_filters(spark):
    rows = [
        _coll("Q1", "Good name", []),
        _coll("Q2", "Wikipedia:Admin", []),          # P8
        _coll("Q3", "Novels by genre", []),          # P9 (lowercase after by)
        _coll("Q4", "Films by John Ford", []),       # kept: uppercase after by
        _coll("Q5", "Stubs", [], types=[("Q4663261", "stub")]),  # P7
        _coll("Q6", "Lists of things", []),          # P8
    ]
    out = {r.name for r in apply_collection_filters(make(spark, rows)).collect()}
    assert out == {"Good name", "Films by John Ford"}


def test_merge_by_relation_and_name(spark):
    lists = make(spark, [
        _coll("Q10", "Sovereign states", [_member("austria", 5)],
              keywords=["kw1"], rank=7, valid=1),
        _coll("Q11", "Peaks", [_member("everest", 9)], valid=1),
    ])
    cats = make(spark, [
        # related to Q10 via db4
        _coll("Q20", "States category", [_member("belgium", 3),
                                         _member("austria", 1)],
              types=[("Q2", "state")], keywords=["kw2"],
              description="desc", rank=9, valid=2),
        # merges into Q11 by exact name
        _coll("Q21", "Peaks", [_member("k2", 4)], valid=1),
        # untouched category
        _coll("Q22", "Lakes", [_member("baikal", 2)], valid=1),
    ])
    db4 = spark.createDataFrame(
        [("Q10", ["Q20"], None)],
        "id string, category_related_to_list array<string>,"
        " list_related_to_category array<string>",
    )
    out = {r.item: r for r in
           merge_lists_and_categories(lists, cats, db4).collect()}
    assert set(out) == {"Q10", "Q11", "Q22"}
    merged = out["Q10"]
    assert merged.is_merged
    assert [m.curated for m in merged.members] == ["austria", "belgium"]
    # austria kept from the LIST side (rank 5 beats category's rank-1 copy)
    assert merged.members[0].rank == 5
    assert merged.rank == 9  # max
    assert merged.description == "desc"  # first non-empty in fold order
    assert merged.keywords == ["kw1", "kw2"]  # concat, list first, no dedup
    assert merged.valid_members_count == 3
    assert {t.id for t in merged.types} == {"Q1", "Q2"}
    m11 = out["Q11"]
    assert m11.is_merged
    assert [m.curated for m in m11.members] == ["everest", "k2"]
    assert not out["Q22"].is_merged


def test_letters_merge_and_rename(spark):
    rows = [
        _coll("Q1", "Rivers: A", [_member("amazon", 1)], valid=1),
        _coll("Q2", "Rivers: B", [_member("bogue", 2)], valid=1),
        _coll("Q3", "Towns (list)", [_member("anytown", 1)], valid=1),
        _coll("Q4", "Plain name", [], valid=0),
    ]
    out = {r.name: r for r in
           remove_collections_with_letters(make(spark, rows)).collect()}
    assert set(out) == {"Rivers", "Towns", "Plain name"}
    rivers = out["Rivers"]
    assert rivers.is_merged and rivers.item == "Q1"
    assert [m.curated for m in rivers.members] == ["bogue", "amazon"]  # rank desc
    assert not out["Towns"].is_merged  # singleton rename via m2


def test_letters_pattern_goldens(spark):
    rows = [
        _coll("Q1", "Peaks, A to F", []),          # m1 range → rename
        _coll("Q2", "Peaks, G to Z", []),          # merges with Q1
        _coll("Q10", "Ships (current)", []),       # m2 explicit parens
        _coll("Q11", "Complete lists of lakes", []),  # m3 "... lists of X"
        _coll("Q12", "Bridges: Q", []),            # m1 single letter → rename
        _coll("Q13", "Words by frequency (A)", []),  # m1 "(A)" suffix
    ]
    out = {r.item: r.name for r in
           remove_collections_with_letters(make(spark, rows)).collect()}
    assert out["Q1"] == "Peaks"          # merged pair renamed
    assert "Q2" not in out               # absorbed into Q1
    assert out["Q10"] == "Ships"
    assert out["Q11"] == "Lakes"         # m3 normalized + ucfirst
    assert out["Q12"] == "Bridges"
    assert out["Q13"] == "Words by frequency"


def test_remove_duplicates(spark):
    rows = [
        _coll("Q5", "Same", [_member("aa", 1)], rank=3, valid=1),
        _coll("Q2", "Same", [_member("bb", 9)], rank=5, valid=1),
        _coll("Q9", "Other", [], valid=0),
    ]
    out = {r.item: r for r in remove_duplicates(make(spark, rows)).collect()}
    assert set(out) == {"Q2", "Q9"}  # min QID wins as id
    m = out["Q2"]
    assert m.is_merged and m.rank == 5
    assert [x.curated for x in m.members] == ["bb", "aa"]
