"""Related-collections precompute (§2.10 batch analogue)."""

from collection_templates_spark.operators.related import (
    related_collections,
    with_related_collections,
)
from tests.test_factory_diff import _docs
from tests.test_merge import _coll, _member, make


def test_related_collections(spark):
    rows = [
        _coll("Q1", "French films", [], types=[("T1", "film")], rank=100),
        _coll("Q2", "German films", [], types=[("T1", "film")], rank=90),
        _coll("Q3", "Italian films", [], types=[("T1", "film")], rank=80),
        _coll("Q4", "Spanish films", [], types=[("T1", "film")], rank=70),
        # same name tokens as Q1 → diversity-filtered from Q1's relations
        _coll("Q5", "Films french", [], types=[("T1", "film")], rank=999),
        _coll("Q9", "Lakes", [], types=[("T9", "lake")], rank=50),
    ]
    rel = {r.item: r.related for r in
           related_collections(make(spark, rows), max_per_type=2).collect()}
    # Q1's candidates: per-type cap keeps top-2 by rank (Q5 999, Q2 90);
    # Q5 then drops on name diversity → only Q2 remains
    assert [x.id for x in rel["Q1"]] == ["Q2"]
    # Q9 shares no type with anyone → absent
    assert "Q9" not in rel
    # Q3's top-2 by rank among {Q5:999, Q1:100, Q2:90, Q4:70} → Q5, Q1
    assert [x.id for x in rel["Q3"]] == ["Q5", "Q1"]


def test_with_related_collections(spark):
    rows = [
        _coll("Q1", "A films", [_member("aaa", 1)], types=[("T1", "f")], rank=5, valid=1),
        _coll("Q2", "B films", [], types=[("T1", "f")], rank=3),
    ]
    docs = _docs(spark, rows)
    rel = related_collections(make(spark, rows))
    out = {r.metadata.id: r for r in with_related_collections(docs, rel).collect()}
    assert [x.id for x in out["Q1"].name_generator.related_collections] == ["Q2"]
    assert [x.id for x in out["Q2"].name_generator.related_collections] == ["Q1"]


def test_candidate_cap_boundary_when_self_tops_the_type(spark):
    """r7 candidate-generation rewrite invariant: the per-(src,type)
    top-k is taken from the per-type top-(k+1). When src itself is the
    type's #1 (and #2), excluding it must still leave the full k
    candidates — distinct names so no diversity filtering interferes."""
    rows = [
        _coll("Q1", "alpha reds", [], types=[("T1", "x")], rank=100),
        _coll("Q2", "beta blues", [], types=[("T1", "x")], rank=90),
        _coll("Q3", "gamma greens", [], types=[("T1", "x")], rank=80),
        _coll("Q4", "delta pinks", [], types=[("T1", "x")], rank=70),
    ]
    rel = {r.item: [x.id for x in r.related] for r in
           related_collections(make(spark, rows), max_per_type=2).collect()}
    assert rel["Q1"] == ["Q2", "Q3"]   # self was #1: next two survive
    assert rel["Q2"] == ["Q1", "Q3"]   # self was #2
    assert rel["Q4"] == ["Q1", "Q2"]   # self outside top-3: plain top-2
