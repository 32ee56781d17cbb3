"""Final document factory (create_merged.py:859-989) + snapshot diff
(update_es.py:249-313)."""

import random

from pyspark.sql import functions as F

from collection_templates_spark.operators.factory import collection_factory
from collection_templates_spark.operators.snapshot_diff import (
    produce_update_operations,
)
from tests.test_merge import COLL_DDL, _coll, _member, make


def _docs(spark, rows, created=1000.0):
    return collection_factory(make(spark, rows), created_ms=created)


def test_factory_document(spark):
    members = [
        _member("alpha", 100, "taken"),
        _member("beta", 10, "available"),
        _member("gamma", 1, None),
        _member("deltadeltadelta", 1000, "on_sale"),
    ]
    rows = [_coll("Q42", "Things", members, rank=0, valid=3, invalid=1)]
    doc = _docs(spark, rows).collect()[0]

    t = doc.template
    assert doc.metadata.members_count == 4
    assert t.collection_rank == 1  # F6 clamp: max(rank, 1)
    assert t.taken_count == 1 and t.available_count == 1
    assert t.on_sale_count == 1 and t.never_registered_count == 1
    assert t.nonavailable_members_count == 2
    assert t.valid_members_ratio == 0.75
    # display order: log2(rank+1)/max(len,10) desc
    names = [n.normalized_name for n in t.names]
    assert names[0] == "alpha"  # log2(101)/10 ≈ 0.666 beats delta's ~0.66
    assert t.top10_names == t.names  # only 4 members
    # exact median of ranks [1, 10, 100, 1000] → (10+100)/2
    assert t.members_rank_median == 55.0
    assert t.members_rank_mean == (1 + 10 + 100 + 1000) / 4
    # namehash present and deterministic
    assert t.names[0].namehash.startswith("0x") and len(t.names[0].namehash) == 66
    # banner parity with CPython random
    random.seed("Q42")
    assert doc.data.banner_image == f"tc-{random.randint(0, 19):02d}.png"
    assert doc.metadata.id == "Q42"
    assert doc.data.names[0].normalized_name == "alpha"


def test_factory_empty_members(spark):
    doc = _docs(spark, [_coll("Q1", "Empty", [], valid=0, invalid=0)]).collect()[0]
    assert doc.metadata.members_count == 0
    assert doc.template.members_rank_mean == 1e-8  # MIN_VALUE clamp
    assert doc.template.valid_members_ratio == 0.0


def test_snapshot_diff_ops(spark):
    prev_rows = [
        _coll("Q1", "Same", [_member("aaa", 1)], valid=1),
        _coll("Q2", "WillChange", [_member("bbb", 1)], valid=1),
        _coll("Q3", "Gone", [], valid=0),
    ]
    cur_rows = [
        _coll("Q1", "Same", [_member("aaa", 1)], valid=1),
        _coll("Q2", "WillChange", [_member("ccc", 2)], valid=1),
        _coll("Q4", "New", [], valid=0),
    ]
    prev = _docs(spark, prev_rows)
    cur = _docs(spark, cur_rows)
    ops = {r.id: r.op for r in produce_update_operations(cur, prev).collect()}
    assert ops == {"Q1": "noop", "Q2": "update", "Q3": "archive", "Q4": "insert"}


def test_snapshot_diff_oversize_gate(spark):
    big = [_member(f"name{i:05d}", i) for i in range(10001)]
    cur = _docs(spark, [_coll("Q9", "Big", big, valid=10001)])
    ops = produce_update_operations(cur, None).collect()
    assert ops == []  # P11: >10k members never inserted


def test_first_run_all_inserts(spark):
    cur = _docs(spark, [_coll("Q1", "A", [], valid=0)])
    ops = {r.id: r.op for r in produce_update_operations(cur, None).collect()}
    assert ops == {"Q1": "insert"}
