"""CSV dimension readers (S5-S7) + JSONL/ES-op sinks (S10/S11/D3/D4)."""

import json

from collection_templates_spark.operators.sinks import es_bulk_lines
from collection_templates_spark.sources.csv_sources import (
    read_avatar_emojis,
    read_qrank,
    read_suggestable_domains,
)
from tests.test_factory_diff import _docs
from tests.test_merge import _coll, _member


def test_read_qrank(spark, tmp_path):
    p = tmp_path / "qrank.csv"
    p.write_text("id,rank\nQ1,100\nQ2,5\n,9\n")
    rows = {r.id: r.rank for r in read_qrank(spark, str(p)).collect()}
    assert rows == {"Q1": 100, "Q2": 5}


def test_read_domains(spark, tmp_path):
    p = tmp_path / "domains.csv"
    p.write_text(
        "name,interesting_score,status\nabc.eth,0.5,taken\nxyz,0.1,available\n"
    )
    rows = {r.name: r.status for r in read_suggestable_domains(spark, str(p)).collect()}
    assert rows == {"abc": "taken", "xyz": "available"}  # .eth stripped


def test_read_avatar_emojis(tmp_path):
    p = tmp_path / "avatars.csv"
    p.write_text(
        "type_id,type_name,category,count,e1,e2\n"
        "Q11424,film,art,120,🎬,🎥\n"
        ",OTHER,,0,✨,🌟\n"
        "Q482994,album,music,80,🎵\n"
    )
    sets, counts, other = read_avatar_emojis(str(p))
    assert sets == {"film": ["🎬", "🎥"], "album": ["🎵"]}
    assert counts == {"film": 120, "album": 80}
    assert other == ["✨", "🌟"]


def test_es_bulk_lines(spark):
    prev = _docs(spark, [
        _coll("Q1", "Same", [_member("aaa", 1)], valid=1),
        _coll("Q3", "Gone", [], valid=0),
    ])
    cur = _docs(spark, [
        _coll("Q1", "Same", [_member("bbb", 2)], valid=1),  # update
        _coll("Q4", "New", [], valid=0),  # insert
    ])
    from collection_templates_spark.operators.snapshot_diff import (
        produce_update_operations,
    )

    ops = produce_update_operations(cur, prev)
    lines = {r.id: r for r in es_bulk_lines(cur, ops).collect()}
    assert set(lines) == {"Q1", "Q3", "Q4"}

    ins = lines["Q4"]
    assert json.loads(ins.action_line) == {
        "index": {"_index": "collection-templates", "_id": "Q4"}
    }
    doc = json.loads(ins.payload_line)
    assert doc["metadata"]["id"] == "Q4" and "template" in doc

    upd = lines["Q1"]
    assert json.loads(upd.action_line)["update"]["_id"] == "Q1"
    body = json.loads(upd.payload_line)["doc"]
    assert set(body) == {"data", "template", "metadata"}
    assert set(body["metadata"]) == {
        "members_count", "collection_name_log_probability", "modified",
    }  # D3: partial update, not the full metadata

    arc = lines["Q3"]
    assert json.loads(arc.payload_line) == {"doc": {"data": {"archived": True}}}


def test_write_jsonl_roundtrip(spark, tmp_path):
    from collection_templates_spark.operators.sinks import write_jsonl

    docs = _docs(spark, [_coll("Q1", "A", [_member("aaa", 1)], valid=1)])
    write_jsonl(docs, str(tmp_path / "out"))
    back = spark.read.json(str(tmp_path / "out"))
    assert back.count() == 1
    assert back.collect()[0].metadata.id == "Q1"
