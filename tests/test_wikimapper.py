"""S4: rowid-range-partitioned sqlite ingestion of the wikimapper db
(reference create_kv.py:165-180 semantics)."""

import sqlite3

from pyspark.sql import functions as F

from collection_templates_spark.operators.entities import title_qid_from_mapping
from collection_templates_spark.sources.wikimapper import (
    read_sqlite_table,
    read_wikimapper,
)


def _fixture_db(tmp_path, n=2000):
    path = str(tmp_path / "index_enwiki.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE mapping (wikipedia_id INTEGER, wikipedia_title TEXT,"
        " wikidata_id TEXT, primary_mapping INTEGER, redirect INTEGER)"
    )
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                f"Page_{i}",
                None if i % 11 == 0 else f"Q{i}",
                0 if i % 7 == 0 else 1,  # non-primary rows to filter
                1 if i % 5 == 0 else 0,  # redirects to filter
            )
        )
    con.executemany("INSERT INTO mapping VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()
    expected = {
        (f"Page_{i}", i, f"Q{i}")
        for i in range(n)
        if i % 11 != 0 and i % 7 != 0 and i % 5 != 0
    }
    return path, expected


def test_read_wikimapper_parallel_filtered(spark, tmp_path):
    path, expected = _fixture_db(tmp_path)
    df = read_wikimapper(spark, path, num_partitions=4)
    got = {
        (r["wikipedia_title"], r["wikipedia_id"], r["wikidata_id"])
        for r in df.collect()
    }
    assert got == expected
    assert df.rdd.getNumPartitions() == 4  # genuinely split, not one task


def test_wikimapper_feeds_title_qid(spark, tmp_path):
    path, _ = _fixture_db(tmp_path, n=50)
    tq = title_qid_from_mapping(read_wikimapper(spark, path))
    rows = {r["title"]: r["qid"] for r in tq.collect()}
    # underscore→space rewrite happened, flags were filtered
    assert rows["Page 1"] == "Q1"
    assert "Page 0" not in rows  # wikidata_id NULL and redirect-ish
    assert all(" " in t or "_" not in t for t in rows)


def test_one_contiguous_slice_per_task(spark, tmp_path):
    """The r2 advice fix: repartitionByRange must land exactly one rowid
    slice in each task — a hash repartition leaves ~1/e of tasks empty and
    serializes collided slices' sqlite scans. Verify via output partition
    ids: every task non-empty, each covering one non-overlapping id range."""
    path, _ = _fixture_db(tmp_path)
    df = read_wikimapper(spark, path, num_partitions=4)
    per = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("wikipedia_id").alias("lo"),
            F.max("wikipedia_id").alias("hi"),
        )
        .collect()
    )
    assert len(per) == 4  # no empty tasks, no collided slices
    spans = sorted((r["lo"], r["hi"]) for r in per)
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 < l2  # each task scanned exactly one contiguous slice


def test_read_sqlite_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE mapping (wikipedia_id INTEGER, wikipedia_title TEXT, wikidata_id TEXT, primary_mapping INTEGER, redirect INTEGER)")
    con.commit()
    con.close()
    df = read_wikimapper(spark, path)
    assert df.count() == 0


def test_read_sqlite_rowid_holes(spark, tmp_path):
    """Deleted rows leave rowid holes; range slicing must still return
    every surviving row exactly once."""
    path = str(tmp_path / "holes.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)", [(i, f"v{i}") for i in range(100)])
    con.execute("DELETE FROM t WHERE k % 3 = 0")
    con.commit()
    con.close()
    df = read_sqlite_table(
        spark, path, "t", ("k", "v"), "k bigint, v string", num_partitions=8
    )
    got = sorted(r["k"] for r in df.collect())
    assert got == [i for i in range(100) if i % 3 != 0]
