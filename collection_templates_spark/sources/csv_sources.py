"""Dimension CSV readers (SURVEY §2.1 S5-S7).

- qrank (S5): (id, rank) — reference create_inlets.py:363-367, loaded as a
  dict at create_merged.py:389-394; here a broadcast-join dimension.
- suggestable domains (S6): (name, interesting_score, status) with `.eth`
  stripped from names — create_merged.py:347-362.
- avatar emojis (S7): variadic trailing emoji columns + the special OTHER
  row — create_merged.py:829-847; returned as driver-side dicts (the table
  is tiny and feeds a closure-serialized UDF).
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_qrank(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.csv(path, header=True)
        # try_cast: a malformed rank row must drop, not kill the job
        # (ANSI mode makes plain cast throw)
        .select(F.col("id"), F.col("rank").try_cast("long").alias("rank"))
        .filter(F.col("id").isNotNull() & F.col("rank").isNotNull())
    )


def read_suggestable_domains(spark: SparkSession, path: str) -> DataFrame:
    """(name, status) with trailing .eth stripped (F13)."""
    return (
        spark.read.csv(path, header=True)
        .select(
            F.regexp_replace(F.col("name"), "\\.eth$", "").alias("name"),
            F.col("status"),
        )
        .filter(F.col("name").isNotNull())
    )


def read_avatar_emojis(
    path: str,
) -> tuple[dict[str, list[str]], dict[str, int], list[str]]:
    """(emoji_sets by type_name, counts by type_name, OTHER emojis).

    Driver-side on purpose: rows `type_id,type_name,category,count,*emojis`
    with a variadic tail don't fit a fixed CSV schema, the whole table is a
    few KB, and its only consumer is the avatar UDF closure.
    """
    emoji_sets: dict[str, list[str]] = {}
    counts: dict[str, int] = {}
    other: list[str] = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            if len(row) < 4:
                continue
            _type_id, type_name, _category, count, *emojis = row
            if type_name == "OTHER":
                other = emojis
                continue
            emoji_sets[type_name] = emojis
            counts[type_name] = int(count)
    return emoji_sets, counts, other
