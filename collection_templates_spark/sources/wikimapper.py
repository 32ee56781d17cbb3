"""S4: wikimapper sqlite ingestion.

The reference loads the wikimapper mapping db with a driver-side sqlite3
cursor into RocksDB (reference airflow/dags/create_kv.py:165-180:
``SELECT wikipedia_title, wikipedia_id, wikidata_id FROM mapping WHERE
primary_mapping = 1 AND redirect = 0``, then ``_`` → space on the title).

Spark-first re-expression: a **rowid-range partitioned parallel read** —
the same strategy as JDBC ``partitionColumn/lowerBound/upperBound`` reads,
built on ``mapInPandas`` because the container has no sqlite JDBC jar.
The driver touches the file once for ``min(rowid), max(rowid)`` (an O(1)
b-tree lookup, no scan); each executor task then opens the db read-only
and scans its own rowid slice, so a db on shared storage (NFS, a cluster
mount, a downloaded replica per node) is read by all executors at once.
The WHERE clause is pushed into sqlite itself — filtered rows never leave
the b-tree, let alone reach Spark.

sqlite rowids of a freshly-bulk-loaded table (wikimapper's case) are
dense, so equal rowid ranges give balanced partitions; for a db with
deletion holes the skew is bounded by the hole ratio and AQE coalesces
the empty slices.
"""

from __future__ import annotations

import sqlite3
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# wikimapper's `mapping` table, per the reference's SELECT + flag filters
MAPPING_COLUMNS = (
    "wikipedia_title",
    "wikipedia_id",
    "wikidata_id",
    "primary_mapping",
    "redirect",
)
MAPPING_SCHEMA = (
    "wikipedia_title string, wikipedia_id bigint, wikidata_id string, "
    "primary_mapping int, redirect int"
)


def read_sqlite_table(
    spark: SparkSession,
    path: str,
    table: str,
    columns: tuple[str, ...],
    schema: str,
    where: str | None = None,
    num_partitions: int = 16,
) -> DataFrame:
    """Parallel rowid-range scan of one sqlite table.

    ``where`` is passed through to sqlite verbatim (predicate pushdown —
    compose only trusted literals into it). Each of ``num_partitions``
    tasks reads ``rowid ∈ [lo, hi)`` for its slice; sqlite's read-only
    mode allows any number of concurrent readers.
    """
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        row = con.execute(
            f"SELECT min(rowid), max(rowid) FROM {table}"
        ).fetchone()
    finally:
        con.close()
    lo, hi = row
    if lo is None:  # empty table
        return spark.createDataFrame([], schema)

    span = hi - lo + 1
    n = min(num_partitions, span)
    step = (span + n - 1) // n
    bounds = [(lo + i * step, min(lo + (i + 1) * step, hi + 1)) for i in range(n)]
    cols_sql = ", ".join(columns)
    pred = f" AND ({where})" if where else ""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for lo_, hi_ in zip(b["lo"], b["hi"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    yield pd.read_sql_query(
                        f"SELECT {cols_sql} FROM {table} "
                        f"WHERE rowid >= ? AND rowid < ?{pred}",
                        c,
                        params=(int(lo_), int(hi_)),
                    )
                finally:
                    c.close()

    # range-partition the n slices so each lands in its own task: a hash
    # repartition would leave ~1/e of tasks empty and serialize the sqlite
    # scans of the collided slices (r2 advice)
    ranges = spark.createDataFrame(
        bounds, "lo bigint, hi bigint"
    ).repartitionByRange(n, "lo")
    return ranges.mapInPandas(scan, schema)


def read_wikimapper(
    spark: SparkSession, path: str, num_partitions: int = 16
) -> DataFrame:
    """The wikimapper `mapping` table with the reference's flag filters
    pushed into sqlite (create_kv.py:174 WHERE clause). Feed the result to
    ``operators.entities.title_qid_from_mapping`` for the db1/db1_rev
    (title ↔ qid) stores — it re-applies the filters harmlessly and does
    the ``_`` → space rewrite."""
    return read_sqlite_table(
        spark,
        path,
        table="mapping",
        columns=MAPPING_COLUMNS,
        schema=MAPPING_SCHEMA,
        where="primary_mapping = 1 AND redirect = 0 AND wikidata_id IS NOT NULL",
        num_partitions=num_partitions,
    )
