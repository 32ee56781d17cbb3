"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

The pipeline joins the member fact table to db5/qrank on qid at every run;
bucketing both sides on the join key at write time makes every subsequent
join a zero-Exchange sort-merge (each bucket pair joins locally). This is
the Spark analogue of the reference keeping RocksDB stores keyed by qid —
pay the partitioning once at build time, reuse it every lookup.

Cache tables from Opt-6 (curated-label → score/namehash) are the other
bucketing clients: bucketed by input string, the next run's refresh join is
co-located too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | tuple[str, ...],
    num_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table registered in the
    session catalog (bucket metadata lives in the catalog, so readers must
    go through ``spark.table``). ``bucket_col`` may be a tuple — the
    shuffle is elided only when the bucket columns equal ALL of a later
    join's keys (EnsureRequirements requires full-key co-partitioning),
    so composite join keys need composite buckets."""
    cols = (bucket_col,) if isinstance(bucket_col, str) else tuple(bucket_col)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *cols)
        .sortBy(*cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
