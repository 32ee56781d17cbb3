"""Readers for the driver-generated synthetic tables (TESTDATA.md).

TPC-H-ish star schema + ``events`` stream table + ``documents`` /
``embeddings`` corpora. One parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Parquet is already the right format at 100 TB: columnar scan with column
pruning and min/max predicate pushdown for free. The only scale-sensitive
choice here is to NOT coalesce or cache — let the file source split by
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Historically events.parquet stored ts as parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; current generations store
        # TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ. Adapt to
        # whatever the file actually contains, normalizing to TimestampType
        # (the contract every downstream query — unix_micros, window ranges —
        # was validated against): nanos arrive as LongType (via nanosAsLong)
        # and get truncated to micros (matching DuckDB's ns→us cast); NTZ is
        # cast to TIMESTAMP (identity under the UTC session tz the driver
        # runs with). Stays fully JVM-side either way.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
