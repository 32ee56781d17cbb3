"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every setting here is chosen for the
1000-executor / 100 TB case and merely *also* works locally:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  (member counts per collection are heavily skewed in the reference corpus —
  10.5M "human" instances under one type; cf. SURVEY.md §4 physical notes).
- Arrow on: every Pandas UDF crosses the JVM/Python boundary in columnar
  batches instead of pickled rows.
- ``spark.sql.shuffle.partitions`` is a *default*; AQE coalesces down, and
  jobs that know their output cardinality override per-write.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions default to the core count (right for the sf0.1
# bench contract); SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for runs
# at other data scales — shuffle partitions must grow with data (the
# sf100 measurement exhausted execution memory under 32 partitions:
# 8g / 32 concurrent coarse partitions left hash aggregates nothing to
# acquire), exactly as a cluster deployment sizes them per job.
DEFAULT_SHUFFLE_PARTITIONS = int(
    os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
)


def get_spark(
    app_name: str = "collection-templates-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same entry
    points run unchanged under a cluster manager (where ``master`` comes from
    spark-submit and we pass ``None``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # 128 MB input splits: big enough to amortize task overhead at 100 TB
        # (~800k tasks), small enough to keep stragglers short.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Dimension tables in this workload (region/nation, qrank, domains,
        # avatar-emoji, the db3/db4 relation stores — 18 MB / 2.7 MB in the
        # reference) are all well under this; let Catalyst broadcast them.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate re-derives explode inputs as pre-shuffle
        # filter predicates; with higher-order-function chains (shingles,
        # chunking) that evaluates the whole interpreted chain twice per
        # row on the narrow side — measured 12x slower than the Generate
        # alone (see operators/dedup.py _spread, which also sets this for
        # vanilla driver sessions). Explode semantics are unchanged.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # The two documented ≤k-row GLOBAL windows (search.py re-ranks a
    # bounded top-k without a partition key — a deliberate single-task
    # sort over k rows, see the operator docstrings) trigger a noisy
    # per-run "WindowExec: No Partition Defined" WARN. Silence that one
    # logger; any NEW unpartitioned window is still caught by the plan
    # tests, which pin partition keys on every unbounded window.
    try:
        spark._jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            spark._jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 runtime: cosmetic only
    return spark
