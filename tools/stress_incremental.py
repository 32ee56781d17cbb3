"""Evidence for incremental_dedup's core claim: probe cost is O(batch
+ matched state), NOT O(history).

Builds bucketed indexes over synthetic histories of increasing size,
then probes each with the SAME fixed-size batch and reports min-of-N
probe wall time. If the probe were rescanning/reshuffling history, the
time would grow ~linearly with history size; the expected shape is
near-flat (the history-side cost is a columnar band scan with no
Exchange — see operators/incremental_dedup.py).

Corpus: deterministic token soup over a 200-word vocabulary (seeded
per doc id), ~1% of batch docs planted as near-dups of history docs so
the verify stage always has real work.

Usage: python tools/stress_incremental.py [histories...] [--batch N]
Defaults: histories 20000 60000 180000, batch 2000, runs 3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from collection_templates_spark.operators.incremental_dedup import (
    build_minhash_index,
    dedup_batch_against_index,
    scratch_index_path,
)


def _synthetic_docs(spark, n, id_offset, tag):
    """Deterministic 12-token docs over a 200-word vocab; engine-side
    generation (no driver loop). ``tag`` decorrelates vocab between
    history and batch except for the planted dups."""
    return (
        spark.range(id_offset, id_offset + n)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64("id", F.lit(f"{tag}{i}")), F.lit(200)),
                    )
                    for i in range(12)
                ],
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )


def main() -> None:
    args = sys.argv[1:]
    batch_n, runs = 2000, 3
    hist_sizes: list[int] = []
    i = 0
    while i < len(args):
        if args[i] == "--batch":
            batch_n = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            hist_sizes.append(int(args[i])); i += 1
    if not hist_sizes:
        hist_sizes = [20000, 60000, 180000]

    from collection_templates_spark.session import get_spark

    spark = get_spark("stress-incremental")
    # one fixed batch: 99% novel docs + 1% exact replays of history ids
    # (cross dups against every history below, since histories nest)
    batch = _synthetic_docs(spark, batch_n - batch_n // 100, 1_000_000, "b")
    planted = _synthetic_docs(spark, batch_n // 100, 0, "h").withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    )
    batch = batch.unionByName(planted).localCheckpoint(eager=True)

    for hn in hist_sizes:
        hist = _synthetic_docs(spark, hn, 0, "h")
        path = scratch_index_path()
        t0 = time.time()
        build_minhash_index(hist, path, bucket_bands=32)
        t_build = round(time.time() - t0, 2)
        ts = []
        for _ in range(runs):
            t0 = time.time()
            dedup_batch_against_index(spark, path, batch).write.format(
                "noop"
            ).mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "history": hn,
                    "batch": batch_n,
                    "build_s": t_build,
                    "probe_min_s": min(ts),
                    "probe_runs": ts,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
