"""Derive a 10x-scaled copy of an sf dir for scaling measurements.

/root/testdata is driver-owned and read-only, so the sf1 step of the
scaling table (docs/SCALE.md) runs on a DERIVED corpus: every table of
the source sf dir replicated REPL times with consistent key shifts.
This is a TIMING corpus, not an oracle corpus — value correctness at
sf1 is not asserted (the sf0.01 DuckDB gate owns correctness); what
must hold is that per-query WORK scales like real 10x data:

- keys (orders/customer/part/supplier/lineitem/events/documents/
  embeddings) shift by ``replica * (max_key + 1)`` with FK bases kept
  consistent, so joins and graphs become 10 disjoint copies — 10x rows
  through every shuffle, same per-key density, no planted skew;
- document text gets every token tagged with its replica id (replica 0
  stays verbatim): replicas share NO shingles, so near-dup pair
  structure grows linearly (10x per-replica-internal pairs) instead of
  planting 10-way duplicate clusters whose pair count would explode
  quadratically and measure an artifact, not the operator;
- embeddings are cyclically rotated by ``6 * replica`` dimensions:
  rotation preserves every intra-replica dot product exactly (same
  neighborhood structure per replica) while decorrelating
  cross-replica cosines — again linear growth of the true pair set.

Usage: python tools/make_scaled_data.py [src_sf_dir] [dest_dir] [repl]
Defaults: /root/testdata/sf0.1 -> /tmp/spark_graft_sf1, repl=10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collection_templates_spark.session import get_spark
from collection_templates_spark.sources.testdata import load_table

EMB_DIM = 64


def _replicate(df: DataFrame, repl: int) -> DataFrame:
    return df.withColumn(
        "___r", F.explode(F.array([F.lit(i) for i in range(repl)]))
    )


def _shift(df: DataFrame, col: str, base: int) -> DataFrame:
    return df.withColumn(
        col, F.col(col) + F.col("___r").cast("long") * F.lit(base)
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make-scaled-data")

    def t(name: str) -> DataFrame:
        return load_table(spark, name, src)

    def base(name: str, key: str) -> int:
        return t(name).agg(F.max(key)).collect()[0][0] + 1

    c_base = base("customer", "c_custkey")
    s_base = base("supplier", "s_suppkey")
    p_base = base("part", "p_partkey")
    o_base = base("orders", "o_orderkey")
    d_base = base("documents", "doc_id")
    v_base = base("embeddings", "vec_id")
    e_base = base("events", "event_id")
    u_base = base("events", "user_id")

    def write(df: DataFrame, name: str) -> None:
        # 32-way layout: the replicate-explode otherwise inherits the
        # source's single partition and lands as ONE file with ONE row
        # group — which serializes every later scan of the derived
        # corpus into a single task (parquet splits at row-group
        # granularity) and poisons scan-stage timing with an artifact
        # no real multi-file corpus has (found in r14: ngram_novelty
        # "sf10" was one core exploding 500k docs, 444 s vs 38 s).
        out = f"{dest}/{name}.parquet"
        df.drop("___r").repartition(32).write.mode("overwrite").parquet(out)
        print(f"wrote {out}")

    # tiny dims ride along unshifted (nationkeys stay in range)
    for name in ("region", "nation"):
        t(name).write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        print(f"wrote {dest}/{name}.parquet (copy)")

    write(_shift(_replicate(t("customer"), repl), "c_custkey", c_base),
          "customer")
    write(_shift(_replicate(t("supplier"), repl), "s_suppkey", s_base),
          "supplier")
    write(_shift(_replicate(t("part"), repl), "p_partkey", p_base), "part")

    o = _replicate(t("orders"), repl)
    o = _shift(_shift(o, "o_orderkey", o_base), "o_custkey", c_base)
    write(o, "orders")

    li = _replicate(t("lineitem"), repl)
    for col, b in (("l_orderkey", o_base), ("l_partkey", p_base),
                   ("l_suppkey", s_base)):
        li = _shift(li, col, b)
    write(li, "lineitem")

    ev = _replicate(t("events"), repl)
    ev = _shift(_shift(ev, "event_id", e_base), "user_id", u_base)
    write(ev, "events")

    docs = _shift(_replicate(t("documents"), repl), "doc_id", d_base)
    docs = docs.withColumn(
        "text",
        F.when(F.col("___r") == 0, F.col("text")).otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1x"), F.col("___r").cast("string")),
            )
        ),
    )
    write(docs, "documents")

    rot = F.col("___r") * F.lit(EMB_DIM // 10)
    emb = _shift(_replicate(t("embeddings"), repl), "vec_id", v_base)
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("___r") == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice("embedding", rot + 1, F.lit(EMB_DIM) - rot),
                F.slice("embedding", F.lit(1), rot),
            )
        ),
    )
    write(emb, "embeddings")
    print("done")


if __name__ == "__main__":
    main()
