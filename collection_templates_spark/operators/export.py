"""Training-corpus export: deterministic sharding + partitioned write.

The last stage of a curation pipeline: lay the corpus out as
``split=<train|val|test>/shard=<n>/*.parquet`` so a trainer's data loader
can stream shards independently. The scale-correct layout decision is to
NOT pursue exact per-shard token budgets — that needs a global running
sum (one window partition per split — the serialization trap
pack_sequences avoids by sharding first) — but to draw the shard id from
the same engine-portable hash as the split, with the shard COUNT sized
from the split's token total. Hash-uniformity makes shard token totals
concentrate around the budget (CLT: deviation ~ 1/sqrt(docs_per_shard)),
which is what production packers rely on; the budget is a target, not an
invariant.

Everything before the physical write is pure dataflow (one aggregate for
the per-split token totals, broadcast back), so the shard ASSIGNMENT is
SQL-replayable and the export_manifest driver query is fully oracled; the
write itself is exercised by tests (round-trip, layout, determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collection_templates_spark.operators.text_analysis import (
    bpe_ish_token_count,
)


def shard_assignment(
    docs: DataFrame,
    tokens_per_shard: int = 20_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """docs + (n_tokens, split, n_shards, shard): deterministic
    train/val/test split (training_prep.assign_split) and a per-split
    shard id from the portable hash, with ``n_shards`` =
    ceil(split_tokens / tokens_per_shard) computed in-flow (a per-split
    aggregate broadcast back — nothing touches the driver).

    Both the split and the shard are pure functions of the doc id, so
    re-exports are stable: a doc never migrates between shards unless the
    split's token total changes enough to change ``n_shards``."""
    from collection_templates_spark.operators.dedup import (
        portable_shingle_hash,
    )
    from collection_templates_spark.operators.training_prep import (
        assign_split,
    )

    with_split = assign_split(docs, id_col=id_col).withColumn(
        "n_tokens",
        F.coalesce(bpe_ish_token_count(F.col(text_col)), F.lit(0)),
    )
    totals = with_split.groupBy("split").agg(
        F.greatest(
            F.ceil(F.sum("n_tokens") / F.lit(tokens_per_shard)), F.lit(1)
        ).alias("n_shards")
    )
    key = F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    return (
        with_split.join(F.broadcast(totals), "split")
        .withColumn(
            "shard", portable_shingle_hash(key) % F.col("n_shards")
        )
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    tokens_per_shard: int = 20_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Physical export: ``out_dir/split=<s>/shard=<n>/*.parquet``.

    ``partitionBy`` gives the loader-enumerable directory layout; writes
    are embarrassingly parallel (no global ordering requirement — the
    shard id already encodes placement). Idempotent under overwrite mode:
    the assignment is deterministic, so a re-run rewrites byte-identical
    partitions."""
    assigned = shard_assignment(
        docs, tokens_per_shard, id_col=id_col, text_col=text_col
    )
    (
        assigned.drop("split_bucket", "n_shards")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(out_dir)
    )


def export_manifest(
    docs: DataFrame,
    tokens_per_shard: int = 20_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(split, shard, n_docs, n_tokens) — what each exported partition
    will contain; the driver-oracled view of the shard assignment."""
    return (
        shard_assignment(
            docs, tokens_per_shard, id_col=id_col, text_col=text_col
        )
        .groupBy("split", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
