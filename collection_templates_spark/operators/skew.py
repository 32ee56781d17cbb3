"""Skew-mitigation utilities: salted joins and heavy-hitter splitting.

The real corpus is heavily skewed (10.59M instances under the single
"human" type — BASELINE.md input stats; the >10k-member collection gate
P11 exists because of it). AQE's skew-join split handles most cases at
runtime; these explicit tools cover the two places AQE can't:

- ``salted_join``: broadcast-infeasible dim join where ONE key dominates —
  the hot fact rows hash-salt into ``salt_factor`` sub-keys and the dim side
  replicates per salt, so the hot key spreads over ``salt_factor`` tasks.
  Deterministic (salt = xxhash64 % n of a designated column, not rand()).
- ``split_heavy_hitters``: partition a frame into hot/cold by key frequency
  so callers can broadcast the hot slice and sort-merge the rest (the
  classic hybrid join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_factor: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with the dim side replicated
    ``salt_factor``× and the fact side deterministically salted.

    ``salt_source``: column whose hash spreads the hot key (defaults to the
    whole-row hash via all fact columns — any roughly-uniform column works).
    Result equals the plain join (verified in tests), but the shuffle key is
    (key, salt) so no single reducer owns a hot key.
    """
    src = F.xxhash64(*(
        [F.col(salt_source)] if salt_source else [F.col(c) for c in fact.columns]
    ))
    f = fact.withColumn("___salt", F.pmod(src, F.lit(salt_factor)).cast("int"))
    d = dim.withColumn(
        "___salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return f.join(d, [key, "___salt"], how).drop("___salt")


def split_heavy_hitters(
    df: DataFrame, key: str, threshold: int
) -> tuple[DataFrame, DataFrame]:
    """(hot, cold) split by key frequency ≥ threshold. The hot-key list is
    computed with one aggregation and broadcast back as a semi/anti join."""
    hot_keys = (
        df.groupBy(key).agg(F.count("*").alias("___n"))
        .filter(F.col("___n") >= threshold)
        .select(key)
    )
    hot = df.join(F.broadcast(hot_keys), key, "left_semi")
    cold = df.join(F.broadcast(hot_keys), key, "left_anti")
    return hot, cold
