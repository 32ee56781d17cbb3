"""Ingest-time exact dedup for document streams.

Batch equivalent: ``operators/dedup.exact_dedup``. The streaming leg keys
``dropDuplicatesWithinWatermark`` on the 8-byte normalized-text hash, so:

- state is BOUNDED by the watermark horizon — a plain ``dropDuplicates``
  keeps every key forever, which is a state leak at ingest scale;
- the shuffle/state key is the hash, never the text — the same reasoning
  as exact_dedup's hash-keyed shuffle (multi-KB keys dominate state and
  sort costs at 100 TB/day).

Collision caveat: two DIFFERENT texts sharing an xxhash64 value inside
one watermark horizon would wrongly dedup (probability ~2⁻⁶⁴ per pair).
The batch operator separates collisions exactly; the streaming leg trades
that for bounded state. Pass ``collision_exact=True`` to add the
normalized text itself to the key — exact, at text-sized state cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import normalize_text


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    collision_exact: bool = False,
) -> DataFrame:
    """First-seen document per normalized text within the watermark
    horizon; later duplicates are dropped. Output schema = input schema.
    """
    norm = normalize_text(F.col(text_col))
    d = docs.withWatermark(ts_col, watermark).withColumn(
        "___h", F.xxhash64(norm)
    )
    keys = ["___h"]
    if collision_exact:
        d = d.withColumn("___norm", norm)
        keys.append("___norm")
    return d.dropDuplicatesWithinWatermark(keys).drop("___h", "___norm")
