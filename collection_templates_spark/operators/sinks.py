"""Sinks: JSONL parity dumps (S10), ES bulk-op formatting (S11), and
field-level partial update documents (D3).

The reference bulk-writes to Elasticsearch with 1 MB chunks and a
409-conflict retry loop over random ids (update_es.py:316-358). With
deterministic ids the conflict loop disappears; the op-line formatting is
kept engine-side so any HTTP sink (foreachPartition + requests, or the
es-hadoop connector) can stream the lines verbatim. No ES client is
required to build or test the payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# update_es.py:31-40 — fields copied into partial update docs
UPDATING_FIELDS = (
    "data",
    "template",
    "metadata.members_count",
    "metadata.collection_name_log_probability",
    "metadata.modified",
)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Stage-boundary JSONL dump (S10 parity; Parquet is the default
    boundary — this exists for byte-level diffing against the reference)."""
    df.write.mode(mode).json(path)


def partial_update_doc(doc: Column) -> Column:
    """D3: the update payload — UPDATING_FIELDS projected from the full doc
    (field-level recursion in the reference collapses to struct projection
    here; ES merges objects server-side on update)."""
    return F.to_json(
        F.struct(
            doc["data"].alias("data"),
            doc["template"].alias("template"),
            F.struct(
                doc["metadata"]["members_count"].alias("members_count"),
                doc["metadata"]["collection_name_log_probability"].alias(
                    "collection_name_log_probability"
                ),
                doc["metadata"]["modified"].alias("modified"),
            ).alias("metadata"),
        )
    )


def es_bulk_lines(
    docs: DataFrame, ops: DataFrame, index: str = "collection-templates"
) -> DataFrame:
    """Bulk-API line pairs per op (S11): action line + source/update line.

    insert → index action with the deterministic id + full doc;
    update → update action + partial doc (D3); archive → update action
    setting data.archived=true (D4); noop → no lines.
    Returns (id, op, action_line, payload_line).
    """
    d = docs.withColumn("___id", F.col("metadata.id"))
    joined = ops.join(d, ops.id == F.col("___id"), "left")
    action = F.when(
        F.col("op") == "insert",
        F.concat(
            F.lit('{"index":{"_index":"' + index + '","_id":"'),
            F.col("id"),
            F.lit('"}}'),
        ),
    ).when(
        F.col("op").isin("update", "archive"),
        F.concat(
            F.lit('{"update":{"_index":"' + index + '","_id":"'),
            F.col("id"),
            F.lit('"}}'),
        ),
    )
    full_doc = F.to_json(F.struct("data", "curation", "metadata", "template"))
    payload = (
        F.when(F.col("op") == "insert", full_doc)
        .when(
            F.col("op") == "update",
            F.concat(
                F.lit('{"doc":'),
                partial_update_doc(F.struct("data", "metadata", "template")),
                F.lit("}"),
            ),
        )
        .when(
            F.col("op") == "archive",
            F.lit('{"doc":{"data":{"archived":true}}}'),
        )
    )
    return (
        joined.filter(F.col("op") != "noop")
        .select(
            "id",
            "op",
            action.alias("action_line"),
            payload.alias("payload_line"),
        )
    )
