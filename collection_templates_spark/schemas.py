"""Explicit StructTypes for every pipeline stage (SURVEY.md §1).

The reference carries implicit dict schemas between JSONL stages; here every
stage boundary is a typed Parquet table so Catalyst gets real statistics and
column pruning at every step.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# (s, p, o) after predicate mapping + IRI cleaning; `pos` preserves input
# order so "last value wins" single-valued semantics stay deterministic
# (reference: airflow/dags/create_kv.py:108-125 relies on file order).
TRIPLE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", StringType(), False),
        StructField("pos", LongType(), True),
    ]
)

# wikimapper `mapping` table (reference: create_kv.py:165-180)
MAPPING_SCHEMA = StructType(
    [
        StructField("wikipedia_title", StringType(), False),
        StructField("wikipedia_id", LongType(), True),
        StructField("wikidata_id", StringType(), True),
        StructField("primary_mapping", LongType(), True),
        StructField("redirect", LongType(), True),
    ]
)

# member of a collection after normalization (reference Member class,
# create_merged.py:137-160)
MEMBER_SCHEMA = StructType(
    [
        StructField("curated", StringType(), False),
        StructField("tokenized", ArrayType(StringType()), False),
        StructField("interesting_score", DoubleType(), True),
        StructField("rank", LongType(), True),
        StructField("status", StringType(), True),
    ]
)

TYPE_SCHEMA = StructType(
    [StructField("id", StringType(), True), StructField("label", StringType(), True)]
)

# pipeline IR: one collection per row (reference Collection class,
# create_merged.py:291-344)
COLLECTION_SCHEMA = StructType(
    [
        StructField("item", StringType(), False),
        StructField("types", ArrayType(TYPE_SCHEMA), True),
        StructField("article", StringType(), True),
        StructField("name", StringType(), True),
        StructField("members", ArrayType(MEMBER_SCHEMA), True),
        StructField("valid_members_count", LongType(), True),
        StructField("invalid_members_count", LongType(), True),
        StructField("keywords", ArrayType(StringType()), True),
        StructField("description", StringType(), True),
        StructField("image", ArrayType(StringType()), True),
        StructField("page_banner", ArrayType(StringType()), True),
        StructField("rank", LongType(), True),
        StructField("is_merged", BooleanType(), True),
    ]
)

CUSTOM_LABEL_SCHEMA = StructType(
    [
        StructField("label", StringType(), True),
        StructField("normalized_label", StringType(), True),
        StructField("tokenized_label", ArrayType(StringType()), True),
    ]
)

# custom-collections drop (reference load_custom_collections.py:415-429)
CUSTOM_COLLECTION_SCHEMA = StructType(
    [
        StructField(
            "data",
            StructType(
                [
                    StructField("collection_id", StringType(), True),
                    StructField("collection_name", StringType(), True),
                    StructField("labels", ArrayType(CUSTOM_LABEL_SCHEMA), True),
                    StructField("collection_description", StringType(), True),
                    StructField("collection_keywords", ArrayType(StringType()), True),
                    StructField("banner_image", StringType(), True),
                    StructField("avatar_emoji", StringType(), True),
                ]
            ),
            True,
        ),
        StructField(
            "commands",
            StructType(
                [
                    StructField("sort_labels", StringType(), True),
                    StructField("collection_rank", LongType(), True),
                    StructField("member_rank", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)
