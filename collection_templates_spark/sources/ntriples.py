"""N-Triples source: raw dump lines → cleaned (subject, predicate, object).

Spark-first re-expression of the reference's streaming parse
(airflow/dags/create_kv.py:84-125 `entity_generator` + `clean` :64-81 +
predicate `mapping` :37-52). The reference needs subject-adjacent input;
here grouping is a real groupBy so line order only matters for the
"last value wins" rule, which we make explicit with a `pos` column.

Scale: the raw-line regex filter (`line_prefilter`) mirrors the reference's
download-time grep (Opt-1, create_inlets.py:160-166) — it runs before any
column extraction so the scan stays a tight rlike over the text source;
bz2 is non-splittable, so at real scale recompress the dump to zstd/parquet
once (Opt-10) — everything downstream is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 13 kept predicates (reference create_kv.py:37-52)
PREDICATE_MAP: dict[str, str] = {
    "<http://schema.org/about>": "about",
    "<http://www.wikidata.org/prop/direct/P31>": "instance_of",
    "<http://www.wikidata.org/prop/direct/P279>": "subclass_of",
    "<http://www.wikidata.org/prop/direct/P360>": "is_a_list_of",
    "<http://www.wikidata.org/prop/direct/P4224>": "category_contains",
    "<http://www.wikidata.org/prop/direct/P1753>": "list_related_to_category",
    "<http://www.wikidata.org/prop/direct/P1754>": "category_related_to_list",
    "<http://www.wikidata.org/prop/direct/P18>": "image",
    "<http://www.wikidata.org/prop/direct/P948>": "page_banner",
    "<http://schema.org/name>": "name",
    "<http://www.w3.org/2000/01/rdf-schema#label>": "label",
    "<http://schema.org/description>": "description",
    "<http://www.w3.org/2002/07/owl#sameAs>": "same_as",
}

# single-valued predicates: last occurrence wins (create_kv.py:52, :119-120)
PREDICATES_ONE = frozenset({"about", "name", "label", "description", "same_as"})

# instance_of objects dropped outright (create_kv.py:54-59)
FILTER_INSTANCES = (
    "<http://www.wikidata.org/entity/Q13442814>",  # scholarly article
    "<http://www.wikidata.org/entity/Q7318358>",  # review article
    "<http://www.wikidata.org/entity/Q4167410>",  # disambiguation page
    "<http://www.wikidata.org/entity/Q11266439>",  # Wikimedia template
)

_STRIP_PREFIXES = (
    "<http://www.wikidata.org/entity/",
    "<https://en.wikipedia.org/wiki/",
    "<http://commons.wikimedia.org/wiki/",
)


def _re_escape(s: str) -> str:
    out = []
    for ch in s:
        out.append("\\" + ch if ch in ".^$*+?()[]{}|\\" else ch)
    return "".join(out)


def line_prefilter() -> F.Column:
    """Raw-line predicate filter (the reference's grep, Opt-1): keep only
    lines mentioning one of the 13 predicates — applied to the raw text
    scan BEFORE any column extraction."""
    return F.col("value").rlike("|".join(map(_re_escape, PREDICATE_MAP)))


def _clean(col: F.Column) -> F.Column:
    """IRI prefix strip / literal unwrap (reference `clean`, create_kv.py:64-81).

    Returns NULL for values matching none of the rules — the caller drops
    those rows (the reference raises ValueError and skips the triple).
    """
    expr = None
    for prefix in _STRIP_PREFIXES:
        cond = col.startswith(prefix)
        val = F.substring(col, len(prefix) + 1, F.length(col) - len(prefix) - 1)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    literal = col.startswith('"') & col.endswith('"@en')
    expr = expr.when(literal, F.substring(col, 2, F.length(col) - 5))
    return expr.otherwise(F.lit(None))


def parse_ntriples(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse N-Triples lines into cleaned TRIPLE_SCHEMA rows.

    Splitting: `subject SP predicate SP object .` where object may contain
    spaces inside a quoted literal — so split on the first two spaces only
    and strip the trailing ` .`.
    """
    v = F.col(value_col)
    subject = F.regexp_extract(v, r"^(\S+) ", 1)
    predicate = F.regexp_extract(v, r"^\S+ (\S+) ", 1)
    obj = F.regexp_replace(
        F.regexp_extract(v, r"^\S+ \S+ (.*)$", 1), r"\s*\.\s*$", ""
    )
    df = lines.select(
        subject.alias("raw_subject"),
        predicate.alias("raw_predicate"),
        obj.alias("raw_object"),
        F.monotonically_increasing_id().alias("pos"),
    )
    pred_map = F.create_map(
        *[F.lit(x) for kv in PREDICATE_MAP.items() for x in kv]
    )
    df = df.withColumn("predicate", pred_map[F.col("raw_predicate")]).filter(
        F.col("predicate").isNotNull()
    )
    df = df.filter(
        ~(
            (F.col("predicate") == "instance_of")
            & F.col("raw_object").isin(*FILTER_INSTANCES)
        )
    )
    df = df.filter(
        ~(
            (F.col("predicate") == "name")
            & F.col("raw_subject").startswith("<https://en.wikipedia.org/wiki/")
        )
    )
    df = df.withColumn("subject", _clean(F.col("raw_subject"))).withColumn(
        "object", _clean(F.col("raw_object"))
    )
    return df.filter(
        F.col("subject").isNotNull() & F.col("object").isNotNull()
    ).select("subject", "predicate", "object", "pos")
