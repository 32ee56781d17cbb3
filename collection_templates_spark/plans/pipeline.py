"""End-to-end pipeline: the reference's Airflow DAG graph as one Spark plan.

Stage order (SURVEY §3.1; reference DAG files in airflow/dags/):
  1. N-Triples → cleaned triples           (create_inlets + create_kv)
  2. triples → entity stores db2..db6      (create_kv)
  3. collections + member edges → grouped  (create_collections)
  4. member QID resolution + ontology validation (create_collections)
  5. enrichment: curation/ranks/statuses   (create_merged all-info)
  6. merge lists+categories, letters, duplicates (create_merged)
  7. final document factory                (create_merged)
  8. snapshot diff → upsert ops            (update_es)

Each stage returns a DataFrame; ``run_pipeline`` optionally persists every
boundary as Parquet (the reference's JSONL boundaries, S10) which at scale
doubles as checkpointing + lineage truncation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from collection_templates_spark.operators.collections_extract import (
    extract_collections,
    group_members,
    member_edges_categories,
    member_edges_lists,
)
from collection_templates_spark.operators.entities import (
    build_all_stores,
    title_qid_from_triples,
)
from collection_templates_spark.operators.enrich import enrich_collections
from collection_templates_spark.operators.factory import collection_factory
from collection_templates_spark.operators.merge import (
    merge_lists_and_categories,
    remove_collections_with_letters,
    remove_duplicates,
)
from collection_templates_spark.operators.snapshot_diff import (
    produce_update_operations,
)
from collection_templates_spark.operators.validation import (
    resolve_member_qids,
    validate_members,
)
from collection_templates_spark.sources.ntriples import parse_ntriples


@dataclass
class PipelineInputs:
    nt_lines: DataFrame  # raw N-Triples lines (column `value`)
    categorylinks: DataFrame  # (cl_from bigint, cl_to string)
    pagelinks: DataFrame  # (pl_from bigint, pl_title string)
    mapping: DataFrame  # wikimapper (title, wikipedia_id, qid) — spaces form
    qrank: DataFrame  # (id, rank)
    domains: DataFrame  # (name, status) — .eth stripped
    previous_snapshot: DataFrame | None = None
    created_ms: float = 0.0
    emoji_sets: dict = field(default_factory=dict)
    emoji_counts: dict = field(default_factory=dict)
    other_emojis: list = field(default_factory=lambda: ["✨"])


def run_pipeline(
    spark: SparkSession,
    inputs: PipelineInputs,
    workdir: str | None = None,
    use_corpus_model: bool = True,
):
    """Returns dict of stage outputs; persists stages when workdir given.

    ``use_corpus_model``: build the unigram language model (F9/F10 real
    scoring — functions/langmodel.py) from the wiki title corpus and use it
    for interesting scores and name log-probabilities; the documented stubs
    are used only when False or when the corpus is empty.
    """

    stage_seconds: dict[str, float] = {}

    def persist(df: DataFrame, name: str) -> DataFrame:
        if workdir:
            import time as _time

            path = f"{workdir}/{name}.parquet"
            t0 = _time.time()
            df.write.mode("overwrite").parquet(path)
            # wall time to materialize this stage (upstream lazy work
            # included) — surfaced via the returned dict's ___stage_seconds
            # so stress/ops runs can see WHERE a big input spends its time
            stage_seconds[name] = round(_time.time() - t0, 2)
            return spark.read.parquet(path)
        return df

    triples = persist(parse_ntriples(inputs.nt_lines), "triples")
    stores = build_all_stores(triples)
    stores = {k: persist(v, k) for k, v in stores.items()}
    title_qid = persist(title_qid_from_triples(triples), "title_qid")

    # F9/F10 language model from the title corpus (the same names the
    # pipeline scores — the public-equivalent of NameRank's external model).
    # One extra corpus-sized aggregation; only the capped vocabulary
    # histogram leaves the cluster, as a broadcast.
    score_udf = log_prob_udf = None
    if use_corpus_model:
        from collection_templates_spark.functions.langmodel import (
            UnigramModel,
            word_frequency_model,
        )
        from collection_templates_spark.functions.udfs import (
            broadcast_model,
            interesting_score_udf_for,
            log_probability_udf_for,
        )

        model = UnigramModel.from_dataframe(
            word_frequency_model(title_qid, text_col="title")
        )
        if model.vocab > 0:
            # uuid-tagged broadcast → per-executor UnigramModel cache hit
            # (plain-dict broadcasts rebuild the cost table per Arrow batch)
            freqs_bc = broadcast_model(spark.sparkContext, model.freqs)
            score_udf = interesting_score_udf_for(freqs_bc)
            log_prob_udf = log_probability_udf_for(freqs_bc)

    # the (qid → title) direction used by collection extraction; the
    # reference keys these stores with the on-disk underscore form
    id_title = title_qid.select("qid", "title")

    out = {}
    for mode in ("category", "list"):
        colls = extract_collections(stores["db3"], id_title, mode)
        if mode == "category":
            edges = member_edges_categories(
                inputs.categorylinks,
                inputs.mapping.select("wikipedia_id", "title"),
            )
        else:
            edges = member_edges_lists(
                inputs.pagelinks,
                inputs.mapping.select("wikipedia_id", "title"),
            )
        grouped = group_members(edges, colls)
        resolved = resolve_member_qids(
            grouped, title_qid, inputs.mapping.select("title", "qid")
        )
        validated = persist(
            validate_members(resolved, stores["db2"], stores["db6"]),
            f"validated_{mode}",
        )
        enriched = persist(
            enrich_collections(
                validated,
                stores["db5"],
                inputs.qrank,
                inputs.domains,
                inputs.mapping.select("qid", "title"),
                score_cache_path=(
                    f"{workdir}/score_cache.parquet" if workdir else None
                ),
                score_udf=score_udf,
            ),
            f"all_info_{mode}",
        )
        out[mode] = enriched

    merged = merge_lists_and_categories(out["list"], out["category"], stores["db4"])
    merged = persist(merged, "merged")
    lettered = persist(remove_collections_with_letters(merged), "lettered")
    deduped = persist(remove_duplicates(lettered), "deduped")
    docs = persist(
        collection_factory(
            deduped,
            created_ms=inputs.created_ms,
            emoji_sets=inputs.emoji_sets,
            emoji_counts=inputs.emoji_counts,
            other_emojis=inputs.other_emojis,
            log_prob_udf=log_prob_udf,
        ),
        "merged_final",
    )
    ops = produce_update_operations(docs, inputs.previous_snapshot)
    return {
        "triples": triples,
        "stores": stores,
        "validated": {m: out[m] for m in out},
        "merged_final": docs,
        "operations": ops,
        "___stage_seconds": stage_seconds,
    }
