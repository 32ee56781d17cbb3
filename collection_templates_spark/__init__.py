"""collection_templates_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of namehash/collection-templates (see SURVEY.md), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB corpus needs.

Layout:
    session        SparkSession builder tuned for scale (AQE, shuffle sizing)
    sources/       readers: N-Triples, Wikipedia SQL dumps, CSV/JSON dims, testdata
    operators/     relational + pipeline + data-quality operators
    functions/     scalar column functions (normalization, hashing, scoring)
    plans/         end-to-end stage graphs (the reference's Airflow DAG → Spark jobs)
    streaming/     Structured Streaming extensions
"""

from collection_templates_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
