from collection_templates_spark.sources.testdata import TABLES, load_table, load_tables  # noqa: F401
