from doppel_spark.sources.pages import read_pages, validate_pages_schema  # noqa: F401
