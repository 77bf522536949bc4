from doppel_spark.streaming.incremental import incremental_exact_dedup_stream  # noqa: F401
