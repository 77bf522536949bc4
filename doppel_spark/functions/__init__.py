from doppel_spark.functions.digests import full_digest, quick_digest  # noqa: F401
