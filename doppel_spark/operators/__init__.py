from doppel_spark.operators.exact import ExactDupResult, exact_dup_pipeline  # noqa: F401
