from index_spark.functions import text, vectors  # noqa: F401
