from index_spark.operators import asof, dedup, similarity  # noqa: F401
