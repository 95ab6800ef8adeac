from index_spark.operators import asof, decontam, dedup, quality, similarity, stats  # noqa: F401
