from index_spark.plans.driver_queries import build_queries, build_oracles  # noqa: F401
