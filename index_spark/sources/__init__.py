from index_spark.sources.tables import (  # noqa: F401
    TABLES,
    canonical_events,
    load_table,
    register_views,
)
