from index_spark.operators import (  # noqa: F401
    asof,
    decontam,
    dedup,
    postings,
    quality,
    quota,
    similarity,
    splits,
    stats,
)
