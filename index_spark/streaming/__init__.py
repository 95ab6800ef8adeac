from index_spark.streaming.events import (  # noqa: F401
    attributed_purchases,
    dedup_stream,
    hourly_counts,
    ingest_with_dedup,
    read_events_stream,
    run_available_now,
    sessionized,
    sessionized_counts,
    stream_into_snapshots,
    stream_merge_into,
    user_running_state,
)
