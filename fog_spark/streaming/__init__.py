from fog_spark.streaming.ingest import (  # noqa: F401
    compact_degrees,
    incremental_degrees,
    read_degrees,
    stream_edges,
    stream_event_sessions,
    stream_running_user_stats,
)
