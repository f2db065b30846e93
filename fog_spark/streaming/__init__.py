from fog_spark.streaming.ingest import (  # noqa: F401
    compact_degrees,
    compact_edge_log,
    incremental_degrees,
    incremental_edge_log,
    read_degrees,
    read_edge_log,
    stream_edges,
    stream_event_sessions,
    stream_running_user_stats,
)
