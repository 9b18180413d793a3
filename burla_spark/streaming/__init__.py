from burla_spark.streaming.events import (
    events_stream,
    run_stream_to_table,
    stream_tumbling_counts,
    stream_session_aggregate,
    stream_key_dedup,
)

__all__ = [
    "events_stream",
    "run_stream_to_table",
    "stream_tumbling_counts",
    "stream_session_aggregate",
    "stream_key_dedup",
]
