from .events import (  # noqa: F401
    read_events_stream,
    run_streaming_dedup,
    run_streaming_foreach_batch,
    run_streaming_static_join,
    run_streaming_interval_join,
    run_streaming_sessionize,
    run_streaming_tumbling,
    running_count_per_user,
)
