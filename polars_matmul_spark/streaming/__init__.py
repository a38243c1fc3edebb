from polars_matmul_spark.streaming.events import (  # noqa: F401
    hourly_event_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    session_windows_stream,
    stateful_user_totals,
)
