from market_data_pipeline_spark.streaming.jobs import (
    run_stream_to_memory,
    session_windows_batch,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
)

__all__ = [
    "stream_events",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_windows_batch",
    "run_stream_to_memory",
]
