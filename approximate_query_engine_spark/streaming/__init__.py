from approximate_query_engine_spark.streaming.approx_stream import (
    run_stateful_user_counts,
    run_streaming_dedup,
    run_streaming_window_agg,
)

__all__ = [
    "run_streaming_window_agg",
    "run_streaming_dedup",
    "run_stateful_user_counts",
]
