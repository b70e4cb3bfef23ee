from data_integration_and_processing_spark.streaming.pipelines import (
    run_stateful_user_stats,
    run_streaming_dedup,
    run_streaming_upsert_sink,
    run_streaming_window_pipeline,
    sessionized,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "run_stateful_user_stats",
    "run_streaming_dedup",
    "run_streaming_upsert_sink",
    "run_streaming_window_pipeline",
    "sessionized",
    "sliding_window_counts",
    "tumbling_window_counts",
]
