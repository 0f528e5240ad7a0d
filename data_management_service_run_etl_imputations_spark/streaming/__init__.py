from data_management_service_run_etl_imputations_spark.streaming.events import (
    foreach_batch_incremental,
    read_events_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "foreach_batch_incremental",
    "read_events_stream",
    "run_available_now",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
