from betl_spark.streaming.events import (
    event_stream,
    run_stream_to_parquet,
    run_stream_to_table,
    sessionize,
    sliding_window_agg,
    stateful_running_totals,
    stream_dedupe,
    stream_kmv_distinct,
    stream_static_enrich,
    stream_stream_time_join,
    tumbling_window_agg,
)

__all__ = [
    "event_stream",
    "run_stream_to_parquet",
    "run_stream_to_table",
    "sessionize",
    "sliding_window_agg",
    "stateful_running_totals",
    "stream_dedupe",
    "stream_kmv_distinct",
    "stream_static_enrich",
    "stream_stream_time_join",
    "tumbling_window_agg",
]
