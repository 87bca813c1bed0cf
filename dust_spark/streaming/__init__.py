"""Structured Streaming operators (SURVEY.md §2 B11)."""

from dust_spark.streaming.stateful import running_user_counters
from dust_spark.streaming.windows import (
    attribution_from_pairs,
    attribution_pairs_stream,
    bucket_median_stream,
    rolling_bucket_median,
    stream_orders,
    dedup_stream,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_documents,
    stream_events,
    stream_ingest_dedup,
    stream_static_join,
    stream_stream_join,
    tumbling_window_agg,
)

__all__ = [
    "stream_events",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_stream",
    "stream_documents",
    "stream_ingest_dedup",
    "stream_static_join",
    "stream_stream_join",
    "run_stream_to_memory",
    "running_user_counters",
    "bucket_median_stream",
    "rolling_bucket_median",
    "attribution_pairs_stream",
    "attribution_from_pairs",
    "stream_orders",
]
