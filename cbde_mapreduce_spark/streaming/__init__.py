"""Structured Streaming growth path (SURVEY.md §2.10, P6).

The reference (MapReduce) is strictly batch; the events table is
stream-shaped. Every event-time operator exists in batch form first
(plans/events_q.py, oracle-checked); this package runs the same
computations as true streams: readStream → event-time window aggs →
watermark for late data → sink.
"""

from cbde_mapreduce_spark.streaming.streams import (  # noqa: F401
    events_file_ingest,
    events_stream,
    kafka_events_stream,
    run_streaming_dedup,
    run_streaming_ohlc,
    run_streaming_session,
    run_streaming_sliding,
    run_streaming_tumbling,
)
