"""Structured Streaming layer (SURVEY §2.9).

The reference's streaming model: an event-time-gap trigger buffers
samples and closes a micro-batch when a message arrives > 60 s past the
last accepted tick (trend-o-meter:381-439), with all state in process
memory and the Redis list as the WAL.  Spark replaces that with
watermarked windowed aggregations + checkpointed state stores; the
backfill-then-tail lambda shape becomes "batch job + streaming job
sharing the same column expressions" (the operators in ``operators/``
are written against columns, so both call the same code).
"""

from .sources import decode_sensor_stream, rate_sensor_stream
from .pipeline import (
    stream_tumbling_mean,
    stream_sliding_rates,
    stream_session_channels,
    run_to_memory_sink,
)

__all__ = [
    "decode_sensor_stream",
    "rate_sensor_stream",
    "stream_tumbling_mean",
    "stream_sliding_rates",
    "stream_session_channels",
    "run_to_memory_sink",
]
