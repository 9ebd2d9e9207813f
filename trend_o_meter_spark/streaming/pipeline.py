"""Streaming pipelines: the reference's continuous queries on watermarked
Structured Streaming (SURVEY §2.9).

Divergences from the reference, by design (documented, principled):
* late data: the reference accepts arbitrarily-late samples and corrupts
  its sort invariant (trend-o-meter:301,387,413-415); we bound lateness
  with an explicit watermark and drop beyond it.
* retention: watermark-driven state eviction replaces the lazy
  one-per-event cull (F4) and the gap-repair hack (F7).
* the event-time-gap trigger (F3) becomes a tumbling event-time window —
  same cadence, aligned grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_tumbling_mean(
    readings: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: tuple[str, ...] = ("metric",),
    window_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """A4 streaming twin: per-key tumbling mean with watermark.

    Output: ``*keys, window_start, window_end, mean_value, n_samples``.
    """
    return (
        readings.withWatermark(ts, watermark)
        .groupBy(*keys, F.window(ts, f"{window_seconds} seconds").alias("__w"))
        .agg(
            F.avg(value).alias("mean_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            *keys,
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "mean_value",
            "n_samples",
        )
    )


def stream_sliding_rates(
    messages: DataFrame,
    *,
    ts: str = "ts",
    size_col: str | None = None,
    window_seconds: int = 10,
    watermark: str = "30 seconds",
) -> DataFrame:
    """A7 streaming twin: msgs/sec + bytes/sec over a sliding window.

    ``window(ts, W, 1s)`` slide; rates are window sums / W; the
    reference's half-full render gate maps to the ``is_warm`` flag
    computed from distinct seconds present.
    """
    sized = F.length(size_col) if size_col else F.lit(0)
    return (
        messages.withWatermark(ts, watermark)
        .groupBy(F.window(ts, f"{window_seconds} seconds", "1 second").alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum(sized).alias("n_bytes"),
            F.approx_count_distinct(F.unix_timestamp(F.col(ts))).alias("n_seconds"),
        )
        .select(
            F.col("__w.end").alias("window_end"),
            (F.col("n_msgs") / F.lit(float(window_seconds))).alias("msgs_per_sec"),
            (F.col("n_bytes") / F.lit(float(window_seconds))).alias("bytes_per_sec"),
            (F.col("n_seconds") > F.lit(window_seconds / 2.0)).alias("is_warm"),
        )
    )


def stream_session_channels(
    messages: DataFrame,
    *,
    ts: str = "ts",
    channel: str = "channel",
    gap_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """F5/A8 streaming twin: per-channel activity sessions.

    ``session_window`` closes a session after ``gap_seconds`` of silence —
    exactly the reference's inactivity cutoff, with state evicted by the
    watermark instead of the manual scan at trend-o-meter:470-479.
    """
    return (
        messages.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), f"{gap_seconds} seconds").alias("__s"), F.col(channel))
        .agg(F.count(F.lit(1)).alias("n_msgs"))
        .select(
            F.col(channel),
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n_msgs",
        )
    )


def run_to_memory_sink(
    df: DataFrame,
    *,
    name: str,
    output_mode: str = "append",
    timeout_seconds: float = 30.0,
) -> StreamingQuery:
    """Start the stream into an in-memory table (tests / display emulation)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"/tmp/tom-spark-ckpt/{name}")
        .start()
    )
    return q
