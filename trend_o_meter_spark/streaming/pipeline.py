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
from pyspark.sql.utils import AnalysisException
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


def stream_exact_dedup(
    docs: DataFrame,
    *,
    ts: str = "ts",
    text: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``llm.dedup.exact_dedup``: emit each distinct
    normalized-content document once, drop re-arrivals inside the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state for a
    content hash is evicted once the watermark passes it, so dedup state
    is bounded by the horizon, not the stream length).

    The horizon IS the semantic contract: a duplicate arriving later than
    ``watermark`` after its twin is re-emitted.  Batch-exact global dedup
    over unbounded history is the batch operator's job (run it in the
    backfill leg of the lambda shape, this one on the tail).
    """
    from ..llm.dedup import _norm

    keyed = docs.withColumn("__content_hash", F.md5(_norm(F.col(text))))
    return (
        keyed.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .withColumnRenamed("__content_hash", "content_hash")
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


def stream_stream_enrich(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: tuple[str, ...] = ("metric",),
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback_seconds: int = 60,
    left_watermark: str = "2 minutes",
    right_watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: attach to each left event the
    right-side rows of the same key whose timestamp falls inside
    ``[left_ts - lookback_seconds, left_ts]`` — the live enrichment shape
    (a reading joined to the command/annotation that preceded it).

    Both sides carry a watermark and the join condition carries the time
    bound, so Spark evicts join state once the watermark passes the
    lookback horizon: state is O(events inside horizon) per side, never
    O(stream).  ``left_ts`` and ``right_ts`` must be distinct column
    names (the output carries both).

    The batch twin is a plain equi-join + range filter (interval-join
    family); the test pins stream output == batch output when nothing is
    late.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    # rename right keys so the joined frame has no ambiguous columns
    for k in keys:
        rw = rw.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = (
        cond
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
    )
    return lw.join(rw, cond).drop(*[f"__r_{k}" for k in keys])


def seed_history(
    backfill: DataFrame,
    *,
    state_path: str,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    gap_seconds: float = 60.0,
) -> None:
    """Backfill half of the lambda shape (SURVEY §1.1 "backfill + tail").

    Downsamples a bounded historical frame with the SAME cadence the live
    stream uses and writes it to the history table that
    :func:`stream_day_bins` appends to — the Spark equivalent of the
    reference's startup list replay (trend-o-meter:289-310) feeding the
    same state the pub/sub handler appends to.
    """
    from ..operators.downsample import downsample_fixed_grid

    ds = downsample_fixed_grid(
        backfill.select(metric, ts, value), ts=ts, keys=(metric,), gap_seconds=gap_seconds
    )
    ds.select(metric, ts, value).write.mode("append").parquet(state_path)


def stream_day_bins(
    readings: DataFrame,
    *,
    state_path: str,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    gap_seconds: float = 60.0,
    day_bins: tuple[int, ...] = (1, 3, 5, 7),
    min_data_hours: int = 18,
    retention_days: float | None = None,
    on_result: "object" = None,
):
    """The reference's live loop (§3.2) end-to-end as a continuous query.

    backfill+tail shape: the gap-anchored downsample keeps its anchor in
    the state store (``stream_anchored_downsample``); each micro-batch's
    kept samples append to a parquet state table (the durable stand-in
    for the reference's in-memory ``metricHistory`` — its Redis list WAL,
    trend-o-meter:142-144), then the flagship day-bin aggregation re-runs
    over the state table and the result goes to ``on_result(batch_id,
    DataFrame)`` (e.g. the display renderer).

    The full recompute per batch mirrors the reference's ``runParse()``
    per accepted sample (trend-o-meter:418) — but columnar, and over the
    downsampled table (1 row/min/metric), so the recompute input at any
    scale is tiny: the A3 anchor is data-derived (max ts per metric),
    which no incremental streaming agg can window on — SURVEY §7.3.
    ``retention_days`` applies the F4 range cull to the state table scan.

    Returns the function for ``writeStream.foreachBatch`` — caller starts
    the query (checkpointing recommended).
    """
    from ..operators.daybins import day_binned_extremes
    from ..operators.retention import retain_window
    from .stateful import stream_anchored_downsample

    kept = stream_anchored_downsample(
        readings, ts=ts, value=value, metric=metric, gap_seconds=gap_seconds
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(state_path)
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # state path not created yet (all-empty batches)
            return
        if retention_days is not None:
            state = retain_window(state, ts="ts", keys=(metric,), days=retention_days)
        result = day_binned_extremes(
            state, ts="ts", value="value", metric=metric,
            day_bins=day_bins, min_data_hours=min_data_hours,
        )
        if on_result is not None:
            on_result(batch_id, result)

    return kept, per_batch


def stream_trending(
    *,
    state_path: str,
    ts: str = "ts",
    keys: tuple[str, ...] = ("metric",),
    bucket_seconds: int = 86400,
    on_result: "object" = None,
):
    """Live trend detection: the streaming twin of
    ``operators.trend.trending_counts``.

    Each micro-batch appends its PARTIAL per-(key, bucket) counts to a
    parquet counts table (batch-land groupBy = true deltas, so late rows
    within the retention horizon simply add to their bucket — no
    update-mode double-counting), then re-scores the re-summed table and
    hands the result to ``on_result(batch_id, DataFrame)``.

    Recompute input is the counts table — O(keys x active buckets), never
    O(events) — the same bounded-state argument as ``stream_day_bins``'s
    downsampled history.  Returns the ``foreachBatch`` callable.
    """
    from ..operators.trend import score_bucket_counts

    b = (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).cast("long")

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.isEmpty():
            partial = batch_df.withColumn("__b", b).groupBy(*keys, "__b").agg(
                F.count(F.lit(1)).alias("__c")
            )
            partial.write.mode("append").parquet(state_path)
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # state path not created yet (all-empty batches)
            return
        counts = state.groupBy(*keys, "__b").agg(F.sum("__c").cast("long").alias("__c"))
        result = score_bucket_counts(counts, keys=keys, bucket_seconds=bucket_seconds)
        if on_result is not None:
            on_result(batch_id, result)

    return per_batch


def stream_cms(
    *,
    state_path: str,
    key: str = "metric",
    width: int = 64,
    depth: int = 4,
    on_result: "object" = None,
):
    """Live frequency sketching: the streaming twin of
    ``operators.cms.cms_build`` — each micro-batch builds its PARTIAL
    count-min grid and appends it to a parquet grid table; the merged
    sketch (elementwise sum — CMS grids merge losslessly) is re-read and
    handed to ``on_result(batch_id, DataFrame)``.

    The same bounded-state argument as ``stream_trending``: the state
    table is O(batches x depth x width) grid rows (compact it with
    ``io.compact_table`` on a cadence), the merged sketch is
    O(depth x width) whatever the stream length, and the merge is the
    associative grid sum — so the streaming sketch EQUALS the batch
    sketch of the union (test-pinned).  Returns the ``foreachBatch``
    callable.
    """
    from ..operators.cms import cms_build

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.isEmpty():
            partial = cms_build(batch_df, key=key, width=width, depth=depth)
            partial.write.mode("append").parquet(state_path)
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # state path not created yet (all-empty batches)
            return
        merged = state.groupBy("row_id", "bucket").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        if on_result is not None:
            on_result(batch_id, merged)

    return per_batch


def stream_hll_rollup(
    *,
    state_path: str,
    ts: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    id_col: str = "user_id",
    bucket_seconds: int = 86400,
    on_result: "object" = None,
):
    """Live distinct-count rollup: the streaming twin of
    ``workload.sketch_rollup`` — each micro-batch appends its PARTIAL
    per-(key, day) HLL sketches (binary register state) to a parquet
    sketch table; estimates come from ``hll_union_agg`` over the merged
    table.  HLL union is the lossless register-wise max, so the
    streaming estimate EQUALS the batch estimate over the union
    (test-pinned) — late rows within the retention horizon union into
    their day like any other partial.

    State is O(keys x days x batches) KB-sized sketch rows (compact on
    a cadence); the estimate re-aggregation never rescans raw events —
    the same hypertable argument as the batch rollup.  Returns the
    ``foreachBatch`` callable; ``on_result(batch_id, DataFrame)`` gets
    ``*keys, approx_users`` per key over all days seen.
    """
    b = F.date_trunc("day", F.col(ts)) if bucket_seconds == 86400 else (
        F.timestamp_seconds(
            (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).cast("long")
        )
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.isEmpty():
            partial = batch_df.withColumn("__day", b).groupBy(*keys, "__day").agg(
                F.hll_sketch_agg(id_col).alias("__sk")
            )
            partial.write.mode("append").parquet(state_path)
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # state path not created yet (all-empty batches)
            return
        result = state.groupBy(*keys).agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("approx_users")
        )
        if on_result is not None:
            on_result(batch_id, result)

    return per_batch


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
