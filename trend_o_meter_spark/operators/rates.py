"""Sliding rates, active channels, sessionization (reference A7, A8/F5).

* :func:`sliding_rates` — msgs/sec + bytes/sec over a trailing W-second
  window, computed as per-second pre-aggregated buckets (the reference's
  partial agg, trend-o-meter:491-496) then a range-frame window sum
  (the reference's bucket sum, trend-o-meter:463-466).  The reference's
  half-full render gate (> W/2 buckets) is the ``is_warm`` column.
* :func:`active_channels` — last-seen per channel + inactivity cutoff
  (trend-o-meter:470-480,521-525), anchored at the stream's max ts (the
  reference uses wall clock; data-anchored is the deterministic batch twin).
* :func:`sessionize` — inactivity-gap sessions (the generalization of the
  active-channel cutoff; Spark's session_window semantics: a gap >= the
  timeout starts a new session).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_rates(
    df: DataFrame,
    *,
    ts: str = "ts",
    size_col: str | None = None,
    window_seconds: int = 10,
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Trailing-window message and byte rates per second.

    Output: ``second (timestamp), n_msgs, n_bytes, msgs_per_sec,
    bytes_per_sec, buckets_in_window, is_warm``.

    Scale: the per-second pre-aggregation is a keyed hash agg (map-side
    partial), and the sliding sum is a bounded range-frame window over the
    *bucketed* series — state is O(active seconds), not O(messages).
    The range window is PARTITIONED by ``chunk_seconds``-wide time chunks
    (default one day) so no single task ever holds the whole series: each
    chunk's trailing frame is completed by duplicating the previous
    chunk's last ``window_seconds - 1`` buckets into it as frame-only
    helper rows (dropped from the output), which makes the result
    bit-identical to the unpartitioned window (property-tested) while the
    plan shows a keyed — never SinglePartition — WindowExec.
    """
    if chunk_seconds <= window_seconds:
        raise ValueError("chunk_seconds must exceed window_seconds")
    # octet_length, not length: bytes_per_sec must count BYTES — a
    # 3-byte UTF-8 char is one character but three octets, and the
    # observed() rx_bytes counter uses octets for the same concept
    sized = F.octet_length(size_col) if size_col else F.lit(0)
    buckets = df.groupBy(F.floor(F.unix_micros(F.col(ts)) / 1_000_000).alias("sec")).agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum(sized).alias("n_bytes"),
    )
    chunk = F.floor(F.col("sec") / chunk_seconds)
    own = buckets.select("sec", "n_msgs", "n_bytes", chunk.alias("__chunk"), F.lit(False).alias("__helper"))
    # tail of each chunk, re-keyed into the NEXT chunk: present in its
    # frame, absent from its output (pmod so pre-epoch seconds stay safe)
    overlap = buckets.filter(
        F.pmod(F.col("sec"), F.lit(chunk_seconds)) >= F.lit(chunk_seconds - (window_seconds - 1))
    ).select("sec", "n_msgs", "n_bytes", (chunk + 1).alias("__chunk"), F.lit(True).alias("__helper"))
    w_range = (
        Window.partitionBy("__chunk")
        .orderBy(F.col("sec"))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    out = (
        own.unionByName(overlap)
        .withColumn("win_msgs", F.sum("n_msgs").over(w_range))
        .withColumn("win_bytes", F.sum("n_bytes").over(w_range))
        .withColumn("buckets_in_window", F.count(F.lit(1)).over(w_range))
        .filter(~F.col("__helper"))
        .select(
            F.timestamp_seconds(F.col("sec")).alias("second"),
            "n_msgs",
            "n_bytes",
            (F.col("win_msgs") / F.lit(float(window_seconds))).alias("msgs_per_sec"),
            (F.col("win_bytes") / F.lit(float(window_seconds))).alias("bytes_per_sec"),
            "buckets_in_window",
            (F.col("buckets_in_window") > F.lit(window_seconds / 2.0)).alias("is_warm"),
        )
    )
    return out


def sliding_rates_sql(
    table: str,
    *,
    ts: str = "ts",
    size_col: str | None = None,
    window_seconds: int = 10,
) -> str:
    # CAST to BIGINT: DuckDB's bare sum() over INTEGER returns HUGEINT
    # (int128), which the driver hashes differently from Spark's BIGINT
    # even when values are identical.
    sized = f"CAST(sum(octet_length(encode({size_col}))) AS BIGINT)" if size_col else "CAST(sum(0) AS BIGINT)"
    return f"""
WITH buckets AS (
  SELECT floor(epoch_us({ts}) / 1000000)::BIGINT AS sec,
         count(*) AS n_msgs,
         {sized} AS n_bytes
  FROM {table} GROUP BY 1
)
SELECT make_timestamp(sec * 1000000) AS second,
       n_msgs, n_bytes,
       sum(n_msgs) OVER w / {float(window_seconds)} AS msgs_per_sec,
       sum(n_bytes) OVER w / {float(window_seconds)} AS bytes_per_sec,
       count(*) OVER w AS buckets_in_window,
       count(*) OVER w > {window_seconds / 2.0} AS is_warm
FROM buckets
WINDOW w AS (ORDER BY sec RANGE BETWEEN {window_seconds - 1} PRECEDING AND CURRENT ROW)
"""


def active_channels(
    df: DataFrame,
    *,
    ts: str = "ts",
    channel: str = "channel",
    cutoff_seconds: int = 3600,
    active_only: bool = False,
) -> DataFrame:
    """Last-seen per channel with inactivity flag (reference F5/A8).

    Output: ``channel, last_seen, age_seconds, is_active``.  Anchor is the
    dataset max ts (deterministic stand-in for the reference's wall clock).
    """
    anchors = df.agg(F.max(ts).alias("__anchor"))
    per_chan = df.groupBy(F.col(channel).alias("channel")).agg(F.max(ts).alias("last_seen"))
    out = (
        per_chan.crossJoin(F.broadcast(anchors))
        .withColumn(
            "age_seconds",
            (F.unix_micros(F.col("__anchor")) - F.unix_micros(F.col("last_seen")))
            / F.lit(1_000_000.0),
        )
        .withColumn("is_active", F.col("age_seconds") <= F.lit(float(cutoff_seconds)))
        .drop("__anchor")
    )
    if active_only:
        out = out.filter(F.col("is_active"))
    return out


def active_channels_sql(
    table: str,
    *,
    ts: str = "ts",
    channel: str = "channel",
    cutoff_seconds: int = 3600,
    active_only: bool = False,
) -> str:
    where = "WHERE is_active" if active_only else ""
    return f"""
WITH per_chan AS (
  SELECT {channel} AS channel, max({ts}) AS last_seen FROM {table} GROUP BY 1
), anch AS (SELECT max({ts}) AS anchor FROM {table})
SELECT * FROM (
  SELECT channel, last_seen,
         (epoch_us(anchor) - epoch_us(last_seen)) / 1000000.0 AS age_seconds,
         (epoch_us(anchor) - epoch_us(last_seen)) / 1000000.0 <= {float(cutoff_seconds)} AS is_active
  FROM per_chan, anch
) {where}
"""


def sessionize(
    df: DataFrame,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Inactivity-gap sessions per key (gaps >= gap start a new session).

    Output: ``*keys, session_start, session_end, n_events``.
    Implemented with the gaps-and-islands pattern (lag + cumulative sum of
    boundary flags) — identical semantics in batch SQL and in Spark's
    streaming ``session_window``; per-key sort, no global sort.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    gap_us = gap_seconds * 1_000_000
    flagged = df.withColumn(
        "__new",
        F.when(
            F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w)) >= F.lit(gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    ).withColumn("__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy(*keys, "__sid")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sid")
    )


def sessionize_sql(
    table: str,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
) -> str:
    key_sel = ", ".join(keys)
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH flagged AS (
  SELECT *,
    CASE WHEN epoch_us({ts}) - epoch_us(lag({ts}) OVER (PARTITION BY {key_sel} ORDER BY {ts}))
              >= {gap_us} THEN 1 ELSE 0 END AS __new
  FROM {table}
), numbered AS (
  SELECT *, sum(__new) OVER (PARTITION BY {key_sel} ORDER BY {ts}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __sid
  FROM flagged
)
SELECT {key_sel}, min({ts}) AS session_start, max({ts}) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY {key_sel}, __sid
"""
