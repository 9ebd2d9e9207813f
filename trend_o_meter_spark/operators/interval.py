"""Interval (point-in-range) join — the second timeseries-native join
Spark lacks built-in (alongside the as-of join, SURVEY §2.7).

``interval_join`` attaches to each left "point" row every right interval
of the same key that contains its timestamp.  Expressing this naively as
``join(key) && start <= ts && ts <= end`` gives Spark either a key hash
join whose post-filter rescans EVERY interval of a hot key per point, or
— keyless — a BroadcastNestedLoopJoin.  The scalable classic is chunk
bucketing: points key into their ``chunk_seconds`` time chunk, intervals
explode into every chunk they overlap, and the join becomes a plain
equi-join on (key, chunk) + exact range filter.  Each (point, interval)
pair meets in exactly one chunk (the point's), so no dedup pass is
needed.  Join fan-in per task is bounded by intervals-overlapping-chunk,
not intervals-per-key.

Cite: reference has no joins at all (single-metric event loop); this is
part of the standard relational surface shipped Spark-first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts: str = "ts",
    start: str = "session_start",
    end: str = "session_end",
    keys: Sequence[str] = ("user_id",),
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Inner join: every (point, containing-interval) pair, inclusive on
    both interval edges.  Output: all point columns + ``start``/``end``
    interval columns (other interval columns are carried too).

    Intervals longer than a few chunks explode into that many helper
    rows — pick ``chunk_seconds`` near the typical interval length so
    the blow-up stays O(1) per interval (a day for sub-day sessions).
    """
    pchunk = F.floor(F.unix_seconds(F.col(ts)) / chunk_seconds).cast("long")
    p = points.withColumn("__chunk", pchunk)
    lo = F.floor(F.unix_seconds(F.col(start)) / chunk_seconds).cast("long")
    hi = F.floor(F.unix_seconds(F.col(end)) / chunk_seconds).cast("long")
    iv = intervals.withColumn("__chunk", F.explode(F.sequence(lo, hi)))
    j = p.join(iv, [*keys, "__chunk"]).filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) <= F.col(end))
    )
    return j.drop("__chunk")
