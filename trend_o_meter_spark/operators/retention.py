"""Retention (reference F4, trend-o-meter:421-435).

The reference lazily pops exactly one oldest sample per accepted message
once the span exceeds ``max(dayBins)`` days — convergent-but-lagging
retention.  We deliberately replace it with declarative time-range
retention (keep rows within ``days`` of the per-key max ts): semantically
what the reference converges to, and what a watermark gives us in
streaming.  Divergence documented per SURVEY §4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retain_window(
    df: DataFrame,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    days: float = 7.0,
) -> DataFrame:
    """Keep rows with ``anchor - ts <= days`` where anchor = per-key max ts."""
    keys = list(keys)
    horizon_us = int(days * 86400 * 1_000_000)
    if keys:
        anchors = df.groupBy(*keys).agg(F.max(ts).alias("__anchor"))
        j = df.join(F.broadcast(anchors), on=keys)
    else:
        j = df.crossJoin(F.broadcast(df.agg(F.max(ts).alias("__anchor"))))
    return j.filter(
        F.unix_micros(F.col("__anchor")) - F.unix_micros(F.col(ts)) <= F.lit(horizon_us)
    ).drop("__anchor")


def retain_window_sql(
    table: str,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    days: float = 7.0,
    columns: str = "* EXCLUDE (__anchor)",
) -> str:
    part = f"PARTITION BY {', '.join(keys)}" if keys else ""
    horizon_us = int(days * 86400 * 1_000_000)
    return f"""
SELECT {columns} FROM (
  SELECT *, max({ts}) OVER ({part}) AS __anchor FROM {table}
) WHERE epoch_us(__anchor) - epoch_us({ts}) <= {horizon_us}
"""
