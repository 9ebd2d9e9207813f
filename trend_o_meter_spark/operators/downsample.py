"""Downsampling (reference F2, trend-o-meter:296-310).

The reference keeps a sample iff its ts is more than ``gap`` seconds from
the previously-kept sample's ts (``timeMark``), walking newest-first — a
stateful, last-kept-anchored scan.  Two implementations:

* :func:`downsample_fixed_grid` — the scale path.  Snaps samples to a fixed
  epoch-aligned grid of ``gap`` seconds and keeps the first sample per
  (key, cell).  Pure DataFrame (window rank over a computed cell), fully
  parallel, one shuffle.  This is the contract the oracle checks.
* :func:`downsample_anchored` — exact reference semantics.  Inherently
  sequential per key (each keep decision depends on the previous keep), so
  it runs as an Arrow-batched ``applyInPandas`` cumulative scan per key.
  Per-key series are bounded (the reference caps history at ~14k rows,
  config/default.json:6), so a per-key sequential pass is safe at scale as
  long as key cardinality provides the parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def downsample_fixed_grid(
    df: DataFrame,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    gap_seconds: float = 60.0,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep the first sample per epoch-aligned ``gap_seconds`` cell per key.

    Implemented as ``min_by(full_row, (ts, *tiebreak))`` per (key, cell)
    hash aggregate rather than a ``row_number`` window: identical rows
    out (verified exceptAll-empty both ways at sf0.1), but the aggregate
    gets map-side partial aggregation and skips the per-partition sort a
    rank window needs — the shape that holds up at 100 TB (shuffle
    carries one pre-reduced row per (key, cell), not every sample).
    """
    cell = F.floor(F.unix_micros(F.col(ts)) / F.lit(int(gap_seconds * 1_000_000)))
    ordkey = F.struct(F.col(ts), *[F.col(c) for c in tiebreak])
    payload = F.struct(*[F.col(c) for c in df.columns])
    kept = df.groupBy(*[F.col(k) for k in keys], cell.alias("__cell")).agg(
        F.min_by(payload, ordkey).alias("__r")
    )
    return kept.select(*[F.col(f"__r.{c}").alias(c) for c in df.columns])


def downsample_fixed_grid_sql(
    table: str,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    gap_seconds: float = 60.0,
    tiebreak: Sequence[str] = (),
    columns: str = "* EXCLUDE (__rn)",
) -> str:
    """DuckDB twin of :func:`downsample_fixed_grid`.  The default
    ``columns`` excludes the internal ``__rn`` helper so the oracle's
    schema matches the Spark twin without callers listing columns."""
    key_part = ", ".join(list(keys) + [f"floor(epoch_us({ts}) / {int(gap_seconds * 1_000_000)})"])
    order = ", ".join([ts] + list(tiebreak))
    return f"""
SELECT {columns} FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_part} ORDER BY {order}) AS __rn
  FROM {table}
) WHERE __rn = 1
"""


def downsample_anchored(
    df: DataFrame,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    gap_seconds: float = 60.0,
    newest_first: bool = True,
) -> DataFrame:
    """Exact reference F2: gap anchored at the previously KEPT sample.

    Walks each key's series in the reference's newest-first order
    (trend-o-meter:16,296-310): the newest sample is always kept, and a
    sample is kept iff ``abs(ts - last_kept_ts) > gap``.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, ascending=not newest_first, kind="mergesort")
        t_us = pdf[ts].astype("int64")  # datetime64[ns] -> ns; ratio is uniform
        vals = t_us.to_numpy()
        keep = [False] * len(vals)
        mark = None
        gap_native = gap_us * 1000  # pandas datetime64 is ns
        for i, t in enumerate(vals):
            if mark is None or abs(int(t) - mark) > gap_native:
                keep[i] = True
                mark = int(t)
        return pdf[pd.Series(keep, index=pdf.index)]

    return df.groupBy(*keys).applyInPandas(scan, schema=df.schema)
