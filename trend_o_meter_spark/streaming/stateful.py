"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's gap-anchored downsample (F2, trend-o-meter:296-310,387)
is the one operator whose exact semantics Spark's built-in windows cannot
express: the keep/drop decision for each sample depends on the timestamp
of the *previously kept* sample, not on a fixed grid.  Batch-side we run
it as an ``applyInPandas`` cumulative scan (operators/downsample.py);
stream-side this module keeps the anchor (``timeMark``) in the Spark
state store, keyed by metric, so it survives micro-batches and restarts
(checkpointed — the principled replacement for the reference's
rebuild-from-Redis-list recovery, trend-o-meter:142-144).

Scale notes: state is one long per metric — trivially bounded; the only
shuffle is the groupBy(metric) that routes rows to their state partition.
Event-time-descending arrival inside a micro-batch is sorted before the
scan, so the operator is deterministic per (batch, key); the reference's
arrival-order processing (trend-o-meter:387) is matched when the source
delivers in order, and late rows beyond the watermark are dropped rather
than corrupting the anchor (documented divergence, SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOWNSAMPLED_SCHEMA = StructType(
    [
        StructField("metric", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType([StructField("mark_us", LongType(), True)])


def stream_anchored_downsample(
    readings: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    gap_seconds: float = 60.0,
    watermark: str = "2 minutes",
) -> DataFrame:
    """F2 exact semantics as a continuous query.

    Input: long-format readings ``(ts TIMESTAMP, metric STRING, value
    DOUBLE, ...)`` (streaming).  Output: the kept samples, same shape.
    Keep rule: ``abs(ts - last_kept_ts) > gap`` with the anchor carried
    across micro-batches in the state store.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def scan(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (mark,) = state.get if state.exists else (None,)
        # drain ALL Arrow chunks before sorting (same fix as lsh.py's
        # scan): a group larger than the Arrow batch size arrives as
        # several pdfs, and per-chunk sorting would make the keep/drop
        # walk (and the persisted anchor) depend on chunk boundaries —
        # not replay-stable across at-least-once recovery
        chunks = list(pdfs)
        pdf = (chunks[0] if len(chunks) == 1 else pd.concat(chunks)).sort_values(
            ts, kind="mergesort"
        )
        t_us = (pdf[ts].astype("int64") // 1000).to_numpy()  # ns -> us
        keep = [False] * len(t_us)
        for i, t in enumerate(t_us):
            if mark is None or abs(int(t) - mark) > gap_us:
                keep[i] = True
                mark = int(t)
        kept = pdf[pd.Series(keep, index=pdf.index)]
        if len(kept):
            yield pd.DataFrame(
                {
                    "metric": key[0],
                    "ts": kept[ts],
                    "value": kept[value],
                }
            )
        state.update((mark,))

    return (
        readings.withWatermark(ts, watermark)
        .groupBy(metric)
        .applyInPandasWithState(
            scan,
            outputStructType=DOWNSAMPLED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
