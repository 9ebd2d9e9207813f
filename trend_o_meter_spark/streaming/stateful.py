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
    ArrayType,
    BooleanType,
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


CUSUM_SCHEMA = StructType(
    [
        StructField("metric", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("value", DoubleType(), True),
        StructField("s_pos", DoubleType(), True),
        StructField("s_neg", DoubleType(), True),
        StructField("alarm", BooleanType(), True),
        StructField("direction", StringType(), True),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [StructField("sp", DoubleType(), True), StructField("sn", DoubleType(), True)]
)


def stream_cusum(
    readings: DataFrame,
    *,
    params: dict[str, tuple[float, float]],
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    k_mult: float = 0.5,
    h_mult: float = 4.0,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Live CUSUM shift monitor: the streaming form of
    ``operators.trend.cusum_changepoints``, the (s_pos, s_neg)
    accumulator pair carried per metric in the Spark state store so a
    shift building across micro-batches (or a restart) is never lost —
    CUSUM's whole point is accumulating evidence TOO SMALL for any
    single batch to flag.

    ``params`` is the frozen calibration ``{metric: (median, MAD)}`` —
    live monitors score against a profile fitted on history (compute it
    with the batch operator's exact-rank quantiles and refresh on
    whatever cadence policy allows); recalibrating on the live window
    itself would let a slow drift move its own baseline.  Metrics
    absent from ``params`` pass through with null state/alarm
    (surfaced, not silently dropped).  Identical recursion, reset, and
    1e-9 output quantization as the batch operator; rows sort by event
    time within a batch, in-order arrival across batches is assumed
    (the :func:`stream_anchored_downsample` contract), late rows
    beyond the watermark drop rather than corrupting the accumulator.

    Scale: state is two doubles per metric; the only shuffle is the
    groupBy(metric) routing.  Output: every scored row with its
    accumulator trajectory, ``CUSUM_SCHEMA``.
    """
    km, hm = float(k_mult), float(h_mult)

    def q9(x: float) -> float:
        import math

        return (
            math.floor(x * 1e9 + 0.5) if x >= 0 else -math.floor(-x * 1e9 + 0.5)
        ) / 1e9

    def scan(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = list(pdfs)
        pdf = (chunks[0] if len(chunks) == 1 else pd.concat(chunks)).sort_values(
            [ts, value], kind="mergesort"
        )
        cal = params.get(key[0])
        if cal is None:
            yield pd.DataFrame(
                {
                    "metric": key[0],
                    "ts": pdf[ts],
                    "value": pdf[value],
                    "s_pos": pd.Series([None] * len(pdf), index=pdf.index, dtype="object"),
                    "s_neg": pd.Series([None] * len(pdf), index=pdf.index, dtype="object"),
                    "alarm": pd.Series([None] * len(pdf), index=pdf.index, dtype="object"),
                    "direction": pd.Series([None] * len(pdf), index=pdf.index, dtype="object"),
                }
            )
            return
        med, mad = float(cal[0]), float(cal[1])
        k, h = km * mad, hm * mad
        sp, sn = state.get if state.exists else (0.0, 0.0)
        sps, sns, alarms, dirs = [], [], [], []
        for y in pdf[value].astype("float64"):
            if pd.isna(y):
                sps.append(None)
                sns.append(None)
                alarms.append(None)
                dirs.append(None)
                continue
            spr = max(0.0, sp + ((y - med) - k))
            snr = max(0.0, sn + ((med - y) - k))
            alarm = spr > h or snr > h
            sps.append(q9(spr))
            sns.append(q9(snr))
            alarms.append(alarm)
            dirs.append(("up" if spr > h else "down") if alarm else None)
            sp, sn = (0.0, 0.0) if alarm else (spr, snr)
        yield pd.DataFrame(
            {
                "metric": key[0],
                "ts": pdf[ts],
                "value": pdf[value],
                "s_pos": pd.Series(sps, index=pdf.index, dtype="object"),
                "s_neg": pd.Series(sns, index=pdf.index, dtype="object"),
                "alarm": pd.Series(alarms, index=pdf.index, dtype="object"),
                "direction": pd.Series(dirs, index=pdf.index, dtype="object"),
            }
        )
        state.update((sp, sn))

    return (
        readings.withWatermark(ts, watermark)
        .groupBy(metric)
        .applyInPandasWithState(
            scan,
            outputStructType=CUSUM_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HW_SCHEMA = StructType(
    [
        StructField("metric", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("value", DoubleType(), True),
        StructField("level", DoubleType(), True),
        StructField("trend", DoubleType(), True),
        StructField("seasonal", DoubleType(), True),
    ]
)

_HW_STATE_SCHEMA = StructType(
    [
        StructField("lv", DoubleType(), True),
        StructField("tr", DoubleType(), True),
        StructField("s", ArrayType(DoubleType()), True),
    ]
)


def stream_holt_winters(
    readings: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Live Holt-Winters: the streaming form of
    ``operators.trend.holt_winters`` — level, trend, and the
    O(period/bucket)-slot ADAPTIVE seasonal profile carried per metric
    in the state store, so the learned shape survives micro-batches and
    restarts and every new sample updates it in place (the modern form
    of the reference's always-on trend monitor, now seasonality-aware).

    Identical recursion and seeding as the batch operator (level = y,
    trend = 0, zero seasonal slots at the first non-null sample; null
    samples emit null and do not advance); phases use the same integer
    arithmetic.  In-order arrival across batches is assumed (the
    :func:`stream_anchored_downsample` contract); a feed whose batches
    replay in order reproduces the batch scan exactly — test-pinned
    against the batch operator over the union.

    Scale: state is ``2 + period/bucket`` doubles per metric (26 under
    the defaults) — constant, not data-sized; the only shuffle is the
    groupBy(metric) routing.  Output: every row with its smoothed
    state, ``HW_SCHEMA``.
    """
    m = int(period_seconds // bucket_seconds)
    if m < 1:
        raise ValueError("period_seconds must be >= bucket_seconds")
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    one_minus_g = 1.0 - gamma

    def scan(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = list(pdfs)
        pdf = (chunks[0] if len(chunks) == 1 else pd.concat(chunks)).sort_values(
            [ts, value], kind="mergesort"
        )
        if state.exists:
            lv, tr, s = state.get
            s = list(s)
        else:
            lv, tr, s = None, 0.0, [0.0] * m
        t_s = (pdf[ts].astype("int64") // 1_000_000_000).to_numpy()
        levels, trends, seas = [], [], []
        for y, t in zip(pdf[value].astype("float64"), t_s):
            if pd.isna(y):
                levels.append(None)
                trends.append(None)
                seas.append(None)
                continue
            p = int((int(t) % period_seconds) // bucket_seconds)
            if lv is None:
                lv, tr = y, 0.0
            else:
                new_lv = alpha * (y - s[p]) + one_minus_a * (lv + tr)
                tr = beta * (new_lv - lv) + one_minus_b * tr
                s[p] = gamma * (y - new_lv) + one_minus_g * s[p]
                lv = new_lv
            levels.append(lv)
            trends.append(tr)
            seas.append(s[p])
        yield pd.DataFrame(
            {
                "metric": key[0],
                "ts": pdf[ts],
                "value": pdf[value],
                "level": pd.Series(levels, index=pdf.index, dtype="object"),
                "trend": pd.Series(trends, index=pdf.index, dtype="object"),
                "seasonal": pd.Series(seas, index=pdf.index, dtype="object"),
            }
        )
        state.update((lv, tr, s))

    return (
        readings.withWatermark(ts, watermark)
        .groupBy(metric)
        .applyInPandasWithState(
            scan,
            outputStructType=HW_SCHEMA,
            stateStructType=_HW_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
