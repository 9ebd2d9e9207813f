"""Rolling / tumbling means (reference A4, A5/W1).

* :func:`rolling_current_average` — the reference's "current value": the
  mean of the N most-recent samples per metric (trend-o-meter:366-371,
  N = config showCurrentValue.numSamples = 30).
* :func:`tumbling_mean` — the reference's micro-batch mean merge
  (trend-o-meter:397-403): every sample inside a 60s tick is averaged.
  The batch form is a tumbling-window mean keyed by (metric, minute
  bucket); the streaming twin lives in streaming/pipeline.py.

Float determinism: averages are computed as exact DECIMAL sums divided by
counts, so Spark and the DuckDB oracle agree bit-for-bit regardless of
partial-aggregation order (double summation is order-sensitive; decimal
summation is exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Exact decimal accumulator for double inputs in the test-data value range.
_DEC = "decimal(28,8)"


def _exact_avg(value: str):
    """Order-insensitive mean of a double column: decimal sum / count."""
    return (
        F.sum(F.col(value).cast(_DEC)).cast("double") / F.count(F.lit(1))
    )


def rolling_current_average(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    num_samples: int = 30,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Mean of the ``num_samples`` most recent rows per key.

    One row per key: ``*keys, current_avg, n_used, latest_ts``.
    Scale: rank-within-key window (per-key sort, no global sort) then a
    keyed aggregate — two narrow shuffles on the key columns.
    """
    order = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= num_samples)
        .groupBy(*keys)
        .agg(
            _exact_avg(value).alias("current_avg"),
            F.count(F.lit(1)).alias("n_used"),
            F.max(ts).alias("latest_ts"),
        )
    )


def rolling_current_average_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    num_samples: int = 30,
    tiebreak: Sequence[str] = (),
) -> str:
    key_sel = ", ".join(keys)
    order = ", ".join(f"{c} DESC" for c in [ts, *tiebreak])
    return f"""
SELECT {key_sel},
       CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS current_avg,
       count(*) AS n_used,
       max({ts}) AS latest_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_sel} ORDER BY {order}) AS __rn
  FROM {table}
) WHERE __rn <= {num_samples}
GROUP BY {key_sel}
"""


def tumbling_mean(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    window_seconds: int = 60,
) -> DataFrame:
    """Per-key tumbling-window mean (epoch-aligned windows).

    One row per (key, window): ``*keys, window_start, mean_value,
    n_samples, last_ts``.  Matches the streaming `window(ts, '60 seconds')`
    aggregate; single hash shuffle with map-side partial agg.
    """
    win_us = window_seconds * 1_000_000
    bucket = (F.floor(F.unix_micros(F.col(ts)) / F.lit(win_us))).alias("__b")
    return (
        df.groupBy(*keys, bucket)
        .agg(
            _exact_avg(value).alias("mean_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max(ts).alias("last_ts"),
        )
        .withColumn("window_start", F.timestamp_micros(F.col("__b") * win_us))
        .drop("__b")
    )


def tumbling_mean_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    window_seconds: int = 60,
) -> str:
    key_sel = ", ".join(keys)
    win_us = window_seconds * 1_000_000
    return f"""
SELECT {key_sel},
       CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_value,
       count(*) AS n_samples,
       max({ts}) AS last_ts,
       make_timestamp(floor(epoch_us({ts}) / {win_us})::BIGINT * {win_us}) AS window_start
FROM {table}
GROUP BY {key_sel}, floor(epoch_us({ts}) / {win_us})
"""
