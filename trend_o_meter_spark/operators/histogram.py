"""Mergeable fixed-grid histogram sketch + quantile estimation.

The third mergeable-sketch family next to HLL (distinct counts,
``workload.sketch_rollup``) and CMS (frequencies, :mod:`.cms`):
approximate QUANTILES with exactly-mergeable partials.  Spark's own
``percentile_approx`` answers one-shot batch queries, but its internal
sketch state is engine-private — partial results cannot be persisted,
merged across shards/micro-batches, or checked against an oracle.  The
fixed-grid histogram can: the sketch is ``(bin, cnt)`` rows with
``bin = floor(value / bin_width)``, so

* shard/micro-batch partials merge by bin-keyed count addition
  (:func:`histogram_merge` — lossless, order-free, the same property
  CMS grids have);
* the estimate is deterministic integer arithmetic + one double
  division, reproduced exactly by the DuckDB oracle (hash-exact, unlike
  engine-internal KLL/t-digest state, which is rows-only by design in
  ``approx_sketches``);
* accuracy is a hard guarantee, not probabilistic: every estimate lies
  within ``bin_width`` of the exact quantile (values inside a bin are
  placed uniformly).

Quantile convention: for ``n`` values the target rank is
``r = floor(q*(n-1)) + 1`` (1-based; q=0 -> minimum's bin, q=1 ->
maximum's) and the estimate interpolates uniformly within the bin
containing rank ``r``.

Scale: the sketch is <= (value range / bin_width) rows BY CONSTRUCTION
whatever the corpus size; the cumulative ranks use a bounded triangular
join over the broadcast sketch (never a single-partition window over
corpus data — the CI red-flag the rate/rolling family once hit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QS = (0.25, 0.5, 0.9, 0.99)


def histogram_sketch(
    df: DataFrame, *, value: str = "value", bin_width: float = 1.0
) -> DataFrame:
    """One scan -> ``(bin, cnt)`` partial.  Null values are excluded
    (they have no rank position)."""
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(
            F.floor(F.col(value) / F.lit(float(bin_width))).cast("long").alias("bin")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Bin-keyed count addition — partials of shards merge losslessly
    into the partial of the union (test-pinned, same contract as
    :func:`..operators.cms.cms_merge`)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    *,
    qs: Sequence[float] = DEFAULT_QS,
    bin_width: float = 1.0,
) -> DataFrame:
    """Estimate quantiles from a sketch: ``q, quantile_est``.

    All rank arithmetic is integer; the only float ops are the shared
    ``q*(n-1)`` target and the final within-bin interpolation, both
    single expressions with identical literals in the oracle — so the
    result is bit-deterministic cross-engine.
    """
    w = float(bin_width)
    spark = sketch.sparkSession
    a = sketch.select(F.col("bin").alias("a_bin"), F.col("cnt").alias("a_cnt"))
    b = sketch.select(F.col("bin").alias("b_bin"), F.col("cnt").alias("b_cnt"))
    cum = (
        a.join(F.broadcast(b), F.col("b_bin") <= F.col("a_bin"))
        .groupBy("a_bin", "a_cnt")
        .agg(F.sum("b_cnt").cast("long").alias("cum"))
    )
    total = F.broadcast(sketch.agg(F.sum("cnt").cast("long").alias("n")))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    targets = qdf.crossJoin(total).select(
        "q", (F.floor(F.col("q") * (F.col("n") - 1)) + 1).cast("long").alias("r")
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter((F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("a_cnt") < F.col("r")))
        .select(
            "q",
            F.round(
                F.col("a_bin") * F.lit(w)
                + F.lit(w) * (F.col("r") - (F.col("cum") - F.col("a_cnt")) - 1) / F.col("a_cnt"),
                9,
            ).alias("quantile_est"),
        )
    )


def histogram_quantiles_sql(
    table: str,
    *,
    value: str = "value",
    bin_width: float = 1.0,
    qs: Sequence[float] = DEFAULT_QS,
) -> str:
    """DuckDB twin: identical binning, rank and interpolation arithmetic
    (the cumulative mechanism differs — a window over the tiny bins CTE —
    but mechanisms do not affect the exact integer/double values)."""
    w = float(bin_width)
    q_values = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
WITH bins AS (
  SELECT CAST(floor({value} / {w!r}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table} WHERE {value} IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM bins
),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM bins),
targets AS (
  -- CAST: DuckDB types a VALUES literal 0.5 as DECIMAL(2,1); the rank
  -- product and the output column must be the same DOUBLE as Spark's
  SELECT CAST(q AS DOUBLE) AS q,
         CAST(floor(CAST(q AS DOUBLE) * (n - 1)) + 1 AS BIGINT) AS r
  FROM (VALUES {q_values}) AS v(q) CROSS JOIN total
)
SELECT q,
       round(bin * {w!r} + {w!r} * (r - (cum - cnt) - 1) / cnt, 9) AS quantile_est
FROM cum CROSS JOIN targets
WHERE cum >= r AND cum - cnt < r
"""


def histogram_quantiles_keyed(
    sketch: DataFrame,
    *,
    keys: Sequence[str],
    qs: Sequence[float] = DEFAULT_QS,
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-key quantile estimates from a keyed sketch: ``*keys, q,
    quantile_est`` — the keyed form of :func:`histogram_quantiles`,
    with the SAME integer rank arithmetic and within-bin interpolation
    (estimates land within ``bin_width`` of the exact quantile, the
    sketch's hard guarantee).

    The cumulative runs as a window over the per-key bins table —
    <= range/bin_width rows per key by construction, so the window
    partition is sketch-bounded, never data-bounded."""
    from pyspark.sql import Window

    w = float(bin_width)
    spark = sketch.sparkSession
    kcols = list(keys)
    cum_w = (
        Window.partitionBy(*kcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(cum_w).cast("long"))
    totals = sketch.groupBy(*kcols).agg(F.sum("cnt").cast("long").alias("n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    targets = totals.crossJoin(F.broadcast(qdf)).select(
        *kcols, "q", (F.floor(F.col("q") * (F.col("n") - 1)) + 1).cast("long").alias("r")
    )
    return (
        cum.join(targets, kcols)
        .filter((F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("cnt") < F.col("r")))
        .select(
            *kcols,
            "q",
            F.round(
                F.col("bin") * F.lit(w)
                + F.lit(w) * (F.col("r") - (F.col("cum") - F.col("cnt")) - 1) / F.col("cnt"),
                9,
            ).alias("quantile_est"),
        )
    )


def histogram_sketch_keyed(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value: str = "value",
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-key sketch: ``*keys, bin, cnt`` — the keyed form of
    :func:`histogram_sketch`, merging by (keys, bin)-keyed addition.
    One partial-aggregating scan; <= range/bin_width rows PER KEY by
    construction."""
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(
            *keys,
            F.floor(F.col(value) / F.lit(float(bin_width))).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_median_mad(
    sketch: DataFrame,
    *,
    keys: Sequence[str],
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-key robust location/spread ESTIMATES from a keyed sketch:
    ``*keys, med_est, mad_est`` — the mergeable-sketch backing for a
    streaming MAD monitor (:func:`..streaming.pipeline.stream_mad`).

    ``med_est`` follows the :func:`histogram_quantiles` convention
    (rank ``floor(0.5*(n-1)) + 1``, uniform within-bin interpolation) —
    within ``bin_width`` of the exact median.  ``mad_est`` re-bins each
    value bin's MIDPOINT by its distance from ``med_est`` and takes the
    median of that derived deviation histogram — every step is off by
    at most ~1.5 bins, so the estimate is within ``3 * bin_width`` of
    the exact MAD (test-pinned bound; exact batch semantics live in
    ``trend.mad_anomalies``, this is the O(bins)-state live form).

    Scale: cumulative ranks are windows partitioned BY KEY over the
    per-key bin rows (<= range/bin_width each, never corpus-sized).
    """
    from pyspark.sql import Window

    w = float(bin_width)
    kcols = list(keys)

    def _median_est(sk: DataFrame, out: str) -> DataFrame:
        tot = sk.groupBy(*kcols).agg(F.sum("cnt").cast("long").alias("__n"))
        r = (F.floor(F.lit(0.5) * (F.col("__n") - 1)) + 1).cast("long")
        wcum = (
            Window.partitionBy(*kcols)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = sk.select(*kcols, "bin", "cnt", F.sum("cnt").over(wcum).alias("cum"))
        return (
            cum.join(tot.select(*kcols, r.alias("__r")), kcols)
            .filter(
                (F.col("cum") >= F.col("__r"))
                & (F.col("cum") - F.col("cnt") < F.col("__r"))
            )
            .select(
                *kcols,
                (
                    F.col("bin") * F.lit(w)
                    + F.lit(w)
                    * (F.col("__r") - (F.col("cum") - F.col("cnt")) - 1)
                    / F.col("cnt")
                ).alias(out),
            )
        )

    med = _median_est(sketch, "med_est")
    dev = (
        sketch.join(med, kcols)
        .select(
            *kcols,
            "med_est",
            F.floor(
                F.abs(
                    (F.col("bin") * F.lit(w) + F.lit(w / 2.0)) - F.col("med_est")
                )
                / F.lit(w)
            )
            .cast("long")
            .alias("bin"),
            "cnt",
        )
        .groupBy(*kcols, "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    mad = _median_est(dev, "mad_est")
    return med.join(mad, kcols)


def histogram_median_mad_sql(
    table: str,
    *,
    value: str = "value",
    key: str = "event_type",
    bin_width: float = 1.0,
) -> str:
    """DuckDB twin of :func:`histogram_median_mad` over a raw table:
    identical binning, rank and interpolation arithmetic (cumulative
    ranks via per-key window sums; every float literal CAST to DOUBLE —
    a bare 0.5 is DECIMAL in DuckDB and would silently switch the
    arithmetic)."""
    w = f"CAST({float(bin_width)!r} AS DOUBLE)"
    half = f"CAST({float(bin_width) / 2.0!r} AS DOUBLE)"
    est = "c.bin * {w} + {w} * (t.r - (c.cum - c.cnt) - 1) / c.cnt".format(w=w)
    return f"""
WITH sk AS (
  SELECT {key} AS k, CAST(floor({value} / {w}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table} WHERE {value} IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT k, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY k ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM sk
),
tgt AS (
  SELECT k, CAST(floor(CAST(0.5 AS DOUBLE) * (sum(cnt) - 1)) + 1 AS BIGINT) AS r
  FROM sk GROUP BY 1
),
med AS (
  SELECT c.k, {est} AS med_est
  FROM cum c JOIN tgt t ON c.k = t.k AND c.cum >= t.r AND c.cum - c.cnt < t.r
),
dev AS (
  SELECT s.k, CAST(floor(abs((s.bin * {w} + {half}) - m.med_est) / {w}) AS BIGINT) AS bin,
         CAST(sum(cnt) AS BIGINT) AS cnt
  FROM sk s JOIN med m ON s.k = m.k GROUP BY 1, 2
),
dcum AS (
  SELECT k, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY k ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM dev
),
dtgt AS (
  SELECT k, CAST(floor(CAST(0.5 AS DOUBLE) * (sum(cnt) - 1)) + 1 AS BIGINT) AS r
  FROM dev GROUP BY 1
),
mad AS (
  SELECT c.k, {est} AS mad_est
  FROM dcum c JOIN dtgt t ON c.k = t.k AND c.cum >= t.r AND c.cum - c.cnt < t.r
)
SELECT med.k AS {key}, med.med_est, mad.mad_est
FROM med JOIN mad ON med.k = mad.k
"""
