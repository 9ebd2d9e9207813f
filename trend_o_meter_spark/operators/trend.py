"""Trend analytics: regression slope and grid resampling with gap fill.

The reference is a *trend* monitor, but its only trend signal is the
day-binned min/max walk (A3).  These operators complete the timeseries
surface a trend engine needs, Spark-first:

* :func:`trend_slope` — least-squares slope of value vs time per
  (key, bucket).  Computed from the closed-form sums
  ``(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` with exact DECIMAL accumulation, so
  the result is order-insensitive and bit-reproducible (the built-in
  ``regr_slope`` float-sums in shuffle order — fine for analytics,
  unusable for an exact oracle).
* :func:`resample_locf` — tumbling-bucket resample onto a dense time
  grid with last-observation-carried-forward fill for empty buckets.
  The grid is generated per key with ``sequence``+``explode`` (JVM), the
  fill is one ``last(value, ignorenulls)`` window per key — a single
  shuffle keyed by the series key, and the window is incremental (no
  self-join against the grid).

Scale notes: slope sums are classic partial aggregates (map-side
combine); the resample's per-key grid is bounded by span/step — at
100 TB you bound the span per query (retention) exactly like the
reference's 7-day cull, so grids stay small even when raw data is huge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def trend_slope(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-(key, bucket) least-squares slope, in value-units per hour.

    Output: ``*keys, bucket_start, n_samples, slope_per_hour`` (null
    slope when the bucket has < 2 samples or zero time variance).
    """
    bucket = (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).alias(
        "__b"
    )
    # x = INTEGER microseconds since bucket start (decimal(19,0) so
    # DuckDB uses int128, not int64), y = decimal(18,6): x*y and x*x stay
    # inside precision 38 in
    # BOTH engines, so every per-row product and every sum is EXACT (a
    # (38,6)x(38,6) product overflows 38 and the engines degrade
    # differently: Spark truncates scale, DuckDB falls back to double —
    # observed as diverging sums at sf0.1).
    x = (F.unix_micros(F.col(ts)) - F.col("__b") * F.lit(1_000_000)).cast("decimal(19,0)")
    y = F.col(value).cast("decimal(18,6)")
    g = df.withColumn("__b", bucket).groupBy(*keys, "__b").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return trend_slope_from_sums(g, keys=keys)


def trend_slope_from_sums(g: DataFrame, *, keys: Sequence[str] = ("metric",)) -> DataFrame:
    """The closed-form tail of :func:`trend_slope`, taking the exact
    decimal sums table ``*keys, __b, n_samples, sx, sy, sxy, sxx``
    directly — shared with the streaming twin
    (``streaming.pipeline.stream_trend_slope``), whose mergeable
    decimal partials reproduce identical sums (decimal addition is
    associative), so stream == batch bit-for-bit."""
    # sums stay exact (decimal, order-insensitive); the closed form itself
    # runs in double with IDENTICAL operation order in the SQL twin, so
    # both engines produce the same bits (decimal mul/div would hit each
    # engine's different precision-capping rules instead).  The
    # decimal->double conversion goes through a string roundtrip: sums can
    # exceed 17 significant digits, where direct decimal->double casts
    # round differently across engines (1-ulp divergence observed at
    # sf0.1); decimal->string is exact and string->double is correctly
    # rounded IEEE in both.
    def _d(c: str):
        return F.col(c).cast("string").cast("double")

    n = F.col("n_samples").cast("double")
    sx, sy = _d("sx"), _d("sy")
    sxy, sxx = _d("sxy"), _d("sxx")
    denom = n * sxx - sx * sx
    slope_us = (n * sxy - sx * sy) / denom  # value-units per microsecond
    return g.select(
        *keys,
        F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
        "n_samples",
        F.when(denom != 0, F.round(slope_us * 3_600_000_000.0, 9))
        .otherwise(F.lit(None))
        .alias("slope_per_hour"),
    )


def trend_slope_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> str:
    ks = ", ".join(keys)
    return f"""
WITH pre AS (
  SELECT {ks},
         CAST(floor(epoch({ts}) / {bucket_seconds}) * {bucket_seconds} AS BIGINT) AS b,
         CAST(epoch_us({ts})
              - CAST(floor(epoch({ts}) / {bucket_seconds}) * {bucket_seconds} AS BIGINT) * 1000000
              AS DECIMAL(19,0)) AS x,
         CAST({value} AS DECIMAL(18,6)) AS y
  FROM {table}
),
g AS (
  SELECT {ks}, b, count(*) AS n_samples,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy,
         sum(x * x) AS sxx
  FROM pre GROUP BY ALL
)
SELECT {ks}, make_timestamp(b * 1000000) AS bucket_start, n_samples,
       CASE WHEN CAST(n_samples AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) != 0
            THEN round((CAST(n_samples AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                 / (CAST(n_samples AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) * 3600000000.0, 9)
       END AS slope_per_hour
FROM g
"""


def zscore_anomalies(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Samples whose |z| vs their (key, bucket) population exceeds the
    threshold — the alerting query a trend monitor runs.

    Mean/std come from exact decimal Σy/Σy² (order-insensitive) with the
    final algebra in double (identical operand order in the SQL twin).
    Two passes over the bucket (agg + broadcast-joinable stats), one
    shuffle each, both map-side combined.
    """
    b = (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).cast("long")
    # decimal(18,6) keeps y*y inside precision 38 in both engines -> every
    # product and sum is exact (see trend_slope's overflow note)
    y = F.col(value).cast("decimal(18,6)")
    stats = (
        df.withColumn("__b", b)
        .groupBy(*keys, "__b")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(y).alias("__sy"),
            F.sum(y * y).alias("__syy"),
        )
    )
    # string-roundtrip decimal->double: see trend_slope (1-ulp cast
    # divergence on >17-digit sums)
    n = F.col("__n").cast("double")
    sy = F.col("__sy").cast("string").cast("double")
    syy = F.col("__syy").cast("string").cast("double")
    mean = sy / n
    var = (n * syy - sy * sy) / (n * (n - F.lit(1.0)))
    stats = stats.select(
        *keys, "__b", F.col("__n"),
        mean.alias("__mean"),
        F.when(F.col("__n") > 1, F.sqrt(var)).alias("__std"),
    )
    j = df.withColumn("__b", b).join(F.broadcast(stats), [*keys, "__b"])
    z = (F.col(value) - F.col("__mean")) / F.col("__std")
    return (
        j.filter(F.col("__std") > 0)
        .withColumn("z", F.round(z, 9))
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(*keys, F.col(ts), F.col(value), F.round("__mean", 9).alias("bucket_mean"), "z")
    )


def zscore_anomalies_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
    z_threshold: float = 2.0,
) -> str:
    ks = ", ".join(keys)
    return f"""
WITH pre AS (
  SELECT *, CAST(floor(epoch({ts}) / {bucket_seconds}) * {bucket_seconds} AS BIGINT) AS b
  FROM {table}
),
stats AS (
  SELECT {ks}, b, count(*) AS n,
         sum(CAST({value} AS DECIMAL(18,6))) AS sy,
         sum(CAST({value} AS DECIMAL(18,6)) * CAST({value} AS DECIMAL(18,6))) AS syy
  FROM pre GROUP BY ALL
),
enriched AS (
  SELECT {ks}, b,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CASE WHEN n > 1 THEN sqrt((CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS std
  FROM stats
)
SELECT {ks}, p.{ts}, p.{value}, round(e.mean, 9) AS bucket_mean,
       round((p.{value} - e.mean) / e.std, 9) AS z
FROM pre p JOIN enriched e USING ({ks}, b)
WHERE e.std > 0 AND abs(round((p.{value} - e.mean) / e.std, 9)) > {z_threshold}
"""


def resample_locf(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    step_seconds: int = 3600,
) -> DataFrame:
    """Dense tumbling-bucket resample with forward fill.

    Output: ``*keys, bucket_start, mean_value, n_samples, filled_value,
    is_gap`` — one row per key per ``step_seconds`` bucket between each
    key's first and last sample; empty buckets carry the most recent
    bucket mean forward (``is_gap`` true).
    """
    step = step_seconds
    b = (F.floor(F.unix_seconds(F.col(ts)) / step) * step).cast("long")
    # per-key per-bucket mean (exact decimal, order-insensitive)
    agg = (
        df.withColumn("__b", b)
        .groupBy(*keys, "__b")
        .agg(
            # exact decimal sum -> double, THEN divide (both engines'
            # decimal-division scale rules differ; double division with
            # identical operand order matches bit-for-bit)
            (F.sum(F.col(value).cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)))
            .alias("mean_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    # dense grid per key: sequence over the observed bucket span
    span = agg.groupBy(*keys).agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    grid = span.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias("__b"),
    )
    joined = grid.join(agg, [*keys, "__b"], "left")
    w = Window.partitionBy(*keys).orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        *keys,
        F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
        "mean_value",
        F.coalesce(F.col("n_samples"), F.lit(0)).alias("n_samples"),
        F.last("mean_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("mean_value").isNull().alias("is_gap"),
    )


def ewma(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exponentially-weighted moving average per key, time-ascending.

    ``ewma_t = alpha*y_t + (1-alpha)*ewma_{t-1}`` (seeded ``ewma_0 =
    y_0``) — inherently recursive, so (like the exact anchored
    downsample) it runs as an Arrow-batched ``applyInPandas`` scan per
    key: parallel across keys, sequential within one.  The recursion is
    evaluated with EXACTLY the op order ``alpha*y + (1-alpha)*e`` so the
    DuckDB recursive-CTE oracle (:func:`ewma_sql`) reproduces it
    bit-for-bit; on gap-free series it is also bit-identical to pandas
    ``ewm(alpha, adjust=False).mean()`` (same two products, commuted
    addition — pinned by the equivalence test).

    Rows sort by ``(ts, *tiebreak, value)`` within a key; pass a unique
    ``tiebreak`` column (e.g. an event id) to make the walk fully
    deterministic when timestamps can collide.  Output: ``*keys,
    *tiebreak, ts, value, ewma``.

    Null values: a null ``y_t`` emits a null ewma and does NOT advance
    the accumulator (the first NON-null value seeds), mirrored exactly
    by the oracle's CASE-carried accumulator.  A naive ``alpha*NaN +
    ...`` would instead poison every subsequent row of the key.  This
    deliberately DIFFERS from pandas on gapped series: pandas
    ``ignore_na=True`` emits the carried mean at the missing row (ours
    emits NULL so gaps stay visible downstream), and its default
    ``ignore_na=False`` decays weights by absolute position across the
    gap — neither is expressible as the one-term recursion the oracle
    walks.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = [*keys, *tiebreak, ts, value]
    out_schema = StructType(
        [df.schema[c] for c in cols] + [StructField("ewma", DoubleType())]
    )
    one_minus = 1.0 - alpha
    sort_cols = [ts, *tiebreak, value]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        out = pdf[cols].copy()
        acc: list[float | None] = []
        e: float | None = None
        for y in pdf[value].astype("float64"):
            if pd.isna(y):
                acc.append(None)
                continue
            e = y if e is None else alpha * y + one_minus * e
            acc.append(e)
        out["ewma"] = pd.Series(acc, index=out.index, dtype="object")
        return out

    return df.select(*cols).groupBy(*keys).applyInPandas(scan, schema=out_schema)


def ewma_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`ewma`: a recursive CTE stepping ``rn ->
    rn + 1`` per key with the identical double expression
    ``alpha*y + (1-alpha)*e``, so the hashes match without quantization.
    All keys advance in parallel (one frontier row per key per step), so
    the iteration count is the LONGEST single key's row count — bound the
    series span (retention / a time filter) before asking for an exact
    oracle at large SF, same as any sequential-semantics twin."""
    ks = ", ".join(keys)
    out_cols = [*keys, *tiebreak, ts, value]
    sel = ", ".join(out_cols)
    o_sel = ", ".join(f"o.{c}" for c in out_cols)
    order_by = ", ".join([ts, *tiebreak, value])
    join_on = " AND ".join(f"o.{k} = r.{k}" for k in keys)
    a, b = repr(alpha), repr(1.0 - alpha)
    # MATERIALIZED is load-bearing: without it DuckDB re-evaluates the
    # ordered CTE (scan + window) on EVERY recursion step — ~45x slower
    # `acc` carries the last non-null state (null rows emit NULL but do
    # not advance it) — the Python scan's skip-null semantics, exactly
    return f"""
WITH RECURSIVE ordered AS MATERIALIZED (
  SELECT {sel},
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_by}) AS rn
  FROM {table}
),
rec AS (
  SELECT {sel}, rn,
         CAST({value} AS DOUBLE) AS acc,
         CAST({value} AS DOUBLE) AS ewma
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT {o_sel}, o.rn,
         CASE WHEN o.{value} IS NULL THEN r.acc
              WHEN r.acc IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE CAST({a} AS DOUBLE) * o.{value} + CAST({b} AS DOUBLE) * r.acc END,
         CASE WHEN o.{value} IS NULL THEN NULL
              WHEN r.acc IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE CAST({a} AS DOUBLE) * o.{value} + CAST({b} AS DOUBLE) * r.acc END
  FROM ordered o JOIN rec r ON {join_on} AND o.rn = r.rn + 1
)
SELECT {sel}, ewma FROM rec
"""


def resample_locf_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    step_seconds: int = 3600,
) -> str:
    ks = ", ".join(keys)
    step = step_seconds
    return f"""
WITH agg AS (
  SELECT {ks},
         CAST(floor(epoch({ts}) / {step}) * {step} AS BIGINT) AS b,
         CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_value,
         count(*) AS n_samples
  FROM {table} GROUP BY ALL
),
span AS (SELECT {ks}, min(b) AS lo, max(b) AS hi FROM agg GROUP BY ALL),
grid AS (
  SELECT {ks}, unnest(range(lo, hi + {step}, {step})) AS b FROM span
)
SELECT {ks}, make_timestamp(g.b * 1000000) AS bucket_start, a.mean_value,
       coalesce(a.n_samples, 0) AS n_samples,
       last_value(a.mean_value IGNORE NULLS)
         OVER (PARTITION BY {ks} ORDER BY g.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       a.mean_value IS NULL AS is_gap
FROM grid g LEFT JOIN agg a USING ({ks}, b)
"""


def resample_lerp(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    step_seconds: int = 3600,
) -> DataFrame:
    """Dense resample with LINEAR interpolation across gaps.

    Same grid as :func:`resample_locf`; empty buckets interpolate between
    the nearest known bucket means on either side:
    ``prev + (next-prev) * (b-prev_b)/(next_b-prev_b)`` (grid edges are
    observed buckets, so both neighbors always exist).  Interpolated
    values round to 9 decimals — the shared cross-engine float rule.
    Output: ``*keys, bucket_start, mean_value, n_samples, lerp_value,
    is_gap``.

    Scale: two per-key incremental windows (prev/next known sample) over
    the dense grid — O(grid) state, no self-join against known rows.
    """
    step = step_seconds
    b = (F.floor(F.unix_seconds(F.col(ts)) / step) * step).cast("long")
    agg = (
        df.withColumn("__b", b)
        .groupBy(*keys, "__b")
        .agg(
            (F.sum(F.col(value).cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)))
            .alias("mean_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    span = agg.groupBy(*keys).agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    grid = span.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias("__b"),
    )
    joined = grid.join(agg, [*keys, "__b"], "left")
    wp = Window.partitionBy(*keys).orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(*keys).orderBy("__b").rowsBetween(0, Window.unboundedFollowing)
    known_b = F.when(F.col("mean_value").isNotNull(), F.col("__b"))
    pv = F.last("mean_value", ignorenulls=True).over(wp)
    pb = F.last(known_b, ignorenulls=True).over(wp)
    nv = F.first("mean_value", ignorenulls=True).over(wn)
    nb = F.first(known_b, ignorenulls=True).over(wn)
    lerp = F.when(
        F.col("mean_value").isNotNull(), F.col("mean_value")
    ).otherwise(
        F.round(
            pv + (nv - pv) * ((F.col("__b") - pb) / (nb - pb)), 9
        )
    )
    return joined.select(
        *keys,
        F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
        "mean_value",
        F.coalesce(F.col("n_samples"), F.lit(0)).alias("n_samples"),
        lerp.alias("lerp_value"),
        F.col("mean_value").isNull().alias("is_gap"),
    )


def trending_counts(
    df: DataFrame,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Trend detection per key: the newest bucket's event count scored
    against the key's trailing baseline (all earlier buckets in the
    dataset span, empty buckets counted as zero).

    This is the "is X suddenly hot?" query a trend monitor serves —
    positive ``z_score`` = rising, negative = falling, NULL = no
    baseline variance.  Output: ``*keys, bucket_start, current_count,
    n_baseline_buckets, baseline_mean, baseline_std, z_score``.

    Scale: one (key, bucket) hash agg (map-side partial) + per-key
    re-aggregation of the bucketed counts — state is O(keys x active
    buckets), never O(events); the dataset span is a 1-row broadcast.
    Zero-filled buckets are folded out algebraically (zeros add nothing
    to sum or sum-of-squares; only the bucket COUNT needs the span), so
    no dense grid is materialized.  Sums are exact decimal (the
    trend_slope recipe), final algebra in double with identical operand
    order in the SQL twin.
    """
    step = bucket_seconds
    b = (F.floor(F.unix_seconds(F.col(ts)) / step) * step).cast("long")
    counts = df.withColumn("__b", b).groupBy(*keys, "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return score_bucket_counts(counts, keys=keys, bucket_seconds=bucket_seconds)


def score_bucket_counts(
    counts: DataFrame,
    *,
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Score pre-bucketed counts (``*keys, __b, __c``) — the shared tail
    of :func:`trending_counts`, also driven per micro-batch by
    ``streaming.pipeline.stream_trending`` over its counts state table.
    """
    step = bucket_seconds
    span = counts.agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    wc = counts.crossJoin(F.broadcast(span))
    y = F.col("__c").cast("decimal(19,0)")
    base = (
        wc.filter(F.col("__b") < F.col("__hi"))
        .groupBy(*keys)
        .agg(F.sum("__c").alias("__sy"), F.sum(y * y).alias("__syy"))
    )
    cur = (
        wc.filter(F.col("__b") == F.col("__hi"))
        .groupBy(*keys)
        .agg(F.sum("__c").alias("__cc"))
    )
    allk = counts.select(*keys).distinct()
    j = (
        allk.join(base, list(keys), "left")
        .join(cur, list(keys), "left")
        .crossJoin(F.broadcast(span))
    )
    nb = ((F.col("__hi") - F.col("__lo")) / F.lit(step)).cast("long")
    cc = F.coalesce(F.col("__cc"), F.lit(0)).cast("long")
    n = nb.cast("double")
    sy = F.coalesce(F.col("__sy"), F.lit(0)).cast("long").cast("double")
    # string-roundtrip decimal->double: see trend_slope (1-ulp cast
    # divergence on >17-digit sums)
    syy = F.coalesce(F.col("__syy"), F.lit(0).cast("decimal(38,0)")).cast("string").cast("double")
    mean = sy / n
    var = (n * syy - sy * sy) / (n * (n - F.lit(1.0)))
    std = F.when(nb > 1, F.sqrt(var))
    return j.select(
        *keys,
        F.timestamp_seconds(F.col("__hi")).alias("bucket_start"),
        cc.alias("current_count"),
        nb.alias("n_baseline_buckets"),
        F.when(nb > 0, F.round(mean, 9)).alias("baseline_mean"),
        F.round(std, 9).alias("baseline_std"),
        F.when(std > 0, F.round((cc - mean) / std, 9)).alias("z_score"),
    )


def trending_counts_sql(
    table: str,
    *,
    ts: str = "ts",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> str:
    ks = ", ".join(keys)
    step = bucket_seconds
    return f"""
WITH counts AS (
  SELECT {ks}, CAST(floor(epoch({ts}) / {step}) * {step} AS BIGINT) AS b,
         count(*) AS c
  FROM {table} GROUP BY ALL
),
span AS (SELECT min(b) AS lo, max(b) AS hi FROM counts),
base AS (
  SELECT {ks}, CAST(sum(c) AS BIGINT) AS sy,
         sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS syy
  FROM counts, span WHERE b < hi GROUP BY {ks}
),
cur AS (
  SELECT {ks}, CAST(sum(c) AS BIGINT) AS cc
  FROM counts, span WHERE b = hi GROUP BY {ks}
),
allk AS (SELECT DISTINCT {ks} FROM counts),
j AS (
  SELECT {ks},
         CAST((hi - lo) // {step} AS BIGINT) AS nb,
         hi,
         coalesce(cc, 0) AS cc,
         CAST(coalesce(sy, 0) AS DOUBLE) AS syd,
         CAST(CAST(coalesce(syy, CAST(0 AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS syyd
  FROM allk LEFT JOIN base USING ({ks}) LEFT JOIN cur USING ({ks}) CROSS JOIN span
)
SELECT {ks},
       make_timestamp(hi * 1000000) AS bucket_start,
       cc AS current_count,
       nb AS n_baseline_buckets,
       CASE WHEN nb > 0 THEN round(syd / CAST(nb AS DOUBLE), 9) END AS baseline_mean,
       round(CASE WHEN nb > 1 THEN sqrt((CAST(nb AS DOUBLE) * syyd - syd * syd)
                  / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) END, 9) AS baseline_std,
       CASE WHEN (CASE WHEN nb > 1 THEN sqrt((CAST(nb AS DOUBLE) * syyd - syd * syd)
                       / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) END) > 0
            THEN round((cc - syd / CAST(nb AS DOUBLE))
                 / (CASE WHEN nb > 1 THEN sqrt((CAST(nb AS DOUBLE) * syyd - syd * syd)
                         / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))) END), 9)
       END AS z_score
FROM j
"""


def resample_lerp_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    step_seconds: int = 3600,
) -> str:
    ks = ", ".join(keys)
    step = step_seconds
    return f"""
WITH agg AS (
  SELECT {ks},
         CAST(floor(epoch({ts}) / {step}) * {step} AS BIGINT) AS b,
         CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean_value,
         count(*) AS n_samples
  FROM {table} GROUP BY ALL
),
span AS (SELECT {ks}, min(b) AS lo, max(b) AS hi FROM agg GROUP BY ALL),
grid AS (
  SELECT {ks}, unnest(range(lo, hi + {step}, {step})) AS b FROM span
),
j AS (
  SELECT {ks}, g.b, a.mean_value, a.n_samples
  FROM grid g LEFT JOIN agg a USING ({ks}, b)
),
w AS (
  SELECT *,
    last_value(mean_value IGNORE NULLS) OVER wp AS pv,
    last_value(CASE WHEN mean_value IS NOT NULL THEN b END IGNORE NULLS) OVER wp AS pb,
    first_value(mean_value IGNORE NULLS) OVER wn AS nv,
    first_value(CASE WHEN mean_value IS NOT NULL THEN b END IGNORE NULLS) OVER wn AS nb
  FROM j
  WINDOW wp AS (PARTITION BY {ks} ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY {ks} ORDER BY b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT {ks}, make_timestamp(b * 1000000) AS bucket_start, mean_value,
       coalesce(n_samples, 0) AS n_samples,
       CASE WHEN mean_value IS NOT NULL THEN mean_value
            ELSE round(pv + (nv - pv) * ((b - pb) / CAST(nb - pb AS DOUBLE)), 9)
       END AS lerp_value,
       mean_value IS NULL AS is_gap
FROM w
"""


def holt_linear(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    beta: float = 0.1,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Holt's linear-trend smoothing (double exponential smoothing) per
    key, time-ascending — the next member of the smoothing family after
    :func:`ewma` (Holt 1957; Hyndman & Athanasopoulos, "Forecasting:
    Principles and Practice" §8.2):

        level_t = alpha*y_t + (1-alpha)*(level_{t-1} + trend_{t-1})
        trend_t = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}

    seeded ``level = y`` and ``trend = 0.0`` at the first non-null
    sample.  Like :func:`ewma` it is inherently recursive, so it runs as
    an Arrow-batched ``applyInPandas`` scan per key (parallel across
    keys, sequential within one), with the op order pinned EXACTLY so
    the DuckDB recursive-CTE oracle (:func:`holt_linear_sql`) reproduces
    it bit-for-bit.  Null values emit null and do not advance the state
    (the ewma contract).  Output: ``*keys, *tiebreak, ts, value, level,
    trend`` — the one-step forecast is ``level + trend`` by definition,
    derivable downstream.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = [*keys, *tiebreak, ts, value]
    out_schema = StructType(
        [df.schema[c] for c in cols]
        + [StructField("level", DoubleType()), StructField("trend", DoubleType())]
    )
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    sort_cols = [ts, *tiebreak, value]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        out = pdf[cols].copy()
        levels: list[float | None] = []
        trends: list[float | None] = []
        lv: float | None = None
        tr = 0.0
        for y in pdf[value].astype("float64"):
            if pd.isna(y):
                levels.append(None)
                trends.append(None)
                continue
            if lv is None:
                lv, tr = y, 0.0
            else:
                new_lv = alpha * y + one_minus_a * (lv + tr)
                tr = beta * (new_lv - lv) + one_minus_b * tr
                lv = new_lv
            levels.append(lv)
            trends.append(tr)
        out["level"] = pd.Series(levels, index=out.index, dtype="object")
        out["trend"] = pd.Series(trends, index=out.index, dtype="object")
        return out

    return df.select(*cols).groupBy(*keys).applyInPandas(scan, schema=out_schema)


def holt_linear_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    beta: float = 0.1,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`holt_linear`: recursive CTE carrying
    (acc_l, acc_b); the trend update references the new level, which SQL
    cannot let-bind, so the level expression is inlined textually — the
    duplicated subtree computes the identical double, preserving
    bit-exactness.  Same MATERIALIZED + longest-key iteration notes as
    :func:`ewma_sql`."""
    ks = ", ".join(keys)
    out_cols = [*keys, *tiebreak, ts, value]
    sel = ", ".join(out_cols)
    o_sel = ", ".join(f"o.{c}" for c in out_cols)
    order_by = ", ".join([ts, *tiebreak, value])
    join_on = " AND ".join(f"o.{k} = r.{k}" for k in keys)
    a, ia = repr(alpha), repr(1.0 - alpha)
    b, ib = repr(beta), repr(1.0 - beta)
    # the Python scan's `alpha*y + (1-alpha)*(lv+tr)`, textually
    new_l = (
        f"CAST({a} AS DOUBLE) * o.{value} "
        f"+ CAST({ia} AS DOUBLE) * (r.acc_l + r.acc_b)"
    )
    new_b = (
        f"CAST({b} AS DOUBLE) * (({new_l}) - r.acc_l) "
        f"+ CAST({ib} AS DOUBLE) * r.acc_b"
    )
    return f"""
WITH RECURSIVE ordered AS MATERIALIZED (
  SELECT {sel},
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_by}) AS rn
  FROM {table}
),
rec AS (
  SELECT {sel}, rn,
         CAST({value} AS DOUBLE) AS acc_l,
         CASE WHEN {value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS acc_b,
         CAST({value} AS DOUBLE) AS level,
         CASE WHEN {value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS trend
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT {o_sel}, o.rn,
         CASE WHEN o.{value} IS NULL THEN r.acc_l
              WHEN r.acc_l IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE {new_l} END,
         CASE WHEN o.{value} IS NULL THEN r.acc_b
              WHEN r.acc_l IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE {new_b} END,
         CASE WHEN o.{value} IS NULL THEN NULL
              WHEN r.acc_l IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE {new_l} END,
         CASE WHEN o.{value} IS NULL THEN NULL
              WHEN r.acc_l IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE {new_b} END
  FROM ordered o JOIN rec r ON {join_on} AND o.rn = r.rn + 1
)
SELECT {sel}, level, trend FROM rec
"""


def seasonal_decompose(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Seasonal-naive decomposition: each sample splits into the mean of
    its phase bucket (e.g. hour-of-day under the defaults) and a
    residual — the classical seasonal/remainder split a monitor uses to
    spot "high for 3am" rather than "high overall" (additive
    decomposition with a periodic-mean seasonal, Hyndman & A. §3.2;
    trend removal composes via :func:`holt_linear` upstream).

    Phase = ``floor((epoch % period) / bucket)`` — engine-neutral pure
    integer arithmetic, no timezone/calendar functions anywhere.  The
    phase-mean is the exact-decimal-sum-then-double-divide recipe (the
    resample contract).  Null samples carry null seasonal/residual and
    do not pollute the profile.

    Output: ``*keys, ts, <value>, phase, seasonal, residual``.  Scale:
    one partial-aggregating groupBy to a (keys x phases)-row profile —
    KB-sized by construction — broadcast-joined back onto the stream;
    the events table itself is never shuffled.
    """
    phase = F.floor((F.unix_seconds(F.col(ts)) % period_seconds) / bucket_seconds).cast("int")
    tagged = df.select(*keys, F.col(ts), F.col(value), phase.alias("phase"))
    prof = (
        tagged.filter(F.col(value).isNotNull())
        .groupBy(*keys, "phase")
        .agg(
            (F.sum(F.col(value).cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)))
            .alias("seasonal")
        )
    )
    out = tagged.join(F.broadcast(prof), [*keys, "phase"], "left")
    return out.select(
        *keys,
        ts,
        value,
        "phase",
        "seasonal",
        (F.col(value) - F.col("seasonal")).alias("residual"),
    )


def seasonal_decompose_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
) -> str:
    ks = ", ".join(keys)
    join_on = " AND ".join(f"e.{k} = p.{k}" for k in keys)
    e_ks = ", ".join(f"e.{k}" for k in keys)
    phase = (
        f"CAST(floor((epoch({ts}) % {period_seconds}) / {bucket_seconds}) AS INT)"
    )
    e_phase = phase.replace(f"epoch({ts})", f"epoch(e.{ts})")
    return f"""
WITH prof AS (
  SELECT {ks}, {phase} AS phase,
         CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS seasonal
  FROM {table} WHERE {value} IS NOT NULL
  GROUP BY ALL
)
SELECT {e_ks}, e.{ts}, e.{value}, {e_phase} AS phase,
       p.seasonal, e.{value} - p.seasonal AS residual
FROM {table} e LEFT JOIN prof p ON {join_on} AND {e_phase} = p.phase
"""


def _median_mad_profile(
    df: DataFrame, *, value: str, keys: Sequence[str]
) -> DataFrame:
    """Per-key ``*keys, __med, __mad`` calibration profile shared by
    :func:`mad_anomalies` and :func:`cusum_changepoints`.

    One corpus pass: the MAD's ``|v - median|`` counts are REAGGREGATED
    from the median pass's materialized per-(key, value) counts table
    (``abs`` maps each (value, count) row; summing counts reproduces the
    row-level deviation multiset exactly, and the rank decomposition is
    value-duplication-safe) instead of a second scan+groupBy over the
    events — guide §1.2 "don't compute things twice".  The deviation
    double is the same ``abs(v - med)`` IEEE expression the row-level
    form evaluated, so the selected order statistics are bit-identical.
    """
    from .quantiles import exact_quantiles_from_counts, exact_value_counts

    kcols = list(keys)
    counts = exact_value_counts(df.select(*kcols, value), value=value, keys=keys)
    med = exact_quantiles_from_counts(counts, keys=keys, qs=[0.5], out="__med").select(
        *kcols, "__med"
    )
    # F.broadcast(med) bound: `med` is one row per KEY GROUP (metric
    # keys — few and fat by construction, see mad_anomalies' docstring),
    # so the broadcast is O(distinct keys) rows, not O(values).  A
    # caller keying this profile on a high-cardinality column (millions
    # of groups) should drop the hint and let the keyed join plan.
    ad_counts = (
        counts.join(F.broadcast(med), kcols)
        .groupBy(*kcols, F.abs(F.col("__v") - F.col("__med")).alias("__v"))
        .agg(F.sum("__c").cast("long").alias("__c"))
    )
    # cut: the MAD selection's stats/cb/local branches would each
    # re-derive the broadcast-join + reaggregation above (round 14,
    # VERDICT item 8 A/B: cut faster in 7/8 quiet interleaved trials,
    # mad_anomalies ~4.7 -> 4.3 s median).  Unlike the counts-table
    # branches (pinned non-cut in quantiles.py — their duplication is
    # map work over an already-materialized table), this subtree embeds
    # a broadcast build per consumer.  ad_counts is counts-sized, the
    # footprint class already materialized once.
    from .. import lineage

    ad_counts = lineage.cut(ad_counts)
    mad = exact_quantiles_from_counts(
        ad_counts, keys=keys, qs=[0.5], out="__mad"
    ).select(*kcols, "__mad")
    return med.join(mad, kcols)


def mad_anomalies(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust anomaly detection via the modified z-score (Iglewicz &
    Hoaglin 1993): ``0.6745 * (y - median) / MAD`` with the classic
    |z| > 3.5 cut — unlike :func:`zscore_anomalies`, one wild outlier
    cannot inflate the spread estimate and mask the others (50%
    breakdown point vs 0%).

    Exactness: median/MAD use the bucket-decomposed exact-rank
    interpolated quantile (:mod:`..operators.quantiles` — identical
    value to ``percentile`` == ``quantile_cont``, proven bit-exact);
    every emitted double goes through the shared away-from-zero 1e-9
    floor quantization.  A key with MAD = 0 (over half its samples
    identical) yields null z — surfaced, not divided by zero.

    Output: ``*keys, ts, <value>, med, mad, robust_z`` for flagged rows.
    Scale: metric keys are FEW AND FAT by construction, so the medians
    must NOT use Spark's exact ``percentile`` (its aggregation buffer
    is the per-key value multiset — one final-merge task holding every
    sample of the hottest key).  exact_quantiles instead collapses to
    per-(key, value) counts and selects the median ranks through
    per-(key, bucket) running sums — no single task ever holds a key's
    multiset; the resulting O(keys)-row profiles broadcast back and the
    event stream itself is never shuffled.
    """
    c = F.col(value)

    def q9(x: Column) -> Column:
        return (
            F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
            .otherwise(-F.floor(-x * F.lit(1e9) + F.lit(0.5)))
            / F.lit(1e9)
        )

    prof = _median_mad_profile(df, value=value, keys=keys)
    scored = df.join(F.broadcast(prof), list(keys)).withColumn(
        "__rz",
        F.lit(0.6745) * (c - F.col("__med")) / F.nullif(F.col("__mad"), F.lit(0.0)),
    )
    return scored.filter(F.abs(F.col("__rz")) > F.lit(float(z_threshold))).select(
        *keys,
        ts,
        value,
        q9(F.col("__med")).alias("med"),
        q9(F.col("__mad")).alias("mad"),
        q9(F.col("__rz")).alias("robust_z"),
    )


def mad_anomalies_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    z_threshold: float = 3.5,
) -> str:
    ks = ", ".join(keys)
    join1 = " AND ".join(f"t.{k} = m.{k}" for k in keys)
    join2 = " AND ".join(f"d.{k} = a.{k}" for k in keys)
    t_ks = ", ".join(f"t.{k}" for k in keys)
    d_ks = ", ".join(f"d.{k}" for k in keys)

    def q9(x: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1e9 + 0.5) "
            f"ELSE -floor(-({x}) * 1e9 + 0.5) END / 1e9"
        )

    rz = (
        f"CAST(0.6745 AS DOUBLE) * (d.{value} - d.__med) / nullif(a.__mad, 0.0)"
    )
    from .quantiles import exact_quantiles_sql_ctes

    med_ctes = exact_quantiles_sql_ctes(
        table, value=value, keys=keys, qs=[0.5], prefix="__qmed", out="__med"
    )
    mad_ctes = exact_quantiles_sql_ctes(
        "dev", value=f"abs({value} - __med)", keys=keys, qs=[0.5],
        prefix="__qmad", out="__mad",
    )
    return f"""
WITH {med_ctes},
med AS (SELECT {ks}, __med FROM __qmed),
dev AS (
  SELECT {t_ks}, t.{ts}, t.{value}, m.__med
  FROM {table} t JOIN med m ON {join1}
),
{mad_ctes},
mad AS (SELECT {ks}, __mad FROM __qmad),
scored AS (
  SELECT {d_ks}, d.{ts}, d.{value}, d.__med, a.__mad, {rz} AS __rz
  FROM dev d JOIN mad a ON {join2}
)
SELECT {ks}, {ts}, {value},
       {q9('__med')} AS med,
       {q9('__mad')} AS mad,
       {q9('__rz')} AS robust_z
FROM scored WHERE abs(__rz) > CAST({float(z_threshold)} AS DOUBLE)
"""


def theil_sen_slope(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Theil-Sen robust trend estimate per key: the MEDIAN of all
    pairwise slopes between bucket means (Theil 1950 / Sen 1968) plus
    the matching median intercept — up to ~29% contaminated buckets
    cannot drag the estimate, where :func:`trend_slope`'s OLS breaks at
    one wild bucket (the robust sibling, same relation as
    :func:`mad_anomalies` to zscore_anomalies).

    Output: ``*keys, n_buckets, n_pairs, slope_per_hour, intercept``.

    Exactness: bucket means use the exact-decimal recipe; pairwise
    slope arithmetic and the interpolated median are the identical
    double expressions in both engines; emitted doubles go through the
    shared away-from-zero 1e-9 quantization.  Scale: the pairwise join
    runs over BUCKET MEANS, not samples — O((span/bucket)^2) pairs per
    key, bounded by the series span exactly like the retention-bounded
    oracles; the sample stream contributes one partial-aggregating
    groupBy only.
    """
    b = (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).cast("long")
    means = (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys, b.alias("__b"))
        .agg(
            (F.sum(F.col(value).cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)))
            .alias("__m")
        )
    )
    return theil_sen_from_means(means, keys=keys)


def theil_sen_from_means(means: DataFrame, *, keys: Sequence[str] = ("metric",)) -> DataFrame:
    """The estimator core of :func:`theil_sen_slope`, taking the
    per-(key, bucket) means table ``*keys, __b, __m`` directly — shared
    with the streaming twin (``streaming.pipeline.stream_theil_sen``),
    whose mergeable decimal-sum/count partials reproduce the identical
    means, so stream == batch bit-for-bit."""
    l = means.select(*keys, F.col("__b").alias("__b1"), F.col("__m").alias("__m1"))
    r = means.select(*keys, F.col("__b").alias("__b2"), F.col("__m").alias("__m2"))
    pairs = l.join(r, list(keys)).filter(F.col("__b1") < F.col("__b2")).withColumn(
        "__slope",
        (F.col("__m2") - F.col("__m1"))
        / ((F.col("__b2") - F.col("__b1")).cast("double") / F.lit(3600.0)),
    )
    med_slope = pairs.groupBy(*keys).agg(
        F.percentile(F.col("__slope"), F.lit(0.5)).alias("__med_slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    resid = means.join(F.broadcast(med_slope), list(keys)).withColumn(
        "__resid",
        F.col("__m") - F.col("__med_slope") * (F.col("__b").cast("double") / F.lit(3600.0)),
    )

    def q9(x: Column) -> Column:
        return (
            F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
            .otherwise(-F.floor(-x * F.lit(1e9) + F.lit(0.5)))
            / F.lit(1e9)
        )

    return (
        resid.groupBy(*keys, "__med_slope", "n_pairs")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.percentile(F.col("__resid"), F.lit(0.5)).alias("__icpt"),
        )
        .select(
            *keys,
            "n_buckets",
            "n_pairs",
            q9(F.col("__med_slope")).alias("slope_per_hour"),
            q9(F.col("__icpt")).alias("intercept"),
        )
    )


def theil_sen_slope_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    bucket_seconds: int = 86400,
) -> str:
    ks = ", ".join(keys)
    join_k = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    l_ks = ", ".join(f"l.{k}" for k in keys)
    m_join = " AND ".join(f"m.{k} = s.{k}" for k in keys)
    m_ks = ", ".join(f"m.{k}" for k in keys)

    def q9(x: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1e9 + 0.5) "
            f"ELSE -floor(-({x}) * 1e9 + 0.5) END / 1e9"
        )

    return f"""
WITH means AS (
  SELECT {ks},
         CAST(floor(epoch({ts}) / {bucket_seconds}) * {bucket_seconds} AS BIGINT) AS __b,
         CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS __m
  FROM {table} WHERE {value} IS NOT NULL GROUP BY ALL
),
pairs AS (
  SELECT {l_ks}, (r.__m - l.__m) / ((r.__b - l.__b) / CAST(3600.0 AS DOUBLE)) AS __slope
  FROM means l JOIN means r ON {join_k} AND l.__b < r.__b
),
slopes AS (
  SELECT {ks}, quantile_cont(__slope, 0.5) AS __med_slope,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY ALL
),
resid AS (
  SELECT {m_ks}, s.__med_slope, s.n_pairs,
         m.__m - s.__med_slope * (m.__b / CAST(3600.0 AS DOUBLE)) AS __resid
  FROM means m JOIN slopes s ON {m_join}
)
SELECT {ks}, CAST(count(*) AS BIGINT) AS n_buckets, n_pairs,
       {q9('__med_slope')} AS slope_per_hour,
       {q9('quantile_cont(__resid, 0.5)')} AS intercept
FROM resid GROUP BY {ks}, __med_slope, n_pairs
"""


def cusum_changepoints(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    k_mult: float = 0.5,
    h_mult: float = 4.0,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Tabular CUSUM changepoint detection per key (Page 1954; NIST/
    SEMATECH e-Handbook §6.3.2.3), robust-calibrated: the target is the
    per-key MEDIAN and the slack/decision parameters are multiples of
    the per-key MAD (``k = k_mult*MAD``, ``h = h_mult*MAD``) — so one
    wild outlier can't move the calibration the way a mean/stddev CUSUM
    lets it (the same robustness story as :func:`mad_anomalies`, which
    flags POINT outliers where this accumulates small persistent SHIFTS
    a point test never sees):

        s_pos_t = max(0, s_pos_{t-1} + (y_t - med - k))
        s_neg_t = max(0, s_neg_{t-1} + (med - y_t - k))

    with an alarm when either side exceeds ``h``; on alarm both sides
    reset to 0 (the standard restart, so successive changepoints are
    each detected).  ``direction`` is ``'up'`` when the positive side
    fired (pinned precedence if both did), ``'down'`` otherwise.

    Null values emit null state/alarm and do not advance the recursion
    (the :func:`ewma` contract).  A key with MAD = 0 degenerates to
    ``k = h = 0`` — any deviation from the median alarms immediately
    (documented, deterministic in both engines).

    Exactness: median/MAD come from the bucket-decomposed exact-rank
    quantile (bit-equal to ``quantile_cont``); the recursion is pinned
    left-to-right (``carry + ((y - med) - k)`` under ``max(0.0, .)``)
    and reproduced textually by the DuckDB recursive-CTE oracle
    (:func:`cusum_changepoints_sql`), so the accumulators are bit-exact
    cross-engine; emitted doubles pass the shared away-from-zero 1e-9
    quantization.  Output: ``*keys, *tiebreak, ts, <value>, s_pos,
    s_neg, alarm, direction`` — every row, accumulators included, so
    downstream can plot the trajectory, not just the alarms.

    Scale: calibration is two O(keys)-row broadcast profiles (the event
    stream is never shuffled for it); the scan is an Arrow-batched
    ``applyInPandas`` per key — parallel across keys, sequential within
    one, the same shape as :func:`ewma`/:func:`holt_linear` (inherently
    recursive; bounded per key by the retention contract).
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    prof = _median_mad_profile(df, value=value, keys=keys)
    src = df.join(F.broadcast(prof), list(keys))

    cols = [*keys, *tiebreak, ts, value]
    out_schema = StructType(
        [df.schema[c2] for c2 in cols]
        + [
            StructField("s_pos", DoubleType()),
            StructField("s_neg", DoubleType()),
            StructField("alarm", BooleanType()),
            StructField("direction", StringType()),
        ]
    )
    sort_cols = [ts, *tiebreak, value]
    km, hm = float(k_mult), float(h_mult)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        out = pdf[cols].copy()
        med_v = float(pdf["__med"].iloc[0])
        mad_v = float(pdf["__mad"].iloc[0])
        k = km * mad_v
        h = hm * mad_v
        sps: list[float | None] = []
        sns: list[float | None] = []
        alarms: list[bool | None] = []
        dirs: list[str | None] = []
        sp = sn = 0.0
        for y in pdf[value].astype("float64"):
            if pd.isna(y):
                sps.append(None)
                sns.append(None)
                alarms.append(None)
                dirs.append(None)
                continue
            spr = max(0.0, sp + ((y - med_v) - k))
            snr = max(0.0, sn + ((med_v - y) - k))
            alarm = spr > h or snr > h
            sps.append(spr)
            sns.append(snr)
            alarms.append(alarm)
            dirs.append(("up" if spr > h else "down") if alarm else None)
            if alarm:
                sp = sn = 0.0
            else:
                sp, sn = spr, snr
        out["s_pos"] = pd.Series(sps, index=out.index, dtype="object")
        out["s_neg"] = pd.Series(sns, index=out.index, dtype="object")
        out["alarm"] = pd.Series(alarms, index=out.index, dtype="object")
        out["direction"] = pd.Series(dirs, index=out.index, dtype="object")
        return out

    def q9(x):
        return (
            F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
            .otherwise(-F.floor(-x * F.lit(1e9) + F.lit(0.5)))
            / F.lit(1e9)
        )

    scanned = (
        src.select(*cols, "__med", "__mad")
        .groupBy(*keys)
        .applyInPandas(scan, schema=out_schema)
    )
    return scanned.select(
        *cols,
        q9(F.col("s_pos")).alias("s_pos"),
        q9(F.col("s_neg")).alias("s_neg"),
        "alarm",
        "direction",
    )


def cusum_changepoints_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    k_mult: float = 0.5,
    h_mult: float = 4.0,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`cusum_changepoints`: the same exact-rank
    median/MAD CTEs, then a recursive CTE carrying the post-reset
    (sp_c, sn_c) pair; the raw-side expressions are inlined textually
    everywhere they're referenced (SQL cannot let-bind), computing the
    identical IEEE doubles — the :func:`holt_linear_sql` discipline."""
    from .quantiles import exact_quantiles_sql_ctes

    ks = ", ".join(keys)
    join1 = " AND ".join(f"t.{k} = m.{k}" for k in keys)
    join2 = " AND ".join(f"d.{k} = a.{k}" for k in keys)
    t_ks = ", ".join(f"t.{k}" for k in keys)
    d_ks = ", ".join(f"d.{k}" for k in keys)
    out_cols = [*keys, *tiebreak, ts, value]
    sel = ", ".join(out_cols)
    o_sel = ", ".join(f"o.{c}" for c in out_cols)
    order_by = ", ".join([ts, *tiebreak, value])
    join_on = " AND ".join(f"o.{k} = r.{k}" for k in keys)
    km = f"CAST({float(k_mult)!r} AS DOUBLE)"
    hm = f"CAST({float(h_mult)!r} AS DOUBLE)"

    def q9(x: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1e9 + 0.5) "
            f"ELSE -floor(-({x}) * 1e9 + 0.5) END / 1e9"
        )

    med_ctes = exact_quantiles_sql_ctes(
        table, value=value, keys=keys, qs=[0.5], prefix="__qmed", out="__med"
    )
    mad_ctes = exact_quantiles_sql_ctes(
        "dev", value=f"abs({value} - __med)", keys=keys, qs=[0.5],
        prefix="__qmad", out="__mad",
    )
    zero = "CAST(0.0 AS DOUBLE)"
    # base-case raws: carry = 0.0, textually the Python seed
    spr0 = f"greatest({zero}, {zero} + (({value} - __med) - __k))"
    snr0 = f"greatest({zero}, {zero} + ((__med - {value}) - __k))"
    alarm0 = f"(({spr0}) > __h OR ({snr0}) > __h)"
    # recursive-step raws against the carried state
    spr = f"greatest({zero}, r.sp_c + ((o.{value} - o.__med) - o.__k))"
    snr = f"greatest({zero}, r.sn_c + ((o.__med - o.{value}) - o.__k))"
    alarm = f"(({spr}) > o.__h OR ({snr}) > o.__h)"
    return f"""
WITH RECURSIVE {med_ctes},
med AS (SELECT {ks}, __med FROM __qmed),
dev AS (
  SELECT {t_ks}, t.{ts}, t.{value}, m.__med
  FROM {table} t JOIN med m ON {join1}
),
{mad_ctes},
params AS (
  SELECT {ks}, __med, {km} * __mad AS __k, {hm} * __mad AS __h
  FROM (SELECT {ks}, __mad FROM __qmad) a JOIN med USING ({ks})
),
ordered AS MATERIALIZED (
  SELECT {sel}, p.__med, p.__k, p.__h,
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_by}) AS rn
  FROM {table} JOIN params p USING ({ks})
),
rec AS (
  SELECT {sel}, __med, __k, __h, rn,
         CASE WHEN {value} IS NULL THEN {zero}
              WHEN {alarm0} THEN {zero} ELSE {spr0} END AS sp_c,
         CASE WHEN {value} IS NULL THEN {zero}
              WHEN {alarm0} THEN {zero} ELSE {snr0} END AS sn_c,
         CASE WHEN {value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE {spr0} END AS s_pos,
         CASE WHEN {value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE {snr0} END AS s_neg,
         CASE WHEN {value} IS NULL THEN CAST(NULL AS BOOLEAN)
              ELSE {alarm0} END AS alarm,
         CASE WHEN {value} IS NULL OR NOT {alarm0} THEN CAST(NULL AS VARCHAR)
              WHEN ({spr0}) > __h THEN 'up' ELSE 'down' END AS direction
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT {o_sel}, o.__med, o.__k, o.__h, o.rn,
         CASE WHEN o.{value} IS NULL THEN r.sp_c
              WHEN {alarm} THEN {zero} ELSE {spr} END,
         CASE WHEN o.{value} IS NULL THEN r.sn_c
              WHEN {alarm} THEN {zero} ELSE {snr} END,
         CASE WHEN o.{value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE {spr} END,
         CASE WHEN o.{value} IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE {snr} END,
         CASE WHEN o.{value} IS NULL THEN CAST(NULL AS BOOLEAN)
              ELSE {alarm} END,
         CASE WHEN o.{value} IS NULL OR NOT {alarm} THEN CAST(NULL AS VARCHAR)
              WHEN ({spr}) > o.__h THEN 'up' ELSE 'down' END
  FROM ordered o JOIN rec r ON {join_on} AND o.rn = r.rn + 1
)
SELECT {sel},
       {q9('s_pos')} AS s_pos,
       {q9('s_neg')} AS s_neg,
       alarm, direction
FROM rec
"""


def holt_winters(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing per key — the smoothing
    family's third member (Winters 1960; Hyndman & Athanasopoulos §8.3)
    after :func:`ewma` (level) and :func:`holt_linear` (level+trend),
    adding a ``period/bucket``-slot seasonal state indexed by the
    sample's integer phase (hour-of-day under the defaults):

        level_t  = alpha*(y_t - s[ph]) + (1-alpha)*(level + trend)
        trend_t  = beta*(level_t - level) + (1-beta)*trend
        s[ph]    = gamma*(y_t - level_t) + (1-gamma)*s[ph]

    seeded ``level = y, trend = 0`` at the first non-null sample with
    the seasonal slots all 0.0 (the additive-identity seed: the profile
    is LEARNED from the stream, converging at rate gamma — documented
    divergence from textbook first-season averaging, which needs a
    second pass).  Unlike :func:`seasonal_decompose`'s static phase
    means, the profile here ADAPTS — a seasonal shape that changes
    mid-stream is tracked, not averaged away.

    Null values emit null and do not advance (the :func:`ewma`
    contract).  Phase uses the engine-neutral integer arithmetic of
    :func:`seasonal_decompose`.  Output: ``*keys, *tiebreak, ts,
    <value>, level, trend, seasonal`` (the slot value AFTER this
    sample's update); the one-step forecast is ``level + trend +
    s[next phase]`` downstream.

    Exactness: op order pinned so the DuckDB recursive-CTE oracle
    (:func:`holt_winters_sql`) — which carries the seasonal state as a
    LIST column updated by a single-slot comprehension — reproduces
    every double bit-for-bit.  Scale: the :func:`holt_linear`
    applyInPandas shape; per-key state is O(period/bucket) floats.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    m = int(period_seconds // bucket_seconds)
    if m < 1:
        raise ValueError("period_seconds must be >= bucket_seconds")
    cols = [*keys, *tiebreak, ts, value]
    out_schema = StructType(
        [df.schema[c] for c in cols]
        + [
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
        ]
    )
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta
    one_minus_g = 1.0 - gamma
    sort_cols = [ts, *tiebreak, value]
    ph = (
        F.floor((F.unix_seconds(F.col(ts)) % period_seconds) / bucket_seconds)
        .cast("long")
        .alias("__ph")
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        out = pdf[cols].copy()
        levels: list[float | None] = []
        trends: list[float | None] = []
        seas: list[float | None] = []
        lv: float | None = None
        tr = 0.0
        s = [0.0] * m
        # A NULL ts has no phase: treat it exactly like a NULL value —
        # emit null, don't advance state (pre-fix this raised int(NaN)
        # here while the DuckDB twin NULL-poisoned its carried state via
        # acc_s[NULL]; both engines now agree on the same input).
        for y, p in zip(pdf[value].astype("float64"), pdf["__ph"]):
            if pd.isna(y) or pd.isna(p):
                levels.append(None)
                trends.append(None)
                seas.append(None)
                continue
            p = int(p)
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
        out["level"] = pd.Series(levels, index=out.index, dtype="object")
        out["trend"] = pd.Series(trends, index=out.index, dtype="object")
        out["seasonal"] = pd.Series(seas, index=out.index, dtype="object")
        return out

    return (
        df.select(*cols, ph).groupBy(*keys).applyInPandas(scan, schema=out_schema)
    )


def holt_winters_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    keys: Sequence[str] = ("metric",),
    alpha: float = 0.2,
    beta: float = 0.1,
    gamma: float = 0.3,
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`holt_winters`: the :func:`holt_linear_sql`
    recursion carrying an extra LIST-typed seasonal state, updated by a
    one-slot list comprehension; every raw expression is inlined
    textually at each reference (level inside trend/seasonal, seasonal
    inside the carried list), computing the identical IEEE doubles."""
    m = int(period_seconds // bucket_seconds)
    ks = ", ".join(keys)
    out_cols = [*keys, *tiebreak, ts, value]
    sel = ", ".join(out_cols)
    o_sel = ", ".join(f"o.{c}" for c in out_cols)
    order_by = ", ".join([ts, *tiebreak, value])
    join_on = " AND ".join(f"o.{k} = r.{k}" for k in keys)
    a, ia = repr(float(alpha)), repr(1.0 - float(alpha))
    b, ib = repr(float(beta)), repr(1.0 - float(beta))
    g, ig = repr(float(gamma)), repr(1.0 - float(gamma))
    zeros = f"[CAST(0.0 AS DOUBLE) FOR x IN range(1, {m} + 1)]"
    slot = "r.acc_s[CAST(o.__ph + 1 AS INT)]"
    new_l = (
        f"CAST({a} AS DOUBLE) * (o.{value} - {slot}) "
        f"+ CAST({ia} AS DOUBLE) * (r.acc_l + r.acc_b)"
    )
    new_b = (
        f"CAST({b} AS DOUBLE) * (({new_l}) - r.acc_l) "
        f"+ CAST({ib} AS DOUBLE) * r.acc_b"
    )
    new_s = (
        f"CAST({g} AS DOUBLE) * (o.{value} - ({new_l})) "
        f"+ CAST({ig} AS DOUBLE) * {slot}"
    )
    new_list = (
        f"[CASE WHEN x = CAST(o.__ph + 1 AS INT) THEN {new_s} "
        f"ELSE r.acc_s[x] END FOR x IN range(1, {m} + 1)]"
    )
    # A NULL ts has no phase slot: skip it exactly like a NULL value
    # (emit null, carry state unchanged) — mirrors the pandas scan's
    # isna(__ph) gate; pre-fix `acc_s[NULL]` NULL-poisoned the carried
    # level/trend here while the pandas side raised.
    skip0 = f"({value} IS NULL OR __ph IS NULL)"
    skip = f"(o.{value} IS NULL OR o.__ph IS NULL)"
    return f"""
WITH RECURSIVE ordered AS MATERIALIZED (
  SELECT {sel},
         CAST(floor((epoch({ts}) % {period_seconds}) / {bucket_seconds}) AS BIGINT) AS __ph,
         row_number() OVER (PARTITION BY {ks} ORDER BY {order_by}) AS rn
  FROM {table}
),
rec AS (
  SELECT {sel}, __ph, rn,
         CASE WHEN {skip0} THEN CAST(NULL AS DOUBLE)
              ELSE CAST({value} AS DOUBLE) END AS acc_l,
         CASE WHEN {skip0} THEN CAST(NULL AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS acc_b,
         {zeros} AS acc_s,
         CASE WHEN {skip0} THEN CAST(NULL AS DOUBLE)
              ELSE CAST({value} AS DOUBLE) END AS level,
         CASE WHEN {skip0} THEN CAST(NULL AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS trend,
         CASE WHEN {skip0} THEN CAST(NULL AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS seasonal
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT {o_sel}, o.__ph, o.rn,
         CASE WHEN {skip} THEN r.acc_l
              WHEN r.acc_l IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE {new_l} END,
         CASE WHEN {skip} THEN r.acc_b
              WHEN r.acc_l IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE {new_b} END,
         CASE WHEN {skip} OR r.acc_l IS NULL THEN r.acc_s
              ELSE {new_list} END,
         CASE WHEN {skip} THEN CAST(NULL AS DOUBLE)
              WHEN r.acc_l IS NULL THEN CAST(o.{value} AS DOUBLE)
              ELSE {new_l} END,
         CASE WHEN {skip} THEN CAST(NULL AS DOUBLE)
              WHEN r.acc_l IS NULL THEN CAST(0.0 AS DOUBLE)
              ELSE {new_b} END,
         CASE WHEN {skip} THEN CAST(NULL AS DOUBLE)
              WHEN r.acc_l IS NULL THEN {slot}
              ELSE {new_s} END
  FROM ordered o JOIN rec r ON {join_on} AND o.rn = r.rn + 1
)
SELECT {sel}, level, trend, seasonal FROM rec
"""


def metric_correlation(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    metric_col: str = "metric",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairwise Pearson correlation between metrics over time-aligned
    bucket totals — the cross-metric monitoring signal ("do errors and
    latency move together hour-by-hour?") none of the per-metric
    operators can see.  For every metric pair (a < b), over the buckets
    BOTH metrics have samples in:

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Exactness (the :func:`trend_slope` integer discipline, taken one
    step further — no float appears until the final closed form): each
    sample quantizes to exact BIGINT micro-units via
    ``DECIMAL(18,6) * 1e6`` (integral by construction, no rounding
    rule invoked in either engine); bucket totals are BIGINT sums;
    the five Pearson sums accumulate as DECIMAL(38,0) with per-pair
    products computed at DECIMAL(19,0) x DECIMAL(19,0) (inside
    precision 38 — a wider product overflows and the engines degrade
    differently); the closed form runs in doubles converted through
    the exact string roundtrip with identical op order, and a
    zero-variance side yields explicit NULL (also guarding DuckDB's
    erroring sqrt against a rounded-negative zero).  Final r passes
    the shared 1e-9 quantization.

    Output: ``metric_a, metric_b, n_buckets, corr``.  Scale: one
    (metric, bucket) partial-aggregating shuffle over the stream, then
    all joins/aggregates run on the O(metrics x span/bucket) totals
    table — pairs are metrics^2, fine for monitoring cardinalities
    (document a metric allowlist upstream if metrics are unbounded).
    """
    b = (F.floor(F.unix_seconds(F.col(ts)) / bucket_seconds) * bucket_seconds).cast(
        "long"
    )
    yq = (F.col(value).cast("decimal(18,6)") * F.lit(1000000)).cast("long")
    tot = (
        df.filter(F.col(value).isNotNull())
        .groupBy(F.col(metric_col).alias("__m"), b.alias("__b"))
        .agg(F.sum(yq).cast("long").alias("__t"))
    )
    return metric_correlation_from_totals(tot)


def metric_correlation_from_totals(tot: DataFrame) -> DataFrame:
    """The pairing + Pearson tail of :func:`metric_correlation`, taking
    the exact BIGINT totals table ``__m, __b, __t`` directly — shared
    with the streaming twin (``streaming.pipeline
    .stream_metric_correlation``), whose mergeable integer partials
    reproduce identical totals, so stream == batch bit-for-bit."""
    l = tot.select(
        F.col("__m").alias("metric_a"), "__b", F.col("__t").alias("__xa")
    )
    r = tot.select(
        F.col("__m").alias("metric_b"), "__b", F.col("__t").alias("__xb")
    )
    paired = l.join(r, "__b").filter(F.col("metric_a") < F.col("metric_b"))
    d19 = "decimal(19,0)"
    g = paired.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("__xa").cast(d19)).cast("decimal(38,0)").alias("__sx"),
        F.sum(F.col("__xb").cast(d19)).cast("decimal(38,0)").alias("__sy"),
        F.sum(F.col("__xa").cast(d19) * F.col("__xb").cast(d19))
        .cast("decimal(38,0)")
        .alias("__sxy"),
        F.sum(F.col("__xa").cast(d19) * F.col("__xa").cast(d19))
        .cast("decimal(38,0)")
        .alias("__sxx"),
        F.sum(F.col("__xb").cast(d19) * F.col("__xb").cast(d19))
        .cast("decimal(38,0)")
        .alias("__syy"),
    )

    def _d(c: str):
        return F.col(c).cast("string").cast("double")

    n = F.col("n_buckets").cast("double")
    sx, sy = _d("__sx"), _d("__sy")
    sxy, sxx, syy = _d("__sxy"), _d("__sxx"), _d("__syy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = (n * sxy - sx * sy) / F.sqrt(vx * vy)

    def q9(x):
        return (
            F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
            .otherwise(-F.floor(-x * F.lit(1e9) + F.lit(0.5)))
            / F.lit(1e9)
        )

    return g.select(
        "metric_a",
        "metric_b",
        "n_buckets",
        F.when((vx > 0) & (vy > 0), q9(corr)).alias("corr"),
    )


def metric_correlation_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    metric_col: str = "metric",
    bucket_seconds: int = 3600,
) -> str:
    def d(c: str) -> str:
        return f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"

    def q9(x: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1e9 + 0.5) "
            f"ELSE -floor(-({x}) * 1e9 + 0.5) END / 1e9"
        )

    n = "CAST(n_buckets AS DOUBLE)"
    vx = f"({n} * {d('__sxx')} - {d('__sx')} * {d('__sx')})"
    vy = f"({n} * {d('__syy')} - {d('__sy')} * {d('__sy')})"
    corr = f"({n} * {d('__sxy')} - {d('__sx')} * {d('__sy')}) / sqrt({vx} * {vy})"
    return f"""
WITH tot AS (
  SELECT {metric_col} AS __m,
         CAST(floor(epoch({ts}) / {bucket_seconds}) * {bucket_seconds} AS BIGINT) AS __b,
         CAST(sum(CAST(CAST({value} AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS __t
  FROM {table} WHERE {value} IS NOT NULL GROUP BY 1, 2
),
paired AS (
  SELECT l.__m AS metric_a, r.__m AS metric_b, l.__t AS __xa, r.__t AS __xb
  FROM tot l JOIN tot r ON l.__b = r.__b AND l.__m < r.__m
),
g AS (
  SELECT metric_a, metric_b,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CAST(__xa AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS __sx,
         CAST(sum(CAST(__xb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS __sy,
         CAST(sum(CAST(__xa AS DECIMAL(19,0)) * CAST(__xb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS __sxy,
         CAST(sum(CAST(__xa AS DECIMAL(19,0)) * CAST(__xa AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS __sxx,
         CAST(sum(CAST(__xb AS DECIMAL(19,0)) * CAST(__xb AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS __syy
  FROM paired GROUP BY 1, 2
)
SELECT metric_a, metric_b, n_buckets,
       CASE WHEN {vx} > 0 AND {vy} > 0 THEN {q9(corr)} END AS corr
FROM g
"""
