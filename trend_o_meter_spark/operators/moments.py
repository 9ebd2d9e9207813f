"""Mergeable moments sketch: exact power sums -> mean/variance/skew/kurtosis.

The FOURTH mergeable-sketch family next to HLL (distinct counts), CMS
(frequencies, :mod:`.cms`), and the fixed-grid histogram (quantiles,
:mod:`.histogram`): distribution SHAPE statistics with exactly-mergeable
partials.  ``df.agg(skewness(...))`` answers a one-shot batch query, but
its internal accumulator (central-moment running state) is
engine-private float math — partials cannot be persisted, merged across
shards/micro-batches, or checked bit-for-bit against an oracle.  Power
sums can:

* the sketch is one row per key holding ``(n, s1, s2, s3, s4)`` where
  ``s_k = sum(q^k)`` over quantized values ``q = round(value * scale)``
  — EXACT integers (BIGINT per-row powers, DECIMAL(38,0) sums), so
  shard/micro-batch partials merge by plain keyed addition
  (:func:`moments_merge`) losslessly and order-free, the same property
  CMS grids and histogram bins have;
* the derived statistics are a fixed float expression over those exact
  sums (only +,-,*,/ and sqrt — each IEEE-correctly-rounded, applied in
  the identical order by the DuckDB oracle), so the result is
  bit-deterministic cross-engine: hash-exact, unlike the engine-private
  ``skewness``/``kurtosis`` accumulators (rows-only by design in
  ``approx_sketches``);
* quantization is the only approximation and it is a hard bound:
  ``|value - q/scale| <= 1/(2*scale)`` per value, zero for data with at
  most ``log10(scale)`` decimal places (the events table's 2-decimal
  values are EXACT at the default ``scale=100``).

Overflow discipline (the reason for the BIGINT->DECIMAL ladder):
``q^2`` stays in BIGINT (|q| <= ~3e9 is safe), ``q^3``/``q^4`` promote
one factor to DECIMAL(20,0) so the product lands in DECIMAL(38,0)
without precision-cap rounding; sums accumulate in DECIMAL(38,0).
Safe for |value| * scale up to ~10^9 per row and ~10^16 rows.  The
DuckDB twin uses HUGEINT (int128) for the same exactness.

Scale: the sketch is ONE row per key whatever the corpus size; merges
are keyed additions (map-side partial aggregation applies); the stats
projection is per-row arithmetic on the sketch — nothing rescans data.

Kurtosis is the EXCESS form (normal -> 0.0), matching
``pyspark.sql.functions.kurtosis``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 100


def moments_sketch(
    df: DataFrame,
    *,
    value: str = "value",
    keys: tuple[str, ...] = (),
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """One scan -> per-key partial ``(*keys, n, s1, s2, s3, s4)``.

    Null values are excluded (they contribute to no moment).
    """
    q = F.round(F.col(value) * F.lit(scale)).cast("long")
    rows = (
        df.filter(F.col(value).isNotNull())
        .withColumn("__q", q)
        .withColumn("__q2", F.col("__q") * F.col("__q"))
    )
    q2_wide = F.col("__q2").cast("decimal(20,0)")
    return rows.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__q").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("__q2").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2"),
        F.sum(q2_wide * F.col("__q")).cast("decimal(38,0)").alias("s3"),
        F.sum(q2_wide * F.col("__q2")).cast("decimal(38,0)").alias("s4"),
    )


def moments_merge(*sketches: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """Keyed addition of exact power sums — partials of shards merge
    losslessly into the partial of the union (test-pinned, same contract
    as :func:`..operators.cms.cms_merge` / histogram_merge)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        *[F.sum(c).cast("decimal(38,0)").alias(c) for c in ("s1", "s2", "s3", "s4")],
    )


def moments_stats(
    sketch: DataFrame, *, keys: tuple[str, ...] = (), scale: int = DEFAULT_SCALE
) -> DataFrame:
    """Sketch -> ``(*keys, n, mean, std, skew, kurt)``.

    Population (biased) forms, in quantized units then de-scaled:
    ``var_q = m2 - m1^2``, ``skew = (m3 - 3 m1 m2 + 2 m1^3) / var_q^1.5``,
    ``kurt = (m4 - 4 m1 m3 + 6 m1^2 m2 - 3 m1^4) / var_q^2 - 3`` where
    ``m_k = s_k / n``.  Zero-variance keys emit NULL skew/kurt (the
    statistics are undefined there) — explicitly, identically in the
    oracle, rather than an engine-specific 0/0 artifact.

    Every float op (including the DECIMAL->DOUBLE conversions, routed
    through strings per the registry discipline) appears in the same
    order as the SQL twin, so values match bit-for-bit.
    """
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("string").cast("double") / nd
    m2 = F.col("s2").cast("string").cast("double") / nd
    m3 = F.col("s3").cast("string").cast("double") / nd
    m4 = F.col("s4").cast("string").cast("double") / nd
    var_q = m2 - m1 * m1
    sc = F.lit(float(scale))
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / (
        var_q * F.sqrt(var_q)
    )
    kurt = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / (var_q * var_q) - F.lit(3.0)
    # var_q is >= 0 mathematically (Cauchy-Schwarz over exact sums) but
    # float cancellation can land an exactly-constant key at ~-1e-10;
    # both engines compute the identical double, so the guard branches
    # identically — and DuckDB's sqrt ERRORS on negatives, so the guard
    # is load-bearing there, not cosmetic.
    return sketch.select(
        *keys,
        F.col("n"),
        (m1 / sc).alias("mean"),
        F.when(var_q >= 0, F.sqrt(var_q) / sc).alias("std"),
        F.when(var_q > 0, skew).alias("skew"),
        F.when(var_q > 0, kurt).alias("kurt"),
    )


def moments_stats_sql(
    table: str,
    *,
    value: str = "value",
    keys: tuple[str, ...] = (),
    scale: int = DEFAULT_SCALE,
    where: str = "",
) -> str:
    """DuckDB twin: identical quantization, HUGEINT-exact power sums,
    and the same float expression order (the accumulation mechanism —
    hugeint vs decimal — differs; exact integers make that invisible)."""
    kcols = ", ".join(keys)
    ksel = f"{kcols}, " if keys else ""
    group = f"GROUP BY {kcols}" if keys else ""
    wc = f"AND ({where})" if where else ""
    sc = float(scale)
    return f"""
WITH q AS (
  SELECT {ksel}CAST(round({value} * {scale}) AS BIGINT) AS q
  FROM {table} WHERE {value} IS NOT NULL {wc}
),
sk AS (
  SELECT {ksel}CAST(count(*) AS BIGINT) AS n,
         sum(CAST(q AS HUGEINT)) AS s1,
         sum(CAST(q AS HUGEINT) * q) AS s2,
         sum(CAST(q AS HUGEINT) * q * q) AS s3,
         sum(CAST(q AS HUGEINT) * q * q * q) AS s4
  FROM q {group}
),
m AS (
  SELECT {ksel}n,
         CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
         CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m3,
         CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m4
  FROM sk
)
SELECT {ksel}n,
  m1 / {sc!r} AS mean,
  CASE WHEN m2 - m1 * m1 >= 0 THEN sqrt(m2 - m1 * m1) / {sc!r} END AS std,
  CASE WHEN m2 - m1 * m1 > 0 THEN
    (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
      / ((m2 - m1 * m1) * sqrt(m2 - m1 * m1))
  END AS skew,
  CASE WHEN m2 - m1 * m1 > 0 THEN
    (m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1)
      / ((m2 - m1 * m1) * (m2 - m1 * m1)) - 3.0
  END AS kurt
FROM m
"""
