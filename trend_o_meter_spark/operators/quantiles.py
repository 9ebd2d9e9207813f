"""Distributed EXACT interpolated quantiles without the value-multiset
buffer.

Spark's built-in exact ``percentile`` is a non-sketch aggregate: its
buffer is the full value multiset, so a population-wide quantile (or a
per-key quantile over few fat keys) materializes every value in ONE
final-merge task — correct at sf0.1, the wrong shape at 10^9 rows.
This module computes the identical interpolated quantile (the
``quantile_cont`` definition: ``h = (n-1)*q``; ``v[floor(h)] +
(h - floor(h)) * (v[floor(h)+1] - v[floor(h)])`` over the 0-indexed
sorted multiset) through a bucket-decomposed EXACT-RANK selection:

1. collapse the stream to per-(key, value) counts (map-side combinable;
   tie mass — the classic skew — collapses to one row here);
2. per key: n/min/max, then an order-preserving fixed-width bucket id
   ``floor((v-min)/(max-min)*B)``;
3. cumulative ranks = per-(key, bucket) running sums (each window
   partition holds one bucket's DISTINCT values, ~distinct/B rows)
   plus per-key bucket offsets (a window over <= B rows per key);
4. the two order statistics each quantile needs (ranks ``floor(h)``
   and ``min(floor(h)+1, n-1)``) are picked by joining a per-key
   8-row target table against the rank ranges, then interpolated.

No stage ever holds a per-key value multiset in a single task: the
widest single-task structure is one bucket's distinct values.  The
same construction, written textually identically over DuckDB's window
sums, is the oracle twin — both engines pick the SAME two doubles and
evaluate the SAME ``vlo + frac * (vhi - vlo)`` IEEE expression, so
results are hash-exact with no float-threshold luck (the integer-rank
route proven by ccnet_buckets' terciles and split_drift_ks' ECDF).

Known bound (documented, not hidden): a key whose values are continuous
but concentrated in a sliver of its (min, max) range lands most
DISTINCT values in one bucket; that bucket's window task is then
O(distinct_in_bucket).  Raise ``buckets`` (the per-key bucket table is
O(B) rows) or recurse if a real corpus hits it; ties do NOT hit it —
they collapse at step 1.

Reference parity: the reference keeps no quantile operator (its only
spread statistic is min/max extent tracking, trend-o-meter:392-427);
this module exists so the repo's OWN monitoring/analytics operators
(rfm_segments, mad_anomalies, value_quantiles) stay exact at scale.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..lineage import cut

__all__ = [
    "exact_quantiles",
    "exact_value_counts",
    "exact_quantiles_from_counts",
    "exact_quantiles_sql_ctes",
]


def exact_quantiles(
    df: DataFrame,
    *,
    value: str,
    keys: Sequence[str],
    qs: Sequence[float],
    buckets: int = 8192,
    out: str = "quantile",
    cut_counts: bool = True,
) -> DataFrame:
    """Per-key interpolated quantiles, exact-rank construction.

    Output (long form): ``*keys, __qi int, <out> double`` — one row per
    (key group, quantile index).  NULL values are excluded (matching
    both ``F.percentile`` and ``quantile_cont``); a key group whose
    values are all NULL simply emits no row.  ``keys`` must be
    non-empty — global quantiles pass a constant/dimension column (the
    per-key bucket-offset window then stays key-partitioned).
    """
    if not keys:
        raise ValueError("exact_quantiles requires at least one key column")
    counts = exact_value_counts(df, value=value, keys=keys, cut=cut_counts)
    return exact_quantiles_from_counts(
        counts, keys=keys, qs=qs, buckets=buckets, out=out
    )


def exact_value_counts(
    df: DataFrame, *, value: str, keys: Sequence[str], cut: bool = True
) -> DataFrame:
    """The per-(key, value) counts table the quantile machinery runs on:
    ``*keys, __v, __c`` with NULL values excluded — the ONLY pass over
    the source rows.  Lineage-cut so multi-consumer callers (the
    med->MAD composition in :mod:`.trend`) derive follow-up counts from
    the materialized table instead of rescanning the corpus.

    ``cut=False`` skips the checkpoint: per-MICRO-BATCH callers
    (stream_rfm's re-score) run this over a tiny already-materialized
    state frame, and each batch's checkpoint leaves RDD blocks pinned
    until a JVM GC notices — in a 20-batch replay that debt measured
    ~1.7x the whole re-score (round-14 order experiment).  Values are
    identical either way."""
    kcols = list(keys)
    vals = df.select(*kcols, F.col(value).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    # Every downstream branch (stats, cb, and through them sizes /
    # local / targets) would otherwise re-derive the source scan +
    # groupBy per consumer — callers like mad_anomalies showed 36+
    # scans of the same table.  Materialize once (lazily, on first
    # action) per the triangle_counts / exact_substr discipline;
    # lineage.cut so the plan audit can still see the true lineage.
    counts = vals.groupBy(*kcols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    from .. import lineage  # late import: honor SPARK_GRAFT_NO_CHECKPOINT

    return lineage.cut(counts) if cut else counts


def exact_quantiles_from_counts(
    counts: DataFrame,
    *,
    keys: Sequence[str],
    qs: Sequence[float],
    buckets: int = 8192,
    out: str = "quantile",
) -> DataFrame:
    """Quantile selection over a precomputed ``*keys, __v, __c`` counts
    table (:func:`exact_value_counts`, or any reaggregation of one —
    ``__v`` need not even be distinct per key: the rank decomposition is
    correct over ANY (value, count) partition of the multiset).

    The intermediate ``stats``/``cb`` frames are consumed by 2-3
    downstream branches each and re-derived per branch (10 ExistingRDD
    scans / 42 exchanges in mad_anomalies' before-plan) — but those
    duplicate branches are all over the MATERIALIZED counts table and
    execute concurrently inside one job, so cutting them was measured
    SLOWER (mad_anomalies 5.8 -> 13.1 s: each cut is a serial
    checkpoint job barrier; the duplication it removes ran on
    otherwise-idle cores).  They stay uncut deliberately.
    """
    if not keys:
        raise ValueError("exact_quantiles requires at least one key column")
    if not qs:
        raise ValueError("exact_quantiles requires at least one quantile")
    kcols = list(keys)

    stats = counts.groupBy(*kcols).agg(
        F.sum("__c").cast("long").alias("__n"),
        F.min("__v").alias("__vmin"),
        F.max("__v").alias("__vmax"),
    )

    # Order-preserving fixed-width bucket id.  min==max => all values
    # equal (ties collapsed at the counts step) => single bucket 0.
    width_b = (
        F.when(F.col("__vmax") <= F.col("__vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(buckets - 1),
                F.floor(
                    (F.col("__v") - F.col("__vmin"))
                    / (F.col("__vmax") - F.col("__vmin"))
                    * F.lit(buckets)
                ),
            )
        )
        .cast("long")
    )
    cb = counts.join(stats.select(*kcols, "__vmin", "__vmax"), kcols).select(
        *kcols, "__v", "__c", width_b.alias("__b")
    )

    sizes = cb.groupBy(*kcols, "__b").agg(F.sum("__c").cast("long").alias("__sb"))
    woff = (
        Window.partitionBy(*kcols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        *kcols,
        "__b",
        F.coalesce(F.sum("__sb").over(woff), F.lit(0)).cast("long").alias("__off"),
    )
    wloc = (
        Window.partitionBy(*kcols, "__b")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = cb.select(
        *kcols, "__b", "__v", "__c", F.sum("__c").over(wloc).alias("__lc")
    )
    # 0-indexed rank range of __v within its key: [__cumhi - __c, __cumhi)
    ranked = local.join(offsets, kcols + ["__b"]).select(
        *kcols,
        "__v",
        "__c",
        (F.col("__off") + F.col("__lc")).cast("long").alias("__cumhi"),
    )

    qarr = F.array(
        *[
            F.struct(F.lit(i).alias("__qi"), F.lit(float(q)).alias("__q"))
            for i, q in enumerate(qs)
        ]
    )
    h = (F.col("__n") - 1).cast("double") * F.col("__q")
    targets = (
        stats.select(*kcols, "__n", F.explode(qarr).alias("__t"))
        .select(*kcols, "__n", "__t.__qi", "__t.__q")
        .select(
            *kcols,
            "__qi",
            F.floor(h).cast("long").alias("__klo"),
            F.least(F.floor(h).cast("long") + 1, F.col("__n") - 1)
            .cast("long")
            .alias("__khi"),
            (h - F.floor(h)).cast("double").alias("__frac"),
        )
    )

    inlo = (F.col("__klo") >= F.col("__cumhi") - F.col("__c")) & (
        F.col("__klo") < F.col("__cumhi")
    )
    inhi = (F.col("__khi") >= F.col("__cumhi") - F.col("__c")) & (
        F.col("__khi") < F.col("__cumhi")
    )
    picked = (
        targets.join(ranked, kcols)
        .filter(inlo | inhi)  # merged into the join condition by Catalyst
        .groupBy(*kcols, "__qi", "__frac")
        .agg(
            F.max(F.when(inlo, F.col("__v"))).alias("__vlo"),
            F.max(F.when(inhi, F.col("__v"))).alias("__vhi"),
        )
    )
    return picked.select(
        *kcols,
        "__qi",
        (F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))).alias(
            out
        ),
    )


def exact_quantiles_sql_ctes(
    src: str,
    *,
    value: str,
    keys: Sequence[str],
    qs: Sequence[float],
    prefix: str,
    out: str = "quantile",
) -> str:
    """DuckDB twin as a comma-joined CTE chain (splice after ``WITH``).

    The final CTE is named ``{prefix}`` with columns ``*keys, __qi,
    <out>`` — textually the same rank selection and the same
    ``vlo + frac * (vhi - vlo)`` interpolation as :func:`exact_quantiles`
    (the oracle side needs no bucket decomposition: one windowed
    cumulative per key suffices single-node).
    """
    ks = ", ".join(keys)
    t_ks = ", ".join(f"t.{k}" for k in keys)
    join_keys = " AND ".join(f"t.{k} = c.{k}" for k in keys)
    qvals = ", ".join(f"({i}, CAST({float(q)!r} AS DOUBLE))" for i, q in enumerate(qs))
    h = "CAST(__n - 1 AS DOUBLE) * q.__q"
    inlo = "t.__klo >= c.__cumhi - c.__c AND t.__klo < c.__cumhi"
    inhi = "t.__khi >= c.__cumhi - c.__c AND t.__khi < c.__cumhi"
    vlo = f"max(CASE WHEN {inlo} THEN c.__v END)"
    vhi = f"max(CASE WHEN {inhi} THEN c.__v END)"
    return f"""
{prefix}_counts AS (
  SELECT {ks}, {value} AS __v, CAST(count(*) AS BIGINT) AS __c
  FROM {src} WHERE {value} IS NOT NULL GROUP BY ALL
),
{prefix}_cum AS (
  SELECT {ks}, __v, __c,
         CAST(sum(__c) OVER (PARTITION BY {ks} ORDER BY __v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS __cumhi
  FROM {prefix}_counts
),
{prefix}_targets AS (
  SELECT {ks}, q.__qi,
         CAST(floor({h}) AS BIGINT) AS __klo,
         least(CAST(floor({h}) AS BIGINT) + 1, __n - 1) AS __khi,
         CAST({h} - floor({h}) AS DOUBLE) AS __frac
  FROM (SELECT {ks}, CAST(sum(__c) AS BIGINT) AS __n
        FROM {prefix}_counts GROUP BY ALL) s
  CROSS JOIN (VALUES {qvals}) q(__qi, __q)
),
{prefix} AS (
  SELECT {t_ks}, t.__qi,
         {vlo} + t.__frac * ({vhi} - {vlo}) AS {out}
  FROM {prefix}_targets t
  JOIN {prefix}_cum c ON {join_keys} AND (({inlo}) OR ({inhi}))
  GROUP BY {t_ks}, t.__qi, t.__frac
)""".strip()
