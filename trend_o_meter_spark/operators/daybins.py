"""Day-binned min/max extremes — the reference's flagship query (A3).

Semantics (reference trend-o-meter:17-64, ``minMaxForDayBins``):

* the anchor is the newest sample's timestamp, **per metric** — not wall
  clock (trend-o-meter:18);
* bin edges are ``anchor - bin*86400s`` for ``dayBins=[1,3,5,7]``
  (trend-o-meter:19) and bins are the **disjoint consecutive intervals**
  between edges — ``[now,1d), [1d,3d), [3d,5d), [5d,7d)`` — NOT cumulative
  trailing windows (trend-o-meter:22-33);
* any leftover older data forms an open-ended ``rest`` slice
  (trend-o-meter:36-38; the reference's ``curStartingExtent + 1``
  off-by-one that drops one boundary sample is a bug we do NOT replicate —
  divergence documented here and in tests);
* per bin: sample count, argmin/argmax of value with their timestamps
  (trend-o-meter:11-12,54-58), first/last ts, and
  ``is_complete = ceil(span_seconds/3600) > min_data_hours`` with a strict
  ``>`` (trend-o-meter:59, default 18h per config/default.json:17).

Tie semantics: the reference's reduce keeps the first-encountered element
in newest-first order on ties (trend-o-meter:11-12) — i.e. order-dependent.
We pin a deterministic, order-free contract instead via struct ordering:
``min(struct(value, ts))`` — on equal values the earliest ts wins for the
argmin — and ``max(struct(value, ts))`` — on equal values the latest ts
wins for the argmax.  Both engines (Spark, DuckDB) share this lattice, so
the oracle compare is exact.

Scale design: the per-metric anchor is computed by a tiny ``groupBy(metric)``
aggregate and broadcast-joined back (metric cardinality ~ handful), so there
is no global single-partition window; the main aggregation is one hash
shuffle keyed by (metric, day_bin) with map-side partial aggregation.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _age_bucket(age_sec: Column, day_bins: Sequence[int]) -> Column:
    """Disjoint-bin label from sample age (seconds before the anchor)."""
    edges = sorted(day_bins)
    expr: Column | None = None
    for b in edges:
        cond = age_sec <= float(b * 86400)
        expr = F.when(cond, F.lit(str(b))) if expr is None else expr.when(cond, F.lit(str(b)))
    assert expr is not None
    return expr.otherwise(F.lit("rest"))


def day_binned_extremes(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str | None = "metric",
    day_bins: Sequence[int] = (1, 3, 5, 7),
    min_data_hours: int = 18,
    include_leftover: bool = True,
) -> DataFrame:
    """Flagship A3 aggregation.

    Returns one row per (metric, day_bin):
    ``metric?, day_bin, n_samples, min_val, min_ts, max_val, max_ts,
    first_ts, last_ts, is_complete``.
    """
    keys = [metric] if metric else []

    # Per-metric anchor; tiny → broadcast back (no global window at scale).
    anchors = (
        df.groupBy(*keys).agg(F.max(ts).alias("__anchor"))
        if keys
        else df.agg(F.max(ts).alias("__anchor"))
    )
    if keys:
        j = df.join(F.broadcast(anchors), on=keys)
    else:
        j = df.crossJoin(F.broadcast(anchors))

    age_sec = (F.unix_micros(F.col("__anchor")) - F.unix_micros(F.col(ts))) / F.lit(1_000_000.0)
    j = j.withColumn("day_bin", _age_bucket(age_sec, day_bins))
    if not include_leftover:
        j = j.filter(F.col("day_bin") != "rest")

    vc, tc = F.col(value), F.col(ts)
    agg = j.groupBy(*keys, "day_bin").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.min(vc).alias("min_val"),
        # struct ordering pins the tie-break: equal values → earliest ts.
        F.min(F.struct(vc.alias("v"), tc.alias("t")))["t"].alias("min_ts"),
        F.max(vc).alias("max_val"),
        F.max(F.struct(vc.alias("v"), tc.alias("t")))["t"].alias("max_ts"),
        F.min(tc).alias("first_ts"),
        F.max(tc).alias("last_ts"),
    )
    span_hours_ceil = F.ceil(
        (F.unix_micros(F.col("last_ts")) - F.unix_micros(F.col("first_ts")))
        / F.lit(3_600_000_000.0)
    )
    # Strict > per trend-o-meter:59; numeric bin sort (the reference's
    # lexicographic Object.keys().sort() at trend-o-meter:157 is a
    # documented quirk we fix — SURVEY §2.5 O3).
    return agg.withColumn("is_complete", span_hours_ceil > F.lit(min_data_hours)).orderBy(
        *keys, F.when(F.col("day_bin") == "rest", F.lit(10**9)).otherwise(F.col("day_bin").cast("int"))
    )


def day_binned_extremes_compat(
    df: DataFrame,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    day_bins: Sequence[int] = (1, 3, 5, 7),
    min_data_hours: int = 18,
) -> DataFrame:
    """Quirk-faithful A3 (SURVEY §7.2 phase 3): bit-exact reference walk.

    Reproduces ``minMaxForDayBins`` (trend-o-meter:17-64) including its
    quirks, which the declarative :func:`day_binned_extremes` fixes:

    * slice ends are EXCLUSIVE of the edge-crossing element — the sample
      that first falls past an edge starts the next slice
      (trend-o-meter:24-29: ``a.push([curStartingExtent, tsIndex])``);
    * only one edge can be crossed per element, so across a data gap
      spanning multiple edges the slice labels shift (``curDBETIdx++``
      once per crossing element);
    * the leftover slice starts at ``curStartingExtent + 1`` — dropping
      one sample entirely (trend-o-meter:37);
    * bins with no slice are absent; a slice can be empty (length 0,
      ``is_complete`` false, null extremes — we emit nulls where the
      reference emits ``[null, ±2e32]`` sentinels, SURVEY §1.2);
    * ties keep the first-encountered sample in newest-first order
      (strict ``<``/``>`` reduce, trend-o-meter:11-12).

    Sequential per metric by construction → Arrow-batched
    ``applyInPandas`` scan per metric key (reference working set is
    ≤ ~14k rows/metric; the declarative variant is the scale path).
    """
    import pandas as pd

    bins = list(day_bins)
    out_schema = (
        f"{metric} string, day_bin string, n_samples long, "
        "min_val double, min_ts timestamp, max_val double, max_ts timestamp, "
        "first_ts timestamp, last_ts timestamp, is_complete boolean"
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, ascending=False, kind="mergesort").reset_index(drop=True)
        t_sec = pdf[ts].astype("int64").to_numpy() / 1e9
        tvals = pdf[ts]  # original timestamps for exact output values
        vals = pdf[value].to_numpy()
        key = pdf[metric].iloc[0]
        cur_moment = t_sec[0]
        edges = [cur_moment - b * 86400 for b in bins]
        slices: list[tuple[int, int | None]] = []
        cur_start, cur_edge = 0, 0
        for i, t in enumerate(t_sec):
            if cur_edge < len(edges) and t < edges[cur_edge]:
                slices.append((cur_start, i))
                cur_start = i
                cur_edge += 1
        if cur_start < len(t_sec) and len(slices) < len(bins) and cur_edge < len(bins):
            slices.append((cur_start + 1, None))  # the :37 off-by-one
        rows = []
        for db_idx, (s, e) in enumerate(slices):
            sl = slice(s, e)
            st, sv = t_sec[sl], vals[sl]
            n = len(st)
            if n:
                # strict </>: first-encountered (newest-first) wins ties
                imin = min(range(n), key=lambda k: (sv[k], k))
                imax = min(range(n), key=lambda k: (-sv[k], k))
                complete = math.ceil((st[0] - st[n - 1]) / 3600) > min_data_hours
                base = s  # slice offset into the sorted frame
                rows.append(
                    (key, str(bins[db_idx]), n, float(sv[imin]),
                     tvals.iloc[base + imin], float(sv[imax]),
                     tvals.iloc[base + imax],
                     tvals.iloc[base], tvals.iloc[base + n - 1],
                     bool(complete))
                )
            else:
                rows.append(
                    (key, str(bins[db_idx]), 0, None, None, None, None, None, None, False)
                )
        cols = [metric, "day_bin", "n_samples", "min_val", "min_ts", "max_val",
                "max_ts", "first_ts", "last_ts", "is_complete"]
        return pd.DataFrame(rows, columns=cols)

    return df.select(metric, ts, value).groupBy(metric).applyInPandas(walk, schema=out_schema)


def day_binned_extremes_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str | None = "metric",
    day_bins: Sequence[int] = (1, 3, 5, 7),
    min_data_hours: int = 18,
    source_sql: str | None = None,
) -> str:
    """ANSI-SQL twin of :func:`day_binned_extremes` for the DuckDB oracle.

    Kept next to the Spark implementation so the two stay in lockstep.
    ``epoch_us`` (DuckDB) == ``unix_micros`` (Spark).
    """
    edges = sorted(day_bins)
    bucket = "CASE "
    for b in edges:
        bucket += f"WHEN (epoch_us(anchor) - epoch_us({ts})) <= {b * 86400}000000 THEN '{b}' "
    bucket += "ELSE 'rest' END"
    key_sel = f"{metric}, " if metric else ""
    key_grp = f"{metric}, " if metric else ""
    part = f"PARTITION BY {metric}" if metric else ""
    src = source_sql or f"SELECT * FROM {table}"
    return f"""
WITH src AS ({src}),
anchored AS (
  SELECT *, max({ts}) OVER ({part}) AS anchor FROM src
),
binned AS (
  SELECT {key_sel}{ts} AS t, {value} AS v, {bucket} AS day_bin FROM anchored
)
SELECT
  {key_sel}day_bin,
  count(*) AS n_samples,
  min(v) AS min_val,
  (min(struct_pack(v := v, t := t))).t AS min_ts,
  max(v) AS max_val,
  (max(struct_pack(v := v, t := t))).t AS max_ts,
  min(t) AS first_ts,
  max(t) AS last_ts,
  ceil((epoch_us(max(t)) - epoch_us(min(t))) / 3600000000.0) > {min_data_hours} AS is_complete
FROM binned
GROUP BY {key_grp}day_bin
"""


def day_binned_extremes_compat_sql(
    table: str,
    *,
    ts: str = "ts",
    value: str = "value",
    metric: str = "metric",
    day_bins: Sequence[int] = (1, 3, 5, 7),
    min_data_hours: int = 18,
    source_sql: str | None = None,
) -> str:
    """Exact DuckDB oracle for :func:`day_binned_extremes_compat` — the
    rows-only -> oracle promotion (VERDICT r10 task 2 stretch).

    The reference walk (trend-o-meter:17-64) LOOKS imperatively
    sequential, but its per-element state has a closed form:

    * ``c_i`` = number of bin edges above element ``i``'s (float-second)
      time is NON-DECREASING in newest-first order, so the one-edge-per-
      element counter ``f`` obeys ``f(i+1) = min(f(i)+1, c_i)``, whose
      solution is ``f(i) = i - 1 - max_{j<i}(j - c_j)`` (``f(0)=0``) — a
      running-max window;
    * an element triggers a slice close iff ``f < c``; its slice label is
      ``f + [f < c]``; labels ``>= len(bins)`` are discarded (the walk
      never appends a 5th slice);
    * the ``:37`` leftover off-by-one is exactly "drop the FIRST element
      (newest-first) of the last slice ``T`` when ``T < len(bins)``"
      (``T`` = total triggers; when no edge was ever crossed that first
      element is the anchor itself);
    * closed slices may be EMPTY (consecutive crossing elements), and
      the leftover slot exists even when emptied by the drop — slots are
      generated per metric and left-joined to the element aggregate.

    Float semantics are replicated bit-for-bit: the walk compares
    ``int64-nanoseconds / 1e9`` float64 seconds against
    ``anchor - b*86400`` float64 edges; the oracle uses
    ``epoch_ns(..) / 1000000000.0`` and the same subtraction, both IEEE
    double ops.  Tie-breaks (strict ``<``/``>`` keep the first-
    encountered sample) are index-carried struct min/max, as in
    :func:`day_binned_extremes_sql`.
    """
    bins = list(day_bins)
    B = len(bins)
    src = source_sql or f"SELECT * FROM {table}"
    c_expr = " + ".join(
        f"(CASE WHEN tsec < anchor - {b * 86400} THEN 1 ELSE 0 END)"
        for b in bins
    )
    label = "CASE s " + " ".join(
        f"WHEN {k} THEN '{b}'" for k, b in enumerate(bins)
    ) + " END"
    return f"""
WITH src AS ({src}),
elems AS (
  SELECT {metric} AS m, {ts} AS t, {value} AS v,
         epoch_ns({ts}) / 1000000000.0 AS tsec,
         row_number() OVER (PARTITION BY {metric} ORDER BY {ts} DESC) - 1 AS i
  FROM src
),
anch AS (
  SELECT *, max(tsec) OVER (PARTITION BY m) AS anchor FROM elems
),
cvals AS (
  SELECT *, {c_expr} AS c FROM anch
),
fvals AS (
  SELECT *,
    CASE WHEN i = 0 THEN 0
         ELSE i - 1 - max(i - c) OVER (
             PARTITION BY m ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    END AS f
  FROM cvals
),
svals AS (
  SELECT *, f + (CASE WHEN f < c THEN 1 ELSE 0 END) AS s,
         sum(CASE WHEN f < c THEN 1 ELSE 0 END) OVER (PARTITION BY m) AS tt
  FROM fvals
),
kept AS (
  SELECT *, row_number() OVER (PARTITION BY m, s ORDER BY i) AS rs
  FROM svals WHERE s < {B}
),
kept2 AS (
  SELECT * FROM kept WHERE NOT (tt < {B} AND s = tt AND rs = 1)
),
slots AS (
  SELECT m, unnest(generate_series(0, CAST(
           CASE WHEN tt < {B} THEN tt ELSE {B - 1} END AS BIGINT))) AS s
  FROM (SELECT m, any_value(tt) AS tt FROM svals GROUP BY m)
),
agg AS (
  SELECT m, s,
         count(*) AS n,
         (min(struct_pack(v := v, i := i, t := t))).v AS minv,
         (min(struct_pack(v := v, i := i, t := t))).t AS mint,
         (max(struct_pack(v := v, ni := -i, t := t))).v AS maxv,
         (max(struct_pack(v := v, ni := -i, t := t))).t AS maxt,
         max(t) AS firstt,
         min(t) AS lastt,
         ceil((max(tsec) - min(tsec)) / 3600) > {min_data_hours} AS comp
  FROM kept2 GROUP BY m, s
)
SELECT sl.m AS {metric},
       {label} AS day_bin,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_samples,
       a.minv AS min_val, a.mint AS min_ts,
       a.maxv AS max_val, a.maxt AS max_ts,
       a.firstt AS first_ts, a.lastt AS last_ts,
       COALESCE(a.comp, FALSE) AS is_complete
FROM slots sl
LEFT JOIN agg a USING (m, s)
"""
