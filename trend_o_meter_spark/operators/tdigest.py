"""t-digest: adaptive mergeable quantile sketch (seventh sketch family).

The fixed-grid histogram (:mod:`.histogram`) answers quantiles with
uniform absolute-VALUE resolution — you must choose the grid, and a
heavy-tailed column wastes bins on empty ranges.  The **t-digest**
(Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", 2019; the merging-digest variant) is the adaptive
complement: centroid clusters sized by the scale function

    k(q) = delta / (2*pi) * asin(2q - 1)

so cluster weight shrinks like ``q(1-q)`` toward the tails — rank error
is ~``q(1-q)/delta``-bounded, tightest exactly where heavy-tail
analytics need it (p99/p999), with NO grid to choose and a hard
``O(delta)`` size whatever the data.

Mergeability (the hypertable/sketch-rollup property the other six
families share): a digest is one row per key holding parallel
``means``/``weights`` arrays plus exact ``n``/``vmin``/``vmax``; shard
or micro-batch digests merge by concatenating centroids, re-sorting by
mean, and re-running the same compression pass.  Unlike the integer
families (CMS grids, power sums, histogram bins) the merge is LOSSY —
bounded, not bit-losless — so the oracle contract is the
``sketch_rollup`` bound recipe: Spark emits exact ``n``/``vmin``/
``vmax`` next to rank-error booleans its own exact scan verifies, and
DuckDB asserts the exacts and literal TRUE.

Scale shape (100 TB): partial digests are built map-side per Arrow
batch (``mapInPandas`` — no shuffle, ``O(delta)`` rows out per batch per
key); merging is a keyed ``applyInPandas``, optionally TWO-LEVEL
(``fanout`` intermediate salt) so one mega-key's million partials never
meet in a single task: level 1 merges ``(key, hash(batch) % fanout)``
groups, level 2 merges the <= ``fanout`` survivors.  Each merge input
row is <= ~2*delta centroids, so level-2 peak memory is
``O(fanout * delta)`` — independent of corpus size.

Determinism: centroids re-sort by ``(mean, weight)`` before every
compression pass, so a digest is a pure function of the MULTISET of
input partials (partition/arrival order never changes the result —
test-pinned).  The digest VALUES still depend on how rows batched into
partials (lossy merge), which is why digest floats never appear in
oracle-hashed output — only exact fields and bound booleans do.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DELTA = 200

# Parallel-array digest row schema fragment (appended after key columns).
_DIGEST_FIELDS = (
    "means array<double>, weights array<double>, "
    "n bigint, vmin double, vmax double"
)


def _k_scale(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    """The k1 scale function: tail-adaptive cluster sizing."""
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q, dtype=float) - 1.0)


def compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass over centroids sorted by mean (Dunning 2019 Alg 1).

    Greedily absorbs the next centroid while the merged cluster stays
    within one k-unit; weighted means keep sort order (a merge lands
    between its inputs).  Input need not be pre-sorted; output is
    <= ~2*delta centroids, sorted.
    """
    if means.size == 0:
        return means, weights
    order = np.lexsort((weights, means))  # (mean, weight) — determinism
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    k_lo = float(_k_scale(0.0, delta))
    for m, w in zip(means[1:], weights[1:]):
        q_next = min((w_before + cur_w + float(w)) / total, 1.0)
        if float(_k_scale(q_next, delta)) - k_lo <= 1.0:
            cur_w += float(w)
            cur_m += (float(m) - cur_m) * (float(w) / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_lo = float(_k_scale(w_before / total, delta))
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def quantile(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    q: float,
) -> float:
    """Estimate the q-quantile from a digest row (reference-style
    interpolation: centroid centers at ``cumsum(w) - w/2``, linear
    between adjacent centers, min/max-anchored at the extremes)."""
    n = float(weights.sum())
    if means.size == 1:
        return float(means[0])
    target = q * n
    centers = np.cumsum(weights) - weights / 2.0
    if target <= centers[0]:
        lo_w = weights[0] / 2.0
        frac = target / lo_w if lo_w > 0 else 0.0
        return float(vmin + frac * (means[0] - vmin))
    if target >= centers[-1]:
        hi_w = weights[-1] / 2.0
        frac = (target - centers[-1]) / hi_w if hi_w > 0 else 0.0
        return float(means[-1] + frac * (vmax - means[-1]))
    i = int(np.searchsorted(centers, target, side="right")) - 1
    span = centers[i + 1] - centers[i]
    frac = (target - centers[i]) / span if span > 0 else 0.0
    return float(means[i] + frac * (means[i + 1] - means[i]))


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


def tdigest_partials(
    df: DataFrame,
    *,
    value: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    delta: int = DEFAULT_DELTA,
    weight: str | None = None,
) -> DataFrame:
    """Map-side partial digests: one digest row per (Arrow batch, key).

    No shuffle — ``mapInPandas`` over whatever partitioning the scan
    produced; null values are excluded.  Output rows carry <= ~2*delta
    centroids each.

    ``weight``: optional INTEGER per-row mass column (e.g. token count
    for token-mass-weighted length percentiles) — rows with null or
    non-positive weight are excluded, ``n`` becomes the total mass, and
    every accuracy bound holds on weight mass instead of row count.
    """
    key_schema = ", ".join(f"{k} string" for k in keys)
    schema = f"{key_schema}, {_DIGEST_FIELDS}" if keys else _DIGEST_FIELDS

    def build(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[value].notna()]
            if weight is not None:
                pdf = pdf[pdf[weight].notna() & (pdf[weight] > 0)]
            if pdf.empty:
                continue
            rows = []
            grouped = pdf.groupby(list(keys), sort=False) if keys else [((), pdf)]
            for kv, g in grouped:
                if keys and not isinstance(kv, tuple):
                    kv = (kv,)
                v = g[value].to_numpy(dtype=float)
                if weight is not None:
                    w0 = g[weight].to_numpy(dtype=float)
                    if not np.all(w0 == np.floor(w0)):
                        # The audit scan truncates per-row via
                        # cast('long'); fractional weights would
                        # silently desynchronize n vs the exact mass
                        # instead of erroring.
                        raise ValueError(
                            f"tdigest weight column {weight!r} must be "
                            "integer-valued (fractional mass is not "
                            "supported)"
                        )
                else:
                    w0 = np.ones_like(v)
                m, w = compress(v, w0, delta)
                rows.append(
                    (*kv, m.tolist(), w.tolist(), int(round(float(w0.sum()))),
                     float(v.min()), float(v.max()))
                )
            cols = [*keys, "means", "weights", "n", "vmin", "vmax"]
            yield pd.DataFrame(rows, columns=cols)

    cols = [*keys, value] + ([weight] if weight is not None else [])
    # NO spread() here, by interleaved A/B (round 13): the numpy digest
    # build is light enough that a one-core pass beats paying a
    # round-robin shuffle of the (key, value) rows (tdigest_quantiles
    # 2.8-3.4 s unspread vs 3.5-5.5 s spread, 3 interleaved trials).
    return df.select(*cols).mapInPandas(build, schema=schema)


def _merge_rows(pdf: pd.DataFrame, delta: int) -> pd.DataFrame:
    """Merge all digest rows of one group into one (keys carried)."""
    means = np.concatenate([np.asarray(a, dtype=float) for a in pdf["means"]])
    weights = np.concatenate([np.asarray(a, dtype=float) for a in pdf["weights"]])
    m, w = compress(means, weights, delta)
    out = pdf.iloc[:1].copy()
    out["means"] = [m.tolist()]
    out["weights"] = [w.tolist()]
    out["n"] = int(pdf["n"].sum())
    out["vmin"] = float(pdf["vmin"].min())
    out["vmax"] = float(pdf["vmax"].max())
    return out


def tdigest_merge(
    partials: DataFrame,
    *,
    keys: tuple[str, ...] = ("event_type",),
    delta: int = DEFAULT_DELTA,
    fanout: int | None = None,
) -> DataFrame:
    """Keyed merge of partial digests -> one digest row per key.

    ``fanout=N`` inserts an intermediate ``(key, salt)`` merge level so
    a hot key's partials reduce N-way in parallel and the final task
    sees <= N rows (the 100 TB shape).  The salt is the partial's
    ORIGIN PARTITION modulo fanout — never ``rand()`` (stable across
    task replays, streaming-replay safe), and never content-derived:
    a content hash would send a flood of IDENTICAL partials (a
    replicated corpus — the LSH degenerate-bucket profile) into ONE
    level-1 group, recreating the unbounded task this level exists to
    prevent; partition ids spread any flood evenly.  Without fanout
    the result is a pure function of the partial multiset; with it,
    of the partial multiset plus their (plan-deterministic) partition
    layout — either way the accuracy bounds hold (test-pinned) and
    digest floats never reach oracle-hashed output.
    """
    key_schema = ", ".join(f"{k} string" for k in keys)
    schema = f"{key_schema}, {_DIGEST_FIELDS}" if keys else _DIGEST_FIELDS

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_rows(pdf.drop(columns=["__salt"], errors="ignore"), delta)

    if fanout:
        salt = F.pmod(F.spark_partition_id(), F.lit(fanout)).alias("__salt")
        level1 = (
            partials.select("*", salt)
            .groupBy(*keys, "__salt")
            .applyInPandas(merge_group, schema=schema)
        )
        partials = level1
    return partials.groupBy(*keys).applyInPandas(merge_group, schema=schema)


def tdigest_sketch(
    df: DataFrame,
    *,
    value: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    delta: int = DEFAULT_DELTA,
    fanout: int | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Scan -> merged digest, one row per key (``weight``: see
    :func:`tdigest_partials`)."""
    return tdigest_merge(
        tdigest_partials(df, value=value, keys=keys, delta=delta, weight=weight),
        keys=keys,
        delta=delta,
        fanout=fanout,
    )


def tdigest_quantiles(
    digest: DataFrame,
    qs: tuple[float, ...],
    *,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Digest rows -> per-key quantile estimates ``est_p{...}`` columns."""
    key_schema = ", ".join(f"{k} string" for k in keys)
    est_cols = [f"est_p{int(round(q * 1000))}" for q in qs]
    est_schema = ", ".join(f"{c} double" for c in est_cols)
    schema = f"{key_schema}, n bigint, vmin double, vmax double, {est_schema}"

    def est(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = np.asarray(r["means"], dtype=float)
                w = np.asarray(r["weights"], dtype=float)
                ests = [quantile(m, w, r["vmin"], r["vmax"], q) for q in qs]
                rows.append(
                    (*[r[k] for k in keys], int(r["n"]),
                     float(r["vmin"]), float(r["vmax"]), *ests)
                )
            yield pd.DataFrame(
                rows, columns=[*keys, "n", "vmin", "vmax", *est_cols]
            )

    return digest.mapInPandas(est, schema=schema)


# ---------------------------------------------------------------------------
# Bound-checked registry query (sketch_rollup / approx_sketches recipe)
# ---------------------------------------------------------------------------

# (quantile, rank tolerance): generous vs the ~q(1-q)/delta design bound
# at delta=200 (even after lossy two-level merging), yet real failure
# detectors — a uniform-cluster sketch (no tail adaptivity), a broken
# scale function, or bad interpolation trips the tail bounds.
BOUND_QS = ((0.5, 0.02), (0.9, 0.015), (0.99, 0.008), (0.999, 0.004))


def tdigest_bounds(
    df: DataFrame,
    *,
    value: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    delta: int = DEFAULT_DELTA,
    fanout: int | None = 16,
    bound_qs: tuple[tuple[float, float], ...] = BOUND_QS,
    weight: str | None = None,
) -> DataFrame:
    """Per-key exact ``n_rows``/``vmin``/``vmax`` (digest-tracked, so the
    oracle hash-checks the exact plumbing) + one boolean per (q, eps):
    TRUE iff the estimate's exact rank interval ``[count(v<est)/n,
    count(v<=est)/n]`` intersects ``[q-eps, q+eps]`` — verified by a
    second exact scan, never by the digest itself."""
    est = tdigest_quantiles(
        tdigest_sketch(
            df, value=value, keys=keys, delta=delta, fanout=fanout, weight=weight
        ),
        tuple(q for q, _ in bound_qs),
        keys=keys,
    )
    return _rank_audit(
        df, est, value=value, keys=keys, bound_qs=bound_qs, weight=weight
    )


def _rank_audit(
    df: DataFrame,
    est: DataFrame,
    *,
    value: str,
    keys: tuple[str, ...],
    bound_qs: tuple[tuple[float, float], ...],
    extra_est_cols: tuple[str, ...] = (),
    weight: str | None = None,
) -> DataFrame:
    """Exact-scan audit of digest estimates (shared by the one-shot and
    rollup registry queries): broadcast-join the per-key estimate row
    back to the raw rows and compute each estimate's exact rank
    interval.  NULL values are excluded exactly as the digest and both
    oracles exclude them — without the filter a single NULL row inflates
    ``n_rows``/the rank denominators and flips the contract."""
    base = df.filter(F.col(value).isNotNull())
    if weight is not None:
        base = base.filter(F.col(weight).isNotNull() & (F.col(weight) > 0))
    sel = [*keys, value] + ([weight] if weight is not None else [])
    joined = base.select(*sel).join(F.broadcast(est), list(keys))
    v = F.col(value)
    mass = F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    aggs = [
        F.sum(mass).alias("n_rows"),  # row count, or total mass when weighted
        F.min(v).alias("exact_min"),
        F.max(v).alias("exact_max"),
    ]
    for q, _ in bound_qs:
        c = f"est_p{int(round(q * 1000))}"
        aggs.append(F.sum(F.when(v < F.col(c), mass).otherwise(F.lit(0))).alias(f"__lt_{c}"))
        aggs.append(F.sum(F.when(v <= F.col(c), mass).otherwise(F.lit(0))).alias(f"__le_{c}"))
    ranks = joined.groupBy(*keys, "n", "vmin", "vmax", *extra_est_cols).agg(*aggs)
    out_cols = [
        *keys,
        *[F.col(c) for c in extra_est_cols],
        F.col("n_rows"),
        F.col("vmin"),
        F.col("vmax"),
        (F.col("n") == F.col("n_rows")).alias("n_exact"),
        ((F.col("vmin") == F.col("exact_min")) & (F.col("vmax") == F.col("exact_max"))).alias(
            "extremes_exact"
        ),
    ]
    nd = F.col("n_rows").cast("double")
    for q, eps in bound_qs:
        c = f"est_p{int(round(q * 1000))}"
        lo = F.col(f"__lt_{c}").cast("double") / nd
        hi = F.col(f"__le_{c}").cast("double") / nd
        out_cols.append(
            ((lo <= F.lit(q + eps)) & (hi >= F.lit(q - eps))).alias(
                f"p{int(round(q * 1000))}_in_bounds"
            )
        )
    return ranks.select(*out_cols)


def tdigest_bounds_sql(
    table: str,
    *,
    value: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    bound_qs: tuple[tuple[float, float], ...] = BOUND_QS,
) -> str:
    """Oracle: exact n/min/max, literal TRUE for every digest check."""
    key_list = ", ".join(keys)
    bools = ",\n       ".join(
        f"TRUE AS p{int(round(q * 1000))}_in_bounds" for q, _ in bound_qs
    )
    return f"""
SELECT {key_list},
       count(*) AS n_rows,
       min({value}) AS vmin,
       max({value}) AS vmax,
       TRUE AS n_exact,
       TRUE AS extremes_exact,
       {bools}
FROM {table}
WHERE {value} IS NOT NULL
GROUP BY {key_list}
"""


def tdigest_rollup(
    df: DataFrame,
    *,
    value: str = "value",
    ts: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    delta: int = DEFAULT_DELTA,
    bound_qs: tuple[tuple[float, float], ...] = BOUND_QS,
) -> DataFrame:
    """The hypertable pattern for the adaptive family (the t-digest twin
    of ``sketch_rollup``'s HLL story): per-(key, day) digests are the
    STORED sketch table — O(keys x days) rows of <= ~2*delta centroids,
    whatever the event volume — and ANY time range is answered by
    merging the covered days' digests, never rescanning raw events.

    Output: per-key ``n_days`` + the merged-digest exact fields and
    rank-bound booleans (the exact scan exists only to drive the
    oracle's audit, exactly as in ``sketch_rollup``)."""
    day = F.date_trunc("day", F.col(ts)).cast("string").alias("__day")
    # daily is the STORED sketch table and feeds two consumers (the
    # range merge + n_days): cut it so the partials+merge Python
    # pipeline runs once, not per consumer.  O(keys x days) tiny rows.
    from ..lineage import cut

    daily = cut(
        tdigest_sketch(
            df.select(*keys, day, value),
            value=value,
            keys=(*keys, "__day"),
            delta=delta,
        )
    )
    merged = tdigest_merge(
        daily.drop("__day"), keys=keys, delta=delta
    )
    n_days = daily.groupBy(*keys).agg(
        F.countDistinct("__day").cast("long").alias("n_days")
    )
    est = tdigest_quantiles(
        merged, tuple(q for q, _ in bound_qs), keys=keys
    ).join(n_days, list(keys))
    return _rank_audit(
        df, est, value=value, keys=keys, bound_qs=bound_qs,
        extra_est_cols=("n_days",),
    )


def tdigest_rollup_sql(
    table: str,
    *,
    value: str = "value",
    ts: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    bound_qs: tuple[tuple[float, float], ...] = BOUND_QS,
) -> str:
    """Oracle: exact n_days/n/min/max, literal TRUE for every check."""
    key_list = ", ".join(keys)
    bools = ",\n       ".join(
        f"TRUE AS p{int(round(q * 1000))}_in_bounds" for q, _ in bound_qs
    )
    return f"""
SELECT {key_list},
       count(DISTINCT date_trunc('day', {ts})) AS n_days,
       count(*) AS n_rows,
       min({value}) AS vmin,
       max({value}) AS vmax,
       TRUE AS n_exact,
       TRUE AS extremes_exact,
       {bools}
FROM {table}
WHERE {value} IS NOT NULL
GROUP BY {key_list}
"""
