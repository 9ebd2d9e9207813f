"""KMV / theta sketch: mergeable distinct-count sketches that support set
EXPRESSIONS (union / intersection), not just plain distinct counts.

The FIFTH mergeable-sketch family (HLL distincts, CMS frequencies,
histogram quantiles, moments shape — this one for distinct counts under
set algebra).  K-Minimum-Values (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"; the theta-sketch framing is Dasgupta
et al. 2016): hash every id to a point in [0, 2^60), keep the k smallest
hashes per key.  Then

* ``merge`` = k smallest of the union of partials — lossless, order-free,
  the same hypertable property the other four families have;
* distinct estimate = ``(k-1) / theta`` with ``theta = kth_min / 2^60``
  (exact count when fewer than k distinct values were seen);
* INTERSECTION estimate (the thing HLL fundamentally cannot give
  without inclusion-exclusion error blowup): take K' = k smallest of
  A ∪ B, count the fraction of K' present in both sketches, multiply by
  the union estimate.

Everything is deterministic: ids hash through the shared md5-based
integer hash (:mod:`..llm.hashing` — identical in DuckDB), sketch
contents are exact sorted BIGINT arrays, and the only float ops are the
final divisions — so unlike the engine-internal HLL binaries
(``sketch_rollup``, rows-only by design) these estimates are HASH-EXACT
against the oracle.

Scale: per-key sketches build via a keyed row_number window over the
DISTINCT hashes with the ``rank <= k`` filter — Spark plans this as
WindowGroupLimit (per-partition top-k heaps pushed below the shuffle),
so no key's full hash set ever materializes in one task; sketches are
<= k BIGINTs per key forever after, and pairwise set algebra runs on
arrays of <= k elements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..llm.hashing import md5_int, md5_int_sql

HEX_DIGITS = 15  # 60-bit hash space
SPACE = float(1 << 60)
DEFAULT_K = 64


def kmv_sketch(
    df: DataFrame, *, keys: tuple[str, ...] = (), id_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """One pass -> ``(*keys, kmv ARRAY<BIGINT>)``: the k smallest 60-bit
    id hashes per key, ascending.

    With empty ``keys`` (one global sketch) a keyed window would be a
    single-partition sort over every distinct hash — the CI red-flag —
    so the global form pre-filters per input partition (each partition's
    k smallest; the global k smallest survive that by construction) and
    finishes with one tiny sorted aggregate over <= k * partitions rows.
    """
    h = md5_int(F.col(id_col).cast("string"), HEX_DIGITS)
    dist = df.select(*keys, h.alias("__h")).distinct()
    if not keys:
        part = Window.partitionBy(F.spark_partition_id()).orderBy("__h")
        survivors = (
            dist.withColumn("__r", F.row_number().over(part))
            .filter(F.col("__r") <= k)
            .select("__h")
        )
        return survivors.agg(
            F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("kmv")
        )
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        dist.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmv"))
    )


def kmv_merge(
    *sketches: DataFrame, keys: tuple[str, ...], k: int = DEFAULT_K
) -> DataFrame:
    """Keyed merge: k smallest of the union of the partials' hash sets —
    partials of shards merge losslessly into the partial of the union
    (test-pinned, the shared mergeable-family contract)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    dist = u.select(*keys, F.explode("kmv").alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        dist.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmv"))
    )


def kmv_estimate(
    sketch: DataFrame, *, keys: tuple[str, ...], k: int = DEFAULT_K
) -> DataFrame:
    """Sketch -> ``(*keys, n_kept, est_distinct)``; exact below k.

    The kth element reads via null-safe ``F.get`` (0-indexed), NOT
    ``element_at`` — under ANSI mode element_at THROWS on out-of-bounds,
    and the below-k branch's unused expression must stay error-free."""
    size = F.size("kmv")
    theta = F.get("kmv", k - 1).cast("double") / F.lit(SPACE)
    est = F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    return sketch.select(
        *keys, size.cast("long").alias("n_kept"), est.alias("est_distinct")
    )


def kmv_set_estimates(
    sketch: DataFrame, *, key: str, k: int = DEFAULT_K
) -> DataFrame:
    """Pairwise set algebra between every two keys' sketches:
    ``(key_a, key_b, est_union, est_intersection)`` for key_a < key_b.

    K' = k smallest of A ∪ B estimates the union; the fraction of K'
    present in BOTH sketches scales it down to the intersection
    (Dasgupta et al. 2016, §3).  Arrays are <= k elements, so each pair
    is O(k log k) work — the join is over sketch rows (one per key),
    never over data."""
    a = sketch.select(F.col(key).alias("key_a"), F.col("kmv").alias("__a"))
    b = sketch.select(F.col(key).alias("key_b"), F.col("kmv").alias("__b"))
    j = a.join(b, F.col("key_a") < F.col("key_b"))
    u = F.slice(F.array_sort(F.array_union("__a", "__b")), 1, k)
    usize = F.size(u)
    theta = F.get(u, k - 1).cast("double") / F.lit(SPACE)  # null-safe under ANSI
    est_u = F.when(usize < k, usize.cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    m = F.size(F.array_intersect(u, F.array_intersect("__a", "__b")))
    est_i = (m.cast("double") / usize.cast("double")) * est_u
    # difference via the same K'-fraction estimator: members of K' in A
    # but not B (order matters — array_except, not symmetric)
    md = F.size(F.array_intersect(u, F.array_except("__a", "__b")))
    est_d = (md.cast("double") / usize.cast("double")) * est_u
    return j.select(
        "key_a",
        "key_b",
        est_u.alias("est_union"),
        est_i.alias("est_intersection"),
        est_d.alias("est_a_only"),
    )


def _kmv_sql(table: str, *, key: str, id_col: str, k: int) -> str:
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", HEX_DIGITS)
    return f"""
dist AS (SELECT DISTINCT {key} AS key, {h} AS h FROM {table}),
ranked AS (SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS r FROM dist),
sk AS (SELECT key, list_sort(list(h)) AS kmv FROM ranked WHERE r <= {k} GROUP BY key)
"""


def kmv_estimate_sql(
    table: str, *, key: str, id_col: str, k: int = DEFAULT_K
) -> str:
    cte = _kmv_sql(table, key=key, id_col=id_col, k=k)
    return f"""
WITH {cte}
SELECT key AS {key}, CAST(len(kmv) AS BIGINT) AS n_kept,
  CASE WHEN len(kmv) < {k} THEN CAST(len(kmv) AS DOUBLE)
       ELSE {float(k - 1)!r} / (CAST(kmv[{k}] AS DOUBLE) / {SPACE!r}) END AS est_distinct
FROM sk
"""


def kmv_set_estimates_sql(
    table: str, *, key: str, id_col: str, k: int = DEFAULT_K
) -> str:
    cte = _kmv_sql(table, key=key, id_col=id_col, k=k)
    return f"""
WITH {cte},
pairs AS (
  SELECT a.key AS key_a, b.key AS key_b,
         list_sort(list_distinct(list_concat(a.kmv, b.kmv)))[1:{k}] AS u,
         list_sort(list_intersect(a.kmv, b.kmv)) AS ab,
         list_sort(list_filter(a.kmv, x -> NOT list_contains(b.kmv, x))) AS a_only
  FROM sk a JOIN sk b ON a.key < b.key
)
SELECT key_a, key_b,
  CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
       ELSE {float(k - 1)!r} / (CAST(u[{k}] AS DOUBLE) / {SPACE!r}) END AS est_union,
  (CAST(len(list_intersect(u, ab)) AS DOUBLE) / CAST(len(u) AS DOUBLE))
    * (CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
            ELSE {float(k - 1)!r} / (CAST(u[{k}] AS DOUBLE) / {SPACE!r}) END)
  AS est_intersection,
  (CAST(len(list_intersect(u, a_only)) AS DOUBLE) / CAST(len(u) AS DOUBLE))
    * (CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
            ELSE {float(k - 1)!r} / (CAST(u[{k}] AS DOUBLE) / {SPACE!r}) END)
  AS est_a_only
FROM pairs
"""
