"""Count-min sketch: mergeable frequency estimation (heavy hitters).

The second mergeable-sketch family member alongside the HLL rollup
(workload.sketch_rollup).  A CMS is a ``depth x width`` counter grid;
each key increments one bucket per row (``bucket_j = h_j(key) % width``)
and a key's estimate is the MIN of its ``depth`` buckets — always an
overestimate, within ``2n/width`` with probability ``1 - 2^-depth``.

Spark-first shape: the grid is a (row_id, bucket, cnt) DataFrame built
by one scan + a ``depth``-way explode + one hash aggregation (map-side
partial, so each executor pre-folds its slice of the grid — the sketch
IS the combiner state).  Grids merge by elementwise addition (a plain
union + re-agg), which is what makes the operator shard-friendly: build
per day/per shard, store O(depth x width) rows, answer later without
rescanning raw events — same hypertable pattern as the HLL rollup.

Hashes are the shared md5 recipe (llm.hashing) so the DuckDB oracle
reproduces the grid bit-for-bit; no engine-specific sketch binaries,
hence (unlike HLL) the whole operator IS oracle-checkable.

Reference: Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications" (J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm.hashing import md5_int, md5_int_sql


def _bucket(key_col, row_col, width: int):
    return (
        md5_int(F.concat(row_col.cast("string"), F.lit(":"), key_col.cast("string")))
        % width
    )


def cms_build(
    df: DataFrame, *, key: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Build the sketch grid: ``row_id, bucket, cnt`` (≤ depth·width rows).

    One scan, explode x depth, one (row_id, bucket) hash agg.
    """
    e = df.select(
        F.col(key).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_id"),
    )
    return (
        e.select("row_id", _bucket(F.col("__k"), F.col("row_id"), width).alias("bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise sum of grids — sketches of shards merge losslessly
    into the sketch of the union (test-pinned)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("row_id", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, *, key: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Point-estimate each candidate key: min over its depth buckets.

    ``candidates`` must carry ``key``; all its other columns pass
    through.  The probe is a (row_id, bucket)-keyed join of
    candidates x depth against the ≤ depth·width-row grid — broadcast
    the grid side, it is KB-sized by construction.

    The join is LEFT with empty buckets counting 0: the grid is sparse
    (only touched buckets have rows), and a candidate key never seen by
    the sketch hashes to empty buckets whose implicit count 0 must win
    the min — an inner join would silently inflate unseen keys to the
    count of whatever shares their occupied buckets (or drop them).
    """
    probes = candidates.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_id")
    ).withColumn("bucket", _bucket(F.col(key), F.col("row_id"), width))
    others = [c for c in candidates.columns if c != key]
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy(key, *others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def cms_heavy_hitters(
    df: DataFrame, *, key: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Every key's CMS estimate next to its exact count.

    Output: ``<key>, exact_count, cms_estimate, overestimate`` —
    ``overestimate >= 0`` always (CMS never undercounts), and small for
    true heavy hitters.  At scale the exact side is the expensive one;
    production keeps only the grid + a candidate top-k, this query's
    exact join is the eval harness.
    """
    sketch = cms_build(df, key=key, width=width, depth=depth)
    exact = df.groupBy(key).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(sketch, exact, key=key, width=width, depth=depth)
    return est.select(
        key,
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


def cms_heavy_hitters_sql(
    table: str, *, key: str, width: int = 64, depth: int = 4
) -> str:
    h = md5_int_sql(f"CAST(r.j AS VARCHAR) || ':' || CAST(t.{key} AS VARCHAR)")
    hp = md5_int_sql(f"CAST(r.j AS VARCHAR) || ':' || CAST(e.{key} AS VARCHAR)")
    return f"""
WITH grid AS (
  SELECT r.j AS row_id, {h} % {width} AS bucket, count(*) AS cnt
  FROM {table} t, range({depth}) AS r(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT {key}, count(*) AS exact_count FROM {table} GROUP BY 1
),
probes AS (
  SELECT e.{key}, e.exact_count, r.j AS row_id, {hp} % {width} AS bucket
  FROM exact e, range({depth}) AS r(j)
),
est AS (
  SELECT p.{key}, p.exact_count, min(g.cnt) AS cms_estimate
  FROM probes p JOIN grid g USING (row_id, bucket)
  GROUP BY 1, 2
)
SELECT {key}, exact_count, cms_estimate,
       cms_estimate - exact_count AS overestimate
FROM est
"""
