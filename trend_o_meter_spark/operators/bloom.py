"""Bloom filter: mergeable set membership — the sixth sketch family.

Alongside HLL (distincts), CMS (frequencies), fixed-grid histograms
(quantiles), moments, and KMV/theta (set algebra), the Bloom filter
answers the remaining sketchable question: "have we seen this key?"
with NO false negatives and a bounded false-positive rate — the
curation use case is corpus membership at scale (was this URL already
crawled / this document hash already admitted / this n-gram in the
eval set) without rescanning or holding the raw key set.

Spark-first shape: the filter is a SPARSE bit set — a DataFrame of
distinct set-bit positions (``<group keys...>, pos``), ≤ m rows per
group however large the keyed corpus.  Build is one scan + a k-way
explode + distinct (map-side partial dedup); filters merge by plain
union-distinct — IDEMPOTENT (replay-safe, like HLL's register-max and
unlike the additive CMS/histogram/moments merges).  Membership probes
are a (pos)-keyed join of candidates x k against the KB-sized filter —
broadcast the filter side.

Hash positions use the shared md5 recipe (llm.hashing) so the DuckDB
oracle reproduces every set bit exactly — like CMS, the whole operator
is oracle-checkable (no engine-private binaries).

Standard parameters: false-positive rate ≈ (1 - e^(-k·n/m))^k; size m
for the expected distinct count n with k ≈ (m/n)·ln2.

Reference: Bloom, "Space/time trade-offs in hash coding with allowable
errors" (CACM 1970); Broder & Mitzenmacher, "Network applications of
Bloom filters" (Internet Mathematics 2004).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm.hashing import md5_int, md5_int_sql


def _pos(key_col, j_col, m: int):
    return (
        md5_int(F.concat(j_col.cast("string"), F.lit(":"), key_col.cast("string")))
        % m
    )


def bloom_build(
    df: DataFrame,
    *,
    key: str,
    keys: tuple[str, ...] = (),
    m: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Build per-group filters: ``<keys...>, pos`` distinct set-bit rows
    (≤ m per group).  One scan, explode x k, one distinct."""
    e = df.select(
        *keys,
        F.col(key).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j"),
    )
    return e.select(
        *keys, _pos(F.col("__k"), F.col("__j"), m).alias("pos")
    ).distinct()


def bloom_merge(*sketches: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """Union-distinct of set bits — filters of shards merge losslessly
    into the filter of the union, and the merge is idempotent (a
    replayed shard cannot change the result)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.select(*keys, "pos").distinct()


def bloom_probe(
    sketch: DataFrame,
    candidates: DataFrame,
    *,
    key: str,
    keys: tuple[str, ...] = (),
    m: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Membership per candidate: ``maybe_present`` = all k positions set
    (within the candidate's group when ``keys`` are given).  Guarantees
    no false negatives; false positives at the standard Bloom rate.

    The probe joins candidates x k against the ≤ m-row-per-group filter
    on (keys..., pos) — broadcast the filter side, it is KB-sized by
    construction.  All non-key candidate columns pass through.

    Duplicate-safe: the test is ``min(hit) == 1`` (EVERY probe row must
    hit), not ``sum(hit) == k`` — a candidate appearing twice in
    ``candidates`` produces 2k probe rows, which a sum-based test would
    read as a miss, a silent FALSE NEGATIVE violating the guarantee
    above.  (Duplicates still collapse to one output row per distinct
    candidate tuple, since the group key is the full candidate row.)
    """
    probes = candidates.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j")
    ).withColumn("pos", _pos(F.col(key), F.col("__j"), m))
    hit = F.broadcast(sketch.select(*keys, "pos").withColumn("__hit", F.lit(1)))
    others = [c for c in candidates.columns if c != key and c not in keys]
    return (
        probes.join(hit, [*keys, "pos"], "left")
        .groupBy(key, *keys, *others)
        .agg(
            (F.min(F.coalesce(F.col("__hit"), F.lit(0))) == 1).alias(
                "maybe_present"
            )
        )
    )


def bloom_membership_stats(
    df: DataFrame,
    *,
    key: str = "user_id",
    group: str = "event_type",
    m: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Eval harness (the registry query): per group, probe EVERY distinct
    key in the table against that group's filter and count outcomes.

    Output: ``<group>, n_probes, n_present_exact, n_maybe,
    n_false_pos, fp_rate`` — ``n_maybe >= n_present_exact`` always (no
    false negatives), ``fp_rate`` = false positives / true absentees
    (6-rounded; NULL when nothing is absent).  Hash-exact against the
    oracle because every set bit is the shared md5 recipe.
    """
    sketch = bloom_build(df, key=key, keys=(group,), m=m, k=k)
    universe = df.select(F.col(key)).distinct()
    groups = df.select(F.col(group)).distinct()
    # Broadcast side matters at scale: `groups` is O(#event types) (~9
    # rows) and bounded by the domain; `universe` is O(distinct keys) and
    # grows with the corpus.  Stream the unbounded side, broadcast the
    # bounded one — same cross product, opposite memory profile.
    cands = universe.crossJoin(F.broadcast(groups))
    probed = bloom_probe(sketch, cands, key=key, keys=(group,), m=m, k=k)
    actual = (
        df.select(group, key)
        .distinct()
        .withColumn("__present", F.lit(True))
    )
    j = probed.join(actual, [group, key], "left").select(
        group,
        F.col("maybe_present"),
        F.coalesce(F.col("__present"), F.lit(False)).alias("present"),
    )
    agg = j.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("present").cast("int")).alias("n_present_exact"),
        F.sum(F.col("maybe_present").cast("int")).alias("n_maybe"),
        F.sum((F.col("maybe_present") & ~F.col("present")).cast("int")).alias(
            "n_false_pos"
        ),
    )
    return agg.select(
        group,
        "n_probes",
        "n_present_exact",
        "n_maybe",
        "n_false_pos",
        F.when(
            F.col("n_probes") > F.col("n_present_exact"),
            F.round(
                F.col("n_false_pos") / (F.col("n_probes") - F.col("n_present_exact")),
                6,
            ),
        ).alias("fp_rate"),
    )


def bloom_membership_stats_sql(
    table: str,
    *,
    key: str = "user_id",
    group: str = "event_type",
    m: int = 2048,
    k: int = 3,
) -> str:
    h_build = md5_int_sql(f"CAST(r.j AS VARCHAR) || ':' || CAST(t.{key} AS VARCHAR)")
    h_probe = md5_int_sql(f"CAST(r.j AS VARCHAR) || ':' || CAST(c.{key} AS VARCHAR)")
    return f"""
WITH filt AS (
  SELECT DISTINCT t.{group}, {h_build} % {m} AS pos
  FROM {table} t, range({k}) AS r(j)
),
cands AS (
  SELECT g.{group}, u.{key}
  FROM (SELECT DISTINCT {group} FROM {table}) g,
       (SELECT DISTINCT {key} FROM {table}) u
),
probed AS (
  SELECT c.{group}, c.{key},
         -- min-based: every probe row must hit (duplicate-safe, mirrors
         -- bloom_probe's Spark-side test)
         (min(CASE WHEN f.pos IS NULL THEN 0 ELSE 1 END) = 1) AS maybe_present
  FROM (SELECT c.{group}, c.{key}, {h_probe} % {m} AS pos
        FROM cands c, range({k}) AS r(j)) c
  LEFT JOIN filt f ON f.{group} = c.{group} AND f.pos = c.pos
  GROUP BY 1, 2
),
actual AS (
  SELECT DISTINCT {group}, {key}, TRUE AS present FROM {table}
),
j AS (
  SELECT p.{group}, p.maybe_present,
         coalesce(a.present, FALSE) AS present
  FROM probed p LEFT JOIN actual a USING ({group}, {key})
)
SELECT {group},
       count(*) AS n_probes,
       CAST(sum(CAST(present AS INT)) AS BIGINT) AS n_present_exact,
       CAST(sum(CAST(maybe_present AS INT)) AS BIGINT) AS n_maybe,
       CAST(sum(CAST(maybe_present AND NOT present AS INT)) AS BIGINT) AS n_false_pos,
       CASE WHEN count(*) > sum(CAST(present AS INT))
            THEN round(sum(CAST(maybe_present AND NOT present AS INT))
                       / (count(*) - sum(CAST(present AS INT))), 6)
       END AS fp_rate
FROM j GROUP BY 1
"""
