"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (one viral channel, one boilerplate
document hash) can pin a whole aggregation on one reducer.  AQE's skew
handling covers joins; for aggregations whose per-key state is
decomposable (count/sum/min/max — anything with a merge function), the
classic fix is salting: spray each hot key across ``n_salts`` synthetic
sub-keys, partially aggregate on (key, salt), then merge the partials on
the real key.  Shuffle one: n_salts-way parallel even for a single hot
key; shuffle two: one row per (key, salt) — tiny.

The salt must be content-derived (hash of a row id), NOT random — see
``session.py``'s determinism note and the oracle contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a content-derived salt.

    ``partial_aggs``: alias -> aggregate over raw rows (phase 1, grouped
    by keys + salt).  ``merge_aggs``: alias -> aggregate over the phase-1
    columns (phase 2, grouped by keys only).  Example::

        salted_agg(df, ["event_type"], "event_id",
                   {"cnt": F.count(F.lit(1)), "sum_v": F.sum("value")},
                   {"cnt": F.sum("cnt"), "sum_v": F.sum("sum_v")})
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(a) for a, c in merge_aggs.items()])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt_on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate-and-salt.

    The ``small`` side is replicated ``n_salts``x with an explicit salt
    column; each ``big`` row picks one salt deterministically (hash of
    ``salt_on``, content-derived — never ``rand()``, per the oracle
    determinism contract), so a single hot join key spreads over
    ``n_salts`` reducers instead of pinning one.

    When to use over AQE: AQE's skew-join split works on the sort-merge
    path when runtime stats reveal the skew — but it cannot split a
    partition that a downstream stateful/co-partitioned requirement pins
    together, and stats can miss skew hidden behind a filter.  This is
    the explicit escape hatch; cost = ``n_salts``x replication of the
    small side's shuffle (keep ``small`` the dimension-sized side).

    Exactly equivalent to ``big.join(small, on, how)`` for ``inner`` and
    ``left`` joins (every big row still meets every matching small row —
    in exactly one salt bucket).  Right/full joins would need the small
    side deduped post-join; not supported.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    if salt_on in on:
        # salting by the join key is a no-op: every row of a hot key gets
        # the SAME salt, so the hot partition never splits while the small
        # side still pays n_salts-x replication — always a caller mistake
        raise ValueError("salt_on must be a column that varies within a join key "
                         "(e.g. a row id), not the join key itself")
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint"))
        ),
    )
    return b.join(s, on=[*on, "__salt"], how=how).drop("__salt")


def salted_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    *,
    k: int,
    salt_on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase per-key top-k for skewed key distributions.

    Phase 1 takes the top-k within each (key, salt) — n_salts-way
    parallel even for one mega-key; phase 2 re-ranks the <= k*n_salts
    survivors per key.  Exactly equivalent to a single per-key window
    (the global top-k is contained in the union of per-salt top-ks);
    the row_number emitted is the phase-2 (global) rank.

    MEASURED CAVEAT (BASELINE.md round-4 skew probe): Spark >= 3.5
    already plans a plain ``row_number() <= k`` filter as Partial+Final
    ``WindowGroupLimit`` — a map-side per-key top-k that collapses a
    hot key to <= k rows per map task BEFORE the shuffle.  On such
    plans the plain window is skew-safe and this helper's second
    shuffle costs ~2x (15.6 s vs 31.2 s at 90%-hot / 14.4 M rows).
    Reach for it only where the group-limit rewrite cannot fire:
    rank-over-aggregate orderings the optimizer cannot push, or
    engines/versions without the rule.  ``salted_join`` is different —
    it measurably beats both plain AND AQE-skew-join sort-merge plans
    (7.9 s vs ~14 s, same probe).
    """
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    phase1 = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    return phase1.withColumn("__rank", F.row_number().over(w2)).filter(
        F.col("__rank") <= k
    )
