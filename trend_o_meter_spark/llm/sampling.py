"""Weighted sampling without replacement: priority sampling.

Uniform hash sampling (``text.hash_sample`` / ``text.balanced_sample``)
picks every document with equal probability — wrong for curation
decisions that should weight by size/quality ("sample 1k documents with
probability proportional to token count, and still estimate corpus
totals from the sample").  The classic streaming/mergeable answer is
**priority sampling** (Duffield, Lund & Thorup, "Priority sampling for
estimation of arbitrary subset sums", JACM 54(6), 2007):

* each row draws a uniform ``u in (0, 1]`` and gets priority
  ``q = w / u``;
* the sample is the k rows with the LARGEST priorities;
* ``tau`` = the (k+1)-th largest priority; the Horvitz-Thompson-style
  weight estimator for each sampled row is ``max(w, tau)`` — and
  ``sum(max(w, tau))`` over the sample is an (near-)unbiased estimator
  of the total weight of ANY subset intersected with the sample
  (exactly unbiased for subset sums given >= 1 sample; see the paper).

Cross-engine determinism discipline (the repo's oracle contract):

* ``u`` is never ``rand()``: ``u = (md5_int(salt:id) + 1) / 2^28``
  (:mod:`.hashing`), so the sample is reproducible across runs, engines
  and re-shards, and the DuckDB oracle reproduces it bit-for-bit;
* every float op is +,*,/ only (IEEE correctly-rounded, identical in
  Spark and DuckDB) — no ``ln``/``pow`` (which is why this is priority
  sampling and not Efraimidis-Spirakis ``u^(1/w)``: the ES key needs a
  transcendental whose last-ulp behavior is libm-specific, while the
  priority ``w/u`` is two correctly-rounded divisions);
* ties (equal double priorities) break by ``id_col`` ascending.

Scale: one shuffle keyed by stratum; the per-stratum top-(k+1) is a
plain ``row_number() <= k+1`` window that Spark >= 3.5 plans as
Partial+Final ``WindowGroupLimit`` (map-side top-k BEFORE the shuffle —
measured skew-safe, BASELINE.md round-4 skew probe), so a degenerate
mega-stratum never ships more than ``(k+1) * n_map_tasks`` rows.  The
tau table is <= 1 row per stratum and broadcast back onto the sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import HEX_DIGITS, md5_int, md5_int_sql

_HASH_SPACE = float(1 << (4 * HEX_DIGITS))  # 2^28 for HEX_DIGITS=7


def priority_sample(
    df: DataFrame,
    *,
    weight: str = "n_chars",
    strata: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
    salt: str = "priority-v1",
) -> DataFrame:
    """k-per-stratum weighted sample (inclusion probability increasing in
    ``weight``) with the priority-sampling total-weight estimator.

    Output, one row per sampled document::

        strata, doc_id, w, priority, sample_rank (1..k),
        tau   (the stratum's (k+1)-th priority; NULL when the stratum
               has <= k rows — then the "sample" is the whole stratum),
        est_w (max(w, tau), the per-row weight estimator; equals w when
               tau is NULL, i.e. the census case is exact)

    ``sum(est_w)`` per stratum estimates the stratum's total weight
    (unbiased over the hash-salt ensemble — property-pinned in
    tests/test_sampling.py); rows with larger ``weight`` are
    exponentially more likely to survive.
    """
    top = priority_ranked(
        df, weight=weight, strata=strata, id_col=id_col, k=k, salt=salt
    )
    return priority_finalize(top, strata=strata, id_col=id_col, k=k)


def priority_ranked(
    df: DataFrame,
    *,
    weight: str = "n_chars",
    strata: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
    salt: str = "priority-v1",
) -> DataFrame:
    """Per-stratum top-(k+1) by priority: ``strata, id, w, __pr, __rank``.

    Keeping k+1 (not k) rows preserves the threshold ``tau``; the
    top-(k+1) is MERGEABLE — the union's top-(k+1) is contained in the
    union of per-shard/per-batch top-(k+1)s (pigeonhole), which is what
    the streaming twin exploits (:func:`rerank` to merge)."""
    from pyspark.sql import Window

    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(_HASH_SPACE)
    pr = F.col(weight).cast("double") / u
    w_rank = Window.partitionBy(strata).orderBy(
        F.col("__pr").desc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(strata),
            F.col(id_col),
            F.col(weight).cast("double").alias("w"),
            pr.alias("__pr"),
        )
        .withColumn("__rank", F.row_number().over(w_rank))
        .filter(F.col("__rank") <= k + 1)
    )


def rerank(
    ranked: DataFrame,
    *,
    strata: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Merge ranked partials: re-rank the union on the STORED priorities
    (no hash recompute) and keep the top-(k+1) per stratum.  Idempotent
    and order-free — merge(merge(A) ∪ B) == merge(A ∪ B)."""
    from pyspark.sql import Window

    w_rank = Window.partitionBy(strata).orderBy(
        F.col("__pr").desc(), F.col(id_col).asc()
    )
    return (
        ranked.select(strata, id_col, "w", "__pr")
        .withColumn("__rank", F.row_number().over(w_rank))
        .filter(F.col("__rank") <= k + 1)
    )


def priority_finalize(
    top: DataFrame,
    *,
    strata: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-(k+1) partial -> the sample output (see
    :func:`priority_sample` for the schema)."""
    tau_tbl = top.filter(F.col("__rank") == k + 1).select(
        F.col(strata), F.col("__pr").alias("tau")
    )
    return (
        top.filter(F.col("__rank") <= k)
        .join(F.broadcast(tau_tbl), strata, "left")
        .select(
            F.col(strata),
            F.col(id_col),
            F.col("w"),
            F.col("__pr").alias("priority"),
            F.col("__rank").alias("sample_rank"),
            F.col("tau"),
            F.greatest(F.col("w"), F.coalesce(F.col("tau"), F.col("w"))).alias(
                "est_w"
            ),
        )
    )


def priority_sample_sql(
    table: str,
    *,
    weight: str = "n_chars",
    strata: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
    salt: str = "priority-v1",
) -> str:
    """DuckDB twin of :func:`priority_sample` (same hash, same float-op
    order, same tie-break)."""
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
WITH pri AS (
  SELECT {strata}, {id_col},
         CAST({weight} AS DOUBLE) AS w,
         CAST({weight} AS DOUBLE)
           / (CAST(({h}) + 1 AS DOUBLE) / {_HASH_SPACE!r}) AS pr
  FROM {table}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {strata}
                               ORDER BY pr DESC, {id_col} ASC) AS rnk
  FROM pri
), tau_tbl AS (
  SELECT {strata}, pr AS tau FROM ranked WHERE rnk = {k + 1}
)
SELECT r.{strata}, r.{id_col}, r.w, r.pr AS priority,
       CAST(r.rnk AS INTEGER) AS sample_rank, t.tau,
       greatest(r.w, coalesce(t.tau, r.w)) AS est_w
FROM ranked r LEFT JOIN tau_tbl t USING ({strata})
WHERE r.rnk <= {k}
"""
