"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus, JVM-side dot products via
  ``zip_with``/``aggregate`` (no Python in the hot path), per-query
  ``row_number`` top-k.  The correctness baseline.
* :func:`ivf_assign` / :func:`cosine_topk_ivf` — the scale path: IVF-style
  partitioning by nearest centroid; search probes only the query's cell, so
  the candidate join is keyed by cluster id instead of a full cross join.

Float determinism vs the oracle: the dot product folds the array
left-to-right in both engines over float->double casts, so the raw doubles
normally agree bit-for-bit; ordering additionally tie-breaks on rounded
similarity + candidate id so a last-ulp divergence cannot flip the top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import spread


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


DOT_SQL = "list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
NORM_SQL = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def cosine_sql(a: str, b: str) -> str:
    return f"({DOT_SQL.format(a=a, b=b)}) / (({NORM_SQL.format(a=a)}) * ({NORM_SQL.format(a=b)}))"


def cosine_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k of the corpus against the first n query ids.

    Output: ``query_id, neighbor_id, cos_sim, rank``.  The query side is
    broadcast; the corpus is scanned once — the canonical ANN baseline.
    """
    # n smallest ids PRESENT (TakeOrdered), not a dense-id `< n` filter —
    # identical on dense fixtures, still n queries on offset/sparse ids
    queries = df.orderBy(id_col).limit(n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    from pyspark.sql import Window

    cos = cosine(F.col("qvec"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_sim"), 9).desc(), F.col("neighbor_id").asc()
    )
    return (
        spread(df).crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def cosine_topk_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
) -> str:
    cos = cosine_sql("q.qvec", f"c.{vec_col}")
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qvec FROM {table}
  ORDER BY {id_col} LIMIT {n_queries}
),
scored AS (
  SELECT q.query_id, c.{id_col} AS neighbor_id, {cos} AS cos_sim
  FROM {table} c, q WHERE c.{id_col} != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos_sim, 9) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


def cosine_topk_ivf(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-probed cosine top-k — the ANN scale path.

    Corpus vectors are assigned to their nearest centroid cell
    (:func:`ivf_assign`); each query probes only its ``n_probe`` nearest
    cells, so the candidate join is an equi-join keyed by cell id
    instead of a query x corpus cross join.  Approximate by
    construction: a true neighbor living outside the probed cells is
    missed — recall/probe tradeoff, standard IVF.  Output schema matches
    :func:`cosine_topk` (``query_id, neighbor_id, cos_sim, rank``), ranks
    over the probed candidate set.

    At 100 TB: the corpus assignment is one broadcast-join pass (tiny
    centroid table), the search shuffle is keyed by cell — bounded by
    the biggest cell, which k-means balancing (or splitting hot cells)
    controls; no stage ever sees the full corpus per query.
    """
    from pyspark.sql import Window

    corpus_cells = ivf_assign(
        df, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
    ).select(F.col(id_col), F.col("cluster"))
    corpus = df.join(corpus_cells, id_col)

    # query-side: n_probe nearest cells per query (rounded cosine +
    # cluster-id tiebreak — deterministic, oracle-matched)
    # smallest-present ids for both centroid seeds and queries (see
    # cosine_topk) — cluster labels remain the seed vector ids
    cents = df.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("cluster"), F.col(vec_col).alias("cvec")
    )
    queries = df.orderBy(id_col).limit(n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(F.col("__c"), 9).desc(), F.col("cluster").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "qvec", "cluster", cosine(F.col("cvec"), F.col("qvec")).alias("__c"))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "qvec", "cluster")
    )

    cos = cosine(F.col("qvec"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_sim"), 9).desc(), F.col("neighbor_id").asc()
    )
    return (
        corpus.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def cosine_topk_ivf_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> str:
    cell_cos = cosine_sql("c.cvec", f"t.{vec_col}")
    qc_cos = cosine_sql("c.cvec", "q.qvec")
    cand_cos = cosine_sql("p.qvec", f"cc.{vec_col}")
    return f"""
WITH c AS (
  SELECT {id_col} AS cluster, {vec_col} AS cvec FROM {table}
  ORDER BY {id_col} LIMIT {n_centroids}
),
assigned AS (
  SELECT {id_col}, CAST(-(m.nc) AS BIGINT) AS cluster FROM (
    SELECT t.{id_col}, max(struct_pack(c := round({cell_cos}, 9), nc := -c.cluster)) AS m
    FROM {table} t, c GROUP BY 1
  )
),
corpus AS (
  SELECT t.*, a.cluster FROM {table} t JOIN assigned a USING ({id_col})
),
q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qvec FROM {table}
  ORDER BY {id_col} LIMIT {n_queries}
),
probes AS (
  SELECT query_id, qvec, cluster FROM (
    SELECT q.query_id, q.qvec, c.cluster,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({qc_cos}, 9) DESC, c.cluster ASC) AS pr
    FROM q, c
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.query_id, cc.{id_col} AS neighbor_id, {cand_cos} AS cos_sim
  FROM corpus cc JOIN probes p USING (cluster)
  WHERE cc.{id_col} != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos_sim, 9) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


def ivf_recall(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """ANN quality eval: recall@k of the IVF-probed search against the
    brute-force baseline, per query — the measurement that justifies (or
    rejects) an ``n_probe`` setting before pointing it at the corpus.

    Output: ``query_id, n_exact, n_hit, recall`` where ``n_hit`` counts
    exact top-k neighbors the IVF path also returned.

    Scale: both sides are the existing operators (broadcast-query scan /
    cell-keyed candidate join); the comparison adds one (query_id,
    neighbor_id)-keyed left join over 2·k·n_queries rows — noise.  In
    production you run this on a sampled query set, never the full
    corpus (the baseline side is the O(corpus · queries) scan).
    """
    ex = cosine_topk(
        df, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k
    ).select("query_id", "neighbor_id")
    ap = (
        cosine_topk_ivf(
            df, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k,
            n_centroids=n_centroids, n_probe=n_probe,
        )
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    j = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 9).alias("recall"),
        )
    )


def ivf_recall_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> str:
    ex = cosine_topk_sql(table, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k)
    ap = cosine_topk_ivf_sql(
        table, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k,
        n_centroids=n_centroids, n_probe=n_probe,
    )
    return f"""
WITH ex AS ({ex}),
ap AS ({ap})
SELECT ex.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 9) AS recall
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
GROUP BY 1
"""


# Axis-aligned sign-bit LSH: the bucket key is the sign pattern of a fixed
# subset of components — a degenerate (axis-aligned) random-hyperplane LSH
# that both engines can express identically.  Near-identical vectors land
# in the same bucket; the exact cosine filter then runs per-bucket, so the
# candidate join is keyed (one shuffle on the bucket key), never a cross
# join.  More planes => smaller buckets => higher recall loss; 6 planes is
# the tested operating point for the synthetic corpus.
_LSH_PLANES = (0, 11, 23, 37, 47, 59)


def embedding_near_dup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the ANN-flavored dedup).

    Output: ``id_a, id_b, cos_sim`` with ``id_a < id_b`` and
    ``cos_sim >= threshold``, candidates restricted to a shared sign-bit
    LSH bucket.  At 100 TB the bucket key bounds the join: skew shows up
    only if the corpus is degenerate (all vectors one orthant) — set
    ``max_bucket`` to drop over-cap sign buckets before the self-join
    (see minhash_lsh_pairs for the rationale; unlike the banded MinHash,
    a dropped sign bucket here loses its pairs entirely — it is the
    explicit "this slice is boilerplate, exact-dedup it instead" escape
    valve, off by default and in the oracle path).
    """
    bucket = F.concat_ws(
        "",
        *[
            F.when(F.element_at(F.col(vec_col), p + 1) >= 0, "1").otherwise("0")
            for p in _LSH_PLANES
        ],
    )
    keyed = spread(df).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), bucket.alias("bucket")
    )
    if max_bucket is not None:
        counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("__bn"))
        keyed = keyed.join(counts, "bucket").filter(F.col("__bn") <= max_bucket).drop("__bn")
    a = keyed.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = keyed.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    cos = cosine(F.col("vec_a"), F.col("vec_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> str:
    bucket = " || ".join(
        f"CASE WHEN {vec_col}[{p + 1}] >= 0 THEN '1' ELSE '0' END" for p in _LSH_PLANES
    )
    cos = cosine_sql("a.vec_a", "b.vec_b")
    return f"""
WITH sides AS (
  SELECT {id_col} AS vid, {vec_col} AS vec, {bucket} AS bucket FROM {table}
)
SELECT a.id_a, b.id_b, round({cos}, 6) AS cos_sim
FROM (SELECT vid AS id_a, vec AS vec_a, bucket FROM sides) a
JOIN (SELECT vid AS id_b, vec AS vec_b, bucket FROM sides) b USING (bucket)
WHERE a.id_a < b.id_b AND round({cos}, 6) >= {threshold}
"""


def ivf_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF cell assignment: nearest (by cosine) centroid per vector.

    Default "training" is deterministic — centroids are the
    ``n_centroids`` smallest ids (a stand-in with the identical
    partitioning shape; the oracle checks this form).  Pass
    ``centroids`` (``cluster, cvec`` — e.g. :func:`kmeans_centroids`
    output renamed) for real trained cells.  Output: ``vec_id, cluster,
    cos_to_centroid``.
    """
    cents = (
        centroids.select("cluster", "cvec")
        if centroids is not None
        else df.orderBy(id_col).limit(n_centroids).select(
            F.col(id_col).alias("cluster"), F.col(vec_col).alias("cvec")
        )
    )
    cos = cosine(F.col("cvec"), F.col(vec_col))
    scored = spread(df).crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col("cluster"), cos.alias("cos")
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.round(F.col("cos"), 9).alias("c"), (-F.col("cluster")).alias("nc"))).alias("__m")
    )
    return best.select(
        F.col(id_col),
        (-F.col("__m.nc")).cast("long").alias("cluster"),
        F.col("__m.c").alias("cos_to_centroid"),
    )


def ivf_assign_sql(
    table: str, *, id_col: str = "vec_id", vec_col: str = "embedding", n_centroids: int = 8
) -> str:
    cos = cosine_sql("c.cvec", f"t.{vec_col}")
    return f"""
WITH c AS (
  SELECT {id_col} AS cluster, {vec_col} AS cvec FROM {table}
  ORDER BY {id_col} LIMIT {n_centroids}
),
scored AS (
  SELECT t.{id_col}, c.cluster, {cos} AS cos FROM {table} t, c
),
best AS (
  SELECT {id_col},
         max(struct_pack(c := round(cos, 9), nc := -cluster)) AS m
  FROM scored GROUP BY 1
)
SELECT {id_col}, CAST(-(m.nc) AS BIGINT) AS cluster, (m.c) AS cos_to_centroid FROM best
"""


# --- embedding quantization -------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector: ``scale = max(|x|)/127``,
    ``q_i = floor(x_i/scale + 0.5)`` — the storage/serving compression
    step of an embedding pipeline (4x smaller, dot products stay
    proportional).  ``floor(x + 0.5)`` is used instead of round() so both
    engines share one deterministic midpoint rule.  All-zero vectors get
    scale 0 and an all-zero code.  Output: ``vec_id, scale, qvec``.

    Scale: pure per-row array expressions — map-side only, no shuffle.
    """
    v = _as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        q.alias("qvec"),
    )


def quantize_embeddings_sql(
    table: str, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    absmax = f"list_max(list_transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))"
    scale = f"({absmax} / 127.0)"
    return f"""
SELECT {id_col},
       round({scale}, 9) AS scale,
       CASE WHEN {scale} = 0
            THEN list_transform({vec_col}, x -> 0)
            ELSE list_transform({vec_col},
                                x -> CAST(floor(CAST(x AS DOUBLE) / {scale} + 0.5) AS INTEGER))
       END AS qvec
FROM {table}
"""


# --- k-means centroid training ----------------------------------------------


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def _kmeans_assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast centroids, struct-min over
    (rounded sqdist, cluster id) — the same lattice both engines share."""
    d = F.round(_sqdist(F.col("vec"), F.col("cvec")), 9)
    return (
        base.crossJoin(F.broadcast(cents))
        .select("vid", "vec", F.struct(d.alias("d"), F.col("cluster").alias("c")).alias("__s"))
        .groupBy("vid")
        .agg(F.min("__s")["c"].alias("cluster"), F.first("vec").alias("vec"))
    )


def _kmeans_recompute(assigned: DataFrame) -> DataFrame:
    """Per-dimension means, rounded to 9 so iteration state is identical
    across engines (float sums are otherwise order-sensitive)."""
    ex = assigned.select("cluster", F.posexplode("vec").alias("dim", "val"))
    means = ex.groupBy("cluster", "dim").agg(F.round(F.avg("val"), 9).alias("m"))
    packed = means.groupBy("cluster").agg(
        F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("__dm")
    )
    return packed.select(
        "cluster", F.transform(F.col("__dm"), lambda s: s["m"]).alias("cvec")
    )


def kmeans_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means — the real trainer behind
    :func:`ivf_assign`'s deterministic centroid stand-in.

    Init = the vectors of the ``k`` smallest ids; each iteration is one
    broadcast of the k centroids (KB-sized however big the corpus is) +
    one (cluster, dim) shuffle to recompute means.  Distances and means
    are rounded to 9 decimals each round so Spark and the oracle walk
    bit-identical iteration states (float addition is order-sensitive
    under parallel aggregation).  A cluster that loses all members drops
    out in both engines.  Output: ``cluster, n_members, centroid``.

    Iteration count is a fixed hyperparameter (classic for distributed
    k-means at scale) — the oracle unrolls the same ``iters`` as CTEs.
    With ``checkpoint_dir`` set, the per-iteration centroid frame is cut
    from its lineage via reliable ``checkpoint`` (the right call on
    preemptible clusters with many iterations); default is plain lazy
    lineage — k x dim rows per round stay trivially re-computable.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    from ..lineage import cut
    from .cluster import _truncate

    # base is consumed by the init TakeOrdered plus every assign round
    # (iters + 1): cut it so the vector scan+cast happens once, not
    # per-round (the _pq_train / semantic_dedup discipline).
    base = cut(
        spread(df).select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
        )
    )
    # init = the k SMALLEST ids actually present (TakeOrdered — not a
    # dense-id `vid < k` filter, which silently under-seeds on filtered
    # or offset id spaces, e.g. the survivor subsets curation_funnel_v2
    # feeds in; identical on dense fixtures)
    cents = base.orderBy("vid").limit(k).select(
        F.col("vid").cast("long").alias("cluster"), F.col("vec").alias("cvec")
    )
    for _ in range(iters):
        assigned = _kmeans_assign(base, cents)
        cents = _kmeans_recompute(assigned)
        if checkpoint_dir is not None:
            cents = _truncate(cents, checkpoint_dir)
    final = _kmeans_assign(base, cents)
    counts = final.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    return counts.join(cents, "cluster").select(
        "cluster", "n_members", F.col("cvec").alias("centroid")
    )


def _kmeans_sql_ctes(
    table: str, *, id_col: str, vec_col: str, k: int, iters: int
) -> list[str]:
    """The CTE chain of the k-means oracle (base, c0..c{iters}, a0..,
    afinal) — shared by :func:`kmeans_centroids_sql` and
    :func:`semantic_dedup_sql` so both oracles walk the identical
    iteration lattice."""
    sq = (
        "list_sum(list_transform(range(1, len(b.vec) + 1), "
        "i -> (b.vec[i] - c.cvec[i]) * (b.vec[i] - c.cvec[i])))"
    )
    assign = (
        "SELECT vid, any_value(vec) AS vec, "
        f"(min(struct_pack(d := round({sq}, 9), c := c.cluster))).c AS cluster "
        "FROM base b, c{i} c GROUP BY vid"
    )
    recompute = (
        "SELECT cluster, list(m ORDER BY dim) AS cvec FROM ("
        "  SELECT cluster, dim, round(avg(vec[dim]), 9) AS m"
        "  FROM a{i}, unnest(generate_series(1, len(vec))) AS u(dim)"
        "  GROUP BY 1, 2"
        ") GROUP BY cluster"
    )
    ctes = [
        f"base AS (SELECT {id_col} AS vid, "
        f"list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS vec FROM {table})",
        f"c0 AS (SELECT CAST(vid AS BIGINT) AS cluster, vec AS cvec "
        f"FROM base ORDER BY vid LIMIT {k})",
    ]
    for i in range(iters):
        ctes.append(f"a{i} AS ({assign.format(i=i)})")
        ctes.append(f"c{i + 1} AS ({recompute.format(i=i)})")
    ctes.append(f"afinal AS ({assign.format(i=iters)})")
    return ctes


def kmeans_centroids_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> str:
    ctes = _kmeans_sql_ctes(table, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT a.cluster, count(*) AS n_members, any_value(c.cvec) AS centroid
FROM afinal a JOIN c{iters} c USING (cluster)
GROUP BY a.cluster
"""
    )


# --- semantic deduplication (SemDeDup) ---------------------------------------


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | str = "auto",
    iters: int = 2,
    threshold: float = 0.95,
    target_cell_size: int = 128,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): cluster the
    embedding space with k-means, then drop near-duplicate members
    WITHIN each cluster, keeping per duplicate group the member least
    similar to its centroid (the paper's "keep the outlier" rule — the
    kept example carries the most marginal information).

    Deterministic variant of the paper's greedy sweep: a member is
    dropped iff SOME same-cluster member with higher keep-priority
    (lower ``(round(cos_to_centroid, 9), id)``) sits within
    ``threshold`` cosine of it.  The minimum-priority member of every
    duplicate group always survives; order-free, so Spark and the
    oracle agree bit-exactly.  (The paper iterates a Python loop over
    the similarity matrix — sequential semantics a distributed engine
    should not emulate row-by-row.)

    Output: ``vec_id, cluster, cos_to_centroid, kept``.

    Scale: the only quadratic term is per-cluster, so ``k`` MUST grow
    with the corpus — size it so ``n/k`` (expected cell size) stays
    bounded, exactly the paper's own deployment rule (k=50 000 clusters
    on LAION).  That rule is the DEFAULT: ``k="auto"`` sizes
    ``k = ceil(n / target_cell_size)`` from one cheap count, so a naive
    caller can no longer hit the fixed-k quadratic.  Pass an explicit
    int to pin k (fixtures/oracles do).  Measured (BASELINE.md round-4
    scaling probe): with k fixed at 8, 4x corpus = 7x wall-clock (cells
    grow linearly, pairs quadratically); with k scaled to corpus, 16x
    corpus = 9.2x wall-clock (near-linear; round-5 probe reruns this
    with auto-k).  The pair generator is an equi-join keyed by cluster,
    never corpus x corpus, and the k-means rounds are one KB-sized
    centroid broadcast + one (cluster, dim) shuffle each
    (:func:`kmeans_centroids`).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    from .. import lineage
    from .cluster import _truncate

    # materialize the projected vectors once: the Lloyd's loop references
    # base iters+1 times and the final assignment once more — without the
    # cut each reference re-reads and re-casts the source (the before plan
    # carried 42 parquet scans / 160 exchanges; OPTIMIZATION_r13.md)
    base = lineage.cut(
        spread(df).select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
        )
    )
    if k == "auto":
        import math

        k = max(1, math.ceil(base.count() / target_cell_size))
    elif not isinstance(k, int):
        raise ValueError(f"k must be an int or 'auto', got {k!r}")
    # init = the k SMALLEST ids actually present (TakeOrdered — not a
    # dense-id `vid < k` filter, which silently under-seeds on filtered
    # or offset id spaces, e.g. the survivor subsets curation_funnel_v2
    # feeds in; identical on dense fixtures)
    cents = base.orderBy("vid").limit(k).select(
        F.col("vid").cast("long").alias("cluster"), F.col("vec").alias("cvec")
    )
    for _ in range(iters):
        cents = _kmeans_recompute(_kmeans_assign(base, cents))
        if checkpoint_dir is not None:
            cents = _truncate(cents, checkpoint_dir)
    # final centroids are k tiny rows consumed TWICE (assignment + the
    # cos_to_centroid join): cut them so the whole training walk runs
    # once, not once per consumer
    cents = lineage.cut(cents)
    cosc = (
        _kmeans_assign(base, cents)
        .join(cents, "cluster")
        .select(
            "vid",
            "cluster",
            "vec",
            F.round(cosine(F.col("vec"), F.col("cvec")), 9).alias("cos_c"),
            # per-row L2 norm hoisted OUT of the O(cell^2) pair filter:
            # cosine(a, b) evaluates dot/(norm(a)*norm(b)) and norm is a
            # deterministic left fold, so dividing the pair dot by the
            # precomputed doubles is bit-identical while cutting per-pair
            # work from 3 array folds to 1
            norm(_as_double(F.col("vec"))).alias("__nrm"),
        )
    )
    # cosc feeds BOTH sides of the within-cluster pair join and the final
    # kept-flag join — three consumers of the full assignment lineage
    cosc = lineage.cut(cosc)
    a = cosc.select(
        F.col("cluster"),
        F.col("vid").alias("va"),
        F.col("vec").alias("veca"),
        F.col("cos_c").alias("ca"),
        F.col("__nrm").alias("na"),
    )
    b = cosc.select(
        F.col("cluster"),
        F.col("vid").alias("vb"),
        F.col("vec").alias("vecb"),
        F.col("cos_c").alias("cb"),
        F.col("__nrm").alias("nb"),
    )
    pair_cos = dot(_as_double(F.col("veca")), _as_double(F.col("vecb"))) / (
        F.col("na") * F.col("nb")
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .filter(F.round(pair_cos, 9) >= threshold)
    )
    losers = pairs.select(
        F.when(
            F.struct(F.col("ca").alias("c"), F.col("va").alias("v"))
            > F.struct(F.col("cb").alias("c"), F.col("vb").alias("v")),
            F.col("va"),
        )
        .otherwise(F.col("vb"))
        .alias("vid")
    ).distinct()
    return (
        cosc.join(losers.withColumn("__drop", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.col("cos_c").alias("cos_to_centroid"),
            F.col("__drop").isNull().alias("kept"),
        )
    )


def semantic_dedup_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
) -> str:
    ctes = _kmeans_sql_ctes(table, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    cos_cent = cosine_sql("a.vec", "c.cvec")
    cos_pair = cosine_sql("x.vec", "y.vec")
    ctes.append(
        f"""cosc AS (
  SELECT a.vid, a.cluster, a.vec, round({cos_cent}, 9) AS cos_c
  FROM afinal a JOIN c{iters} c USING (cluster)
)"""
    )
    ctes.append(
        f"""pairs AS (
  SELECT x.vid AS vx, x.cos_c AS cx, y.vid AS vy, y.cos_c AS cy
  FROM cosc x JOIN cosc y ON x.cluster = y.cluster AND x.vid < y.vid
  WHERE round({cos_pair}, 9) >= {threshold}
)"""
    )
    ctes.append(
        """losers AS (
  SELECT DISTINCT CASE WHEN struct_pack(c := cx, v := vx) > struct_pack(c := cy, v := vy)
                       THEN vx ELSE vy END AS vid
  FROM pairs
)"""
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT c.vid AS {id_col}, c.cluster, c.cos_c AS cos_to_centroid,
       l.vid IS NULL AS kept
FROM cosc c LEFT JOIN losers l USING (vid)
"""
    )


def l2_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """Brute-force squared-L2 top-k (broadcast queries, JVM fold) — the
    exact baseline the PQ/ADC path is measured against.  Output:
    ``query_id, neighbor_id, l2_sq, rank`` (ascending distance,
    9-rounded for rank determinism, reported at 6).

    Queries are the ``n_queries`` smallest ids PRESENT (TakeOrdered —
    the same pattern as the kmeans/PQ centroid inits), so offset or
    sparse id spaces still evaluate exactly ``n_queries`` queries.
    """
    from pyspark.sql import Window

    queries = df.orderBy(id_col).limit(n_queries).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    d = _sqdist(F.col("qvec"), _as_double(F.col(vec_col)))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("l2_sq"), 9).asc(), F.col("neighbor_id").asc()
    )
    return (
        spread(df).crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), d.alias("l2_sq"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("l2_sq", F.round("l2_sq", 6))
    )


def l2_topk_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
) -> str:
    sq = (
        "list_sum(list_transform(range(1, len(q.qvec) + 1), "
        f"i -> (q.qvec[i] - CAST(c.{vec_col}[i] AS DOUBLE)) "
        f"* (q.qvec[i] - CAST(c.{vec_col}[i] AS DOUBLE))))"
    )
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qvec
  FROM {table} ORDER BY {id_col} LIMIT {n_queries}
),
scored AS (
  SELECT q.query_id, c.{id_col} AS neighbor_id, {sq} AS l2_sq
  FROM {table} c, q WHERE c.{id_col} != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, l2_sq,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(l2_sq, 9) ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(l2_sq, 6) AS l2_sq, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def pq_recall(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k_codebook: int = 4,
    iters: int = 2,
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """PQ quality eval: recall@k of the ADC search against the exact
    squared-L2 baseline per query — the measurement that sizes (m, k)
    codebooks before trusting the compressed index.  Same comparison
    shape as :func:`ivf_recall`; run on a sampled query set at scale
    (the baseline side is the O(corpus x queries) scan).  Queries are
    the n smallest ids present (the :func:`l2_topk` contract), so both
    sides compare identical query sets on any id space."""
    ex = l2_topk(df, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id"
    )
    ap = (
        pq_adc_topk(
            df, id_col=id_col, vec_col=vec_col, m=m, k=k_codebook, iters=iters,
            n_queries=n_queries, topk=k,
        )
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    j = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 9).alias("recall"),
        )
    )


def pq_recall_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k_codebook: int = 4,
    iters: int = 2,
    n_queries: int = 5,
    k: int = 10,
) -> str:
    ex = l2_topk_sql(table, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k).strip()
    ap = pq_adc_topk_sql(
        table, id_col=id_col, vec_col=vec_col, m=m, k=k_codebook, iters=iters,
        n_queries=n_queries, topk=k,
    ).strip()
    return f"""
WITH ex AS (SELECT * FROM ({ex}) t),
ap AS (SELECT * FROM ({ap}) t)
SELECT ex.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 9) AS recall
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
GROUP BY 1
"""


def _pq_assign(b: DataFrame, c: DataFrame) -> DataFrame:
    d9 = F.round(_sqdist(F.col("vec"), F.col("cvec")), 9)
    return (
        b.join(F.broadcast(c), "s")
        .select(
            "vid", "s", "vec",
            F.struct(d9.alias("d"), F.col("cluster").alias("c")).alias("__s"),
        )
        .groupBy("vid", "s")
        .agg(F.min("__s")["c"].alias("cluster"), F.first("vec").alias("vec"))
    )


def _pq_recompute(assigned: DataFrame) -> DataFrame:
    ex = assigned.select("s", "cluster", F.posexplode("vec").alias("dim", "val"))
    means = ex.groupBy("s", "cluster", "dim").agg(F.round(F.avg("val"), 9).alias("m"))
    packed = means.groupBy("s", "cluster").agg(
        F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("__dm")
    )
    return packed.select(
        "s", "cluster", F.transform(F.col("__dm"), lambda x: x["m"]).alias("cvec")
    )


def _pq_train(
    df: DataFrame, *, id_col: str, vec_col: str, m: int, k: int, iters: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared PQ trainer: subspace split, Lloyd's walk, final assignment.
    Returns ``(base, codebook, assigned)`` — base rows ``(vid, s, vec)``,
    codebook rows ``(s, cluster, cvec)``, assignment ``(vid, s, cluster,
    vec)``."""
    raw = spread(df).select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec0")
    )
    # Non-divisible dims: PAD the vector with zeros to ceil(dim/m)*m (the
    # Jegou et al. convention) so the tail dimensions are quantized, not
    # silently dropped.  Zero-padding is signal-neutral: every vector pads
    # with the same zeros, so pad dimensions contribute (0-0)^2 = 0 to
    # every training and ADC distance; when dim % m == 0 this is a no-op.
    sub = F.ceil(F.size("vec0") / m).cast("int")
    base0 = raw.select(
        "vid",
        F.concat(
            F.col("vec0"),
            F.array_repeat(F.lit(0.0), sub * m - F.size("vec0")),
        ).alias("vec"),
    )
    sub_p = (F.size("vec") / m).cast("int")  # exact after padding
    parts = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("s"),
                F.slice(F.col("vec"), sub_p * s + 1, sub_p).alias("svec"),
            )
            for s in range(m)
        ]
    )
    from .. import lineage

    # materialize the subspace rows once: the Lloyd's loop, the final
    # assignment and every caller branch (codes ordering, qids, the ADC
    # distance table) otherwise re-derive scan+pad+explode per consumer
    # (pq_adc_topk's before plan: 22 parquet scans / 74 exchanges)
    base = lineage.cut(
        base0.select("vid", F.explode(parts).alias("__p")).select(
            "vid", "__p.s", F.col("__p.svec").alias("vec")
        )
    )
    # same k-smallest-present init as kmeans_centroids/semantic_dedup —
    # a dense-id `vid < k` filter would silently train EMPTY codebooks
    # on offset/sparse id spaces (every subspace shares the corpus ids,
    # so one global TakeOrdered seeds all of them)
    seed_ids = base0.orderBy("vid").limit(k).select("vid")
    cents = base.join(seed_ids, "vid", "left_semi").select(
        "s", F.col("vid").cast("long").alias("cluster"), F.col("vec").alias("cvec")
    )
    for _ in range(iters):
        cents = _pq_recompute(_pq_assign(base, cents))
    # the m*k-row codebook is consumed by the final assignment AND by the
    # callers (ADC distance tables); cut it so training runs once
    cents = lineage.cut(cents)
    return base, cents, _pq_assign(base, cents)


def pq_codes(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Product-quantization codes — the compression half of an IVF-PQ
    ANN index (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): each vector splits into ``m`` contiguous
    subvectors; each subspace trains its own ``k``-centroid codebook
    (the same deterministic Lloyd's walk as :func:`kmeans_centroids` —
    k-smallest-id init, 9-rounded distances/means); the code word is
    the per-subspace nearest-centroid id, so a vector stores ``m``
    small integers instead of ``dim`` floats (dim x 32 bits ->
    m x log2(k) bits).

    Scale: the subspace split is one map-side explode (m rows per
    vector, each 1/m-th the width); training is the kmeans shape with
    (subspace) added to every key — per iteration one m*k-row codebook
    broadcast + one (subspace, cluster, dim) mean shuffle; assignment is
    codebook-broadcast + struct-min.  Output: ``vec_id,
    codes array<bigint>`` (codes ordered by subspace).  When ``dim`` is
    not divisible by ``m`` the vectors are ZERO-PADDED to
    ``ceil(dim/m) * m`` (the Jegou et al. convention) so the tail
    dimensions are quantized rather than dropped — pad dimensions are
    identical across vectors and contribute 0 to every distance; both
    engines pad identically so the oracle matches.
    """
    if iters < 1 or m < 1:
        raise ValueError("m and iters must be >= 1")
    base, cents, final = _pq_train(df, id_col=id_col, vec_col=vec_col, m=m, k=k, iters=iters)
    ordered = final.groupBy("vid").agg(
        F.sort_array(F.collect_list(F.struct("s", "cluster"))).alias("__sc")
    )
    return ordered.select(
        F.col("vid").alias(id_col),
        F.transform(F.col("__sc"), lambda x: x["cluster"]).alias("codes"),
    )


def _pq_ctes(table: str, *, id_col: str, vec_col: str, m: int, k: int, iters: int) -> list[str]:
    """Shared oracle CTEs: ``base``, codebooks ``c0..c{iters}``, and the
    final assignment ``afinal`` — the SQL twin of :func:`_pq_train`
    (including the zero-padding of non-divisible dims)."""
    sq = (
        "list_sum(list_transform(range(1, len(b.vec) + 1), "
        "i -> (b.vec[i] - c.cvec[i]) * (b.vec[i] - c.cvec[i])))"
    )
    assign = (
        "SELECT vid, s, any_value(b.vec) AS vec, "
        f"(min(struct_pack(d := round({sq}, 9), c := c.cluster))).c AS cluster "
        "FROM base b JOIN c{i} c USING (s) GROUP BY vid, s"
    )
    recompute = (
        "SELECT s, cluster, list(m ORDER BY dim) AS cvec FROM ("
        "  SELECT s, cluster, dim, round(avg(vec[dim]), 9) AS m"
        "  FROM a{i}, unnest(generate_series(1, len(vec))) AS u(dim)"
        "  GROUP BY 1, 2, 3"
        ") GROUP BY s, cluster"
    )
    sub0 = f"CAST(ceil(len({vec_col}) / {m}) AS INT)"
    ctes = [
        # zero-pad to ceil(dim/m)*m, mirroring _pq_train
        f"padded AS (SELECT {id_col} AS vid, list_concat("
        f"list_transform({vec_col}, x -> CAST(x AS DOUBLE)), "
        f"list_transform(range({sub0} * {m} - len({vec_col})), "
        f"x -> CAST(0.0 AS DOUBLE))) AS pvec FROM {table})",
        f"base AS (SELECT vid, CAST(u.s AS INT) AS s, "
        f"list_slice(pvec, CAST(len(pvec) / {m} AS INT) * u.s + 1, "
        f"CAST(len(pvec) / {m} AS INT) * (u.s + 1)) AS vec "
        f"FROM padded, unnest(range({m})) AS u(s))",
        f"c0 AS (SELECT s, CAST(vid AS BIGINT) AS cluster, vec AS cvec FROM base "
        f"WHERE vid IN (SELECT DISTINCT vid FROM base ORDER BY vid LIMIT {k}))",
    ]
    for i in range(iters):
        ctes.append(f"a{i} AS ({assign.format(i=i)})")
        ctes.append(f"c{i + 1} AS ({recompute.format(i=i)})")
    ctes.append(f"afinal AS ({assign.format(i=iters)})")
    return ctes


def pq_codes_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k: int = 4,
    iters: int = 2,
) -> str:
    ctes = _pq_ctes(table, id_col=id_col, vec_col=vec_col, m=m, k=k, iters=iters)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT vid AS {id_col}, list(cluster ORDER BY s) AS codes
FROM afinal GROUP BY vid
"""
    )


def pq_adc_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k: int = 4,
    iters: int = 2,
    n_queries: int = 5,
    topk: int = 10,
) -> DataFrame:
    """PQ search with asymmetric distance computation (ADC) — the serving
    half of IVF-PQ: each query precomputes an m x k distance table to
    the codebooks (query subvector vs centroid, exact), then every
    corpus vector's approximate distance is the SUM OF m TABLE LOOKUPS
    over its code words — no corpus floats touched at query time.

    Scale: the distance table is n_queries x m x k rows (KB however big
    the corpus — broadcast); the corpus side joins its code rows to the
    table on (subspace, code) and sums per (query, vector) — one keyed
    join + one agg, never query x corpus float math.  Per-subspace
    distances are 9-rounded and summed as exact DECIMAL so the total is
    order-insensitive.  Output: ``query_id, neighbor_id, adc_dist,
    rank`` (ascending distance, id tie-break; self excluded).  Queries
    are the ``n_queries`` smallest ids PRESENT (same contract as
    :func:`l2_topk`, so the recall join compares identical query sets).
    """
    base, cents, assigned = _pq_train(
        df, id_col=id_col, vec_col=vec_col, m=m, k=k, iters=iters
    )
    qids = base.select("vid").distinct().orderBy("vid").limit(n_queries)
    d9 = F.round(_sqdist(F.col("vec"), F.col("cvec")), 9)
    dtab = (
        base.join(F.broadcast(qids), "vid")
        .join(F.broadcast(cents), "s")
        .select(
            F.col("vid").alias("query_id"), "s", "cluster",
            d9.cast("decimal(18,9)").alias("d"),
        )
    )
    scored = (
        assigned.select("vid", "s", "cluster")
        .join(F.broadcast(dtab), ["s", "cluster"])
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", F.col("vid").alias("neighbor_id"))
        .agg(F.sum("d").alias("__adc"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("__adc").cast("string").cast("double").alias("adc_dist"),
            "rank",
        )
    )


def pq_adc_topk_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    k: int = 4,
    iters: int = 2,
    n_queries: int = 5,
    topk: int = 10,
) -> str:
    ctes = _pq_ctes(table, id_col=id_col, vec_col=vec_col, m=m, k=k, iters=iters)
    sq = (
        "list_sum(list_transform(range(1, len(b.vec) + 1), "
        "i -> (b.vec[i] - c.cvec[i]) * (b.vec[i] - c.cvec[i])))"
    )
    ctes.append(
        "qids AS (SELECT DISTINCT vid FROM base "
        f"ORDER BY vid LIMIT {n_queries}),\n"
        "dtab AS (SELECT b.vid AS query_id, b.s, c.cluster, "
        f"CAST(round({sq}, 9) AS DECIMAL(18,9)) AS d "
        f"FROM base b JOIN qids USING (vid) JOIN c{iters} c USING (s))"
    )
    ctes.append(
        "scored AS (SELECT dtab.query_id, a.vid AS neighbor_id, sum(dtab.d) AS adc "
        "FROM afinal a JOIN dtab ON dtab.s = a.s AND dtab.cluster = a.cluster "
        "WHERE a.vid != dtab.query_id GROUP BY 1, 2)"
    )
    ctes.append(
        "ranked AS (SELECT query_id, neighbor_id, adc, "
        "row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rank "
        "FROM scored)"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT query_id, neighbor_id,
       CAST(CAST(adc AS VARCHAR) AS DOUBLE) AS adc_dist,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {topk}
"""
    )


def embedding_outliers(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Semantic-outlier curation filter: distance of each embedding to
    its k-means centroid, z-scored WITHIN the cluster — flags vectors
    that sit far from everything semantically near them (mislabeled /
    off-topic / garbage docs survive lexical filters but not this one).

    Output: ``vec_id, cluster, dist, z_score, is_outlier`` (``dist`` =
    squared L2 to the assigned centroid, rounded to 9; z NULL and
    outlier false for clusters with < 2 members or zero variance).

    Scale: centroids come from :func:`kmeans_centroids` (KB-sized
    broadcast); the assign pass is one broadcast nested-loop over k
    centroids; cluster stats are k rows.  The 9-rounded distance is
    quantized to DECIMAL(18,9) before the per-cluster sums, so the
    stats accumulate exactly in any order (the kmeans determinism
    recipe extended one level up).
    """
    km = kmeans_centroids(df, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    cents = km.select("cluster", F.col("centroid").alias("cvec"))
    base = spread(df).select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
    )
    d = F.round(_sqdist(F.col("vec"), F.col("cvec")), 9)
    assigned = (
        base.crossJoin(F.broadcast(cents))
        .select("vid", F.struct(d.alias("d"), F.col("cluster").alias("c")).alias("__s"))
        .groupBy("vid")
        .agg(F.min("__s").alias("__m"))
        .select("vid", F.col("__m.c").alias("cluster"), F.col("__m.d").alias("dist"))
    )
    dd = F.col("dist").cast("decimal(18,9)")
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dd).alias("__sd"),
        F.sum(dd * dd).alias("__sdd"),
    )
    n = F.col("__n").cast("double")
    sd = F.col("__sd").cast("string").cast("double")
    sdd = F.col("__sdd").cast("string").cast("double")
    mean = sd / n
    var = (n * sdd - sd * sd) / (n * (n - F.lit(1.0)))
    std = F.when(F.col("__n") > 1, F.sqrt(var))
    z = F.when(std > 0, F.round((F.col("dist") - mean) / std, 9))
    return (
        assigned.join(F.broadcast(stats), "cluster")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            "dist",
            z.alias("z_score"),
            F.coalesce(F.abs(z) > F.lit(float(z_threshold)), F.lit(False)).alias("is_outlier"),
        )
    )


def embedding_outliers_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    z_threshold: float = 2.0,
) -> str:
    km = kmeans_centroids_sql(table, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    sq = (
        "list_sum(list_transform(range(1, len(b.vec) + 1), "
        "i -> (b.vec[i] - km.centroid[i]) * (b.vec[i] - km.centroid[i])))"
    )
    return f"""
WITH km AS ({km}),
base2 AS (
  SELECT {id_col} AS vid,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS vec
  FROM {table}
),
assigned AS (
  SELECT b.vid,
         (min(struct_pack(d := round({sq}, 9), c := km.cluster))).c AS cluster,
         (min(struct_pack(d := round({sq}, 9), c := km.cluster))).d AS dist
  FROM base2 b, km GROUP BY b.vid
),
stats AS (
  SELECT cluster, count(*) AS n,
         sum(CAST(dist AS DECIMAL(18,9))) AS sd,
         sum(CAST(dist AS DECIMAL(18,9)) * CAST(dist AS DECIMAL(18,9))) AS sdd
  FROM assigned GROUP BY 1
),
enr AS (
  SELECT cluster,
         CAST(n AS DOUBLE) AS nd,
         CAST(CAST(sd AS VARCHAR) AS DOUBLE) AS sdv,
         CAST(CAST(sdd AS VARCHAR) AS DOUBLE) AS sddv
  FROM stats
),
zz AS (
  SELECT a.vid, a.cluster, a.dist,
         CASE WHEN (CASE WHEN nd > 1 THEN sqrt((nd * sddv - sdv * sdv) / (nd * (nd - 1.0))) END) > 0
              THEN round((a.dist - sdv / nd)
                   / (CASE WHEN nd > 1 THEN sqrt((nd * sddv - sdv * sdv) / (nd * (nd - 1.0))) END), 9)
         END AS z_score
  FROM assigned a JOIN enr USING (cluster)
)
SELECT vid AS {id_col}, cluster, dist, z_score,
       coalesce(abs(z_score) > {float(z_threshold)}, false) AS is_outlier
FROM zz
"""


def mrl_recall(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    dim: int = 16,
) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022, "Matryoshka
    Representation Learning"): recall@k of cosine top-k computed on the
    FIRST ``dim`` components against the full-dimension baseline — the
    measurement behind serving embeddings at a fraction of their stored
    width (coarse-to-fine retrieval funnels).

    Output: ``query_id, n_exact, n_hit, recall`` (the
    :func:`ivf_recall` shape, so the two ANN-quality evals read alike).

    Scale: both sides are :func:`cosine_topk` (broadcast queries, one
    corpus scan each); the truncated side slices vectors map-side before
    scoring, and the comparison join is k·n_queries rows — noise.  At
    100 TB you run the truncated scan FIRST (cheaper dot products),
    keeping this eval to decide how small ``dim`` can go.
    """
    ex = cosine_topk(
        df, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k
    ).select("query_id", "neighbor_id")
    trunc = df.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dim).alias(vec_col)
    )
    ap = (
        cosine_topk(trunc, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k)
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    j = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 9).alias("recall"),
        )
    )


def mrl_recall_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    dim: int = 16,
) -> str:
    ex = cosine_topk_sql(table, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k)
    trunc = (
        f"(SELECT {id_col}, list_slice({vec_col}, 1, {dim}) AS {vec_col} FROM {table})"
    )
    ap = cosine_topk_sql(trunc, id_col=id_col, vec_col=vec_col, n_queries=n_queries, k=k)
    return f"""
WITH ex AS ({ex}),
ap AS ({ap})
SELECT ex.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 9) AS recall
FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
GROUP BY 1
"""


def hard_negatives(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    anchor, the top-``k`` most-cosine-similar vectors whose LABEL
    DIFFERS — the negatives closest to the decision boundary, the pairs
    a contrastive loss learns the most from (the in-batch-negatives
    upgrade every embedding-model recipe ships).

    Output: ``anchor_id, anchor_label, neighbor_id, neighbor_label,
    cos_sim, rank``.  Same shape discipline as :func:`cosine_topk`:
    anchors are a TakeOrdered broadcast, the corpus is scanned once,
    per-anchor ranking is a keyed window (k rows per anchor survive the
    partial TopK), ties broken on (rounded cos, id) so both engines
    agree bit-exactly.  Scale path: swap the scan for the IVF-probed
    candidate set (:func:`ivf_assign`) exactly as cosine_topk ->
    pq_adc_topk does; the label anti-filter composes unchanged.
    """
    anchors = df.orderBy(id_col).limit(n_anchors).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("avec"),
        F.col(label_col).alias("anchor_label"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.round(F.col("cos_sim"), 9).desc(), F.col("neighbor_id").asc()
    )
    return (
        spread(df)
        .crossJoin(F.broadcast(anchors))
        .filter(F.col(label_col) != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).cast("int").alias("neighbor_label"),
            cosine(F.col("avec"), F.col(vec_col)).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def hard_negatives_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
) -> str:
    cos = cosine_sql("a.avec", f"c.{vec_col}")
    return f"""
WITH a AS (
  SELECT {id_col} AS anchor_id, {vec_col} AS avec, {label_col} AS anchor_label
  FROM {table} ORDER BY {id_col} LIMIT {n_anchors}
),
scored AS (
  SELECT a.anchor_id, a.anchor_label,
         c.{id_col} AS neighbor_id,
         CAST(c.{label_col} AS INTEGER) AS neighbor_label,
         {cos} AS cos_sim
  FROM {table} c, a WHERE c.{label_col} != a.anchor_label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
             ORDER BY round(cos_sim, 9) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT anchor_id, CAST(anchor_label AS INTEGER) AS anchor_label,
       neighbor_id, neighbor_label,
       round(cos_sim, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


def hard_negatives_ivf(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-probed hard-negative mining — the scale path
    :func:`hard_negatives`'s docstring promises, executed: corpus
    vectors live in their nearest-centroid cell (:func:`ivf_assign`),
    each anchor probes only its ``n_probe`` nearest cells, and the label
    anti-filter composes unchanged on the cell-keyed candidate join.
    Approximate by construction (a boundary negative outside the probed
    cells is missed — measured by :func:`hard_negatives_recall`).

    Output schema matches :func:`hard_negatives` (``anchor_id,
    anchor_label, neighbor_id, neighbor_label, cos_sim, rank``), ranks
    over the probed candidate set.

    At 100 TB: one broadcast-join assignment pass over the corpus, then
    a candidate join keyed by cell id — bounded by the biggest cell,
    never queries x corpus; anchors/centroids are the only broadcast
    sides.  Same shape as :func:`cosine_topk` -> :func:`cosine_topk_ivf`.
    """
    from pyspark.sql import Window

    # ONE centroid definition shared by probe selection and cell
    # assignment: derive `cents` here and pass it through ivf_assign's
    # centroids= parameter, so if the centroid rule changes (or a caller
    # wires in trained centroids) the two sides can't silently desync.
    cents = df.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("cluster"), F.col(vec_col).alias("cvec")
    )
    corpus_cells = ivf_assign(
        df, id_col=id_col, vec_col=vec_col, centroids=cents
    ).select(F.col(id_col), F.col("cluster"))
    corpus = df.join(corpus_cells, id_col)
    anchors = df.orderBy(id_col).limit(n_anchors).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("avec"),
        F.col(label_col).alias("anchor_label"),
    )
    wq = Window.partitionBy("anchor_id").orderBy(
        F.round(F.col("__c"), 9).desc(), F.col("cluster").asc()
    )
    probes = (
        anchors.crossJoin(F.broadcast(cents))
        .select(
            "anchor_id", "avec", "anchor_label", "cluster",
            cosine(F.col("cvec"), F.col("avec")).alias("__c"),
        )
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= n_probe)
        .select("anchor_id", "avec", "anchor_label", "cluster")
    )

    w = Window.partitionBy("anchor_id").orderBy(
        F.round(F.col("cos_sim"), 9).desc(), F.col("neighbor_id").asc()
    )
    return (
        corpus.join(F.broadcast(probes), "cluster")
        .filter(F.col(label_col) != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).cast("int").alias("neighbor_label"),
            cosine(F.col("avec"), F.col(vec_col)).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def hard_negatives_ivf_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> str:
    cell_cos = cosine_sql("c.cvec", f"t.{vec_col}")
    ac_cos = cosine_sql("c.cvec", "a.avec")
    cand_cos = cosine_sql("p.avec", f"cc.{vec_col}")
    return f"""
WITH c AS (
  SELECT {id_col} AS cluster, {vec_col} AS cvec FROM {table}
  ORDER BY {id_col} LIMIT {n_centroids}
),
assigned AS (
  SELECT {id_col}, CAST(-(m.nc) AS BIGINT) AS cluster FROM (
    SELECT t.{id_col}, max(struct_pack(c := round({cell_cos}, 9), nc := -c.cluster)) AS m
    FROM {table} t, c GROUP BY 1
  )
),
corpus AS (
  SELECT t.*, a.cluster FROM {table} t JOIN assigned a USING ({id_col})
),
a AS (
  SELECT {id_col} AS anchor_id, {vec_col} AS avec, {label_col} AS anchor_label
  FROM {table} ORDER BY {id_col} LIMIT {n_anchors}
),
probes AS (
  SELECT anchor_id, avec, anchor_label, cluster FROM (
    SELECT a.anchor_id, a.avec, a.anchor_label, c.cluster,
           row_number() OVER (PARTITION BY a.anchor_id
                              ORDER BY round({ac_cos}, 9) DESC, c.cluster ASC) AS pr
    FROM a, c
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.anchor_id, p.anchor_label,
         cc.{id_col} AS neighbor_id,
         CAST(cc.{label_col} AS INTEGER) AS neighbor_label,
         {cand_cos} AS cos_sim
  FROM corpus cc JOIN probes p USING (cluster)
  WHERE cc.{label_col} != p.anchor_label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
             ORDER BY round(cos_sim, 9) DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT anchor_id, CAST(anchor_label AS INTEGER) AS anchor_label,
       neighbor_id, neighbor_label,
       round(cos_sim, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


def hard_negatives_recall(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """recall@k of the IVF-probed hard-negative miner against the exact
    :func:`hard_negatives` baseline, per anchor — the measurement that
    justifies an ``n_probe`` before pointing the miner at the corpus
    (the :func:`ivf_recall` shape, so the ANN-quality evals read alike).

    Output: ``anchor_id, n_exact, n_hit, recall``."""
    ex = hard_negatives(
        df, id_col=id_col, vec_col=vec_col, label_col=label_col,
        n_anchors=n_anchors, k=k,
    ).select("anchor_id", "neighbor_id")
    ap = (
        hard_negatives_ivf(
            df, id_col=id_col, vec_col=vec_col, label_col=label_col,
            n_anchors=n_anchors, k=k, n_centroids=n_centroids, n_probe=n_probe,
        )
        .select("anchor_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    j = ex.join(ap, ["anchor_id", "neighbor_id"], "left")
    return (
        j.groupBy("anchor_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "anchor_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 9).alias("recall"),
        )
    )


def hard_negatives_recall_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_anchors: int = 5,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> str:
    ex = hard_negatives_sql(
        table, id_col=id_col, vec_col=vec_col, label_col=label_col,
        n_anchors=n_anchors, k=k,
    )
    ap = hard_negatives_ivf_sql(
        table, id_col=id_col, vec_col=vec_col, label_col=label_col,
        n_anchors=n_anchors, k=k, n_centroids=n_centroids, n_probe=n_probe,
    )
    return f"""
WITH ex AS ({ex}),
ap AS ({ap})
SELECT ex.anchor_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 9) AS recall
FROM ex LEFT JOIN ap USING (anchor_id, neighbor_id)
GROUP BY 1
"""


# --- hybrid retrieval (reciprocal rank fusion) -------------------------------


def rrf_hybrid_search(
    docs: DataFrame,
    embs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    n_candidates: int = 20,
    k: int = 10,
    k_rrf: int = 60,
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with dense cosine
    ranking by Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009: ``score(d) = sum_systems 1/(k_rrf + rank_s(d))``, the
    standard_k=60 constant) — the retrieval shape every RAG/data-mining
    pipeline runs once it has both an inverted index and an embedding
    space.  The synthetic fixture's ``vec_id`` is id-aligned with
    ``doc_id`` (both 0..N-1), which is the join convention.

    The dense query vector is the LOWEST-id embedding (the
    ``cosine_topk`` deterministic stand-in convention); the lexical
    query is the constant string.  Each system contributes its top
    ``n_candidates``; docs missing from one list contribute 0 from it
    (RRF over the union).  Output: ``doc_id, rrf_score, lex_rank,
    dense_rank, rank`` — fused top ``k``.

    Scale: BM25 is the existing map-side-filtered shape; the dense arm
    broadcasts ONE query vector over a single corpus scan and takes its
    top-k via orderBy+limit (TakeOrderedAndProject — distributed
    partial top-k, never a corpus-sized single-partition window; the
    rank windows run over <= n_candidates rows).  The fusion join is
    O(n_candidates) x O(n_candidates).
    """
    from pyspark.sql import Window

    from .text import bm25_search

    lex = bm25_search(
        docs, query, text=text_col, id_col=id_col, k=n_candidates
    ).select(F.col(id_col), F.col("rank").alias("lex_rank"))

    qv = embs.orderBy(vec_id_col).limit(1).select(
        F.col(vec_id_col).alias("__qid"), F.col(vec_col).alias("qvec")
    )
    scored = (
        spread(embs)
        .crossJoin(F.broadcast(qv))
        .filter(F.col(vec_id_col) != F.col("__qid"))
        .select(
            F.col(vec_id_col).alias(id_col),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), 9).alias("__cs"),
        )
    )
    wd = Window.orderBy(F.col("__cs").desc(), F.col(id_col).asc())
    dense = (
        scored.orderBy(F.col("__cs").desc(), F.col(id_col).asc())
        .limit(n_candidates)
        .withColumn("dense_rank", F.row_number().over(wd))
        .select(id_col, "dense_rank")
    )

    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(int(k_rrf)) + F.col(r)), F.lit(0.0)
    )
    fused = lex.join(dense, id_col, "full_outer").select(
        F.col(id_col),
        F.round(contrib("lex_rank") + contrib("dense_rank"), 9).alias("rrf_score"),
        "lex_rank",
        "dense_rank",
    )
    wr = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(wr))
    )


def rrf_hybrid_search_sql(
    doc_table: str,
    emb_table: str,
    query: str,
    *,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int = 20,
    k: int = 10,
    k_rrf: int = 60,
) -> str:
    """DuckDB oracle for :func:`rrf_hybrid_search`: the existing BM25
    oracle as a parenthesized subquery (its CTE names stay scoped), the
    dense arm recomputed with the shared cosine recipe, identical
    round-9 rank keys and the exact RRF rational sum."""
    from .text import bm25_search_sql

    bm25 = bm25_search_sql(doc_table, query, id_col=id_col, k=n_candidates)
    cos = cosine_sql("qv.qvec", f"c.{vec_col}")
    return f"""
WITH lex AS (
  SELECT * FROM ({bm25}) AS _lex
),
qv AS (
  SELECT {vec_id_col} AS qid, {vec_col} AS qvec FROM {emb_table}
  ORDER BY {vec_id_col} LIMIT 1
),
dsc AS (
  SELECT c.{vec_id_col} AS {id_col}, round({cos}, 9) AS cs
  FROM {emb_table} c, qv WHERE c.{vec_id_col} != qv.qid
),
dense AS (
  SELECT {id_col},
         CAST(row_number() OVER (ORDER BY cs DESC, {id_col} ASC) AS INTEGER) AS dense_rank
  FROM dsc QUALIFY dense_rank <= {int(n_candidates)}
),
fused AS (
  SELECT coalesce(l.{id_col}, d.{id_col}) AS {id_col},
         round(coalesce(1.0 / ({int(k_rrf)} + l.rank), 0.0)
               + coalesce(1.0 / ({int(k_rrf)} + d.dense_rank), 0.0), 9) AS rrf_score,
         l.rank AS lex_rank, d.dense_rank
  FROM lex l FULL JOIN dense d ON l.{id_col} = d.{id_col}
)
SELECT {id_col}, rrf_score, lex_rank, dense_rank,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, {id_col} ASC) AS INTEGER) AS rank
FROM fused QUALIFY rank <= {int(k)}
"""
