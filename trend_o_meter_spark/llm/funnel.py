"""The end-to-end curation funnel: one call, the whole pipeline.

Every stage of a training-data curation pass exists in this package as
an independent operator; this module composes them in the canonical
order and reports the attrition funnel — the table a data lead actually
reviews before a training run:

    total -> quality rules -> exact dedup -> near-dup clusters -> token budget

Each stage consumes the SURVIVORS of the previous one (rejections are
attributed to the FIRST stage that drops a doc, like reject-reason
precedence in ``text.curation_decisions``).  The result is a tiny
funnel table (one row per stage), so the operator is aggregate-shaped:
whatever the corpus size, the driver sees five rows.

Scale: the stages chain linearly — each is its own documented shuffle
shape (map-side rules, content-hash groupBy, LSH + label propagation,
per-source cumulative window); composing them adds doc-id-keyed
semi-joins between stages, nothing quadratic.  The funnel aggregates
share the stage prefix via Spark's ReusedExchange where plans are
identical; at 100 TB you would persist each stage's survivor id set
anyway (they ARE the pipeline's checkpoint artifacts).

Reference: the reference has no curation pipeline (north-star surface);
stage semantics cite their own operators' reference notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import lineage

from . import cluster, dedup, similarity, text


def curation_funnel(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    budget_tokens: int = 1000,
) -> DataFrame:
    """Sequential curation: quality -> exact dedup -> near-dup survivor
    -> per-source token budget.  Output: ``stage_order, stage, n_docs``
    — the attrition funnel, one row per stage."""
    spark = df.sparkSession

    def _count(frame: DataFrame, order: int, name: str) -> DataFrame:
        return frame.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    qf = text.quality_filter(df, text=text_col, id_col=id_col)
    s1 = df.join(qf.filter("keep").select(id_col), id_col)

    ed = dedup.exact_dedup(s1, text=text_col, id_col=id_col)
    s2 = s1.join(ed.select(F.col("keep_id").alias(id_col)), id_col)

    dc = cluster.dedup_clusters(s2, text=text_col, id_col=id_col, threshold=threshold)
    s3 = s2.join(dc.filter("keep").select(id_col), id_col)

    tb = text.token_budget_sample(
        s3, text=text_col, id_col=id_col, budget_tokens=budget_tokens
    )
    s4 = s3.join(tb.filter("keep").select(id_col), id_col)

    funnel = (
        _count(df, 1, "total")
        .unionAll(_count(s1, 2, "quality"))
        .unionAll(_count(s2, 3, "exact_dedup"))
        .unionAll(_count(s3, 4, "near_dedup"))
        .unionAll(_count(s4, 5, "token_budget"))
    )
    return funnel.orderBy("stage_order")


def curation_funnel_sql(
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    budget_tokens: int = 1000,
) -> str:
    """Oracle twin: each stage's builder SQL nested as a subquery CTE
    (DuckDB supports WITH inside subqueries, including the recursive
    closure), chained by doc-id semi-joins, counts unioned."""
    qf = text.quality_filter_sql(table, text=text_col, id_col=id_col).strip()
    ed = dedup.exact_dedup_sql("s1", text=text_col, id_col=id_col).strip()
    dc = cluster.dedup_clusters_sql("s2", text=text_col, id_col=id_col, threshold=threshold).strip()
    tb = text.token_budget_sample_sql(
        "s3", text=text_col, id_col=id_col, budget_tokens=budget_tokens
    ).strip()
    return f"""
WITH qf AS (SELECT * FROM ({qf}) t WHERE keep),
s1 AS (SELECT d.* FROM {table} d JOIN qf USING ({id_col})),
ed AS (SELECT * FROM ({ed}) t),
s2 AS (SELECT d.* FROM s1 d JOIN (SELECT keep_id AS {id_col} FROM ed) k USING ({id_col})),
dc AS (SELECT * FROM ({dc}) t WHERE keep),
s3 AS (SELECT d.* FROM s2 d JOIN dc USING ({id_col})),
tb AS (SELECT * FROM ({tb}) t WHERE keep),
s4 AS (SELECT d.* FROM s3 d JOIN tb USING ({id_col}))
SELECT 1 AS stage_order, 'total' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM {table}
UNION ALL SELECT 2, 'quality', CAST(count(*) AS BIGINT) FROM s1
UNION ALL SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 4, 'near_dedup', CAST(count(*) AS BIGINT) FROM s3
UNION ALL SELECT 5, 'token_budget', CAST(count(*) AS BIGINT) FROM s4
ORDER BY stage_order
"""


def curation_funnel_v2(
    df: DataFrame,
    emb: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    threshold: float = 0.3,
    sem_k: int = 8,
    sem_iters: int = 2,
    sem_threshold: float = 0.35,
    min_dsir_weight: float = -0.25,
    budget_tokens: int = 1000,
) -> DataFrame:
    """The round-4 pipeline: v1's four text stages plus the two
    published-algorithm stages between near-dedup and the token budget —

        total -> quality -> exact -> near-dup -> SEMANTIC dedup
              -> DSIR floor -> token budget

    Semantic dedup (SemDeDup) runs over the embeddings of the stage-4
    survivors (``emb``'s ``vec_id`` must align with ``doc_id`` — the
    fixture contract); the DSIR importance weights are fitted on the
    FULL corpus (raw = everything, target = the quality keep set — the
    paper's composition; fitting them on the survivors alone would make
    target == raw and every log-ratio exactly zero) and stage 6 keeps
    survivors whose weight clears ``min_dsir_weight``.

    Output: ``stage_order, stage, n_docs`` — seven rows whatever the
    corpus size.

    Each stage's survivor frame is ``localCheckpoint``-ed: every stage
    feeds BOTH the next stage and its own count row, and without the
    lineage cut Spark re-executes the whole prefix per consumer — the
    k-means and recursive near-dedup subtrees ran up to 4x each (the
    same re-inlining the oracle needed MATERIALIZED for).  This is the
    Spark form of "persist each stage's survivor set", which at 100 TB
    you would do to durable storage anyway — they are the pipeline's
    checkpoint artifacts.
    """

    def _count(frame: DataFrame, order: int, name: str) -> DataFrame:
        return frame.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    def _cut(frame: DataFrame) -> DataFrame:
        return lineage.cut(frame)

    qf = text.quality_filter(df, text=text_col, id_col=id_col)
    s1 = _cut(df.join(qf.filter("keep").select(id_col), id_col))

    ed = dedup.exact_dedup(s1, text=text_col, id_col=id_col)
    s2 = _cut(s1.join(ed.select(F.col("keep_id").alias(id_col)), id_col))

    dc = cluster.dedup_clusters(s2, text=text_col, id_col=id_col, threshold=threshold)
    s3 = _cut(s2.join(dc.filter("keep").select(id_col), id_col))

    emb_surv = emb.join(
        s3.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
    )
    sd = similarity.semantic_dedup(
        emb_surv, id_col=vec_id_col, k=sem_k, iters=sem_iters, threshold=sem_threshold
    )
    s4 = _cut(
        s3.join(sd.filter("kept").select(F.col(vec_id_col).alias(id_col)), id_col)
    )

    dw = text.dsir_weights(df, text=text_col, id_col=id_col)
    s5 = _cut(
        s4.join(dw.filter(F.col("dsir_weight") >= min_dsir_weight).select(id_col), id_col)
    )

    tb = text.token_budget_sample(
        s5, text=text_col, id_col=id_col, budget_tokens=budget_tokens
    )
    s6 = s5.join(tb.filter("keep").select(id_col), id_col)

    funnel = (
        _count(df, 1, "total")
        .unionAll(_count(s1, 2, "quality"))
        .unionAll(_count(s2, 3, "exact_dedup"))
        .unionAll(_count(s3, 4, "near_dedup"))
        .unionAll(_count(s4, 5, "semantic_dedup"))
        .unionAll(_count(s5, 6, "dsir_floor"))
        .unionAll(_count(s6, 7, "token_budget"))
    )
    return funnel.orderBy("stage_order")


def curation_funnel_v2_sql(
    table: str,
    emb_table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    threshold: float = 0.3,
    sem_k: int = 8,
    sem_iters: int = 2,
    sem_threshold: float = 0.35,
    min_dsir_weight: float = -0.25,
    budget_tokens: int = 1000,
) -> str:
    """Oracle twin of :func:`curation_funnel_v2` — every stage's builder
    SQL nested as a parenthesized WITH subquery, chained by id joins.
    MATERIALIZED is load-bearing on every chain CTE: each stage is
    referenced twice (next stage + its count row), and without it
    DuckDB re-inlines the whole prefix per reference — the 7-stage
    chain re-evaluated the k-means/recursive-dedup subtrees many times
    over (measured: whole selfcheck 256 s -> 39 s at sf0.01)."""
    qf = text.quality_filter_sql(table, text=text_col, id_col=id_col).strip()
    ed = dedup.exact_dedup_sql("s1", text=text_col, id_col=id_col).strip()
    dc = cluster.dedup_clusters_sql(
        "s2", text=text_col, id_col=id_col, threshold=threshold
    ).strip()
    sd = similarity.semantic_dedup_sql(
        "emb_surv", id_col=vec_id_col, k=sem_k, iters=sem_iters, threshold=sem_threshold
    ).strip()
    dw = text.dsir_weights_sql(table, text=text_col, id_col=id_col).strip()
    tb = text.token_budget_sample_sql(
        "s5", text=text_col, id_col=id_col, budget_tokens=budget_tokens
    ).strip()
    return f"""
WITH qf AS MATERIALIZED (SELECT * FROM ({qf}) t WHERE keep),
s1 AS MATERIALIZED (SELECT d.* FROM {table} d JOIN qf USING ({id_col})),
ed AS MATERIALIZED (SELECT * FROM ({ed}) t),
s2 AS MATERIALIZED (SELECT d.* FROM s1 d JOIN (SELECT keep_id AS {id_col} FROM ed) k USING ({id_col})),
dc AS MATERIALIZED (SELECT * FROM ({dc}) t WHERE keep),
s3 AS MATERIALIZED (SELECT d.* FROM s2 d JOIN dc USING ({id_col})),
emb_surv AS MATERIALIZED (
  SELECT e.* FROM {emb_table} e
  SEMI JOIN (SELECT {id_col} AS {vec_id_col} FROM s3) s ON e.{vec_id_col} = s.{vec_id_col}
),
sd AS MATERIALIZED (SELECT * FROM ({sd}) t WHERE kept),
s4 AS MATERIALIZED (SELECT d.* FROM s3 d JOIN (SELECT {vec_id_col} AS {id_col} FROM sd) k USING ({id_col})),
dw AS MATERIALIZED (SELECT * FROM ({dw}) t WHERE dsir_weight >= {min_dsir_weight}),
s5 AS MATERIALIZED (SELECT d.* FROM s4 d JOIN dw USING ({id_col})),
tb AS MATERIALIZED (SELECT * FROM ({tb}) t WHERE keep),
s6 AS MATERIALIZED (SELECT d.* FROM s5 d JOIN tb USING ({id_col}))
SELECT 1 AS stage_order, 'total' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM {table}
UNION ALL SELECT 2, 'quality', CAST(count(*) AS BIGINT) FROM s1
UNION ALL SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 4, 'near_dedup', CAST(count(*) AS BIGINT) FROM s3
UNION ALL SELECT 5, 'semantic_dedup', CAST(count(*) AS BIGINT) FROM s4
UNION ALL SELECT 6, 'dsir_floor', CAST(count(*) AS BIGINT) FROM s5
UNION ALL SELECT 7, 'token_budget', CAST(count(*) AS BIGINT) FROM s6
ORDER BY stage_order
"""


def curation_funnel_v3(
    df: DataFrame,
    emb: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    bench_filter: str = "doc_id % 97 = 0",
    threshold: float = 0.3,
    sem_k: int = 8,
    sem_iters: int = 2,
    sem_threshold: float = 0.35,
    contam_shingle_n: int = 4,
    min_dsir_weight: float = -0.25,
    budget_tokens: int = 1000,
) -> DataFrame:
    """The round-5 pipeline: v2 plus the two hygiene stages a release
    actually gates on —

        total -> quality -> exact -> near-dup -> semantic dedup
              -> DECONTAMINATE (no eval-set gram overlap)
              -> CCNET head+middle (drop the perplexity tail)
              -> DSIR floor -> token budget

    Decontamination keeps survivors sharing ZERO ``contam_shingle_n``-
    gram shingles with the held-out bench split (``bench_filter`` over
    ``df`` — bench members are by construction 100%-contaminated and
    fall out here); the CCNet stage drops the per-source perplexity
    tail tercile (buckets computed over the FULL corpus — the bucket is
    an intrinsic property, not survivor-relative).  Output: one row per
    stage (nine), whatever the corpus size.
    """
    from . import cluster, dedup, similarity, text

    def _count(frame: DataFrame, order: int, name: str) -> DataFrame:
        return frame.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    def _cut(frame: DataFrame) -> DataFrame:
        return lineage.cut(frame)

    qf = text.quality_filter(df, text=text_col, id_col=id_col)
    s1 = _cut(df.join(qf.filter("keep").select(id_col), id_col))

    ed = dedup.exact_dedup(s1, text=text_col, id_col=id_col)
    s2 = _cut(s1.join(ed.select(F.col("keep_id").alias(id_col)), id_col))

    dc = cluster.dedup_clusters(s2, text=text_col, id_col=id_col, threshold=threshold)
    s3 = _cut(s2.join(dc.filter("keep").select(id_col), id_col))

    emb_surv = emb.join(
        s3.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
    )
    sd = similarity.semantic_dedup(
        emb_surv, id_col=vec_id_col, k=sem_k, iters=sem_iters, threshold=sem_threshold
    )
    s4 = _cut(
        s3.join(sd.filter("kept").select(F.col(vec_id_col).alias(id_col)), id_col)
    )

    bench = df.filter(bench_filter)
    cont = dedup.bloom_contamination(
        df, bench, text=text_col, id_col=id_col, shingle_n=contam_shingle_n
    )
    s5 = _cut(
        s4.join(cont.filter("n_contaminated = 0").select(id_col), id_col)
    )

    cb = text.ccnet_buckets(df, text=text_col, id_col=id_col)
    s6 = _cut(s5.join(cb.filter("bucket != 'tail'").select(id_col), id_col))

    dw = text.dsir_weights(df, text=text_col, id_col=id_col)
    s7 = _cut(
        s6.join(dw.filter(F.col("dsir_weight") >= min_dsir_weight).select(id_col), id_col)
    )

    tb = text.token_budget_sample(
        s7, text=text_col, id_col=id_col, budget_tokens=budget_tokens
    )
    s8 = s7.join(tb.filter("keep").select(id_col), id_col)

    funnel = (
        _count(df, 1, "total")
        .unionAll(_count(s1, 2, "quality"))
        .unionAll(_count(s2, 3, "exact_dedup"))
        .unionAll(_count(s3, 4, "near_dedup"))
        .unionAll(_count(s4, 5, "semantic_dedup"))
        .unionAll(_count(s5, 6, "decontaminated"))
        .unionAll(_count(s6, 7, "ccnet_head_mid"))
        .unionAll(_count(s7, 8, "dsir_floor"))
        .unionAll(_count(s8, 9, "token_budget"))
    )
    return funnel.orderBy("stage_order")


def curation_funnel_v3_sql(
    table: str,
    emb_table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    bench_filter: str = "doc_id % 97 = 0",
    threshold: float = 0.3,
    sem_k: int = 8,
    sem_iters: int = 2,
    sem_threshold: float = 0.35,
    contam_shingle_n: int = 4,
    min_dsir_weight: float = -0.25,
    budget_tokens: int = 1000,
) -> str:
    """Oracle twin of :func:`curation_funnel_v3` (MATERIALIZED chain —
    see the v2 twin's note on DuckDB CTE re-inlining)."""
    from . import cluster, dedup, similarity, text

    qf = text.quality_filter_sql(table, text=text_col, id_col=id_col).strip()
    ed = dedup.exact_dedup_sql("s1", text=text_col, id_col=id_col).strip()
    dc = cluster.dedup_clusters_sql(
        "s2", text=text_col, id_col=id_col, threshold=threshold
    ).strip()
    sd = similarity.semantic_dedup_sql(
        "emb_surv", id_col=vec_id_col, k=sem_k, iters=sem_iters, threshold=sem_threshold
    ).strip()
    ct = dedup.bloom_contamination_sql(
        table, f"(SELECT * FROM {table} WHERE {bench_filter})",
        text=text_col, id_col=id_col, shingle_n=contam_shingle_n,
    ).strip()
    cb = text.ccnet_buckets_sql(table, text=text_col, id_col=id_col).strip()
    dw = text.dsir_weights_sql(table, text=text_col, id_col=id_col).strip()
    tb = text.token_budget_sample_sql(
        "s7", text=text_col, id_col=id_col, budget_tokens=budget_tokens
    ).strip()
    return f"""
WITH qf AS MATERIALIZED (SELECT * FROM ({qf}) t WHERE keep),
s1 AS MATERIALIZED (SELECT d.* FROM {table} d JOIN qf USING ({id_col})),
ed AS MATERIALIZED (SELECT * FROM ({ed}) t),
s2 AS MATERIALIZED (SELECT d.* FROM s1 d JOIN (SELECT keep_id AS {id_col} FROM ed) k USING ({id_col})),
dc AS MATERIALIZED (SELECT * FROM ({dc}) t WHERE keep),
s3 AS MATERIALIZED (SELECT d.* FROM s2 d JOIN dc USING ({id_col})),
emb_surv AS MATERIALIZED (
  SELECT e.* FROM {emb_table} e
  SEMI JOIN (SELECT {id_col} AS {vec_id_col} FROM s3) s ON e.{vec_id_col} = s.{vec_id_col}
),
sd AS MATERIALIZED (SELECT * FROM ({sd}) t WHERE kept),
s4 AS MATERIALIZED (SELECT d.* FROM s3 d JOIN (SELECT {vec_id_col} AS {id_col} FROM sd) k USING ({id_col})),
ct AS MATERIALIZED (SELECT * FROM ({ct}) t WHERE n_contaminated = 0),
s5 AS MATERIALIZED (SELECT d.* FROM s4 d JOIN ct USING ({id_col})),
cb AS MATERIALIZED (SELECT * FROM ({cb}) t WHERE bucket != 'tail'),
s6 AS MATERIALIZED (SELECT d.* FROM s5 d JOIN cb USING ({id_col})),
dw AS MATERIALIZED (SELECT * FROM ({dw}) t WHERE dsir_weight >= {min_dsir_weight}),
s7 AS MATERIALIZED (SELECT d.* FROM s6 d JOIN dw USING ({id_col})),
tb AS MATERIALIZED (SELECT * FROM ({tb}) t WHERE keep),
s8 AS MATERIALIZED (SELECT d.* FROM s7 d JOIN tb USING ({id_col}))
SELECT 1 AS stage_order, 'total' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM {table}
UNION ALL SELECT 2, 'quality', CAST(count(*) AS BIGINT) FROM s1
UNION ALL SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 4, 'near_dedup', CAST(count(*) AS BIGINT) FROM s3
UNION ALL SELECT 5, 'semantic_dedup', CAST(count(*) AS BIGINT) FROM s4
UNION ALL SELECT 6, 'decontaminated', CAST(count(*) AS BIGINT) FROM s5
UNION ALL SELECT 7, 'ccnet_head_mid', CAST(count(*) AS BIGINT) FROM s6
UNION ALL SELECT 8, 'dsir_floor', CAST(count(*) AS BIGINT) FROM s7
UNION ALL SELECT 9, 'token_budget', CAST(count(*) AS BIGINT) FROM s8
ORDER BY stage_order
"""
