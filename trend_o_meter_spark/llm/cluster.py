"""Cluster-level deduplication: connected components over near-dup pairs.

Pairwise near-dup detection (:mod:`.dedup`) yields edges; an actual
dedup pass must keep ONE document per transitive cluster (A~B, B~C =>
{A,B,C} is one cluster even if A~C was never emitted).  That closure is
:func:`connected_components` — iterative min-label propagation:

* labels start as each node's own id;
* each round every node takes the min of its label and its neighbors'
  labels (one shuffle keyed by node id per round);
* converged when no label changes — at most graph-diameter rounds, and
  near-dup graphs are short-diameter (dup clusters are cliques-ish from
  LSH band collisions), so typically 3-6 rounds.

100 TB design: each round is one equi-join (edges x labels, keyed by
node id) plus one groupBy(node) min — both AQE-planned shuffles, no
driver-side data.  The driver sees only the per-round convergence COUNT
(an aggregate, O(1) rows).  Lineage is truncated every round with
``localCheckpoint`` so the plan does not grow with iterations (on a real
cluster prefer a reliable ``checkpoint`` dir; same call shape).  For
adversarially long chains (diameter ~ n), the named alternative is the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same join/agg primitives, O(log^2 n) rounds;
not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import verified_near_dups, verified_near_dups_sql


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label connected components.

    ``nodes``: one row per node (``id_col``); ``edges``: undirected pairs
    (``src_col``, ``dst_col``).  Returns ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest node id in the component.  Raises if
    ``max_iter`` rounds don't converge (diameter > max_iter — switch to
    large-star/small-star at that point, see module docstring).
    """
    # Materialize the directed edge list ONCE, then symmetrize on top of
    # the materialized data: the upstream pair pipeline (LSH + verify over
    # the full corpus) must execute exactly once, not once per union
    # branch and again per round through the loop's lineage.
    one = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    ).localCheckpoint(eager=True)
    sym = one.union(one.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = nodes.select(F.col(id_col).cast("long").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    )
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("lbl")
        )
        new = (
            labels.select("id", "lbl")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), "id")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large — use large-star/small-star)"
    )


def dedup_clusters(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    threshold: float = 0.3,
) -> DataFrame:
    """Full dedup decision: LSH -> exact verify -> transitive clusters.

    Output: ``doc_id, cluster_id, keep`` — one row per document;
    ``cluster_id`` is the min doc id of its near-dup component (own id
    for singletons) and ``keep`` marks the canonical survivor.  Filtering
    ``keep`` is the actual dedup a training pipeline applies.
    """
    pairs = verified_near_dups(
        df, text=text, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, seed=seed, threshold=threshold,
    ).select("id_a", "id_b")
    cc = connected_components(df.select(id_col), pairs, id_col=id_col)
    return cc.select(
        F.col(id_col),
        F.col("cluster_id"),
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


def dedup_clusters_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    threshold: float = 0.3,
) -> str:
    """DuckDB twin: transitive closure via a recursive CTE (min reachable
    node per document == min-label fixpoint)."""
    pair_sql = verified_near_dups_sql(
        table, text=text, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, seed=seed, threshold=threshold,
    ).strip()
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT {id_col}, {id_col} FROM {table}
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS {id_col}, min(r) AS cluster_id, (min(r) = id) AS keep
FROM reach GROUP BY id
"""


def canonical_docs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    **dedup_kwargs,
) -> DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster
    keep the LONGEST member (doc_id asc tie-break), not the smallest id
    — the canonical doc a curation pass actually publishes (near-dup
    clusters usually contain truncated/boilerplate variants of one
    best document).

    Output: ``doc_id, cluster_id, n_chars_kept, keep`` — one row per
    document.  Scale: :func:`dedup_clusters` plus one (cluster)
    arg-max via the shared ``min(struct(-len, id))`` lattice and one
    cluster-keyed join back; both AQE shuffles, state O(docs).
    """
    cc = dedup_clusters(df, text=text, id_col=id_col, **dedup_kwargs).select(
        F.col(id_col), "cluster_id"
    )
    lens = df.select(F.col(id_col), F.length(F.col(text)).alias("__len"))
    j = cc.join(lens, id_col)
    best = j.groupBy("cluster_id").agg(
        F.min(F.struct((-F.col("__len")).alias("nl"), F.col(id_col).alias("i"))).alias("__b")
    ).select(
        "cluster_id",
        F.col("__b.i").alias("__keep_id"),
        (-F.col("__b.nl")).cast("bigint").alias("n_chars_kept"),
    )
    return j.join(best, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "n_chars_kept",
        (F.col(id_col) == F.col("__keep_id")).alias("keep"),
    )


def canonical_docs_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    **dedup_kwargs,
) -> str:
    cc = dedup_clusters_sql(table, text=text, id_col=id_col, **dedup_kwargs).strip()
    return f"""
WITH cc AS ({cc}),
j AS (
  SELECT cc.{id_col}, cc.cluster_id, length(t.{text}) AS len
  FROM cc JOIN {table} t USING ({id_col})
),
best AS (
  SELECT cluster_id,
         (min(struct_pack(nl := -len, i := {id_col}))).i AS keep_id,
         CAST(-(min(struct_pack(nl := -len, i := {id_col}))).nl AS BIGINT) AS n_chars_kept
  FROM j GROUP BY 1
)
SELECT j.{id_col}, j.cluster_id, best.n_chars_kept,
       (j.{id_col} = best.keep_id) AS keep
FROM j JOIN best USING (cluster_id)
"""
