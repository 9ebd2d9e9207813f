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
(an aggregate, O(1) rows).  Lineage is truncated every round —
``localCheckpoint`` by default (executor block store), or a reliable
``checkpoint(dir)`` when ``checkpoint_dir`` is passed, which survives
executor loss on preemptible clusters.  For adversarially long chains
(diameter ~ n), label propagation hands off automatically to
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", KDD'14) — the same join/agg primitives, but
O(log^2 n) rounds regardless of diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import lineage

from .dedup import verified_near_dups, verified_near_dups_sql


def _truncate(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Cut lineage between iterations.  ``localCheckpoint`` stores blocks
    on executors — fast, but one lost executor kills the job mid-iteration;
    with ``checkpoint_dir`` set we use reliable ``checkpoint`` to that
    (HDFS/object-store) path instead, the right call on preemptible
    1000-executor clusters.

    NOTE: the checkpoint directory is SparkContext-global (there is one
    per session, not one per job), so we mutate it only when it actually
    differs from the current setting.  Two concurrent jobs in one session
    passing *different* ``checkpoint_dir`` values would still stomp each
    other mid-loop — callers sharing a session should share one dir (the
    per-job subdirectory layout under it is Spark's own rdd-id naming).
    """
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        # getCheckpointDir() returns '<qualified-uri>/<uuid>' — it never
        # string-equals the caller's path, so remember what WE last set
        # on this context instead of comparing against it (comparing was
        # a dead guard: setCheckpointDir ran, and minted a fresh uuid
        # subdir, on every iteration)
        if getattr(sc, "_tom_checkpoint_dir", None) != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
            sc._tom_checkpoint_dir = checkpoint_dir
        return df.checkpoint(eager=True)
    return lineage.cut(df, eager=True)


def _multiset_sig(df: DataFrame, c1: str, c2: str) -> tuple:
    """Order-insensitive fixpoint signature of a two-column frame: row
    count + hash-sum (summed as decimal so ANSI mode can't overflow the
    long hash values).  One cheap aggregate — never an exceptAll/join."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(c1, c2).cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _label_sig(labels: DataFrame) -> tuple:
    return _multiset_sig(labels, "id", "lbl")


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "auto",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Min-label connected components.

    ``nodes``: one row per node (``id_col``); ``edges``: undirected pairs
    (``src_col``, ``dst_col``).  Returns ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest node id in the component.

    ``algorithm``: ``"label"`` = min-label propagation (diameter-bounded
    rounds; raises past ``max_iter``), ``"star"`` = large-star/small-star
    (O(log^2 n) rounds, diameter-independent), ``"auto"`` (default) =
    label propagation, handing off to star if ``max_iter`` rounds don't
    converge — dedup graphs are short-diameter so the fast path almost
    always wins, and pathological chains still terminate.

    Convergence detection is PROBABILISTIC: a round is declared a
    fixpoint when the label multiset's (count, xxhash64-sum) signature
    stops changing — one cheap aggregate per round instead of an exact
    changed-row join.  A hash-sum collision (~2^-64 per round on random
    data, though adversarially constructible input could force one)
    would declare convergence early and return not-yet-converged labels.
    For dedup workloads this is the right trade (the alternative exact
    check is a full join per round); callers needing a hard guarantee
    can verify the returned labels with one extra propagation round and
    an equality check, or use ``algorithm="star"`` whose round count is
    structurally bounded.
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    # Materialize the directed edge list ONCE, then symmetrize on top of
    # the materialized data: the upstream pair pipeline (LSH + verify over
    # the full corpus) must execute exactly once, not once per union
    # branch and again per round through the loop's lineage.
    node_ids = nodes.select(F.col(id_col).cast("long").alias("id")).distinct()
    # restrict edges to the node set ONCE (two semi-joins on the
    # materialized list): endpoints outside `nodes` would otherwise leak
    # into the label path's output (the per-round union adds edge ids)
    # while the star path drops them — the two algorithms must return the
    # same row set for algorithm="auto" to be deterministic.
    one = _truncate(
        edges.select(
            F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
        )
        .join(node_ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(node_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst"),
        checkpoint_dir,
    )
    if algorithm == "star":
        return _star_components(node_ids, one, id_col=id_col, checkpoint_dir=checkpoint_dir)
    sym = one.union(one.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # round 0 fused into initialization: lbl = min(id, min neighbor) is
    # exactly the first propagation round's output, for one aggregate and
    # no checkpoint/convergence barrier — clique-ish dedup graphs then
    # finish in 1-2 checked rounds instead of 2-3
    minn = sym.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("__mn"))
    labels = _truncate(
        node_ids.join(minn, "id", "left").select(
            "id", F.least(F.col("id"), F.coalesce(F.col("__mn"), F.col("id"))).alias("lbl")
        ),
        checkpoint_dir,
    )
    prev_sig = _label_sig(labels)
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("lbl")
        )
        new = _truncate(
            labels.select("id", "lbl")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl")),
            checkpoint_dir,
        )
        # convergence: labels are monotone non-increasing per node, so the
        # (id,lbl) multiset hash is a fixpoint detector — one cheap
        # aggregate over the just-materialized frame, no join against the
        # previous round (halves the per-round job count)
        sig = _label_sig(new)
        labels = new
        if sig == prev_sig:
            return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster_id"))
        prev_sig = sig
    if algorithm == "auto":
        return _star_components(node_ids, one, id_col=id_col, checkpoint_dir=checkpoint_dir)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large — use algorithm='star')"
    )


def _star_components(
    node_ids: DataFrame,
    edges: DataFrame,
    *,
    id_col: str,
    checkpoint_dir: str | None,
    max_rounds: int = 60,
) -> DataFrame:
    """Large-star/small-star components (Kiveris et al., KDD'14).

    Alternates two per-node local moves until the edge set is a fixpoint:

    * large-star: every neighbor LARGER than u re-attaches to the minimum
      of u's closed neighborhood;
    * small-star: every neighbor SMALLER than u (and u itself) attaches
      to the minimum neighbor.

    Each phase is one groupBy(node) min + one node-keyed join — the same
    shuffle primitives as label propagation, but the component collapses
    geometrically: O(log^2 n) rounds on ANY graph, independent of
    diameter.  At the fixpoint every surviving edge points a node at its
    component's minimum id (a star), so labels fall out of one left join.
    ``max_rounds=60`` is a safety net far beyond log^2 of any real corpus
    (2^~7.7 nodes per doubling — 60 rounds covers >10^9 nodes many times
    over), not a tunable.
    """
    e = edges.filter(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).distinct()
    prev: tuple[int, int] | None = None
    for _ in range(max_rounds):
        # -- large-star ---------------------------------------------------
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        e = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star ---------------------------------------------------
        # orient larger -> smaller (large-star already emits that way, but
        # keep the normalization explicit so the phase is self-contained)
        o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so m < u
        e = _truncate(
            o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct(),
            checkpoint_dir,
        )
        # convergence: edge multiset unchanged
        sig = _multiset_sig(e, "u", "v")
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"star components did not converge in {max_rounds} rounds")
    stars = e.groupBy("u").agg(F.min("v").alias("lbl"))
    return node_ids.join(stars, node_ids["id"] == stars["u"], "left").select(
        node_ids["id"].alias(id_col),
        F.coalesce(F.col("lbl"), node_ids["id"]).alias("cluster_id"),
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
    algorithm: str = "auto",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full dedup decision: LSH -> exact verify -> transitive clusters.

    Output: ``doc_id, cluster_id, keep`` — one row per document;
    ``cluster_id`` is the min doc id of its near-dup component (own id
    for singletons) and ``keep`` marks the canonical survivor.  Filtering
    ``keep`` is the actual dedup a training pipeline applies.
    ``algorithm``/``checkpoint_dir`` pass through to
    :func:`connected_components`.
    """
    pairs = verified_near_dups(
        df, text=text, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, seed=seed, threshold=threshold,
    ).select("id_a", "id_b")
    cc = connected_components(
        df.select(id_col), pairs, id_col=id_col,
        algorithm=algorithm, checkpoint_dir=checkpoint_dir,
    )
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


# --- PageRank ---------------------------------------------------------------


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    edges_distinct: bool = False,
    edges_cut: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999, "The PageRank Citation
    Ranking") over an edge list — the link-analysis quality prior a
    crawl-curation pipeline ranks URLs/documents with.

    Output: ``(node, pagerank)`` with ranks rounded at 1e-9.  Nodes are
    every distinct endpoint; ranks start uniform (``1/N``) and update
    ``iters`` times as ``(1-d)/N + d * sum(in-contribs)``.

    Determinism discipline (the same trick as the moments/EWMA family):
    each node's per-iteration contribution ``rank / outdeg`` is
    quantized to a 1e-9 BIGINT *before* the per-destination sum, so the
    aggregation is exact integer addition — partial-sum ORDER cannot
    leak into the result, and the DuckDB oracle (unrolled CTEs, same
    quantization) matches bit-for-bit.  The quantization bias is
    bounded: |err| <= 5e-10 * indegree per node per iteration.

    Dangling nodes cannot occur on a symmetrized edge list (every node
    has outdeg >= 1); on a directed list their mass simply decays
    (documented simplification — the uniform-teleport term keeps ranks
    positive).

    100 TB shape: per iteration, ONE keyed equi-join (ranks x edges on
    src, both pre-partitionable by the same key) + one groupBy(dst) sum
    — the canonical Pregel-in-SQL round, same primitives as
    :func:`connected_components`; the node/edge-count anchors are 1-row
    broadcasts.  Lineage is truncated every round like the CC loop.
    """
    # materialize the edge list ONCE before the loop: it is referenced by
    # every iteration's join (plus nodes/outdeg), and an expensive edge
    # derivation (e.g. the simhash band join feeding pagerank_docs) would
    # otherwise re-execute 3 + 2*iters times through lineage.
    # ``edges_distinct=True`` skips the defensive dedup for callers whose
    # edge list is distinct by construction (see hits(): 6.5 s of the
    # 10.8 s sf0.1 edge materialization was this redundant shuffle).
    if edges_cut and not edges_distinct:
        raise ValueError(
            "edges_cut=True requires edges_distinct=True: the internal "
            "distinct() would produce a NEW multi-consumer shuffle that "
            "must be truncated — skipping the cut there re-executes it "
            "per consumer"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    if not edges_cut:
        # ``edges_cut=True``: the caller's frame is already materialized
        # behind its own lineage cut (e.g. the session-shared
        # pagerank_docs/hits_docs edge table) — re-checkpointing it would
        # copy the whole edge list once more per query call
        e = _truncate(e, checkpoint_dir)
    nodes = _truncate(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    # out-degrees are O(nodes) rows consumed by EVERY iteration's join —
    # materialize once instead of re-aggregating the full edge table per
    # round (the before plan re-ran the 4.3M-row agg each iteration)
    outdeg = _truncate(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("__od")), checkpoint_dir
    )
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))

    # Size-gated broadcast of the node-sized loop tables (the hits()
    # round-11 shave, applied here too): ranks/outdeg/contrib sit behind
    # checkpoints, so Catalyst has no stats and plans SortMergeJoin —
    # shuffling+sorting the FULL edge table every iteration.  When the
    # known node count is broadcastable, hint it and the edge table never
    # exchanges inside the loop; above the gate the keyed shuffle-join is
    # the right plan at scale and stays.
    _bc_scores = nodes.count() <= 1_000_000

    def score_side(df):
        return F.broadcast(df) if _bc_scores else df

    base = float(1.0 - damping)
    ranks = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for i in range(int(iters)):
        if i == 0:
            # Iteration 0 pulls the CONSTANT uniform vector, so the
            # ranks x edges join collapses to a function of out-degree
            # alone (same float expression, same operand order — the
            # 1.0/n division is the exact double the dense vector
            # carried, so quantized contributions are bit-identical).
            contrib = (
                e.join(score_side(outdeg), "src")
                .crossJoin(nn)
                .select(
                    "dst",
                    F.round(
                        (F.lit(1.0) / F.col("__n")) / F.col("__od") * F.lit(1e9)
                    )
                    .cast("long")
                    .alias("__cq"),
                )
                .groupBy("dst")
                .agg(F.sum("__cq").alias("__sq"))
            )
        else:
            contrib = (
                e.join(
                    score_side(ranks.withColumnRenamed("node", "src")), "src"
                )
                .join(score_side(outdeg), "src")
                .select(
                    "dst",
                    F.round(F.col("rank") / F.col("__od") * F.lit(1e9))
                    .cast("long")
                    .alias("__cq"),
                )
                .groupBy("dst")
                .agg(F.sum("__cq").alias("__sq"))
            )
        ranks = (
            nodes.crossJoin(nn)
            .join(score_side(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base) / F.col("__n")
                    + F.lit(float(damping))
                    * (F.coalesce(F.col("__sq"), F.lit(0)) / F.lit(1e9))
                ).alias("rank"),
            )
        )
        # Truncate lineage PERIODICALLY, not per round: each truncate is
        # a full materialization job, and a handful of chained join
        # stages is exactly what Catalyst/AQE handles well — only
        # unbounded loops (the CC case) need per-round cuts.  Every 5th
        # round bounds plan depth for large ``iters`` while a default
        # 3-iteration run executes as ONE job.
        if (i + 1) % 5 == 0 and (i + 1) < int(iters):
            ranks = _truncate(ranks, checkpoint_dir)
    return ranks.select("node", F.round("rank", 9).alias("pagerank"))


def pagerank_sql(
    edges_sql: str,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB twin: the iteration unrolled into CTE pairs (contribution
    sums, then ranks), one pair per round — same quantization, and the
    float literals are emitted from the PYTHON doubles (CAST from their
    repr) so e.g. ``1 - 0.85`` can never silently become an exact
    DECIMAL where Spark computed a binary double."""
    base = repr(1.0 - damping)
    d = repr(float(damping))
    parts = [
        f"e AS (SELECT {src} AS src, {dst} AS dst FROM ({edges_sql.strip()}) GROUP BY 1, 2)",
        "nodes AS (SELECT DISTINCT src AS node FROM (SELECT src FROM e UNION ALL SELECT dst FROM e))",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1)",
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, int(iters) + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst, sum(CAST(round(r.rank / o.od * 1000000000.0) AS BIGINT)) AS sq "
            f"FROM r{i-1} r JOIN e ON r.node = e.src JOIN outdeg o ON e.src = o.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node, CAST({base} AS DOUBLE) / nn.n "
            f"+ CAST({d} AS DOUBLE) * (coalesce(c{i}.sq, 0) / 1000000000.0) AS rank "
            f"FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.dst)"
        )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT node, round(rank, 9) AS pagerank FROM r{int(iters)}
"""


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    checkpoint_dir: str | None = None,
    edges_distinct: bool = False,
    edges_cut: bool = False,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment"): hubs point at good authorities,
    authorities are pointed at by good hubs — the second classic link
    prior next to :func:`pagerank` (PageRank ranks by global visit
    probability; HITS separates "collects good links" from "is a good
    target", which a crawl-frontier curator uses differently).

    Output: ``(node, authority, hub)``, L1-normalized per round (each
    score vector sums to 1 — Kleinberg's L2 choice would put a
    cross-libm-exact sqrt in the loop but non-exact squares; L1 keeps
    every normalization an integer sum, documented divergence), scores
    reported at 1e-9.

    Determinism discipline (the pagerank trick, both directions): scores
    live as 1e-9-quantized BIGINTs; each round's pull is an exact
    integer sum over in-(then out-)edges, and the only float ops are
    the two normalizing divisions — identical operand order in the
    DuckDB oracle.  Bound: per-node in-mass must stay < 9.2e18 (indeg x
    1e9) — beyond that, widen the sums to DECIMAL(38,0) in both engines.

    100 TB shape: per iteration TWO keyed join+agg rounds (edges x
    scores on src, then on dst) + two 1-row totals — the same
    Pregel-in-SQL primitives as pagerank/CC; edges materialize once.
    """
    if int(iters) < 1:
        raise ValueError(f"hits requires iters >= 1, got {iters}")
    # ``edges_distinct=True`` skips the defensive edge dedup (round-11
    # shave, VERDICT r10 task 5): callers whose edge list is distinct BY
    # CONSTRUCTION (e.g. hits_docs — ``id_a < id_b`` pairs already
    # distinct-ed, then symmetrized by a disjoint union) pay a redundant
    # full-edge-table shuffle otherwise — measured 6.5 s of the 10.8 s
    # edge materialization at sf0.1 (4.3M edges).  Values are untouched
    # either way; the oracle keeps its SELECT DISTINCT.
    if edges_cut and not edges_distinct:
        raise ValueError(
            "edges_cut=True requires edges_distinct=True (see pagerank)"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    if not edges_cut:
        # see pagerank: skip the redundant re-checkpoint of a frame the
        # caller already materialized behind a cut
        e = _truncate(e, checkpoint_dir)
    nodes = _truncate(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))

    # Size-gated broadcast of the per-round score tables (round-11
    # shave): they are O(nodes) rows behind a checkpoint, so Catalyst
    # has no stats and plans SortMergeJoin — shuffling the FULL edge
    # table every half-round (6x for iters=3).  When the node count
    # (known: `nodes` is already materialized, the count is a cheap RDD
    # job) is small enough to broadcast (~16 B/row; 1M nodes ≈ tens of
    # MB as a hashed relation), hint it and the edge table never
    # exchanges inside the loop.  Above the gate the keyed
    # shuffle-join is the right plan and we leave it alone — the
    # 50M-node regime must NOT broadcast.
    _bc_scores = nodes.count() <= 1_000_000

    def score_side(df):
        return F.broadcast(df) if _bc_scores else df

    def q9(col):
        return F.floor(col * F.lit(1e9) + F.lit(0.5)).cast("long")  # scores >= 0

    hq = None  # round 0 is the uniform vector; see below
    aq = None
    for i in range(int(iters)):
        # _truncate the node-sized raw-sum tables each half-round: both
        # are consumed TWICE (the broadcast total + the score table) and
        # the score table again by the next half-round and the final
        # join — without materialization every consumer re-runs the
        # edges x scores join, ~3x-ing the per-iteration cost (measured
        # 21.8 -> ~9 s at sf0.1).  The materialized frame is O(nodes).
        #
        # Scores stay SPARSE between rounds (round-10 shave): a node
        # absent from the raw-sum table has q exactly 0, and a zero-q
        # row contributes exactly 0 to the next half-round's integer
        # pull — so the dense zero-fill join against `nodes` (two
        # node-sized shuffles per iteration) only runs ONCE, at the
        # final output.  Values are unchanged: the oracle's dense
        # coalesce(raw, 0) rows quantize to the same 0.
        if hq is None:
            # Iteration 0 pulls a CONSTANT score (every node starts at
            # q0 = q9(1/n)), so the edges x scores join collapses to
            # indegree(dst) * q0 — one groupBy count, no join; the
            # integer product equals the oracle's sum of q0 over
            # in-edges exactly.
            araw = _truncate(
                e.groupBy("dst")
                .agg(F.count(F.lit(1)).alias("__c"))
                .crossJoin(nn)
                .select(
                    "dst",
                    (F.col("__c") * q9(F.lit(1.0) / F.col("__n"))).alias("__raw"),
                ),
                checkpoint_dir,
            )
        else:
            araw = _truncate(
                e.join(score_side(hq.withColumnRenamed("node", "src")), "src")
                .groupBy("dst")
                .agg(F.sum("q").alias("__raw")),
                checkpoint_dir,
            )
        sa = F.broadcast(araw.agg(F.sum("__raw").alias("__s")))
        aq = araw.crossJoin(sa).select(
            F.col("dst").alias("node"),
            q9(F.col("__raw").cast("double") / F.col("__s")).alias("q"),
        )
        hraw = _truncate(
            e.join(score_side(aq.withColumnRenamed("node", "dst")), "dst")
            .groupBy("src")
            .agg(F.sum("q").alias("__raw")),
            checkpoint_dir,
        )
        sh = F.broadcast(hraw.agg(F.sum("__raw").alias("__s")))
        hq = hraw.crossJoin(sh).select(
            F.col("src").alias("node"),
            q9(F.col("__raw").cast("double") / F.col("__s")).alias("q"),
        )
    return (
        nodes.join(aq.withColumnRenamed("q", "__aq"), "node", "left")
        .join(hq.withColumnRenamed("q", "__hq"), "node", "left")
        .select(
            "node",
            (F.coalesce(F.col("__aq"), F.lit(0)) / F.lit(1e9)).alias("authority"),
            (F.coalesce(F.col("__hq"), F.lit(0)) / F.lit(1e9)).alias("hub"),
        )
    )


def hits_sql(
    edges_sql: str,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> str:
    """Unrolled-CTE oracle twin of :func:`hits` (same quantization)."""
    if int(iters) < 1:
        raise ValueError(f"hits_sql requires iters >= 1, got {iters}")
    # every CTE here is re-referenced (e and nodes many times; each
    # round's scores twice) — MATERIALIZED stops DuckDB's default
    # inlining from re-evaluating the chain exponentially (iters=3
    # inlined did not finish; materialized runs in seconds)
    q9 = "CAST(floor(({x}) * 1000000000.0 + 0.5) AS BIGINT)"
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT {src} AS src, {dst} AS dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "h0 AS MATERIALIZED (SELECT node, " + q9.format(x="1.0 / n") + " AS q FROM nodes, nn)",
    ]
    for i in range(1, int(iters) + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst, CAST(sum(h.q) AS BIGINT) AS raw "
            f"FROM e JOIN h{i-1} h ON h.node = e.src GROUP BY 1)"
        )
        parts.append(f"sa{i} AS (SELECT CAST(sum(raw) AS BIGINT) AS s FROM ar{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT n.node, "
            + q9.format(x=f"CAST(coalesce(ar.raw, 0) AS DOUBLE) / s")
            + f" AS q FROM nodes n LEFT JOIN ar{i} ar ON ar.dst = n.node, sa{i})"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.src, CAST(sum(a.q) AS BIGINT) AS raw "
            f"FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1)"
        )
        parts.append(f"sh{i} AS (SELECT CAST(sum(raw) AS BIGINT) AS s FROM hr{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT n.node, "
            + q9.format(x=f"CAST(coalesce(hr.raw, 0) AS DOUBLE) / s")
            + f" AS q FROM nodes n LEFT JOIN hr{i} hr ON hr.src = n.node, sh{i})"
        )
    k = int(iters)
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT a.node, a.q / 1000000000.0 AS authority, h.q / 1000000000.0 AS hub
FROM a{k} a JOIN h{k} h USING (node)
"""
    )


# --- triangle counting ------------------------------------------------------


def triangle_counts(edges: DataFrame, *, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (a near-dup graph's triangles are its template
    families: a doc in many triangles sits inside a dense boilerplate
    clique, where a bridge doc joining two clusters sits in few).

    The compact-forward algorithm (Schank & Wagner 2005; Suri & Vassilvitskii
    WWW'11 for the MapReduce form): canonicalize + dedup edges, orient
    every edge from the (degree, id)-SMALLER endpoint to the larger,
    enumerate wedges only at each edge's low endpoint, and close them
    against the oriented edge list.  Orientation bounds every node's
    out-degree by O(sqrt(m)), so wedge enumeration is O(m^{3/2}) total
    and a degree-skewed hub (the classic failure: one boilerplate doc
    near-dup to everything makes naive wedge counting quadratic in its
    degree) generates almost no wedges — its edges all point INTO it.

    Input may contain self-loops, duplicates, or both directions (they
    are dropped/canonicalized).  Output: ``node, n_triangles`` for
    nodes in >= 1 triangle (the node universe is the caller's; a left
    join recovers zeros).  Exactness: pure integer counting —
    deterministic in any engine.  Scale: one distinct shuffle, one
    degree aggregate (broadcast-joinable), the wedge join keyed by the
    low endpoint, the closure join keyed by (v, w) — all equi-joins,
    no cartesian anywhere.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(a.alias("__a"), b.alias("__b"))
        .distinct()
        .transform(
            # two consumers (degrees + the edge-degree join) would
            # otherwise re-derive the whole upstream edge pipeline — the
            # exact_substr materialize-once discipline
            lineage.cut
        )
    )
    deg = (
        e.select(F.col("__a").alias("__n"))
        .unionByName(e.select(F.col("__b").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    ed = e.join(
        deg.select(F.col("__n").alias("__a"), F.col("__d").alias("__da")), "__a"
    ).join(deg.select(F.col("__n").alias("__b"), F.col("__d").alias("__db")), "__b")
    lo_is_a = F.struct(F.col("__da"), F.col("__a")) < F.struct(
        F.col("__db"), F.col("__b")
    )
    oriented = ed.select(
        F.when(lo_is_a, F.col("__a")).otherwise(F.col("__b")).alias("__lo"),
        F.when(lo_is_a, F.col("__b")).otherwise(F.col("__a")).alias("__hi"),
        F.when(lo_is_a, F.col("__db")).otherwise(F.col("__da")).alias("__dhi"),
        # three consumers (both wedge legs + the closure probe)
    ).transform(lineage.cut)
    e1 = oriented.select(
        "__lo", F.col("__hi").alias("__v"), F.col("__dhi").alias("__dv")
    )
    e2 = oriented.select(
        "__lo", F.col("__hi").alias("__w"), F.col("__dhi").alias("__dw")
    )
    wedges = e1.join(e2, "__lo").filter(
        F.struct(F.col("__dv"), F.col("__v")) < F.struct(F.col("__dw"), F.col("__w"))
    )
    tri = wedges.join(
        oriented.select(F.col("__lo").alias("__v"), F.col("__hi").alias("__w")),
        ["__v", "__w"],
    )
    return (
        tri.select(F.explode(F.array("__lo", "__v", "__w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def triangle_counts_sql(edges_sql: str, *, src: str = "src", dst: str = "dst") -> str:
    """DuckDB twin of :func:`triangle_counts` — the identical
    orientation ((degree, id) row comparison) and joins; integer-exact
    by construction."""
    return f"""
WITH raw_e AS ({edges_sql}),
e AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM raw_e WHERE {src} <> {dst}
),
deg AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY 1
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS lo,
         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS hi,
         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dhi
  FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
),
wedges AS (
  SELECT e1.lo, e1.hi AS v, e2.hi AS w
  FROM oriented e1 JOIN oriented e2 ON e1.lo = e2.lo
  WHERE (e1.dhi, e1.hi) < (e2.dhi, e2.hi)
),
tri AS (
  SELECT wd.lo, wd.v, wd.w
  FROM wedges wd JOIN oriented o ON o.lo = wd.v AND o.hi = wd.w
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT lo AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
) GROUP BY 1
"""
