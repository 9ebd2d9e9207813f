"""Physical-plan audits: the 100-TB scale contract, asserted.

Correctness tests prove the operators compute the right answer; these
prove they compute it with the right PLAN — filters and projections reach
the parquet scan, small dimensions broadcast, top-k never global-sorts,
and nothing silently degrades to a cartesian product.  A regression that
keeps results correct but breaks the plan shape fails here.
"""

import pytest

from trend_o_meter_spark.workload import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    specs = {s.name: s for s in registry()}

    def plan_of(name: str) -> str:
        df = specs[name].spark(spark, SF)
        return df._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_no_cartesian_products_anywhere(spark):
    """Only the deliberately-broadcast ANN baselines may nested-loop join;
    nothing may ever fall back to a non-broadcast cartesian product.
    Also runs tools/plan_audit.py's full red-flag detector per query —
     1PART-WINDOW (a window fed by a single-partition exchange) must
    never reappear anywhere in the contract (the r1 sliding_rates bug)."""
    from tools.plan_audit import audit_plan

    for spec in registry():
        df = spec.spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, spec.name
        assert audit_plan(plan)["flags"] == "-", spec.name


def test_topk_uses_take_ordered(plans):
    # O2: newest-k compiles to TakeOrderedAndProject — per-partition heap
    # + driver merge of k rows, not a global sort.
    assert "TakeOrderedAndProject" in plans("topk_recent")


def test_customer_joins_carry_no_broadcast_hint(spark):
    # q3/q5/q18: customer grows with scale factor (~150k rows x sf) — a
    # forced broadcast(customer) is a guaranteed OOM at the 100 TB target.
    # The logical plan must carry no hint on the customer side; AQE elects
    # the join strategy from runtime sizes (asserted below).
    specs = {s.name: s for s in registry()}
    # q5 keeps exactly 2 hints (nation, region — fixed 25/5-row dims);
    # q3/q18 carry none at all.
    expected_hints = {
        "q3_shipping_priority": 0,
        "q5_region_revenue": 2,
        "q18_large_volume_orders": 0,
    }
    for q, n_hints in expected_hints.items():
        df = specs[q].spark(spark, SF)
        logical = df._jdf.queryExecution().analyzed().toString()
        assert "UnresolvedHint" not in logical, q
        assert logical.count("ResolvedHint") == n_hints, q


def test_customer_joins_broadcast_via_aqe_at_small_sf(spark):
    # With no hint, AQE must still pick a broadcast join at small sf from
    # its runtime size estimate (q17-style assertion) — proving we lost no
    # performance at test scale by dropping the hint.
    specs = {s.name: s for s in registry()}
    for q in ("q3_shipping_priority", "q5_region_revenue", "q18_large_volume_orders"):
        df = specs[q].spark(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q


def test_flagship_prunes_columns(plans):
    # The events table carries props/user_id/etc; the flagship needs only
    # 4 columns — the scan must show a pruned ReadSchema.
    p = plans("flagship_day_bins")
    scan = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    for col in ("event_id", "ts", "event_type", "value"):
        assert col in scan
    assert "props" not in scan and "user_id" not in scan


def test_filter_pushdown_reaches_scan(plans):
    # q1's shipdate predicate must appear in PushedFilters on the parquet
    # scan, not only as a post-scan Filter.
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [" in p
    pushed = next(ln for ln in p.splitlines() if "PushedFilters" in ln and "l_shipdate" in ln)
    assert "LessThanOrEqual" in pushed


def test_lsh_joins_are_keyed(plans):
    # Near-dup candidate generation joins on bucket keys — hash joins,
    # never broadcast-nested-loop over the corpus.
    for q in ("minhash_lsh_pairs", "ngram_jaccard_pairs", "embedding_near_dup"):
        p = plans(q)
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "CartesianProduct" not in p, q


def test_rolling_avg_no_global_window(plans):
    # A5 must not evaluate a window over a single unpartitioned range —
    # the per-metric partitionBy keeps every Exchange keyed.
    p = plans("rolling_current_avg")
    assert "SinglePartition" not in p


def test_sliding_rates_no_single_partition_window(plans):
    # A7/W3: the trailing range window is chunk-partitioned — at 100x span
    # a single-partition WindowExec would serialize the whole series
    # through one task.  (Was a live WARN WindowExec in BENCH_r01.)
    assert "SinglePartition" not in plans("sliding_rates_10s")


def test_pack_sequences_global_no_single_partition_window(plans):
    # The whole point of the two-level distributed prefix sum: the global
    # token cumsum must NEVER compile to a Window over Exchange
    # SinglePartition (that is the naive global-ORDER BY window the
    # operator exists to avoid).  The only window is bucket-partitioned.
    p = plans("pack_sequences_global")
    assert "SinglePartition" not in p
    assert "CartesianProduct" not in p


def test_q17_part_join_broadcasts_via_aqe(spark):
    # q17 carries no broadcast hint (part scales with sf — not a dim
    # table); at small sf AQE must still pick a broadcast join from its
    # runtime size estimate.  Final adaptive plan is only available after
    # execution.
    spec = {s.name: s for s in registry()}["q17_small_quantity_revenue"]
    df = spec.spark(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_sizes_not_broadcast(spark):
    # ngram_jaccard / verified_near_dups join per-document size relations —
    # O(corpus) rows; a forced broadcast there is a guaranteed OOM at
    # training scale.  The logical plans must carry no broadcast hint on
    # those joins (AQE may still elect broadcast at runtime from true
    # sizes — that's fine; the *hint* is the bug).
    specs = {s.name: s for s in registry()}
    for q in ("ngram_jaccard_pairs", "verified_near_dups"):
        df = specs[q].spark(spark, SF)
        logical = df._jdf.queryExecution().analyzed().toString()
        assert "UnresolvedHint" not in logical, q
        assert "ResolvedHint" not in logical, q


def test_downsample_partial_aggregates(plans):
    # the min_by downsample must do map-side partial aggregation
    # (partial_min_by before the exchange).
    p = plans("downsample_60s")
    assert "partial_min_by" in p


def test_epoch_shuffle_rank_window_is_bucket_partitioned(plans):
    # The per-row ranking window must be keyed by the hash-range bucket;
    # the only single-partition window allowed is the bucket-offset
    # cumulative sum over <= `buckets` aggregated rows, never the data.
    p = plans("epoch_shuffle")
    assert "hashpartitioning(__b" in p


def test_bm25_topk_is_take_ordered(plans):
    # Global top-k must go through TakeOrderedAndProject (per-partition
    # partial top-k), not a global sort of all scored docs.
    assert "TakeOrderedAndProject" in plans("bm25_search")


def test_q7_nation_dims_broadcast_both_roles(plans):
    """q7 joins nation twice (supplier role + customer role); both are
    fixed 25-row dims and must broadcast — no shuffle exchange keyed on
    a 25-row table."""
    p = plans("q7_volume_shipping")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q4_exists_plans_as_semi_join(plans):
    """The EXISTS subquery must plan as a left-semi join, not a full
    join + dedup."""
    p = plans("q4_priority_returns")
    assert "LeftSemi" in p


def test_q21_decorrelation_has_no_per_row_rescans(plans):
    """The double-correlated EXISTS/NOT EXISTS is decorrelated into two
    keyed aggregates — the plan must show hash aggregates over
    l_orderkey and NO nested-loop/cartesian rescans of lineitem."""
    p = plans("q21_waiting_suppliers")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_q6_filters_reach_scan(plans):
    """Q6 is nothing but pushdown: every predicate must arrive at the
    parquet scan as a PushedFilter."""
    p = plans("q6_forecast_revenue")
    assert "PushedFilters: [" in p
    seg = p[p.index("PushedFilters: [") :][:400]
    assert "l_shipdate" in seg and "l_discount" in seg and "l_quantity" in seg


def test_dsir_bucket_tables_broadcast(plans):
    """DSIR's whole design point: the bucket-count side stays
    <= n_buckets rows and must broadcast into the per-doc join — a
    shuffle join on bucket would mean the hashing bought nothing."""
    p = plans("dsir_weights")
    assert "BroadcastHashJoin" in p


def test_plan_audit_detects_single_partition_window(spark):
    """The 1PART-WINDOW detector must actually fire on a real global
    window (it was dead code for three rounds: a break on the Sort line
    that always sits between Window and its Exchange meant the
    SinglePartition line was never reached)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tools.plan_audit import audit_plan

    bad = spark.range(1000).withColumn(
        "r", F.row_number().over(Window.orderBy("id")) + F.col("id")
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "1PART-WINDOW" in audit_plan(plan)["flags"]

    good = spark.range(1000).withColumn("k", F.col("id") % 7).withColumn(
        "r", F.row_number().over(Window.partitionBy("k").orderBy("id")) + F.col("id")
    )
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "1PART-WINDOW" not in audit_plan(plan)["flags"]


def test_plan_audit_detects_broadcast_of_unbounded_distinct(spark):
    """The BC-UNBOUNDED-DISTINCT detector (round 13, from the r12
    bloom_membership finding) must fire on a plan that HINT-forces a
    broadcast of a distinct over an ID-like column, must NOT fire on
    the fixed orientation (broadcasting a bounded-domain distinct),
    and — the discrimination the audit's third explain pass provides —
    must NOT fire on a STATS-chosen broadcast of the same distinct
    (under autoBroadcastJoinThreshold=-1 such exchanges vanish; at
    100x scale AQE re-picks a shuffle join for them, so they are not
    the scale hazard the forced hint is)."""
    import pyspark.sql.functions as F

    from tools.plan_audit import bc_unbounded_distinct

    df = spark.range(1000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
    )
    groups = df.select("event_type").distinct()
    universe = df.select("user_id").distinct()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def plan_of(d):
            return d._jdf.queryExecution().executedPlan().toString()

        bad = groups.crossJoin(F.broadcast(universe))
        assert bc_unbounded_distinct(plan_of(bad))

        good = universe.crossJoin(F.broadcast(groups))
        assert not bc_unbounded_distinct(plan_of(good))

        # stats-only broadcast candidate: no hint anywhere — with the
        # threshold disabled no BroadcastExchange exists, so no flag
        stats = df.join(universe, "user_id")
        assert "BroadcastExchange" not in plan_of(stats)
        assert not bc_unbounded_distinct(plan_of(stats))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_kmv_rank_plans_as_window_group_limit(plans):
    """The KMV sketch's rank<=k must plan as WindowGroupLimit (per-
    partition top-k heaps below the shuffle), never a full per-key sort
    materialization — the property that keeps hash sets out of single
    tasks at 100 TB."""
    plan = plans("kmv_distinct_users")
    assert "WindowGroupLimit" in plan, plan


def test_logreg_iteration_is_single_global_aggregate(spark):
    """Each logreg GD iteration aggregates pre-quantized BIGINTs in one
    global HashAggregate pair (partial + final) — no windows, no joins,
    no cartesian — so the shuffle carries k+1 rows at any corpus size."""
    from pyspark.sql import functions as F

    from trend_o_meter_spark.catalog import table
    from trend_o_meter_spark.llm.classifier import DEFAULT_FEATURES

    d = table(spark, "documents", SF)
    base = d.select(
        *[F.expr(sql).alias(n) for n, sql in DEFAULT_FEATURES.items()],
        F.expr("CAST((lang = 'en') AS INT)").alias("__y"),
    )
    agg = base.agg(
        F.count(F.lit(1)), *[F.sum(n) for n in DEFAULT_FEATURES]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan and "Window" not in plan
