"""Approximate sketches: accuracy vs exact within documented error bounds."""

from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table
from trend_o_meter_spark.workload import registry


def test_approx_sketches_accuracy(spark):
    sf = "/root/testdata/sf0.01"
    spec = {s.name: s for s in registry()}["approx_sketches"]
    approx = {r["event_type"]: r for r in spec.spark(spark, sf).collect()}
    ev = table(spark, "events", sf)
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        # round 10: the query now EMITS its accuracy check (sketch_rollup
        # recipe) — exact columns next to within-bound booleans the
        # oracle asserts TRUE.
        assert ap["exact_users"] == ex["users"]
        assert ap["users_within_5pct"] is True
        assert ap["p50_in_bounds"] is True
        assert ap["p99_in_bounds"] is True


def test_sketch_rollup_mergeable_and_accurate(spark):
    """Union of per-day HLL sketches must equal the sketch of the whole
    range (the property that makes pre-aggregated rollups answer
    arbitrary ranges), and the estimate must be near exact."""
    from pyspark.sql import functions as F

    from trend_o_meter_spark.catalog import table as cat_table

    ev = cat_table(spark, "events", "/root/testdata/sf0.01")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == direct  # lossless mergeability
    assert abs(merged - exact) / exact < 0.05


def test_cms_overestimates_and_merges_losslessly(spark):
    """CMS invariants: estimate >= exact for every key; the merged grid
    of two shards equals the grid of the union (so heavy-hitter answers
    from merged shard sketches match the single-pass sketch exactly)."""
    from trend_o_meter_spark.operators.cms import (
        cms_build,
        cms_heavy_hitters,
        cms_merge,
    )

    sf = "/root/testdata/sf0.001"
    ev = table(spark, "events", sf)
    hh = cms_heavy_hitters(ev, key="user_id", width=64, depth=4).collect()
    assert len(hh) == ev.select("user_id").distinct().count()
    assert all(r["overestimate"] >= 0 for r in hh)
    # error bound: eps = 2/width over total mass, holds w.h.p. per key —
    # with depth 4 and a 10k-row table every key should sit inside it
    n_total = ev.count()
    assert all(r["overestimate"] <= 2 * n_total / 64 for r in hh)

    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cms_merge(
        cms_build(a, key="user_id"), cms_build(b, key="user_id")
    )
    whole = cms_build(ev, key="user_id")
    m = {(r["row_id"], r["bucket"]): r["cnt"] for r in merged.collect()}
    w = {(r["row_id"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_cms_estimate_unseen_key_is_zero(spark):
    """A candidate key the sketch never saw must estimate 0 when its
    buckets are empty — the empty bucket's implicit 0 wins the min (an
    inner probe join used to inflate or drop such keys)."""
    from trend_o_meter_spark.operators.cms import cms_build, cms_estimate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sketch = cms_build(df, key="k")
    cands = spark.createDataFrame([("a",), ("never-seen-key",)], "k string")
    est = {r["k"]: r["cms_estimate"] for r in cms_estimate(sketch, cands, key="k").collect()}
    assert set(est) == {"a", "never-seen-key"}  # nothing dropped
    assert est["a"] >= 2  # CMS never undercounts
    assert est["never-seen-key"] == 0  # width 64 / 2 keys: no full collision


def test_cms_estimate_on_empty_sketch_is_all_zero(spark):
    from trend_o_meter_spark.operators.cms import cms_build, cms_estimate

    empty = cms_build(
        spark.createDataFrame([], "k string"), key="k"
    )
    cands = spark.createDataFrame([("x",), ("y",)], "k string")
    est = {r["k"]: r["cms_estimate"] for r in cms_estimate(empty, cands, key="k").collect()}
    assert est == {"x": 0, "y": 0}


def test_kmv_merge_equals_union_sketch(spark):
    """Fifth mergeable family: k-smallest-of-union merge of partial KMV
    sketches equals the sketch of the union EXACTLY (sorted BIGINT
    arrays — no tolerance)."""
    from trend_o_meter_spark.operators.theta import kmv_merge, kmv_sketch

    rows = [("t%d" % (i % 3), i % 97) for i in range(500)]
    full = spark.createDataFrame(rows, "k string, uid long")
    d1 = spark.createDataFrame(rows[:220], "k string, uid long")
    d2 = spark.createDataFrame(rows[220:], "k string, uid long")
    merged = sorted(
        (r["k"], tuple(r["kmv"]))
        for r in kmv_merge(
            kmv_sketch(d1, keys=("k",), id_col="uid", k=16),
            kmv_sketch(d2, keys=("k",), id_col="uid", k=16),
            keys=("k",),
            k=16,
        ).collect()
    )
    want = sorted(
        (r["k"], tuple(r["kmv"]))
        for r in kmv_sketch(full, keys=("k",), id_col="uid", k=16).collect()
    )
    assert merged == want


def test_kmv_estimates_accuracy(spark):
    """Estimates land near truth: per-type distincts within 25% at k=64,
    and the pairwise intersection estimate within 0.35 * union of the
    exact overlap (KMV's documented k-driven error band)."""
    from trend_o_meter_spark.catalog import table
    from trend_o_meter_spark.operators.theta import (
        kmv_estimate,
        kmv_set_estimates,
        kmv_sketch,
    )

    ev = table(spark, "events", "/root/testdata/sf0.01")
    sk = kmv_sketch(ev, keys=("event_type",), id_col="user_id", k=64)
    est = {r["event_type"]: r["est_distinct"] for r in kmv_estimate(sk, keys=("event_type",), k=64).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            __import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("user_id").alias("n")
        ).collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.25, (t, est[t], n)

    pairs = kmv_set_estimates(sk, key="event_type", k=64).collect()
    ex_sets = {
        t: {r["user_id"] for r in ev.filter(ev.event_type == t).select("user_id").distinct().collect()}
        for t in exact
    }
    for r in pairs:
        a, b = ex_sets[r["key_a"]], ex_sets[r["key_b"]]
        assert abs(r["est_union"] - len(a | b)) / len(a | b) < 0.3
        assert abs(r["est_intersection"] - len(a & b)) <= 0.35 * len(a | b)
        assert abs(r["est_a_only"] - len(a - b)) <= 0.35 * len(a | b)


def test_kmv_below_k_is_exact_even_under_ansi(spark):
    """Keys with fewer than k distinct ids take the exact branch — and
    the unused estimation expression must not error under ANSI mode
    (element_at throws out-of-bounds there; the reader is null-safe
    F.get)."""
    from trend_o_meter_spark.operators.theta import kmv_estimate, kmv_sketch

    df = spark.createDataFrame([("a", i) for i in range(5)], "k string, uid long")
    # restore-by-unset when the conf was unset before: restoring to the
    # "false" FALLBACK would pin legacy semantics (size(null) = -1) on
    # the shared session — Spark 4's unset default is ANSI ON (found
    # live: a downstream size()-based test failed only in full-suite
    # order, round 12)
    try:
        prev = spark.conf.get("spark.sql.ansi.enabled")
    except Exception:
        prev = None
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        sk = kmv_sketch(df, keys=("k",), id_col="uid", k=64)
        out = kmv_estimate(sk, keys=("k",), k=64).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    assert out[0]["n_kept"] == 5 and out[0]["est_distinct"] == 5.0


def test_kmv_global_sketch_matches_keyed_union(spark):
    """The no-keys (global) KMV form — partition-local top-k then one
    tiny sorted aggregate, no single-partition window — returns exactly
    the k smallest hashes of the whole id set (checked against a direct
    computation), regardless of partitioning."""
    from trend_o_meter_spark.llm.hashing import md5_int
    from trend_o_meter_spark.operators.theta import kmv_sketch

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(300)], "uid long").repartition(7)
    got = kmv_sketch(df, id_col="uid", k=16).collect()[0]["kmv"]
    want = sorted(
        r["h"]
        for r in df.select(md5_int(F.col("uid").cast("string"), 15).alias("h"))
        .distinct()
        .collect()
    )[:16]
    assert list(got) == want


def test_bloom_no_false_negatives_merge_and_idempotence(spark):
    """Bloom invariants: every present key probes maybe_present (no
    false negatives); shard filters union-merge to exactly the filter
    of the union; the merge is idempotent (replay-safe)."""
    from trend_o_meter_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    sf = "/root/testdata/sf0.001"
    ev = table(spark, "events", sf)
    filt = bloom_build(ev, key="user_id", keys=("event_type",), m=2048, k=3)

    present = ev.select("event_type", "user_id").distinct()
    probed = bloom_probe(
        filt, present, key="user_id", keys=("event_type",), m=2048, k=3
    )
    assert probed.filter("NOT maybe_present").count() == 0

    a = bloom_build(
        ev.filter(F.col("event_id") % 2 == 0), key="user_id", keys=("event_type",)
    )
    b = bloom_build(
        ev.filter(F.col("event_id") % 2 == 1), key="user_id", keys=("event_type",)
    )
    merged = sorted(map(tuple, bloom_merge(a, b, keys=("event_type",)).collect()))
    want = sorted(map(tuple, filt.collect()))
    assert merged == want
    # idempotent: merging a shard with itself changes nothing
    again = sorted(map(tuple, bloom_merge(a, a, keys=("event_type",)).collect()))
    assert again == sorted(map(tuple, a.collect()))


def test_bloom_fp_rate_shrinks_with_m(spark):
    """Absent keys false-positive at the standard Bloom rate: a cramped
    filter (m ~ n) misfires often, a sized one (m >> k*n) rarely."""
    from trend_o_meter_spark.operators.bloom import bloom_build, bloom_probe

    members = spark.createDataFrame([(f"in{i}",) for i in range(200)], "k string")
    absent = spark.createDataFrame([(f"out{i}",) for i in range(500)], "k string")

    def fp(m):
        filt = bloom_build(members, key="k", m=m, k=3)
        probed = bloom_probe(filt, absent, key="k", m=m, k=3)
        return probed.filter("maybe_present").count() / 500

    assert fp(256) > 0.3      # n=200 into m=256 bits: saturated
    assert fp(8192) < 0.02    # m/n = 41, k=3: fp ~ (1-e^-0.073)^3 ~ 3e-4


def test_bloom_probe_duplicate_candidates_no_false_negative(spark):
    """A candidate row appearing N times produces N*k probe rows; the
    min-based membership test must still report maybe_present for a
    present key (the sum==k form read 2k hits as a miss — a silent
    false negative for any caller probing non-distinct keys)."""
    from trend_o_meter_spark.operators.bloom import bloom_build, bloom_probe

    ev = table(spark, "events", "/root/testdata/sf0.001")
    filt = bloom_build(ev, key="user_id", m=2048, k=3)
    one = ev.select("user_id").distinct().limit(4)
    dup = one.unionByName(one).unionByName(one)  # every candidate x3
    probed = bloom_probe(filt, dup, key="user_id", m=2048, k=3).collect()
    assert len(probed) == 4  # duplicates collapse to one verdict each
    assert all(r["maybe_present"] for r in probed)
