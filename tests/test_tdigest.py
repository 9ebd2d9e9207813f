"""t-digest (operators/tdigest.py + streaming twin): accuracy law,
merge boundedness, multiset determinism, small-n exactness."""

from __future__ import annotations

import numpy as np
import pytest

from trend_o_meter_spark.operators.tdigest import (
    BOUND_QS,
    compress,
    quantile,
    tdigest_bounds,
    tdigest_merge,
    tdigest_partials,
    tdigest_sketch,
)


def _rank_err(v: np.ndarray, est: float, q: float) -> float:
    sv = np.sort(v)
    lo = np.searchsorted(sv, est, side="left") / len(sv)
    hi = np.searchsorted(sv, est, side="right") / len(sv)
    return 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))


# --- pure-kernel laws (numpy, no Spark) ------------------------------------


def test_small_n_singleton_centroids_exact_median():
    # With n << delta every point is its own centroid; an odd-n median
    # target lands exactly on a centroid center -> exact answer.
    v = np.arange(1.0, 102.0)  # 1..101
    m, w = compress(v, np.ones_like(v), 200)
    assert m.size == 101 and np.all(w == 1.0)
    assert quantile(m, w, 1.0, 101.0, 0.5) == 51.0


def test_compress_bounded_size_and_sorted():
    rng = np.random.default_rng(3)
    v = rng.exponential(5.0, 100_000)
    m, w = compress(v, np.ones_like(v), 200)
    assert m.size <= 2 * 200
    assert np.all(np.diff(m) >= 0)
    assert w.sum() == 100_000


def test_rank_error_bounds_heavy_tail():
    rng = np.random.default_rng(7)
    v = rng.lognormal(0.0, 2.0, 150_000)
    m, w = compress(v, np.ones_like(v), 200)
    for q, eps in BOUND_QS:
        est = quantile(m, w, float(v.min()), float(v.max()), q)
        assert _rank_err(v, est, q) <= eps / 2  # margin under the shipped bound


def test_merged_digest_keeps_bounds_and_multiset_determinism():
    rng = np.random.default_rng(11)
    v = rng.lognormal(0.0, 2.0, 120_000)
    parts = [compress(p, np.ones_like(p), 200) for p in np.array_split(v, 48)]
    cm = np.concatenate([p[0] for p in parts])
    cw = np.concatenate([p[1] for p in parts])
    m1, w1 = compress(cm, cw, 200)
    # same multiset, reversed arrival order -> identical digest
    m2, w2 = compress(cm[::-1].copy(), cw[::-1].copy(), 200)
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
    for q, eps in BOUND_QS:
        est = quantile(m1, w1, float(v.min()), float(v.max()), q)
        assert _rank_err(v, est, q) <= eps / 2


def test_quantile_monotone_in_q():
    rng = np.random.default_rng(13)
    v = rng.normal(0.0, 1.0, 50_000)
    m, w = compress(v, np.ones_like(v), 100)
    qs = np.linspace(0.001, 0.999, 97)
    ests = [quantile(m, w, float(v.min()), float(v.max()), q) for q in qs]
    assert all(a <= b + 1e-12 for a, b in zip(ests, ests[1:]))
    assert v.min() <= ests[0] and ests[-1] <= v.max()


# --- DataFrame operators -----------------------------------------------------


def test_spark_sketch_two_level_merge_equals_flat_bounds(spark):
    rng = np.random.default_rng(17)
    rows = [
        ("k%d" % (i % 2), float(x))
        for i, x in enumerate(rng.lognormal(0.0, 1.5, 6000))
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    for fanout in (None, 4):
        out = tdigest_bounds(df, keys=("event_type",), fanout=fanout).collect()
        assert len(out) == 2
        for r in out:
            assert r["n_exact"] and r["extremes_exact"]
            for q, _ in BOUND_QS:
                assert r[f"p{int(round(q * 1000))}_in_bounds"], (fanout, r)


def test_spark_partials_partition_invariant_bounds(spark):
    # Different partitionings change the partial multiset (lossy merge)
    # but never the accuracy contract.
    rng = np.random.default_rng(19)
    rows = [("a", float(x)) for x in rng.exponential(3.0, 4000)]
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "event_type string, value double").repartition(
            nparts
        )
        sk = tdigest_sketch(df, keys=("event_type",)).collect()
        assert len(sk) == 1
        assert sk[0]["n"] == 4000
        assert len(sk[0]["means"]) <= 400


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "event_type string, value double"
    )
    sk = tdigest_sketch(df, keys=("event_type",)).collect()
    assert sk[0]["n"] == 2 and sk[0]["vmin"] == 1.0 and sk[0]["vmax"] == 3.0


# --- streaming twin ----------------------------------------------------------


def test_stream_tdigest_bounds_and_replay_safe(spark, tmp_path):
    """The streaming digest (per-batch partial digests, lossy-bounded
    merge) must satisfy the same rank bounds as batch — including after
    an at-least-once replay, which must not double any batch's weight
    (n is exact, so doubling is detectable)."""
    from trend_o_meter_spark.operators.tdigest import tdigest_quantiles
    from trend_o_meter_spark.streaming.pipeline import stream_tdigest

    rng = np.random.default_rng(23)
    vals = rng.lognormal(0.0, 2.0, 3000)
    rows = [("k", float(x)) for x in vals]
    b1, b2 = rows[:1800], rows[1800:]
    results = {}
    per_batch = stream_tdigest(
        state_path=str(tmp_path / "td"),
        keys=("event_type",),
        compact_every=2,
        on_result=lambda bid, df: results.update({bid: df.collect()}),
    )
    schema = "event_type string, value double"
    per_batch(spark.createDataFrame(b1, schema), 0)
    per_batch(spark.createDataFrame(b2, schema), 1)
    per_batch(spark.createDataFrame(b2, schema), 1)  # at-least-once replay
    per_batch(spark.createDataFrame([], schema), 2)  # trigger compaction

    final = results[2]
    assert len(final) == 1
    r = final[0]
    assert r["n"] == 3000  # replay did not double
    assert r["vmin"] == float(vals.min()) and r["vmax"] == float(vals.max())
    est_df = spark.createDataFrame(
        final,
        "event_type string, means array<double>, weights array<double>, "
        "n bigint, vmin double, vmax double",
    )
    est = tdigest_quantiles(est_df, tuple(q for q, _ in BOUND_QS)).collect()[0]
    for q, eps in BOUND_QS:
        assert _rank_err(vals, est[f"est_p{int(round(q * 1000))}"], q) <= eps


def test_rollup_daily_table_shape_and_bounds(spark):
    # Per-(key, day) digest table: one row per key-day; range answer by
    # merge keeps the rank bounds and the exact fields.
    from trend_o_meter_spark.operators.tdigest import tdigest_rollup

    rng = np.random.default_rng(31)
    rows = [
        (
            "t%d" % (i % 2),
            "2024-01-%02d 12:00:00" % (1 + i % 5),
            float(x),
        )
        for i, x in enumerate(rng.lognormal(0.0, 1.5, 5000))
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double")
    df = df.select("event_type", df.ts_s.cast("timestamp").alias("ts"), "value")
    out = tdigest_rollup(df, keys=("event_type",)).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_days"] == 5
        assert r["n_exact"] and r["extremes_exact"]
        for q, _ in BOUND_QS:
            assert r[f"p{int(round(q * 1000))}_in_bounds"]


def test_bounds_audit_excludes_nulls_like_the_oracle(spark):
    # A NULL value row must not inflate n_rows or the rank denominators
    # (the digest and both oracles exclude NULLs; pre-fix the audit scan
    # counted them and flipped n_exact/tail bounds).
    rng = np.random.default_rng(37)
    rows = [("a", float(x)) for x in rng.exponential(2.0, 100)] + [("a", None)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = tdigest_bounds(df, keys=("event_type",)).collect()[0]
    assert r["n_rows"] == 100 and r["n_exact"] and r["extremes_exact"]
    for q, _ in BOUND_QS:
        assert r[f"p{int(round(q * 1000))}_in_bounds"]


def test_weighted_ingestion_bounds_vs_numpy(spark):
    # Weighted digest: rank bounds must hold on WEIGHT MASS.  Pin the
    # estimates against numpy's weighted quantile on a skewed corpus.
    rng = np.random.default_rng(41)
    vals = rng.lognormal(3.0, 1.0, 3000)
    wts = rng.integers(1, 50, 3000)
    rows = [("a", float(v), int(w)) for v, w in zip(vals, wts)]
    df = spark.createDataFrame(rows, "event_type string, value double, w long")
    r = tdigest_bounds(df, keys=("event_type",), weight="w").collect()[0]
    assert r["n_rows"] == int(wts.sum())
    assert r["n_exact"] and r["extremes_exact"]
    for q, _ in BOUND_QS:
        assert r[f"p{int(round(q * 1000))}_in_bounds"]


def test_weighted_equals_replicated_bounds():
    # A weight-w row is bound-equivalent to w replicated unit rows: the
    # weighted digest's estimates satisfy the replicated corpus's rank
    # bounds (values not bit-equal — the merge is lossy — but the
    # accuracy law is the same).
    rng = np.random.default_rng(43)
    vals = rng.exponential(5.0, 800)
    wts = rng.integers(1, 20, 800)
    rep = np.repeat(vals, wts)
    m, w = compress(vals, wts.astype(float), 200)
    for q, eps in BOUND_QS:
        est = quantile(m, w, float(vals.min()), float(vals.max()), q)
        assert _rank_err(rep, est, q) <= eps


def test_weighted_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 5), ("a", 2.0, 0), ("a", 3.0, None), ("a", 9.0, 5)],
        "event_type string, value double, w long",
    )
    from trend_o_meter_spark.operators.tdigest import tdigest_sketch

    sk = tdigest_sketch(df, keys=("event_type",), weight="w").collect()[0]
    assert sk["n"] == 10 and sk["vmin"] == 1.0 and sk["vmax"] == 9.0


def test_fractional_weights_raise(spark):
    import pytest as _pytest

    from trend_o_meter_spark.operators.tdigest import tdigest_sketch

    df = spark.createDataFrame(
        [("a", 1.0, 0.5), ("a", 2.0, 1.0)],
        "event_type string, value double, w double",
    )
    with _pytest.raises(Exception, match="integer-valued"):
        tdigest_sketch(df, keys=("event_type",), weight="w").collect()
