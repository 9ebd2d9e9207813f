"""Priority sampling (llm/sampling.py): selection law + estimator.

The Spark output is pinned against an independent numpy twin on a small
corpus (same md5-derived uniforms, same float-op order), then the
STATISTICAL contract — E[sum(est_w)] == true total weight (Duffield,
Lund & Thorup 2007, Thm 1) — is property-checked over a large salt
ensemble on the numpy twin alone (the twin is cheap; equality with
Spark is established first).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from trend_o_meter_spark.llm.sampling import priority_sample

HASH_SPACE = float(1 << 28)


def _u(salt: str, doc_id) -> float:
    h = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:7], 16)
    return (h + 1) / HASH_SPACE


def _numpy_priority_sample(ids, weights, *, k: int, salt: str):
    """Independent twin: returns (sampled ids, est_w by id, tau)."""
    pr = {i: w / _u(salt, i) for i, w in zip(ids, weights)}
    order = sorted(ids, key=lambda i: (-pr[i], i))
    sample = order[:k]
    tau = pr[order[k]] if len(order) > k else None
    est = {i: max(dict(zip(ids, weights))[i], tau if tau is not None else 0.0)
           for i in sample}
    return sample, est, tau


def _docs(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    ids = list(range(n))
    weights = [float(w) for w in rng.integers(1, 500, size=n)]
    return ids, weights


def test_spark_matches_numpy_twin(spark):
    ids, weights = _docs(60)
    df = spark.createDataFrame(
        [(i, w, "s0") for i, w in zip(ids, weights)],
        "doc_id long, n_chars double, source string",
    )
    out = {
        r["doc_id"]: r
        for r in priority_sample(
            df, weight="n_chars", strata="source", k=10, salt="tw"
        ).collect()
    }
    sample, est, tau = _numpy_priority_sample(ids, weights, k=10, salt="tw")
    assert sorted(out) == sorted(sample)
    for i in sample:
        assert out[i]["est_w"] == pytest.approx(est[i], abs=0.0)  # bit-equal
        assert out[i]["tau"] == pytest.approx(tau, abs=0.0)


def test_census_stratum_tau_null_and_exact(spark):
    # A stratum with <= k rows is sampled whole; tau is NULL and the
    # estimator degrades to the exact weight (census case).
    df = spark.createDataFrame(
        [(i, 10.0 * (i + 1), "tiny") for i in range(5)],
        "doc_id long, n_chars double, source string",
    )
    rows = priority_sample(df, weight="n_chars", strata="source", k=10).collect()
    assert len(rows) == 5
    assert all(r["tau"] is None for r in rows)
    assert sum(r["est_w"] for r in rows) == sum(10.0 * (i + 1) for i in range(5))


def test_estimator_unbiased_over_salt_ensemble():
    # E[sum(est_w)] == total weight, over the md5-salt randomness.
    # 400 salts x 80 docs on the numpy twin (Spark equality pinned above).
    ids, weights = _docs(80, seed=11)
    total = sum(weights)
    ests = []
    for s in range(400):
        _, est, _ = _numpy_priority_sample(ids, weights, k=12, salt=f"e{s}")
        ests.append(sum(est.values()))
    mean = float(np.mean(ests))
    sem = float(np.std(ests) / np.sqrt(len(ests)))
    assert abs(mean - total) < 4 * sem + 1e-9


def test_heavier_rows_sampled_more_often():
    # Inclusion probability must increase with weight: a 100x-heavier doc
    # should appear in far more samples than a light one.
    ids = list(range(40))
    weights = [1.0] * 39 + [100.0]
    heavy_hits = light_hits = 0
    for s in range(200):
        sample, _, _ = _numpy_priority_sample(ids, weights, k=8, salt=f"w{s}")
        heavy_hits += 39 in sample
        light_hits += 0 in sample
    assert heavy_hits > 190  # near-certain inclusion
    assert light_hits < heavy_hits / 2


def test_stream_priority_sample_equals_batch_and_replay_safe(spark, tmp_path):
    """The streaming sample (per-batch top-(k+1) partials, lossless
    re-rank merge) must be bit-identical to the batch sample over the
    union — including after an at-least-once replay of a micro-batch."""
    from trend_o_meter_spark.streaming.pipeline import stream_priority_sample

    ids, weights = _docs(90, seed=29)
    rows = [(i, w, "s%d" % (i % 2)) for i, w in zip(ids, weights)]
    b1, b2 = rows[:50], rows[50:]
    results = {}
    per_batch = stream_priority_sample(
        state_path=str(tmp_path / "ps"),
        k=8,
        compact_every=2,
        on_result=lambda bid, df: results.update(
            {bid: sorted(map(tuple, df.collect()))}
        ),
    )
    schema = "doc_id long, n_chars double, source string"
    per_batch(spark.createDataFrame(b1, schema), 0)
    per_batch(spark.createDataFrame(b2, schema), 1)
    per_batch(spark.createDataFrame(b2, schema), 1)  # at-least-once replay
    per_batch(spark.createDataFrame([], schema), 2)  # trigger compaction

    full = spark.createDataFrame(rows, schema)
    want = sorted(map(tuple, priority_sample(full, k=8).collect()))
    assert results[1] == want
    assert results[2] == want  # compaction folds without changing the sample
