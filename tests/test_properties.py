"""Property-based tests (SURVEY §5.3) — hypothesis-generated event series
checked against hand-rolled Python models of the operator contracts.

Each property runs a bounded number of examples (Spark round-trips are
~0.5 s each); the models are intentionally naive O(n^2)-ish Python so
they can't share a bug with the Spark implementations.
"""

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trend_o_meter_spark.operators.daybins import day_binned_extremes
from trend_o_meter_spark.operators.downsample import (
    downsample_anchored,
    downsample_fixed_grid,
)

BASE = 1_700_000_000

samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10 * 86400),  # ts offset (sec)
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    # deterministic examples: CI runs must not explore new random cases
    derandomize=True,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, float(BASE + off), "m", float(v)) for i, (off, v) in enumerate(rows)],
        "event_id long, epoch double, metric string, value double",
    ).select("event_id", F.timestamp_seconds("epoch").alias("ts"), "metric", "value")


@given(rows=samples)
@settings(**SETTINGS)
def test_fixed_grid_downsample_properties(spark, rows):
    out = downsample_fixed_grid(
        _df(spark, rows), ts="ts", keys=("metric",), gap_seconds=60, tiebreak=("event_id",)
    ).collect()
    kept = {r["event_id"]: r for r in out}
    # model: first (ts, event_id) per 60s epoch cell
    by_cell: dict[int, tuple] = {}
    for i, (off, v) in enumerate(rows):
        cell = (BASE + off) // 60
        cand = (off, i)
        if cell not in by_cell or cand < by_cell[cell]:
            by_cell[cell] = cand
    expected_ids = {i for (_, i) in by_cell.values()}
    assert set(kept) == expected_ids
    # gap property: kept samples in the same cell never co-exist
    cells = [int(r["ts"].timestamp() // 60) for r in out]
    assert len(cells) == len(set(cells))


@given(rows=samples)
@settings(**SETTINGS)
def test_anchored_downsample_properties(spark, rows):
    gap = 60
    out = downsample_anchored(
        _df(spark, rows), ts="ts", keys=("metric",), gap_seconds=gap, newest_first=True
    ).collect()
    kept_offsets = sorted(r["ts"].timestamp() - BASE for r in out)
    # model: newest-first scan, keep iff |ts - mark| > gap
    mark = None
    expected = []
    for off, _ in sorted(rows, key=lambda t: -t[0]):
        if mark is None or abs(off - mark) > gap:
            expected.append(off)
            mark = off
    assert kept_offsets == sorted(expected)
    # newest sample always kept; consecutive kept gaps (scan order) > gap
    assert max(o for o, _ in rows) in kept_offsets
    desc = sorted(kept_offsets, reverse=True)
    assert all(a - b > gap for a, b in zip(desc, desc[1:]))


@given(rows=samples, min_hours=st.integers(min_value=0, max_value=48))
@settings(**SETTINGS)
def test_day_bins_partition_properties(spark, rows, min_hours):
    bins = (1, 3, 5, 7)
    out = day_binned_extremes(
        _df(spark, rows),
        ts="ts",
        value="value",
        metric="metric",
        day_bins=bins,
        min_data_hours=min_hours,
    ).collect()
    # bins partition the input: counts sum to total
    assert sum(r["n_samples"] for r in out) == len(rows)
    anchor = max(off for off, _ in rows)
    by_bin: dict[str, list] = {}
    for off, v in rows:
        age = anchor - off
        label = next((str(b) for b in bins if age <= b * 86400), "rest")
        by_bin.setdefault(label, []).append((off, v))
    assert {r["day_bin"] for r in out} == set(by_bin)
    for r in out:
        vals = [v for _, v in by_bin[r["day_bin"]]]
        offs = [o for o, _ in by_bin[r["day_bin"]]]
        assert r["min_val"] == pytest.approx(min(vals))
        assert r["max_val"] == pytest.approx(max(vals))
        assert r["n_samples"] == len(vals)
        span_h = -((max(offs) - min(offs)) // -3600)  # ceil
        assert r["is_complete"] == (span_h > min_hours)
        # extremes' timestamps actually carry the extreme values
        tmin = r["min_ts"].timestamp() - BASE
        assert any(o == tmin and v == pytest.approx(r["min_val"]) for o, v in by_bin[r["day_bin"]])


@given(rows=samples)
@settings(**SETTINGS)
def test_sliding_rates_match_handrolled(spark, rows):
    from trend_o_meter_spark.operators.rates import sliding_rates

    W = 10
    df = _df(spark, rows)
    out = {
        int(r["second"].timestamp()): r
        for r in sliding_rates(df, ts="ts", size_col=None, window_seconds=W).collect()
    }
    # model: per-second counts, then trailing-W sums over NON-EMPTY seconds
    # present in the data (the operator emits one row per observed second)
    from collections import Counter

    per_sec = Counter((BASE + off) for off, _ in rows)
    for sec, r in out.items():
        lo = sec - W + 1
        expect_msgs = sum(c for s, c in per_sec.items() if lo <= s <= sec)
        assert r["msgs_per_sec"] == pytest.approx(expect_msgs / W)
        n_seconds = sum(1 for s in per_sec if lo <= s <= sec)
        assert r["is_warm"] == (n_seconds > W / 2)
    assert set(out) == set(per_sec)


@given(rows=samples, chunk=st.integers(min_value=11, max_value=200))
@settings(**SETTINGS)
def test_sliding_rates_chunked_equals_unpartitioned(spark, rows, chunk):
    """The chunk-partitioned range window (scale path) must be
    bit-identical to a single-chunk run (the unpartitioned semantics),
    across chunk widths that repeatedly cross bucket boundaries."""
    from trend_o_meter_spark.operators.rates import sliding_rates

    df = _df(spark, rows)
    key = lambda r: int(r["second"].timestamp())  # noqa: E731
    chunked = {key(r): tuple(r)[1:] for r in sliding_rates(
        df, ts="ts", size_col=None, window_seconds=10, chunk_seconds=chunk
    ).collect()}
    single = {key(r): tuple(r)[1:] for r in sliding_rates(
        df, ts="ts", size_col=None, window_seconds=10, chunk_seconds=10**15
    ).collect()}
    assert chunked == single


@given(rows=samples, gap=st.integers(min_value=60, max_value=7200))
@settings(**SETTINGS)
def test_sessionize_gap_invariants(spark, rows, gap):
    from trend_o_meter_spark.operators.rates import sessionize

    df = _df(spark, rows).withColumnRenamed("metric", "user_id")
    sess = sessionize(df, ts="ts", keys=("user_id",), gap_seconds=gap).collect()
    # model: sort offsets, break where delta > gap
    offs = sorted(o for o, _ in rows)
    expected_sessions = []
    cur = [offs[0]]
    for a, b in zip(offs, offs[1:]):
        if b - a > gap:
            expected_sessions.append(cur)
            cur = []
        cur.append(b)
    expected_sessions.append(cur)
    assert len(sess) == len(expected_sessions)
    got = sorted(
        (int(r["session_start"].timestamp() - BASE), int(r["session_end"].timestamp() - BASE), r["n_events"])
        for r in sess
    )
    for (gs, ge, gn), model in zip(got, expected_sessions):
        assert (gs, ge, gn) == (model[0], model[-1], len(model))


# --- round-3 ops: dup-span invariants, star-CC equivalence -----------------

words = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
docs_strategy = st.lists(
    st.lists(words, min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=docs_strategy)
@settings(**SETTINGS)
def test_dup_span_invariants(spark, texts):
    """0 <= longest run <= shared positions <= total positions; and a
    naive O(n^2) python model agrees on every count."""
    from collections import Counter

    from trend_o_meter_spark.llm.dedup import dup_span_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_stats(df).collect()}

    def grams(t):
        toks = t.split()
        return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]

    docs_of = {}
    for i, t in enumerate(texts):
        for g in set(grams(t)):
            docs_of.setdefault(g, set()).add(i)
    for i, t in enumerate(texts):
        gs = grams(t)
        if not gs:
            assert i not in out
            continue
        marked = [len(docs_of[g]) >= 2 for g in gs]
        longest = run = 0
        for m in marked:
            run = run + 1 if m else 0
            longest = max(longest, run)
        r = out[i]
        assert r["n_grams"] == len(gs)
        assert r["n_shared_grams"] == sum(marked)
        assert r["longest_dup_run"] == longest
        assert 0 <= r["longest_dup_run"] <= r["n_shared_grams"] <= r["n_grams"]


edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0,
    max_size=20,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_star_cc_equals_label_cc_random_graphs(spark, edges):
    """Large-star/small-star and label propagation agree on arbitrary
    graphs (self-loops, duplicates, reversed edges included), and both
    agree with a naive union-find."""
    from trend_o_meter_spark.llm.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(15)], "id long")
    e = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    lab = {r["id"]: r["cluster_id"] for r in connected_components(nodes, e, algorithm="label").collect()}
    star = {r["id"]: r["cluster_id"] for r in connected_components(nodes, e, algorithm="star").collect()}

    parent = list(range(15))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(15)}
    # canonicalize union-find labels to component minima
    comp_min = {}
    for i, r in want.items():
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(15)}
    assert lab == want
    assert star == want


@given(texts=docs_strategy)
@settings(**SETTINGS)
def test_cooc_pmi_matches_naive_model(spark, texts):
    """cooc_pmi_topk against a naive O(n^2) python model: identical pair
    counts, marginals, and PMI (rounded the same way)."""
    import math
    from collections import Counter

    from trend_o_meter_spark.llm.text import cooc_pmi_topk

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): r
        for r in cooc_pmi_topk(df, window=2, min_count=1, k=1000).collect()
    }

    pc = Counter()
    for t in texts:
        toks = t.split()
        for i, w1 in enumerate(toks):
            for j in range(i + 1, min(i + 3, len(toks))):
                pc[(w1, toks[j])] += 1
    left = Counter()
    right = Counter()
    for (a, b), c in pc.items():
        left[a] += c
        right[b] += c
    total = sum(pc.values())
    assert set(out) == set(pc)
    for pair, c in pc.items():
        r = out[pair]
        assert r["n_pair"] == c
        want = round(math.log((c * total) / (left[pair[0]] * right[pair[1]])), 6)
        assert abs(r["pmi"] - want) < 1e-9, (pair, r["pmi"], want)
    # ranks are a permutation of 1..n in (pmi desc, pair asc) order
    ranked = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(out) + 1))
    for x, y in zip(ranked, ranked[1:]):
        assert x["pmi"] > y["pmi"] or (
            x["pmi"] == y["pmi"] and (x["w1"], x["w2"]) < (y["w1"], y["w2"])
        )


def test_dup_span_removal_is_idempotent(spark):
    """Removing duplicated spans once removes them for good: running the
    operator over its own cleaned output must remove ZERO further tokens
    (the survivor copies are now the only copies)."""
    from trend_o_meter_spark.llm.dedup import dup_span_removal

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, "prefix words here " + base + " and a suffix"),
        (2, base + " trailing text of its own right here"),
        (3, "an unrelated document about entirely different things"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = dup_span_removal(df, min_run=5)
    assert once.filter("n_removed_tokens > 0").count() >= 1  # it did cut
    again = dup_span_removal(
        once.select("doc_id", once.clean_text.alias("text")), min_run=5
    )
    assert again.filter("n_removed_tokens > 0").count() == 0


hist_values = st.lists(
    st.floats(min_value=-1000.0, max_value=1000.0, allow_nan=False, width=32),
    min_size=1,
    max_size=80,
)


@given(vals=hist_values, q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
@settings(**SETTINGS)
def test_histogram_quantile_within_bin_width(spark, vals, q):
    """The sketch's hard guarantee, property-tested: for ANY value set
    and quantile, the histogram estimate lies within bin_width of the
    exact rank-r value (r = floor(q*(n-1)) + 1, the shared convention)."""
    import math

    from trend_o_meter_spark.operators.histogram import (
        histogram_quantiles,
        histogram_sketch,
    )

    w = 1.0
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    sk = histogram_sketch(df, bin_width=w)
    out = {r["q"]: r["quantile_est"] for r in histogram_quantiles(sk, qs=(q,), bin_width=w).collect()}
    r = math.floor(q * (len(vals) - 1)) + 1
    exact = sorted(float(v) for v in vals)[r - 1]
    assert abs(out[q] - exact) <= w, (q, out[q], exact)


@given(vals=hist_values)
@settings(**SETTINGS)
def test_histogram_merge_equals_union_sketch(spark, vals):
    """Splitting the data arbitrarily and merging the partial sketches
    must equal the sketch of the union — mergeability, property-tested."""
    from trend_o_meter_spark.operators.histogram import (
        histogram_merge,
        histogram_sketch,
    )

    cut = len(vals) // 2
    d1 = spark.createDataFrame([(float(v),) for v in vals[:cut]] or [(None,)], "value double")
    d2 = spark.createDataFrame([(float(v),) for v in vals[cut:]], "value double")
    full = spark.createDataFrame([(float(v),) for v in vals], "value double")
    merged = sorted(map(tuple, histogram_merge(histogram_sketch(d1), histogram_sketch(d2)).collect()))
    want = sorted(map(tuple, histogram_sketch(full).collect()))
    assert merged == want


@given(vals=hist_values)
@settings(**SETTINGS)
def test_moments_merge_equals_union_sketch(spark, vals):
    """Fourth mergeable family: splitting the data arbitrarily and
    merging the partial power-sum sketches must equal the sketch of the
    union EXACTLY (integer sums — no float tolerance needed)."""
    from trend_o_meter_spark.operators.moments import moments_merge, moments_sketch

    cut = len(vals) // 2
    d1 = spark.createDataFrame([(float(v),) for v in vals[:cut]] or [(None,)], "value double")
    d2 = spark.createDataFrame([(float(v),) for v in vals[cut:]], "value double")
    full = spark.createDataFrame([(float(v),) for v in vals], "value double")
    merged = sorted(map(tuple, moments_merge(moments_sketch(d1), moments_sketch(d2)).collect()))
    want = sorted(map(tuple, moments_sketch(full).collect()))
    assert merged == want


def test_moments_stats_match_numpy(spark):
    """mean/std/skew/kurt from the sketch match a direct numpy
    computation over the quantized values (population forms, excess
    kurtosis), and a zero-variance key yields NULL skew/kurt with
    std exactly 0."""
    import numpy as np

    from trend_o_meter_spark.operators.moments import moments_sketch, moments_stats

    vals = [round(((i * 37) % 113) * 0.07 + (0.003 if i % 5 == 0 else 0), 2) for i in range(200)]
    rows = [("a", v) for v in vals] + [("const", 4.25)] * 7
    df = spark.createDataFrame(rows, "k string, value double")
    out = {
        r["k"]: r
        for r in moments_stats(
            moments_sketch(df, keys=("k",)), keys=("k",)
        ).collect()
    }
    q = np.round(np.array(vals) * 100).astype(np.int64).astype(np.float64)
    mean, std = q.mean() / 100, q.std() / 100
    z = (q - q.mean()) / q.std()
    assert out["a"]["n"] == len(vals)
    assert out["a"]["mean"] == pytest.approx(mean, rel=1e-12)
    assert out["a"]["std"] == pytest.approx(std, rel=1e-12)
    assert out["a"]["skew"] == pytest.approx(float((z**3).mean()), rel=1e-9)
    assert out["a"]["kurt"] == pytest.approx(float((z**4).mean() - 3.0), rel=1e-9)
    assert out["const"]["std"] == 0.0
    assert out["const"]["skew"] is None and out["const"]["kurt"] is None


@given(
    lts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    rts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=25),
    tol=st.sampled_from([100, 700, 2500]),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**SETTINGS)
def test_asof_tolerance_bound_property(spark, lts, rts, tol, direction):
    """For ANY inputs, every match obeys the direction inequality and the
    tolerance window, and no row that HAS an in-window candidate comes
    back unmatched."""
    import datetime as dt

    from trend_o_meter_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s), 1) for i, s in enumerate(lts)],
        "eid long, ts timestamp, k long",
    )
    right = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s), 1, float(s)) for i, s in enumerate(rts)],
        "rid long, rts timestamp, rk long, rsec double",
    )
    out = asof_join(
        left, right, left_on="ts", right_on="rts", by_left="k", by_right="rk",
        right_cols=("rsec",), tiebreak="rid", direction=direction,
        tolerance=float(tol),
    ).collect()
    for row in out:
        ls = lts[row["eid"]]
        if direction == "backward":
            cands = [r for r in rts if ls - tol <= r <= ls]
        elif direction == "forward":
            cands = [r for r in rts if ls <= r <= ls + tol]
        else:
            cands = [r for r in rts if abs(r - ls) <= tol]
        if row["rsec"] is None:
            assert not cands, (direction, ls, cands)
        else:
            got = row["rsec"]
            assert got in cands
            if direction == "backward":
                assert got == max(cands)
            elif direction == "forward":
                assert got == min(cands)
            else:
                best = min(abs(r - ls) for r in cands)
                assert abs(got - ls) == best
                # equal-distance tie must resolve to the backward side
                if ls - best in rts and ls + best in rts and best > 0:
                    assert got == ls - best


@given(vals=hist_values)
@settings(**SETTINGS)
def test_moments_mean_within_quantization_bound(spark, vals):
    """The moments sketch's hard guarantee: the estimated mean is within
    1/(2*scale) of the true mean (quantization is the only
    approximation), and n is exact."""
    from trend_o_meter_spark.operators.moments import moments_sketch, moments_stats

    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    out = moments_stats(moments_sketch(df)).collect()[0]
    true_mean = sum(float(v) for v in vals) / len(vals)
    assert out["n"] == len(vals)
    assert abs(out["mean"] - true_mean) <= 0.5 / 100 + 1e-9


@given(rows=samples, kh=st.sampled_from([(0.5, 4.0), (0.25, 2.0), (1.0, 6.0)]))
@settings(**SETTINGS)
def test_cusum_matches_handrolled_model(spark, rows, kh):
    """cusum_changepoints vs a naive Python model: the same robust
    calibration (interpolated median / MAD via the quantile_cont
    definition, written independently here over a plain sorted list)
    and the same pinned recursion must reproduce every accumulator,
    alarm, and direction."""
    from trend_o_meter_spark.operators.trend import cusum_changepoints

    k_mult, h_mult = kh

    def q_cont(sorted_vals, q):
        n = len(sorted_vals)
        h = (n - 1) * q
        lo = int(h // 1)
        hi = min(lo + 1, n - 1)
        return sorted_vals[lo] + (h - lo) * (sorted_vals[hi] - sorted_vals[lo])

    def q9(x):
        if x is None:
            return None
        import math

        return (
            math.floor(x * 1e9 + 0.5) if x >= 0 else -math.floor(-x * 1e9 + 0.5)
        ) / 1e9

    vals = [float(v) for _, v in rows]
    med = q_cont(sorted(vals), 0.5)
    mad = q_cont(sorted(abs(v - med) for v in vals), 0.5)
    k, h = k_mult * mad, h_mult * mad
    want = []
    sp = sn = 0.0
    for off, v in sorted(rows):
        y = float(v)
        spr = max(0.0, sp + ((y - med) - k))
        snr = max(0.0, sn + ((med - y) - k))
        alarm = spr > h or snr > h
        want.append(
            (off, q9(spr), q9(snr), alarm, ("up" if spr > h else "down") if alarm else None)
        )
        sp, sn = (0.0, 0.0) if alarm else (spr, snr)

    df = spark.createDataFrame(
        [(off, datetime.fromtimestamp(BASE + off, tz=timezone.utc), float(v)) for off, v in rows],
        "eid long, ts timestamp, value double",
    ).withColumn("k", F.lit("m"))
    got = sorted(
        (r["eid"], r["s_pos"], r["s_neg"], r["alarm"], r["direction"])
        for r in cusum_changepoints(
            df, keys=("k",), tiebreak=("eid",), k_mult=k_mult, h_mult=h_mult
        ).collect()
    )
    assert got == want


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_triangle_counts_match_naive_enumeration(spark, edges):
    """The oriented-wedge triangle count equals a naive O(n^3)
    adjacency-set enumeration on arbitrary graphs (self-loops,
    duplicates, reversed edges included); nodes in no triangle are
    absent, never zero-rowed."""
    from itertools import combinations

    from trend_o_meter_spark.llm.cluster import triangle_counts

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1

    if not edges:
        edges = [(0, 0)]  # createDataFrame needs >= 1 row; self-loop drops
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == want
