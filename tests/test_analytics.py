"""Product-analytics operators: ordered funnel + cohort retention."""

from __future__ import annotations

from datetime import datetime, timedelta

from trend_o_meter_spark.operators.analytics import cohort_retention, funnel_steps

DAY0 = datetime(2024, 1, 1, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_order_is_strict(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, DAY0, "view"), (1, DAY0 + timedelta(hours=1), "click"),
        (1, DAY0 + timedelta(hours=2), "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, DAY0 + timedelta(hours=1), "click"), (2, DAY0 + timedelta(hours=2), "view"),
        # u3 views only
        (3, DAY0, "view"),
        # u4 view and click at the SAME timestamp: tie does not advance
        (4, DAY0, "view"), (4, DAY0, "click"),
    ]
    out = {r["step_name"]: r for r in
           funnel_steps(_ev(spark, rows), ("view", "click", "purchase")).collect()}
    assert out["view"]["n_users"] == 4
    assert out["click"]["n_users"] == 1  # only u1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == 0.25
    assert out["purchase"]["conversion"] == 1.0


def test_funnel_first_touch_anchor(spark):
    """The step-2 anchor is the FIRST step-1 event: a click between the
    user's two views counts (it follows the first view)."""
    rows = [
        (1, DAY0, "view"),
        (1, DAY0 + timedelta(hours=1), "click"),
        (1, DAY0 + timedelta(hours=2), "view"),
    ]
    out = {r["step_name"]: r["n_users"] for r in
           funnel_steps(_ev(spark, rows), ("view", "click")).collect()}
    assert out == {"view": 1, "click": 1}


def test_cohort_retention_triangle(spark):
    rows = []
    # cohort day 0: users 1, 2; user 1 returns day 1 and 2, user 2 never
    for u, days in ((1, [0, 1, 2]), (2, [0]), (3, [1, 2])):
        for d in days:
            rows.append((u, DAY0 + timedelta(days=d), "view"))
    out = {(r["day_offset"], r["cohort_day"] % 10): r for r in
           cohort_retention(_ev(spark, rows).select("user_id", "ts")).collect()}
    d0 = int(DAY0.timestamp()) // 86400
    got = {(r["cohort_day"] - d0, r["day_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
           for r in cohort_retention(_ev(spark, rows).select("user_id", "ts")).collect()}
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(0, 2)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)  # user 3's cohort
    assert got[(1, 1)] == (1, 1, 1.0)


def test_cohort_retention_offset_cap(spark):
    rows = [(1, DAY0, "view"), (1, DAY0 + timedelta(days=40), "view")]
    out = cohort_retention(_ev(spark, rows).select("user_id", "ts"), max_offset_days=30).collect()
    assert max(r["day_offset"] for r in out) == 0  # day-40 activity capped away


def test_event_transitions_counts(spark):
    rows = [
        (1, DAY0, "view"), (1, DAY0 + timedelta(minutes=1), "click"),
        (1, DAY0 + timedelta(minutes=2), "view"),
        (2, DAY0, "view"), (2, DAY0 + timedelta(minutes=1), "click"),
        (3, DAY0, "purchase"),  # single event: no transition
    ]
    from trend_o_meter_spark.operators.analytics import event_transitions

    df = _ev(spark, rows)
    out = {(r["from_type"], r["to_type"]): r["n"] for r in event_transitions(df).collect()}
    assert out == {("view", "click"): 2, ("click", "view"): 1}


def test_rfm_extremes_and_partition(spark):
    """A whale (many big purchases, most recent) lands in 555; a one-shot
    ancient small buyer in 111; per-code counts partition the users."""
    from trend_o_meter_spark.operators.analytics import rfm_segments

    rows = []
    for u in range(10):
        for k in range(u + 1):  # user u makes u+1 purchases
            rows.append((u, DAY0 + timedelta(days=u, hours=k), "purchase", float((u + 1) * 10)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    out = {r["rfm"]: r["n_users"] for r in rfm_segments(df).collect()}
    # 10 users, perfectly correlated dims -> exactly 2 per quintile code
    assert out == {"111": 2, "222": 2, "333": 2, "444": 2, "555": 2}


def test_dau_mau_stickiness(spark):
    from trend_o_meter_spark.operators.analytics import dau_mau

    rows = [
        (1, DAY0, "view"), (2, DAY0, "view"),          # day 0: u1, u2
        (1, DAY0 + timedelta(days=1), "view"),          # day 1: u1
        (3, DAY0 + timedelta(days=40), "view"),         # day 40: u3 (window reset)
    ]
    df = _ev(spark, rows).select("user_id", "ts")
    d0 = int(DAY0.timestamp()) // 86400
    out = {r["day"] - d0: r for r in dau_mau(df, window_days=30).collect()}
    assert set(out) == {0, 1, 40}
    assert (out[0]["dau"], out[0]["mau"]) == (2, 2)
    assert (out[1]["dau"], out[1]["mau"]) == (1, 2)  # u2 still in trailing 30d
    assert out[1]["stickiness"] == 0.5
    assert (out[40]["dau"], out[40]["mau"]) == (1, 1)  # day-0/1 actives aged out


def test_attribution_last_touch_semantics(spark):
    from trend_o_meter_spark.operators.analytics import attribution_last_touch

    rows = [
        # u1: view, then click, then purchase -> credited to click (latest)
        (1, 10, DAY0, "view", 0.0),
        (1, 11, DAY0 + timedelta(hours=1), "click", 0.0),
        (1, 12, DAY0 + timedelta(hours=2), "purchase", 100.0),
        # u2: purchase with NO prior touch (view comes after)
        (2, 20, DAY0, "purchase", 50.0),
        (2, 21, DAY0 + timedelta(hours=1), "view", 0.0),
        # u3: view AT the purchase timestamp -> at-or-before counts
        (3, 30, DAY0, "view", 0.0),
        (3, 31, DAY0, "purchase", 25.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["touch_type"]: (r["n_conversions"], r["revenue"])
           for r in attribution_last_touch(df).collect()}
    assert out == {
        "click": (1, 100.0),
        "unattributed": (1, 50.0),
        "view": (1, 25.0),
    }


def test_ab_lift_counts_and_z(spark):
    """Hand-check against the arm assignment the salted hash actually
    makes, including a known-lift construction."""
    import hashlib
    import math

    from trend_o_meter_spark.operators.analytics import ab_lift

    def arm(u, salt="exp-v1"):
        return int(hashlib.md5(f"{salt}:{u}".encode()).hexdigest()[:7], 16) % 2

    # 40 users; convert exactly the even-indexed HALF of each arm's list
    users = list(range(40))
    arms = {u: arm(u) for u in users}
    a_users = [u for u in users if arms[u] == 0]
    b_users = [u for u in users if arms[u] == 1]
    converters = set(a_users[: len(a_users) // 4]) | set(b_users[: len(b_users) // 2])
    rows = [(u, "view") for u in users] + [(u, "purchase") for u in converters]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = ab_lift(df).collect()[0]
    assert (out["n_a"], out["n_b"]) == (len(a_users), len(b_users))
    assert out["conv_a"] == len(a_users) // 4
    assert out["conv_b"] == len(b_users) // 2
    ra, rb = out["conv_a"] / out["n_a"], out["conv_b"] / out["n_b"]
    pp = (out["conv_a"] + out["conv_b"]) / (out["n_a"] + out["n_b"])
    se = math.sqrt(pp * (1 - pp) * (1 / out["n_a"] + 1 / out["n_b"]))
    assert out["lift"] == round(rb - ra, 9) or abs(out["lift"] - (rb - ra)) < 2e-9
    assert abs(out["z_score"] - (rb - ra) / se) < 2e-9


def test_funnel_zero_user_step_reports_null_not_nan(spark):
    """A step nobody reaches has 0 users; the NEXT step's conversion is
    0/0 — both engines must report NULL (nullif guard), never NaN/inf."""
    rows = [(1, DAY0, "view")]
    out = {r["step_name"]: r for r in
           funnel_steps(_ev(spark, rows), ("view", "checkout", "purchase")).collect()}
    assert out["checkout"]["n_users"] == 0
    assert out["checkout"]["conversion"] == 0.0  # 0 / 1 view-user
    assert out["purchase"]["n_users"] == 0
    assert out["purchase"]["conversion"] is None  # 0 / 0, guarded


def test_ab_lift_empty_arm_reports_null(spark):
    """With a single user only one hash-arm is populated: the empty
    arm's rate and the z-score must surface as NULL (nullif on every
    count divisor), not crash or emit inf."""
    from trend_o_meter_spark.operators.analytics import ab_lift

    rows = [(1, DAY0, "purchase")]
    out = ab_lift(_ev(spark, rows)).collect()[0]
    assert out["n_a"] + out["n_b"] == 1
    assert (out["n_a"] == 0) != (out["n_b"] == 0)
    empty = "rate_a" if out["n_a"] == 0 else "rate_b"
    full = "rate_b" if out["n_a"] == 0 else "rate_a"
    assert out[empty] is None
    assert out[full] == 1.0
    assert out["z_score"] is None


def test_assoc_rules_matches_naive_model(spark):
    """Support/confidence/lift match a hand-built basket model; the
    min-support gate cuts singleton coincidences; lift > 1 for planted
    co-occurrence and < 1 for planted avoidance."""
    from pyspark.sql import functions as F

    from trend_o_meter_spark.operators.analytics import assoc_rules

    rows = []
    # users 0..9: "view"+"cart" together every window (coupled)
    for u in range(10):
        for w in range(4):
            t = w * 1800
            rows.append((u, t + 10, "view"))
            rows.append((u, t + 20, "cart"))
    # users 20..29: "view" only; users 30..39: "promo" only (avoidance:
    # promo never co-occurs with view)
    for u in range(20, 30):
        rows.append((u, 100, "view"))
    for u in range(30, 40):
        rows.append((u, 100, "promo"))
    # one singleton coincidence, cut by min_pair_count=2
    rows.append((50, 100, "view"))
    rows.append((50, 110, "rare"))
    df = spark.createDataFrame(
        [(float(1_700_000_000 + t), u, i) for u, t, i in rows],
        "epoch double, user_id long, event_type string",
    ).select(F.timestamp_seconds("epoch").alias("ts"), "user_id", "event_type")
    got = {
        (r["antecedent"], r["consequent"]): r for r in assoc_rules(df).collect()
    }
    # model: baskets = distinct (user, window, item)
    # view baskets: 40 (coupled) + 10 (view-only) + 1 (user 50) = 51
    # cart baskets: 40; pair view&cart: 40; N = 40 + 10 + 10 + 1 = 61
    vc = got[("view", "cart")]
    assert (vc["n_pair"], vc["n_antecedent"], vc["n_consequent"]) == (40, 51, 40)
    assert vc["support"] == round(40 / 61 * 1e9) / 1e9
    assert vc["confidence"] == round(40 / 51 * 1e9) / 1e9
    lift = (40 / 51) / (40 / 61)
    assert abs(vc["lift"] - lift) < 1e-9
    assert vc["lift"] > 1.0
    cv = got[("cart", "view")]
    assert cv["confidence"] == 1.0  # every cart basket has view
    # avoidance never co-occurs -> no rule row at all
    assert ("view", "promo") not in got and ("promo", "view") not in got
    # singleton coincidence cut by the min-support gate
    assert ("view", "rare") not in got and ("rare", "view") not in got
