"""Ordered funnel analysis and cohort retention — the product-analytics
queries an event monitor grows once it has ``user_id`` on the stream
(absent from the reference, shipped Spark-first like SURVEY §2.11's
relational surface).

* :func:`funnel_steps` — users progressing through an ORDERED sequence
  of event types (each step strictly after the previous step's first
  completion) — the classic conversion funnel.
* :func:`cohort_retention` — users bucketed by first-seen day, distinct
  actives per (cohort, day-offset) — the classic retention triangle.

Both are pure relational compositions (filter-pushed scans, user-keyed
joins, map-side-combinable min/distinct aggregates); exact integer
counts everywhere, ratios through the shared away-from-zero 1e-9
quantization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lineage import cut


def _q9(x: Column) -> Column:
    return (
        F.when(x >= 0, F.floor(x * F.lit(1e9) + F.lit(0.5)))
        .otherwise(-F.floor(-x * F.lit(1e9) + F.lit(0.5)))
        / F.lit(1e9)
    )


_Q9_SQL = (
    "CASE WHEN ({x}) >= 0 THEN floor(({x}) * 1e9 + 0.5) "
    "ELSE -floor(-({x}) * 1e9 + 0.5) END / 1e9"
)


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user completes step i+1 only with an
    event STRICTLY after their first completion of step i (first-touch
    semantics; same-timestamp ties do not advance — documented, both
    engines compare identically).

    Output: ``step_index, step_name, n_users, conversion`` — one row per
    step, ``conversion`` = n_users / previous step's n_users (1.0 for
    the first step).

    Scale: one filter-pushed scan per step (``event_type`` predicate
    reaches the parquet scan), each reduced to a per-user MIN before the
    user-keyed join with the previous frontier — map-side combinable,
    the frontier only shrinks.  Never a window over raw events.
    """
    if not steps:
        raise ValueError("funnel_steps: empty step list")
    frontier: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(event_type) == step).select(
            F.col(user).alias("__u"), F.col(ts).alias("__t")
        )
        if frontier is None:
            frontier = ev.groupBy("__u").agg(F.min("__t").alias("__ft"))
        else:
            frontier = (
                ev.join(frontier.select("__u", F.col("__ft").alias("__prev")), "__u")
                .filter(F.col("__t") > F.col("__prev"))
                .groupBy("__u")
                .agg(F.min("__t").alias("__ft"))
            )
        counts.append(
            frontier.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return funnel_report_from_counts(out)


def funnel_report_from_counts(counts: DataFrame) -> DataFrame:
    """Shared batch tail: ``(step_index, step_name, n_users)`` rows ->
    the funnel report with per-step conversion vs the previous step.
    Used by :func:`funnel_steps` and the live twin
    (``streaming.pipeline.stream_funnel``) so both emit the identical
    closed form."""
    # conversion vs the previous step via a self-join on step_index - 1
    prev = counts.select(
        (F.col("step_index") + 1).alias("step_index"),
        F.col("n_users").alias("__prev_n"),
    )
    return (
        counts.join(prev, "step_index", "left")
        .select(
            "step_index",
            "step_name",
            "n_users",
            # nullif: a 0-user previous step reports NULL identically in
            # both engines (Spark 0/0 is NULL, DuckDB's is NaN/inf)
            _q9(
                F.when(F.col("__prev_n").isNull(), F.lit(1.0)).otherwise(
                    F.col("n_users").cast("double")
                    / F.nullif(F.col("__prev_n").cast("double"), F.lit(0.0))
                )
            ).alias("conversion"),
        )
    )


def funnel_steps_sql(
    table: str,
    steps: Sequence[str],
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
) -> str:
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s1 AS (SELECT {user} AS u, min({ts}) AS ft FROM {table} "
                f"WHERE {event_type} = '{step}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i + 1} AS (SELECT e.{user} AS u, min(e.{ts}) AS ft "
                f"FROM {table} e JOIN s{i} p ON e.{user} = p.u "
                f"WHERE e.{event_type} = '{step}' AND e.{ts} > p.ft GROUP BY 1)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step_index, '{s}' AS step_name, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps)
    )
    conv = _Q9_SQL.format(
        x="CASE WHEN p.__prev_n IS NULL THEN CAST(1.0 AS DOUBLE) "
        "ELSE CAST(c.n_users AS DOUBLE) / nullif(CAST(p.__prev_n AS DOUBLE), 0.0) END"
    )
    return f"""
WITH {", ".join(ctes)},
counts AS ({selects})
SELECT c.step_index, c.step_name, c.n_users, {conv} AS conversion
FROM counts c LEFT JOIN (
  SELECT step_index + 1 AS step_index, n_users AS __prev_n FROM counts
) p USING (step_index)
"""


def cohort_retention(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    max_offset_days: int = 30,
) -> DataFrame:
    """Retention triangle: users cohorted by FIRST-seen UTC day; for each
    (cohort_day, day_offset <= max_offset_days) the count of distinct
    users from that cohort active on that day.

    Output: ``cohort_day, day_offset, n_active, cohort_size,
    retention`` (epoch-day bigints; retention = n_active/cohort_size,
    1e-9-quantized; offset 0 rows are the cohort sizes by definition).

    Scale: per-user first-day is one map-side-combinable MIN; actives
    dedupe to (user, day) BEFORE the cohort join (the distinct is keyed,
    its output bounded by users x span); the triangle itself is
    O(span^2 / 2) rows — KB-sized.  ``max_offset_days`` bounds the
    output like every span-bounded contract here.
    """
    day = F.floor(F.unix_seconds(F.col(ts)) / 86400).cast("long")
    ud = df.select(F.col(user).alias("__u"), day.alias("__d")).distinct()
    return cohort_retention_from_user_days(ud, max_offset_days=max_offset_days)


def cohort_retention_from_user_days(
    ud: DataFrame, *, max_offset_days: int = 30
) -> DataFrame:
    """Shared batch tail: deduped ``(__u, __d)`` user-day pairs -> the
    retention triangle.  Cohorts (per-user first day) are a MIN over the
    SAME dedup set the actives come from, so the (user, day) pair set is
    the one sufficient state — used by :func:`cohort_retention` and the
    live twin (``streaming.pipeline.stream_cohort_retention``)."""
    firsts = ud.groupBy("__u").agg(F.min("__d").alias("__cohort"))
    active = ud
    joined = (
        active.join(firsts, "__u")
        .select(
            "__u",
            "__cohort",
            (F.col("__d") - F.col("__cohort")).alias("__off"),
        )
        .filter(F.col("__off") <= max_offset_days)
    )
    counts = joined.groupBy("__cohort", "__off").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = firsts.groupBy("__cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        counts.join(sizes, "__cohort")
        .select(
            F.col("__cohort").alias("cohort_day"),
            F.col("__off").alias("day_offset"),
            "n_active",
            "cohort_size",
            _q9(F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
            .alias("retention"),
        )
    )


def cohort_retention_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    max_offset_days: int = 30,
) -> str:
    ret = _Q9_SQL.format(
        x="CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE)"
    )
    return f"""
WITH firsts AS (
  SELECT {user} AS u, min(CAST(floor(epoch({ts}) / 86400) AS BIGINT)) AS cohort
  FROM {table} GROUP BY 1
),
active AS (
  SELECT DISTINCT {user} AS u, CAST(floor(epoch({ts}) / 86400) AS BIGINT) AS d
  FROM {table}
),
counts AS (
  SELECT f.cohort, a.d - f.cohort AS off, CAST(count(*) AS BIGINT) AS n_active
  FROM active a JOIN firsts f ON a.u = f.u
  WHERE a.d - f.cohort <= {max_offset_days}
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM firsts GROUP BY 1
)
SELECT c.cohort AS cohort_day, c.off AS day_offset, c.n_active, s.cohort_size,
       {ret} AS retention
FROM counts c JOIN sizes s ON c.cohort = s.cohort
"""


def event_transitions(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition counts: per user, each consecutive
    event pair (by time) contributes one (from_type, to_type) count —
    the navigation/behavior matrix product analytics reads funnels out
    of.

    Output: ``from_type, to_type, n`` — at most |types|^2 rows.

    Scale: ONE window (lag) PARTITIONED BY USER (keyed, never a global
    single-partition sort) + a tiny groupBy; pass a unique ``tiebreak``
    (e.g. event id) so timestamp collisions within a user order
    deterministically in both engines.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user).orderBy(ts, *tiebreak)
    pairs = df.select(
        F.lag(event_type).over(w).alias("from_type"),
        F.col(event_type).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))


def event_transitions_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
    tiebreak: Sequence[str] = (),
) -> str:
    order_by = ", ".join([ts, *tiebreak])
    return f"""
WITH pairs AS (
  SELECT lag({event_type}) OVER (PARTITION BY {user} ORDER BY {order_by}) AS from_type,
         {event_type} AS to_type
  FROM {table}
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM pairs WHERE from_type IS NOT NULL
GROUP BY 1, 2
"""


def rfm_segments(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    value: str = "value",
    event_type: str = "event_type",
    purchase_type: str = "purchase",
) -> DataFrame:
    """RFM segmentation (Hughes 1994): per-user Recency (last purchase
    epoch — higher is better), Frequency (purchase count), Monetary
    (exact-decimal value sum), each scored 1-5 against the population's
    interpolated quintile BREAKPOINTS, then counted per ``rfm`` code.

    Output: ``rfm (e.g. '545'), n_users``.

    Scale: scoring by comparison against 4 broadcast breakpoints per
    dimension — NOT ``ntile`` (a global ntile is a single-partition
    window sort, the plan-audit red flag); the per-user reduce is one
    map-side-combinable aggregate.  The breakpoints themselves must NOT
    use Spark's exact ``percentile`` either (its buffer is the full
    per-user value multiset — ~10^9 doubles in ONE final-merge task at
    scale): the three metrics melt into a (dimension, value) stream and
    :func:`..quantiles.exact_quantiles` selects the quintile ranks via
    per-(dimension, bucket) running sums, never holding a multiset.
    Boundary semantics: score = 1 + #(breakpoints strictly below the
    metric), identical doubles both engines.
    """
    p = df.filter(F.col(event_type) == purchase_type)
    per_user = p.groupBy(F.col(user).alias("__u")).agg(
        F.max(F.unix_seconds(F.col(ts))).alias("__r_s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(value).cast("decimal(28,8)")).alias("__md"),
    )
    return rfm_from_per_user(per_user)


def rfm_from_per_user(
    per_user: DataFrame, *, cut_frames: bool = True
) -> DataFrame:
    """Shared batch tail: per-user purchase aggregates ``(__u, __r_s
    max-last-purchase-epoch LONG, __n purchase-count LONG, __md
    exact-decimal monetary DECIMAL(28,8))`` -> the RFM report.  The
    three aggregates are max/sum/decimal-sum — order-insensitive,
    losslessly mergeable (``__md`` arrives as the natural
    DECIMAL(38,8) sum type, which re-summing preserves) — so they are
    the live twin's state (``streaming.pipeline.stream_rfm``); the
    double conversions happen HERE, once, identically for both
    paths.

    ``cut_frames=False`` (the live twin's per-micro-batch setting)
    skips the per_user/counts checkpoints: the input is a small
    already-materialized state frame there, re-derivation per consumer
    is cheap, and per-batch checkpoints leave RDD blocks pinned until a
    JVM GC — measured ~1.7x the whole 20-batch re-score (round-14
    order experiment).  Batch callers keep the default: one-shot runs
    with a corpus-derived per_user want the multi-consumer
    materialization.  Values identical either way."""
    from .quantiles import exact_quantiles

    per_user = per_user.select(
        "__u",
        F.col("__r_s").cast("double").alias("__r"),
        F.col("__n").cast("double").alias("__f"),
        F.col("__md").cast("double").alias("__m"),
    )
    # per_user feeds both the breakpoint derivation and the scoring pass
    if cut_frames:
        per_user = cut(per_user)
    qs = [0.2, 0.4, 0.6, 0.8]
    melt = per_user.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("__dim"), F.col(f"__{d}").alias("__v")
                    )
                    for d in ("r", "f", "m")
                ]
            )
        ).alias("__e")
    ).select("__e.__dim", "__e.__v")
    bq = exact_quantiles(
        melt, value="__v", keys=("__dim",), qs=qs, cut_counts=cut_frames
    )
    breaks = bq.groupBy().agg(
        *[
            F.max(
                F.when(
                    (F.col("__dim") == d) & (F.col("__qi") == i),
                    F.col("quantile"),
                )
            ).alias(f"__{d}{i}")
            for d in ("r", "f", "m")
            for i in range(4)
        ]
    )

    def score(d: str) -> Column:
        c = F.lit(1)
        for i in range(4):
            c = c + F.when(F.col(f"__{d}") > F.col(f"__{d}{i}"), 1).otherwise(0)
        return c.cast("string")

    scored = per_user.crossJoin(F.broadcast(breaks)).select(
        F.concat(score("r"), score("f"), score("m")).alias("rfm")
    )
    return scored.groupBy("rfm").agg(F.count(F.lit(1)).alias("n_users"))


def rfm_segments_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    value: str = "value",
    event_type: str = "event_type",
    purchase_type: str = "purchase",
) -> str:
    from .quantiles import exact_quantiles_sql_ctes

    qs = [0.2, 0.4, 0.6, 0.8]
    q_ctes = exact_quantiles_sql_ctes(
        "melt", value="__v", keys=("__dim",), qs=qs, prefix="__qb"
    )
    brk = ", ".join(
        f"max(CASE WHEN __dim = '{d}' AND __qi = {i} THEN quantile END) AS __{d}{i}"
        for d in ("r", "f", "m") for i in range(4)
    )

    def score(d: str) -> str:
        terms = " + ".join(
            f"CASE WHEN __{d} > __{d}{i} THEN 1 ELSE 0 END" for i in range(4)
        )
        return f"CAST(1 + {terms} AS VARCHAR)"

    return f"""
WITH per_user AS (
  SELECT {user} AS __u,
         -- floor: Spark's unix_seconds truncates to whole seconds while
         -- DuckDB's epoch() keeps fractional microseconds
         CAST(max(floor(epoch({ts}))) AS DOUBLE) AS __r,
         CAST(count(*) AS DOUBLE) AS __f,
         CAST(sum(CAST({value} AS DECIMAL(28,8))) AS DOUBLE) AS __m
  FROM {table} WHERE {event_type} = '{purchase_type}' GROUP BY 1
),
melt AS (
  SELECT 'r' AS __dim, __r AS __v FROM per_user
  UNION ALL SELECT 'f', __f FROM per_user
  UNION ALL SELECT 'm', __m FROM per_user
),
{q_ctes},
breaks AS (SELECT {brk} FROM __qb)
SELECT {score('r')} || {score('f')} || {score('m')} AS rfm,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user, breaks
GROUP BY 1
"""


def dau_mau(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    window_days: int = 30,
) -> DataFrame:
    """Stickiness (DAU/MAU): per observed UTC day, the distinct daily
    actives, the distinct actives over the trailing ``window_days``
    window, and their ratio — the classic engagement metric.

    Output: ``day, dau, mau, stickiness`` (epoch-day bigint; ratio
    1e-9-quantized).

    Scale: the stream dedupes to (user, day) FIRST (keyed distinct,
    output bounded by actives x span); each such row then explodes into
    the <= ``window_days`` trailing window days it contributes to — a
    bounded fan-out of an already-small table — and MAU is one exact
    count-distinct per day.  No sliding window over raw events, no
    global sort.
    """
    day = F.floor(F.unix_seconds(F.col(ts)) / 86400).cast("long")
    ud = df.select(F.col(user).alias("__u"), day.alias("__d")).distinct()
    return dau_mau_from_user_days(ud, window_days=window_days)


def dau_mau_from_user_days(ud: DataFrame, *, window_days: int = 30) -> DataFrame:
    """Shared batch tail: deduped ``(__u, __d)`` user-day pairs -> the
    DAU/MAU report.  Used by :func:`dau_mau` and the live twin
    (``streaming.pipeline.stream_dau_mau``) — the (user, day) dedup IS
    the twin's additive state, so both paths emit the identical closed
    form over it."""
    dau = ud.groupBy(F.col("__d").alias("day")).agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "__u",
        F.explode(F.sequence(F.col("__d"), F.col("__d") + (window_days - 1))).alias("day"),
    )
    mau = contrib.groupBy("day").agg(F.count_distinct("__u").alias("mau"))
    return (
        dau.join(mau, "day")  # inner: only observed days reported
        .select(
            "day",
            "dau",
            "mau",
            _q9(F.col("dau").cast("double") / F.col("mau").cast("double"))
            .alias("stickiness"),
        )
    )


def dau_mau_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    window_days: int = 30,
) -> str:
    ratio = "CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE)"
    q = _Q9_SQL.format(x=ratio)
    return f"""
WITH ud AS (
  SELECT DISTINCT {user} AS u, CAST(floor(epoch({ts}) / 86400) AS BIGINT) AS d
  FROM {table}
),
dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
contrib AS (
  SELECT u, unnest(range(d, d + {window_days})) AS day FROM ud
),
mau AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS mau FROM contrib GROUP BY 1)
SELECT day, dau, mau, {q} AS stickiness
FROM dau JOIN mau USING (day)
"""


def attribution_last_touch(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
    value: str = "value",
    event_id: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
) -> DataFrame:
    """Last-touch attribution: each conversion is credited to the user's
    most recent touch event AT OR BEFORE it (merge_asof ``backward``
    semantics; ties on timestamp resolve by greatest event id in both
    engines); conversions with no prior touch report as
    ``unattributed``.

    Output: ``touch_type, n_conversions, revenue`` (exact-decimal sum
    emitted as double).

    Scale: this is the as-of join (:mod:`..asof`) in its
    marketing-attribution costume — conversions are the left side,
    touches the right, both filter-pushed scans keyed by user; the
    reduce is a |touch_types|+1-row aggregate.
    """
    from . import asof

    conv = df.filter(F.col(event_type) == conversion_type).select(
        F.col(user).alias("__u"), ts, value, event_id
    )
    touches = df.filter(F.col(event_type).isin(*touch_types)).select(
        F.col(user).alias("__u"),
        F.col(ts).alias("__tts"),
        F.col(event_type).alias("touch_type"),
        F.col(event_id).alias("__tid"),
    )
    j = asof.asof_join(
        conv,
        touches,
        left_on=ts,
        right_on="__tts",
        by_left="__u",
        by_right="__u",
        right_cols=("touch_type",),
        tiebreak="__tid",
        direction="backward",
    )
    return (
        j.groupBy(F.coalesce(F.col("touch_type"), F.lit("unattributed")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col(value).cast("decimal(28,8)")).cast("double").alias("revenue"),
        )
    )


def attribution_last_touch_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    event_type: str = "event_type",
    value: str = "value",
    event_id: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
) -> str:
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH conv AS (
  SELECT {user} AS u, {ts} AS cts, {value} AS v, {event_id} AS cid
  FROM {table} WHERE {event_type} = '{conversion_type}'
),
touch AS (
  SELECT {user} AS u, {ts} AS tts, {event_type} AS touch_type, {event_id} AS tid
  FROM {table} WHERE {event_type} IN ({tt})
),
cand AS (
  SELECT c.cid, c.v, t.touch_type,
         row_number() OVER (PARTITION BY c.cid
                            ORDER BY t.tts DESC, t.tid DESC) AS rn
  FROM conv c LEFT JOIN touch t ON c.u = t.u AND t.tts <= c.cts
)
SELECT coalesce(touch_type, 'unattributed') AS touch_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(CAST(v AS DECIMAL(28,8))) AS DOUBLE) AS revenue
FROM cand WHERE rn = 1
GROUP BY 1
"""


def ab_lift(
    df: DataFrame,
    *,
    user: str = "user_id",
    event_type: str = "event_type",
    conversion_type: str = "purchase",
    salt: str = "exp-v1",
) -> DataFrame:
    """Deterministic A/B experiment readout: users split into arms by the
    SALTED md5 parity of their id (the repo's reproducible-assignment
    rule — never ``rand()``, assignment survives re-runs and engines),
    then per-arm conversion (>= 1 ``conversion_type`` event) with the
    two-proportion pooled z statistic.

    Output (one row): ``n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift,
    z_score`` (rates/lift/z 1e-9-quantized; lift = rate_b - rate_a; z
    follows the standard pooled-SE form, NULL when either arm is empty
    or the pooled rate is degenerate 0/1).

    Exactness: all counts are exact integers; the float tail is
    divisions and one ``sqrt`` (correctly-rounded IEEE) in pinned
    operand order.  Scale: one distinct per side, one user-keyed join,
    one global 1-row aggregate.
    """
    users = df.select(F.col(user).alias("__u")).distinct()
    conv = (
        df.filter(F.col(event_type) == conversion_type)
        .select(F.col(user).alias("__u"))
        .distinct()
    )
    return ab_lift_from_user_sets(users, conv, salt=salt)


def ab_lift_from_user_sets(
    users: DataFrame, conv: DataFrame, *, salt: str = "exp-v1"
) -> DataFrame:
    """Shared batch tail: deduped user set + deduped converted-user set
    (both single ``__u`` columns) -> the A/B readout.  The two DISTINCT
    sets are the twin's additive state
    (``streaming.pipeline.stream_ab_lift``) — arm assignment is a pure
    function of the salted user id, so it needs no storage."""
    from ..llm.hashing import md5_int

    arm = (md5_int(F.concat(F.lit(salt + ":"), F.col("__u").cast("string"))) % 2).alias("__arm")
    users = users.select("__u", arm)
    conv = conv.withColumn("__c", F.lit(1))
    j = users.join(conv, "__u", "left")
    agg = j.agg(
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when((F.col("__arm") == 0) & F.col("__c").isNotNull(), 1).otherwise(0)).alias("conv_a"),
        F.sum(F.when((F.col("__arm") == 1) & F.col("__c").isNotNull(), 1).otherwise(0)).alias("conv_b"),
    )
    # nullif on every count divisor: an empty arm reports NULL rate/z
    # identically in both engines (Spark 0-div is NULL, DuckDB's is inf)
    na = F.nullif(F.col("n_a").cast("double"), F.lit(0.0))
    nb = F.nullif(F.col("n_b").cast("double"), F.lit(0.0))
    ra = F.col("conv_a").cast("double") / na
    rb = F.col("conv_b").cast("double") / nb
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / F.nullif(
        (F.col("n_a") + F.col("n_b")).cast("double"), F.lit(0.0)
    )
    se = F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = (rb - ra) / F.nullif(se, F.lit(0.0))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        _q9(ra).alias("rate_a"),
        _q9(rb).alias("rate_b"),
        _q9(rb - ra).alias("lift"),
        _q9(z).alias("z_score"),
    )


def ab_lift_sql(
    table: str,
    *,
    user: str = "user_id",
    event_type: str = "event_type",
    conversion_type: str = "purchase",
    salt: str = "exp-v1",
) -> str:
    from ..llm.hashing import md5_int_sql

    h = md5_int_sql(f"'{salt}:' || CAST(__u AS VARCHAR)")
    ra = "CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0)"
    rb = "CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0)"
    pp = "CAST(conv_a + conv_b AS DOUBLE) / nullif(CAST(n_a + n_b AS DOUBLE), 0.0)"
    se = (
        f"sqrt(({pp}) * (CAST(1.0 AS DOUBLE) - ({pp})) "
        f"* (CAST(1.0 AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) "
        f"+ CAST(1.0 AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0)))"
    )
    z = f"(({rb}) - ({ra})) / nullif({se}, CAST(0.0 AS DOUBLE))"
    return f"""
WITH users AS (
  SELECT __u, {h} % 2 AS __arm FROM (SELECT DISTINCT {user} AS __u FROM {table})
),
conv AS (
  SELECT DISTINCT {user} AS __u FROM {table} WHERE {event_type} = '{conversion_type}'
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN u.__arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN u.__arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN u.__arm = 0 AND c.__u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(sum(CASE WHEN u.__arm = 1 AND c.__u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
  FROM users u LEFT JOIN conv c ON u.__u = c.__u
)
SELECT n_a, n_b, conv_a, conv_b,
       {_Q9_SQL.format(x=ra)} AS rate_a,
       {_Q9_SQL.format(x=rb)} AS rate_b,
       {_Q9_SQL.format(x=f"({rb}) - ({ra})")} AS lift,
       {_Q9_SQL.format(x=z)} AS z_score
FROM agg
"""


def assoc_rules(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    item: str = "event_type",
    window_seconds: int = 1800,
    min_pair_count: int = 2,
) -> DataFrame:
    """Association rules over event baskets (Agrawal & Srikant 1994's
    support/confidence plus lift): which events co-occur in the same
    user-window more than their popularity predicts — the "users who
    did A also did B" surface, and the feature-coupling diagnostic for
    an event stream.

    A basket is all DISTINCT items a user emits inside a fixed
    ``window_seconds`` window (fixed windows, not gap sessions, so the
    construction is one declarative expression in both engines —
    gap-session baskets compose via ``sessionize`` upstream if needed).
    For every ordered pair (a -> b):

        support    = n_pair / N          (baskets with both)
        confidence = n_pair / n_a        (of baskets with a, have b)
        lift       = confidence / (n_b / N)

    Rules with ``n_pair < min_pair_count`` are cut (the standard
    min-support gate; 1-basket coincidences are noise).  Exact integer
    counts; the three ratios are pinned double expressions through the
    shared 1e-9 quantization.

    Output: ``antecedent, consequent, n_pair, n_antecedent,
    n_consequent, support, confidence, lift``.  Scale: one distinct
    shuffle to baskets, one basket-keyed self-join whose blowup is
    sum(basket_size^2) — bounded by items-per-user-window, not the
    stream (a degenerate user emitting every event type every window
    is capped by the item-type cardinality squared); counts are
    map-side combinable.
    """
    baskets = assoc_baskets(
        df, ts=ts, user=user, item=item, window_seconds=window_seconds
    )
    return assoc_rules_from_baskets(baskets, min_pair_count=min_pair_count)


def assoc_baskets(
    df: DataFrame,
    *,
    ts: str = "ts",
    user: str = "user_id",
    item: str = "event_type",
    window_seconds: int = 1800,
) -> DataFrame:
    """The deduped basket-triple set ``(__u, __w, __i)`` — shared front
    half of :func:`assoc_rules` and the live twin's state construction
    (``streaming.pipeline.stream_assoc_rules``)."""
    return (
        df.filter(
            # ts too: a NULL window would survive distinct() but vanish
            # from COUNT DISTINCT's tuple total while still counting in
            # the per-item totals — engine-divergent support/lift
            F.col(item).isNotNull() & F.col(user).isNotNull() & F.col(ts).isNotNull()
        )
        .select(
            F.col(user).alias("__u"),
            (F.floor(F.unix_seconds(F.col(ts)) / window_seconds))
            .cast("long")
            .alias("__w"),
            F.col(item).alias("__i"),
        )
        .distinct()
    )


def assoc_rules_from_baskets(
    baskets: DataFrame, *, min_pair_count: int = 2
) -> DataFrame:
    """Shared batch tail: deduped ``(__u, __w, __i)`` basket triples ->
    the support/confidence/lift report.  Used by :func:`assoc_rules`
    and the live twin so both emit the identical closed form."""
    totals = baskets.groupBy().agg(
        F.count_distinct(F.col("__u"), F.col("__w")).cast("long").alias("__N")
    )
    item_counts = baskets.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__ni")
    )
    l = baskets.select("__u", "__w", F.col("__i").alias("antecedent"))
    r = baskets.select("__u", "__w", F.col("__i").alias("consequent"))
    pairs = (
        l.join(r, ["__u", "__w"])
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_pair_count))
    )
    ja = item_counts.select(
        F.col("__i").alias("antecedent"), F.col("__ni").alias("n_antecedent")
    )
    jc = item_counts.select(
        F.col("__i").alias("consequent"), F.col("__ni").alias("n_consequent")
    )
    g = (
        pairs.join(F.broadcast(ja), "antecedent")
        .join(F.broadcast(jc), "consequent")
        .crossJoin(F.broadcast(totals))
    )
    N = F.col("__N").cast("double")
    supp = F.col("n_pair").cast("double") / N
    conf = F.col("n_pair").cast("double") / F.col("n_antecedent").cast("double")
    lift = conf / (F.col("n_consequent").cast("double") / N)
    return g.select(
        "antecedent",
        "consequent",
        "n_pair",
        "n_antecedent",
        "n_consequent",
        _q9(supp).alias("support"),
        _q9(conf).alias("confidence"),
        _q9(lift).alias("lift"),
    )


def assoc_rules_sql(
    table: str,
    *,
    ts: str = "ts",
    user: str = "user_id",
    item: str = "event_type",
    window_seconds: int = 1800,
    min_pair_count: int = 2,
) -> str:
    n = "CAST(__N AS DOUBLE)"
    supp = f"CAST(n_pair AS DOUBLE) / {n}"
    conf = "CAST(n_pair AS DOUBLE) / CAST(n_antecedent AS DOUBLE)"
    lift = f"({conf}) / (CAST(n_consequent AS DOUBLE) / {n})"
    return f"""
WITH baskets AS (
  SELECT DISTINCT {user} AS u,
         CAST(floor(epoch({ts}) / {window_seconds}) AS BIGINT) AS w,
         {item} AS i
  FROM {table}
  WHERE {item} IS NOT NULL AND {user} IS NOT NULL AND {ts} IS NOT NULL
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS __N
  FROM (SELECT DISTINCT u, w FROM baskets)
),
item_counts AS (
  SELECT i, CAST(count(*) AS BIGINT) AS ni FROM baskets GROUP BY 1
),
pairs AS (
  SELECT l.i AS antecedent, r.i AS consequent, CAST(count(*) AS BIGINT) AS n_pair
  FROM baskets l JOIN baskets r ON l.u = r.u AND l.w = r.w AND l.i <> r.i
  GROUP BY 1, 2
  HAVING count(*) >= {int(min_pair_count)}
)
SELECT p.antecedent, p.consequent, p.n_pair,
       a.ni AS n_antecedent, c.ni AS n_consequent,
       {_Q9_SQL.format(x=supp)} AS support,
       {_Q9_SQL.format(x=conf)} AS confidence,
       {_Q9_SQL.format(x=lift)} AS lift
FROM pairs p
JOIN item_counts a ON a.i = p.antecedent
JOIN item_counts c ON c.i = p.consequent
CROSS JOIN totals
"""
