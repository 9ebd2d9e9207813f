"""Text analysis operators: quality stats, language id, token counts,
fingerprints.  All JVM-side column expressions over the ``documents``
table; embarrassingly parallel (no shuffles except final aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import NORM_SQL, _norm
from .hashing import HEX_DIGITS, md5_int, md5_int_sql

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "for")

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "est", "une"),
}


def _tokens(text: Column) -> Column:
    return F.split(_norm(text), " ")


def text_stats(df: DataFrame, *, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punct/stopword ratios.

    Output: ``doc_id, n_chars_calc, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, upper_ratio``.  All ratios are exact integer counts
    divided as doubles — deterministic across engines.
    """
    t = F.col(text)
    toks = _tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    alnum_ws = F.length(F.regexp_replace(t, "[^A-Za-z0-9 \\t\\n]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        (tok_chars / n_tokens).alias("avg_token_len"),
        ((n_chars - alnum_ws) / n_chars).alias("punct_ratio"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (upper / n_chars).alias("upper_ratio"),
    )


def text_stats_sql(table: str, *, text: str = "text", id_col: str = "doc_id") -> str:
    norm = NORM_SQL.format(c=text)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
SELECT {id_col},
  length({text}) AS n_chars_calc,
  len(str_split({norm}, ' ')) AS n_tokens,
  list_sum(list_transform(str_split({norm}, ' '), x -> length(x)))
    / CAST(len(str_split({norm}, ' ')) AS DOUBLE) AS avg_token_len,
  (length({text}) - length(regexp_replace({text}, '[^A-Za-z0-9 \\t\\n]', '', 'g')))
    / CAST(length({text}) AS DOUBLE) AS punct_ratio,
  len(list_filter(str_split({norm}, ' '), x -> x IN ({stop_list})))
    / CAST(len(str_split({norm}, ' ')) AS DOUBLE) AS stopword_ratio,
  length(regexp_replace({text}, '[^A-Z]', '', 'g'))
    / CAST(length({text}) AS DOUBLE) AS upper_ratio
FROM {table}
"""


# Gopher-style curation thresholds (integer-comparison rules only, so the
# keep/drop decision is bit-identical across engines).
QUALITY_RULES = (
    # (reason, SQL predicate template over the text_stats feature columns)
    # coalesce: a NULL text yields n_tokens NULL in DuckDB but -1 in
    # Spark (legacy size(NULL)); both must DROP the doc, not let NULL
    # comparisons skip every rule and silently keep it
    ("too_short", "coalesce(n_tokens, -1) < {min_tokens}"),
    ("too_long", "n_tokens > {max_tokens}"),
    ("punct_heavy", "punct_ratio * 100 > {max_punct_pct}"),
    ("no_stopwords", "stopword_ratio * 100 < {min_stopword_pct}"),
    ("shouting", "upper_ratio * 100 > {max_upper_pct}"),
)

QUALITY_DEFAULTS = dict(
    min_tokens=10, max_tokens=100_000, max_punct_pct=10,
    min_stopword_pct=2, max_upper_pct=20,
)


def quality_filter(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", **thresholds
) -> DataFrame:
    """Rule-based document curation: ``doc_id, keep, reject_reason``.

    The filtering pass a training pipeline runs after scoring — each rule
    names its rejection so curation decisions are auditable; first
    matching rule wins (fixed rule order).  Pure column expressions over
    :func:`text_stats` features; at scale this is a single map-side pass.
    """
    params = {**QUALITY_DEFAULTS, **thresholds}
    stats = text_stats(df, text=text, id_col=id_col)
    reason: Column | None = None
    for name, tmpl in QUALITY_RULES:
        cond = F.expr(tmpl.format(**params))
        branch = F.when(cond, F.lit(name))
        reason = branch if reason is None else reason.when(cond, F.lit(name))
    reason = reason.otherwise(F.lit(None).cast("string"))
    return stats.select(
        F.col(id_col),
        reason.alias("reject_reason"),
    ).withColumn("keep", F.col("reject_reason").isNull())


def quality_filter_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id", **thresholds
) -> str:
    params = {**QUALITY_DEFAULTS, **thresholds}
    cases = " ".join(
        f"WHEN {tmpl.format(**params)} THEN '{name}'" for name, tmpl in QUALITY_RULES
    )
    return f"""
WITH stats AS ({text_stats_sql(table, text=text, id_col=id_col)})
SELECT {id_col},
       CASE {cases} END AS reject_reason,
       (CASE {cases} END) IS NULL AS keep
FROM stats
"""


def lang_id(df: DataFrame, *, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-vocabulary language guess (deterministic argmax).

    Output: ``doc_id, lang_guess, lang_score`` where score = marker hits /
    n_tokens and ties break lexicographically-last (struct-max lattice,
    identical in the oracle).
    """
    toks = _tokens(F.col(text))
    n = F.size(toks)
    def _hits(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    cands = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, _hits(markers))) / n).alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang, markers in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(cands)
    return df.select(
        F.col(id_col), best["l"].alias("lang_guess"), F.round(best["s"], 9).alias("lang_score")
    )


def lang_id_sql(table: str, *, text: str = "text", id_col: str = "doc_id") -> str:
    norm = NORM_SQL.format(c=text)
    toks = f"str_split({norm}, ' ')"
    packs = ", ".join(
        "struct_pack(s := len(list_filter({toks}, x -> x IN ({m}))) / CAST(len({toks}) AS DOUBLE), l := '{lang}')".format(
            toks=toks, m=", ".join(f"'{w}'" for w in markers), lang=lang
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    return f"""
SELECT {id_col},
       (list_max([{packs}])).l AS lang_guess,
       round((list_max([{packs}])).s, 9) AS lang_score
FROM {table}
"""


def token_count(df: DataFrame, *, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex pieces, chars/4.

    Output: ``doc_id, ws_tokens, regex_tokens, approx_bpe_tokens``.
    """
    t = F.col(text)
    return df.select(
        F.col(id_col),
        F.size(_tokens(t)).alias("ws_tokens"),
        F.regexp_count(t, F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).alias("regex_tokens"),
        F.ceil(F.length(t) / F.lit(4.0)).alias("approx_bpe_tokens"),
    )


def token_count_sql(table: str, *, text: str = "text", id_col: str = "doc_id") -> str:
    norm = NORM_SQL.format(c=text)
    return f"""
SELECT {id_col},
  len(str_split({norm}, ' ')) AS ws_tokens,
  len(regexp_extract_all({text}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS regex_tokens,
  CAST(ceil(length({text}) / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM {table}
"""


def fingerprint(df: DataFrame, *, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: content md5 + order-sensitive polynomial roll.

    ``poly = fold(tokens, acc = (acc*31 + h(tok)) mod 2^31-1)`` — an
    order-sensitive rolling hash (reordered tokens change it, unlike the
    md5-of-normalized-text content hash).
    """
    p = 2_147_483_647
    toks = _tokens(F.col(text))
    poly = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + md5_int(x)) % F.lit(p),
    )
    return df.select(
        F.col(id_col),
        F.md5(_norm(F.col(text))).alias("content_md5"),
        poly.alias("rolling_hash"),
    )


def fingerprint_sql(table: str, *, text: str = "text", id_col: str = "doc_id") -> str:
    norm = NORM_SQL.format(c=text)
    h = md5_int_sql("x")
    return f"""
SELECT {id_col},
  md5({norm}) AS content_md5,
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(str_split({norm}, ' '), x -> {h})),
              (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_hash
FROM {table}
"""


# -- dataset assembly: deterministic sampling / splitting / distribution ----
#
# Training pipelines shard, sample, and split by DETERMINISTIC salted
# hashes so assignments are reproducible across runs and engines (never
# rand() — Spark and any oracle disagree on RNG streams, and re-runs must
# not reshuffle a published dataset split).  The hash is llm.hashing
# .md5_int, identical in Spark and DuckDB.  The default bucket key is the
# DOCUMENT ID (``id_col``): stability across re-runs therefore requires
# stable ids.  Pass ``id_col="text"`` (or any content column) to bucket
# by content instead, making assignment survive id re-assignment at the
# cost of exact duplicates always landing in the same split/sample.


def hash_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    strata: str | None = "lang",
    pct: int = 10,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~pct% sample: keep rows whose salted ``id_col`` hash
    lands under the cut (id-derived by default — see the module note on
    stability; pass a content column as ``id_col`` for id-independent
    assignment).  With ``strata`` set, the output reports the
    per-stratum sampled/total counts (the curation-report shape)."""
    from .hashing import md5_int

    bucket = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 100
    sampled = F.when(bucket < pct, 1).otherwise(0)
    keys = [strata] if strata else []
    return (
        df.select(*keys, sampled.alias("in_sample"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("in_sample").alias("n_sampled"),
        )
    )


def hash_sample_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    strata: str | None = "lang",
    pct: int = 10,
    salt: str = "sample",
) -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    keys = f"{strata}, " if strata else ""
    grp = f"GROUP BY {strata}" if strata else ""
    return f"""
SELECT {keys}count(*) AS n_total,
       CAST(sum(CASE WHEN ({h}) % 100 < {pct} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM {table} {grp}
"""


SPLITS = (("train", 0, 80), ("val", 80, 90), ("test", 90, 100))


def _bucket_offsets(sizes: DataFrame, *, key: str, sums: dict[str, str]) -> DataFrame:
    """Cumulative totals of all strictly-PRECEDING buckets, via a bounded
    triangular join over the broadcast bucket table (<= buckets rows by
    construction) — the window-free form of ``sum(...) OVER (ORDER BY
    key ROWS UNBOUNDED PRECEDING AND -1)``.  Keeps corpus-scale plans
    entirely free of single-partition windows, so the plan audit's
    1PART-WINDOW flag stays a true red flag (epoch_shuffle and
    split_drift_ks were its only benign-by-design hits once the
    detector was fixed; this removed them).  ``sums`` maps output
    column -> source column."""
    a = sizes.select(F.col(key).alias("__ka"))
    b = sizes.select(
        F.col(key).alias("__kb"),
        *[F.col(src).alias(f"__v_{out}") for out, src in sums.items()],
    )
    return (
        a.join(F.broadcast(b), F.col("__kb") < F.col("__ka"), "left")
        .groupBy("__ka")
        .agg(
            *[
                F.coalesce(F.sum(f"__v_{out}"), F.lit(0)).cast("long").alias(out)
                for out in sums
            ]
        )
        .withColumnRenamed("__ka", key)
    )


def dataset_split(
    df: DataFrame, *, id_col: str = "doc_id", salt: str = "split-v1"
) -> DataFrame:
    """Assign every document to train/val/test by salted ``id_col`` hash —
    stable across runs, engines, and re-shards as long as ids are stable
    (the property random splits lack; see the module note for content-
    keyed assignment).  Output: ``doc_id, split``."""
    from .hashing import md5_int

    bucket = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 100
    expr = None
    for name, lo, hi in SPLITS:
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.select(F.col(id_col), expr.alias("split"))


def dataset_split_sql(table: str, *, id_col: str = "doc_id", salt: str = "split-v1") -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    cases = " ".join(
        f"WHEN ({h}) % 100 >= {lo} AND ({h}) % 100 < {hi} THEN '{name}'"
        for name, lo, hi in SPLITS
    )
    return f"SELECT {id_col}, CASE {cases} END AS split FROM {table}"


def split_drift_ks(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    salt: str = "split-v1",
    split_a: str = "train",
    split_b: str = "val",
    bucket_width: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between dataset splits over
    the token-count feature — the QA check that a heldout split is
    distributionally representative of train (a bad split silently
    biases eval).  ``KS = max over v of |ECDF_a(v) - ECDF_b(v)|``,
    computed EXACTLY in integer arithmetic: ``|cum_a(v)*n_b -
    cum_b(v)*n_a|`` maximized, divided once at the end.

    Scale: one (value)-keyed count shuffle; the cumulative ECDF uses the
    epoch_shuffle decomposition — per-bucket (``floor(v/width)``,
    order-preserving) running sums plus a broadcast bucket-offset table
    (the only single-partition window, bounded by the feature's support
    / width, not the corpus).  Output: one row ``n_a, n_b, ks_stat,
    at_value`` (the value achieving the max; smallest on ties).

    Empty-split contract: if either split has zero documents (tiny
    corpus, or a salt that assigns nothing to one split) the KS statistic
    is undefined — ``ks_stat`` is emitted as an EXPLICIT NULL (never
    NaN).  A threshold gate ``ks_stat < t`` then evaluates NULL → the
    gate FAILS rather than silently passing; check ``n_a``/``n_b`` > 0
    to distinguish "no drift" from "not measurable".
    """
    from pyspark.sql import Window

    sp = dataset_split(df, id_col=id_col, salt=salt)
    feat = (
        # NULL text is excluded (Spark's size(NULL) is -1, a nonsense
        # ECDF point the oracle's len(str_split(NULL)) would not emit)
        df.filter(F.col(text).isNotNull())
        .select(F.col(id_col), F.size(_tokens(F.col(text))).alias("v"))
        .join(sp, id_col)
        .filter(F.col("split").isin(split_a, split_b))
    )
    counts = feat.groupBy("v").agg(
        F.sum(F.when(F.col("split") == split_a, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("split") == split_b, 1).otherwise(0)).cast("long").alias("cb"),
    )
    return ks_from_counts(counts, bucket_width=bucket_width)


def ks_from_counts(counts: DataFrame, *, bucket_width: int = 64) -> DataFrame:
    """The exact integer ECDF-comparison tail of :func:`split_drift_ks`,
    taking the two-sided per-value counts table ``v, ca, cb`` directly —
    shared with the streaming twin (``streaming.pipeline.stream_ks``),
    whose additive count partials reproduce identical counts, so the
    live statistic equals the batch statistic over the union exactly."""
    from pyspark.sql import Window

    counts = counts.withColumn("__b", F.floor(F.col("v") / bucket_width).cast("long"))
    wb = Window.partitionBy("__b").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    local = counts.select(
        "v", "__b",
        F.sum("ca").over(wb).alias("la"), F.sum("cb").over(wb).alias("lb"),
    )
    sizes = counts.groupBy("__b").agg(
        F.sum("ca").alias("sa"), F.sum("cb").alias("sb")
    )
    offsets = _bucket_offsets(sizes, key="__b", sums={"oa": "sa", "ob": "sb"})
    tot = counts.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    cum = local.join(F.broadcast(offsets), "__b").select(
        "v",
        (F.col("oa") + F.col("la")).cast("decimal(38,0)").alias("cuma"),
        (F.col("ob") + F.col("lb")).cast("decimal(38,0)").alias("cumb"),
    )
    diff = cum.crossJoin(F.broadcast(tot)).select(
        "v", "na", "nb",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")).alias("dnum"),
    )
    best = F.max(F.struct(F.col("dnum").alias("d"), (-F.col("v")).cast("long").alias("nv")))
    na0 = F.first("na")
    nb0 = F.first("nb")
    return diff.groupBy().agg(
        na0.alias("n_a"),
        nb0.alias("n_b"),
        # empty split => KS undefined: explicit NULL, never a 0/0 NaN
        F.when(
            (na0 > 0) & (nb0 > 0),
            best["d"].cast("double") / (na0.cast("double") * nb0.cast("double")),
        ).alias("ks_stat"),
        (-best["nv"]).cast("long").alias("at_value"),
    )


def split_drift_ks_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    salt: str = "split-v1",
    split_a: str = "train",
    split_b: str = "val",
) -> str:
    norm = NORM_SQL.format(c=text)
    sp = dataset_split_sql(table, id_col=id_col, salt=salt).strip()
    return f"""
WITH sp AS ({sp}),
feat AS (
  SELECT d.{id_col}, len(str_split({norm}, ' ')) AS v, sp.split
  FROM {table} d JOIN sp USING ({id_col})
  WHERE sp.split IN ('{split_a}', '{split_b}') AND d.{text} IS NOT NULL
),
counts AS (
  SELECT v,
         CAST(sum(CASE WHEN split = '{split_a}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN split = '{split_b}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM feat GROUP BY 1
),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM counts),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cumb
  FROM counts
),
diff AS (
  SELECT v, na, nb, abs(cuma * nb - cumb * na) AS dnum
  FROM cum CROSS JOIN tot
)
SELECT any_value(na) AS n_a, any_value(nb) AS n_b,
       CASE WHEN any_value(na) > 0 AND any_value(nb) > 0 THEN
         CAST((max(struct_pack(d := dnum, nv := -v))).d AS DOUBLE)
           / (CAST(any_value(na) AS DOUBLE) * CAST(any_value(nb) AS DOUBLE))
       END AS ks_stat,
       CAST(-(max(struct_pack(d := dnum, nv := -v))).nv AS BIGINT) AS at_value
FROM diff
"""


def split_drift_psi(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    salt: str = "split-v1",
    split_a: str = "train",
    split_b: str = "val",
    bin_width: int = 32,
    eps: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between dataset splits over the
    token-count feature — :func:`split_drift_ks`'s model-monitoring
    sibling (the statistic credit-risk/ML-ops dashboards alarm on;
    conventional reading: <0.1 stable, 0.1-0.25 moderate, >0.25 major
    shift):

        PSI = sum over bins of (p_i - q_i) * ln(p_i / q_i)

    with ``p``/``q`` the per-bin proportions of the two splits.  Where
    KS finds the single worst ECDF gap (location-sensitive, binless),
    PSI charges EVERY reshaped bin — mass moving symmetrically in two
    directions cancels in KS's max but adds in PSI.

    Bins a split has no mass in get the standard epsilon clamp
    (``max(p, eps)``, fixed documented constant) — the log stays
    finite and the clamp is engine-deterministic.  Cross-engine
    exactness: proportions are single long/long double divisions;
    each bin's term passes the shared away-from-zero 1e-6 floor
    quantization (absorbing cross-libm ``ln`` ulp) into a BIGINT, and
    the total is the EXACT integer sum of those BIGINTs divided once —
    no float-sum order dependence.  Empty-split contract: either split
    empty => ``psi_term``/``psi_total`` explicit NULL (the
    :func:`split_drift_ks` gate discipline).

    Output: one row per occupied bin — ``bin_lo, n_a, n_b, psi_term,
    psi_total`` (the total repeated per row, broadcast-joined).
    Scale: one (bin)-keyed count shuffle (map-side combinable), a
    1-row totals broadcast, an O(bins)-row totals aggregate; the
    corpus is scanned once and never re-shuffled.
    """
    sp = dataset_split(df, id_col=id_col, salt=salt)
    feat = (
        df.filter(F.col(text).isNotNull())
        .select(F.col(id_col), F.size(_tokens(F.col(text))).alias("v"))
        .join(sp, id_col)
        .filter(F.col("split").isin(split_a, split_b))
    )
    bins = feat.groupBy(
        (F.floor(F.col("v") / bin_width) * bin_width).cast("long").alias("bin_lo")
    ).agg(
        F.sum(F.when(F.col("split") == split_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("split") == split_b, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    return psi_from_counts(bins, eps=eps)


def psi_from_counts(bins: DataFrame, *, eps: float = 1e-4) -> DataFrame:
    """The PSI arithmetic tail of :func:`split_drift_psi`, taking the
    per-bin two-sided counts table ``bin_lo, n_a, n_b`` directly —
    shared with the streaming twin (``streaming.pipeline.stream_psi``)
    so the live gate's clamp/quantization can never desynchronize from
    the batch gate's."""
    tot = bins.agg(
        F.sum("n_a").cast("long").alias("__ta"), F.sum("n_b").cast("long").alias("__tb")
    )
    e = F.lit(float(eps))
    p = F.greatest(F.col("n_a").cast("double") / F.col("__ta").cast("double"), e)
    q = F.greatest(F.col("n_b").cast("double") / F.col("__tb").cast("double"), e)
    term = (p - q) * F.log(p / q)
    # away-from-zero floor quantization at 1e-6 into a BIGINT: absorbs
    # the cross-libm ln ulp AND makes the total an exact integer sum
    tq = (
        F.when(term >= 0, F.floor(term * F.lit(1e6) + F.lit(0.5)))
        .otherwise(-F.floor(-term * F.lit(1e6) + F.lit(0.5)))
        .cast("long")
    )
    per_bin = bins.crossJoin(F.broadcast(tot)).select(
        "bin_lo",
        "n_a",
        "n_b",
        F.when((F.col("__ta") > 0) & (F.col("__tb") > 0), tq).alias("__tq"),
    )
    total = per_bin.agg(F.sum("__tq").cast("long").alias("__tot"))
    return per_bin.crossJoin(F.broadcast(total)).select(
        "bin_lo",
        "n_a",
        "n_b",
        (F.col("__tq").cast("double") / F.lit(1e6)).alias("psi_term"),
        (F.col("__tot").cast("double") / F.lit(1e6)).alias("psi_total"),
    )


def split_drift_psi_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    salt: str = "split-v1",
    split_a: str = "train",
    split_b: str = "val",
    bin_width: int = 32,
    eps: float = 1e-4,
) -> str:
    norm = NORM_SQL.format(c=text)
    sp = dataset_split_sql(table, id_col=id_col, salt=salt).strip()
    e = f"CAST({float(eps)!r} AS DOUBLE)"
    p = f"greatest(CAST(n_a AS DOUBLE) / CAST(__ta AS DOUBLE), {e})"
    q = f"greatest(CAST(n_b AS DOUBLE) / CAST(__tb AS DOUBLE), {e})"
    term = f"(({p}) - ({q})) * ln(({p}) / ({q}))"
    tq = (
        f"CASE WHEN ({term}) >= 0 THEN CAST(floor(({term}) * 1e6 + 0.5) AS BIGINT) "
        f"ELSE -CAST(floor(-({term}) * 1e6 + 0.5) AS BIGINT) END"
    )
    return f"""
WITH sp AS ({sp}),
feat AS (
  SELECT d.{id_col}, len(str_split({norm}, ' ')) AS v, sp.split
  FROM {table} d JOIN sp USING ({id_col})
  WHERE sp.split IN ('{split_a}', '{split_b}') AND d.{text} IS NOT NULL
),
bins AS (
  SELECT CAST(floor(v / {bin_width}) * {bin_width} AS BIGINT) AS bin_lo,
         CAST(sum(CASE WHEN split = '{split_a}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN split = '{split_b}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM feat GROUP BY 1
),
tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS __ta, CAST(sum(n_b) AS BIGINT) AS __tb FROM bins),
per_bin AS (
  SELECT bin_lo, n_a, n_b,
         CASE WHEN __ta > 0 AND __tb > 0 THEN {tq} END AS __tq
  FROM bins CROSS JOIN tot
),
total AS (SELECT CAST(sum(__tq) AS BIGINT) AS __tot FROM per_bin)
SELECT bin_lo, n_a, n_b,
       CAST(__tq AS DOUBLE) / 1e6 AS psi_term,
       CAST(__tot AS DOUBLE) / 1e6 AS psi_total
FROM per_bin CROSS JOIN total
"""


def token_histogram(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", bin_width: int = 10
) -> DataFrame:
    """Token-count distribution: docs per ``bin_width``-token bin — the
    summary a curation report plots before/after filtering."""
    toks = F.size(_tokens(F.col(text)))
    b = F.floor(toks / bin_width) * bin_width
    return (
        df.select(b.cast("long").alias("bin_lo"))
        .groupBy("bin_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def token_histogram_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id", bin_width: int = 10
) -> str:
    norm = NORM_SQL.format(c=text)
    return f"""
SELECT CAST(floor(len(str_split({norm}, ' ')) / {bin_width}) * {bin_width} AS BIGINT) AS bin_lo,
       count(*) AS n_docs
FROM {table} GROUP BY 1
"""


# --- PII scrubbing ----------------------------------------------------------
#
# Patterns are kept to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically — char classes, bounded quantifiers, \b, \d —
# so the oracle reproduces matches exactly.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


def pii_scrub(df: DataFrame, *, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Compliance pass: count and redact emails / IPv4s / phone numbers.

    Output: ``doc_id, n_email, n_ip, n_phone, clean_hash`` — counts are
    matched on the ORIGINAL text (category patterns are disjoint), the
    hash is md5 of the text after sequential redaction (email -> ip ->
    phone), so a downstream exact-dedup over scrubbed text is stable.
    Pure column expressions, embarrassingly parallel.
    """
    t = F.col(text)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(F.col(id_col), *counts, F.md5(scrubbed).alias("clean_hash"))


def pii_scrub_sql(table: str, *, text: str = "text", id_col: str = "doc_id") -> str:
    counts = ",\n  ".join(
        f"len(regexp_extract_all({text}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrubbed = text
    for _, pat, token in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{token}', 'g')"
    return f"""
SELECT {id_col},
  {counts},
  md5({scrubbed}) AS clean_hash
FROM {table}
"""


# --- repetition / boilerplate signal ----------------------------------------


def repetition_stats(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", ngram: int = 3
) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicate word n-grams.

    Output: ``doc_id, n_grams, n_distinct, dup_ratio`` (0.0 for docs too
    short to have an n-gram).  Row-local array expressions — no shuffle,
    no explode (the per-doc gram list never leaves its row).
    """
    staged = df.select(F.col(id_col), _tokens(F.col(text)).alias("__toks"))
    grams = F.when(
        F.size(F.col("__toks")) >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("__toks")) - (ngram - 1)),
            lambda i: F.array_join(F.slice(F.col("__toks"), i, ngram), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = staged.select(F.col(id_col), grams.alias("__g"))
    n = F.size(F.col("__g"))
    nd = F.size(F.array_distinct(F.col("__g")))
    return g.select(
        F.col(id_col),
        n.alias("n_grams"),
        nd.alias("n_distinct"),
        F.when(n > 0, F.round(F.lit(1.0) - nd / n, 9)).otherwise(F.lit(0.0)).alias("dup_ratio"),
    )


def repetition_stats_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id", ngram: int = 3
) -> str:
    norm = NORM_SQL.format(c=text)
    gram = " || ' ' || ".join(f"__t[i + {j}]" for j in range(ngram))
    return f"""
WITH staged AS (
  SELECT {id_col}, str_split({norm}, ' ') AS __t FROM {table}
),
g AS (
  SELECT {id_col},
         CASE WHEN len(__t) >= {ngram}
              THEN list_transform(range(1, len(__t) - {ngram - 2}), i -> {gram})
              ELSE [] END AS __g
  FROM staged
)
SELECT {id_col},
  len(__g) AS n_grams,
  len(list_distinct(__g)) AS n_distinct,
  CASE WHEN len(__g) > 0
       THEN round(1.0 - len(list_distinct(__g)) / CAST(len(__g) AS DOUBLE), 9)
       ELSE 0.0 END AS dup_ratio
FROM g
"""


# --- sequence packing -------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    shard: str = "lang",
    token_budget: int = 256,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document a chunk id
    so concatenating a shard's docs in ``id`` order and cutting every
    ``token_budget`` tokens yields the training sequences.

    Output: ``doc_id, <shard>, n_tokens, chunk_id, offset_in_chunk``.
    ``chunk_id = exclusive-prefix-token-sum div budget`` — the standard
    approximation (a doc may straddle a boundary; the chunker downstream
    splits it).  One keyed window per shard: packing is inherently
    sequential WITHIN a shard, so at 100 TB the shard key (lang, source,
    or an explicit shard column) is the parallelism unit — exactly how
    production packers run.
    """
    from pyspark.sql import Window

    toks = F.size(_tokens(F.col(text)))
    staged = df.select(F.col(id_col), F.col(shard), toks.alias("n_tokens"))
    w = (
        Window.partitionBy(shard)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = staged.withColumn(
        "__cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # integer div/mod (not floor of a double quotient): exact at any
    # shard token count, and identical to DuckDB's // and %
    return packed.select(
        id_col,
        shard,
        "n_tokens",
        F.expr(f"__cum div {token_budget}").alias("chunk_id"),
        F.pmod(F.col("__cum"), F.lit(token_budget)).cast("long").alias("offset_in_chunk"),
    )


def pack_sequences_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    shard: str = "lang",
    token_budget: int = 256,
) -> str:
    norm = NORM_SQL.format(c=text)
    return f"""
WITH staged AS (
  SELECT {id_col}, {shard}, len(str_split({norm}, ' ')) AS n_tokens FROM {table}
),
packed AS (
  SELECT *,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY {shard} ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS __cum
  FROM staged
)
SELECT {id_col}, {shard}, n_tokens,
       __cum // {token_budget} AS chunk_id,
       __cum % {token_budget} AS offset_in_chunk
FROM packed
"""


# --- document chunking ------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows — the
    pre-tokenizer chunking step of an embedding/RAG/pretraining pipeline.

    Chunks start every ``stride = chunk_tokens - overlap`` tokens;
    ``n_chunks = ceil(max(0, n - chunk_tokens) / stride) + 1`` so the
    final chunk always covers the tail and a short document yields
    exactly one chunk.  Output: ``doc_id, chunk_id, n_chunks,
    chunk_text, chunk_len`` (chunk_len in tokens).

    Scale: whitespace tokenization + slice/array_join are per-row column
    expressions; the only row multiplication is the posexplode of chunk
    indices (ints — the token array rides the Generate's carried row, it
    is never duplicated per chunk by value).  No shuffle at all.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    from ..catalog import spread

    staged = spread(df).select(
        F.col(id_col),
        F.split(F.trim(F.col(text)), "\\s+").alias("__toks"),
    )
    sized = staged.select(
        F.col(id_col),
        F.col("__toks"),
        F.expr(
            f"((greatest(size(__toks) - {chunk_tokens}, 0) + {stride - 1}) div {stride}) + 1"
        ).alias("n_chunks"),
    )
    start = F.col("chunk_id") * stride + 1
    return (
        sized.select(
            F.col(id_col),
            "n_chunks",
            "__toks",
            F.explode(F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.array_join(F.slice(F.col("__toks"), start, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size("__toks") - F.col("chunk_id") * stride).cast(
                "long"
            ).alias("chunk_len"),
        )
    )


def chunk_documents_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> str:
    stride = chunk_tokens - overlap
    return f"""
WITH sized AS (
  SELECT {id_col},
         str_split_regex(trim({text}), '\\s+') AS toks,
         ((greatest(len(str_split_regex(trim({text}), '\\s+')) - {chunk_tokens}, 0)
           + {stride - 1}) // {stride}) + 1 AS n_chunks
  FROM {table}
)
SELECT {id_col},
       unnest(generate_series(0, n_chunks - 1)) AS chunk_id,
       n_chunks,
       array_to_string(toks[unnest(generate_series(0, n_chunks - 1)) * {stride} + 1
                            : unnest(generate_series(0, n_chunks - 1)) * {stride} + {chunk_tokens}],
                       ' ') AS chunk_text,
       least({chunk_tokens}, len(toks) - unnest(generate_series(0, n_chunks - 1)) * {stride}) AS chunk_len
FROM sized
"""


# --- balanced sampling ------------------------------------------------------


def balanced_sample(
    df: DataFrame,
    *,
    strata: str = "lang",
    id_col: str = "doc_id",
    k: int = 20,
    salt: str = "balance-v1",
    skew_safe: bool = False,
) -> DataFrame:
    """Deterministic k-per-stratum sample: within each stratum keep the k
    rows with the smallest salted id-hash (never ``rand()`` — the sample
    is reproducible across runs, engines, and re-shards; see the module
    note on id- vs content-keyed hashing).

    Output: ``strata, doc_id, sample_rank`` (rank 1..k by hash order).

    Scale: one shuffle keyed by stratum + an in-partition top-k.  A
    degenerate stratum holding most of the corpus makes that one task
    hot — pass ``skew_safe=True`` to route through the two-phase salted
    top-k (:func:`..operators.skew.salted_topk`): identical output,
    n_salts-way parallel within the mega-stratum (equivalence is
    property-tested).
    """
    from pyspark.sql import Window

    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    if skew_safe:
        from ..operators.skew import salted_topk

        return (
            salted_topk(
                df.select(F.col(strata), F.col(id_col), h.alias("__h")),
                [strata],
                [F.col("__h").asc(), F.col(id_col).asc()],
                k=k,
                salt_on=id_col,
            )
            .select(F.col(strata), F.col(id_col), F.col("__rank").alias("sample_rank"))
        )
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(strata), F.col(id_col), F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= k)
    )


def balanced_sample_sql(
    table: str,
    *,
    strata: str = "lang",
    id_col: str = "doc_id",
    k: int = 20,
    salt: str = "balance-v1",
) -> str:
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
WITH ranked AS (
  SELECT {strata}, {id_col},
         row_number() OVER (PARTITION BY {strata} ORDER BY ({h}) ASC, {id_col} ASC)
           AS sample_rank
  FROM {table}
)
SELECT {strata}, {id_col}, CAST(sample_rank AS INTEGER) AS sample_rank
FROM ranked WHERE sample_rank <= {k}
"""


# --- dataset ordering -------------------------------------------------------


def epoch_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "epoch-0",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic global training order WITHOUT a global sort/window.

    Every document gets a dense position 0..N-1 in salted-hash order
    (change ``salt`` per epoch for a fresh permutation; same salt ==
    same order on every run and engine — ``rand()`` can't give that).

    Scale: the global rank is composed from order-preserving hash-range
    buckets — ``bucket = h div (2^28/buckets)`` so (bucket, h, id) sorts
    identically to (h, id): a per-bucket ``row_number`` (one shuffle,
    ~N/buckets rows per task), plus a cumulative bucket-offset table
    (``buckets`` rows, computed by the window-free bounded triangular
    join ``_bucket_offsets``) broadcast back.  Output: ``doc_id,
    position``.
    """
    from pyspark.sql import Window

    width = (1 << (4 * HEX_DIGITS)) // buckets
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), h.alias("__h"), (h / width).cast("long").alias("__b"))
    wb = Window.partitionBy("__b").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    ranked = keyed.withColumn("__r", F.row_number().over(wb))
    sizes = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    offsets = _bucket_offsets(sizes, key="__b", sums={"__off": "__n"})
    return (
        ranked.join(F.broadcast(offsets.select("__b", "__off")), "__b")
        .select(F.col(id_col), (F.col("__off") + F.col("__r") - 1).alias("position"))
    )


def epoch_shuffle_sql(
    table: str, *, id_col: str = "doc_id", salt: str = "epoch-0", buckets: int = 1024
) -> str:
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {id_col},
       row_number() OVER (ORDER BY ({h}) ASC, {id_col} ASC) - 1 AS position
FROM {table}
"""


# --- BM25 retrieval ---------------------------------------------------------


def bm25_search(
    df: DataFrame,
    query: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k retrieval over the corpus for a constant query string
    (Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Scale: ONE tokenization pass over the corpus (round 14 — the prior
    shape tokenized three times: once for tf, once re-deriving it for
    document frequencies, once for avgdl).  The pass materializes a
    per-doc frame ``(id, dl, query-term tokens)`` — O(n_docs) narrow
    rows (the token array is filtered to the query's terms map-side,
    BEFORE it ever leaves the scan) — and tf, document frequencies and
    N/avgdl all derive from it; the 1-row stats aggregate broadcasts
    back.  ``size``/``filter`` share the split via subexpression
    elimination; ``avg(dl)`` over the same ``size`` expression is
    bit-identical to the prior corpus-wide ``avg(size(tokens))``
    (nulls skip in both).  Output: ``doc_id, score, rank``.
    """
    import re

    from pyspark.sql import Window

    from .. import lineage

    qterms = sorted(set(re.sub(r"\s+", " ", query.lower().strip()).split(" ")))
    toks = _tokens(F.col(text))
    docs = lineage.cut(
        df.select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.filter(toks, lambda t: t.isin(qterms)).alias("__qt"),
        )
    )
    base = docs.select(F.col(id_col), "dl", F.explode("__qt").alias("term"))
    tf = base.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    term_score = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )
    # top-k via orderBy+limit (TakeOrderedAndProject — distributed partial
    # top-k per partition, never a single-partition global window); the
    # rank window then runs over only k rows.
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def bm25_search_sql(
    table: str,
    query: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> str:
    import re

    qterms = sorted(set(re.sub(r"\s+", " ", query.lower().strip()).split(" ")))
    terms_list = ", ".join(f"'{t}'" for t in qterms)
    norm = NORM_SQL.format(c=text)
    return f"""
WITH base AS (
  SELECT {id_col}, len(str_split({norm}, ' ')) AS dl,
         unnest(str_split({norm}, ' ')) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, dl, count(*) AS tf FROM base
  WHERE term IN ({terms_list}) GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, avg(len(str_split({norm}, ' '))) AS avgdl FROM {table}
),
scored AS (
  SELECT tf.{id_col},
         round(sum(
           ln(1.0 + (stats.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5))
           * (tf.tf * ({k1} + 1))
           / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN dfreq USING (term), stats
  GROUP BY 1
)
SELECT {id_col}, score,
       CAST(row_number() OVER (ORDER BY score DESC, {id_col} ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# --- mixture sampling -------------------------------------------------------

MIXTURE_WEIGHTS: dict[str, float] = {"web": 0.5, "wiki": 1.0, "code": 0.8, "books": 1.0}


def mixture_sample(
    df: DataFrame,
    *,
    weights: dict[str, float] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 0.1,
) -> DataFrame:
    """Deterministic per-group sampling rates — the corpus-mixing step
    (e.g. keep all wiki, half of web).  A document survives iff its
    salted id-hash lands under its group's rate scaled to 10,000 parts;
    the same doc always gets the same verdict across runs, engines, and
    re-shards (never ``rand()``).  Groups absent from ``weights`` get
    ``default_rate``.  Output: the surviving rows' ``id_col, group_col``.

    Scale: pure map-side filter — no shuffle, no driver data; the
    weights table is a literal CASE expression (bounded by the number of
    distinct sources, a config-sized constant).
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 10_000
    rate = None
    for g, w in sorted(weights.items()):
        cut = int(round(w * 10_000))
        rate = (
            F.when(F.col(group_col) == g, cut)
            if rate is None
            else rate.when(F.col(group_col) == g, cut)
        )
    rate = rate.otherwise(int(round(default_rate * 10_000))) if rate is not None else F.lit(
        int(round(default_rate * 10_000))
    )
    return df.select(F.col(id_col), F.col(group_col)).filter(h < rate)


def mixture_sample_sql(
    table: str,
    *,
    weights: dict[str, float] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 0.1,
) -> str:
    weights = MIXTURE_WEIGHTS if weights is None else weights
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    cases = " ".join(
        f"WHEN {group_col} = '{g}' THEN {int(round(w * 10_000))}"
        for g, w in sorted(weights.items())
    )
    return f"""
SELECT {id_col}, {group_col}
FROM {table}
WHERE ({h}) % 10000 < CASE {cases} ELSE {int(round(default_rate * 10_000))} END
"""


# --- curation reporting -----------------------------------------------------


def vocab_topk(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", k: int = 50
) -> DataFrame:
    """Corpus vocabulary induction: the k most frequent tokens with
    counts and document frequency — the first step of building a
    tokenizer or stopword list.  One token-keyed shuffle (map-side
    partial counts); top-k via TakeOrderedAndProject.
    Output: ``token, n_occurrences, n_docs, rank``."""
    from pyspark.sql import Window

    ex = df.select(F.col(id_col).alias("id"), F.explode(_tokens(F.col(text))).alias("token"))
    agg = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("id").alias("n_docs"),
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return (
        agg.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def vocab_topk_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id", k: int = 50
) -> str:
    norm = NORM_SQL.format(c=text)
    return f"""
WITH ex AS (
  SELECT {id_col} AS id, unnest(str_split({norm}, ' ')) AS token FROM {table}
),
agg AS (
  SELECT token, count(*) AS n_occurrences, count(DISTINCT id) AS n_docs
  FROM ex GROUP BY 1
)
SELECT token, n_occurrences, n_docs,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS INTEGER) AS rank
FROM agg
QUALIFY rank <= {k}
"""


def cooc_pmi_topk(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 5,
    k: int = 200,
) -> DataFrame:
    """Windowed token co-occurrence + PMI top-k: the distributional
    statistic under embedding training (word2vec/GloVe-style corpora) and
    collocation mining.  An ordered pair ``(w1, w2)`` is counted once per
    occurrence of ``w2`` within ``window`` tokens AFTER ``w1``.

    ``pmi = ln(n_pair * T / (c_left * c_right))`` over pair-table
    marginals (self-consistent: all four counts come from the same pair
    multiset), computed on the ``min_count``-filtered pairs but with
    marginals over ALL pairs.  The ln is rounded to 6 decimals (the
    lm_score cross-libm discipline — ln is not correctly-rounded IEEE);
    the ratio is built double x double / (double x double) in both
    engines so the argument is bit-identical.

    Scale: pair generation is map-side (one staged-token pass emitting
    ~len x window structs per doc — no self-join on doc id); one
    (w1, w2)-keyed count shuffle; marginals are two aggregates OVER THE
    PAIR-COUNT table (distinct pairs, not occurrences) whose identical
    scan Spark reuses via ReusedExchange; marginal joins are token-keyed
    shuffles (vocabulary grows with the corpus — never broadcast); the
    pair total is a 1-row broadcast; top-k is TakeOrderedAndProject.
    Output: ``w1, w2, n_pair, pmi, rank``.
    """
    # NO spread(), by interleaved A/B (round 13): the pair emission is
    # cheap enough per doc that the round-robin shuffle never pays for
    # itself here (wash across 3 trials; the explode's groupBy shuffle
    # already spreads the counting).
    staged = df.select(_tokens(F.col(text)).alias("__t"))
    n = F.size("__t")
    pair_struct = "array<struct<w1:string,w2:string>>"
    pairs_arr = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                # tokens at positions i+1 .. i+window follow position i
                # (slice is 1-based); one element_at per emitted struct
                lambda i: F.transform(
                    F.slice(F.col("__t"), i + F.lit(1), F.lit(window)),
                    lambda t2: F.struct(
                        F.element_at(F.col("__t"), i).alias("w1"), t2.alias("w2")
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast(pair_struct))
    pairs = staged.select(F.explode(pairs_arr).alias("__p")).select("__p.w1", "__p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    left = pc.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("c_left"))
    right = pc.groupBy("w2").agg(F.sum("n_pair").cast("long").alias("c_right"))
    total = F.broadcast(pc.agg(F.sum("n_pair").cast("long").alias("__T")))
    ratio = (F.col("n_pair").cast("double") * F.col("__T").cast("double")) / (
        F.col("c_left").cast("double") * F.col("c_right").cast("double")
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        pc.filter(F.col("n_pair") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(total)
        .select("w1", "w2", "n_pair", F.round(F.log(ratio), 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def cooc_pmi_topk_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 5,
    k: int = 200,
) -> str:
    norm = NORM_SQL.format(c=text)
    per_d = ", ".join(
        f"list_transform(range(1, greatest(len(t) - {d}, 0) + 1), "
        f"i -> struct_pack(w1 := t[i], w2 := t[i + {d}]))"
        for d in range(1, window + 1)
    )
    return f"""
WITH toks AS (SELECT str_split({norm}, ' ') AS t FROM {table}),
pairs AS (
  SELECT unnest(flatten([{per_d}]), recursive := true) FROM toks
),
pc AS (SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY 1, 2),
lefts AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS c_left FROM pc GROUP BY 1),
rights AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS c_right FROM pc GROUP BY 1),
total AS (SELECT CAST(sum(n_pair) AS BIGINT) AS T FROM pc),
scored AS (
  SELECT w1, w2, n_pair,
         round(ln((CAST(n_pair AS DOUBLE) * CAST(T AS DOUBLE))
                  / (CAST(c_left AS DOUBLE) * CAST(c_right AS DOUBLE))), 6) AS pmi
  FROM pc JOIN lefts USING (w1) JOIN rights USING (w2) CROSS JOIN total
  WHERE n_pair >= {min_count}
)
SELECT w1, w2, n_pair, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank
FROM scored
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {k}
"""


def curation_report(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    **thresholds,
) -> DataFrame:
    """Per-source curation outcome: docs kept/rejected by reason — the
    audit table a pipeline publishes after a filtering pass.  Output:
    ``source, reject_reason (NULL = kept), n_docs``."""
    qf = quality_filter(df, text=text, id_col=id_col, **thresholds)
    return (
        df.select(F.col(id_col), F.col(group_col))
        .join(qf.select(F.col(id_col), "reject_reason"), id_col)
        .groupBy(group_col, "reject_reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def curation_report_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    **thresholds,
) -> str:
    qf = quality_filter_sql(table, text=text, id_col=id_col, **thresholds)
    return f"""
WITH qf AS ({qf})
SELECT t.{group_col}, qf.reject_reason, count(*) AS n_docs
FROM {table} t JOIN qf ON t.{id_col} = qf.{id_col}
GROUP BY 1, 2
"""


def lm_bigram_score(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Statistical-LM quality score (the CCNet-style curation signal):
    per-document mean token-bigram log-probability under an add-k model
    trained on ``model_df`` (default: the corpus itself — self-scoring).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1,*) + k*V)``; score = weighted
    mean of ``ln P`` over the doc's bigrams.  Low scores = improbable
    token sequences (gibberish, boilerplate soup) — the filter threshold
    a curation pass sets from the score distribution.  Output:
    ``doc_id, n_bigrams, lm_score`` (NULL score for docs with < 2
    tokens, which still appear with ``n_bigrams = 0``).

    Cross-engine determinism: each bigram's log-prob is rounded to 9
    decimals and quantized to DECIMAL(18,6) BEFORE the per-doc sum, so
    the accumulation is exact and order-insensitive (a raw double sum
    would be shuffle-order-dependent); the final mean divides doubles
    with identical operand order in the SQL twin.

    Scale: doc-side bigrams reduce to (doc, bigram) counts before any
    join; the model join is keyed on (w1,w2) — vocabulary-sized, a
    shuffle join, never a broadcast; left-context totals re-aggregate
    the model table (never raw tokens); V is a 1-row broadcast.
    """
    sm = float(smoothing)
    staged = df.select(F.col(id_col).alias("id"), _tokens(F.col(text)).alias("__t"))
    n = F.size(F.col("__t"))
    pairs = (
        staged.select(
            "id",
            F.slice("__t", F.lit(1), F.greatest(F.lit(0), n - 1)).alias("__l"),
            F.slice("__t", F.lit(2), F.greatest(F.lit(0), n - 1)).alias("__r"),
        )
        .select("id", F.explode(F.arrays_zip("__l", "__r")).alias("__p"))
        .select("id", F.col("__p.__l").alias("w1"), F.col("__p.__r").alias("w2"))
    )
    db = pairs.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("c_d"))
    src = model_df if model_df is not None else df
    if model_df is not None:
        mstaged = src.select(_tokens(F.col(text)).alias("__t"))
        mn = F.size(F.col("__t"))
        mpairs = (
            mstaged.select(
                F.slice("__t", F.lit(1), F.greatest(F.lit(0), mn - 1)).alias("__l"),
                F.slice("__t", F.lit(2), F.greatest(F.lit(0), mn - 1)).alias("__r"),
            )
            .select(F.explode(F.arrays_zip("__l", "__r")).alias("__p"))
            .select(F.col("__p.__l").alias("w1"), F.col("__p.__r").alias("w2"))
        )
        bg = mpairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    else:
        bg = db.groupBy("w1", "w2").agg(F.sum("c_d").cast("long").alias("c_bg"))
    lefts = bg.groupBy("w1").agg(F.sum("c_bg").cast("long").alias("c_left"))
    voc = F.broadcast(
        src.select(F.explode(_tokens(F.col(text))).alias("__tok"))
        .agg(F.countDistinct("__tok").alias("v"))
    )
    # ln is NOT correctly-rounded IEEE (glibc vs Java differ by 1 ulp on
    # some args; sqrt IS exact, ln/exp/pow are not).  Quantizing at 1e-6
    # instead of 1e-9 cuts the boundary-flip probability (ulp/grid per
    # distinct bigram) by 1000x — observed live at sf0.1 with a 1e-9 grid.
    lp = F.round(
        F.log((F.col("c_bg") + F.lit(sm)) / (F.col("c_left") + F.lit(sm) * F.col("v"))), 6
    ).cast("decimal(18,6)")
    scored = (
        db.join(bg, ["w1", "w2"], "left")
        .join(lefts, "w1", "left")
        .crossJoin(voc)
        .select(
            "id",
            "c_d",
            (
                F.col("c_d").cast("decimal(19,0)")
                * F.when(
                    lp.isNotNull(), lp
                ).otherwise(
                    # unseen bigram/context under an external model
                    F.round(
                        F.log(
                            F.lit(sm)
                            / (F.coalesce(F.col("c_left"), F.lit(0)) + F.lit(sm) * F.col("v"))
                        ),
                        6,
                    ).cast("decimal(18,6)")
                )
            ).alias("__wlp"),
        )
    )
    agg = scored.groupBy("id").agg(
        F.sum("c_d").cast("long").alias("n_bigrams"),
        F.sum("__wlp").alias("__swlp"),
    )
    allk = df.select(F.col(id_col).alias("id")).distinct()
    out = allk.join(agg, "id", "left")
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    mean = F.col("__swlp").cast("string").cast("double") / nb.cast("double")
    return out.select(
        F.col("id").alias(id_col),
        nb.alias("n_bigrams"),
        F.when(nb > 0, F.round(mean, 9)).alias("lm_score"),
    )


def lm_bigram_score_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> str:
    """Self-scoring oracle twin (external-model seam is Spark-only)."""
    norm = NORM_SQL.format(c=text)
    sm = float(smoothing)
    return f"""
WITH staged AS (
  SELECT {id_col} AS id, str_split({norm}, ' ') AS __t FROM {table}
),
pairs AS (
  SELECT id, __t[i] AS w1, __t[i + 1] AS w2
  FROM (SELECT id, __t, unnest(range(1, len(__t))) AS i FROM staged)
),
db AS (SELECT id, w1, w2, count(*) AS c_d FROM pairs GROUP BY ALL),
bg AS (SELECT w1, w2, CAST(sum(c_d) AS BIGINT) AS c_bg FROM db GROUP BY 1, 2),
lefts AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_left FROM bg GROUP BY 1),
voc AS (
  SELECT count(DISTINCT __tok) AS v
  FROM (SELECT unnest(str_split({norm}, ' ')) AS __tok FROM {table})
),
scored AS (
  SELECT id, c_d,
         CAST(c_d AS DECIMAL(19,0))
         * CAST(round(ln((c_bg + {sm}) / (c_left + {sm} * v)), 6) AS DECIMAL(18,6)) AS wlp
  FROM db JOIN bg USING (w1, w2) JOIN lefts USING (w1) CROSS JOIN voc
),
agg AS (
  SELECT id, CAST(sum(c_d) AS BIGINT) AS n_bigrams, sum(wlp) AS swlp
  FROM scored GROUP BY 1
)
SELECT a.id AS {id_col},
       coalesce(n_bigrams, 0) AS n_bigrams,
       CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN round(CAST(CAST(swlp AS VARCHAR) AS DOUBLE)
                 / CAST(coalesce(n_bigrams, 0) AS DOUBLE), 9)
       END AS lm_score
FROM (SELECT DISTINCT {id_col} AS id FROM {table}) a LEFT JOIN agg USING (id)
"""


def token_budget_sample(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget_tokens: int = 1000,
    budgets: dict[str, int] | None = None,
    salt: str = "budget-v1",
) -> DataFrame:
    """Mixture sampling by TOKEN budget, not doc rate: per source, keep
    docs in deterministic salted-hash order until the cumulative token
    count exceeds the source's budget — "give me 10B tokens of source A"
    is the unit mixing recipes are actually written in
    (:func:`mixture_sample` keeps a doc RATE; this keeps a token mass).

    ``budgets`` overrides ``budget_tokens`` per source.  Output:
    ``doc_id, source, n_tokens, cum_tokens, keep`` (greedy prefix; the
    doc that would cross the budget is dropped, like every fixed-budget
    packer here).

    Scale: one per-source sort (the cumulative window); state is
    O(docs-per-source) per task.  A mega-source can reuse
    epoch_shuffle's hash-range bucket decomposition (order-preserving
    buckets + offset broadcast) — same trade as the dense rank there.
    """
    from .hashing import md5_int

    staged = df.select(
        F.col(id_col),
        F.col(group_col).alias("source"),
        F.size(_tokens(F.col(text))).alias("n_tokens"),
        md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))).alias("__h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w).cast("long")
    if budgets:
        budget = F.lit(None).cast("long")
        expr = None
        for src, b in sorted(budgets.items()):
            cond = F.col("source") == src
            expr = F.when(cond, F.lit(int(b))) if expr is None else expr.when(cond, F.lit(int(b)))
        budget = expr.otherwise(F.lit(int(budget_tokens)))
    else:
        budget = F.lit(int(budget_tokens))
    return staged.select(
        F.col(id_col),
        "source",
        "n_tokens",
        cum.alias("cum_tokens"),
        (cum <= budget).alias("keep"),
    )


def token_budget_sample_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    budget_tokens: int = 1000,
    budgets: dict[str, int] | None = None,
    salt: str = "budget-v1",
) -> str:
    from .hashing import md5_int_sql

    norm = NORM_SQL.format(c=text)
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    if budgets:
        cases = " ".join(
            f"WHEN source = '{s}' THEN {int(b)}" for s, b in sorted(budgets.items())
        )
        budget = f"CASE {cases} ELSE {int(budget_tokens)} END"
    else:
        budget = str(int(budget_tokens))
    return f"""
WITH staged AS (
  SELECT {id_col}, {group_col} AS source,
         len(str_split({norm}, ' ')) AS n_tokens,
         {h} AS __h
  FROM {table}
),
c AS (
  SELECT {id_col}, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY __h ASC, {id_col} ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM staged
)
SELECT {id_col}, source, n_tokens, cum_tokens,
       cum_tokens <= {budget} AS keep
FROM c
"""


def curation_decisions(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    max_dup_ratio: float = 0.2,
    lm_threshold: float = -6.0,
    require_lang: str = "en",
    **thresholds,
) -> DataFrame:
    """The master curation table: every per-doc signal joined into one
    auditable keep/drop decision — rule-based quality gates, the Gopher
    repetition signal, the bigram-LM score, and the language gate, with
    a FIXED precedence so the named reason is deterministic.

    ``lm_threshold`` is an absolute constant, not a data-derived
    quantile — pick it from ``value_quantiles`` over ``lm_score`` and
    pass it in (a cutoff interpolated inside the query would make the
    keep/drop frontier 1-ulp fragile across engines AND cost an extra
    full pass).  Output: ``doc_id, source, dup_ratio, lm_score,
    lang_guess, reject_reason (NULL = kept), keep``.

    Scale: four signal branches over the same scan, joined on doc_id —
    every branch is map-side except lm_score's vocabulary joins; the
    doc_id joins co-partition under AQE.  Docs with NULL lm_score
    (< 2 tokens) are judged by the other gates only.
    """
    qf = quality_filter(df, text=text, id_col=id_col, **thresholds).select(
        F.col(id_col), F.col("reject_reason").alias("__q")
    )
    rep = repetition_stats(df, text=text, id_col=id_col).select(
        F.col(id_col), "dup_ratio"
    )
    lm = lm_bigram_score(df, text=text, id_col=id_col).select(
        F.col(id_col), "lm_score"
    )
    lg = lang_id(df, text=text, id_col=id_col).select(F.col(id_col), "lang_guess")
    j = (
        df.select(F.col(id_col), F.col(group_col).alias("source"))
        .join(qf, id_col)
        .join(rep, id_col)
        .join(lm, id_col)
        .join(lg, id_col)
    )
    reason = (
        F.when(F.col("__q").isNotNull(), F.col("__q"))
        .when(F.col("dup_ratio") > F.lit(float(max_dup_ratio)), F.lit("repetitive"))
        .when(F.col("lm_score") < F.lit(float(lm_threshold)), F.lit("low_lm_score"))
        .when(F.col("lang_guess") != F.lit(require_lang), F.lit("wrong_lang"))
    )
    return j.select(
        F.col(id_col),
        "source",
        "dup_ratio",
        "lm_score",
        "lang_guess",
        reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


def curation_decisions_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    max_dup_ratio: float = 0.2,
    lm_threshold: float = -6.0,
    require_lang: str = "en",
    **thresholds,
) -> str:
    qf = quality_filter_sql(table, text=text, id_col=id_col, **thresholds)
    rep = repetition_stats_sql(table, text=text, id_col=id_col)
    lm = lm_bigram_score_sql(table, text=text, id_col=id_col)
    lg = lang_id_sql(table, text=text, id_col=id_col)
    reason = f"""CASE
      WHEN qf.reject_reason IS NOT NULL THEN qf.reject_reason
      WHEN rep.dup_ratio > {float(max_dup_ratio)} THEN 'repetitive'
      WHEN lm.lm_score < {float(lm_threshold)} THEN 'low_lm_score'
      WHEN lg.lang_guess != '{require_lang}' THEN 'wrong_lang'
    END"""
    return f"""
WITH qf AS ({qf}),
rep AS ({rep}),
lm AS ({lm}),
lg AS ({lg})
SELECT t.{id_col}, t.{group_col} AS source,
       rep.dup_ratio, lm.lm_score, lg.lang_guess,
       {reason} AS reject_reason,
       ({reason}) IS NULL AS keep
FROM {table} t
JOIN qf USING ({id_col})
JOIN rep USING ({id_col})
JOIN lm USING ({id_col})
JOIN lg USING ({id_col})
"""


def distinctive_terms(
    df: DataFrame,
    *,
    text: str = "text",
    group_col: str = "source",
    k: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Terms over-represented in each source vs the whole corpus:
    add-k-smoothed log-lift ``ln(P(term|source)) - ln(P(term|corpus))``,
    top-k per source — the "what makes this source different" audit a
    mixing/curation pass reads before setting sampling rates.

    Output: ``source, token, n_in_source, n_corpus, score, rank``
    (score rounded to 6 decimals BEFORE ranking so the rank order is
    deterministic across engines — 6, not 9: ln is not correctly-rounded
    cross-libm, see lm_bigram_score; ties broken by token asc).

    Scale: one (source, token) shuffle with map-side partial counts;
    per-source and per-token totals re-aggregate those pairs (never the
    raw tokens); corpus totals are a 1-row broadcast.  The token-keyed
    totals join is shuffle-on-token (vocabulary-sized — NOT broadcast:
    at corpus scale the vocabulary is large); the per-source top-k
    window holds O(vocab-per-source) per task.
    """
    sm = float(smoothing)
    ex = df.select(
        F.col(group_col).alias("source"), F.explode(_tokens(F.col(text))).alias("token")
    )
    st = ex.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("tot_s"))
    t_tot = st.groupBy("token").agg(F.sum("c_st").cast("long").alias("c_t"))
    corpus = F.broadcast(
        t_tot.agg(F.sum("c_t").cast("long").alias("tot"), F.count(F.lit(1)).alias("v"))
    )
    scored = (
        st.join(s_tot, "source")
        .join(t_tot, "token")
        .crossJoin(corpus)
        .select(
            "source",
            "token",
            F.col("c_st").alias("n_in_source"),
            F.col("c_t").alias("n_corpus"),
            # 6-decimal grid: ln is not correctly-rounded cross-libm (see
            # lm_bigram_score); coarser grid -> negligible flip probability
            F.round(
                F.log((F.col("c_st") + F.lit(sm)) / (F.col("tot_s") + F.lit(sm) * F.col("v")))
                - F.log((F.col("c_t") + F.lit(sm)) / (F.col("tot") + F.lit(sm) * F.col("v"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("token").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def distinctive_terms_sql(
    table: str,
    *,
    text: str = "text",
    group_col: str = "source",
    k: int = 10,
    smoothing: float = 0.5,
) -> str:
    norm = NORM_SQL.format(c=text)
    sm = float(smoothing)
    return f"""
WITH ex AS (
  SELECT {group_col} AS source, unnest(str_split({norm}, ' ')) AS token FROM {table}
),
st AS (SELECT source, token, count(*) AS c_st FROM ex GROUP BY ALL),
s_tot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS tot_s FROM st GROUP BY 1),
t_tot AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
corpus AS (SELECT CAST(sum(c_t) AS BIGINT) AS tot, count(*) AS v FROM t_tot),
scored AS (
  SELECT source, token, c_st AS n_in_source, c_t AS n_corpus,
         round(ln((c_st + {sm}) / (tot_s + {sm} * v))
               - ln((c_t + {sm}) / (tot + {sm} * v)), 6) AS score
  FROM st JOIN s_tot USING (source) JOIN t_tot USING (token) CROSS JOIN corpus
)
SELECT source, token, n_in_source, n_corpus, score,
       CAST(row_number() OVER (PARTITION BY source
            ORDER BY score DESC, token ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def dsir_weights(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    **quality_thresholds,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every
    document by how much its hashed-n-gram distribution looks like a
    TARGET distribution vs the raw corpus.

    Features are unigrams + bigrams of the normalized text hashed into
    ``n_buckets`` buckets (the md5 28-bit hash shared with the oracle);
    bucket log-ratios ``ln p_target - ln p_raw`` come from
    add-``smoothing`` bag-of-words estimates; a document's weight is the
    sum of its occurrences' log-ratios.  The target here is the
    :func:`quality_filter` keep set — DSIR then UP-weights docs that
    n-gram-resemble the clean subset, the composition the paper runs
    (target = formal text, raw = web crawl).  Downstream: resample by
    ``exp(weight)`` or take top-weight — both trivial over this output.

    Output: ``doc_id, n_grams, dsir_weight``.

    Determinism: each bucket log-ratio is rounded to 6 (ln is not
    correctly-rounded cross-libm, see lm_bigram_score) and cast
    DECIMAL(18,6); per-doc sums accumulate exactly in decimal, so both
    engines produce the identical double.

    Scale: the bucket-count tables are <= ``n_buckets`` rows (broadcast
    by construction — that is WHY DSIR hashes its n-grams); the doc side
    is the gram explosion into a (doc, bucket) aggregate, from which
    the raw/target counts and both corpus totals all derive — the
    totals are sums over the <= n_buckets-row count tables, never a
    corpus rescan (this restructure measured 3.5x on the sf0.01 gate:
    10.9 s -> 3.1 s).  No vocabulary-sized shuffle ever forms.
    """
    sm = float(smoothing)
    from ..catalog import spread

    # one-core guard (guide §2.5) for the bigram transform + md5 explode
    df = spread(df)
    toks = _tokens(F.col(text))
    t1 = F.slice(toks, 1, F.size(toks) - 1)
    t2 = F.slice(toks, 2, F.size(toks) - 1)
    grams_expr = F.concat(toks, F.zip_with(t1, t2, lambda a, b: F.concat(a, F.lit(" "), b)))
    # stage the gram array before exploding (the shingle-Generate lesson,
    # dedup.py:38 — inlining the subtree re-tokenizes per element)
    bg = (
        df.select(F.col(id_col), grams_expr.alias("__g"))
        .select(F.col(id_col), F.explode("__g").alias("gram"))
        .select(
            F.col(id_col),
            F.pmod(md5_int(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
        )
    )
    keep = quality_filter(df, text=text, id_col=id_col, **quality_thresholds).filter(
        F.col("keep")
    ).select(id_col)
    # ONE gram explosion: every other table derives from the (doc,
    # bucket) aggregate — its shuffle is identical across the three uses
    # so ReuseExchange shares it, and the corpus totals come from the
    # <= n_buckets-row count tables, not corpus rescans
    from .. import lineage

    # docb is consumed THREE ways (raw, tgt, the final weight join) and
    # the consumers key differently, so ReuseExchange cannot share the
    # explode stage (the before plan re-ran it: 14 parquet scans).
    # Materialize once — O(docs x <= n_buckets) rows.
    docb = lineage.cut(
        bg.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n_occ"))
    )
    raw = docb.groupBy("bucket").agg(F.sum("n_occ").cast("long").alias("c_r"))
    tgt = (
        docb.join(keep, id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("n_occ").cast("long").alias("c_t"))
    )
    raw_tot = F.broadcast(raw.agg(F.sum("c_r").cast("long").alias("tot_r")))
    tgt_tot = F.broadcast(
        tgt.agg(F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("tot_t"))
    )
    lam_b = sm * n_buckets
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(raw_tot)
        .crossJoin(tgt_tot)
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(sm)) / (F.col("tot_t") + F.lit(lam_b)))
                - F.log((F.col("c_r") + F.lit(sm)) / (F.col("tot_r") + F.lit(lam_b))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    return (
        docb.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_grams"),
            F.sum(F.col("n_occ") * F.col("lr")).cast("string").cast("double").alias("dsir_weight"),
        )
    )


def dsir_weights_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    **quality_thresholds,
) -> str:
    norm = NORM_SQL.format(c=text)
    sm = float(smoothing)
    lam_b = sm * n_buckets
    bucket = md5_int_sql("gram")
    return f"""
WITH q AS ({quality_filter_sql(table, text=text, id_col=id_col, **quality_thresholds)}),
toks AS (SELECT {id_col}, str_split({norm}, ' ') AS t FROM {table}),
grams AS (
  SELECT {id_col}, g.gram
  FROM toks, unnest(list_concat(t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))) AS g(gram)
),
bg AS (SELECT {id_col}, ({bucket}) % {n_buckets} AS bucket FROM grams),
docb AS (SELECT {id_col}, bucket, count(*) AS n_occ FROM bg GROUP BY 1, 2),
raw AS (SELECT bucket, CAST(sum(n_occ) AS BIGINT) AS c_r FROM docb GROUP BY 1),
tgt AS (
  SELECT bucket, CAST(sum(n_occ) AS BIGINT) AS c_t
  FROM docb SEMI JOIN (SELECT {id_col} FROM q WHERE q.keep) USING ({id_col})
  GROUP BY 1
),
raw_tot AS (SELECT CAST(coalesce(sum(c_r), 0) AS BIGINT) AS tot_r FROM raw),
tgt_tot AS (SELECT CAST(coalesce(sum(c_t), 0) AS BIGINT) AS tot_t FROM tgt),
lr AS (
  SELECT r.bucket,
         CAST(round(ln((COALESCE(t.c_t, 0) + {sm}) / (tt.tot_t + {lam_b}))
                    - ln((r.c_r + {sm}) / (rt.tot_r + {lam_b})), 6) AS DECIMAL(18,6)) AS lr
  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN raw_tot rt CROSS JOIN tgt_tot tt
)
SELECT d.{id_col},
       CAST(sum(d.n_occ) AS BIGINT) AS n_grams,
       CAST(CAST(sum(d.n_occ * l.lr) AS VARCHAR) AS DOUBLE) AS dsir_weight
FROM docb d JOIN lr l USING (bucket)
GROUP BY d.{id_col}
"""


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the exponential-race form): each row draws a
    deterministic uniform ``u`` from its salted id hash and races with
    key ``-ln(u) / w``; the ``k`` smallest keys win, which selects rows
    with probability proportional to ``w`` — the one-pass, shuffle-light
    primitive behind importance RESAMPLING (pair with
    :func:`dsir_weights` via ``w = exp(dsir_weight)``, the paper's own
    sampling step) and quality-weighted mixing.

    Unlike ``rand()``-based sampling the draw is content-derived (md5 of
    ``salt:id``), so the sample is reproducible across runs, engines and
    partitionings — the same determinism contract as
    :func:`hash_sample`.  Keys are rounded to 9 (ln is not
    correctly-rounded cross-libm) with an id tiebreak.

    Output: the winning rows (all input columns) plus ``sel_key``,
    ordered by the race.  Scale: one map-side key computation + one
    TakeOrderedAndProject — no window, no global sort.
    """
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    u = (h + F.lit(0.5)) / F.lit(float(1 << (4 * HEX_DIGITS)))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sel_key", key)
        .orderBy("sel_key", id_col)
        .limit(k)
    )


def dsir_resample_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    salt: str = "wsample",
    **dsir_kwargs,
) -> str:
    """Oracle twin of the dsir_weights -> weighted_sample composition
    (w = exp(dsir_weight); identical hash-uniform, ln/exp expression
    shape, 9-rounding and (key, id) ordering)."""
    dw = dsir_weights_sql(table, text=text, id_col=id_col, **dsir_kwargs).strip()
    h = md5_int_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    denom = float(1 << (4 * HEX_DIGITS))
    return f"""
WITH dw AS ({dw}),
keyed AS (
  SELECT {id_col}, n_grams, dsir_weight,
         round(-ln(({h} + 0.5) / {denom!r}) / exp(dsir_weight), 9) AS sel_key
  FROM dw WHERE exp(dsir_weight) > 0
)
SELECT {id_col}, n_grams, dsir_weight, sel_key
FROM keyed ORDER BY sel_key, {id_col} LIMIT {k}
"""


def ccnet_buckets(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    smoothing: float = 0.5,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): within each
    group, rank documents by LM score (higher = more natural text) and
    cut the ranking into terciles — 'head' trains, 'tail' is usually
    dropped, 'middle' is the dial.  Deterministic: ties (and NULL-score
    docs, which sink to the tail) break on doc id, and the tercile
    boundaries are integer arithmetic (rank*3 vs n), so the oracle
    hash-matches with no float thresholds.

    Output: ``doc_id, <group_col>, lm_score, bucket``.

    Scale: the LM score is :func:`lm_bigram_score` (gram-keyed);
    ranking is one window per group — each group's rows in one task,
    the same per-source cardinality any per-group quantile needs (for
    degenerate single-source corpora, split the window key the way
    balanced_sample's skew_safe path does).
    """
    from pyspark.sql import Window

    scored = lm_bigram_score(df, text=text, id_col=id_col, smoothing=smoothing)
    base = df.select(F.col(id_col), F.col(group_col)).join(scored, id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("lm_score").desc_nulls_last(), F.col(id_col).asc()
    )
    counts = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    ranked = base.withColumn("__rn", F.row_number().over(w)).join(counts, group_col)
    bucket = (
        F.when(F.col("__rn") * 3 <= F.col("__n"), F.lit("head"))
        .when(F.col("__rn") * 3 <= 2 * F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(id_col, group_col, "lm_score", bucket.alias("bucket"))


def ccnet_buckets_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    smoothing: float = 0.5,
) -> str:
    lm = lm_bigram_score_sql(table, text=text, id_col=id_col, smoothing=smoothing)
    return f"""
WITH scored AS ({lm}),
base AS (
  SELECT t.{id_col}, t.{group_col}, s.lm_score
  FROM {table} t JOIN scored s USING ({id_col})
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY lm_score DESC NULLS LAST, {id_col} ASC) AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS n
  FROM base
)
SELECT {id_col}, {group_col}, lm_score,
       CASE WHEN rn * 3 <= n THEN 'head'
            WHEN rn * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


def lm_kneser_ney_score(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram score — the smoothing family KenLM
    (and therefore CCNet's reference pipeline) actually uses, next to
    the simpler add-k model of :func:`lm_bigram_score`:

        P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1,.)
                   + (D * N1+(w1,.) / c(w1,.)) * (N1+(.,w2) / N1+(.,.))

    — absolute discounting plus a CONTINUATION-count backoff ("how many
    contexts does w2 follow", not "how often does w2 occur"), the fix
    for the add-k model's overscoring of frequent-but-context-bound
    tokens.  Self-scoring (model = the corpus itself, like the
    registry's lm_score); every scored bigram is therefore in the
    model, so P > 0 with no unseen-mass special case.

    Output: ``doc_id, n_bigrams, kn_score`` (NULL for docs with < 2
    tokens).  Determinism discipline, one notch COARSER than
    :func:`lm_bigram_score`: the KN probability is bit-identical across
    engines (integer counts through identical double ops), but ln is
    not correctly-rounded cross-libm and a live 1-ulp flip at a 1e-6
    rounding boundary was observed at sf0.01 — so per-bigram ln rounds
    at 1e-5 into DECIMAL(18,5) before the exact-decimal weighted sum,
    and the mean reports at 6 decimals (residual flip probability
    ~1e-7 per run vs ~1e-4 at the finer grids).  Scale: all model
    tables are gram-keyed aggregates of the corpus; totals is one row.
    """
    from pyspark.sql import Window  # noqa: F401  (parallel with lm_bigram_score)

    from ..catalog import spread
    from ..lineage import cut

    D = float(discount)
    staged = spread(df).select(F.col(id_col).alias("id"), _tokens(F.col(text)).alias("__t"))
    n = F.size(F.col("__t"))
    pairs = (
        staged.select(
            "id",
            F.slice("__t", F.lit(1), F.greatest(F.lit(0), n - 1)).alias("__l"),
            F.slice("__t", F.lit(2), F.greatest(F.lit(0), n - 1)).alias("__r"),
        )
        .select("id", F.explode(F.arrays_zip("__l", "__r")).alias("__p"))
        .select("id", F.col("__p.__l").alias("w1"), F.col("__p.__r").alias("w2"))
    )
    # db is NOT cut (its (id, w1, w2) rows are nearly the exploded pairs
    # themselves — materialization costs more than the parallel re-derive);
    # bg IS cut: it feeds FOUR consumers (ctx, cont, total, scored join),
    # each of which would re-run explode + two gram-keyed aggregations,
    # and its distinct-bigram rows are far fewer than the pair stream.
    db = pairs.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("c_d"))
    bg = cut(db.groupBy("w1", "w2").agg(F.sum("c_d").cast("long").alias("c_bg")))
    ctx = bg.groupBy("w1").agg(
        F.sum("c_bg").cast("long").alias("c_left"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n_cont"))
    total = F.broadcast(bg.agg(F.count(F.lit(1)).cast("long").alias("t_cont")))
    p = (
        F.greatest(F.col("c_bg") - F.lit(D), F.lit(0.0)) / F.col("c_left")
    ) + (
        (F.lit(D) * F.col("n1p") / F.col("c_left"))
        * (F.col("n_cont") / F.col("t_cont"))
    )
    lp = F.round(F.log(p), 5).cast("decimal(18,5)")
    scored = (
        db.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(total)
        .select("id", "c_d", (F.col("c_d").cast("decimal(19,0)") * lp).alias("__wlp"))
    )
    agg = scored.groupBy("id").agg(
        F.sum("c_d").cast("long").alias("n_bigrams"),
        F.sum("__wlp").alias("__swlp"),
    )
    allk = df.select(F.col(id_col).alias("id")).distinct()
    out = allk.join(agg, "id", "left")
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    mean = F.col("__swlp").cast("string").cast("double") / nb.cast("double")
    # shared away-from-zero floor quantization, NOT round(): Spark's
    # round goes through exact BigDecimal while DuckDB multiplies in
    # doubles — on a mean like -3.40112049999... the two legitimately
    # disagree (observed live at sf0.1).  floor(|x|*1e6 + 0.5) written
    # textually in both engines takes the identical float path.
    q6 = (
        F.when(mean >= 0, F.floor(mean * F.lit(1e6) + F.lit(0.5)))
        .otherwise(-F.floor(-mean * F.lit(1e6) + F.lit(0.5)))
        / F.lit(1e6)
    )
    return out.select(
        F.col("id").alias(id_col),
        nb.alias("n_bigrams"),
        F.when(nb > 0, q6).alias("kn_score"),
    )


def lm_kneser_ney_score_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> str:
    norm = NORM_SQL.format(c=text)
    # CAST the discount to DOUBLE explicitly: a bare 0.75 literal is
    # DECIMAL in DuckDB, which routes c_bg - 0.75 through decimal
    # arithmetic instead of the double path Spark takes (observed as a
    # 1e-9 mean flip at sf0.01).
    D = f"CAST({repr(float(discount))} AS DOUBLE)"
    p = (
        f"(greatest(c_bg - {D}, 0.0) / c_left)"
        f" + (({D} * n1p / c_left) * (n_cont / t_cont))"
    )
    return f"""
WITH staged AS (
  SELECT {id_col} AS id, str_split({norm}, ' ') AS __t FROM {table}
),
pairs AS (
  SELECT id, __t[i] AS w1, __t[i + 1] AS w2
  FROM (SELECT id, __t, unnest(range(1, len(__t))) AS i FROM staged)
),
db AS (SELECT id, w1, w2, count(*) AS c_d FROM pairs GROUP BY ALL),
bg AS (SELECT w1, w2, CAST(sum(c_d) AS BIGINT) AS c_bg FROM db GROUP BY 1, 2),
ctx AS (
  SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_left,
         CAST(count(*) AS BIGINT) AS n1p
  FROM bg GROUP BY 1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_cont FROM bg GROUP BY 1),
total AS (SELECT CAST(count(*) AS BIGINT) AS t_cont FROM bg),
scored AS (
  SELECT id, c_d,
         CAST(c_d AS DECIMAL(19,0))
         * CAST(round(ln({p}), 5) AS DECIMAL(18,5)) AS wlp
  FROM db JOIN bg USING (w1, w2) JOIN ctx USING (w1) JOIN cont USING (w2)
       CROSS JOIN total
),
agg AS (
  SELECT id, CAST(sum(c_d) AS BIGINT) AS n_bigrams, sum(wlp) AS swlp
  FROM scored GROUP BY 1
)
SELECT a.id AS {id_col},
       coalesce(n_bigrams, 0) AS n_bigrams,
       CASE WHEN coalesce(n_bigrams, 0) > 0 THEN
            (CASE WHEN (CAST(CAST(swlp AS VARCHAR) AS DOUBLE)
                        / CAST(coalesce(n_bigrams, 0) AS DOUBLE)) >= 0
                  THEN floor((CAST(CAST(swlp AS VARCHAR) AS DOUBLE)
                        / CAST(coalesce(n_bigrams, 0) AS DOUBLE)) * 1000000.0 + 0.5)
                  ELSE -floor(-(CAST(CAST(swlp AS VARCHAR) AS DOUBLE)
                        / CAST(coalesce(n_bigrams, 0) AS DOUBLE)) * 1000000.0 + 0.5)
             END) / 1000000.0
       END AS kn_score
FROM (SELECT DISTINCT {id_col} AS id FROM {table}) a LEFT JOIN agg USING (id)
"""


def temperature_mixture(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    alpha: float = 0.5,
    budget_docs: int = 1000,
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the T5/PaLM recipe): source
    i's share of the budget is ``n_i^alpha / sum_j n_j^alpha`` — alpha=1
    reproduces natural proportions, alpha=0 uniform across sources,
    alpha~0.5 the standard upsampling of small/quality sources.

    Deterministic admission, never ``rand()``: doc d of source i is kept
    iff ``md5(salt:id) % 2^28 < floor(t_i * 2^28)`` where
    ``t_i = min(1, budget * share_i / n_i)`` — the float threshold is
    pushed through ONE shared floor quantization so both engines gate on
    the same integer.  Output: ``<group_col>, n_total, n_target,
    n_sampled`` per source (n_target = the integer gate ceiling, so the
    mixture weights themselves are value-checked, not just the draw).

    Cross-engine exactness: alpha defaults to 0.5 because ``sqrt`` IS
    correctly-rounded IEEE (ln/exp/pow are not) — other alphas work in
    Spark but the oracle pins 0.5.  Scale: one count per source
    (KB-sized), one broadcast join back, one map-side gate.
    """
    from .hashing import HEX_DIGITS, md5_int

    if abs(float(alpha) - 0.5) > 1e-12:
        import warnings

        warnings.warn(
            "temperature_mixture: alpha != 0.5 routes through pow(), which "
            "is not correctly-rounded cross-libm — oracle parity is only "
            "guaranteed at the sqrt-backed default",
            UserWarning,
            stacklevel=2,
        )
    M = 1 << (4 * HEX_DIGITS)  # md5_int range: 2^28
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_total"))
    share_num = (
        F.sqrt(F.col("n_total").cast("double"))
        if abs(float(alpha) - 0.5) <= 1e-12
        else F.pow(F.col("n_total").cast("double"), F.lit(float(alpha)))
    )
    tot = counts.agg(F.sum(share_num).alias("__z"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_total",
        F.least(
            F.lit(float(budget_docs)) * (share_num / F.col("__z")) / F.col("n_total"),
            F.lit(1.0),
        ).alias("__t"),
    )
    gates = rates.select(
        group_col,
        "n_total",
        F.floor(F.col("__t") * F.lit(float(M)) + F.lit(0.5)).cast("long").alias("n_gate"),
    )
    h = md5_int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    tagged = df.select(F.col(group_col), h.alias("__h")).join(
        F.broadcast(gates), group_col
    )
    return (
        tagged.groupBy(group_col, "n_total", "n_gate")
        .agg(F.sum(F.when(F.col("__h") < F.col("n_gate"), 1).otherwise(0)).alias("n_sampled"))
        .select(
            group_col,
            "n_total",
            F.col("n_gate").alias("n_target"),
            F.col("n_sampled").cast("long").alias("n_sampled"),
        )
    )


def temperature_mixture_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    budget_docs: int = 1000,
    salt: str = "temp-v1",
) -> str:
    """Oracle twin at the sqrt-backed alpha = 0.5."""
    from .hashing import HEX_DIGITS, md5_int_sql

    M = float(1 << (4 * HEX_DIGITS))
    h = md5_int_sql(f"'{salt}:' || CAST(t.{id_col} AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_total FROM {table} GROUP BY 1
),
tot AS (SELECT sum(sqrt(CAST(n_total AS DOUBLE))) AS z FROM counts),
gates AS (
  SELECT {group_col}, n_total,
         CAST(floor(least(
           CAST({float(budget_docs)} AS DOUBLE)
             * (sqrt(CAST(n_total AS DOUBLE)) / z) / n_total,
           1.0) * CAST({M} AS DOUBLE) + 0.5) AS BIGINT) AS n_gate
  FROM counts, tot
)
SELECT g.{group_col}, g.n_total, g.n_gate AS n_target,
       CAST(sum(CASE WHEN {h} < g.n_gate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM {table} t JOIN gates g USING ({group_col})
GROUP BY 1, 2, 3
"""


# -- Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) ----------
#
# The widely-reproduced document-level heuristics.  Every rule is an
# INTEGER comparison (cross-multiplied ratios), so keep/drop decisions
# are bit-identical across engines — no float thresholds anywhere.

GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3,   # chars, inclusive
    max_mean_word_len=10,  # chars, inclusive
    min_alpha_word_pct=80,     # % words containing >=1 alphabetic char
    max_symbol_word_pct=10,    # % symbols (#, ellipsis) per word
    min_required_stopwords=2,  # distinct hits in GOPHER_REQUIRED_STOPWORDS
)


def gopher_rules(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", **thresholds
) -> DataFrame:
    """Gopher document-quality rules as per-rule boolean flags + ``keep``.

    Output: ``doc_id, n_tokens, word_count_ok, mean_word_len_ok,
    alpha_word_ok, symbol_ratio_ok, stopword_ok, keep`` — one flag per
    published rule so curation decisions are auditable per-rule (the
    shape FineWeb/Dolma ship as "quality signals").

    Exactness: mean word length in [3, 10] is ``3*n_tokens <= tok_chars
    AND tok_chars <= 10*n_tokens``; the 80%/10% ratios cross-multiply the
    same way — pure integer arithmetic in both engines.  Scale: one
    map-side pass over ``text``, no shuffle, no UDF.
    """
    p = {**GOPHER_DEFAULTS, **thresholds}
    toks = _tokens(F.col(text))
    n = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    # symbols that survive into word-soup text: '#' plus ASCII '...' and
    # Unicode ellipsis, counted as whole occurrences
    sym = (
        (F.length(F.col(text)) - F.length(F.regexp_replace(F.col(text), "#", "")))
        + (F.length(F.col(text)) - F.length(F.regexp_replace(F.col(text), "\\.\\.\\.", ""))) / 3
        + (F.length(F.col(text)) - F.length(F.regexp_replace(F.col(text), "…", "")))
    ).cast("long")
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ((n >= p["min_words"]) & (n <= p["max_words"])).alias("word_count_ok"),
        (
            (tok_chars >= F.lit(p["min_mean_word_len"]) * n)
            & (tok_chars <= F.lit(p["max_mean_word_len"]) * n)
        ).alias("mean_word_len_ok"),
        (F.lit(100) * alpha_words >= F.lit(p["min_alpha_word_pct"]) * n).alias("alpha_word_ok"),
        (F.lit(100) * sym <= F.lit(p["max_symbol_word_pct"]) * n).alias("symbol_ratio_ok"),
        (stop_hits >= p["min_required_stopwords"]).alias("stopword_ok"),
    ).withColumn(
        "keep",
        F.col("word_count_ok")
        & F.col("mean_word_len_ok")
        & F.col("alpha_word_ok")
        & F.col("symbol_ratio_ok")
        & F.col("stopword_ok"),
    )


def gopher_rules_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id", **thresholds
) -> str:
    p = {**GOPHER_DEFAULTS, **thresholds}
    norm = NORM_SQL.format(c=text)
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_REQUIRED_STOPWORDS)
    return f"""
WITH feats AS (
  SELECT {id_col},
    len(str_split({norm}, ' ')) AS n,
    list_sum(list_transform(str_split({norm}, ' '), x -> length(x))) AS tok_chars,
    len(list_filter(str_split({norm}, ' '), x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
    CAST((length({text}) - length(replace({text}, '#', '')))
      + (length({text}) - length(replace({text}, '...', ''))) / 3
      + (length({text}) - length(replace({text}, chr(8230), ''))) AS BIGINT) AS sym,
    len(list_filter([{stop_list}], s -> list_contains(str_split({norm}, ' '), s))) AS stop_hits
  FROM {table}
)
SELECT {id_col}, n AS n_tokens,
  (n >= {p["min_words"]} AND n <= {p["max_words"]}) AS word_count_ok,
  (tok_chars >= {p["min_mean_word_len"]} * n AND tok_chars <= {p["max_mean_word_len"]} * n)
    AS mean_word_len_ok,
  (100 * alpha_words >= {p["min_alpha_word_pct"]} * n) AS alpha_word_ok,
  (100 * sym <= {p["max_symbol_word_pct"]} * n) AS symbol_ratio_ok,
  (stop_hits >= {p["min_required_stopwords"]}) AS stopword_ok,
  ((n >= {p["min_words"]} AND n <= {p["max_words"]})
   AND (tok_chars >= {p["min_mean_word_len"]} * n AND tok_chars <= {p["max_mean_word_len"]} * n)
   AND (100 * alpha_words >= {p["min_alpha_word_pct"]} * n)
   AND (100 * sym <= {p["max_symbol_word_pct"]} * n)
   AND (stop_hits >= {p["min_required_stopwords"]})) AS keep
FROM feats
"""


# -- winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
# Local Algorithms for Document Fingerprinting" — the MOSS algorithm) ----


def winnowing_fingerprints(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection: from the k-gram hash sequence,
    every window of ``w`` consecutive hashes contributes its minimum
    (ties: rightmost occurrence — "robust winnowing", §2.3 of the paper),
    deduplicated per position.

    Guarantees (the paper's): any duplicated token run of length
    >= k + w - 1 shares at least one selected fingerprint between the two
    documents, and the expected density is 2/(w+1) — the standard
    plagiarism/near-dup index with tunable density, complementary to
    MinHash (which has no positional guarantee).

    Output: ``doc_id, pos, fp`` — ``pos`` is the 0-based k-gram index of
    each selected fingerprint (docs shorter than k+w-1 tokens emit
    nothing, as in the paper).  Scale: pure per-row array expressions —
    gram hashing, window minima, and position-dedup all happen map-side
    inside one projection; NO shuffle, NO UDF, output is O(n/w) rows per
    doc.  Hash is the cross-engine md5 (llm/hashing.py).
    """
    from ..catalog import spread

    # one-core guard (guide §2.5 input skew): every stage here is an
    # interpreted per-row HOF over the raw scan — a single-split parquet
    # file would run the whole O(n*w) hash/min walk on ONE task.  spread
    # is a no-op whenever the scan already has >= core-count splits.
    df = spread(df)
    toks = _tokens(F.col(text))
    n_grams = F.size(toks) - F.lit(k - 1)
    empty_h = F.array().cast("array<bigint>")
    # STAGED projections, not one nested expression: higher-order-function
    # lambdas are interpreted (no codegen) and Catalyst does not CSE across
    # lambda bodies, so an inlined `hs` would re-hash every gram
    # O(windows) times per row (measured: 70 s -> ~2 s at sf0.01).
    # CollapseProject keeps multi-referenced non-cheap aliases staged.
    hs = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: md5_int(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    ).otherwise(empty_h)
    staged = df.select(F.col(id_col), hs.alias("__hs"))
    hs_c = F.col("__hs")
    n_win = F.size(hs_c) - F.lit(w - 1)
    mins = F.when(
        n_win >= 1,
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.array_min(F.slice(hs_c, i + 1, w)),
        ),
    ).otherwise(empty_h)
    staged = staged.select(id_col, "__hs", mins.alias("__mins"))
    # rightmost-min: position of the min in the REVERSED window gives the
    # distance from the window's right edge
    sel = F.transform(
        F.sequence(F.lit(1), F.size(F.col("__mins"))),
        lambda j: F.struct(
            (
                j
                + F.lit(w - 1)
                - F.array_position(
                    F.reverse(F.slice(hs_c, j, w)), F.element_at(F.col("__mins"), j)
                )
            )
            .cast("int")
            .alias("pos"),
            F.element_at(F.col("__mins"), j).alias("fp"),
        ),
    )
    sel = F.when(F.size(F.col("__mins")) >= 1, sel).otherwise(
        F.array().cast("array<struct<pos:int,fp:bigint>>")
    )
    return (
        staged.select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


def winnowing_fingerprints_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> str:
    norm = NORM_SQL.format(c=text)
    h = md5_int_sql("array_to_string(list_slice(toks, i + 1, i + {k}), ' ')".format(k=k))
    return f"""
WITH t AS (SELECT {id_col}, str_split({norm}, ' ') AS toks FROM {table}),
g AS (
  SELECT {id_col},
         list_transform(range(len(toks) - {k - 1}), i -> {h}) AS hs
  FROM t
),
s AS (
  SELECT {id_col},
         list_transform(range(len(hs) - {w - 1}), i -> {{
           'pos': CAST(i + {w} - list_position(
                    list_reverse(list_slice(hs, i + 1, i + {w})),
                    list_min(list_slice(hs, i + 1, i + {w}))) AS INT),
           'fp': list_min(list_slice(hs, i + 1, i + {w}))
         }}) AS sel
  FROM g
)
-- DISTINCT here mirrors Spark's map-side array_distinct (DuckDB's
-- list_distinct lacks struct support); (pos -> fp) is functional, so
-- row-level and in-array dedup agree
SELECT DISTINCT {id_col}, r.pos AS pos, r.fp AS fp
FROM (SELECT {id_col}, unnest(sel) AS r FROM s)
"""


# -- positional phrase search ---------------------------------------------


def phrase_search(
    df: DataFrame,
    phrase: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    top: int = 20,
) -> DataFrame:
    """Exact phrase search: docs containing the tokenized ``phrase`` as a
    CONSECUTIVE token run, ranked by occurrence count (the positional
    complement of :func:`bm25_search`'s bag-of-words ranking).

    Output: ``doc_id, n_matches`` — top ``top`` by (count desc, doc_id
    asc), a deterministic total order.  Scale: the match count is one
    map-side array scan per doc (no posting-list join, no shuffle); the
    ranking compiles to TakeOrderedAndProject.  Matching uses L shifted
    ``F.slice`` columns ``arrays_zip``-ed together (each slice evaluates
    the token array once per ROW — see the inline comment), counted by
    an ``F.aggregate`` when-counter.
    """
    words = phrase.strip().lower().split()
    if not words:
        raise ValueError("phrase_search: empty phrase")
    L = len(words)
    # Shifted-slice arrays_zip matcher, NOT per-index F.get in a HOF
    # lambda: CollapseProject treats split() as cheap and inlines the
    # token array into the lambda, where interpreted evaluation re-runs
    # the regexp+split on EVERY element access (measured 3.8 s); each
    # slice here evaluates its child once per ROW (0.8 s at sf0.1).
    toks = _tokens(F.col(text))
    n_start = F.size(toks) - F.lit(L - 1)
    shifted = [
        F.slice(toks, j + 1, F.greatest(n_start, F.lit(0))).alias(f"w{j}")
        for j in range(L)
    ]
    zipped = F.arrays_zip(*shifted)

    def is_match(x: Column) -> Column:
        cond = x["w0"] == words[0]
        for j, wd in enumerate(words[1:], start=1):
            cond = cond & (x[f"w{j}"] == wd)
        return cond

    n_matches = F.when(
        n_start >= 1,
        F.aggregate(zipped, F.lit(0), lambda a, x: a + F.when(is_match(x), 1).otherwise(0)),
    ).otherwise(F.lit(0))
    return (
        df.select(F.col(id_col), n_matches.alias("n_matches"))
        .where(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), F.col(id_col).asc())
        .limit(top)
    )


def phrase_search_sql(
    table: str,
    phrase: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    top: int = 20,
) -> str:
    words = phrase.strip().lower().split()
    L = len(words)
    norm = NORM_SQL.format(c=text)
    cond = " AND ".join(
        f"toks[i + {j + 1}] = '{wd}'" for j, wd in enumerate(words)
    )
    return f"""
WITH t AS (SELECT {id_col}, str_split({norm}, ' ') AS toks FROM {table}),
m AS (
  SELECT {id_col},
         len(list_filter(range(len(toks) - {L - 1}), i -> {cond})) AS n_matches
  FROM t
)
SELECT {id_col}, n_matches FROM m WHERE n_matches > 0
ORDER BY n_matches DESC, {id_col} ASC
LIMIT {top}
"""


def winnow_near_dup_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs from shared winnowing fingerprints —
    the MOSS overlap detector (Schleimer 2003 §4) next to the MinHash
    and SimHash families: two docs pair when they share >= ``min_shared``
    selected fingerprint VALUES, which (by the winnowing guarantee)
    catches any shared token run of length >= k + w - 1 per shared
    fingerprint, with positional evidence MinHash can't give.

    Output: ``id_a, id_b, n_shared`` (id_a < id_b).

    Scale: the join is KEYED on the fingerprint value — never all-pairs.
    ``max_df`` mirrors minhash-LSH's ``max_bucket``: a fingerprint
    appearing in more than ``max_df`` docs is boilerplate (the paper's
    own suggestion) and is dropped from candidate generation, bounding
    per-key fan-out at O(max_df^2) instead of O(df^2).  Default None
    keeps exact output for the oracle; production sets it.
    """
    fps = winnowing_fingerprints(df, text=text, id_col=id_col, k=k, w=w).select(
        F.col(id_col).alias("id"), "fp"
    ).distinct()
    if max_df is not None:
        admitted = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fp")
        )
        fps = fps.join(admitted, "fp")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_near_dup_pairs_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> str:
    fps = winnowing_fingerprints_sql(table, text=text, id_col=id_col, k=k, w=w)
    df_filter = (
        f"WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df})"
        if max_df is not None
        else ""
    )
    return f"""
WITH raw AS ({fps}),
fps AS (SELECT DISTINCT {id_col} AS id, fp FROM raw),
adm AS (SELECT id, fp FROM fps {df_filter})
SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
FROM adm a JOIN adm b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def label_balance(
    df: DataFrame, *, label: str = "lang", min_share_alert: float = 0.01
) -> DataFrame:
    """Class-balance report over a label column — the pre-training mix
    QA (a silently collapsing language/domain mix starves every
    minority capability before any eval notices): per class its count
    and share, plus the distribution's Shannon entropy (nats),
    normalized entropy (vs uniform over the observed classes), and
    Gini impurity — repeated per row for gate-ability, with a
    ``below_min_share`` flag per class.

    Exactness: shares are long/long divisions; each ``-p*ln(p)`` term
    passes the shared 1e-6 floor quantization into a BIGINT (absorbing
    cross-libm ``ln`` ulp) and the entropy is their EXACT integer sum;
    ``p^2`` terms quantize at 1e-9 likewise for Gini; normalized
    entropy divides the quantized entropy by ``ln(n_classes)`` and
    re-quantizes at 1e-6 (identical op order in the twin).  NULL labels
    count as a class only if present as empty string upstream — NULL
    rows are excluded (documented).

    Output: ``label, n, share, below_min_share, entropy, norm_entropy,
    gini``.  Scale: one label-keyed count shuffle (map-side
    combinable) to O(classes) rows; two 1-row broadcasts.
    """
    counts = (
        df.filter(F.col(label).isNotNull())
        .groupBy(F.col(label).alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return label_balance_from_counts(counts, min_share_alert=min_share_alert)


def label_balance_from_counts(
    counts: DataFrame, *, min_share_alert: float = 0.01
) -> DataFrame:
    """The report tail of :func:`label_balance`, taking the per-class
    counts table ``label, n`` directly — shared with the streaming twin
    (``streaming.pipeline.stream_label_balance``), whose additive count
    partials reproduce identical counts, so stream == batch
    bit-for-bit."""
    tot = counts.agg(
        F.sum("n").cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    p = F.col("n").cast("double") / F.col("__N").cast("double")
    ent_term = -(p * F.log(p))
    tq6 = (
        F.when(ent_term >= 0, F.floor(ent_term * F.lit(1e6) + F.lit(0.5)))
        .otherwise(-F.floor(-ent_term * F.lit(1e6) + F.lit(0.5)))
        .cast("long")
    )
    p2q9 = F.floor(p * p * F.lit(1e9) + F.lit(0.5)).cast("long")
    staged = counts.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        p.alias("share"),
        (p < F.lit(float(min_share_alert))).alias("below_min_share"),
        "__N",
        "__k",
        tq6.alias("__tq"),
        p2q9.alias("__p2"),
    )
    sums = staged.agg(
        F.sum("__tq").cast("long").alias("__e"),
        F.sum("__p2").cast("long").alias("__s2"),
    )
    ent = F.col("__e").cast("double") / F.lit(1e6)
    nent = ent / F.log(F.col("__k").cast("double"))
    nent_q = (
        F.when(F.col("__k") > 1, F.floor(nent * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    )
    return staged.crossJoin(F.broadcast(sums)).select(
        "label",
        "n",
        "share",
        "below_min_share",
        ent.alias("entropy"),
        nent_q.alias("norm_entropy"),
        (F.lit(1.0) - F.col("__s2").cast("double") / F.lit(1e9)).alias("gini"),
    )


def label_balance_sql(
    table: str, *, label: str = "lang", min_share_alert: float = 0.01
) -> str:
    p = "CAST(n AS DOUBLE) / CAST(__N AS DOUBLE)"
    ent_term = f"-(({p}) * ln({p}))"
    tq6 = (
        f"CASE WHEN ({ent_term}) >= 0 THEN CAST(floor(({ent_term}) * 1e6 + 0.5) AS BIGINT) "
        f"ELSE -CAST(floor(-({ent_term}) * 1e6 + 0.5) AS BIGINT) END"
    )
    p2q9 = f"CAST(floor(({p}) * ({p}) * 1e9 + 0.5) AS BIGINT)"
    ms = f"CAST({float(min_share_alert)!r} AS DOUBLE)"
    return f"""
WITH counts AS (
  SELECT {label} AS label, CAST(count(*) AS BIGINT) AS n
  FROM {table} WHERE {label} IS NOT NULL GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS __N, CAST(count(*) AS BIGINT) AS __k FROM counts),
staged AS (
  SELECT label, n, {p} AS share, ({p}) < {ms} AS below_min_share,
         __N, __k, {tq6} AS __tq, {p2q9} AS __p2
  FROM counts CROSS JOIN tot
),
sums AS (SELECT CAST(sum(__tq) AS BIGINT) AS __e, CAST(sum(__p2) AS BIGINT) AS __s2 FROM staged)
SELECT label, n, share, below_min_share,
       CAST(__e AS DOUBLE) / 1e6 AS entropy,
       CASE WHEN __k > 1 THEN
         floor((CAST(__e AS DOUBLE) / 1e6) / ln(CAST(__k AS DOUBLE)) * 1e6 + 0.5) / 1e6
       END AS norm_entropy,
       1.0 - CAST(__s2 AS DOUBLE) / 1e9 AS gini
FROM staged CROSS JOIN sums
"""


def typo_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    min_len: int = 4,
    max_len: int = 20,
    min_count: int = 1,
) -> DataFrame:
    """Vocabulary typo/variant pairs within edit distance 1, found by
    the FastSS deletion-neighborhood join (Bocek et al. 2007, "Fast
    Similarity Search in Large Dictionaries") — the vocab-hygiene QA
    that surfaces OCR damage and tokenizer-splitting typos ("recieve"
    next to "receive") which exact dedup can never see.

    Blocking: each vocabulary word emits its deletion-1 neighborhood
    (itself + every single-character deletion, ``len+1`` variants);
    two words within edit distance 1 ALWAYS share a variant, so the
    variant-keyed equi-join generates every true pair plus a few
    near-miss candidates (e.g. transpositions share variants at
    distance 2) which the exact ``levenshtein(w1, w2) <= 1`` check —
    built-in and integer-identical in both engines — then cuts.  The
    join replaces the O(V^2) all-pairs edit-distance scan with
    O(V * len) variant rows; a variant shared by many words (short
    high-frequency stems) is bounded by ``min_len`` (words shorter
    than 4 chars are mostly real distinct words, not typos).

    Output: ``w1, w2, n1, n2`` with ``w1 < w2`` — the count asymmetry
    is the merge signal (the rare spelling is the typo).  Scale: one
    vocab count shuffle, one variant explode (x len), one variant-keyed
    join; counts broadcast back.
    """
    vocab = (
        df.filter(F.col(text).isNotNull())
        .select(F.explode(_tokens(F.col(text))).alias("w"))
        .filter((F.length("w") >= min_len) & (F.length("w") <= max_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= int(min_count))
    )
    variants = vocab.select(
        "w",
        F.explode(
            F.array_union(
                F.array(F.col("w")),
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.concat(
                        F.substring(F.col("w"), F.lit(1), i - 1),
                        F.substr(F.col("w"), i + 1),
                    ),
                ),
            )
        ).alias("v"),
    )
    l = variants.select(F.col("w").alias("w1"), "v")
    r = variants.select(F.col("w").alias("w2"), "v")
    pairs = (
        l.join(r, "v")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
        .distinct()
        .filter(F.levenshtein(F.col("w1"), F.col("w2")) <= 1)
    )
    c1 = vocab.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    c2 = vocab.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    return pairs.join(c1, "w1").join(c2, "w2").select("w1", "w2", "n1", "n2")


def typo_pairs_sql(
    table: str,
    *,
    text: str = "text",
    min_len: int = 4,
    max_len: int = 20,
    min_count: int = 1,
) -> str:
    norm = NORM_SQL.format(c=text)
    return f"""
WITH vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(str_split({norm}, ' ')) AS w
    FROM {table} WHERE {text} IS NOT NULL
  )
  WHERE len(w) BETWEEN {int(min_len)} AND {int(max_len)}
  GROUP BY 1
  HAVING count(*) >= {int(min_count)}
),
variants AS (
  SELECT w, unnest(list_distinct(list_append(
           [substr(w, 1, i - 1) || substr(w, i + 1) FOR i IN range(1, len(w) + 1)],
           w))) AS v
  FROM vocab
),
pairs AS (
  SELECT DISTINCT l.w AS w1, r.w AS w2
  FROM variants l JOIN variants r ON l.v = r.v AND l.w < r.w
)
SELECT p.w1, p.w2, a.n AS n1, b.n AS n2
FROM pairs p
JOIN vocab a ON a.w = p.w1
JOIN vocab b ON b.w = p.w2
WHERE levenshtein(p.w1, p.w2) <= 1
"""
