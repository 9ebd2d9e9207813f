"""Sequence packing — the pretraining batcher's placement map.

Every LLM pretraining pipeline concatenates its tokenized documents in a
fixed order and cuts the stream into fixed-length training sequences
(GPT-style "packing"; documents cross sequence boundaries, attention
masks handle the seams).  The placement map — for each document, WHERE
it lands in that stream — is a pure prefix-sum over token counts, and
prefix sums are the canonical "looks sequential, isn't" distributed
problem.

Sibling operator: ``text.pack_sequences`` (registered as
``pack_sequences``) shards by language and prefix-sums WITHIN shards —
the shard key is the parallelism unit and global order is never needed.
This module is the single-deterministic-stream variant: one corpus-wide
order, which forces the prefix sum itself to be distributed.

Spark-first shape (the textbook two-level scan, NOT a global window):
a global ``sum() OVER (ORDER BY doc_id)`` would compile to a Window fed
by ``Exchange SinglePartition`` — the whole corpus through one task,
exactly the shape the plan audit red-flags.  Instead:

1. docs bucket by id range (``bucket = doc_id // bucket_width`` — order-
   preserving, map-side);
2. per-bucket token totals: ONE keyed aggregation, O(#buckets) rows;
3. bucket base offsets: a driver-side running sum over the collected
   totals (bounded: #buckets = id_span / bucket_width — size
   ``bucket_width`` so this stays ~1M rows at your corpus; the same
   capped-driver-state discipline as the BPE/unigram trainers), then a
   broadcast join back;
4. intra-bucket offsets: a window PARTITIONED BY bucket (keyed — never
   a single-partition exchange).

``start_tok(doc) = bucket_base + intra_bucket_prefix`` exactly equals
the sequential definition; the DuckDB oracle computes the global-window
form directly, so the hash-exact comparison IS the proof that the
distributed prefix-sum composes correctly.

Token counts are the whitespace tokens of the normalized text with
empties filtered (0 for empty/NULL docs — such docs occupy no stream
positions and get NULL sequence columns rather than a fake slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import NORM_SQL, _norm


def pack_sequences(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    bucket_width: int | None = None,
) -> DataFrame:
    """Placement map for greedy contiguous packing into ``seq_len``-token
    sequences, docs in ``id_col`` order.

    Output per doc: ``doc_id, n_tokens, start_tok`` (0-based global
    token offset), ``seq_first/seq_last`` (first/last sequence index the
    doc touches) and ``tok_offset`` (position inside ``seq_first``) —
    NULL sequence columns for token-free docs.  Rows with a NULL id are
    EXCLUDED (no defined position in id order; Spark and DuckDB would
    even order them differently).

    ``bucket_width=None`` (the default) self-sizes from the id span so
    the driver-side base table stays <= ~1M rows at ANY scale:
    ``max(4096, ceil(span / 1_000_000))``.  A fixed default would
    collect ``span / width`` rows — ~244M at a 10^12 id span — so the
    width must grow with the corpus, and ``start_tok`` is
    width-invariant (the oracle hash can't see the choice), so
    self-sizing is free.  The extra cost is one 1-row min/max agg over
    the id column (a pushed-down parquet scan of one column)."""
    toks = F.filter(F.split(_norm(F.col(text)), " "), lambda x: x != "")
    # NULL text -> 0 tokens via an explicit isNull branch, NOT
    # coalesce(size(...)): size(NULL) is -1 under legacy semantics
    # (ansi.enabled=false) and NULL under ANSI — the branch is correct
    # in both session modes
    n_toks = F.when(F.col(text).isNull(), F.lit(0)).otherwise(F.size(toks))
    # NULL ids have no defined position in id order (and the two engines
    # even sort NULLs differently) — excluded on BOTH sides, documented
    ids = df.filter(F.col(id_col).isNotNull())
    if bucket_width is None:
        # Self-size: one bounded 1-row agg (column-pruned scan), then
        # width = ceil(span / 1M) so #buckets — the driver-state bound —
        # stays <= ~1M rows regardless of corpus id span.
        ext = ids.agg(
            F.min(F.col(id_col).cast("long")).alias("lo"),
            F.max(F.col(id_col).cast("long")).alias("hi"),
        ).first()
        span = (
            int(ext["hi"]) - int(ext["lo"]) + 1
            if ext is not None and ext["lo"] is not None
            else 1
        )
        bucket_width = max(4096, -(-span // 1_000_000))
    base = ids.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / F.lit(int(bucket_width))).alias("__b"),
    )
    sums = base.groupBy("__b").agg(F.sum("n_tokens").alias("__bt"))
    # bounded driver state: one row per id-range bucket (see module doc)
    rows = sorted((r["__b"], r["__bt"]) for r in sums.collect())
    bases = []
    acc = 0
    for b, bt in rows:
        bases.append((int(b), int(acc)))
        acc += int(bt)
    spark = df.sparkSession
    base_df = spark.createDataFrame(bases or [(0, 0)], "__b long, __base long")
    w = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        base.join(F.broadcast(base_df), "__b")
        .withColumn(
            "start_tok",
            (F.col("__base") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))).cast(
                "long"
            ),
        )
    )
    L = F.lit(int(seq_len))
    has = F.col("n_tokens") > 0
    return placed.select(
        F.col(id_col),
        "n_tokens",
        "start_tok",
        F.when(has, F.floor(F.col("start_tok") / L)).cast("long").alias("seq_first"),
        F.when(has, F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / L))
        .cast("long")
        .alias("seq_last"),
        F.when(has, F.col("start_tok") % L).cast("long").alias("tok_offset"),
    )


def pack_sequences_sql(
    table: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
) -> str:
    """Oracle: the sequential definition as ONE global window — equality
    with the Spark output proves the two-level distributed prefix sum.
    All operands are non-negative, so ``//`` and ``%`` agree with the
    floor forms (sign-safety note: offsets/counts can't be negative by
    construction)."""
    norm = NORM_SQL.format(c=text)
    return f"""
WITH t AS (
  SELECT {id_col},
         CAST(coalesce(len(list_filter(string_split({norm}, ' '), x -> x != '')), 0) AS BIGINT) AS n_tokens
  FROM {table}
  WHERE {id_col} IS NOT NULL
),
c AS (
  SELECT {id_col}, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT {id_col}, n_tokens, start_tok,
       CASE WHEN n_tokens > 0 THEN start_tok // {seq_len} END AS seq_first,
       CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // {seq_len} END AS seq_last,
       CASE WHEN n_tokens > 0 THEN start_tok % {seq_len} END AS tok_offset
FROM c
"""
