"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The one tokenizer-side operator a training-data pipeline needs that no
Spark built-in covers: learn byte-pair-encoding merge rules from a
corpus.  The classic trainer is sequential; the distributed formulation
keys everything off the WORD-FREQUENCY table (Sennrich's own trick),
which is also the 100 TB shape:

* pre-tokenize once: ``word -> freq`` (one shuffle over the corpus;
  state from then on is O(distinct words), not O(corpus));
* each merge round: adjacent-symbol pair counts weighted by word freq
  (JVM zip of shifted slices + one keyed agg), argmax pair (count desc,
  pair asc — deterministic ties), then the merge applied to every
  word's symbol array with a left-to-right non-overlapping fold
  (``F.aggregate`` — per-word HOF over the word TABLE, so the
  interpreted cost is vocab-sized, not corpus-sized);
* the learned rule list is the tokenizer artifact.

Each round is one shuffle + a 1-row argmax collect (the merge decision
is inherently global-sequential — same driver-coordination shape as the
k-means / connected-components loops, state O(1) per round).  Lineage
is cut every few rounds (``localCheckpoint``) so the plan stays flat.

No SQL oracle: the loop's data-dependent merge choices aren't
expressible as a fixed query — the registry entry is rows-only and the
trainer is pinned against a pure-Python reference implementation in
``tests/test_llm.py`` (merge-sequence equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm

EOW = "</w>"


def _word_freqs(df: DataFrame, *, text: str) -> DataFrame:
    words = df.select(F.explode(F.split(_norm(F.col(text)), " ")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    # chars + explicit end-of-word marker; split("abc", "") -> [a, b, c]
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    return words.select("word", "freq", syms.alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("syms")
    left = F.slice("syms", 1, n - 1)
    right = F.slice("syms", 2, n - 1)
    pairs = F.arrays_zip(left.alias("l"), right.alias("r"))
    return (
        vocab.filter(n >= 2)
        .select("freq", F.explode(pairs).alias("__p"))
        .groupBy(F.col("__p.l").alias("left"), F.col("__p.r").alias("right"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def _merge_fold(a: str, b: str):
    """The left-to-right non-overlapping merge as an ``F.aggregate``
    fold: replace a trailing ``a`` when ``b`` follows — "aaa" + (a,a)
    -> [aa, a], and a just-produced "ab" never re-merges (it no longer
    equals ``a``).  ONE definition shared by trainer and encoder so the
    two can never drift."""

    def fold(acc, s):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(s)))

    return fold


def _merged_syms(a: str, b: str):
    return F.aggregate(F.col("syms"), F.array().cast("array<string>"), _merge_fold(a, b))


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    return vocab.select("word", "freq", _merged_syms(a, b).alias("syms"))


def bpe_train(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Output: ``rank, left, right, merged, pair_count`` — the ordered rule
    list (the tokenizer artifact).  Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes the corpus).
    """
    vocab = _initial_symbols(_word_freqs(df, text=text)).localCheckpoint(eager=True)
    rules = []
    for rank in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        a, b, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        rules.append((rank, a, b, a + b, c))
        vocab = _apply_merge(vocab, a, b)
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    rules: list[tuple[str, str]],
    *,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned rule list to a corpus: ``doc_id, n_tokens_bpe``
    (the compression measurement — BPE quality is tokens-per-doc).
    Rules apply in rank order, each a corpus-wide map (no shuffle);
    the fold is the SAME ``_merge_fold`` the trainer uses.  Documents
    with no words (empty / whitespace-only / NULL text) are reported
    with ``n_tokens_bpe = 0``, not dropped."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    enc = words.select(F.col(id_col), syms.alias("syms"))
    for a, b in rules:
        enc = enc.select(F.col(id_col), _merged_syms(a, b).alias("syms"))
    counts = enc.groupBy(id_col).agg(
        F.sum(F.size("syms")).cast("long").alias("__n")
    )
    allk = df.select(F.col(id_col)).distinct()
    return allk.join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_tokens_bpe"),
    )
