"""Unigram-LM (SentencePiece-style) tokenizer training — the BPE
family's sibling (Kudo 2018, "Subword Regularization"; the default
trainer behind SentencePiece/T5/Llama vocabularies).

Same 100 TB shape as ``bpe.bpe_train``: ONE Spark job builds the
word-frequency table (state O(distinct words), optionally capped to the
``top_words`` most frequent — the standard web-corpus practice), then
the EM loop runs driver-side over that bounded table.  The loop is
inherently global-sequential (each round's segmentations depend on the
whole vocabulary), and the word-frequency table is the in-memory
representation every production trainer operates on.

Determinism discipline — what makes the verdict row oracle-checkable
and the pytest pin exact:

* **Viterbi-EM, not soft EM**: the E-step assigns each word its single
  best segmentation, so expected counts are exact integers (word freq
  per piece occurrence) — no float accumulation anywhere.
* **Exact big-int segmentation scores**: a segmentation's likelihood is
  ``prod(count[p]) / total^k``; two candidates compare as
  ``num_a * total^k_b  vs  num_b * total^k_a`` in exact Python ints —
  no log-float ties.  Remaining ties break to (fewer pieces, then
  lexicographically smaller piece tuple).
* **Structure of the final E-step**: prune happens BEFORE a final
  count pass, so every reported count comes from segmentations over the
  final vocabulary — which is what makes mass conservation (below) an
  exact theorem rather than an approximation.

Oracle (the bpe_merges / sketch_rollup recipe — exact columns DuckDB
recomputes independently + invariant booleans asserted TRUE):

* ``n_char_pieces`` — single-char pieces are kept unconditionally, so
  this must equal the corpus' distinct-character count, which DuckDB
  computes closed-form.  Checks seeding AND coverage at once.
* ``piece_char_mass`` — ``sum(count * len(piece))`` over the final
  vocabulary.  Each word is partitioned exactly by its Viterbi
  segmentation, so this must equal ``sum(freq * len(word))`` — which
  DuckDB computes closed-form from the parquet.  A real bug detector:
  any backtrack off-by-one, dropped word, or pruned-but-used piece
  breaks the equality.
* ``multi_within_cap`` / ``counts_positive`` — postconditions (multi
  pieces capped at ``keep_multi``; every multi piece in the final
  vocab was actually used at least once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .bpe import _word_freqs
from .dedup import NORM_SQL


def _seed_vocab(
    word_freqs: list[tuple[str, int]], *, max_piece_len: int, seed_multi: int
) -> dict[str, int]:
    """Seed counts: every substring of every word up to ``max_piece_len``
    chars, weighted by word freq; all single chars kept, multi-char
    candidates capped to the ``seed_multi`` most frequent
    (count desc, piece asc — deterministic)."""
    from collections import Counter

    cnt: Counter = Counter()
    for w, f in word_freqs:
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                cnt[w[i : i + ln]] += f
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        (p for p in cnt if len(p) > 1), key=lambda p: (-cnt[p], p)
    )[: int(seed_multi)]
    out = dict(chars)
    for p in multi:
        out[p] = cnt[p]
    return out


def _viterbi(word: str, counts: dict[str, int], total: int, max_piece_len: int):
    """Best segmentation of ``word`` under the unigram LM, exact big-int
    comparison (see module docstring).  Returns the piece tuple.
    Single chars are always in ``counts`` (coverage invariant), so every
    word is segmentable; a zero-count char still segments via the
    fewer-pieces/lexicographic tie rules (its numerator term is 0, tied
    with any other zero-scoring split)."""
    n = len(word)
    # best[j] = (num, k, pieces) for word[:j]; scores num / total^k
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (1, 0, ())
    for j in range(1, n + 1):
        cand_best = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i] is None:
                continue
            p = word[i:j]
            c = counts.get(p)
            if c is None:
                continue
            num_i, k_i, pieces_i = best[i]
            cand = (num_i * c, k_i + 1, pieces_i + (p,))
            if cand_best is None:
                cand_best = cand
            else:
                # cand > cand_best iff num_c * total^k_b > num_b * total^k_c
                lhs = cand[0] * total ** cand_best[1]
                rhs = cand_best[0] * total ** cand[1]
                if lhs > rhs or (
                    lhs == rhs
                    and (cand[1], cand[2]) < (cand_best[1], cand_best[2])
                ):
                    cand_best = cand
        best[j] = cand_best
    assert best[n] is not None, f"unsegmentable word {word!r}"
    return best[n][2]


def _train_unigram(
    word_freqs: list[tuple[str, int]],
    *,
    num_iters: int,
    max_piece_len: int,
    seed_multi: int,
    keep_multi: int,
) -> list[tuple[str, int]]:
    """Viterbi-EM: seed -> (count, prune) x num_iters -> final count
    pass over the pruned vocabulary.  Returns ``(piece, count)`` for the
    FINAL vocabulary with final-pass counts (all chars + surviving
    multis), so ``sum(count * len(piece)) == sum(freq * len(word))``
    exactly."""
    from collections import Counter

    counts = _seed_vocab(
        word_freqs, max_piece_len=max_piece_len, seed_multi=seed_multi
    )
    chars = sorted(p for p in counts if len(p) == 1)

    def e_step(vocab_counts: dict[str, int]) -> Counter:
        total = sum(vocab_counts.values())
        out: Counter = Counter()
        for w, f in word_freqs:
            for p in _viterbi(w, vocab_counts, total, max_piece_len):
                out[p] += f
        return out

    for _ in range(int(num_iters)):
        used = e_step(counts)
        multis = sorted(
            (p for p in used if len(p) > 1 and used[p] > 0),
            key=lambda p: (-used[p], p),
        )[: int(keep_multi)]
        counts = {c: used.get(c, 0) for c in chars}
        counts.update({p: used[p] for p in multis})
        # chars may carry count 0 into the next round's scores (kept for
        # coverage); a zero total cannot happen on a non-empty corpus
    final = e_step(counts)
    # multis that survived the prune but went unused in the final pass
    # are dead vocabulary — drop them (keeps counts_positive structural);
    # chars stay unconditionally, count 0 allowed (coverage invariant)
    return [(c, int(final.get(c, 0))) for c in chars] + [
        (p, int(final[p]))
        for p in sorted(
            (p for p in counts if len(p) > 1 and final.get(p, 0) > 0),
            key=lambda p: (-final[p], p),
        )
    ]


def unigram_train(
    df: DataFrame,
    *,
    text: str = "text",
    num_iters: int = 2,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    keep_multi: int = 60,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Learn a unigram-LM vocabulary from the corpus.

    Output: ``piece, count, rank`` — the vocabulary artifact (rank by
    count desc, piece asc).  ONE Spark job regardless of iterations
    (the word-frequency aggregation); the EM loop runs driver-side over
    the capped table — see the module docstring for why that is the
    honest scale shape, not a compromise."""
    from pyspark.sql import functions as F

    wf = _word_freqs(df, text=text)
    if top_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(int(top_words))
    word_freqs = [(r["word"], r["freq"]) for r in wf.collect()]
    pieces = _train_unigram(
        word_freqs, num_iters=num_iters, max_piece_len=max_piece_len,
        seed_multi=seed_multi, keep_multi=keep_multi,
    )
    ranked = sorted(pieces, key=lambda pc: (-pc[1], pc[0]))
    rank = {p: i for i, (p, _) in enumerate(ranked)}
    rows = [(p, c, rank[p]) for p, c in pieces]
    return df.sparkSession.createDataFrame(rows, "piece string, count long, rank int")


def unigram_vocab_check(
    df: DataFrame,
    *,
    text: str = "text",
    num_iters: int = 2,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    keep_multi: int = 60,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Oracle-checkable verdict row for the unigram trainer (module
    docstring): ``n_char_pieces`` and ``piece_char_mass`` are exact
    columns DuckDB recomputes closed-form; the booleans are trainer
    postconditions the oracle asserts TRUE."""
    from pyspark.sql import functions as F

    wf = _word_freqs(df, text=text)
    if top_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(int(top_words))
    word_freqs = [(r["word"], r["freq"]) for r in wf.collect()]
    pieces = _train_unigram(
        word_freqs, num_iters=num_iters, max_piece_len=max_piece_len,
        seed_multi=seed_multi, keep_multi=keep_multi,
    )
    n_chars = sum(1 for p, _ in pieces if len(p) == 1)
    mass = sum(c * len(p) for p, c in pieces)
    n_multi = sum(1 for p, _ in pieces if len(p) > 1)
    positive = all(c >= 1 for p, c in pieces if len(p) > 1)
    row = (n_chars, int(mass), n_multi <= int(keep_multi), positive)
    return df.sparkSession.createDataFrame(
        [row],
        "n_char_pieces long, piece_char_mass long, "
        "multi_within_cap boolean, counts_positive boolean",
    )


def unigram_vocab_check_sql(
    table: str, *, text: str = "text", top_words: int | None = 1_000_000
) -> str:
    """DuckDB oracle for :func:`unigram_vocab_check`: distinct corpus
    characters and total word-character mass, closed-form from the same
    word-frequency table the trainer collects — INCLUDING the same
    ``top_words`` admission cap (without it the mass/coverage exacts
    would diverge past 1M distinct words)."""
    norm = NORM_SQL.format(c=text)
    cap = "" if top_words is None else f"\n  ORDER BY freq DESC, word ASC LIMIT {int(top_words)}"
    return f"""
WITH wf AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split({norm}, ' ')) AS word FROM {table})
  WHERE word <> ''
  GROUP BY word{cap}
),
chars AS (
  SELECT DISTINCT substr(word, i, 1) AS c
  FROM wf, UNNEST(generate_series(1, length(word))) AS u(i)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM chars) AS n_char_pieces,
       (SELECT CAST(sum(freq * length(word)) AS BIGINT) FROM wf) AS piece_char_mass,
       TRUE AS multi_within_cap,
       TRUE AS counts_positive
"""
