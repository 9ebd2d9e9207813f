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


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame | list[tuple[str, int]],
    *,
    text: str = "text",
    id_col: str = "doc_id",
    oov_char_count: int = 0,
) -> DataFrame:
    """Apply a trained unigram vocabulary to a corpus — the corpus-sized
    half of the tokenizer story (training is the small half): per doc,
    the Viterbi token count under the LM.  Output: ``doc_id,
    n_tokens_uni`` (0 for empty / whitespace-only / NULL text — such
    docs are reported, not dropped).

    Scale shape mirrors :func:`bpe.bpe_encode_vocab`: word-level
    segmentation is context-free, so each DISTINCT word is segmented
    ONCE by an Arrow-batched ``mapInPandas`` kernel over the word table
    (vocab-sized work, not corpus-sized) and joined back for per-doc
    sums.  The vocabulary — bounded at chars + ``keep_multi`` pieces by
    the trainer — is collected once and shipped in the kernel closure
    (closure serialization is the broadcast for a KB-sized table); the
    corpus is never collected.  Segmentation is the SAME exact big-int
    :func:`_viterbi` the trainer's E-step uses, so encode == train-time
    segmentation by construction.

    ``oov_char_count``: count assigned to single chars absent from the
    vocabulary (they must still be segmentable — the trainer's coverage
    invariant).  0 (default) matches the trainer, where unseen chars
    score as zero-probability pieces resolved by the tie rules; the
    fixed-vocab registry variant passes 1 (see
    :func:`unigram_encode_fixed`)."""
    from pyspark.sql import functions as F

    from .dedup import _norm

    rows = (
        list(vocab)
        if isinstance(vocab, list)
        else [
            (r["piece"], r["count"])
            for r in vocab.select("piece", "count").collect()
        ]
    )
    vocab_counts = {str(p): int(c) for p, c in rows}
    total = sum(vocab_counts.values()) or 1
    max_piece_len = max((len(p) for p in vocab_counts), default=1)

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            ns = []
            for w in pdf["word"]:
                counts = vocab_counts
                missing = {c for c in w if c not in vocab_counts}
                if missing:
                    counts = dict(vocab_counts)
                    counts.update({c: int(oov_char_count) for c in missing})
                ns.append(len(_viterbi(w, counts, total, max_piece_len)))
            yield pd.DataFrame({"word": pdf["word"], "__n": ns})

    words = df.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    encoded = words.select("word").distinct().mapInPandas(
        encode_batches, "word string, __n long"
    )
    counts = (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("long").alias("__total"))
    )
    allk = df.select(F.col(id_col)).distinct()
    return allk.join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__total"), F.lit(0)).cast("long").alias("n_tokens_uni"),
    )


FIXED_UNI_VOCAB: list[tuple[str, int]] = [("th", 1), ("in", 1), ("an", 1)]


def unigram_encode_fixed(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Registry variant: :func:`unigram_encode` under the FIXED unit-count
    vocabulary ``{every char: 1, th: 1, in: 1, an: 1}`` — the
    ``bpe_encode_fixed`` promotion recipe applied to Viterbi
    segmentation.  Closed form (the oracle): ``n_tokens(word) =
    len(word) - occ('th') - occ('in') - occ('an')``.  Proof sketch:

    * with ALL piece counts equal, every segmentation's numerator is a
      product of equal counts, so the big-int comparison reduces to
      ``total^(k_b) vs total^(k_a)`` — Viterbi is exactly
      FEWEST-PIECES (ties by the lexicographic rule, which never
      changes the count);
    * each 2-char piece used saves exactly one piece vs its char split,
      and the only 2-char pieces are th/in/an — so min tokens =
      ``len - (max set of disjoint occurrences)``;
    * occurrences of th/in/an are ALWAYS mutually disjoint: th shares
      no character with in or an (overlap impossible); in/an overlap
      would force one position to be both 'n' and 'i' (or 'n' and 'a');
      self-overlap needs a repeated char ('aa'-style) which none has.
      Hence the max disjoint set is ALL occurrences, and plain
      substring counts (non-self-overlapping, so
      ``(len - len(replace)) / 2`` is exact) close the form.

    The Spark side still runs the REAL distributed Viterbi kernel —
    the oracle equality is the theorem that the kernel, the exact-int
    scoring, and the distinct-word join compose correctly."""
    return unigram_encode(
        df, FIXED_UNI_VOCAB, text=text, id_col=id_col, oov_char_count=1
    )


def unigram_encode_fixed_sql(
    table: str, *, text: str = "text", id_col: str = "doc_id"
) -> str:
    """Closed-form DuckDB oracle for :func:`unigram_encode_fixed` — see
    its docstring for the disjointness/fewest-pieces proof.  Raises on
    any other vocab: the closed form is a theorem about THIS piece set."""
    norm = NORM_SQL.format(c=text)
    occ = "((length(w) - length(replace(w, '{p}', ''))) // 2)"
    return f"""
WITH words AS (
  SELECT {id_col}, unnest(string_split({norm}, ' ')) AS w
  FROM {table}
), toks AS (
  SELECT {id_col},
         SUM(length(w) - {occ.format(p='th')}
                       - {occ.format(p='in')}
                       - {occ.format(p='an')}) AS n
  FROM words WHERE w <> '' GROUP BY {id_col}
)
SELECT d.{id_col}, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens_uni
FROM (SELECT DISTINCT {id_col} FROM {table}) d
LEFT JOIN toks t USING ({id_col})
"""


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
