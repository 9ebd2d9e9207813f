"""BPE tokenizer training (Sennrich et al. 2016) at corpus scale.

The one tokenizer-side operator a training-data pipeline needs that no
Spark built-in covers: learn byte-pair-encoding merge rules from a
corpus.  The 100 TB shape keys everything off the WORD-FREQUENCY table
(Sennrich's own trick, and how the production trainers — Hugging Face
``tokenizers``, SentencePiece, the GPT-2 vocab — all work):

* pre-tokenize once in Spark: ``word -> freq`` (ONE shuffle over the
  corpus; state from then on is O(distinct words), not O(corpus)),
  optionally capped to the ``top_words`` most frequent words — the
  standard practice for web-scale corpora, where the long tail of
  hapax/typo words contributes negligible pair mass but unbounded
  distinct-word state;
* learn the merges driver-side over that table with INCREMENTAL
  pair-count deltas: a ``pair -> words-containing-it`` index means each
  merge touches only the affected words, and the argmax (count desc,
  pair asc — deterministic ties) is a dict scan.  No Spark job per
  rule: a 50k-merge production vocab is still ONE Spark job (the word
  frequencies), where the previous formulation ran ~3 jobs per rule
  (per-round pair recount + argmax collect + vocab rewrite);
* the learned rule list is the tokenizer artifact; ENCODING stays fully
  distributed (``bpe_encode`` below — corpus-sized work never leaves
  Spark).

The driver-side loop is deliberate, not a scale compromise: the merge
decision is inherently global-sequential, and the word-frequency table
is the bounded-state representation every production BPE trainer
operates on in memory.  ``top_words`` (default 1M, matching
production-trainer practice) is the explicit admission cap that keeps
that state bounded regardless of corpus size.

Oracle story (two layers): the full merge SEQUENCE is data-dependent
(each merge conditions on all prior merges), so it is pinned against a
pure-Python full-recount reference implementation in
``tests/test_llm.py`` (merge-sequence equality, which also proves the
delta bookkeeping exact).  The registry entry ``bpe_merges`` is the
hash-exact VERDICT ROW: ``bpe_train_check`` / ``bpe_train_check_sql``
check the closed-form rank-0 merge (argmax over the initial pair-mass
table — SQL-expressible because no prior merge conditions it), the
exact total pair mass, and monotonicity invariants over the trained
merge table, all against DuckDB on the same capped word-frequency
table."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import NORM_SQL, _norm

EOW = "</w>"


def _word_freqs(df: DataFrame, *, text: str) -> DataFrame:
    words = df.select(F.explode(F.split(_norm(F.col(text)), " ")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge on a Python symbol list — the
    driver-side twin of :func:`_merge_fold` ("aaa" + (a,a) -> [aa, a]; a
    just-produced "ab" never re-merges).  Pinned equal to the fold in
    ``tests/test_llm.py`` so trainer and encoder can never drift."""
    ns, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            ns.append(a + b)
            i += 2
        else:
            ns.append(syms[i])
            i += 1
    return ns


def _train_rules(
    word_freqs: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
    decompose=None,
) -> list[tuple[int, str, str, str, int]]:
    """Incremental (delta-based) BPE over a word-frequency table.

    Exactly equivalent to recounting every pair each round: each merge
    visits only the words containing the chosen pair (via the
    ``pair -> words`` index), subtracts their old adjacent-pair
    contributions, rewrites the word, and adds the new ones.

    ``decompose(word) -> list[str]`` picks the initial symbol alphabet:
    default is chars + ``</w>`` (the char-level trainer); the byte-level
    variant passes the GPT-2 byte-to-unicode decomposition (no
    sentinel)."""
    from collections import Counter, defaultdict

    if decompose is None:
        decompose = lambda w: list(w) + [EOW]  # noqa: E731
    vocab: dict[str, list[str]] = {}
    freqs: dict[str, int] = {}
    for w, f in word_freqs:
        vocab[w] = decompose(w)
        freqs[w] = int(f)
    pc: Counter = Counter()
    where: dict[tuple[str, str], set] = defaultdict(set)
    for w, syms in vocab.items():
        f = freqs[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] += f
            where[p].add(w)
    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        rules.append((rank, a, b, a + b, cnt))
        for w in list(where.get((a, b), ())):
            syms, f = vocab[w], freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] -= f
                if pc[p] == 0:
                    del pc[p]
                where[p].discard(w)
            ns = _merge_word(syms, a, b)
            vocab[w] = ns
            for i in range(len(ns) - 1):
                p = (ns[i], ns[i + 1])
                pc[p] += f
                where[p].add(w)
    return rules


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


def bpe_train(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Output: ``rank, left, right, merged, pair_count`` — the ordered rule
    list (the tokenizer artifact).  Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes the corpus).

    ONE Spark job regardless of ``num_merges``: the corpus-sized work is
    the word-frequency aggregation; the merge loop runs driver-side over
    that table with exact incremental deltas (see module docstring).
    ``top_words`` caps the collected table to the most frequent words
    (freq desc, word asc — deterministic) so driver state stays bounded
    on web-scale corpora; the 1M default matches production-trainer
    practice (a web corpus has hundreds of millions of distinct
    "words", almost all noise below the cap).  Pass ``None`` only for
    corpora known to be small."""
    word_freqs, rules = _collect_and_train(
        df, text=text, num_merges=num_merges,
        min_pair_count=min_pair_count, top_words=top_words,
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, pair_count long"
    )


def _collect_and_train(
    df: DataFrame,
    *,
    text: str,
    num_merges: int,
    min_pair_count: int,
    top_words: int | None,
) -> tuple[list[tuple[str, int]], list[tuple[int, str, str, str, int]]]:
    wf = _word_freqs(df, text=text)
    if top_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(int(top_words))
    word_freqs = [(r["word"], r["freq"]) for r in wf.collect()]
    return word_freqs, _train_rules(word_freqs, num_merges, min_pair_count)


def bpe_train_check(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Oracle-checkable verdict row for the BPE trainer (the
    ``approx_sketches`` / ``sketch_rollup`` recipe: exact columns DuckDB
    can recompute independently, plus invariant booleans the oracle
    asserts TRUE — the hash matches iff the trainer really satisfies
    them).  One row:

    * ``rank0_left/right/merged/count`` — the FIRST learned rule.  The
      oracle recomputes it closed-form as the argmax (count desc, pair
      asc) of the initial weighted character-bigram table (chars +
      ``</w>`` sentinel), fully independent of the trainer's code path.
    * ``init_pair_mass`` — total initial adjacent-pair mass
      ``sum(freq * len(word))``; exact cross-engine tokenization check.
    * ``n_rules`` — rule-list arity (== ``num_merges`` on any corpus
      whose pair mass doesn't dry up; the oracle pins the constant).
    * ``counts_monotone`` — pair_count non-increasing in rank.  A real
      theorem for exact BPE (new pairs created by a merge are bounded by
      the chosen pair's count; old pairs only lose mass), so it detects
      delta-bookkeeping corruption in the incremental trainer.
    * ``merged_is_concat`` / ``counts_ge_min`` — postconditions.

    The full rule-list artifact stays available via :func:`bpe_train`
    and remains sequence-pinned against the pure-Python full-recount
    reference in ``tests/test_llm.py``."""
    word_freqs, rules = _collect_and_train(
        df, text=text, num_merges=num_merges,
        min_pair_count=min_pair_count, top_words=top_words,
    )
    mass = sum(f * len(w) for w, f in word_freqs)
    monotone = all(
        rules[i][4] >= rules[i + 1][4] for i in range(len(rules) - 1)
    )
    concat_ok = all(m == a + b for _, a, b, m, _ in rules)
    ge_min = all(c >= min_pair_count for *_r, c in rules)
    r0 = rules[0] if rules else (0, None, None, None, None)
    row = (
        r0[1], r0[2], r0[3],
        int(r0[4]) if rules else None,
        len(rules), int(mass), monotone, concat_ok, ge_min,
    )
    return df.sparkSession.createDataFrame(
        [row],
        "rank0_left string, rank0_right string, rank0_merged string, "
        "rank0_count long, n_rules long, init_pair_mass long, "
        "counts_monotone boolean, merged_is_concat boolean, "
        "counts_ge_min boolean",
    )


def bpe_train_check_sql(
    table: str,
    *,
    text: str = "text",
    num_merges: int = 30,
    top_words: int | None = 1_000_000,
) -> str:
    """DuckDB oracle for :func:`bpe_train_check`: the rank-0 rule and the
    pair mass are recomputed closed-form from the word-frequency table
    (``substr`` explode over char positions; ``</w>`` sentinel on the
    last position; the SAME ``top_words`` admission cap the trainer
    applies — without it the two sides would diverge past 1M distinct
    words); the trainer invariants are asserted TRUE; ``n_rules`` is
    pinned to ``num_merges``.

    Validity domain (bound oracle by design): exact whenever the corpus
    sustains ``num_merges`` merges at ``min_pair_count`` — true at every
    shipped SF and any real text corpus; a starved corpus fails LOUDLY
    (n_rules mismatch), which is the correct behavior for a verdict row.
    """
    norm = NORM_SQL.format(c=text)
    cap = "" if top_words is None else f"\n  ORDER BY freq DESC, word ASC LIMIT {int(top_words)}"
    return f"""
WITH wf AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split({norm}, ' ')) AS word FROM {table})
  WHERE word <> ''
  GROUP BY word{cap}
),
sym AS (
  SELECT substr(word, i, 1) AS a,
         CASE WHEN i = length(word) THEN '{EOW}' ELSE substr(word, i + 1, 1) END AS b,
         freq
  FROM wf, UNNEST(generate_series(1, length(word))) AS u(i)
),
top AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM sym GROUP BY a, b
  ORDER BY cnt DESC, a ASC, b ASC
  LIMIT 1
),
mass AS (
  SELECT CAST(sum(freq * length(word)) AS BIGINT) AS init_pair_mass FROM wf
)
SELECT top.a AS rank0_left,
       top.b AS rank0_right,
       top.a || top.b AS rank0_merged,
       top.cnt AS rank0_count,
       CAST({num_merges} AS BIGINT) AS n_rules,
       mass.init_pair_mass,
       TRUE AS counts_monotone,
       TRUE AS merged_is_concat,
       TRUE AS counts_ge_min
FROM top, mass
"""


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


def bpe_encode_vocab(
    df: DataFrame,
    rules: list[tuple[str, str]],
    *,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale-path encode: identical output to :func:`bpe_encode`, but
    each DISTINCT word is encoded once and joined back, and the merge
    loop runs as an Arrow-batched Python kernel instead of an
    O(num_rules)-deep Catalyst expression tree.

    Why: word-level BPE is context-free, so per-doc token counts are a
    word-table computation — vocab-sized, not corpus-sized (the same
    insight the trainer rests on).  And the fold encoder nests one
    ``F.aggregate`` per rule, which is fine at 20 rules and analysis-
    breaking at a production 50k; here the rule list is a closure over
    a ``mapInPandas`` kernel applying the SAME sequential left-to-right
    semantics (``_merge_word`` in rank order, with a symbol-membership
    guard that skips rules whose parts can't occur), so expression
    depth is constant in ``num_rules``.  Equality with the fold encoder
    is test-pinned.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct()

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            ns = []
            for w in pdf["word"]:
                syms = list(w) + [EOW]
                have = set(syms)
                for a, b in rules:
                    if a in have and b in have:
                        merged = _merge_word(syms, a, b)
                        if len(merged) != len(syms):
                            syms = merged
                            have = set(syms)
                ns.append(len(syms))
            yield pd.DataFrame({"word": pdf["word"], "__n": ns})

    encoded = vocab.mapInPandas(encode_batches, "word string, __n long")
    counts = (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("long").alias("__total"))
    )
    allk = df.select(F.col(id_col)).distinct()
    return allk.join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__total"), F.lit(0)).cast("long").alias("n_tokens_bpe"),
    )


def bpe_encode_fixed_sql(table: str, rules: list[tuple[str, str]]) -> str:
    """Closed-form oracle for :func:`bpe_encode_vocab` under the
    registry's FIXED 4-rule list — the rows-only -> oracle promotion
    (VERDICT r10 task 2).

    Derivation (fuzz-pinned vs the real kernel over 200k words drawn
    from the adversarial alphabet ``thinae</w>xo`` in
    tests/test_llm.py):

    * rule 2 ``(th, e</w>)`` can NEVER fire: the symbol ``e</w>`` only
      exists after a ``(e, </w>)`` merge, which is not in the list —
      single characters of a word spelling out the literal text
      ``e</w>`` stay separate symbols;
    * the other three rules are 2-symbol merges whose patterns share no
      characters and cannot self-overlap (distinct symbols), and no
      merge ever creates or destroys another rule's adjacency (``th``
      carries no i/a/n; the ``n`` of an ``an`` occurrence is preceded
      by ``a``, so rule 3 cannot have consumed it) — so each rule
      removes exactly one symbol per substring occurrence;
    * hence ``n_tokens(word) = length(word) + 1 - occ('th') -
      occ('in') - occ('an')`` with ``occ`` the plain substring count
      ``(len - len(replace(w, p, ''))) // 2``.

    Raises if called with any other rule list: the closed form is a
    theorem about THIS list, not BPE in general."""
    if rules != [("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n")]:
        raise ValueError("closed-form oracle only holds for the fixed rule list")
    from .dedup import NORM_SQL

    norm = NORM_SQL.format(c="text")
    occ = "((length(w) - length(replace(w, '{p}', ''))) // 2)"
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS w
  FROM {table}
), toks AS (
  SELECT doc_id,
         SUM(length(w) + 1 - {occ.format(p='th')}
                           - {occ.format(p='in')}
                           - {occ.format(p='an')}) AS n
  FROM words WHERE w <> '' GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens_bpe
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN toks t USING (doc_id)
"""


# --- byte-level BPE (GPT-2 lineage) -----------------------------------------
#
# Production tokenizers (GPT-2 and its descendants; Radford et al. 2019,
# "Language Models are Unsupervised Multitask Learners", public code at
# openai/gpt-2) run BPE over UTF-8 BYTES, not characters: the base
# alphabet is all 256 byte values, so EVERY string is representable and
# there is no UNK token, ever.  The char-level trainer above can emit a
# vocab that misses a character seen only at apply time; the byte-level
# variant cannot.
#
# The byte-to-unicode bijection below is the public GPT-2 trick: map
# each byte to a PRINTABLE unicode codepoint (printable latin bytes map
# to themselves; the rest shift past 255) so byte sequences become
# ordinary strings and the whole char-BPE machinery — the incremental
# trainer, the left-to-right merge, the word-table encode kernel —
# applies unchanged.  Merged symbols are concatenations of mapped
# chars, exactly as in the reference implementation.


def byte_to_unicode() -> dict[int, str]:
    """The GPT-2 byte <-> printable-unicode bijection: bytes in the
    printable latin ranges map to their own codepoint; the remaining 68
    bytes map to 256, 257, ... in byte order.  Deterministic, total,
    invertible — the base vocabulary of byte-level BPE."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = byte_to_unicode()


def _byte_syms(word: str) -> list[str]:
    """Initial symbol sequence for byte-level BPE: one mapped printable
    char per UTF-8 byte.  No end-of-word sentinel (GPT-2 lineage —
    word boundaries live in the pre-tokenizer, not the symbol stream)."""
    return [_B2U[b] for b in word.encode("utf-8")]


def byte_bpe_train(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Learn ``num_merges`` byte-level BPE merge rules from the corpus.

    Identical machinery and scale shape to :func:`bpe_train` (ONE Spark
    job — the capped word-frequency aggregation — then the exact
    incremental merge loop driver-side); only the initial decomposition
    differs: UTF-8 bytes through the GPT-2 printable mapping, no
    ``</w>`` sentinel, no UNK possible.  Output: ``rank, left, right,
    merged, pair_count`` over mapped-byte symbols."""
    word_freqs, rules = _collect_and_train_bytes(
        df, text=text, num_merges=num_merges,
        min_pair_count=min_pair_count, top_words=top_words,
    )
    return df.sparkSession.createDataFrame(
        rules, "rank int, left string, right string, merged string, pair_count long"
    )


def _collect_and_train_bytes(
    df: DataFrame,
    *,
    text: str,
    num_merges: int,
    min_pair_count: int,
    top_words: int | None,
):
    wf = _word_freqs(df, text=text)
    if top_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(int(top_words))
    word_freqs = [(r["word"], r["freq"]) for r in wf.collect()]
    return word_freqs, _train_rules(
        word_freqs, num_merges, min_pair_count, decompose=_byte_syms
    )


def byte_bpe_train_check(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    top_words: int | None = 1_000_000,
) -> DataFrame:
    """Oracle-checkable verdict row for the byte-level trainer — the
    :func:`bpe_train_check` recipe over the byte alphabet:

    * ``rank0_left/right/merged/count`` — the first learned rule,
      recomputed closed-form by the oracle as the argmax over the
      initial adjacent BYTE-pair mass (DuckDB explodes each word's hex
      encoding and maps bytes through the same GPT-2 bijection, shipped
      as an inline 256-row VALUES table).
    * ``init_byte_mass`` — ``sum(freq * octet_length(word))``: exact
      cross-engine check that both sides see the same UTF-8 byte
      stream (a char-vs-byte or encoding bug breaks it immediately).
    * ``n_rules`` / ``counts_monotone`` / ``merged_is_concat`` /
      ``counts_ge_min`` — as in the char-level check."""
    word_freqs, rules = _collect_and_train_bytes(
        df, text=text, num_merges=num_merges,
        min_pair_count=min_pair_count, top_words=top_words,
    )
    mass = sum(f * len(w.encode("utf-8")) for w, f in word_freqs)
    monotone = all(
        rules[i][4] >= rules[i + 1][4] for i in range(len(rules) - 1)
    )
    concat_ok = all(m == a + b for _, a, b, m, _ in rules)
    ge_min = all(c >= min_pair_count for *_r, c in rules)
    r0 = rules[0] if rules else (0, None, None, None, None)
    row = (
        r0[1], r0[2], r0[3],
        int(r0[4]) if rules else None,
        len(rules), int(mass), monotone, concat_ok, ge_min,
    )
    return df.sparkSession.createDataFrame(
        [row],
        "rank0_left string, rank0_right string, rank0_merged string, "
        "rank0_count long, n_rules long, init_byte_mass long, "
        "counts_monotone boolean, merged_is_concat boolean, "
        "counts_ge_min boolean",
    )


def byte_bpe_train_check_sql(
    table: str,
    *,
    text: str = "text",
    num_merges: int = 30,
    top_words: int | None = 1_000_000,
) -> str:
    """DuckDB oracle for :func:`byte_bpe_train_check`.

    Byte extraction is pure SQL: ``hex(encode(word))`` yields two hex
    chars per UTF-8 byte; position ``i`` slices them out and an inline
    256-row ``(hex, mapped_char)`` VALUES table — generated from the
    SAME :func:`byte_to_unicode` bijection the Spark side uses — turns
    them into symbols.  Adjacent pairs come from ``lead() OVER
    (PARTITION BY word ORDER BY i)`` (words are unique after the
    frequency group-by), and the rank-0 rule is the (count desc, pair
    asc) argmax, exactly the trainer's tie rule."""
    norm = NORM_SQL.format(c=text)
    cap = "" if top_words is None else f"\n  ORDER BY freq DESC, word ASC LIMIT {int(top_words)}"
    b2u_rows = ", ".join(
        "('%02X', '%s')" % (b, u.replace("'", "''")) for b, u in sorted(_B2U.items())
    )
    return f"""
WITH b2u(h, u) AS (VALUES {b2u_rows}),
wf AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split({norm}, ' ')) AS word FROM {table})
  WHERE word <> ''
  GROUP BY word{cap}
),
sym AS (
  SELECT wf.word, wf.freq, u.i, b2u.u
  FROM wf,
       UNNEST(generate_series(1, octet_length(encode(wf.word)))) AS u(i)
  JOIN b2u ON b2u.h = substr(hex(encode(wf.word)), 2 * u.i - 1, 2)
),
pairs AS (
  SELECT u AS a, lead(u) OVER (PARTITION BY word ORDER BY i) AS b, freq
  FROM sym
),
top AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM pairs WHERE b IS NOT NULL
  GROUP BY a, b
  ORDER BY cnt DESC, a ASC, b ASC
  LIMIT 1
),
mass AS (
  SELECT CAST(sum(freq * octet_length(encode(word))) AS BIGINT) AS init_byte_mass
  FROM wf
)
SELECT top.a AS rank0_left,
       top.b AS rank0_right,
       top.a || top.b AS rank0_merged,
       top.cnt AS rank0_count,
       CAST({num_merges} AS BIGINT) AS n_rules,
       mass.init_byte_mass,
       TRUE AS counts_monotone,
       TRUE AS merged_is_concat,
       TRUE AS counts_ge_min
FROM top, mass
"""


def byte_bpe_encode_fixed_sql(table: str, rules: list[tuple[str, str]]) -> str:
    """Closed-form oracle for :func:`byte_bpe_encode_vocab` under the
    registry's fixed rule list ``[(t,h), (i,n), (a,n)]`` over BYTE
    symbols.

    Derivation (the :func:`bpe_encode_fixed_sql` argument, byte-flavor):

    * the three rules are 2-symbol merges over ASCII byte symbols with
      pairwise-disjoint characters except the in/an 'n' (overlap
      impossible — one position would need two values) and no
      self-overlap, so each rule removes exactly one symbol per
      occurrence and no merge creates or destroys another's adjacency;
    * byte-level twist: a UTF-8 multi-byte character consists entirely
      of bytes >= 0x80, and ASCII bytes appear in a UTF-8 stream ONLY
      as their own character — so occurrences of th/in/an in the BYTE
      sequence are exactly their occurrences in the character string,
      and DuckDB's char-level ``replace`` counts them correctly even
      on non-ASCII words;
    * hence ``n_tokens(word) = octet_length(encode(word)) - occ('th') -
      occ('in') - occ('an')`` (no +1: byte-level has no EOW sentinel).

    Raises on any other rule list — the closed form is a theorem about
    THIS list."""
    if rules != [("t", "h"), ("i", "n"), ("a", "n")]:
        raise ValueError("closed-form oracle only holds for the fixed rule list")
    norm = NORM_SQL.format(c="text")
    occ = "((length(w) - length(replace(w, '{p}', ''))) // 2)"
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS w
  FROM {table}
), toks AS (
  SELECT doc_id,
         SUM(octet_length(encode(w)) - {occ.format(p='th')}
                                     - {occ.format(p='in')}
                                     - {occ.format(p='an')}) AS n
  FROM words WHERE w <> '' GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens_bpe
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN toks t USING (doc_id)
"""


def byte_bpe_encode_vocab(
    df: DataFrame,
    rules: list[tuple[str, str]],
    *,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Byte-level twin of :func:`bpe_encode_vocab`: per-doc token count
    after applying a byte-level rule list in rank order — each DISTINCT
    word byte-decomposed and merged once by the Arrow kernel, joined
    back.  ``n_tokens_bpe`` starts at the word's UTF-8 byte count (no
    EOW), so an empty rule list measures raw byte length.  No UNK: any
    word is encodable by construction."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(_norm(F.col(text)), " ")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct()

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            ns = []
            for w in pdf["word"]:
                syms = _byte_syms(w)
                have = set(syms)
                for a, b in rules:
                    if a in have and b in have:
                        merged = _merge_word(syms, a, b)
                        if len(merged) != len(syms):
                            syms = merged
                            have = set(syms)
                ns.append(len(syms))
            yield pd.DataFrame({"word": pdf["word"], "__n": ns})

    encoded = vocab.mapInPandas(encode_batches, "word string, __n long")
    counts = (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("long").alias("__total"))
    )
    allk = df.select(F.col(id_col)).distinct()
    return allk.join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__total"), F.lit(0)).cast("long").alias("n_tokens_bpe"),
    )
