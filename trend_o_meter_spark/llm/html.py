"""HTML main-content extraction: the web-scrape -> training-text step.

A 100 TB pretraining pipeline's rawest input is markup (CommonCrawl WARC
payloads), not clean text.  This module is the boilerplate-removal
stage, zero-dependency like the codec stack (:mod:`.codecs`):

* a real HTML **tokenizer** — attributes with quoted ``>``, comments,
  doctype/PI, raw-text elements (``script``/``style``/``title``/
  ``textarea`` content never leaks into text), void and self-closing
  tags, case-insensitive names, literal ``<`` fallback — best-effort on
  malformed input (never raises: a truncated comment or stray bracket
  in 100 TB of scraped HTML must not kill a ``mapInPandas`` stage);
* **entity decoding** for the named core set + numeric ``&#NN;`` /
  ``&#xHH;`` forms;
* **block segmentation**: text accumulates into blocks flushed at
  block-level tag boundaries (``p``/``div``/``li``/``h*``/``br``/...),
  counting per-block words and LINK words (words inside ``<a>``);
* the classic **text/link-density boilerplate rule** (the heuristic
  family of Arc90 Readability and boilerpipe, Kohlschütter et al.,
  WSDM 2010): keep blocks with ``words >= min_words`` and
  ``link_words / words <= 1/3`` — navigation chrome is short and
  link-saturated, body prose is long and link-sparse.  The density
  compare is INTEGER (``3 * link_words <= words``), never float, so
  the DuckDB oracle reproduces boundary cases exactly.

Spark shape: pure per-row map (``mapInPandas``) — no shuffle, no state;
the only cost is Python/Arrow, amortized per batch.  The registry query
synthesizes a deterministic page per document (nav/header/footer chrome
around the real text re-wrapped as ``<p>`` paragraphs, one inline
anchor in the first paragraph) and extracts it back, so the oracle
knows the expected output analytically — the same
encode-then-really-decode contract as ``video_frame_features``
(multimodal.py): the extraction path is fully real, the input is
driver-reproducible.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame

# Content inside these elements is skipped entirely (raw text model).
_RAW_TEXT = {"script", "style", "title", "textarea", "template", "noscript"}

# Flushing a text block at these boundaries (HTML block-level elements).
_BLOCK = {
    "address", "article", "aside", "blockquote", "br", "dd", "div", "dl",
    "dt", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol", "p",
    "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul",
}

_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "mdash": "—", "ndash": "–",
}

_ENTITY_RE = re.compile(r"&(#[xX]?[0-9a-fA-F]+|\w+);")
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")

# ASCII-only lowercase table: length-preserving for EVERY input, unlike
# str.lower() (U+0130 lowercases to 2 code points, desyncing indexes
# computed on the lowered copy from the original string).  Tag names are
# ASCII, so this is all the case-folding the tokenizer needs.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def decode_entities(s: str) -> str:
    """Decode named-core + numeric character references; unknown names
    pass through verbatim (scraped HTML is full of stray ampersands)."""

    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#"):
            try:
                cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
                if 0xD800 <= cp <= 0xDFFF:
                    # Lone surrogates are not UTF-8-encodable: one such
                    # entity in a scraped page would kill the whole Arrow
                    # batch.  html.unescape maps these to U+FFFD; so do we.
                    return "�"
                return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
            except ValueError:
                return m.group(0)
        return _NAMED_ENTITIES.get(body.lower(), m.group(0))

    return _ENTITY_RE.sub(sub, s)


def _tokens(html: str):
    """Yield ``('text', s)``, ``('open', name)``, ``('close', name)``.

    Best-effort tokenizer: comments/doctype/PIs are skipped, raw-text
    element content is consumed up to its close tag, a ``<`` that does
    not start a tag is literal text, truncated constructs consume to
    end-of-input without raising.
    """
    i, n = 0, len(html)
    # Once, ASCII-only: indexes into `low` must be valid in `html`, so
    # the fold MUST be length-preserving (str.lower() is not; see
    # _ASCII_LOWER).  Per-element lowercasing would be O(n^2).
    low = html.translate(_ASCII_LOWER)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            yield ("text", html[i:])
            return
        if lt > i:
            yield ("text", html[i:lt])
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if lt + 1 < n and html[lt + 1] in "!?":
            end = html.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        closing = html.startswith("</", lt)
        m = _NAME_RE.match(html, lt + (2 if closing else 1))
        if not m:
            yield ("text", "<")
            i = lt + 1
            continue
        name = m.group(0).lower()
        # scan to the tag's real '>' honoring quoted attribute values
        j, quote = m.end(), ""
        while j < n:
            c = html[j]
            if quote:
                if c == quote:
                    quote = ""
            elif c in "\"'":
                quote = c
            elif c == ">":
                break
            j += 1
        self_closing = j < n and html[j - 1] == "/" and not quote
        i = n if j >= n else j + 1
        if closing:
            yield ("close", name)
            continue
        yield ("open", name)
        if self_closing:
            yield ("close", name)
        elif name in _RAW_TEXT:
            # HTML5 raw-text close: "</name" must be followed by
            # whitespace, "/", or ">" — a prefix match like "</styled>"
            # must NOT close "<style>" (one malformed page would
            # otherwise swallow the rest of the document).
            end, needle = -1, f"</{name}"
            j2 = i
            while True:
                cand = low.find(needle, j2)
                if cand == -1:
                    break
                after = cand + len(needle)
                if after >= n or html[after] in " \t\r\n/>":
                    end = cand
                    break
                j2 = cand + 1
            i = n if end == -1 else end  # close tag consumed next loop
            if end == -1:
                return


class Block:
    __slots__ = ("words", "link_words")

    def __init__(self) -> None:
        self.words: list[str] = []
        self.link_words = 0


def extract_blocks(html: str) -> list[tuple[str, int, int]]:
    """Segment markup into text blocks: ``(text, n_words, n_link_words)``
    per block, words whitespace-normalized, empty blocks dropped."""
    blocks: list[tuple[str, int, int]] = []
    cur = Block()
    a_depth = 0

    def flush() -> None:
        nonlocal cur
        if cur.words:
            blocks.append((" ".join(cur.words), len(cur.words), cur.link_words))
        cur = Block()

    # No raw-text bookkeeping here: the tokenizer never yields text from
    # inside script/style/title/... (it jumps straight to the close tag),
    # so a second skip-counter would just be a divergence hazard.
    for tok in _tokens(html):
        kind = tok[0]
        if kind == "text":
            for w in decode_entities(tok[1]).split():
                cur.words.append(w)
                if a_depth > 0:
                    cur.link_words += 1
        else:
            name = tok[1]
            if name == "a":
                a_depth = max(0, a_depth + (1 if kind == "open" else -1))
            elif name in _BLOCK:
                flush()
    flush()
    return blocks


def extract_main_text(
    html: str, *, min_words: int = 5
) -> tuple[str, int, int, int]:
    """Boilerplate-filtered main content.

    Returns ``(main_text, n_kept, n_dropped, link_words_kept)`` where a
    block is kept iff ``words >= min_words`` and ``3 * link_words <=
    words`` (integer density compare); kept blocks join with ``\\n``.
    """
    kept: list[str] = []
    n_dropped = 0
    link_kept = 0
    for text, words, link_words in extract_blocks(html):
        if words >= min_words and 3 * link_words <= words:
            kept.append(text)
            link_kept += link_words
        else:
            n_dropped += 1
    return "\n".join(kept), len(kept), n_dropped, link_kept


# ---------------------------------------------------------------------------
# Deterministic page synthesis (driver-reproducible extractor input)
# ---------------------------------------------------------------------------

PAR_WORDS = 12  # body paragraph size for the synthesized pages


def synthesize_page(doc_id: int, source: str, text: str) -> str:
    """A realistic page around the document's text: head with script/style
    (raw-text hazards), a nav whose link count varies by doc
    (``3 + doc_id % 4`` items, each 3 link words -> dropped by both
    rules), an ``<h1>`` (3 words -> dropped by min_words), the text as
    12-word ``<p>`` paragraphs with the FIRST word wrapped in an inline
    anchor (1/12 link density -> kept, anchor text preserved), and a
    link-saturated footer (dropped).

    Body words are partially ENTITY-ESCAPED (every 'e' as decimal
    ``&#101;``, every 'a' as hex ``&#x61;``) and each paragraph's last
    two words are joined by the NAMED reference ``&nbsp;`` (which
    decodes to a space, so the word split is unchanged) — the
    oracle-checked driver path exercises all three reference forms:
    the expected output is still the original text, but only an
    extractor that actually decodes every form recovers it (an
    undecoded ``&nbsp;`` would weld the final two words into one and
    break the hash)."""
    words = text.split()
    nav_n = 3 + doc_id % 4
    nav = "".join(
        f'<li><a href="/{source}/{i}">{source} link {i}</a></li>'
        for i in range(nav_n)
    )

    def esc(w: str) -> str:
        return w.replace("e", "&#101;").replace("a", "&#x61;")

    pars = []
    for p, start in enumerate(range(0, len(words), PAR_WORDS)):
        grp = [esc(w) for w in words[start : start + PAR_WORDS]]
        if p == 0:
            grp = [f'<a href="#ref">{grp[0]}</a>', *grp[1:]]
        if len(grp) >= 3:
            grp = [*grp[:-2], f"{grp[-2]}&nbsp;{grp[-1]}"]
        pars.append(f"<p>{' '.join(grp)}</p>")
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>Doc {doc_id}</title>"
        "<style>p { margin: 0 }</style>"
        "<script>if (1 < 2) { var x = '</span>'; }</script>"
        "</head><body><!-- chrome -->"
        f'<nav><ul>{nav}</ul></nav>'
        f"<h1>Document {doc_id} overview</h1>"
        f"<main>{''.join(pars)}</main>"
        '<footer><a href="/about">about us</a> <a href="/tos">terms of service</a></footer>'
        "</body></html>"
    )


def html_extract(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    min_words: int = 5,
) -> DataFrame:
    """Registry operator: synthesize each document's page, run the REAL
    extractor on it, emit the recovered main text + block accounting.

    Expected analytically (what the oracle recomputes): main_text = the
    12-word paragraph re-wrap of ``text`` (tail paragraphs under
    ``min_words`` dropped), n_dropped = nav items + h1 + footer + any
    dropped tail, link_words_kept = 1 (the inline anchor word).
    """
    schema = (
        f"{id_col} long, main_text string, n_kept int, n_dropped int, "
        "link_words_kept int"
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                page = synthesize_page(int(r.doc_id), r.source, r.text)
                main, kept, dropped, links = extract_main_text(
                    page, min_words=min_words
                )
                out.append((int(r.doc_id), main, kept, dropped, links))
            yield pd.DataFrame(
                out,
                columns=[id_col, "main_text", "n_kept", "n_dropped",
                         "link_words_kept"],
            )

    # one-core guard (guide §2.5/§4.1): single-split scans would run the
    # whole Python synthesize+extract pipeline on one worker; spread is
    # a no-op at real scan widths and ships only the needed columns.
    from ..catalog import spread

    return spread(df.select(id_col, "source", "text")).mapInPandas(
        run, schema=schema
    )


def html_extract_sql(table: str, *, min_words: int = 5) -> str:
    """Oracle: rebuild the expected extraction from the raw text alone —
    12-word paragraph regrouping with the same integer drop rule and the
    chrome block count as a closed-form expression of ``doc_id``.

    VALIDITY RANGE: the closed form assumes the chrome blocks (3-word
    nav items / 3-word h1 / 5-all-link-word footer) drop and paragraph 0
    (>= 10 words in the contract corpus, 1 link word) is kept — true for
    ``min_words`` in [4, 10].  Outside that window the extractor and
    this oracle diverge by construction; keep the default unless both
    sides are changed together."""
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(str_split(text, ' ')) AS word,
         unnest(range(len(str_split(text, ' ')))) AS idx
  FROM {table}
), pars AS (
  SELECT doc_id, idx // {PAR_WORDS} AS par,
         count(*) AS n_w,
         string_agg(word, ' ' ORDER BY idx) AS par_text
  FROM words GROUP BY doc_id, idx // {PAR_WORDS}
), kept AS (
  -- only par 0 carries a link word (1 of >= {min_words} words, so the
  -- 3*links <= words density rule never drops it); tails drop on
  -- min_words alone
  SELECT * FROM pars WHERE n_w >= {min_words}
), agg AS (
  SELECT doc_id,
         string_agg(par_text, chr(10) ORDER BY par) AS main_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), totals AS (
  SELECT doc_id, count(*) AS n_pars FROM pars GROUP BY doc_id
)
SELECT d.doc_id,
       a.main_text,
       CAST(a.n_kept AS INTEGER) AS n_kept,
       -- ((x%4)+4)%4: sign-safe vs Python % (DuckDB truncates toward 0)
       CAST((3 + ((d.doc_id % 4) + 4) % 4) + 2 + (t.n_pars - a.n_kept)
            AS INTEGER) AS n_dropped,
       1 AS link_words_kept
FROM {table} d
JOIN agg a USING (doc_id)
JOIN totals t USING (doc_id)
"""
