"""robots.txt evaluation (RFC 9309): crawl-permission filtering.

The third piece of the crawl-to-corpus story (WARC containers ->
THIS -> HTML extraction): before a fetched page may enter a training
corpus, pipelines re-check the host's robots policy (CommonCrawl ships
the robots.txt captures alongside the content crawls for exactly this).
Zero-dependency implementation of the Robots Exclusion Protocol as
standardized in RFC 9309:

* **parser** (:func:`parse_robots`): line-oriented, ``#`` comments,
  case-insensitive field names, CRLF/BOM tolerant, unknown directives
  ignored; consecutive ``User-agent`` lines stack onto one group; a
  product token matches case-insensitively, most-specific (longest)
  agent match wins, ``*`` is the fallback group;
* **matcher** (:func:`rule_matches`): path patterns with ``*``
  (any-length wildcard) and ``$`` (end anchor), translated to anchored
  regex — RFC 9309 §2.2.3;
* **decision** (:func:`is_allowed`): the LONGEST matching pattern wins
  (specificity = pattern octet length, §2.2.2); on a length tie the
  ``Allow`` rule wins; no matching rule -> allowed (and an absent or
  empty group allows everything).

Spark shape: policies are per-HOST — a dimension table (one robots.txt
per host, thousands of rules at most) joined against a corpus-sized URL
table.  The registry query broadcast-joins synthesized per-source
policies (rules derived deterministically from the source name) against
each document's URL and evaluates the REAL matcher in a pandas UDF; the
oracle recomputes the decision as a closed-form CASE over doc_id — the
same analytically-known-input contract as ``html_extract`` /
``warc_extract``.  At 100 TB the policy side stays broadcast-sized
(hosts x rules), the URL side is a pure map — no shuffle beyond the
broadcast.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(txt: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt -> list of groups ``(agent_tokens, [(is_allow, pattern)])``.

    Groups follow RFC 9309 §2.2.1: consecutive ``User-agent`` lines
    open one group; rules attach to the open group; rules before any
    ``User-agent`` line are ignored (no group to attach to)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False

    def close() -> None:
        nonlocal agents, rules
        if agents:
            groups.append((agents, rules))
        agents, rules = [], []

    for raw in txt.replace("﻿", "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                close()
                collecting_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if agents:
                # An empty Disallow means "allow everything" (matches
                # nothing); keep it out of the rule list entirely.
                if value:
                    rules.append((field == "allow", value))
        # Other records (crawl-delay, sitemap, unknown) are ignored
        # ENTIRELY — RFC 9309 §2.2.1: they must not interfere with
        # grouping, so a Sitemap line between two stacked User-agent
        # lines must not split the group.
    close()
    return groups


def select_group(
    groups: list[tuple[list[str], list[tuple[bool, str]]]], agent: str
) -> list[tuple[bool, str]]:
    """The rules for ``agent``: every group whose agent token is the
    LONGEST case-insensitive match contributes (RFC 9309 §2.2.1 —
    multiple groups for the same product token MUST be combined);
    ``*`` groups (also combined) are the fallback; no match at all ->
    empty rules (everything allowed)."""
    agent = agent.lower()
    best_len = -1
    for agents, _ in groups:
        for tok in agents:
            if tok != "*" and tok and tok in agent and len(tok) > best_len:
                best_len = len(tok)
    combined: list[tuple[bool, str]] = []
    if best_len >= 0:
        for agents, rules in groups:
            if any(
                tok != "*" and tok and tok in agent and len(tok) == best_len
                for tok in agents
            ):
                combined.extend(rules)
        return combined
    star_seen = False
    for agents, rules in groups:
        if "*" in agents:
            star_seen = True
            combined.extend(rules)
    return combined if star_seen else []


_RULE_RE_CACHE: dict[str, re.Pattern] = {}


def rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3 pattern match: ``*`` = any chars, ``$`` = end
    anchor (only meaningful as the last character), anchored at start."""
    rx = _RULE_RE_CACHE.get(pattern)
    if rx is None:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        parts = [re.escape(p) for p in body.split("*")]
        rx = re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))
        if len(_RULE_RE_CACHE) < 4096:
            _RULE_RE_CACHE[pattern] = rx
    return rx.match(path) is not None


def is_allowed(rules: list[tuple[bool, str]], path: str) -> tuple[bool, int]:
    """(allowed, winning_pattern_length): longest matching pattern wins;
    on a tie Allow wins; no match -> allowed with length 0."""
    best_len, best_allow = 0, True
    for allow, pattern in rules:
        if rule_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len, best_allow = plen, allow
    return best_allow, best_len


# ---------------------------------------------------------------------------
# Registry operator: deterministic per-source policies over document URLs
# ---------------------------------------------------------------------------

AGENT = "trendbot/1.0"


def synthesize_robots(source: str) -> str:
    """A realistic per-source policy exercising every RFC mechanism the
    oracle can close-form: a deny-all ``*`` group (must NOT apply to
    trendbot — group selection), an Allow-root baseline, a directory
    Disallow, a LONGER Allow carve-out inside it, and a wildcard+anchor
    Disallow; plus comments, mixed case, CRLF, and an unknown directive."""
    return (
        "# synthetic policy for "
        + source
        + "\r\n"
        + "User-Agent: *\r\nDisallow: /\r\n\r\n"
        + "User-agent: trendbot\r\n"
        + "Crawl-delay: 5\r\n"  # unknown-to-us directive: ignored
        + "Allow: /\r\n"
        + f"Disallow: /{source}/d2/\r\n"
        + f"Allow: /{source}/d2/p1\r\n"
        + "Disallow: /*9$\r\n"
    )


def doc_path(source: str, doc_id: int) -> str:
    return f"/{source}/d{doc_id % 4}/p{doc_id}"


def robots_filter(df: DataFrame, *, agent: str = AGENT) -> DataFrame:
    """Evaluate each document's URL against its source's policy with the
    REAL parser+matcher.  Output: ``doc_id, path, allowed, match_len``.

    The per-source policy table is built once per task and memoized
    (hosts are dimension-sized); the scan side is a pure map."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        rules_by_source: dict[str, list] = {}
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                rules = rules_by_source.get(r.source)
                if rules is None:
                    rules = select_group(
                        parse_robots(synthesize_robots(r.source)), agent
                    )
                    rules_by_source[r.source] = rules
                path = doc_path(r.source, int(r.doc_id))
                allowed, mlen = is_allowed(rules, path)
                out.append((int(r.doc_id), path, allowed, mlen))
            yield pd.DataFrame(
                out, columns=["doc_id", "path", "allowed", "match_len"]
            )

    return df.select("doc_id", "source").mapInPandas(
        run, schema="doc_id long, path string, allowed boolean, match_len int"
    )


def robots_filter_sql(table: str) -> str:
    """Closed-form oracle: the decision as a CASE over doc_id/source.

    Candidate rules per doc (pattern -> length): ``Allow /`` (1) always
    matches; ``Disallow /{source}/d2/`` (len(source)+5) iff doc_id%4==2;
    ``Allow /{source}/d2/p1`` (len(source)+7) iff doc_id%4==2 and the
    id's decimal string starts with '1'; ``Disallow /*9$`` (4) iff the
    id ends in 9.  Longest match wins, ties favor Allow (never occur
    here: all lengths distinct per doc).

    ``((doc_id % 4) + 4) % 4`` keeps the oracle sign-safe: DuckDB ``%``
    truncates toward zero (-2 % 4 = -2) while Python's floors (= 2), so
    the bare form would diverge from :func:`doc_path` on negative ids."""
    return f"""
SELECT doc_id,
       '/' || source || '/d' || CAST(((doc_id % 4) + 4) % 4 AS VARCHAR)
           || '/p' || CAST(doc_id AS VARCHAR) AS path,
       CASE
         WHEN ((doc_id % 4) + 4) % 4 = 2 AND CAST(doc_id AS VARCHAR) LIKE '1%'
           THEN TRUE                                   -- carve-out (longest)
         WHEN ((doc_id % 4) + 4) % 4 = 2
           THEN FALSE                                  -- directory disallow
         WHEN CAST(doc_id AS VARCHAR) LIKE '%9'
           THEN FALSE                                  -- /*9$ (len 4 > 1)
         ELSE TRUE                                     -- Allow / baseline
       END AS allowed,
       CASE
         WHEN ((doc_id % 4) + 4) % 4 = 2 AND CAST(doc_id AS VARCHAR) LIKE '1%'
           THEN CAST(length(source) + 7 AS INTEGER)
         WHEN ((doc_id % 4) + 4) % 4 = 2
           THEN CAST(length(source) + 5 AS INTEGER)
         WHEN CAST(doc_id AS VARCHAR) LIKE '%9'
           THEN 4
         ELSE 1
       END AS match_len
FROM {table}
"""
