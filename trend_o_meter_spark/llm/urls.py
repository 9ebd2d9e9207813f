"""URL canonicalization + domain rollup: crawl-frontier hygiene.

Web-scale corpora are deduplicated at the URL level before any content
ever downloads (the FineWeb/CCNet front gate): the same logical page
arrives under mixed-case schemes/hosts, default ports, dot-segment
paths, fragments, and percent-encoding variants, and a frontier that
treats those as distinct re-crawls (and re-ingests) the page once per
spelling.  This module is that gate, Spark-first:

* :func:`canonicalize_url` — RFC 3986 syntax-based normalization
  (section 6.2.2) as PURE JVM column expressions (regexp component
  split, ``F.aggregate`` stack fold for ``remove_dot_segments`` — no
  UDF, no shuffle):

  - scheme and host lowercased (6.2.2.1);
  - default port stripped (``:80`` http / ``:443`` https, 6.2.3);
  - fragment removed (dedup identity ignores it);
  - ``remove_dot_segments`` applied to the path (6.2.2.3) via an
    array-stack fold: ``.`` skipped, ``..`` pops, a trailing ``.``/
    ``..`` leaves a trailing slash — fuzz-pinned against a literal
    Python transcription of the RFC buffer algorithm in
    ``tests/test_urls.py``;
  - empty path -> ``/`` (6.2.3);
  - the unreserved escape ``%7E`` decoded to ``~`` (6.2.2.2's most
    common real-world case).  Full unreserved-set decoding and
    uppercase-hex re-encoding are documented non-goals: they would be
    65 more chained ``regexp_replace`` ops for variants the synthetic
    corpus (and most crawl frontiers) never emit.

* :func:`domain_stats` — the per-host rollup a frontier scheduler
  keys on: documents per host, DISTINCT canonical URLs, and the
  duplicate count their difference exposes.  One keyed aggregation.

The registry queries synthesize deterministic raw-URL mess per document
(the encode-then-really-decode contract of html/warc/robots: every
normalization branch is exercised, and the DuckDB oracle knows the
expected canonical form analytically), so the canonicalizer is fully
real and the oracle closed-form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "domain_stats",
    "remove_dot_segments_col",
    "synthesize_raw_url",
    "url_canonical_sql",
    "domain_stats_sql",
]


def remove_dot_segments_col(path: Column) -> Column:
    """RFC 3986 6.2.2.3 ``remove_dot_segments`` for ABSOLUTE paths as an
    array-stack fold (JVM-side, no UDF).

    ``split('/a/./b', '/')`` yields a leading ``''`` (dropped — it is
    the root, re-added at join time) then the segments.  Stack rules:
    ``.`` skipped, ``..`` pops (no-op at root — "/../a" -> "/a"), any
    other segment pushed (INCLUDING ``''`` from internal ``//``, which
    the RFC preserves and a later ``..`` can pop).  A trailing ``.`` or
    ``..`` leaves the output ending in ``/`` (the RFC buffer keeps the
    slash), handled by appending one ``''`` after the fold.
    """
    segs = F.split(path, "/")
    tail = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))
    stack = F.aggregate(
        tail,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
        .otherwise(F.concat(acc, F.array(s))),
    )
    last = F.element_at(segs, -1)
    stack = F.when(
        (last == ".") | (last == ".."), F.concat(stack, F.array(F.lit("")))
    ).otherwise(stack)
    return F.concat(F.lit("/"), F.array_join(stack, "/"))


def canonicalize_url(url: Column) -> Column:
    """RFC 3986 syntax-based normalization (module docstring scope).

    Pure column expressions: component split by anchored regexps,
    conditional default-port strip, dot-segment fold, ``%7E`` decode.
    Non-URL input (no ``scheme://``) passes through unchanged — a
    crawl frontier quarantines those upstream.
    """
    no_frag = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth_raw = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    # RFC 3986 6.2.2.1 case-normalizes only scheme and host: any userinfo
    # (everything through the last '@') keeps its case.  `.*@` is greedy,
    # so it captures through the LAST '@'; with no '@' it is empty and the
    # whole authority is host[:port].
    auth = F.concat(
        F.regexp_extract(auth_raw, r"^(.*@)", 1),
        F.lower(F.regexp_replace(auth_raw, r"^.*@", "")),
    )
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = remove_dot_segments_col(F.regexp_replace(path, "%7[Ee]", "~"))
    query = F.regexp_extract(no_frag, r"^[^?#]*(\?[^#]*)", 1)
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), auth, path, query)
    )


# --------------------------------------------------------------------------
# Deterministic raw-URL synthesis (driver-reproducible mess, oracle-known)
# --------------------------------------------------------------------------

PAGE_MOD = 100  # logical page id = doc_id % PAGE_MOD -> real URL-level dups


def synthesize_raw_url(doc_id: Column, source: Column) -> Column:
    """A raw crawl URL for each document with deterministic, branch-
    exercising mess.  The LOGICAL page is ``doc_id % 100`` per source,
    so distinct documents genuinely collide after canonicalization —
    the dup the domain rollup must expose.

    Branches (all closed-form for the oracle): scheme case by
    ``doc_id % 3``; host case by ``doc_id % 2``; explicit default port
    on ``doc_id % 4 == 0``; path mess by ``doc_id % 5`` (``/./``
    insert, ``x/..`` round trip, ``//..`` empty-segment pop, clean,
    ``%7E`` escape); fragment on odd ids.
    """
    p = doc_id % PAGE_MOD
    scheme = (
        F.when(doc_id % 3 == 0, F.lit("HTTP"))
        .when(doc_id % 3 == 1, F.lit("http"))
        .otherwise(F.lit("HtTp"))
    )
    host = F.when(
        doc_id % 2 == 0, F.concat(F.upper(source), F.lit(".Example.COM"))
    ).otherwise(F.concat(source, F.lit(".example.com")))
    port = F.when(doc_id % 4 == 0, F.lit(":80")).otherwise(F.lit(""))
    pv = p.cast("string")
    path = (
        F.when(doc_id % 5 == 0, F.concat(F.lit("/docs/./p"), pv))
        .when(doc_id % 5 == 1, F.concat(F.lit("/docs/x/../p"), pv))
        .when(doc_id % 5 == 2, F.concat(F.lit("/docs//../p"), pv))
        .when(doc_id % 5 == 3, F.concat(F.lit("/docs/p"), pv))
        .otherwise(F.concat(F.lit("/%7Edocs/p"), pv))
    )
    frag = F.when(doc_id % 2 == 1, F.concat(F.lit("#s"), doc_id.cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, port, path, frag)


def url_canonical(df: DataFrame, *, id_col: str = "doc_id", source: str = "source") -> DataFrame:
    """Registry query body: synthesize the raw URL, canonicalize it for
    real.  Output: ``doc_id, url_raw, url`` — map-only, zero shuffles."""
    d = F.col(id_col)
    raw = synthesize_raw_url(d, F.col(source))
    return df.select(
        d.alias("doc_id"),
        raw.alias("url_raw"),
        canonicalize_url(raw).alias("url"),
    )


def domain_stats(df: DataFrame, *, id_col: str = "doc_id", source: str = "source") -> DataFrame:
    """Per-host frontier rollup over the canonicalized URLs:
    ``host, n_docs, n_urls, n_dup_docs`` (dups = docs whose canonical
    URL another doc already claimed).  One keyed aggregation; host
    cardinality is dimension-sized, the map side does all the work."""
    c = url_canonical(df, id_col=id_col, source=source)
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)
    return (
        c.select(host.alias("host"), "url")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("url").cast("long").alias("n_urls"),
            (F.count(F.lit(1)) - F.countDistinct("url"))
            .cast("long")
            .alias("n_dup_docs"),
        )
    )


# --------------------------------------------------------------------------
# DuckDB oracles (closed-form from the synthesis branches)
# --------------------------------------------------------------------------

_RAW_SQL = """
  CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'http' ELSE 'HtTp' END
  || '://'
  || CASE WHEN doc_id % 2 = 0 THEN upper(source) || '.Example.COM'
          ELSE source || '.example.com' END
  || CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END
  || CASE doc_id % 5
       WHEN 0 THEN '/docs/./p'    || CAST(doc_id % {mod} AS VARCHAR)
       WHEN 1 THEN '/docs/x/../p' || CAST(doc_id % {mod} AS VARCHAR)
       WHEN 2 THEN '/docs//../p'  || CAST(doc_id % {mod} AS VARCHAR)
       WHEN 3 THEN '/docs/p'      || CAST(doc_id % {mod} AS VARCHAR)
       ELSE        '/%7Edocs/p'   || CAST(doc_id % {mod} AS VARCHAR)
     END
  || CASE WHEN doc_id % 2 = 1 THEN '#s' || CAST(doc_id AS VARCHAR) ELSE '' END
"""

_CANON_SQL = """
  'http://' || source || '.example.com'
  || CASE WHEN doc_id % 5 IN (0, 1, 2, 3) THEN '/docs/p' ELSE '/~docs/p' END
  || CAST(doc_id % {mod} AS VARCHAR)
"""


def url_canonical_sql(table: str) -> str:
    """Oracle: the synthesis expression verbatim for ``url_raw`` and the
    analytically known canonical form for ``url`` (every mess branch
    normalizes to ``http://<source>.example.com/[~]docs/p<id%100>``)."""
    raw = _RAW_SQL.format(mod=PAGE_MOD)
    canon = _CANON_SQL.format(mod=PAGE_MOD)
    return f"""
SELECT doc_id,
       {raw} AS url_raw,
       {canon} AS url
FROM {table}
"""


def domain_stats_sql(table: str) -> str:
    canon = _CANON_SQL.format(mod=PAGE_MOD)
    return f"""
WITH c AS (SELECT source || '.example.com' AS host, {canon} AS url FROM {table})
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(*) - count(DISTINCT url) AS BIGINT) AS n_dup_docs
FROM c
GROUP BY host
"""
