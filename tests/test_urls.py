"""URL canonicalization tests: the dot-segment fold is fuzz-pinned
against a literal transcription of RFC 3986 section 5.2.4's buffer
algorithm, and the full canonicalizer against hand-checked cases."""

import random

from pyspark.sql import functions as F

from trend_o_meter_spark.llm.urls import (
    canonicalize_url,
    domain_stats,
    remove_dot_segments_col,
    url_canonical,
)


def rfc_remove_dot_segments(path: str) -> str:
    """RFC 3986 5.2.4, transcribed literally (input buffer walk)."""
    inp, out = path, ""
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            out = out[: out.rfind("/")] if "/" in out else ""
        elif inp == "/..":
            inp = "/"
            out = out[: out.rfind("/")] if "/" in out else ""
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            seg, inp = (inp, "") if i == -1 else (inp[:i], inp[i:])
            out += seg
    return out


def test_dot_segment_fold_matches_rfc_on_fuzz(spark):
    rng = random.Random(11)
    parts = ["a", "bb", "c1", ".", "..", ""]
    paths = []
    for _ in range(400):
        n = rng.randrange(0, 7)
        paths.append("/" + "/".join(rng.choice(parts) for _ in range(n)))
    paths += ["/", "/.", "/..", "/a/..", "/a/.", "/../a", "/a//b", "/a//../b",
              "/a/b/c/./../../g", "/./", "/../", "/a/../../b"]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = {
        r["p"]: r["out"]
        for r in df.select("p", remove_dot_segments_col(F.col("p")).alias("out")).collect()
    }
    for p in paths:
        assert got[p] == rfc_remove_dot_segments(p), (
            p, got[p], rfc_remove_dot_segments(p))


def test_canonicalize_known_cases(spark):
    cases = [
        ("HTTP://WWW.Example.COM:80/a/./b/../c#frag", "http://www.example.com/a/c"),
        ("https://Host:443/", "https://host/"),
        ("https://Host:8443/x", "https://host:8443/x"),  # non-default kept
        ("http://h", "http://h/"),                        # empty path -> /
        ("http://h/%7Euser/p", "http://h/~user/p"),
        ("http://h/a?q=1#f", "http://h/a?q=1"),           # query kept, frag cut
        ("not a url", "not a url"),                       # passthrough
        # RFC 3986 6.2.2.1: userinfo keeps its case; only host lowers
        ("http://User:Pw@Host.COM/x", "http://User:Pw@host.com/x"),
        ("http://A@B@Host/x", "http://A@B@host/x"),       # last '@' splits
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = {r["u"]: r["c"] for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_url_collisions_surface_in_domain_stats(spark):
    # two docs, same source, doc_ids 100 apart -> same logical page;
    # different mess branches -> same canonical URL -> one dup
    df = spark.createDataFrame(
        [(7, "srcA"), (107, "srcA"), (8, "srcA")], "doc_id long, source string"
    )
    c = {r["doc_id"]: r["url"] for r in url_canonical(df).collect()}
    assert c[7] == c[107] and c[7] != c[8]
    row = domain_stats(df).collect()[0]
    assert (row["n_docs"], row["n_urls"], row["n_dup_docs"]) == (3, 2, 1)


def test_stream_url_dedup_matches_batch_replay_restart_compaction(spark, tmp_path):
    """The live URL-dedup twin: per-canonical-url min-doc-id state,
    min-merged — each batch's report must equal the batch url_dedup
    query over the union RESTRICTED to the batch's docs (in-doc_id-order
    delivery), and survive replay, restart, and mid-run compaction
    unchanged."""
    from pyspark.sql import Window

    from trend_o_meter_spark.llm.urls import url_canonical
    from trend_o_meter_spark.streaming.pipeline import stream_url_dedup

    # doc_ids 100 apart on the same source share a canonical URL
    docs = [(7, "srcA"), (8, "srcA"), (107, "srcA"), (9, "srcB"),
            (207, "srcA"), (108, "srcA"), (109, "srcB")]
    batches = [docs[:2], docs[2:4], docs[4:]]

    def mkdf(rs):
        return spark.createDataFrame(rs, "doc_id long, source string")

    def batch_answer(seen, ids):
        c = url_canonical(mkdf(seen)).select("doc_id", "url")
        w = Window.partitionBy("url")
        return sorted(
            map(tuple, c.select(
                "doc_id", "url",
                (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
            ).filter(F.col("doc_id").isin(ids)).collect())
        )

    results = {}
    per_batch = stream_url_dedup(
        state_path=str(tmp_path / "urls"),
        compact_every=2,  # fires ON batch 2 mid-run
        on_result=lambda bid, df: results.update(
            {bid: sorted(map(tuple, df.collect()))}
        ),
    )
    seen = []
    for i, chunk in enumerate(batches):
        seen += chunk
        per_batch(mkdf(chunk), i)
        want = batch_answer(seen, {r[0] for r in chunk})
        assert results[i] == want, i
    # batch 2 must contain real cross-batch drops: 207/108/109 collide
    # with earlier 7/8/9
    assert any(not keep for _, _, keep in results[2])

    # replay of the last batch: identical report, state self-overwrites
    per_batch(mkdf(batches[2]), 2)
    assert results[2] == want

    # restart from the same state path: next batch still exact
    per_batch2 = stream_url_dedup(
        state_path=str(tmp_path / "urls"),
        on_result=lambda bid, df: results.update(
            {bid: sorted(map(tuple, df.collect()))}
        ),
    )
    extra = [(307, "srcA"), (10, "srcB")]
    seen += extra
    per_batch2(mkdf(extra), 3)
    assert results[3] == batch_answer(seen, {307, 10})
