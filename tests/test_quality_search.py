"""Round-5 text additions: Gopher rules, winnowing fingerprints, phrase
search.  Winnowing gets the per-family property test (naive Python model
of Schleimer 2003 robust winnowing) plus the paper's sharing guarantee.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trend_o_meter_spark.llm.text import (
    gopher_rules,
    phrase_search,
    winnowing_fingerprints,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _winnow_model(tokens: list[str], k: int = 5, w: int = 4) -> set[tuple[int, int]]:
    """Naive robust winnowing: rightmost min of every w-window of k-gram
    hashes, deduplicated by position."""
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [_md5_int(g) for g in grams]
    out: set[tuple[int, int]] = set()
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        m = min(win)
        # rightmost occurrence of the min
        pos = i + max(j for j, h in enumerate(win) if h == m)
        out.add((pos, m))
    return out


# -- gopher rules -----------------------------------------------------------


def test_gopher_rules_flags(spark):
    docs = [
        (0, "the cats sat upon the mats with some hats " * 10),  # passes everything
        (1, "short doc"),  # too few words
        (2, "#### #### #### " * 3 + "the of and word " * 20),  # symbol-heavy
        (3, ("zz " * 60).strip()),  # mean word len < 3, no stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df, min_words=20).collect()}
    assert out[0]["keep"] is True
    assert out[1]["word_count_ok"] is False and out[1]["keep"] is False
    assert out[2]["symbol_ratio_ok"] is False and out[2]["keep"] is False
    assert out[3]["mean_word_len_ok"] is False
    assert out[3]["stopword_ok"] is False and out[3]["keep"] is False


def test_gopher_rules_null_text_drops(spark):
    df = spark.createDataFrame([(0, None), (1, "the of and " * 30)], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[0]["keep"] is False  # NULL text must not slip through
    assert out[1]["word_count_ok"] is True


# -- winnowing --------------------------------------------------------------

token_lists = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
    min_size=0,
    max_size=40,
)


@given(texts=st.lists(token_lists, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_winnowing_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(texts)],
        "doc_id long, text string",
    )
    got: dict[int, set[tuple[int, int]]] = {}
    for r in winnowing_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, toks in enumerate(texts):
        assert got.get(i, set()) == _winnow_model(toks)


def test_winnowing_sharing_guarantee(spark):
    """Two docs sharing a token run of length >= k + w - 1 (= 8) must
    share at least one fingerprint VALUE (the paper's core guarantee)."""
    shared = "one two three four five six seven eight"
    docs = [
        (0, "xx yy " + shared + " zz"),
        (1, "aa " + shared + " bb cc dd"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps: dict[int, set[int]] = {0: set(), 1: set()}
    for r in winnowing_fingerprints(df).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1]


def test_winnowing_short_doc_empty(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert winnowing_fingerprints(df).count() == 0


# -- phrase search ----------------------------------------------------------


def test_phrase_search_counts_and_order(spark):
    docs = [
        (0, "fast table scan and fast table merge"),  # 2 matches
        (1, "fast table"),  # 1 match
        (2, "table fast"),  # 0 — order matters
        (3, "fast table x fast table y fast table"),  # 3 matches
        (4, "fast tables"),  # 0 — whole-token match only
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = [(r["doc_id"], r["n_matches"]) for r in phrase_search(df, "fast table").collect()]
    assert rows == [(3, 3), (0, 2), (1, 1)]


def test_phrase_search_overlapping(spark):
    df = spark.createDataFrame([(0, "a a a a")], "doc_id long, text string")
    rows = phrase_search(df, "a a").collect()
    assert rows[0]["n_matches"] == 3  # overlapping starts all count


def test_phrase_search_tiebreak_and_top(spark):
    docs = [(i, "p q filler") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = phrase_search(df, "p q", top=10).collect()
    assert [r["doc_id"] for r in rows] == list(range(10))  # doc_id tiebreak


# -- winnow near-dup pairs --------------------------------------------------


def test_winnow_near_dup_finds_planted_overlap(spark):
    from trend_o_meter_spark.llm.text import winnow_near_dup_pairs

    shared = "one two three four five six seven eight nine ten eleven twelve"
    docs = [
        (0, "aa bb " + shared + " cc"),
        (1, "dd " + shared + " ee ff"),
        (2, "totally different words with no overlap at all here friend"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in
             winnow_near_dup_pairs(df, min_shared=1).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_winnow_near_dup_max_df_drops_boilerplate(spark):
    """A fingerprint shared by EVERY doc is boilerplate: with max_df it
    stops generating candidates, and pair counts can only shrink."""
    from trend_o_meter_spark.llm.text import winnow_near_dup_pairs

    boiler = "the same boilerplate header appears in every single document here"
    docs = [(i, boiler + f" unique{i} filler{i} words{i} more{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = winnow_near_dup_pairs(df, min_shared=1).count()
    capped = winnow_near_dup_pairs(df, min_shared=1, max_df=3).count()
    assert full == 15  # all C(6,2) pairs share the boilerplate run
    assert capped < full


def test_typo_pairs_finds_all_edit1_kinds_and_no_false_positives(spark):
    """Deletion-neighborhood blocking + exact verification: finds
    substitution, insertion, and deletion variants; excludes
    transpositions (distance 2) that share a deletion variant; the
    count asymmetry surfaces the rare spelling as the typo."""
    from trend_o_meter_spark.llm.text import typo_pairs

    docs = (
        [("receive data now",)] * 50
        + [("recieve data now",)] * 2      # transposition: distance 2, OUT
        + [("receives data now",)] * 3     # insertion: distance 1, IN
        + [("deceive data now",)] * 4      # substitution+? receive/deceive: r->d = 1, IN
        + [("eceive data now",)] * 1       # deletion: distance 1, IN
    )
    df = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(docs)], "doc_id long, text string"
    )
    got = {(r["w1"], r["w2"]): (r["n1"], r["n2"]) for r in typo_pairs(df).collect()}
    assert ("receive", "receives") in got
    assert ("deceive", "receive") in got
    assert ("eceive", "receive") in got
    # transposition shares deletion variants but is distance 2: cut
    assert ("receive", "recieve") not in got
    # counts carried for merge direction
    assert got[("eceive", "receive")] == (1, 50)
