"""LLM-pipeline operators: dedup recall, similarity sanity, hashing determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from trend_o_meter_spark.llm.dedup import (
    cross_doc_ngram_stats,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from trend_o_meter_spark.llm.similarity import cosine_topk, cosine, ivf_recall

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                     # exact dup of 0
        (2, BASE.replace("garden", "meadow")),         # near dup of 0
        (3, "completely different text about spark query engines and shuffles joins aggregates partitions executors"),
        (4, "  " + BASE.upper() + "  "),               # normalized dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalization(spark):
    out = exact_dedup(_docs(spark)).collect()
    by_hash = {r["content_hash"]: r for r in out}
    # 0, 1, 4 collapse (lower+trim+squash); 2 and 3 are distinct
    assert len(out) == 3
    dup = [r for r in out if r["dup_count"] == 3][0]
    assert dup["keep_id"] == 0


def test_cross_doc_ngram_stats_hand_computed(spark):
    """Three docs: A and B are word-identical (every gram shared), C is
    disjoint (no gram shared), D is too short for a 3-gram (omitted)."""
    rows = [
        (0, "alpha beta gamma delta"),   # grams: abg, bgd (shared with 1)
        (1, "alpha beta gamma delta"),
        (2, "one two three four"),       # grams: ott, ttf (unique)
        (3, "tiny doc"),                 # < 3 tokens -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cross_doc_ngram_stats(df).collect()}
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        assert out[d]["n_grams"] == 2
        assert out[d]["n_shared_grams"] == 2
        assert out[d]["dup_fraction"] == 1.0
    assert out[2]["n_grams"] == 2
    assert out[2]["n_shared_grams"] == 0
    assert out[2]["dup_fraction"] == 0.0


def test_ngram_novelty_hand_computed(spark):
    """Corpus-order novelty (round 10): a gram is 'seen' iff its FIRST
    occurrence is an EARLIER doc_id — the first carrier of a gram stays
    novel even when later docs repeat it; too-short docs emit nothing."""
    from trend_o_meter_spark.llm.dedup import ngram_novelty

    rows = [
        (0, "a b c d"),       # grams: "a b c", "b c d" -> all first here
        (1, "a b c x y"),     # "a b c" seen (doc 0); "b c x", "c x y" new
        (2, "a b c d"),       # both grams seen -> novelty 0
        (3, "a b"),           # < 3 tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["n_grams"], out[0]["n_seen"], out[0]["novelty"]) == (2, 0, 1.0)
    assert (out[1]["n_grams"], out[1]["n_seen"]) == (3, 1)
    assert out[1]["novelty"] == 2.0 / 3.0
    assert (out[2]["n_grams"], out[2]["n_seen"], out[2]["novelty"]) == (2, 2, 0.0)


def test_minhash_finds_near_dup_not_unrelated(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 1) in pairs and (0, 4) in pairs      # exact dups always collide
    assert (0, 2) in pairs                          # one-word change -> near dup
    assert not any(3 in p for p in pairs)           # unrelated never pairs


def test_minhash_bucket_cap_kills_degenerate_quadratic(spark):
    """An all-identical-docs corpus puts every doc in one band bucket per
    band — O(n^2) candidate pairs.  max_bucket drops over-cap buckets so
    the boilerplate slice produces ZERO pairs (exact_dedup's job), while
    a distinct small near-dup pair in its own bucket is still found."""
    boiler = [(i, BASE) for i in range(60)]
    other = "a totally separate corpus slice about databases " * 3
    pair = [(100, other), (101, other + " with one extra tail clause")]
    df = spark.createDataFrame(boiler + pair, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(df).collect()
    assert sum(1 for r in uncapped if r["id_a"] < 60 and r["id_b"] < 60) == 60 * 59 // 2

    capped = minhash_lsh_pairs(df, max_bucket=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert not any(a < 60 and b < 60 for a, b in got)  # mega-bucket dropped
    assert (100, 101) in got  # small buckets untouched


def test_embedding_near_dup_bucket_cap(spark):
    from trend_o_meter_spark.llm.similarity import embedding_near_dup

    # 40 identical vectors in one sign bucket + a small near-dup pair in
    # another orthant
    dim = 64
    same = [1.0] * dim
    neg = [-1.0] * dim
    rows = [(i, same) for i in range(40)] + [(100, neg), (101, [v * 0.99 for v in neg])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = embedding_near_dup(df, threshold=0.9).collect()
    assert sum(1 for r in uncapped if r["id_a"] < 40) == 40 * 39 // 2
    capped = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(df, threshold=0.9, max_bucket=5).collect()}
    assert capped == {(100, 101)}


def test_minhash_signature_deterministic(spark):
    s1 = {r["id"]: r["sig"] for r in minhash_signatures(_docs(spark)).collect()}
    s2 = {r["id"]: r["sig"] for r in minhash_signatures(_docs(spark)).collect()}
    assert s1 == s2
    assert s1[0] == s1[1] == s1[4]
    assert s1[0] != s1[3]


def test_ngram_jaccard_scores(spark):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(_docs(spark), threshold=0.1).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert (0, 3) not in out


def test_ngram_jaccard_max_df_noop_when_under_cap(spark):
    # Exactness contract: with every shingle's document frequency <= cap,
    # the capped output is byte-identical to the uncapped one.
    docs = _docs(spark)
    uncapped = sorted(map(tuple, ngram_jaccard_pairs(docs, threshold=0.1).collect()))
    capped = sorted(
        map(tuple, ngram_jaccard_pairs(docs, threshold=0.1, max_df=10_000).collect())
    )
    assert capped == uncapped


def _hot_shingle_corpus(spark, n=120):
    # Every doc shares ONE boilerplate 3-shingle ("spam spam spam"); all
    # other shingles are doc-unique except a planted near-dup pair.
    rows = [(i, f"spam spam spam w{i}a w{i}b w{i}c") for i in range(n)]
    rows.append((1000, "spam spam spam alpha beta gamma delta"))
    rows.append((1001, "spam spam spam alpha beta gamma delta"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_max_df_bounds_hot_shingle(spark):
    docs = _hot_shingle_corpus(spark)
    # Uncapped, threshold=0: the universal shingle alone creates a
    # candidate pair for EVERY doc pair — the O(df^2) failure mode.
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0).count()
    assert uncapped == 122 * 121 // 2
    # Capped at df<=5: the df=122 boilerplate shingle is dropped from
    # candidate generation, so only the planted pair (sharing df=2
    # shingles) survives — candidate volume is O(df*cap), not O(df^2).
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_df=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(1000, 1001)}
    # And the reported score is the exact lower bound: numerator drops the
    # boilerplate shingle, denominator keeps the true (uncapped) set sizes.
    # Docs 1000/1001 have 5 shingles each, 5 shared, 4 kept after the cap:
    # 4 / (5 + 5 - 4) = 2/3 <= true jaccard 1.0.
    (pair,) = capped
    assert pair["shared"] == 4
    assert abs(pair["jaccard"] - 4 / 6) < 1e-12


def test_ngram_jaccard_max_df_sql_twin(spark, tmp_path):
    import duckdb

    from trend_o_meter_spark.llm.dedup import ngram_jaccard_pairs_sql

    docs = _hot_shingle_corpus(spark)
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    got = con.execute(
        ngram_jaccard_pairs_sql("docs", threshold=0.0, max_df=5)
    ).fetchall()
    spark_rows = [
        (r["id_a"], r["id_b"], r["shared"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_df=5).collect()
    ]
    assert sorted(got) == sorted(spark_rows)


def test_simhash_locality(spark):
    out = {r["id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    assert out[0] == out[1] == out[4]
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[3]).count("1")
    assert ham_near < ham_far


def test_cosine_topk_nearest_is_most_similar(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, n_queries=1, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos_sim"] > 0.99
    assert out[-1]["cos_sim"] == -1.0


def test_ivf_recall_full_probe_is_perfect(spark):
    """Probing every cell makes IVF exhaustive -> recall exactly 1.0 per
    query; probing 1 of 8 cells on random vectors loses some neighbors."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = ivf_recall(df, n_queries=3, k=5, n_centroids=8, n_probe=8).collect()
    assert len(full) == 3
    assert all(r["recall"] == 1.0 and r["n_hit"] == r["n_exact"] == 5 for r in full)
    probed = ivf_recall(df, n_queries=3, k=5, n_centroids=8, n_probe=1).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in probed)
    assert any(r["recall"] < 1.0 for r in probed)


def test_pii_scrub_counts_and_redacts(spark):
    from trend_o_meter_spark.llm.text import pii_scrub

    rows = [
        (0, "contact alice@example.com or bob@mail.co today"),
        (1, "server at 10.0.0.1 and backup 192.168.1.254 up"),
        (2, "call 555-867-5309 or 555 123 4567 now"),
        (3, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ip"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (0, 2, 0)
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 2)
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)
    # redaction changes the hash iff something matched
    import hashlib

    assert out[3]["clean_hash"] == hashlib.md5(rows[3][1].encode()).hexdigest()
    assert out[0]["clean_hash"] == hashlib.md5(
        b"contact [EMAIL] or [EMAIL] today"
    ).hexdigest()


def test_repetition_stats_boilerplate_signal(spark):
    from trend_o_meter_spark.llm.text import repetition_stats

    loop = "buy now " * 20  # 40 tokens, heavy 3-gram repetition
    df = spark.createDataFrame(
        [(0, loop), (1, BASE), (2, "only two")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[0]["dup_ratio"] > 0.9          # boilerplate flagged
    assert out[1]["dup_ratio"] < 0.1          # natural text mostly unique
    assert out[2]["n_grams"] == 0 and out[2]["dup_ratio"] == 0.0


def test_pack_sequences_model(spark):
    from trend_o_meter_spark.llm.text import pack_sequences

    # 10 docs x 7 tokens in one shard, budget 20: cut points every 20 tokens
    rows = [(i, "en", "t " * 7) for i in range(10)]
    df = spark.createDataFrame(
        [(i, lang, t.strip()) for i, lang, t in rows], "doc_id long, lang string, text string"
    )
    out = sorted(pack_sequences(df, token_budget=20).collect(), key=lambda r: r["doc_id"])
    cum = 0
    for r in out:
        assert r["n_tokens"] == 7
        assert r["chunk_id"] == cum // 20
        assert r["offset_in_chunk"] == cum % 20
        cum += 7
    # every chunk holds <= ceil(budget/tok)+1 docs and ids are contiguous
    by_chunk = {}
    for r in out:
        by_chunk.setdefault(r["chunk_id"], []).append(r["doc_id"])
    for ids in by_chunk.values():
        assert ids == list(range(min(ids), max(ids) + 1))


def test_contamination_check_finds_planted_overlap(spark):
    from trend_o_meter_spark.llm.dedup import contamination_check

    bench_text = "the held out benchmark question about spark shuffles and joins"
    corpus = spark.createDataFrame(
        [
            (0, "prefix words then " + bench_text + " trailing contamination"),
            (1, "totally unrelated corpus document about cooking pasta dishes tonight"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    out = contamination_check(corpus, bench, shingle_n=5).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in out} == {(0, 100)}
    hit = out[0]
    assert hit["n_shared"] >= 5 and hit["bench_coverage"] > 0.8


def test_connected_components_transitive_chain(spark):
    from trend_o_meter_spark.llm.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3 (transitive, no 0-3 edge), pair 5-6, singleton 4
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}


def test_star_components_path_graph_1000_nodes(spark):
    # Large-star/small-star must collapse a 1000-node path (diameter 999 —
    # label propagation would need 999 rounds) in O(log^2 n) rounds.
    from trend_o_meter_spark.llm.cluster import connected_components

    n = 1000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = connected_components(nodes, edges, algorithm="star").collect()
    assert len(out) == n
    assert all(r["cluster_id"] == 0 for r in out)


def test_star_matches_label_propagation(spark):
    # Same graph, both algorithms, identical labels — including multiple
    # components, a singleton, and duplicate/reversed edges.
    from trend_o_meter_spark.llm.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (5, 6), (6, 5), (7, 8), (8, 9), (9, 10)],
        "id_a long, id_b long",
    )
    lab = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges, algorithm="label").collect()}
    star = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges, algorithm="star").collect()}
    assert lab == star
    assert star[4] == 4 and star[11] == 11  # singletons label themselves


def test_auto_falls_back_to_star_past_max_iter(spark):
    # A 40-node path with max_iter=3: label propagation cannot converge,
    # auto must hand off to star instead of raising.
    import pytest

    from trend_o_meter_spark.llm.cluster import connected_components

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = connected_components(nodes, edges, max_iter=3).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=3, algorithm="label")


def test_checkpoint_dir_cuts_lineage_same_result(spark, tmp_path):
    # Reliable checkpoint: results identical to the localCheckpoint path,
    # lineage actually truncated (logical plan bottoms out at a scan of
    # checkpointed data, not the original joins), files on disk.
    import os

    from trend_o_meter_spark.llm.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    ckpt = str(tmp_path / "ckpt")
    out_local = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    out_ckpt_df = connected_components(nodes, edges, checkpoint_dir=ckpt)
    out_ckpt = {r["id"]: r["cluster_id"] for r in out_ckpt_df.collect()}
    assert out_local == out_ckpt
    assert any(files for _, _, files in os.walk(ckpt)), "no checkpoint files written"
    plan = out_ckpt_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan  # lineage cut


def test_kmeans_checkpoint_dir_same_centroids(spark, tmp_path):
    import os

    from trend_o_meter_spark.llm.similarity import kmeans_centroids

    df = spark.createDataFrame(
        [(i, [float(i % 3) * 10 + d for d in range(4)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    plain = sorted(map(tuple, kmeans_centroids(df, k=3, iters=2).collect()))
    ckpt = str(tmp_path / "kmeans_ckpt")
    with_ckpt = sorted(map(tuple, kmeans_centroids(df, k=3, iters=2, checkpoint_dir=ckpt).collect()))
    assert plain == with_ckpt
    assert any(files for _, _, files in os.walk(ckpt)), "no checkpoint files written"


def test_dedup_clusters_keep_is_min_id(spark):
    from trend_o_meter_spark.llm.cluster import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [
            (10, base),
            (11, base + " extra"),   # near-dup of 10
            (12, base + " extras"),  # near-dup of 11 (and transitively 10)
            (20, "completely different text about database query optimizers at scale"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(df, threshold=0.3).collect()}
    assert rows[10]["keep"] and rows[20]["keep"]
    assert not rows[11]["keep"] and rows[11]["cluster_id"] == 10
    assert not rows[12]["keep"] and rows[12]["cluster_id"] == 10


def test_chunk_documents_cover_and_overlap(spark):
    from trend_o_meter_spark.llm.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    doc1 = sorted((r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_id"])
    # n=10, C=4, stride=2 -> n_chunks = ceil(6/2)+1 = 4
    assert [r["n_chunks"] for r in doc1] == [4, 4, 4, 4]
    assert doc1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert doc1[1]["chunk_text"] == "w2 w3 w4 w5"   # 2-token overlap
    assert doc1[3]["chunk_text"] == "w6 w7 w8 w9"   # tail covered
    assert all(r["chunk_len"] == 4 for r in doc1)
    doc2 = [r for r in out if r["doc_id"] == 2]
    assert len(doc2) == 1 and doc2[0]["chunk_text"] == "short doc" and doc2[0]["chunk_len"] == 2


def test_balanced_sample_deterministic_and_capped(spark):
    from trend_o_meter_spark.llm.text import balanced_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(60)], "doc_id long, lang string"
    )
    a = sorted(map(tuple, balanced_sample(df, k=5).collect()))
    b = sorted(map(tuple, balanced_sample(df, k=5).collect()))
    assert a == b  # reproducible, not rand()
    by_lang = {}
    for lang, _, rank in a:
        by_lang.setdefault(lang, []).append(rank)
    assert all(sorted(v) == list(range(1, 6)) for v in by_lang.values())


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from trend_o_meter_spark.llm.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    s1, q1 = rows[1]["scale"], rows[1]["qvec"]
    assert q1[0] == 127 and q1[1] == -63  # -63.5 + 0.5 -> floor = -63
    # dequantized error bounded by half a step
    for orig, q in zip([1.0, -0.5, 0.25, 0.0], q1):
        assert abs(q * s1 - orig) <= s1 / 2 + 1e-9
    assert rows[2]["scale"] == 0.0 and rows[2]["qvec"] == [0, 0, 0, 0]


def test_epoch_shuffle_dense_deterministic_permutation(spark):
    from trend_o_meter_spark.llm.text import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r["doc_id"]: r["position"] for r in epoch_shuffle(df, salt="e0").collect()}
    b = {r["doc_id"]: r["position"] for r in epoch_shuffle(df, salt="e0").collect()}
    c = {r["doc_id"]: r["position"] for r in epoch_shuffle(df, salt="e1").collect()}
    assert a == b                                  # reproducible
    assert sorted(a.values()) == list(range(200))  # dense 0..N-1
    assert a != c                                  # new salt, new order
    assert sorted(c.values()) == list(range(200))


def test_bm25_ranks_planted_relevant_doc_first(spark):
    from trend_o_meter_spark.llm.text import bm25_search

    docs = [(0, "spark shuffle join optimizer spark join"),
            (1, "spark mentioned once among many many other other words words here"),
            (2, "cooking pasta with tomatoes and basil tonight")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_search(df, "spark join", k=3).collect()
    assert [r["doc_id"] for r in out][0] == 0
    assert {r["doc_id"] for r in out} == {0, 1}  # doc 2 matches no term
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_mixture_sample_rates_and_determinism(spark):
    from trend_o_meter_spark.llm.text import mixture_sample

    rows = [(i, "keep_all" if i % 2 else "drop_all") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"keep_all": 1.0, "drop_all": 0.0}
    out = mixture_sample(df, weights=w, default_rate=0.5)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [i for i in range(400) if i % 2]          # exact rates at 0/1
    assert got == sorted(r["doc_id"] for r in mixture_sample(df, weights=w).collect())
    # default_rate applies to unknown groups, roughly proportional
    df2 = spark.createDataFrame([(i, "unknown") for i in range(1000)], "doc_id long, source string")
    frac = mixture_sample(df2, weights=w, default_rate=0.3).count() / 1000
    assert 0.2 < frac < 0.4


def test_kmeans_separates_blobs(spark):
    from trend_o_meter_spark.llm.similarity import kmeans_centroids

    # two tight blobs; seeds 0 and 1 start one in each blob
    blob_a = [[1.0, 1.0], [1.1, 0.9], [0.9, 1.1], [1.0, 0.9]]
    blob_b = [[-1.0, -1.0], [-1.1, -0.9], [-0.9, -1.1], [-1.0, -0.9]]
    rows = [(0, blob_a[0]), (1, blob_b[0])] + [
        (i + 2, v) for i, v in enumerate(blob_a[1:] + blob_b[1:])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["cluster"]: r for r in kmeans_centroids(df, k=2, iters=3).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_members"] == 4 and out[1]["n_members"] == 4
    assert out[0]["centroid"][0] > 0.8 and out[1]["centroid"][0] < -0.8


def test_kmeans_feeds_ivf_assign(spark):
    from trend_o_meter_spark.llm.similarity import ivf_assign, kmeans_centroids
    from pyspark.sql import functions as SF

    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])] + [
        (i + 2, [1.0 + 0.01 * i, 0.05]) for i in range(5)
    ] + [(i + 10, [-1.0 - 0.01 * i, -0.05]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    trained = kmeans_centroids(df, k=2, iters=2).select(
        "cluster", SF.col("centroid").alias("cvec")
    )
    out = {r["vec_id"]: r["cluster"] for r in ivf_assign(df, centroids=trained).collect()}
    pos = {v for k, v in out.items() if k in {0, *range(2, 7)}}
    neg = {v for k, v in out.items() if k in {1, *range(10, 15)}}
    assert len(pos) == 1 and len(neg) == 1 and pos != neg


def test_chunk_documents_reconstructs_document(spark):
    """Property over varied lengths: stripping each chunk's overlap prefix
    (except the first) and concatenating reconstructs the token stream —
    i.e. chunks cover everything exactly once beyond the overlap."""
    from trend_o_meter_spark.llm.text import chunk_documents

    C, O = 16, 4
    stride = C - O
    docs = [(n, " ".join(f"t{n}_{i}" for i in range(n))) for n in (1, 15, 16, 17, 40, 100, 101)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=C, overlap=O).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, _text in docs:
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_id"])
        rebuilt = []
        for j, r in enumerate(chunks):
            toks = r["chunk_text"].split(" ")
            start = r["chunk_id"] * stride  # 0-based token offset
            keep_from = 0 if j == 0 else (len(rebuilt) - start)
            rebuilt.extend(toks[keep_from:])
        assert rebuilt == [f"t{n}_{i}" for i in range(n)], n


def test_distinctive_terms_log_lift(spark):
    import math

    import pytest

    from trend_o_meter_spark.llm.text import distinctive_terms

    rows = [
        (1, "apple apple banana", "srcA"),
        (2, "banana cherry cherry", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = distinctive_terms(df, k=2).collect()
    top = {r["source"]: r for r in out if r["rank"] == 1}
    # the over-represented token wins each source
    assert top["srcA"]["token"] == "apple" and top["srcB"]["token"] == "cherry"
    # add-0.5-smoothed log-lift, hand-computed: ln(2.5/4.5) - ln(2.5/7.5)
    expect = math.log(2.5 / 4.5) - math.log(2.5 / 7.5)
    assert top["srcA"]["score"] == pytest.approx(expect, abs=1e-6)
    assert top["srcA"]["n_in_source"] == 2 and top["srcA"]["n_corpus"] == 2
    # shared token scores below the distinctive one everywhere
    banana = {r["source"]: r["score"] for r in out if r["token"] == "banana"}
    assert all(banana[s] < top[s]["score"] for s in ("srcA", "srcB"))


def test_lm_bigram_score_hand_computed(spark):
    import math

    import pytest

    from trend_o_meter_spark.llm.text import lm_bigram_score

    rows = [
        (1, "a b a b", None),   # bigrams: (a,b) x2, (b,a) x1
        (2, "a b", None),
        (3, "x", None),         # too short -> 0 bigrams, NULL score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in lm_bigram_score(df, smoothing=0.5).collect()}

    # corpus bigrams: (a,b)=3, (b,a)=1; left counts: a->3, b->1; V=3
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)   # P(b|a)
    p_ba = (1 + 0.5) / (1 + 0.5 * 3)   # P(a|b)
    lp_ab = round(math.log(p_ab), 6)   # operator quantizes log-probs at 1e-6
    lp_ba = round(math.log(p_ba), 6)

    assert out[1]["n_bigrams"] == 3
    assert out[1]["lm_score"] == pytest.approx((2 * lp_ab + lp_ba) / 3, abs=1e-9)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["lm_score"] == pytest.approx(lp_ab, abs=1e-9)
    assert out[3]["n_bigrams"] == 0 and out[3]["lm_score"] is None


def test_lm_bigram_score_external_model_unseen(spark):
    import math

    import pytest

    from trend_o_meter_spark.llm.text import lm_bigram_score

    model = spark.createDataFrame(
        [(10, "a b a b", None)], "doc_id long, text string, source string"
    )
    # "a z": context 'a' seen (c_left=2), bigram unseen; "z q": context unseen
    target = spark.createDataFrame(
        [(1, "a z q", None)], "doc_id long, text string, source string"
    )
    out = {r["doc_id"]: r for r in lm_bigram_score(target, model_df=model, smoothing=0.5).collect()}
    # model: bigrams (a,b)=2, (b,a)=1; lefts a->2, b->1; V=2 (a, b)
    lp_az = round(math.log(0.5 / (2 + 0.5 * 2)), 6)  # unseen bigram, seen ctx
    lp_zq = round(math.log(0.5 / (0 + 0.5 * 2)), 6)  # unseen context
    assert out[1]["n_bigrams"] == 2
    assert out[1]["lm_score"] == pytest.approx((lp_az + lp_zq) / 2, abs=1e-9)


def test_embedding_outliers_flags_far_vector(spark):
    from trend_o_meter_spark.llm.similarity import embedding_outliers

    # one tight blob around (1,1) plus a single far-away member; k=1 keeps
    # everything in one cluster so the far point must z-score against the blob
    # (with k>=2, k-means isolates it into a singleton whose z is NULL — also
    # correct, but not what this test pins)
    blob = [[1.0, 1.0], [1.05, 0.95], [0.95, 1.05], [1.0, 0.95], [1.02, 1.0],
            [0.98, 1.03], [1.01, 0.97], [0.99, 1.0]]
    rows = [(i, v) for i, v in enumerate(blob)] + [(99, [4.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_outliers(df, k=1, iters=2, z_threshold=2.0).collect()}
    assert len(out) == 9
    flagged = {i for i, r in out.items() if r["is_outlier"]}
    assert flagged == {99}        # the planted outlier and nothing else
    assert out[99]["z_score"] > 2.0
    # singleton clusters (k=2 isolates the far point) degrade to NULL z
    out2 = {r["vec_id"]: r for r in embedding_outliers(df, k=2, iters=2, z_threshold=2.0).collect()}
    assert out2[99]["z_score"] is None and not out2[99]["is_outlier"]


def test_curation_decisions_precedence(spark):
    from trend_o_meter_spark.llm.text import curation_decisions

    long_ok = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, long_ok, "web"),                          # passes every gate
        (2, "tiny", "web"),                           # quality: too_short
        (3, ("spam ham " * 10) + "the a of is to in", "web"),  # repetitive
        (4, "der die und ist das " * 4, "web"),       # wrong_lang (no en stopwords -> may
                                                      # hit no_stopwords first: quality wins)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in curation_decisions(
        df, max_dup_ratio=0.5, lm_threshold=-99.0, min_tokens=5
    ).collect()}
    assert out[1]["keep"] and out[1]["reject_reason"] is None
    assert out[2]["reject_reason"] == "too_short"
    assert out[3]["reject_reason"] == "repetitive" and not out[3]["keep"]
    # precedence: the quality gate fires before the language gate
    assert out[4]["reject_reason"] in ("no_stopwords", "wrong_lang")
    assert not out[4]["keep"]
    # signals are carried through for audit
    assert out[3]["dup_ratio"] > 0.5 and out[1]["lang_guess"] == "en"


def test_canonical_docs_keeps_longest(spark):
    from trend_o_meter_spark.llm.cluster import canonical_docs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = {
        10: base,
        11: base + " extra",    # near-dup of 10
        12: base + " extras",   # near-dup of 11; LONGEST member of the cluster
        20: "completely different text about database query optimizers at scale",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = {r["doc_id"]: r for r in canonical_docs(df, threshold=0.3).collect()}

    # same clustering as test_dedup_clusters_keep_is_min_id, but the
    # survivor is the longest member (12), not the min id (10)
    assert rows[12]["keep"] and not rows[10]["keep"] and not rows[11]["keep"]
    assert rows[10]["cluster_id"] == 10  # cluster label still min-id
    assert rows[20]["keep"]
    # invariant over every cluster: exactly one survivor = argmax(len, id asc)
    by_cluster = {}
    for i, r in rows.items():
        by_cluster.setdefault(r["cluster_id"], []).append(i)
    for cid, members in by_cluster.items():
        kept = [i for i in members if rows[i]["keep"]]
        best = min(members, key=lambda i: (-len(texts[i]), i))
        assert kept == [best]
        assert all(rows[i]["n_chars_kept"] == len(texts[best]) for i in members)


def test_token_budget_sample_greedy_prefix(spark):
    from trend_o_meter_spark.llm.text import token_budget_sample

    rows = [(i, "w " * 10, "a") for i in range(10)] + [(100, "w " * 10, "b")]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = token_budget_sample(df, budget_tokens=35).collect()
    a = sorted((r for r in out if r["source"] == "a"), key=lambda r: r["cum_tokens"])
    # 10-token docs against a 35-token budget: exactly 3 kept, prefix order
    assert [r["keep"] for r in a] == [True] * 3 + [False] * 7
    assert [r["cum_tokens"] for r in a] == [10 * (i + 1) for i in range(10)]
    # per-source budgets override the default
    out2 = {
        (r["source"], r["doc_id"]): r
        for r in token_budget_sample(df, budget_tokens=35, budgets={"b": 5}).collect()
    }
    assert not out2[("b", 100)]["keep"]  # 10 tokens > budget 5
    # determinism: same salt = same kept set; different salt = (likely) different
    k1 = {r["doc_id"] for r in token_budget_sample(df, budget_tokens=35).collect() if r["keep"]}
    k2 = {r["doc_id"] for r in token_budget_sample(df, budget_tokens=35).collect() if r["keep"]}
    assert k1 == k2


def test_tfidf_cosine_pairs_hand_computed(spark):
    import math

    import pytest

    from trend_o_meter_spark.llm.dedup import tfidf_cosine_pairs

    # 4 docs; "rare" appears in docs 1,2 only; "common" in all (df-capped
    # away at max_df_ratio=0.6: df 4 > 2.4)
    rows = [
        (1, "rare alpha common"),
        (2, "rare beta common"),
        (3, "gamma delta common"),
        (4, "epsilon zeta common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r
           for r in tfidf_cosine_pairs(df, max_df_ratio=0.6, threshold=0.01).collect()}
    # only (1,2) share a surviving term
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r["shared_terms"] == 1
    # every surviving term has df<=2 over N=4: idf values ln(4/2) or ln(4/1)
    idf_rare = round(math.log(4 / 2), 6)
    idf_uni = round(math.log(4 / 1), 6)
    # doc1 vector: rare=idf_rare, alpha=idf_uni; doc2 symmetric
    dot = idf_rare * idf_rare
    nrm = math.sqrt(idf_rare**2 + idf_uni**2)
    assert r["cosine"] == pytest.approx(dot / (nrm * nrm), abs=1e-8)


def test_cooc_pmi_window_semantics(spark):
    """Pairs are (w1, w2-within-window-AFTER); PMI from pair-table
    marginals, hand-checked on a 4-token doc."""
    import math

    import pytest as _pytest

    from trend_o_meter_spark.llm.text import cooc_pmi_topk

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    rows = {
        (r["w1"], r["w2"]): r
        for r in cooc_pmi_topk(df, window=2, min_count=1, k=100).collect()
    }
    # window=2 over [a b c d]: (a,b) (a,c) (b,c) (b,d) (c,d) — each once
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")}
    assert all(r["n_pair"] == 1 for r in rows.values())
    # T=5; (a,b): c_left(a)=2, c_right(b)=1 -> pmi = ln(1*5/(2*1))
    assert rows[("a", "b")]["pmi"] == _pytest.approx(round(math.log(5 / 2), 6))
    # (c,d): c_left(c)=1, c_right(d)=2 -> ln(5/2); (b,c): 2*2 -> ln(5/4)
    assert rows[("b", "c")]["pmi"] == _pytest.approx(round(math.log(5 / 4), 6))
    # ranks are dense 1..5, ordered by pmi desc then pair
    assert sorted(r["rank"] for r in rows.values()) == [1, 2, 3, 4, 5]


def test_curation_funnel_monotone_and_attributed(spark):
    """Funnel counts are monotone non-increasing and each stage actually
    bites on a corpus built to trigger it: a too-short doc (quality), an
    exact dup, a near dup, and a token budget that crops the tail."""
    from trend_o_meter_spark.llm.funnel import curation_funnel

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing outside in the garden"
    )
    rows = [
        (1, base, "web"),
        (2, base, "web"),                      # exact dup -> exact_dedup stage
        (3, base + " extra tail words", "web"),  # near dup -> near_dedup stage
        (4, "too short", "web"),               # quality reject
        (5, base.replace("fox", "owl").replace("dog", "hen"), "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation_funnel(df, budget_tokens=30).collect()
    stages = [(r["stage"], r["n_docs"]) for r in out]
    names = [s for s, _ in stages]
    counts = [n for _, n in stages]
    assert names == ["total", "quality", "exact_dedup", "near_dedup", "token_budget"]
    assert counts[0] == 5
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # monotone
    assert counts[1] == 4          # quality drops doc 4
    assert counts[2] == 3          # exact dedup drops doc 2
    assert counts[3] <= counts[2]  # near-dup collapses 1/3 cluster
    assert counts[4] < counts[3]   # 30-token budget crops the tail


def test_dup_span_longest_run_hand_computed(spark):
    """Doc 0 embeds a verbatim 6-token quote from doc 1 inside otherwise
    original text: longest run = 4 shingles (6 tokens - 2), while its
    overall dup fraction stays low."""
    from trend_o_meter_spark.llm.dedup import dup_span_stats

    quote = "to be or not to be"
    rows = [
        (0, "my original essay argues " + quote + " remains the famous question ever"),
        (1, quote + " that is the question"),
        (2, "entirely unrelated content about distributed query execution engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_stats(df).collect()}
    # the 6-token quote yields 4 consecutive shared 3-gram positions in both docs
    assert out[0]["longest_dup_run"] == 4
    assert out[1]["longest_dup_run"] == 4
    assert out[2]["longest_dup_run"] == 0 and out[2]["n_shared_grams"] == 0
    # doc 0 has 15 tokens -> 13 grams, only the quote's 4 shared
    assert out[0]["n_grams"] == 13 and out[0]["n_shared_grams"] == 4


def test_cross_corpus_lsh_only_cross_pairs(spark):
    """New x ref collisions only: two near-identical docs INSIDE the new
    corpus must not pair; a new doc matching a ref doc must."""
    from trend_o_meter_spark.llm.dedup import cross_corpus_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    new = spark.createDataFrame(
        [(100, base), (101, base + " tail"), (102, "unrelated new page about kernels and drivers")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1, base), (2, "existing training document about optimizers and planners")],
        "doc_id long, text string",
    )
    got = {(r["new_id"], r["ref_id"]) for r in cross_corpus_lsh_pairs(new, ref).collect()}
    assert (100, 1) in got and (101, 1) in got    # new dups of the training set
    assert not any(a in (100, 101, 102) and b in (100, 101, 102) for a, b in got)
    assert not any(a in (1, 2) for a, _ in got)   # ref never appears as new side


def test_pq_codes_subspaces_quantize_independently(spark):
    """PQ: identical vectors share codes; a vector whose two HALVES match
    different training exemplars gets each half's code independently —
    the property that makes the m-subspace decomposition a product."""
    from trend_o_meter_spark.llm.similarity import pq_codes

    a = [0.0, 0.0, 100.0, 100.0]   # id 0 -> subspace codebooks see these
    b = [50.0, 50.0, -40.0, -40.0]  # id 1
    rows = [
        (0, a),
        (1, b),
        (2, a),                      # exact copy of 0 -> same codes
        (3, [0.1, -0.1, -39.9, -40.2]),  # half like a, half like b
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: list(r["codes"]) for r in pq_codes(df, m=2, k=2, iters=2).collect()}
    assert all(len(c) == 2 for c in out.values())
    assert out[0] == out[2]              # identical vectors, identical codes
    assert out[3][0] == out[0][0]        # first half quantizes like a
    assert out[3][1] == out[1][1]        # second half quantizes like b
    assert out[0] != out[1]


def test_pq_codes_non_divisible_dim_pads_not_truncates(spark):
    """dim=17, m=4: the subspace grid is ceil(17/4)=5 wide with 3 pad
    zeros — the 17th dimension is QUANTIZED (old floor() behavior dropped
    it), and the DuckDB oracle twin pads identically."""
    import duckdb
    import pandas as pd

    from trend_o_meter_spark.llm.similarity import pq_codes, pq_codes_sql

    # two groups identical in dims 0..15, differing ONLY in dim 16 — the
    # tail a truncating floor(17/4)*4 = 16 split would silently discard
    shared = [1.0] * 16
    rows = [(i, shared + [0.0 if i % 2 == 0 else 90.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: list(r["codes"]) for r in pq_codes(df, m=4, k=2, iters=2).collect()}
    assert all(len(c) == 4 for c in out.values())
    # tail signal preserved: groups separate in the LAST subspace
    assert out[0][3] != out[1][3]
    assert out[0] == out[2] == out[4] and out[1] == out[3] == out[5]

    # oracle twin: identical padding, identical codes
    vecs = pd.DataFrame(
        {"vec_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
    )
    con = duckdb.connect()
    con.register("vecs", vecs)
    got = con.execute(pq_codes_sql("vecs", m=4, k=2, iters=2)).fetchall()
    assert {vid: list(codes) for vid, codes in got} == out


def test_pq_adc_retrieves_own_cluster(spark):
    """ADC search on well-separated clusters: a query's top neighbors are
    the members of its own cluster (approximate distance preserves
    coarse geometry), and ADC distance to them is smaller than to any
    cross-cluster vector."""
    from trend_o_meter_spark.llm.similarity import pq_adc_topk

    # ids 0/1 near the origin-cluster, ids 10-14 far cluster; queries are
    # ids < 2 (both in the near cluster along with ids 2-4)
    near = [[float(j % 3), 1.0, 0.0, -1.0] for j in range(5)]
    far = [[100.0 + j, -50.0, 80.0, 60.0] for j in range(5)]
    rows = [(i, v) for i, v in enumerate(near)] + [(10 + j, v) for j, v in enumerate(far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_adc_topk(df, m=2, k=4, iters=2, n_queries=2, topk=9).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        near_ids = {i for i in range(5) if i != q}
        # the 4 nearest by ADC are exactly the same-cluster members
        assert {r["neighbor_id"] for r in rs[:4]} == near_ids
        assert max(r["adc_dist"] for r in rs[:4]) < min(r["adc_dist"] for r in rs[4:])


def test_split_drift_ks_model_and_extremes(spark):
    """KS = 0 when every doc has the same token count; otherwise matches
    a hand-rolled ECDF model computed from the same split assignment."""
    from trend_o_meter_spark.llm.text import dataset_split, split_drift_ks

    same = [(i, "one two three four five") for i in range(40)]
    df_same = spark.createDataFrame(same, "doc_id long, text string")
    r = split_drift_ks(df_same).collect()[0]
    assert r["ks_stat"] == 0.0
    assert r["n_a"] + r["n_b"] <= 40  # train+val only, test excluded

    rows = [(i, "w " * (2 + 3 * (i % 7))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = split_drift_ks(df).collect()[0]
    splits = {x["doc_id"]: x["split"] for x in dataset_split(df).collect()}
    a = sorted(2 + 3 * (i % 7) for i, _ in rows if splits[i] == "train")
    b = sorted(2 + 3 * (i % 7) for i, _ in rows if splits[i] == "val")
    vals = sorted(set(a) | set(b))
    best = max(
        abs(sum(1 for x in a if x <= v) * len(b) - sum(1 for x in b if x <= v) * len(a))
        for v in vals
    )
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["ks_stat"] == best / (len(a) * len(b))
    assert 0.0 <= got["ks_stat"] <= 1.0


def test_split_drift_ks_empty_split_is_explicit_null(spark):
    """Empty-split contract: KS vs a split no document lands in is
    NULL (never NaN), so a `ks_stat < t` QA gate fails closed."""
    import math

    from trend_o_meter_spark.llm.text import split_drift_ks

    rows = [(i, "w " * (2 + (i % 5))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = split_drift_ks(df, split_b="no-such-split").collect()[0]
    assert r["n_b"] == 0 and r["n_a"] > 0
    assert r["ks_stat"] is None  # explicit NULL, not NaN
    assert not (r["ks_stat"] is not None and math.isnan(r["ks_stat"]))


def test_split_drift_psi_matches_model_and_contracts(spark):
    """PSI per-bin terms and total match a naive Python model computed
    from the same split assignment; identical distributions give PSI 0;
    an empty split reports explicit NULL (fail-closed gate)."""
    import math

    from trend_o_meter_spark.llm.text import dataset_split, split_drift_psi

    same = [(i, "one two three four five") for i in range(40)]
    df_same = spark.createDataFrame(same, "doc_id long, text string")
    for r in split_drift_psi(df_same).collect():
        assert r["psi_total"] == 0.0 and r["psi_term"] == 0.0

    rows = [(i, "w " * (2 + 37 * (i % 5))) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["bin_lo"]: r for r in split_drift_psi(df, bin_width=32).collect()}
    splits = {x["doc_id"]: x["split"] for x in dataset_split(df).collect()}
    toks = {i: 2 + 37 * (i % 5) for i, _ in rows}
    a = [toks[i] for i in toks if splits[i] == "train"]
    b = [toks[i] for i in toks if splits[i] == "val"]
    bins = sorted({(t // 32) * 32 for t in a + b})
    total_q = 0
    for lo in bins:
        na = sum(1 for t in a if (t // 32) * 32 == lo)
        nb = sum(1 for t in b if (t // 32) * 32 == lo)
        p = max(na / len(a), 1e-4)
        q = max(nb / len(b), 1e-4)
        term = (p - q) * math.log(p / q)
        tq = math.floor(term * 1e6 + 0.5) if term >= 0 else -math.floor(-term * 1e6 + 0.5)
        total_q += tq
        assert got[lo]["n_a"] == na and got[lo]["n_b"] == nb
        assert got[lo]["psi_term"] == tq / 1e6
    assert all(r["psi_total"] == total_q / 1e6 for r in got.values())
    # every (p-q)ln(p/q) term is nonnegative, so the total must be too
    assert got and total_q >= 0

    r = split_drift_psi(df, split_b="no-such-split").collect()[0]
    assert r["psi_total"] is None and r["psi_term"] is None


def test_pq_recall_well_separated_clusters_is_high(spark):
    """With clusters far apart relative to quantization error, ADC@k
    recovers most exact-L2 neighbors; recall is always within [0, 1]."""
    from trend_o_meter_spark.llm.similarity import pq_recall

    near = [[float(j % 3), 1.0, 0.0, -1.0] for j in range(6)]
    far = [[100.0 + j, -50.0, 80.0, 60.0] for j in range(6)]
    rows = [(i, v) for i, v in enumerate(near)] + [(10 + j, v) for j, v in enumerate(far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_recall(df, m=2, k_codebook=4, iters=2, n_queries=2, k=5).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_exact"] == 5
        assert 0.0 <= r["recall"] <= 1.0
        # the 5 exact neighbors of a near-cluster query include the 5
        # other near vectors; ADC must find at least the 4 same-cluster
        # ones it can distinguish coarsely
        assert r["recall"] >= 0.8


def test_bpe_train_matches_reference_implementation(spark):
    """The distributed trainer must learn the exact merge sequence of a
    pure-Python Sennrich-style reference on the same corpus (count desc,
    (left, right) asc tie-break), and encoding must compress."""
    from collections import Counter

    from trend_o_meter_spark.llm.bpe import EOW, bpe_encode, bpe_train

    texts = [
        "low lower lowest",
        "new newer newest newest",
        "low low new wider wide",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    # pure-python reference (naive, can't share a bug with the Spark impl)
    freqs = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) + [EOW] for w in freqs}

    def ref_merges(n, min_count=2):
        out = []
        for _ in range(n):
            pc = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += freqs[w]
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), c = best
            if c < min_count:
                break
            out.append((a, b, a + b, c))
            for w, syms in vocab.items():
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                vocab[w] = ns
        return out

    want = ref_merges(12)
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(df, num_merges=12).orderBy("rank").collect()
    ]
    assert got == want
    assert len(got) >= 5  # the corpus supports a real rule list

    rules = [(a, b) for a, b, _, _ in want]
    enc = {r["doc_id"]: r["n_tokens_bpe"] for r in bpe_encode(df, rules).collect()}
    raw = {i: sum(len(w) + 1 for w in t.split()) for i, t in enumerate(texts)}
    assert all(enc[i] < raw[i] for i in enc)  # merges compress every doc


def test_byte_bpe_train_matches_reference_and_handles_non_ascii(spark):
    """Byte-level trainer: exact merge sequence vs a pure-Python
    byte-recount reference (naive full recount — can't share the
    incremental trainer's bookkeeping), on a corpus with multi-byte
    UTF-8 words.  Pins: no EOW in the symbol stream, every byte
    representable (no UNK), encode compresses, and the verdict row
    matches its DuckDB oracle including multi-byte mass."""
    from collections import Counter

    import duckdb

    from trend_o_meter_spark.llm.bpe import (
        _byte_syms,
        byte_bpe_encode_vocab,
        byte_bpe_train,
        byte_bpe_train_check,
        byte_bpe_train_check_sql,
    )

    texts = [
        "low lower lowest",
        "new newer newest newest",
        "naïve naïve café café café",  # multi-byte UTF-8 (ï, é)
        "low low new wider wide",
        "thin anthem paint within",   # th/in/an occurrences, incl. adjacent
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    freqs = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: _byte_syms(w) for w in freqs}
    assert all("</w>" not in s for syms in vocab.values() for s in syms)
    # multi-byte chars decompose into >1 symbol
    assert len(_byte_syms("é")) == 2

    def ref_merges(n, min_count=2):
        out = []
        for _ in range(n):
            pc = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += freqs[w]
            if not pc:
                break
            (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < min_count:
                break
            out.append((a, b, a + b, c))
            for w, syms in vocab.items():
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                vocab[w] = ns
        return out

    want = ref_merges(10)
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in byte_bpe_train(df, num_merges=10).orderBy("rank").collect()
    ]
    assert got == want and len(got) >= 5

    rules = [(a, b) for a, b, _, _ in want]
    enc = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in byte_bpe_encode_vocab(df, rules).collect()
    }
    raw = {
        i: sum(len(w.encode("utf-8")) for w in t.lower().split())
        for i, t in enumerate(texts)
    }
    # merges compress the corpus (and the repetitive docs individually;
    # doc 4's th/in/an filler need not win merge slots on this corpus)
    assert sum(enc.values()) < sum(raw.values())
    assert enc[0] < raw[0] and enc[2] < raw[2]
    none = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in byte_bpe_encode_vocab(df, []).collect()
    }
    assert none == raw  # empty rule list measures raw UTF-8 bytes

    # fixed-rule closed form (the byte_bpe_encode_fixed oracle): tokens =
    # octet_length - occ(th) - occ(in) - occ(an); ASCII patterns cannot
    # occur inside multi-byte UTF-8 sequences, so char-level counting is
    # byte-correct even for naïve/café
    fixed_rules = [("t", "h"), ("i", "n"), ("a", "n")]
    fenc = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in byte_bpe_encode_vocab(df, fixed_rules).collect()
    }
    for i, t in enumerate(texts):
        want_n = sum(
            len(w.encode("utf-8"))
            - sum((len(w) - len(w.replace(p, ""))) // 2 for p in ("th", "in", "an"))
            for w in t.lower().split()
        )
        assert fenc[i] == want_n, (i, fenc[i], want_n)

    n = 6
    row = byte_bpe_train_check(df, num_merges=n).collect()[0]
    assert row["init_byte_mass"] == sum(
        f * len(w.encode("utf-8")) for w, f in freqs.items()
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    o = con.execute(byte_bpe_train_check_sql("documents", num_merges=n)).df().iloc[0]
    for c in ("rank0_left", "rank0_right", "rank0_merged", "rank0_count",
              "n_rules", "init_byte_mass", "counts_monotone",
              "merged_is_concat", "counts_ge_min"):
        assert o[c] == row[c], (c, o[c], row[c])


def test_bpe_train_check_verdict_row_and_oracle(spark):
    """bpe_train_check's exact columns must equal the trainer's rank-0
    rule / the corpus pair mass, its invariants must hold, and the
    DuckDB oracle must hash-match it on the same corpus (the promotion
    recipe that took bpe_merges off rows-only, round 12)."""
    import duckdb

    from trend_o_meter_spark.llm.bpe import (
        bpe_train,
        bpe_train_check,
        bpe_train_check_sql,
    )

    texts = [
        "low lower lowest",
        "new newer newest newest",
        "low low new wider wide",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    n = 6
    row = bpe_train_check(df, num_merges=n).collect()[0]
    rules = bpe_train(df, num_merges=n).orderBy("rank").collect()

    assert (row["rank0_left"], row["rank0_right"], row["rank0_merged"],
            row["rank0_count"]) == (
        rules[0]["left"], rules[0]["right"], rules[0]["merged"],
        rules[0]["pair_count"])
    assert row["n_rules"] == len(rules) == n
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    assert row["init_pair_mass"] == sum(f * len(w) for w, f in freqs.items())
    assert row["counts_monotone"] and row["merged_is_concat"] and row["counts_ge_min"]

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = con.execute(bpe_train_check_sql("documents", num_merges=n)).df()
    assert len(oracle) == 1
    o = oracle.iloc[0]
    for c in ("rank0_left", "rank0_right", "rank0_merged", "rank0_count",
              "n_rules", "init_pair_mass", "counts_monotone",
              "merged_is_concat", "counts_ge_min"):
        assert o[c] == row[c], (c, o[c], row[c])


def test_unigram_train_matches_fraction_reference(spark):
    """The big-int Viterbi-EM unigram trainer must reproduce a naive
    pure-Python reference that enumerates EVERY segmentation with exact
    Fraction scores (different algorithm, same tie rules — can't share
    a DP or big-int-compare bug), and the learned vocab must surface
    the corpus' real subwords."""
    from fractions import Fraction

    from trend_o_meter_spark.llm.unigram import unigram_train

    texts = ["low lower lowest", "new newer newest newest", "low low new"]
    kw = dict(num_iters=2, max_piece_len=4, seed_multi=30, keep_multi=8)

    # --- naive reference ---------------------------------------------------
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1

    def all_segs(w, vocab, max_len):
        if not w:
            yield ()
            return
        for ln in range(1, min(max_len, len(w)) + 1):
            if w[:ln] in vocab:
                for rest in all_segs(w[ln:], vocab, max_len):
                    yield (w[:ln],) + rest

    def best_seg(w, counts, total, max_len):
        def score(seg):
            s = Fraction(1)
            for p in seg:
                s *= Fraction(counts[p], total)
            return s
        segs = list(all_segs(w, counts, max_len))
        return sorted(segs, key=lambda g: (-score(g), len(g), g))[0]

    from collections import Counter
    cnt = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for ln in range(1, min(4, len(w) - i) + 1):
                cnt[w[i:i + ln]] += f
    chars = sorted(p for p in cnt if len(p) == 1)
    multi = sorted((p for p in cnt if len(p) > 1), key=lambda p: (-cnt[p], p))[:30]
    counts = {c: cnt[c] for c in chars}
    counts.update({p: cnt[p] for p in multi})

    def e_step(counts):
        total = sum(counts.values())
        used = Counter()
        for w, f in freqs.items():
            for p in best_seg(w, counts, total, 4):
                used[p] += f
        return used

    for _ in range(2):
        used = e_step(counts)
        keep = sorted((p for p in used if len(p) > 1 and used[p] > 0),
                      key=lambda p: (-used[p], p))[:8]
        counts = {c: used.get(c, 0) for c in chars}
        counts.update({p: used[p] for p in keep})
    final = e_step(counts)
    want = {c: final.get(c, 0) for c in chars}
    want.update({p: final[p] for p in counts if len(p) > 1 and final.get(p, 0) > 0})

    # --- trainer -------------------------------------------------------------
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got_rows = unigram_train(df, **kw).collect()
    got = {r["piece"]: r["count"] for r in got_rows}
    assert got == want
    # real subwords emerge and mass is conserved
    assert any(p in got and got[p] > 0 for p in ("low", "new"))
    assert sum(c * len(p) for p, c in got.items()) == sum(
        f * len(w) for w, f in freqs.items()
    )
    # ranks: count desc, piece asc, dense 0..n-1
    ranked = sorted(got_rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(len(ranked)))
    assert ranked == sorted(got_rows, key=lambda r: (-r["count"], r["piece"]))


def test_pack_sequences_global_two_level_prefix_sum(spark):
    """The distributed (bucketed) prefix sum must equal the sequential
    definition on sparse ids, tiny buckets, boundary-crossing docs, and
    empty/NULL docs — computed here by a plain python scan."""
    from trend_o_meter_spark.llm.packing import pack_sequences

    docs = [
        (3, "a b c d e"),          # 5 toks
        (7, ""),                   # 0 toks -> NULL seq cols
        (12, "x " * 300),          # 300 toks, crosses a 256 boundary
        (13, None),                # NULL text -> 0 toks
        (25, "one two"),           # new bucket (width 10)
        (40, "t " * 10),
    ]
    # a NULL id has no defined position in id order: excluded, documented
    df = spark.createDataFrame(
        docs + [(None, "ghost doc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, seq_len=256, bucket_width=10
        ).collect()
    }
    assert None not in out and len(out) == len(docs)
    # sequential reference
    start = 0
    for did, t in sorted(docs):
        n = len([w for w in (t or "").lower().split() if w])
        r = out[did]
        assert (r["n_tokens"], r["start_tok"]) == (n, start), (did, r)
        if n > 0:
            assert r["seq_first"] == start // 256
            assert r["seq_last"] == (start + n - 1) // 256
            assert r["tok_offset"] == start % 256
        else:
            assert r["seq_first"] is None and r["seq_last"] is None
            assert r["tok_offset"] is None
        start += n
    assert out[12]["seq_last"] > out[12]["seq_first"]  # boundary crossed


def test_pack_sequences_global_autosized_bucket_width(spark):
    """Default bucket_width=None must self-size from the id span so the
    driver-side base table stays <= ~1M rows at any scale — a fixed 4096
    default would collect ~244M rows at a 10^12 span.  Pin the bound
    arithmetically and check the auto-sized result is width-invariant
    (identical to an explicit small width) on a sparse-id corpus."""
    from trend_o_meter_spark.llm.packing import pack_sequences

    # sparse huge ids: span ~ 8e9 -> fixed 4096 would need ~2M buckets;
    # the autosize must pick width >= span/1M (here >= ~8000)
    docs = [(i * 1_000_000_000, f"w{i} " * (i + 1)) for i in range(9)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    auto = {r["doc_id"]: r for r in pack_sequences(df, seq_len=128).collect()}
    manual = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=128, bucket_width=7).collect()
    }
    assert auto == manual  # start_tok is width-invariant
    # the bound itself: ceil(span/1M) capped below at 4096
    span = 8_000_000_001
    width = max(4096, -(-span // 1_000_000))
    assert span / width <= 1_000_001  # driver rows <= ~1M
    # small-span corpora keep the floor width (one bucket, still exact)
    tiny = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id long, text string")
    t = {r["doc_id"]: r for r in pack_sequences(tiny).collect()}
    assert (t[1]["start_tok"], t[2]["start_tok"]) == (0, 2)


def test_unigram_encode_matches_python_reference(spark):
    """Trained-vocab distributed encode (distinct-word Viterbi kernel +
    join-back) must equal a per-doc pure-Python scan that Viterbi-
    segments every word in place — different data path (no distinct, no
    join), same exact-int scorer.  Also pins: empty/NULL docs report 0,
    OOV chars segment (count-0 coverage), and the fixed-vocab registry
    variant equals its closed form len - occ(th) - occ(in) - occ(an)."""
    from trend_o_meter_spark.llm.unigram import (
        _viterbi,
        unigram_encode,
        unigram_encode_fixed,
        unigram_train,
    )

    texts = [
        "low lower lowest",
        "new newer newest newest",
        "low low new",
        "",           # 0 tokens
        None,         # NULL -> 0
        "zq√ unknown-chars",  # OOV chars vs the trained vocab
        "thin thane paint anthem",  # th/in/an occurrences for the fixed form
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    vocab_df = unigram_train(df, num_iters=2, max_piece_len=4,
                             seed_multi=30, keep_multi=8)
    vocab = {r["piece"]: r["count"] for r in vocab_df.collect()}
    total = sum(vocab.values())
    max_len = max(len(p) for p in vocab)

    import re as _re

    def norm_words(t):
        # mirror dedup._norm: lower + trim + whitespace squash (non-
        # alphanumerics are KEPT — they become OOV chars for the encoder)
        s = _re.sub(r"\s+", " ", (t or "").strip().lower())
        return [w for w in s.split(" ") if w]

    want = {}
    for did, t in enumerate(texts):
        n = 0
        for w in norm_words(t):
            counts = dict(vocab)
            counts.update({c: 0 for c in w if c not in vocab})
            n += len(_viterbi(w, counts, total, max_len))
        want[did] = n

    got = {
        r["doc_id"]: r["n_tokens_uni"]
        for r in unigram_encode(df, vocab_df).collect()
    }
    assert got == want and got[3] == 0 and got[4] == 0
    # trained multis actually compress: fewer tokens than chars somewhere
    chars_total = sum(len(w) for t in texts for w in norm_words(t))
    assert sum(got.values()) < chars_total

    # fixed-vocab variant == closed form
    fixed = {
        r["doc_id"]: r["n_tokens_uni"]
        for r in unigram_encode_fixed(df).collect()
    }
    for did, t in enumerate(texts):
        n = sum(
            len(w) - sum((len(w) - len(w.replace(p, ""))) // 2
                         for p in ("th", "in", "an"))
            for w in norm_words(t)
        )
        assert fixed[did] == n, (did, fixed[did], n)
    assert fixed[6] < sum(len(w) for w in norm_words(texts[6]))


def test_unigram_vocab_check_oracle_matches(spark):
    import duckdb

    from trend_o_meter_spark.llm.unigram import (
        unigram_vocab_check,
        unigram_vocab_check_sql,
    )

    texts = ["low lower lowest", "new newer newest newest", "low low new"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    row = unigram_vocab_check(df).collect()[0]
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    o = con.execute(unigram_vocab_check_sql("documents")).df().iloc[0]
    for c in ("n_char_pieces", "piece_char_mass", "multi_within_cap", "counts_positive"):
        assert o[c] == row[c], (c, o[c], row[c])


def test_bpe_merge_word_matches_fold(spark):
    """The driver-side merge (_merge_word) and the distributed encoder
    fold (_merged_syms) must agree on the non-overlapping left-to-right
    semantics, including the self-merge and just-produced-token cases."""
    from trend_o_meter_spark.llm.bpe import _merge_word, _merged_syms

    cases = [
        (["a", "a", "a"], "a", "a"),          # "aaa" -> [aa, a]
        (["a", "b", "a", "b"], "a", "b"),     # -> [ab, ab]
        (["a", "a", "b"], "a", "a"),          # aa then b; "ab" must not form
        (["a", "b", "b"], "b", "b"),          # -> [a, bb]
        (["x"], "a", "b"),                     # no-op
        (["a", "b", "a", "a", "b"], "a", "b"),  # -> [ab, a, ab]
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)], "i long, syms array<string>"
    )
    for i, (syms, a, b) in enumerate(cases):
        got_fold = (
            df.filter(F.col("i") == i).select(_merged_syms(a, b).alias("m")).head()["m"]
        )
        assert got_fold == _merge_word(syms, a, b), (syms, a, b)


def test_bpe_top_words_cap(spark):
    """top_words trains on the most frequent words only; with the cap at
    or above the distinct-word count the rule list is unchanged."""
    from trend_o_meter_spark.llm.bpe import bpe_train

    texts = ["low lower lowest", "new newer newest newest", "low low new wider wide"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    full = [tuple(r) for r in bpe_train(df, num_merges=8).collect()]
    capped_loose = [tuple(r) for r in bpe_train(df, num_merges=8, top_words=100).collect()]
    assert capped_loose == full
    # a tight cap trains on a smaller table but still returns valid rules
    capped_tight = bpe_train(df, num_merges=8, top_words=3).collect()
    assert all(r["pair_count"] >= 2 for r in capped_tight)


def test_bpe_train_is_one_spark_job_regardless_of_merges(spark):
    """The scale contract: job count must not grow with num_merges (the
    previous formulation ran ~3 jobs per merge rule)."""
    from trend_o_meter_spark.llm.bpe import bpe_train

    texts = ["low lower lowest", "new newer newest newest", "low low new wider wide"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(n_merges, tag):
        # count within a DEDICATED job group: the suite's shared session
        # can fire unrelated async jobs (listener/stream stragglers from
        # earlier tests) into the default group mid-measurement, which
        # made a whole-session before/after diff flaky by +-1
        sc.setJobGroup(tag, "bpe job-count probe")
        try:
            bpe_train(df, num_merges=n_merges).collect()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(tracker.getJobIdsForGroup(tag))

    j2 = jobs_for(2, "bpe-probe-2")
    j12 = jobs_for(12, "bpe-probe-12")
    assert j12 <= j2 + 1, (j2, j12)  # flat in num_merges (+1 slack for AQE retries)


def test_cc_ignores_edges_outside_node_set_both_algorithms(spark):
    """Edges referencing ids absent from `nodes` must not leak into the
    output, and label/star must agree on the row set (the algorithm=auto
    determinism contract — was a divergence found in review)."""
    from trend_o_meter_spark.llm.cluster import connected_components

    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 99), (98, 97)], "id_a long, id_b long")
    lab = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges, algorithm="label").collect()}
    star = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges, algorithm="star").collect()}
    assert lab == star == {0: 0, 1: 0, 2: 2}


def test_semantic_dedup_keeps_the_centroid_outlier(spark):
    """Hand-built geometry: three near-identical vectors + one
    orthogonal.  The near-dup group must lose all but ONE member, and
    the survivor must be the group's member LEAST similar to the
    centroid (SemDeDup's keep-the-outlier rule)."""
    from trend_o_meter_spark.llm.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.95, 0.25, 0.0]),    # near-dup, furthest from the group centroid
        (3, [0.0, 0.0, 1.0]),      # orthogonal: always kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=2, iters=1, threshold=0.95).collect()}
    assert len(out) == 4
    assert out[3]["kept"] is True
    group = [out[i] for i in (0, 1, 2)]
    kept = [r for r in group if r["kept"]]
    assert len(kept) == 1
    # the survivor has the group's minimum cos_to_centroid
    assert kept[0]["cos_to_centroid"] == min(r["cos_to_centroid"] for r in group)


def test_semantic_dedup_auto_k(spark):
    """k='auto' (the default) sizes k = ceil(n / target_cell_size) from a
    count, so expected cell size stays bounded without a manual k."""
    import random

    import pytest as _pytest

    from trend_o_meter_spark.llm.similarity import semantic_dedup

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(256)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, target_cell_size=16, iters=1, threshold=0.99)
    clusters = out.select("cluster").distinct().count()
    # k = ceil(256/16) = 16 seeds; empty cells may collapse but the
    # partitioning must be real (not the degenerate single cell)
    assert 1 < clusters <= 16
    assert out.count() == 256
    with _pytest.raises(ValueError):
        semantic_dedup(df, k="bogus")


def test_semantic_dedup_survivor_always_exists_per_cluster(spark):
    """Even when EVERY pair in a cluster is above threshold (all
    identical vectors), exactly one member survives — the drop rule can
    never empty a duplicate group."""
    from trend_o_meter_spark.llm.similarity import semantic_dedup

    rows = [(i, [1.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=1, iters=1, threshold=0.5).collect()
    assert sum(1 for r in out if r["kept"]) == 1
    assert len(out) == 6


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs n-gram-similar to the quality keep set must out-weigh docs
    that resemble the rejected mass — the direction DSIR resamples in."""
    from trend_o_meter_spark.llm.text import dsir_weights, quality_filter

    clean = "the report is ready for review and the team is happy with it"
    junk = "@@@@ !!!! #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    rows = (
        [(i, clean + f" item {i}") for i in range(8)]
        + [(100 + i, junk + f" {i}") for i in range(8)]
        + [(200, clean + " extra words here"), (201, junk + " more")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {r["doc_id"] for r in quality_filter(df).filter("keep").collect()}
    assert any(i in keep for i in range(8)) and not any(100 + i in keep for i in range(8))
    w = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(df).collect()}
    assert len(w) == len(rows)
    # target-like held-out doc scores above the junk-like held-out doc
    assert w[200] > w[201]


def test_dsir_weights_grams_counted_with_multiplicity(spark):
    """n_grams = unigrams + bigrams PER OCCURRENCE (DSIR's bag-of-words
    features are term frequencies, not distinct sets)."""
    from trend_o_meter_spark.llm.text import dsir_weights

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "x y z")], "doc_id long, text string"
    )
    n = {r["doc_id"]: r["n_grams"] for r in dsir_weights(df).collect()}
    assert n[0] == 4 + 3  # 4 unigram occurrences + 3 bigram occurrences
    assert n[1] == 3 + 2


def test_dup_span_removal_cuts_span_keeps_survivor(spark):
    """Hand-built ExactSubstr case: doc 1 embeds doc 0's 10-token text
    verbatim.  The survivor (smallest id) keeps its text; doc 1 loses
    exactly the duplicated span; short shared runs are left alone."""
    from trend_o_meter_spark.llm.dedup import dup_span_removal

    rows = [
        (0, "a b c d e f g h i j"),
        (1, "x y a b c d e f g h i j z"),
        (2, "p q r s t u v w"),
        (3, "m n a b c d o p"),  # shares only a 2-shingle run: below min_run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_removal(df, min_run=5).collect()}
    assert out[0]["n_removed_tokens"] == 0 and out[0]["clean_text"] == "a b c d e f g h i j"
    assert out[1]["n_removed_tokens"] == 10 and out[1]["clean_text"] == "x y z"
    assert out[2]["n_removed_tokens"] == 0
    assert out[3]["n_removed_tokens"] == 0 and out[3]["clean_text"] == "m n a b c d o p"


def test_dup_span_removal_fully_duplicated_doc_empties(spark):
    """An exact duplicate of the survivor is removed in full — clean_text
    becomes '' and every token counts as removed (doc-level exact dedup
    emerges as the span-removal limit case)."""
    from trend_o_meter_spark.llm.dedup import dup_span_removal

    t = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(7, t), (9, t)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_removal(df, min_run=5).collect()}
    assert out[7]["n_removed_tokens"] == 0 and out[7]["clean_text"] == t
    assert out[9]["n_removed_tokens"] == 10 and out[9]["clean_text"] == ""


def test_quality_filter_null_text_dropped_by_both_engines(spark):
    """NULL text must be REJECTED (too_short), and the oracle must
    agree — DuckDB's NULL comparisons used to skip every rule and
    silently keep the doc."""
    import duckdb

    from trend_o_meter_spark.llm.text import quality_filter, quality_filter_sql

    df = spark.createDataFrame(
        [(0, None), (1, "the quick brown fox is here and the dog is there ok fine")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"]) for r in quality_filter(df).collect()}
    assert got[0] == (False, "too_short")
    assert got[1][0] is True

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (0, NULL), "
        "(1, 'the quick brown fox is here and the dog is there ok fine')) AS v(doc_id, text)"
    )
    oracle = {
        r[0]: (r[2], r[1])
        for r in con.execute(quality_filter_sql("t")).fetchall()
    }
    assert oracle[0] == (False, "too_short")
    assert oracle[1][0] is True


def test_banded_rows_rejects_non_divisible_perms(spark):
    import pytest

    from trend_o_meter_spark.llm.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(df, num_perm=18, bands=4).collect()


def test_pq_codes_on_offset_id_space_still_trains(spark):
    """Codebooks seed from the k smallest ids PRESENT — an offset id
    space (no ids < k) used to train empty codebooks and return an
    empty frame silently."""
    from trend_o_meter_spark.llm.similarity import pq_codes

    rows = [(1000 + i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_codes(df, m=2, k=4, iters=1)
    assert out.count() == 40


def test_topk_and_recall_on_offset_id_space(spark):
    """Query selection is the n smallest ids PRESENT — an offset id space
    (no ids < n_queries) used to select zero queries and return empty
    frames silently from the whole topk/recall family."""
    from trend_o_meter_spark.llm.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        ivf_recall,
        l2_topk,
        pq_adc_topk,
        pq_recall,
    )

    rows = [
        (1000 + i, [float((i * 13) % 7), float((i * 5) % 11), 1.0, float(i % 3)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    nq = 3
    for fn, kw in (
        (cosine_topk, {}),
        (cosine_topk_ivf, {"n_centroids": 4, "n_probe": 4}),
        (l2_topk, {}),
        (pq_adc_topk, {"m": 2, "k": 4, "iters": 1, "topk": 5}),
    ):
        out = fn(df, n_queries=nq, **kw)
        qids = {r["query_id"] for r in out.select("query_id").distinct().collect()}
        assert qids == {1000, 1001, 1002}, (fn.__name__, qids)
    # recall evals: exactly n_queries rows, one per present query id
    for fn, kw in (
        (ivf_recall, {"n_centroids": 4, "n_probe": 4}),
        (pq_recall, {"m": 2, "k_codebook": 4, "iters": 1}),
    ):
        out = fn(df, n_queries=nq, **kw).collect()
        assert len(out) == nq, (fn.__name__, out)
        assert {r["query_id"] for r in out} == {1000, 1001, 1002}


def test_weighted_sample_prefers_heavy_weights(spark):
    """Efraimidis-Spirakis race: across many salts, a row with 50x the
    weight is selected far more often than any unit-weight row, and the
    sample is deterministic for a fixed salt."""
    from trend_o_meter_spark.llm.text import weighted_sample

    rows = [(i, 50.0 if i == 7 else 1.0) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_hits = 0
    salts = [f"s{j}" for j in range(12)]
    for s in salts:
        ids = {r["doc_id"] for r in weighted_sample(df, weight_col="w", k=10, salt=s).collect()}
        assert len(ids) == 10
        heavy_hits += 7 in ids
    assert heavy_hits >= 10  # P(select) ~ 50/169 per slot; ~96% per salt

    a = [r["doc_id"] for r in weighted_sample(df, weight_col="w", k=10, salt="fixed").collect()]
    b = [r["doc_id"] for r in weighted_sample(df, weight_col="w", k=10, salt="fixed").collect()]
    assert a == b  # deterministic, order included


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from trend_o_meter_spark.llm.text import weighted_sample

    df = spark.createDataFrame(
        [(0, 1.0), (1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double"
    )
    ids = {r["doc_id"] for r in weighted_sample(df, weight_col="w", k=10).collect()}
    assert ids == {0, 3}


def test_pagerank_symmetry_and_mass(spark):
    """PageRank sanity on hand-checkable graphs: (1) a symmetrized path
    1-2-3 ranks the middle node highest with the endpoints tied exactly;
    (2) total rank mass stays ~1 (within the documented 5e-10 * E
    quantization bias per iteration); (3) a directed cycle is uniform at
    exactly 1/N every iteration."""
    from trend_o_meter_spark.llm.cluster import pagerank

    path = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    r = {row["node"]: row["pagerank"] for row in pagerank(path, iters=4).collect()}
    assert r[1] == r[3]  # symmetric endpoints tie bit-for-bit
    assert r[2] > r[1]
    assert abs(sum(r.values()) - 1.0) < 1e-6
    cycle = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    rc = {row["node"]: row["pagerank"] for row in pagerank(cycle, iters=3).collect()}
    third = round(1 / 3, 9)
    assert all(abs(v - third) < 2e-9 for v in rc.values()), rc


def test_pagerank_quantized_sums_are_order_free(spark):
    """The determinism discipline: re-running over a repartitioned edge
    list (different partial-sum order) yields bit-identical ranks."""
    from trend_o_meter_spark.llm.cluster import pagerank

    edges = [(i % 23, (i * 7 + 3) % 23) for i in range(200)]
    sym = edges + [(b, a) for a, b in edges]
    e1 = spark.createDataFrame(sym, "src long, dst long")
    e2 = e1.repartition(13)
    r1 = sorted(map(tuple, pagerank(e1, iters=3).collect()))
    r2 = sorted(map(tuple, pagerank(e2, iters=3).collect()))
    assert r1 == r2


def test_logreg_matches_independent_replica(spark):
    """logreg_train vs a from-scratch numpy replica of the identical
    quantized algorithm (min-max scale, 1e-6 sigmoid, 1e-9 integer
    gradient sums, away-from-zero weight quantization): weights must be
    EXACTLY equal — the determinism discipline, independently checked."""
    import math

    import numpy as np

    from trend_o_meter_spark.llm.classifier import logreg_train

    rows = [
        (i, "word " * (i % 7 + 1) + "aeiou" * (i % 3), "en" if i % 2 == 0 else "fr")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["term"]: r["weight"] for r in logreg_train(df, iters=3, lr=0.5).collect()}

    def feats(t):
        return [
            float(len(t)),
            float(len(t) - len(t.replace(" ", ""))),
            float(len(t) - len("".join(c for c in t if c not in "aeiou"))),
        ]

    X = np.array([feats(t) for _, t, _ in rows])
    y = np.array([1 if l == "en" else 0 for _, _, l in rows])
    mn, mx = X.min(0), X.max(0)
    rng = np.where(mx > mn, mx - mn, 1.0)
    Z = (X - mn) / rng

    def q(x, s):
        return math.floor(x * s + 0.5) / s if x >= 0 else -math.floor(-x * s + 0.5) / s

    def qint(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    w, b = [0.0, 0.0, 0.0], 0.0
    n = len(rows)
    for _ in range(3):
        t = b + w[0] * Z[:, 0] + w[1] * Z[:, 1] + w[2] * Z[:, 2]
        p = np.array([math.floor((1.0 / (1.0 + math.exp(-v))) * 1e6 + 0.5) / 1e6 for v in t])
        d = p - y
        sb = sum(qint(v * 1e9) for v in d)
        b = q(b - 0.5 * (float(sb) / 1e9 / n), 1e9)
        for j in range(3):
            sj = sum(qint(v * 1e9) for v in (d * Z[:, j]))
            w[j] = q(w[j] - 0.5 * (float(sj) / 1e9 / n), 1e9)

    assert got["__bias"] == b
    assert got["f_chars"] == w[0]
    assert got["f_spaces"] == w[1]
    assert got["f_vowels"] == w[2]


def test_logreg_predict_anchors_stable_across_batches(spark):
    """Serving contract: with train-time anchors passed, a document's
    score is identical whether scored alone or with the full corpus;
    without anchors the call warns (and may drift on subsets)."""
    import warnings

    from trend_o_meter_spark.catalog import table as cat_table
    from trend_o_meter_spark.llm.classifier import (
        logreg_predict,
        logreg_train,
        minmax_anchors,
    )

    d = cat_table(spark, "documents", "/root/testdata/sf0.001").limit(200).cache()
    w = {r["term"]: r["weight"] for r in logreg_train(d, iters=2, lr=0.5).collect()}
    anchors = minmax_anchors(d)

    full = {r["doc_id"]: r["p"] for r in logreg_predict(d, w, anchors=anchors).collect()}
    subset = d.limit(10)
    sub = {
        r["doc_id"]: r["p"]
        for r in logreg_predict(subset, w, anchors=anchors).collect()
    }
    assert all(full[k] == v for k, v in sub.items())

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        logreg_predict(subset, w)
        assert any("anchors" in str(c.message) for c in caught)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="anchors missing"):
        logreg_predict(subset, w, anchors={"f_chars": (0.0, 1.0)})


def test_logreg_predict_separates_language(spark):
    """The trained weights carry real signal: mean predicted p(en) on
    English documents exceeds mean p on the rest of the corpus."""
    from trend_o_meter_spark.catalog import table
    from trend_o_meter_spark.llm.classifier import (
        logreg_predict,
        logreg_train,
        minmax_anchors,
    )

    d = table(spark, "documents", "/root/testdata/sf0.001")
    w = {r["term"]: r["weight"] for r in logreg_train(d, iters=5, lr=1.0).collect()}
    scored = logreg_predict(d, w, anchors=minmax_anchors(d)).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    from pyspark.sql import functions as F

    agg = scored.groupBy((F.col("lang") == "en").alias("is_en")).agg(
        F.avg("p").alias("mean_p")
    )
    means = {r["is_en"]: r["mean_p"] for r in agg.collect()}
    assert means[True] > means[False], means


def test_exact_substr_spans_semantics(spark):
    """Character-level ExactSubstr pins: the maximal shared region —
    passage INCLUDING its shared flanking spaces — is cut from BOTH
    docs (no survivor); a within-doc self-repeat is cut; short or
    unique docs pass through; lengths reconcile."""
    from trend_o_meter_spark.llm.dedup import exact_substr_spans

    passage = "abcdefghij" * 4  # 40 chars, >= L
    rows = [
        (0, f"unique-head-zero {passage} unique-tail-zero"),
        (1, f"other-head-one {passage} other-tail-one"),
        (2, "entirely original text with nothing repeated anywhere here"),
        (3, "tiny"),                       # shorter than L
        (4, f"x {passage} y {passage} z"),  # self-repeat inside one doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substr_spans(df, min_len=40).collect()}

    # the shared passage is cut from BOTH copies (no survivor); the
    # flanking spaces are part of the shared region (" passage " occurs
    # in every copy) so exact semantics cuts them too
    assert out[0]["clean_text"] == "unique-head-zerounique-tail-zero"
    assert out[1]["clean_text"] == "other-head-oneother-tail-one"
    # self-repeat: both in-doc copies cut, unique separators kept
    assert out[4]["clean_text"] == "xyz"
    # untouched docs
    assert out[2]["clean_text"] == rows[2][1]
    assert out[3]["clean_text"] == rows[3][1] and out[3]["n_removed_chars"] == 0
    # length reconciliation everywhere
    for r in out.values():
        assert len(r["clean_text"]) == r["n_chars"] - r["n_removed_chars"]


def test_exact_substr_spans_interval_merge(spark):
    """Two extended intervals overlapping by one character must merge
    into a single contiguous cut: doc 0 is c1 and c2 OVERLAPPED on the
    shared 'Z' (39 chars), with c1 duplicated in doc 1 and c2 in doc 2."""
    from trend_o_meter_spark.llm.dedup import exact_substr_spans

    c1 = "A" * 19 + "Z"          # 20 chars
    c2 = "Z" + "B" * 19          # 20 chars
    rows = [
        (0, f"head {c1}{'B' * 19} tail"),  # = c1 overlapped with c2 on 'Z'
        (1, f"left.{c1}.right"),
        (2, f"lead.{c2}.end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substr_spans(df, min_len=20).collect()}
    # doc 0: marked starts at the c1 window and the c2 window only
    # (islands 19 apart), extensions [p, p+19] and [p+19, p+38] overlap
    # at p+19 -> ONE merged 39-char cut
    assert out[0]["clean_text"] == "head  tail"
    assert out[0]["n_removed_chars"] == 39
    for r in out.values():
        assert len(r["clean_text"]) == r["n_chars"] - r["n_removed_chars"]


def test_bloom_contamination_overshoots_exact_only(spark):
    """The Bloom count can only OVERSHOOT the exact contamination count
    (no false negatives), and with a generous filter it matches exactly
    on a corpus where contamination is planted."""
    from trend_o_meter_spark.llm.dedup import bloom_contamination

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_text),                                     # the eval doc
        (1, f"noise words here {bench_text} more noise"),    # contaminated
        (2, "totally clean document with its own words only entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id = 0")
    out = {
        r["doc_id"]: r
        for r in bloom_contamination(df, bench, shingle_n=3, m=4096, k=3).collect()
    }
    for r in out.values():
        assert r["n_maybe_contaminated"] >= r["n_contaminated"]
    assert out[1]["n_contaminated"] == 8   # the 8 shingles of the planted span
    assert out[0]["n_contaminated"] == out[0]["n_grams"]  # the bench doc itself
    assert out[2]["n_contaminated"] == 0


def test_bpe_encode_vocab_equals_fold_encoder(spark):
    """The vocab-path encoder (distinct-word mapInPandas kernel, constant
    expression depth) must equal the fold encoder exactly — on the
    reference corpus with learned rules AND on real documents with the
    registry's fixed rules (empty-doc zero rows included)."""
    from trend_o_meter_spark.catalog import table as cat_table
    from trend_o_meter_spark.llm.bpe import bpe_encode, bpe_encode_vocab, bpe_train

    texts = ["low lower lowest", "new newer newest newest", "low low new wider wide", "   "]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rules = [
        (r["left"], r["right"])
        for r in bpe_train(df, num_merges=10).orderBy("rank").collect()
    ]
    a = sorted(map(tuple, bpe_encode(df, rules).collect()))
    b = sorted(map(tuple, bpe_encode_vocab(df, rules).collect()))
    assert a == b
    assert dict(a)[3] == 0  # whitespace-only doc reported, not dropped

    docs = cat_table(spark, "documents", "/root/testdata/sf0.001").limit(120)
    fixed = [("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n")]
    a2 = sorted(map(tuple, bpe_encode(docs, fixed).collect()))
    b2 = sorted(map(tuple, bpe_encode_vocab(docs, fixed).collect()))
    assert a2 == b2


def test_logreg_hashed_separates_token_classes(spark):
    """The hashed bag-of-words classifier must separate classes that are
    token-predictable (the fixture's lang label is independent of its
    tokens — every language shares one 31-word vocabulary — so the test
    plants two distinct vocabularies), and scores are deterministic."""
    import random

    from trend_o_meter_spark.llm.classifier import logreg_hashed_train_and_score

    rng = random.Random(3)
    pos_vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    neg_vocab = ["omega", "sigma", "tau", "kappa", "lambda"]
    rows = []
    for i in range(120):
        vocab = pos_vocab if i % 2 == 0 else neg_vocab
        words = [vocab[rng.randrange(5)] for _ in range(20)]
        rows.append((i, " ".join(words), "pos" if i % 2 == 0 else "neg"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()
    scored = logreg_hashed_train_and_score(
        df, label_sql="lang = 'pos'", n_features=64, iters=6, lr=1.0
    ).join(df.select("doc_id", "lang"), "doc_id")
    got = scored.collect()
    pos = [r["p"] for r in got if r["lang"] == "pos"]
    neg = [r["p"] for r in got if r["lang"] == "neg"]
    assert min(pos) > max(neg)  # fully separable vocabularies
    again = logreg_hashed_train_and_score(
        df, label_sql="lang = 'pos'", n_features=64, iters=6, lr=1.0
    ).collect()
    assert {r["doc_id"]: r["p"] for r in got} == {r["doc_id"]: r["p"] for r in again}


def test_rrf_hybrid_search_fuses_ranks(spark):
    """The RRF fusion must equal composing the two arms by hand: lexical
    ranks from the library's bm25_search, dense ranks from a pure-Python
    cosine ranking against the lowest-id embedding, fused as
    sum(1/(60+rank)) over the union — docs present in only one list get
    NULL for the other rank and contribute 0 from it."""
    import math

    from trend_o_meter_spark.llm.similarity import rrf_hybrid_search
    from trend_o_meter_spark.llm.text import bm25_search

    docs = [
        (0, "alpha alpha alpha filler filler"),
        (1, "alpha alpha beta filler filler"),
        (2, "alpha filler filler filler filler"),
        (3, "nothing relevant here at all"),     # lex-missing
        (4, "beta beta alpha filler filler"),
        (5, "unrelated words only right here"),  # lex-missing
    ]
    vecs = {
        0: [1.0, 0.0],   # the query vector (lowest id), excluded from dense
        1: [0.6, 0.8],
        2: [0.0, 1.0],
        3: [0.99, 0.1],
        4: [-1.0, 0.0],
        5: [0.8, 0.6],
    }
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    edf = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    n_cand, k_rrf = 3, 60
    out = rrf_hybrid_search(ddf, edf, "alpha beta", n_candidates=n_cand, k=6)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}

    lex = {
        r["doc_id"]: r["rank"]
        for r in bm25_search(ddf, "alpha beta", k=n_cand).collect()
    }
    # dense arm by hand: float32 storage, cosine vs id 0, round-9 key
    import numpy as np

    # float32 storage, but the engine computes in DOUBLE (cosine casts
    # each element) — mirror: float32-quantize values, then float64 math
    q = np.array(vecs[0], dtype=np.float32).astype(np.float64)
    cos = {}
    for i, v in vecs.items():
        if i == 0:
            continue
        x = np.array(v, dtype=np.float32).astype(np.float64)
        cos[i] = round(
            float(np.dot(x, q) / (np.linalg.norm(x) * np.linalg.norm(q))), 9
        )
    order = sorted(cos, key=lambda i: (-cos[i], i))[:n_cand]
    dense = {i: r + 1 for r, i in enumerate(order)}

    union = set(lex) | set(dense)
    score = {
        i: round(
            (1.0 / (k_rrf + lex[i]) if i in lex else 0.0)
            + (1.0 / (k_rrf + dense[i]) if i in dense else 0.0),
            9,
        )
        for i in union
    }
    want_order = sorted(union, key=lambda i: (-score[i], i))[:6]
    assert sorted(got) == sorted(want_order)
    for rank, i in enumerate(want_order, start=1):
        r = got[i]
        assert r["rank"] == rank and math.isclose(r["rrf_score"], score[i], abs_tol=1e-9)
        assert r["lex_rank"] == lex.get(i) and r["dense_rank"] == dense.get(i)
    # both single-arm directions exercised
    assert any(i in lex and i not in dense for i in union)
    assert any(i in dense and i not in lex for i in union)


def test_langid_scores_pretrained_equals_broadcast_score_path(spark):
    """The one-pass literal-weight aggregation must equal composing the
    per-head broadcast-join scorer (_hashed_score) over the same shared
    feature frame — the two implementations of 'score 5 heads' can't
    drift.  Also: docs with no grams score at the bias (p = 0.5 with
    bias 0) and the output schema matches langid_scores."""
    from trend_o_meter_spark.llm.classifier import (
        LANGID_LANGS,
        _hashed_feats,
        _hashed_score,
        langid_scores_pretrained,
        pretrained_langid_head,
    )
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "der schnelle braune fuchs springt",
        "no",   # shorter than 3 chars after norm -> no grams
        None,   # NULL text -> no grams
        "agua luz casa años también",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in langid_scores_pretrained(df).collect()}

    feats = _hashed_feats(df, text="text", id_col="doc_id", n_features=64, grams=3)
    ids = df.select(F.col("doc_id").alias("did"))
    for lang in LANGID_LANGS:
        b, w = pretrained_langid_head(lang)
        ref = {
            r["doc_id"]: r["p"]
            for r in _hashed_score(feats, ids, b, w, "doc_id").collect()
        }
        for did in got:
            assert got[did][f"p_{lang}"] == ref[did], (lang, did)
    # gram-free docs sit at the bias: sigmoid(0) = 0.5 for every head
    for did in (2, 3):
        assert all(got[did][f"p_{lang}"] == 0.5 for lang in LANGID_LANGS)
    assert set(got[0]) == {"doc_id", "lang_pred", *{f"p_{la}" for la in LANGID_LANGS}}


def test_langid_scores_accuracy_on_multilingual_fixture(spark):
    """The trained char-3-gram language id must actually identify
    languages on a corpus where text and label are genuinely related
    (real stopword/diacritic character shapes per language) — the
    accuracy pin VERDICT r11 task 6 asked for — and its DuckDB oracle
    must match the Spark output row-for-row."""
    import random

    import duckdb

    from trend_o_meter_spark.llm.classifier import langid_scores, langid_scores_sql

    vocab = {
        "en": ["the", "and", "of", "with", "that", "house", "water", "light"],
        "de": ["der", "und", "nicht", "über", "schön", "haus", "wasser", "licht"],
        "es": ["el", "que", "los", "también", "casa", "agua", "luz", "años"],
        "fr": ["le", "les", "être", "très", "maison", "eau", "lumière", "années"],
    }
    langs = tuple(sorted(vocab))
    rng = random.Random(7)
    rows = []
    i = 0
    for lang, words in sorted(vocab.items()):
        for _ in range(25):
            rows.append((i, " ".join(rng.choice(words) for _ in range(18)), lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()
    out = langid_scores(df, langs=langs, iters=3, lr=1.0).collect()
    truth = {r[0]: r[2] for r in rows}
    acc = sum(1 for r in out if r["lang_pred"] == truth[r["doc_id"]]) / len(out)
    assert acc >= 0.9, acc

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = con.execute(
        langid_scores_sql("documents", langs=langs, iters=3, lr=1.0)
    ).df()
    want = {
        r["doc_id"]: (r["p_de"], r["p_en"], r["p_es"], r["p_fr"], r["lang_pred"])
        for r in out
    }
    got = {
        int(r.doc_id): (r.p_de, r.p_en, r.p_es, r.p_fr, r.lang_pred)
        for r in oracle.itertuples()
    }
    assert got == want


def test_decontaminate_spans_cuts_bench_overlap_only(spark):
    """Cross-corpus span decontamination: a passage copied from a bench
    doc is cut from the training doc at exact boundaries; training-side
    self-duplicates WITHOUT a bench twin are untouched."""
    from trend_o_meter_spark.llm.dedup import decontaminate_spans

    leak = "the quick brown fox jumps over the lazy dog tonight"  # > 30 chars
    traindup = "completely internal duplicated training passage here"
    corpus = spark.createDataFrame(
        [
            (10, f"intro {leak} outro"),
            (11, f"pre {traindup} mid {traindup} post"),
            (12, "clean and unrelated content entirely its own"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, f"q: {leak}")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate_spans(corpus, bench, min_len=30).collect()}
    assert leak not in out[10]["clean_text"]
    assert "intro" in out[10]["clean_text"] and "outro" in out[10]["clean_text"]
    # training-internal duplication is NOT a decontamination target
    assert out[11]["clean_text"].count(traindup) == 2
    assert out[11]["n_removed_chars"] == 0
    assert out[12]["n_removed_chars"] == 0
    for r in out.values():
        assert len(r["clean_text"]) == r["n_chars"] - r["n_removed_chars"]


def test_ccnet_buckets_tercile_invariants(spark):
    """Bucket sizes differ by at most... exactly: head = floor(n/3),
    middle = floor(2n/3) - floor(n/3), tail = rest, per source; every
    head score >= every tail score within a source."""
    from trend_o_meter_spark.catalog import table as cat_table
    from trend_o_meter_spark.llm.text import ccnet_buckets

    d = cat_table(spark, "documents", "/root/testdata/sf0.001")
    rows = ccnet_buckets(d).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        n = len(rs)
        sizes = {b: sum(1 for r in rs if r["bucket"] == b) for b in ("head", "middle", "tail")}
        assert sizes["head"] == n // 3
        assert sizes["middle"] == (2 * n) // 3 - n // 3
        assert sizes["tail"] == n - (2 * n) // 3
        heads = [r["lm_score"] for r in rs if r["bucket"] == "head" and r["lm_score"] is not None]
        tails = [r["lm_score"] for r in rs if r["bucket"] == "tail" and r["lm_score"] is not None]
        if heads and tails:
            assert min(heads) >= max(tails)


def test_lm_kneser_ney_prefers_natural_sequences(spark):
    """KN sanity: documents made of the corpus's common bigrams outscore
    a document of rare (once-seen) transitions; short docs get NULL with
    n_bigrams = 0; scores are deterministic."""
    from trend_o_meter_spark.llm.text import lm_kneser_ney_score

    common = "the cat sat on the mat " * 6
    rows = [
        (0, common),
        (1, common),
        (2, common),
        (3, "mat zyx qqq www eee rrr ttt"),  # transitions seen once each
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_kneser_ney_score(df).collect()}
    assert out[0]["kn_score"] > out[3]["kn_score"]
    assert out[4]["kn_score"] is None and out[4]["n_bigrams"] == 0
    again = {r["doc_id"]: r["kn_score"] for r in lm_kneser_ney_score(df).collect()}
    assert {k: v["kn_score"] for k, v in out.items()} == again


def test_temperature_mixture_upsamples_small_sources(spark):
    """alpha=0.5 boosts small sources' SHARE of the budget relative to
    natural proportions, admission is deterministic, and a budget above
    the corpus size keeps everything (gate saturates at 1)."""
    from trend_o_meter_spark.llm.text import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in temperature_mixture(df, budget_docs=200).collect()}
    # natural share of 'small' = 10%; sqrt share = sqrt(100)/(sqrt(900)+sqrt(100)) = 25%
    small_share = out["small"]["n_sampled"] / (out["small"]["n_sampled"] + out["big"]["n_sampled"])
    assert small_share > 0.15
    again = {r["source"]: r["n_sampled"] for r in temperature_mixture(df, budget_docs=200).collect()}
    assert {k: v["n_sampled"] for k, v in out.items()} == again
    full = {r["source"]: r for r in temperature_mixture(df, budget_docs=10_000).collect()}
    assert full["big"]["n_sampled"] == 900 and full["small"]["n_sampled"] == 100


def test_hits_hub_authority_separation(spark):
    """On a directed star (one hub pointing at many targets), the center
    gets all the hub mass and zero authority; targets split authority
    evenly; L1 normalization means each vector sums to ~1."""
    from trend_o_meter_spark.llm.cluster import hits

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits(edges, iters=3).collect()}
    assert out[0]["hub"] > 0.99 and out[0]["authority"] == 0.0
    for i in range(1, 6):
        assert abs(out[i]["authority"] - 0.2) < 1e-6
        assert out[i]["hub"] == 0.0
    assert abs(sum(r["authority"] for r in out.values()) - 1.0) < 1e-6
    assert abs(sum(r["hub"] for r in out.values()) - 1.0) < 1e-6


def test_curation_funnel_v3_monotone_and_hygiene_stages(spark):
    """v3 invariants: counts are monotone non-increasing down the nine
    stages, the decontamination stage removes at least the bench split's
    own survivors, and stage names arrive in order."""
    from trend_o_meter_spark.catalog import table as cat_table
    from trend_o_meter_spark.llm.funnel import curation_funnel_v3

    d = cat_table(spark, "documents", "/root/testdata/sf0.001")
    e = cat_table(spark, "embeddings", "/root/testdata/sf0.001")
    rows = curation_funnel_v3(d, e).collect()
    assert [r["stage"] for r in rows] == [
        "total", "quality", "exact_dedup", "near_dedup", "semantic_dedup",
        "decontaminated", "ccnet_head_mid", "dsir_floor", "token_budget",
    ]
    counts = [r["n_docs"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > counts[-1] > 0


def test_mrl_recall_full_width_is_perfect(spark):
    """Truncating to the full dimension is the identity -> recall 1.0;
    truncating to 2 of 16 dims on random vectors loses neighbors."""
    import random

    from trend_o_meter_spark.llm.similarity import mrl_recall

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = mrl_recall(df, n_queries=3, k=5, dim=16).collect()
    assert len(full) == 3
    assert all(r["recall"] == 1.0 and r["n_hit"] == r["n_exact"] == 5 for r in full)
    narrow = mrl_recall(df, n_queries=3, k=5, dim=2).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in narrow)
    assert any(r["recall"] < 1.0 for r in narrow)


def test_hits_rejects_zero_iters(spark):
    """iters=0 used to leave aq=None and crash at the final join (and
    hits_sql emitted CTEs referencing nonexistent a0/h0)."""
    import pytest as _pytest

    from trend_o_meter_spark.llm.cluster import hits, hits_sql

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        hits(edges, iters=0)
    with _pytest.raises(ValueError):
        hits_sql("SELECT 1 AS src, 2 AS dst", iters=0)


def test_calibration_bins_model_and_edges(spark):
    """A hand-built scored frame: perfectly calibrated bins give ECE 0;
    a planted gap charges exactly (n_b/N)*|acc-conf|; p = 1.0 lands in
    the top bin, not an 11th."""
    from trend_o_meter_spark.llm.classifier import calibration_bins

    rows = []
    # bin 2 (p=0.25): 8 rows, 2 positives => acc 0.25 == conf -> no gap
    rows += [(0.25, 1 if i < 2 else 0) for i in range(8)]
    # bin 9 (p=0.95): 8 rows, 0 positives => gap 0.95
    rows += [(0.95, 0) for _ in range(8)]
    # p = 1.0 edge: top bin too, positive
    rows += [(1.0, 1)] * 4
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == {2, 9}
    assert got[2]["gap"] == 0.0
    b9 = got[9]
    assert b9["n"] == 12 and b9["n_pos"] == 4
    conf = ((8 * 950000 + 4 * 1000000) / 1e6) / 12.0
    acc = 4.0 / 12.0
    assert b9["conf"] == conf and b9["acc"] == acc
    want_ece = round((12 / 20) * abs(acc - conf) * 1e9) / 1e9
    assert abs(got[2]["ece"] - want_ece) <= 1e-9
    assert got[2]["ece"] == got[9]["ece"]


def test_calibration_bins_perfectly_calibrated_is_zero(spark):
    from trend_o_meter_spark.llm.classifier import calibration_bins

    rows = []
    for p, k in [(0.1, 1), (0.5, 5), (0.9, 9)]:
        rows += [(p, 1 if i < k else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = calibration_bins(df).collect()
    assert all(r["ece"] == 0.0 and r["gap"] == 0.0 for r in out)


def test_label_balance_model_and_edges(spark):
    """Entropy/Gini/shares match a naive model; uniform distribution
    gives norm_entropy 1; single class gives entropy 0 and NULL
    norm_entropy (ln(1) division guarded)."""
    import math

    from trend_o_meter_spark.llm.text import label_balance

    rows = [("en",)] * 60 + [("fr",)] * 30 + [("de",)] * 10
    df = spark.createDataFrame(rows, "lang string")
    got = {r["label"]: r for r in label_balance(df, label="lang").collect()}
    N = 100
    ent_q = sum(
        math.floor(-(n / N) * math.log(n / N) * 1e6 + 0.5) for n in (60, 30, 10)
    )
    gini_q = sum(math.floor((n / N) ** 2 * 1e9 + 0.5) for n in (60, 30, 10))
    assert got["en"]["share"] == 0.6 and got["en"]["n"] == 60
    for r in got.values():
        assert r["entropy"] == ent_q / 1e6
        assert r["gini"] == 1.0 - gini_q / 1e9
        assert r["norm_entropy"] == math.floor(
            (ent_q / 1e6) / math.log(3.0) * 1e6 + 0.5
        ) / 1e6
        assert not r["below_min_share"]

    uni = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "lang string")
    u = label_balance(uni, label="lang").collect()[0]
    # within the 1e-6 term quantization of exactly 1.0
    assert abs(u["norm_entropy"] - 1.0) <= 2e-6

    one = spark.createDataFrame([("only",)] * 5 + [(None,)], "lang string")
    o = label_balance(one, label="lang").collect()
    assert len(o) == 1  # NULL labels excluded
    assert o[0]["entropy"] == 0.0 and o[0]["norm_entropy"] is None
    assert o[0]["gini"] == 0.0

    tiny = spark.createDataFrame([("big",)] * 999 + [("rare",)], "lang string")
    t = {r["label"]: r for r in label_balance(tiny, label="lang").collect()}
    assert t["rare"]["below_min_share"] and not t["big"]["below_min_share"]


def test_bpe_encode_fixed_closed_form_matches_kernel():
    # The bpe_encode_fixed oracle (bpe_encode_fixed_sql) rests on a
    # closed form: under the registry's fixed rule list, rule 2 never
    # fires and tokens = len(word)+1 - occ('th') - occ('in') - occ('an').
    # Pin it against the REAL per-word kernel over the adversarial
    # alphabet (includes 'e', '<', '/', 'w', '>' so a word can spell
    # out the literal text "e</w>" — which must still never merge).
    import random

    from trend_o_meter_spark.llm.bpe import EOW, _merge_word

    rules = [("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n")]

    def kernel(w: str) -> int:
        syms = list(w) + [EOW]
        have = set(syms)
        for a, b in rules:
            if a in have and b in have:
                m = _merge_word(syms, a, b)
                if len(m) != len(syms):
                    syms, have = m, set(m)
        return len(syms)

    def closed(w: str) -> int:
        occ = lambda p: (len(w) - len(w.replace(p, ""))) // 2
        return len(w) + 1 - occ("th") - occ("in") - occ("an")

    rng = random.Random(0)
    for _ in range(20000):
        w = "".join(
            rng.choice("thinae</w>xo") for _ in range(rng.randrange(1, 12))
        )
        assert kernel(w) == closed(w), w


def test_bpe_encode_fixed_sql_rejects_other_rule_lists():
    import pytest

    from trend_o_meter_spark.llm.bpe import bpe_encode_fixed_sql

    with pytest.raises(ValueError):
        bpe_encode_fixed_sql("documents", [("e", "</w>"), ("t", "h")])


def test_hard_negatives_excludes_same_label_and_ranks_by_cos(spark):
    from trend_o_meter_spark.llm.similarity import hard_negatives

    # anchor 0 (label 0): v1 same-label near-dup must be EXCLUDED even
    # though it is the most similar vector; v2 (label 1, close) ranks
    # above v3 (label 1, orthogonal); v4 (label 2, anti-parallel) last.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),   # same label: never a negative
        (2, [0.9, 0.4, 0.0], 1),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(df, n_anchors=1, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [2, 3, 4]
    assert all(r["anchor_id"] == 0 and r["neighbor_label"] != 0 for r in out)
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["cos_sim"] > out[1]["cos_sim"] > out[2]["cos_sim"]


def test_hard_negatives_ivf_full_probe_equals_exact_and_recall_is_one(spark):
    """With n_probe == n_centroids every cell is probed, so the IVF
    miner must return EXACTLY the brute-force result, and the recall
    eval must report 1.0 per anchor (the cosine_topk_ivf contract,
    applied to the labeled miner)."""
    import random

    from trend_o_meter_spark.llm.similarity import (
        hard_negatives,
        hard_negatives_ivf,
        hard_negatives_recall,
    )

    rng = random.Random(12)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    kw = dict(n_anchors=4, k=5, n_centroids=6)
    exact = sorted(map(tuple, hard_negatives(df, n_anchors=4, k=5).collect()))
    full = sorted(map(tuple, hard_negatives_ivf(df, n_probe=6, **kw).collect()))
    assert full == exact

    rec = hard_negatives_recall(df, n_probe=6, **kw).collect()
    assert len(rec) == 4 and all(r["recall"] == 1.0 for r in rec)

    # a 1-probe run is a genuine subset: never MORE hits than exact,
    # every returned pair label-valid
    few = hard_negatives_ivf(df, n_probe=1, **kw).collect()
    assert all(r["neighbor_label"] != r["anchor_label"] for r in few)
    rec1 = hard_negatives_recall(df, n_probe=1, **kw).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in rec1)
