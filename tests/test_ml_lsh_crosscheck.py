"""Cross-check our MinHash-LSH against Spark ML's MinHashLSH.

Different hash families, same guarantee: pairs with high true Jaccard
should surface as candidates in BOTH implementations.  This pins our
implementation against the ecosystem-standard one without coupling the
oracle to either's hash constants.
"""

import pytest
from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table
from trend_o_meter_spark.llm.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_rows,
)

SF = "/root/testdata/sf0.001"


def test_lsh_candidate_recall_matches_spark_ml(spark):
    docs = table(spark, "documents", SF)

    # ground truth: exact pairs with Jaccard >= 0.5 (strong near-dups)
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    if not truth:
        pytest.skip("corpus has no strong near-dups at this SF")

    # ours
    ours = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}

    # Spark ML: shingle set -> hashed term frequencies -> MinHashLSH
    sh = shingle_rows(docs).groupBy("id").agg(F.collect_list("s").alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(sh).filter(F.expr("size(shingles) > 0"))
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42).fit(feats)
    ml_pairs = (
        model.approxSimilarityJoin(feats, feats, 0.7, distCol="dist")  # jaccard >= 0.3
        .select(
            F.col("datasetA.id").alias("id_a"), F.col("datasetB.id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    )
    ml = {(r["id_a"], r["id_b"]) for r in ml_pairs}

    our_recall = len(truth & ours) / len(truth)
    ml_recall = len(truth & ml) / len(truth)
    # both implementations must surface the strong near-dups
    assert our_recall >= 0.8, (our_recall, len(truth))
    assert ml_recall >= 0.8, (ml_recall, len(truth))
