"""Streaming MinHash-LSH near-duplicate detection.

The batch near-dup path (``llm.dedup.minhash_lsh_pairs``) buckets
documents by band hash and self-joins inside buckets — a shape that
needs the whole corpus on both sides.  A continuous ingest pipeline
wants the INCREMENTAL twin: as each new document arrives, report which
previously-seen documents it collides with, without re-scanning history.
Spark has no built-in operator for this; it is the canonical
``applyInPandasWithState`` case (SURVEY §2.9 custom-stateful family):

* per-row MinHash signatures (map-side only — no grouped aggregation,
  which streaming append mode cannot host mid-pipeline);
* the SAME banding projection as batch (``llm.dedup.banded_rows``), so
  stream and batch bucket identically by construction;
* state keyed by (band, band-hash): the member-id list of the bucket,
  capped at ``max_bucket`` — new arrivals emit one candidate-pair row
  per existing member, then join the bucket.

Scale: state is O(buckets x max_bucket) longs; the only shuffle is the
groupBy((band, bh)) routing rows to their state partition.  A
boilerplate mega-bucket is capped at ``max_bucket`` members (the batch
path's degenerate-bucket mitigation, adapted: batch DROPS over-cap
buckets before the self-join, the stream stops ADMITTING members —
divergence documented because the stream cannot know the final bucket
size in advance).  Candidate pairs, like the batch operator's
pre-distinct form, may surface once per shared band; dedupe downstream
(batch distinct in the sink table, or dropDuplicatesWithinWatermark).

Reference parity note: the reference has no streaming near-dup (it has
no dedup at all — this is north-star LLM-pipeline surface); the
operator exists so the lambda-shape pipeline (batch backfill + stream
tail) covers near-dup, not just exact dedup
(``pipeline.stream_exact_dedup``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..llm.dedup import _word_shingles, banded_rows
from ..llm.hashing import MERSENNE_P, md5_int, minhash_perms

PAIRS_SCHEMA = StructType(
    [
        StructField("band", IntegerType(), True),
        StructField("bh", StringType(), True),
        StructField("id_a", LongType(), True),
        StructField("id_b", LongType(), True),
    ]
)

_BUCKET_STATE = StructType([StructField("ids", ArrayType(LongType()), True)])


def rowwise_minhash_signatures(
    docs: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-ROW MinHash signatures: ``id, sig`` with no shuffle.

    Identical values to the batch ``minhash_signatures`` (same shingles,
    same md5-derived hashes, same permutation constants, same
    no-shingles exclusion) but computed as array expressions on each row
    instead of a grouped aggregate — the form a streaming append
    pipeline can host.  The shingle hashes are staged into one array
    column first so the tokenize+md5 subtree evaluates once, not once
    per permutation.  At batch corpus scale prefer the grouped-agg twin
    (interpreted HOFs are ~60x slower there — dedup.py docstring); on a
    micro-batch tail the row count is small and the shuffle-free shape
    wins.
    """
    perms = minhash_perms(num_perm, seed)
    staged = (
        docs.withColumn("__sh", _word_shingles(F.col(text), shingle_n))
        .filter(F.size("__sh") > 0)
        .withColumn("__hs", F.transform("__sh", lambda s: md5_int(s)))
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform("__hs", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
            )
            for (a, b) in perms
        ]
    )
    return staged.select(F.col(id_col).cast("long").alias("id"), sig.alias("sig"))


def stream_near_dup_lsh(
    docs: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket: int = 64,
) -> DataFrame:
    """Incremental LSH candidate pairs over a document stream.

    Output (append): ``band, bh, id_a, id_b`` — one row per NEW band
    collision, ``id_a < id_b``; the same logical pair may appear under
    several bands (dedupe downstream).  State per bucket is its member
    id list, capped at ``max_bucket``.
    """

    def scan(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        band, bh = key
        ids: list[int] = list(state.get[0]) if state.exists else []
        known = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        # drain ALL Arrow chunks before sorting: a group larger than the
        # Arrow batch size arrives as several pdfs, and per-chunk sorting
        # would make admission order (and so the max_bucket member set)
        # depend on chunk boundaries — not replay-stable across recovery
        batch_ids = sorted(int(x) for pdf in pdfs for x in pdf["id"])
        for i in batch_ids:
            if i in known:
                continue
            if len(ids) >= max_bucket:
                break  # degenerate bucket: stop admitting members
            for j in ids:
                out_a.append(min(i, j))
                out_b.append(max(i, j))
            ids.append(i)
            known.add(i)
        state.update((ids,))
        if out_a:
            yield pd.DataFrame({"band": band, "bh": bh, "id_a": out_a, "id_b": out_b})

    sigs = rowwise_minhash_signatures(
        docs, text=text, id_col=id_col, num_perm=num_perm, shingle_n=shingle_n, seed=seed
    )
    banded = banded_rows(sigs, num_perm=num_perm, bands=bands)
    return banded.groupBy("band", "bh").applyInPandasWithState(
        scan,
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
