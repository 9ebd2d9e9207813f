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

# directory-mode state (see stream_near_dup_lsh state_groups): one state
# row per COARSE group holding every bucket routed to it as three
# parallel per-member arrays (bucket band, bucket hash, member id) —
# rebuild is a zip, serialization preserves admission order
_DIR_STATE = StructType(
    [
        StructField("bands", ArrayType(IntegerType()), True),
        StructField("bhs", ArrayType(StringType()), True),
        StructField("mids", ArrayType(LongType()), True),
    ]
)


# JVM-semantics text canonicalization twins (the expression path is
# lower/trim/regexp_replace('\\s+')): Java regex \s is ASCII-only
# ([ \t\n\x0B\f\r], unlike Python's unicode-aware default) and Spark
# SQL's trim() strips ONLY U+0020 (not Java String.trim()'s <= 0x20 —
# a leading \x0b survives trim and becomes a leading " " after the
# whitespace squash, yielding an empty first token; the Python twin
# must reproduce exactly that, test-pinned).
_JAVA_WS_RE = __import__("re").compile(r"[ \t\n\x0b\f\r]+")


def _py_minhash_rows(
    texts, ids, *, num_perm: int, shingle_n: int, seed: int
) -> tuple[list[int], list[list[int]]]:
    """NumPy minhash over an Arrow batch — bit-identical to the
    expression path (same md5-derived 28-bit hashes, same permutation
    constants, same no-shingles exclusion)."""
    import hashlib

    import numpy as np

    perms = minhash_perms(num_perm, seed)
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
    out_ids: list[int] = []
    out_sigs: list[list[int]] = []
    for doc_id, t in zip(ids, texts):
        if t is None:
            continue
        norm = _JAVA_WS_RE.sub(" ", str(t).strip(" ").lower())
        toks = norm.split(" ")
        if len(toks) < shingle_n:
            continue
        grams = {
            " ".join(toks[i : i + shingle_n]) for i in range(len(toks) - shingle_n + 1)
        }
        hs = np.array(
            [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:7], 16) for g in grams],
            dtype=np.int64,
        )[None, :]
        sig = ((A * hs + B) % MERSENNE_P).min(axis=1)
        out_ids.append(int(doc_id))
        out_sigs.append([int(x) for x in sig])
    return out_ids, out_sigs


def rowwise_minhash_signatures(
    docs: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """Per-ROW MinHash signatures: ``id, sig`` with no shuffle.

    Identical values to the batch ``minhash_signatures`` (same shingles,
    same md5-derived hashes, same permutation constants, same
    no-shingles exclusion) but computed per row instead of a grouped
    aggregate — the form a streaming append pipeline can host.

    Two implementations, equivalence pytest-pinned:

    * ``impl="arrow"`` (default) — ``mapInPandas`` with NumPy-vectorized
      permutations and Java-semantics text canonicalization.  Measured
      ~0.2 ms/doc vs ~1.9 ms/doc for the expression path at sf0.1
      (BASELINE.md round-4 streaming attribution): Spark's higher-order
      functions run INTERPRETED (no codegen), so 16 transform+array_min
      passes per row lose to one Arrow batch transfer + numpy matmul —
      the classic "when you must leave codegen, batch through Arrow"
      tradeoff, which this hot per-batch path must take.
    * ``impl="expr"`` — pure JVM array expressions (no Python workers);
      the shingle hashes are staged into one array column so the
      tokenize+md5 subtree evaluates once, not once per permutation.
      Zero-dependency fallback and the reference semantics the arrow
      path is tested against.

    At batch corpus scale prefer the grouped-agg twin (dedup.py).
    """
    if impl == "arrow":
        import pandas as pd

        from pyspark.sql.types import ArrayType, LongType, StructField, StructType

        out_schema = StructType(
            [
                StructField("id", LongType(), True),
                StructField("sig", ArrayType(LongType(), True), True),
            ]
        )
        np_, sn, sd = num_perm, shingle_n, seed

        def gen(pdfs):
            for pdf in pdfs:
                ids, sigs = _py_minhash_rows(
                    pdf[text], pdf[id_col], num_perm=np_, shingle_n=sn, seed=sd
                )
                yield pd.DataFrame(
                    {
                        "id": pd.Series(ids, dtype="int64"),
                        # object dtype: an EMPTY chunk otherwise infers
                        # float64, which Arrow cannot cast to list<int64>
                        "sig": pd.Series(sigs, dtype="object"),
                    }
                )

        return docs.select(F.col(id_col).cast("long").alias(id_col), text).mapInPandas(
            gen, schema=out_schema
        )
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r} (use 'arrow' or 'expr')")
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


def _load_directory(state: GroupState) -> dict[tuple[int, str], list[int]]:
    """Rebuild a directory-mode bucket map from the three parallel state
    arrays (admission order preserved)."""
    if not state.exists:
        return {}
    sb, sh, sm = state.get
    d: dict[tuple[int, str], list[int]] = {}
    for b, h, m in zip(sb, sh, sm):
        d.setdefault((int(b), h), []).append(int(m))
    return d


def _save_directory(state: GroupState, d: dict[tuple[int, str], list[int]]) -> None:
    sb2: list[int] = []
    sh2: list[str] = []
    sm2: list[int] = []
    for (b, h), ids in d.items():
        for m in ids:
            sb2.append(b)
            sh2.append(h)
            sm2.append(m)
    state.update((sb2, sh2, sm2))


def _admit_directory(
    d: dict[tuple[int, str], list[int]],
    newby: dict[tuple[int, str], list[int]],
    max_bucket: int,
) -> tuple[list[int], list[str], list[int], list[int]]:
    """Directory-mode admission, shared by the pre-banded and fused
    kernels so the two can never drift: sorted bucket order + sorted
    ids per bucket — identical admission to the per-bucket scan (which
    sorts the whole group's batch), replay-stable regardless of Arrow
    chunking."""
    ob: list[int] = []
    oh: list[str] = []
    oa: list[int] = []
    o2: list[int] = []
    for (b, h) in sorted(newby):
        ids = d.get((b, h), [])
        known = set(ids)
        for i in sorted(set(newby[(b, h)])):
            if i in known:
                continue
            if len(ids) >= max_bucket:
                break
            for j in ids:
                ob.append(b)
                oh.append(h)
                oa.append(min(i, j))
                o2.append(max(i, j))
            ids.append(i)
            known.add(i)
        d[(b, h)] = ids
    return ob, oh, oa, o2


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
    sig_impl: str = "arrow",
    state_groups: int | None = None,
    fuse_signatures: bool = False,
) -> DataFrame:
    """Incremental LSH candidate pairs over a document stream.

    Output (append): ``band, bh, id_a, id_b`` — one row per NEW band
    collision, ``id_a < id_b``; the same logical pair may appear under
    several bands (dedupe downstream).  State per bucket is its member
    id list, capped at ``max_bucket``.

    ``state_groups`` picks the state layout (pair-set identical either
    way — both are pytest-pinned to the batch operator).  The two
    layouts have DIFFERENT grouping keys and state schemas, so the
    choice is baked into a streaming checkpoint: restarting an existing
    query from a checkpoint written under the other layout fails state
    schema validation.  The library default is ``None`` (per-bucket) —
    the layout every pre-round-12 checkpoint used and the one that
    stays flat as state grows; short-lived benchmark-shaped runs opt
    into a small ``G`` explicitly (``bench.py`` passes
    ``state_groups=4, fuse_signatures=True``).

    * an int ``G`` — **directory mode**: state is keyed by
      ``hash(band, bh) % G`` and each of the G state rows holds a
      directory of every bucket routed to it.  Rationale (BASELINE.md
      round-12 decomposition): ``applyInPandasWithState`` pays a fixed
      per-GROUP cost (per-group Arrow slice + pandas frame + GroupState
      round-trip, ~0.25 ms) — with per-bucket keying a 250-doc trigger
      touches ~1,000 near-singleton groups, so the stateful stage cost
      is ~25x the useful work.  G groups bound that overhead; the
      per-bucket admission logic (sorted batch ids, ``max_bucket`` cap,
      insertion-order members) runs identically inside the directory.
      The trade is state churn: every touched group rewrites its whole
      directory, so size G to keep per-group state in low MBs
      (state ~= corpus_banded_rows / G members per group).
    * ``None`` — **per-bucket keying**: one state row per (band, bh).
      Only touched buckets load/commit per trigger, so churn stays
      O(batch) regardless of corpus size — the right layout when state
      is huge and triggers are large (the 100 TB tail-ingest case),
      at the cost of the per-group overhead above on small triggers.

    Measured (BASELINE.md round-12 longevity, 200 growing batches):
    directory starts ~1.6x faster but per-batch wall doubles as state
    grows (882 -> 1,775 ms); per-bucket starts slower and stays flat
    (1,416 -> 1,304 ms at 80k state rows).  Crossover ~60k banded
    members at G=8 — pick per-bucket for unbounded long-running ingest.

    ``fuse_signatures=True`` (requires an int ``state_groups``) removes
    the separate Arrow signature stage — the round-12 decomposition's
    remaining structural floor (TWO Python exchanges per trigger:
    mapInPandas signatures, then shuffle, then the stateful stage).
    Each trigger's raw docs are replicated to ALL G groups (an explode
    on a literal 0..G-1 array), and signatures + banding + bucket
    ownership (python-md5 ``hash(band, bh) % G``) run INSIDE the
    stateful kernel; each group admits only the buckets it owns, via
    the same shared admission routine.  The trade: signature work is
    done G times (vectorized, ~0.2 ms/doc — cheap) and the trigger's
    text crosses the shuffle G times — a cost bounded by TRIGGER size,
    never by state or corpus size, which is exactly the regime where
    the per-trigger fixed costs dominate and directory mode is the
    right layout anyway.  NOT checkpoint-compatible with the
    pre-banded directory layout despite the identical state schema
    (bucket->group assignment differs: python md5 vs JVM xxhash64) —
    resuming one from the other silently mis-routes buckets; keep the
    flag stable for a checkpoint's lifetime.
    """
    if fuse_signatures and state_groups is None:
        raise ValueError("fuse_signatures=True requires an int state_groups")
    if num_perm % bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must divide evenly into bands ({bands})"
        )

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

    def scan_dir(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        from collections import defaultdict

        d = _load_directory(state)
        newby: dict[tuple[int, str], list[int]] = defaultdict(list)
        for pdf in pdfs:
            for b, h, i in zip(pdf["band"], pdf["bh"], pdf["id"]):
                newby[(int(b), h)].append(int(i))
        ob, oh, oa, o2 = _admit_directory(d, newby, max_bucket)
        _save_directory(state, d)
        if oa:
            yield pd.DataFrame({"band": ob, "bh": oh, "id_a": oa, "id_b": o2})

    def scan_dir_fused(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import hashlib

        from collections import defaultdict

        g = int(key[0])
        d = _load_directory(state)
        newby: dict[tuple[int, str], list[int]] = defaultdict(list)
        rows = num_perm // bands
        for pdf in pdfs:
            ids_, sigs_ = _py_minhash_rows(
                pdf["__text"], pdf["id"],
                num_perm=num_perm, shingle_n=shingle_n, seed=seed,
            )
            for i, sig in zip(ids_, sigs_):
                for bi in range(bands):
                    bh = hashlib.md5(
                        ",".join(
                            str(x) for x in sig[bi * rows : (bi + 1) * rows]
                        ).encode()
                    ).hexdigest()
                    # bucket -> group ownership: python md5, NOT the JVM
                    # xxhash64 the pre-banded layout shuffles on — any
                    # fixed total assignment preserves the pair set
                    # (each bucket lives wholly in one group), but the
                    # two directory layouts are NOT checkpoint-
                    # interchangeable despite the shared state schema
                    own = int(
                        hashlib.md5(f"{bi}:{bh}".encode()).hexdigest()[:15], 16
                    ) % int(state_groups)
                    if own == g:
                        newby[(bi, bh)].append(i)
        ob, oh, oa, o2 = _admit_directory(d, newby, max_bucket)
        _save_directory(state, d)
        if oa:
            yield pd.DataFrame({"band": ob, "bh": oh, "id_a": oa, "id_b": o2})

    if fuse_signatures:
        replicated = docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(text).alias("__text"),
            F.explode(
                F.array(*[F.lit(g).cast("long") for g in range(int(state_groups))])
            ).alias("__g"),
        )
        return replicated.groupBy("__g").applyInPandasWithState(
            scan_dir_fused,
            outputStructType=PAIRS_SCHEMA,
            stateStructType=_DIR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    sigs = rowwise_minhash_signatures(
        docs,
        text=text,
        id_col=id_col,
        num_perm=num_perm,
        shingle_n=shingle_n,
        seed=seed,
        impl=sig_impl,
    )
    banded = banded_rows(sigs, num_perm=num_perm, bands=bands)
    if state_groups is None:
        return banded.groupBy("band", "bh").applyInPandasWithState(
            scan,
            outputStructType=PAIRS_SCHEMA,
            stateStructType=_BUCKET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    keyed = banded.withColumn(
        "__g", F.pmod(F.xxhash64(F.col("band"), F.col("bh")), F.lit(int(state_groups)))
    )
    return keyed.groupBy("__g").applyInPandasWithState(
        scan_dir,
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_DIR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

# -- incremental image near-dup (perceptual hash) ---------------------------

PHASH_PAIRS_SCHEMA = StructType(
    [
        StructField("band", IntegerType(), True),
        StructField("slice", LongType(), True),
        StructField("id_a", LongType(), True),
        StructField("id_b", LongType(), True),
        StructField("hamming", IntegerType(), True),
    ]
)

_PHASH_BUCKET_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType()), True),
        StructField("hashes", ArrayType(LongType()), True),
    ]
)


def stream_image_phash_pairs(
    media: DataFrame,
    *,
    max_hamming: int = 6,
    bands: int = 7,
    max_bucket: int = 64,
    on_error: str = "raise",
) -> DataFrame:
    """Incremental image near-dup pairs over a media stream — the
    streaming twin of ``llm.multimodal.image_phash_pairs``, built on the
    :func:`stream_near_dup_lsh` discipline:

    * per-row perceptual hashes (``image_phash`` — Arrow ``mapInPandas``,
      map-side only, so streaming append mode hosts it);
    * the SAME 7 x 9-bit pigeonhole banding as batch (complete for
      hamming < bands), so stream and batch bucket identically by
      construction;
    * state keyed by (band, slice): the bucket's member (id, phash)
      lists, capped at ``max_bucket`` — a new arrival emits one pair row
      per existing member within ``max_hamming`` (the exact
      ``bit_count(xor)`` verify runs IN STATE, so only true near-dups
      leave the operator), then joins the bucket.

    Output (append): ``band, slice, id_a, id_b, hamming`` with
    ``id_a < id_b``; the same logical pair may surface under several
    bands (dedupe downstream).  State is O(buckets x max_bucket) pairs
    of longs; the only shuffle is the groupBy((band, slice)) routing.
    A flood of near-identical images caps at ``max_bucket`` members
    (the degenerate-bucket guard, divergence documented as in the text
    twin).  Stream pair-set == batch pair-set is test-pinned, including
    cross-micro-batch pairs."""
    from ..llm.multimodal import image_phash

    assert max_hamming < bands, "pigeonhole completeness requires max_hamming < bands"
    band_bits = 63 // bands
    mask = (1 << band_bits) - 1

    def scan(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        band, slc = key
        if state.exists:
            ids = list(state.get[0])
            hashes = list(state.get[1])
        else:
            ids, hashes = [], []
        known = dict(zip(ids, hashes))
        rows_a: list[int] = []
        rows_b: list[int] = []
        rows_h: list[int] = []
        # drain all Arrow chunks, then admit in sorted order so the
        # max_bucket member set is replay-stable (the text twin's rule)
        batch = sorted(
            {
                (int(i), int(p))
                for pdf in pdfs
                for i, p in zip(pdf["media_id"], pdf["phash"])
            }
        )
        for i, p in batch:
            if i in known:
                continue
            if len(ids) >= max_bucket:
                break  # degenerate bucket: stop admitting members
            for j, q in zip(ids, hashes):
                h = bin(p ^ q).count("1")
                if h <= max_hamming:
                    rows_a.append(min(i, j))
                    rows_b.append(max(i, j))
                    rows_h.append(h)
            ids.append(i)
            hashes.append(p)
            known[i] = p
        state.update((ids, hashes))
        if rows_a:
            yield pd.DataFrame(
                {
                    "band": band,
                    "slice": slc,
                    "id_a": rows_a,
                    "id_b": rows_b,
                    "hamming": rows_h,
                }
            )

    fps = image_phash(media, on_error=on_error)
    banded = fps.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("phash", bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("slice"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band", "b.slice")
    return banded.groupBy("band", "slice").applyInPandasWithState(
        scan,
        outputStructType=PHASH_PAIRS_SCHEMA,
        stateStructType=_PHASH_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
