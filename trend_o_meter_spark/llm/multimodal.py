"""Multimodal column conventions: opaque binary payloads + typed metadata.

A large-scale training-data pipeline carries images/audio/video as opaque
``BinaryType`` columns next to typed metadata, and runs decode / feature
extraction / resize / frame-sampling as Arrow-batched Pandas UDFs.  The
reference engine (rpj/trend-o-meter) has no binary I/O at all — payloads
are JSON text (trend-o-meter:290,385) and byte size is approximated by
string length (X12, trend-o-meter:496) — so this module is north-star
surface (SURVEY §7.2 phase 6), built Spark-first:

* the JVM never interprets the payload — binary stays opaque through
  shuffle/scan; only ``octet_length``/``md5``/``substring`` touch it
  JVM-side, and real decoding happens in Arrow-batched ``mapInPandas``;
* media metadata is a typed struct column, so filters on e.g. ``width``
  are ordinary Catalyst predicates and get pushed to the parquet scan —
  at 100 TB you prune by metadata before ever shuffling payload bytes;
* frame sampling is expressed with ``sequence`` + ``transform`` (JVM,
  whole-stage codegen) — one output row per sampled frame without a
  Python round-trip;
* PIL/libav are NOT in this container, so :func:`decode_media` defaults
  to a clearly-marked deterministic fake decoder (`numpy.frombuffer`
  over the raw bytes); ``real=True`` dispatches to the dependency-free
  pure-Python codecs in :mod:`.codecs` (uncompressed 24-bit BMP, binary
  PPM) and decodes ACTUAL pixels — any other format (PNG/JPEG/audio/
  video) raises ``NotImplementedError`` loudly.  The Spark-side
  plumbing — schema, Arrow batch shape, partitioning — is identical on
  both kernels and tested on both.

The synthetic media table derives from ``documents``: the payload is the
UTF-8 encoding of the ASCII-sanitized text (so byte offsets == char
offsets, letting the DuckDB oracle — whose blob functions are limited —
replicate frame hashes on the VARCHAR side), and media_type/meta are
deterministic functions of ``doc_id``/size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_BYTES = 32  # one "frame" = 32 payload bytes in the synthetic corpus

# Sanitize non-ASCII to '?' in BOTH engines so byte and char offsets agree.
_ASCII_RE = "[^\\x20-\\x7E]"


def media_table(
    docs: DataFrame, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """documents -> media table ``(media_id, media_type, content BINARY, meta STRUCT)``.

    media_type cycles image/audio/video by id; meta carries the typed
    per-modality fields (image: width/height; audio: sample_rate;
    video: n_frames) — nulls for the non-applicable slots, as a real
    mixed-modality table would.
    """
    ascii_text = F.regexp_replace(F.col(text), _ASCII_RE, "?")
    content = F.encode(ascii_text, "UTF-8")
    n_bytes = F.octet_length(content)
    mtype = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.when(mtype == "image", (n_bytes % 64) + 16).cast("int").alias("width"),
        F.when(mtype == "image", (n_bytes % 48) + 16).cast("int").alias("height"),
        F.when(mtype == "audio", ((F.col(id_col) % 3) + 1) * 8000)
        .cast("int")
        .alias("sample_rate"),
        F.when(mtype == "video", F.floor(n_bytes / FRAME_BYTES))
        .cast("int")
        .alias("n_frames"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        mtype.alias("media_type"),
        content.alias("content"),
        meta.alias("meta"),
    )


def _media_table_sql_parts(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    """DuckDB CTE mirroring :func:`media_table`, with the payload kept as
    VARCHAR (``atext``) since DuckDB lacks blob substring/md5 — sanitized
    ASCII makes the two representations byte-identical."""
    return f"""
media AS (
  SELECT {id_col} AS media_id,
         CASE WHEN {id_col} % 3 = 0 THEN 'image'
              WHEN {id_col} % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         regexp_replace({text}, '{_ASCII_RE}', '?', 'g') AS atext,
         length(regexp_replace({text}, '{_ASCII_RE}', '?', 'g')) AS n_bytes
  FROM {table}
)"""


def media_meta(media: DataFrame) -> DataFrame:
    """Typed-metadata projection + payload fingerprint — all JVM-side.

    ``content_md5`` hashes the raw bytes (Spark ``md5`` accepts BINARY);
    the oracle hashes the equivalent VARCHAR (md5 of its UTF-8 bytes —
    identical by construction).  This is the "prune by metadata before
    touching payloads" scan shape.
    """
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def media_meta_sql(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte}
SELECT media_id, media_type, n_bytes, md5(atext) AS content_md5,
  CAST(CASE WHEN media_type = 'image' THEN (n_bytes % 64) + 16 END AS INT) AS width,
  CAST(CASE WHEN media_type = 'image' THEN (n_bytes % 48) + 16 END AS INT) AS height,
  CAST(CASE WHEN media_type = 'audio' THEN ((media_id % 3) + 1) * 8000 END AS INT) AS sample_rate,
  CAST(CASE WHEN media_type = 'video' THEN floor(n_bytes / {FRAME_BYTES}) END AS INT) AS n_frames
FROM media
"""


def resize_meta_sql(
    table: str, *, width: int, height: int, id_col: str = "doc_id", text: str = "text"
) -> str:
    """Oracle for :func:`media_meta` AFTER :func:`resize_image`: image
    rows carry the target width/height, every other column is the
    media_meta projection unchanged (the fake resize rewrites metadata
    only — payload bytes, and so the fingerprint, are untouched)."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte}
SELECT media_id, media_type, n_bytes, md5(atext) AS content_md5,
  CAST(CASE WHEN media_type = 'image' THEN {width} END AS INT) AS width,
  CAST(CASE WHEN media_type = 'image' THEN {height} END AS INT) AS height,
  CAST(CASE WHEN media_type = 'audio' THEN ((media_id % 3) + 1) * 8000 END AS INT) AS sample_rate,
  CAST(CASE WHEN media_type = 'video' THEN floor(n_bytes / {FRAME_BYTES}) END AS INT) AS n_frames
FROM media
"""


def frame_sample(
    media: DataFrame, *, every: int = 4, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from video payloads.

    JVM-only: ``sequence`` generates sampled frame indices, ``transform``
    slices each frame (binary substring) and fingerprints it, and one
    ``explode`` emits a row per sampled frame — no Python round-trip and
    no shuffle until a downstream agg asks for one.  At 100 TB this is
    the shape you want: frame extraction is embarrassingly parallel and
    the emitted rows carry a 32-char hash, not the frame bytes.
    """
    n_frames = F.col("meta.n_frames")
    frames = F.expr(
        f"transform(sequence(0, meta.n_frames - 1, {every}), "
        f"i -> struct(i AS frame_idx, "
        f"md5(substring(content, i * {frame_bytes} + 1, {frame_bytes})) AS frame_md5))"
    )
    return (
        media.filter((F.col("media_type") == "video") & (n_frames > 0))
        .select("media_id", F.explode(frames).alias("f"))
        .select(
            "media_id",
            F.col("f.frame_idx").cast("long").alias("frame_idx"),
            F.col("f.frame_md5").alias("frame_md5"),
        )
    )


def frame_sample_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    every: int = 4,
    frame_bytes: int = FRAME_BYTES,
) -> str:
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte},
vids AS (
  SELECT media_id, atext, CAST(floor(n_bytes / {frame_bytes}) AS INT) AS n_frames
  FROM media WHERE media_type = 'video' AND n_bytes >= {frame_bytes}
)
SELECT media_id,
       CAST(i AS BIGINT) AS frame_idx,
       md5(substring(atext, i * {frame_bytes} + 1, {frame_bytes})) AS frame_md5
FROM vids, unnest(range(0, n_frames, {every})) AS t(i)
"""


# -- Arrow-batched decode / feature extraction (the Python-side path) -----

DECODE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_byte", DoubleType(), True),
        StructField("std_byte", DoubleType(), True),
        StructField("byte_histogram", ArrayType(LongType()), True),
        StructField("feature_vec", ArrayType(DoubleType()), True),
    ]
)

FEATURE_DIM = 8

REAL_DECODE_SCHEMA = StructType(
    list(DECODE_FEATURES_SCHEMA.fields)
    + [
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def decode_media(
    media: DataFrame, *, real: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Decode payloads and extract a feature vector per media row.

    Two kernels over the same Arrow/``mapInPandas`` plumbing:

    * default (``real=False``): a deterministic fake decoder — the
      payload is interpreted as a raw uint8 array and reduced to byte
      statistics + an ``FEATURE_DIM``-chunk mean vector.  Schema
      ``DECODE_FEATURES_SCHEMA``; this is the driver-visible path.
    * ``real=True``: ACTUAL image decoding via the dependency-free
      :mod:`.codecs` (uncompressed 24-bit BMP, binary PPM, 8-bit PNG,
      baseline JPEG).  The same feature family is computed over DECODED
      PIXEL values, plus ``width`` / ``height`` from the decoded
      geometry (schema ``REAL_DECODE_SCHEMA``).  Payloads in any other
      format (or arithmetic-coded/12-bit JPEG) raise ``NotImplementedError``
      — loudly, per-row, on the executor.

    Scale notes: batches arrive Arrow-encoded per input partition; with
    ~MB-sized payloads tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
    down so a batch fits executor memory.  Output drops the payload
    column, so downstream stages shuffle features, not bytes.
    """
    import numpy as np  # local import: runs on executors

    schema = REAL_DECODE_SCHEMA if real else DECODE_FEATURES_SCHEMA
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                wh: tuple = ()
                if real:
                    try:
                        img = codecs.decode_image(bytes(content))
                    except (ValueError, NotImplementedError):
                        # ADVICE r09: skip ONLY what decode_errors will
                        # RECORD (the features(skip) ∪ decode_errors
                        # partition invariant) — a strictly-sniffed image
                        # payload that fails decode_image fails
                        # identically in the quarantine scan.  Anything
                        # else (unknown magic, or an audio/video container
                        # fed to the image kernel) would vanish silently
                        # under skip — re-raise instead.
                        if on_error == "skip" and codecs.sniff_strict(
                            bytes(content)
                        ) in ("png", "bmp", "ppm", "jpeg"):
                            continue
                        raise
                    arr = img.reshape(-1)
                    wh = (img.shape[1], img.shape[0])
                else:
                    arr = np.frombuffer(content, dtype=np.uint8)
                n = int(arr.size)
                if n == 0:
                    out.append((int(mid), mtype, 0, None, None, None, None, *wh))
                    continue
                hist = np.bincount(arr >> 5, minlength=8).astype("int64")
                # stats from EXACT integer sums with a fixed float
                # expression (one division / multiply / sqrt each, in this
                # order) — bit-reproducible by the SQL oracle, unlike
                # numpy's mean/std reductions whose summation order is an
                # implementation detail
                s = arr.astype("int64")
                s1, s2 = int(s.sum()), int((s * s).sum())
                mean = float(s1) / n
                var = float(s2) / n - mean * mean
                std = float(np.sqrt(var)) if var >= 0 else 0.0
                chunks = np.array_split(s, FEATURE_DIM)
                feat = [
                    float(int(c.sum())) / int(c.size) if c.size else 0.0
                    for c in chunks
                ]
                out.append(
                    (int(mid), mtype, n, mean, std, hist.tolist(), feat, *wh)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return media.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=schema
    )


def decode_features_sql(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    """Oracle twin of the driver's ``decode_features`` wrapper (the FAKE
    decode kernel + the registry's array-serialization discipline):
    byte statistics, the 8-bin ``code >> 5`` histogram CSV, and the
    ``numpy.array_split``-chunked mean vector (first ``n % 8`` chunks
    one element longer), quantized at 1e6 — computed straight from
    character codes of the sanitized payload.  Every float op mirrors
    the kernel's fixed expression over exact integer sums, so the match
    is hash-exact; the Arrow/mapInPandas kernel itself is what's under
    test.  Empty payloads emit the kernel's all-NULL row."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte},
codes AS (
  SELECT media_id, n_bytes, CAST(t.i - 1 AS BIGINT) AS pos,
         ascii(substring(atext, CAST(t.i AS INT), 1)) AS c
  FROM media, unnest(range(1, n_bytes + 1)) AS t(i)
  WHERE n_bytes > 0
),
-- numpy.array_split(n, 8): k = n // 8, r = n % 8; the first r chunks
-- have k+1 elements (CASE is lazy, so k = 0 never divides)
chunked AS (
  SELECT media_id, c,
    CASE WHEN pos < (n_bytes % 8) * ((n_bytes // 8) + 1)
         THEN pos // ((n_bytes // 8) + 1)
         ELSE (n_bytes % 8) + (pos - (n_bytes % 8) * ((n_bytes // 8) + 1)) // (n_bytes // 8)
    END AS chunk
  FROM codes
),
slots AS (
  SELECT media_id, CAST(g.i AS BIGINT) AS slot
  FROM media, unnest(range(0, 8)) AS g(i) WHERE n_bytes > 0
),
stats AS (
  SELECT media_id,
         CAST(sum(c) AS DOUBLE) / count(*) AS mean_byte,
         CAST(sum(CAST(c AS BIGINT) * c) AS DOUBLE) / count(*) AS s2n
  FROM codes GROUP BY media_id
),
hist AS (
  SELECT media_id, c // 32 AS slot, count(*) AS cnt FROM codes GROUP BY 1, 2
),
histvec AS (
  SELECT s.media_id,
         string_agg(CAST(coalesce(h.cnt, 0) AS VARCHAR), ',' ORDER BY s.slot)
           AS byte_histogram_csv
  FROM slots s LEFT JOIN hist h ON s.media_id = h.media_id AND s.slot = h.slot
  GROUP BY s.media_id
),
chunk_means AS (
  SELECT media_id, chunk, CAST(sum(c) AS DOUBLE) / count(*) AS fmean
  FROM chunked GROUP BY 1, 2
),
featvec AS (
  SELECT s.media_id,
         string_agg(
           CAST(CAST(round(coalesce(f.fmean, 0.0) * 1000000.0) AS BIGINT) AS VARCHAR),
           ',' ORDER BY s.slot) AS feature_vec_q6
  FROM slots s LEFT JOIN chunk_means f
    ON s.media_id = f.media_id AND s.slot = f.chunk
  GROUP BY s.media_id
)
SELECT m.media_id, m.media_type, CAST(m.n_bytes AS BIGINT) AS n_bytes,
  st.mean_byte,
  CASE WHEN st.s2n - st.mean_byte * st.mean_byte >= 0
       THEN sqrt(st.s2n - st.mean_byte * st.mean_byte) ELSE 0.0 END AS std_byte,
  hv.byte_histogram_csv, fv.feature_vec_q6
FROM media m
JOIN stats st USING (media_id)
JOIN histvec hv USING (media_id)
JOIN featvec fv USING (media_id)
WHERE m.n_bytes > 0
UNION ALL
SELECT media_id, media_type, 0, NULL, NULL, NULL, NULL
FROM media WHERE n_bytes = 0
"""


# -- audio: real WAV codec round-trip ------------------------------------

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("peak", LongType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)

# Synthetic-PCM mapping: payload byte b -> int16 sample (b - 80) * 256.
# Printable-ASCII payloads (0x20-0x7E after sanitization) land in
# [-24576, 11776] — well inside int16, sign varies around 'P' (0x50), so
# zero-crossing counts are non-trivial.
_SYNTH_OFFSET = 80


def audio_features(media: DataFrame, *, on_error: str = "raise") -> DataFrame:
    """Decode audio payloads through the REAL WAV codec and extract
    sample-domain features (duration, peak, RMS, zero crossings).

    Two payload shapes, one code path:

    * a payload that sniffs as RIFF/WAVE is decoded directly
      (:func:`.codecs.decode_wav` — 16-bit PCM);
    * any other payload (the synthetic corpus: UTF-8 text bytes) is
      mapped to PCM (``(byte - 80) * 256`` int16), ENCODED to a WAV
      container at ``meta.sample_rate``, then decoded back — so the
      codec round-trip genuinely executes per row and any header/layout
      bug breaks the features.

    The DuckDB oracle (:func:`audio_features_sql`) computes the same
    features straight from the character codes, making the round-trip
    hash-checkable: all sums are exact integers (sample values bounded,
    counts < 2^53), the only float ops are one division and one
    correctly-rounded ``sqrt``, identical in both engines.  Zero
    crossings use the sign-product rule (``s[i-1] * s[i] < 0``) —
    no ambiguity at exact zeros.

    Scale shape: Arrow-batched ``mapInPandas`` per input partition;
    output rows carry 7 scalars, not payload bytes, so downstream
    shuffles are metadata-sized.

    ``on_error``: ``'raise'`` (default) or ``'skip'`` — corrupt WAV
    payloads (routine in a scraped corpus) drop out instead of killing
    the job; :func:`decode_errors` returns the quarantine set.
    """
    import numpy as np  # local import: runs on executors

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        for pdf in it:
            out = []
            for mid, content, meta_rate in zip(
                pdf["media_id"], pdf["content"], pdf["rate"]
            ):
                raw = bytes(content)
                if codecs.sniff(raw) == "wav":
                    try:
                        samples, rate = codecs.decode_wav(raw)
                    except (ValueError, NotImplementedError):
                        if on_error == "skip":
                            continue
                        raise
                else:
                    if meta_rate is None or pd.isna(meta_rate):
                        raise ValueError(
                            f"media_id {mid}: non-WAV audio payload needs "
                            "meta.sample_rate to synthesize PCM"
                        )
                    rate = int(meta_rate)
                    # int32 then clip: bytes >= 208 would silently WRAP in
                    # int16 arithmetic; sanitized ASCII (<= 0x7E) is
                    # unaffected, arbitrary binary saturates instead
                    pcm = np.clip(
                        (np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                         - _SYNTH_OFFSET) * 256,
                        -32768, 32767,
                    ).astype(np.int16)
                    samples, rate = codecs.decode_wav(codecs.encode_wav(pcm, rate))
                s = samples[:, 0].astype(np.int64)
                n = int(s.size)
                if n == 0:
                    continue
                rms = float(np.sqrt(float((s * s).sum()) / n))
                zc = int(((s[:-1] * s[1:]) < 0).sum())
                out.append(
                    (int(mid), rate, n, n / rate, int(np.abs(s).max()), rms, zc)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return (
        media.filter((F.col("media_type") == "audio") & (F.octet_length("content") > 0))
        .select("media_id", "content", F.col("meta.sample_rate").alias("rate"))
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


def audio_features_sql(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    """Oracle twin of :func:`audio_features` over the synthetic corpus:
    the same features computed straight from character codes — if the
    WAV encode/decode round-trip corrupts a single sample, the hash
    diverges."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte},
audio AS (
  SELECT media_id, atext, ((media_id % 3) + 1) * 8000 AS sample_rate
  FROM media WHERE media_type = 'audio' AND n_bytes > 0
),
samples AS (
  SELECT media_id, sample_rate, t.i AS pos,
         (ascii(substring(atext, CAST(t.i AS INT), 1)) - {_SYNTH_OFFSET}) * 256 AS s
  FROM audio, unnest(range(1, length(atext) + 1)) AS t(i)
),
seq AS (
  SELECT media_id, sample_rate, s,
         lag(s) OVER (PARTITION BY media_id ORDER BY pos) AS prev
  FROM samples
)
SELECT media_id, CAST(sample_rate AS BIGINT) AS sample_rate,
  count(*) AS n_samples,
  CAST(count(*) AS DOUBLE) / sample_rate AS duration_s,
  CAST(max(abs(s)) AS BIGINT) AS peak,
  sqrt(CAST(sum(CAST(s AS BIGINT) * s) AS DOUBLE) / count(*)) AS rms,
  CAST(sum(CASE WHEN prev IS NOT NULL AND prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS zero_crossings
FROM seq
GROUP BY media_id, sample_rate
"""


def resample_audio(media: DataFrame, *, rate: int) -> DataFrame:
    """Resample audio payloads to ``rate`` Hz through the real WAV codec:
    decode (or synthesize, for non-WAV payloads — same rule as
    :func:`audio_features`), linear-interpolation resample
    (:func:`.codecs.resample_linear`), re-encode as WAV at the target
    rate.  Non-audio rows pass through untouched; ``meta.sample_rate``
    is updated on audio rows — the audio twin of :func:`resize_image`
    with ``real=True``.
    """
    import numpy as np  # noqa: F401  (executor-side dependency)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _resample(content: pd.Series, mtype: pd.Series, meta_rate: pd.Series) -> pd.Series:
        import numpy as np

        from . import codecs

        out = []
        for b, t, r in zip(content, mtype, meta_rate):
            if t != "audio":
                out.append(b)
                continue
            raw = bytes(b)
            if codecs.sniff(raw) == "wav":
                samples, src = codecs.decode_wav(raw)
            else:
                src = int(r)
                samples = np.clip(
                    (np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                     - _SYNTH_OFFSET) * 256,
                    -32768, 32767,
                ).astype(np.int16)[:, None]
            out.append(
                codecs.encode_wav(
                    codecs.resample_linear(samples, src_rate=src, dst_rate=rate), rate
                )
            )
        return pd.Series(out)

    new_meta = F.struct(
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.when(F.col("media_type") == "audio", F.lit(rate))
        .otherwise(F.col("meta.sample_rate"))
        .cast("int")
        .alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return media.withColumn(
        "content",
        _resample(F.col("content"), F.col("media_type"), F.col("meta.sample_rate")),
    ).withColumn("meta", new_meta)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("fps", LongType(), False),
        StructField("mean_pixel", DoubleType(), False),
        StructField("std_pixel", DoubleType(), False),
    ]
)


def video_frame_features(media: DataFrame, *, every: int = 1) -> DataFrame:
    """REAL video decode: AVI payloads (uncompressed DIB frames — the
    third modality's dependency-free codec in :mod:`.codecs`) decode to
    pixel arrays; every ``every``-th frame emits one row of geometry +
    pixel statistics.  Non-AVI payloads raise per-row on the executor
    (the exotic-formats contract); filter by ``media_type`` / magic
    upstream.  Same Arrow/mapInPandas shape as the other decode paths —
    output rows carry scalars, never frame bytes.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, fps = codecs.decode_avi(bytes(content))
                n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
                for i in range(0, n, every):
                    s = frames[i].astype("int64").reshape(-1)
                    cnt = int(s.size)
                    s1, s2 = int(s.sum()), int((s * s).sum())
                    mean = float(s1) / cnt
                    var = float(s2) / cnt - mean * mean
                    std = float(np.sqrt(var)) if var >= 0 else 0.0
                    out.append((int(mid), i, w, h, fps, mean, std))
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA
    )


# Synthetic-AVI geometry: one FRAME_BYTES (32-byte) slice of the payload
# becomes one 16x2 frame — w=2 makes the DIB row 6 bytes, so every row
# carries 2 padding bytes and the codec's 4-byte stride path genuinely
# executes per row.  Channels per byte v: (R, G, B) = (v, v // 2, 255 - v)
# (sanitized ASCII v <= 126, so all three stay in uint8 without wrap).
_VID_H, _VID_W = 16, 2


def video_features_corpus(media: DataFrame, *, every: int = 2) -> DataFrame:
    """Registry wrapper: the synthetic corpus's video rows -> REAL
    uncompressed-AVI payloads -> :func:`video_frame_features` — the
    audio_features recipe (encode through the real codec, decode back,
    reduce to stats) for the third modality.

    Frame ``f`` of media ``m`` covers payload bytes ``[f*32, (f+1)*32)``
    reshaped to a 16x2 grayscale grid ``v`` with channels
    ``(v, v // 2, 255 - v)``; ``fps = (media_id % 24) + 1``; trailing
    bytes short of a full frame drop (the ``floor(n_bytes / 32)``
    n_frames convention of :func:`media_table`).  The whole AVI container
    (RIFF tree, avih/strh/strf headers, bottom-up BGR DIB bodies with
    stride padding) is built and re-parsed per row, so one corrupted
    byte anywhere in encode_avi/decode_avi breaks the feature hash
    against :func:`video_frame_features_sql`, which recomputes the same
    stats straight from character codes.

    Scale shape: Arrow-batched ``mapInPandas`` to synthesize payloads,
    then the operator's own mapInPandas decode — output rows are 7
    scalars, never frame bytes.
    """
    import numpy as np  # local import: runs on executors

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                nf = len(raw) // FRAME_BYTES
                if nf == 0:
                    continue
                v = np.frombuffer(raw[: nf * FRAME_BYTES], dtype=np.uint8)
                v = v.reshape(nf, _VID_H, _VID_W)
                frames = np.stack([v, v // 2, 255 - v], axis=-1)
                out.append(
                    (int(mid), codecs.encode_avi(frames, fps=int(mid) % 24 + 1))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    avi = (
        media.filter(
            (F.col("media_type") == "video")
            & (F.octet_length("content") >= FRAME_BYTES)
        )
        .select("media_id", "content")
        .mapInPandas(synth, schema="media_id long, content binary")
    )
    return video_frame_features(avi, every=every)


def video_frame_features_sql(
    table: str, *, every: int = 2, id_col: str = "doc_id", text: str = "text"
) -> str:
    """Oracle twin of :func:`video_features_corpus`: per-sampled-frame
    mean/std recomputed straight from character codes — the AVI
    encode/decode round-trip corrupting a single pixel, frame index,
    header field, or stride byte diverges the hash.  All sums are exact
    integers; the float tail is the image_features expression (one
    division each, one correctly-rounded sqrt), identical in both
    engines."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    npx = _VID_H * _VID_W * 3
    return f"""
WITH {cte},
vids AS (
  SELECT media_id, atext, CAST(n_bytes // {FRAME_BYTES} AS BIGINT) AS n_frames,
         (media_id % 24) + 1 AS fps
  FROM media WHERE media_type = 'video' AND n_bytes >= {FRAME_BYTES}
),
frames AS (
  SELECT media_id, fps, atext, CAST(t.i AS BIGINT) AS frame_idx
  FROM vids, unnest(range(0, n_frames, {every})) AS t(i)
),
codes AS (
  SELECT media_id, frame_idx, fps,
         ascii(substring(atext,
               CAST(frame_idx * {FRAME_BYTES} + u.j + 1 AS INT), 1)) AS c
  FROM frames, unnest(range(0, {FRAME_BYTES})) AS u(j)
),
stats AS (
  SELECT media_id, frame_idx, any_value(fps) AS fps,
         CAST(sum(c // 2) + 255 * {FRAME_BYTES} AS DOUBLE) / {npx} AS mean_pixel,
         CAST(sum(CAST(c AS BIGINT) * c + (c // 2) * (c // 2)
                  + (255 - c) * (255 - c)) AS DOUBLE) / {npx} AS s2n
  FROM codes GROUP BY 1, 2
)
SELECT media_id, frame_idx,
  CAST({_VID_W} AS BIGINT) AS width, CAST({_VID_H} AS BIGINT) AS height,
  CAST(fps AS BIGINT) AS fps, mean_pixel,
  CASE WHEN s2n - mean_pixel * mean_pixel >= 0
       THEN sqrt(s2n - mean_pixel * mean_pixel) ELSE 0.0 END AS std_pixel
FROM stats
"""


def resize_image(media: DataFrame, *, width: int, height: int, real: bool = False) -> DataFrame:
    """Resize to ``width x height``.

    Fake path (default): re-tags image metadata only — proves the
    transform's schema contract (same columns in/out, meta.width/height
    updated) without touching payload bytes.

    ``real=True``: decodes image-typed payloads with :mod:`.codecs`
    (BMP/PPM/PNG/JPEG), nearest-neighbor resamples the pixels, and RE-ENCODES in
    the payload's own format — content, fingerprint, and metadata all
    change, like a production resize.  Non-image rows pass through
    untouched; an image row in an unsupported format raises
    ``NotImplementedError`` on the executor.
    """
    new_meta = F.struct(
        F.when(F.col("media_type") == "image", F.lit(width)).cast("int").alias("width"),
        F.when(F.col("media_type") == "image", F.lit(height)).cast("int").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    if not real:
        return media.withColumn("meta", new_meta)

    from pyspark.sql.types import BinaryType
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _resize(content: pd.Series, mtype: pd.Series) -> pd.Series:
        from . import codecs  # executor-side import

        out = []
        for b, t in zip(content, mtype):
            if t != "image":
                out.append(b)
                continue
            raw = bytes(b)
            fmt = codecs.sniff(raw)
            img = codecs.decode_image(raw)
            resized = codecs.resize_nearest(img, width=width, height=height)
            out.append(codecs.encode_image(resized, fmt))
        return pd.Series(out)

    return media.withColumn(
        "content", _resize(F.col("content"), F.col("media_type"))
    ).withColumn("meta", new_meta)


# -- perceptual hash: DCT-based image near-dup fingerprints ----------------

# Quantized top-8x32 slice of the orthonormal 32-point DCT-II basis:
# B[u][x] = sqrt(2/32) * c(u) * cos((2x+1) u pi / 64), c(0) = 1/sqrt(2),
# scaled by 1e9 and rounded ONCE here — the oracle SQL embeds these same
# integers (generated from this constant), so both engines run an
# ALL-INTEGER pipeline with zero float drift anywhere.
PHASH_SCALE = 10**9
PHASH_GRID = 32
PHASH_K = 8


def _phash_basis() -> list[list[int]]:
    import numpy as np

    out = []
    for u in range(PHASH_K):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        out.append(
            [
                int(
                    np.rint(
                        np.sqrt(2.0 / PHASH_GRID)
                        * c
                        * np.cos((2 * x + 1) * u * np.pi / (2 * PHASH_GRID))
                        * PHASH_SCALE
                    )
                )
                for x in range(PHASH_GRID)
            ]
        )
    return out


PHASH_BASIS = _phash_basis()

IMAGE_PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)


def _phash64(img) -> int:
    """63-bit perceptual hash of an RGB uint8 array — the classic pHash
    construction (32x32 nearest resample -> 2-D DCT -> top 8x8 minus DC
    thresholded at the median), made CROSS-ENGINE EXACT by integer-only
    arithmetic: grayscale = channel SUM (threshold-invariant vs /3),
    nearest indices by floor division, the quantized basis above, exact
    integer sums (stage 1 in int64 numpy — bounded 6e12; stage 2 in
    Python bigints — bounded ~1.5e21), and an exact order-statistic
    median (32nd of 63)."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    gray = img.astype(np.int64).sum(axis=2)
    ys = [(y * h) // PHASH_GRID for y in range(PHASH_GRID)]
    xs = [(x * w) // PHASH_GRID for x in range(PHASH_GRID)]
    g = gray[np.ix_(ys, xs)]  # (32, 32) int64, values <= 765
    b = np.array(PHASH_BASIS, dtype=np.int64)  # (8, 32)
    p = b @ g  # (8, 32), |p| <= 32 * 2.5e8 * 765 ~ 6e12: int64-safe
    pl = p.tolist()
    bl = PHASH_BASIS
    ac = []
    for u in range(PHASH_K):
        row = pl[u]
        for v in range(PHASH_K):
            if u == 0 and v == 0:
                continue
            col = bl[v]
            ac.append(sum(row[c] * col[c] for c in range(PHASH_GRID)))
    med = sorted(ac)[31]  # exact lower median of the 63 AC terms
    bits = 0
    for i, t in enumerate(ac):
        if t > med:
            bits |= 1 << i
    return bits


def image_phash(media: DataFrame, *, on_error: str = "raise") -> DataFrame:
    """Per-image perceptual-hash fingerprints — the IMAGE-domain sibling
    of the text pipeline's SimHash: visually near-identical images
    (re-encoded, lightly corrupted, requantized) land within a small
    hamming distance, so image corpora dedup with the same banded-join
    machinery as text.

    Payload handling mirrors :func:`image_features`: structurally
    sniffed media decode for real (all six codecs); anything else (the
    synthetic corpus) tiles into the deterministic w x h RGB array, so
    the DuckDB oracle (:func:`image_phash_sql`) reproduces the hash
    bit-for-bit straight from character codes.  ``on_error``:
    ``'raise'`` or ``'skip'`` (see :func:`decode_errors`).

    Scale shape: Arrow-batched ``mapInPandas``; output is (media_id,
    63-bit BIGINT) — two columns, never pixels."""
    import numpy as np  # local import: runs on executors

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if codecs.sniff_strict(raw) in ("png", "bmp", "ppm", "jpeg"):
                    try:
                        img = codecs.decode_image(raw)
                    except (ValueError, NotImplementedError):
                        if on_error == "skip":
                            continue
                        raise
                else:
                    n = len(raw)
                    w = (n % 24) + 8
                    h = (n % 16) + 8
                    need = w * h * 3
                    tiled = (raw * (need // n + 1))[:need]
                    img = np.frombuffer(tiled, dtype=np.uint8).reshape(h, w, 3)
                out.append((int(mid), _phash64(img)))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return (
        media.filter(
            (F.col("media_type") == "image") & (F.octet_length("content") > 0)
        )
        .select("media_id", "content")
        .mapInPandas(batches, schema=IMAGE_PHASH_SCHEMA)
    )


def image_phash_pairs(
    media: DataFrame,
    *,
    max_hamming: int = 6,
    bands: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-dup pairs: hamming(phash_a, phash_b) <= k via the same
    pigeonhole banding as the text SimHash operator — the 63-bit hash
    splits into 7 x 9-bit slices, so any pair within hamming < 7 agrees
    exactly on >= 1 slice; candidates come from the (band, slice)
    equi-join (keyed shuffle, never a cross product), then the exact
    ``bit_count(xor)`` filter runs per candidate.

    ``max_bucket`` (the SCALE.md degenerate-bucket mitigation, same
    contract as :func:`..dedup.minhash_lsh_pairs`): a (band, slice)
    bucket holding b fingerprints contributes O(b^2) candidates, so a
    degenerate slice — a web corpus full of blank/near-black thumbnails
    that all share one 9-bit band value — turns the keyed join
    quadratic.  With ``max_bucket=N`` any bucket larger than N is
    dropped BEFORE the self-join (one extra keyed agg, no extra pass
    over pixels).  Capped output is an exact LOWER BOUND of the
    uncapped pair set: members of an over-cap bucket are near-identical
    images best handled by exact (hamming-0 / byte-hash) dedup first,
    and normal pairs still meet in their other band slices.  Off
    (None) in the oracle-checked registry path."""
    from .. import lineage

    # the banded self-join consumes the fingerprint lineage on BOTH sides
    # (the two alias branches do not canonicalize to a reusable exchange —
    # the before plan shows two MapInPandas decode passes), and with a
    # bucket cap the count aggregation is a third consumer.  The cut frame
    # is O(images) scalars; the per-image decode runs once.
    fps = lineage.cut(image_phash(media))
    return _phash_pairs_from_fps(
        fps,
        max_hamming=max_hamming,
        bands=bands,
        max_bucket=max_bucket,
    )


def _phash_pairs_from_fps(
    fps: DataFrame,
    *,
    max_hamming: int = 6,
    bands: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole completeness requires max_hamming < bands, got "
            f"max_hamming={max_hamming} bands={bands}"
        )
    band_bits = 63 // bands
    mask = (1 << band_bits) - 1
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
    if max_bucket is not None:
        counts = banded.groupBy("band", "slice").agg(F.count(F.lit(1)).alias("__bn"))
        banded = (
            banded.join(counts, ["band", "slice"])
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.slice") == F.col("b.slice"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_dedup_clusters(
    media: DataFrame,
    *,
    max_hamming: int = 6,
    bands: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image-corpus dedup end to end: perceptual-hash fingerprints ->
    banded near-dup pairs -> transitive closure -> canonical min-id
    survivor per cluster — the image twin of the text pipeline's
    ``cluster.dedup_clusters``, on the same min-label-propagation
    machinery (keyed join+agg per round, lineage cut between rounds,
    large-star/small-star fallback for pathological chains).

    Output: ``media_id, cluster_id, keep`` — one row per image row.
    The fingerprint table is materialized once (``lineage.cut``) and
    serves the node set and both sides of the banded pair join.
    ``max_bucket`` threads through to the pair join (see
    :func:`image_phash_pairs`): with a cap, over-cap buckets drop
    before the self-join, so clusters are computed over the capped
    (lower-bound) edge set."""
    from .. import lineage
    from .cluster import connected_components

    fps = lineage.cut(image_phash(media))
    pairs = _phash_pairs_from_fps(
        fps, max_hamming=max_hamming, bands=bands, max_bucket=max_bucket
    )
    cc = connected_components(
        fps.select(F.col("media_id").alias("id")),
        pairs,
        id_col="id",
        src_col="id_a",
        dst_col="id_b",
    )
    return cc.select(
        F.col("id").alias("media_id"),
        "cluster_id",
        (F.col("cluster_id") == F.col("id")).alias("keep"),
    )


def image_dedup_clusters_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    max_hamming: int = 6,
    bands: int = 7,
    all_media: bool = False,
) -> str:
    """DuckDB twin: the phash pair CTE closed transitively via a
    recursive CTE (min reachable id == the min-label fixpoint)."""
    band_bits = 63 // bands
    mask = (1 << band_bits) - 1
    band_rows = ", ".join(
        f"({bi}, (phash >> {bi * band_bits}) & {mask})" for bi in range(bands)
    )
    return f"""
WITH RECURSIVE {_phash_cte(table, id_col=id_col, text=text, all_media=all_media)},
banded AS (
  SELECT media_id, phash, b.* FROM fps, (VALUES {band_rows}) b(band, slice)
),
pairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.slice = b.slice AND a.media_id < b.media_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT media_id, media_id FROM fps
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS media_id, min(r) AS cluster_id, (min(r) = id) AS keep
FROM reach GROUP BY id
"""


def _phash_cte(
    table: str, *, id_col: str = "doc_id", text: str = "text", all_media: bool = False
) -> str:
    """Shared oracle CTE chain ending in ``fps(media_id, phash)`` —
    the tiled-path hash reproduced from character codes with the SAME
    quantized basis integers, HUGEINT sums (stage-2 magnitudes ~1.5e21
    exceed BIGINT), and the same 32nd-of-63 median."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    basis_rows = ", ".join(
        f"({u}, {x}, {q})"
        for u, row in enumerate(PHASH_BASIS)
        for x, q in enumerate(row)
    )
    byte = (
        "ascii(substring(atext, CAST(((CAST(yi AS BIGINT) * w + xi) * 3 + {k}) "
        "% n_bytes AS INT) + 1, 1))"
    )
    tf = "" if all_media else "media_type = 'image' AND "
    return f"""{cte},
images AS (
  SELECT media_id, atext, n_bytes,
         (n_bytes % 24) + 8 AS w, (n_bytes % 16) + 8 AS h
  FROM media WHERE {tf}n_bytes > 0
),
basis(u, x, q) AS (VALUES {basis_rows}),
grid AS (
  SELECT media_id, atext, n_bytes, w, h,
         CAST(r.i AS INT) AS gr, CAST(c.i AS INT) AS gc,
         CAST((r.i * h) // 32 AS INT) AS yi, CAST((c.i * w) // 32 AS INT) AS xi
  FROM images, range(0, 32) r(i), range(0, 32) c(i)
),
g AS (
  SELECT media_id, gr, gc,
         CAST({byte.format(k=0)} + {byte.format(k=1)} + {byte.format(k=2)} AS HUGEINT) AS gv
  FROM grid
),
p AS (
  SELECT g.media_id, bu.u AS u, g.gc AS c,
         sum(CAST(bu.q AS HUGEINT) * g.gv) AS pv
  FROM g JOIN basis bu ON bu.x = g.gr
  GROUP BY 1, 2, 3
),
t AS (
  SELECT p.media_id, p.u, bv.u AS v, sum(p.pv * bv.q) AS tv
  FROM p JOIN basis bv ON bv.x = p.c
  GROUP BY 1, 2, 3
),
ac AS (
  SELECT media_id, (u * 8 + v - 1) AS idx, tv
  FROM t WHERE NOT (u = 0 AND v = 0)
),
med AS (
  SELECT media_id, tv AS m FROM (
    SELECT media_id, tv,
           row_number() OVER (PARTITION BY media_id ORDER BY tv) AS rn
    FROM ac
  ) WHERE rn = 32
),
fps AS (
  SELECT ac.media_id,
         CAST(coalesce(sum(CASE WHEN ac.tv > med.m
                                THEN CAST(1 AS BIGINT) << CAST(ac.idx AS INT)
                                ELSE 0 END), 0) AS BIGINT) AS phash
  FROM ac JOIN med USING (media_id)
  GROUP BY 1
)"""


def image_phash_sql(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    return f"""
WITH {_phash_cte(table, id_col=id_col, text=text)}
SELECT media_id, phash FROM fps
"""


def image_phash_pairs_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    max_hamming: int = 6,
    bands: int = 7,
    all_media: bool = False,
) -> str:
    band_bits = 63 // bands
    mask = (1 << band_bits) - 1
    band_rows = ", ".join(
        f"({bi}, (phash >> {bi * band_bits}) & {mask})" for bi in range(bands)
    )
    return f"""
WITH {_phash_cte(table, id_col=id_col, text=text, all_media=all_media)},
banded AS (
  SELECT media_id, phash, b.* FROM fps, (VALUES {band_rows}) b(band, slice)
)
SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       bit_count(xor(a.phash, b.phash)) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.slice = b.slice AND a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
"""


DECODE_ERRORS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("format", StringType(), False),
        StructField("error", StringType(), False),
        StructField("message", StringType(), False),
    ]
)


def decode_errors(media: DataFrame) -> DataFrame:
    """Quarantine scan: one row per payload that SNIFFS as a shipped
    format but fails to decode — the observable complement of the
    feature extractors' ``on_error='skip'`` mode, so best-effort corpus
    decode never silently loses rows (run both over the same table:
    features(skip) ∪ decode_errors partitions it exactly).

    Attempts the full decode for every structurally-sniffed payload
    (image formats via :func:`.codecs.decode_image`, WAV via
    ``decode_wav``, AVI via ``decode_avi``); emits
    ``(media_id, media_type, format, error, message)`` for each codec
    failure (ValueError / NotImplementedError — anything else is a
    decoder bug and still crashes).  Payloads that decode fine, or that
    don't sniff as any shipped format, emit nothing.

    Scale shape: Arrow-batched ``mapInPandas``; output is the (small)
    quarantine set only — never payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        decoders = {
            "png": codecs.decode_image,
            "bmp": codecs.decode_image,
            "ppm": codecs.decode_image,
            "jpeg": codecs.decode_image,
            "wav": codecs.decode_wav,
            "avi": codecs.decode_avi,
        }
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                raw = bytes(content)
                fmt = codecs.sniff_strict(raw)
                dec = decoders.get(fmt)
                if dec is None:
                    continue
                try:
                    dec(raw)
                except (ValueError, NotImplementedError) as e:
                    out.append(
                        (int(mid), str(mtype), fmt, type(e).__name__, str(e)[:200])
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODE_ERRORS_SCHEMA.fields]
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=DECODE_ERRORS_SCHEMA
    )


# -- images: real PNG codec round-trip ------------------------------------

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_px", LongType(), False),
        StructField("mean_px", DoubleType(), False),
        StructField("std_px", DoubleType(), False),
        StructField("px_histogram", ArrayType(LongType()), False),
    ]
)


def image_features(media: DataFrame, *, on_error: str = "raise") -> DataFrame:
    """Decode image payloads through the REAL PNG codec and extract
    pixel-domain features — the image sibling of :func:`audio_features`,
    same contract:

    * a payload that sniffs as a shipped image format (PNG/BMP/PPM/
      baseline JPEG) is decoded directly (:func:`.codecs.decode_image`);
    * any other payload (the synthetic corpus: UTF-8 text bytes) is
      TILED into an RGB array of ``w = (n % 24) + 8`` by
      ``h = (n % 16) + 8`` pixels (byte ``i`` of the array is payload
      byte ``i % n``), encoded to a real PNG (zlib deflate, filter-0
      scanlines) and decoded back through the full chunk-walk /
      inflate / defilter path — so a single corrupted byte anywhere in
      the codec breaks the features.

    Features over the decoded pixels: geometry from the decoded header,
    exact integer pixel-byte count, mean/std from exact integer sums
    with the fixed float expression (one division each, one
    correctly-rounded sqrt), and the 8-bin ``pixel >> 5`` histogram —
    hash-reproduced by :func:`image_features_sql` straight from
    character codes.

    Scale shape: Arrow-batched ``mapInPandas``; output rows carry 7
    scalars + an 8-long histogram, never payload bytes.

    ``on_error``: ``'raise'`` (default — the loud-fail contract) or
    ``'skip'`` — at 100 TB corpus scale SOME payloads are corrupt and
    one bad row must not kill the job; skipped rows are not silent:
    :func:`decode_errors` scans the same table and returns exactly the
    quarantine set.  Only codec errors (ValueError /
    NotImplementedError) are skippable — a decoder BUG still crashes.
    """
    import numpy as np  # local import: runs on executors

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs  # executor-side import

        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if codecs.sniff_strict(raw) in ("png", "bmp", "ppm", "jpeg"):
                    try:
                        img = codecs.decode_image(raw)
                    except (ValueError, NotImplementedError):
                        if on_error == "skip":
                            continue
                        raise
                else:
                    n = len(raw)
                    w = (n % 24) + 8
                    h = (n % 16) + 8
                    need = w * h * 3
                    tiled = (raw * (need // n + 1))[:need]
                    arr = np.frombuffer(tiled, dtype=np.uint8).reshape(h, w, 3)
                    img = codecs.decode_png(codecs.encode_png(arr))
                s = img.reshape(-1).astype(np.int64)
                n_px = int(s.size)
                s1, s2 = int(s.sum()), int((s * s).sum())
                mean = float(s1) / n_px
                var = float(s2) / n_px - mean * mean
                std = float(np.sqrt(var)) if var >= 0 else 0.0
                hist = np.bincount(s >> 5, minlength=8).astype("int64")
                out.append(
                    (
                        int(mid),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        n_px,
                        mean,
                        std,
                        hist.tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return (
        media.filter(
            (F.col("media_type") == "image") & (F.octet_length("content") > 0)
        )
        .select("media_id", "content")
        .mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)
    )


def image_features_sql(table: str, *, id_col: str = "doc_id", text: str = "text") -> str:
    """Oracle twin of :func:`image_features` over the synthetic corpus:
    the same features computed straight from character codes (tiling =
    modulo position) — if the PNG encode/decode round-trip corrupts a
    single pixel, the hash diverges."""
    cte = _media_table_sql_parts(table, id_col=id_col, text=text)
    return f"""
WITH {cte},
images AS (
  SELECT media_id, atext, n_bytes,
         (n_bytes % 24) + 8 AS w, (n_bytes % 16) + 8 AS h,
         ((n_bytes % 24) + 8) * ((n_bytes % 16) + 8) * 3 AS need
  FROM media WHERE media_type = 'image' AND n_bytes > 0
),
codes AS (
  SELECT media_id, w, h, need,
         ascii(substring(atext, CAST(((t.i - 1) % n_bytes) + 1 AS INT), 1)) AS c
  FROM images, unnest(range(1, need + 1)) AS t(i)
),
slots AS (
  SELECT media_id, CAST(g.i AS BIGINT) AS slot FROM images, unnest(range(0, 8)) AS g(i)
),
stats AS (
  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
         CAST(count(*) AS BIGINT) AS n_px,
         CAST(sum(c) AS DOUBLE) / count(*) AS mean_px,
         CAST(sum(CAST(c AS BIGINT) * c) AS DOUBLE) / count(*) AS s2n
  FROM codes GROUP BY media_id
),
hist AS (
  SELECT media_id, c // 32 AS slot, count(*) AS cnt FROM codes GROUP BY 1, 2
),
histvec AS (
  SELECT s.media_id,
         string_agg(CAST(coalesce(h.cnt, 0) AS VARCHAR), ',' ORDER BY s.slot)
           AS px_histogram_csv
  FROM slots s LEFT JOIN hist h ON s.media_id = h.media_id AND s.slot = h.slot
  GROUP BY s.media_id
)
SELECT st.media_id, CAST(st.w AS BIGINT) AS width, CAST(st.h AS BIGINT) AS height,
  st.n_px, st.mean_px,
  CASE WHEN st.s2n - st.mean_px * st.mean_px >= 0
       THEN sqrt(st.s2n - st.mean_px * st.mean_px) ELSE 0.0 END AS std_px,
  hv.px_histogram_csv
FROM stats st JOIN histvec hv USING (media_id)
"""
