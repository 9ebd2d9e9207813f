"""Multimodal binary-column plumbing (llm/multimodal.py).

The decode kernel is a deterministic fake (real codecs are stubbed —
NotImplementedError); these tests pin the Arrow/mapInPandas plumbing:
schema stability, batch correctness vs a local numpy recompute, and
frame-sampling consistency with the metadata.
"""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trend_o_meter_spark.catalog import table
from trend_o_meter_spark.llm import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(table(spark, "documents", SF)).cache()


def test_media_table_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    meta_type = media.schema["meta"].dataType
    assert [f.name for f in meta_type.fields] == [
        "width", "height", "sample_rate", "n_frames",
    ]


def test_decode_features_match_numpy(spark, media):
    feats = {
        r["media_id"]: r
        for r in mm.decode_media(media).collect()
    }
    for row in media.limit(5).collect():
        arr = np.frombuffer(row["content"], dtype=np.uint8)
        got = feats[row["media_id"]]
        assert got["n_bytes"] == arr.size
        assert got["mean_byte"] == pytest.approx(float(arr.mean()))
        assert got["std_byte"] == pytest.approx(float(arr.std()))
        assert got["byte_histogram"] == np.bincount(arr >> 5, minlength=8).tolist()
        assert len(got["feature_vec"]) == mm.FEATURE_DIM


def test_real_decode_unknown_format_fails_loudly(spark, media):
    # the synthetic text payloads are neither BMP nor PPM: the real
    # kernel must raise NotImplementedError on the executor, not decode
    # garbage (surfaces as a PythonException wrapping the error text)
    with pytest.raises(Exception, match="no shipped codec"):
        mm.decode_media(media, real=True).collect()


def _test_image(w, h):
    # deterministic pixels, no RNG (index arithmetic covers all channels)
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7 + y * 13) % 256, (x * 3 + y * 29) % 256, (x * 11 + y * 5) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_codec_roundtrips():
    from trend_o_meter_spark.llm import codecs

    # widths 3 and 5 force BMP row padding (row_bytes % 4 != 0)
    for w, h in [(3, 2), (5, 4), (8, 8), (1, 1), (16, 3)]:
        img = _test_image(w, h)
        for fmt in ("bmp", "ppm", "png"):
            data = codecs.encode_image(img, fmt)
            assert codecs.sniff(data) == fmt
            back = codecs.decode_image(data)
            np.testing.assert_array_equal(back, img)


def test_codec_ppm_comment_and_topdown_bmp():
    from trend_o_meter_spark.llm import codecs

    img = _test_image(4, 3)
    # PPM with a comment line in the header (Netpbm allows them)
    data = b"P6\n# a comment\n4 3\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(data), img)
    # top-down BMP (negative height) decodes identically
    import struct

    data = bytearray(codecs.encode_bmp(img))
    # flip height sign and reverse the row order in the body
    h = struct.unpack_from("<i", data, 14 + 8)[0]
    struct.pack_into("<i", data, 14 + 8, -h)
    offset = struct.unpack_from("<I", data, 10)[0]
    stride = 4 * 3 + ((-4 * 3) % 4)
    body = bytes(data[offset:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(h)]
    data[offset:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(codecs.decode_bmp(bytes(data)), img)


@pytest.fixture(scope="module")
def real_media(spark):
    """A media table whose image payloads are REAL encoded BMP/PPM."""
    from trend_o_meter_spark.llm import codecs

    rows = []
    for i in range(8):
        img = _test_image(4 + i, 3 + (i % 3))
        fmt = "bmp" if i % 2 == 0 else "ppm"
        rows.append((i, "image", bytearray(codecs.encode_image(img, fmt))))
    return spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def test_real_decode_computes_pixel_stats(spark, real_media):
    """The real kernel decodes actual BMP/PPM pixels: stats match a
    local decode-with-numpy recompute, geometry comes from the header."""
    feats = {r["media_id"]: r for r in mm.decode_media(real_media, real=True).collect()}
    assert len(feats) == 8
    for i in range(8):
        img = _test_image(4 + i, 3 + (i % 3))
        arr = img.reshape(-1)
        got = feats[i]
        assert (got["width"], got["height"]) == (4 + i, 3 + (i % 3))
        assert got["n_bytes"] == arr.size  # decoded pixel count, not file size
        assert got["mean_byte"] == pytest.approx(float(arr.mean()))
        assert got["std_byte"] == pytest.approx(float(arr.std()))
        assert got["byte_histogram"] == np.bincount(arr >> 5, minlength=8).tolist()
        assert len(got["feature_vec"]) == mm.FEATURE_DIM


def test_real_resize_reencodes_pixels(spark, real_media):
    """real=True resize: payloads decode to the target geometry with
    exactly the nearest-neighbor pixels, in the SOURCE format; the
    fingerprint changes (unlike the metadata-only fake path)."""
    from trend_o_meter_spark.llm import codecs

    out = mm.resize_image(real_media, width=6, height=5, real=True)
    rows = {r["media_id"]: r for r in out.collect()}
    orig = {r["media_id"]: bytes(r["content"]) for r in real_media.collect()}
    for i in range(8):
        r = rows[i]
        raw = bytes(r["content"])
        assert codecs.sniff(raw) == ("bmp" if i % 2 == 0 else "ppm")
        img = codecs.decode_image(raw)
        assert img.shape == (5, 6, 3)
        expected = codecs.resize_nearest(
            _test_image(4 + i, 3 + (i % 3)), width=6, height=5
        )
        np.testing.assert_array_equal(img, expected)
        if (4 + i, 3 + (i % 3)) == (6, 5):
            # identity resize re-encodes to byte-identical payload
            assert raw == orig[i]
        else:
            assert raw != orig[i]
        assert (r["meta"]["width"], r["meta"]["height"]) == (6, 5)


def test_frame_sample_counts(media):
    fs = mm.frame_sample(media, every=4)
    got = (
        fs.groupBy("media_id").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
    )
    expected = media.filter(
        (F.col("media_type") == "video") & (F.col("meta.n_frames") > 0)
    ).select("media_id", "meta.n_frames")
    joined = got.join(expected, "media_id").collect()
    assert joined, "no video rows sampled"
    for r in joined:
        # indices 0, 4, 8, ... < n_frames
        assert r["n"] == (r["n_frames"] + 3) // 4
        assert r["mx"] < r["n_frames"]
        assert r["mx"] % 4 == 0


def test_resize_retags_metadata(media):
    out = mm.resize_image(media, width=8, height=8)
    imgs = out.filter(F.col("media_type") == "image").select("meta.width", "meta.height").distinct().collect()
    assert [(r["width"], r["height"]) for r in imgs] == [(8, 8)]
    # non-image rows keep null width/height
    others = out.filter(F.col("media_type") != "image").filter(
        F.col("meta.width").isNotNull() | F.col("meta.height").isNotNull()
    )
    assert others.count() == 0


def test_decode_ppm_rejects_ambiguous_crlf_header():
    """A CRLF after maxval makes the pixel offset ambiguous (is the \\n
    the separator's second byte or the first pixel?) — fail loudly
    instead of decoding everything off by one."""
    import pytest

    from trend_o_meter_spark.llm.codecs import decode_ppm

    data = b"P6\r\n2 1\r\n255\r\n" + bytes([1, 2, 3, 4, 5, 6])
    with pytest.raises(ValueError, match="CRLF"):
        decode_ppm(data)
    # a LONE '\r' separator is spec-legal single whitespace: decodes fine
    ok = b"P6\n2 1\n255\r" + bytes([1, 2, 3, 4, 5, 6])
    assert decode_ppm(ok).shape == (1, 2, 3)


# -- WAV audio codec (real path) -----------------------------------------


def _test_pcm(n, ch=1):
    # deterministic samples spanning both signs, no RNG
    i = np.arange(n * ch, dtype=np.int64).reshape(n, ch)
    return ((i * 2654435761) % 60001 - 30000).astype(np.int16)


def test_wav_roundtrip_mono_stereo():
    from trend_o_meter_spark.llm import codecs

    for n, ch, rate in [(1, 1, 8000), (7, 1, 16000), (480, 2, 44100)]:
        pcm = _test_pcm(n, ch)
        data = codecs.encode_wav(pcm, rate)
        assert codecs.sniff(data) == "wav"
        back, r = codecs.decode_wav(data)
        assert r == rate
        np.testing.assert_array_equal(back, pcm)
    # odd-byte data chunks are word-padded per the RIFF spec: a mono
    # 16-bit stream is always even, so force oddness via the pad branch
    # by checking total length parity of a 1-sample file
    assert len(codecs.encode_wav(_test_pcm(1), 8000)) % 2 == 0


def test_wav_skips_unknown_chunks_and_rejects_non_pcm():
    import struct

    from trend_o_meter_spark.llm import codecs

    pcm = _test_pcm(5)
    data = codecs.encode_wav(pcm, 8000)
    # splice an unknown LIST chunk between 'WAVE' and 'fmt '
    spliced = data[:12] + struct.pack("<4sI", b"LIST", 4) + b"INFO" + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = codecs.decode_wav(spliced)
    np.testing.assert_array_equal(back, pcm)
    # 8-bit depth must fail loudly, not decode garbage
    bad = bytearray(data)
    fmt_off = data.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off + 14, 8)  # bits-per-sample field
    with pytest.raises(NotImplementedError, match="16-bit PCM"):
        codecs.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"\x00" * 32)


def test_resample_linear_identity_and_length():
    from trend_o_meter_spark.llm import codecs

    pcm = _test_pcm(100, 2)
    same = codecs.resample_linear(pcm, src_rate=8000, dst_rate=8000)
    np.testing.assert_array_equal(same, pcm)
    up = codecs.resample_linear(pcm, src_rate=8000, dst_rate=16000)
    assert up.shape == (200, 2)
    # anchor-at-0 mapping: even output samples hit source samples exactly
    np.testing.assert_array_equal(up[::2], pcm)
    down = codecs.resample_linear(pcm, src_rate=16000, dst_rate=8000)
    assert down.shape == (50, 2)
    np.testing.assert_array_equal(down, pcm[::2])


def test_audio_features_real_wav_payload_matches_synthetic(spark):
    """audio_features on an actual WAV payload equals a direct numpy
    computation, and the synthetic path produces the same features as
    pre-encoding the equivalent WAV — the two admission routes agree."""
    from trend_o_meter_spark.llm import codecs

    text = b"some deterministic payload bytes for audio"
    pcm = (np.frombuffer(text, dtype=np.uint8).astype(np.int16) - 80) * 256
    wav = codecs.encode_wav(pcm, 16000)
    meta = {"width": None, "height": None, "sample_rate": 16000, "n_frames": None}
    rows = [
        (1, "audio", bytearray(text), meta),   # synthetic route (not RIFF)
        (2, "audio", bytearray(wav), meta),    # real-WAV route
        (3, "video", bytearray(text), meta),   # filtered out
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    )
    feats = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    assert set(feats) == {1, 2}
    s = pcm.astype(np.int64)
    expect_rms = float(np.sqrt(float((s * s).sum()) / s.size))
    for mid in (1, 2):
        got = feats[mid]
        assert got["n_samples"] == s.size
        assert got["sample_rate"] == 16000
        assert got["duration_s"] == s.size / 16000
        assert got["peak"] == int(np.abs(s).max())
        assert got["rms"] == expect_rms
        assert got["zero_crossings"] == int(((s[:-1] * s[1:]) < 0).sum())
    assert feats[1]["rms"] == feats[2]["rms"]


def test_resample_audio_reencodes_wav(spark):
    """resample_audio: audio payloads come back as real WAV containers at
    the target rate with the linear-resampled samples; non-audio rows and
    their payloads pass through untouched."""
    from trend_o_meter_spark.llm import codecs

    text = b"resample me please, deterministically!"
    pcm = (np.frombuffer(text, dtype=np.uint8).astype(np.int16) - 80) * 256
    meta = {"width": None, "height": None, "sample_rate": 16000, "n_frames": None}
    rows = [(1, "audio", bytearray(text), meta), (2, "image", bytearray(text), meta)]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
    )
    out = {r["media_id"]: r for r in mm.resample_audio(media, rate=8000).collect()}
    samples, rate = codecs.decode_wav(bytes(out[1]["content"]))
    assert rate == 8000
    assert out[1]["meta"]["sample_rate"] == 8000
    np.testing.assert_array_equal(
        samples, codecs.resample_linear(pcm[:, None], src_rate=16000, dst_rate=8000)
    )
    assert bytes(out[2]["content"]) == text  # non-audio untouched
    assert out[2]["meta"]["sample_rate"] == 16000


# -- AVI video codec (real path) -----------------------------------------


def _test_frames(n, h, w):
    f = np.zeros((n, h, w, 3), dtype=np.uint8)
    for i in range(n):
        f[i] = _test_image(w, h)
        f[i, :, :, 0] = (f[i, :, :, 0].astype(int) + i * 17) % 256
    return f


def test_avi_roundtrip_and_sniff():
    from trend_o_meter_spark.llm import codecs

    for n, h, w in [(1, 4, 4), (5, 6, 10), (3, 7, 5)]:  # incl. padded rows
        frames = _test_frames(n, h, w)
        data = codecs.encode_avi(frames, fps=12)
        assert codecs.sniff(data) == "avi"
        back, fps = codecs.decode_avi(data)
        assert fps == 12
        np.testing.assert_array_equal(back, frames)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        codecs.decode_avi(b"\x00" * 32)


def test_avi_top_down_negative_biheight():
    """A legal top-down AVI (negative biHeight, rows stored top-to-bottom)
    must decode to the same frames as its bottom-up twin, not vertically
    flipped.  Built by byte-surgery on the encoder's bottom-up output:
    negate biHeight in strf and reverse each frame chunk's row order."""
    import struct

    from trend_o_meter_spark.llm import codecs

    h, w = 4, 5
    frames = _test_frames(2, h, w)
    data = bytearray(codecs.encode_avi(frames, fps=9))
    # strf payload: biSize(4) biWidth(4) biHeight(4) ...
    strf = data.index(b"strf") + 8
    (bh,) = struct.unpack_from("<i", data, strf + 8)
    assert bh == h
    struct.pack_into("<i", data, strf + 8, -h)
    stride = w * 3 + ((-(w * 3)) % 4)
    pos = 0
    while True:
        try:
            pos = data.index(b"00db", pos)
        except ValueError:
            break
        body = pos + 8
        rows = [bytes(data[body + i * stride : body + (i + 1) * stride]) for i in range(h)]
        data[body : body + h * stride] = b"".join(reversed(rows))
        pos = body
    back, fps = codecs.decode_avi(bytes(data))
    assert fps == 9
    np.testing.assert_array_equal(back, frames)


def test_avi_rejects_compressed_streams():
    import struct

    from trend_o_meter_spark.llm import codecs

    data = bytearray(codecs.encode_avi(_test_frames(1, 4, 4), fps=5))
    idx = data.index(b"vids") + 4
    data[idx : idx + 4] = b"MJPG"  # claim a compressed handler
    with pytest.raises(NotImplementedError, match="DIB"):
        codecs.decode_avi(bytes(data))


def test_video_frame_features_real_decode(spark):
    """The third modality decodes for real: AVI payloads through Spark's
    mapInPandas produce per-frame stats equal to a direct numpy
    computation on the original frames."""
    from trend_o_meter_spark.llm import codecs

    frames = _test_frames(6, 8, 9)
    avi = codecs.encode_avi(frames, fps=4)
    media = spark.createDataFrame(
        [(7, "video", bytearray(avi))], "media_id long, media_type string, content binary"
    )
    rows = mm.video_frame_features(media, every=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in rows] == [(7, 0), (7, 2), (7, 4)]
    for r in rows:
        s = frames[r["frame_idx"]].astype(np.int64).reshape(-1)
        mean = float(s.sum()) / s.size
        var = float((s * s).sum()) / s.size - mean * mean
        assert (r["width"], r["height"], r["fps"]) == (9, 8, 4)
        assert r["mean_pixel"] == mean
        assert r["std_pixel"] == (var**0.5 if var >= 0 else 0.0)


def test_video_features_corpus_synthesis(spark):
    """Round-10 registry wrapper: text payloads synthesize REAL AVI
    containers (16x2 frames -> 6-byte DIB rows, so the 4-byte stride
    padding path genuinely executes) and the decoded stats equal a
    direct numpy computation on the synthesis formula.  Pins the
    conventions the DuckDB oracle mirrors: 32 bytes per frame, trailing
    partial-frame bytes DROP, fps = media_id % 24 + 1, channels
    (v, v//2, 255-v), every=2 sampling."""
    text = "".join(chr(32 + (i * 7) % 95) for i in range(32 * 5 + 11))  # 5 frames + tail
    media = spark.createDataFrame(
        [(26, "video", bytearray(text.encode())), (3, "image", bytearray(b"x" * 64))],
        "media_id long, media_type string, content binary",
    )
    rows = {r["frame_idx"]: r for r in mm.video_features_corpus(media, every=2).collect()}
    assert sorted(rows) == [0, 2, 4]  # 5 full frames, tail dropped, non-video ignored
    raw = np.frombuffer(text.encode()[: 5 * 32], dtype=np.uint8)
    v = raw.reshape(5, 16, 2)
    frames = np.stack([v, v // 2, 255 - v], axis=-1)
    for i, r in rows.items():
        s = frames[i].astype(np.int64).reshape(-1)
        mean = float(s.sum()) / s.size
        var = float((s * s).sum()) / s.size - mean * mean
        assert (r["media_id"], r["width"], r["height"], r["fps"]) == (26, 2, 16, 3)
        assert r["mean_pixel"] == mean
        assert r["std_pixel"] == (var**0.5 if var >= 0 else 0.0)


def _png_pack(ihdr_fields, scanlines, extra_chunks=()):
    """Hand-assemble a PNG from already-filtered scanlines (independent
    of encode_png, which only ever emits filter 0)."""
    import struct
    import zlib

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for typ, body in extra_chunks:
        out += chunk(typ, body)
    out += chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
    return out + chunk(b"IEND", b"")


def test_png_all_filter_types_reconstruct():
    """Scanlines filtered with Sub/Up/Average/Paeth (one each), with the
    filtered bytes computed HERE from the spec formulas over known
    pixels — decode_png must invert every filter exactly."""
    from trend_o_meter_spark.llm import codecs

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    h, w, _ = img.shape
    bpp = 3
    lines = []
    prior = np.zeros(w * bpp, dtype=np.int32)
    for r, f in zip(range(h), (0, 1, 2, 3, 4)):
        cur = img[r].reshape(-1).astype(np.int32)
        filt = np.zeros_like(cur)
        for i in range(w * bpp):
            a = cur[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                filt[i] = cur[i]
            elif f == 1:
                filt[i] = (cur[i] - a) % 256
            elif f == 2:
                filt[i] = (cur[i] - b) % 256
            elif f == 3:
                filt[i] = (cur[i] - ((a + b) >> 1)) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prior = cur
    data = _png_pack((w, h, 8, 2, 0, 0, 0), lines)
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_png_color_types_normalize_to_rgb():
    from trend_o_meter_spark.llm import codecs

    # grayscale (type 0) replicates to RGB
    g = np.array([[10, 200], [0, 255]], dtype=np.uint8)
    lines = [b"\x00" + bytes(row) for row in g]
    data = _png_pack((2, 2, 8, 0, 0, 0, 0), lines)
    np.testing.assert_array_equal(
        codecs.decode_png(data), np.repeat(g[:, :, None], 3, axis=2)
    )

    # palette (type 3) resolves through PLTE
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    lines = [b"\x00" + bytes(row) for row in idx]
    data = _png_pack((2, 2, 8, 3, 0, 0, 0), lines, extra_chunks=[(b"PLTE", pal)])
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    np.testing.assert_array_equal(codecs.decode_png(data), want)

    # RGBA (type 6): alpha dropped
    rgba = np.array([[[1, 2, 3, 200], [4, 5, 6, 0]]], dtype=np.uint8)
    lines = [b"\x00" + rgba[0].tobytes()]
    data = _png_pack((2, 1, 8, 6, 0, 0, 0), lines)
    np.testing.assert_array_equal(codecs.decode_png(data), rgba[:, :, :3])


def test_png_rejects_bad_crc_interlace_and_16bit():
    import pytest

    from trend_o_meter_spark.llm import codecs

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(codecs.encode_png(img))
    good[-17] ^= 0xFF  # flip a byte inside IDAT without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(good))

    lines = [b"\x00" + b"\x00" * 6] * 2
    with pytest.raises(NotImplementedError, match="Adam7"):
        codecs.decode_png(_png_pack((2, 2, 8, 2, 0, 0, 1), lines))
    with pytest.raises(NotImplementedError, match="bit depth"):
        codecs.decode_png(_png_pack((2, 2, 16, 2, 0, 0, 0), lines))


def test_image_features_text_with_image_magic_prefix_takes_tiled_path(spark):
    """A text payload that merely STARTS with 'BM'/'P6' must take the
    tiled-PNG path (matching the char-code oracle), not be misrouted
    into the BMP/PPM decoder by a 2-byte prefix match — while a payload
    that IS a structurally valid BMP still decodes directly."""
    import numpy as np

    from trend_o_meter_spark.llm import codecs
    from trend_o_meter_spark.llm.multimodal import image_features, media_table

    docs = spark.createDataFrame(
        [
            (0, "BMW is a car maker based in Munich, Germany and elsewhere"),
            (3, "P6 engines were common in the nineties across many marques"),
            (6, "plain text payload with no magic prefix at all, for control"),
        ],
        "doc_id long, text string",
    )
    out = {r["media_id"]: r for r in image_features(media_table(docs)).collect()}
    assert set(out) == {0, 3, 6}
    for mid, txt in (
        (0, "BMW is a car maker based in Munich, Germany and elsewhere"),
        (3, "P6 engines were common in the nineties across many marques"),
        (6, "plain text payload with no magic prefix at all, for control"),
    ):
        raw = txt.encode()
        n = len(raw)
        w, h = (n % 24) + 8, (n % 16) + 8
        need = w * h * 3
        tiled = (raw * (need // n + 1))[:need]
        codes = np.frombuffer(tiled, dtype=np.uint8).astype(np.int64)
        r = out[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_px"] == float(codes.sum()) / codes.size

    # a structurally valid BMP payload still decodes directly
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert codecs.sniff_strict(codecs.encode_bmp(arr)) == "bmp"


# -- baseline JPEG codec ---------------------------------------------------


def test_jpeg_roundtrip_exact_on_flat_and_bounded_on_gradient():
    """Flat blocks are DC-only and survive the quantize/dequantize trip
    exactly; a smooth gradient stays within a small, quality-monotone
    error envelope for both subsampling modes."""
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    for sub in ("444", "420"):
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(flat, quality=90, subsampling=sub)), flat
        )

    yv, xv = np.mgrid[0:24, 0:33]
    img = np.stack(
        [(xv * 3) % 256, (yv * 5) % 256, ((xv + yv) * 2) % 256], axis=2
    ).astype(np.uint8)
    prev_err = None
    for q in (95, 85, 60):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsampling="444"))
        assert out.shape == img.shape
        err = float(np.abs(out.astype(int) - img.astype(int)).mean())
        assert err <= 2.0, (q, err)
        if prev_err is not None:
            assert err >= prev_err - 0.05  # lower quality, no less error
        prev_err = err
    out420 = decode_jpeg(encode_jpeg(img, quality=85, subsampling="420"))
    assert np.abs(out420.astype(int) - img.astype(int)).mean() <= 4.0


def test_jpeg_hand_assembled_spec_vector_decodes_analytically():
    """A HAND-BUILT stream (not produced by our encoder): grayscale 8x8,
    unit quant table, Annex-K DC/AC luminance Huffman tables, scan bits
    assembled from the spec's canonical code assignment by hand —
    category-7 DC code 11110, magnitude bits 1000000 (=64), then the
    4-bit EOB 1010.  A DC-only block IDCTs to the constant
    ``DC/8 + 128``, so every pixel must be exactly 136.  This validates
    the decoder's marker walk, canonical Huffman construction, EXTEND,
    dequant, and IDCT against the public spec, independent of
    encode_jpeg."""
    from trend_o_meter_spark.llm import jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc, th, table):
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    data = struct.pack(">H", 0xFFD8)
    data += seg(0xFFDB, b"\x00" + bytes([1] * 64))  # unit quant table
    data += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    data += seg(0xFFC4, dht(0, 0, jpeg._DC_LUM))
    data += seg(0xFFC4, dht(1, 0, jpeg._AC_LUM))
    data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    data += bytes([0b11110100, 0b00001010])  # 11110 1000000 1010
    data += struct.pack(">H", 0xFFD9)

    out = jpeg.decode_jpeg(data)
    np.testing.assert_array_equal(out, np.full((8, 8, 3), 136, dtype=np.uint8))


def test_jpeg_restart_intervals_decode_identically():
    """DRI + RSTn markers (byte-align, predictor reset) must not change
    a single decoded pixel vs the plain stream."""
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    yv, xv = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(xv * 7) % 256, (yv * 3) % 256, ((xv * 2 + yv) * 5) % 256], axis=2
    ).astype(np.uint8)
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        for ri in (1, 3):
            withr = decode_jpeg(
                encode_jpeg(img, quality=85, subsampling=sub, restart_interval=ri)
            )
            np.testing.assert_array_equal(base, withr)


def test_jpeg_rejects_inconsistent_and_12bit_loudly():
    """Progressive (SOF2) is now SUPPORTED — but a baseline stream whose
    SOF marker is flipped to SOF2 without progressive scan headers is
    INCONSISTENT (a progressive DC scan must have Se=0) and must fail
    loudly, as must 12-bit precision and arithmetic coding."""
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=85, subsampling="444"))
    sof_at = good.find(b"\xff\xc0")
    assert sof_at > 0
    prog = bytes(good[:sof_at]) + b"\xff\xc2" + bytes(good[sof_at + 2 :])
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    arith = bytes(good[:sof_at]) + b"\xff\xc9" + bytes(good[sof_at + 2 :])
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(arith)
    twelve = bytearray(good)
    twelve[sof_at + 4] = 12  # precision byte inside SOF0
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(twelve))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_lut_memo_cap_and_truncation_diagnostics():
    """ADVICE r09 items: (a) the Huffman-LUT memo is capped at 8 entries
    (~1 MB each) but the four Annex-K tables are ALWAYS admitted, so an
    optimized-coding corpus prefix can't evict the hot path; (b) a scan
    whose entropy data is exhausted reports 'truncated', not a
    misleading 'invalid JPEG Huffman code' from the zero-padded window."""
    from trend_o_meter_spark.llm import jpeg

    saved = dict(jpeg._LUT_MEMO)
    try:
        jpeg._LUT_MEMO.clear()
        for i in range(12):
            bits = [0] * 16
            bits[7] = 1
            jpeg._build_huffman_decoder(bits, [i])
        assert len(jpeg._LUT_MEMO) == 8  # capped
        jpeg._build_huffman_decoder(*jpeg._DC_LUM)
        jpeg._build_huffman_decoder(*jpeg._AC_CHROM)
        assert (tuple(jpeg._DC_LUM[0]), tuple(jpeg._DC_LUM[1])) in jpeg._LUT_MEMO
        assert (
            tuple(jpeg._AC_CHROM[0]), tuple(jpeg._AC_CHROM[1])
        ) in jpeg._LUT_MEMO
    finally:
        jpeg._LUT_MEMO.clear()
        jpeg._LUT_MEMO.update(saved)

    # truncation diagnostic: an empty-bit reader peeks a zero window
    br = jpeg._BitReader(b"", 0)
    tab = jpeg._build_huffman_decoder(*jpeg._DC_LUM)
    with pytest.raises(ValueError, match="truncated"):
        jpeg._decode_huffman(br, tab)


def test_jpeg_progressive_roundtrip_equals_baseline_pixels():
    """The progressive encoder shares the baseline's color transform,
    DCT, and quantization — only the entropy process differs — so both
    streams carry the SAME quantized coefficients losslessly and the
    decoder must produce IDENTICAL pixels.  Sweeps odd geometries
    (including 4:2:0 shapes where the non-interleaved AC block grid is
    smaller than the MCU-padded DC grid), noise (ZRL + correction-bit
    heavy), and saturated flats (EOB heavy)."""
    from trend_o_meter_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    yv, xv = np.mgrid[0:20, 0:20]
    images = [
        np.stack([(xv * 3) % 256, (yv * 5) % 256, ((xv + yv) * 2) % 256], axis=2)
        .astype(np.uint8),
        rng.randint(0, 256, (17, 9, 3)).astype(np.uint8),
        np.full((7, 100, 3), 255, np.uint8),
        np.zeros((1, 1, 3), np.uint8),
        rng.randint(0, 256, (33, 24, 3)).astype(np.uint8),
    ]
    for img in images:
        for sub in ("444", "420"):
            for q in (95, 50):
                base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=q, subsampling=sub)
                )
                np.testing.assert_array_equal(base, prog, err_msg=f"{img.shape} {sub} {q}")


def test_jpeg_422_and_progressive_restart_intervals():
    """4:2:2 (asymmetric 2x1 sampling) and restart intervals in BOTH
    entropy processes: RSTn markers inside progressive scans count DATA
    UNITS (blocks for non-interleaved AC scans, MCUs for the
    interleaved DC scan) and reset predictors/EOB runs — every variant
    must decode to the exact pixels of the plain baseline stream."""
    from trend_o_meter_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(3)
    for h, w in [(17, 9), (16, 31)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "422", "420"):
            base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
            for ri in (1, 3):
                np.testing.assert_array_equal(
                    base,
                    decode_jpeg(
                        encode_jpeg(img, quality=85, subsampling=sub, restart_interval=ri)
                    ),
                    err_msg=f"baseline {sub} ri={ri}",
                )
                np.testing.assert_array_equal(
                    base,
                    decode_jpeg(
                        encode_jpeg_progressive(
                            img, quality=85, subsampling=sub, restart_interval=ri
                        )
                    ),
                    err_msg=f"progressive {sub} ri={ri}",
                )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.sampled_from([30, 60, 85, 95]),
    sub=st.sampled_from(["444", "422", "420"]),
    ri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_progressive_equals_baseline_property(h, w, seed, quality, sub, ri):
    """Property form of the exactness contract (the per-family
    hypothesis-test discipline): for ANY image content, geometry,
    quality, subsampling, and restart cadence, the progressive and
    baseline entropy processes carry the same quantized coefficients
    losslessly, so decode must be pixel-identical.  Also pins the
    baseline decode against the pre-rewrite expectation that a decode
    round-trip of a flat image is exact."""
    from trend_o_meter_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub, restart_interval=ri))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsampling=sub, restart_interval=ri)
    )
    np.testing.assert_array_equal(base, prog)
    assert base.shape == (h, w, 3)


def test_jpeg_fuzz_malformed_streams_fail_cleanly():
    """Corpus-robustness contract: a malformed JPEG (byte mutations,
    truncations, header corruption — routine in scraped data) must
    either decode or raise ValueError/NotImplementedError, NEVER an
    IndexError/KeyError/StopIteration/struct.error that would surface
    as a confusing mapInPandas crash at corpus scale.  Deterministic
    3,000-trial slice of the 60,000-trial sweep that drove the round-9
    hardening (truncated DHT/SOS/SOF/DRI bodies, undefined
    Huffman/quant tables, undeclared scan components, out-of-range
    spectral bands)."""
    from trend_o_meter_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    streams = [
        bytes(encode_jpeg(img, quality=85, restart_interval=2)),
        bytes(encode_jpeg_progressive(img, quality=85, restart_interval=2)),
    ]
    for trial in range(3000):
        s = bytearray(streams[trial % 2])
        mode = trial % 4
        if mode == 0:  # light mutation anywhere
            for _ in range(rng.randint(1, 4)):
                s[rng.randint(0, len(s))] = rng.randint(0, 256)
        elif mode == 1:  # heavy mutation
            for _ in range(rng.randint(8, 30)):
                s[rng.randint(0, len(s))] = rng.randint(0, 256)
        elif mode == 2:  # truncation
            s = s[: rng.randint(2, len(s))]
        else:  # header-region bias
            for _ in range(rng.randint(1, 6)):
                s[rng.randint(0, min(700, len(s)))] = rng.randint(0, 256)
        try:
            decode_jpeg(bytes(s))
        except (ValueError, NotImplementedError):
            pass  # the loud-fail contract


def test_image_phash_properties_and_pairs(spark):
    """The perceptual hash's load-bearing properties: (1) invariance —
    JPEG requantization of a naturalistic image moves <= 3 of 63 bits,
    while unrelated noise sits near half; (2) exactness — identical
    payloads hash identically (hamming 0); (3) the banded pair operator
    finds re-encoded variants of the same image and never pairs the
    unrelated one; (4) the Spark kernel and the pure-Python reference
    (_phash64) agree, and the tiled synthetic path matches the DuckDB
    oracle hash-exactly (covered by the registry selfcheck; re-asserted
    here at sf0.001 via the operator's own outputs being 63-bit)."""
    from trend_o_meter_spark.llm import multimodal as mm
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    img = _blob_image()  # shared helper (also feeds the invariance matrix)

    h0 = mm._phash64(img)
    assert 0 < h0 < (1 << 63)
    for q in (95, 60):
        h1 = mm._phash64(decode_jpeg(encode_jpeg(img, quality=q)))
        assert bin(h0 ^ h1).count("1") <= 3, q
    noise = np.random.RandomState(99).randint(0, 256, (64, 80, 3)).astype(np.uint8)
    assert bin(h0 ^ mm._phash64(noise)).count("1") >= 15

    payload_a = bytearray(encode_jpeg(img, quality=95))
    payload_b = bytearray(encode_jpeg(img, quality=60))  # same image, re-encoded
    payload_c = bytearray(encode_jpeg(noise, quality=85))
    media = spark.createDataFrame(
        [(0, "image", payload_a), (1, "image", payload_b), (2, "image", payload_c)],
        "media_id long, media_type string, content binary",
    )
    fps = {r["media_id"]: r["phash"] for r in mm.image_phash(media).collect()}
    assert len(fps) == 3
    assert bin(fps[0] ^ fps[1]).count("1") <= 3
    pairs = [(r["id_a"], r["id_b"]) for r in mm.image_phash_pairs(media).collect()]
    assert pairs == [(0, 1)]  # the re-encode pairs up; the noise never does
    # end-to-end: clusters close the pair transitively, min-id keeps
    clusters = {r["media_id"]: (r["cluster_id"], r["keep"])
                for r in mm.image_dedup_clusters(media).collect()}
    assert clusters == {0: (0, True), 1: (0, False), 2: (2, True)}


def _blob_image(seed=1, h=64, w=80):
    """Naturalistic multi-blob test image, shared by the phash
    property/pair tests and the invariance matrix."""
    rng = np.random.RandomState(seed)
    yv, xv = np.mgrid[0:h, 0:w].astype(float)
    img = np.zeros((h, w, 3))
    for _ in range(12):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        s, a = rng.uniform(8, 25), rng.uniform(40, 120)
        blob = a * np.exp(-(((yv - cy) / s) ** 2 + ((xv - cx) / s) ** 2))
        for ch in range(3):
            img[:, :, ch] += blob * rng.uniform(0.5, 1.5)
    return np.clip(img, 0, 255).astype(np.uint8)


def _nn_resize(im, fy, fx):
    h, w = im.shape[:2]
    nh, nw = int(round(h * fy)), int(round(w * fx))
    ys = np.arange(nh) * h // nh
    xs = np.arange(nw) * w // nw
    return im[np.ix_(ys, xs)]


def test_image_phash_invariance_matrix():
    """Pinned transform-invariance matrix for the perceptual hash
    (round-10 widening of the <=3-bit JPEG-requant pin).  Invariances
    (near-dup MUST land within the default max_hamming=6): JPEG
    requantization across the whole sane quality range, integer and
    non-integer nearest-neighbor resizes (up, down, anisotropic), and
    resize-then-re-encode.  Pinned SENSITIVITIES (transforms pHash is
    NOT expected to absorb — these must stay far outside the band so
    the operator's false-positive posture is explicit): border crops
    and 90/180-degree rotations."""
    from trend_o_meter_spark.llm import multimodal as mm
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    img = _blob_image()
    h0 = mm._phash64(img)

    def ham(b):
        return bin(h0 ^ b).count("1")

    # -- invariances -----------------------------------------------------
    for q in (95, 85, 60, 40):
        assert ham(mm._phash64(decode_jpeg(encode_jpeg(img, quality=q)))) <= 3, q
    # deep requant (q25) drifts further but stays within the dedup band
    assert ham(mm._phash64(decode_jpeg(encode_jpeg(img, quality=25)))) <= 6
    # integer upscales sample the identical 32x32 grid -> hash-identical
    for fy, fx in ((2, 2), (3, 3), (2, 1)):
        assert ham(mm._phash64(_nn_resize(img, fy, fx))) == 0, (fy, fx)
    # non-integer / down resizes move the grid slightly
    assert ham(mm._phash64(_nn_resize(img, 1.5, 1.5))) <= 4
    assert ham(mm._phash64(_nn_resize(img, 0.5, 0.5))) <= 6
    # composite: resize 2x then re-encode at q60
    r2 = decode_jpeg(encode_jpeg(_nn_resize(img, 2, 2), quality=60))
    assert ham(mm._phash64(r2)) <= 4
    # -- sensitivities (documented non-invariances) -----------------------
    assert ham(mm._phash64(img[3:61, 4:76])) >= 8  # 5% border crop
    assert ham(mm._phash64(np.rot90(img).copy())) >= 15
    assert ham(mm._phash64(np.rot90(img, 2).copy())) >= 15


def test_image_phash_pigeonhole_boundary(spark):
    """Pigeonhole completeness at the boundary: with ``bands`` slices, a
    pair at hamming exactly ``bands - 1`` can corrupt at most bands-1
    slices, so >= 1 slice agrees and the banded join MUST surface it —
    even in the adversarial layout where every flipped bit lands in a
    distinct band.  Also pins the fail-loud guard: max_hamming >= bands
    is a ValueError (completeness would silently break), including via
    the public wrappers."""
    from trend_o_meter_spark.llm import multimodal as mm

    for bands in (7, 3):
        band_bits = 63 // bands
        base = int("0x155555555555555", 16) & ((1 << 63) - 1)
        flipped = base
        for bi in range(bands - 1):  # one bit in each of bands-1 slices
            flipped ^= 1 << (bi * band_bits + 2)
        assert bin(base ^ flipped).count("1") == bands - 1
        fps = spark.createDataFrame(
            [(1, base), (2, flipped)], "media_id long, phash long"
        )
        got = mm._phash_pairs_from_fps(
            fps, max_hamming=bands - 1, bands=bands
        ).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [
            (1, 2, bands - 1)
        ]
    with pytest.raises(ValueError, match="pigeonhole"):
        mm._phash_pairs_from_fps(fps, max_hamming=7, bands=7)
    with pytest.raises(ValueError, match="pigeonhole"):
        mm.image_phash_pairs(
            spark.createDataFrame([], "media_id long, media_type string, content binary"),
            max_hamming=3,
            bands=3,
        )


def test_image_phash_pairs_max_bucket_degenerate(spark):
    """The max_bucket admission cap (round-10, VERDICT r09 #1): a
    degenerate corpus — many blank images whose identical pHash lands
    every fingerprint in the same 7 (band, slice) buckets — makes the
    uncapped candidate join O(n^2); with max_bucket the over-cap
    buckets drop BEFORE the self-join, so the candidate count is
    bounded by cap^2 per bucket.  Capped semantics = exact lower bound:
    genuinely distinct near-dup pairs still meet in their other,
    non-degenerate slices."""
    from trend_o_meter_spark.llm import multimodal as mm
    from trend_o_meter_spark.llm.jpeg import encode_jpeg

    blank = bytes(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=85))
    img = _blob_image()
    rows = [
        (0, "image", bytes(encode_jpeg(img, quality=95))),
        (1, "image", bytes(encode_jpeg(img, quality=60))),
    ] + [(i, "image", blank) for i in range(2, 1002)]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )
    # uncapped on a small slice: the blank block alone yields C(30,2) pairs
    small = media.filter(F.col("media_id") < 32)
    assert mm.image_phash_pairs(small).count() == 1 + 30 * 29 // 2
    # capped at 1k degenerate rows: completes, keeps ONLY the real pair
    capped = mm.image_phash_pairs(media, max_bucket=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]
    # threads through the end-to-end cluster operator
    cl = {
        r["media_id"]: (r["cluster_id"], r["keep"])
        for r in mm.image_dedup_clusters(media, max_bucket=8).collect()
    }
    assert cl[0] == (0, True) and cl[1] == (0, False)
    assert len(cl) == 1002
    # every blank survives as its own singleton under the cap
    assert all(cl[i] == (i, True) for i in range(2, 1002))


def test_on_error_skip_and_decode_errors_quarantine(spark):
    """Best-effort corpus decode (round 9): on_error='skip' keeps the
    job alive past corrupt payloads; decode_errors returns exactly the
    quarantine set, so features(skip) + decode_errors partition the
    sniffable rows with nothing lost silently.  Default stays 'raise'
    (the driver-visible contract is unchanged)."""
    from trend_o_meter_spark.llm import codecs, multimodal
    from trend_o_meter_spark.llm.jpeg import encode_jpeg

    good0 = bytes(encode_jpeg(_test_image(16, 12), quality=85))
    good1 = bytes(encode_jpeg(_test_image(17, 13), quality=85))
    corrupt = bytearray(encode_jpeg(_test_image(18, 14), quality=85))
    corrupt = bytes(corrupt[:140])  # truncated mid-header: sniffs, won't decode
    assert codecs.sniff_strict(corrupt) == "jpeg"
    rows = [(0, "image", good0), (1, "image", corrupt), (2, "image", good1)]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )

    # default: loud per-row failure, unchanged
    with pytest.raises(Exception):
        multimodal.image_features(media).collect()
    # skip: the two good rows survive
    ok = {r["media_id"] for r in multimodal.image_features(media, on_error="skip").collect()}
    assert ok == {0, 2}
    ok2 = {r["media_id"] for r in multimodal.decode_media(media, real=True, on_error="skip").collect()}
    assert ok2 == {0, 2}
    # quarantine: exactly the corrupt row, with class + format recorded
    q = multimodal.decode_errors(media).collect()
    assert [(r["media_id"], r["format"]) for r in q] == [(1, "jpeg")]
    assert q[0]["error"] in ("ValueError", "NotImplementedError")
    # bad mode rejected at build time
    with pytest.raises(ValueError, match="on_error"):
        multimodal.image_features(media, on_error="ignore")

    # ADVICE r09: decode_media(real, skip) must NOT silently drop a
    # payload decode_errors would never record — an unsniffable payload
    # (unknown magic) re-raises even under skip, keeping the
    # features(skip) ∪ decode_errors partition exact for this kernel too
    unsniffed = spark.createDataFrame(
        [(9, "image", b"\x01\x02unknown-magic-payload")],
        "media_id long, media_type string, content binary",
    )
    with pytest.raises(Exception):
        multimodal.decode_media(unsniffed, real=True, on_error="skip").collect()
    assert multimodal.decode_errors(unsniffed).count() == 0


def test_all_codecs_fuzz_malformed_streams_fail_cleanly():
    """The JPEG fuzz contract extended to the whole codec family:
    PNG/BMP/PPM/WAV/AVI decoders must fail malformed input as
    ValueError/NotImplementedError only (never struct.error/IndexError
    inside mapInPandas).  The round-9 sweep (90k trials) fixed BMP/WAV
    header truncations and AVI LIST-size overruns; this is its
    deterministic CI slice."""
    from trend_o_meter_spark.llm import codecs

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    pcm = (rng.randn(2000) * 8000).astype(np.int16)
    frames = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    streams = {
        "png": (bytes(codecs.encode_png(img)), codecs.decode_png),
        "bmp": (bytes(codecs.encode_bmp(img)), codecs.decode_bmp),
        "ppm": (bytes(codecs.encode_ppm(img)), codecs.decode_ppm),
        "wav": (bytes(codecs.encode_wav(pcm, sample_rate=8000)), codecs.decode_wav),
        "avi": (bytes(codecs.encode_avi(frames)), codecs.decode_avi),
    }
    for _name, (base, dec) in streams.items():
        for trial in range(1000):
            s = bytearray(base)
            mode = trial % 4
            if mode == 0:
                for _ in range(rng.randint(1, 4)):
                    s[rng.randint(0, len(s))] = rng.randint(0, 256)
            elif mode == 1:
                for _ in range(rng.randint(8, 30)):
                    s[rng.randint(0, len(s))] = rng.randint(0, 256)
            elif mode == 2:
                s = s[: rng.randint(2, len(s))]
            else:
                for _ in range(rng.randint(1, 6)):
                    s[rng.randint(0, min(200, len(s)))] = rng.randint(0, 256)
            try:
                dec(bytes(s))
            except (ValueError, NotImplementedError):
                pass  # the loud-fail contract


def test_jpeg_baseline_coverage_and_dqt_redefinition_guards():
    """Two silent-garbage paths opened by the multi-scan coefficient
    architecture, pinned shut (round-9 review findings): a baseline
    stream whose per-component scans don't cover every frame component
    would finalize unscanned planes as neutral-gray zeros; a DQT that
    redefines a slot AFTER a scan used it would dequantize that scan
    with the wrong table under deferred dequantization.  Both must fail
    loudly.  (Re-stating the SAME table is legal and accepted.)"""
    from trend_o_meter_spark.llm import jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc, th, table):
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    # 8x8, THREE components 4:4:4, but only component 1 ever scanned
    head = struct.pack(">H", 0xFFD8)
    head += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, 8, 8, 3)
    sof += bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    head += seg(0xFFC0, sof)
    head += seg(0xFFC4, dht(0, 0, jpeg._DC_LUM))
    head += seg(0xFFC4, dht(1, 0, jpeg._AC_LUM))
    scan1 = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan1 += bytes([0b00101011])  # DC cat0 '00' + EOB '1010' + pad '11'
    incomplete = head + scan1 + struct.pack(">H", 0xFFD9)
    with pytest.raises(ValueError, match="coverage incomplete"):
        jpeg.decode_jpeg(incomplete)

    # grayscale frame, scan uses table 0, then DQT REDEFINES table 0
    ghead = struct.pack(">H", 0xFFD8)
    ghead += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    ghead += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    ghead += seg(0xFFC4, dht(0, 0, jpeg._DC_LUM))
    ghead += seg(0xFFC4, dht(1, 0, jpeg._AC_LUM))
    gscan = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])) + bytes([0b00101011])
    redef = seg(0xFFDB, b"\x00" + bytes([2] * 64))
    bad = ghead + gscan + redef + struct.pack(">H", 0xFFD9)
    with pytest.raises(NotImplementedError, match="redefines"):
        jpeg.decode_jpeg(bad)
    # re-stating the identical table is fine
    ok = ghead + gscan + seg(0xFFDB, b"\x00" + bytes([1] * 64)) + struct.pack(">H", 0xFFD9)
    assert jpeg.decode_jpeg(ok).shape == (8, 8, 3)


def test_jpeg_progressive_hand_assembled_spec_vector():
    """A HAND-BUILT progressive stream (not produced by our encoder):
    grayscale 8x24 (three data units), unit quant table, four scans —
    DC first at Al=1, AC first at Al=1 with an EOB2 run spanning two
    blocks (a path the capped encoder never emits), a raw-bit DC
    refinement, and an AC refinement whose EOBn carries both an
    appended run bit and a post-EOB correction bit.  Expected final
    coefficients: block0 DC=65 + AC[zigzag 1]=3, block1 DC=73, block2
    DC=64; with the unit table, DC-only blocks IDCT to DC/8 + 128
    analytically."""
    from trend_o_meter_spark.llm import jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc, th, table):
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    def pack_bits(s):  # '0'/'1' string -> 1-padded bytes (F.1.2.3)
        s = s + "1" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    # custom 2-symbol AC table: 0x01 -> '00', 0x10 (EOBn r=1) -> '01'
    ac_tab = ([0, 2] + [0] * 14, [0x01, 0x10])

    data = struct.pack(">H", 0xFFD8)
    data += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    data += seg(0xFFC2, struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0]))
    data += seg(0xFFC4, dht(0, 0, jpeg._DC_LUM))
    data += seg(0xFFC4, dht(1, 1, ac_tab))
    # scan 1 — DC first, Al=1: shifted DCs 32, 36, 32 -> diffs 32, 4, -4
    # (Annex-K DC codes: cat6='1110', cat3='100'; magnitudes per F.1.4.1)
    data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    data += pack_bits("1110" + "100000" + "100" + "100" + "100" + "011")
    # scan 2 — AC first 1..63, Al=1: block0 coded +1 at k=1 ('00' + '1'),
    # then EOBn r=1 ('01') + appended bit '1' -> eobrun covers blocks 1,2
    data += seg(0xFFDA, bytes([1, 1, 0x01, 1, 63, 0x01]))
    data += pack_bits("00" + "1" + "01" + "1")
    # scan 3 — DC refinement (raw bits): 65&1, 73&1, 64&1 = 1, 1, 0
    data += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    data += pack_bits("110")
    # scan 4 — AC refinement 1..63, Ah=1 Al=0: EOBn r=1 ('01') + appended
    # bit '1' -> eobrun=3 (this block's tail + two skipped blocks), then
    # the tail correction bit '1' strengthens block0's AC from 2 to 3
    data += seg(0xFFDA, bytes([1, 1, 0x01, 1, 63, 0x10]))
    data += pack_bits("01" + "1" + "1")
    data += struct.pack(">H", 0xFFD9)

    out = jpeg.decode_jpeg(data)
    assert out.shape == (8, 24, 3)
    # DC-only blocks: analytically constant DC/8 + 128
    np.testing.assert_array_equal(out[:, 8:16], np.full((8, 8, 3), 137, np.uint8))
    np.testing.assert_array_equal(out[:, 16:24], np.full((8, 8, 3), 136, np.uint8))
    # block0: DC=65, AC natural position (0,1) = 3 — same orthonormal
    # IDCT the decoder uses; independent of the encoder entirely
    coef = np.zeros((8, 8))
    coef[0, 0], coef[0, 1] = 65.0, 3.0
    want = np.clip(np.rint(jpeg._DCT_M.T @ coef @ jpeg._DCT_M + 128.0), 0, 255)
    np.testing.assert_array_equal(out[:, :8], np.repeat(want.astype(np.uint8)[:, :, None], 3, axis=2))


def test_image_features_and_resize_on_jpeg_fixture(spark):
    """A media table whose payloads are REAL JPEGs — baseline AND
    progressive (SOF2) interleaved in the same fixture: sniff routes
    both to the direct-decode path, the extracted stats equal a local
    numpy recompute over the SAME decode (hash-exact feature parity),
    and real resize re-encodes to a JPEG of the target geometry."""
    from trend_o_meter_spark.llm import codecs
    from trend_o_meter_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rows = []
    for i in range(6):
        img = _test_image(16 + i, 12 + (i % 3))
        sub = "420" if i % 2 == 0 else "444"
        enc = encode_jpeg_progressive if i % 3 == 0 else encode_jpeg
        rows.append((i, "image", bytearray(enc(img, quality=85, subsampling=sub))))
    assert any(b"\xff\xc2" in bytes(r[2]) for r in rows)  # SOF2 present
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )

    assert all(codecs.sniff_strict(bytes(r[2])) == "jpeg" for r in rows)
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert len(feats) == 6
    for i, (_mid, _t, payload) in enumerate(rows):
        img = decode_jpeg(bytes(payload))  # the same decode the kernel runs
        s = img.reshape(-1).astype(np.int64)
        got = feats[i]
        assert (got["width"], got["height"]) == (img.shape[1], img.shape[0])
        assert got["n_px"] == s.size
        assert got["mean_px"] == float(s.sum()) / s.size
        assert got["px_histogram"] == np.bincount(s >> 5, minlength=8).tolist()

    resized = {r["media_id"]: bytes(r["content"])
               for r in mm.resize_image(media, width=10, height=7, real=True).collect()}
    for i in range(6):
        assert codecs.sniff(resized[i]) == "jpeg"
        assert decode_jpeg(resized[i]).shape == (7, 10, 3)


def test_jpeg_rejects_cmyk_and_multiscan_accepts_fill_bytes():
    """Review-found gaps, pinned: a 4-component (Adobe CMYK-shaped)
    frame and a non-interleaved scan that covers only one of three
    components used to decode SILENTLY WRONG (K dropped / chroma planes
    left zero) — both must fail loudly; and spec-legal 0xFF fill bytes
    before a marker (T.81 B.1.1.2) must not desync the segment walk."""
    from trend_o_meter_spark.llm.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=85, subsampling="444"))
    sof_at = good.find(b"\xff\xc0")

    cmyk = bytearray(good)
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1) — bump ncomp to 4
    cmyk[sof_at + 9] = 4
    with pytest.raises(NotImplementedError, match="component count"):
        decode_jpeg(bytes(cmyk))

    partial = bytearray(good)
    sos_at = partial.find(b"\xff\xda")
    # SOS body: len(2) ns(1) ... — claim the scan covers one component.
    # Baseline per-component scans are SUPPORTED now (the progressive
    # coefficient architecture), but this hacked header is INCONSISTENT:
    # shrinking ns shifts the Ss/Se/Ah/Al fields onto other bytes, which
    # no longer read (0, 63, 0, 0) — still a loud failure, never garbage
    partial[sos_at + 4] = 1
    with pytest.raises(ValueError, match="progressive parameters"):
        decode_jpeg(bytes(partial))

    # 0xFF fill bytes before the DQT marker: must decode identically
    dqt_at = good.find(b"\xff\xdb")
    filled = bytes(good[:dqt_at]) + b"\xff\xff\xff" + bytes(good[dqt_at:])
    np.testing.assert_array_equal(decode_jpeg(filled), decode_jpeg(bytes(good)))
