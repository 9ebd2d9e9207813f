"""Multimodal binary-column plumbing (llm/multimodal.py).

The decode kernel is a deterministic fake (real codecs are stubbed —
NotImplementedError); these tests pin the Arrow/mapInPandas plumbing:
schema stability, batch correctness vs a local numpy recompute, and
frame-sampling consistency with the metadata.
"""

import numpy as np
import pytest
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


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media, real=True)
    with pytest.raises(NotImplementedError):
        mm.resize_image(media, width=8, height=8, real=True)


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
