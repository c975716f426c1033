"""Multimodal binary-column plumbing: Arrow mapInPandas decode, frame
sampling, resize planning — codecs stubbed, Spark path real."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    resize_plan,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


def _media(spark):
    return synthesize_media(spark.read.parquet(f"{SF}/documents.parquet"))


def test_media_schema_and_kinds(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_metadata_matches_python(spark):
    m = _media(spark).limit(50)
    got = {r.media_id: r for r in decode_media(m).collect()}
    for r in m.collect():
        d = got[r.media_id]
        assert d.n_bytes == len(r.content)
        assert d.content_digest == hashlib.md5(bytes(r.content)).hexdigest()
        if r.kind == "image":
            assert (d.width, d.height, d.n_frames) == (
                64 + len(r.content) % 640,
                64 + len(r.content) % 480,
                1,
            )


def test_frame_sample_bounds(spark):
    fs = frame_sample(_media(spark), every_n=10)
    bad = fs.filter(
        (F.col("frame_idx") < 0)
        | (F.col("frame_idx") >= F.col("n_frames"))
        | (F.col("frame_idx") % 10 != 0)
    )
    assert fs.count() > 0 and bad.count() == 0


def test_resize_preserves_aspect_and_caps(spark):
    rp = resize_plan(_media(spark), max_w=224, max_h=224)
    rows = rp.collect()
    assert rows
    for r in rows:
        assert r.target_w <= 224 and r.target_h <= 224
        # aspect preserved within integer-floor tolerance
        assert abs(r.target_w / r.width - r.target_h / r.height) < 0.05
