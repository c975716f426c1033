"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata structs; decode / feature-extract / resize / frame-sample
run as Arrow-vectorized ``mapInPandas`` stages so bytes never round-trip
through per-row Python. The sandbox has no image/audio codecs, so the
codec call itself is stubbed (clearly marked) behind a deterministic
fake — the Spark-side plumbing (schema, batch shape, partitioning, UDF
signatures) is real and tested, and swapping the fake for PIL/ffmpeg is
a one-function change.

Reference analogue: none (the reference only moves SQL scalars); this is
a training-pipeline addition the graft calls for.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("content_digest", T.StringType()),
    ]
)


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (no external data): bytes = utf-8 of the text, kind round-robins on
    doc_id. Stands in for `spark.read.format('binaryFile')`."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _fake_decode(content: bytes, kind: str) -> tuple[int, int, int]:
    """STUB CODEC — deterministic fake of (width, height, n_frames).

    Real deployment replaces this one function with PIL.Image.open /
    soundfile / pyav frame counting; everything around it (Arrow batches,
    schema, partitioning) is production-shaped. The fake derives fields
    arithmetically from the byte length so tests (and the SQL oracle in
    __spark_entry__) can verify the pipeline end-to-end.
    """
    n = len(content)
    if kind == "image":
        return 64 + n % 640, 64 + n % 480, 1
    if kind == "audio":
        return 0, 0, 1 + n % 1000  # "frames" = samples/1k
    return 320, 240, 1 + n % 120  # video


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/probe media metadata via ``mapInPandas`` (Arrow batches;
    one pandas frame per partition chunk — no per-row Python round trip
    at the Spark boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].str.len().astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                    "content_digest": [
                        hashlib.md5(c).hexdigest() for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample frame indices per video (1 row → N rows). The index plan is
    pure column expressions (sequence + explode); only the (stubbed)
    pixel fetch would touch the binary payload."""
    decoded = decode_media(media.filter(F.col("kind") == "video"))
    return decoded.select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_plan(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving resize targets for images — metadata math as
    expressions; the pixel resample itself is the stubbed codec step."""
    decoded = decode_media(media.filter(F.col("kind") == "image"))
    scale = F.least(
        F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )
