"""Multimodal columns — SURVEY.md §2.C5 / north star.

Policy: image/audio/video payloads are opaque `binary` columns with a
typed metadata struct beside them. All Spark-side plumbing (schema,
partition-friendly layout, Arrow-batched UDF signatures, batch
shapes) is real and tested; the actual media decoding is STUBBED
(this container ships no image/audio libraries) behind
``NotImplementedError`` or a clearly-marked deterministic fake.

At 100 TB: payloads dominate row size, so multimodal transforms run
through mapInPandas (Arrow batches, zero-copy to pandas), metadata-
only queries must never read the payload column (columnar pruning —
keep payloads in their own parquet column, check ReadSchema), and
per-batch work is bounded by spark.sql.files.maxPartitionBytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from `documents`: utf-8 payload bytes +
    typed metadata struct. Stands in for an image/audio table so the
    binary-column plumbing is exercised end-to-end on real testdata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB — real image decode requires PIL/opencv (not in this
    container). The mapInPandas plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires an imaging library; payloads are opaque binary here"
    )


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each task receives pandas batches (payload column as
    Python bytes), computes per-row features, yields typed batches.
    This is the pattern a real decoder plugs into — the stub keeps the
    exact signature, schema, and batch shape.

    The closure is deliberately self-contained (no references to
    module globals): cloudpickle then ships it by value, so executor
    Python workers never need this package importable — the shape that
    survives cluster deployment without shipping wheels.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_feature(payload: bytes) -> list[float]:
            # deterministic stand-in for a media feature extractor:
            # cheap byte statistics; a real decoder+model replaces this
            n = len(payload)
            if n == 0:
                return [0.0, 0.0, 0.0, 0.0]
            return [
                float(n),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload[:64]) % 997),
            ]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(fake_feature),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque payloads: emit one row per
    every_n_bytes offset (the video-frame-sample shape: one input row
    → many sampled rows, position-stamped). Pure built-ins — the
    exploded offsets become real frames when a decoder exists."""
    n = F.octet_length("payload")
    offsets = F.sequence(
        F.lit(0), F.greatest(((n - 1) / every_n_bytes).cast("int"), F.lit(0))
    )
    frames = media.select("media_id", "payload", F.explode(offsets).alias("frame_idx"))
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
        F.col("payload")
        .substr(F.col("frame_idx") * every_n_bytes + 1, F.lit(8))
        .alias("frame_head"),
    )
