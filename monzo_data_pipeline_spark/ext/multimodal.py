"""Multimodal columns — SURVEY.md §2.C5 / north star.

Policy: image/audio/video payloads are opaque `binary` columns with a
typed metadata struct beside them. All media stages decode for REAL
via the stdlib/numpy codecs in `ext/images.py` (netpbm, BMP, 8-bit
PNG, baseline JPEG via `ext/jpeg.py`, y4m video) and `decode_wav`
below (RIFF/PCM audio); only compressed video (H.26x) is out of
scope and quarantines.
Undecodable payloads become dead-letter rows (valid=false), never
stage failures.

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

from monzo_data_pipeline_spark.ext.images import _PKG_ROOT
from monzo_data_pipeline_spark.operators.partitioning import fan_out

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
        T.StructField("valid", T.BooleanType()),
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
    """REAL decode via ext/images.py: netpbm (P5/P6), uncompressed
    24-bit BMP (numpy only), 8-bit non-interlaced PNG (stdlib zlib
    DEFLATE + numpy unfiltering), and baseline-sequential JPEG
    (ext/jpeg.py: numpy Huffman + dequant + IDCT)."""
    from monzo_data_pipeline_spark.ext.images import decode_image as _decode

    return _decode(payload)


def images_as_media(
    imgs: DataFrame,
    mime: str = "image/x-portable-pixmap",
    width: int | None = None,
    height: int | None = None,
) -> DataFrame:
    """Wrap a (media_id, payload) image table into the MEDIA_SCHEMA
    shape: typed meta struct beside the opaque binary column."""
    return imgs.select(
        "media_id",
        "payload",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """REAL Arrow-batched feature extraction over image payloads —
    routed through the `ext/images.py` codecs (netpbm/BMP/PNG/JPEG).

    Per decodable image the feature vector is
    ``[width, height, channels, pix_sum, ch0_sum, ch1_sum, ch2_sum]``
    — all exact integer statistics (≤ 2⁵³, so float64-exact and
    oracle-checkable); absent channels contribute 0. Undecodable
    payloads quarantine as valid=false rows with a null feature (the
    NDJSON dead-letter policy applied to media) instead of failing
    the batch.
    """

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.images import decode_image

        def row(media_id: int, payload: bytes) -> dict:
            n = len(payload) if payload is not None else 0
            try:
                arr = decode_image(payload)
            except Exception:  # quarantine every decode failure
                return {
                    "media_id": media_id,
                    "valid": False,
                    "n_bytes": n,
                    "feature": None,
                }
            h, w, c = arr.shape
            ch = [
                float(arr[:, :, k].sum(dtype=np.int64)) if k < c else 0.0
                for k in range(3)
            ]
            return {
                "media_id": media_id,
                "valid": True,
                "n_bytes": n,
                "feature": [
                    float(w),
                    float(h),
                    float(c),
                    float(arr.sum(dtype=np.int64)),
                    *ch,
                ],
            }

        for pdf in it:
            yield pd.DataFrame(
                [row(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            )

    # r10 (guide §2.5): parallelize the per-row decode when the media
    # frame arrives narrow (single-row-group scans = one task)
    return fan_out(media, "media_id").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
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


def resize_media(
    media: DataFrame, target_w: int = 64, target_h: int = 64, codec: str = "ppm"
) -> DataFrame:
    """REAL image resize over binary payloads — the image-resize slot
    of the multimodal pipeline, routed through the `ext/images.py`
    codecs: decode (netpbm/BMP/PNG) → nearest-neighbor resample →
    re-encode as P6 PPM or PNG, with the meta struct rewritten to the
    new (mime, n_bytes, width, height).

    Undecodable payloads quarantine as valid=false rows carrying the
    ORIGINAL payload and meta (the dead-letter lane keeps the evidence)
    rather than failing the batch. Grayscale expands to RGB and RGBA
    drops alpha so output is uniformly 3-channel.
    """
    if codec not in ("ppm", "png"):
        raise ValueError(f"unsupported codec {codec!r}")
    out_mime = "image/png" if codec == "png" else "image/x-portable-pixmap"

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it):
        import numpy as np
        import pandas as pd

        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.images import (
            decode_image,
            encode_png,
            encode_ppm,
            resize_nearest,
        )

        enc = encode_png if codec == "png" else encode_ppm
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                mime = meta["mime"] if isinstance(meta, dict) else meta.mime
                try:
                    arr = decode_image(payload)
                except Exception:  # quarantine every decode failure
                    rows.append(
                        {
                            "media_id": media_id,
                            "valid": False,
                            "payload": payload,
                            "meta": {
                                "mime": mime,
                                "n_bytes": len(payload) if payload is not None else 0,
                                "width": None,
                                "height": None,
                            },
                        }
                    )
                    continue
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                elif arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                small = enc(resize_nearest(arr, target_w, target_h))
                rows.append(
                    {
                        "media_id": media_id,
                        "valid": True,
                        "payload": small,
                        "meta": {
                            "mime": out_mime,
                            "n_bytes": len(small),
                            "width": target_w,
                            "height": target_h,
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "valid", "payload", "meta"]
            )

    return fan_out(media, "media_id").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


AUDIO_WINDOW_SCHEMA_NOTE = """audio windowing keeps the same opaque-binary
policy: payload = PCM byte stream, meta carries sample_rate/bytes_per_sample;
window boundaries are pure integer arithmetic on those fields."""


def window_audio(
    media: DataFrame,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    window_ms: int = 25,
    hop_ms: int = 10,
) -> DataFrame:
    """Framing for audio payloads: overlapping windows of `window_ms`
    every `hop_ms` (the standard STFT/feature framing), expressed as
    byte-range rows over the opaque payload — built-ins only, map-side,
    one input row → many window rows. A real decoder turns each
    (byte_offset, win_bytes) slice into samples; the Spark-side shape
    (explode arithmetic, offset stamping, slice extraction) is the part
    that matters at 100 TB and is fully exercised here.
    """
    win_bytes = sample_rate * bytes_per_sample * window_ms // 1000
    hop_bytes = sample_rate * bytes_per_sample * hop_ms // 1000
    n = F.octet_length("payload")
    last = F.greatest(
        F.floor((n - win_bytes).cast("double") / hop_bytes).cast("int"),
        F.lit(0),
    )
    wins = media.filter(n >= win_bytes).select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), last)).alias("win_idx"),
    )
    return wins.select(
        "media_id",
        "win_idx",
        (F.col("win_idx") * hop_bytes).cast("long").alias("byte_offset"),
        F.lit(win_bytes).cast("long").alias("win_bytes"),
        F.col("payload")
        .substr(F.col("win_idx") * hop_bytes + 1, F.lit(win_bytes))
        .alias("window_payload"),
    )


# ---------------------------------------------------------------------------
# A REAL decoder: WAV/PCM needs only the stdlib (RIFF chunk walk +
# struct unpack), so the audio modality decodes for real too.
# decode_wav is the library function; wav_features is the Arrow-
# batched Spark surface. Like the image stages above, it references
# module functions — a real decoder is a library dependency by
# nature, and session.py already puts the package on executor
# PYTHONPATH.
# ---------------------------------------------------------------------------

WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("rms_q", T.LongType()),
    ]
)


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload: header walk + PCM sample decode.

    Supports uncompressed PCM (format 1), 8-bit unsigned and 16-bit
    signed little-endian, any channel count. Returns meta plus the
    first channel's samples (ints). Raises ValueError on anything that
    is not a well-formed PCM WAV — callers choose quarantine or fail.
    """
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 16:
        raw = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
        samples = raw[::n_channels]
    elif bits == 8:
        samples = tuple(b - 128 for b in data[::n_channels])
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(data) // block_align if block_align else 0
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "samples": list(samples[:n_frames]),
    }


def wav_features(media: DataFrame) -> DataFrame:
    """Real audio feature extraction over WAV payloads (mapInPandas):
    per clip — duration, peak amplitude, integer-quantized RMS
    (floor(sqrt(mean(s²))·10³): one IEEE sqrt on an exact integer
    mean, deterministic). Malformed payloads quarantine as
    valid=false rows instead of failing the batch (the NDJSON
    dead-letter policy applied to media)."""

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.multimodal import decode_wav

        def row(media_id: int, payload: bytes) -> dict:
            try:
                d = decode_wav(payload)
            except Exception:  # ValueError / struct.error → quarantine
                return {
                    "media_id": media_id,
                    "valid": False,
                    "sample_rate": None,
                    "n_channels": None,
                    "bits_per_sample": None,
                    "n_frames": None,
                    "duration_ms": None,
                    "peak_abs": None,
                    "rms_q": None,
                }
            s = d["samples"]
            n = len(s)
            sumsq = sum(x * x for x in s)
            return {
                "media_id": media_id,
                "valid": True,
                "sample_rate": d["sample_rate"],
                "n_channels": d["n_channels"],
                "bits_per_sample": d["bits_per_sample"],
                "n_frames": d["n_frames"],
                "duration_ms": d["n_frames"] * 1000 // d["sample_rate"],
                "peak_abs": max((abs(x) for x in s), default=0),
                "rms_q": math.floor(math.sqrt(sumsq / n) * 1000) if n else 0,
            }

        for pdf in it:
            yield pd.DataFrame(
                [
                    row(m, p)
                    for m, p in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return fan_out(media, "media_id").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )
