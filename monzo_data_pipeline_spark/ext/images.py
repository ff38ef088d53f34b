"""Real image codecs for the multimodal column family — SURVEY.md §2.C5.

Round 1 shipped the image half of C5 as an honest stub (`ext/
multimodal.py::decode_image`) because the container has no imaging
library. This module removes the stub for the formats that need none:
**binary netpbm (P5/P6)** and **uncompressed 24-bit BMP** are fully
specified byte layouts decodable with numpy alone, the same way the
WAV/PCM decoder (`multimodal.py::decode_wav`) needs only `struct`.
Compressed formats (PNG/JPEG) still raise `NotImplementedError` —
entropy coding genuinely requires a codec library.

Reference parity: the reference treats media as opaque blobs end to
end (it is a banking ETL, /root/reference/src/extract/extract.py);
this family is north-star scope — the operations a training-data
pipeline runs over image columns: decode → stats/features → resize →
re-encode, all as Arrow-batched `mapInPandas` stages.

At 100 TB: payloads dominate row size. The decode/resize stages are
mapInPandas (Arrow batches, no shuffle, bounded by
spark.sql.files.maxPartitionBytes); metadata-only readers never touch
the payload column (columnar pruning). Determinism: decode and
nearest-neighbor resize are pure integer operations, so the
`image_decode_stats` / `image_resize_real` registry entries are
oracle-checked (the DuckDB twin recomputes the pixel sums from the
same deterministic payload-synthesis rule with integer arithmetic).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Codecs (pure numpy / stdlib).
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as binary PGM (P5, maxval 255)."""
    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) array, got {arr.shape}")
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _netpbm_header(payload: bytes) -> tuple[bytes, list[int], int]:
    """Parse a netpbm header: magic, then 3 whitespace-separated ints
    (width, height, maxval) with `#` comments allowed between tokens.
    Returns (magic, [w, h, maxval], offset_of_raster)."""
    magic = payload[:2]
    pos, vals = 2, []
    while len(vals) < 3:
        # skip whitespace and comment lines
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed netpbm header")
        vals.append(int(payload[start:pos]))
    # exactly one whitespace byte separates the maxval from the raster
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("malformed netpbm header (no raster separator)")
    return magic, vals, pos + 1


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode binary netpbm: P5 (grayscale) → (h, w, 1), P6 (RGB) →
    (h, w, 3), uint8. maxval must be ≤ 255 (1 byte/sample). Raises
    ValueError on truncation or malformed headers."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    magic, (w, h, maxval), off = _netpbm_header(payload)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError(f"truncated netpbm raster: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) to
    an (h, w, 3) uint8 RGB array. Rows are stored bottom-up and padded
    to 4-byte boundaries; pixels are BGR on disk."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    flip = h > 0  # positive height → bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    if len(payload) < data_off + need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatching image decode: netpbm (P5/P6) and uncompressed BMP
    are decoded for real; compressed formats raise NotImplementedError
    (entropy coding needs a codec library this container lacks)."""
    head = payload[:8]
    if head[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head[:8] == b"\x89PNG\r\n\x1a\n" or head[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "PNG/JPEG decode requires a codec library (zlib inflate / JPEG "
            "entropy decode); only uncompressed netpbm/BMP are supported here"
        )
    raise ValueError("unrecognized image payload")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample: output pixel (y, x) reads source
    pixel (floor(y·h/th), floor(x·w/tw)) — pure integer index math,
    so the result is deterministic and oracle-checkable."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# Deterministic payload synthesis: documents → PPM images. The raster
# bytes are the printable-ASCII projection of the text cycled to fill
# w·h·3 bytes — entirely JVM-side string/binary expressions, so the
# DuckDB oracle can recompute every pixel with integer arithmetic and
# the decode stage is verified end-to-end, not just round-tripped.
# ---------------------------------------------------------------------------


def documents_as_images(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Synthesize a P6 image column from `documents`: raster = the
    doc's printable-ASCII bytes cycled to w·h·3 (space if the doc has
    none — keeps the payload well-formed). Built-ins only; the payload
    column stays a single binary column prunable by metadata readers."""
    n = width * height * 3
    header = b"P6\n%d %d\n255\n" % (width, height)
    clean = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"[^\x20-\x7e]", "")
    clean = F.when(F.length(clean) == 0, F.lit(" ")).otherwise(clean)
    docs = docs.select(F.col("doc_id").alias("media_id"), clean.alias("clean"))
    raster = F.expr(
        f"substring(repeat(clean, CAST(ceil({n} / length(clean)) AS INT)), 1, {n})"
    )
    return docs.select(
        "media_id",
        F.concat(F.lit(header), F.encode(raster, "UTF-8")).alias("payload"),
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode → per-image stats. Malformed
    payloads quarantine as valid=false rows (the NDJSON dead-letter
    policy applied to media) instead of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from monzo_data_pipeline_spark.ext.images import decode_image

        def row(media_id: int, payload: bytes) -> dict:
            try:
                arr = decode_image(payload)
            except (ValueError, NotImplementedError):
                return {
                    "media_id": media_id,
                    "valid": False,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "n_pixels": None,
                    "pix_sum": None,
                }
            h, w, c = arr.shape
            return {
                "media_id": media_id,
                "valid": True,
                "width": w,
                "height": h,
                "channels": c,
                "n_pixels": h * w,
                "pix_sum": int(arr.sum(dtype=np.int64)),
            }

        for pdf in it:
            yield pd.DataFrame(
                [row(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            )

    return media.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL resize stage: decode → nearest-neighbor resample →
    re-encode as P6. Grayscale inputs are expanded to 3 channels so
    the output is uniformly RGB. Invalid payloads are dropped (the
    stats stage is where quarantine reporting lives)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from monzo_data_pipeline_spark.ext.images import (
            decode_image,
            encode_ppm,
            resize_nearest,
        )

        for pdf in it:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image(payload)
                except (ValueError, NotImplementedError):
                    continue
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                small = resize_nearest(arr, target_w, target_h)
                out.append(
                    {
                        "media_id": media_id,
                        "payload": encode_ppm(small),
                        "width": target_w,
                        "height": target_h,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "payload", "width", "height"],
            )

    return media.mapInPandas(batches, schema=RESIZED_IMAGE_SCHEMA)
