"""Real image codecs for the multimodal column family — SURVEY.md §2.C5.

The container has no imaging library, but none is needed: **binary
netpbm (P5/P6)** and **uncompressed 24-bit BMP** are fully specified
byte layouts decodable with numpy alone, the same way the WAV/PCM
decoder (`multimodal.py::decode_wav`) needs only `struct`; **PNG**
(8-bit, non-interlaced: gray/RGB/RGBA/palette, all five scanline
filters) decodes with stdlib `zlib` + numpy; **baseline-sequential
JPEG** decodes via `ext/jpeg.py` (numpy Huffman + dequant + IDCT,
r3). Progressive/arithmetic JPEG and subsampled chroma raise
ValueError and quarantine.

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

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.partitioning import fan_out

# Captured as a closure cell by every mapInPandas stage below: a RAW
# driver session (the harness's own, no executor PYTHONPATH, foreign
# cwd) still lets workers import this package — they insert the repo
# root the driver imported it from. Local mode and shared-mount
# clusters resolve the same path; wheel-shipped clusters never hit
# the fallback because the package is already importable.
from monzo_data_pipeline_spark.ext._paths import _PKG_ROOT  # noqa: E402

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
    """Dispatching image decode — every format decodes for REAL:
    netpbm (P5/P6), uncompressed 24-bit BMP, 8-bit non-interlaced PNG
    (DEFLATE via stdlib zlib), and baseline-sequential JPEG
    (`ext/jpeg.py`: Huffman + dequant + IDCT in numpy). Progressive /
    arithmetic / subsampled JPEG raises ValueError from the codec —
    callers quarantine."""
    if not payload:
        raise ValueError("null or empty image payload")
    head = payload[:8]
    if head[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if head[:3] == b"\xff\xd8\xff":
        from monzo_data_pipeline_spark.ext.jpeg import decode_jpeg

        return decode_jpeg(payload)
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
    # r10 (guide §2.5): fan out HERE, at the cheap text stage, so the
    # whole downstream media pipeline (synth → resize → decode, all
    # per-row-expensive) inherits the wide layout and the consumers'
    # own fan_out calls no-op — fanning later would shuffle the
    # synthesized image payloads instead of the source text
    docs = fan_out(docs, "doc_id").select(
        F.col("doc_id").alias("media_id"), clean.alias("clean")
    )
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

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.images import decode_image

        def row(media_id: int, payload: bytes) -> dict:
            try:
                arr = decode_image(payload)
            except Exception:
                # quarantine EVERY decode failure: zlib.error (corrupt
                # DEFLATE), struct.error (truncated headers), TypeError
                # (NULL payload) all escape a ValueError-only clause and
                # would fail the whole Spark stage
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

    # r10 (guide §2.5): parallelize the per-row codec work when the
    # media frame arrives narrow (single-row-group scans = one task)
    return fan_out(media, "media_id").mapInPandas(
        batches, schema=IMAGE_STATS_SCHEMA
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, codec: str = "ppm"
) -> DataFrame:
    """REAL resize stage: decode → nearest-neighbor resample →
    re-encode as P6 PPM or PNG (`codec`). Grayscale inputs are
    expanded to 3 channels so the output is uniformly RGB. Invalid
    payloads are dropped (the stats stage is where quarantine
    reporting lives)."""
    if codec not in ("ppm", "png"):
        raise ValueError(f"unsupported codec {codec!r}")

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image(payload)
                except Exception:  # quarantine every decode failure
                    continue
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                elif arr.shape[2] == 4:
                    arr = arr[:, :, :3]  # valid RGBA PNG → drop alpha
                small = resize_nearest(arr, target_w, target_h)
                out.append(
                    {
                        "media_id": media_id,
                        "payload": enc(small),
                        "width": target_w,
                        "height": target_h,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "payload", "width", "height"],
            )

    return fan_out(media, "media_id").mapInPandas(
        batches, schema=RESIZED_IMAGE_SCHEMA
    )


# ---------------------------------------------------------------------------
# PNG — REAL codec via stdlib zlib (DEFLATE) + numpy unfiltering. The
# PNG container needs no imaging library: signature + chunked layout
# (CRC32 in zlib), IDAT = zlib stream of filtered scanlines, and the
# five scanline filters are byte arithmetic (PNG spec §6). Only JPEG
# remains stubbed (its entropy coding has no stdlib counterpart).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA uint8
    as a PNG (bit depth 8, filter 0 scanlines, one IDAT)."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit, non-interlaced PNG (gray / RGB / RGBA /
    palette) to (h, w, channels) uint8. Full filter support (None,
    Sub, Up, Average, Paeth). Raises ValueError on anything else —
    16-bit and Adam7 are rare in data-pipeline payloads and callers
    quarantine, not crash."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace}): "
            "8-bit non-interlaced only"
        )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            pass
        elif f == 2:  # Up — fully vectorized
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + prior).astype(np.uint8).tobytes()
            )
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in-row
            for j in range(stride):
                left = line[j - bpp] if j >= bpp else 0
                up = int(prior[j])
                ul = int(prior[j - bpp]) if j >= bpp else 0
                if f == 1:
                    line[j] = (line[j] + left) & 0xFF
                elif f == 3:
                    line[j] = (line[j] + ((left + up) >> 1)) & 0xFF
                else:
                    line[j] = (line[j] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    px = out.reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


# ---------------------------------------------------------------------------
# Video — REAL codec: YUV4MPEG2 (y4m), the standard uncompressed video
# container (mjpegtools lineage; ffmpeg's raw-exchange format). Plain
# ASCII stream header + "FRAME"-delimited raw planar frames, so like
# netpbm it needs only numpy. C444 = full-resolution Y/U/V planes.
# With this, all three modalities of C5 decode for real (WAV audio,
# netpbm/BMP/PNG/baseline-JPEG images, y4m video); only H.26x-class
# compressed video remains honestly out of scope.
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: str = "25:1") -> bytes:
    """Encode (n, h, w, 3) uint8 as YUV4MPEG2 C444: stream header,
    then per frame a FRAME marker + planar Y, U, V planes."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) array, got {frames.shape}")
    n, h, w = frames.shape[:3]
    out = [b"YUV4MPEG2 W%d H%d F%s Ip A0:0 C444\n" % (w, h, fps.encode())]
    for f in range(n):
        out.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        out.append(frames[f].transpose(2, 0, 1).astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Decode a YUV4MPEG2 C444 payload to (n_frames, h, w, 3) uint8.
    Parses the tag-style header (W/H/C), walks FRAME markers (frame
    parameters after FRAME are allowed per spec). Raises ValueError on
    malformed streams or subsampled chroma (C420/C422 change plane
    sizes; only C444's full planes are supported here)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "C420jpeg"  # spec default when absent
    for tag in payload[9:nl].split():
        t = tag.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            colorspace = t
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported y4m colorspace {colorspace} (C444 only)")
    frame_bytes = w * h * 3
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        fnl = payload.index(b"\n", pos)
        pos = fnl + 1
        raw = payload[pos : pos + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated y4m frame")
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(3, h, w)
        frames.append(planes.transpose(1, 2, 0))
        pos += frame_bytes
    if not frames:
        raise ValueError("y4m stream with no frames")
    return np.stack(frames)


def documents_as_videos(
    docs: DataFrame, width: int = 8, height: int = 8, n_frames: int = 4
) -> DataFrame:
    """Synthesize a y4m video column from `documents`: the same
    cycled printable-ASCII raster rule as documents_as_images, split
    across `n_frames` FRAME-delimited planar frames — JVM-side string
    expressions only, so the oracle recomputes per-frame sums with
    integer arithmetic."""
    per_frame = width * height * 3
    total = per_frame * n_frames
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A0:0 C444\n" % (width, height)
    clean = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"[^\x20-\x7e]", "")
    clean = F.when(F.length(clean) == 0, F.lit(" ")).otherwise(clean)
    d = docs.select(F.col("doc_id").alias("media_id"), clean.alias("clean"))
    raster = F.expr(
        f"substring(repeat(clean, CAST(ceil({total} / length(clean)) AS INT)), 1, {total})"
    )
    d = d.select("media_id", raster.alias("raster"))
    parts = [F.lit(header)]
    for f in range(n_frames):
        parts.append(F.lit(b"FRAME\n"))
        parts.append(F.encode(F.substring("raster", f * per_frame + 1, per_frame), "UTF-8"))
    return d.select("media_id", F.concat(*parts).alias("payload"))


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pix_sum", T.LongType()),
    ]
)


def video_frame_stats(media: DataFrame, every_nth: int = 1) -> DataFrame:
    """REAL frame sampling: decode the y4m stream, keep every Nth
    frame, emit per-frame stats — one input row → many frame rows
    (the video shape). Arrow-batched; malformed payloads are dropped
    (quarantine reporting belongs to the stats stage of the image
    family)."""

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.images import decode_y4m

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_y4m(payload)
                except Exception:  # quarantine every decode failure
                    continue
                n, h, w = frames.shape[:3]
                for f in range(0, n, every_nth):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": f,
                            "width": w,
                            "height": h,
                            "pix_sum": int(frames[f].sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "pix_sum"],
            )

    return fan_out(media, "media_id").mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA
    )
