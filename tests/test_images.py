"""Real image codec tests (ext/images.py): netpbm/BMP decode, resize,
Spark pipeline stats, quarantine policy, and the encode→decode
round-trip laws a future codec-library decoder must also satisfy."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.ext import images as IMG
from monzo_data_pipeline_spark.ext import multimodal as MM


def _rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _bmp24(arr: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB encoder (bottom-up rows, 4-byte padding)
    — test-local so decode_bmp is checked against an independent
    construction of the spec, not its own inverse."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()  # RGB → BGR
        raster += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return hdr + info + bytes(raster)


class TestCodecs:
    def test_ppm_roundtrip(self):
        arr = _rgb(5, 9)
        assert np.array_equal(IMG.decode_netpbm(IMG.encode_ppm(arr)), arr)

    def test_pgm_roundtrip(self):
        arr = _rgb(4, 6)[:, :, 0]
        out = IMG.decode_netpbm(IMG.encode_pgm(arr))
        assert out.shape == (4, 6, 1)
        assert np.array_equal(out[:, :, 0], arr)

    def test_netpbm_header_comments_and_whitespace(self):
        arr = _rgb(2, 3)
        payload = b"P6\n# a comment\n 3  2 \n# another\n255\n" + arr.tobytes()
        assert np.array_equal(IMG.decode_netpbm(payload), arr)

    def test_bmp_roundtrip_against_independent_encoder(self):
        arr = _rgb(5, 3)  # width 3 → 9-byte rows padded to 12: pad path
        assert np.array_equal(IMG.decode_bmp(_bmp24(arr)), arr)

    def test_bmp_topdown(self):
        arr = _rgb(2, 2)
        payload = bytearray(_bmp24(arr))
        # flip height sign → top-down row order; re-flip raster to match
        h = struct.unpack_from("<i", payload, 22)[0]
        struct.pack_into("<i", payload, 22, -h)
        stride = 2 * 3 + 2
        raster = payload[54:]
        flipped = b"".join(
            bytes(raster[y * stride : (y + 1) * stride]) for y in range(h - 1, -1, -1)
        )
        payload[54:] = flipped
        assert np.array_equal(IMG.decode_bmp(bytes(payload)), arr)

    def test_truncated_raster_raises(self):
        arr = _rgb(4, 4)
        with pytest.raises(ValueError, match="truncated"):
            IMG.decode_netpbm(IMG.encode_ppm(arr)[:-5])
        with pytest.raises(ValueError, match="truncated"):
            IMG.decode_bmp(_bmp24(arr)[:-5])

    def test_jpeg_dispatch_and_malformed_png(self):
        # JPEG decodes for real now (ext/jpeg.py); a JPEG-magic payload
        # with garbage segments is malformed, not unimplemented
        with pytest.raises(ValueError):
            IMG.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
        from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg

        const = np.full((8, 8), 42, dtype=np.uint8)
        assert IMG.decode_image(encode_jpeg(const))[:, :, 0].tolist() == const.tolist()
        # PNG now decodes for real — a PNG-magic payload with no valid
        # chunks is malformed, not unimplemented
        with pytest.raises(ValueError):
            IMG.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
        with pytest.raises(ValueError):
            IMG.decode_image(b"not an image at all")

    def test_multimodal_decode_image_is_real_now(self):
        arr = _rgb(3, 3)
        assert np.array_equal(MM.decode_image(IMG.encode_ppm(arr)), arr)


class TestResize:
    def test_nearest_index_law(self):
        arr = _rgb(16, 16)
        small = IMG.resize_nearest(arr, 4, 4)
        for y in range(4):
            for x in range(4):
                assert np.array_equal(small[y, x], arr[(y * 16) // 4, (x * 16) // 4])

    def test_identity_resize(self):
        arr = _rgb(6, 5)
        assert np.array_equal(IMG.resize_nearest(arr, 5, 6), arr)


class TestSparkPipeline:
    def test_image_stats_and_quarantine(self, spark):
        good = IMG.encode_ppm(_rgb(4, 4, seed=1))
        bad = b"garbage-not-an-image"
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(bad))], "media_id long, payload binary"
        )
        rows = {r["media_id"]: r for r in IMG.image_stats(df).collect()}
        assert rows[1]["valid"] and rows[1]["width"] == 4 and rows[1]["n_pixels"] == 16
        assert rows[1]["pix_sum"] == int(_rgb(4, 4, seed=1).sum())
        assert rows[2]["valid"] is False and rows[2]["pix_sum"] is None

    def test_resize_images_end_to_end(self, spark):
        arr = _rgb(16, 16, seed=3)
        df = spark.createDataFrame(
            [(1, bytearray(IMG.encode_ppm(arr)))], "media_id long, payload binary"
        )
        out = IMG.resize_images(df, 4, 4).collect()
        assert len(out) == 1
        decoded = IMG.decode_netpbm(bytes(out[0]["payload"]))
        assert np.array_equal(decoded, IMG.resize_nearest(arr, 4, 4))

    def test_documents_as_images_payloads_decode(self, spark, sf_dir):
        from monzo_data_pipeline_spark.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(8)
        payloads = IMG.documents_as_images(docs).collect()
        for r in payloads:
            arr = IMG.decode_netpbm(bytes(r["payload"]))
            assert arr.shape == (16, 16, 3)

    def test_oracle_parity_tiny(self, spark, sf_dir):
        """pix_sum computed by the REAL decoder equals the cycling-rule
        sum computed independently in python over the same docs."""
        from monzo_data_pipeline_spark.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(10)
        stats = {
            r["media_id"]: r["pix_sum"]
            for r in IMG.image_stats(IMG.documents_as_images(docs)).collect()
        }
        for row in docs.select("doc_id", "text").collect():
            clean = "".join(c for c in (row["text"] or "") if 0x20 <= ord(c) <= 0x7E)
            clean = clean or " "
            want = sum(ord(clean[i % len(clean)]) for i in range(768))
            assert stats[row["doc_id"]] == want


class TestPng:
    @staticmethod
    def _filtered_png(arr: np.ndarray, filters: list[int]) -> bytes:
        """Test-local PNG writer applying a CHOSEN filter per scanline
        (forward-filtering per the spec) — an independent construction,
        so decode_png's unfiltering is checked against the spec, not
        against encode_png's filter-0-only inverse."""
        import zlib

        h, w, c = arr.shape
        color_type = {1: 0, 3: 2, 4: 6}[c]
        flat = arr.reshape(h, w * c).astype(np.int16)
        bpp = c
        raw = bytearray()
        for y, f in zip(range(h), filters):
            line = flat[y]
            prior = flat[y - 1] if y else np.zeros(w * c, dtype=np.int16)
            out = bytearray([f])
            for j in range(w * c):
                left = int(line[j - bpp]) if j >= bpp else 0
                up = int(prior[j])
                ul = int(prior[j - bpp]) if j >= bpp else 0
                x = int(line[j])
                if f == 0:
                    v = x
                elif f == 1:
                    v = x - left
                elif f == 2:
                    v = x - up
                elif f == 3:
                    v = x - ((left + up) >> 1)
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    v = x - pred
                out.append(v & 0xFF)
            raw += out
        import struct

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + IMG._png_chunk(b"IHDR", ihdr)
            + IMG._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + IMG._png_chunk(b"IEND", b"")
        )

    def test_roundtrip_rgb_rgba_gray(self):
        for c in (1, 3, 4):
            arr = np.random.default_rng(c).integers(0, 256, (6, 5, c), dtype=np.uint8)
            enc = IMG.encode_png(arr[:, :, 0] if c == 1 else arr)
            out = IMG.decode_png(enc)
            assert out.shape == (6, 5, c)
            assert np.array_equal(out, arr)

    def test_all_five_filters_unfilter_correctly(self):
        arr = np.random.default_rng(9).integers(0, 256, (5, 4, 3), dtype=np.uint8)
        payload = self._filtered_png(arr, [0, 1, 2, 3, 4])
        assert np.array_equal(IMG.decode_png(payload), arr)

    def test_palette_png(self):
        import struct
        import zlib

        plte = bytes(range(12))  # 4 palette entries
        idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + IMG._png_chunk(b"IHDR", ihdr)
            + IMG._png_chunk(b"PLTE", plte)
            + IMG._png_chunk(b"IDAT", zlib.compress(raw))
            + IMG._png_chunk(b"IEND", b"")
        )
        out = IMG.decode_png(payload)
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out.reshape(-1, 3), np.frombuffer(plte, np.uint8).reshape(4, 3))

    def test_16bit_rejected(self):
        import struct
        import zlib

        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + IMG._png_chunk(b"IHDR", ihdr)
            + IMG._png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
            + IMG._png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="8-bit"):
            IMG.decode_png(payload)

    def test_dispatch_decodes_png_and_jpeg(self):
        arr = np.random.default_rng(1).integers(0, 256, (3, 3, 3), dtype=np.uint8)
        assert np.array_equal(IMG.decode_image(IMG.encode_png(arr)), arr)
        # JPEG dispatches to the real baseline codec now
        from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg

        out = IMG.decode_image(encode_jpeg(arr))
        assert out.shape == (3, 3, 3)
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 4

    def test_resize_images_png_codec(self, spark):
        arr = np.random.default_rng(4).integers(0, 256, (16, 16, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(IMG.encode_ppm(arr)))], "media_id long, payload binary"
        )
        out = IMG.resize_images(df, 4, 4, codec="png").collect()
        decoded = IMG.decode_png(bytes(out[0]["payload"]))
        assert np.array_equal(decoded, IMG.resize_nearest(arr, 4, 4))


class TestY4m:
    def _frames(self, n=3, h=4, w=5, seed=2):
        return np.random.default_rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)

    def test_roundtrip(self):
        frames = self._frames()
        assert np.array_equal(IMG.decode_y4m(IMG.encode_y4m(frames)), frames)

    def test_frame_parameters_tolerated(self):
        """The spec allows per-frame parameters after FRAME — the
        decoder must skip to the newline, not assume bare markers."""
        frames = self._frames(n=2, h=2, w=2)
        payload = IMG.encode_y4m(frames).replace(b"FRAME\n", b"FRAME Ip\n")
        assert np.array_equal(IMG.decode_y4m(payload), frames)

    def test_planar_layout(self):
        # one 1x1 pixel with distinct Y/U/V: planes must not interleave
        f = np.array([[[[10, 20, 30]]]], dtype=np.uint8)
        payload = IMG.encode_y4m(f)
        assert payload.endswith(b"\x0a\x14\x1e")  # Y=10, U=20, V=30 planar

    def test_subsampled_chroma_rejected(self):
        payload = IMG.encode_y4m(self._frames()).replace(b"C444", b"C420")
        with pytest.raises(ValueError, match="C444"):
            IMG.decode_y4m(payload)

    def test_truncated_frame_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            IMG.decode_y4m(IMG.encode_y4m(self._frames())[:-4])

    def test_video_frame_stats_sampling(self, spark):
        frames = self._frames(n=6, h=2, w=2, seed=8)
        df = spark.createDataFrame(
            [(1, bytearray(IMG.encode_y4m(frames)))], "media_id long, payload binary"
        )
        out = IMG.video_frame_stats(df, every_nth=2).collect()
        assert [r["frame_idx"] for r in out] == [0, 2, 4]
        for r in out:
            assert r["pix_sum"] == int(frames[r["frame_idx"]].sum())

    def test_documents_as_videos_decode(self, spark, sf_dir):
        from monzo_data_pipeline_spark.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(5)
        for r in IMG.documents_as_videos(docs).collect():
            frames = IMG.decode_y4m(bytes(r["payload"]))
            assert frames.shape == (4, 8, 8, 3)


class TestQuarantineRegressions:
    """Crash paths found in review: exception types beyond ValueError
    must quarantine, not fail the Spark stage."""

    def test_corrupt_idat_quarantines(self, spark):
        import zlib

        good = IMG.encode_png(_rgb(3, 3, seed=5))
        # corrupt the DEFLATE stream inside IDAT (raises zlib.error)
        bad = bytearray(good)
        idat = good.index(b"IDAT")
        bad[idat + 8] ^= 0xFF
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytes(bad))], "media_id long, payload binary"
        )
        rows = {r["media_id"]: r["valid"] for r in IMG.image_stats(df).collect()}
        assert rows[1] is True and rows[2] is False

    def test_null_payload_quarantines(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(IMG.encode_ppm(_rgb(2, 2)))), (2, None)],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r["valid"] for r in IMG.image_stats(df).collect()}
        assert rows[1] is True and rows[2] is False

    def test_rgba_png_resizes_via_alpha_drop(self, spark):
        rgba = np.random.default_rng(6).integers(0, 256, (8, 8, 4), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(IMG.encode_png(rgba)))], "media_id long, payload binary"
        )
        out = IMG.resize_images(df, 4, 4).collect()
        assert len(out) == 1
        decoded = IMG.decode_netpbm(bytes(out[0]["payload"]))
        assert np.array_equal(decoded, IMG.resize_nearest(rgba[:, :, :3], 4, 4))

    def test_truncated_y4m_quarantines_in_frame_stats(self, spark):
        frames = np.random.default_rng(1).integers(0, 256, (2, 2, 2, 3), dtype=np.uint8)
        good = IMG.encode_y4m(frames)
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(good[:-3]))],
            "media_id long, payload binary",
        )
        out = IMG.video_frame_stats(df).collect()
        assert {r["media_id"] for r in out} == {1}
