"""Baseline JPEG codec (ext/jpeg.py): roundtrip laws, restart
intervals, unsupported-feature rejection, Spark-side quarantine."""

from __future__ import annotations

import numpy as np
import pytest

from monzo_data_pipeline_spark.ext.jpeg import decode_jpeg, encode_jpeg


def test_constant_blocks_roundtrip_exact():
    # DC-only blocks with the all-ones quant table are bit-exact —
    # the property the jpeg_decode_stats oracle relies on
    arr = np.zeros((16, 16), dtype=np.uint8)
    arr[:8, :8], arr[:8, 8:], arr[8:, :8], arr[8:, 8:] = 65, 97, 32, 126
    out = decode_jpeg(encode_jpeg(arr))
    assert out.shape == (16, 16, 1)
    assert np.array_equal(out[:, :, 0], arr)


def test_gray_roundtrip_near_lossless_and_odd_dims():
    rng = np.random.RandomState(11)
    for shape in [(24, 17), (8, 8), (9, 25), (33, 7)]:
        a = rng.randint(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(a))
        assert out.shape == (*shape, 1)
        # all-ones quant: only coefficient rounding error survives
        assert np.abs(out[:, :, 0].astype(int) - a.astype(int)).max() <= 2


def test_color_roundtrip_within_ycbcr_rounding():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(a))
    assert out.shape == a.shape
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 4


def test_restart_intervals_roundtrip():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, (32, 32), dtype=np.uint8)  # 16 MCUs
    p = encode_jpeg(a, restart_interval=3)
    assert b"\xff\xdd" in p  # DRI present
    assert p.count(b"\xff\xd0") + p.count(b"\xff\xd1") >= 1  # RSTn markers
    out = decode_jpeg(p)
    assert np.abs(out[:, :, 0].astype(int) - a.astype(int)).max() <= 2


def test_quant_table_coarse_still_decodes():
    a = (np.arange(256, dtype=np.uint8).reshape(16, 16) // 2) + 64
    q = np.full((8, 8), 16, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(a, quant=q))
    # lossy but sane: mean within a few levels of the source
    assert abs(float(out.mean()) - float(a.mean())) < 8.0


def test_malformed_payloads_raise_value_error():
    good = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8))
    cases = [
        b"",  # empty
        b"\xff\xd8\xff",  # header only
        good[:30],  # truncated segment
        good[:-4],  # truncated scan/EOI
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF
    ]
    for bad in cases:
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_oversampled_and_16bit_rejected():
    good = encode_jpeg(np.full((8, 8, 3), 77, dtype=np.uint8))
    # flip the Y sampling factor byte (0x11 → 0x33) inside SOF0:
    # factors above 2 stay quarantined (1–2 decode since r6)
    i = good.index(b"\xff\xc0")
    sof = bytearray(good)
    # SOF body: len(2) prec(1) h(2) w(2) nc(1) then [id, samp, tq]*
    sof[i + 2 + 2 + 5 + 1 + 1] = 0x33
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(sof))


def test_dispatch_and_spark_quarantine(spark):
    from monzo_data_pipeline_spark.ext import images as IMG

    good = encode_jpeg(np.full((8, 8), 200, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\xff\xd8\xff\xe0 junk"))],
        "media_id bigint, payload binary",
    )
    out = {r.media_id: r for r in IMG.image_stats(media).collect()}
    assert out[1].valid and out[1].pix_sum == 200 * 64 and out[1].channels == 1
    assert not out[2].valid  # malformed JPEG quarantines, not crashes


def test_documents_as_jpegs_matches_rule(spark):
    from monzo_data_pipeline_spark.ext import images as IMG
    from monzo_data_pipeline_spark.ext.jpeg import documents_as_jpegs

    docs = spark.createDataFrame(
        [(1, "AbCd rest ignored"), (2, "x"), (3, "éé")],
        "doc_id bigint, text string",
    )
    stats = {r.media_id: r for r in IMG.image_stats(documents_as_jpegs(docs)).collect()}
    assert stats[1].pix_sum == 64 * (ord("A") + ord("b") + ord("C") + ord("d"))
    assert stats[2].pix_sum == 64 * 4 * ord("x")  # cycled single char
    assert stats[3].pix_sum == 64 * 4 * ord(" ")  # non-ASCII → space rule


def test_multi_scan_and_fill_bytes_decode():
    # legal baseline variants the single-scan assumption used to reject
    rng = np.random.RandomState(21)
    a = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    p = encode_jpeg(a, multi_scan=True)
    assert p.count(b"\xff\xda") == 3  # one SOS per component
    out = decode_jpeg(p)
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 4
    # T.81 B.1.1.2 fill bytes before a marker must be skipped
    i = p.index(b"\xff\xc0")
    filled = p[:i] + b"\xff\xff\xff" + p[i:]
    assert np.array_equal(decode_jpeg(filled), out)
    # multi-scan + restart is an explicit error, not silent corruption
    with pytest.raises(ValueError):
        encode_jpeg(a, multi_scan=True, restart_interval=2)


def test_missing_component_scan_and_empty_stream_raise():
    a = np.full((8, 8, 3), 90, dtype=np.uint8)
    p = encode_jpeg(a, multi_scan=True)
    # drop the last SOS+scan: two of three components decoded
    last_sos = p.rindex(b"\xff\xda")
    with pytest.raises(ValueError, match="missing scans"):
        decode_jpeg(p[:last_sos] + b"\xff\xd9")
    # EOI with no scan at all
    no_scan = p[: p.index(b"\xff\xda")] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(no_scan)


# ---------------------------------------------------------------------------
# progressive (SOF2): spectral selection + successive approximation


def test_progressive_matches_baseline_pixel_exact_randomized():
    """decode(progressive) == decode(baseline) BIT-FOR-BIT: both paths
    produce the same quantized coefficients, so any pixel difference
    is an entropy-coding bug. Random shapes, gray + color, lossless
    and coarse quant tables, with and without refinement scans."""
    from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for trial in range(10):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        ch = int(rng.choice([1, 3]))
        arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        if ch == 1:
            arr = arr[:, :, 0]
        q = (
            np.ones((8, 8), np.int64)
            if trial % 3 == 0
            else rng.integers(1, 50, (8, 8))
        )
        base = decode_jpeg(encode_jpeg(arr, quant=q))
        for refine in (False, True):
            prog = decode_jpeg(
                encode_jpeg_progressive(arr, quant=q, refine=refine)
            )
            assert np.array_equal(base, prog), (
                f"trial={trial} refine={refine} shape={arr.shape}"
            )


def test_progressive_eobrun_heavy_and_flat_images():
    """Long EOB runs across blocks (sparse coefficients) and the
    all-flat image (every AC scan is one maximal run)."""
    from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg_progressive

    flat = np.full((40, 56), 130, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat)),
        decode_jpeg(encode_jpeg(flat)),
    )
    # one bright pixel in an otherwise flat image: most blocks carry
    # zero AC energy -> EOBRUN spans blocks; the hot block refines
    spot = np.full((48, 48), 90, dtype=np.uint8)
    spot[20, 30] = 255
    q = np.full((8, 8), 3, dtype=np.int64)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(spot, quant=q)),
        decode_jpeg(encode_jpeg(spot, quant=q)),
    )
    # alternating extremes: dense coefficients, ZRL-heavy refinement
    checker = (
        (np.indices((24, 24)).sum(axis=0) % 2) * 255
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(checker, quant=q)),
        decode_jpeg(encode_jpeg(checker, quant=q)),
    )


def test_progressive_single_band_and_custom_bands():
    from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg_progressive

    a = (np.arange(17 * 23, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(17, 23)
    one_band = encode_jpeg_progressive(a, bands=((1, 63),))
    many = encode_jpeg_progressive(
        a, bands=((1, 1), (2, 9), (10, 35), (36, 63))
    )
    base = decode_jpeg(encode_jpeg(a))
    assert np.array_equal(decode_jpeg(one_band), base)
    assert np.array_equal(decode_jpeg(many), base)
    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(a, bands=((1, 5), (7, 63)))


def test_progressive_malformed_rejected():
    from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg_progressive

    a = np.full((8, 8), 50, dtype=np.uint8)
    good = encode_jpeg_progressive(a)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-6])  # truncated scan
    # arithmetic-coded progressive (SOF10) still quarantines
    with pytest.raises(ValueError, match="supported"):
        decode_jpeg(good.replace(b"\xff\xc2", b"\xff\xca", 1))


# ---------------------------------------------------------------------------
# Chroma subsampling (r6): 4:2:2 / 4:2:0 encode + decode.
# ---------------------------------------------------------------------------


def _blockwise_gray_rgb(rng, shape):
    """r=g=b image, constant per 8x8 block: Cb=Cr=128 exactly (the
    RGB->YCbCr matrix rows for chroma sum to 0 on equal channels), so
    chroma is constant within EVERY averaging cell and the subsampled
    path must be pixel-identical to 4:4:4."""
    bh, bw = -(-shape[0] // 8), -(-shape[1] // 8)
    g = np.repeat(
        np.repeat(rng.randint(0, 256, (bh, bw)).astype(np.uint8), 8, 0),
        8,
        1,
    )[: shape[0], : shape[1]]
    return np.stack([g] * 3, axis=-1)


def test_subsampled_equals_444_on_chroma_constant_fixtures():
    rng = np.random.RandomState(17)
    for shape in [(16, 16), (17, 23), (8, 8), (15, 9), (33, 31)]:
        rgb = _blockwise_gray_rgb(rng, shape)
        base = decode_jpeg(encode_jpeg(rgb))
        for sub in ("422", "420"):
            got = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
            assert got.shape == base.shape
            assert np.array_equal(got, base), (shape, sub)


def test_subsampled_tolerance_on_random_color():
    # random per-pixel chroma is the adversarial case for box-mean +
    # replication: Y stays full-res (so luma error == the 4:4:4
    # rounding bound) while chroma error is bounded by the cell spread
    rng = np.random.RandomState(29)
    a = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(a)).astype(int)
    for sub in ("422", "420"):
        got = decode_jpeg(encode_jpeg(a, subsampling=sub)).astype(int)
        y_base = 0.299 * base[..., 0] + 0.587 * base[..., 1] + 0.114 * base[..., 2]
        y_got = 0.299 * got[..., 0] + 0.587 * got[..., 1] + 0.114 * got[..., 2]
        # luma is untouched by subsampling, but RGB clipping under big
        # chroma error shifts the recoverable luma at isolated pixels —
        # so bound the TYPICAL luma error tightly, the tail loosely
        assert np.abs(y_got - y_base).mean() <= 2.0
        assert np.percentile(np.abs(y_got - y_base), 95) <= 6.0
        assert np.abs(got - base).mean() < 64  # chroma bounded, not garbage


def test_subsampled_smooth_content_close_to_source():
    # realistic (smooth) content: subsampling error stays within a few
    # code values of the original
    y, x = np.mgrid[0:64, 0:64]
    a = np.stack([(x * 2) % 256, (y * 2) % 256, (x + y) % 256], -1).astype(
        np.uint8
    )
    for sub in ("444", "422", "420"):
        got = decode_jpeg(encode_jpeg(a, subsampling=sub)).astype(int)
        assert np.abs(got - a.astype(int)).max() <= 4, sub


def test_subsampled_restart_intervals():
    rng = np.random.RandomState(31)
    a = rng.randint(0, 256, (32, 48, 3), dtype=np.uint8)
    for sub in ("420", "422"):
        plain = decode_jpeg(encode_jpeg(a, subsampling=sub))
        p = encode_jpeg(a, subsampling=sub, restart_interval=2)
        assert b"\xff\xdd" in p
        assert np.array_equal(decode_jpeg(p), plain), sub


def test_subsampling_guards():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="3-channel"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), subsampling="420")
    with pytest.raises(ValueError, match="multi_scan"):
        encode_jpeg(a, subsampling="420", multi_scan=True)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(a, subsampling="411")


def test_progressive_subsampled_matches_baseline_subsampled():
    """decode(progressive+subsampled) == decode(baseline+subsampled)
    BIT-FOR-BIT: identical padding/downsampling yields identical
    quantized coefficients; the scan scripts differ (interleaved
    MCU-order DC, own-grid AC with MCU-padding blocks carrying DC
    only) but must reconstruct the same planes."""
    from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    for trial in range(6):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        q = (
            np.ones((8, 8), np.int64)
            if trial % 3 == 0
            else rng.integers(1, 50, (8, 8))
        )
        for sub in ("422", "420"):
            base = decode_jpeg(encode_jpeg(arr, quant=q, subsampling=sub))
            for refine in (False, True):
                prog = decode_jpeg(
                    encode_jpeg_progressive(
                        arr, quant=q, refine=refine, subsampling=sub
                    )
                )
                assert np.array_equal(base, prog), (
                    trial, sub, refine, (h, w)
                )


# ---------------------------------------------------------------------------
# 12-bit extended sequential (SOF1, r6).
# ---------------------------------------------------------------------------


def test_jpeg12_constant_blocks_roundtrip_exact():
    # same DC-only exactness law as 8-bit, at 12-bit amplitude
    arr = np.zeros((16, 16), dtype=np.uint16)
    arr[:8, :8], arr[:8, 8:], arr[8:, :8], arr[8:, 8:] = 0, 2048, 4095, 1040
    payload = encode_jpeg(arr, precision=12)
    # frame marker is SOF1, precision byte 12
    i = payload.index(b"\xff\xc1")
    assert payload[i + 4] == 12
    out = decode_jpeg(payload)
    assert out.dtype == np.uint16 and out.shape == (16, 16, 1)
    assert np.array_equal(out[:, :, 0], arr)


def test_jpeg12_random_roundtrip_near_lossless_and_odd_dims():
    rng = np.random.RandomState(23)
    for shape in [(24, 17), (8, 8), (9, 25)]:
        a = rng.randint(0, 4096, shape).astype(np.uint16)
        out = decode_jpeg(encode_jpeg(a, precision=12))
        assert out.shape == (*shape, 1) and out.dtype == np.uint16
        assert np.abs(out[:, :, 0].astype(int) - a.astype(int)).max() <= 2


def test_jpeg12_restart_intervals_roundtrip():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 4096, (16, 40)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(a, precision=12, restart_interval=3))
    assert np.abs(out[:, :, 0].astype(int) - a.astype(int)).max() <= 2


def test_jpeg12_guards():
    # color / multi_scan / out-of-range samples rejected at encode
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint16), precision=12)
    with pytest.raises(ValueError, match="multi_scan"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint16), precision=12,
                    multi_scan=True)
    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg(np.full((8, 8), 4096, dtype=np.uint16), precision=12)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint16), precision=10)
    # 12-bit PROGRESSIVE stays quarantined: flip SOF1 -> SOF2
    good = encode_jpeg(np.full((8, 8), 100, dtype=np.uint16), precision=12)
    hacked = good.replace(b"\xff\xc1", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF1 only"):
        decode_jpeg(hacked)


def test_documents_as_jpegs_12bit_combo_guards(spark):
    # r7 (ADVICE r6): documents_as_jpegs must reject the quarantined
    # 12-bit combinations EAGERLY (driver-side ValueError), not let the
    # progressive branch silently win and KeyError inside an executor
    from monzo_data_pipeline_spark.ext.jpeg import documents_as_jpegs

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="progressive"):
        documents_as_jpegs(docs, progressive=True, precision=12)
    with pytest.raises(ValueError, match="subsampling"):
        documents_as_jpegs(docs, subsampling="420", precision=12)


def test_jpeg12_documents_match_16x_rule(spark):
    from monzo_data_pipeline_spark.ext import images as IMG
    from monzo_data_pipeline_spark.ext.jpeg import documents_as_jpegs

    docs = spark.createDataFrame(
        [(1, "AbCd rest ignored"), (2, "x")],
        "doc_id bigint, text string",
    )
    stats = {
        r.media_id: r
        for r in IMG.image_stats(
            documents_as_jpegs(docs, precision=12)
        ).collect()
    }
    assert stats[1].pix_sum == 16 * 64 * (
        ord("A") + ord("b") + ord("C") + ord("d")
    )
    assert stats[2].pix_sum == 16 * 64 * 4 * ord("x")
    assert stats[1].channels == 1 and stats[1].n_pixels == 256
