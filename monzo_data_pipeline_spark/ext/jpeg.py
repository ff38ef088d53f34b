"""JPEG (JFIF) codec — numpy + stdlib only.

Closes the one remaining `NotImplementedError` in the media family
(SURVEY.md §2.C5): entropy-coded JPEG. Scope is ITU-T T.81 DCT,
Huffman coding, 1-component grayscale or 3-component YCbCr, in
THREE frame types:

  * baseline sequential (SOF0/1) — restart intervals (DRI/RSTn),
    0xFF fill bytes, multi-scan layouts (one non-interleaved SOS
    per component), and (r6) chroma subsampling with factors 1–2
    (4:2:0 / 4:2:2 / 4:4:0 — the layouts of nearly all real-world
    JPEGs): T.81 A.2.3 MCU interleave on decode, box-mean
    downsampling + replication upsampling gated by pixel equality
    against the 4:4:4 path on chroma-constant fixtures;
  * progressive (SOF2, r5) — spectral selection AND successive
    approximation: DC first/refine scans, AC band scans with EOBRUN
    end-of-band runs, AC refinement with per-position correction
    bits (T.81 G.2 / the libjpeg control flow); encoder
    `encode_jpeg_progressive` emits the same scan scripts so the
    decoder is gated by cross-path equality against the baseline
    codec (identical quantized coefficients ⇒ identical pixels).
    Since r6 chroma subsampling works here too: DC scans interleave
    per-MCU (each component's V×H sub-grid), AC scans walk the
    single component's own ceil-dims grid — the MCU-padding blocks
    carry DC only, per T.81;
  * extended sequential (SOF1 at 12-bit precision, r6) — grayscale
    12-bit samples (medical/scientific capture), level shift 2048,
    Huffman tables widened to the 12-bit category ranges (DC diff
    to 15, AC size to 14 — T.81 Tables F.1/F.2), uint16 decode
    output; gated by exact roundtrip on block-constant fixtures.

Arithmetic coding, hierarchical frames, 12-bit progressive/color,
and sampling factors above 2 raise ValueError so callers quarantine
rather than mis-decode. This quarantine lane is FROZEN as a decision,
not a backlog: the supported surface is the complete T.81 Huffman
matrix (SOF0/SOF1/SOF2 × 4:4:4/4:2:2/4:2:0, 12-bit grayscale SOF1),
and the rationale — real-world incidence, offline verification
economics, and the typed-reject contract — is recorded in
SCALE_DESIGN.md "Round-7 decision: the JPEG supported surface".

Both directions are implemented so the codec can gate itself:
`decode_jpeg(encode_jpeg(x))` with an all-ones quantization table is
EXACT on images whose 8×8 blocks are constant (only the DC
coefficient is nonzero, quantizes to an integer, and the IDCT of a
DC-only block is constant) — the property the `jpeg_decode_stats`
registry oracle exploits. On arbitrary content the roundtrip is the
usual JPEG near-lossless bound (coefficient rounding only).

The DCT here is the orthonormal 8×8 DCT-II matrix M (c(0)=√⅛ else
√¼): F = M·f·Mᵀ equals T.81's (1/4)·α(u)α(v)·ΣΣ… definition exactly,
and the inverse is f = Mᵀ·F·M. Per-block transforms are one numpy
matmul over the stacked blocks; only the Huffman bit stream is a
Python loop (bounded by coded symbols, not pixels).

Reference parity: the reference treats media as opaque blobs
(/root/reference/src/extract/extract.py); this module is north-star
scope like the rest of `ext/images.py`.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# repo root for raw-session executor imports — single source of truth
# (_paths is stdlib-only: the codec keeps its numpy+stdlib import graph)
from monzo_data_pipeline_spark.ext._paths import _PKG_ROOT

# ---------------------------------------------------------------------------
# Tables.
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.3 "typical" Huffman tables (luminance): (bits[1..16], values)
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Progressive AC scans need EOBn symbols (r<<4 for r=1..14) that the
# Annex-K baseline table does not define. A flat 8-bit canonical table
# over every symbol a progressive AC scan can emit (EOB0..EOB14, ZRL,
# all (run, size) pairs with size 1..10) is legal DHT (Kraft: 176/256)
# and keeps the encoder deterministic — compression is not the point.
_PROG_AC_VALS = sorted(
    {r << 4 for r in range(15)}
    | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_VALS)  # all codes 8 bits long

# 12-bit extended-sequential (SOF1, r6) tables: DC difference
# categories reach 15 and AC sizes reach 14 at 12-bit precision
# (T.81 Tables F.1/F.2 extended ranges) — beyond what the Annex-K
# 8-bit tables define. Same flat canonical-table idiom as _PROG_AC_*:
# all 16 DC categories at 5 bits (Kraft 16/32, all-ones code unused),
# EOB + ZRL + every (run 0..15, size 1..14) pair at 8 bits (226/256).
_EXT12_DC_BITS = [0] * 16
_EXT12_DC_BITS[4] = 16  # sixteen categories, every code 5 bits
_EXT12_DC_VALS = list(range(16))
_EXT12_AC_VALS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 15)}
)
_EXT12_AC_BITS = [0] * 16
_EXT12_AC_BITS[7] = len(_EXT12_AC_VALS)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_DCT_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the DHT (bits, values) lists."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                # a real marker mid-entropy-data — the scan overran
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align_to_restart(self, n: int) -> None:
        """Discard padding bits, consume the expected RSTn marker."""
        self.acc, self.nbits = 0, 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("missing/mismatched JPEG restart marker")
        self.pos += 2


def _extend(v: int, cat: int) -> int:
    """T.81 EXTEND: map `cat` received bits to the signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder.
# ---------------------------------------------------------------------------


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks, 8, 8), edge-replicated to multiples of 8,
    raster block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


_SUBSAMPLING = {
    # name → (Y_H, Y_V): chroma is always (1, 1); 4:4:4 keeps Y at 1×1
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
}


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
    multi_scan: bool = False,
    subsampling: str = "444",
    precision: int = 8,
) -> bytes:
    """Encode (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 as
    baseline-sequential JFIF. `quant` is an 8×8 quantization table in
    natural order (default all ones — near-lossless, and EXACTLY
    lossless on constant 8×8 blocks). `restart_interval` > 0 emits a
    DRI segment and RSTn markers every that many MCUs — the stream
    shape long scans use for error resilience. `multi_scan` emits one
    non-interleaved SOS per component (the other legal baseline
    layout) instead of a single interleaved scan.

    ``subsampling`` (r6): "444" (every component 1×1), "422" (Y 2×1,
    chroma box-averaged 2× horizontally), or "420" (Y 2×2, chroma
    box-averaged 2×2) — the layouts covering the overwhelming
    majority of real-world JPEGs. Chroma planes are box-mean
    downsampled after edge-replication padding to the MCU grid, so on
    images whose chroma is constant within every averaging cell the
    subsampled roundtrip is pixel-identical to the 4:4:4 path (the
    cross-path equality gate). Requires 3 channels; `multi_scan`
    stays 4:4:4-only (non-interleaved subsampled layouts are rare in
    the wild and unsupported here).

    ``precision=12`` (r6) emits an EXTENDED-SEQUENTIAL frame (SOF1,
    T.81 process 2): 12-bit samples in 0..4095, level shift 2048,
    Huffman tables widened to the 12-bit category ranges (DC diff
    categories to 15, AC sizes to 14 — Tables F.1/F.2). Grayscale
    only — real-world 12-bit JPEG is overwhelmingly single-channel
    (medical/scientific capture), and the 8-bit YCbCr path does not
    define a 12-bit color transform here."""
    if multi_scan and restart_interval:
        raise ValueError("multi_scan with restart intervals not supported")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if precision not in (8, 12):
        raise ValueError(f"unsupported encode precision {precision}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if precision == 12:
        if arr.ndim != 2:
            raise ValueError("12-bit JPEG encode is grayscale-only")
        if multi_scan:
            raise ValueError("12-bit multi_scan unsupported")
        a = np.asarray(arr)
        if a.min() < 0 or a.max() > 4095:
            raise ValueError("12-bit samples must lie in 0..4095")
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    hmax, vmax = _SUBSAMPLING[subsampling] if len(planes) == 3 else (1, 1)
    if subsampling != "444":
        if len(planes) != 3:
            raise ValueError("chroma subsampling requires a 3-channel image")
        if multi_scan:
            raise ValueError("multi_scan supports 4:4:4 only")
    h, w = arr.shape[:2]
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 with entries in 1..255")

    # per-component sampling factors + source planes: Y keeps full
    # resolution at (hmax, vmax); chroma is 1×1 — pad every full-res
    # plane to the MCU grid FIRST (edge replication), then box-mean
    # the chroma so averaging cells never straddle the padded edge
    samp = [(hmax, vmax)] + [(1, 1)] * (len(planes) - 1)
    if (hmax, vmax) != (1, 1):
        mh, mw = 8 * vmax, 8 * hmax
        ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
        padded = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            for p in planes
        ]
        planes = [padded[0]] + [
            p.reshape(ph // vmax, vmax, pw // hmax, hmax).mean(axis=(1, 3))
            for p in padded[1:]
        ]

    if precision == 12:
        dc_bits, dc_vals = _EXT12_DC_BITS, _EXT12_DC_VALS
        ac_bits, ac_vals = _EXT12_AC_BITS, _EXT12_AC_VALS
    else:
        dc_bits, dc_vals = _STD_DC_BITS, _STD_DC_VALS
        ac_bits, ac_vals = _STD_AC_BITS, _STD_AC_VALS
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    level = float(1 << (precision - 1))
    max_ac_cat = 14 if precision == 12 else 10
    wr = _BitWriter()
    scan_parts: list[bytes] = []
    preds = [0] * len(planes)
    n_comp = len(planes)
    # all components share quant table 0 and huffman table 0 (legal,
    # keeps the stream minimal); 4:4:4 → MCU = one block per component
    coeff = []
    grid_w = []  # per comp: block-grid width (for MCU block addressing)
    for plane in planes:
        f = _blocks(plane) - level
        d = np.einsum("ux,bxy,vy->buv", _DCT_M, f, _DCT_M)
        coeff.append(np.rint(d / q).astype(np.int64))
        grid_w.append(-(-plane.shape[1] // 8))
    n_blocks = coeff[0].shape[0]

    def encode_block(ci: int, b: int, wr: _BitWriter, preds: list[int]) -> None:
        zz = coeff[ci][b].reshape(64)[ZIGZAG]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        cat = _category(diff)
        if cat not in dc_codes:
            raise ValueError(
                f"DC category {cat} exceeds the {precision}-bit table"
            )
        code, length = dc_codes[cat]
        wr.write(code, length)
        if cat:
            wr.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_codes[0xF0]  # ZRL
                wr.write(zc, zl)
                run -= 16
            cat = _category(v)
            if cat > max_ac_cat:
                raise ValueError(
                    f"AC size {cat} exceeds the {precision}-bit table"
                )
            code, length = ac_codes[(run << 4) | cat]
            wr.write(code, length)
            wr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
            run = 0
        if run:
            ec, el = ac_codes[0x00]  # EOB
            wr.write(ec, el)

    if multi_scan and n_comp > 1:
        # one non-interleaved scan per component (scan bytes per comp)
        comp_scans: list[bytes] = []
        for ci in range(n_comp):
            wr = _BitWriter()
            preds = [0] * n_comp
            for b in range(n_blocks):
                encode_block(ci, b, wr, preds)
            comp_scans.append(wr.flush())
        scan = None
    else:
        if (hmax, vmax) == (1, 1):
            n_mcu = n_blocks
            mcus_x = grid_w[0]
        else:
            mcus_x = grid_w[0] // hmax
            n_mcu = coeff[0].shape[0] // (hmax * vmax)
        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                scan_parts.append(wr.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + ((m // restart_interval - 1) & 7)])
                )
                wr = _BitWriter()
                preds = [0] * n_comp
            if (hmax, vmax) == (1, 1):
                for ci in range(n_comp):
                    encode_block(ci, m, wr, preds)
            else:
                # T.81 A.2.3 MCU order: each component's V×H block
                # sub-grid in raster order, components in SOF order
                my, mx = divmod(m, mcus_x)
                for ci in range(n_comp):
                    hh, vv = samp[ci]
                    for iv in range(vv):
                        for ih in range(hh):
                            b = (my * vv + iv) * grid_w[ci] + mx * hh + ih
                            encode_block(ci, b, wr, preds)
        scan_parts.append(wr.flush())
        scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + zz_q))  # DQT: Pq=0, Tq=0
    sof = struct.pack(">BHHB", precision, h, w, n_comp)
    for ci in range(n_comp):
        hh, vv = samp[ci]
        sof += bytes([ci + 1, (hh << 4) | vv, 0])  # id, HxV sampling, quant 0
    # SOF0 = baseline (8-bit); SOF1 = extended sequential (12-bit)
    out.append(seg(0xFFC1 if precision == 12 else 0xFFC0, sof))
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    dht += bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    out.append(seg(0xFFC4, dht))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    if multi_scan and n_comp > 1:
        for ci in range(n_comp):
            sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
            out.append(seg(0xFFDA, sos))
            out.append(comp_scans[ci])
    else:
        sos = bytes([n_comp])
        for ci in range(n_comp):
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([0, 63, 0])
        out.append(seg(0xFFDA, sos))
        out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# Decoder.
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/1), progressive-Huffman
    (SOF2, r5) or 12-bit extended-sequential grayscale (SOF1, r6)
    JPEG to (h, w, 1) grayscale or (h, w, 3) RGB — uint8 at 8-bit
    precision, uint16 at 12-bit. Raises ValueError on arithmetic /
    hierarchical / 12-bit-progressive / 12-bit-color streams and on
    malformed or truncated data — callers quarantine, not crash."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, tq)])
    precision = 8
    restart_interval = 0
    decoded: dict[int, np.ndarray] = {}  # cid → padded plane
    prog_coef: dict[int, np.ndarray] | None = None  # cid → (blocks, 64) zigzag
    while True:
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG header")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG header")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI — finalize below
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn:
            pos += 2  # standalone markers carry no length field
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG header")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if len(zz) != 64:
                    raise ValueError("short DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short DHT")
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if len(body) < 6:
                raise ValueError("short SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec == 12:
                # extended sequential (SOF1) only; 12-bit progressive
                # stays quarantined, as does 12-bit color (no 12-bit
                # YCbCr transform defined here)
                if marker != 0xC1:
                    raise ValueError("12-bit JPEG supported for SOF1 only")
                if nc != 1:
                    raise ValueError("12-bit JPEG decode is grayscale-only")
            elif prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            precision = prec
            if len(body) < 6 + 3 * nc:
                raise ValueError("short SOF segment")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hh, vv = samp >> 4, samp & 0x0F
                if hh not in (1, 2) or vv not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {hh}x{vv}"
                    )
                comps.append((cid, tq, hh, vv))
            frame = (h, w, comps)
            if marker == 0xC2:
                prog_coef = {}
                for cid, _, hh, vv in comps:
                    gh, gw = _prog_grid(h, w, comps, hh, vv)
                    prog_coef[cid] = np.zeros((gh * gw, 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline-sequential and progressive-Huffman "
                "JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — one of possibly several scans
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("short SOS segment")
            ns = body[0]
            scan_tables = {}
            scan_order = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            if prog_coef is not None:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if restart_interval:
                    raise ValueError(
                        "restart intervals in progressive scans unsupported"
                    )
                pos = _decode_scan_progressive(
                    payload,
                    pos + 2 + ln,
                    frame,
                    scan_order,
                    scan_tables,
                    htables,
                    prog_coef,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0x0F,
                )
                continue
            pos = _decode_scan(
                payload,
                pos + 2 + ln,
                frame,
                scan_tables,
                qtables,
                htables,
                restart_interval,
                decoded,
                level=float(1 << (precision - 1)),
            )
            continue
        # APPn / COM / anything else with a length: skip
        pos = pos + 2 + ln

    if prog_coef is not None:
        # all scans accumulated coefficient state; dequantize + IDCT once
        h, w, comps = frame
        for cid, tq, hh, vv in comps:
            if tq not in qtables:
                raise ValueError("missing quantization table")
            gh, gw = _prog_grid(h, w, comps, hh, vv)
            zz = prog_coef[cid]
            nat = np.zeros((zz.shape[0], 64), dtype=np.int64)
            nat[:, ZIGZAG] = zz
            blocks = nat.reshape(-1, 8, 8) * qtables[tq][None, :, :]
            # f = Mᵀ·F·M, batched (the baseline per-block `mt @ F @ M`)
            pix = (
                np.einsum(
                    "ux,buv,vy->bxy",
                    _DCT_M,
                    blocks.astype(np.float64),
                    _DCT_M,
                )
                + 128.0
            )
            plane = (
                pix.reshape(gh, gw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(gh * 8, gw * 8)
            )
            decoded[cid] = plane
    if frame is None or not decoded:
        raise ValueError("JPEG with no scan data")
    h, w, comps = frame
    missing = [cid for cid, _, _, _ in comps if cid not in decoded]
    if missing:
        raise ValueError(f"JPEG missing scans for components {missing}")
    # per T.81 A.1.1 each component's true extent is ceil(dim·f/fmax);
    # subsampled components upsample by sample replication back to the
    # full grid (mirrors the encoder's box-mean: exact wherever chroma
    # is constant within an averaging cell)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    planes = []
    for cid, _, hh, vv in comps:
        cw, ch = -(-(w * hh) // hmax), -(-(h * vv) // vmax)
        p = decoded[cid][:ch, :cw]
        if hh != hmax or vv != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vv, axis=0), hmax // hh, axis=1
            )
        planes.append(
            np.clip(np.round(p[:h, :w]), 0, (1 << precision) - 1)
        )
    if len(planes) == 1:
        dt = np.uint16 if precision > 8 else np.uint8
        return planes[0].astype(dt)[:, :, None]
    if len(planes) == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported component count {len(planes)}")


def _prog_grid(h, w, comps, hh, vv) -> tuple[int, int]:
    """A component's PADDED coefficient-grid dims in a progressive
    frame: multi-component frames interleave DC scans over the MCU
    grid (so every component's grid pads to mcus × its factors);
    single-component frames only ever scan non-interleaved, so the
    grid is the plain ceil(dim/8) one (factors are irrelevant)."""
    if len(comps) == 1:
        return -(-h // 8), -(-w // 8)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    return (-(-h // (8 * vmax))) * vv, (-(-w // (8 * hmax))) * hh


def _decode_scan(
    data, pos, frame, scan_tables, qtables, htables, ri, decoded,
    level: float = 128.0,
):
    """Decode ONE scan's entropy data: all frame components listed in
    the scan, interleaved (ns > 1) or non-interleaved (ns = 1 — the
    legal baseline multi-scan layout, one SOS per component).

    Sampling-general (r6): interleaved MCUs carry each component's
    V×H block sub-grid in raster order (T.81 A.2.3) over a
    ceil(w/8Hmax) × ceil(h/8Vmax) MCU grid; a non-interleaved scan
    walks the single component's OWN ceil(cw/8) × ceil(ch/8) grid one
    block per MCU (A.2.2). With 4:4:4 both rules degenerate to the
    one-block-per-component grid this decoder always had. Planes land
    in `decoded` at component resolution (the caller upsamples);
    returns the payload offset of the next marker."""
    h, w, comps = frame
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    rd = _BitReader(data, pos)
    scan_comps = [c for c in comps if c[0] in scan_tables]
    if len(scan_comps) != len(scan_tables):
        raise ValueError("SOS lists a component absent from SOF")
    if len(scan_comps) == 1:
        # non-interleaved: one block per MCU over the component's grid
        cid0, _, hh0, vv0 = scan_comps[0]
        cw, ch = -(-(w * hh0) // hmax), -(-(h * vv0) // vmax)
        gw = {cid0: -(-cw // 8)}
        gh = {cid0: -(-ch // 8)}
        n_mcu = gw[cid0] * gh[cid0]
        mcu_layout = [(cid0, scan_comps[0][1], 1, 1)]
    else:
        gw = {c[0]: -(-w // (8 * hmax)) * c[2] for c in scan_comps}
        gh = {c[0]: -(-h // (8 * vmax)) * c[3] for c in scan_comps}
        n_mcu = (-(-w // (8 * hmax))) * (-(-h // (8 * vmax)))
        mcu_layout = [(c[0], c[1], c[2], c[3]) for c in scan_comps]
    planes = {
        cid: np.zeros((gh[cid] * 8, gw[cid] * 8))
        for cid, _, _, _ in scan_comps
    }
    preds = {cid: 0 for cid, _, _, _ in scan_comps}
    mt = _DCT_M.T
    mcus_x = (
        gw[scan_comps[0][0]]
        if len(scan_comps) == 1
        else -(-w // (8 * hmax))
    )
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            rd.align_to_restart((m // ri - 1) & 7)
            preds = {cid: 0 for cid, _, _, _ in scan_comps}
        my, mx = divmod(m, mcus_x)
        for cid, tq, hh, vv in mcu_layout:
            if tq not in qtables:
                raise ValueError("missing quantization table")
            td, ta = scan_tables[cid]
            try:
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
            except KeyError:
                raise ValueError("missing Huffman table") from None
            for iv in range(vv):
                for ih in range(hh):
                    by, bx = my * vv + iv, mx * hh + ih
                    zz = np.zeros(64, dtype=np.int64)
                    sym = _read_symbol(rd, dc_tab)
                    preds[cid] += _extend(rd.receive(sym), sym)
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(rd, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        zz[k] = _extend(rd.receive(s), s)
                        k += 1
                    nat = np.zeros(64, dtype=np.int64)
                    nat[ZIGZAG] = zz
                    block = nat.reshape(8, 8) * qtables[tq]
                    pix = mt @ block.astype(np.float64) @ _DCT_M + level
                    planes[cid][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = pix
    decoded.update(planes)
    # skip padding bits/bytes to the next marker (0xFF not followed by
    # the 0x00 stuffing byte)
    p = rd.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _read_symbol(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# Spark surface: deterministic JPEG synthesis from `documents`, so the
# codec itself sits under the oracle gate. Constant 8×8 blocks are the
# one JPEG content class whose roundtrip is bit-exact with an all-ones
# quant table (DC-only, integer coefficient) — the DuckDB twin
# recomputes the pixel sums from the same character-cycling rule.
# ---------------------------------------------------------------------------


def documents_as_jpegs(
    docs,
    progressive: bool = False,
    subsampling: str = "444",
    precision: int = 8,
):
    """(doc_id, text) → (media_id, payload): a 16×16 grayscale JPEG
    whose four 8×8 blocks are constants taken from the doc's first
    four printable-ASCII codes (cycled; space if none) — the same
    cleaning rule as `images.documents_as_images`. ``progressive``
    emits SOF2 streams (DC first/refine + banded AC first/refine
    scans) instead of baseline; the quantized coefficients are
    identical either way, so both variants share one oracle.

    ``subsampling`` ≠ "444" (r6) emits a COLOR stream instead — the
    same per-block constants replicated into r=g=b, whose exact
    YCbCr image is Y=v, Cb=Cr=128 (the chroma matrix rows sum to 0 on
    equal channels): chroma is constant everywhere, so 4:2:0/4:2:2
    box-mean + replication roundtrips bit-exact and the decoded pixel
    sum is exactly 3× the grayscale rule — one shared oracle family.

    ``precision=12`` (r6) emits EXTENDED-SEQUENTIAL (SOF1) 12-bit
    streams whose block constants are the same codes shifted left 4
    bits (code·16 ∈ 0..2032 ⊂ 0..4095): DC-only blocks stay exactly
    representable, so the decoded pixel sum is exactly 16× the
    grayscale rule — again one oracle family, one multiplier.
    Arrow-batched mapInPandas; encode is pure numpy."""
    import re

    # 12-bit is SOF1-only here (mirrors encode_jpeg's multi_scan guard):
    # without these guards the progressive branch would silently win and
    # feed 12-bit-range samples to the 8-bit progressive encoder, whose
    # DC category table overflows as a raw KeyError instead of the
    # documented quarantine ValueError.
    if precision == 12 and progressive:
        raise ValueError(
            "12-bit progressive encode is not supported "
            "(quarantine lane: SOF2 is 8-bit here)"
        )
    if precision == 12 and subsampling != "444":
        raise ValueError(
            "12-bit encode is grayscale SOF1 only; "
            "subsampling requires precision=8"
        )

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    pkg_root = _PKG_ROOT  # closure cell: ships to workers by value

    def batches(it):
        import sys

        if pkg_root not in sys.path:  # raw-session workers
            sys.path.insert(0, pkg_root)
        from monzo_data_pipeline_spark.ext.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )

        if progressive:
            def enc(a):
                return encode_jpeg_progressive(a, subsampling=subsampling)
        elif precision == 12:
            def enc(a):
                return encode_jpeg(a, precision=12)
        else:
            def enc(a):
                return encode_jpeg(a, subsampling=subsampling)

        def synth(text):
            clean = re.sub(r"[^\x20-\x7e]", "", text or "") or " "
            dt = np.uint16 if precision == 12 else np.uint8
            arr = np.zeros((16, 16), dtype=dt)
            for k in range(4):
                v = ord(clean[k % len(clean)])
                if precision == 12:
                    v <<= 4
                arr[(k // 2) * 8 : (k // 2) * 8 + 8, (k % 2) * 8 : (k % 2) * 8 + 8] = v
            if subsampling != "444" and precision != 12:
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            return enc(arr)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": pdf["text"].map(synth),
                }
            )

    # r10 (guide §2.5): single-row-group inputs scan as ONE task, which
    # serializes the whole encode (and the decode stage that inherits
    # this partitioning). Fan the rows out across the cluster before
    # the Python boundary; no-op when the scan already arrives wide.
    from ..operators.partitioning import fan_out

    return fan_out(docs.select("doc_id", "text"), "doc_id").mapInPandas(
        batches, schema=schema
    )


# ---------------------------------------------------------------------------
# Progressive (SOF2) — spectral selection + successive approximation.
#
# Encoder and decoder are written as MIRRORS of one walk: the decoder
# follows T.81 G.2 (the libjpeg control flow — EOBRUN bands, ZRL
# zero-history skips, per-position correction bits read while walking),
# and the encoder simulates that exact walk, emitting the bits the
# decoder will consume in the same order (EOB symbols carry their run
# length, so a run's correction bits buffer until the run flushes).
# Both phases of the trade are covered: DC first/refine scans use the
# ARITHMETIC point transform (v >> Al on the signed value; refinement
# ORs magnitude bits back in), AC scans the SIGN-MAGNITUDE transform
# (±(|v| >> Al)) with ±1<<Al refinement — the T.81/libjpeg convention.
# ---------------------------------------------------------------------------


def encode_jpeg_progressive(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    refine: bool = True,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    subsampling: str = "444",
) -> bytes:
    """Encode as progressive JFIF (SOF2). Scan script: one interleaved
    DC-first scan (+ one DC-refine when ``refine``), then per
    component one AC-first scan per spectral band (+ matching
    AC-refine scans when ``refine``; Al walks 1 → 0). Same component
    model as `encode_jpeg` (8-bit, shared tables). The quantized
    coefficients are IDENTICAL to the baseline encoder's, so
    `decode_jpeg(encode_jpeg_progressive(x, q))` must equal
    `decode_jpeg(encode_jpeg(x, q))` bit-for-bit — the cross-path test
    that gates both codecs against each other.

    ``subsampling`` (r6) accepts the same "444"/"422"/"420" layouts
    as the baseline encoder, with the same padding + box-mean chroma:
    DC scans interleave each component's V×H block sub-grid per MCU
    (T.81 A.2.3); AC scans are always non-interleaved and walk the
    single component's OWN ceil-dims block grid (A.2.2) — the
    MCU-padding blocks carry DC only, exactly as T.81 prescribes."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 with entries in 1..255")
    lo_hi = []
    last = 0
    for lo, hi in bands:
        if lo != last + 1 or hi < lo or hi > 63:
            raise ValueError("bands must partition 1..63 in order")
        last = hi
    if last != 63:
        raise ValueError("bands must partition 1..63 in order")
    del lo_hi

    hmax, vmax = _SUBSAMPLING[subsampling] if len(planes) == 3 else (1, 1)
    if subsampling != "444" and len(planes) != 3:
        raise ValueError("chroma subsampling requires a 3-channel image")
    samp = [(hmax, vmax)] + [(1, 1)] * (len(planes) - 1)
    # comp true dims BEFORE padding (A.1.1: ceil(dim·f/fmax))
    comp_dims = [
        (-(-(h * vv) // vmax), -(-(w * hh) // hmax)) for hh, vv in samp
    ]
    if (hmax, vmax) != (1, 1):
        mh, mw = 8 * vmax, 8 * hmax
        ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
        padded = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            for p in planes
        ]
        planes = [padded[0]] + [
            p.reshape(ph // vmax, vmax, pw // hmax, hmax).mean(axis=(1, 3))
            for p in padded[1:]
        ]

    dc_codes = _canonical_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    n_comp = len(planes)
    coef = []  # per comp: (padded_grid_blocks, 64) zigzag-order ints
    grid_w = []  # padded block-grid width per comp
    own = []  # (own_bh, own_bw): the component's ceil-dims grid
    for ci, plane in enumerate(planes):
        f = _blocks(plane) - 128.0
        d = np.einsum("ux,bxy,vy->buv", _DCT_M, f, _DCT_M)
        zz = np.rint(d / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        coef.append(zz)
        grid_w.append(-(-plane.shape[1] // 8))
        ch, cw = comp_dims[ci]
        own.append((-(-ch // 8), -(-cw // 8)))
    if (hmax, vmax) == (1, 1):
        dc_order = [
            (ci, b) for b in range(coef[0].shape[0]) for ci in range(n_comp)
        ]
    else:
        mcus_x = grid_w[0] // hmax
        n_mcu = coef[0].shape[0] // (hmax * vmax)
        dc_order = []
        for m in range(n_mcu):
            my, mx = divmod(m, mcus_x)
            for ci in range(n_comp):
                hh, vv = samp[ci]
                for iv in range(vv):
                    for ih in range(hh):
                        dc_order.append(
                            (ci, (my * vv + iv) * grid_w[ci] + mx * hh + ih)
                        )

    def ac_blocks(ci: int) -> list[int]:
        oh, ow = own[ci]
        return [by * grid_w[ci] + bx for by in range(oh) for bx in range(ow)]

    def dc_first_scan(al: int) -> bytes:
        wr = _BitWriter()
        preds = [0] * n_comp
        for ci, b in dc_order:
            v = int(coef[ci][b, 0]) >> al  # arithmetic shift
            diff = v - preds[ci]
            preds[ci] = v
            cat = _category(diff)
            code, length = dc_codes[cat]
            wr.write(code, length)
            if cat:
                wr.write(
                    diff if diff >= 0 else diff + (1 << cat) - 1, cat
                )
        return wr.flush()

    def dc_refine_scan(al: int) -> bytes:
        wr = _BitWriter()
        for ci, b in dc_order:
            wr.write((int(coef[ci][b, 0]) >> al) & 1, 1)
        return wr.flush()

    def ac_first_scan(ci: int, lo: int, hi: int, al: int) -> bytes:
        wr = _BitWriter()
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            nb = eobrun.bit_length() - 1
            code, length = ac_codes[nb << 4]
            wr.write(code, length)
            if nb:
                wr.write(eobrun - (1 << nb), nb)
            eobrun = 0

        for b in ac_blocks(ci):
            zz = coef[ci][b]
            r = 0
            wrote = False
            for k in range(lo, hi + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    zc, zl = ac_codes[0xF0]
                    wr.write(zc, zl)
                    r -= 16
                tv = t if v >= 0 else -t
                cat = _category(tv)
                code, length = ac_codes[(r << 4) | cat]
                wr.write(code, length)
                wr.write(tv if tv >= 0 else tv + (1 << cat) - 1, cat)
                r = 0
                wrote = True
            if r or not wrote:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wr.flush()

    def ac_refine_scan(ci: int, lo: int, hi: int, al: int) -> bytes:
        # mirror of the decoder walk: newly-nonzero = |v|>>al == 1,
        # old-nonzero = |v|>>al > 1 (one correction bit each, read by
        # the decoder while WALKING, so emit in position order);
        # correction bits under a pending EOB run buffer until the run
        # flushes (the run length rides the EOB symbol itself).
        wr = _BitWriter()
        eobrun = 0
        pending: list[int] = []  # correction bits buffered under eobrun

        def flush_eob() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            nb = eobrun.bit_length() - 1
            code, length = ac_codes[nb << 4]
            wr.write(code, length)
            if nb:
                wr.write(eobrun - (1 << nb), nb)
            for bit in pending:
                wr.write(bit, 1)
            pending.clear()
            eobrun = 0

        for b in ac_blocks(ci):
            zz = coef[ci][b]
            absv = [abs(int(zz[k])) >> al for k in range(lo, hi + 1)]
            vals = [int(zz[k]) for k in range(lo, hi + 1)]
            n = hi - lo + 1
            k = 0
            block_open = False  # a symbol was emitted for this block
            while k < n:
                # find next newly-nonzero position
                knew = None
                z = 0
                j = k
                while j < n:
                    if absv[j] == 1:
                        knew = j
                        break
                    if absv[j] == 0:
                        z += 1
                    j += 1
                if knew is None:
                    break  # rest of block folds into the EOB run
                while z > 15:
                    flush_eob()
                    zc, zl = ac_codes[0xF0]
                    wr.write(zc, zl)
                    # walk 16 zero-history positions, emitting
                    # corrections for old-nonzero positions crossed
                    skipped = 0
                    while skipped < 16:
                        if absv[k] == 0:
                            skipped += 1
                        else:  # old nonzero
                            wr.write(absv[k] & 1, 1)
                        k += 1
                    z -= 16
                    block_open = True
                flush_eob()
                cat = 1
                code, length = ac_codes[(z << 4) | cat]
                wr.write(code, length)
                wr.write(1 if vals[knew] > 0 else 0, 1)
                # corrections for old-nonzero positions crossed up to knew
                j = k
                while j < knew:
                    if absv[j] > 1:
                        wr.write(absv[j] & 1, 1)
                    j += 1
                k = knew + 1
                block_open = True
            # block tail: remaining positions fold into the EOB run;
            # their old-nonzero corrections buffer with it
            tail_bits = [absv[j] & 1 for j in range(k, n) if absv[j] > 1]
            if k < n or not block_open or tail_bits:
                eobrun += 1
                pending.extend(tail_bits)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    zz_q = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = [b"\xff\xd8"]
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + zz_q))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hh, vv = samp[ci]
        sof += bytes([ci + 1, (hh << 4) | vv, 0])
    out.append(seg(0xFFC2, sof))  # SOF2: progressive
    dht = bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS)
    dht += bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    out.append(seg(0xFFC4, dht))
    all_ids = [ci + 1 for ci in range(n_comp)]
    al0 = 1 if refine else 0
    out.append(sos(all_ids, 0, 0, 0, al0))
    out.append(dc_first_scan(al0))
    for ci in range(n_comp):
        for lo, hi in bands:
            out.append(sos([ci + 1], lo, hi, 0, al0))
            out.append(ac_first_scan(ci, lo, hi, al0))
    if refine:
        out.append(sos(all_ids, 0, 0, 1, 0))
        out.append(dc_refine_scan(0))
        for ci in range(n_comp):
            for lo, hi in bands:
                out.append(sos([ci + 1], lo, hi, 1, 0))
                out.append(ac_refine_scan(ci, lo, hi, 0))
    out.append(b"\xff\xd9")
    return b"".join(out)


def _decode_scan_progressive(
    data, pos, frame, scan_order, scan_tables, htables, prog_coef,
    ss, se, ah, al,
):
    """Decode ONE progressive scan into the zigzag coefficient state
    (T.81 G.2, libjpeg control flow). Four scan kinds:

      * DC first (Ss=Se=0, Ah=0): baseline DC diff coding of v >> Al
        (arithmetic shift), interleaved over the scan's components;
      * DC refine (Ss=Se=0, Ah>0): one raw bit per block, OR'd in at
        bit Al;
      * AC first (Ss>0, Ah=0): single-component band scan with EOBRUN
        end-of-band runs; values arrive as ±(|v| >> Al) and land
        shifted left by Al;
      * AC refine (Ss>0, Ah>0): ±1<<Al for newly nonzero positions,
        one correction bit per already-nonzero position, read WHILE
        walking runs — the mirror of encode_jpeg_progressive's walk.

    Returns the payload offset of the next marker."""
    h, w, comps = frame
    rd = _BitReader(data, pos)
    by_id = {c[0]: c for c in comps}
    for cid in scan_order:
        if cid not in by_id:
            raise ValueError("SOS lists a component absent from SOF")
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)

    def own_blocks(cid: int) -> list[int]:
        # non-interleaved walk: the component's OWN ceil-dims grid,
        # indexed into its padded coefficient array (T.81 A.2.2)
        _, _, hh, vv = by_id[cid]
        _, gw = _prog_grid(h, w, comps, hh, vv)
        cw, ch = -(-(w * hh) // hmax), -(-(h * vv) // vmax)
        ow, oh = -(-cw // 8), -(-ch // 8)
        return [by * gw + bx for by in range(oh) for bx in range(ow)]

    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        # DC coded order: interleaved MCU walk (each component's V×H
        # sub-grid, T.81 A.2.3) when the scan lists several
        # components; the component's own grid when it lists one
        if len(scan_order) > 1:
            mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            order = []
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for cid in scan_order:
                    _, _, hh, vv = by_id[cid]
                    gw = mcus_x * hh
                    for iv in range(vv):
                        for ih in range(hh):
                            order.append(
                                (cid, (my * vv + iv) * gw + mx * hh + ih)
                            )
        else:
            order = [(scan_order[0], b) for b in own_blocks(scan_order[0])]
        if ah == 0:
            preds = {cid: 0 for cid in scan_order}
            for cid, b in order:
                td, _ = scan_tables[cid]
                try:
                    dc_tab = htables[(0, td)]
                except KeyError:
                    raise ValueError("missing Huffman table") from None
                sym = _read_symbol(rd, dc_tab)
                preds[cid] += _extend(rd.receive(sym), sym)
                prog_coef[cid][b, 0] = preds[cid] << al
        else:
            p1 = 1 << al
            for cid, b in order:
                if rd.bit():
                    prog_coef[cid][b, 0] |= p1
    else:
        if len(scan_order) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral band")
        cid = scan_order[0]
        _, ta = scan_tables[cid]
        try:
            ac_tab = htables[(1, ta)]
        except KeyError:
            raise ValueError("missing Huffman table") from None
        coefs = prog_coef[cid]
        eobrun = 0
        blocks = own_blocks(cid)
        if ah == 0:  # AC first
            for b in blocks:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(rd, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.receive(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run overflows band")
                    coefs[b, k] = _extend(rd.receive(s), s) << al
                    k += 1
        else:  # AC refine
            p1, m1 = 1 << al, -1 << al

            def correct(b: int, k: int) -> None:
                c = int(coefs[b, k])
                if rd.bit() and (c & p1) == 0:
                    coefs[b, k] = c + (p1 if c >= 0 else m1)

            for b in blocks:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_symbol(rd, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += rd.receive(r)
                                break
                            # ZRL: walk 16 zero-history positions
                        elif s != 1:
                            raise ValueError(
                                "AC refinement symbol must have s in {0,1}"
                            )
                        else:
                            s = p1 if rd.bit() else m1
                        while k <= se:
                            if coefs[b, k] != 0:
                                correct(b, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and rs & 0x0F:
                            if k > se:
                                raise ValueError(
                                    "AC refinement places past the band"
                                )
                            coefs[b, k] = s
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if coefs[b, k] != 0:
                            correct(b, k)
                        k += 1
                    eobrun -= 1
    # skip padding bits to the next marker
    p = rd.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p
