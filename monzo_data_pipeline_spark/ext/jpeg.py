"""Baseline-sequential JPEG (JFIF) codec — numpy + stdlib only.

Closes the one remaining `NotImplementedError` in the media family
(SURVEY.md §2.C5): entropy-coded JPEG. Scope is ITU-T T.81 baseline
sequential DCT, 8-bit, Huffman coding, 1-component grayscale or
3-component YCbCr without chroma subsampling (4:4:4); restart
intervals (DRI/RSTn), 0xFF fill bytes, and baseline multi-scan
layouts (one non-interleaved SOS per component) are honored. Progressive (SOF2), arithmetic
coding, 12-bit precision, and subsampled chroma raise ValueError so
callers quarantine rather than mis-decode.

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


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
    multi_scan: bool = False,
) -> bytes:
    """Encode (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 as
    baseline-sequential JFIF. `quant` is an 8×8 quantization table in
    natural order (default all ones — near-lossless, and EXACTLY
    lossless on constant 8×8 blocks). `restart_interval` > 0 emits a
    DRI segment and RSTn markers every that many MCUs — the stream
    shape long scans use for error resilience. `multi_scan` emits one
    non-interleaved SOS per component (the other legal baseline
    layout) instead of a single interleaved scan."""
    if multi_scan and restart_interval:
        raise ValueError("multi_scan with restart intervals not supported")
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

    dc_codes = _canonical_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _canonical_codes(_STD_AC_BITS, _STD_AC_VALS)
    wr = _BitWriter()
    scan_parts: list[bytes] = []
    preds = [0] * len(planes)
    n_comp = len(planes)
    # all components share quant table 0 and huffman table 0 (legal,
    # keeps the stream minimal); 4:4:4 → MCU = one block per component
    coeff = []
    for plane in planes:
        f = _blocks(plane) - 128.0
        d = np.einsum("ux,bxy,vy->buv", _DCT_M, f, _DCT_M)
        coeff.append(np.rint(d / q).astype(np.int64))
    n_blocks = coeff[0].shape[0]

    def encode_block(ci: int, b: int, wr: _BitWriter, preds: list[int]) -> None:
        zz = coeff[ci][b].reshape(64)[ZIGZAG]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        cat = _category(diff)
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
        for b in range(n_blocks):
            if restart_interval and b and b % restart_interval == 0:
                scan_parts.append(wr.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + ((b // restart_interval - 1) & 7)])
                )
                wr = _BitWriter()
                preds = [0] * n_comp
            for ci in range(n_comp):
                encode_block(ci, b, wr, preds)
        scan_parts.append(wr.flush())
        scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + zz_q))  # DQT: Pq=0, Tq=0
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, quant 0
    out.append(seg(0xFFC0, sof))
    dht = bytes([0x00]) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS)
    dht += bytes([0x10]) + bytes(_STD_AC_BITS) + bytes(_STD_AC_VALS)
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
    """Decode baseline-sequential JPEG to (h, w, 1) grayscale or
    (h, w, 3) RGB uint8. Raises ValueError on progressive/arithmetic/
    12-bit/subsampled streams and on malformed or truncated data —
    callers quarantine, not crash."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, tq)])
    restart_interval = 0
    decoded: dict[int, np.ndarray] = {}  # cid → padded plane
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / extended seq.
            if len(body) < 6:
                raise ValueError("short SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("short SOF segment")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("subsampled chroma unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline-sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — one of possibly several scans
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("short SOS segment")
            ns = body[0]
            scan_tables = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            pos = _decode_scan(
                payload,
                pos + 2 + ln,
                frame,
                scan_tables,
                qtables,
                htables,
                restart_interval,
                decoded,
            )
            continue
        # APPn / COM / anything else with a length: skip
        pos = pos + 2 + ln

    if frame is None or not decoded:
        raise ValueError("JPEG with no scan data")
    h, w, comps = frame
    missing = [cid for cid, _ in comps if cid not in decoded]
    if missing:
        raise ValueError(f"JPEG missing scans for components {missing}")
    planes = [np.clip(np.round(decoded[cid][:h, :w]), 0, 255) for cid, _ in comps]
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    if len(planes) == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported component count {len(planes)}")


def _decode_scan(data, pos, frame, scan_tables, qtables, htables, ri, decoded):
    """Decode ONE scan's entropy data: all frame components listed in
    the scan, interleaved (ns > 1) or non-interleaved (ns = 1 — the
    legal baseline multi-scan layout, one SOS per component). With
    4:4:4 sampling every component shares the full block grid, so an
    MCU is one block per scan component either way. Planes land in
    `decoded`; returns the payload offset of the next marker."""
    h, w, comps = frame
    bh, bw = -(-h // 8), -(-w // 8)
    n_mcu = bh * bw
    rd = _BitReader(data, pos)
    scan_comps = [(cid, tq) for cid, tq in comps if cid in scan_tables]
    if len(scan_comps) != len(scan_tables):
        raise ValueError("SOS lists a component absent from SOF")
    planes = {cid: np.zeros((bh * 8, bw * 8)) for cid, _ in scan_comps}
    preds = {cid: 0 for cid, _ in scan_comps}
    mt = _DCT_M.T
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            rd.align_to_restart((m // ri - 1) & 7)
            preds = {cid: 0 for cid, _ in scan_comps}
        by, bx = divmod(m, bw)
        for cid, tq in scan_comps:
            if tq not in qtables:
                raise ValueError("missing quantization table")
            td, ta = scan_tables[cid]
            try:
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
            except KeyError:
                raise ValueError("missing Huffman table") from None
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
            pix = mt @ block.astype(np.float64) @ _DCT_M + 128.0
            planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
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


def documents_as_jpegs(docs):
    """(doc_id, text) → (media_id, payload): a 16×16 grayscale
    baseline JPEG whose four 8×8 blocks are constants taken from the
    doc's first four printable-ASCII codes (cycled; space if none) —
    the same cleaning rule as `images.documents_as_images`. Arrow-
    batched mapInPandas; encode is pure numpy."""
    import re

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
        from monzo_data_pipeline_spark.ext.jpeg import encode_jpeg

        def synth(text):
            clean = re.sub(r"[^\x20-\x7e]", "", text or "") or " "
            arr = np.zeros((16, 16), dtype=np.uint8)
            for k in range(4):
                v = ord(clean[k % len(clean)])
                arr[(k // 2) * 8 : (k // 2) * 8 + 8, (k % 2) * 8 : (k % 2) * 8 + 8] = v
            return encode_jpeg(arr)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": pdf["text"].map(synth),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(batches, schema=schema)
