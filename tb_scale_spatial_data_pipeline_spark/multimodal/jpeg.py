"""Baseline JPEG codec — pure stdlib + NumPy, no imaging library.

Decoder: ITU-T T.81 baseline sequential DCT, Huffman entropy coding —
marker parse (APPn/COM skipped), DQT, SOF0, DHT (canonical code
reconstruction from BITS/HUFFVAL), DRI/RSTn restart handling, SOS MCU
entropy decode with 0xFF00 unstuffing, coefficient EXTEND, dequant,
inverse zigzag, separable float IDCT, component upsampling for
sampling factors in {1,2} (box replication), YCbCr->RGB (JFIF
constants), clamp. Grayscale (1 component) and YCbCr (3 components,
4:4:4 / 4:2:2 / 4:2:0) are supported; progressive (SOF2) and
arithmetic coding are out of scope and return None.

Encoder: the exact forward twin (RGB->YCbCr, box-average subsampling,
level shift, forward DCT, quantization with the Annex K example
tables scaled by libjpeg's public quality formula, zigzag, DC
differential, Annex K example Huffman tables, byte stuffing). Like
the PNG seam (`media._encode_png_rgb8`), its only job is to produce
REAL compressed payloads for the fixture so the decode tier runs
actual entropy-decode + IDCT work with zero new dependencies.

Exactness contract (tested in tests/test_jpeg_codec.py): images that
are CONSTANT per MCU quantize to a lone DC coefficient that the
8-divisible DC quant step preserves, so encode->decode round-trips
those BIT-EXACTLY; general images round-trip within the quantization
error bound. The IDCT is cross-checked against a literal O(N^4)
DCT-III double loop (a different implementation).

Reference parity anchor: the reference reads imagery through GDAL
(`0_preprocessing/feature_stacking.py` raster I/O); this engine's
multimodal seam treats compressed images as opaque binary columns and
decodes them executor-side (`multimodal/media.py`), JPEG now included.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Public constants from ITU-T T.81 (Annex K examples) — the spec's own
# example tables, used by virtually every encoder as defaults.

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
QTABLE_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTABLE_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# separable DCT basis: A[x, u] = C(u)/2 * cos((2x+1) u pi / 16);
# IDCT2(B) = A @ B @ A.T, FDCT2(b) = A.T @ b @ A
_A = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _A[_x, _u] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def quality_scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's public quality->scale mapping (ijg jcparam.c formula):
    scale = 5000/q for q<50 else 200-2q; entries clamp to [1, 255].
    The DC steps are then snapped DOWN to a divisor of 8 (1,2,4,8) so
    block-constant inputs round-trip bit-exactly (DC of a constant
    block is 8*(v-128), preserved whenever the DC step divides it)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QTABLE_LUMA, QTABLE_CHROMA):
        tbl = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
        dc = int(tbl[0])
        tbl[0] = max(d for d in (1, 2, 4, 8) if d <= max(1, min(8, dc)))
        out.append(tbl)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman code machinery (T.81 Annex C canonical construction)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RSTn markers
    are surfaced via ``at_marker`` so the caller can reset DC state."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed literal FF
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_and_skip_rst(self) -> bool:
        """Discard pad bits and consume an RSTn marker at a restart
        boundary. The marker may already be latched (a read ran into
        it) or still sit unread at ``pos`` — handle both."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None:
            if 0xD0 <= self.marker <= 0xD7:
                self.pos += 2
                self.marker = None
                return True
            return False
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = reader.read_bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg_baseline(payload: bytes) -> np.ndarray | None:
    """Decode a baseline-sequential Huffman JPEG to HxWx3 RGB uint8
    (grayscale broadcast). Returns None for anything that isn't one
    (progressive, arithmetic, 12-bit, >2 sampling factors, truncated)."""
    try:
        return _decode_inner(payload)
    except Exception:
        return None


def _decode_inner(payload: bytes) -> np.ndarray | None:
    if len(payload) < 4 or payload[0:2] != b"\xFF\xD8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    return None  # 8-bit tables only
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[tid] = tbl
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                return None
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                return None
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    return None
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            return None  # extended/progressive/arithmetic: out of scope
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                table = _build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cs] = (tables >> 4, tables & 0x0F)
            data_pos = pos + 2 + ln
            return _decode_scan(
                payload,
                data_pos,
                width,
                height,
                comps,
                scan_sel,
                qtables,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        pos += 2 + ln
    return None


def _decode_scan(
    payload: bytes,
    data_pos: int,
    width: int,
    height: int,
    comps: list[dict],
    scan_sel: dict,
    qtables: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray | None:
    if not comps or width <= 0 or height <= 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(payload, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not reader.align_and_skip_rst():
                    return None
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, huff_dc[td])
                        if t is None or t > 11:
                            return None
                        diff = 0
                        if t:
                            bitsv = reader.receive(t)
                            if bitsv is None:
                                return None
                            diff = _extend(bitsv, t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ta])
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            bitsv = reader.receive(s)
                            if bitsv is None:
                                return None
                            coeffs[k] = _extend(bitsv, s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        # coeffs is zigzag-ordered, q natural-ordered:
                        # the step for zigzag position k is q[ZIGZAG[k]]
                        block[ZIGZAG] = (coeffs * q[ZIGZAG]).astype(np.float64)
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample every component to full resolution (box replication)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (the fixture's write side)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """FDCT + quantize + zigzag + Huffman-encode one 8x8 block;
    returns the new DC predictor."""
    coeffs = _fdct2(block.astype(np.float64) - 128.0)
    zz = coeffs.reshape(64)[ZIGZAG]
    quant = np.rint(zz / q[ZIGZAG].astype(np.float64)).astype(np.int64)
    dc = int(quant[0])
    diff = dc - pred

    def magnitude(v: int) -> tuple[int, int]:
        t = 0
        a = abs(v)
        while a:
            t += 1
            a >>= 1
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    t, bits = magnitude(diff)
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(quant[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        t, bits = magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        writer.write(code, ln)
        writer.write(bits, t)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _pad_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad a plane up to (h, w)."""
    ph, pw = arr.shape
    if ph == h and pw == w:
        return arr
    return np.pad(arr, ((0, h - ph), (0, w - pw)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg_baseline(
    arr: np.ndarray,
    quality: int = 90,
    subsample: "bool | str" = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 RGB (or HxW grayscale) uint8 to baseline JFIF.
    ``subsample``: True/"420" for 4:2:0 (box-average chroma), "422"
    for horizontal-only subsampling, False/"444" for none; grayscale
    input emits a single-component scan. ``restart_interval`` > 0
    emits a DRI segment and an RSTn marker every N MCUs (DC predictors
    reset) — exercises the decoder's restart path."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql, qc = quality_scaled_tables(quality)
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        y, cb, cr = (np.clip(np.rint(p), 0, 255) for p in (y, cb, cr))
        mode = (
            "420"
            if subsample is True
            else ("444" if subsample is False else str(subsample))
        )
        if mode == "420":
            ch = -(-h // 2) * 2
            cw = -(-w // 2) * 2
            cbp = _pad_to(cb, ch, cw).reshape(ch // 2, 2, cw // 2, 2)
            crp = _pad_to(cr, ch, cw).reshape(ch // 2, 2, cw // 2, 2)
            cb = np.rint(cbp.mean(axis=(1, 3)))
            cr = np.rint(crp.mean(axis=(1, 3)))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":  # horizontal-only chroma subsampling
            cw = -(-w // 2) * 2
            cbp = _pad_to(cb, h, cw).reshape(h, cw // 2, 2)
            crp = _pad_to(cr, h, cw).reshape(h, cw // 2, 2)
            cb = np.rint(cbp.mean(axis=2))
            cr = np.rint(crp.mean(axis=2))
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), p in zip(samp, planes):
        padded.append(_pad_to(p, mcus_y * sv * 8, mcus_x * sh * 8))

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_codes.append(_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))
    tsel = [0] + ([1, 1] if not gray else [])
    qarr = [ql, qc]

    writer = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # pad to a byte boundary, emit RSTn, reset DC preds
                if writer.nbits:
                    pad = 8 - writer.nbits
                    writer.write((1 << pad) - 1, pad)
                writer.out.append(0xFF)
                writer.out.append(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                q = qarr[qsel[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            writer,
                            block,
                            q,
                            pred[ci],
                            dc_codes[tsel[ci]],
                            ac_codes[tsel[ci]],
                        )
    scan = writer.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    dqt = bytes([0x00]) + bytes(int(ql[z]) for z in ZIGZAG)
    if not gray:
        dqt += bytes([0x01]) + bytes(int(qc[z]) for z in ZIGZAG)
    out += _seg(0xDB, dqt)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _seg(0xC0, sof)
    dht = (
        bytes([0x00])
        + bytes(DC_LUMA_BITS)
        + bytes(DC_LUMA_VALS)
        + bytes([0x10])
        + bytes(AC_LUMA_BITS)
        + bytes(AC_LUMA_VALS)
    )
    if not gray:
        dht += (
            bytes([0x01])
            + bytes(DC_CHROMA_BITS)
            + bytes(DC_CHROMA_VALS)
            + bytes([0x11])
            + bytes(AC_CHROMA_BITS)
            + bytes(AC_CHROMA_VALS)
        )
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
