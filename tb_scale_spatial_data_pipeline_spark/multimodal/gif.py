"""GIF87a codec — pure stdlib + NumPy, no imaging library.

Decoder: GIF87a/89a single-image parse — header, logical screen
descriptor, global color table, 0x21 extension blocks skipped by
sub-block walking, image descriptor (non-interlaced; a local color
table overrides the global one), and the variable-code-width LZW
decompressor (CompuServe GIF LZW: initial code size from the stream,
CLEAR resets the table, EOI terminates, code width grows after the
table reaches 2^width up to the 12-bit cap, little-endian bit
packing across 255-byte sub-blocks). Output is HxWx3 RGB uint8 via
the palette; interlaced images return None (out of scope), and for
animated GIF89a streams only the FIRST frame is decoded — extension
blocks (including Graphic Control) are skipped and parsing stops at
the first image descriptor, so later frames are never read.

Encoder: the exact forward twin for fixture payloads — builds an
exact palette from the image's unique colors (the fixture images are
<= 96 pixels, so <= 96 colors always fit GIF's 256-entry table;
encoding is LOSSLESS here, unlike the JPEG tier), emits the global
color table padded to a power of two, and compresses indices with
the same variable-width LZW (fresh table per CLEAR, codes emitted
before width bumps exactly as readers expect).

Like the PNG/JPEG seams (`media._encode_png_rgb8`,
`multimodal/jpeg.py`), the encoder's only job is REAL compressed
payloads so the decode tier runs actual LZW table-building work with
zero new dependencies. Exactness contract (tests/test_gif_codec.py):
encode -> decode round-trips BIT-EXACTLY for any RGB image with
<= 256 distinct colors; the LZW bit stream is additionally
cross-checked against an independent per-bit reference decoder.

Reference parity anchor: the reference reads imagery through GDAL
(`0_preprocessing/feature_stacking.py`); this engine's multimodal
seam treats compressed images as opaque binary columns decoded
executor-side (`multimodal/media.py`), GIF now included.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF LZW: emit CLEAR, then greedy longest-prefix codes, growing
    the code width when the next table entry would need it; finish
    with EOI. Single table build (images here are tiny; a full table
    would trigger CLEAR re-emission, handled for completeness)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1

    def fresh_table() -> dict[tuple[int, ...], int]:
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    out_bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        # width grows when next_code EXCEEDS the current range
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code > (1 << _MAX_CODE_WIDTH):
            out_bits.append((clear, width))
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((eoi, width))

    # little-endian bit packing
    acc = 0
    nbits = 0
    raw = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        raw.append(acc & 0xFF)
    return bytes(raw)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int] | None:
    """Inverse of _lzw_encode; returns palette indices or None on a
    malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    prev: tuple[int, ...] | None = None

    def reset() -> None:
        nonlocal table, prev, width
        table = [(i,) for i in range(clear)] + [(), ()]
        prev = None
        width = min_code_size + 1

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # tolerated: stream ended without EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            return None
        out.extend(entry)
        prev = entry
        # decoder grows width one table entry EARLIER than the encoder
        # emits it (the classic off-by-one both sides must share)
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1


# ---------------------------------------------------------------------------
# Container


def encode_gif_rgb8(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> GIF87a bytes. Requires <= 256 distinct colors
    (exact palette; lossless)."""
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError("GIF palette overflow: >256 distinct colors")
    # palette size = power of two >= max(n, 2); gct field = log2 - 1
    bits = 1
    while (1 << bits) < max(n, 2):
        bits += 1
    psize = 1 << bits
    min_code_size = max(bits, 2)
    out = bytearray()
    out += b"GIF87a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) & 0x07))  # GCT present, 2^bits entries
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    pal = np.zeros((psize, 3), dtype=np.uint8)
    pal[:n] = colors
    out += pal.tobytes()
    # image descriptor
    out += b"\x2c" + (0).to_bytes(2, "little") * 2
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)  # no local table, not interlaced
    out.append(min_code_size)
    raw = _lzw_encode([int(i) for i in inv], min_code_size)
    for i in range(0, len(raw), 255):
        block = raw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray | None:
    """GIF bytes -> HxWx3 RGB uint8, or None if not a decodable
    non-interlaced single-image GIF."""
    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw = int.from_bytes(payload[6:8], "little")
        sh = int.from_bytes(payload[8:10], "little")
        flags = payload[10]
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            gct = gct.reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if block == 0x3B:  # trailer before any image
                return None
            if block != 0x2C:
                return None
            # image descriptor
            ix = int.from_bytes(payload[pos : pos + 2], "little")
            iy = int.from_bytes(payload[pos + 2 : pos + 4], "little")
            iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
            ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
            iflags = payload[pos + 8]
            pos += 9
            if iflags & 0x40:  # interlaced: out of scope
                return None
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                return None
            min_code_size = payload[pos]
            pos += 1
            raw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                raw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(raw), min_code_size)
            if idx is None or len(idx) < iw * ih:
                return None
            img = pal[np.asarray(idx[: iw * ih], dtype=np.int64)].reshape(
                ih, iw, 3
            )
            # composite onto the logical screen only when sizes differ
            if (iw, ih) == (sw, sh) and (ix, iy) == (0, 0):
                return img
            screen = np.zeros((sh, sw, 3), dtype=np.uint8)
            screen[iy : iy + ih, ix : ix + iw] = img
            return screen
        return None
    except (IndexError, ValueError):
        return None
