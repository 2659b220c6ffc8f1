"""Generate the golden-table oracle fixtures for the six oracle-paired
multimodal queries (plans/media_queries.py) through an INDEPENDENT
pipeline, assert generation-time equality with the Spark queries, and
pin the independent result.

r15 pinned the implementation's own output (regression-pin semantics);
a bug present at golden-generation time would have been invisible to
the driver hash forever. Since r16 every golden row is computed here
WITHOUT calling the package's decode kernels, feature extractors or
query functions:

- PNG / GIF rows (media_id % 3 in {0, 1}): both codecs are lossless at
  fixture sizes, so the expected decoded pixels ARE the fixture
  definition itself — the md5-chain byte expansion of
  md5("media-<id>"), re-derived below from the documented fixture spec
  (synth_media_table docstring), never from the codec output. The
  generation-time equality assert therefore independently validates
  the entire PNG/GIF encode→decode round-trip.
- JPEG rows (media_id % 3 == 2) are lossy, so the expected pixels are
  an independent from-scratch baseline-JPEG decode of the actual
  fixture payload bytes: zigzag order derived algorithmically (the
  diagonal walk, not a copied table), Huffman decode through a
  bitstring-prefix dictionary, the literal O(N^4) double-sum IDCT from
  T.81 A.3.3 (the package decoder uses a separable matrix product),
  index-math chroma upsampling. Shared with the package are only the
  public T.81/JFIF constants (inverse-transform definition, YCbCr
  matrix) — as they must be.
- Feature formulas (channel mean/std, RMS/ZCR/peak, aHash bit packing,
  16-bit LSH banding, fold-left cosine) are restated here from their
  definitions; Spark's ROUND(double, 6) (BigDecimal HALF_UP over the
  shortest decimal representation) is replicated with
  decimal.Decimal(repr(x)).

The script then runs the six Spark query functions and asserts their
output equals the independent tables EXACTLY (same dtypes, same
values) before overwriting fixtures/*.parquet with the INDEPENDENT
frames. Any codec/feature bug on either side fails the assert instead
of being blessed into the pin.

Re-run (and commit the result) ONLY when the fixture or feature
definitions intentionally change:

    python scripts/make_multimodal_golden.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(
    REPO, "tb_scale_spatial_data_pipeline_spark", "fixtures"
)
GOLDEN_N = 120
PLANT_OFFSET = 1_000_000  # phash fixture plants duplicates at id + this


# ---------------------------------------------------------------------------
# Independent fixture synthesis (from the documented fixture definition)


def chain_bytes(seed: bytes, need: int) -> bytes:
    """md5-chain expansion: repeatedly hash, concatenating digests."""
    out = bytearray()
    cur = seed
    while len(out) < need:
        cur = hashlib.md5(cur).digest()
        out.extend(cur)
    return bytes(out[:need])


def media_meta(i: int) -> tuple[int, int, int, str]:
    """(width, height, n_frames, format) for fixed-fixture media id i."""
    fmt = ("png", "gif", "jpeg")[i % 3]
    return i % 8 + 4, i % 5 + 4, i % 4 + 1, fmt


def source_pixels(i: int) -> np.ndarray:
    """The fixture's pre-encode pixel block: md5-chain expansion of the
    md5 digest of 'media-<i>' to (h, w, 3) uint8."""
    w, h, _, _ = media_meta(i)
    seed = hashlib.md5(f"media-{i}".encode()).digest()
    return np.frombuffer(
        chain_bytes(seed, w * h * 3), dtype=np.uint8
    ).reshape(h, w, 3)


def audio_samples(i: int) -> np.ndarray:
    """Fixture audio: md5(text) ++ md5('a:'+text) digest bytes are not
    RIFF, so the decode seam expands them to n_samples little-endian
    int16 values via the same md5 chain."""
    n = i % 64 + 64
    text = f"media-{i}"
    payload = (
        hashlib.md5(text.encode()).digest()
        + hashlib.md5(f"a:{text}".encode()).digest()
    )
    return np.frombuffer(
        chain_bytes(payload, 2 * n), dtype="<i2"
    ).astype(np.float64)


def spark_round6(x: float) -> float:
    """Spark ROUND(double, 6): BigDecimal.valueOf(d) parses
    Double.toString's shortest decimal representation (== Python
    repr), then setScale(6, HALF_UP)."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


# ---------------------------------------------------------------------------
# Independent baseline-JPEG decoder (fresh implementation; see module
# docstring for what it deliberately does differently)


def _zigzag_natural() -> list[int]:
    """Natural-order index of the k-th zigzag coefficient, derived by
    walking the anti-diagonals: even-sum diagonals run bottom-left to
    top-right, odd-sum the reverse, starting at (0, 0)."""
    out = []
    for s in range(15):
        rows = (
            range(min(s, 7), max(0, s - 7) - 1, -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
        out.extend(r * 8 + (s - r) for r in rows)
    return out


_ZZ = _zigzag_natural()


def _huff_prefix_map(bits: list[int], vals: list[int]) -> dict[str, int]:
    """Canonical Huffman (T.81 Annex C) as a bitstring -> symbol map."""
    table: dict[str, int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[format(code, f"0{length}b")] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _Bits:
    """Bit cursor over the pre-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v

    def huff(self, table: dict[str, int]) -> int:
        code = ""
        while len(code) <= 16:
            code += str(int(self.bits[self.pos]))
            self.pos += 1
            if code in table:
                return table[code]
        raise ValueError("invalid Huffman code")


def _extend_signed(v: int, t: int) -> int:
    """T.81 F.2.2.1: a received t-bit magnitude whose top bit is 0
    encodes a negative value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_double_sum(B: np.ndarray) -> np.ndarray:
    """The literal T.81 A.3.3 inverse transform:
    f(x,y) = 1/4 sum_u sum_v C(u) C(v) F(u,v) cos((2x+1)u pi/16)
                                              cos((2y+1)v pi/16).
    B is natural order (row = vertical frequency v)."""
    out = np.zeros((8, 8))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = inv_sqrt2 if v == 0 else 1.0
                for u in range(8):
                    cu = inv_sqrt2 if u == 0 else 1.0
                    s += (
                        cu
                        * cv
                        / 4.0
                        * float(B[v, u])
                        * math.cos((2 * x + 1) * u * math.pi / 16.0)
                        * math.cos((2 * y + 1) * v * math.pi / 16.0)
                    )
            out[y, x] = s
    return out


def indep_decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF payload (as the fixture emits:
    no restarts, interleaved single scan) to HxWx3 RGB uint8."""
    assert payload[:2] == b"\xff\xd8", "not a JPEG"
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[str, int]] = {}
    ac_tabs: dict[int, dict[str, int]] = {}
    comps: list[dict] = []
    width = height = 0
    scan_sel: dict[int, tuple[int, int]] = {}
    data_start = -1
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                assert seg[i] >> 4 == 0, "8-bit tables only"
                tbl = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tbl[_ZZ[k]] = seg[i + 1 + k]
                qt[seg[i] & 0x0F] = tbl
                i += 65
        elif marker == 0xC0:
            assert seg[0] == 8
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_prefix_map(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:
            assert int.from_bytes(seg[0:2], "big") == 0, (
                "fixture emits no restart markers"
            )
        elif marker == 0xDA:
            for c in range(seg[0]):
                scan_sel[seg[1 + 2 * c]] = (
                    seg[2 + 2 * c] >> 4,
                    seg[2 + 2 * c] & 0x0F,
                )
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    assert data_start > 0 and comps and width and height

    # unstuff the entropy segment (FF 00 -> FF; any other FF xx ends it)
    ent = bytearray()
    p = data_start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else None
            if nxt == 0x00:
                ent.append(0xFF)
                p += 2
                continue
            assert nxt is not None and not (0xD0 <= nxt <= 0xD7), (
                "fixture emits no restart markers"
            )
            break
        ent.append(b)
        p += 1

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    bits = _Bits(bytes(ent))
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = bits.huff(dc_tabs[td])
                        pred[ci] += _extend_signed(bits.take(t), t) if t else 0
                        coeffs[_ZZ[0]] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = bits.huff(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            coeffs[_ZZ[k]] = _extend_signed(bits.take(s), s)
                            k += 1
                        block = (coeffs * q).astype(np.float64).reshape(8, 8)
                        px = _idct_double_sum(block) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px

    # upsample to full resolution by index math, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        ry, rx = vmax // c["v"], hmax // c["h"]
        ys = np.arange(height) // ry
        xs = np.arange(width) // rx
        full.append(planes[ci][np.ix_(ys, xs)])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# Independent golden tables


def decoded_pixels(payloads: dict[int, bytes]) -> dict[int, np.ndarray]:
    """Expected decoded pixels per media id: the fixture definition for
    the lossless formats, an independent decode for JPEG."""
    out = {}
    for i in range(GOLDEN_N):
        _, _, _, fmt = media_meta(i)
        if fmt == "jpeg":
            arr = indep_decode_jpeg(payloads[i])
            w, h, _, _ = media_meta(i)
            assert arr.shape == (h, w, 3)
            out[i] = arr
        else:
            out[i] = source_pixels(i)
    return out


def channel_stats(arr: np.ndarray) -> list[float]:
    a = arr.astype(np.float64)
    return [float(a[:, :, c].mean()) for c in range(3)] + [
        float(a[:, :, c].std()) for c in range(3)
    ]


def golden_features(px: dict[int, np.ndarray]) -> pd.DataFrame:
    rows = [
        (i, *[spark_round6(v) for v in channel_stats(px[i])])
        for i in range(GOLDEN_N)
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "media_id", "mean_c0", "mean_c1", "mean_c2",
            "std_c0", "std_c1", "std_c2",
        ],
    )


def golden_resize(px: dict[int, np.ndarray]) -> pd.DataFrame:
    rows = []
    for i in range(GOLDEN_N):
        c = px[i].shape[2]
        rows.append((i, 4, 4, c, 4 * 4 * c))
    return pd.DataFrame(
        rows, columns=["media_id", "width", "height", "channels", "n_bytes"]
    )


def golden_frames(px: dict[int, np.ndarray]) -> pd.DataFrame:
    """sample_frames(every_k=2): frame indices 0..n_frames-1 with
    idx % 2 == 0; a parseable still decodes to the same pixels for
    every frame (the single appended frame-index byte is trailing
    garbage past IEND / the GIF trailer / EOI), so frame_mean is the
    full-image mean."""
    rows = []
    for i in range(GOLDEN_N):
        _, _, n_frames, _ = media_meta(i)
        fm = spark_round6(float(px[i].mean()))
        rows.extend(
            (i, k, fm) for k in range(0, n_frames, 2)
        )
    return pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])


def golden_neardup(px: dict[int, np.ndarray]) -> pd.DataFrame:
    """Adjacent-id cosine over the UNROUNDED 6-dim feature vectors,
    fold-left like Spark's F.aggregate: dot and both squared norms are
    sequential left-to-right sums, denominator gets the +1e-12 guard."""
    feats = {i: channel_stats(px[i]) for i in range(GOLDEN_N)}
    rows = []
    for i in range(GOLDEN_N - 1):
        fa, fb = feats[i], feats[i + 1]
        dot = 0.0
        for a, b in zip(fa, fb):
            dot += a * b
        na = 0.0
        for a in fa:
            na += a * a
        nb = 0.0
        for b in fb:
            nb += b * b
        cos = dot / (math.sqrt(na) * math.sqrt(nb) + 1e-12)
        rows.append((i, i + 1, spark_round6(cos)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "feature_cos"])


def golden_audio() -> pd.DataFrame:
    rows = []
    for i in range(GOLDEN_N):
        w = audio_samples(i)
        n = len(w)
        rms = float(np.sqrt((w**2).mean()))
        neg = w < 0  # np.signbit equivalent for finite int-valued floats
        zcr = float((neg[1:] != neg[:-1]).mean()) if n > 1 else 0.0
        peak = float(np.abs(w).max())
        rows.append(
            (i, n, spark_round6(rms), spark_round6(zcr), spark_round6(peak))
        )
    return pd.DataFrame(
        rows, columns=["media_id", "n_samples", "rms", "zcr", "peak"]
    )


def ahash64(arr: np.ndarray) -> int:
    """aHash: grayscale mean -> 8x8 nearest thumbnail -> 64 bits of
    (pixel > mean), packed MSB-first, wrapped to signed 64-bit."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.arange(8) * h // 8
    xi = np.arange(8) * w // 8
    thumb = gray[np.ix_(yi, xi)]
    val = 0
    for b in (thumb > thumb.mean()).ravel():
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= 1 << 63 else val


def golden_phash(px: dict[int, np.ndarray]) -> pd.DataFrame:
    """Banded-LSH candidate pairs at Hamming <= 6 over originals plus
    planted exact duplicates (same payloads, id + PLANT_OFFSET): a pair
    is a candidate iff SOME 16-bit band of the 64-bit hash matches
    exactly (the query's shuffle key), then the exact Hamming filter
    applies. Brute force here — 240 ids."""
    hashes = {i: ahash64(px[i]) for i in range(GOLDEN_N)}
    ids = sorted(hashes) + [i + PLANT_OFFSET for i in sorted(hashes)]
    uhash = {j: hashes[j % PLANT_OFFSET] & ((1 << 64) - 1) for j in ids}
    rows = []
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if a > b:
                a, b = b, a
            ua, ub = uhash[a], uhash[b]
            if not any(
                (ua >> (16 * k)) & 0xFFFF == (ub >> (16 * k)) & 0xFFFF
                for k in range(4)
            ):
                continue
            ham = bin(ua ^ ub).count("1")
            if ham <= 6:
                rows.append((a, b, ham))
    rows.sort()
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


# ---------------------------------------------------------------------------


def main() -> None:
    from tb_scale_spatial_data_pipeline_spark.plans.media_queries import (
        q_audio_features,
        q_frame_sample,
        q_image_features,
        q_multimodal_neardup,
        q_multimodal_phash_neardup,
        q_resize,
    )
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        synth_media_table,
    )
    from tb_scale_spatial_data_pipeline_spark.session import get_spark

    os.makedirs(FIXTURES, exist_ok=True)
    spark = get_spark("golden")

    # actual fixture payload bytes (needed only for the lossy JPEG rows)
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in synth_media_table(spark, "", fixed_n=GOLDEN_N).collect()
    }
    px = decoded_pixels(payloads)

    independents = {
        "multimodal_golden_features": golden_features(px),
        "multimodal_golden_phash": golden_phash(px),
        "multimodal_golden_resize": golden_resize(px),
        "multimodal_golden_frames": golden_frames(px),
        "multimodal_golden_neardup": golden_neardup(px),
        "multimodal_golden_audio": golden_audio(),
    }
    spark_fns = {
        "multimodal_golden_features": q_image_features,
        "multimodal_golden_phash": q_multimodal_phash_neardup,
        "multimodal_golden_resize": q_resize,
        "multimodal_golden_frames": q_frame_sample,
        "multimodal_golden_neardup": q_multimodal_neardup,
        "multimodal_golden_audio": q_audio_features,
    }

    for name, indep in independents.items():
        live = spark_fns[name](spark, "").toPandas()
        indep = indep.astype(live.dtypes.to_dict()).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            indep, live.reset_index(drop=True), check_exact=True
        )
        out = os.path.join(FIXTURES, f"{name}.parquet")
        prior = None
        if os.path.exists(out):
            old = pd.read_parquet(out)
            prior = "unchanged" if old.equals(indep) else "CHANGED"
        indep.to_parquet(out, index=False)
        print(
            f"{name}: independent == spark ({len(indep)} rows); "
            f"pin {prior or 'new'}"
        )


if __name__ == "__main__":
    main()
