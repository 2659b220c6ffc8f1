"""Baseline-JPEG codec tests (multimodal/jpeg.py): bit-exact
round-trip on block-constant images, bounded quantization error on
smooth/general images, IDCT cross-checked against a literal O(N^4)
DCT-III double loop (an independent implementation), Huffman canonical
code construction identities, and the fixture/driver integration."""

from __future__ import annotations

import numpy as np
import pytest

from tb_scale_spatial_data_pipeline_spark.multimodal.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    ZIGZAG,
    _build_codes,
    _build_decode_map,
    _fdct2,
    _idct2,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    quality_scaled_tables,
)


def test_idct_matches_naive_o_n4():
    """Separable matrix IDCT == the spec's double-sum DCT-III, written
    as an independent four-deep loop."""
    rng = np.random.default_rng(0)
    B = rng.normal(0, 100, (8, 8))
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * B[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[x, y] = s
    assert np.abs(_idct2(B) - naive).max() < 1e-10


def test_fdct_idct_inverse_pair():
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.abs(_idct2(_fdct2(b)) - b).max() < 1e-10


def test_huffman_canonical_codes_prefix_free():
    """Annex K AC-luma table: canonical construction yields one code
    per symbol, no code is a prefix of another, lengths follow BITS."""
    codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(codes) == sum(AC_LUMA_BITS)
    as_strings = {format(c, f"0{ln}b") for c, ln in codes.values()}
    assert len(as_strings) == len(codes)
    lst = sorted(as_strings)
    for a, b in zip(lst, lst[1:]):
        assert not b.startswith(a)
    # decode map is the exact inverse
    dm = _build_decode_map(AC_LUMA_BITS, AC_LUMA_VALS)
    for sym, (code, ln) in codes.items():
        assert dm[(ln, code)] == sym


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_grayscale_block_constant_roundtrip_bit_exact():
    """Images constant per 8x8 block quantize to a lone DC coefficient
    that the 8-divisible DC step preserves -> decode is BIT-EXACT."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        blocks = rng.integers(0, 256, (3, 4), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
        assert dec is not None
        assert (dec == np.repeat(img[:, :, None], 3, axis=2)).all()


def test_rgb_mcu_constant_roundtrip_within_one():
    """RGB constant per 16x16 MCU: the only loss is the +-1 YCbCr
    transform rounding (DCT/quant/subsample are exact on constants)."""
    rng = np.random.default_rng(4)
    mcus = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(mcus, 16, axis=0), 16, axis=1)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    assert dec is not None
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_gray_gradient_error_bounded_by_quality():
    x = np.linspace(0, 255, 48)
    y = np.linspace(0, 255, 40)
    img = np.add.outer(y * 0.5, x * 0.5).astype(np.uint8)
    prev_mean = np.inf
    for q in (75, 90, 95):
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q))
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 8
        mean = err.mean()
        assert mean <= prev_mean + 1e-9  # error shrinks as quality rises
        prev_mean = mean
    # grayscale payload decodes with all three channels equal
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert (dec[:, :, 0] == dec[:, :, 2]).all()


def test_dense_spectrum_roundtrip_444_tight_bound():
    """Dense-spectrum (noisy) images are where a dequantization-order
    mistake shows up: every AC frequency carries energy, so mismatched
    quant steps inflate the round-trip error ~5x (caught live in r16:
    the decoder multiplied zigzag-ordered coefficients by the
    natural-ordered table, mean|err| ~31 on this image vs ~6 correct).
    Smooth gradients can't see it — their AC energy sits in the first
    few zigzag positions where both orderings nearly agree."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    sm = img.astype(np.float64)
    for _ in range(2):
        sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1)) / 3.0
    img = np.clip(sm, 0, 255).astype(np.uint8)
    dec = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=90, subsample="444")
    )
    assert dec is not None
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 10.0


def test_odd_dimensions_and_444_both_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    for subsample in (True, False):
        enc = encode_jpeg_baseline(img, quality=95, subsample=subsample)
        dec = decode_jpeg_baseline(enc)
        assert dec is not None and dec.shape == (11, 7, 3)


def test_decoder_rejects_non_baseline_and_garbage():
    assert decode_jpeg_baseline(b"") is None
    assert decode_jpeg_baseline(b"not a jpeg") is None
    assert decode_jpeg_baseline(b"\xff\xd8truncated") is None
    # flip SOF0 to SOF2 (progressive) — must refuse, not misparse
    enc = bytearray(
        encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8), quality=90)
    )
    idx = bytes(enc).find(b"\xff\xc0")
    assert idx > 0
    enc[idx + 1] = 0xC2
    assert decode_jpeg_baseline(bytes(enc)) is None


def test_dc_quant_step_divides_eight():
    for q in (10, 50, 75, 90, 95, 100):
        ql, qc = quality_scaled_tables(q)
        assert 8 % int(ql[0]) == 0
        assert 8 % int(qc[0]) == 0
        assert (ql >= 1).all() and (qc <= 255).all()


def test_decode_payload_prefers_native_jpeg(spark):
    """The fixture's 'jpeg' rows now carry real baseline payloads and
    the decode seam reads them with the native codec (no PIL, no
    fake): re-encoding the decoded pixels round-trips stably."""
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
        synth_media_table,
    )
    from conftest import SF_SMOKE

    rows = (
        synth_media_table(spark, SF_SMOKE)
        .where("meta.format = 'jpeg'")
        .limit(4)
        .collect()
    )
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        m = r["meta"]
        native = decode_jpeg_baseline(payload)
        assert native is not None
        assert native.shape == (m["height"], m["width"], 3)
        via_seam = _decode_payload(
            payload, m["width"], m["height"], m["channels"]
        )
        assert (via_seam == native[:, :, : m["channels"]]).all()
        # re-encoding decoded pixels stays decodable at the same shape
        # (the fixture pixels are md5 noise — saturated and maximally
        # quantization-hostile, so no tight error bound applies here;
        # exactness is asserted on the block-constant tests above)
        second = decode_jpeg_baseline(
            encode_jpeg_baseline(native, quality=90)
        )
        assert second is not None and second.shape == native.shape


def test_fake_tier_still_reachable():
    """Unparseable bytes still hit the deterministic fake (the decode
    seam's contract for genuinely opaque blobs)."""
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
        _fake_decode,
    )

    blob = b"\x00\x01\x02 opaque"
    out = _decode_payload(blob, 4, 4, 3, pil=None)
    want = np.frombuffer(_fake_decode(blob, 48), dtype=np.uint8).reshape(
        4, 4, 3
    )
    assert (out == want).all()


@pytest.mark.skipif(
    pytest.importorskip("importlib").util.find_spec("PIL") is None,
    reason="PIL absent (expected in this container)",
)
def test_pil_agrees_on_marker_structure():  # pragma: no cover
    from PIL import Image
    import io

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    enc = encode_jpeg_baseline(img, quality=90)
    pil_img = Image.open(io.BytesIO(enc))
    assert pil_img.size == (16, 16)


def test_restart_intervals_roundtrip_identical():
    """DRI/RSTn path: restart markers (any interval) must decode to
    EXACTLY the same pixels as the restart-free stream, and
    block-constant images stay bit-exact through restarts."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    base = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    for ri in (1, 2, 5):
        enc = encode_jpeg_baseline(img, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        d = decode_jpeg_baseline(enc)
        assert d is not None and (d == base).all()
    g = np.repeat(
        np.repeat(rng.integers(0, 256, (2, 3), dtype=np.uint8), 8, 0), 8, 1
    )
    dg = decode_jpeg_baseline(
        encode_jpeg_baseline(g, quality=90, restart_interval=1)
    )
    assert (dg == np.repeat(g[:, :, None], 3, 2)).all()


def test_422_subsampling_roundtrip():
    """Horizontal-only (4:2:2) sampling: decoder handles h=2,v=1; an
    image constant per 16x8 MCU round-trips within the YCbCr +-1."""
    rng = np.random.default_rng(10)
    mcus = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(mcus, 8, axis=0), 16, axis=1)  # 24x32
    dec = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=90, subsample="422")
    )
    assert dec is not None
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
    # general image decodes at the right shape
    noisy = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    d2 = decode_jpeg_baseline(
        encode_jpeg_baseline(noisy, quality=95, subsample="422")
    )
    assert d2 is not None and d2.shape == (11, 13, 3)


def test_restart_markers_roundtrip_all_subsampling():
    """DRI > 0: encoder emits a DRI segment + RSTn every N MCUs with
    DC-predictor resets; the decoder's restart path must reproduce the
    same pixels as the DRI=0 encoding of the same image (r12 VERDICT
    item 7: no test exercised restart intervals before r14)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for subsample in ("444", "422", "420"):
        plain = decode_jpeg_baseline(
            encode_jpeg_baseline(img, quality=85, subsample=subsample)
        )
        for dri in (1, 2, 3, 5):
            enc = encode_jpeg_baseline(
                img, quality=85, subsample=subsample, restart_interval=dri
            )
            assert b"\xff\xdd" in enc  # DRI segment present
            assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
            dec = decode_jpeg_baseline(enc)
            assert dec is not None
            # restart markers change entropy segmentation only, never
            # the coefficients: output must be IDENTICAL to DRI=0
            assert np.array_equal(dec, plain)


def test_restart_markers_grayscale_and_cycle_wrap():
    """A small interval on a wide grayscale image wraps the RSTn index
    past 7 (D0..D7 cycle) — the decoder must follow the modulo-8
    marker sequence."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 160), dtype=np.uint8)  # 40 MCUs
    enc = encode_jpeg_baseline(img, quality=90, restart_interval=2)
    # 19 restarts -> indices 0..7,0..7,0..2: all eight markers appear
    for k in range(8):
        assert bytes([0xFF, 0xD0 + k]) in enc
    plain = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    dec = decode_jpeg_baseline(enc)
    assert dec is not None and np.array_equal(dec, plain)


def test_restart_interval_dc_reset_bit_exact_blocks():
    """Block-constant fixture: with DC predictors reset at every
    restart the round-trip must still be bit-exact (same contract as
    test_grayscale_block_constant_roundtrip_bit_exact, now crossing
    restart boundaries)."""
    img = np.repeat(
        np.repeat(np.arange(12, dtype=np.uint8).reshape(3, 4) * 20, 8, 0), 8, 1
    )
    enc = encode_jpeg_baseline(img, quality=90, restart_interval=1)
    dec = decode_jpeg_baseline(enc)
    assert dec is not None
    assert (dec == np.repeat(img[:, :, None], 3, axis=2)).all()
