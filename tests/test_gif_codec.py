"""GIF codec tests: lossless round-trip, independent bit-level LZW
reference decoder (a SECOND implementation, per-bit, no shared
helpers), container edge cases, and the Spark decode seam on real
fixture payloads."""

from __future__ import annotations

import numpy as np

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif_rgb8,
)


def _ref_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Independent reference: explicit bit-cursor reader + dict-of-
    lists table (different data layout and control flow from the
    production decoder)."""
    bits = []
    for byte in data:
        for k in range(8):
            bits.append((byte >> k) & 1)
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = 0
    width = min_code_size + 1
    table: dict[int, list[int]] = {}
    nxt = 0

    def reset():
        nonlocal table, nxt, width
        table = {i: [i] for i in range(clear)}
        nxt = eoi + 1
        width = min_code_size + 1

    reset()
    out: list[int] = []
    prev: list[int] | None = None
    while pos + width <= len(bits):
        code = sum(b << i for i, b in enumerate(bits[pos : pos + width]))
        pos += width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[nxt] = prev + [entry[0]]
            nxt += 1
        else:
            entry = prev + [prev[0]]
            table[nxt] = entry
            nxt += 1
        out.extend(entry)
        prev = entry
        if nxt == (1 << width) - 1 + 1 and width < 12:
            width += 1
    return out


def test_lzw_roundtrip_vs_reference_decoder():
    rng = np.random.RandomState(11)
    for ncolors in (2, 4, 17, 100, 256):
        mcs = max(2, int(np.ceil(np.log2(max(ncolors, 2)))))
        idx = [int(v) for v in rng.randint(0, ncolors, size=rng.randint(1, 800))]
        enc = _lzw_encode(idx, mcs)
        assert _lzw_decode(enc, mcs) == idx
        assert _ref_lzw_decode(enc, mcs) == idx


def test_gif_roundtrip_exact_small_palettes():
    rng = np.random.RandomState(3)
    for _ in range(30):
        h, w = rng.randint(1, 16), rng.randint(1, 16)
        arr = (rng.randint(0, 5, size=(h, w, 3)) * 51).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif_rgb8(arr)), arr)


def test_gif_roundtrip_full_palette_width_growth():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(48, 48, 1)).repeat(3, axis=2).astype(
        np.uint8
    )
    b = encode_gif_rgb8(arr)
    assert np.array_equal(decode_gif(b), arr)


def test_gif_palette_overflow_raises():
    g = np.arange(512, dtype=np.uint16)
    arr = np.stack(
        [(g % 256), (g // 256) * 7, np.zeros_like(g)], axis=-1
    ).astype(np.uint8).reshape(16, 32, 3)
    try:
        encode_gif_rgb8(arr)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_gif_malformed_and_out_of_scope_return_none():
    assert decode_gif(b"NOTAGIF") is None
    assert decode_gif(b"GIF87a\x00") is None
    good = bytearray(encode_gif_rgb8(np.zeros((4, 4, 3), dtype=np.uint8)))
    # flip the interlace flag in the image descriptor
    pos = good.index(0x2C)
    good[pos + 9] |= 0x40
    assert decode_gif(bytes(good)) is None


def test_gif89a_header_and_extension_blocks_accepted():
    arr = (np.arange(12, dtype=np.uint8) * 20).reshape(2, 2, 3)
    b = bytearray(encode_gif_rgb8(arr))
    b[:6] = b"GIF89a"
    # inject a graphic-control extension before the image descriptor
    pos = bytes(b).index(0x2C)
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    b2 = bytes(b[:pos]) + ext + bytes(b[pos:])
    assert np.array_equal(decode_gif(b2), arr)


def test_gif_fixture_rows_decode_through_spark_seam(spark):
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
        synth_media_table,
    )

    media = synth_media_table(spark, SF_SMOKE)
    rows = media.where("meta.format = 'gif'").limit(3).collect()
    assert rows, "fixture must emit gif rows"
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:6] == b"GIF87a"
        arr = decode_gif(payload)
        m = r["meta"]
        assert arr is not None
        assert arr.shape == (m["height"], m["width"], 3)
        seam = _decode_payload(
            payload, m["width"], m["height"], m["channels"]
        )
        assert np.array_equal(seam, arr)


def test_animated_gif_decodes_first_frame_only():
    """Documented contract (multimodal/gif.py r14): for an animated
    GIF89a the decoder returns the FIRST frame — extensions are
    skipped and parsing stops at the first image descriptor, so frame
    2 (a different image appended after a second GCE) must never leak
    into the output."""
    f1 = (np.arange(12, dtype=np.uint8) * 20).reshape(2, 2, 3)
    f2 = 255 - f1
    b1 = bytes(encode_gif_rgb8(f1))
    b2 = bytes(encode_gif_rgb8(f2))
    gce = bytes([0x21, 0xF9, 0x04, 0x04, 0x0A, 0x00, 0x00, 0x00])
    p1 = b1.index(0x2C)
    p2 = b2.index(0x2C)
    # GIF89a header + shared screen descriptor/GCT from frame 1, then
    # GCE+frame1, GCE+frame2 (with frame 2's own local color table
    # already inside its image-descriptor block? no — splice frame 2's
    # descriptor WITHOUT its GCT context, so give it frame 2's global
    # table as a LOCAL one is out of scope; instead both frames use
    # frame-1's palette, so frame 2's pixel indices are simply frame
    # 2's LZW stream decoded against palette 1 — still a well-formed
    # animation, and still must NOT be what decode returns)
    animated = (
        b"GIF89a"
        + b1[6:p1]
        + gce
        + b1[p1:-1]
        + gce
        + b2[p2:-1]
        + b"\x3b"
    )
    out = decode_gif(animated)
    assert out is not None
    assert np.array_equal(out, f1)
    assert not np.array_equal(out, f2)
