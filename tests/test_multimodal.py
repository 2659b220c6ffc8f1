"""Multimodal plumbing tests: schema/batch-shape correctness and
decode-stub determinism (FIXTURES-style invariants — the decode is a
deterministic fake, so exact values are reproducible)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
    _decode_payload,
    decode_images,
    image_channel_stats,
    resize_images,
    sample_frames,
    synth_media_table,
)


def test_media_table_schema(spark):
    media = synth_media_table(spark, SF_SMOKE)
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    jrow = media.where("meta.format = 'jpeg'").first()
    assert jrow["meta"]["channels"] == 3
    jp = bytes(jrow["payload"])  # real baseline-JPEG tier (r13)
    assert jp[:2] == b"\xff\xd8" and jp[-2:] == b"\xff\xd9"
    prow = media.where("meta.format = 'png'").first()
    assert bytes(prow["payload"]).startswith(b"\x89PNG")  # real PNG tier


def test_decode_stub_deterministic_and_shaped():
    a = _decode_payload(b"abc", 6, 4, 3)
    b = _decode_payload(b"abc", 6, 4, 3)
    assert a.shape == (4, 6, 3)
    assert a.dtype == np.uint8
    assert np.array_equal(a, b)
    c = _decode_payload(b"abd", 6, 4, 3)
    assert not np.array_equal(a, c)


def test_decode_images_row_counts(spark):
    media = synth_media_table(spark, SF_SMOKE).limit(20).cache()
    px = decode_images(media)
    got = {
        r["media_id"]: r["n"]
        for r in px.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    for row in media.select("media_id", "meta").collect():
        m = row["meta"]
        assert got[row["media_id"]] == m["width"] * m["height"]


def test_decode_fallback_counter_counts_failures(spark):
    """Real-decode failures must be counted, not silent: with a PIL
    that raises on every payload, the accumulator ends at the row
    count and the output still equals the deterministic fake's."""
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        decode_fallback_counter,
    )

    class _FailingPIL:
        # PIL-shaped stub whose open() always raises — drives the
        # real-decode-failure path without real PIL in the container.
        # Defined inside the test so cloudpickle ships it by value.
        NEAREST = 0

        @staticmethod
        def open(fp):
            raise OSError("cannot identify image file")

    # png AND jpeg fixture rows decode on the NATIVE tier since r13 and
    # never reach PIL — swap in genuinely opaque payloads (raw md5
    # bytes match no codec magic) to exercise the PIL failure path
    media = (
        synth_media_table(spark, SF_SMOKE)
        .limit(12)
        .withColumn(
            "payload",
            F.to_binary(F.md5(F.col("media_id").cast("string")), F.lit("hex")),
        )
        .cache()
    )
    n = media.count()

    counter = decode_fallback_counter(spark)
    with_fail = image_channel_stats(
        media, fallback_counter=counter, _pil=_FailingPIL
    ).collect()
    assert counter.value == n

    # fallback output is byte-identical to the PIL-absent fake path
    plain = image_channel_stats(media).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(with_fail) == key(plain)

    # PIL-absent deployments never touch the counter (fake by design)
    counter2 = decode_fallback_counter(spark)
    image_channel_stats(media, fallback_counter=counter2, _pil=None).collect()
    assert counter2.value == 0


def test_channel_stats_bounds(spark):
    media = synth_media_table(spark, SF_SMOKE).limit(20)
    stats = image_channel_stats(media).collect()
    assert len(stats) == 20
    for r in stats:
        for c in ("mean_c0", "mean_c1", "mean_c2"):
            assert 0.0 <= r[c] <= 255.0


def test_resize_payload_size(spark):
    media = synth_media_table(spark, SF_SMOKE).limit(10)
    out = resize_images(media, out_w=4, out_h=4).collect()
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["payload"]) == 4 * 4 * 3


def test_frame_sampling_stride(spark):
    media = synth_media_table(spark, SF_SMOKE).limit(40).cache()
    out = sample_frames(media, every_k=2)
    rows = out.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    # every media with n_frames >= 1 contributes frame 0
    n_media = media.count()
    assert out.where("frame_idx = 0").count() == n_media


def test_audio_features(spark):
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        audio_features,
        synth_audio_table,
    )

    audio = synth_audio_table(spark, SF_SMOKE).limit(30).cache()
    out = audio_features(audio).collect()
    assert len(out) == 30
    meta = {r["media_id"]: r["meta"]["n_samples"] for r in audio.collect()}
    for r in out:
        assert r["n_samples"] == meta[r["media_id"]]
        assert 0.0 <= r["zcr"] <= 1.0
        assert r["peak"] >= r["rms"] >= 0.0


def test_real_wav_decode_roundtrip(spark):
    """The audio decode seam parses REAL RIFF/WAVE bytes with the
    stdlib wave module — synthesize a 16-bit PCM WAV, push it through
    audio_features, and check the features against the known samples."""
    import io as _io
    import wave as _wave

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_audio,
        audio_features,
    )

    samples = (np.sin(np.arange(100) * 0.3) * 20000).astype("<i2")
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(samples.tobytes())
    wav_bytes = buf.getvalue()

    # kernel-level: decoded samples ARE the PCM frames
    dec = _decode_audio(wav_bytes, 100)
    assert np.array_equal(dec, samples.astype(np.float64))

    # Spark-level: the same bytes flow through the mapInPandas kernel
    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes), {"sample_rate": 16000, "n_samples": 100})],
        "media_id long, payload binary, meta struct<sample_rate:int,n_samples:int>",
    )
    row = audio_features(df).collect()[0]
    expect_rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
    assert abs(row["rms"] - expect_rms) < 1e-9
    assert row["peak"] == float(np.abs(samples).max())


def test_real_image_decode_roundtrip(spark):
    """PIL path of the image decode seam — skip-marked where PIL is
    absent (this container); the fake path is covered by every other
    multimodal test."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import io as _io

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
    )

    arr = (np.arange(4 * 5 * 3, dtype=np.uint8)).reshape(5, 4, 3)
    buf = _io.BytesIO()
    PIL.fromarray(arr).save(buf, format="PNG")
    out = _decode_payload(buf.getvalue(), 4, 5, 3)
    assert np.array_equal(out, arr)


def test_phash_neardup_finds_planted_duplicates(spark):
    """The banded aHash near-dup must surface every planted duplicate
    (same payload under a shifted id) at Hamming distance 0, and the
    band join must never produce an all-pairs candidate set."""
    from tb_scale_spatial_data_pipeline_spark.plans.media_queries import (
        GOLDEN_N,
        QUERIES,
    )

    out = QUERIES["multimodal_phash_neardup"](spark, SF_SMOKE).collect()
    n_media = GOLDEN_N  # r15: the query runs on the fixed golden fixture
    planted = {(r["id_a"], r["id_b"]) for r in out if r["hamming"] == 0}
    # every planted pair (id, id + 1_000_000) present
    missing = [
        i for i in range(n_media) if (i, i + 1_000_000) not in planted
    ]
    assert missing == []
    # candidates stayed bounded: results are a small multiple of the
    # planted-pair count, not O(n^2)
    assert len(out) < n_media * 5


def _bmp24(img) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (bottom-up, padded rows)."""
    import numpy as np
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        bgr = row[:, ::-1].tobytes()
        raster += bgr + b"\x00" * (stride - w * 3)
    off = 14 + 40
    size = off + len(raster)
    return (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + bytes(raster)
    )


def _ppm6(img) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def test_native_bmp_decode_pixel_exact():
    """The pure-NumPy BMP tier must decode REAL 24-bit BMP bytes
    pixel-exactly — no PIL involved (pil=None forces the seam)."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = _decode_payload(_bmp24(img), 7, 5, 3, pil=False)
    assert (out == img).all()
    # odd width exercises the 4-byte row padding
    img2 = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    out2 = _decode_payload(_bmp24(img2), 5, 3, 3, pil=False)
    assert (out2 == img2).all()


def test_native_ppm_decode_pixel_exact():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    out = _decode_payload(_ppm6(img), 6, 4, 3, pil=False)
    assert (out == img).all()


def test_native_decode_resizes_to_metadata():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_payload,
    )

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = _decode_payload(_ppm6(img), 4, 4, 3, pil=False)
    assert out.shape == (4, 4, 3)
    # nearest-neighbor: each source pixel becomes a 2x2 block
    assert (out[0, 0] == img[0, 0]).all() and (out[3, 3] == img[1, 1]).all()


def test_native_decode_through_spark_path(spark):
    """End-to-end: real BMP bytes flow through decode_images'
    mapInPandas kernel and come out pixel-exact, PIL or not."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        decode_images,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, _bmp24(img), (4, 4, 3, "bmp", 1))],
        "media_id bigint, payload binary, "
        "meta struct<width:int, height:int, channels:int, "
        "format:string, n_frames:int>",
    )
    rows = decode_images(media).collect()
    assert len(rows) == 16
    got = {(r["y"], r["x"]): (r["c0"], r["c1"], r["c2"]) for r in rows}
    for y in range(4):
        for x in range(4):
            assert got[(y, x)] == tuple(int(v) for v in img[y, x])


def _y4m(frames, chroma="420") -> bytes:
    """Minimal YUV4MPEG2 encoder: list of HxW luma planes; chroma
    planes filled with 128."""
    import numpy as np

    h, w = frames[0].shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A0:0 C{chroma}\n".encode())
    for y in frames:
        out += b"FRAME\n" + y.tobytes()
        if chroma == "420":
            # ceil-based 4:2:0 chroma plane size (spec behavior for
            # odd dimensions)
            out += bytes([128]) * (((w + 1) // 2) * ((h + 1) // 2) * 2)
        else:
            out += bytes([128]) * (w * h * 2)
    return bytes(out)


def test_y4m_frame_decode_exact():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_y4m_frame,
    )

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, size=(4, 6), dtype=np.uint8) for _ in range(3)
    ]
    blob = _y4m(frames)
    for i, f in enumerate(frames):
        got = _decode_y4m_frame(blob, i)
        assert got is not None and (got == f).all()
    assert _decode_y4m_frame(blob, 3) is None  # out of range
    assert _decode_y4m_frame(b"not a video", 0) is None
    # C444 variant
    blob444 = _y4m(frames, chroma="444")
    assert (_decode_y4m_frame(blob444, 2) == frames[2]).all()
    # odd-dimension C420: chroma planes are ceil(w/2) x ceil(h/2), so
    # frames past index 0 only decode correctly with ceil-based
    # offsets (regression for the floor-division mis-sizing)
    odd = [rng.integers(0, 256, size=(5, 7), dtype=np.uint8) for _ in range(3)]
    blob_odd = _y4m(odd)
    for i, f in enumerate(odd):
        got = _decode_y4m_frame(blob_odd, i)
        assert got is not None and (got == f).all()


def test_y4m_through_spark_frame_sampling(spark):
    """Real Y4M bytes flow through sample_frames: the sampled frames'
    means must equal the true luma means of frames 0 and 2."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        sample_frames,
    )

    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(4, 4), dtype=np.uint8) for _ in range(3)
    ]
    media = spark.createDataFrame(
        [(1, _y4m(frames), (4, 4, 3, "y4m", 3))],
        "media_id bigint, payload binary, "
        "meta struct<width:int, height:int, channels:int, "
        "format:string, n_frames:int>",
    )
    rows = {r["frame_idx"]: r["frame_mean"] for r in sample_frames(media).collect()}
    assert set(rows) == {0, 2}  # every_k = 2
    for i in (0, 2):
        assert abs(rows[i] - float(frames[i].mean())) < 1e-9


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (zlib inflate + the five scanline filters)


def _png_encode_filtered(arr, ctype, filters):
    """Reference PNG encoder for tests: applies the REQUESTED filter
    type per scanline (exercising decode paths the filter-0 production
    encoder never emits). arr is HxWxC uint8 matching ctype."""
    import zlib
    from binascii import crc32

    import numpy as np

    h, w, c = arr.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        out = bytearray()
        for i in range(w * c):
            left = int(line[i - c]) if i >= c else 0
            up = int(prev[i])
            ul = int(prev[i - c]) if i >= c else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
                v = line[i] - pred
            out.append(v & 0xFF)
        raw.extend(out)
        prev = line

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_filter0():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_png8,
        _encode_png_rgb8,
    )

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (4, 6), (5, 7), (16, 3)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = _decode_png8(_encode_png_rgb8(img))
        assert got is not None and (got == img).all()


def test_png_all_five_filters_decode_exact():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_png8,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    # each scanline cycles through filters 0..4 — decoder must invert all
    blob = _png_encode_filtered(img, ctype=2, filters=[0, 1, 2, 3, 4])
    got = _decode_png8(blob)
    assert got is not None and (got == img).all()
    # single-filter streams too
    for f in range(5):
        got = _decode_png8(_png_encode_filtered(img, 2, [f]))
        assert got is not None and (got == img).all(), f"filter {f}"


def test_png_color_types():
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_png8,
    )

    rng = np.random.default_rng(13)
    # grayscale (0) -> broadcast to RGB
    g = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    got = _decode_png8(_png_encode_filtered(g, 0, [0, 2]))
    assert got.shape == (5, 4, 3) and (got == np.repeat(g, 3, axis=2)).all()
    # gray+alpha (4) -> gray broadcast, alpha dropped
    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    got = _decode_png8(_png_encode_filtered(ga, 4, [1, 4]))
    assert (got == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    # RGBA (6) -> alpha dropped
    rgba = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    got = _decode_png8(_png_encode_filtered(rgba, 6, [3, 4, 1]))
    assert (got == rgba[:, :, :3]).all()


def test_png_rejects_non_png():
    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_png8,
    )

    assert _decode_png8(b"not a png") is None
    assert _decode_png8(b"\x89PNG\r\n\x1a\nshort") is None


def test_synth_media_png_rows_decode_real(spark):
    """The fixture's png-format rows now carry real PNG payloads whose
    decoded pixels are the md5-chain stream — channel stats must match
    a local recomputation, proving the Spark path runs the real
    inflate+unfilter decode, not the fake."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import (
        _decode_png8,
        image_channel_stats,
        synth_media_table,
    )

    media = (
        synth_media_table(spark, SF_SMOKE)
        .where("meta.format = 'png'")
        .limit(8)
        .cache()
    )
    rows = media.collect()
    assert rows, "fixture must contain png rows"
    stats = {
        r["media_id"]: r
        for r in image_channel_stats(media).collect()
    }
    for r in rows:
        raw = bytes(r["payload"])
        assert raw.startswith(b"\x89PNG"), "png rows must be real PNGs"
        arr = _decode_png8(raw)
        w, h = r["meta"]["width"], r["meta"]["height"]
        assert arr.shape == (h, w, 3)
        got = stats[r["media_id"]]
        assert abs(got["mean_c0"] - float(arr[:, :, 0].mean())) < 1e-9
        assert abs(got["std_c2"] - float(arr[:, :, 2].std())) < 1e-9
    media.unpersist()
