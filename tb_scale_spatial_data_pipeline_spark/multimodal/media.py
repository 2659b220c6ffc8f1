"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. Codecs are layered behind one seam per
modality:

- images: ``_decode_payload`` decodes REAL image bytes natively
  (pure NumPy/stdlib: 24-bit BMP, binary PPM P6, non-interlaced
  8-bit PNG via zlib, and baseline-sequential JPEG via the
  from-scratch codec in ``multimodal/jpeg.py``) with PIL as the
  second tier for formats beyond those (progressive/arithmetic JPEG,
  TIFF, ...) when importable; otherwise it falls back to the
  deterministic fake (md5-stream expansion to the metadata
  dimensions). No compressed format used by the fixtures depends on
  PIL in this container anymore. The PIL path is covered by a
  skip-marked round-trip test (tests/test_multimodal.py).
- audio: ``_decode_audio`` decodes REAL RIFF/WAVE payloads with the
  stdlib ``wave`` module (no optional dependency) and falls back to
  the deterministic fake for non-WAV bytes.

Design notes for 100 TB of media:
- binary payloads stay opaque to Catalyst: select/filter on METADATA
  columns so pruning and pushdown never touch the blobs;
- mapInPandas streams Arrow record batches (bounded memory per task,
  `spark.sql.execution.arrow.maxRecordsPerBatch`), never collecting
  a partition of blobs as one list;
- kernels iterate with ``zip`` over column arrays (no per-row
  ``iterrows`` Series construction — measurable at 500M blobs);
- derived features are small typed columns — downstream joins and
  dedup run on those, with the blobs long dropped from the plan.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # optional imaging dependency — absent in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised implicitly everywhere
    _PILImage = None


def synth_media_table(
    spark: SparkSession, sf_dir: str, fixed_n: int | None = None
) -> DataFrame:
    """Deterministic media fixture derived from `documents`. EVERY row
    now carries a REAL compressed payload built from md5-chain pixels:
    'png' rows (1 in 3) through the pure-stdlib PNG encoder, 'gif'
    rows (1 in 3) through the from-scratch LZW GIF87a encoder
    (`multimodal/gif.py` — exact palette, lossless at fixture sizes),
    'jpeg' rows (1 in 3) through the from-scratch baseline-JPEG
    encoder (`multimodal/jpeg.py` — FDCT, Annex K tables, Huffman,
    4:2:0), so the decode tier runs actual inflate+unfilter, LZW
    table-building AND entropy-decode + IDCT work with zero imaging
    dependencies. The deterministic-fake
    tier remains only as the fallback for genuinely unparseable bytes
    (exercised directly in tests). The metadata struct is the typed
    decode contract (width/height/channels/format/n_frames).

    ``fixed_n`` switches to the SF-INDEPENDENT fixture: ``fixed_n``
    rows seeded by the literal string ``media-<id>`` instead of the
    per-SF document text (the driver's documents tables carry
    DIFFERENT text per scale factor, so a golden-table oracle can only
    pin queries whose fixture does not read them). Used by the two
    oracle-paired media queries; the rows-only queries keep the
    document-derived fixture."""
    if fixed_n is not None:
        docs = spark.range(fixed_n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("media-"), F.col("id").cast("string")).alias("text"),
        )
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    width = (F.col("doc_id") % 8 + 4).cast("int")
    height = (F.col("doc_id") % 5 + 4).cast("int")
    channels = F.lit(3)
    n_frames = (F.col("doc_id") % 4 + 1).cast("int")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "gif")
        .otherwise(F.lit("jpeg"))
    )
    payload = F.to_binary(F.md5(F.col("text")), F.lit("hex"))
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            channels.alias("channels"),
            fmt.alias("format"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import encode_gif_rgb8
        from .jpeg import encode_jpeg_baseline

        for pdf in batches:
            payloads = []
            for blob, m in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(blob)
                w, h = int(m["width"]), int(m["height"])
                px = np.frombuffer(
                    _fake_decode(raw, w * h * 3), dtype=np.uint8
                ).reshape(h, w, 3)
                if m["format"] == "png":
                    payloads.append(_encode_png_rgb8(px))
                elif m["format"] == "gif":
                    payloads.append(encode_gif_rgb8(px))
                else:
                    payloads.append(encode_jpeg_baseline(px, quality=90))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return base.mapInPandas(
        kernel,
        schema=(
            "media_id long, payload binary, "
            "meta struct<width:int,height:int,channels:int,"
            "format:string,n_frames:int>"
        ),
    )


def _fake_decode(payload: bytes, need: int) -> bytes:
    """Deterministic fake byte stream: md5-chain expansion of payload."""
    buf = bytearray()
    seed = payload
    while len(buf) < need:
        seed = hashlib.md5(seed).digest()
        buf.extend(seed)
    return bytes(buf[:need])


def decode_fallback_counter(spark: SparkSession):
    """Executor-side counter of REAL image decodes that failed and fell
    back to the deterministic fake. PIL-absent deployments never touch
    it (the fake is by design there); a nonzero value under PIL means
    payloads are malformed — the observability hook the silent
    try/except fallback otherwise hides. Pass to decode_images /
    image_channel_stats / resize_images / sample_frames and read
    ``counter.value`` after an action."""
    return spark.sparkContext.accumulator(0)


def _decode_bmp24(payload: bytes) -> "np.ndarray | None":
    """Pure-NumPy decode of an uncompressed 24-bit BI_RGB BMP (the
    Windows DIB format, public spec) — rows padded to 4 bytes, BGR
    order, bottom-up when height > 0. Returns HxWx3 RGB uint8, or
    None if the payload is not such a BMP."""
    try:
        if len(payload) < 54 or payload[:2] != b"BM":
            return None
        off = int.from_bytes(payload[10:14], "little")
        hdr = int.from_bytes(payload[14:18], "little")
        if hdr < 40:
            return None
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        if len(payload) < off + stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return img[::-1] if bottom_up else img
    except Exception:
        return None


def _decode_ppm6(payload: bytes) -> "np.ndarray | None":
    """Pure-NumPy decode of a binary PPM (P6, maxval 255 — the netpbm
    public format). Returns HxWx3 RGB uint8, or None."""
    try:
        if not payload.startswith(b"P6"):
            return None
        # header = magic, width, height, maxval as whitespace-separated
        # tokens (comments starting with # allowed), then ONE
        # whitespace byte before the raster
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = tokens
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        need = w * h * 3
        if len(payload) < pos + need:
            return None
        return np.frombuffer(
            payload, dtype=np.uint8, count=need, offset=pos
        ).reshape(h, w, 3)
    except Exception:
        return None


def _decode_png8(payload: bytes) -> "np.ndarray | None":
    """Pure-stdlib (zlib + NumPy) decode of a non-interlaced 8-bit
    PNG (ISO/IEC 15948 / RFC 2083): color types 0 (gray), 2 (RGB),
    4 (gray+alpha), 6 (RGBA), all five scanline filters (None / Sub /
    Up / Average / Paeth). Returns HxWx3 RGB uint8 (gray broadcast,
    alpha dropped), or None if the payload is not such a PNG. The Sub
    filter unrolls to a per-channel cumsum (vectorized); Average and
    Paeth fall back to the per-pixel recurrence the spec defines."""
    import zlib

    try:
        if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
            return None
        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ctype, comp, filt, interlace = data[8:13]
                if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                    return None
                nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
                if nch is None or w <= 0 or h <= 0:
                    return None
            elif typ == b"IDAT":
                idat.extend(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * nch
        if len(raw) < h * (stride + 1):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
            h, stride + 1
        )
        filters, scan = rows[:, 0], rows[:, 1:]
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            f, line = int(filters[y]), scan[y]
            if f == 0:
                cur = line.copy()
            elif f == 1:  # Sub: prefix sum per channel offset, mod 256
                cur = (
                    np.cumsum(line.reshape(w, nch).astype(np.uint64), axis=0)
                    .astype(np.uint8)
                    .reshape(stride)
                )
            elif f == 2:  # Up
                cur = line + prev
            elif f == 3:  # Average
                cur = np.empty(stride, dtype=np.uint8)
                for i in range(stride):
                    left = int(cur[i - nch]) if i >= nch else 0
                    cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
            elif f == 4:  # Paeth
                cur = np.empty(stride, dtype=np.uint8)
                for i in range(stride):
                    a = int(cur[i - nch]) if i >= nch else 0
                    b = int(prev[i])
                    c = int(prev[i - nch]) if i >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (int(line[i]) + pred) & 0xFF
            else:
                return None
            out[y] = cur
            prev = cur
        px = out.reshape(h, w, nch)
        if nch == 1:
            return np.repeat(px, 3, axis=2)
        if nch == 2:
            return np.repeat(px[:, :, :1], 3, axis=2)
        return px[:, :, :3]
    except Exception:
        return None


def _encode_png_rgb8(arr: "np.ndarray") -> bytes:
    """Pure-stdlib PNG encoder (8-bit RGB, filter 0, one IDAT) — the
    write side of the PNG seam, used by the media fixture so the
    engine's decode path runs on REAL compressed payloads with no
    imaging library. Deterministic for fixed zlib level."""
    import zlib
    from binascii import crc32

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_payload(
    payload: bytes,
    width: int,
    height: int,
    channels: int,
    pil=None,
    fallback_counter=None,
) -> np.ndarray:
    """Image decode seam, three tiers:
    1. REAL library-independent decode for the public formats the
       engine carries codecs for: 24-bit BI_RGB BMP, binary PPM P6,
       8-bit PNG (stdlib zlib), GIF87a/89a (`multimodal/gif.py`,
       from-scratch LZW), and baseline-sequential JPEG
       (`multimodal/jpeg.py`) — PIL-absent deployments decode these
       identically to PIL-present ones (nearest-neighbor resize to the
       declared metadata size if they disagree, matching the PIL
       path's policy).
    2. REAL PIL decode for anything else PIL knows (progressive/
       arithmetic JPEG, TIFF, ...) when importable.
    3. Deterministic fake — md5-stream-expand payload bytes to
       width*height*channels uint8 — for unparseable bytes; when a
       real decode FAILS, ``fallback_counter`` (a Spark accumulator)
       records it so malformed payloads are observable, not silent."""
    native = _decode_bmp24(payload)
    if native is None:
        native = _decode_ppm6(payload)
    if native is None:
        native = _decode_png8(payload)
    if native is None:
        from .gif import decode_gif

        native = decode_gif(payload)
    if native is None:
        from .jpeg import decode_jpeg_baseline

        native = decode_jpeg_baseline(payload)
    if native is not None:
        ih, iw = native.shape[:2]
        if (iw, ih) != (width, height):
            # nearest-neighbor resize, same policy as the PIL branch
            ys = (np.arange(height) * ih // height).clip(0, ih - 1)
            xs = (np.arange(width) * iw // width).clip(0, iw - 1)
            native = native[ys][:, xs]
        return native[:, :, :channels] if channels < 3 else native
    pil = _PILImage if pil is None else pil
    if pil is not None:
        try:
            img = pil.open(io.BytesIO(payload))
            img = img.convert("RGB")
            if img.size != (width, height):
                img = img.resize((width, height), pil.NEAREST)
            arr = np.asarray(img, dtype=np.uint8)
            if channels < 3:
                arr = arr[:, :, :channels]
            return arr
        except Exception:
            # not real image bytes — fall through to the fake, counted
            if fallback_counter is not None:
                fallback_counter.add(1)
    arr = np.frombuffer(
        _fake_decode(payload, width * height * channels), dtype=np.uint8
    )
    return arr.reshape(height, width, channels)


def decode_images(media: DataFrame, fallback_counter=None, _pil=None) -> DataFrame:
    """binary payload + meta → long-format decoded pixels
    (media_id, y, x, c0..c2). mapInPandas: one Arrow batch in, one out;
    blobs never round-trip through the driver. ``fallback_counter``
    (see :func:`decode_fallback_counter`) counts real-decode failures;
    ``_pil`` overrides the PIL module (test seam — it is cloudpickled
    into the kernel closure, so a driver-side stub reaches workers)."""
    pil = _PILImage if _pil is None else _pil

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                arr = _decode_payload(
                    bytes(payload), m["width"], m["height"], m["channels"],
                    pil=pil, fallback_counter=fallback_counter,
                )
                h, w, _ = arr.shape
                ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                out.append(
                    pd.DataFrame(
                        {
                            "media_id": media_id,
                            "y": ys.ravel(),
                            "x": xs.ravel(),
                            "c0": arr[:, :, 0].ravel(),
                            "c1": arr[:, :, 1].ravel(),
                            "c2": arr[:, :, 2].ravel(),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=["media_id", "y", "x", "c0", "c1", "c2"]
            )

    return media.mapInPandas(
        kernel, schema="media_id long, y int, x int, c0 int, c1 int, c2 int"
    )


def image_channel_stats(media: DataFrame, fallback_counter=None, _pil=None) -> DataFrame:
    """Feature extraction: per-image channel means/stds — decoded and
    reduced INSIDE the kernel so only (media_id, 6 doubles) leaves the
    task, not pixels."""
    pil = _PILImage if _pil is None else _pil

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                arr = _decode_payload(
                    bytes(payload), m["width"], m["height"], m["channels"],
                    pil=pil, fallback_counter=fallback_counter,
                ).astype(np.float64)
                rows.append(
                    (
                        media_id,
                        *[float(arr[:, :, c].mean()) for c in range(3)],
                        *[float(arr[:, :, c].std()) for c in range(3)],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "mean_c0", "mean_c1", "mean_c2", "std_c0", "std_c1", "std_c2"],
            )

    return media.mapInPandas(
        kernel,
        schema=(
            "media_id long, mean_c0 double, mean_c1 double, mean_c2 double, "
            "std_c0 double, std_c1 double, std_c2 double"
        ),
    )


def resize_images(
    media: DataFrame, out_w: int = 4, out_h: int = 4, fallback_counter=None, _pil=None
) -> DataFrame:
    """Nearest-neighbor resize: decode → sample grid → re-encode bytes,
    metadata updated to the new dimensions (schema evolution travels
    with the payload)."""
    pil = _PILImage if _pil is None else _pil

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                arr = _decode_payload(
                    bytes(payload), m["width"], m["height"], m["channels"],
                    pil=pil, fallback_counter=fallback_counter,
                )
                h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = arr[np.ix_(yi, xi)]
                rows.append((media_id, small.tobytes(), out_w, out_h, c))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height", "channels"]
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, payload binary, width int, height int, channels int",
    )


def _decode_y4m_frame(payload: bytes, frame_idx: int) -> "np.ndarray | None":
    """Pure-NumPy decode of one frame's Y (luma) plane from a
    YUV4MPEG2 stream (the mjpegtools public raw-video container:
    text stream header, then 'FRAME\\n' + planar YUV per frame).
    Supports C420 (default) and C444 chroma. Returns the HxW uint8
    luma plane, or None if the payload is not such a stream or the
    frame index is out of range."""
    try:
        if not payload.startswith(b"YUV4MPEG2"):
            return None
        nl = payload.index(b"\n")
        header = payload[:nl].decode("ascii", "replace").split(" ")
        w = h = None
        chroma = "420"
        for tok in header[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
            elif tok.startswith("C"):
                chroma = tok[1:]
        if not w or not h:
            return None
        if chroma.startswith("420"):
            # 4:2:0 chroma planes are ceil(w/2) x ceil(h/2) — floor
            # division under-sizes odd-dimension streams and would
            # misalign every frame offset after frame 0.
            fsize = w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2))
        elif chroma.startswith("444"):
            fsize = w * h * 3
        else:
            return None
        pos = nl + 1
        for _ in range(frame_idx + 1):
            if not payload.startswith(b"FRAME", pos):
                return None
            pos = payload.index(b"\n", pos) + 1
            start = pos
            pos += fsize
        if len(payload) < start + w * h:
            return None
        return np.frombuffer(
            payload, dtype=np.uint8, count=w * h, offset=start
        ).reshape(h, w)
    except Exception:
        return None


def sample_frames(
    media: DataFrame, every_k: int = 2, fallback_counter=None, _pil=None
) -> DataFrame:
    """Video-style frame sampling: metadata declares n_frames; emit one
    row per sampled frame (UDTF-style one-to-many). REAL path: a
    YUV4MPEG2 payload has its actual frame_idx-th luma plane decoded
    (pure NumPy, public container spec). A parseable STILL image
    (BMP/PPM/PNG) decodes to the same pixels for every sampled
    frame — a still repeated n_frames times, by definition. Fallback
    for opaque bytes: deterministic per-frame payload slice through
    the image seam. Pure column expressions for the frame index
    explosion; only the per-frame decode is kernel work."""
    pil = _PILImage if _pil is None else _pil
    frames = media.select(
        "media_id",
        "payload",
        "meta",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_k == 0)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, m, frame_idx in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"], pdf["frame_idx"]
            ):
                raw = bytes(payload)
                arr = _decode_y4m_frame(raw, int(frame_idx))
                if arr is None:
                    arr = _decode_payload(
                        raw + bytes([frame_idx]),
                        m["width"],
                        m["height"],
                        m["channels"],
                        pil=pil,
                        fallback_counter=fallback_counter,
                    )
                rows.append((media_id, int(frame_idx), float(arr.mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])

    return frames.mapInPandas(
        kernel, schema="media_id long, frame_idx int, frame_mean double"
    )


def synth_audio_table(
    spark: SparkSession, sf_dir: str, fixed_n: int | None = None
) -> DataFrame:
    """Audio-modality fixture: payload bytes decode as int16 PCM
    samples; metadata declares sample_rate and n_samples. ``fixed_n``
    switches to the SF-independent seed (see synth_media_table)."""
    if fixed_n is not None:
        docs = spark.range(fixed_n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("media-"), F.col("id").cast("string")).alias("text"),
        )
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_samples = (F.col("doc_id") % 64 + 64).cast("int")
    payload = F.to_binary(
        F.concat(F.md5(F.col("text")), F.md5(F.concat(F.lit("a:"), F.col("text")))),
        F.lit("hex"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(16000).alias("sample_rate"),
            n_samples.alias("n_samples"),
        ).alias("meta"),
    )


def _decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """Audio decode seam. Real path: RIFF/WAVE payloads parse with the
    stdlib ``wave`` module — 16-bit PCM frames to float64 samples
    (first channel), truncated/padded to the declared n_samples.
    Fallback for non-WAV bytes: deterministic fake (md5-stream-expand
    to n_samples int16 values)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(payload), "rb") as wf:
                n_ch = wf.getnchannels()
                if wf.getsampwidth() == 2:
                    raw = wf.readframes(wf.getnframes())
                    samples = np.frombuffer(raw, dtype="<i2")[::n_ch]
                    samples = samples[:n_samples].astype(np.float64)
                    if len(samples) < n_samples:
                        samples = np.pad(samples, (0, n_samples - len(samples)))
                    return samples
        except wave.Error:
            pass  # malformed RIFF — fall through to the fake
    return np.frombuffer(_fake_decode(payload, n_samples * 2), dtype="<i2").astype(
        np.float64
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Waveform feature extraction: RMS energy, zero-crossing rate,
    peak amplitude — reduced inside the kernel; only small typed
    features leave the task."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                w = _decode_audio(bytes(payload), m["n_samples"])
                rms = float(np.sqrt((w**2).mean()))
                zcr = float((np.diff(np.signbit(w)) != 0).mean()) if len(w) > 1 else 0.0
                peak = float(np.abs(w).max())
                rows.append((media_id, len(w), rms, zcr, peak))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "zcr", "peak"]
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, n_samples int, rms double, zcr double, peak double",
    )


def image_ahash(media: DataFrame, fallback_counter=None, _pil=None) -> DataFrame:
    """Perceptual average-hash (aHash): decode → grayscale → 8×8
    nearest-neighbor thumbnail → 64 bits of (pixel > mean), packed to
    one BIGINT per image. The classic cheap perceptual fingerprint:
    visually-identical images hash equal, small edits flip few bits,
    so near-dup detection becomes small-Hamming-distance search over
    64-bit ints — pure JVM arithmetic once the kernel emits the hash
    (blobs never leave the task)."""
    pil = _PILImage if _pil is None else _pil

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                arr = _decode_payload(
                    bytes(payload), m["width"], m["height"], m["channels"],
                    pil=pil, fallback_counter=fallback_counter,
                ).astype(np.float64)
                gray = arr.mean(axis=2)
                h, w = gray.shape
                yi = (np.arange(8) * h // 8).astype(int)
                xi = (np.arange(8) * w // 8).astype(int)
                thumb = gray[np.ix_(yi, xi)]
                bits = (thumb > thumb.mean()).ravel()
                # pack to int64 via int32 halves (bit 63 would overflow
                # a signed shift done naively in float space)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # wrap to signed 64-bit for the BIGINT column
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append((media_id, val))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.mapInPandas(kernel, schema="media_id long, ahash long")
