"""GeoTIFF ↔ tile-table adapters (SURVEY §2 missing-piece #1): the
bridge between the reference's wall-to-wall rasterio I/O
(`0_preprocessing/feature_stacking.py:72-102,219-251`,
`2_segmentation/image_segmentation.py:153-162`) and this engine's
long-format pixel tables.

Two codec layers behind one seam:

- **rasterio**, when importable: full GeoTIFF support (compression,
  CRS/transform metadata, block-windowed executor-side reads for the
  scale path).
- **built-in minimal baseline-TIFF codec**, always available:
  uncompressed, little-endian, chunky-interleaved TIFF 6.0 (uint8 /
  int16 / uint16 / float32 / float64, any band count). This pins the
  adapter contract — round-trip tested in this rasterio-less
  container — so swapping in rasterio changes no call sites.

Scale note: ``tiff_to_tile_table`` with rasterio distributes
block-window reads across executors (each task opens the file and
reads only its window); the minimal codec reads driver-side and is the
contract/test path, sized for single scenes. Distributed OUTPUT at
100 TB goes through the tiled raster sinks (S7/S9), not a single .tif.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

try:  # optional geospatial dependency — absent in this container
    import rasterio as _rasterio
except ImportError:  # pragma: no cover
    _rasterio = None

# --- minimal baseline-TIFF codec -----------------------------------------

_TIFF_TYPES = {3: ("H", 2), 4: ("I", 4)}  # SHORT, LONG
_DTYPES = {
    # (bits, sample_format) -> numpy dtype; format 1=uint, 2=int, 3=float
    (8, 1): np.uint8,
    (16, 1): np.uint16,
    (16, 2): np.int16,
    (32, 3): np.float32,
    (64, 3): np.float64,
}
_FORMATS = {np.dtype(k): v for v, k in {
    (8, 1): np.uint8, (16, 1): np.uint16, (16, 2): np.int16,
    (32, 3): np.float32, (64, 3): np.float64,
}.items()}


def write_tiff(path: str, arr: np.ndarray) -> None:
    """Write (H, W) or (H, W, C) as an uncompressed little-endian
    baseline TIFF, single strip, chunky interleave."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if arr.dtype not in _FORMATS:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    bits, fmt = _FORMATS[arr.dtype]
    data = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<")).tobytes()

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    extra = b""
    extra_base = 8 + len(data) + 2 + 12 * 10 + 4  # header+data+IFD size

    def _short_array(values: list[int]) -> tuple[int, int, int]:
        nonlocal extra
        if len(values) == 1:
            return 3, 1, values[0]
        if len(values) <= 2:
            packed = values + [0] * (2 - len(values))
            return 3, len(values), packed[0] | (packed[1] << 16)
        off = extra_base + len(extra)
        extra += struct.pack(f"<{len(values)}H", *values)
        return 3, len(values), off

    t, n, v = _short_array([bits] * c)
    entries.append((258, t, n, v))  # BitsPerSample
    t, n, v = _short_array([fmt] * c)
    sample_format = (339, t, n, v)
    entries = [
        (256, 4, 1, w),           # ImageWidth
        (257, 4, 1, h),           # ImageLength
        entries[0],               # BitsPerSample
        (259, 3, 1, 1),           # Compression = none
        (262, 3, 1, 1),           # Photometric = BlackIsZero
        (273, 4, 1, 8),           # StripOffsets: data starts right after header
        (277, 3, 1, c),           # SamplesPerPixel
        (278, 4, 1, h),           # RowsPerStrip = whole image
        (279, 4, 1, len(data)),   # StripByteCounts
        sample_format,            # SampleFormat
    ]
    entries.sort(key=lambda e: e[0])
    ifd_offset = 8 + len(data)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_offset))
        f.write(data)
        f.write(struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in entries:
            f.write(struct.pack("<HHII", tag, typ, cnt, val))
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(extra)


def _read_ifd_value(f, typ: int, cnt: int, raw: bytes) -> list[int]:
    code, size = _TIFF_TYPES[typ]
    total = size * cnt
    if total <= 4:
        return list(struct.unpack(f"<{cnt}{code}", raw[:total]))
    (off,) = struct.unpack("<I", raw)
    pos = f.tell()
    f.seek(off)
    out = list(struct.unpack(f"<{cnt}{code}", f.read(total)))
    f.seek(pos)
    return out


def read_tiff(path: str) -> np.ndarray:
    """Read an uncompressed little-endian baseline TIFF to (H, W, C).
    Uses rasterio when available (full format support); otherwise the
    built-in codec (uncompressed only)."""
    if _rasterio is not None:  # pragma: no cover - rasterio not in container
        with _rasterio.open(path) as src:
            return np.transpose(src.read(), (1, 2, 0))
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:4] != b"II*\x00":
            raise ValueError("built-in codec reads little-endian TIFF only")
        (ifd_off,) = struct.unpack("<I", head[4:])
        f.seek(ifd_off)
        (n_entries,) = struct.unpack("<H", f.read(2))
        tags: dict[int, list[int]] = {}
        for _ in range(n_entries):
            tag, typ, cnt = struct.unpack("<HHI", f.read(8))
            raw = f.read(4)
            if typ in _TIFF_TYPES:
                tags[tag] = _read_ifd_value(f, typ, cnt, raw)
        w, h = tags[256][0], tags[257][0]
        if tags.get(259, [1])[0] != 1:
            raise ValueError("built-in codec reads uncompressed TIFF only")
        c = tags.get(277, [1])[0]
        bits = tags[258][0]
        fmt = tags.get(339, [1])[0]
        dtype = _DTYPES[(bits, fmt)]
        chunks = []
        for off, cnt_b in zip(tags[273], tags[279]):
            f.seek(off)
            chunks.append(f.read(cnt_b))
        arr = np.frombuffer(b"".join(chunks), dtype=np.dtype(dtype).newbyteorder("<"))
        return arr.reshape(h, w, c)


# --- Spark adapters -------------------------------------------------------


def tiff_to_tile_table(
    spark: SparkSession, path: str, band_names: list[str] | None = None
) -> DataFrame:
    """.tif → long-format pixel table (x int, y int, <band> double ...)
    — the first artifact a reference user holds, landed in the engine's
    native shape (feed to ``assign_tiles``/``halo_duplicate`` next).

    With rasterio the read is window-distributed: the driver only
    enumerates block windows; each executor task opens the file and
    reads its own window. The built-in codec path reads driver-side
    (contract/test path)."""
    if _rasterio is not None:  # pragma: no cover - rasterio not in container
        with _rasterio.open(path) as src:
            n_bands = src.count
            names = band_names or [f"b{i+1}" for i in range(n_bands)]
            windows = [w for _, w in src.block_windows(1)]
        specs = spark.createDataFrame(
            [
                (w.col_off, w.row_off, w.width, w.height)
                for w in windows
            ],
            "col_off int, row_off int, width int, height int",
        )
        schema = "x int, y int, " + ", ".join(f"{n} double" for n in names)

        def read_window(batches):
            import rasterio as rio
            from rasterio.windows import Window

            with rio.open(path) as s:
                for pdf in batches:
                    for co, ro, ww, hh in zip(
                        pdf["col_off"], pdf["row_off"], pdf["width"], pdf["height"]
                    ):
                        block = s.read(window=Window(co, ro, ww, hh))
                        ys, xs = np.meshgrid(
                            np.arange(ro, ro + hh), np.arange(co, co + ww), indexing="ij"
                        )
                        data = {"x": xs.ravel(), "y": ys.ravel()}
                        for i, n in enumerate(names):
                            data[n] = block[i].astype(np.float64).ravel()
                        yield pd.DataFrame(data)

        return specs.repartition(max(1, len(windows) // 4)).mapInPandas(
            read_window, schema=schema
        )

    arr = read_tiff(path).astype(np.float64)
    h, w, c = arr.shape
    names = band_names or [f"b{i+1}" for i in range(c)]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pdf = pd.DataFrame({"x": xs.ravel().astype(np.int32), "y": ys.ravel().astype(np.int32)})
    for i, n in enumerate(names):
        pdf[n] = arr[:, :, i].ravel()
    return spark.createDataFrame(pdf)


def tile_table_to_tiff(
    df: DataFrame, path: str, value_cols: list[str], fill: float = np.nan
) -> None:
    """Long-format pixel table → single float64 .tif (bands =
    value_cols). Mirrors the reference's whole-scene GeoTIFF writes
    (`2_segmentation/image_segmentation.py:153-162`): a DRIVER-side
    sink for single scenes — at 100 TB use the tiled parquet raster
    sinks (S7/S9) and export per tile."""
    pdf = df.select("x", "y", *value_cols).toPandas()
    if pdf.empty:
        raise ValueError("empty tile table")
    x0, y0 = int(pdf["x"].min()), int(pdf["y"].min())
    w = int(pdf["x"].max()) - x0 + 1
    h = int(pdf["y"].max()) - y0 + 1
    arr = np.full((h, w, len(value_cols)), fill, dtype=np.float64)
    xi = pdf["x"].to_numpy() - x0
    yi = pdf["y"].to_numpy() - y0
    for i, cname in enumerate(value_cols):
        arr[yi, xi, i] = pdf[cname].to_numpy(dtype=np.float64)
    if _rasterio is not None:  # pragma: no cover - rasterio not in container
        with _rasterio.open(
            path,
            "w",
            driver="GTiff",
            width=w,
            height=h,
            count=len(value_cols),
            dtype="float64",
        ) as dst:
            dst.write(np.transpose(arr, (2, 0, 1)))
        return
    write_tiff(path, arr)
