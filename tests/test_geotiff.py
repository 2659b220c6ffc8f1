"""GeoTIFF adapter contract (sources/geotiff.py): the built-in
baseline-TIFF codec pins the .tif <-> tile-table round trip in this
rasterio-less container; the rasterio branch reuses the same call
sites and is exercised wherever rasterio is importable."""

from __future__ import annotations

import numpy as np
import pytest

from tb_scale_spatial_data_pipeline_spark.sources.geotiff import (
    read_tiff,
    tiff_to_tile_table,
    tile_table_to_tiff,
    write_tiff,
)


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.uint16, np.int16, np.float32, np.float64]
)
def test_tiff_codec_roundtrip_dtypes(tmp_path, dtype):
    rng = np.arange(7 * 5 * 3).reshape(7, 5, 3)
    arr = (rng % 200).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_tiff(p, arr)
    back = read_tiff(p)
    assert back.shape == (7, 5, 3)
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, arr)


def test_tiff_codec_single_band_2d(tmp_path):
    arr = np.linspace(0, 1, 12, dtype=np.float32).reshape(4, 3)
    p = str(tmp_path / "s.tif")
    write_tiff(p, arr)
    back = read_tiff(p)
    assert back.shape == (4, 3, 1)
    assert np.array_equal(back[:, :, 0], arr)


def test_tiff_tile_table_roundtrip(spark, tmp_path):
    """synthetic raster -> .tif -> tile table reproduces every pixel."""
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import synthetic_raster

    img = synthetic_raster(spark, 16, 12, bands=2)
    p = str(tmp_path / "scene.tif")
    tile_table_to_tiff(img, p, ["b1", "b2"])
    back = tiff_to_tile_table(spark, p, band_names=["b1", "b2"])
    src = {(r["x"], r["y"]): (r["b1"], r["b2"]) for r in img.collect()}
    dst = {(r["x"], r["y"]): (r["b1"], r["b2"]) for r in back.collect()}
    assert dst == src


def test_tiff_adapter_feeds_kernels(spark, tmp_path):
    """The adapter output is directly consumable by the tile/halo
    kernel layer — .tif in, smoothed raster out."""
    from tb_scale_spatial_data_pipeline_spark.raster.kernels import (
        gaussian_smooth_tiles,
    )
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import (
        halo_duplicate,
        synthetic_raster,
    )

    img = synthetic_raster(spark, 16, 16, bands=1)
    p = str(tmp_path / "k.tif")
    tile_table_to_tiff(img, p, ["b1"])
    table = tiff_to_tile_table(spark, p, band_names=["b1"])
    out = gaussian_smooth_tiles(halo_duplicate(table, 8, 2), ["b1"], sigma=0.5)
    assert out.count() == 16 * 16


def test_rasterio_branch(tmp_path):
    """Exercised only where rasterio is installed."""
    rio = pytest.importorskip("rasterio")
    arr = np.ones((4, 4, 1), dtype=np.float64)
    p = str(tmp_path / "r.tif")
    write_tiff(p, arr)
    with rio.open(p) as src:
        assert src.count == 1
        assert np.array_equal(src.read(1), arr[:, :, 0])


def test_segments_to_geojson_roundtrip(spark, tmp_path):
    """Segment metrics -> GeoJSON FeatureCollection: every polygon
    parses, closes its ring, and carries its properties."""
    import json

    from tb_scale_spatial_data_pipeline_spark.raster.segmentation import (
        segment_shape_metrics,
        segment_tiles,
    )
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import (
        halo_duplicate,
        synthetic_raster,
    )
    from tb_scale_spatial_data_pipeline_spark.sources.vector_io import (
        segments_to_geojson,
    )

    img = synthetic_raster(spark, 32, 32, bands=2)
    metrics = segment_shape_metrics(
        segment_tiles(halo_duplicate(img, 32, 0), ["b1", "b2"])
    ).select("seg_id", "geometry", "area", "perimeter")
    p = str(tmp_path / "segs.geojson")
    n = segments_to_geojson(metrics, p)
    doc = json.load(open(p))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == n == metrics.count() > 0
    areas = {r["seg_id"]: r["area"] for r in metrics.collect()}
    for feat in doc["features"]:
        ring = feat["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1] and len(ring) >= 4
        assert feat["properties"]["area"] == areas[feat["id"]]


def test_segments_to_vector_file_requires_fiona(spark):
    """Without fiona the GPKG writer must fail loudly with guidance
    (or, where fiona exists, write a real file — covered there)."""
    import pytest

    from tb_scale_spatial_data_pipeline_spark.sources import vector_io

    if vector_io._fiona is not None:
        pytest.skip("fiona installed; failure path not reachable")
    df = spark.createDataFrame(
        [(1, "POLYGON((0 0, 1 0, 1 1, 0 0))", 5)], "seg_id long, geometry string, area long"
    )
    with pytest.raises(ImportError, match="segments_to_geojson"):
        vector_io.segments_to_vector_file(df, "/tmp/x.gpkg")


def test_tiff_reader_handles_multi_strip(tmp_path):
    """rasterio/GDAL write striped TIFFs; the built-in reader must
    reassemble multiple strips, not just the single-strip layout the
    built-in writer emits. Hand-pack a 2-strip file to pin that."""
    import struct

    arr = np.arange(6 * 4, dtype=np.uint8).reshape(6, 4, 1)
    rows_per_strip = 3
    strips = [arr[0:3].tobytes(), arr[3:6].tobytes()]
    data = b"".join(strips)
    off0 = 8
    off1 = off0 + len(strips[0])
    ifd_offset = 8 + len(data)
    entries = [
        (256, 4, 1, 4),                 # width
        (257, 4, 1, 6),                 # height
        (258, 3, 1, 8),                 # bits per sample
        (259, 3, 1, 1),                 # uncompressed
        (262, 3, 1, 1),                 # photometric
        (277, 3, 1, 1),                 # samples per pixel
        (278, 4, 1, rows_per_strip),    # rows per strip
        (339, 3, 1, 1),                 # sample format: unsigned
    ]
    # strip offsets/counts arrays live after the IFD
    n_entries = len(entries) + 2
    extra_base = ifd_offset + 2 + 12 * n_entries + 4
    entries.append((273, 4, 2, extra_base))       # strip offsets ptr
    entries.append((279, 4, 2, extra_base + 8))   # strip byte counts ptr
    entries.sort()
    p = str(tmp_path / "striped.tif")
    with open(p, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_offset))
        f.write(data)
        f.write(struct.pack("<H", n_entries))
        for tag, typ, cnt, val in entries:
            f.write(struct.pack("<HHII", tag, typ, cnt, val))
        f.write(struct.pack("<I", 0))
        f.write(struct.pack("<II", off0, off1))
        f.write(struct.pack("<II", len(strips[0]), len(strips[1])))

    from tb_scale_spatial_data_pipeline_spark.sources.geotiff import read_tiff

    back = read_tiff(p)
    assert back.shape == (6, 4, 1)
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("bigtiff", [False, True])
def test_tiff_lzw_tiled_roundtrip(tmp_path, bigtiff):
    """The reference sink profile (`feature_stacking.py:226-235`):
    LZW compression + internal tiling (+ BigTIFF) must round-trip a
    multi-band image bit-exactly, including non-tile-multiple edges."""
    rng = np.arange(70 * 45 * 3, dtype=np.int64)
    arr = ((rng * 2654435761) % 251).astype(np.float32).reshape(70, 45, 3)
    p = str(tmp_path / ("big.tif" if bigtiff else "t.tif"))
    write_tiff(p, arr, compression="lzw", tile=(32, 16), bigtiff=bigtiff)
    back = read_tiff(p)
    assert back.shape == (70, 45, 3)
    assert back.dtype == np.float32
    assert np.array_equal(back, arr)


def test_tiff_lzw_compresses_repetitive_data(tmp_path):
    """LZW must actually compress: a constant image's file must be far
    smaller than its uncompressed twin (guards against a pack function
    that silently passes bytes through)."""
    import os

    arr = np.full((64, 64, 2), 7, dtype=np.uint16)
    raw, lzw = str(tmp_path / "raw.tif"), str(tmp_path / "lzw.tif")
    write_tiff(raw, arr)
    write_tiff(lzw, arr, compression="lzw")
    assert np.array_equal(read_tiff(lzw), arr)
    assert os.path.getsize(lzw) < os.path.getsize(raw) / 4


def test_tile_table_to_tiff_guard_rejects_oversize(spark, tmp_path):
    """The documented single-scene contract is enforced: a table above
    max_rows raises with a pointer to the distributed sinks instead of
    collecting toward driver OOM."""
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import synthetic_raster

    img = synthetic_raster(spark, 16, 12, bands=1)
    with pytest.raises(ValueError, match="S7/S9"):
        tile_table_to_tiff(img, str(tmp_path / "x.tif"), ["b1"], max_rows=10)
    # at or under the cap the export still works
    tile_table_to_tiff(img, str(tmp_path / "ok.tif"), ["b1"], max_rows=16 * 12)
    assert read_tiff(str(tmp_path / "ok.tif")).shape == (12, 16, 1)


def test_tile_table_to_tiff_reference_sink_profile(spark, tmp_path):
    """tile_table_to_tiff with the reference's LZW+tiled+BigTIFF kwargs
    round-trips through tiff_to_tile_table."""
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import synthetic_raster

    img = synthetic_raster(spark, 40, 24, bands=2)
    p = str(tmp_path / "scene_lzw.tif")
    tile_table_to_tiff(
        img, p, ["b1", "b2"], compression="lzw", tile=(32, 16), bigtiff=True
    )
    back = tiff_to_tile_table(spark, p, band_names=["b1", "b2"])
    src = {(r["x"], r["y"]): (r["b1"], r["b2"]) for r in img.collect()}
    dst = {(r["x"], r["y"]): (r["b1"], r["b2"]) for r in back.collect()}
    assert dst == src


def test_lzw_eoi_width_boundary_regression():
    """Regression: a 256-byte high-entropy payload lands the final data
    code exactly on the 9→10-bit early-change boundary — the decoder
    widens after its final table append, so the encoder must bump its
    phantom next_code before emitting EOI or EOI is read at the wrong
    width (found by hypothesis, round 5)."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.sources.geotiff import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(0)
    payload = np.ascontiguousarray(
        rng.standard_normal((2, 16, 2)).astype(np.float32)
    ).tobytes()
    assert _lzw_decode(_lzw_encode(payload)) == payload
