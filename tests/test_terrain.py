"""Terrain kernel invariants (raster/kernels.terrain_tiles):
closed-form ground truths on analytic surfaces, plus the tiled-buffer
contract — results must not depend on tile size when halo >= stencil
radius (the same invariance the reference's 256 px buffer exists to
provide, `2_segmentation/image_segmentation.py:33-34`).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.raster.kernels import terrain_tiles
from tb_scale_spatial_data_pipeline_spark.raster.tiles import halo_duplicate


def _plane(spark, w=32, h=32, gx=0.0, gy=0.0, base=100.0):
    px = spark.range(w * h).select(
        (F.col("id") % w).cast("int").alias("x"),
        (F.col("id") / w).cast("int").alias("y"),
    )
    return px.withColumn(
        "b1",
        F.lit(base)
        + F.col("x").cast("double") * gx
        + F.col("y").cast("double") * gy,
    )


def test_flat_plane_zero_slope_flat_aspect(spark):
    img = _plane(spark, gx=0.0, gy=0.0)
    out = terrain_tiles(halo_duplicate(img, 16, 2), "b1").collect()
    for r in out:
        assert abs(r["slope_deg"]) < 1e-9
        assert r["aspect_deg"] == -1.0
        # flat hillshade = 255*cos(zenith) at default 45° altitude
        assert abs(r["hillshade"] - 255.0 * math.cos(math.radians(45))) < 1e-6


def test_inclined_plane_known_slope_and_aspect(spark):
    img = _plane(spark, gx=0.1, gy=0.0)
    out = terrain_tiles(halo_duplicate(img, 16, 2), "b1")
    interior = out.where(
        (F.col("x") >= 2) & (F.col("x") <= 29) & (F.col("y") >= 2) & (F.col("y") <= 29)
    ).collect()
    want = math.degrees(math.atan(0.1))
    for r in interior:
        assert abs(r["slope_deg"] - want) < 1e-9, r
        assert abs(r["aspect_deg"] - 270.0) < 1e-9, r  # downslope = west


def test_tile_size_invariance(spark):
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import synthetic_raster

    img = synthetic_raster(spark, 48, 48, bands=1)

    def run(tile, halo):
        out = terrain_tiles(halo_duplicate(img, tile, halo), "b1")
        return {
            (r["x"], r["y"]): (
                round(r["slope_deg"], 9),
                round(r["aspect_deg"], 9),
                round(r["hillshade"], 9),
            )
            for r in out.collect()
        }

    a = run(16, 2)
    b = run(24, 2)
    # interior pixels (away from IMAGE edges, where pad-replication
    # differs per tiling only if halo clips at the boundary)
    keys = [k for k in a if 2 <= k[0] <= 45 and 2 <= k[1] <= 45]
    assert keys and all(a[k] == b[k] for k in keys)
