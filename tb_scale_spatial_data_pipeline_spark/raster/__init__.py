from .tiles import synthetic_raster, assign_tiles, halo_duplicate
from .kernels import gaussian_smooth_tiles, pca_texture_tiles, reproject_tiles
from .segmentation import segment_tiles, segment_shape_metrics

__all__ = [
    "synthetic_raster",
    "assign_tiles",
    "halo_duplicate",
    "gaussian_smooth_tiles",
    "pca_texture_tiles",
    "reproject_tiles",
    "segment_tiles",
    "segment_shape_metrics",
]
