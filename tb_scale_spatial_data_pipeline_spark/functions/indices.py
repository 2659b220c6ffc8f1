"""Spectral-index column expressions (SURVEY §2.2 P2–P4, P8).

The reference computes these as whole-array NumPy expressions
(`0_preprocessing/feature_stacking.py:124` NDVI, `:275` NDWI;
`2_segmentation/image_segmentation.py:68-70` NDVI/NDWI/NDRE;
`:43-51` percentile contrast stretch). Here they are pure Catalyst
column expressions — JVM-side, whole-stage-codegen'd, no Python in the
hot path. The numeric-stability epsilons (+1e-9 / +1e-5) are carried
verbatim from the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ndvi(nir: Column, red: Column) -> Column:
    """(nir - red) / (nir + red + 1e-9)."""
    return (nir - red) / (nir + red + F.lit(1e-9))


def ndwi(green: Column, nir: Column) -> Column:
    """(green - nir) / (green + nir + 1e-9)."""
    return (green - nir) / (green + nir + F.lit(1e-9))


def ndre(nir: Column, red_edge: Column) -> Column:
    """(nir - red_edge) / (nir + red_edge + 1e-5)."""
    return (nir - red_edge) / (nir + red_edge + F.lit(1e-5))


def contrast_stretch(x: Column, p_low: Column, p_high: Column) -> Column:
    """Percentile stretch to 0..255 with a zero-range guard.

    clip((x - p2) / (p98 - p2), 0, 1) * 255, guarding p98 == p2
    (`2_segmentation/image_segmentation.py:43-51`). The percentiles
    come from a grouped/windowed percentile aggregate (A3/W1).
    """
    rng = p_high - p_low
    scaled = F.when(rng == 0, F.lit(0.0)).otherwise((x - p_low) / rng)
    return F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0)) * 255.0
