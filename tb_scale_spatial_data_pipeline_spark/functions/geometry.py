"""Geometry scalars over WKT columns (north-star "spatial UDFs over
Parquet/GeoParquet"; SURVEY §2.6 R7's geometry feature surface).

Two tiers:

- **Catalyst tier** (`*_expr` functions): closed-form expressions for
  axis-aligned-rectangle WKT (the engine's polygonization output,
  `raster/segmentation.py`) — regexp-extract the corners, compute
  area/perimeter/centroid/containment in pure JVM expressions. These
  are the hot-path forms: a spatial filter or bbox join over 100 TB
  never leaves codegen.
- **pandas-UDF tier** (`wkt_polygon_area`): general simple-polygon
  area via the shoelace formula, Arrow-vectorized, registered for SQL
  use via ``register_geometry_udfs`` — the engine's §2.7 user-facing
  UDF surface (the reference has none; this is the Spark-native
  equivalent).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_NUM = r"(-?\d+(?:\.\d+)?)"
# corner capture for "POLYGON((x0 y0, x1 y0, x1 y1, x0 y1, x0 y0))"
_RECT_RE = f"POLYGON\\(\\({_NUM} {_NUM}, {_NUM} {_NUM}, {_NUM} {_NUM}"


def rect_x0(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _RECT_RE, 1).cast("double")


def rect_y0(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _RECT_RE, 2).cast("double")


def rect_x1(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _RECT_RE, 3).cast("double")


def rect_y1(wkt: Column) -> Column:
    return F.regexp_extract(wkt, _RECT_RE, 6).cast("double")


def rect_area_expr(wkt: Column) -> Column:
    return (rect_x1(wkt) - rect_x0(wkt)) * (rect_y1(wkt) - rect_y0(wkt))


def rect_perimeter_expr(wkt: Column) -> Column:
    return 2.0 * ((rect_x1(wkt) - rect_x0(wkt)) + (rect_y1(wkt) - rect_y0(wkt)))


def rect_centroid_x_expr(wkt: Column) -> Column:
    return (rect_x0(wkt) + rect_x1(wkt)) / 2.0


def rect_centroid_y_expr(wkt: Column) -> Column:
    return (rect_y0(wkt) + rect_y1(wkt)) / 2.0


def rect_contains_point_expr(wkt: Column, px: Column, py: Column) -> Column:
    """ST_Contains for the rectangle tier (half-open [x0,x1) × [y0,y1))."""
    return (
        (px >= rect_x0(wkt))
        & (px < rect_x1(wkt))
        & (py >= rect_y0(wkt))
        & (py < rect_y1(wkt))
    )


def _shoelace_area_series(wkt: pd.Series) -> pd.Series:
    """General simple-polygon area (shoelace) over a WKT series.
    Handles any single-ring POLYGON WKT, not just rectangles."""
    pat = re.compile(r"POLYGON\s*\(\(([^)]*)\)\)")

    def area_of(s: str) -> float:
        m = pat.search(s or "")
        if not m:
            return float("nan")
        pts = np.array(
            [[float(t) for t in p.strip().split()[:2]] for p in m.group(1).split(",")]
        )
        x, y = pts[:, 0], pts[:, 1]
        return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)

    return wkt.map(area_of)


def wkt_polygon_area(wkt: Column) -> Column:
    """Arrow-vectorized pandas UDF form (created lazily — pandas_udf
    needs an active session, so it can't be a module-level decorator)."""
    return pandas_udf(_shoelace_area_series, "double")(wkt)


def register_geometry_udfs(spark: SparkSession) -> None:
    """§2.7 user-facing UDF registration surface: geometry functions
    become callable from SQL (`SELECT wkt_polygon_area(geometry) …`)."""
    spark.udf.register(
        "wkt_polygon_area", pandas_udf(_shoelace_area_series, "double")
    )


def _parse_ring(s: str) -> np.ndarray | None:
    m = re.search(r"POLYGON\s*\(\(([^)]*)\)\)", s or "")
    if not m:
        return None
    return np.array(
        [[float(t) for t in p.strip().split()[:2]] for p in m.group(1).split(",")]
    )


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (public classic)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def polygon_shape_features(wkt: pd.Series) -> pd.DataFrame:
    """R7 geometry-side shape features from the polygon ring itself
    (the reference computes these with shapely over vector features,
    `3_object_classification/object_classifier.py:58-68`):
    area (shoelace), perimeter (ring length), min-rotated-rect
    rectangularity & elongation (rotating calipers over the convex
    hull), compactness 4πA/P², shape_index P/(4√A), num_vertices,
    vertex_density vertices/perimeter."""
    rows = []
    for s in wkt:
        ring = _parse_ring(s)
        if ring is None or len(ring) < 4:
            rows.append((np.nan,) * 8)
            continue
        x, y = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = np.roll(x, -1), np.roll(y, -1)
        area = abs(float(np.dot(x, y1) - np.dot(y, x1))) / 2.0
        per = float(np.sqrt((x1 - x) ** 2 + (y1 - y) ** 2).sum())
        hull = _convex_hull(ring[:-1])
        best = np.inf
        best_dims = (0.0, 0.0)
        for i in range(len(hull)):
            e = hull[(i + 1) % len(hull)] - hull[i]
            n = np.linalg.norm(e)
            if n == 0:
                continue
            u = e / n
            v = np.array([-u[1], u[0]])
            pu = hull @ u
            pv = hull @ v
            w_ = pu.max() - pu.min()
            h_ = pv.max() - pv.min()
            if w_ * h_ < best:
                best = w_ * h_
                best_dims = (w_, h_)
        rect_area = best if np.isfinite(best) and best > 0 else 0.0
        rectangularity = area / rect_area if rect_area else 0.0
        long_side = max(best_dims) or 1.0
        short_side = min(best_dims) or 1.0
        elongation = long_side / short_side
        compactness = 4.0 * np.pi * area / (per * per) if per else 0.0
        shape_index = per / (4.0 * np.sqrt(area)) if area else 0.0
        n_vertices = len(ring) - 1
        vertex_density = n_vertices / per if per else 0.0
        rows.append(
            (area, per, rectangularity, elongation, compactness, shape_index, n_vertices, vertex_density)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "geo_area",
            "geo_perimeter",
            "geo_rectangularity",
            "geo_elongation",
            "geo_compactness",
            "geo_shape_index",
            "geo_num_vertices",
            "geo_vertex_density",
        ],
    )


def with_polygon_shape_features(df, geometry_col: str = "geometry"):
    """Append the 8 geometry-side shape features via mapInPandas
    (Arrow-batched; ring parsing + calipers stay in the kernel)."""
    from typing import Iterator

    out_fields = (
        "geo_area double, geo_perimeter double, geo_rectangularity double, "
        "geo_elongation double, geo_compactness double, geo_shape_index double, "
        "geo_num_vertices double, geo_vertex_density double"
    )
    schema = df.schema.simpleString()[7:-1].replace(":", " ") + ", " + out_fields

    def kernel(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            feats = polygon_shape_features(pdf[geometry_col])
            yield pd.concat([pdf.reset_index(drop=True), feats], axis=1)

    return df.mapInPandas(kernel, schema=schema)
