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


# ---------------------------------------------------------------------------
# General polygon overlay (ST_Intersection / ST_Union areas, IoU).
#
# The reference stops at per-polygon shape metrics
# (3_object_classification/object_classifier.py:43); overlay is the
# north-star GeoParquet extension a GIS user reaches for next. Kernel:
# Sutherland & Hodgman 1974 ("Reentrant polygon clipping", CACM 17.1)
# — clips an arbitrary simple subject polygon against a CONVEX clip
# polygon, the classic textbook algorithm. Pure NumPy/stdlib, no
# shapely. Exactness note: for axis-aligned inputs on an integer
# lattice every intersection coordinate is itself an exact lattice
# value (clip edges are parallel or perpendicular to subject edges),
# so shoelace areas — and therefore IoU — are float-exact and
# oracle-checkable against a closed form.


def _close_ring(ring: np.ndarray) -> np.ndarray:
    """Drop a repeated closing vertex if present (open-ring form)."""
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        return ring[:-1]
    return ring


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0


def _sutherland_hodgman(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip simple polygon `subject` by CONVEX polygon `clip`; both
    open rings, any orientation. Returns the clipped open ring
    (possibly with 0 vertices)."""
    subject = _close_ring(np.asarray(subject, dtype=np.float64))
    clip = _close_ring(np.asarray(clip, dtype=np.float64))
    if _ring_signed_area(clip) < 0:  # normalize clip to CCW
        clip = clip[::-1]
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        prev_in = ex * (prev[1] - a[1]) - ey * (prev[0] - a[0]) >= 0.0
        for cur in inp:
            cur_in = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0]) >= 0.0
            if cur_in != prev_in:
                # segment prev->cur crosses the clip line; parametric t
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0.0:
                    tpar = (ex * (a[1] - prev[1]) - ey * (a[0] - prev[0])) / denom
                    out.append(
                        np.array([prev[0] + tpar * dx, prev[1] + tpar * dy])
                    )
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
    return np.array(out) if out else np.empty((0, 2))


def _overlay_metrics(
    wkt_a: str, wkt_b: str, _cache: "dict | None" = None
) -> tuple[float, float, float]:
    """(intersection_area, union_area, iou) for two single-ring WKT
    polygons. Clip side (b) must be convex — Sutherland-Hodgman's
    contract; subject (a) may be any simple polygon. Degenerate /
    unparseable input -> NaNs. ``_cache`` memoizes ring parses within
    one Arrow batch — overlay joins repeat the small side's WKT per
    pair (12 zones x thousands of rects), so parsing it once per
    batch, not once per row, is a pure win with identical results."""
    if _cache is None:
        a = _parse_ring(wkt_a)
        b = _parse_ring(wkt_b)
    else:
        if wkt_a not in _cache:
            _cache[wkt_a] = _parse_ring(wkt_a)
        if wkt_b not in _cache:
            _cache[wkt_b] = _parse_ring(wkt_b)
        a, b = _cache[wkt_a], _cache[wkt_b]
    if a is None or b is None or len(a) < 3 or len(b) < 3:
        return (float("nan"),) * 3
    area_a = abs(_ring_signed_area(_close_ring(a)))
    area_b = abs(_ring_signed_area(_close_ring(b)))
    clipped = _sutherland_hodgman(a, b)
    inter = abs(_ring_signed_area(clipped)) if len(clipped) >= 3 else 0.0
    union = area_a + area_b - inter
    iou = inter / union if union > 0 else float("nan")
    return inter, union, iou


def _overlay_frame(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.DataFrame:
    cache: dict = {}
    rows = [
        _overlay_metrics(sa, sb, _cache=cache) for sa, sb in zip(wkt_a, wkt_b)
    ]
    return pd.DataFrame(rows, columns=["inter_area", "union_area", "iou"])


_OVERLAY_SCHEMA = "inter_area double, union_area double, iou double"


def polygon_overlay_cols(wkt_a: Column, wkt_b: Column) -> Column:
    """Struct column (inter_area, union_area, iou) via an
    Arrow-vectorized pandas UDF over two WKT columns."""
    return pandas_udf(_overlay_frame, _OVERLAY_SCHEMA)(wkt_a, wkt_b)


def polygon_intersection_wkt(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """ST_Intersection geometry output: WKT of the clipped ring
    (closed, CCW as produced), 'POLYGON EMPTY' when disjoint, None on
    parse failure. Series-to-series form usable directly as a
    pandas_udf body."""

    def one(sa: str, sb: str) -> str | None:
        a = _parse_ring(sa)
        b = _parse_ring(sb)
        if a is None or b is None or len(a) < 3 or len(b) < 3:
            return None
        ring = _sutherland_hodgman(a, b)
        if len(ring) < 3 or abs(_ring_signed_area(ring)) == 0.0:
            return "POLYGON EMPTY"
        def num(v: float) -> str:
            # shortest round-trip-exact form (repr), integer-simplified
            return str(int(v)) if v == int(v) else repr(float(v))

        pts = [
            f"{num(x)} {num(y)}"
            for x, y in list(map(tuple, ring)) + [tuple(ring[0])]
        ]
        return "POLYGON((" + ", ".join(pts) + "))"

    return pd.Series([one(sa, sb) for sa, sb in zip(wkt_a, wkt_b)])
