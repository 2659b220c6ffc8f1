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
