"""Geometry tier tests: Catalyst rectangle expressions vs the general
shoelace pandas UDF (must agree on rectangles), SQL registration
surface, and non-rectangular shoelace ground truth."""

from __future__ import annotations

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
    rect_area_expr,
    register_geometry_udfs,
    wkt_polygon_area,
)


def test_rect_expr_matches_shoelace_udf(spark):
    df = spark.createDataFrame(
        [
            (1, "POLYGON((0 0, 4 0, 4 6, 0 6, 0 0))"),
            (2, "POLYGON((2 3, 7 3, 7 5, 2 5, 2 3))"),
        ],
        "id int, geometry string",
    )
    out = df.select(
        rect_area_expr(F.col("geometry")).alias("expr_area"),
        wkt_polygon_area(F.col("geometry")).alias("udf_area"),
    ).collect()
    for r in out:
        assert r["expr_area"] == r["udf_area"]


def test_shoelace_triangle(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON((0 0, 4 0, 0 3, 0 0))")], "id int, geometry string"
    )
    assert df.select(wkt_polygon_area(F.col("geometry")).alias("a")).first()["a"] == 6.0


def test_sql_registration(spark):
    register_geometry_udfs(spark)
    spark.createDataFrame(
        [("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))",)], "geometry string"
    ).createOrReplaceTempView("geoms")
    r = spark.sql("SELECT wkt_polygon_area(geometry) AS a FROM geoms").first()
    assert r["a"] == 4.0


def test_polygon_shape_features_rectangle():
    import pandas as pd

    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        polygon_shape_features,
    )

    out = polygon_shape_features(
        pd.Series(["POLYGON((0 0, 4 0, 4 6, 0 6, 0 0))"])
    ).iloc[0]
    assert out["geo_area"] == 24.0
    assert out["geo_perimeter"] == 20.0
    assert abs(out["geo_rectangularity"] - 1.0) < 1e-9
    assert abs(out["geo_elongation"] - 1.5) < 1e-9
    assert out["geo_num_vertices"] == 4


def test_polygon_shape_features_rotated_square():
    import pandas as pd

    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        polygon_shape_features,
    )

    # diamond = square rotated 45°: min rotated rect is the square itself
    out = polygon_shape_features(
        pd.Series(["POLYGON((2 0, 4 2, 2 4, 0 2, 2 0))"])
    ).iloc[0]
    assert abs(out["geo_rectangularity"] - 1.0) < 1e-9
    assert abs(out["geo_elongation"] - 1.0) < 1e-9


def test_with_polygon_shape_features_spark(spark):
    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        with_polygon_shape_features,
    )

    df = spark.createDataFrame(
        [(1, "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"), (2, "POLYGON((0 0, 4 0, 0 3, 0 0))")],
        "seg_id int, geometry string",
    )
    out = {r["seg_id"]: r for r in with_polygon_shape_features(df).collect()}
    assert out[1]["geo_area"] == 4.0
    assert out[2]["geo_area"] == 6.0
    assert out[2]["geo_num_vertices"] == 3


# ---------------------------------------------------------------------------
# Polygon overlay (Sutherland-Hodgman) kernel properties


def _wkt(ring):
    pts = list(ring) + [ring[0]]
    return "POLYGON((" + ", ".join(f"{x:g} {y:g}" for x, y in pts) + "))"


def test_overlay_known_cases():
    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _overlay_metrics,
    )

    sq = "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"
    off = "POLYGON((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    inter, union, iou = _overlay_metrics(sq, off)
    assert (inter, union) == (0.25, 1.75)
    assert abs(iou - 1.0 / 7.0) < 1e-12
    # triangle clipped by containing square: area preserved
    tri = "POLYGON((0 0, 1 0, 0 1, 0 0))"
    inter, union, iou = _overlay_metrics(tri, sq)
    assert (inter, union, iou) == (0.5, 1.0, 0.5)
    # non-convex L-shaped subject, convex clip
    ell = "POLYGON((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    half = "POLYGON((0 0, 1 0, 1 2, 0 2, 0 0))"
    inter, union, iou = _overlay_metrics(ell, half)
    assert (inter, union) == (2.0, 3.0)
    # disjoint
    far = "POLYGON((9 9, 10 9, 10 10, 9 10, 9 9))"
    assert _overlay_metrics(sq, far)[0] == 0.0
    assert _overlay_metrics(sq, far)[2] == 0.0


def test_overlay_properties_random_convex():
    """IoU in [0,1]; symmetric for convex-convex; self-IoU == 1;
    intersection bounded by both areas (random convex polygons via
    hulls of random point clouds)."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _convex_hull,
        _overlay_metrics,
        _ring_signed_area,
    )

    rng = np.random.default_rng(7)
    for trial in range(25):
        a = _convex_hull(rng.integers(0, 12, size=(10, 2)).astype(float))
        b = _convex_hull(rng.integers(0, 12, size=(10, 2)).astype(float))
        if len(a) < 3 or len(b) < 3:
            continue
        wa, wb = _wkt(a), _wkt(b)
        ia, ua, iou = _overlay_metrics(wa, wb)
        ib, ub, iou_r = _overlay_metrics(wb, wa)
        assert abs(ia - ib) < 1e-9 and abs(iou - iou_r) < 1e-9  # symmetric
        assert -1e-12 <= iou <= 1.0 + 1e-12
        area_a = abs(_ring_signed_area(a))
        area_b = abs(_ring_signed_area(b))
        assert ia <= min(area_a, area_b) + 1e-9
        assert abs(ua - (area_a + area_b - ia)) < 1e-9
        self_i, self_u, self_iou = _overlay_metrics(wa, wa)
        assert abs(self_iou - 1.0) < 1e-12


def test_overlay_orientation_invariance():
    """CW vs CCW ring order must not change areas."""
    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _overlay_metrics,
    )

    ccw = "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"
    cw = "POLYGON((0 0, 0 2, 2 2, 2 0, 0 0))"
    probe = "POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))"
    assert _overlay_metrics(ccw, probe) == _overlay_metrics(cw, probe)
    assert _overlay_metrics(probe, ccw) == _overlay_metrics(probe, cw)


def test_overlay_degenerate_inputs():
    import math

    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _overlay_metrics,
    )

    sq = "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert all(math.isnan(v) for v in _overlay_metrics("not wkt", sq))
    assert all(math.isnan(v) for v in _overlay_metrics(sq, ""))


def test_intersection_wkt_roundtrip():
    """ST_Intersection WKT output re-parses and its shoelace area
    equals the metric kernel's intersection area."""
    import numpy as np
    import pandas as pd

    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _convex_hull,
        _overlay_metrics,
        _shoelace_area_series,
        polygon_intersection_wkt,
    )

    rng = np.random.default_rng(11)
    for trial in range(10):
        a = _convex_hull(rng.integers(0, 10, size=(8, 2)).astype(float))
        b = _convex_hull(rng.integers(0, 10, size=(8, 2)).astype(float))
        if len(a) < 3 or len(b) < 3:
            continue
        wa, wb = _wkt(a), _wkt(b)
        out = polygon_intersection_wkt(pd.Series([wa]), pd.Series([wb]))[0]
        inter = _overlay_metrics(wa, wb)[0]
        if out == "POLYGON EMPTY":
            assert inter == 0.0
        else:
            got = _shoelace_area_series(pd.Series([out]))[0]
            assert abs(got - inter) < 1e-9
    disjoint = polygon_intersection_wkt(
        pd.Series(["POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"]),
        pd.Series(["POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))"]),
    )[0]
    assert disjoint == "POLYGON EMPTY"
