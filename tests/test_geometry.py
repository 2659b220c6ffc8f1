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
