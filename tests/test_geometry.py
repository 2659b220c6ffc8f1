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
