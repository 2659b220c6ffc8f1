"""Raster-shaped composite queries (SURVEY §2.3 A1/A2, E1 lifecycle).

The reference's temporal composites operate per pixel over
co-registered scenes. Here the pixel table is synthesized
deterministically from `lineitem` (same derivation on both engines),
so the *relational skeleton* of the raster pipeline — masked median
composite, max-NDVI argmax composite — is DuckDB-oracle-checkable.
The true tiled kernels (halo exchange, segmentation) live in
``raster/`` with property-based tests instead.

Pixel synthesis: x = l_orderkey % 32, y = l_partkey % 32,
scene = l_linenumber, ndvi = l_discount * 100 masked NULL when
l_tax > 0.06 (the UDM2-style validity mask, P5/P6), bands b1/b2 from
quantity/price.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.composites import argmax_composite, grouped_median
from ._util import t

QUERIES: dict = {}
ORACLES: dict = {}

_SQL_PIXELS = """
    SELECT l_orderkey % 32 AS x,
           l_partkey % 32 AS y,
           l_linenumber AS scene,
           l_orderkey, l_linenumber,
           CASE WHEN l_tax > 0.06 THEN NULL ELSE l_discount * 100.0 END AS ndvi,
           l_quantity AS b1,
           l_extendedprice AS b2
    FROM lineitem
"""


def _pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 32).alias("x"),
        (F.col("l_partkey") % 32).alias("y"),
        F.col("l_linenumber").alias("scene"),
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_tax") > 0.06, None)
        .otherwise(F.col("l_discount") * 100.0)
        .alias("ndvi"),
        F.col("l_quantity").alias("b1"),
        F.col("l_extendedprice").alias("b2"),
    )


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# A1: per-pixel nanmedian composite
# (`0_preprocessing/feature_stacking.py:106-138`): masked scenes are
# NULL and ignored; all-masked pixels yield NULL (reference writes the
# nodata sentinel there — the sink-side mapping is P6).
@_q(
    "pixel_median_composite",
    f"""
    WITH pixels AS ({_SQL_PIXELS})
    SELECT x, y, CAST(median(ndvi) AS DOUBLE) AS median_ndvi
    FROM pixels GROUP BY x, y
    """,
)
def q_pixel_median_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = _pixels(spark, sf_dir)
    return grouped_median(px, ["x", "y"], "ndvi", out_col="median_ndvi")


# ---------------------------------------------------------------------------
# A2: per-pixel max-NDVI argmax composite keeping the full band payload
# (`0_preprocessing/feature_stacking.py:140-167`); masked rows are
# never winners. Tie-break is the deterministic struct order
# (ndvi, l_orderkey, l_linenumber, ...).
@_q(
    "max_ndvi_composite",
    f"""
    WITH pixels AS ({_SQL_PIXELS})
    SELECT x, y, ndvi AS max_ndvi, l_orderkey, l_linenumber, b1, b2
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY x, y
        ORDER BY ndvi DESC, l_orderkey DESC, l_linenumber DESC, b1 DESC, b2 DESC
      ) AS rn
      FROM pixels WHERE ndvi IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_max_ndvi_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = _pixels(spark, sf_dir)
    return argmax_composite(
        px, ["x", "y"], "ndvi", ["l_orderkey", "l_linenumber", "b1", "b2"]
    )
