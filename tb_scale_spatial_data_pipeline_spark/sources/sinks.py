"""Sinks (SURVEY §2.1 S6–S11).

The reference writes tiled GeoTIFFs (header-then-r+ in-place windows,
`1_pixel_classification/pixel_classifier_stream.py:86-94,166-175`),
per-tile shapefiles (`2_segmentation/image_segmentation.py:153-162`),
and batched GPKG streams (`3_object_classification/object_classifier.py:202-213`).
Spark writes are job-atomic and immutable, so:

- S7 tiled raster sink  → partitioned parquet on the tile key
  (partition pruning on read = the reference's windowed access);
- S8 in-place scatter update → last-writer-wins overlay merge
  (full-outer join + coalesce(new, old)) materialized as a NEW
  dataset — never mutation;
- S9/S11 vector sinks → parquet with a WKT geometry column
  (GeoParquet-style layout), schema evolution via withColumn.

At 100 TB the partition column choice is the whole game: tile keys
give bounded file counts and align writes with the kernel shuffle
(one pass, no extra repartition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_tiled(
    df: DataFrame,
    path: str,
    tile_cols: Sequence[str] = ("tile_y", "tile_x"),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S7: tile-partitioned parquet sink (zstd ↔ the reference's LZW)."""
    df.write.partitionBy(*tile_cols).option("compression", compression).mode(
        mode
    ).parquet(path)


def overlay_update(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """S8: read-modify-write overlay as a pure relational merge —
    update values win where present, existing values persist
    elsewhere, new keys append (the semantics of the reference's
    window read→overlay→write loop, without mutation)."""
    upd = updates.select(
        *keys, *[F.col(c).alias(f"_new_{c}") for c in value_cols]
    )
    joined = existing.join(upd, on=list(keys), how="full_outer")
    out_cols = [F.col(k) for k in keys]
    out_cols += [
        F.coalesce(F.col(f"_new_{c}"), F.col(c)).alias(c) for c in value_cols
    ]
    return joined.select(*out_cols)


def write_vector(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    mode: str = "overwrite",
) -> None:
    """S9/S11: vector sink — WKT geometry column + property columns in
    parquet (GeoParquet-style layout; single atomic write replaces the
    reference's 100k-record batching, which Spark's partitioned
    writers subsume)."""
    if geometry_col not in df.columns:
        raise ValueError(f"missing geometry column {geometry_col!r}")
    df.write.mode(mode).parquet(path)


def read_vector(spark: SparkSession, path: str) -> DataFrame:
    """S10: vector scan."""
    return spark.read.parquet(path)
