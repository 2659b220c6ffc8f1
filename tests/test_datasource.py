"""Custom Python DataSource (sources/rastergen.py) and text-format
source round-trips.

The scan contract that matters at scale: one InputPartition per tile
(parallelism = tile count, no driver funnel), deterministic re-read
(task retries must reproduce identical rows), and the declared schema.
CSV/JSON round-trips cover the format breadth of the source layer —
explicit schemas on read (schema inference is a second full scan, an
anti-pattern at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.sources.rastergen import (
    TILE,
    pixel_value,
    register,
)


def _load(spark, tx=2, ty=3):
    register(spark)
    return (
        spark.read.format("rastergen")
        .option("tiles_x", str(tx))
        .option("tiles_y", str(ty))
        .load()
    )


def test_partition_per_tile(spark):
    df = _load(spark, tx=2, ty=3)
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 6
    # each partition holds exactly one tile
    per = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.countDistinct("tile_x", "tile_y").alias("nt"))
        .collect()
    )
    assert all(r["nt"] == 1 for r in per)


def test_deterministic_reread_and_values(spark):
    df = _load(spark)
    assert df.count() == 2 * 3 * TILE * TILE
    a = df.agg(F.sum("b1"), F.sum("b2")).collect()[0]
    b = _load(spark).agg(F.sum("b1"), F.sum("b2")).collect()[0]
    assert tuple(a) == tuple(b)
    row = df.where((F.col("x") == 5) & (F.col("y") == 7)).first()
    assert row["b1"] == pixel_value(5, 7, 1)


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(out)
    back = (
        spark.read.schema(src.schema)
        .option("header", "true")
        .csv(out)
    )
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_json_roundtrip_with_explicit_schema(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    out = str(tmp_path / "region_json")
    src.write.json(out)
    back = spark.read.schema(src.schema).json(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )
