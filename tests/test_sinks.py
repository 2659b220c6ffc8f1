"""Sink-layer tests (S7 tiled partitioned write, S8 overlay merge,
S9/S10 vector round-trip)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.sources.sinks import (
    overlay_update,
    read_vector,
    write_tiled,
    write_vector,
)


def test_write_tiled_partition_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(x, y, x // 2, y // 2, float(x * y)) for x in range(8) for y in range(8)],
        "x int, y int, tile_x int, tile_y int, v double",
    )
    path = str(tmp_path / "tiled")
    write_tiled(df, path)
    # hive-style tile partition dirs exist → partition pruning on read
    assert any(d.startswith("tile_y=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == 64
    pruned = back.where("tile_y = 0 AND tile_x = 0")
    assert pruned.count() == 4  # 2x2 pixel block per tile


def test_overlay_update_semantics(spark):
    existing = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    updates = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k int, v double")
    out = {r["k"]: r["v"] for r in overlay_update(existing, updates, ["k"], ["v"]).collect()}
    assert out == {1: 10.0, 2: 99.0, 3: 30.0}


def test_vector_roundtrip_with_schema_evolution(spark, tmp_path):
    segs = spark.createDataFrame(
        [(1, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", 0.8)],
        "seg_id int, geometry string, rectangularity double",
    )
    evolved = segs.withColumn("PredClass", F.lit(3))  # S11 schema evolution
    path = str(tmp_path / "vector")
    write_vector(evolved, path)
    back = read_vector(spark, path)
    assert back.columns == ["seg_id", "geometry", "rectangularity", "PredClass"]
    assert back.first()["PredClass"] == 3


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """S4's scale contract, plan-level: a tile predicate must become a
    PartitionFilter on the parquet scan (metadata-only pruning — the
    reader never opens non-matching tile directories), not a post-scan
    Filter. At 100 TB this is the difference between listing a few
    directories and scanning the lake."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(x, y, x // 2, y // 2, float(x * y)) for x in range(8) for y in range(8)],
        "x int, y int, tile_x int, tile_y int, v double",
    )
    path = str(tmp_path / "tiled_prune")
    write_tiled(df, path)
    pruned = spark.read.parquet(path).where("tile_y = 1 AND tile_x = 2")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan, plan
    seg = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "tile_y" in seg and "tile_x" in seg, seg
    # and the files actually read come from exactly one tile dir
    files = pruned.select(F.input_file_name().alias("f")).distinct().collect()
    assert files and all("tile_y=1" in r["f"] and "tile_x=2" in r["f"] for r in files)
