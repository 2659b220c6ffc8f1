"""Round-15 pipeline-conversion invariant tests.

E3/E4 exact-lattice conversions (plans/pipelines.py): the oracle SQL
twins are the closed-form region enumerations, valid only while
(a) FH04 over the region lattice provably reproduces the region map
    as its partition (no cross-region merge can fire because every
    cross edge weighs >= 64 > scale=35; zero-weight intra edges merge
    first), and
(b) both E4 RandomForests are unanimous and exact on the 6 distinct
    shape-feature vectors (bootstrap=False + featureSubsetStrategy=
    "all" over a separable training set that contains every vector).
These tests assert both invariants directly so any Spark-ML or kernel
behavioral drift fails locally before the driver sweep records a red
row.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _e3_segments(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.pipelines import _e3_regions
    from tb_scale_spatial_data_pipeline_spark.raster.segmentation import segment_tiles
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import halo_duplicate

    regions = _e3_regions(spark)
    px = spark.range(96 * 96).select(
        (F.col("id") % 96).cast("int").alias("x"),
        F.expr("CAST(id DIV 96 AS INT)").alias("y"),
    )
    feat = px.join(
        F.broadcast(regions),
        (px.x >= F.col("x0")) & (px.x < F.col("x0") + F.col("w"))
        & (px.y >= F.col("y0")) & (px.y < F.col("y0") + F.col("h")),
    ).select("x", "y", "code", (F.col("code") * 64.0).alias("v"))
    tiled = halo_duplicate(feat.drop("code"), tile_size=48, halo=8)
    segs = segment_tiles(tiled, ["v"])
    return segs.join(feat.select("x", "y", "code"), ["x", "y"])


def test_e3_fh04_partition_equals_region_map(spark):
    """The FH04 segmentation partition must be EXACTLY the 24-region
    lattice: every region maps to one segment and every segment to one
    region (the bijection the closed-form oracle encodes)."""
    joined = _e3_segments(spark).cache()
    try:
        assert joined.count() == 96 * 96  # every pixel covered, once
        per_region = joined.groupBy("code").agg(
            F.countDistinct("seg_id").alias("n_segs")
        )
        assert per_region.count() == 24
        assert per_region.where(F.col("n_segs") != 1).count() == 0
        per_seg = joined.groupBy("seg_id").agg(
            F.countDistinct("code").alias("n_codes")
        )
        assert per_seg.count() == 24
        assert per_seg.where(F.col("n_codes") != 1).count() == 0
    finally:
        joined.unpersist()


def test_e4_rf_unanimous_and_exact(spark, tmp_path):
    """Both E4 models (main: area+perimeter+shape; backup: shape-only)
    must vote unanimously (conf exactly 1.0) and reproduce the
    generating label rule on every segment — the invariant that makes
    the closed-form oracle valid, including for the seg%3 rows that
    lose `area` and route through the backup."""
    from tb_scale_spatial_data_pipeline_spark.ml.classify import predict, train_rf
    from tb_scale_spatial_data_pipeline_spark.plans.checkpoint import stage
    from tb_scale_spatial_data_pipeline_spark.plans.pipelines import _build_e3

    metrics = stage(spark, str(tmp_path / "e3"), lambda: _build_e3(spark))
    shape_cols = [
        "rectangularity",
        "elongation",
        "compactness",
        "shape_index",
        "vertex_density",
    ]
    labeled = metrics.withColumn(
        "label",
        F.when(F.col("area") > 500, 1.0)
        .when(F.col("elongation") > 1.5, 2.0)
        .otherwise(3.0),
    )
    train = labeled.where(F.col("segment_key") % 2 == 0)
    # the training split must contain every distinct feature vector
    n_vec_all = labeled.select(*shape_cols, "area").distinct().count()
    n_vec_train = train.select(*shape_cols, "area").distinct().count()
    assert n_vec_all == n_vec_train == 6
    for cols in (["area", "perimeter", *shape_cols], shape_cols):
        model = train_rf(
            train, cols, "label",
            num_trees=20, max_depth=8,
            feature_subset_strategy="all", bootstrap=False,
        )
        scored = predict(model, labeled, out_col="p")
        assert scored.where(F.col("p_conf") != 1.0).count() == 0
        assert scored.where(F.col("p") != F.col("label").cast("int")).count() == 0


def test_chain_e4_rf_unanimous_and_exact(spark, tmp_path):
    """Chain twin of test_e4_rf_unanimous_and_exact (ADVICE r15): the
    full chain's E4 uses a DIFFERENT label rule (area > 300) over
    different shapes (G/H/I/J on the 36-region lattice), and its
    PredClass correctness was previously pinned only by the driver
    sweep differential. Train both models on the chain's own split
    (segment_key % 2 == 0) and assert unanimity (conf exactly 1.0) and
    exact label reproduction over all 36 chain regions."""
    from tb_scale_spatial_data_pipeline_spark.ml.classify import predict, train_rf
    from tb_scale_spatial_data_pipeline_spark.plans.full_pipeline import (
        run_full_pipeline,
    )

    run_full_pipeline(spark, "/root/testdata/sf0.001", workdir=str(tmp_path))
    metrics = spark.read.parquet(str(tmp_path / "e3_metrics"))
    shape_cols = [
        "rectangularity", "elongation", "compactness", "shape_index",
        "vertex_density",
    ]
    labeled = metrics.withColumn(
        "label",
        F.when(F.col("area") > 300, 1.0)
        .when(F.col("elongation") > 1.5, 2.0)
        .otherwise(3.0),
    )
    assert labeled.count() == 36
    train = labeled.where(F.col("segment_key") % 2 == 0)
    # the chain split must still contain every distinct feature vector
    n_vec_all = labeled.select(*shape_cols, "area").distinct().count()
    n_vec_train = train.select(*shape_cols, "area").distinct().count()
    assert n_vec_all == n_vec_train
    for cols in (["area", "perimeter", *shape_cols], shape_cols):
        model = train_rf(
            train, cols, "label",
            num_trees=20, max_depth=8,
            feature_subset_strategy="all", bootstrap=False,
        )
        scored = predict(model, labeled, out_col="p")
        assert scored.where(F.col("p_conf") != 1.0).count() == 0
        assert scored.where(F.col("p") != F.col("label").cast("int")).count() == 0


def test_chain_stack_region_constant_and_gapped(spark, tmp_path):
    """Chain E1/E2 invariants that make the full-chain oracle valid:
    the stack is CONSTANT within each region, and the min inter-region
    median-NDVI gap exceeds 0.005 (>> FH04's scale/|C| <= 0.1/108), so
    the chain's FH04 stage can neither split a region nor merge two."""
    from tb_scale_spatial_data_pipeline_spark.plans.full_pipeline import (
        _chain_regions,
        run_full_pipeline,
    )

    run_full_pipeline(spark, "/root/testdata/sf0.001", workdir=str(tmp_path))
    stack = spark.read.parquet(str(tmp_path / "e1_stack"))
    regions = _chain_regions(spark)
    px = stack.join(
        F.broadcast(regions),
        (stack.x >= F.col("x0")) & (stack.x < F.col("x0") + F.col("w"))
        & (stack.y >= F.col("y0")) & (stack.y < F.col("y0") + F.col("h")),
    )
    per_region = px.groupBy("code").agg(
        F.countDistinct("median_ndvi", "max_ndvi", "winter_ndwi").alias("nv"),
        F.first("median_ndvi").alias("m"),
    )
    rows = per_region.collect()
    assert len(rows) == 36
    assert all(r["nv"] == 1 for r in rows)  # constant per region
    meds = sorted(r["m"] for r in rows)
    min_gap = min(b - a for a, b in zip(meds, meds[1:]))
    assert min_gap > 0.005, min_gap


def test_chain_segmentation_partition_equals_region_map(spark, tmp_path):
    """The chain's FH04 partition must be exactly the 36-region map
    (bijection regions <-> segments), keyed by the canonical
    segment_key = y0*96+x0 the oracle enumerates."""
    from tb_scale_spatial_data_pipeline_spark.plans.full_pipeline import (
        _chain_regions,
        run_full_pipeline,
    )

    out = run_full_pipeline(spark, "/root/testdata/sf0.001", workdir=str(tmp_path))
    keys = sorted(r["segment_key"] for r in out.collect())
    want = sorted(
        r["y0"] * 96 + r["x0"] for r in _chain_regions(spark).collect()
    )
    assert keys == want
