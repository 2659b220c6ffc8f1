"""The complete reference workflow E1→E2→E3→E4 as ONE chained
DataFrame program with stage-level parquet checkpointing — the §4
memoization policy applied end-to-end (each stage is a named dataset;
reruns skip completed stages, exactly the reference's
``os.path.exists`` discipline, `0_preprocessing/feature_stacking.py:261-262`).

Flow on the synthetic scene set:
  E1  feature stack  : median + max-NDVI composites, zip-joined
  E2  pixel classify : RF on stack bands + CASE relabel
  E3  segmentation   : halo-tiled FH04 over (stack + label) features
  E4  object classify: shape metrics → dual-model RF → PredClass
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relabel import solar_shadow_rules
from ..raster.segmentation import segment_shape_metrics, segment_tiles
from ..raster.tiles import halo_duplicate
from .checkpoint import stage, stage_root
from .pipelines import _build_e1, e1_feature_stack

QUERIES: dict = {}
ORACLES: dict = {}


def run_full_pipeline(
    spark: SparkSession, sf_dir: str, workdir: str | None = None
) -> DataFrame:
    """E1→E4 with every stage behind a compute-if-absent parquet
    product: a rerun (or a sweep that already ran the standalone E1
    query) skips straight to reading the persisted bytes — the whole
    stage construction including the eager RF fits is elided, not just
    the write."""
    from ..ml.classify import dual_model_predict, predict, train_rf

    if workdir is None:
        root = f"{stage_root(sf_dir)}/chain"
        # E1 is IDENTICAL to the standalone pipeline_feature_stack
        # query — share its global stage product.
        stack = e1_feature_stack(spark, sf_dir)
    else:
        root = workdir
        stack = stage(spark, f"{root}/e1_stack", lambda: _build_e1(spark))

    # E2: pixel classification over the stack
    def _build_pixels() -> DataFrame:
        labeled = stack.withColumn(
            "label",
            F.when(F.col("median_ndvi") > 0.2, 12.0)
            .when(F.col("max_ndvi") > 0.5, 16.0)
            .otherwise(2.0),
        )
        train = labeled.where((F.col("x") + F.col("y")) % 3 == 0)
        model = train_rf(
            train, ["median_ndvi", "max_ndvi", "winter_ndwi"], "label",
            num_trees=20, max_depth=8,
        )
        scored = predict(model, labeled.drop("label"), out_col="pred")
        pixels = scored.withColumn(
            "final_label",
            solar_shadow_rules(F.col("pred"), F.col("pred_conf")).cast("int"),
        )
        return pixels.select("x", "y", "median_ndvi", "max_ndvi", "final_label")

    pixels = stage(spark, f"{root}/e2_pixels", _build_pixels)

    # E3: segmentation over composite bands + predicted label field
    def _build_metrics() -> DataFrame:
        tiled = halo_duplicate(pixels, tile_size=32, halo=8)
        segs = segment_tiles(
            tiled, ["median_ndvi", "max_ndvi", "final_label"], scale=35.0, min_size=15
        )
        return segment_shape_metrics(segs)

    metrics = stage(spark, f"{root}/e3_metrics", _build_metrics)

    # E4: dual-model object classification on shape metrics
    def _build_objects() -> DataFrame:
        shape_cols = [
            "rectangularity", "elongation", "compactness", "shape_index", "vertex_density",
        ]
        obj_labeled = metrics.withColumn(
            "label",
            F.when(F.col("area") > 300, 1.0).when(F.col("elongation") > 1.5, 2.0).otherwise(3.0),
        )
        obj_train = obj_labeled.where(F.col("seg_id") % 2 == 0)
        main = train_rf(
            obj_train, ["area", "perimeter", *shape_cols], "label", num_trees=20, max_depth=8
        )
        backup = train_rf(obj_train, shape_cols, "label", num_trees=20, max_depth=8)
        probe = obj_labeled.drop("label").withColumn(
            "area",
            F.when(F.col("seg_id") % 3 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("area"))
            .cast("double"),
        )
        out = dual_model_predict(probe, main, backup, ["area"])
        return out.select("seg_id", "geometry", "PredClass")

    return stage(spark, f"{root}/e4_objects", _build_objects)


def _q(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


@_q("pipeline_full_chain")
def q_full_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_full_pipeline(spark, sf_dir)
