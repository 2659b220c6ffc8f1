"""Scale-knob validation: the approx variants that replace exact
aggregates at 100 TB must stay within tolerance of the exact results,
and the predict_batch_udf inference path (SURVEY §2.7 M1's
batch-vectorized form) must agree with a driver-side reference."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.operators.composites import (
    grouped_median,
    grouped_percentiles,
)


def test_approx_median_within_tolerance(spark):
    df = spark.createDataFrame(
        [(i % 4, float((i * 37) % 1000)) for i in range(4000)], "g int, v double"
    )
    exact = {r["g"]: r["median_value"] for r in grouped_median(df, ["g"], "v").collect()}
    approx = {
        r["g"]: r["median_value"]
        for r in grouped_median(df, ["g"], "v", exact=False).collect()
    }
    for g in exact:
        assert abs(exact[g] - approx[g]) <= 20.0  # within ~2% of the range


def test_approx_percentile_within_tolerance(spark):
    df = spark.createDataFrame(
        [(0, float(i)) for i in range(10000)], "g int, v double"
    )
    exact = grouped_percentiles(df, ["g"], "v").first()
    approx = grouped_percentiles(df, ["g"], "v", exact=False).first()
    assert abs(exact["p2"] - approx["p2"]) <= 100.0
    assert abs(exact["p98"] - approx["p98"]) <= 100.0


def test_predict_batch_udf_centroid_model(spark):
    """predict_batch_udf: Arrow-batched numpy inference with the model
    loaded once per executor — the M1 mapping for non-Spark-ML models
    (the reference's per-batch sklearn predict_proba analog)."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import IntegerType

    centroids = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]])

    def make_predict_fn():
        def predict(f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
            pts = np.stack([f1.ravel(), f2.ravel()], axis=1)
            d = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            return d.argmin(axis=1).astype(np.int32)

        return predict

    udf = predict_batch_udf(
        make_predict_fn, return_type=IntegerType(), batch_size=64
    )
    df = spark.createDataFrame(
        [(float(i % 12), float((i * 7) % 12)) for i in range(300)], "f1 double, f2 double"
    )
    out = df.withColumn("pred", udf("f1", "f2")).collect()
    for r in out:
        d = ((np.array([r["f1"], r["f2"]])[None, :] - centroids) ** 2).sum(axis=1)
        assert r["pred"] == int(d.argmin())
