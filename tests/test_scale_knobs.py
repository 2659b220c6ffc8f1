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


def test_percentile_auto_flip_at_threshold(spark):
    """exact=None OPTS IN to resolving by plan-estimated input size:
    below the threshold the physical plan carries the exact
    percentile/median, above it (forced here with a tiny threshold)
    the same call plans approx_percentile. The DEFAULT is exact=True —
    precision never silently depends on plan statistics."""
    from conftest import SF_SMOKE

    # parquet scan: footer stats give a real size estimate
    df = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select(F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("v"))
    )

    def plan(q):
        return q._jdf.queryExecution().executedPlan().toString()

    assert "percentile_approx" not in plan(
        grouped_median(df, ["g"], "v", exact=None)
    )
    assert "percentile_approx" in plan(
        grouped_median(df, ["g"], "v", exact=None, auto_threshold_bytes=1)
    )
    assert "percentile_approx" not in plan(
        grouped_percentiles(df, ["g"], "v", exact=None)
    )
    assert "percentile_approx" in plan(
        grouped_percentiles(df, ["g"], "v", exact=None, auto_threshold_bytes=1)
    )
    # the DEFAULT is exact=True: a tiny threshold must NOT flip it
    assert "percentile_approx" not in plan(
        grouped_median(df, ["g"], "v", auto_threshold_bytes=1)
    )
    # explicit pins override the estimate in both directions
    assert "percentile_approx" in plan(grouped_median(df, ["g"], "v", exact=False))
    assert "percentile_approx" not in plan(
        grouped_median(df, ["g"], "v", exact=True, auto_threshold_bytes=1)
    )
    # statless leaves (local relations) report the unknown sentinel:
    # auto must stay exact even under a tiny threshold
    local = spark.createDataFrame(
        [(i % 4, float(i)) for i in range(1000)], "g int, v double"
    )
    assert "percentile_approx" not in plan(
        grouped_median(local, ["g"], "v", exact=None, auto_threshold_bytes=1)
    )


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


def test_bucketed_random_projection_lsh(spark):
    """SURVEY §7's Spark-ML LSH path: BucketedRandomProjectionLSH over
    the embeddings table — approx similarity join finds the near pairs
    that brute-force confirms."""
    import pyspark.sql.functions as F
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from conftest import SF_SMOKE

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select(
            "vec_id",
            array_to_vector(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("features"),
        )
        .cache()
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, threshold=1.2, distCol="dist")
    close = pairs.where("datasetA.vec_id < datasetB.vec_id")
    n = close.count()
    assert n >= 0  # runs end-to-end; content checked below on one probe
    key = emb.first()["features"]
    nn = model.approxNearestNeighbors(emb, key, numNearestNeighbors=3)
    ids = [r["vec_id"] for r in nn.collect()]
    assert len(ids) == 3
    assert emb.first()["vec_id"] in ids  # the probe itself is its own NN


def test_approx_count_distinct_tolerance(spark):
    """approx_count_distinct (HLL) — the 100 TB knob for exact
    countDistinct — stays within its default 5% rsd of truth."""
    import pyspark.sql.functions as F

    df = spark.range(100_000).select((F.col("id") % 9173).alias("v"))
    exact = df.select(F.countDistinct("v")).first()[0]
    approx = df.select(F.approx_count_distinct("v")).first()[0]
    assert exact == 9173
    assert abs(approx - exact) / exact < 0.1


def test_spread_cpu_conditional_repartition(spark):
    """spread_cpu (r16): repartitions to the default parallelism ONLY
    when the input has fewer partitions — identity (no added shuffle)
    once the input is already at or above it, so at production split
    counts it is a no-op. Row content is never changed."""
    from tb_scale_spatial_data_pipeline_spark.operators.spread import spread_cpu

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    wide = spark.range(1000).repartition(par + 4)

    out_narrow = spread_cpu(narrow)
    assert out_narrow.rdd.getNumPartitions() == par
    assert sorted(r["id"] for r in out_narrow.collect()) == list(range(1000))

    out_wide = spread_cpu(wide)
    assert out_wide is wide  # identity: no shuffle added


def test_broadcast_if_small_guard(spark):
    """broadcast_if_small (r17): the graph-loop vector broadcast must
    be size-guarded — hint applied only under the row-count cap (a
    forced broadcast of a 1e9-node vector would exceed Spark's hard
    8 GB broadcast limit), identity above it so the planner's shuffle
    join degrades gracefully."""
    from pyspark.sql import functions as F

    from tb_scale_spatial_data_pipeline_spark.operators.spread import (
        BROADCAST_MAX_ROWS,
        broadcast_if_small,
    )

    vec = spark.range(100).select(F.col("id").alias("node"))
    # above the cap: identity — no hint anywhere in the plan
    big = broadcast_if_small(vec, BROADCAST_MAX_ROWS + 1)
    assert big is vec

    # under the cap: the hint survives analysis and forces a broadcast
    # join even with auto-broadcast disabled (the graph loops join
    # against checkpointed frames AQE cannot estimate)
    edges = spark.range(1000).select(
        (F.col("id") % 100).alias("src"), (F.col("id") % 7).alias("dst")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        small = broadcast_if_small(vec, 100)
        p_hint = edges.join(
            small, small["node"] == edges["src"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p_hint
        p_plain = edges.join(
            vec, vec["node"] == edges["src"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
