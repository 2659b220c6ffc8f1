"""Mergeable sketches + query instrumentation:

- HLL sketches (Spark 4 datasketches surface): partial sketches built
  per-partition merge via hll_union_agg to the SAME estimate as one
  global sketch — the algebraic property that lets 100 TB distinct
  counts run as map-side partials with a tiny shuffle. Estimates are
  checked against the exact distinct count within HLL error bounds.
- WindowGroupLimit: Spark pushes a rank<=k filter into the shuffle
  (partial top-k before exchange) — the plan property that makes
  per-group top-k viable when groups are huge.
- Observation API: named metrics collected ON the stream of rows as
  a side effect of a real job, no second scan.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F


def test_hll_partial_merge_equals_global(spark):
    df = spark.range(100_000).select((F.col("id") % 9173).alias("k"))
    exact = df.select(F.countDistinct("k")).collect()[0][0]

    global_est = df.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
    ).collect()[0]["e"]

    # partial per slice (as executors would), then union-merge
    partials = df.withColumn("slice", F.spark_partition_id()).groupBy("slice").agg(
        F.hll_sketch_agg("k").alias("sk")
    )
    merged_est = partials.select(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]

    assert merged_est == global_est, (merged_est, global_est)
    assert abs(merged_est - exact) / exact < 0.05, (merged_est, exact)


def test_window_group_limit_pushdown(spark):
    from pyspark.sql import Window

    df = spark.range(100_000).select(
        (F.col("id") % 100).alias("g"), F.col("id").alias("v")
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    top3 = df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        top3.explain("formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan, plan
    assert top3.count() == 300


def test_observation_metrics_piggyback(spark):
    from pyspark.sql import Observation

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7 == 0).alias("is_sev")
    )
    obs = Observation("q")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("is_sev").cast("long")).alias("sev_rows"),
    )
    n = observed.where(~F.col("is_sev")).count()
    got = obs.get
    assert got["rows_seen"] == 10_000
    assert got["sev_rows"] == 1429
    assert n == 10_000 - 1429


def test_hll_estimate_within_error_bound(spark):
    from conftest import SF_SMOKE
    from tb_scale_spatial_data_pipeline_spark.plans import all_queries

    row = (
        all_queries()["hll_distinct_estimate"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    # m=256 => relative standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma.
    assert abs(row.rel_err) < 4 * 1.04 / 16
    # fixture cardinality saturates the sketch: raw-HLL branch, not
    # linear counting
    assert row.buckets_used >= 250
    assert row.exact_distinct > 2.5 * 256
