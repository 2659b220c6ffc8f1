"""Round-14 operator tests.

E2 exact-lattice pixel classification: the oracle SQL twin is the
closed-form generating rule, which is only valid while the RF's votes
are unanimous and correct on the lattice (see plans/pipelines.py
_build_e2 docblock). This test asserts that invariant directly so any
Spark-ML behavioral drift (split binning, probability smoothing)
fails locally before the driver sweep can record a red row.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_e2_rf_unanimous_and_exact(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.pipelines import _build_e2

    out = _build_e2(spark)
    # recompute the generating rule and the relabel closed-form
    rule = out.withColumn(
        "want_pred",
        F.when(F.col("x") % 4 == 3, 12).when(F.col("y") % 4 == 3, 16).otherwise(2),
    ).withColumn(
        "want_final", F.when(F.col("x") % 4 == 3, 12).otherwise(2)
    )
    bad = rule.where(
        (F.col("pred") != F.col("want_pred"))
        | (F.col("final_label") != F.col("want_final"))
    ).count()
    assert bad == 0
    assert out.count() == 4096


def test_e2_rf_confidence_exactly_one(spark):
    """Unanimity, not just correctness: every tree's leaf must be pure,
    so max class probability is exactly 1.0 at every pixel."""
    from tb_scale_spatial_data_pipeline_spark.ml.classify import predict, train_rf

    px = (
        spark.range(4096)
        .select((F.col("id") % 64).alias("x"), F.expr("id div 64").alias("y"))
        .select(
            "x",
            "y",
            ((F.col("x") % 4) * 64).cast("double").alias("b1"),
            ((F.col("y") % 4) * 64).cast("double").alias("b2"),
            (((F.col("x") + F.col("y")) % 4) * 64).cast("double").alias("b3"),
        )
    )
    labeled = px.withColumn(
        "label",
        F.when(F.col("b1") > 150, 12).when(F.col("b2") > 150, 16).otherwise(2).cast("double"),
    )
    train = labeled.where((F.col("x") + F.col("y")) % 3 == 0)
    model = train_rf(
        train, ["b1", "b2", "b3"], "label",
        num_trees=20, max_depth=8, feature_subset_strategy="all",
    )
    scored = predict(model, labeled.drop("label"), out_col="pred")
    assert scored.where(F.col("pred_conf") != 1.0).count() == 0


def test_session_window_late_row_dropped(spark):
    """The late 10:08 row must NOT extend user 1's already-closed
    session: emitted row is [10:00, 10:35) n=2. If Spark's watermark
    filtering regressed (or the batch staging collapsed into one
    micro-batch), the row would read [10:00, 10:38) n=3 instead."""
    from tb_scale_spatial_data_pipeline_spark.streaming.events import (
        stream_session_window_late_data,
    )

    rows = [tuple(r) for r in stream_session_window_late_data(spark).collect()]
    assert rows == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:35:00", 2),
        (2, "2024-01-01 10:02:00", "2024-01-01 10:32:00", 1),
    ]


def test_knox_time_stage_candidates_are_theta_of_answer(spark):
    """knox_space_time's residual cost is the n_time_close +-1-bucket
    join (PLANS.md r13 scaling table). Its Theta(answer) claim, stated
    structurally and load-independently: candidate pairs enumerated by
    the bucket blocking must be within a constant factor of qualifying
    pairs (measured 1.50x at sf0.01 AND sf0.1; homogeneous arrivals
    give ~3 buckets probed per ~2-bucket qualifying window). A plan
    change that reintroduces density-quadratic enumeration (e.g. AQE
    coalescing to one partition, or losing the bucket join) blows this
    ratio up long before wall-clock tests would notice."""
    sf = "/root/testdata/sf0.001"
    evt = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "ts")
    tms = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast(
        "bigint"
    )
    tbk = evt.select("event_id", tms.alias("tms")).select(
        "event_id", "tms", F.expr("tms div 3600000").alias("bkt")
    )
    toffs = spark.range(-1, 2).select(F.col("id").alias("dt"))
    tprobe = tbk.crossJoin(F.broadcast(toffs)).select(
        F.col("event_id").alias("ia"),
        F.col("tms").alias("ta"),
        (F.col("bkt") + F.col("dt")).alias("nbkt"),
    )
    tside = tbk.select(
        F.col("event_id").alias("ib"),
        F.col("tms").alias("tb"),
        F.col("bkt").alias("nbkt"),
    )
    j = tprobe.join(tside, "nbkt").where(F.col("ia") < F.col("ib"))
    r = j.agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum(
            F.when(F.abs(F.col("ta") - F.col("tb")) <= 3600000, 1).otherwise(0)
        ).alias("qual"),
    ).first()
    assert r["qual"] > 0
    assert r["cand"] <= 3.0 * r["qual"]
