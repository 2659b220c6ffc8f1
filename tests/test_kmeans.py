"""Lloyd k-means properties (ml/clustering.py): the invariants that
hold regardless of data — scatter never increases per iteration,
results are partition-count-independent (decimal-exact means), every
point lands on its nearest centroid, all k clusters stay addressable.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.functions.vectors import l2_distance
from tb_scale_spatial_data_pipeline_spark.ml.clustering import lloyd_kmeans

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )


def _scatter(assigned, emb, cents):
    j = assigned.join(emb, "vec_id").join(
        F.broadcast(cents), F.col("cluster") == F.col("cid")
    )
    return j.agg(
        F.sum(l2_distance(F.col("e"), F.col("cvec")).cast("decimal(18,6)"))
        .cast("double")
        .alias("s")
    ).collect()[0]["s"]


def test_scatter_decreases_over_iterations(spark):
    emb = _emb(spark)
    scatters = []
    for iters in (0, 1, 3):
        assigned, cents = lloyd_kmeans(emb, "vec_id", "e", k=4, iters=iters)
        scatters.append(_scatter(assigned, emb, cents))
    assert scatters[1] <= scatters[0] + 1e-9, scatters
    assert scatters[2] <= scatters[1] + 1e-9, scatters


def test_assignment_is_nearest_centroid(spark):
    emb = _emb(spark)
    assigned, cents = lloyd_kmeans(emb, "vec_id", "e", k=4, iters=2)
    # recompute nearest brute-force and compare
    cand = emb.join(F.broadcast(cents))
    d = F.round(l2_distance(F.col("e"), F.col("cvec")), 9)
    brute = cand.groupBy("vec_id").agg(
        F.min_by("cid", F.struct(d.alias("d"), F.col("cid"))).alias("nearest")
    )
    diff = (
        assigned.join(brute, "vec_id")
        .where(F.col("cluster") != F.col("nearest"))
        .count()
    )
    assert diff == 0


def test_partition_invariance(spark):
    emb = _emb(spark)
    a1, _ = lloyd_kmeans(emb.repartition(1), "vec_id", "e", k=4, iters=2)
    a2, _ = lloyd_kmeans(emb.repartition(17), "vec_id", "e", k=4, iters=2)
    r1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert r1 == r2


def test_assign_stage_has_no_exchange(spark):
    """The assign stage is a pure projection over literal centroids —
    zero Exchange (the r1/r2 implementation shuffled the full corpus,
    vectors included, once per iteration)."""
    import contextlib
    import io

    from tb_scale_spatial_data_pipeline_spark.ml.clustering import _assign

    emb = _emb(spark)
    cent_rows = [
        (i, [float(v) for v in r["e"]]) for i, r in enumerate(emb.take(4))
    ]
    assigned = _assign(emb, "e", cent_rows)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assigned.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
