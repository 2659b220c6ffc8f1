"""Distributed Lloyd k-means over an embedding column — the iterative
algorithm tier of the similarity stack (SURVEY §7.5: the IVF coarse
quantizer's centroids come from exactly this loop; `ivf_assign` /
`ivf_fine_search` consume them).

Scale design (the part that matters at 100 TB):
- Each iteration is ONE distributed pass. The k×dim centroid table is
  tiny, so it is embedded as a LITERAL array-of-structs column and the
  assignment is a pure projection: ``array_min(transform(cents, c ->
  struct(dist, cid)))``. No join, no groupBy — the assign stage
  contains ZERO Exchange (plan-asserted in tests/test_kmeans.py).
- Means are recomputed with a single posexplode → groupBy(cluster, dim)
  aggregation: one shuffle of k×dim partial sums per partition —
  constant-size map-side state, independent of row count.
- Only k×dim numbers ever reach the driver (the new centroids); the
  corpus never moves. Iteration count is the only driver round-trip.
- Deterministic: init = first k vectors by id (no RNG), distances are
  rounded to 9 decimals with cid as tiebreak, and the mean
  recomputation uses decimal-exact partial sums so assignments are
  partition-order-independent across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_distance


def _cent_literal(cent_rows: list[tuple[int, list[float]]]) -> Column:
    """k×dim centroids as a literal array<struct<cid,cvec>> column."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("cvec"),
            )
            for cid, vec in cent_rows
        ]
    )


def _assign(
    df: DataFrame, vec_col: str, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """One assignment pass: nearest centroid id per row.

    Pure projection — centroids ride along as a literal, the argmin is
    ``array_min`` over (dist, cid) structs (deterministic tiebreak, no
    sort, no shuffle, no join).
    """
    cand = _cent_literal(cent_rows)
    best = F.array_min(
        F.transform(
            cand,
            lambda c: F.struct(
                F.round(l2_distance(F.col(vec_col), c["cvec"]), 9).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return df.withColumn("cluster", best["cid"])


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` Lloyd iterations; returns (assignments, centroids)
    as ((id, cluster) DataFrame, (cid, cvec) DataFrame).

    Init is the first k vectors ordered by id — deterministic and
    partition-independent (contrast the reference's order-dependent
    sequential IDs, SURVEY §7 hard-part 3).
    """
    spark = df.sparkSession
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("cvec"))
        .collect()
    )
    cent_rows = [(i, [float(v) for v in r["cvec"]]) for i, r in enumerate(init)]
    data = df.select(id_col, vec_col)
    for _ in range(iters):
        assigned = _assign(data, vec_col, cent_rows)
        # mean per (cluster, dim): one posexplode pass, decimal-exact
        # partial sums → order-independent means
        new_rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        cent_rows = [
            (int(r["cluster"]), [float(v) for v in r["cvec"]]) for r in new_rows
        ]
        cent_rows.sort()
    cents = spark.createDataFrame(cent_rows, "cid int, cvec array<double>")
    return _assign(data, vec_col, cent_rows).select(id_col, "cluster"), cents


def kmeans_cluster_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Registry query: cluster sizes + within-cluster scatter after
    `iters` Lloyd iterations over the embeddings fixture."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    assigned, cents = lloyd_kmeans(emb, "vec_id", "e", k=k, iters=iters)
    j = assigned.join(emb, "vec_id").join(
        F.broadcast(cents), F.col("cluster") == F.col("cid")
    )
    return (
        j.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal partial sums: the scatter total is identical
            # under any partitioning (double sums are order-dependent)
            F.round(
                F.sum(
                    l2_distance(F.col("e"), F.col("cvec")).cast("decimal(18,6)")
                ).cast("double"),
                4,
            ).alias("scatter_l2"),
        )
        .orderBy("cluster")
    )
